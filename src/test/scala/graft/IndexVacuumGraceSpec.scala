package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.util.IndexCommit

/** The reclaim half of the `_POLICY` contract: with `vacuumGraceMs`
  * set, vacuum is MARK-AND-SWEEP — the first pass stamps a superseded
  * generation (`_DEAD_SINCE`), and only a pass running at least the
  * grace window later deletes it. An in-flight reader that resolved
  * the old pointer therefore has the whole window to finish, so an
  * age-based schedule can call vacuum blindly without racing readers.
  * Without the policy key, vacuum stays immediate (the drained-
  * maintenance-window contract every existing caller assumes).
  */
class IndexVacuumGraceSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def names(dir: String): Set[String] =
    new java.io.File(dir).listFiles().map(_.getName).toSet

  test("graced vacuum marks but does not sweep inside the window; sweeps after; policy travels with the index") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_vacuum_grace_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 2 =!= 0), dir)
      // cap + grace in ONE policy file: both keys round-trip
      IndexCommit.setPolicy(spark, dir, Some(8), Some(600000L))
      assert(IndexCommit.policyMaxDeltas(spark, dir) === Some(8))
      assert(IndexCommit.policyVacuumGraceMs(spark, dir) === Some(600000L))
      // MERGE semantics: updating one key must not erase the other —
      // tuning the compaction cap must never silently drop the grace
      // window a scheduled vacuum depends on
      IndexCommit.setPolicy(spark, dir, Some(4))
      assert(IndexCommit.policyMaxDeltas(spark, dir) === Some(4))
      assert(IndexCommit.policyVacuumGraceMs(spark, dir) === Some(600000L))
      IndexCommit.setPolicy(spark, dir, Some(8), Some(600000L))

      val terms = Retrieval.QueryTerms
      val want = rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
      assert(want.nonEmpty)

      // a reader that resolved the PRE-fold pointer (planned now,
      // collected only after compaction AND two vacuum passes)
      val preFoldReader = Retrieval.conjunctiveSearchStored(spark, dir, terms)
      Retrieval.compactPostingsIndex(spark, dir)

      // pass 1: marks the superseded delta, deletes nothing
      Retrieval.vacuumPostingsIndex(spark, dir)
      val afterMark = names(dir)
      assert(afterMark.exists(_.startsWith("delta_")),
        s"graced vacuum swept inside the window: $afterMark")
      assert(new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("delta_"))
        .forall(d => new java.io.File(d, "_DEAD_SINCE").exists()),
        "first graced pass did not stamp the dead generation")
      // pass 2, still inside the window: still nothing swept
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(names(dir).exists(_.startsWith("delta_")))
      // the old-pointer reader completes against intact files
      assert(rows(preFoldReader) === want)

      // a truncated stamp (crash mid-marker-write before the rename
      // protocol existed) self-heals: vacuum re-stamps instead of
      // throwing forever and never reclaiming
      val deltaDir = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("delta_")).head
      val mk = new java.io.File(deltaDir, "_DEAD_SINCE")
      new java.io.FileOutputStream(mk).close() // truncate to empty
      Retrieval.vacuumPostingsIndex(spark, dir) // must not throw
      assert(mk.length() > 0, "corrupt stamp was not re-written")

      // shrink the window to 1 ms (policy is re-read per pass —
      // operators tune reclaim without touching code), age past it,
      // sweep
      IndexCommit.setPolicy(spark, dir, Some(8), Some(1L))
      Thread.sleep(10)
      Retrieval.vacuumPostingsIndex(spark, dir)
      val afterSweep = names(dir)
      assert(!afterSweep.exists(_.startsWith("delta_")),
        s"aged-out generation survived the sweep: $afterSweep")
      assert(!afterSweep.contains("postings"),
        s"legacy root base survived the sweep: $afterSweep")
      // serving unchanged throughout
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === want)

      // removal is explicit: a no-key setPolicy refuses (it merges, so
      // it would silently do nothing — or, historically, silently
      // delete a stored grace window)
      intercept[IllegalArgumentException] {
        IndexCommit.setPolicy(spark, dir, None)
      }
      // per-key clear keeps the other key
      IndexCommit.clearPolicy(spark, dir, Some("maxDeltas"))
      assert(IndexCommit.policyMaxDeltas(spark, dir) === None)
      assert(IndexCommit.policyVacuumGraceMs(spark, dir) === Some(1L))
      // whole-file clear; vacuum reverts to immediate
      IndexCommit.clearPolicy(spark, dir)
      assert(IndexCommit.policyMaxDeltas(spark, dir) === None)
      assert(IndexCommit.policyVacuumGraceMs(spark, dir) === None)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" zzgracez")).as("text")), dir)
      Retrieval.deletePostingsDocs(spark, dir,
        docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")))
      Retrieval.compactPostingsIndex(spark, dir)
      Retrieval.vacuumPostingsIndex(spark, dir)
      val immediate = names(dir)
      assert(!immediate.exists(n =>
        n.startsWith("delta_") || n.startsWith("tomb_")),
        s"policy-less vacuum deferred reclaim: $immediate")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("grace stamps never perturb a probe (underscore files are invisible to scans)") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_vacuum_grace_ivf_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      val queries = emb.filter(col("vec_id") < 8)
      val want = rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2))
      IndexCommit.setPolicy(spark, dir, None, Some(600000L))
      Similarity.compactIvfIndex(spark, dir)
      // mark pass stamps the folded delta + the legacy root vectors dir
      Similarity.vacuumVectorIndex(spark, dir)
      assert(names(dir).exists(_.startsWith("delta_")))
      // a FRESH probe over the marked index: identical rows — the
      // stamps sit beside data files the live pointer no longer plans
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === want)
      // age out and sweep; serving still identical
      IndexCommit.setPolicy(spark, dir, None, Some(1L))
      Thread.sleep(10)
      Similarity.vacuumVectorIndex(spark, dir)
      assert(!names(dir).exists(_.startsWith("delta_")))
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === want)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
