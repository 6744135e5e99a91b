package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity}
import graft.util.IndexCommit

/** Mechanical vacuum/compaction concurrency safety: the compactor
  * folds into a `.staging_base_<n>` dir that vacuum's dead-scan never
  * matches, promotes it to `base_<n>` with one rename, and flips the
  * pointer — and vacuum classifies a base as dead only when its id is
  * BELOW the live pointer's (ids are monotonic, so "< live" is exactly
  * "superseded"). Between promote and flip the fold's id is ≥ the
  * pointer's, so there is no state in the write→promote→flip chain a
  * grace-0 vacuum can reclaim: the race the old name-inequality rule
  * had (vacuum deleting a mid-commit fold, the next flip serving a
  * missing dir) is impossible by construction, not by scheduling.
  */
class CompactionVacuumRaceSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def names(dir: String): Set[String] =
    new java.io.File(dir).listFiles().map(_.getName).toSet

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("every mid-compaction state survives a grace-0 vacuum; only a flipped-past base is reclaimed") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_vac_race_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 2 =!= 0), dir)
      Retrieval.compactPostingsIndex(spark, dir) // pointer -> base_0
      Retrieval.vacuumPostingsIndex(spark, dir)  // reclaim legacy root
      val terms = Retrieval.QueryTerms
      val want = rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
      assert(want.nonEmpty)

      // state 1: fold mid-write in staging — vacuum must not touch it
      val staged = IndexCommit.stageBase(spark, dir, "base_1")
      new java.io.File(s"$staged/postings").mkdirs()
      new java.io.FileOutputStream(
        new java.io.File(s"$staged/postings/part-half-written")).close()
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(names(dir).contains(".staging_base_1"),
        "grace-0 vacuum reclaimed an in-flight staging fold")

      // state 2: promoted, flip pending (id 1 ≥ live 0) — still safe
      IndexCommit.promoteStaged(spark, dir, "base_1")
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(names(dir).contains("base_1"),
        "grace-0 vacuum reclaimed a promoted-but-unflipped fold")
      assert(IndexCommit.resolve(spark, dir)._1.endsWith("base_0"))

      // state 3: flipped — NOW base_0 is superseded and reclaimed;
      // roll the pointer forward over a REAL fold so serving holds
      rm(s"$dir/base_1") // drop the junk promoted dir pre-flip
      Retrieval.appendPostingsDelta(
        docs.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id") + 500000L as "doc_id", col("text")), dir)
      Retrieval.compactPostingsIndex(spark, dir) // stages+promotes base_1
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(!names(dir).contains("base_0"),
        "superseded base survived a grace-0 vacuum after the flip")
      assert(IndexCommit.resolve(spark, dir)._1.endsWith("base_1"))

      // stale staging debris BELOW the pointer is unpromotable crash
      // debris — vacuum reclaims it
      new java.io.File(s"$dir/.staging_base_0/postings").mkdirs()
      Retrieval.vacuumPostingsIndex(spark, dir)
      assert(!names(dir).contains(".staging_base_0"),
        "unpromotable staging debris survived vacuum")

      // promoting onto an existing generation id refuses (single-
      // writer compaction contract), never silently overwrites
      IndexCommit.stageBase(spark, dir, "base_1")
      new java.io.File(s"$dir/.staging_base_1").mkdirs()
      assertThrows[IllegalArgumentException](
        IndexCommit.promoteStaged(spark, dir, "base_1"))
      rm(s"$dir/.staging_base_1")
    } finally rm(dir)
  }

  test("vacuum(grace=0) hammering concurrently with a live compaction never breaks serving") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_vac_hammer_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 2 =!= 0), dir)
      Retrieval.compactPostingsIndex(spark, dir)
      Retrieval.vacuumPostingsIndex(spark, dir)
      val terms = Retrieval.QueryTerms
      val want = rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))

      // a second delta to fold, with the SAME live rows (dup doc ids
      // are fine for conjunctive counts? no — use disjoint new ids and
      // recompute the expectation after the fold)
      Retrieval.appendPostingsDelta(
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id") + 900000L as "doc_id", col("text")), dir)
      val wantAfter =
        rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))

      @volatile var compactErr: Option[Throwable] = None
      val t = new Thread(() => {
        try Retrieval.compactPostingsIndex(spark, dir)
        catch { case e: Throwable => compactErr = Some(e) }
      })
      t.start()
      // do-while: on a fast box the compaction thread can finish
      // before the first isAlive check — at least one vacuum must run
      // for the assert below to mean anything
      var vacuums = 0
      while ({
        Retrieval.vacuumPostingsIndex(spark, dir)
        vacuums += 1
        t.isAlive
      }) ()
      t.join()
      assert(compactErr.isEmpty,
        s"compaction failed under concurrent vacuum: $compactErr")
      assert(vacuums > 0)
      // one more vacuum post-flip reclaims what the fold superseded
      Retrieval.vacuumPostingsIndex(spark, dir)
      val (base, _) = IndexCommit.resolve(spark, dir)
      assert(new java.io.File(base).exists(),
        s"pointer names a missing dir: $base")
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === wantAfter)
      assert(wantAfter !== want, "vacuous: second delta changed nothing")
    } finally rm(dir)
  }

  test("vector compactors stage+promote the same way (IVF-PQ fold under grace-0 vacuum mid-states)") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_vac_vec_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.compactIvfPqIndex(spark, dir)
      Similarity.vacuumVectorIndex(spark, dir)
      val queries = emb.filter(col("vec_id") < 8)
      val want = rows(Similarity.ivfPqTopKStored(spark, dir, queries, 3))
      assert(want.nonEmpty)

      // mid-write staging fold is invisible to a grace-0 vacuum
      val staged = IndexCommit.stageBase(spark, dir, "base_1")
      new java.io.File(s"$staged/codes").mkdirs()
      Similarity.vacuumVectorIndex(spark, dir)
      assert(names(dir).contains(".staging_base_1"))
      rm(staged)

      // a real append + fold under the new protocol: compaction is
      // maintenance, not semantics — serving before and after the
      // fold+vacuum must be row-identical
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0)
          .withColumn("vec_id", col("vec_id") + 400000L))
      val wantAfterAppend =
        rows(Similarity.ivfPqTopKStored(spark, dir, queries, 3))
      Similarity.compactIvfPqIndex(spark, dir)
      Similarity.vacuumVectorIndex(spark, dir)
      assert(IndexCommit.resolve(spark, dir)._1.endsWith("base_1"))
      assert(!names(dir).contains("base_0"))
      assert(rows(Similarity.ivfPqTopKStored(spark, dir, queries, 3))
        === wantAfterAppend)
    } finally rm(dir)
  }
}
