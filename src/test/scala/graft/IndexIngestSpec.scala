package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.streaming.IndexIngest

/** Exactly-once semantics of the foreachBatch index-ingest sink under
  * Structured Streaming's epoch replay: a re-delivered epoch must not
  * double-index its documents, whether the first attempt committed
  * (skip) or crashed mid-write (retry in place).
  */
class IndexIngestSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def deltaDirsOf(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("delta_")).toSet

  test("a replayed epoch after a COMMITTED append is skipped") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_ingest_" + java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      val batch = docs.filter(col("doc_id") % 2 =!= 0)
      IndexIngest.appendBatch(dir)(batch, 0L)
      val want = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      val gens = deltaDirsOf(dir)
      assert(gens.size === 1)
      // Spark re-delivers epoch 0 (e.g. driver restart before the
      // checkpoint commit): same rows, same single generation —
      // a double append would double tf/hits and add a dir
      IndexIngest.appendBatch(dir)(batch, 0L)
      assert(deltaDirsOf(dir) === gens)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === want)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("IVF sink: a replayed epoch is skipped; probe equals monolithic") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = "/tmp/graft_vingest_" + java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      val batch = emb.filter(col("vec_id") % 2 =!= 0)
      IndexIngest.appendIvfBatch(dir)(batch, 0L)
      IndexIngest.appendIvfBatch(dir)(batch, 0L) // replayed epoch
      Similarity.writeIvfIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3, nProbe = 2))
        === rows(Similarity.ivfTopKStored(spark, ref, queries, 3, nProbe = 2)),
        "replayed epoch double-indexed or ingest diverged from monolithic")
      assert(deltaDirsOf(dir).size === 1)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("IVF-PQ sink: a replayed epoch is skipped; probe equals monolithic") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = "/tmp/graft_pqingest_" + java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      val batch = emb.filter(col("vec_id") % 2 =!= 0)
      IndexIngest.appendIvfPqBatch(dir)(batch, 0L)
      IndexIngest.appendIvfPqBatch(dir)(batch, 0L) // replayed epoch
      Similarity.writeIvfPqIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      assert(rows(Similarity.ivfPqTopKStored(spark, dir, queries, 3, nProbe = 2))
        === rows(Similarity.ivfPqTopKStored(spark, ref, queries, 3, nProbe = 2)),
        "replayed epoch double-indexed or ingest diverged from monolithic")
      assert(deltaDirsOf(dir).size === 1)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("an empty ingest micro-batch never bricks the vector index") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val dir = "/tmp/graft_emptyb_" + java.util.UUID.randomUUID().toString.take(8)
    val pqDir = dir + "_pq"
    try {
      // a zero-row epoch writes a generation whose partitionBy output
      // would have NO parquet footer — yet its _SUCCESS lands, so the
      // generation is visible: without the empty-frame degradation
      // every later probe of the WHOLE index throws on schema inference
      Similarity.writeIvfIndex(emb, dir)
      val before = rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2))
      IndexIngest.appendIvfBatch(dir)(emb.filter(lit(false)), 0L)
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === before)
      Similarity.writeIvfPqIndex(emb, pqDir)
      val beforePq = rows(Similarity.ivfPqTopKStored(spark, pqDir, queries,
        3, nProbe = 2))
      IndexIngest.appendIvfPqBatch(pqDir)(emb.filter(lit(false)), 0L)
      assert(rows(Similarity.ivfPqTopKStored(spark, pqDir, queries, 3,
        nProbe = 2)) === beforePq)
      // direct empty appends take the same guarded write
      Similarity.appendIvfDelta(spark, dir, emb.filter(lit(false)))
      Similarity.appendIvfPqDelta(spark, pqDir, emb.filter(lit(false)))
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === before)
      assert(rows(Similarity.ivfPqTopKStored(spark, pqDir, queries, 3,
        nProbe = 2)) === beforePq)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(pqDir), true)
    }
  }

  test("CDC sink: replayed epochs converge — committed skip, crashed-append completion preserves the upsert") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_cdc_" + java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") < 40), dir)
      // one batch: delete doc 3, upsert doc 5 (delete + marked insert),
      // insert doc 100 (new)
      def cdc(df: org.apache.spark.sql.DataFrame, op: String) =
        df.select(col("doc_id"), col("text"), lit(op).as("_change_type"))
      val batch = cdc(docs.filter(col("doc_id").isin(3L, 5L)), "delete")
        .unionByName(cdc(docs.filter(col("doc_id") === 5L)
          .select(col("doc_id"),
            concat(col("text"), lit(" zzcdc")).as("text")), "insert"))
        .unionByName(cdc(docs.filter(col("doc_id") === 100L), "insert"))
      IndexIngest.applyCdcBatch(dir)(batch, 0L)
      val want = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      val marked = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Seq("zzcdc")))
      assert(marked.nonEmpty, "upsert marker absent — vacuous")
      val gens = deltaDirsOf(dir)
      // full replay of the committed epoch: no new generations, no drift
      IndexIngest.applyCdcBatch(dir)(batch, 0L)
      assert(deltaDirsOf(dir) === gens)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === want)

      // crash-mid-append replay: strip the append's commit (postings
      // dir gone, tag intact) — the replay must complete the SAME dir
      // without a second tombstone, or the upsert's new text would be
      // out-sequenced and fenced
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val appendDir = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("delta_") &&
          new java.io.File(f, "_epoch_0").exists()).head
      fs.delete(new org.apache.hadoop.fs.Path(
        appendDir.getPath + "/postings"), true)
      val tombsBefore = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("tomb_"))
      IndexIngest.applyCdcBatch(dir)(batch, 0L)
      assert(new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("tomb_")) === tombsBefore,
        "crashed-append replay wrote a second tombstone")
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Seq("zzcdc"))) === marked,
        "upsert lost across the crashed-append replay")
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === want)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("generation cap: maxIndexDeltas folds under ingest; folded epochs still replay-skip") {
    import graft.util.IndexCommit
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_ingestcap_" + java.util.UUID.randomUUID().toString.take(8)
    def live(): Int = IndexCommit.deltaDirs(spark, dir,
      IndexCommit.resolve(spark, dir)._2, commitSub = Some("postings")).size
    try {
      spark.conf.set("spark.graft.maxIndexDeltas", "2")
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 4 === 0), dir)
      (1 to 3).foreach { e =>
        IndexIngest.appendBatch(dir)(docs.filter(col("doc_id") % 4 === e), e.toLong)
        assert(live() < 2, s"cap not enforced after epoch $e: ${live()} live")
      }
      // the cap folded mid-stream: the pointer advanced past generations
      assert(IndexCommit.resolve(spark, dir)._2 > 0, "no fold ever ran")
      // served rows equal a fresh whole-corpus build
      val ref = dir + "_ref"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        Retrieval.writePostingsIndex(docs, ref)
        assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
          Retrieval.QueryTerms))
          === rows(Retrieval.conjunctiveSearchStored(spark, ref,
            Retrieval.QueryTerms)))
      } finally fs.delete(new org.apache.hadoop.fs.Path(ref), true)
      // a replayed epoch whose generation was FOLDED is still skipped:
      // the folded dir (and its epoch tag) stays on disk until vacuum
      val before = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      val liveBefore = live()
      IndexIngest.appendBatch(dir)(docs.filter(col("doc_id") % 4 === 1), 1L)
      assert(live() === liveBefore, "replayed folded epoch re-appended")
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms)) === before)
    } finally {
      spark.conf.unset("spark.graft.maxIndexDeltas")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("the _POLICY generation cap travels with the index (binds without session conf)") {
    import graft.util.IndexCommit
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_policy_" + java.util.UUID.randomUUID().toString.take(8)
    def live(): Int = IndexCommit.deltaDirs(spark, dir,
      IndexCommit.resolve(spark, dir)._2, commitSub = Some("postings")).size
    try {
      assert(spark.conf.getOption("spark.graft.maxIndexDeltas").isEmpty)
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 4 === 0), dir)
      IndexCommit.setPolicy(spark, dir, Some(2))
      assert(IndexCommit.policyMaxDeltas(spark, dir) === Some(2))
      (1 to 3).foreach { e =>
        IndexIngest.appendBatch(dir)(docs.filter(col("doc_id") % 4 === e), e.toLong)
        assert(live() < 2, s"stored policy not enforced after epoch $e")
      }
      assert(IndexCommit.resolve(spark, dir)._2 > 0, "no fold ever ran")
      // clearing the policy stops the folding (back to manual-only)
      IndexCommit.clearPolicy(spark, dir)
      assert(IndexCommit.policyMaxDeltas(spark, dir).isEmpty)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 4 === 1)
        .select(col("doc_id") + 100000L as "doc_id", col("text")), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 4 === 2)
        .select(col("doc_id") + 200000L as "doc_id", col("text")), dir)
      // epoch 3's delta survived the last fold (live was 1), plus the
      // two manual appends: 3 live generations, none folded
      assert(live() === 3, "cleared policy still folded")
      // a cap of 0 would never terminate folding usefully — refused
      intercept[IllegalArgumentException] {
        IndexCommit.setPolicy(spark, dir, Some(0))
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("generation cap applies to the vector layouts (IVF fold on append)") {
    import graft.operators.Similarity
    import graft.util.IndexCommit
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dir = "/tmp/graft_vcap_" + java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      spark.conf.set("spark.graft.maxIndexDeltas", "2")
      // base = evens so the frozen centroids (vec_id % 40 == 0) are the
      // same set a whole-corpus build derives — ref comparable below
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir, emb.filter(col("vec_id") % 4 === 1))
      Similarity.appendIvfDelta(spark, dir, emb.filter(col("vec_id") % 4 === 3))
      // the second append reached the cap and folded atomically
      assert(IndexCommit.resolve(spark, dir)._2 > 0, "no fold ran")
      assert(IndexCommit.deltaDirs(spark, dir,
        IndexCommit.resolve(spark, dir)._2, commitSub = Some("vectors")).isEmpty)
      Similarity.writeIvfIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3, nProbe = 2))
        === rows(Similarity.ivfTopKStored(spark, ref, queries, 3, nProbe = 2)))
    } finally {
      spark.conf.unset("spark.graft.maxIndexDeltas")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("a replayed epoch after a CRASHED append retries in place (invisible dir reused)") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val dir = "/tmp/graft_ingest_" + java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 2 === 0), dir)
      // simulate the crash: epoch 0's dir exists with its tag and a
      // HALF-WRITTEN state (doclens only, no postings/_SUCCESS) — the
      // generation must be invisible to probes
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val half = new org.apache.hadoop.fs.Path(s"$dir/delta_0")
      fs.mkdirs(half)
      fs.create(new org.apache.hadoop.fs.Path(half, "_epoch_0"), true).close()
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), lit(1L).as("dl"))
        .write.mode("overwrite").parquet(s"$dir/delta_0/doclens")
      val baseOnly = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      // the replay completes the SAME dir — no id burned, now visible
      IndexIngest.appendBatch(dir)(docs.filter(col("doc_id") % 2 =!= 0), 0L)
      assert(deltaDirsOf(dir) === Set("delta_0"))
      val after = rows(Retrieval.conjunctiveSearchStored(spark, dir,
        Retrieval.QueryTerms))
      assert(after !== baseOnly, "retried epoch is still invisible")
      // and equals a fresh whole-corpus build
      val ref = dir + "_ref"
      try {
        Retrieval.writePostingsIndex(docs, ref)
        assert(after === rows(Retrieval.conjunctiveSearchStored(spark, ref,
          Retrieval.QueryTerms)))
      } finally fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
