package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.IndexIngest
import graft.util.IndexCommit

/** Probe-under-ingest gate for the vector index: readers concurrent
  * with the streaming ingest sink (and the mid-stream folds its
  * generation cap triggers) must always serve a CONSISTENT generation
  * prefix — the base plus some number of fully committed micro-batch
  * deltas — never a partially written one. The mechanism under test is
  * the `vectors/_SUCCESS` visibility point ([[IndexCommit.deltaDirs]]
  * filters on it) plus the staging+monotonic-pointer compaction
  * protocol; this spec drives them from a LIVE Structured Streaming
  * query instead of the batch verbs RetrievalCompactionSpec uses.
  */
class ProbeUnderIngestSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("IVF probes racing a live ingest stream (with mid-stream folds) serve exactly a committed-prefix state") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val id = java.util.UUID.randomUUID().toString.take(8)
    val live = s"/tmp/graft_probe_ingest_$id"
    val ref = s"/tmp/graft_probe_ingest_ref_$id"
    val feed = new java.io.File(s"/tmp/graft_probe_ingest_feed_$id")
    val ckpt = s"/tmp/graft_probe_ingest_ckpt_$id"
    require(feed.mkdirs())
    try {
      // four odd-id micro-batches (evens hold every %40==0 centroid
      // source, so the frozen centroids equal the full corpus's)
      val batches = Seq(1L, 3L, 5L, 7L).map(r =>
        emb.filter(col("vec_id") % 8 === r))

      // reference: the only states a reader may ever observe — the
      // base plus each committed batch prefix (folds are maintenance:
      // they must not change rows, so prefixes cover post-fold too)
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), ref)
      val states = scala.collection.mutable.Buffer(
        rows(Similarity.ivfTopKStored(spark, ref, queries, 3)))
      batches.foreach { b =>
        Similarity.appendIvfDelta(spark, ref, b)
        states += rows(Similarity.ivfTopKStored(spark, ref, queries, 3))
      }
      assert(states.distinct.size >= 2, "vacuous: batches never change the probe")

      // live index: same base; the stream appends one batch per
      // micro-batch; the STORED generation cap makes the sink fold
      // mid-stream (probe-during-compaction-during-ingest)
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), live)
      IndexCommit.setPolicy(spark, live, Some(2))
      batches.zipWithIndex.foreach { case (b, i) =>
        b.coalesce(1).write.mode("overwrite")
          .parquet(s"${feed.getPath}/.stage_$i")
        val part = new java.io.File(s"${feed.getPath}/.stage_$i")
          .listFiles().find(_.getName.endsWith(".parquet")).get
        require(part.renameTo(new java.io.File(feed, f"b$i%05d.parquet")))
      }
      val q = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed.getPath)
        .writeStream
        .foreachBatch(IndexIngest.appendIvfBatch(live) _)
        .option("checkpointLocation", ckpt)
        .start()
      val observed = scala.collection.mutable.Buffer.empty[Set[String]]
      try {
        while (q.isActive && (q.lastProgress == null ||
            observed.size < 40) &&
            (observed.isEmpty || observed.last != states.last)) {
          observed += rows(Similarity.ivfTopKStored(spark, live, queries, 3))
        }
        q.processAllAvailable()
      } finally q.stop()
      observed += rows(Similarity.ivfTopKStored(spark, live, queries, 3))

      // every racing probe saw one of the committed-prefix states —
      // no partial generation, no half-fold, nothing else
      observed.zipWithIndex.foreach { case (o, i) =>
        assert(states.contains(o),
          s"probe $i observed a state outside the committed prefixes " +
            s"(${o.size} rows; sizes allowed: ${states.map(_.size)})")
      }
      // the race was real (saw >1 state) and converged to the full set
      assert(observed.distinct.size >= 2,
        s"stream finished before any interleaving (${observed.size} probes)")
      assert(observed.last === states.last)
      // a fold actually ran mid-stream (the cap is 2, four deltas came)
      assert(IndexCommit.resolve(spark, live)._2 > 0, "no fold ever ran")
    } finally {
      rm(live); rm(ref); rm(ckpt)
      Option(feed.listFiles()).foreach(_.foreach(_.delete())); feed.delete()
    }
  }
}
