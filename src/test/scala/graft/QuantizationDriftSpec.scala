package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Codebook drift observability: appends code new vectors against the
  * FROZEN codebook by design, so representation error under corpus
  * drift grows silently — [[Similarity.quantizationDrift]] surfaces it
  * per generation and [[Similarity.retrainRecommended]] turns it into
  * the documented rebuild signal.
  */
class QuantizationDriftSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("quantization error is flat for in-distribution appends and jumps for drifted ones; retrain signal fires only on drift") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_qdrift_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfPqIndex(emb.filter(col("vec_id") % 2 === 0), dir)

      // in-distribution append: same corpus distribution (the odds) —
      // the frozen codebook represents it as well as it does the base
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      val flat = Similarity.quantizationDrift(spark, dir, emb)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(flat.contains("base") && flat.size === 2)
      val (baseMse, deltaMse) = (flat("base"), (flat - "base").values.head)
      assert(baseMse > 0, "degenerate fixture: zero base error")
      assert(deltaMse < 2.0 * baseMse,
        s"in-distribution delta read as drifted: $deltaMse vs base $baseMse")
      assert(!Similarity.retrainRecommended(spark, dir, emb))

      // DRIFTED append: every component shifted by +3 — far off the
      // frozen codewords; the metric must move and the signal fire
      val drifted = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 400000L).as("vec_id"),
          transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
      Similarity.appendIvfPqDelta(spark, dir, drifted)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(drifted)
      val rows = Similarity.quantizationDrift(spark, dir, corpus)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(rows.size === 3)
      val worst = (rows - "base").values.max
      assert(worst > Similarity.RetrainDriftThreshold * rows("base"),
        s"drifted delta error $worst did not exceed the threshold over base ${rows("base")}")
      assert(Similarity.retrainRecommended(spark, dir, corpus))

      // the signal is threshold-parameterized: an absurd threshold
      // silences it (the knob is real, not cosmetic)
      assert(!Similarity.retrainRecommended(spark, dir, corpus,
        threshold = 1e9))
    } finally rm(dir)
  }

  test("the trained-state sidecar decodes as member means for the drift metric") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_qdrift_tr_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfPqTrainedIndex(emb, dir)
      val base = Similarity.quantizationDrift(spark, dir, emb).collect()
      assert(base.length === 1 && base.head.getString(0) === "base")
      // Lloyd-trained codewords are member means — reconstruction
      // error exists but is bounded (sanity: not NaN/zero/huge)
      val mse = base.head.getDouble(2)
      assert(mse > 0 && mse < 64.0, s"implausible trained-state mse $mse")
      assert(!Similarity.retrainRecommended(spark, dir, emb))
    } finally rm(dir)
  }
}
