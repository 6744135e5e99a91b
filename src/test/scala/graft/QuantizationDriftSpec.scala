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

  test("residual layouts decode as centroid + residual codeword — the _LAYOUT marker picks the decode") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_qdrift_res_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfPqResidualIndex(emb, dir)
      val marked = Similarity.quantizationDrift(spark, dir, emb).collect()
      assert(marked.length === 1 && marked.head.getString(0) === "base")
      val residualMse = marked.head.getDouble(2)
      // independent recompute of the TRUE residual reconstruction
      // error (v̂ = assigned centroid + residual codeword, per
      // subspace) straight from the stored sidecars + codes
      val cent = spark.read.parquet(s"$dir/centroids")
        .select(col("c_id").as("cluster"), col("c_emb"))
      val rcb = spark.read.parquet(s"$dir/codebook")
        .withColumnRenamed("c_sub", "r_sub")
      val expected = spark.read.parquet(s"$dir/codes")
        .join(rcb, Seq("m", "c_id"))
        .join(cent, "cluster")
        .join(emb.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .withColumn("se",
          aggregate(
            zip_with(
              slice(col("embedding"), col("m") * 8 + 1, lit(8)),
              zip_with(
                transform(slice(col("c_emb"), col("m") * 8 + 1, lit(8)),
                  x => x.cast("double")),
                transform(col("r_sub"), x => x.cast("double")),
                (a, b) => a + b),
              (v, d) => (v.cast("double") - d) * (v.cast("double") - d)),
            lit(0.0), (a, b) => a + b))
        .groupBy(col("n_id")).agg(sum(col("se")).as("vse"))
        .agg(avg(col("vse"))).collect()(0).getDouble(0)
      assert(math.abs(residualMse - expected) < 1e-9 * math.max(1.0, expected),
        s"drift reported $residualMse, true residual reconstruction error $expected")
      // hiding the marker reproduces the pre-round-12 misread (codes
      // decoded as absolute sub-vectors): the decode genuinely changes
      val f = new org.apache.hadoop.fs.Path(s"$dir/_LAYOUT")
      f.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(f, false)
      val misread = Similarity.quantizationDrift(spark, dir, emb)
        .collect().head.getDouble(2)
      assert(math.abs(misread - residualMse) > 1e-12,
        "the _LAYOUT marker did not change the decode")
      // and the retrain signal runs NPE-free on the residual layout
      Similarity.writeIvfPqResidualIndex(emb, dir + "_2")
      try assert(!Similarity.retrainRecommended(spark, dir + "_2", emb))
      finally rm(dir + "_2")
    } finally rm(dir)
  }

  test("a generation absent from the supplied corpus degrades to no-evidence, never NPE") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_qdrift_null_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      val evens = emb.filter(col("vec_id") % 2 === 0)
      Similarity.writeIvfPqIndex(evens, dir)
      Similarity.appendIvfPqDelta(spark, dir,
        emb.filter(col("vec_id") % 2 =!= 0))
      // caller passes a corpus missing every delta vector: that
      // generation reports n_vectors=0 with a NULL mse...
      val rows = Similarity.quantizationDrift(spark, dir, evens).collect()
      val deltaRow = rows.find(_.getString(0) != "base").get
      assert(deltaRow.getLong(1) === 0L && deltaRow.isNullAt(2))
      // ...and the signal treats it as no evidence instead of throwing
      assert(!Similarity.retrainRecommended(spark, dir, evens))
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
