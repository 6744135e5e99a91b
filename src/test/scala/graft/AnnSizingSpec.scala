package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins the auto-sized rerank width rule
  * (`c = min(cap, max(k, ceil(coverage × meanProbedClusterPop)))`) —
  * the executable form of the round-11 measurement that shortlist
  * width is the only knob moving coded-layout recall on clustered
  * corpora and must scale with cluster population (docs/SCALE.md).
  */
class AnnSizingSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("autoRerankWidth derives c from the probed clusters' stored populations under the documented rule") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_sizing_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfPqIndex(emb, dir)
      val queries = emb.filter(col("vec_id") < 6)
      val nProbe = 2
      // independent recompute of the probe set (each query's nProbe
      // nearest centroids under the same (cos DESC, c_id) order)...
      val centFixed = emb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("c_id"))
      val probed = queries.select(col("vec_id"), col("embedding"))
        .crossJoin(centFixed)
        .withColumn("ccos", Similarity.cosineSpec(col("embedding"), col("c_emb")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= nProbe)
        .select(col("c_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      // ...and of the probed clusters' mean population from the codes
      // table (rows / m)
      val meanPop = spark.read.parquet(s"$dir/codes")
        .filter(col("cluster").isin(probed.toSeq: _*))
        .groupBy(col("cluster")).agg((count(lit(1)) / 8).as("pop"))
        .agg(avg(col("pop"))).collect()(0).getDouble(0)
      val k = 3
      val coverage = 0.25
      val expected = math.min(4096,
        math.max(k, math.ceil(coverage * meanPop).toInt))
      val got = Similarity.autoRerankWidth(spark, dir, queries, k,
        nProbe = nProbe, coverage = coverage)
      assert(got === expected,
        s"sizing rule drifted: got $got, expected $expected (meanPop $meanPop)")
      // the floor and the cap both bind: a tiny coverage floors at k,
      // a tiny cap truncates to it
      assert(Similarity.autoRerankWidth(spark, dir, queries, k,
        nProbe = nProbe, coverage = 1e-9) === k)
      assert(Similarity.autoRerankWidth(spark, dir, queries, k,
        nProbe = nProbe, coverage = 1.0, cap = k + 1) === k + 1)
      // and the auto serving variant is exactly the manual call at the
      // derived width
      val auto = Similarity.ivfPqTopKRerankStoredAuto(spark, dir, emb,
        queries, k, nProbe = nProbe, coverage = coverage).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      val manual = Similarity.ivfPqTopKRerankStored(spark, dir, emb,
        queries, k, c = got, nProbe = nProbe).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      assert(auto === manual)
    } finally rm(dir)
  }
}
