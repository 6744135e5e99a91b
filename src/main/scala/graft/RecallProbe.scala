package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Follow-up recall probe over ALREADY-BUILT VectorScaleBench indexes
  * (no builds — probes only): sweeps the exact-rerank shortlist width
  * `c` for the untrained and trained coded layouts on the clustered
  * rung, the knob the round-11 recall table shows is the only one that
  * moves coded-layout recall when clusters hold thousands of members
  * (ADC cannot order WITHIN a planted cluster, so recall ≈ what the
  * c-wide shortlist happens to cover — it must scale with the cluster
  * member count, not with nProbe).
  *
  * Usage: runMain graft.RecallProbe [base] [nProbe] [c,c,c...|auto]
  * (`auto` derives the width per layout via
  * [[Similarity.autoRerankWidth]] — the round-12 sizing rule — and
  * prints the width it chose.)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_vecscale/2.0m/clustered")
    val nProbe = if (args.length > 1) args(1).toInt else 4
    val cs = if (args.length > 2) args(2).split(',').toSeq
      else Seq("50", "200", "800")
    val spark = SparkSession.builder()
      .appName("graft-recall-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$base/embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val rq = emb.filter(col("vec_id") < 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rq.count()
    val truth = Similarity.bruteForceTopK(emb, col("vec_id") < 64, 10)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    def recallTimed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val got = df.select(col("q_id"), col("n_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
      val secs = (System.nanoTime() - t) / 1e9
      val per = truth.keys.toSeq.map(q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size / 10.0)
      println(f"PROBE $label recall@10=${per.sum / per.size}%.3f wall=$secs%.3f")
    }
    cs.foreach { cArg =>
      def widthFor(dir: String): Int =
        if (cArg != "auto") cArg.toInt
        else {
          val w = Similarity.autoRerankWidth(spark, dir, rq, 10,
            nProbe = nProbe)
          println(s"PROBE auto width for $dir at nProbe=$nProbe: c=$w")
          w
        }
      val cU = widthFor(s"$base/ivfpq_recall_idx")
      recallTimed(s"ivfpq_rerank_c${cArg}${if (cArg == "auto") s"=$cU" else ""}_np$nProbe")(
        Similarity.ivfPqTopKRerankStored(spark, s"$base/ivfpq_recall_idx",
          emb, rq, 10, c = cU, nProbe = nProbe))
      val cT = widthFor(s"$base/ivfpq_trained_idx")
      recallTimed(s"ivfpq_trained_rerank_c${cArg}${if (cArg == "auto") s"=$cT" else ""}_np$nProbe")(
        Similarity.ivfPqTrainedTopKRerankStored(spark,
          s"$base/ivfpq_trained_idx", emb, rq, 10, c = cT, nProbe = nProbe))
    }
    spark.stop()
  }
}
