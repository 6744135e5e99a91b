package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Sample-based Lloyd codebook training at rung scale: builds the
  * trained IVF-PQ layout over an existing VectorScaleBench corpus with
  * `trainEvery` sampling (default sized to a ≤100k training set — the
  * production codebook-training budget), times the build, and probes
  * recall@10 for trained ADC and trained+rerank across nProbe 1/4/8 —
  * the numbers to set against the round-11 FULL-corpus training tables
  * in docs/SCALE.md (whose 2M builds spent ~95% of 4,400-4,700 s in
  * the two full-corpus Lloyd passes).
  *
  * Usage: runMain graft.SampledTrainProbe [base] [trainEvery]
  *   base       corpus dir holding `embeddings` (default
  *              /tmp/graft_vecscale/2.0m/clustered)
  *   trainEvery sampling modulus (default nVecs/100000, min 1)
  */
object SampledTrainProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_vecscale/2.0m/clustered")
    val spark = SparkSession.builder()
      .appName("graft-sampled-train").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val emb = spark.read.parquet(s"$base/embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = emb.count()
    val modulo = math.max(40L, nVecs / 256L).toInt // VectorScaleBench's nlist knob
    val trainEvery = if (args.length > 1) args(1).toInt
      else math.max(1L, nVecs / 100000L).toInt
    println(s"SAMPLED corpus $nVecs vectors, modulo=$modulo, " +
      s"trainEvery=$trainEvery (~${nVecs / trainEvery} training vectors)")

    val dir = s"$base/ivfpq_trained_sampled_idx"
    fs.delete(new Path(dir), true)
    val t0 = System.nanoTime()
    Similarity.writeIvfPqTrainedIndex(emb, dir, modulo,
      trainEvery = trainEvery)
    println(f"SAMPLED trained_sampled_build one=${(System.nanoTime() - t0) / 1e9}%.3f")

    val rq = emb.filter(col("vec_id") < 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rq.count()
    val t1 = System.nanoTime()
    val truth = Similarity.bruteForceTopK(emb, col("vec_id") < 64, 10)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    println(f"SAMPLED brute_truth one=${(System.nanoTime() - t1) / 1e9}%.3f")
    def recallTimed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val got = df.select(col("q_id"), col("n_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
      val secs = (System.nanoTime() - t) / 1e9
      val per = truth.keys.toSeq.map(q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size / 10.0)
      println(f"SAMPLED $label recall@10=${per.sum / per.size}%.3f wall=$secs%.3f")
    }
    Seq(1, 4, 8).foreach { np =>
      recallTimed(s"trained_sampled_np$np")(
        Similarity.ivfPqTrainedTopKStored(spark, dir, rq, 10, nProbe = np))
      recallTimed(s"trained_sampled_rerank_c50_np$np")(
        Similarity.ivfPqTrainedTopKRerankStored(spark, dir, emb, rq, 10,
          c = 50, nProbe = np))
    }
    spark.stop()
  }
}
