package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN-tier scale benchmark: a deterministic synthetic embedding
  * corpus far past the 6k-vector gate fixture, timing the stored
  * vector layouts' full story — build cost (the assignment/encode
  * aggregates), index FOOTPRINT (float vectors vs m-byte PQ codes —
  * the reason IVF-PQ exists), stored-probe serving, and the
  * delta-append / compact maintenance verbs. Args:
  * [vecsMillions] [reps] [only=<label>].
  *
  * Corpus synthesis is pure column work: dim d of vector id is
  * `pmod(hash(id, d), 1000)/500 − 1` — dense, deterministic, and
  * centroid-friendly (hash spreads directions; no planted structure).
  * nlist is held at ~256 clusters by deriving the centroid modulo
  * from the corpus size, the knob a real deployment tunes the same
  * way (nlist grows like √N, not with N).
  */
object VectorScaleBench {
  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toDouble).getOrElse(2.0)
    val reps = if (args.length > 1 && args(1).forall(_.isDigit)) args(1).toInt
      else 2
    val only = args.collectFirst { case a if a.startsWith("only=") =>
      a.stripPrefix("only=") }
    val nVecs = (millions * 1e6).toLong
    val dims = 64
    val modulo = math.max(40L, nVecs / 256L) // ~256 clusters at any rung
    val spark = SparkSession.builder()
      .appName("graft-vector-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = s"/tmp/graft_vecscale/${millions}m"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def synth(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (pmod(hash(col("vec_id"), d), lit(1000)).cast("float") /
            lit(500.0f) - lit(1.0f)).cast("float")))
      .select(col("vec_id"), col("embedding"))
    if (!fs.exists(marker)) {
      if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
      synth(spark.range(nVecs).toDF("vec_id"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/embeddings")
      fs.create(marker, true).close()
    }
    val emb = spark.read.parquet(s"$base/embeddings")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"VECSCALE corpus ${emb.count()} vectors, dims=$dims, " +
      s"modulo=$modulo (~${nVecs / modulo} clusters)")

    def time(label: String)(f: => Any): Unit =
      if (only.forall(_ == label)) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"VECSCALE $label best=${times.min}%.3f " +
          f"all=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    def sizeOf(p: String): Long =
      if (!fs.exists(new Path(p))) -1L
      else fs.getContentSummary(new Path(p)).getLength

    val ivfDir = s"$base/ivf_idx"
    val ivfpqDir = s"$base/ivfpq_idx"
    // fresh index roots: a prior run's append/compact left a LATEST
    // pointer, which the builders (correctly) refuse to rebuild over
    Seq(ivfDir, ivfpqDir).foreach(d =>
      fs.delete(new Path(d), true))
    val queries = emb.filter(col("vec_id") < 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()

    // builds are single-shot (they overwrite state; rep 2 would
    // measure an overwrite of a hot page cache) — reps=1 semantics
    // via fresh dirs per run is overkill; report the one-shot number
    val t0 = System.nanoTime()
    Similarity.writeIvfIndex(emb, ivfDir, modulo.toInt)
    println(f"VECSCALE ivf_build one=${(System.nanoTime() - t0) / 1e9}%.3f")
    val t1 = System.nanoTime()
    Similarity.writeIvfPqIndex(emb, ivfpqDir, modulo.toInt)
    println(f"VECSCALE ivfpq_build one=${(System.nanoTime() - t1) / 1e9}%.3f")
    println(s"VECSCALE ivf_vectors_bytes=${sizeOf(s"$ivfDir/vectors")}")
    println(s"VECSCALE ivfpq_codes_bytes=${sizeOf(s"$ivfpqDir/codes")}")

    time("brute_topk")(
      Similarity.bruteForceTopK(emb, col("vec_id") < 8, 10).count())
    time("ivf_stored_probe")(
      Similarity.ivfTopKStored(spark, ivfDir, queries, 10, nProbe = 2).count())
    time("ivfpq_stored_probe")(
      Similarity.ivfPqTopKStored(spark, ivfpqDir, queries, 10,
        nProbe = 2).count())

    // maintenance rung: 1% append (frozen sidecars), probe over
    // base+delta, fold, probe again — single-shot (state-mutating)
    val delta = synth(spark.range(nVecs, nVecs + nVecs / 100)
      .toDF("vec_id"))
    val t2 = System.nanoTime()
    Similarity.appendIvfPqDelta(spark, ivfpqDir, delta)
    println(f"VECSCALE ivfpq_append_1pct one=${(System.nanoTime() - t2) / 1e9}%.3f")
    time("ivfpq_probe_with_delta")(
      Similarity.ivfPqTopKStored(spark, ivfpqDir, queries, 10,
        nProbe = 2).count())
    val t3 = System.nanoTime()
    Similarity.compactIvfPqIndex(spark, ivfpqDir)
    println(f"VECSCALE ivfpq_compact one=${(System.nanoTime() - t3) / 1e9}%.3f")
    time("ivfpq_probe_compacted")(
      Similarity.ivfPqTopKStored(spark, ivfpqDir, queries, 10,
        nProbe = 2).count())

    spark.stop()
  }
}
