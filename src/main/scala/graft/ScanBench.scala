package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-benchmark for the GraphAr connector's raw scan throughput
  * (the chunk decode path, isolated from the relational operators that
  * `Bench` measures). Args: [sfDir] [reps]; prints one line per scan.
  *
  * Used to validate connector read-path changes (e.g. the vectorized
  * parquet reader) — full-scan aggregates are decode-bound, so decode
  * wins show up directly here.
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-scan-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val yaml = sources.graphar.GraphArQueries.fixture(spark, sfDir)
    val e = spark.read.format("graphar").option("path", yaml)
      .option("src", "Part").option("type", "link").option("dst", "Part").load()
    val v = spark.read.format("graphar").option("path", yaml)
      .option("type", "Part").load()

    def time(label: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCANBENCH $label best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("edge_full_scan_agg") {
      e.agg(sum("quantity"), sum("_graphArDstIndex")).collect()
    }
    time("vertex_full_scan_agg") {
      v.agg(sum("p_retailprice"), max("p_name"), sum("p_size")).collect()
    }
    time("vertex_prop_filter") {
      v.filter(col("p_partkey") >= 100L && col("p_partkey") <= 180L).collect()
    }
    spark.stop()
  }
}
