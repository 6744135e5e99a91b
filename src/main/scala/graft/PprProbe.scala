package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphArGraph, GraphOps, GraphQueries}

/** Round-13 probe: pageRank vs personalizedPageRank on the ScaleBench
  * x10 graph — isolates the 32-core ppr anomaly seen in the scale run.
  * Usage: runMain graft.PprProbe [yaml] ; env SPARK_GRAFT_CPUS.
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val yaml = args.headOption.getOrElse(
      "/tmp/graft_graphar/sf0.1_x10/ScaleGraph.yaml")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraphArGraph(spark, yaml)
    val es = g.edgesStd("Part", "link", "Part").persist()
    es.count()
    def time(label: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[ppr-probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("pagerank")(GraphOps.pageRank(spark, es, iters = 10).count())
    time("ppr")(GraphOps.personalizedPageRank(spark, es,
      Seq(GraphQueries.RootVid)).count())
    spark.stop()
  }
}
