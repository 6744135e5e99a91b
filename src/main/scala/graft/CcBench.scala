package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphArGraph, GraphOps}

/** One-query harness: connected components on an existing ScaleBench /
  * ZipfBench fixture, in a fresh JVM — for isolating the component
  * algorithm's cost from whole-suite JVM effects. Args: [fixtureYaml] [reps].
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val yaml = args.headOption.getOrElse("/tmp/graft_graphar/sf0.1_x100/ScaleGraph.yaml")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .appName("graft-cc-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraphArGraph(spark, yaml)
    val e = graft.meta.GraphArMeta.loadGraph(yaml,
      spark.sessionState.newHadoopConf()).edges.head
    val es = g.edgesStd(e.srcType, e.edgeType, e.dstType).persist()
    println(s"CC edges=${es.count()}")
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      val n = GraphOps.connectedComponents(spark, es).count()
      println(f"CC components n=$n t=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
