package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphQueries
import graft.sources.graphar.{GraphArMutations, GraphArWriter}

/** Measures the multi-type mutation claim: committing one edge type of
  * a multi-type graph costs one rewrite of THAT type only — the other
  * type's size is irrelevant (its data is referenced, not copied).
  * Builds a graph with a big type (lineitem × replicas) and a small
  * type (orders), then times per-type commits, staging, and the change
  * feed. Args: [sfDir] [replicas].
  */
object MultiTypeCostBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .appName("graft-multitype-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val v = GraphQueries.V.toLong
    val base = s"/tmp/graft_graphar/mmut_bench_${new java.io.File(sfDir).getName}_x$replicas"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)

    val big = Tables.t(spark, sfDir, "lineitem").select(
        expr(s"l_orderkey % $v").as("src0"),
        expr(s"l_partkey % $v").as("dst0"),
        col("l_quantity").as("quantity"))
      .crossJoin(spark.range(replicas).toDF("rep"))
      .select((col("src0") + col("rep") * v).as("src"),
        (col("dst0") + col("rep") * v).as("dst"), col("quantity"))
    val small = Tables.t(spark, sfDir, "orders").select(
      expr(s"o_orderkey % $v").as("src"),
      expr(s"o_custkey % $v").as("dst"),
      col("o_totalprice").as("quantity"))
    val nBig = big.count(); val nSmall = small.count()
    def spec(t: String) = GraphArWriter.EdgeSpec("Part", t, "Part",
      srcVertexCount = v * replicas, dstVertexCount = v * replicas,
      chunkSize = 1 << 18, srcChunkSize = 1 << 13, dstChunkSize = 1 << 13)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"MMUT $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    println(s"MMUT big=$nBig edges, small=$nSmall edges")
    time("initEdgeTypes (both tables)") {
      GraphArMutations.initEdgeTypes(spark, base, "Bench",
        Seq((big, spec("big")), (small, spec("small"))))
    }
    import spark.implicits._
    val delta = (0 until 1000).map(i => (i.toLong % v, (i * 7).toLong % v, 1.0))
      .toDF("src", "dst", "quantity")
    time("commitEdgesOf SMALL type (add 1k)") {
      GraphArMutations.addEdgesOf(spark, base, "Part_small_Part", delta)
    }
    time("commitEdgesOf BIG type (add 1k)") {
      GraphArMutations.addEdgesOf(spark, base, "Part_big_Part", delta)
    }
    time("stageDeltaOf SMALL (1k delta)") {
      GraphArMutations.stageDeltaOf(spark, base, "Part_small_Part",
        adds = Some(delta))
    }
    time("currentEdgesOf SMALL (fold+count)") {
      GraphArMutations.currentEdgesOf(spark, base, "Part_small_Part").count()
    }
    time("compactDeltasOf SMALL") {
      GraphArMutations.compactDeltasOf(spark, base, "Part_small_Part")
    }
    time("edgeChanges SMALL v0->v1 (count)") {
      GraphArMutations.edgeChanges(spark, base, 0L, 1L,
        Some("Part_small_Part")).count()
    }
    spark.stop()
  }
}
