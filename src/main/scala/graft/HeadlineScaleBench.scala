package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphArGraph, GraphOps, GraphQueries}
import graft.sources.graphar.GraphArWriter

/** Reference-scale HEADLINE rung: the 8 BASELINE.md queries on a
  * replicated GraphAr graph of ~58M edges — the same order as the
  * reference's LDBC SF-30 run (person-knows-person ≈ 47M edges), where
  * its published numbers are vertex_count 5.87 s, edge_count 71 s,
  * max_degree 757 s, degree_distribution 849 s, path_exist 64 s
  * (BASELINE.md, `docs/benchmarks/ldbc-sf-30.csv`). The sf0.1 rung the
  * per-round bench runs (~600K edges) sits at Spark's job-launch floor
  * for half the rows; this rung is where the scaling claims are
  * falsifiable against the reference's own large-graph column.
  *
  * Fixture: the sf0.1 Part vertex table and lineitem edge multigraph
  * replicated `replicas`× into disjoint id ranges (the [[ScaleBench]]
  * construction, plus the vertex table so vertex_count/three_vertices
  * are real scans of a 2M-row vertex set), written ONCE as a real
  * GraphAr graph (CSR-sorted edges, offset sidecars, count metadata).
  * Queries anchored at a vertex (one_hop/two_hop/path_exist) use
  * replica 0's anchors — the replicas are disjoint components, but
  * every frontier join still runs against the FULL 58M-edge table
  * (partition pruning aside, which is exactly what is being measured).
  *
  * Args: [replicas] [reps] [only=<label>] — `only=` is the fresh-JVM
  * isolation mode (`scripts/headline_isolated.sh` launches one sbt JVM
  * per query, the SCALE.md round-6 contamination lesson).
  */
object HeadlineScaleBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(100)
    val reps = if (args.length > 1 && args(1).forall(_.isDigit))
      args(1).toInt else 2
    val only = args.collectFirst { case a if a.startsWith("only=") =>
      a.stripPrefix("only=") }
    val spark = SparkSession.builder()
      .appName("graft-headline-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = "/root/testdata/sf0.1"
    val v = GraphQueries.V.toLong
    val base = s"/tmp/graft_graphar/headline_x$replicas"
    val yaml = s"$base/HeadlineGraph.yaml"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
      val t0 = System.nanoTime()
      val part = Tables.t(spark, sfDir, "part")
      val nPart = part.count()
      val vparts = part
        .crossJoin(spark.range(replicas).toDF("rep"))
        .select((col("p_partkey") + col("rep") * nPart).as("p_partkey") +:
          part.columns.filter(_ != "p_partkey").map(col): _*)
        .orderBy(col("p_partkey"))
      GraphArWriter.writeVertices(vparts, base,
        GraphArWriter.VertexSpec("Part", chunkSize = 1 << 16,
          fileType = "parquet"))
      val li = Tables.t(spark, sfDir, "lineitem").select(
        expr(s"l_orderkey % $v").as("src0"),
        expr(s"l_partkey % $v").as("dst0"),
        col("l_quantity").as("quantity"))
      val edges = li
        .crossJoin(spark.range(replicas).toDF("rep"))
        .select((col("src0") + col("rep") * v).as("src"),
          (col("dst0") + col("rep") * v).as("dst"), col("quantity"))
      val n = GraphArWriter.writeEdges(edges, base,
        GraphArWriter.EdgeSpec("Part", "link", "Part",
          srcVertexCount = v * replicas, dstVertexCount = v * replicas,
          chunkSize = 1 << 18, srcChunkSize = 1 << 13, dstChunkSize = 1 << 13))
      GraphArWriter.writeGraphYaml(base, "HeadlineGraph", Seq("Part"),
        Seq("Part_link_Part"))
      fs.create(marker, true).close()
      println(f"HEADLINE fixture_build $n%d edges in ${(System.nanoTime() - t0) / 1e9}%.1f s at $base")
    }

    val g = GraphArGraph(spark, yaml)
    val root = GraphQueries.RootVid

    def time(label: String)(f: => Any): Unit = {
      if (only.exists(_ != label)) return
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"HEADLINE $label best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    time("vertex_count")(g.vertices("Part").count())
    time("edge_count")(g.edges("Part", "link", "Part").count())
    time("three_vertices")(g.vertices("Part").limit(3).collect())
    time("one_hop")(g.oneHop("Part", "link", "Part", root).count())
    time("two_hop")(g.twoHop("Part", "link", "Part", root).count())
    time("max_degree")(g.maxDegree("Part", "link", "Part").collect())
    time("degree_distribution")(
      g.degreeDistribution("Part", "link", "Part").count())
    time("path_exist") {
      val es = g.edgesStd("Part", "link", "Part").persist()
      try {
        val n = es.count()
        GraphOps.bfsLengthsAuto(spark, es, GraphQueries.bfsPairs,
          GraphQueries.bfsMaxDepth, edgeCount = n)
      } finally es.unpersist()
    }
    spark.stop()
  }
}
