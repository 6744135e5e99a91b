package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphArGraph, GraphOps}
import graft.sources.graphar.GraphArWriter

/** `id IN (...)` pushdown (multi-value offset-range seek) and the
  * twoHop frontier-seek plan built on it. The IN filter is RESIDUAL in
  * Spark by design — these tests pin that the seek planning can only
  * cut I/O, never change rows, including out-of-range ids, the
  * per-chunk covering-slice merge, and the dense-frontier fallback.
  */
class InSeekSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 200 vertices, out-degree 3 each, edge chunkSize 16 → 38 adjacency
  // chunks: a 3-seek frontier passes the twoHop density guard (2·3 < 38)
  private val nVerts = 200L
  private lazy val edges: Seq[(Long, Long)] =
    (0L until nVerts).flatMap { s =>
      Seq((s, (s * 7 + 1) % nVerts), (s, (s * 13 + 3) % nVerts),
        (s, (s * 29 + 11) % nVerts))
    }

  private lazy val yaml: String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("gar_inseek").toString
    GraphArWriter.writeEdges(edges.toDF("src", "dst"), dir,
      GraphArWriter.EdgeSpec("T", "e", "T", srcVertexCount = nVerts,
        dstVertexCount = nVerts, chunkSize = 16, srcChunkSize = 64,
        dstChunkSize = 64, fileType = "parquet"))
    GraphArWriter.writeVertices((0L until nVerts).map(Tuple1(_)).toDF("x"),
      dir, GraphArWriter.VertexSpec("T", 64, "parquet"))
    GraphArWriter.writeGraphYaml(dir, "G", Seq("T"), Seq("T_e_T"))
    s"$dir/G.yaml"
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("edge src IN seek: pushed, pruned, and row-identical") {
    val g = GraphArGraph(spark, yaml)
    val es = g.edgesStd("T", "e", "T")
    // includes duplicates-in-source ids and out-of-range ids
    val vids = Seq(3L, 77L, 150L, -5L, nVerts + 9)
    val seek = es.filter(col("src").isin(vids: _*))
    val p = planOf(seek)
    assert(p.contains("pushedIdIn=(_graphArSrcIndex"),
      s"IN not pushed as seek in:\n$p")
    val got = seek.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = edges.filter(e => vids.contains(e._1)).sorted
    assert(got.toSeq === want)
    // chunk pruning: the seek plan must read fewer partitions than the
    // 38-chunk full scan (3 in-range ids touch ≤6 chunks)
    seek.collect()
    val scan = seek.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.contains("BatchScan")).get
    val rows = scan.metrics("numOutputRows").value
    assert(rows < edges.size,
      s"seek scan emitted $rows rows — no pruning vs ${edges.size} total")
  }

  test("vertex index IN seek: pushed and row-identical") {
    val g = GraphArGraph(spark, yaml)
    val v = g.vertices("T")
    val vids = Seq(0L, 63L, 64L, 199L, 999L)
    val seek = v.filter(col("_graphArVertexIndex").isin(vids: _*))
    val p = planOf(seek)
    assert(p.contains("pushedIdIn=(_graphArVertexIndex"),
      s"IN not pushed as seek in:\n$p")
    val got = seek.select(col("_graphArVertexIndex")).collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(0L, 63L, 64L, 199L))
  }

  test("IN above the seek cap stays a (correct) full scan") {
    spark.conf.set("spark.graft.seek.maxInValues", "2")
    try {
      val g = GraphArGraph(spark, yaml)
      val es = g.edgesStd("T", "e", "T")
      val vids = Seq(3L, 77L, 150L)
      val seek = es.filter(col("src").isin(vids: _*))
      val p = planOf(seek)
      assert(!p.contains("pushedIdIn"), s"cap not honored in:\n$p")
      val got = seek.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === edges.filter(e => vids.contains(e._1)).sorted)
    } finally spark.conf.unset("spark.graft.seek.maxInValues")
  }

  test("twoHop seek plan == generic plan (exact multiset, dup-preserving)") {
    val g = GraphArGraph(spark, yaml)
    for (vid <- Seq(0L, 42L, 199L)) {
      val seek = g.twoHop("T", "e", "T", vid)
      assert(planOf(seek).contains("pushedIdIn"),
        s"sparse frontier (deg 3, 38 chunks) should take the seek plan")
      val gen = GraphOps.twoHop(g.edgesStd("T", "e", "T"), vid)
      val a = seek.groupBy("src", "dst").count()
      val b = gen.groupBy("src", "dst").count()
      assert(a.count() === b.count())
      assert(a.join(b, Seq("src", "dst", "count"), "full_outer").count()
        === a.count(), s"twoHop seek/generic multiset mismatch at vid=$vid")
    }
  }

  test("twoHop dense-frontier fallback keeps the generic plan") {
    val g = GraphArGraph(spark, yaml)
    spark.conf.set("spark.graft.twoHop.seekFrontierMax", "0")
    try {
      val p = planOf(g.twoHop("T", "e", "T", 42L))
      assert(!p.contains("pushedIdIn"), "conf=0 must disable the seek path")
    } finally spark.conf.unset("spark.graft.twoHop.seekFrontierMax")
  }

  test("oneMoreHop seek plan == generic plan (exact multiset)") {
    val g = GraphArGraph(spark, yaml)
    for (vid <- Seq(0L, 42L, 199L)) {
      val seek = g.oneMoreHop("T", "e", "T", vid)
      assert(planOf(seek).contains("pushedIdIn"),
        s"sparse frontier (deg 3, 38 chunks) should take the seek plan")
      val gen = GraphOps.oneMoreHop(g.edgesStd("T", "e", "T"), vid)
      val a = seek.groupBy("src", "dst").count()
      val b = gen.groupBy("src", "dst").count()
      assert(a.count() === b.count())
      assert(a.join(b, Seq("src", "dst", "count"), "full_outer").count()
        === a.count(), s"oneMoreHop seek/generic multiset mismatch at vid=$vid")
    }
  }

  test("oneMoreHop conf=0 fallback keeps the generic plan") {
    val g = GraphArGraph(spark, yaml)
    spark.conf.set("spark.graft.twoHop.seekFrontierMax", "0")
    try {
      val p = planOf(g.oneMoreHop("T", "e", "T", 42L))
      assert(!p.contains("pushedIdIn"), "conf=0 must disable the seek path")
    } finally spark.conf.unset("spark.graft.twoHop.seekFrontierMax")
  }
}
