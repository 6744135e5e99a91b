package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.graphar.GraphArWriter

/** Writer→connector round-trips across all three GraphAr file_types and
  * all seven property primitives, including nulls and multiple property
  * groups.
  */
class RoundTripSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sampleDf = {
    import spark.implicits._
    (0 until 100).map { i =>
      (i % 2 == 0, i, i.toLong * 1000, i.toFloat / 3, i.toDouble / 7,
        if (i % 10 == 0) null else s"s,$i\"q",
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i)))
    }.toDF("b", "i32", "i64", "f", "d", "s", "dt")
  }

  for (ft <- Seq("parquet", "csv", "orc")) {
    test(s"$ft vertex round-trip: all 7 types, nulls, 3 chunks, 2 groups") {
      val dir = Files.createTempDirectory(s"gar_$ft").toString
      GraphArWriter.writeVertices(sampleDf, dir,
        GraphArWriter.VertexSpec("T", chunkSize = 40, fileType = ft),
        groups = Seq("g1" -> Seq("b", "i32", "i64", "f"), "g2" -> Seq("d", "s", "dt")))
      GraphArWriter.writeGraphYaml(dir, "G", Seq("T"), Seq.empty)
      val back = spark.read.format("graphar")
        .option("path", s"$dir/G.yaml").option("type", "T").load()
      assert(back.count() === 100)
      // index continuity across chunks
      assert(back.agg(min(col("_graphArVertexIndex")), max(col("_graphArVertexIndex")))
        .collect()(0).toSeq === Seq(0L, 99L))
      val row41 = back.filter(col("_graphArVertexIndex") === 41L).collect()(0)
      assert(row41.getBoolean(1) === false)
      assert(row41.getInt(2) === 41)
      assert(row41.getLong(3) === 41000L)
      assert(row41.getString(6) === "s,41\"q")
      assert(row41.getDate(7).toLocalDate.toEpochDay === 19041L)
      // null round-trip (csv: empty string ambiguity documented — strings
      // stay non-null there)
      if (ft != "csv")
        assert(back.filter(col("_graphArVertexIndex") === 40L).collect()(0).isNullAt(6))
    }
  }

  test("orc edge round-trip with CSR seek") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gar_orc_e").toString
    val edges = Seq((0L, 1L, 1.5), (0L, 2L, 2.5), (1L, 2L, 3.5), (3L, 0L, 4.5))
      .toDF("src", "dst", "w")
    GraphArWriter.writeEdges(edges, dir,
      GraphArWriter.EdgeSpec("T", "e", "T", srcVertexCount = 4, dstVertexCount = 4,
        chunkSize = 2, srcChunkSize = 2, dstChunkSize = 2, fileType = "orc"))
    // vertices needed for a loadable graph yaml
    GraphArWriter.writeVertices((0 until 4).map(i => Tuple1(i)).toDF("x"), dir,
      GraphArWriter.VertexSpec("T", 4, "orc"))
    GraphArWriter.writeGraphYaml(dir, "G", Seq("T"), Seq("T_e_T"))
    val back = spark.read.format("graphar").option("path", s"$dir/G.yaml")
      .option("src", "T").option("type", "e").option("dst", "T").load()
    assert(back.count() === 4)
    val hop0 = back.filter(col("_graphArSrcIndex") === 0L)
      .select("_graphArDstIndex", "w").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(hop0 === Set((1L, 1.5), (2L, 2.5)))
    val hopDst = back.filter(col("_graphArDstIndex") === 2L)
      .select("_graphArSrcIndex").collect().map(_.getLong(0)).toSet
    assert(hopDst === Set(0L, 1L))
  }
}
