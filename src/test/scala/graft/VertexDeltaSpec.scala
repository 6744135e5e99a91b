package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.graphar.{GraphArMutations, GraphArWriter}

/** Vertex-table delta log: property upserts/removes staged in O(delta),
  * folded over the snapshot at read time, compacted into one rewrite
  * that re-derives the synthetic index from the orderCol sort.
  */
class VertexDeltaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "score")
  }

  private def byId(d: DataFrame): Seq[(Long, String, Double)] =
    d.select("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sortBy(_._1)

  private val v0 = Seq((1L, "a", 1.0), (3L, "c", 3.0), (5L, "e", 5.0))

  private def fresh(): String = {
    val base = Files.createTempDirectory("gar_vdelta").toString
    GraphArMutations.initVertices(spark, base, df(v0), "People",
      GraphArWriter.VertexSpec("Person", chunkSize = 2), orderCol = "id")
    base
  }

  test("staged upserts and removes fold in sequence without a rewrite") {
    val base = fresh()
    // d0: update id=3, insert id=2
    GraphArMutations.stageVertexDelta(spark, base, "id",
      upserts = Some(df(Seq((3L, "c2", 30.0), (2L, "b", 2.0)))))
    // d1: remove id=1
    GraphArMutations.stageVertexDelta(spark, base, "id",
      removeKeys = Some(df(Seq((1L, "", 0.0))).select("id")))
    assert(byId(GraphArMutations.currentVertices(spark, base)) ==
      Seq((2L, "b", 2.0), (3L, "c2", 30.0), (5L, "e", 5.0)))
    // snapshot untouched: still v0 only
    assert(graft.streaming.GraphArSink.versions(spark, base) == Seq(0L))
  }

  test("compaction folds the log into one snapshot with re-derived index") {
    val base = fresh()
    GraphArMutations.stageVertexDelta(spark, base, "id",
      upserts = Some(df(Seq((2L, "b", 2.0)))),
      removeKeys = Some(df(Seq((5L, "", 0.0))).select("id")))
    val v = GraphArMutations.compactVertexDeltas(spark, base)
    assert(v == 1L)
    assert(GraphArMutations.stagedVertexDeltas(spark, base).isEmpty)
    // read the committed snapshot through the connector: index follows
    // the id sort (1->0, 2->1, 3->2)
    val snap = spark.read.format("graphar")
      .option("snapshotBase", base)
      .option("type", "Person").load()
    val rows = snap.select("_graphArVertexIndex", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("snapshot vertex commit refuses while the log is staged") {
    val base = fresh()
    GraphArMutations.stageVertexDelta(spark, base, "id",
      upserts = Some(df(Seq((9L, "i", 9.0)))))
    intercept[IllegalArgumentException] {
      GraphArMutations.upsertVertices(spark, base, df(Seq((7L, "g", 7.0))), "id")
    }
    assert(GraphArMutations.compactVertexDeltas(spark, base) == 1L)
  }

  test("streaming vertex delta ingest: stage per batch, compact on cadence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = fresh()
    val stream = MemoryStream[(Long, String, Double)](spark)
    val q = graft.streaming.GraphArSink.vertexDeltas(
      stream.toDF().toDF("id", "name", "score"), base, "id", compactEvery = 2)
      .option("checkpointLocation", s"$base/_ckpt").start()
    try {
      stream.addData((3L, "c2", 30.0)); q.processAllAvailable() // b0: staged
      assert(GraphArMutations.stagedVertexDeltas(spark, base).nonEmpty)
      assert(graft.streaming.GraphArSink.versions(spark, base) == Seq(0L))
      stream.addData((2L, "b", 2.0)); q.processAllAvailable()   // b1: compacts
      assert(GraphArMutations.stagedVertexDeltas(spark, base).isEmpty)
      assert(graft.streaming.GraphArSink.versions(spark, base) == Seq(0L, 1L))
      stream.addData((6L, "f", 6.0)); q.processAllAvailable()   // b2: staged
      // read-your-writes: snapshot ⊕ still-staged batch 2
      assert(byId(GraphArMutations.currentVertices(spark, base)) ==
        Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c2", 30.0),
          (5L, "e", 5.0), (6L, "f", 6.0)))
    } finally q.stop()
  }

  test("vertexChanges reports updates as delete-of-old plus insert-of-new") {
    val base = fresh()
    GraphArMutations.stageVertexDelta(spark, base, "id",
      upserts = Some(df(Seq((3L, "c2", 30.0), (2L, "b", 2.0)))),
      removeKeys = Some(df(Seq((5L, "", 0.0))).select("id")))
    GraphArMutations.compactVertexDeltas(spark, base)
    val got = GraphArMutations.vertexChanges(spark, base, 0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSeq.sorted
    assert(got == Seq(
      (2L, "b", 2.0, "insert"),          // new key
      (3L, "c", 3.0, "delete"),          // updated key: old row out...
      (3L, "c2", 30.0, "insert"),        // ...new row in
      (5L, "e", 5.0, "delete")).sorted)  // removed key
  }

  test("initVertices refuses a base that already holds versions") {
    val base = fresh()
    intercept[IllegalArgumentException] {
      GraphArMutations.initVertices(spark, base, df(v0), "People",
        GraphArWriter.VertexSpec("Person", chunkSize = 2), orderCol = "id")
    }
  }

  test("upsertVertices rejects duplicate keys in the updates frame") {
    val base = fresh()
    intercept[IllegalArgumentException] {
      GraphArMutations.upsertVertices(spark, base,
        df(Seq((7L, "g", 7.0), (7L, "g2", 7.5))), "id")
    }
  }

  test("stage-time validation: schema, key column, orderCol consistency") {
    val base = fresh()
    intercept[IllegalArgumentException] {   // wrong upsert schema
      import spark.implicits._
      GraphArMutations.stageVertexDelta(spark, base, "id",
        upserts = Some(Seq((1L, "x")).toDF("id", "name")))
    }
    intercept[IllegalArgumentException] {   // removeKeys missing the key
      GraphArMutations.stageVertexDelta(spark, base, "id",
        removeKeys = Some(df(Seq((1L, "", 0.0))).select("name")))
    }
    GraphArMutations.stageVertexDelta(spark, base, "id",
      upserts = Some(df(Seq((8L, "h", 8.0)))))
    intercept[IllegalArgumentException] {   // orderCol must match the log
      GraphArMutations.stageVertexDelta(spark, base, "name",
        upserts = Some(df(Seq((9L, "i", 9.0)))))
    }
  }
}
