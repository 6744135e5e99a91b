package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.graphar.{GraphArMutations, GraphArWriter}
import graft.streaming.GraphArSink

/** Multi-edge-type mutation commits: one commit rewrites ONE type's
  * table; every other type is served by REFERENCE (absolute yaml prefix
  * into the older version's directory — no bytes copied). Per-type delta
  * logs stage and compact independently, and prune never deletes a
  * version dir a kept version still references.
  */
class MultiTypeMutationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nVerts = 20L
  private def spec(t: String) = GraphArWriter.EdgeSpec(
    "Person", t, "Person", srcVertexCount = nVerts, dstVertexCount = nVerts,
    chunkSize = 16, srcChunkSize = 8, dstChunkSize = 8)

  private def edgeDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private val knows0 = (0L until 15L).map(i => (i, (i + 1) % nVerts))
  private val likes0 = (0L until 10L).map(i => (i * 2 % nVerts, (i * 3 + 1) % nVerts))

  private def freshGraph(): String = {
    val base = Files.createTempDirectory("gar_multi").toString
    GraphArMutations.initEdgeTypes(spark, base, "Social",
      Seq((edgeDf(knows0), spec("knows")), (edgeDf(likes0), spec("likes"))))
    base
  }

  test("commit of one type leaves the other served by reference, not copy") {
    val base = freshGraph()
    val v = GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L), (18L, 19L))))
    assert(v == 1L)
    // knows reflects the mutation; likes is byte-identical to v0
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 ++ Seq((17L, 18L), (18L, 19L))).sorted)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == likes0.sorted)
    // the unchanged type's data dir does NOT exist under v1 — its yaml
    // references v0's files
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(base).getFileSystem(conf)
    assert(!fs.exists(new Path(s"$base/v1/edge/Person_likes_Person")))
    assert(fs.exists(new Path(s"$base/v1/edge/Person_knows_Person")))
    // time travel to v0 still sees the original knows table
    val v0 = spark.read.format("graphar")
      .option("snapshotBase", base).option("snapshot", "0")
      .option("src", "Person").option("type", "knows").option("dst", "Person")
      .load()
      .withColumnRenamed("_graphArSrcIndex", "src")
      .withColumnRenamed("_graphArDstIndex", "dst")
    assert(pairs(v0) == knows0.sorted)
  }

  test("references chain across versions and survive further commits") {
    val base = freshGraph()
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L))))                       // v1: likes -> v0
    GraphArMutations.removeEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((0L, 1L))))                         // v2: likes -> v0 still
    val v = GraphArMutations.addEdgesOf(spark, base, "Person_likes_Person",
      edgeDf(Seq((5L, 5L))))                         // v3: knows -> v2
    assert(v == 3L)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0.filterNot(_ == (0L, 1L)) :+ (17L, 18L)).sorted)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == (likes0 :+ (5L, 5L)).sorted)
  }

  test("per-type delta logs stage, fold, and compact independently") {
    val base = freshGraph()
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))))
    GraphArMutations.stageDeltaOf(spark, base, "Person_likes_Person",
      removeKeys = Some(edgeDf(Seq(likes0.head))))
    // each fold sees only its own log
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 :+ (11L, 13L)).sorted)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == likes0.filterNot(_ == likes0.head).sorted)
    // compacting knows retires ONLY its log and rewrites only its table
    val v = GraphArMutations.compactDeltasOf(spark, base, "Person_knows_Person")
    assert(v == 1L)
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").isEmpty)
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_likes_Person").size == 1)
    // likes' staged remove still folds, now over the new LATEST
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == likes0.filterNot(_ == likes0.head).sorted)
    // ... and compacts into v2 on its own
    assert(GraphArMutations.compactDeltasOf(spark, base, "Person_likes_Person") == 2L)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == likes0.filterNot(_ == likes0.head).sorted)
  }

  test("snapshot commit refuses while that type's delta log is staged") {
    val base = freshGraph()
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((1L, 2L)))))
    intercept[IllegalArgumentException] {
      GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
        edgeDf(Seq((3L, 4L))))
    }
    // the OTHER type is free to commit — its table is independent
    val v = GraphArMutations.addEdgesOf(spark, base, "Person_likes_Person",
      edgeDf(Seq((3L, 4L))))
    assert(v == 1L)
  }

  test("edgeChanges yields the net multiset diff between versions") {
    val base = freshGraph()
    // v1: add a duplicate of an existing edge and one new edge to knows
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq(knows0.head, (17L, 18L))))
    // v2: remove (1,2) from knows
    GraphArMutations.removeEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((1L, 2L))))
    def changes(from: Long, to: Long): Seq[(Long, Long, String)] =
      GraphArMutations.edgeChanges(spark, base, from, to,
        Some("Person_knows_Person"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted
    assert(changes(0L, 1L) ==
      Seq((knows0.head._1, knows0.head._2, "insert"), (17L, 18L, "insert")).sorted)
    assert(changes(1L, 2L) == Seq((1L, 2L, "delete")))
    // net diff across the whole history: dup-insert + new edge - removed
    assert(changes(0L, 2L) ==
      Seq((knows0.head._1, knows0.head._2, "insert"), (17L, 18L, "insert"),
        (1L, 2L, "delete")).sorted)
    // identical versions diff to empty
    assert(changes(2L, 2L).isEmpty)
    // changesSince spans the staged-but-uncompacted log: stage one more
    // add and the feed from v2 reports it without a compaction
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((9L, 9L)))))
    val since = GraphArMutations.changesSince(spark, base, 2L,
      Some("Person_knows_Person"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(since == Seq((9L, 9L, "insert")))
  }

  test("graph_changes TVF serves the change feed to SQL") {
    val base = freshGraph()
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L))))
    graft.graph.GraphTableFunctions.register(spark)
    val got = spark.sql(
      s"SELECT src, dst, _change_type FROM graph_changes('$base', 0, 1, " +
        "'Person_knows_Person')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((17L, 18L, "insert")))
    // the folded-view TVF spans snapshot + staged log, resolved fresh
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((18L, 19L)))))
    val cur = spark.sql(
      s"SELECT src, dst FROM graph_current_edges('$base', 'Person_knows_Person')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(cur == (knows0 ++ Seq((17L, 18L), (18L, 19L))).sorted)
  }

  test("maintainDegrees over the change feed matches a full recompute") {
    import org.apache.spark.sql.functions._
    val base = freshGraph()
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq(knows0.head, (17L, 18L), (17L, 19L))))
    GraphArMutations.removeEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((1L, 2L))))
    def fullDegrees(v: Long) = spark.read.format("graphar")
      .option("snapshotBase", base).option("snapshot", v.toString)
      .option("src", "Person").option("type", "knows").option("dst", "Person")
      .load()
      .groupBy(col("_graphArSrcIndex").as("grapharId"))
      .agg(count(lit(1)).as("degree"))
    val incr = GraphArMutations.maintainDegrees(fullDegrees(0L),
      GraphArMutations.edgeChanges(spark, base, 0L, 2L,
        Some("Person_knows_Person")))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical non-zero degrees; the incremental table additionally
    // keeps explicit zero rows for vertices whose last edge was removed
    assert(toMap(incr).filter(_._2 != 0L) == toMap(fullDegrees(2L)))
  }

  test("maintainComponents merges labels from an insert-only feed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // prev labeling: {0,1} -> 0, {2,3} -> 2, {4} -> 4 (undirected CCs)
    val prev = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L), (4L, 4L))
      .toDF("grapharId", "component")
    // inserts: 1-2 merges {0,1} with {2,3}; 5-4 brings in new id 5
    val feed = Seq((1L, 2L, "insert"), (5L, 4L, "insert"))
      .toDF("src", "dst", "_change_type")
    val got = GraphArMutations.maintainComponents(prev, feed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L))
    // a feed with deletes is refused — deletion can split a component
    intercept[IllegalArgumentException] {
      GraphArMutations.maintainComponents(prev,
        Seq((0L, 1L, "delete")).toDF("src", "dst", "_change_type"))
    }
  }

  test("a delta resurrected after compaction (crash before cleanup) stays dead") {
    val base = freshGraph()
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))))
    // snapshot the staged dir, compact (folds + deletes it), restore it —
    // simulating a crash between the compaction's commit and its cleanup
    val src = new java.io.File(s"$base/delta/Person_knows_Person/d0")
    val bak = new java.io.File(s"$base/d0_bak")
    org.apache.commons.io.FileUtils.copyDirectory(src, bak)
    assert(GraphArMutations.compactDeltasOf(spark, base, "Person_knows_Person") == 1L)
    org.apache.commons.io.FileUtils.copyDirectory(bak, src)
    // the resurrected delta was staged against v0; knows was rewritten at
    // v1, so readers must NOT re-apply it
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 :+ (11L, 13L)).sorted)
    // a snapshot commit is not blocked by the dead log
    val v = GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L))))
    assert(v == 2L)
    // the next compaction sweeps the dead dir and reports nothing staged
    assert(GraphArMutations.compactDeltasOf(spark, base, "Person_knows_Person") == -1L)
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").isEmpty)
  }

  test("replaying a batch-keyed stage is a no-op (streaming at-least-once)") {
    val base = freshGraph()
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))), seq = Some(7L))
    // replay of the same batch id must not stage a second copy
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))), seq = Some(7L))
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person")
      == Seq(7L))
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 :+ (11L, 13L)).sorted)
  }

  test("a batch replayed AFTER compaction deleted its staged dir is still a no-op") {
    val base = freshGraph()
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))), seq = Some(0L))
    // compaction folds d0 into v1 and deletes the staged dir — the seq's
    // only in-log record; the durable _MAX_SEQ watermark must survive
    assert(GraphArMutations.compactDeltasOf(spark, base, "Person_knows_Person") == 1L)
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").isEmpty)
    // crash-replay of batch 0 (stream checkpoint never committed): must
    // NOT re-stage adds the snapshot already contains
    GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((11L, 13L)))), seq = Some(0L))
    assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").isEmpty)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 :+ (11L, 13L)).sorted)
    // a LATER batch still stages normally, and auto-assigned seqs resume
    // past the watermark rather than colliding with retired numbers
    val s = GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((14L, 15L)))), seq = Some(1L))
    assert(s == 1L)
    val auto = GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
      adds = Some(edgeDf(Seq((15L, 16L)))))
    assert(auto == 2L)
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == (knows0 ++ Seq((11L, 13L), (14L, 15L), (15L, 16L))).sorted)
  }

  test("maintainComponents falls back to a full recompute past the pair cap") {
    import spark.implicits._
    val prev = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L), (4L, 4L))
      .toDF("grapharId", "component")
    val feed = Seq((1L, 2L, "insert"), (5L, 4L, "insert"))
      .toDF("src", "dst", "_change_type")
    // the full current edge set the fallback recomputes over: prev's
    // implied edges plus the feed's inserts
    val edges = Seq((0L, 1L), (2L, 3L), (1L, 2L), (5L, 4L)).toDF("src", "dst")
    // cap of 1 < the feed's 2 distinct merge pairs -> fallback path
    val got = GraphArMutations.maintainComponents(prev, feed,
      maxMergePairs = 1, fallbackEdges = Some(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L))
    // no fallback edges -> loud failure instead of a driver-sized collect
    intercept[IllegalArgumentException] {
      GraphArMutations.maintainComponents(prev, feed, maxMergePairs = 1)
    }
  }

  test("the stage that reaches spark.graft.maxStagedDeltas auto-compacts the log") {
    val base = freshGraph()
    spark.conf.set("spark.graft.maxStagedDeltas", "2")
    try {
      GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
        adds = Some(edgeDf(Seq((11L, 13L)))))
      assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").size == 1)
      // second stage crosses the threshold -> log folds into v1, retires
      GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
        adds = Some(edgeDf(Seq((14L, 15L)))))
      assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").isEmpty)
      assert(GraphArSink.versions(spark, base) == Seq(0L, 1L))
      assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
        == (knows0 ++ Seq((11L, 13L), (14L, 15L))).sorted)
      // opt-out: <= 0 disables the policy
      spark.conf.set("spark.graft.maxStagedDeltas", "0")
      (0 until 3).foreach { _ =>
        GraphArMutations.stageDeltaOf(spark, base, "Person_knows_Person",
          adds = Some(edgeDf(Seq((16L, 17L)))))
      }
      assert(GraphArMutations.stagedDeltasOf(spark, base, "Person_knows_Person").size == 3)
    } finally spark.conf.unset("spark.graft.maxStagedDeltas")
  }

  test("full graph: vertex-type commit rewrites one table, references vertices AND edges") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = Files.createTempDirectory("gar_full").toString
    val people = (0L until 10L).map(i => (i, s"p$i", i * 10.0)).toDF("pid", "pname", "score")
    GraphArMutations.initGraph(spark, base, "Full",
      vertexTables = Seq((people,
        GraphArWriter.VertexSpec("Person", chunkSize = 4), "pid")),
      edgeTables = Seq((edgeDf(knows0), spec("knows"))))
    // property-only upsert: key set unchanged -> vertex indexes stable
    val v = GraphArMutations.upsertVerticesOf(spark, base, "Person",
      Seq((3L, "p3", 999.0), (7L, "p7", 777.0)).toDF("pid", "pname", "score"), "pid")
    assert(v == 1L)
    val yaml = GraphArSink.latestYaml(spark, base)
    val back = spark.read.format("graphar").option("path", yaml)
      .option("type", "Person").load()
    assert(back.filter(col("pid") === 3L).collect()(0).getAs[Double]("score") === 999.0)
    assert(back.filter(col("pid") === 0L).collect()(0).getAs[Double]("score") === 0.0)
    // index stability under property-only upsert
    assert(back.filter(col("pid") === 7L).collect()(0)
      .getAs[Long]("_graphArVertexIndex") === 7L)
    // the edge table is served by zero-copy reference — no copy under v1
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(base).getFileSystem(conf)
    assert(!fs.exists(new Path(s"$base/v1/edge/Person_knows_Person")))
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == knows0.sorted)
    // edge commit on the same graph references the vertex table back
    val v2 = GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L))))
    assert(v2 == 2L)
    assert(!fs.exists(new Path(s"$base/v2/vertex/Person")))
    val back2 = spark.read.format("graphar")
      .option("path", GraphArSink.latestYaml(spark, base))
      .option("type", "Person").load()
    assert(back2.filter(col("pid") === 3L).collect()(0).getAs[Double]("score") === 999.0)
    // time travel: v0 still serves the original property values
    val v0 = spark.read.format("graphar")
      .option("snapshotBase", base).option("snapshot", "0")
      .option("type", "Person").load()
    assert(v0.filter(col("pid") === 3L).collect()(0).getAs[Double]("score") === 30.0)
  }

  test("per-type vertex delta logs stage, fold, and compact independently") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = Files.createTempDirectory("gar_vtyped").toString
    val people = (0L until 8L).map(i => (i, i * 1.0)).toDF("pid", "score")
    val orgs = (0L until 5L).map(i => (i, s"org$i")).toDF("oid", "oname")
    GraphArMutations.initGraph(spark, base, "TwoV",
      vertexTables = Seq(
        (people, GraphArWriter.VertexSpec("Person", chunkSize = 4), "pid"),
        (orgs, GraphArWriter.VertexSpec("Org", chunkSize = 4), "oid")),
      edgeTables = Seq((edgeDf(knows0), spec("knows"))))
    // each type stages against ITS OWN log
    GraphArMutations.stageVertexDeltaOf(spark, base, "Person", "pid",
      upserts = Some(Seq((3L, 333.0)).toDF("pid", "score")))
    GraphArMutations.stageVertexDeltaOf(spark, base, "Org", "oid",
      removeKeys = Some(Seq(Tuple1(4L)).toDF("oid")))
    def score(df: org.apache.spark.sql.DataFrame, id: Long): Double =
      df.filter(col("pid") === id).collect()(0).getAs[Double]("score")
    assert(score(GraphArMutations.currentVerticesOf(spark, base, "Person"), 3L) === 333.0)
    assert(GraphArMutations.currentVerticesOf(spark, base, "Org").count() === 4L)
    // compacting Person retires ONLY its log; Org's delta still folds
    val v = GraphArMutations.compactVertexDeltasOf(spark, base, "Person")
    assert(v == 1L)
    assert(GraphArMutations.stagedVertexDeltasOf(spark, base, "Person").isEmpty)
    assert(GraphArMutations.stagedVertexDeltasOf(spark, base, "Org").size == 1)
    // Person's snapshot carries the upsert; Org still references v0 data
    val back = spark.read.format("graphar")
      .option("path", GraphArSink.latestYaml(spark, base))
      .option("type", "Person").load()
    assert(score(back, 3L) === 333.0)
    assert(GraphArMutations.currentVerticesOf(spark, base, "Org").count() === 4L)
    // Org compacts into v2 on its own; the edge table never rewrote
    assert(GraphArMutations.compactVertexDeltasOf(spark, base, "Org") == 2L)
    assert(GraphArMutations.currentVerticesOf(spark, base, "Org").count() === 4L)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(base).getFileSystem(conf)
    assert(!fs.exists(new Path(s"$base/v1/edge/Person_knows_Person")))
    assert(!fs.exists(new Path(s"$base/v2/edge/Person_knows_Person")))
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_knows_Person"))
      == knows0.sorted)
    // a snapshot commit refuses while that type's log is staged
    GraphArMutations.stageVertexDeltaOf(spark, base, "Person", "pid",
      upserts = Some(Seq((1L, 111.0)).toDF("pid", "score")))
    intercept[IllegalArgumentException] {
      GraphArMutations.upsertVerticesOf(spark, base, "Person",
        Seq((2L, 222.0)).toDF("pid", "score"), "pid")
    }
    // the OTHER type commits freely
    assert(GraphArMutations.upsertVerticesOf(spark, base, "Org",
      Seq((0L, "zero")).toDF("oid", "oname"), "oid") == 3L)
  }

  test("prune keeps a version dir that a kept version still references") {
    val base = freshGraph()
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((17L, 18L))))                       // v1: likes -> v0
    GraphArMutations.addEdgesOf(spark, base, "Person_knows_Person",
      edgeDf(Seq((18L, 19L))))                       // v2: likes -> v0
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(base).getFileSystem(conf)
    GraphArSink.prune(spark, base, keep = 1)
    // v0 holds likes' only copy — must survive; v1 is prunable
    assert(fs.exists(new Path(s"$base/v0")))
    assert(!fs.exists(new Path(s"$base/v1")))
    assert(pairs(GraphArMutations.currentEdgesOf(spark, base, "Person_likes_Person"))
      == likes0.sorted)
  }
}
