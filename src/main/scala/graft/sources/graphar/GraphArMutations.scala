package graft.sources.graphar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.meta.GraphArMeta
import graft.streaming.GraphArSink

/** Batch mutation verbs over a versioned GraphAr layout — add/remove
  * edges and vertex-table updates as NEW SNAPSHOT VERSIONS.
  *
  * GraphAr's chunked CSR layout is immutable (an inserted edge shifts
  * every later offset — the reference is strictly read-only,
  * graphar_catalog.cpp:61-76), so mutation is copy-on-write at the
  * snapshot level: read version N, apply the change, write the complete
  * result as `v(N+1)`, atomically repoint `LATEST` — the same commit
  * protocol and time-travel surface as the streaming sink
  * ([[GraphArSink]]); a crash mid-mutation leaves LATEST on version N.
  *
  * Scale shape: one mutation = one full rewrite of the edge table, so
  * the API is batch-amortized by design — accumulate a day's deltas and
  * commit once, exactly how immutable-layout tables (Iceberg/Delta
  * without manifests) handle churn. The rewrite itself is the writer's
  * distributed CSR sort (`repartitionAndSortWithinPartitions`, one task
  * per vertex-chunk part, optional task packing), and the union/anti
  * inputs shuffle only (src, dst, props) rows.
  */
object GraphArMutations {

  /** Bootstrap a versioned edge graph: writes `base/v0` and commits
    * LATEST — the batch twin of [[GraphArSink.edges]]. `edges` columns:
    * (src, dst, properties...). Returns the committed version (0).
    */
  def initEdges(spark: SparkSession, base: String, edges: DataFrame,
                graphName: String, spec: GraphArWriter.EdgeSpec): Long =
    writeVersion(spark, base, 0L, edges, graphName, spec)

  /** Append edges: version N+1 = version N ∪ `delta` (multiset union —
    * GraphAr edge tables are multigraphs; dedup in `delta` first if you
    * want set semantics). `delta` columns must match the edge table's
    * (src, dst, properties...). Ids beyond the declared vertex count
    * are rejected by the writer — grow `newVertexCount` explicitly when
    * the delta introduces new vertices.
    */
  def addEdges(spark: SparkSession, base: String, delta: DataFrame,
               newVertexCount: Option[Long] = None): Long =
    commitEdges(spark, base, cur => cur.unionByName(delta), newVertexCount)

  /** Remove every edge (all multigraph copies) whose (src, dst) appears
    * in `keys` — an anti-join, the relational form of edge deletion.
    */
  def removeEdges(spark: SparkSession, base: String, keys: DataFrame): Long =
    commitEdges(spark, base,
      cur => cur.join(keys.select(col("src"), col("dst")).distinct(),
        Seq("src", "dst"), "left_anti"))

  /** General copy-on-write edge commit: `mutate` sees version N's edge
    * table with standard (src, dst, properties...) names and returns
    * the complete next table. The graph must be the single-edge-type
    * shape the versioned sink writes. Returns the new version number.
    */
  def commitEdges(spark: SparkSession, base: String,
                  mutate: DataFrame => DataFrame,
                  newVertexCount: Option[Long] = None): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val curYaml = GraphArSink.latestYaml(spark, base)
    require(curYaml != null, s"no committed snapshot under $base — initEdges first")
    val info = GraphArMeta.loadGraph(curYaml, conf)
    require(info.edges.size == 1 && info.vertices.isEmpty,
      s"commitEdges mutates single-edge-type graphs (the versioned-sink " +
        s"layout); ${info.name} has ${info.vertices.size} vertex and " +
        s"${info.edges.size} edge types")
    val e = info.edges.head
    val al = e.adjLists.head
    val cur = spark.read.format("graphar").option("path", curYaml)
      .option("src", e.srcType).option("type", e.edgeType)
      .option("dst", e.dstType).load()
      .withColumnRenamed(GraphArMeta.SrcIndexCol, "src")
      .withColumnRenamed(GraphArMeta.DstIndexCol, "dst")
    val srcCount = e.adjList("src").map(e.alignedVertexCount(_, conf))
    val dstCount = e.adjList("dst").map(e.alignedVertexCount(_, conf))
    val declared = srcCount.orElse(dstCount).get
    val spec = GraphArWriter.EdgeSpec(e.srcType, e.edgeType, e.dstType,
      srcVertexCount = newVertexCount.getOrElse(srcCount.getOrElse(declared)),
      dstVertexCount = newVertexCount.getOrElse(dstCount.getOrElse(declared)),
      chunkSize = e.chunkSize,
      srcChunkSize = e.srcChunkSize, dstChunkSize = e.dstChunkSize,
      fileType = al.fileType, layouts = e.adjLists.map(_.alignedBy))
    val next = GraphArSink.versions(spark, base).max + 1
    writeVersion(spark, base, next, mutate(cur), info.name, spec)
  }

  /** Bootstrap a versioned vertex graph: writes `base/v0` and commits
    * LATEST — the batch twin of [[GraphArSink.vertices]]. Rows are
    * sorted by `orderCol` so `_graphArVertexIndex` is deterministic.
    */
  def initVertices(spark: SparkSession, base: String, rows: DataFrame,
                   graphName: String, spec: GraphArWriter.VertexSpec,
                   orderCol: String): Long =
    writeVertexVersion(spark, base, 0L, rows.orderBy(orderCol), graphName, spec)

  /** Property upsert: version N+1 = version N with `updates` rows
    * replacing same-key rows and novel-key rows appended — the standard
    * dimension-table maintenance verb, as a snapshot. Keys match on
    * `orderCol`, which also re-sorts the result so the vertex index
    * stays deterministic (ids of vertices AFTER an insertion point
    * shift, exactly like any re-written GraphAr vertex table — edge
    * tables referencing the old numbering belong to the old snapshot).
    */
  def upsertVertices(spark: SparkSession, base: String, updates: DataFrame,
                     orderCol: String): Long =
    commitVertices(spark, base, cur =>
      cur.join(updates.select(col(orderCol)), Seq(orderCol), "left_anti")
        .unionByName(updates), orderCol)

  /** Delete vertices whose `orderCol` key appears in `keys`. */
  def removeVertices(spark: SparkSession, base: String, keys: DataFrame,
                     orderCol: String): Long =
    commitVertices(spark, base,
      cur => cur.join(keys.select(col(orderCol)), Seq(orderCol), "left_anti"),
      orderCol)

  /** General copy-on-write vertex commit: `mutate` sees version N's
    * property columns (synthetic index dropped — it is derived from row
    * order, not stored identity) and returns the next table, re-sorted
    * by `orderCol` before writing.
    */
  def commitVertices(spark: SparkSession, base: String,
                     mutate: DataFrame => DataFrame, orderCol: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val curYaml = GraphArSink.latestYaml(spark, base)
    require(curYaml != null, s"no committed snapshot under $base — initVertices first")
    val info = GraphArMeta.loadGraph(curYaml, conf)
    require(info.vertices.size == 1 && info.edges.isEmpty,
      s"commitVertices mutates single-vertex-type graphs (the versioned-" +
        s"sink layout); ${info.name} has ${info.vertices.size} vertex and " +
        s"${info.edges.size} edge types")
    val v = info.vertices.head
    val cur = spark.read.format("graphar").option("path", curYaml)
      .option("type", v.vertexType).load()
      .drop(GraphArMeta.VertexIndexCol)
    val spec = GraphArWriter.VertexSpec(v.vertexType, v.chunkSize,
      v.propertyGroups.headOption.map(_.fileType).getOrElse("parquet"))
    val next = GraphArSink.versions(spark, base).max + 1
    writeVertexVersion(spark, base, next, mutate(cur).orderBy(orderCol),
      info.name, spec)
  }

  private def writeVertexVersion(spark: SparkSession, base: String,
                                 version: Long, rows: DataFrame,
                                 graphName: String,
                                 spec: GraphArWriter.VertexSpec): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = s"$base/v$version"
    GraphArWriter.writeVertices(rows, dir, spec)
    val yaml = GraphArWriter.writeGraphYaml(dir, graphName,
      Seq(spec.vertexType), Seq.empty, conf)
    GraphArSink.commitLatest(base, yaml, conf)
    version
  }

  private def writeVersion(spark: SparkSession, base: String, version: Long,
                           edges: DataFrame, graphName: String,
                           spec: GraphArWriter.EdgeSpec): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = s"$base/v$version"
    GraphArWriter.writeEdges(edges, dir, spec)
    val yaml = GraphArWriter.writeGraphYaml(dir, graphName, Seq.empty,
      Seq(spec.name), conf)
    GraphArSink.commitLatest(base, yaml, conf)
    version
  }
}
