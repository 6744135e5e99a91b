package graft.sources.graphar

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.graph.GraphQueries
import graft.meta.GraphArMeta

/** Correctness-gate wiring for the GraphAr connector: writes a GraphAr
  * graph derived from the testdata parquet (once per sf dir), reads it
  * back through `format("graphar")`, and checks results against DuckDB
  * running equivalent SQL on the ORIGINAL parquet — an end-to-end
  * write→read round-trip verified by an independent engine.
  *
  * Graph: vertices = `part` table ordered by p_partkey (vertex index =
  * rank-1); edges = the same lineitem-derived multigraph as GraphQueries
  * with l_quantity as an edge property. Small chunk sizes on purpose so
  * sf0.01 already exercises multi-chunk, multi-part layouts.
  */
object GraphArQueries {

  private val conf = new Configuration()

  /** Build (once) the GraphAr fixture for an sf dir; returns the graph
    * yaml path. Deterministic location derived from the sf name.
    */
  def fixture(spark: SparkSession, sfDir: String): String = synchronized {
    // full-path hash: basename-only fixture keys would reuse a stale
    // graph when two data dirs share a basename
    val canonical = new java.io.File(sfDir).getCanonicalPath
    // "b2" = fixture layout revision (edge chunk_size 2048 → 32768; b1
    // added bloom sidecars): a cached pre-revision fixture must rebuild,
    // not be reused
    val name = new java.io.File(sfDir).getName + "_b2_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val yaml = s"$base/TestGraph.yaml"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return yaml
    // no marker but leftovers → a previous build died mid-write; start clean
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)

    val part = t(spark, sfDir, "part").orderBy(col("p_partkey"))
    GraphArWriter.writeVertices(part, base,
      GraphArWriter.VertexSpec("Part", chunkSize = 512, fileType = "parquet",
        // p_name is unsorted high-cardinality: min/max stats can't prune
        // point lookups on it, the per-chunk bloom sidecar can
        bloomCols = Seq("p_name")))

    val edges = t(spark, sfDir, "lineitem").select(
      expr(s"l_orderkey % ${GraphQueries.V}").as("src"),
      expr(s"l_partkey % ${GraphQueries.V}").as("dst"),
      col("l_quantity").as("quantity"))
    // chunk_size 32768 (was 2048): at sf0.1 the 2048-row layout spread
    // 586k edges over 287 adjacency chunk FILES — every full-edge scan
    // (two_hop's second hop, path_exist's materialize) paid 287 parquet
    // opens + footer reads + vectorized-reader inits; the guide-§6
    // small-files tax, measured at ~2 ms/file. 32768 rows/chunk keeps
    // offset-seek point reads cheap (one_hop decodes ≤32k rows) while a
    // full scan opens 18 files. Results are layout-independent (the
    // writer sorts by (src,dst) globally; chunking only re-bins rows).
    GraphArWriter.writeEdges(edges, base,
      GraphArWriter.EdgeSpec("Part", "link", "Part",
        srcVertexCount = GraphQueries.V, dstVertexCount = GraphQueries.V,
        chunkSize = 32768, srcChunkSize = 1024, dstChunkSize = 1024,
        fileType = "parquet"))
    GraphArWriter.writeGraphYaml(base, "TestGraph", Seq("Part"), Seq("Part_link_Part"))
    fs.create(marker, true).close()
    yaml
  }

  /** Build (once) a versioned mutation fixture: v0 = the lineitem edge
    * multigraph, v1 = v0 plus a deterministic delta (rescaled key pairs,
    * quantity+100), v2 = v1 minus every (src, dst) with src % 41 = 0 —
    * an init → addEdges → removeEdges history whose every state is
    * re-derivable by the oracle from lineitem alone.
    */
  def mutationFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_mut_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val v = GraphQueries.V
    val li = t(spark, sfDir, "lineitem")
    val baseEdges = li.select(
      expr(s"l_orderkey % $v").as("src"),
      expr(s"l_partkey % $v").as("dst"),
      col("l_quantity").as("quantity"))
    GraphArMutations.initEdges(spark, base, baseEdges, "MutGraph",
      GraphArWriter.EdgeSpec("Part", "link", "Part",
        srcVertexCount = v, dstVertexCount = v,
        chunkSize = 2048, srcChunkSize = 1024, dstChunkSize = 1024))
    val delta = li.filter(expr("l_orderkey % 97 = 0")).select(
      expr(s"(l_orderkey * 7) % $v").as("src"),
      expr(s"(l_partkey * 3) % $v").as("dst"),
      (col("l_quantity") + 100).as("quantity"))
    GraphArMutations.addEdges(spark, base, delta)
    // removal keys: every present pair whose src is a multiple of 41 —
    // anti-join semantics drop all multigraph copies of each key
    GraphArMutations.removeEdges(spark, base,
      baseEdges.unionByName(delta).filter(col("src") % 41 === 0)
        .select(col("src"), col("dst")))
    fs.create(marker, true).close()
    base
  }

  /** Build (once) a versioned MULTI-edge-type fixture: v0 holds two edge
    * types (`link` from lineitem, `ship` from orders) sharing the Part
    * vertex space; v1 mutates ONLY `link` (addEdgesOf), leaving `ship`
    * served by zero-copy reference into v0's files; a staged per-type
    * delta then removes `ship` keys with src % 53 = 0 WITHOUT a snapshot
    * commit. Every state is re-derivable by the oracle from the raw
    * parquet.
    */
  def multiTypeFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_mmut_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val v = GraphQueries.V
    val link = t(spark, sfDir, "lineitem").select(
      expr(s"l_orderkey % $v").as("src"),
      expr(s"l_partkey % $v").as("dst"),
      col("l_quantity").as("quantity"))
    val ship = t(spark, sfDir, "orders").select(
      expr(s"o_orderkey % $v").as("src"),
      expr(s"o_custkey % $v").as("dst"),
      col("o_totalprice").as("price"))
    def spec(t: String) = GraphArWriter.EdgeSpec("Part", t, "Part",
      srcVertexCount = v, dstVertexCount = v,
      chunkSize = 2048, srcChunkSize = 1024, dstChunkSize = 1024)
    GraphArMutations.initEdgeTypes(spark, base, "MultiGraph",
      Seq((link, spec("link")), (ship, spec("ship"))))
    val delta = t(spark, sfDir, "lineitem")
      .filter(expr("l_orderkey % 89 = 0")).select(
        expr(s"(l_orderkey * 11) % $v").as("src"),
        expr(s"(l_partkey * 5) % $v").as("dst"),
        (col("l_quantity") + 50).as("quantity"))
    GraphArMutations.addEdgesOf(spark, base, "Part_link_Part", delta)
    GraphArMutations.stageDeltaOf(spark, base, "Part_ship_Part",
      removeKeys = Some(ship.filter(col("src") % 53 === 0)
        .select(col("src"), col("dst"))))
    fs.create(marker, true).close()
    base
  }

  /** Build (once) a fixture exercising the two property primitives the
    * main fixture lacks: `bool` and `date`, written through the CSV
    * chunk codec (the least-covered decode path — parquet/orc are
    * format-library-backed; CSV bool/date parsing is ours). Dates are
    * derived from o_orderkey, NOT from the timestamp column, so both
    * engines compute them with zero timezone sensitivity; a sliver of
    * null dates exercises CSV null decode under a date filter.
    */
  def typedFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_typed_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val yaml = s"$base/TypedGraph.yaml"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return yaml
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val rows = t(spark, sfDir, "orders").orderBy(col("o_orderkey")).select(
      col("o_orderkey"),
      (col("o_orderkey") % 3 === 0).as("flag"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(date_add(lit(java.sql.Date.valueOf("1992-01-01")),
          (col("o_orderkey") % 2000).cast("int"))).as("odate"),
      col("o_totalprice"))
    GraphArWriter.writeVertices(rows, base,
      GraphArWriter.VertexSpec("Order", chunkSize = 512, fileType = "csv"),
      groups = Seq("keys" -> Seq("o_orderkey", "o_totalprice"),
        "typed" -> Seq("flag", "odate")))
    GraphArWriter.writeGraphYaml(base, "TypedGraph", Seq("Order"), Seq.empty)
    fs.create(marker, true).close()
    yaml
  }

  /** Build (once) a fixture through the STREAMING delta-ingest sink
    * ([[graft.streaming.GraphArSink.edgeDeltas]]): v0 from lineitem,
    * then three micro-batches of deterministic lineitem-derived deltas
    * streamed through a MemoryStream with `compactEvery = 2` — so the
    * final state is one compacted snapshot (v1 = v0 ∪ d0 ∪ d1) PLUS one
    * still-staged delta (d2), exercising both the compacted and the
    * staged read path under the oracle.
    */
  /** Versioned edge graph whose live log has absorbed one SQL
    * `DELETE FROM <catalog>.\`Part_link_Part.edge\` WHERE <key preds>`
    * — exercises the whole chain: catalog resolution → SupportsDelete →
    * key-filter translation → staged remove delta → currentEdges fold.
    * The oracle recomputes the same edge set with the predicate negated.
    */
  def sqlDeleteFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_sqldel_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val v = GraphQueries.V
    val li = t(spark, sfDir, "lineitem")
    GraphArMutations.initEdges(spark, base,
      li.select(expr(s"l_orderkey % $v").as("src"),
        expr(s"l_partkey % $v").as("dst"),
        col("l_quantity").as("quantity")),
      "SqlDeleteGraph",
      GraphArWriter.EdgeSpec("Part", "link", "Part",
        srcVertexCount = v, dstVertexCount = v,
        chunkSize = 2048, srcChunkSize = 1024, dstChunkSize = 1024))
    val cat = "gdel_" + Integer.toHexString(canonical.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraphArCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.snapshotBase", base)
    spark.sql(s"DELETE FROM $cat.`Part_link_Part.edge` " +
      "WHERE `_graphArSrcIndex` < 400 AND `_graphArDstIndex` >= 1024")
    fs.create(marker, true).close()
    base
  }

  /** Versioned VERTEX graph whose live log has absorbed one SQL
    * `UPDATE <catalog>.\`Part.vertex\` SET … WHERE …` — the whole
    * chain: catalog resolution → SupportsRowLevelOperations →
    * delta-based rewrite (changed rows only) → staged upsert delta →
    * currentVertices fold. The vertex key defaults to the first
    * property (p_partkey). Mirrors [[sqlDeleteFixture]] for the DML
    * triangle's UPDATE corner.
    */
  def sqlUpdateFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_squpd_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    GraphArMutations.initVertices(spark, base, t(spark, sfDir, "part"),
      "SqlUpdateGraph", GraphArWriter.VertexSpec("Part", chunkSize = 512),
      "p_partkey")
    val cat = "gupd_" + Integer.toHexString(canonical.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraphArCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.snapshotBase", base)
    spark.sql(s"UPDATE $cat.`Part.vertex` " +
      "SET p_retailprice = p_retailprice * 2 WHERE p_size > 40")
    fs.create(marker, true).close()
    base
  }

  def streamDeltaFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_sdelta_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val v = GraphQueries.V
    val li = t(spark, sfDir, "lineitem")
    GraphArMutations.initEdges(spark, base,
      li.select(expr(s"l_orderkey % $v").as("src"),
        expr(s"l_partkey % $v").as("dst"),
        col("l_quantity").as("quantity")),
      "StreamGraph",
      GraphArWriter.EdgeSpec("Part", "link", "Part",
        srcVertexCount = v, dstVertexCount = v,
        chunkSize = 2048, srcChunkSize = 1024, dstChunkSize = 1024))
    // delta batch k: the l_orderkey % 101 = k slice, keys rescaled per
    // batch — tiny (O(|lineitem|/101)) so driver-side addData is fine
    def delta(k: Int): Seq[(Long, Long, Double)] =
      li.filter(expr(s"l_orderkey % 101 = $k")).select(
          expr(s"(l_orderkey * ${7 + k}) % $v"),
          expr(s"(l_partkey * ${3 + k}) % $v"),
          col("l_quantity") + 200 + k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    import spark.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)](spark)
    val q = graft.streaming.GraphArSink.edgeDeltas(
      stream.toDF().toDF("src", "dst", "quantity"), base, compactEvery = 2)
      .option("checkpointLocation", s"$base/_ckpt").start()
    try {
      (0 until 3).foreach { k =>
        stream.addData(delta(k)); q.processAllAvailable()
      }
    } finally q.stop()
    fs.create(marker, true).close()
    base
  }

  /** Build (once) a versioned FULL graph (Part vertices + link edges in
    * ONE snapshot lineage) and commit a vertex-table mutation: v0 =
    * part-table vertices + lineitem edges; v1 = upsert doubling
    * p_retailprice where p_size > 40 (property-only — key set unchanged,
    * so vertex indexes stay stable and the edge table, served zero-copy
    * from v0, remains consistent).
    */
  def fullGraphFixture(spark: SparkSession, sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_full_" +
      Integer.toHexString(canonical.hashCode)
    val base = s"/tmp/graft_graphar/$name"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(conf)
    if (fs.exists(marker)) return base
    if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
    val v = GraphQueries.V
    val part = t(spark, sfDir, "part")
    val edges = t(spark, sfDir, "lineitem").select(
      expr(s"l_orderkey % $v").as("src"),
      expr(s"l_partkey % $v").as("dst"),
      col("l_quantity").as("quantity"))
    GraphArMutations.initGraph(spark, base, "FullGraph",
      vertexTables = Seq((part,
        GraphArWriter.VertexSpec("Part", chunkSize = 512), "p_partkey")),
      edgeTables = Seq((edges,
        GraphArWriter.EdgeSpec("Part", "link", "Part",
          srcVertexCount = v, dstVertexCount = v,
          chunkSize = 2048, srcChunkSize = 1024, dstChunkSize = 1024))))
    GraphArMutations.upsertVerticesOf(spark, base, "Part",
      part.filter(col("p_size") > 40)
        .withColumn("p_retailprice", col("p_retailprice") * 2), "p_partkey")
    fs.create(marker, true).close()
    base
  }

  def vertices(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graphar").option("path", fixture(spark, sfDir))
      .option("type", "Part").load()

  def edges(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graphar").option("path", fixture(spark, sfDir))
      .option("src", "Part").option("type", "link").option("dst", "Part").load()

  /** Vertex SQL shape shared by several oracles. */
  private val vertexSql =
    """SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS "_graphArVertexIndex",
      |  p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part""".stripMargin
  private val edgeSql =
    s"""SELECT l_orderkey % ${GraphQueries.V} AS "_graphArSrcIndex",
       |  l_partkey % ${GraphQueries.V} AS "_graphArDstIndex",
       |  l_quantity AS quantity FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full vertex scan: schema flattening + synthetic index round-trip
    "ga_vertices" -> { (s, d) => vertices(s, d) },
    // point lookup: chunk pruning + row slice (reference read_vertices.cpp:98-108)
    "ga_vertex_lookup" -> { (s, d) =>
      vertices(s, d).filter(col("_graphArVertexIndex") === 123L)
    },
    // projection pushdown: narrow read
    "ga_vertices_proj" -> { (s, d) =>
      vertices(s, d).select(col("_graphArVertexIndex"), col("p_name"))
        .filter(col("_graphArVertexIndex") < 100L)
    },
    // counts served from metadata via aggregate pushdown
    "ga_vertex_count" -> { (s, d) =>
      vertices(s, d).agg(count(lit(1)).as("n_vertices"))
    },
    "ga_edge_count" -> { (s, d) =>
      edges(s, d).agg(count(lit(1)).as("n_edges"))
    },
    // full edge scan incl. property-group zip
    "ga_edges" -> { (s, d) => edges(s, d) },
    // CSR seek by source vertex (ordered_by_source offsets)
    "ga_one_hop" -> { (s, d) =>
      edges(s, d).filter(col("_graphArSrcIndex") === GraphQueries.RootVid)
    },
    // CSR seek by destination vertex (ordered_by_dest layout choice)
    "ga_dst_lookup" -> { (s, d) =>
      edges(s, d).filter(col("_graphArDstIndex") === 15L)
    },
    // P3 property-predicate pushdown (reference read_vertices.cpp:109-114):
    // p_partkey is sorted across chunks → footer-stats chunk skip; p_size
    // exercises the per-row test on the surviving chunk(s)
    "ga_prop_filter" -> { (s, d) =>
      vertices(s, d).filter(
        col("p_partkey") >= 100L && col("p_partkey") <= 180L && col("p_size") >= 20)
    },
    // point lookup on the UNSORTED p_name column: footer min/max stats
    // can't prune it (every chunk's string range spans the probe), the
    // per-chunk bloom sidecar skips all but the matching/fpp chunks.
    // The probe value is data-derived (p_name of partkey 42) so the same
    // query text works at every sf; the driver-side lookup is one row.
    "ga_bloom_lookup" -> { (s, d) =>
      val probe = t(s, d, "part").filter(col("p_partkey") === 42L)
        .select(col("p_name")).collect()(0).getString(0)
      vertices(s, d).filter(col("p_name") === probe)
    },
    // single-vertex degree from ONE offset pair (edges_vertex.cpp:68-128
    // pushdown): no scan, no job over edge data
    "ga_degree_of_vertex" -> { (s, d) =>
      graft.graph.GraphArGraph(s, fixture(s, d))
        .degreeOfVertex("Part", "link", "Part", GraphQueries.RootVid)
    },
    // mutation verbs: LATEST after init → addEdges → removeEdges equals
    // the relational union/anti-join the oracle computes from lineitem
    "ga_mutate" -> { (s, d) =>
      s.read.format("graphar").option("snapshotBase", mutationFixture(s, d))
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
    },
    // time travel: v0 is untouched by the two later mutations
    "ga_time_travel" -> { (s, d) =>
      s.read.format("graphar").option("snapshotBase", mutationFixture(s, d))
        .option("snapshot", "0")
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
    },
    // the MUTATED type of a multi-type graph at LATEST (v1 = v0 ∪ delta)
    "ga_multi_mutate" -> { (s, d) =>
      s.read.format("graphar").option("snapshotBase", multiTypeFixture(s, d))
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
    },
    // the UNCHANGED type of the same graph, served by zero-copy reference
    // from v0's files and folded with its own staged remove log
    "ga_multi_ref" -> { (s, d) =>
      GraphArMutations.currentEdgesOf(s, multiTypeFixture(s, d),
        "Part_ship_Part")
    },
    // vertex-table commit in a FULL (vertices + edges) versioned graph:
    // LATEST reflects the upsert, indexes stable (property-only mutate)
    "ga_vertex_mutate" -> { (s, d) =>
      s.read.format("graphar").option("snapshotBase", fullGraphFixture(s, d))
        .option("type", "Part").load()
    },
    // vertex change data feed across the same upsert: each updated key
    // appears as delete-of-old + insert-of-new, untouched keys never
    // leave the partial aggregate
    "ga_vertex_changes" -> { (s, d) =>
      GraphArMutations.vertexChanges(s, fullGraphFixture(s, d), 0L, 1L)
    },
    // streaming delta ingest end-to-end: three micro-batches through the
    // append-mode sink, folded view = snapshot ∪ staged log vs the
    // oracle's union over the same deterministic slices
    "ga_stream_delta" -> { (s, d) =>
      GraphArMutations.currentEdges(s, streamDeltaFixture(s, d))
    },
    // SQL DELETE through the versioned catalog (SupportsDelete →
    // staged remove delta); result = live fold after the delete
    "ga_sql_delete" -> { (s, d) =>
      GraphArMutations.currentEdges(s, sqlDeleteFixture(s, d))
    },
    // SQL UPDATE through the versioned catalog (row-level delta
    // rewrite → staged upsert delta); result = live fold after it
    "ga_sql_update" -> { (s, d) =>
      GraphArMutations.currentVertices(s, sqlUpdateFixture(s, d))
    },
    // bool + date properties round-tripped through CSV chunks with BOTH
    // filters pushed (bool equality; date range compared as epoch-day
    // ints per the GraphAr date encoding — PropFilters.norm)
    "ga_typed_props" -> { (s, d) =>
      s.read.format("graphar").option("path", typedFixture(s, d))
        .option("type", "Order").load()
        .filter(col("flag") === true &&
          col("odate") >= lit(java.sql.Date.valueOf("1994-01-01")) &&
          col("odate") < lit(java.sql.Date.valueOf("1995-01-01")))
    },
    // change data feed: net multiset row diff v0 -> v2 of the mutation
    // history (inserts from the surviving delta, deletes from the
    // src%41 removal), one row per net copy
    "ga_changes" -> { (s, d) =>
      GraphArMutations.edgeChanges(s, mutationFixture(s, d), 0L, 2L)
    },
    // incremental view maintenance from the CDF: the v2 degree table is
    // folded O(changes) from the v0 degrees + the v0→v2 change feed —
    // the edge table is never rescanned — and equals the oracle's full
    // recompute over the v2 state. Zero-degree rows (every edge of a
    // vertex deleted) are dropped to match recompute semantics.
    "ga_ivm_degrees" -> { (s, d) =>
      val base = mutationFixture(s, d)
      val v0 = s.read.format("graphar").option("snapshotBase", base)
        .option("snapshot", "0")
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
      val prev = v0
        .groupBy(col(GraphArMeta.SrcIndexCol).as(GraphArMeta.GidCol))
        .agg(count(lit(1)).as("degree"))
      GraphArMutations
        .maintainDegrees(prev, GraphArMutations.edgeChanges(s, base, 0L, 2L))
        .filter(col("degree") > 0)
    },
    // IVM of a connected-components labeling from the INSERT-ONLY v0→v1
    // feed (addEdges only): merges decided by a driver union-find over
    // the O(changes) label-pair graph, prev relabeled map-side — vs the
    // oracle's reachability closure over the full v1 edge set. Induced
    // to <512 like g_components (the closure oracle is O(component²)).
    "ga_ivm_components" -> { (s, d) =>
      val base = mutationFixture(s, d)
      val v0 = s.read.format("graphar").option("snapshotBase", base)
        .option("snapshot", "0")
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
        .filter(col(GraphArMeta.SrcIndexCol) < 512 &&
          col(GraphArMeta.DstIndexCol) < 512)
        .select(col(GraphArMeta.SrcIndexCol).as("src"),
          col(GraphArMeta.DstIndexCol).as("dst"))
      val prev = graft.graph.GraphOps.connectedComponents(s, v0)
        .select(col("v").as(GraphArMeta.GidCol), col("component"))
      val feed = GraphArMutations.edgeChanges(s, base, 0L, 1L)
        .filter(col("src") < 512 && col("dst") < 512)
      GraphArMutations.maintainComponents(prev, feed)
    },
    // delete-aware components IVM: v1→v2 removes every src%41 edge —
    // splits are decided by recomputing ONLY the components the
    // deleted edges touch, spliced into the untouched labels; the
    // oracle is a fresh reachability closure over the v2 edge set
    "ga_ivm_components_del" -> { (s, d) =>
      val base = mutationFixture(s, d)
      def at(v: String) = s.read.format("graphar")
        .option("snapshotBase", base).option("snapshot", v)
        .option("src", "Part").option("type", "link").option("dst", "Part")
        .load()
        .filter(col(GraphArMeta.SrcIndexCol) < 512 &&
          col(GraphArMeta.DstIndexCol) < 512)
        .select(col(GraphArMeta.SrcIndexCol).as("src"),
          col(GraphArMeta.DstIndexCol).as("dst"))
      val prev = graft.graph.GraphOps.connectedComponents(s, at("1"))
        .select(col("v").as(GraphArMeta.GidCol), col("component"))
      val feed = GraphArMutations.edgeChanges(s, base, 1L, 2L)
        .filter(col("src") < 512 && col("dst") < 512)
      GraphArMutations.maintainComponentsWithDeletes(prev, feed, at("2"))
    }
  )

  def oracle: Map[String, String] = Map(
    "ga_vertices" -> vertexSql,
    "ga_vertex_lookup" ->
      s"""SELECT * FROM ($vertexSql) WHERE "_graphArVertexIndex" = 123""",
    "ga_vertices_proj" ->
      s"""SELECT "_graphArVertexIndex", p_name FROM ($vertexSql)
         |WHERE "_graphArVertexIndex" < 100""".stripMargin,
    "ga_vertex_count" -> "SELECT count(*) AS n_vertices FROM part",
    "ga_edge_count" -> "SELECT count(*) AS n_edges FROM lineitem",
    "ga_edges" -> edgeSql,
    "ga_one_hop" ->
      s"""SELECT * FROM ($edgeSql) WHERE "_graphArSrcIndex" = ${GraphQueries.RootVid}""",
    "ga_dst_lookup" ->
      s"""SELECT * FROM ($edgeSql) WHERE "_graphArDstIndex" = 15""",
    "ga_prop_filter" ->
      s"""SELECT * FROM ($vertexSql)
         |WHERE p_partkey >= 100 AND p_partkey <= 180 AND p_size >= 20""".stripMargin,
    "ga_bloom_lookup" ->
      s"""SELECT * FROM ($vertexSql)
         |WHERE p_name = (SELECT p_name FROM part WHERE p_partkey = 42)""".stripMargin,
    "ga_degree_of_vertex" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS degree,
         |  CAST(${GraphQueries.RootVid} AS BIGINT) AS grapharId
         |FROM ($edgeSql) WHERE "_graphArSrcIndex" = ${GraphQueries.RootVid}""".stripMargin,
    "ga_mutate" ->
      s"""WITH base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d, l_quantity AS q FROM lineitem),
         |delta AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS s,
         |    (l_partkey * 3) % ${GraphQueries.V} AS d, l_quantity + 100 AS q
         |  FROM lineitem WHERE l_orderkey % 97 = 0),
         |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
         |SELECT s AS "_graphArSrcIndex", d AS "_graphArDstIndex", q AS quantity
         |FROM unioned WHERE s % 41 <> 0""".stripMargin,
    "ga_time_travel" -> edgeSql,
    "ga_multi_mutate" ->
      s"""WITH base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d, l_quantity AS q FROM lineitem),
         |delta AS (SELECT (l_orderkey * 11) % ${GraphQueries.V} AS s,
         |    (l_partkey * 5) % ${GraphQueries.V} AS d, l_quantity + 50 AS q
         |  FROM lineitem WHERE l_orderkey % 89 = 0)
         |SELECT s AS "_graphArSrcIndex", d AS "_graphArDstIndex", q AS quantity
         |FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)""".stripMargin,
    "ga_multi_ref" ->
      s"""SELECT o_orderkey % ${GraphQueries.V} AS src,
         |  o_custkey % ${GraphQueries.V} AS dst, o_totalprice AS price
         |FROM orders WHERE (o_orderkey % ${GraphQueries.V}) % 53 <> 0""".stripMargin,
    "ga_vertex_mutate" ->
      s"""SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS "_graphArVertexIndex",
         |  p_partkey, p_name, p_brand, p_type, p_size,
         |  CASE WHEN p_size > 40 THEN p_retailprice * 2 ELSE p_retailprice END
         |    AS p_retailprice
         |FROM part""".stripMargin,
    "ga_vertex_changes" ->
      s"""SELECT p_partkey, p_name, p_brand, p_type, p_size,
         |  p_retailprice, 'delete' AS "_change_type"
         |FROM part WHERE p_size > 40
         |UNION ALL
         |SELECT p_partkey, p_name, p_brand, p_type, p_size,
         |  p_retailprice * 2 AS p_retailprice, 'insert' AS "_change_type"
         |FROM part WHERE p_size > 40""".stripMargin,
    "ga_sql_delete" ->
      s"""SELECT l_orderkey % ${GraphQueries.V} AS src,
         |  l_partkey % ${GraphQueries.V} AS dst, l_quantity AS quantity
         |FROM lineitem
         |WHERE NOT (l_orderkey % ${GraphQueries.V} < 400
         |           AND l_partkey % ${GraphQueries.V} >= 1024)""".stripMargin,
    "ga_sql_update" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  CASE WHEN p_size > 40 THEN p_retailprice * 2
        |       ELSE p_retailprice END AS p_retailprice
        |FROM part""".stripMargin,
    "ga_stream_delta" ->
      s"""WITH base AS (SELECT l_orderkey % ${GraphQueries.V} AS src,
         |    l_partkey % ${GraphQueries.V} AS dst, l_quantity AS quantity
         |  FROM lineitem),
         |d0 AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS src,
         |    (l_partkey * 3) % ${GraphQueries.V} AS dst, l_quantity + 200 AS quantity
         |  FROM lineitem WHERE l_orderkey % 101 = 0),
         |d1 AS (SELECT (l_orderkey * 8) % ${GraphQueries.V} AS src,
         |    (l_partkey * 4) % ${GraphQueries.V} AS dst, l_quantity + 201 AS quantity
         |  FROM lineitem WHERE l_orderkey % 101 = 1),
         |d2 AS (SELECT (l_orderkey * 9) % ${GraphQueries.V} AS src,
         |    (l_partkey * 5) % ${GraphQueries.V} AS dst, l_quantity + 202 AS quantity
         |  FROM lineitem WHERE l_orderkey % 101 = 2)
         |SELECT * FROM base UNION ALL SELECT * FROM d0
         |UNION ALL SELECT * FROM d1 UNION ALL SELECT * FROM d2""".stripMargin,
    "ga_typed_props" ->
      s"""WITH v AS (
         |  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS "_graphArVertexIndex",
         |    o_orderkey, (o_orderkey % 3 = 0) AS flag,
         |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
         |      ELSE DATE '1992-01-01' + CAST(o_orderkey % 2000 AS INTEGER)
         |    END AS odate,
         |    o_totalprice
         |  FROM orders)
         |SELECT "_graphArVertexIndex", o_orderkey, o_totalprice, flag, odate
         |FROM v
         |WHERE flag AND odate >= DATE '1994-01-01' AND odate < DATE '1995-01-01'""".stripMargin,
    "ga_changes" ->
      s"""WITH base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d, l_quantity AS q FROM lineitem),
         |delta AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS s,
         |    (l_partkey * 3) % ${GraphQueries.V} AS d, l_quantity + 100 AS q
         |  FROM lineitem WHERE l_orderkey % 97 = 0),
         |v2 AS (SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
         |  WHERE s % 41 <> 0),
         |tagged AS (SELECT s, d, q, -1 AS sign FROM base
         |  UNION ALL SELECT s, d, q, 1 AS sign FROM v2),
         |net AS (SELECT s, d, q, CAST(sum(sign) AS BIGINT) AS dl
         |  FROM tagged GROUP BY 1, 2, 3 HAVING sum(sign) <> 0)
         |SELECT src, dst, quantity, "_change_type" FROM (
         |  SELECT s AS src, d AS dst, q AS quantity,
         |    CASE WHEN dl > 0 THEN 'insert' ELSE 'delete' END AS "_change_type",
         |    unnest(generate_series(1, CAST(abs(dl) AS BIGINT))) AS i
         |  FROM net)""".stripMargin,
    "ga_ivm_degrees" ->
      s"""WITH base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d FROM lineitem),
         |delta AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS s,
         |    (l_partkey * 3) % ${GraphQueries.V} AS d
         |  FROM lineitem WHERE l_orderkey % 97 = 0),
         |v2 AS (SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
         |  WHERE s % 41 <> 0)
         |SELECT s AS "grapharId", CAST(count(*) AS BIGINT) AS degree
         |FROM v2 GROUP BY 1""".stripMargin,
    "ga_ivm_components_del" ->
      s"""WITH RECURSIVE base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d FROM lineitem),
         |delta AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS s,
         |    (l_partkey * 3) % ${GraphQueries.V} AS d
         |  FROM lineitem WHERE l_orderkey % 97 = 0),
         |v2 AS (SELECT s AS src, d AS dst
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
         |  WHERE s % 41 <> 0 AND s < 512 AND d < 512),
         |ue AS (SELECT src, dst FROM v2 UNION SELECT dst, src FROM v2),
         |reach(v, r) AS (
         |  SELECT DISTINCT src AS v, src AS r FROM ue
         |  UNION
         |  SELECT reach.v, ue.dst AS r FROM reach JOIN ue ON ue.src = reach.r)
         |SELECT v AS "grapharId", min(r) AS component FROM reach GROUP BY v""".stripMargin,
    "ga_ivm_components" ->
      s"""WITH RECURSIVE base AS (SELECT l_orderkey % ${GraphQueries.V} AS s,
         |    l_partkey % ${GraphQueries.V} AS d FROM lineitem),
         |delta AS (SELECT (l_orderkey * 7) % ${GraphQueries.V} AS s,
         |    (l_partkey * 3) % ${GraphQueries.V} AS d
         |  FROM lineitem WHERE l_orderkey % 97 = 0),
         |v1 AS (SELECT s AS src, d AS dst
         |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
         |  WHERE s < 512 AND d < 512),
         |ue AS (SELECT src, dst FROM v1 UNION SELECT dst, src FROM v1),
         |reach(v, r) AS (
         |  SELECT DISTINCT src AS v, src AS r FROM ue
         |  UNION
         |  SELECT reach.v, ue.dst AS r FROM reach JOIN ue ON ue.src = reach.r)
         |SELECT v AS "grapharId", min(r) AS component FROM reach GROUP BY v""".stripMargin
  )
}
