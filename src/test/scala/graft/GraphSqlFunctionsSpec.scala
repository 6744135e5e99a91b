package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphArGraph, GraphOps, GraphSqlFunctions}

/** SQL-callable bfs_length / bfs_exist (reference F1/F2) cross-checked
  * against the distributed frontier-join implementation.
  */
class GraphSqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("bfs UDFs match the distributed BFS on all probe pairs") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    GraphSqlFunctions.register(spark, g)
    val es = g.edgesStd("Part", "link", "Part").persist()
    graph.GraphQueries.bfsPairs.foreach { case (a, b) =>
      val sql = spark.sql(s"SELECT bfs_length($a, $b) AS l, bfs_exist($a, $b) AS e")
        .collect()(0)
      val dist = GraphOps.bfsLength(spark, es, a, b, 15)
      assert(sql.getLong(0) === dist, s"pair ($a,$b)")
      assert(sql.getBoolean(1) === (dist != -1L), s"pair ($a,$b)")
    }
    es.unpersist()
  }

  test("buildCsr: packed-long fast sort ≡ general index sort (incl. >32-bit ids)") {
    import spark.implicits._
    // small ids → packed path; huge ids → fallback. Same adjacency both ways.
    val smallEdges = Seq((3L, 1L), (1L, 2L), (3L, 0L), (1L, 7L), (0L, 3L),
      (3L, 1L), (2L, 2L)) // duplicate edge + self-loop kept as-is
    val bigBase = 1L << 40
    for (shift <- Seq(0L, bigBase)) {
      val edges = smallEdges.map { case (a, b) => (a + shift, b + shift) }
      val df = edges.toDF("src", "dst")
      val csr = GraphSqlFunctions.buildCsr(spark, df)
      // reference adjacency: grouped, (src,dst)-sorted, duplicates kept
      val expect = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(_._2).sorted
      }
      expect.foreach { case (v, nbrs) =>
        val (b, e) = csr.neighbors(v)
        assert(csr.targets.slice(b, e).toSeq === nbrs, s"vertex $v shift=$shift")
      }
      assert(csr.targets.length === edges.size, s"shift=$shift")
      val covered = expect.keys.toSeq
        .map(v => { val (b, e) = csr.neighbors(v); e - b }).sum
      assert(covered === edges.size, s"shift=$shift")
    }
  }

  test("bfs UDFs evaluate over many rows in one query") {
    val n = spark.sql(
      """SELECT count(*) AS n FROM (SELECT explode(sequence(0, 99)) AS v)
        |WHERE bfs_exist(42, v)""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
  }

  test("hello function (duckdb_graphar parity)") {
    assert(spark.sql("SELECT graft('Sam') AS s").collect()(0).getString(0)
      === "Graft Sam ⚡")
  }

  test("SQL scalar functions graft_minhash_sig/graft_dot/graft_cosine match the Column API") {
    import org.apache.spark.sql.functions._
    graft.functions.ScalarSqlFunctions.register(spark)
    // minhash: SQL form ≡ compiled expression wrapper, default + explicit (n, k)
    Tables.t(spark, sf, "documents").limit(50).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_sig(text) AS s, graft_minhash_sig(text, 2, 4) AS s24 FROM docs_sql")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSet
    val viaCol = Tables.t(spark, sf, "documents").limit(50)
      .select(col("doc_id"),
        graft.functions.MinHashSigExpr.minhashSig(col("text")).as("s"),
        graft.functions.MinHashSigExpr.minhashSig(col("text"), 2, 4).as("s24"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSet
    assert(viaSql === viaCol)
    // dot/cosine: SQL form ≡ compiled kernels on a self-join sample
    Tables.t(spark, sf, "embeddings").limit(20).createOrReplaceTempView("emb_sql")
    val diff = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |  graft_dot(a.embedding, b.embedding) AS d,
        |  graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id < b.vec_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(diff.nonEmpty)
    val byCol = Tables.t(spark, sf, "embeddings").limit(20).as("a")
      .join(Tables.t(spark, sf, "embeddings").limit(20).as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        operators.Similarity.dot(col("a.embedding"), col("b.embedding")).as("d"),
        operators.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(diff.toSet === byCol.toSet)
    // hilbert: SQL form ≡ interpreted twin, default + explicit bits
    val hs = spark.sql(
      """SELECT x, y, graft_hilbert(x, y) AS h8, graft_hilbert(x, y, 4) AS h4
        |FROM VALUES (0, 0), (3, 5), (15, 15), (200, 113) AS t(x, y)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    hs.foreach { case (x, y, h8, h4) =>
      assert(h8 === graft.functions.HilbertIndexExpr.xy2d(x, y, 8))
      assert(h4 === graft.functions.HilbertIndexExpr.xy2d(x, y, 4))
    }
  }

  test("SQL TVFs two_hop/one_more_hop/edges_vertex match the Scala API") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    graph.GraphTableFunctions.register(spark)
    val vid = graph.GraphQueries.RootVid

    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // 2-arg form: first edge type (reference bfs.cpp:66 convention)
    assert(sorted(spark.sql(s"SELECT * FROM two_hop('$yaml', $vid)").collect())
      === sorted(g.twoHop("Part", "link", "Part", vid).collect()))
    // 5-arg explicit form
    assert(sorted(spark.sql(
      s"SELECT * FROM one_more_hop('$yaml', 'Part', 'link', 'Part', $vid)").collect())
      === sorted(g.oneMoreHop("Part", "link", "Part", vid).collect()))
    // degrees TVF: aggregate golden against the fast path
    val sqlMax = spark.sql(s"SELECT max(degree) AS m FROM edges_vertex('$yaml')")
      .collect()(0).getLong(0)
    val apiMax = g.maxDegree("Part", "link", "Part").collect()(0).getLong(0)
    assert(sqlMax === apiMax)
  }

  test("analytics TVFs connected_components/page_rank/graph_sssp/graph_kcore match the Scala API") {
    import org.apache.spark.sql.functions.col
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    graph.GraphTableFunctions.register(spark)
    val vid = graph.GraphQueries.RootVid

    val sqlCc = spark.sql(s"SELECT * FROM connected_components('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlCc === g.connectedComponents("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlPr = spark.sql(s"SELECT count(*) FROM page_rank('$yaml') WHERE rank > 1.0")
      .collect()(0).getLong(0)
    assert(sqlPr === g.pageRank("Part", "link", "Part")
      .filter(col("rank") > 1.0).count())

    val sqlTri = spark.sql(s"SELECT * FROM triangle_count('$yaml')")
      .collect()(0).getLong(0)
    assert(sqlTri === g.triangleCount("Part", "link", "Part")
      .collect()(0).getLong(0))

    val sqlSssp = spark.sql(s"SELECT * FROM graph_sssp('$yaml', $vid)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlSssp === g.sssp("Part", "link", "Part", vid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlWid = spark.sql(s"SELECT * FROM graph_widest('$yaml', $vid)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlWid === g.widestPaths("Part", "link", "Part", vid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // unit weights: every non-source reachable vertex has capacity 1
    assert(sqlWid.filter(_._1 != vid).forall(_._2 === 1L))

    val sqlCore = spark.sql(s"SELECT * FROM graph_kcore('$yaml', 20)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlCore === g.kCore("Part", "link", "Part", 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlLcc = spark.sql(s"SELECT * FROM clustering_coef('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(sqlLcc === g.clusteringCoefficients("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq)

    val sqlScc = spark.sql(s"SELECT * FROM strongly_connected_components('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlScc === g.stronglyConnectedComponents("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlLpa = spark.sql(s"SELECT * FROM graph_communities('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlLpa === g.labelPropagationCommunities("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlLouvain = spark.sql(s"SELECT * FROM graph_louvain('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlLouvain === g.louvainCommunities("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("TVFs graph_katz/graph_anf/graph_triangles_approx match the Scala API") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    graph.GraphTableFunctions.register(spark)

    val sqlKatz = spark.sql(s"SELECT * FROM graph_katz('$yaml')")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(sqlKatz === g.katz("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq)

    val sqlAnf = spark.sql(s"SELECT * FROM graph_anf('$yaml')")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
    assert(sqlAnf === g.anf("Part", "link", "Part")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq)

    val sqlTri = spark.sql(s"SELECT * FROM graph_triangles_approx('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlTri === g.trianglesApprox("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("TVFs graph_coreness/wl_refine/reciprocity/transitivity/neigh_agg/bipartite match the Scala API") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    graph.GraphTableFunctions.register(spark)

    val sqlCore = spark.sql(s"SELECT * FROM graph_coreness('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sqlCore === g.coreness("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    val sqlWl = spark.sql(s"SELECT * FROM graph_wl_refine('$yaml')")
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(sqlWl === g.wlRefinement("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq)

    val sqlRec = spark.sql(s"SELECT * FROM graph_reciprocity('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sqlRec === g.reciprocity("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)

    val sqlTrans = spark.sql(s"SELECT * FROM graph_transitivity('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sqlTrans === g.transitivity("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)

    val sqlAgg = spark.sql(s"SELECT * FROM graph_neigh_agg('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(sqlAgg === g.neighborhoodAgg("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq)

    val sqlBip = spark.sql(s"SELECT * FROM graph_bipartite('$yaml')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(sqlBip === g.bipartiteColoring("Part", "link", "Part")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
      .sorted.toSeq)
  }

  test("TVFs personalized_pagerank/sample_neighbors/random_walk/graph_motif match the Scala API") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    graph.GraphTableFunctions.register(spark)
    val vid = graph.GraphQueries.RootVid

    val sqlPpr = spark.sql(s"SELECT * FROM personalized_pagerank('$yaml', $vid)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(sqlPpr === g.personalizedPageRank("Part", "link", "Part", vid)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq)

    val sqlSample = spark.sql(s"SELECT * FROM sample_neighbors('$yaml', 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(sqlSample === g.sampleNeighbors("Part", "link", "Part", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq)

    val sqlWalk = spark.sql(s"SELECT * FROM random_walk('$yaml', $vid)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(sqlWalk.nonEmpty)
    assert(sqlWalk === g.randomWalk("Part", "link", "Part", vid)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq)

    val sqlMotif = spark.sql(
      s"SELECT count(*) FROM graph_motif('$yaml', '(a)-[]->(b); (b)-[]->(c)')")
      .collect()(0).getLong(0)
    assert(sqlMotif === g.findMotif("Part", "link", "Part",
      "(a)-[]->(b); (b)-[]->(c)").count())
  }

  test("register refuses an over-threshold graph from metadata alone") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    val e = intercept[IllegalArgumentException] {
      GraphSqlFunctions.register(spark, g, prefix = "tiny_",
        maxBroadcastEdges = 5L)
    }
    assert(e.getMessage.contains("bfsLength"),
      s"error must name the distributed alternative: ${e.getMessage}")
  }

  test("degreeOfVertex: one offset pair == degreesFast row; out-of-range empty") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    val g = GraphArGraph(spark, yaml)
    val vid = graph.GraphQueries.RootVid
    val point = g.degreeOfVertex("Part", "link", "Part", vid).collect()
    val full = g.degreesFast("Part", "link", "Part")
      .filter(org.apache.spark.sql.functions.col("grapharId") === vid).collect()
    assert(point.length === 1 && full.length === 1)
    assert(point(0).getLong(0) === full(0).getLong(0))
    assert(g.degreeOfVertex("Part", "link", "Part", -1L).count() === 0)
    assert(g.degreeOfVertex("Part", "link", "Part", 1L << 40).count() === 0)
  }
}
