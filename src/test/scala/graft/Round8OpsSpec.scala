package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, GraphQueries}

/** Round-8 hardening: the `converged = true` variants of the
  * fixed-round operators must (a) equal the fixed-round form at its
  * measured fixed point — so the oracle-pinned semantics and the
  * production API provably agree — and (b) be TOTAL where the bounded
  * form may be partial. Plus the empty-input guards added this round.
  */
class Round8OpsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("corenessHIndex(converged) equals the 14-round gate fixed point") {
    val gate = GraphQueries.edgesFrom(spark, sf)
    val fixedRounds = GraphOps.corenessHIndex(spark, gate, rounds = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val conv = GraphOps.corenessHIndex(spark, gate, converged = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(conv === fixedRounds,
      "converged coreness diverged from the measured 14-round fixed point")
  }

  test("trialColoring(converged) is TOTAL, proper, and extends the 6-round prefix") {
    val gate = GraphQueries.edgesFrom(spark, sf)
    val conv = GraphOps.trialColoring(spark, gate, converged = true)
    val colors = conv.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total: every vertex with a non-self-loop edge is colored
    // (coloring is defined on the simple undirected graph)
    val simple = gate.filter(col("src") =!= col("dst"))
    val verts = simple.select(col("src").as("v"))
      .unionAll(simple.select(col("dst").as("v")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(colors.keySet === verts, "converged coloring is not total")
    // proper: no monochromatic edge
    val bad = gate.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b && colors(a) == colors(b) }
    assert(bad.isEmpty, s"improper edges: ${bad.take(5).mkString(",")}")
    // prefix agreement: the bounded 6-round coloring is a SUBSET —
    // same (v, color) rows, the converged run only adds later rounds
    val bounded = GraphOps.trialColoring(spark, gate,
        rounds = GraphQueries.ColorRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded.subsetOf(colors.toSet),
      "bounded coloring is not a prefix of the converged one")
  }

  test("eccentricity(converged) equals the EccRounds gate fixed point") {
    val induced = GraphQueries.edgesFrom(spark, sf)
      .filter(col("src") < GraphQueries.EccInduced
        && col("dst") < GraphQueries.EccInduced)
    val atBound = GraphOps.eccentricity(spark, induced, GraphQueries.EccRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val conv = GraphOps.eccentricity(spark, induced, converged = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(conv === atBound,
      "converged eccentricity diverged from the EccRounds fixed point")
  }

  test("betweennessApprox: k >= V degenerates to exact all-pivot Brandes; k < V tracks it") {
    import spark.implicits._
    val rnd = new scala.util.Random(88)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .toDF("src", "dst")
    val verts = edges.select(col("src")).unionAll(edges.select(col("dst")))
      .distinct().collect().map(_.getLong(0)).sorted
    // all-pivot run: V/k = 1, so the estimate IS the exact depth-bounded
    // bc under the same quantization
    val exact = GraphOps.betweennessSampled(spark, edges, verts.toSeq, 4)
      .collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).toMap
    val allPiv = GraphOps.betweennessApprox(spark, edges,
        k = verts.length, maxDepth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(allPiv === exact,
      "k = V pivot run diverged from all-source Brandes")
    // half the pivots: the (V/k)-extrapolated TOTAL mass must land
    // near the exact total (deterministic — the md5 pivot set is a
    // pure function of the ids, no RNG at run time)
    val est = GraphOps.betweennessApprox(spark, edges,
        k = verts.length / 2, maxDepth = 4)
      .collect().map(_.getLong(1)).sum.toDouble
    val tot = exact.values.sum.toDouble
    assert(est > 0.5 * tot && est < 1.5 * tot,
      s"extrapolated mass $est vs exact $tot outside [0.5, 1.5]×")
  }

  test("perceptronScore: zero-shuffle scan, equals brute-force scoring") {
    import spark.implicits._
    import graft.operators.Pipeline
    val docs = Seq((1L, "the quick brown fox"), (2L, "dup dup key spark"),
      (3L, "")).toDF("doc_id", "text")
    val w = Array(3L, -2L, 5L, 0L, 1L, -4L, 2L, 7L, -1L)
    val scored = Pipeline.perceptronScore(docs, w)
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"scoring must be a pure map-side scan, found a shuffle in:\n$p")
    val got = scored.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def brute(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+")
      toks.map(t => w((graft.functions.TextFunctions
        .charHashLocal(t, Pipeline.PerceptronSeed.toLong)
        % Pipeline.PerceptronDims).toInt)).sum + w(Pipeline.PerceptronDims)
    }
    Seq((1L, "the quick brown fox"), (2L, "dup dup key spark"), (3L, ""))
      .foreach { case (id, text) =>
        val s = brute(text)
        assert(got(id) === ((s, if (s > 0) 1L else -1L)), s"doc $id")
      }
  }

  test("converged TVFs substitute the converged operators' plans") {
    val yaml = sources.graphar.GraphArQueries.fixture(spark, sf)
    graph.GraphTableFunctions.register(spark)
    val g = graph.GraphArGraph(spark, yaml)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
        s"SELECT * FROM graph_coloring('$yaml', 'Part', 'link', 'Part')"))
      === rows(g.coloring("Part", "link", "Part")))
    assert(rows(spark.sql(
        s"SELECT * FROM graph_coreness_converged('$yaml', 'Part', 'link', 'Part')"))
      === rows(g.coreness("Part", "link", "Part", converged = true)))
    assert(rows(spark.sql(
        s"SELECT * FROM graph_eccentricity('$yaml', 'Part', 'link', 'Part')"))
      === rows(g.eccentricity("Part", "link", "Part")))
  }

  test("empty-input guards: matching rounds=0, coloring on empty, graphSummary edgeless") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val empty = edges.filter(lit(false))
    // maximalMatching with rounds = 0 → empty matching, no exception
    assert(GraphOps.maximalMatching(spark, edges, rounds = 0).count() === 0L)
    // trialColoring on an empty edge set → empty coloring
    assert(GraphOps.trialColoring(spark, empty).count() === 0L)
    // graphSummary on an edgeless graph → empty frame, no NPE
    val s = GraphOps.graphSummary(spark, empty)
    assert(s.count() === 0L)
    assert(s.columns.toSeq ===
      Seq("diameter", "radius", "center_size", "periphery_size"))
  }
}
