package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps

/** Rich-club / 4-cycle / densest-subgraph vs in-memory brute force on
  * random multigraphs (loops + parallel edges included, so the
  * undirected-simple canonicalization is exercised too).
  */
class Round7GraphStatsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Random directed multigraph with loops and duplicate edges. */
  private def randomEdges(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
  }

  private def simple(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet

  test("richClub matches the brute-force club density at every k") {
    import spark.implicits._
    val raw = randomEdges(60, 400, 0xA1)
    val und = simple(raw)
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val ks = Seq(1, 2, 4, 8, 16, 32)
    val expected = ks.map { k =>
      val club = deg.filter(_._2 > k).keySet
      val nk = club.size.toLong
      val ek = und.count { case (a, b) => club(a) && club(b) }.toLong
      val phi = if (nk >= 2) 2000000L * ek / (nk * (nk - 1)) else 0L
      (k.toLong, nk, ek, phi)
    }.toSet
    val got = GraphOps.richClub(raw.toDF("src", "dst"), ks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === expected)
  }

  test("squareCount matches brute-force 4-cycle enumeration") {
    import spark.implicits._
    for (seed <- Seq(0xB1, 0xB2, 0xB3)) {
      val raw = randomEdges(40, 220, seed)
      val und = simple(raw)
      val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
      // brute force: unordered vertex pairs {u,w}, C(common,2), each
      // square counted once per diagonal → divide by 2
      val verts = adj.keys.toSeq.sorted
      var twice = 0L
      for (i <- verts.indices; j <- (i + 1) until verts.size) {
        val c = (adj(verts(i)) & adj(verts(j))).size.toLong
        twice += c * (c - 1) / 2
      }
      val expected = twice / 2
      val got = GraphOps.squareCount(raw.toDF("src", "dst"))
        .collect().head.getLong(0)
      assert(got === expected, s"seed $seed")
    }
  }

  test("squareCountApprox: deterministic estimate, sane on a dense graph") {
    import spark.implicits._
    // dense-ish graph so the sampled count is well-populated
    val raw = randomEdges(30, 500, 0xC1)
    val df = raw.toDF("src", "dst")
    val exact = GraphOps.squareCount(df).collect().head.getLong(0)
    val e1 = GraphOps.squareCountApprox(df, inv = 2)
      .collect().head
    val e2 = GraphOps.squareCountApprox(df, inv = 2)
      .collect().head
    // deterministic coin → identical estimate across runs
    assert(e1.getLong(0) === e2.getLong(0))
    assert(e1.getLong(1) === e1.getLong(0) * 16)
    // loose accuracy contract: within 4x on a graph with thousands of
    // squares (rel err ~ 1/sqrt(p^4 C4); p = 1/2)
    assert(e1.getLong(1) > exact / 4 && e1.getLong(1) < exact * 4,
      s"est ${e1.getLong(1)} vs exact $exact")
  }

  test("densestSubgraph: trace mirrors an in-memory peeling exactly") {
    import spark.implicits._
    for (seed <- Seq(0xD1, 0xD2)) {
      val raw = randomEdges(80, 300, seed)
      var e = simple(raw)
      var s = e.flatMap { case (a, b) => Seq(a, b) }
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      var r = 0
      while (s.nonEmpty) {
        val nv = s.size.toLong; val ne = e.size.toLong
        expected += ((r, nv, ne, 1000000L * ne / nv))
        val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
        s = s.filter(v => deg.getOrElse(v, 0L) * nv > 3L * ne)
        e = e.filter { case (a, b) => s(a) && s(b) }
        r += 1
      }
      val got = GraphOps.densestSubgraph(spark, raw.toDF("src", "dst"))
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
          x.getLong(3))).toSeq
      assert(got === expected.toSeq, s"seed $seed")
    }
  }

  test("densestSubgraph: planted clique density survives peeling (2(1+eps) bound)") {
    import spark.implicits._
    // sparse background + planted K10: rho* >= 4.5, so the best peeled
    // round must report density >= rho*/3 = 1.5
    val rnd = new scala.util.Random(0xE1)
    val bg = Seq.fill(400)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val clique = for (i <- 0 until 10; j <- (i + 1) until 10)
      yield (1000L + i, 1000L + j)
    val trace = GraphOps.densestSubgraph(spark, (bg ++ clique).toDF("src", "dst"))
      .collect()
    val best = trace.map(_.getLong(3)).max
    assert(best >= 1500000L, s"best density_micro $best < 1500000")
  }
}
