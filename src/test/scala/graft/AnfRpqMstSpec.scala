package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 graph/sketch/pipeline additions: Borůvka MST, exact + HLL
  * neighborhood function, regular path queries, Katz, KMV distinct,
  * boilerplate strip, curriculum ordering. Each test pins a property
  * the oracle can't: equivalence to an in-memory exact reference, or an
  * analytic accuracy bound of an approximate operator.
  */
class AnfRpqMstSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def weightedEdges = graph.GraphQueries.edgesFrom(spark, sf)
    .withColumn("w", pmod(col("src") * 31 + col("dst"), lit(7L)) + 1)

  test("g_mst equals in-memory Kruskal: same total weight and edge set") {
    val got = graph.GraphOps.minimumSpanningForest(spark, weightedEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // in-memory Kruskal over the canonical simple undirected edge set,
    // identical (w, a, b) total order
    val canon = weightedEdges.collect()
      .map { r =>
        val s = r.getLong(0); val d = r.getLong(1); val w = r.getLong(2)
        (math.min(s, d), math.max(s, d), w)
      }
      .filter { case (a, b, _) => a != b }
      .groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), g) => (a, b, g.map(_._3).min) }
      .toSeq.sortBy { case (a, b, w) => (w, a, b) }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = canon.flatMap { case (a, b, w) =>
      val ra = find(a); val rb = find(b)
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet

    assert(got.map(_._3).sum == want.map(_._3).sum,
      s"MST weight ${got.map(_._3).sum} != Kruskal ${want.map(_._3).sum}")
    assert(got == want, {
      val extra = got -- want; val missing = want -- got
      s"edge sets differ: extra=${extra.take(5)} missing=${missing.take(5)}"
    })
  }

  test("g_anf_hll tracks the exact neighborhood function within HLL error") {
    // run both on the SAME <1024 induced subgraph so the comparison is
    // apples-to-apples (the gate runs the sketch on the full graph)
    val sub = graph.GraphQueries.edgesFrom(spark, sf)
      .filter(col("src") < 1024 && col("dst") < 1024)
    val exact = graph.GraphOps.neighborhoodFunction(spark, sub, 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val est = graph.GraphOps.anfHll(spark, sub, 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (1 to 3).foreach { h =>
      // sketch counts (u,v) pairs including v=u (each vertex seeds its
      // own sketch); exact counts u≠v pairs — add |V| before comparing
      val nv = sub.select(col("src").as("v"))
        .unionAll(sub.select(col("dst").as("v"))).distinct().count()
      val exactIncl = exact(h) + nv
      val rel = math.abs(est(h) / 1e6 - exactIncl) / exactIncl.toDouble
      // m=64 registers: standard error 1.04/√64 ≈ 13%; allow 3σ-ish
      assert(rel < 0.35, s"h=$h est=${est(h) / 1e6} exact=$exactIncl rel=$rel")
    }
  }

  test("g_rpq equals brute-force automaton-product reachability") {
    val edges = graph.GraphQueries.labeledEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val trans = graph.GraphQueries.RpqTransitions
    val accept = graph.GraphQueries.RpqAccept
    // BFS over (v, state) pairs in memory
    val adj = edges.groupBy(_._1)
    var visited = Set((graph.GraphQueries.RootVid, 0))
    var frontier = visited
    while (frontier.nonEmpty) {
      val next = for {
        (v, st) <- frontier
        (s, d, l) <- adj.getOrElse(v, Array.empty[(Long, Long, Long)])
        (s0, tl, s1) <- trans
        if s0 == st && tl == l
        if !visited.contains((d, s1))
      } yield (d, s1)
      visited ++= next
      frontier = next
    }
    val want = visited.filter(p => accept(p._2)).map(_._1)
    val got = graph.GraphOps.regularPathQuery(spark,
        graph.GraphQueries.labeledEdges(spark, sf),
        graph.GraphQueries.RootVid, trans, accept)
      .collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("g_katz equals in-memory fixed-iteration Katz") {
    val edges = graph.GraphQueries.edgesFrom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var x = verts.map(_ -> 1.0).toMap
    for (_ <- 1 to graph.GraphQueries.KatzIters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => x(e._1)).sum
      }
      x = verts.map(v =>
        v -> (1.0 + graph.GraphQueries.KatzAlpha * in.getOrElse(v, 0.0))).toMap
    }
    val got = graph.GraphOps.katzCentrality(spark,
        graph.GraphQueries.edgesFrom(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == x.keySet)
    got.foreach { case (v, s) =>
      assert(math.abs(s - x(v)) < 1e-9, s"v=$v got=$s want=${x(v)}")
    }
  }

  test("g_triangles_approx tracks the exact triangle count within sampling error") {
    val e = graph.GraphQueries.edgesFrom(spark, "/root/testdata/sf0.01")
    val exact = graph.GraphOps.triangleCount(e).head.getLong(0)
    val row = graph.GraphOps.triangleCountApprox(e).head
    val (sampled, est) = (row.getLong(0), row.getLong(1))
    assert(sampled > 0)
    // DOULION rel. error ~ 1/sqrt(p^3 T); generous 4σ-ish bound
    val tol = 4.0 / math.sqrt(sampled.toDouble)
    assert(math.abs(est - exact) / exact.toDouble < math.max(tol, 0.1),
      s"est=$est exact=$exact sampled=$sampled tol=$tol")
  }

  test("maximalIndependentSet: independent, maximal once converged, knock-outs justified") {
    val e = graph.GraphQueries.edgesFrom(spark, sf)
    val st = graph.GraphOps.maximalIndependentSet(spark, e, rounds = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val und = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    assert(!st.values.exists(_ == "undecided"), "20 rounds did not converge")
    // independence: no edge inside the set
    und.foreach { case (a, b) =>
      assert(!(st(a) == "in" && st(b) == "in"), s"adjacent in-pair ($a,$b)")
    }
    // maximality: every out vertex has an in neighbor
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    st.foreach { case (v, s) =>
      if (s == "out")
        assert(nbrs(v).exists(st(_) == "in"), s"out vertex $v has no in neighbor")
    }
  }

  test("g_node2vec equals in-memory second-order weighted-choice replication") {
    val edges = graph.GraphQueries.edgesFrom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val edgeSet = edges.toSet
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val steps = graph.GraphQueries.N2vSteps
    val want = scala.collection.mutable.Set[(Long, Long, Long)]()
    graph.GraphQueries.WalkRoots.foreach { root =>
      var u = -1L; var v = root
      want += ((root, 0L, v))
      var alive = true
      (1 to steps).foreach { i =>
        if (alive) adj.get(v) match {
          case None => alive = false
          case Some(ws) =>
            val cands = ws.distinct.flatMap { w =>
              val wt = if (w == u) 1 else if (edgeSet((u, w))) 4 else 2
              (0 until wt).map(t =>
                (md5hex(s"${root}_${i}_${w}_${t}_graft"), w))
            }
            val pick = cands.min._2
            u = v; v = pick
            want += ((root, i.toLong, v))
        }
      }
    }
    val got = graph.GraphQueries.queries("g_node2vec")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want.toSet,
      s"extra=${(got -- want).take(5)} missing=${(want.toSet -- got).take(5)}")
  }

  test("s_kmv_distinct estimate is within 20% of the exact distinct count") {
    val li = Tables.t(spark, sf, "lineitem")
    val exact = li.select("l_orderkey").distinct().count()
    val row = operators.Sketches.kmvDistinct(li, "l_orderkey").head()
    val est = row.getLong(1) / 1e6
    // k=256 → standard error ≈ 1/√(k−2) ≈ 6.3%; 20% ≈ 3σ
    assert(math.abs(est - exact) / exact < 0.20, s"est=$est exact=$exact")
  }

  test("mmrTopK: first pick is the relevance top-1; picks are distinct and ranked") {
    val emb = Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
    val mmr = operators.Similarity.mmrTopK(emb, col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val top1 = operators.Similarity.bruteForceTopK(emb, col("vec_id") < 8, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mmr.groupBy(_._1).foreach { case (q, picks) =>
      assert(picks.length == 5 && picks.map(_._2).distinct.length == 5)
      assert(picks.map(_._3).sorted.toSeq == (1L to 5L))
      assert(picks.find(_._3 == 1L).get._2 == top1(q),
        s"q=$q first MMR pick != relevance top-1")
    }
  }

  test("kmvDistinct is exact below k and merge-consistent") {
    import spark.implicits._
    val small = (1L to 100L).toDF("v")
    val row = operators.Sketches.kmvDistinct(small, "v", k = 256).head()
    assert(row.getLong(0) == 100)
    assert(row.getLong(1) == 100L * 1000000L) // n < k → exact count
  }

  test("boilerplateStrip removes exactly the cross-document repeated lines") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared shared unique one aaa"),
      (2L, "shared shared shared unique two bbb"),
      (3L, "other words here solo line ccc")
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.boilerplateStrip(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 share their first 3-word line → boilerplate
    assert(out(1L) == (2L, 1L), out.toString)
    assert(out(2L) == (2L, 1L), out.toString)
    assert(out(3L) == (2L, 0L), out.toString)
  }

  test("curriculum: ordinal is a permutation, phases are ntile-balanced") {
    val out = operators.Pipeline.curriculum(
        Tables.t(spark, sf, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    assert(out.map(_._2).sorted.toSeq == (1L to n).toSeq)
    val phases = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(phases.keySet == (1L to 4L).toSet)
    // ntile: sizes differ by at most 1
    assert(phases.values.max - phases.values.min <= 1, phases.toString)
    // monotone: higher phase ⇒ higher ordinal range
    val maxByPhase = out.groupBy(_._3).view
      .mapValues(g => g.map(_._2).max).toMap
    val minByPhase = out.groupBy(_._3).view
      .mapValues(g => g.map(_._2).min).toMap
    (1L to 3L).foreach { p =>
      assert(maxByPhase(p) < minByPhase(p + 1))
    }
  }
}
