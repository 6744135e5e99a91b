package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.graph.GraphOps

/** Property-based checks (SURVEY.md §5 test plan): hop operators against
  * a brute-force in-memory oracle on random multigraphs, and BFS against
  * collection BFS — pinning the reference's exact semantics
  * (dup-preserving two_hop frontier per hop.cpp:126-129; dedup'd +
  * dst-membership one_more_hop per hop.cpp:188-225).
  */
object HopProps extends Properties("graft.hops") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genGraph: Gen[(List[(Long, Long)], Long)] = for {
    n <- Gen.choose(3, 12)
    m <- Gen.choose(0, 40)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L)
    } yield (s, d))
    vid <- Gen.choose(0L, n - 1L)
  } yield (edges, vid)

  private def toDf(edges: List[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  private def multiset(rows: Seq[(Long, Long)]): Map[(Long, Long), Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  property("twoHop = 1-hop ++ out-edges of dup-preserving frontier") =
    forAll(genGraph) { case (edges, vid) =>
      val got = GraphOps.twoHop(toDf(edges), vid).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val h1 = edges.filter(_._1 == vid)
      val expected = h1 ++ h1.flatMap { case (_, m) => edges.filter(_._1 == m) }
      multiset(got) == multiset(expected)
    }

  property("oneMoreHop = 1-hop ++ edges with src,dst in dedup'd frontier") =
    forAll(genGraph) { case (edges, vid) =>
      val got = GraphOps.oneMoreHop(toDf(edges), vid).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val h1 = edges.filter(_._1 == vid)
      val f = h1.map(_._2).toSet
      val expected = h1 ++ edges.filter(e => f.contains(e._1) && f.contains(e._2))
      multiset(got) == multiset(expected)
    }

  property("bfsLength = collection BFS") =
    forAll(genGraph) { case (edges, vid) =>
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val target = (vid + 1) % 3
      def bfs(): Long = {
        if (vid == target) return 0
        var depth = 0L
        var frontier = Set(vid)
        var visited = Set(vid)
        while (frontier.nonEmpty && depth < 15) {
          depth += 1
          frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).diff(visited)
          if (frontier.contains(target)) return depth
          visited ++= frontier
        }
        -1L
      }
      GraphOps.bfsLength(spark, toDf(edges), vid, target, 15) == bfs()
    }

  property("bidirectional BFS = unidirectional BFS") =
    forAll(genGraph) { case (edges, vid) =>
      val target = (vid * 7 + 2) % 5
      val df = toDf(edges)
      val uni = GraphOps.bfsLength(spark, df, vid, target, 12)
      val bi = GraphOps.bfsLengthBidirectional(spark, df, vid, target, 12)
      uni == bi
    }

  property("bfsLengthsAuto: CSR path = distributed path = per-pair BFS") =
    forAll(genGraph) { case (edges, vid) =>
      val df = toDf(edges)
      val pairs = Seq((vid, (vid + 1) % 3), (vid, vid), ((vid * 3 + 1) % 5, vid))
      val perPair = pairs.map { case (a, b) =>
        (a, b, GraphOps.bfsLength(spark, df, a, b, 12))
      }
      // force each strategy via the session threshold conf
      spark.conf.set("spark.graft.bfs.maxBroadcastEdges", Long.MaxValue.toString)
      val viaCsr = GraphOps.bfsLengthsAuto(spark, df, pairs, 12)
      spark.conf.set("spark.graft.bfs.maxBroadcastEdges", "0")
      val viaDist = try GraphOps.bfsLengthsAuto(spark, df, pairs, 12)
      finally spark.conf.unset("spark.graft.bfs.maxBroadcastEdges")
      viaCsr == perPair && viaDist == perPair
    }

  property("degrees = per-src edge counts") =
    forAll(genGraph) { case (edges, _) =>
      val got = GraphOps.degrees(toDf(edges)).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap
      val expected = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got == expected
    }

  property("connectedComponents = min reachable id in undirected closure") =
    forAll(genGraph) { case (edges, _) =>
      edges.isEmpty || {
        // default: driver union-find path (graph under the threshold)
        val got = GraphOps.connectedComponents(spark, toDf(edges)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        // forced label-propagation rounds: both strategies must agree
        spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
        val gotRounds = try GraphOps.connectedComponents(spark, toDf(edges))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
        (got == gotRounds) && {
        // brute force: undirected reachability fixpoint
        val und = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val expected = verts.map { v0 =>
          var seen = Set(v0)
          var frontier = Set(v0)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(v => und.getOrElse(v, Set.empty)).diff(seen)
            seen ++= frontier
          }
          v0 -> seen.min
        }.toMap
        got == expected
        }
      }
    }

  property("stronglyConnectedComponents = mutual-reachability brute force") =
    forAll(genGraph) { case (edges, _) =>
      edges.isEmpty || {
        val got = GraphOps.stronglyConnectedComponents(spark, toDf(edges))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
        def reach(v0: Long): Set[Long] = {
          var seen = Set(v0)
          var frontier = Set(v0)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)).diff(seen)
            seen ++= frontier
          }
          seen
        }
        val fwd = verts.map(v => v -> reach(v)).toMap
        val expected = verts.map { v =>
          v -> fwd(v).filter(u => fwd(u).contains(v)).min
        }.toMap
        got == expected
      }
    }

  property("labelPropagationCommunities = synchronous min-tie-break rounds") =
    forAll(genGraph) { case (edges, _) =>
      val simple = edges.filter(e => e._1 != e._2)
      simple.isEmpty || {
        val got = GraphOps.labelPropagationCommunities(spark, toDf(edges), 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val und = (simple ++ simple.map(_.swap)).distinct.groupBy(_._1)
          .view.mapValues(_.map(_._2)).toMap
        val verts = und.keySet
        var labels = verts.map(v => v -> v).toMap
        for (_ <- 1 to 3) {
          labels = verts.map { v =>
            val counts = und(v).groupBy(labels).view.mapValues(_.size)
            // max count, then min label
            v -> counts.toSeq.maxBy { case (l, n) => (n, -l) }._1
          }.toMap
        }
        got == labels
      }
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sampleBrute(edges: List[(Long, Long)], k: Int): Set[(Long, Long)] =
    edges.distinct.groupBy(_._1).values.flatMap { es =>
      es.map(_._2).distinct
        .sortBy(d => (md5Hex(s"${es.head._1}_${d}_graft"), d)).take(k)
        .map(d => (es.head._1, d))
    }.toSet

  property("sampleEgoNets = layered expansion of the md5-ranked sample") =
    forAll(genGraph) { case (edges, vid) =>
      val fanouts = Seq(2, 1)
      val roots = Seq(vid, (vid + 1) % 3)
      val got = GraphOps.sampleEgoNets(spark, toDf(edges), roots, fanouts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      val s1 = sampleBrute(edges, fanouts(0))
      val s2 = sampleBrute(edges, fanouts(1))
      val l1 = for (r <- roots.distinct.toSet[Long]; e <- s1 if e._1 == r)
        yield (r, 1, e._1, e._2)
      val f1 = l1.map { case (r, _, _, d) => (r, d) }
      val l2 = for ((r, v) <- f1; e <- s2 if e._1 == v) yield (r, 2, e._1, e._2)
      got == l1 ++ l2
    }

  property("jaccardPairs = brute-force out-neighbor set overlap") =
    forAll(genGraph) { case (edges, _) =>
      val got = GraphOps.jaccardPairs(toDf(edges), minCommon = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val out = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val vs = out.keys.toSeq.sorted
      val expected = (for {
        i <- vs.indices; j <- (i + 1) until vs.size
        a = vs(i); b = vs(j)
        common = (out(a) & out(b)).size if common >= 1
      } yield (a, b, common.toLong,
        (out(a).size + out(b).size - common).toLong)).toSet
      got == expected
    }

  property("sssp = bounded Bellman-Ford brute force") =
    forAll(genGraph) { case (edges, vid) =>
      val s = spark
      import s.implicits._
      val weighted = edges.map { case (a, b) => (a, b, (a * 31 + b) % 7 + 1) }
      val got = GraphOps.sssp(spark,
          weighted.toDF("src", "dst", "w"), vid, iters = 6).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var dist = Map(vid -> 0L)
      (1 to 6).foreach { _ =>
        val relaxed = weighted.flatMap { case (a, b, w) =>
          dist.get(a).map(d0 => b -> (d0 + w))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .view.mapValues(_.map(_._2).min).toMap
      }
      got == dist
    }

  property("kCore = bounded peel brute force") =
    forAll(genGraph) { case (edges, _) =>
      val got = GraphOps.kCore(spark, toDf(edges), k = 2, rounds = 8).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var und = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      (1 to 8).foreach { _ =>
        val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= 2).keySet
        und = und.filter(e => keep(e._1) && keep(e._2))
      }
      val expected = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      got == expected
    }

  property("hits matches driver-side max-normalized iteration within 1e-9") =
    forAll(genGraph) { case (edges, _) =>
      edges.isEmpty || {
        val iters = 4
        val got = GraphOps.hits(spark, toDf(edges), iters).collect()
          .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
        val de = edges.distinct
        val verts = (de.map(_._1) ++ de.map(_._2)).distinct
        var h = verts.map(_ -> 1.0).toMap
        var a = Map.empty[Long, Double]
        (1 to iters).foreach { _ =>
          val ar = de.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
          val amax = ar.values.max
          a = verts.map(v => v -> ar.getOrElse(v, 0.0) / amax).toMap
          val hr = de.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
          val hmax = hr.values.max
          h = verts.map(v => v -> hr.getOrElse(v, 0.0) / hmax).toMap
        }
        verts.forall(v => math.abs(got(v)._1 - h(v)) < 1e-9 &&
          math.abs(got(v)._2 - a(v)) < 1e-9)
      }
    }

  property("kTruss = brute-force bounded support peel") =
    forAll(genGraph) { case (edges, _) =>
      val k = 3
      val rounds = 3
      val got = GraphOps.kTruss(spark, toDf(edges), k, rounds).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def support(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
        val adj = (s ++ s.map(e => (e._2, e._1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        s.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
      }
      var cur = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      (1 to rounds).foreach { _ =>
        val sup = support(cur)
        cur = cur.filter(e => sup(e) >= k - 2)
      }
      got == support(cur)
    }

  property("betweennessSampled = driver-side bounded Brandes") =
    forAll(genGraph) { case (edges, vid) =>
      edges.isEmpty || {
        val depth = 3
        val sources = Seq(vid, (vid + 2) % 3).distinct
        val got = GraphOps.betweennessSampled(spark, toDf(edges), sources, depth)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val adj = edges.distinct.groupBy(_._1)
          .view.mapValues(_.map(_._2).distinct).toMap
        var bc = Map.empty[Long, Double].withDefaultValue(0.0)
        var emitted = Set.empty[Long]
        for (s <- sources) {
          var lv = Vector(Map(s -> 1L))
          var vis = Set(s)
          for (l <- 0 until depth) {
            val nxt = scala.collection.mutable.Map.empty[Long, Long]
            for ((u, sig) <- lv(l); w <- adj.getOrElse(u, Nil) if !vis.contains(w))
              nxt(w) = nxt.getOrElse(w, 0L) + sig
            lv :+= nxt.toMap
            vis ++= nxt.keySet
          }
          var delta = lv(depth).keys.map(_ -> 0.0).toMap
          var accAll = delta.toList
          for (l <- depth - 1 to 0 by -1) {
            val next = lv(l + 1)
            delta = lv(l).map { case (v, sig) =>
              v -> adj.getOrElse(v, Nil).filter(next.contains).map { w =>
                sig.toDouble / next(w).toDouble * (1.0 + delta(w))
              }.sum
            }
            accAll ++= delta.toList
          }
          for ((v, dl) <- accAll if v != s) {
            bc = bc.updated(v, bc(v) + dl); emitted += v
          }
        }
        got.keySet == emitted &&
          emitted.forall(v => math.abs(got(v) - bc(v)) < 1e-9)
      }
    }

  property("degreeAssortativity = brute-force Pearson over endpoint degrees") =
    forAll(genGraph) { case (edges, _) =>
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      und.isEmpty || {
        val bi = und ++ und.map(_.swap)
        val deg = bi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val xs = bi.map { case (s, t) => (deg(s), deg(t)) }
        val n = xs.size.toLong
        val sx = xs.map(_._1).sum
        val sxx = xs.map(p => p._1 * p._1).sum
        val sxy = xs.map(p => p._1 * p._2).sum
        val num = n.toDouble * sxy.toDouble - sx.toDouble * sx.toDouble
        val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val row = GraphOps.degreeAssortativity(toDf(edges)).collect().head
        row.getLong(0) == n && row.getLong(1) == sx &&
          row.getLong(2) == sxx && row.getLong(3) == sxy &&
          ((den == 0.0 && row.isNullAt(4)) ||
            (den != 0.0 && math.abs(row.getDouble(4) - num / den) < 1e-12))
      }
    }

  property("harmonicCloseness = driver multi-source BFS, bit-equal combine") =
    forAll(genGraph) { case (edges, vid) =>
      edges.isEmpty || {
        val depth = 3
        val sources = Seq(vid, (vid + 1) % 3).distinct
        val got = GraphOps.harmonicCloseness(spark, toDf(edges), sources, depth)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val adj = edges.distinct.groupBy(_._1)
          .view.mapValues(_.map(_._2).distinct).toMap
        // counts(v)(d) = number of sources at distance exactly d
        val counts = scala.collection.mutable.Map
          .empty[Long, Array[Long]].withDefault(_ => Array.fill(depth + 1)(0L))
        for (s <- sources) {
          var frontier = Set(s)
          var vis = Set(s)
          for (d <- 1 to depth) {
            frontier = frontier.flatMap(u => adj.getOrElse(u, Nil)) -- vis
            vis ++= frontier
            frontier.foreach { v =>
              val a = counts(v); a(d) += 1L; counts(v) = a
            }
          }
        }
        val exp = counts.toMap.map { case (v, a) =>
          v -> (1 to depth).map(d => a(d).toDouble / d.toDouble)
            .reduce(_ + _)
        }
        // bit-equal: same exact counts, same fixed-order IEEE combine
        got.keySet == exp.keySet && exp.forall { case (v, h) => got(v) == h }
      }
    }

  property("adamicAdarPairs = brute force over shared out-neighbors") =
    forAll(genGraph) { case (edges, _) =>
      val e = edges.distinct
      e.isEmpty || {
        val got = GraphOps.adamicAdarPairs(toDf(edges), minCommon = 1)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
          .toMap
        val out = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val indeg = e.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val verts = out.keys.toSeq.sorted
        val exp = (for {
          a <- verts; b <- verts if a < b
          common = out(a) intersect out(b) if common.nonEmpty
        } yield (a, b) -> (common.size.toLong,
          common.toSeq.map(w => 1.0 / math.log(indeg(w).toDouble)).sum))
          .toMap
        got.keySet == exp.keySet && exp.forall { case (k, (n, aa)) =>
          got(k)._1 == n && math.abs(got(k)._2 - aa) < 1e-9
        }
      }
    }

  property("pageRank matches driver-side power iteration within 1e-9") =
    forAll(genGraph) { case (edges, _) =>
      edges.isEmpty || {
        val got = GraphOps.pageRank(spark, toDf(edges), iters = 10).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val d = 0.85
        val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val odeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
        var ranks = verts.map(_ -> 1.0).toMap
        (1 to 10).foreach { _ =>
          val in = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, _) => ranks(s) / odeg(s) }.sum).toMap
          ranks = verts.map(v => v -> ((1 - d) + d * in.getOrElse(v, 0.0))).toMap
        }
        verts.forall(v => math.abs(got(v) - ranks(v)) < 1e-9)
      }
    }

  property("pageRankWeighted matches driver-side weighted power iteration; uniform w == pageRank") =
    forAll(genGraph) { case (edges, _) =>
      edges.isEmpty || {
        import org.apache.spark.sql.functions.{col, lit, pmod}
        def w(s: Long, t: Long): Double = ((s * 31 + t) % 7 + 1).toDouble
        val df = toDf(edges).withColumn("w",
          pmod(col("src") * 31 + col("dst"), lit(7L)) + 1)
        val got = GraphOps.pageRankWeighted(spark, df, iters = 10).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val d = 0.85
        val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val ow = edges.groupBy(_._1).view
          .mapValues(_.map { case (s, t) => w(s, t) }.sum).toMap
        var ranks = verts.map(_ -> 1.0).toMap
        (1 to 10).foreach { _ =>
          val in = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, t) => ranks(s) * (w(s, t) / ow(s)) }.sum).toMap
          ranks = verts.map(v => v -> ((1 - d) + d * in.getOrElse(v, 0.0))).toMap
        }
        val weightedOk = verts.forall(v => math.abs(got(v) - ranks(v)) < 1e-9)
        // uniform weights must reduce to plain pageRank (same fixpoint)
        val uni = GraphOps.pageRankWeighted(spark,
          toDf(edges).withColumn("w", lit(3L)), iters = 10).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val plain = GraphOps.pageRank(spark, toDf(edges), iters = 10).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        weightedOk && verts.forall(v => math.abs(uni(v) - plain(v)) < 1e-9)
      }
    }
}
