package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps
import graft.operators.Dedup

/** Round-7 operators vs in-memory brute force: the edit-distance join's
  * banding must find EXACTLY the brute-force levenshtein pairs, and
  * temporal reachability must match a reference relaxation on a random
  * timestamped multigraph.
  */
class Round7OpsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  test("editDistanceJoin: banding finds EXACTLY the brute-force pairs (k=1,2)") {
    import spark.implicits._
    // corpus with planted near-dups: 80 doc heads + seeded-random edits
    // (substitution / deletion / insertion) of a third of them — plus a
    // couple of degenerate short strings for the tiny path
    val rnd = new scala.util.Random(0x77)
    val heads = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(80).select(col("doc_id"), substring(col("text"), 1, 50).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val variants = heads.filter(_._1 % 3 == 0).map { case (id, s) =>
      val p = rnd.nextInt(s.length)
      val mutated = rnd.nextInt(3) match {
        case 0 => s.updated(p, (('a' + rnd.nextInt(26)).toChar))
        case 1 => s.take(p) + s.drop(p + 1)
        case _ => s.take(p) + ('a' + rnd.nextInt(26)).toChar + s.drop(p)
      }
      (id + 10000L, mutated)
    }
    val all = heads ++ variants ++ Seq((90001L, "a"), (90002L, "ab"), (90003L, "b"))
    val docs = all.toSeq.toDF("doc_id", "text")
    for (k <- Seq(1, 2)) {
      val got = Dedup.editDistanceJoin(docs, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        d = lev(sa, sb) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("temporalReachability matches reference relaxation; is a subset of plain BFS") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val V = 60
    val edges = Seq.fill(400)(
      (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong, rnd.nextInt(20).toLong))
    val df = edges.toDF("src", "dst", "ts")
    val rounds = 16
    val got = GraphOps.temporalReachability(spark, df, root = 0L, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // reference: bounded full relaxation of (v -> min arrival)
    var arr = Map(0L -> -1L)
    for (_ <- 1 to rounds) {
      val relaxed = for {
        (u, au) <- arr.toSeq
        (s, d, t) <- edges if s == u && t >= au
      } yield (d, t)
      arr = (arr.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, vs) => (v, vs.map(_._2).min) }
    }
    assert(got === arr)
    // time-respecting reachability never exceeds plain (untimed) BFS
    var plain = Set(0L)
    var grew = true
    while (grew) {
      val next = plain ++ edges.collect { case (s, d, _) if plain(s) => d }
      grew = next.size > plain.size
      plain = next
    }
    assert(got.keySet.subsetOf(plain))
    // and on this dense-enough graph the constraint actually bites
    // somewhere or the graph is trivially monotone — either way the
    // subset relation above is the semantic contract
  }

  test("widestPaths matches bounded in-memory max-min relaxation") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xB07)
    val V = 60
    val edges = Seq.fill(700)(
      (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong,
        (rnd.nextInt(9) + 1).toLong))
    val df = edges.toDF("src", "dst", "w")
    val rounds = 12
    val got = GraphOps.widestPaths(spark, df, source = 0L, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var cap = Map(0L -> GraphOps.WidestSourceCap)
    for (_ <- 1 to rounds) {
      val relaxed = for {
        (u, cu) <- cap.toSeq
        (s, d, w) <- edges if s == u
      } yield (d, math.min(cu, w))
      cap = (cap.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, vs) => (v, vs.map(_._2).max) }
    }
    assert(got === cap)
    // bottleneck capacity can never exceed the best direct out-weight
    // seen anywhere on the reachable graph's edges
    val wmax = edges.map(_._3).max
    assert(got.forall { case (v, c) =>
      v == 0L || c <= wmax })
  }

  test("simRank matches bounded in-memory fixed-point iteration; tracks real SimRank") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x51AB)
    val V = 40
    val edges = Seq.fill(160)(
      (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong)).distinct
    val df = edges.toDF("src", "dst")
    val rounds = 3
    val got = GraphOps.simRank(spark, df, rounds)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // reference 1: the same integer fixed-point model (exact match)
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1).distinct).toMap
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val One = GraphOps.SimRankOne
    def diagDefault(m: Map[(Long, Long), Long]): ((Long, Long)) => Long = {
      case (x, y) => if (x == y && verts.contains(x)) One else 0L
    }
    var s = Map.empty[(Long, Long), Long].withDefault(diagDefault(Map.empty))
    for (_ <- 1 to rounds) {
      val next = (for {
        a <- verts; b <- verts; if a != b
        ia = inN.getOrElse(a, Seq.empty); ib = inN.getOrElse(b, Seq.empty)
        if ia.nonEmpty && ib.nonEmpty
      } yield {
        val total = (for (u <- ia; v <- ib) yield s((u, v))).sum
        ((a, b), (3L * total) / (4L * ia.size * ib.size))
      }).toMap
      s = next.withDefault(diagDefault(next))
    }
    val want = s.filter { case ((a, b), v) => a < b && v != 0L }
    assert(got.keySet === want.keySet)
    assert(got === want) // bit-exact: all-integer arithmetic
    // reference 2: the fixed-point result tracks REAL (double) SimRank
    // within rounds·1e-12 truncation loss
    var r = Map.empty[(Long, Long), Double].withDefault {
      case (x, y) => if (x == y && verts.contains(x)) 1.0 else 0.0
    }
    for (_ <- 1 to rounds) {
      val next = (for {
        a <- verts; b <- verts; if a != b
        ia = inN.getOrElse(a, Seq.empty); ib = inN.getOrElse(b, Seq.empty)
        if ia.nonEmpty && ib.nonEmpty
      } yield {
        val total = (for (u <- ia; v <- ib) yield r((u, v))).sum
        ((a, b), 0.75 * total / (ia.size.toLong * ib.size))
      }).toMap
      r = next.withDefault {
        case (x, y) => if (x == y && verts.contains(x)) 1.0 else 0.0
      }
    }
    got.foreach { case (k, v) =>
      assert(math.abs(v.toDouble / One - r(k)) < rounds * 1e-12 + 1e-9, s"$k") }
    // similarity bounded by C
    assert(got.values.forall(v => v > 0L && v <= (3L * One) / 4L))
  }

  test("maximalMatching: valid matching, maximal at convergence, equals round model") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x3A7C)
    val V = 80
    val edges = Seq.fill(400)(
      (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong))
    val df = edges.toDF("src", "dst")
    val rounds = 12
    val got = GraphOps.maximalMatching(spark, df, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // in-memory twin of the mutual-proposal rounds (same md5 priority)
    def h(r: Int, a: Long, b: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"match-$r-$a-$b".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    var alive = edges.map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    var want = Set.empty[(Long, Long)]
    for (r <- 1 to rounds if alive.nonEmpty) {
      val prop = (alive.toSeq.map { case (a, b) => (a, (h(r, a, b), a, b)) } ++
        alive.toSeq.map { case (a, b) => (b, (h(r, a, b), a, b)) })
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val m = alive.filter { case (a, b) =>
        prop(a) == (h(r, a, b), a, b) && prop(b) == (h(r, a, b), a, b) }
      want ++= m
      val mv = m.flatMap(e => Seq(e._1, e._2))
      alive = alive.filterNot(e => mv(e._1) || mv(e._2))
    }
    assert(got === want)
    // matching property: no vertex appears twice
    val vs = got.toSeq.flatMap(e => Seq(e._1, e._2))
    assert(vs.distinct.size === vs.size)
    // maximality: every remaining edge touches a matched vertex
    val mset = vs.toSet
    val allE = edges.map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .filter { case (a, b) => a != b }
    assert(allE.forall { case (a, b) => mset(a) || mset(b) })
  }

  test("trialColoring: proper coloring, equals round model, total at convergence") {
    import spark.implicits._
    def md5Long(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    def h(r: Int, v: Long): Long = md5Long(s"color-$r-$v")
    def hp(r: Int, v: Long): Long = md5Long(s"colorpick-$r-$v")
    val rnd = new scala.util.Random(0xC0105)
    val V = 70
    val edges = Seq.fill(350)(
      (rnd.nextInt(V).toLong, rnd.nextInt(V).toLong))
    val df = edges.toDF("src", "dst")
    val rounds = 15
    val got = GraphOps.trialColoring(spark, df, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val canon = edges.map { case (s, t) => (math.min(s, t), math.max(s, t)) }
      .filter { case (a, b) => a != b }.distinct
    // in-memory twin of the JP rounds
    val verts = canon.flatMap(e => Seq(e._1, e._2)).distinct
    val nbr = (canon ++ canon.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    var und = verts.toSet
    var color = Map.empty[Long, Long]
    for (r <- 1 to rounds if und.nonEmpty) {
      // trial pick: uniform over [0..deg] minus colored-neighbor colors
      val cand = und.map { v =>
        val f = nbr(v).flatMap(color.get)
        val avail = (0L to nbr(v).size.toLong).filterNot(f)
        v -> avail((hp(r, v) % avail.size).toInt)
      }.toMap
      // conflict resolution: adjacent equal candidates -> strict
      // (priority, v) max keeps
      val winners = und.filter(v => nbr(v).filter(und).forall(n =>
        cand(n) != cand(v) ||
          h(r, n) < h(r, v) || (h(r, n) == h(r, v) && n < v)))
      color ++= winners.map(v => v -> cand(v))
      und --= winners
    }
    assert(got === color)
    // proper: no edge with equal endpoint colors (among colored)
    canon.foreach { case (a, b) =>
      if (got.contains(a) && got.contains(b))
        assert(got(a) != got(b), s"conflict on ($a,$b)") }
    // converged: every vertex colored, palette is compact (≤ maxdeg+1)
    assert(got.keySet === verts.toSet)
    val maxDeg = nbr.values.map(_.size).max
    assert(got.values.max <= maxDeg)
  }

  test("streamStaticJoin enrichment equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = streaming.StreamingQueries.streamStaticJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v2"))
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("u_events"))
    val batch = ev.filter(col("event_type") === "purchase")
      .join(dim, "user_id")
      .select(col("event_id"), col("user_id"), col("u_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("containmentPairs finds embedded documents that jaccard misses; df cap only removes") {
    import spark.implicits._
    val base = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .limit(40).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // plant: doc 9000+i = (short prefix of doc i) embedded in a long tail
    // of doc (i+1)'s text — high containment, low jaccard
    val planted = base.take(10).zipWithIndex.map { case ((id, txt), i) =>
      val small = txt.split(" ").take(12).mkString(" ")
      val fill = base((i + 1) % base.length)._2.split(" ").take(120).mkString(" ")
      (9000L + id, small + " " + fill)
    }
    val smalls = base.take(10).map { case (id, txt) =>
      (5000L + id, txt.split(" ").take(12).mkString(" ")) }
    val docs = (base ++ planted ++ smalls).toSeq.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val pairs = Dedup.containmentPairs(docs, 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every small doc is contained in its planted host
    smalls.zip(planted).foreach { case ((sid, _), (pid, _)) =>
      assert(pairs.contains((sid, pid)), s"missing ($sid, $pid)") }
    // jaccard at the same bar misses them (the union is dominated by fill)
    val jac = Dedup.ngramJaccardPairs(docs, 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    smalls.zip(planted).foreach { case ((sid, _), (pid, _)) =>
      assert(!jac.contains((sid, pid))) }
    // a df cap can only REMOVE pairs (drops index entries), never add
    val capped = Dedup.containmentPairs(docs, 3, 0.9, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(pairs))
  }

  test("streamStreamJoin block feed reproduces the batch interval join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = streaming.StreamingQueries.streamStreamJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("user_id"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("tss").as("v_tss"),
        col("user_id").as("v_user"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("tss").as("c_tss"),
        col("user_id").as("c_user"))
    val batch = v.join(c,
      col("v_user") === col("c_user") &&
        col("c_tss") >= col("v_tss") &&
        col("c_tss") <= col("v_tss") +
          expr(s"interval ${streaming.StreamingQueries.JoinRangeSec} seconds"))
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("bipartiteColoring: verdict matches brute force; coloring is a proper witness") {
    import spark.implicits._
    // even cycle (bipartite) + odd cycle (not) + a path + an isolated
    // edge + a self-loop on the path (ignored under simple semantics)
    val even = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val odd = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val path = Seq((20L, 21L), (21L, 22L), (21L, 21L))
    val iso = Seq((30L, 31L))
    val rows = GraphOps.bipartiteColoring(spark,
        (even ++ odd ++ path ++ iso).toDF("src", "dst"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L))
    // per-component verdicts
    assert(Seq(0L, 1L, 2L, 3L).forall(rows(_)._3), "even cycle must be bipartite")
    assert(Seq(10L, 11L, 12L).forall(!rows(_)._3), "odd cycle must not be bipartite")
    assert(Seq(20L, 21L, 22L).forall(rows(_)._3), "path (self-loop ignored) bipartite")
    assert(Seq(30L, 31L).forall(rows(_)._3))
    // components are the min-id labels
    assert(rows(3L)._1 === 0L && rows(12L)._1 === 10L && rows(31L)._1 === 30L)
    // where bipartite, the coloring is PROPER (no monochromatic edge)
    (even ++ path.filter(e => e._1 != e._2) ++ iso).foreach { case (a, b) =>
      assert(rows(a)._2 !== rows(b)._2, s"edge ($a,$b) monochromatic")
    }
    // colors are root-distance parity: roots are color 0
    assert(rows(0L)._2 === 0 && rows(10L)._2 === 0 && rows(20L)._2 === 0)
  }

  test("kmvIntersect: exact when the union fits in k; matches set arithmetic") {
    import spark.implicits._
    // |A ∪ B| = 150 < k = 256 → sketches are exhaustive: rho, union
    // and intersection estimates must all be EXACT
    val a = (0L until 100L).toDF("x")
    val b = (50L until 150L).toDF("x")
    val r = operators.Sketches.kmvIntersect(a, "x", b, "x").collect()(0)
    assert(r.getAs[Long]("n_used") === 150L)
    assert(r.getAs[Long]("rho") === 50L)
    assert(r.getAs[Long]("union_micro") === 150L * 1000000L)
    assert(r.getAs[Long]("inter_micro") === 50L * 1000000L)
    // jaccard = 50/150, floor-rounded to micro units
    assert(r.getAs[Long]("jaccard_micro") ===
      math.floor(50.0 / 150.0 * 1e6 + 0.5).toLong)
    // k-overflow path: estimates within 15% of truth on 4000-key sets
    val a2 = (0L until 3000L).toDF("x")
    val b2 = (2000L until 5000L).toDF("x")
    val r2 = operators.Sketches.kmvIntersect(a2, "x", b2, "x").collect()(0)
    assert(math.abs(r2.getAs[Long]("union_micro") - 5000L * 1000000L)
      <= 750L * 1000000L)
    assert(math.abs(r2.getAs[Long]("inter_micro") - 1000L * 1000000L)
      <= 400L * 1000000L)
  }

  test("bm25TopK matches in-memory BM25; conjunctive search = brute containment") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val terms = operators.Retrieval.QueryTerms
    // in-memory reference: same rational idf + micro-quantization
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val dfm = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toDouble).toMap
    val expected = toks.flatMap { case (id, ws) =>
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
          val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (ws.length / avgdl)))
          math.floor(idf * tfn * 1e6 + 0.5).toLong
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = operators.Retrieval.bm25TopK(docs, terms)
      .orderBy(col("rk"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro")))
    assert(got.toSeq === expected.toSeq)
    // conjunctive search from the STORED index == brute containment
    val tmp = java.nio.file.Files.createTempDirectory("graft_postings").toString
    operators.Retrieval.writePostingsIndex(docs, tmp)
    val found = operators.Retrieval.conjunctiveSearchStored(spark, tmp, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val brute = toks.filter(tw => terms.forall(tw._2.contains))
      .map { case (id, ws) => id -> ws.count(terms.contains).toLong }.toMap
    assert(found === brute)
  }

  test("reciprocity / transitivity / neighborhoodAgg vs brute force on a random multigraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val edges = Seq.fill(600)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("src", "dst")
    // reciprocity on the directed simple graph
    val simple = edges.filter(e => e._1 != e._2).distinct
    val nMutual = simple.count(e => simple.contains((e._2, e._1)))
    val r = GraphOps.reciprocity(df).collect()(0)
    assert(r.getAs[Long]("n_edges") === simple.size.toLong)
    assert(r.getAs[Long]("n_mutual") === nMutual.toLong)
    assert(r.getAs[Long]("reciprocity_micro") ===
      1000000L * nMutual / simple.size)
    // transitivity on the undirected simple graph
    val und = simple.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq
    val degm = vs.map(v =>
      v -> und.count(e => e._1 == v || e._2 == v).toLong).toMap
    val triCount = und.toSeq.flatMap { case (a, b) =>
      vs.filter(c => c > b && und((a, c)) && und((b, c))).map(_ => 1)
    }.size.toLong
    val wedges = degm.values.map(d => d * (d - 1) / 2).sum
    val tr = GraphOps.transitivity(df).collect()(0)
    assert(tr.getAs[Long]("n_triangles") === triCount)
    assert(tr.getAs[Long]("n_wedges") === wedges)
    assert(tr.getAs[Long]("transitivity_micro") ===
      (if (wedges > 0) 3000000L * triCount / wedges else 0L))
    // 2-layer mean aggregation
    val nbrs = vs.map(v => v -> und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }.toSeq).toMap
    val h1 = vs.map(v =>
      v -> 1000000L * nbrs(v).map(degm).sum / degm(v)).toMap
    val h2 = vs.map(v => v -> nbrs(v).map(h1).sum / degm(v)).toMap
    val got = GraphOps.neighborhoodAgg(df).collect()
      .map(r0 => r0.getAs[Long]("v") ->
        (r0.getAs[Long]("deg"), r0.getAs[Long]("h1_micro"),
          r0.getAs[Long]("h2_micro"))).toMap
    assert(got.keySet === vs.toSet)
    vs.foreach { v =>
      assert(got(v) === ((degm(v), h1(v), h2(v))), s"vertex $v")
    }
  }

  test("modularityByCommunity: exact accounting; contribs sum to modularityOf") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val edges = Seq.fill(500)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("src", "dst")
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val verts = und.flatMap(e => Seq(e._1, e._2)).distinct
    val part = verts.map(v => (v, v % 3)).toDF("v", "community")
    val m = und.size.toDouble
    val degm = verts.map(v =>
      v -> und.count(e => e._1 == v || e._2 == v).toLong).toMap
    val expected = (0L until 3L).map { c =>
      val members = verts.filter(_ % 3 == c)
      val eIn = und.count(e => e._1 % 3 == c && e._2 % 3 == c).toLong
      val vol = members.map(degm).sum
      val half = vol.toDouble / (2.0 * m)
      (c, members.size.toLong, eIn, vol,
        math.floor(1e6 * (eIn.toDouble / m - half * half)).toLong)
    }.toSet
    val got = GraphOps.modularityByCommunity(spark, df, part).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    // the micro contributions sum to the scalar objective (±1µ each)
    val q = GraphOps.modularityOf(df, part)
    val qMicro = got.toSeq.map(_._5).sum
    assert(math.abs(qMicro - q * 1e6) <= got.size.toDouble)
  }

  test("labelPropagationSeeded = brute synchronous rounds; seeds immovable") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = edges.toDF("src", "dst")
    val seedMap = Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L)
    val seeds = seedMap.toSeq.toDF("v", "label")
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = und.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, l) => v -> l.map(_._2) }
    var lab: Map[Long, Long] = seedMap
    (1 to 4).foreach { _ =>
      val next = nbrs.flatMap { case (v, ns) =>
        val votes = ns.flatMap(lab.get).groupBy(identity)
          .map { case (l, o) => (l, o.size) }
        if (votes.isEmpty) None
        else Some(v -> votes.toSeq.minBy { case (l, n) => (-n, l) }._1)
      }.toMap
      lab = next -- seedMap.keys ++ seedMap
    }
    val got = GraphOps.labelPropagationSeeded(spark, df, seeds).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
    assert(got === lab)
    seedMap.foreach { case (v, l) => assert(got(v) === l, s"seed $v moved") }
  }

  test("leakSafeSplit: near-dup cluster members always share a side") {
    import spark.implicits._
    // 3 planted near-dup families (shared long text, one word changed)
    // + unrelated singles
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = ((0 until 30).map { i =>
      val fam = i % 3
      (i.toLong, s"family$fam $base end${i / 3}x", "web")
    } ++ (100 until 120).map { i =>
      (i.toLong, s"unique doc $i " + Seq.tabulate(12)(j =>
        s"tok${i * 31 + j}").mkString(" "), "web")
    }).toDF("doc_id", "text", "source")
    val res = operators.Pipeline.leakSafeSplit(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("split_key"),
        r.getAs[String]("split")))
    assert(res.length === 50)
    // same split_key -> same split, and clusters are non-trivial
    val byKey = res.groupBy(_._2)
    assert(byKey.exists(_._2.length > 1), "no multi-doc cluster planted?")
    byKey.foreach { case (k, rows) =>
      assert(rows.map(_._3).distinct.length === 1,
        s"cluster $k straddles splits")
    }
  }

  test("phraseCount: consecutive-only matches, overlaps counted, short docs safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x hong kong y hong kong z"),   // two occurrences
      (2L, "hong x kong"),                 // terms present, not adjacent
      (3L, "kong hong"),                   // wrong order
      (4L, "hong hong hong"),              // overlapping self-phrase
      (5L, "hong"),                        // shorter than the phrase
      (6L, "hong kong")                    // exact doc == phrase
    ).toDF("doc_id", "text")
    val got = operators.Retrieval.phraseCount(docs, Seq("hong", "kong"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 6L -> 1L))
    val self = operators.Retrieval.phraseCount(docs, Seq("hong", "hong"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(self === Map(4L -> 2L)) // windows [0,1] and [1,2] both match
  }

  test("corenessHIndex = exact peeling coreness; 14 rounds converge on the gate graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(500)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
    val df = edges.toDF("src", "dst")
    // brute force: v's coreness = largest k such that v survives
    // iterated deletion of degree<k vertices
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val allV = und.flatMap(e => Seq(e._1, e._2)).distinct
    def kCoreSurvivors(k: Int): Set[Long] = {
      var alive = allV.toSet
      var changed = true
      while (changed) {
        val deg = alive.map(v => v -> und.count(e =>
          (e._1 == v && alive(e._2)) || (e._2 == v && alive(e._1)))).toMap
        val drop = alive.filter(v => deg(v) < k)
        changed = drop.nonEmpty
        alive --= drop
      }
      alive
    }
    val brute = allV.map { v =>
      v -> Iterator.from(1).takeWhile(k => kCoreSurvivors(k)(v)).length.toLong
    }.toMap
    val got = GraphOps.corenessHIndex(spark, df, rounds = 16).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("coreness")).toMap
    assert(got === brute)
    // convergence claim behind the 14-round gate entry: rounds 14 == 15
    val gate = graph.GraphQueries.edgesFrom(spark, "/root/testdata/sf0.01")
    val cA = GraphOps.corenessHIndex(spark, gate, rounds = 14).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cB = GraphOps.corenessHIndex(spark, gate, rounds = 15).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cA === cB, "gate graph not converged at 14 H-index rounds")
  }

  test("wlRefine: isomorphic components get identical colors; roles separate") {
    import spark.implicits._
    // component A: path 0-1-2-3-4 plus a triangle hung off vertex 1 —
    // asymmetric, so the two path endpoints are NOT automorphic
    val compA = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 1L))
    // component B: the same graph under v -> v + 100
    val compB = compA.map { case (a, b) => (a + 100L, b + 100L) }
    val df = (compA ++ compB).toDF("src", "dst")
    val wl = GraphOps.wlRefine(spark, df).collect()
      .map(r => r.getAs[Long]("v") ->
        (r.getAs[String]("wl"), r.getAs[Long]("class_size"))).toMap
    // isomorphism: v and v+100 are corresponding vertices -> same color
    (0L to 6L).foreach { v =>
      assert(wl(v)._1 === wl(v + 100)._1, s"corresponding vertex $v")
      assert(wl(v)._2 >= 2L, s"class of $v spans both components")
    }
    // role separation: the path endpoint (0) and the triangle vertex (5)
    // are structurally different
    assert(wl(0L)._1 !== wl(5L)._1)
    // the two path endpoints sit at different distances from the
    // triangle (1 vs 3 hops) — 3 refinement rounds tell them apart
    assert(wl(0L)._1 !== wl(4L)._1)
    // 5 and 6 ARE automorphic (triangle symmetry) -> same color
    assert(wl(5L)._1 === wl(6L)._1)
  }

  test("sortedNeighborhoodPairs = brute SNM (sort, window, exact Jaccard)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // shared-prefix families: same 16-char head, diverging tails
    val docs = (0 until 60).map { i =>
      val fam = i % 9
      val tail = Seq.fill(6)("w" + rnd.nextInt(12)).mkString(" ")
      (i.toLong, s"family$fam common head marker $tail")
    }.toDF("doc_id", "text")
    val got = operators.Dedup.sortedNeighborhoodPairs(docs, w = 8, n = 3, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // brute force
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    def sh(s: String) = {
      val t = norm(s).split(" ").toSeq
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty[String]
    }
    val ordered = rows.sortBy { case (id, tx) => (norm(tx).take(16), id) }
    val expected = (for {
      i <- ordered.indices
      j <- (i + 1) until math.min(i + 8, ordered.length)
    } yield {
      val (aId, aT) = ordered(i); val (bId, bT) = ordered(j)
      val (sa, sb) = (sh(aT), sh(bT))
      val jac = sa.intersect(sb).size * 1.0 / sa.union(sb).size
      (aId, bId, (j - i).toLong, jac)
    }).filter(_._4 >= 0.2).toSet
    assert(got === expected)
    assert(got.nonEmpty, "planted prefix families produced no SNM pairs")
  }

  test("pmiBigrams: planted collocation outranks frequent-but-independent pairs") {
    import spark.implicits._
    // 'hong kong' always adjacent (perfect collocation); 'the' is
    // frequent everywhere, so ('the', x) pairs have high counts but
    // low association
    val docs = (0 until 40).map { i =>
      (i.toLong, "the visit to hong kong was the plan the end " +
        s"w$i the w${i % 7}")
    }.toDF("doc_id", "text")
    val res = operators.TextAnalysis.pmiBigrams(docs, minCount = 5, topN = 5)
      .collect()
    val top = res.minBy(_.getAs[Long]("rank"))
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) ===
      (("hong", "kong")))
    // exact score: c12=40, c1=c2=40, N = total pairs
    val nPairs = 40L * 12L // 13 tokens per doc -> 12 adjacent pairs
    assert(top.getAs[Long]("c12") === 40L)
    assert(top.getAs[Long]("pmi_micro") ===
      math.floor(1e6 * ((40.0 * nPairs) / (40.0 * 40.0))).toLong)
  }

  test("hybridRrf = in-memory fusion of the two rank lists; ranks carried faithfully") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, dir, "documents")
    val emb = Tables.t(spark, dir, "embeddings")
    val terms = operators.Retrieval.QueryTerms
    // fuse the two (already independently spec-tested) lists in memory
    val lex = operators.Retrieval.bm25TopK(docs, terms, 50)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rk")).toMap
    val dense = operators.Similarity
      .bruteForceTopK(emb, col("vec_id") === 7L, 50)
      .collect().map(r => r.getAs[Long]("n_id") -> r.getAs[Int]("rank").toLong).toMap
    def contrib(rk: Option[Long]) =
      rk.map(r => math.floor(1e6 / (60.0 + r)).toLong).getOrElse(0L)
    val expected = (lex.keySet ++ dense.keySet).toSeq
      .map(id => (id, contrib(lex.get(id)) + contrib(dense.get(id)),
        lex.getOrElse(id, 0L), dense.getOrElse(id, 0L)))
      .sortBy { case (id, s, _, _) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s, lr, dr), i) => (id, s, lr, dr, i + 1L) }
    val got = operators.Retrieval
      .hybridRrf(docs, emb, terms, 7L)
      .orderBy(col("rk"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("lex_rank"), r.getAs[Long]("dense_rank"), r.getAs[Long]("rk")))
    assert(got.toSeq === expected)
    // fusion must actually mix: the top-10 contains docs from both lists
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
  }

  test("importanceResample: docs sharing the target's vocabulary outrank the rest") {
    import spark.implicits._
    // target lang 'en' uses vocabulary {alpha..delta}; distractors use
    // a disjoint vocabulary; one 'xx' doc written IN the target
    // vocabulary must outrank every distractor
    val docs = (
      (0L until 10L).map(i => (i, "alpha beta gamma delta alpha beta", "en", "s", 34L)) ++
      (10L until 30L).map(i => (i, "omega psi chi phi upsilon tau", "xx", "s", 29L)) :+
      ((99L, "alpha beta alpha beta alpha beta", "xx", "s", 31L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.Pipeline.importanceResample(docs, targetLang = "en",
        topN = 15).collect()
    assert(out.length === 15)
    val rkOf = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rk")).toMap
    // all 10 target docs + the target-vocabulary impostor beat the rest
    val leaders = out.sortBy(_.getAs[Long]("rk")).take(11)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(leaders === ((0L until 10L).toSet + 99L),
      s"leaders were $leaders")
    // weights are monotone in rank (ties broken by doc_id)
    val byRk = out.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("weight"))
    assert(byRk.zip(byRk.tail).forall { case (w1, w2) => w1 >= w2 })
    assert(rkOf.values.toSet === (1L to 15L).toSet)
  }
}
