package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, throws}

import graft.graph.{GraphOps, Motif}

/** Property-based checks for the round-5 graph additions: motif pattern
  * matching vs brute-force enumeration, personalized PageRank vs a
  * driver-side power iteration, and the deterministic hash-seeded
  * sampling primitives (neighbor fan-out, random walks) vs driver-side
  * re-derivations of the same md5 ranking.
  */
object MotifWalkProps extends Properties("graft.motif") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genGraph: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L)
    } yield (s, d))
  } yield edges

  private def toDf(edges: List[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  private def multiset[A](rows: Seq[A]): Map[A, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  property("find wedge = brute-force join with multiplicity") =
    forAll(genGraph) { edges =>
      val got = Motif.find(toDf(edges), "(a)-[]->(b); (b)-[]->(c)").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expected = for {
        (a, b) <- edges
        (b2, c) <- edges if b2 == b
      } yield (a, b, c)
      multiset(got) == multiset(expected)
    }

  property("find 3-cycle = brute force") =
    forAll(genGraph) { edges =>
      val got = Motif.find(toDf(edges),
        "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expected = for {
        (a, b) <- edges
        (b2, c) <- edges if b2 == b
        (c2, a2) <- edges if c2 == c && a2 == a
      } yield (a, b, c)
      multiset(got) == multiset(expected)
    }

  property("negated term = NOT EXISTS on the binding") =
    forAll(genGraph) { edges =>
      val got = Motif.find(toDf(edges),
        "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val present = edges.toSet
      val expected = for {
        (a, b) <- edges
        (b2, c) <- edges if b2 == b && !present.contains((a, c))
      } yield (a, b, c)
      multiset(got) == multiset(expected)
    }

  property("anonymous vertex joined through, not returned") =
    forAll(genGraph) { edges =>
      val df = Motif.find(toDf(edges), "(a)-[]->(); ()-[]->(a)")
      val got = df.collect().map(_.getLong(0)).toSeq
      val expected = for {
        (a, _) <- edges
        (_, a2) <- edges if a2 == a
      } yield a
      df.columns.toSeq == Seq("a") && multiset(got) == multiset(expected)
    }

  property("self-loop term binds one variable") =
    forAll(genGraph) { edges =>
      val got = Motif.find(toDf(edges), "(a)-[]->(a)").collect()
        .map(_.getLong(0)).toSeq
      multiset(got) == multiset(edges.filter(e => e._1 == e._2).map(_._1))
    }

  property("malformed patterns throw") = {
    val e = toDf(List((0L, 1L)))
    throws(classOf[IllegalArgumentException]) {
      Motif.find(e, "(a)->(b)")
    } && throws(classOf[IllegalArgumentException]) {
      Motif.find(e, "!(a)-[]->(zz); (a)-[]->(b)") // zz unbound by positives
    } && throws(classOf[IllegalArgumentException]) {
      Motif.find(e, "")
    }
  }

  property("personalizedPageRank matches driver power iteration within 1e-9") =
    forAll(genGraph) { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val sources = verts.take(2)
      val got = GraphOps.personalizedPageRank(spark, toDf(edges), sources)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val odeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val ind = verts.map(v => v -> (if (sources.contains(v)) 1.0 else 0.0)).toMap
      var rank = ind
      for (_ <- 1 to 10) {
        val in = edges.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => rank(u) / odeg(u) }.sum).toMap
        rank = verts.map(v =>
          v -> (0.15 * ind(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
      }
      verts.forall(v => math.abs(got(v) - rank(v)) < 1e-9)
    }

  property("sampleNeighbors = top-k by (md5, dst) per source") =
    forAll(genGraph, Gen.choose(1, 4)) { (edges, k) =>
      val got = GraphOps.sampleNeighbors(toDf(edges), k, "s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val expected = edges.groupBy(_._1).toSeq.flatMap { case (src, es) =>
        es.map(_._2).sortBy(d => (md5hex(s"${src}_${d}_s"), d))
          .take(k).zipWithIndex.map { case (d, i) => (src, d, i + 1) }
      }
      multiset(got) == multiset(expected)
    }

  property("randomWalks = driver-side md5-seeded simulation") =
    forAll(genGraph) { edges =>
      val roots = edges.map(_._1).distinct.take(3)
      val steps = 4
      val got = GraphOps.randomWalks(spark, toDf(edges), roots, steps, "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val expected = roots.flatMap { root =>
        var v = root
        var rows = List((root, 0L, root))
        var alive = true
        for (i <- 1 to steps if alive) {
          adj.get(v) match {
            case Some(ds) =>
              v = ds.minBy(d => md5hex(s"${root}_${i}_${d}_s"))
              rows ::= ((root, i.toLong, v))
            case None => alive = false
          }
        }
        rows
      }
      multiset(got) == multiset(expected)
    }
}
