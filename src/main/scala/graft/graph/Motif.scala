package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative graph pattern matching over an edge DataFrame with
  * columns (src: long, dst: long) — the `find("(a)-[]->(b); ...")`
  * surface familiar from GraphFrames, re-expressed as a pure Catalyst
  * join tree so the optimizer (join reorder, broadcast pick, AQE skew
  * handling) plans it like any relational query.
  *
  * Pattern grammar (terms separated by `;`):
  *  - `(a)-[]->(b)`   positive edge between vertex variables a, b
  *  - `(a)-[e]->(b)`  edge names are accepted and ignored (the generic
  *                    edge table carries no per-edge payload here)
  *  - `()-[]->(b)`    anonymous vertex: joined through, not returned
  *  - `!(a)-[]->(c)`  negated edge: no a→c edge may exist; both
  *                    variables must be bound by positive terms
  *
  * Result: one row per binding of the named vertex variables (columns in
  * first-appearance order). Bindings are NOT required to be distinct
  * vertices, and a multigraph's parallel edges multiply matches — the
  * same semantics as joining the edge table by hand, so results are
  * oracle-checkable against plain SQL self-joins.
  *
  * Scale shape: each positive term is one equi-join on vertex ids;
  * negated terms become anti-joins applied after all positives. Nothing
  * is collected, no UDFs — the whole match stays inside whole-stage
  * codegen, and a small pattern over a bucketed-by-src edge table
  * co-locates every join.
  */
object Motif {

  private val TermRe = """(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)""".r

  private[graph] final case class Term(neg: Boolean, src: String, dst: String)

  /** Parse a pattern into terms, inventing fresh names for anonymous
    * vertices. Returns (terms, named-variable order of first appearance).
    */
  private[graph] def parse(pattern: String): (Seq[Term], Seq[String]) = {
    var anon = 0
    val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case TermRe(bang, s, _, d) =>
        def name(v: String): String =
          if (v.nonEmpty) v else { anon += 1; s"__anon$anon" }
        Term(bang == "!", name(s), name(d))
      case bad => throw new IllegalArgumentException(
        s"cannot parse motif term '$bad' — expected [!](a)-[e]->(b)")
    }
    require(terms.nonEmpty, "empty motif pattern")
    val named = terms.filterNot(_.neg)
      .flatMap(t => Seq(t.src, t.dst))
      .distinct.filterNot(_.startsWith("__anon"))
    terms.filter(_.neg).foreach { t =>
      require(!t.src.startsWith("__anon") && !t.dst.startsWith("__anon"),
        "negated terms cannot use anonymous vertices")
      val bound = terms.filterNot(_.neg).flatMap(t2 => Seq(t2.src, t2.dst)).toSet
      require(bound.contains(t.src) && bound.contains(t.dst),
        s"negated term !(${t.src})-[]->(${t.dst}) uses a variable no " +
          "positive term binds")
    }
    (terms, named)
  }

  /** Match `pattern` against `edges`; see the object doc for semantics. */
  def find(edges: DataFrame, pattern: String): DataFrame = {
    val (terms, named) = parse(pattern)
    val e = edges.select(col("src"), col("dst"))

    def termDf(t: Term): DataFrame =
      if (t.src == t.dst) // self-loop term: one variable, equal endpoints
        e.filter(col("src") === col("dst")).select(col("src").as(t.src))
      else e.select(col("src").as(t.src), col("dst").as(t.dst))

    val positives = terms.filterNot(_.neg)
    require(positives.nonEmpty, "pattern needs at least one positive term")
    var df = termDf(positives.head)
    var bound = Set(positives.head.src, positives.head.dst)
    positives.tail.foreach { t =>
      val next = termDf(t)
      val common = Seq(t.src, t.dst).distinct.filter(bound.contains)
      df = if (common.nonEmpty) df.join(next, common)
      else df.crossJoin(next) // disconnected pattern: explicit product
      bound ++= Seq(t.src, t.dst)
    }
    terms.filter(_.neg).foreach { t =>
      df = if (t.src == t.dst)
        df.join(e.filter(col("src") === col("dst"))
          .select(col("src").as(t.src)), Seq(t.src), "left_anti")
      else df.join(
        e.select(col("src").as(t.src), col("dst").as(t.dst)),
        Seq(t.src, t.dst), "left_anti")
    }
    df.select(named.map(col): _*)
  }
}
