package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps

/** Structural contracts for Louvain local moves that the unrolled-SQL
  * oracle can't express: planted-community recovery and modularity
  * improvement.
  */
class LouvainSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def cliqueEdges(vs: Seq[Long]): Seq[(Long, Long)] =
    for (a <- vs; b <- vs if a < b) yield (a, b)

  test("recovers two planted cliques joined by one bridge edge") {
    // cliques {0..5} and {10..15}, bridge 5–10
    val edges = (cliqueEdges(0L to 5L) ++ cliqueEdges(10L to 15L) :+ (5L, 10L))
      .toDF("src", "dst")
    val part = GraphOps.louvainCommunities(spark, edges, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = (0L to 5L).map(part).toSet
    val c2 = (10L to 15L).map(part).toSet
    assert(c1.size === 1, s"clique 1 split: $c1")
    assert(c2.size === 1, s"clique 2 split: $c2")
    assert(c1 != c2, "cliques merged across the bridge")
  }

  test("modularity strictly improves over the singleton partition and is deterministic") {
    val edges = graph.GraphQueries.edgesFrom(spark, "/root/testdata/sf0.001")
      .persist()
    val a = GraphOps.louvainCommunities(spark, edges, rounds = 3)
    val b = GraphOps.louvainCommunities(spark, edges, rounds = 3)
    val pa = a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pb = b.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa === pb, "louvain must be deterministic across runs")
    val singleton = a.selectExpr("v", "v AS community")
    val qTrivial = GraphOps.modularityOf(edges, singleton)
    val qLouvain = GraphOps.modularityOf(edges, a)
    assert(qLouvain > qTrivial,
      s"no modularity gain: louvain=$qLouvain trivial=$qTrivial")
    edges.unpersist()
  }
}
