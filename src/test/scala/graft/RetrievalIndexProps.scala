package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Retrieval

/** Model-based property test for the stored-index lifecycle: a random
  * sequence of appends, tombstoned deletes, upserts (delete + re-append
  * with new text), compactions, and vacuums applied to one postings
  * index must serve — at EVERY step — exactly what the inline (no
  * index) operators compute over a trivial Map[doc_id, text] model.
  * This is the state-machine complement to the example-based
  * [[RetrievalCompactionSpec]]: the sequences it draws include the
  * shapes that have bitten before (mutate after compact+vacuum — the
  * watermark bug; delete spanning generations; upsert of a doc deleted
  * in an earlier step; double compaction).
  */
object RetrievalIndexProps extends Properties("graft.retrieval.index") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
  private val Terms = Seq("alpha", "beta")

  /** Deterministic 6-token text for (id, version) — small vocab so the
    * conjunctive/BM25/phrase probes all have hits. */
  private def textOf(id: Long, version: Int): String =
    (0 until 6).map(j => Vocab(((id * 7 + j * 13 + version * 31) % 5).toInt))
      .mkString(" ")

  sealed trait Op
  private case class Append(n: Int) extends Op          // n NEW doc ids
  private case class Delete(seed: Int) extends Op       // a live subset
  private case class Upsert(seed: Int) extends Op       // delete + re-append
  private case object Compact extends Op
  private case object CompactVacuum extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.choose(1, 6).map(Append),
    3 -> Gen.choose(0, 1000).map(Delete),
    2 -> Gen.choose(0, 1000).map(Upsert),
    1 -> Gen.const(Compact),
    2 -> Gen.const(CompactVacuum))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def docsDf(m: Map[Long, Int]): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (id, v) => (id, textOf(id, v)) }
      .toDF("doc_id", "text")
  }

  property("random lifecycle == inline operators over the model corpus") =
    forAll(Gen.listOfN(6, genOp)) { ops =>
      val dir = "/tmp/graft_idx_props_" +
        java.util.UUID.randomUUID().toString.take(8)
      // model: live doc -> text version; nextId grows past every append
      var live = (0L until 8L).map(_ -> 0).toMap
      var nextId = 8L
      var version = 1
      try {
        Retrieval.writePostingsIndex(docsDf(live), dir)
        ops.foreach { op =>
          op match {
            case Append(n) =>
              val fresh = (nextId until nextId + n).map(_ -> version).toMap
              nextId += n; version += 1
              Retrieval.appendPostingsDelta(docsDf(fresh), dir)
              live ++= fresh
            case Delete(seed) =>
              val victims = live.keySet.filter(id => (id + seed) % 3 == 0)
              Retrieval.deletePostingsDocs(spark, dir,
                docsDf(victims.map(_ -> 0).toMap).select("doc_id"))
              live --= victims
            case Upsert(seed) =>
              val targets = live.keySet.filter(id => (id + seed) % 4 == 0)
              if (targets.nonEmpty) {
                Retrieval.deletePostingsDocs(spark, dir,
                  docsDf(targets.map(_ -> 0).toMap).select("doc_id"))
                val renewed = targets.map(_ -> version).toMap
                version += 1
                Retrieval.appendPostingsDelta(docsDf(renewed), dir)
                live ++= renewed
              }
            case Compact =>
              Retrieval.compactPostingsIndex(spark, dir)
            case CompactVacuum =>
              Retrieval.compactPostingsIndex(spark, dir)
              Retrieval.vacuumPostingsIndex(spark, dir)
          }
          // the step invariant: stored serving == the inline operator
          // over the model corpus, after EVERY op
          assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, Terms))
            == rows(Retrieval.conjunctiveSearch(docsDf(live), Terms)),
            s"conjunctive diverged after $op in $ops")
        }
        // sequence-end invariants: exact BM25 (stats incl. negative
        // tombstone rows) and positional phrase through the same history
        assert(rows(Retrieval.bm25TopKStored(spark, dir, Terms, 10))
          == rows(Retrieval.bm25TopK(docsDf(live), Terms, 10)),
          s"bm25 diverged after $ops")
        assert(rows(Retrieval.phraseCountStored(spark, dir, Terms))
          == rows(Retrieval.phraseCount(docsDf(live), Terms)),
          s"phrase diverged after $ops")
        true
      } finally {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
}
