package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Index maintenance triangle: append generations serve identically to
  * a full rebuild (gate-checked by t_search_delta), and compaction
  * folds them away without changing a single served row.
  */
class RetrievalCompactionSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("compaction folds deltas: identical search/bm25/phrase rows, deltas gone") {
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dir = "/tmp/graft_text_compact_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Retrieval.writePostingsIndex(docs.filter(col("doc_id") % 3 === 0), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 1), dir)
      Retrieval.appendPostingsDelta(docs.filter(col("doc_id") % 3 === 2), dir)
      val terms = Retrieval.QueryTerms
      val searchBefore = rows(
        Retrieval.conjunctiveSearchStored(spark, dir, terms))
      val bm25Before = rows(Retrieval.bm25TopKStored(spark, dir, terms))
      val phraseBefore = rows(
        Retrieval.phraseCountStored(spark, dir, Retrieval.PhraseTerms))
      assert(searchBefore.nonEmpty && bm25Before.nonEmpty)

      Retrieval.compactPostingsIndex(spark, dir)

      // deltas physically gone; one base generation remains
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"deltas survived compaction: $left")
      assert(left.contains("postings") && left.contains("doclens") &&
        left.contains("stats"))
      // and every served row is unchanged
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === searchBefore)
      assert(rows(Retrieval.bm25TopKStored(spark, dir, terms)) === bm25Before)
      assert(rows(Retrieval.phraseCountStored(spark, dir,
        Retrieval.PhraseTerms)) === phraseBefore)
      // compacting an already-compact index is a no-op
      Retrieval.compactPostingsIndex(spark, dir)
      assert(rows(Retrieval.conjunctiveSearchStored(spark, dir, terms))
        === searchBefore)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }
}
