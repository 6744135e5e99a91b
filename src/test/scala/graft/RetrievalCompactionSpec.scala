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

  test("IVF delta append == monolithic build with the same centroids; compaction is identity") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // split even/odd: every centroid id (vec_id % 40 == 0) is even, so
    // the base build's centroid set IS the full corpus's — the frozen-
    // centroid delta index must then equal a from-scratch full build
    val dir = "/tmp/graft_ivf_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir)
      Similarity.appendIvfDelta(spark, dir, emb.filter(col("vec_id") % 2 =!= 0))
      Similarity.writeIvfIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      val got = Similarity.ivfTopKStored(spark, dir, queries, 3, nProbe = 2)
      got.collect()
      // both generations' scans carry the static cluster filter
      val p = got.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("PartitionFilters: [cluster"))
        >= 2, s"probe did not prune both generations:\n$p")
      val want = rows(Similarity.ivfTopKStored(spark, ref, queries, 3,
        nProbe = 2))
      assert(rows(got) === want,
        "delta-generation probe diverged from the monolithic build")
      // compaction folds the layout without changing a row
      Similarity.compactIvfIndex(spark, dir)
      val left = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!left.exists(_.startsWith("delta_")),
        s"deltas survived compaction: $left")
      assert(rows(Similarity.ivfTopKStored(spark, dir, queries, 3,
        nProbe = 2)) === want)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }

  test("LSH delta append == monolithic build (frozen hyperplanes)") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // split so the base contains the hyperplane vectors (vec_id
    // 100..107): the stored hyperplanes then equal the monolithic
    // build's and delta bucketing cannot drift
    val dir = "/tmp/graft_lsh_delta_" +
      java.util.UUID.randomUUID().toString.take(8)
    val ref = dir + "_ref"
    try {
      Similarity.writeLshIndex(emb.filter(col("vec_id") < 250), dir)
      Similarity.appendLshDelta(spark, dir, emb.filter(col("vec_id") >= 250))
      Similarity.writeLshIndex(emb, ref)
      val queries = emb.filter(col("vec_id") < 8)
      val got = Similarity.lshTopKStored(spark, dir, queries, 3)
      val want = rows(Similarity.lshTopKStored(spark, ref, queries, 3))
      assert(rows(got) === want,
        "LSH delta-generation probe diverged from the monolithic build")
    } finally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.delete(new org.apache.hadoop.fs.Path(ref), true)
    }
  }
}
