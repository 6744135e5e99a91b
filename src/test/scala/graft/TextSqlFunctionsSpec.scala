package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Retrieval, TextTableFunctions}

/** SQL TVF surface for the text/dedup tier: each TVF must return the
  * IDENTICAL rows to the Scala API call it wraps (the builder
  * substitutes the same analyzed plan, so any divergence means the
  * argument plumbing broke).
  */
class TextSqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    TextTableFunctions.register(s)
    s
  }

  val docsPath = "/root/testdata/sf0.001/documents.parquet"
  private def docs = spark.read.parquet(docsPath)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("text_search TVF == Retrieval.conjunctiveSearch == stored probe") {
    val sql = spark.sql(
      s"SELECT * FROM text_search('$docsPath', 'dup spark key')")
    val api = Retrieval.conjunctiveSearch(docs, Seq("dup", "spark", "key"))
    assert(rows(sql) === rows(api))
    assert(sql.count() > 0)
    // and the stored index serves the same rows (access-path equality)
    val stored = Retrieval.conjunctiveSearchStored(spark,
      Retrieval.indexDir(spark, "/root/testdata/sf0.001"),
      Seq("dup", "spark", "key"))
    assert(rows(sql) === rows(stored))
  }

  test("text_phrase TVF == Retrieval.phraseCount") {
    val sql = spark.sql(
      s"SELECT * FROM text_phrase('$docsPath', 'slow hash batch')")
    val api = Retrieval.phraseCount(docs, Seq("slow", "hash", "batch"))
    assert(rows(sql) === rows(api))
  }

  test("text_bm25 TVF == Retrieval.bm25TopK, k argument honored") {
    val sql = spark.sql(
      s"SELECT * FROM text_bm25('$docsPath', 'dup spark key', 10)")
    val api = Retrieval.bm25TopK(docs, Seq("dup", "spark", "key"), 10)
    assert(rows(sql) === rows(api))
    assert(sql.count() === 10)
  }

  test("text_bpe TVF == Pipeline.bpeTrain, merges argument honored") {
    import graft.operators.Pipeline
    val sql = spark.sql(s"SELECT * FROM text_bpe('$docsPath', 3)")
    assert(rows(sql) === rows(Pipeline.bpeTrain(docs, 3)))
    assert(sql.count() === 3)
    assertThrows[IllegalArgumentException](
      spark.sql(s"SELECT * FROM text_bpe('$docsPath', 0)"))
  }

  test("text_bpe_encode TVF == the stored-merge-table deep encode at 1024+ merges") {
    import graft.operators.Pipeline
    // default padding ≥ 1024 — past text_bpe's 256-merge resolution
    // ceiling by construction; must match the API path row-for-row
    val sql = spark.sql(s"SELECT * FROM text_bpe_encode('$docsPath')")
    val api = Pipeline.bpeEncodedCountsStored(docs,
      Pipeline.frequencyMergeTable(docs))
    assert(rows(sql) === rows(api))
    assert(sql.count() > 0)
    // padding argument honored: a different depth changes the table
    val shallow = spark.sql(s"SELECT * FROM text_bpe_encode('$docsPath', 0)")
    assert(rows(shallow) === rows(Pipeline.bpeEncodedCountsStored(docs,
      Pipeline.frequencyMergeTable(docs, 0))))
    assertThrows[IllegalArgumentException](
      spark.sql(s"SELECT * FROM text_bpe_encode('$docsPath', -1)"))
  }

  test("stored-index TVFs == the Scala serving forms (bm25/search/phrase/proximity)") {
    val idx = Retrieval.indexDir(spark, "/root/testdata/sf0.001")
    assert(rows(spark.sql(
        s"SELECT * FROM text_bm25_stored('$idx', 'dup spark key', 20)"))
      === rows(Retrieval.bm25TopKStored(spark, idx, Seq("dup", "spark", "key"))))
    assert(rows(spark.sql(
        s"SELECT * FROM text_search_stored('$idx', 'dup spark key')"))
      === rows(Retrieval.conjunctiveSearchStored(spark, idx,
        Seq("dup", "spark", "key"))))
    assert(rows(spark.sql(
        s"SELECT * FROM text_phrase_stored('$idx', 'slow hash batch')"))
      === rows(Retrieval.phraseCountStored(spark, idx,
        Seq("slow", "hash", "batch"))))
    assert(rows(spark.sql(
        s"SELECT * FROM text_proximity('$idx', 'dup', 'key', 5)"))
      === rows(Retrieval.proximityCountStored(spark, idx, "dup", "key", 5)))
    assert(rows(spark.sql(s"SELECT * FROM text_prefix('$idx', 's')"))
      === rows(Retrieval.prefixSearchStored(spark, idx, "s")))
    assertThrows[IllegalArgumentException](
      spark.sql(s"SELECT * FROM text_prefix('$idx', 's', 1)"))
    assert(rows(spark.sql(
        s"SELECT * FROM text_min_window('$idx', 'dup spark key')"))
      === rows(Retrieval.minWindowStored(spark, idx,
        Seq("dup", "spark", "key"))))
    // and the split base+delta index serves the same rows as one build
    val split = Retrieval.indexDirDelta(spark, "/root/testdata/sf0.001")
    assert(rows(spark.sql(
        s"SELECT * FROM text_search_stored('$split', 'dup spark key')"))
      === rows(Retrieval.conjunctiveSearchStored(spark, idx,
        Seq("dup", "spark", "key"))))
    // the fully stored hybrid fusion
    val ivf = graft.operators.Similarity.indexDir(spark,
      "/root/testdata/sf0.001") + "/ivf"
    val embPath = "/root/testdata/sf0.001/embeddings.parquet"
    val qVec = spark.read.parquet(embPath)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
    assert(rows(spark.sql(
        s"""SELECT * FROM text_hybrid_stored('$idx', '$ivf', '$embPath',
           |  'dup spark key', 7)""".stripMargin))
      === rows(Retrieval.hybridRrfStored(spark, idx, ivf, qVec,
        Seq("dup", "spark", "key"))))
  }

  test("dedup_pairs / dedup_exact / dedup_simhash TVFs == Dedup API") {
    val pairsSql = spark.sql(s"SELECT * FROM dedup_pairs('$docsPath')")
    assert(rows(pairsSql) === rows(Dedup.minhashLshPairs(docs)))
    assert(pairsSql.count() > 0)
    val exactSql = spark.sql(s"SELECT * FROM dedup_exact('$docsPath')")
    assert(rows(exactSql) === rows(Dedup.exact(docs)))
    val simhashSql = spark.sql(s"SELECT * FROM dedup_simhash('$docsPath', 3)")
    assert(rows(simhashSql) === rows(Dedup.simhashPairs(docs, 3)))
  }

  test("TVFs reject malformed arguments instead of misreading them") {
    intercept[Exception] {
      spark.sql(s"SELECT * FROM text_search('$docsPath', '')").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM text_bm25('$docsPath', 'dup', 0)").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM dedup_simhash('$docsPath', 99)").collect()
    }
  }
}
