package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions._

/** End-to-end training-data pipeline: the operators composed the way a
  * real corpus-cleaning job chains them —
  *
  *   quality gate (length + stopword evidence) → language gate →
  *   near-duplicate removal (MinHash+LSH) → cleaned corpus.
  *
  * Each stage is one of the oracle-checked operators; the composition is
  * itself oracle-checked end-to-end (the DuckDB oracle re-runs the whole
  * chain including the LSH pipeline over the filtered subset). All stages
  * are map-side except the dedup candidate join — at 100 TB the filters
  * prune before anything shuffles.
  */
object Pipeline {

  /** min chars + min English-stopword hits for the quality/language gate. */
  val MinChars = 150
  val MinStopwordHits = 2

  def cleanCorpus(docs: DataFrame): DataFrame = {
    val gated = docs.filter(
      length(col("text")) >= MinChars &&
        lexiconHits(tokens(col("text")), Lexicons.head._2) >= MinStopwordHits)
    Dedup.dropNearDuplicates(gated)
      .select(col("doc_id"), col("source"), length(col("text")).as("n_chars_kept"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_clean_corpus" -> { (s, d) => cleanCorpus(t(s, d, "documents")) }
  )

  def oracle: Map[String, String] = {
    val lex = Lexicons.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    val gatedRel =
      s"""(SELECT * FROM documents
         | WHERE length(text) >= $MinChars
         |   AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |         w -> list_contains($lex, w))) >= $MinStopwordHits)""".stripMargin
    Map(
      "p_clean_corpus" ->
        s"""WITH ${Dedup.minhashCtes(gatedRel)}
           |SELECT doc_id, source, length(text) AS n_chars_kept
           |FROM $gatedRel AS gated
           |WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM verified WHERE jac >= 0.25)""".stripMargin
    )
  }
}
