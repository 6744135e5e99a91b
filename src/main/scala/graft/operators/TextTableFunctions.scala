package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL table-valued functions for the text/dedup/retrieval tier — the
  * lexical twin of [[graft.graph.GraphTableFunctions]], so a SQL-only
  * user can reach BM25, phrase search, and the dedup pair generators
  * without touching the Scala API:
  *
  * {{{
  *   SELECT * FROM text_search('/data/documents.parquet', 'dup spark key')
  *   SELECT * FROM text_bm25('/data/documents.parquet', 'dup spark key', 20)
  *   SELECT * FROM text_phrase('/data/documents.parquet', 'slow hash batch')
  *   SELECT * FROM dedup_pairs('/data/documents.parquet')
  *   SELECT * FROM dedup_exact('/data/documents.parquet')
  *   SELECT * FROM dedup_simhash('/data/documents.parquet', 3)
  * }}}
  *
  * First argument is always a parquet path with (doc_id, text …)
  * columns; term lists are ONE space-separated string (mirrors the
  * corpus tokenizer, so a phrase argument reads like the phrase).
  * Each builder substitutes the operator's analyzed logical plan at
  * resolution, so the SQL surface runs the IDENTICAL plan to the
  * Scala call — pushdowns, broadcasts, banding and all. Wire up via
  * `TextTableFunctions.register(spark)` or the shared
  * `graft.graph.GraftSparkSessionExtension`.
  */
object TextTableFunctions {

  private def strArg(fn: String, e: Expression): String = e match {
    case l: Literal if l.value != null => l.value.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string argument, got: $other")
  }

  private def longArg(fn: String, e: Expression): Long = e match {
    case l: Literal => l.value match {
      case i: Int => i.toLong
      case i: Long => i
      case i: Short => i.toLong
      case other => throw new IllegalArgumentException(
        s"$fn expects an integer literal, got: $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got: $other")
  }

  private def docs(path: String) = SparkSession.active.read.parquet(path)

  private def terms(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** (path, terms) builder shape shared by search/phrase forms. */
  private def termsBuilder(fn: String,
                           op: (org.apache.spark.sql.DataFrame, Seq[String]) =>
                             org.apache.spark.sql.DataFrame)
  : Seq[Expression] => LogicalPlan = { args =>
    if (args.size != 2)
      throw new IllegalArgumentException(s"$fn(docs_parquet, 'term term …')")
    val ts = terms(strArg(fn, args(1)))
    if (ts.isEmpty)
      throw new IllegalArgumentException(s"$fn: empty term list")
    op(docs(strArg(fn, args.head)), ts).queryExecution.analyzed
  }

  /** The injectable (name, info, builder) triples. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => LogicalPlan)] = Seq(
    // conjunctive AND-search: (doc_id, hits)
    (FunctionIdentifier("text_search"),
      new ExpressionInfo(getClass.getName, "text_search"),
      termsBuilder("text_search", Retrieval.conjunctiveSearch)),
    // exact consecutive phrase: (doc_id, n_occ)
    (FunctionIdentifier("text_phrase"),
      new ExpressionInfo(getClass.getName, "text_phrase"),
      termsBuilder("text_phrase", Retrieval.phraseCount)),
    // BM25 ranked top-k: (doc_id, score_micro, n_terms, rk)
    (FunctionIdentifier("text_bm25"),
      new ExpressionInfo(getClass.getName, "text_bm25"),
      { args =>
        if (args.size != 2 && args.size != 3)
          throw new IllegalArgumentException(
            "text_bm25(docs_parquet, 'term term …'[, k])")
        val k = if (args.size == 3) {
          val v = longArg("text_bm25", args(2))
          if (v < 1 || v > Int.MaxValue) throw new IllegalArgumentException(
            s"text_bm25: k must be in [1, ${Int.MaxValue}], got $v")
          v.toInt
        } else 20
        val ts = terms(strArg("text_bm25", args(1)))
        if (ts.isEmpty)
          throw new IllegalArgumentException("text_bm25: empty term list")
        Retrieval.bm25TopK(docs(strArg("text_bm25", args.head)), ts, k)
          .queryExecution.analyzed
      }),
    // stored-index serving forms: first arg is the INDEX path written
    // by Retrieval.writePostingsIndex (+ optional delta generations)
    (FunctionIdentifier("text_search_stored"),
      new ExpressionInfo(getClass.getName, "text_search_stored"),
      { args =>
        if (args.size != 2)
          throw new IllegalArgumentException(
            "text_search_stored(index_path, 'term term …')")
        val ts = terms(strArg("text_search_stored", args(1)))
        if (ts.isEmpty)
          throw new IllegalArgumentException("text_search_stored: empty term list")
        Retrieval.conjunctiveSearchStored(SparkSession.active,
            strArg("text_search_stored", args.head), ts)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("text_bm25_stored"),
      new ExpressionInfo(getClass.getName, "text_bm25_stored"),
      { args =>
        if (args.size != 2 && args.size != 3)
          throw new IllegalArgumentException(
            "text_bm25_stored(index_path, 'term term …'[, k])")
        val k = if (args.size == 3) {
          val v = longArg("text_bm25_stored", args(2))
          if (v < 1 || v > Int.MaxValue) throw new IllegalArgumentException(
            s"text_bm25_stored: k must be in [1, ${Int.MaxValue}], got $v")
          v.toInt
        } else 20
        val ts = terms(strArg("text_bm25_stored", args(1)))
        if (ts.isEmpty)
          throw new IllegalArgumentException("text_bm25_stored: empty term list")
        Retrieval.bm25TopKStored(SparkSession.active,
            strArg("text_bm25_stored", args.head), ts, k)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("text_phrase_stored"),
      new ExpressionInfo(getClass.getName, "text_phrase_stored"),
      { args =>
        if (args.size != 2)
          throw new IllegalArgumentException(
            "text_phrase_stored(index_path, 'word word …')")
        val ts = terms(strArg("text_phrase_stored", args(1)))
        if (ts.isEmpty)
          throw new IllegalArgumentException("text_phrase_stored: empty phrase")
        Retrieval.phraseCountStored(SparkSession.active,
            strArg("text_phrase_stored", args.head), ts)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("text_min_window"),
      new ExpressionInfo(getClass.getName, "text_min_window"),
      { args =>
        if (args.size != 2)
          throw new IllegalArgumentException(
            "text_min_window(index_path, 'term term …')")
        val ts = terms(strArg("text_min_window", args(1)))
        if (ts.size < 2)
          throw new IllegalArgumentException(
            "text_min_window: needs at least two distinct terms")
        Retrieval.minWindowStored(SparkSession.active,
            strArg("text_min_window", args.head), ts)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("text_prefix"),
      new ExpressionInfo(getClass.getName, "text_prefix"),
      { args =>
        if (args.size != 2 && args.size != 3)
          throw new IllegalArgumentException(
            "text_prefix(index_path, prefix[, max_expansions])")
        val maxExp = if (args.size == 3) {
          val v = longArg("text_prefix", args(2))
          if (v < 1 || v > Int.MaxValue) throw new IllegalArgumentException(
            s"text_prefix: max_expansions must be in [1, ${Int.MaxValue}], got $v")
          v.toInt
        } else 1024
        Retrieval.prefixSearchStored(SparkSession.active,
            strArg("text_prefix", args.head),
            strArg("text_prefix", args(1)).toLowerCase, maxExp)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("text_proximity"),
      new ExpressionInfo(getClass.getName, "text_proximity"),
      { args =>
        if (args.size != 4)
          throw new IllegalArgumentException(
            "text_proximity(index_path, term_a, term_b, slop)")
        val slop = longArg("text_proximity", args(3))
        if (slop < 0 || slop > Int.MaxValue) throw new IllegalArgumentException(
          s"text_proximity: slop must be in [0, ${Int.MaxValue}], got $slop")
        Retrieval.proximityCountStored(SparkSession.active,
            strArg("text_proximity", args.head),
            strArg("text_proximity", args(1)).toLowerCase,
            strArg("text_proximity", args(2)).toLowerCase, slop.toInt)
          .queryExecution.analyzed
      }),
    // fully stored-served hybrid: RRF of the pruned BM25 probe and the
    // pruned stored-IVF probe; the query vector comes from the given
    // embeddings parquet by vec_id
    (FunctionIdentifier("text_hybrid_stored"),
      new ExpressionInfo(getClass.getName, "text_hybrid_stored"),
      { args =>
        if (args.size != 5)
          throw new IllegalArgumentException(
            "text_hybrid_stored(text_index, ivf_index, embeddings_parquet, 'term term …', query_vec_id)")
        val ts = terms(strArg("text_hybrid_stored", args(3)))
        if (ts.isEmpty)
          throw new IllegalArgumentException("text_hybrid_stored: empty term list")
        val qId = longArg("text_hybrid_stored", args(4))
        val spark = SparkSession.active
        val qVec = spark.read.parquet(strArg("text_hybrid_stored", args(2)))
          .filter(org.apache.spark.sql.functions.col("vec_id") === qId)
        Retrieval.hybridRrfStored(spark,
            strArg("text_hybrid_stored", args.head),
            strArg("text_hybrid_stored", args(1)), qVec, ts)
          .queryExecution.analyzed
      }),
    // MinHash+LSH near-dup candidate pairs: (a, b, sim_micro …)
    (FunctionIdentifier("dedup_pairs"),
      new ExpressionInfo(getClass.getName, "dedup_pairs"),
      { args =>
        if (args.size != 1)
          throw new IllegalArgumentException("dedup_pairs(docs_parquet)")
        Dedup.minhashLshPairs(docs(strArg("dedup_pairs", args.head)))
          .queryExecution.analyzed
      }),
    // exact duplicate groups by content digest
    (FunctionIdentifier("dedup_exact"),
      new ExpressionInfo(getClass.getName, "dedup_exact"),
      { args =>
        if (args.size != 1)
          throw new IllegalArgumentException("dedup_exact(docs_parquet)")
        Dedup.exact(docs(strArg("dedup_exact", args.head)))
          .queryExecution.analyzed
      }),
    // SimHash near-dup pairs within a Hamming radius
    (FunctionIdentifier("dedup_simhash"),
      new ExpressionInfo(getClass.getName, "dedup_simhash"),
      { args =>
        if (args.size != 1 && args.size != 2)
          throw new IllegalArgumentException(
            "dedup_simhash(docs_parquet[, max_hamming])")
        val h = if (args.size == 2) {
          val v = longArg("dedup_simhash", args(1))
          if (v < 0 || v > 16) throw new IllegalArgumentException(
            s"dedup_simhash: max_hamming must be in [0, 16], got $v")
          v.toInt
        } else 3
        Dedup.simhashPairs(docs(strArg("dedup_simhash", args.head)), h)
          .queryExecution.analyzed
      }),

    // SELECT * FROM text_bpe('/path/documents.parquet'[, merges]) —
    // the trained merge table (rank, left, right, freq); the builder
    // runs the vocab-sized merge rounds AT FUNCTION-RESOLUTION TIME
    // (one-row driver round-trips per round, the bpeTrain contract) —
    // even an EXPLAIN pays them, which is why the TVF's merge count is
    // capped far below bpeTrain's own reach: past a few hundred rounds
    // resolution-time training blocks analysis for minutes. Deep
    // tokenizers train through the API ([[Pipeline.bpeTrain]]) and
    // ENCODE through `text_bpe_encode` below (or the
    // [[Pipeline.bpeEncodedCountsStored]] API), which has no merge
    // ceiling at all.
    (FunctionIdentifier("text_bpe"),
      new ExpressionInfo(getClass.getName, "text_bpe"),
      { args =>
        if (args.size != 1 && args.size != 2)
          throw new IllegalArgumentException(
            "text_bpe(docs_parquet[, merges])")
        val n = if (args.size == 2) {
          val v = longArg("text_bpe", args(1))
          if (v < 1 || v > 256) throw new IllegalArgumentException(
            s"text_bpe: merges must be in [1, 256], got $v — the TVF " +
              "trains at plan-resolution time (even EXPLAIN pays it); " +
              "train deeper tokenizers via the Pipeline.bpeTrain API " +
              "and encode via the UNBOUNDED text_bpe_encode TVF")
          v.toInt
        } else Pipeline.BpeMerges
        Pipeline.bpeTrain(docs(strArg("text_bpe", args.head)), n)
          .queryExecution.analyzed
      }),

    // SELECT * FROM text_bpe_encode('/path/documents.parquet'[, padding])
    // — per-doc subtoken counts (doc_id, n_subtokens) under the
    // closed-form frequency-ranked merge table plus `padding` synthetic
    // deep merges (default ≥1024 total). UNBOUNDED depth: the encode is
    // [[Pipeline.bpeEncodedCountsStored]]'s batched passes over the
    // DISTINCT-WORD table, so resolution pays one vocab aggregation and
    // a merge-table collect — never bpeTrain's per-merge driver rounds
    // and never a Catalyst tree deeper than one batch. This is the TVF
    // twin of the `p_bpe_encode_deep` gate (1000+-merge artifact,
    // recursive-CTE oracle).
    (FunctionIdentifier("text_bpe_encode"),
      new ExpressionInfo(getClass.getName, "text_bpe_encode"),
      { args =>
        if (args.size != 1 && args.size != 2)
          throw new IllegalArgumentException(
            "text_bpe_encode(docs_parquet[, padding])")
        val pad = if (args.size == 2) {
          val v = longArg("text_bpe_encode", args(1))
          if (v < 0 || v > 262144) throw new IllegalArgumentException(
            s"text_bpe_encode: padding must be in [0, 262144], got $v")
          v.toInt
        } else Pipeline.DeepPadding
        val d = docs(strArg("text_bpe_encode", args.head))
        Pipeline.bpeEncodedCountsStored(d,
          Pipeline.frequencyMergeTable(d, pad)).queryExecution.analyzed
      })
  )

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
}
