package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline, Retrieval, TextAnalysis}

/** Text/retrieval-tier scale benchmark: a deterministic synthetic
  * corpus (Zipf-ish vocabulary, ~1% planted near-dup families) far past
  * the 500-doc gate fixture, timing the operators whose scale story the
  * graph benches can't exercise — index build + stored-probe serving,
  * ranked BM25, the dedup family (minhash banding vs sorted
  * neighborhood), PMI collocations, phrase scan, and the leak-safe
  * split composition. Args: [docsMillions] [reps].
  *
  * Corpus synthesis is pure column work (md5-hash token draws over a
  * rank = floor(V^u) Zipf tail, the ZipfBench construction), written
  * once to /tmp and marker-cached. Every 100th doc repeats its
  * predecessor's text with a one-token tail edit — the planted
  * near-dup family minhash/SNM must surface.
  */
object TextScaleBench {
  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toDouble).getOrElse(2.0)
    val reps = if (args.length > 1 && args(1).forall(_.isDigit)) args(1).toInt
      else 2
    // fresh-JVM isolation mode, the ZipfBench pattern
    val only = args.collectFirst { case a if a.startsWith("only=") =>
      a.stripPrefix("only=") }
    val nDocs = (millions * 1e6).toLong
    // honors SPARK_GRAFT_CPUS (default 32) for 8-vs-32-core scaling runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-text-scale").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = 50000L
    val docLen = 40
    val base = s"/tmp/graft_textscale/${millions}m"
    val marker = new Path(s"$base/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // seed = the doc whose text this doc repeats (predecessor for the
    // planted dups), token draw = Zipf rank floor(V^u) from a 32-bit
    // md5 u; the tail token is per-DOC unique for the dup family so
    // the pair is near- not exact-identical
    def synth(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("seed",
        when(col("doc_id") % 100 === 1, col("doc_id") - 1)
          .otherwise(col("doc_id")))
      .withColumn("text",
        concat(
          concat_ws(" ",
            transform(sequence(lit(1), lit(docLen - 1)), i =>
              concat(lit("w"), pow(lit(vocab.toDouble),
                (conv(substring(md5(concat(col("seed"), lit("-"), i)), 1, 8),
                  16, 10).cast("double") + lit(1.0)) / lit(4294967296.0))
                .cast("long")))),
          lit(" t"), col("doc_id") % 100000))
      .withColumn("source", concat(lit("s"), col("doc_id") % 8))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    if (!fs.exists(marker)) {
      if (fs.exists(new Path(base))) fs.delete(new Path(base), true)
      synth(spark.range(nDocs).toDF("doc_id"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/documents")
      fs.create(marker, true).close()
    }
    val docs = spark.read.parquet(s"$base/documents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"TEXTSCALE corpus ${docs.count()} docs")

    def time(label: String)(f: => Any): Unit =
      if (only.forall(_ == label)) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"TEXTSCALE $label best=${times.min}%.3f " +
          f"all=${times.map(t => f"$t%.3f").mkString(",")}")
      }

    val idx = s"$base/postings_idx"
    time("postings_build")(Retrieval.writePostingsIndex(docs, idx))
    // probe three mid-frequency terms from the Zipf middle
    val probeTerms = Seq("w37", "w411", "w113")
    time("search_stored_probe")(
      Retrieval.conjunctiveSearchStored(spark, idx, probeTerms).count())
    time("bm25_top20")(Retrieval.bm25TopK(docs, probeTerms).count())
    time("phrase_scan")(Retrieval.phraseCount(docs, Seq("w1", "w2")).count())
    // the same phrase from the stored positional index: worst case —
    // w1/w2 are the Zipf head, so nearly every doc carries a posting
    // row for each; the probe still reads two posting lists instead of
    // the whole corpus text
    time("phrase_stored_hot")(
      Retrieval.phraseCountStored(spark, idx, Seq("w1", "w2")).count())
    // mid-frequency phrase: the posting lists are ~2% of the corpus —
    // the serving-cost regime a production phrase query lives in
    time("phrase_stored_probe")(
      Retrieval.phraseCountStored(spark, idx, Seq("w37", "w411")).count())
    time("proximity_stored")(
      Retrieval.proximityCountStored(spark, idx, "w37", "w411", 5).count())
    // BM25 from the stored index: probed postings + doclens sidecar —
    // no tokenization, no corpus-wide postings aggregation at serve time
    time("bm25_stored_probe")(
      Retrieval.bm25TopKStored(spark, idx, probeTerms).count())
    time("exact_dedup")(Dedup.exact(docs).count())
    time("minhash_pairs")(Dedup.minhashLshPairs(docs).count())
    time("snm_pairs")(Dedup.sortedNeighborhoodPairs(docs).count())
    // ablation: same run without the length prefilter (on this
    // fixed-length corpus the gate prunes nothing — the honest control)
    time("snm_pairs_nogate")(
      Dedup.sortedNeighborhoodPairs(docs, lengthGate = false).count())
    time("pmi_bigrams")(TextAnalysis.pmiBigrams(docs, minCount = 50).count())
    time("quality_scan")(docs
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
      .agg(sum(col("n_tokens"))).collect())
    time("tokens_count")(docs.select(
      sum(size(graft.functions.TextFunctions.tokens(col("text"))))).collect())
    time("leak_safe_split")(Pipeline.leakSafeSplit(spark, docs).count())
    // BPE training: ONE corpus pass for word counts, then 4 merge
    // rounds over the vocab-sized word table — the claim under test
    // is that round cost tracks VOCAB, not corpus
    time("bpe_train")(Pipeline.bpeTrain(docs).count())

    // ---- index MAINTENANCE rung (single-shot ops: each mutates state,
    // so reps would measure a different history — the ScaleBench
    // mutation protocol). Script order matters: append → delta probes →
    // compact → vacuum → post-compact probe, one fresh JVM each; state
    // carries between JVMs on disk.
    def once(label: String)(pre: => Unit)(f: => Any): Unit =
      if (only.contains(label)) {
        pre // untimed state setup
        val t0 = System.nanoTime(); f
        println(f"TEXTSCALE $label best=${(System.nanoTime() - t0) / 1e9}%.3f all=single")
      }
    // 1% NEW docs (ids past the corpus) as the delta generation
    val extra = synth(spark.range(nDocs, nDocs + nDocs / 100).toDF("doc_id"))
    once("postings_append_1pct") {
      // reset to a single-generation base: drop leftovers of any prior
      // maintenance run — INCLUDING committed tombstones, which would
      // otherwise survive an interrupted delete-lifecycle run and
      // silently fence ~1% of the "fresh" base out of every probe
      val idxP = new Path(idx)
      fs.listStatus(idxP).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith("delta_") || n.startsWith("base_") ||
            n.startsWith("tomb_") || n == "LATEST")
          fs.delete(s.getPath, true)
      }
    }(Retrieval.appendPostingsDelta(extra, idx))
    time("search_stored_delta_probe")(
      Retrieval.conjunctiveSearchStored(spark, idx, probeTerms).count())
    time("phrase_stored_delta_probe")(
      Retrieval.phraseCountStored(spark, idx, Seq("w37", "w411")).count())
    once("postings_compact")(())(Retrieval.compactPostingsIndex(spark, idx))
    once("postings_vacuum")(())(Retrieval.vacuumPostingsIndex(spark, idx))
    time("search_stored_postcompact")(
      Retrieval.conjunctiveSearchStored(spark, idx, probeTerms).count())
    // tombstoned DELETE of 1% of the corpus (every 100th doc): O(delta)
    // write — nothing indexed is rewritten
    once("postings_delete_1pct")(())(Retrieval.deletePostingsDocs(spark, idx,
      docs.filter(col("doc_id") % 100 === 7).select(col("doc_id"))))
    // probes through the fence: the broadcast anti-filter must not move
    // serving off its flat probed-buckets curve
    time("search_stored_tombed_probe")(
      Retrieval.conjunctiveSearchStored(spark, idx, probeTerms).count())
    time("phrase_stored_tombed_probe")(
      Retrieval.phraseCountStored(spark, idx, Seq("w37", "w411")).count())
    // fold the fence away (re-layout minus the victims) and reclaim
    once("postings_compact_tombs")(())(
      Retrieval.compactPostingsIndex(spark, idx))
    once("postings_vacuum_tombs")(())(Retrieval.vacuumPostingsIndex(spark, idx))
    time("search_stored_postdelete")(
      Retrieval.conjunctiveSearchStored(spark, idx, probeTerms).count())
    // prefix probes from the dict sidecar (present once any build or
    // compaction ran with the r9 layout): selective = 11 expansions,
    // broad = 111 — serving should track the expansions' posting
    // lists, with the vocab-sized dictionary read as the only overhead
    time("prefix_stored_selective")(
      Retrieval.prefixSearchStored(spark, idx, "w4999").count())
    time("prefix_stored_broad")(
      Retrieval.prefixSearchStored(spark, idx, "w99").count())

    // fuzzy expansion: dict-sidecar resolution (length band +
    // pigeonhole prefilter before levenshtein) then bucket-pruned
    // probes — serving should track the expansion set's postings,
    // with the vocab-sized dict read as the only fixed overhead
    time("fuzzy_stored_d1")(
      Retrieval.fuzzySearchStored(spark, idx, "w49999", 1,
        maxExpansions = 4096).count())
    time("fuzzy_stored_d2")(
      Retrieval.fuzzySearchStored(spark, idx, "w49999", 2,
        maxExpansions = 65536).count())

    // deep batched BPE encode from a stored merge table: cost must be
    // ~linear in corpus (the final vocab join + per-doc count
    // dominate) and flat-ish in merge count (each +32 merges is one
    // more VOCAB-sized pass, invisible next to the corpus term) —
    // the claim that removed bpeEncodedCounts' expression ceiling
    val tMt = System.nanoTime()
    val mergeTable = Pipeline.frequencyMergeTable(docs).localCheckpoint()
    val nMerges = mergeTable.count() // materialize OUTSIDE the rungs:
    // the artifact build (vocab substring ranking) is one-time
    // tokenizer work, not per-encode cost
    println(f"TEXTSCALE merge_table_build one=${(System.nanoTime() - tMt) / 1e9}%.3f rows=$nMerges")
    time("bpe_encode_128")(
      Pipeline.bpeEncodedCountsStored(docs,
        mergeTable.filter(col("rank") <= 128))
        .agg(sum(col("n_subtokens"))).collect())
    time("bpe_encode_512")(
      Pipeline.bpeEncodedCountsStored(docs,
        mergeTable.filter(col("rank") <= 512))
        .agg(sum(col("n_subtokens"))).collect())
    time("bpe_encode_1024")(
      Pipeline.bpeEncodedCountsStored(docs,
        mergeTable.filter(col("rank") <= 1024))
        .agg(sum(col("n_subtokens"))).collect())

    docs.unpersist(blocking = false)
    spark.stop()
  }
}
