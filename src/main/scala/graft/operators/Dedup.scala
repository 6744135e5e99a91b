package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions._

/** Deduplication operator family over the `documents` table — the
  * beyond-reference LLM-pipeline surface (BASELINE.json north star).
  *
  * Scale design notes (the point of each algorithm at 100 TB):
  *  - exact dedup: one shuffle keyed by a 128-bit fingerprint — the only
  *    full-data shuffle in the family, and it shuffles (hash, id), never
  *    the document text;
  *  - MinHash+LSH: near-dup candidate generation WITHOUT the O(n²) cross
  *    join — signatures are a map-side projection, banding explodes to
  *    `bands` rows/doc, the band-key self-join only collides plausible
  *    pairs, and exact Jaccard verification runs on that tiny candidate
  *    set. This is the canonical web-scale near-dedup shape;
  *  - SimHash: 1 int per doc; Hamming-neighbor pairs via 4-band
  *    pigeonhole bucketing (exhaustive for distance <= 3) + exact
  *    bit_count verify — same candidates-then-verify shape as LSH;
  *  - n-gram Jaccard: the exact (quadratic) verifier — gated to a
  *    blocking key (`source`) so it stays tractable; at scale you never
  *    run it unblocked, you run it on LSH candidates (see above).
  */
object Dedup {

  /** Exact duplicates: group by normalized-text fingerprint; keep the
    * smallest doc_id as canonical representative.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Shingle sets per doc: (doc_id, blockCol, shingle set). */
  // callers over a RAW corpus scan spread it first (Tables.spread) —
  // tokenize+shingle is the family's CPU wall and a single-row-group
  // input plans it on ONE core; minhash's verification arm feeds this a
  // candidate-pruned join instead, which must NOT pay a pointless
  // exchange
  private def shingleSets(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("source"),
      array_distinct(shingles(tokens(col("text")), n)).as("sh"))

  /** Exact n-gram Jaccard near-dup pairs within a blocking key. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    // spread+pinned: both self-join arms consume the shingle table, and
    // a single-row-group corpus shingles on one core (Tables.spread)
    val s = shingleSets(graft.Tables.spread(docs), n)
      .localCheckpoint(false)
    val a = s.select(col("doc_id").as("a_id"), col("source"), col("sh").as("a_sh"))
    val b = s.select(col("doc_id").as("b_id"), col("source").as("b_source"), col("sh").as("b_sh"))
    a.join(b, col("source") === col("b_source") && col("a_id") < col("b_id"))
      .withColumn("jac",
        size(array_intersect(col("a_sh"), col("b_sh"))) * lit(1.0) /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** Sorted-neighborhood (SNM) near-dup candidates: enumerate the
    * corpus in ONE total order (sort key = the first 16 chars of the
    * whitespace-normalized text, ties broken by doc_id), compare each
    * document only against its next `w−1` neighbors in that order, and
    * keep pairs whose exact n-gram Jaccard clears `threshold` — the
    * classic entity-resolution blocking method (Hernández–Stolfo)
    * complementing the hash-bucketing family: LSH bands catch
    * permuted/shuffled near-dups, SNM catches shared-prefix families
    * (common-crawl boilerplate heads, versioned titles) whose edits sit
    * OUTSIDE the sampled bands.
    *
    * Scale shape: the global order is [[Pipeline.globalOrdinal]]'s
    * range-partitioned sort (one range exchange, no single-partition
    * window); the neighborhood expansion is MAP-SIDE (each row emits
    * its w−1 forward ordinals) and meets its partner in a plain
    * equi-join on the unique ordinal — candidate volume is exactly
    * (w−1)·N, LINEAR in the corpus, with no hot-block quadratic blowup
    * (a degenerate blocking key that puts 1M rows in one block costs
    * LSH 10¹² comparisons; SNM still does w·10⁶). Verification joins
    * shingle sets only for surviving candidate ids — text never rides
    * the sort.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, w: Int = 8, n: Int = 3,
                              threshold: Double = 0.2,
                              lengthGate: Boolean = true): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    // snm_key drives the order; sz (the shingle-set size) RIDES the
    // range exchange as one extra long so the length prefilter below
    // needs no extra joins — an earlier cut re-joined a size table onto
    // the candidate pairs (two more 14M-row shuffles) and measured 3×
    // SLOWER than no prefilter at 2M docs; carried-through it is free
    // ONE spread decision for both consumers below (the probe is
    // plan-side and cheap, but there is no reason to take it twice on
    // the same input — ADVICE r12)
    val spreadDocs = graft.Tables.spread(docs)
    val keyed = spreadDocs.select(col("doc_id"),
      substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "),
        1, 16).as("snm_key"),
      size(array_distinct(shingles(tokens(col("text")), n)))
        .cast("double").as("sz"))
    val ord = graft.operators.Pipeline.globalOrdinal(
        keyed, Seq(col("snm_key"), col("doc_id")))
      .select(col("doc_id"), col("ordinal"), col("sz"))
      .localCheckpoint(true) // ordinals are consumed by both join sides
    val probes = ord.select(col("doc_id").as("a_id"),
        explode(sequence(lit(1), lit(w - 1))).as("gap"),
        col("ordinal"), col("sz").as("a_sz"))
      .select(col("a_id"), col("gap"), (col("ordinal") + col("gap")).as("ordinal"),
        col("a_sz"))
    // length prefilter (the similarity-join length bound): Jaccard ≥ t
    // forces t·|B| ≤ |A| (and symmetrically), since |A∩B| ≤ min and
    // |A∪B| ≥ max — applied INSIDE the ordinal join, before any
    // shingle array ships
    val joined = probes.join(
        ord.select(col("doc_id").as("b_id"), col("ordinal"),
          col("sz").as("b_sz")), "ordinal")
    val cands = (if (lengthGate)
        joined.filter(col("a_sz") >= lit(threshold) * col("b_sz") &&
          col("b_sz") >= lit(threshold) * col("a_sz"))
      else joined)
      .select(col("a_id"), col("b_id"), col("gap"))
    // (doc_id, sh) only — SNM needs no blocking column beyond the order.
    // spread+pinned: both verification arms consume it, and un-spread it
    // re-ran the single-core shingle pass once per arm
    val s = spreadDocs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), n)).as("sh"))
      .localCheckpoint(false)
    val res = cands
      .join(s.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(s.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jac",
        size(array_intersect(col("a_sh"), col("b_sh"))) * lit(1.0) /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("gap").cast("long").as("gap"),
        col("jac"))
    res
  }

  /** Directional n-gram containment pairs via an inverted shingle
    * index: cont(A, B) = max(|∩|/|sh(A)|, |∩|/|sh(B)|) — the near-dup
    * measure Jaccard misses when a SMALL document is embedded in a
    * large one (|∩|/|∪| stays low while |∩|/|sh(small)| ≈ 1). MinHash
    * banding cannot surface those pairs either (band keys sample the
    * union), so the candidate generator is the inverted index itself:
    * explode distinct shingles, self-join on the shingle, count shared
    * shingles per pair — pairs meet ONLY through shared shingles (no
    * cartesian) and the pair count is a map-side-combinable aggregate.
    *
    * `maxDf` caps a shingle's document frequency: a corpus-stopword
    * shingle (df ≈ corpus size) would contribute df² candidate rows.
    * Over-cap shingles are dropped from the INDEX — reported
    * containment then undercounts by at most (dropped ∩ sh(A))/|sh(A)|,
    * the recall knob a 100 TB run sets consciously. The default drops
    * nothing and is exact (the oracle's semantics).
    */
  def containmentPairs(docs: DataFrame, n: Int, threshold: Double,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    // pinned: sizes/inv/both self-join arms consume this, and exploding
    // a LAZY expensive array triggers InferFiltersFromGenerate pushing
    // the whole shingle expression into the scan as a single-task
    // DataFilter (see decontaminate — same measured trap)
    val s = shingleSets(graft.Tables.spread(docs), n)
      .filter(size(col("sh")) > 0)
      .localCheckpoint(false)
    val sizes = s.select(col("doc_id"), size(col("sh")).as("nsh"))
    val inv = s.select(col("doc_id"), explode(col("sh")).as("sh"))
    val kept =
      if (maxDf == Long.MaxValue) inv
      else {
        val hot = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("sh"))
        inv.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val common = kept.select(col("doc_id").as("a_id"), col("sh"))
      .join(kept.select(col("doc_id").as("b_id"), col("sh")), "sh")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a_id"), col("nsh").as("a_n")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("nsh").as("b_n")), "b_id")
      .withColumn("cont",
        greatest(col("common") * lit(1.0) / col("a_n"),
          col("common") * lit(1.0) / col("b_n")))
      .filter(col("cont") >= threshold)
      .select(col("a_id"), col("b_id"), col("common"), col("cont"))
  }

  /** MinHash + LSH banding + exact-Jaccard verification.
    * k signature minima, `bands` bands of k/bands rows each; candidate
    * pairs = docs sharing at least one full band key; emitted pairs are
    * candidates whose true Jaccard >= threshold.
    */
  /** `maxBandBucket` caps band-bucket membership: a hot band key (mass-
    * identical documents) otherwise explodes quadratically inside one
    * bucket. Buckets above the cap are EXCLUDED from candidate generation
    * (with a logged count) — a recall trade the caller opts into
    * consciously at corpus scale; the default never drops.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
                      threshold: Double = 0.25,
                      maxBandBucket: Long = Long.MaxValue): DataFrame = {
    require(k % bands == 0,
      s"k=$k must divide evenly into bands=$bands (else sig minima are silently unused)")
    val r = k / bands
    // Signatures via the compiled one-pass expression (MinHashSigExpr —
    // same integers as the declarative spec, ~10× faster), lazily cached:
    // the banding self-join references the subtree twice, and the first
    // stage to touch it materializes it exactly once (an eager
    // checkpoint here cost a full standalone pass per call — 4× the
    // warm runtime). Blocks are LRU-evicted; at cluster scale this is a
    // persisted signatures TABLE, not executor cache.
    // spread: the one-pass signature expression is the family's CPU
    // wall, and a single-row-group corpus planned it on ONE core (the
    // same Tables.spread case as the shingle passes — visible once the
    // round-13 bench protocol stopped serving the signature table from
    // the warm-up rep's cache)
    val s = graft.Tables.spread(docs)
      .select(col("doc_id"),
        graft.functions.MinHashSigExpr.minhashSig(col("text"), n, k).as("sig"))
      .filter(col("sig").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band keys: ids only — never carry shingle arrays through the join
    val bandedAll = s.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          concat_ws("_", (0 until r).map(j =>
            element_at(col("sig"), b * r + j + 1)): _*).as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val banded =
      if (maxBandBucket == Long.MaxValue) bandedAll
      else {
        // the size pre-pass shuffles on the same (band,key) the self-join
        // needs; oversized buckets are dropped before they can explode
        val sizes = bandedAll.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("_bsz"))
        val dropped = sizes.filter(col("_bsz") > maxBandBucket).count()
        if (dropped > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"minhashLshPairs: skipping $dropped band bucket(s) larger " +
              s"than $maxBandBucket members (hot-key cap)")
        bandedAll.join(sizes.filter(col("_bsz") <= maxBandBucket),
          Seq("band", "key"))
          .select(col("doc_id"), col("band"), col("key"))
      }
    val cand = banded.select(col("doc_id").as("a_id"), col("band"), col("key"))
      .join(banded.select(col("doc_id").as("b_id"),
        col("band").as("b_band"), col("key").as("b_key")),
        col("band") === col("b_band") && col("key") === col("b_key") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
      // pinned like `s`/`sh`: cand is referenced THREE times downstream
      // (both arms of candIds' union + the verification join) and
      // Catalyst inlines shared subtrees, so without the pin the band
      // self-join + pair dedup — the family's one big shuffle at scale —
      // executed 3× per run (the banded HashAggregate/Exchange subtree
      // appeared three times in the executed plan). Pairs are
      // O(near-dups), the smallest relation in the operator.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact-Jaccard verification on the (small) candidate set only:
    // semi-join prunes the corpus to candidate ids BEFORE shingling, so
    // the expensive shingle arrays exist only for candidates.
    // NOTE this operator's three pins stay persist(), not the
    // localCheckpoint(false) the rest of the family moved to: the swap
    // was A/B-measured at sf0.1 and made d_minhash_lsh 2× slower
    // (1.44 s → 3.0 s; bisected to THIS pin — checkpointed LogicalRDDs
    // have no stats, so the verification joins lose their broadcast
    // plans), while the family's other sites measured equal or faster.
    // Executor-cache blocks here are LRU-evictable, unlike checkpoint
    // blocks, so the session-leak trade is bounded.
    val candIds = cand.select(col("a_id").as("doc_id"))
      .unionAll(cand.select(col("b_id").as("doc_id"))).distinct()
    val sh = shingleSets(docs.join(candIds, Seq("doc_id"), "left_semi"), n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sa = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val sb = sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("jac",
        size(array_intersect(col("a_sh"), col("b_sh"))) * lit(1.0) /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** End-to-end near-dedup: the corpus minus the higher-id member of
    * every verified near-duplicate pair (greedy keep-lowest-id policy).
    * This is the operator a pipeline actually runs; the pair queries
    * above are its observable internals.
    */
  def dropNearDuplicates(docs: DataFrame, n: Int = 3, k: Int = 8,
                         bands: Int = 4, threshold: Double = 0.25): DataFrame = {
    val drop = minhashLshPairs(docs, n, k, bands, threshold)
      .select(col("b_id").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Duplicate-cluster assignment: the transitive closure of the
    * verified near-dup pair graph — every document in a dup CLUSTER gets
    * the cluster's min doc_id as its canonical id (keep-lowest-id at the
    * cluster level, where [[dropNearDuplicates]] works pair-level). A
    * composition of the dedup family with the graph family: the pair set
    * is the edge list, connected components labels it.
    *
    * Scale shape: the pair graph is ORDERS smaller than the corpus
    * (only verified near-dups), so the component iteration runs on a
    * tiny edge set; the corpus itself never joins in.
    */
  def dupClusters(spark: SparkSession, docs: DataFrame, n: Int = 3,
                  k: Int = 8, bands: Int = 4,
                  threshold: Double = 0.25): DataFrame = {
    val pairs = minhashLshPairs(docs, n, k, bands, threshold)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    graft.graph.GraphOps.connectedComponents(spark, pairs)
      .select(col("v").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Keep-best-of-cluster dedup — the production COMBINE of the dedup
    * and quality families: instead of keep-lowest-id, each near-dup
    * cluster keeps its HIGHEST-QUALITY member (here `n_chars`, the
    * stand-in for any quality score; tie → lowest doc_id) and every
    * unclustered document survives. This is the FineWeb/RefinedWeb
    * "representative selection" step.
    *
    * Scale shape: the cluster table is orders smaller than the corpus
    * (only verified near-dups), so the rank window runs on a tiny
    * table and both corpus joins (inner for clustered rows, anti for
    * solo rows) broadcast the cluster side — the corpus never shuffles.
    */
  def keepBestOfCluster(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dupClusters(spark, docs)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val clustered = docs.join(broadcast(clusters), "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), (col("rk") === 1).as("keep"))
    val solo = docs.join(broadcast(clusters), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(null).cast("long").as("cluster_id"),
        lit(true).as("keep"))
    clustered.unionByName(solo)
  }

  /** MinHash band keys (doc_id, band, key) for [[incrementalNearDups]]:
    * signatures via the compiled expression, banded to `bands` keys/doc.
    */
  private def bandKeys(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    docs.select(col("doc_id"),
        graft.functions.MinHashSigExpr.minhashSig(col("text"), n, k).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          concat_ws("_", (0 until r).map(j =>
            element_at(col("sig"), b * r + j + 1)): _*).as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  /** Incremental near-dedup — the production shape for a GROWING corpus:
    * flag documents of an incoming DELTA batch that near-duplicate an
    * EXISTING corpus, without ever re-pairing the corpus against itself.
    * Band keys of the delta join band keys of the corpus (at cluster
    * scale the corpus side is a PERSISTED signature table, computed once
    * per document ever ingested); exact-Jaccard verification runs only
    * on the cross candidates, each side semi-join-pruned to candidate
    * ids before shingling. Emits (d_id, c_id, jac) verified pairs — the
    * ingest gate drops or links `d_id`s from there.
    */
  def incrementalNearDups(corpus: DataFrame, delta: DataFrame, n: Int = 3,
                          k: Int = 8, bands: Int = 4,
                          threshold: Double = 0.25): DataFrame = {
    require(k % bands == 0,
      s"k=$k must divide evenly into bands=$bands (else sig minima are silently unused)")
    val cand = bandKeys(delta, n, k, bands)
      .select(col("doc_id").as("d_id"), col("band"), col("key"))
      .join(bandKeys(corpus, n, k, bands)
          .select(col("doc_id").as("c_id"), col("band").as("b2"), col("key").as("k2")),
        col("band") === col("b2") && col("key") === col("k2"))
      .select(col("d_id"), col("c_id"))
      .dropDuplicates("d_id", "c_id")
      // pinned for the same reason as [[minhashLshPairs]]'s cand: three
      // downstream references (dIds, cIds, the verification join) would
      // otherwise re-run the delta×corpus band join three times
      .localCheckpoint(false)
    val dIds = cand.select(col("d_id").as("doc_id")).distinct()
    val cIds = cand.select(col("c_id").as("doc_id")).distinct()
    val shD = shingleSets(delta.join(dIds, Seq("doc_id"), "left_semi"), n)
      .select(col("doc_id").as("d_id"), col("sh").as("d_sh"))
    val shC = shingleSets(corpus.join(cIds, Seq("doc_id"), "left_semi"), n)
      .select(col("doc_id").as("c_id"), col("sh").as("c_sh"))
    cand.join(shD, "d_id").join(shC, "c_id")
      .withColumn("jac",
        size(array_intersect(col("d_sh"), col("c_sh"))) * lit(1.0) /
          size(array_union(col("d_sh"), col("c_sh"))))
      .filter(col("jac") >= threshold)
      .select(col("d_id"), col("c_id"), col("jac"))
  }

  /** Bloom-filter ingest gate — EXACT dedup of an incoming delta batch
    * against an existing corpus, with a Bloom prefilter so the novel
    * majority never reaches the join. The filter is built DISTRIBUTED
    * (`stat.bloomFilter` tree-aggregates mergeable per-partition blooms;
    * only the fixed-size bitset reaches the driver) over the corpus
    * fingerprints, then broadcast; delta rows whose fingerprint the
    * bloom rejects are DEFINITELY novel and short-circuit past the join,
    * and only bloom-positives (true dups + the fpp sliver of false
    * positives) are verified by an exact anti-join. Output is exact
    * regardless of fpp — the bloom only routes, it never decides.
    *
    * Scale shape: at 100 TB the corpus fingerprint set is a persisted
    * table and its bloom a saved sketch merged per ingest; per batch the
    * shuffle carries only the ~fpp-sized suspect set, not the delta.
    * The probe is a scalar over broadcast state (a UDF is justified
    * here: the sketch probe has no Column-function equivalent).
    */
  def bloomGate(spark: SparkSession, corpus: DataFrame, delta: DataFrame,
                expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val corpusFp = corpus.select(fingerprint(col("text")).as("fp"))
    val bf = corpusFp.stat.bloomFilter("fp", expectedItems, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bfB.value.mightContain(s))
    // null text has no fingerprint, so the gate cannot decide it: route
    // it OUT explicitly (matching SQL NOT IN, which drops NULL-key rows)
    // rather than letting the bloom's null-probe silently call it novel
    val d = delta.filter(col("text").isNotNull)
      .withColumn("fp", fingerprint(col("text")))
    val novel = d.filter(!mightContain(col("fp")))
    val verified = d.filter(mightContain(col("fp")))
      .join(corpusFp, Seq("fp"), "left_anti")
    novel.unionByName(verified)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Exact-substring duplication detection (the "long shared span"
    * signal of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): token-aligned windows of `n` consecutive tokens,
    * hashed; any window appearing in >= 2 distinct documents marks each
    * host document as carrying duplicated text. Output per doc: total
    * distinct windows and how many of them are shared with another doc.
    * Token alignment (vs fixed char-offset strides) makes matches
    * offset-invariant — a span shared at different positions in two
    * documents still collides.
    *
    * Scale shape: the shuffle carries (doc_id, 128-bit window hash) —
    * never window text (hashed map-side); window-frequency groupBy and
    * the per-doc count are both map-side-combinable. Row volume is
    * O(tokens) per document; at 100 TB a stride >1 trades recall for
    * volume and drops in as a `filter(i % stride = 0)` on the shingle
    * index without changing the plan shape.
    */
  def substringDupCounts(docs: DataFrame, n: Int = 8): DataFrame = {
    // distinct windows per doc, hashed before leaving the map side;
    // persisted because dup-detection and per-doc totals both consume it
    val w = graft.Tables.spread(docs).select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), n))).as("win"))
      .select(col("doc_id"), md5(col("win")).as("wh"))
      .localCheckpoint(false)
    // per-doc windows are distinct, so count(*) per hash = #docs holding it
    val dup = w.groupBy(col("wh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("wh"))
    val perDoc = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
    val dupPerDoc = w.join(dup, "wh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dupw"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("dupw"), lit(0L)).as("n_dup_windows"))
  }

  /** Per-document 32-bit SimHash signature. */
  def simhashSignatures(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), simhash32(tokens(col("text"))).as("simhash"))

  /** SimHash Hamming-neighbor pairs: docs whose 32-bit signatures differ
    * in at most `maxHamming` bits. Band bucketing (4 × 8-bit bands) gives
    * the pigeonhole guarantee for maxHamming <= 3: any pair within
    * distance 3 agrees on >= 1 whole band, so the band-key self-join
    * finds ALL such pairs without an O(n²) cross join; exact Hamming via
    * bit_count(xor) then filters false positives. The reference has no
    * near-dup surface at all; this mirrors the MinHash LSH shape
    * (candidates from equality buckets, exact verify on the small set).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band bucketing guarantees recall only to Hamming 3")
    // lazy: feeds 3 branches, first touching action materializes once
    // (eager would run a full tokenize+simhash job at plan-build time)
    val sigs = simhashSignatures(docs)
      .localCheckpoint(false)
    // band key b = bits [8b, 8b+8) = floor(sig / 2^(8b)) % 256 — plain
    // arithmetic (sig < 2^32, exact in double) so DuckDB's `>> &` mirrors it
    val banded = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"),
          pmod(floor(col("simhash") / pow(lit(2.0), b * 8)).cast("long"),
            lit(256L)).as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val cand = banded.select(col("doc_id").as("a_id"), col("band"), col("key"))
      .join(banded.select(col("doc_id").as("b_id"),
        col("band").as("b_band"), col("key").as("b_key")),
        col("band") === col("b_band") && col("key") === col("b_key") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    val sa = sigs.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val sb = sigs.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("hamming",
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Edit-distance similarity self-join: all document pairs with
    * Levenshtein distance ≤ `k`, found WITHOUT an all-pairs comparison
    * via PassJoin-style segment banding (Li, Deng, Feng — ICDE'11 /
    * VLDB'12 family; public algorithm). The pigeonhole core: split the
    * shorter string of a pair into `k+1` contiguous segments — at most
    * `k` edit errors can touch at most `k` of them, so the longer
    * string must contain at least one segment VERBATIM, displaced by at
    * most `k` positions (the net insertions/deletions before it).
    * Candidates therefore come from an EQUI-join on
    * `(partner_len, segment_idx, segment_text)`: every string indexes
    * its own `k+1` segments, and probes with the substrings that could
    * match a segment of a `[len−k, len]`-length partner at a start
    * shift of ±k — (k+1)²·(2k+1) ≈ 45 probe keys per doc at k=2,
    * constant per row. Exact `levenshtein ≤ k` verifies the candidates.
    *
    * Strings of length ≤ k pigeonhole degenerately (empty segments
    * match anywhere), so they take a broadcast side path against the
    * ≤ 2k-length docs — an ~empty set on text corpora.
    *
    * Scale shape: no cross join anywhere — candidates are an equi-join
    * whose keys carry only ~1/(k+1) of each text; full texts shuffle
    * only for the verified candidate pairs (id-join after candidate
    * dedup). Key skew from a corpus-wide boilerplate segment is diluted
    * by (len, idx) in the key; a pathological repeated-prefix corpus
    * takes the same hot-key cap treatment as [[minhashLshPairs]]'s
    * bands. Complements [[minhashLshPairs]] (set overlap, prose-scale
    * dups) with CHARACTER-level near-identity — the right tool for
    * templated/OCR'd/version-bumped near-copies.
    *
    * @return (d1, d2, dist): unordered pairs (d1 < d2), dist ≤ k
    */
  def editDistanceJoin(docs: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val kL = k.toLong
    val kp1 = (k + 1).toLong
    val d = graft.Tables.spread(docs).select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("len"))
    val long = d.filter(col("len") > kL)
    // segment layout of a length-l string: base = l div (k+1),
    // rem = l mod (k+1); segment i has slen = base + (i < rem),
    // start = i·base + min(i, rem) — earlier segments take the extra char
    val idx = long.select(col("doc_id").as("a_id"), col("len").as("ls"),
        explode(transform(sequence(lit(0L), lit(kL)), i => {
          val base = floor(col("len") / kp1).cast("long")
          val rem = pmod(col("len"), lit(kp1))
          val slen = base + when(i < rem, lit(1L)).otherwise(lit(0L))
          val start = i * base + least(i, rem)
          struct(i.as("i"), col("text").substr(start + 1, slen).as("seg"))
        })).as("s"))
      .select(col("a_id"), col("ls"), col("s.i").as("i"), col("s.seg").as("seg"))
      .filter(length(col("seg")) > 0)
    // probe: for each partner length ls in [len−k, len] and segment i,
    // every own substring of that segment's length starting within ±k
    // of the segment's start (the shift window is never empty: the
    // window brackets `start`, and start ≤ ls − slen ≤ len − slen)
    val probe = long
      .select(col("doc_id").as("b_id"), col("text"), col("len").as("lb"))
      .withColumn("ls",
        explode(sequence(greatest(col("lb") - kL, lit(1L)), col("lb"))))
      .filter(col("ls") > kL)
      .withColumn("i", explode(sequence(lit(0L), lit(kL))))
      .withColumn("base", floor(col("ls") / kp1).cast("long"))
      .withColumn("rem", pmod(col("ls"), lit(kp1)))
      .withColumn("slen",
        col("base") + when(col("i") < col("rem"), lit(1L)).otherwise(lit(0L)))
      .withColumn("start", col("i") * col("base") + least(col("i"), col("rem")))
      .filter(col("slen") > 0)
      .withColumn("p", explode(sequence(
        greatest(col("start") - kL, lit(0L)),
        least(col("start") + kL, col("lb") - col("slen")))))
      .select(col("b_id"), col("ls"), col("i"),
        col("text").substr(col("p") + 1, col("slen")).as("seg"))
    val cand = idx.join(probe, Seq("ls", "i", "seg"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    // degenerate lengths (≤ k): any ≤ 2k-length partner is in range;
    // broadcast nested loop over an ~empty side
    val tinyCand = broadcast(
        d.filter(col("len") <= kL).select(col("doc_id").as("a_id")))
      .join(d.filter(col("len") <= 2 * kL).select(col("doc_id").as("b_id")),
        col("a_id") =!= col("b_id"))
    val ta = docs.select(col("doc_id").as("a_id"), col("text").as("a_text"))
    val tb = docs.select(col("doc_id").as("b_id"), col("text").as("b_text"))
    cand.unionByName(tinyCand).dropDuplicates("a_id", "b_id")
      .join(ta, "a_id").join(tb, "b_id")
      .withColumn("dist", levenshtein(col("a_text"), col("b_text")).cast("long"))
      .filter(col("dist") <= kL)
      .select(least(col("a_id"), col("b_id")).as("d1"),
        greatest(col("a_id"), col("b_id")).as("d2"), col("dist"))
      .dropDuplicates("d1", "d2")
  }

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_exact" -> { (s, d) => exact(t(s, d, "documents")) },
    "d_ngram_jaccard" -> { (s, d) => ngramJaccardPairs(t(s, d, "documents"), 3, 0.2) },
    // sorted-neighborhood blocking: linear (w−1)·N candidate volume
    "d_sorted_neighborhood" -> { (s, d) =>
      sortedNeighborhoodPairs(t(s, d, "documents"))
    },
    // directional containment, exact (no df cap on the gate corpus)
    "d_containment" -> { (s, d) => containmentPairs(t(s, d, "documents"), 3, 0.6) },
    "d_minhash_lsh" -> { (s, d) => minhashLshPairs(t(s, d, "documents")) },
    "d_dedup_corpus" -> { (s, d) =>
      dropNearDuplicates(t(s, d, "documents"))
        .select(col("doc_id"), col("lang"), col("source"))
    },
    "d_dup_clusters" -> { (s, d) => dupClusters(s, t(s, d, "documents")) },
    "d_keep_best" -> { (s, d) => keepBestOfCluster(s, t(s, d, "documents")) },
    "d_simhash" -> { (s, d) => simhashSignatures(t(s, d, "documents")) },
    "d_simhash_pairs" -> { (s, d) => simhashPairs(t(s, d, "documents")) },
    "d_substring" -> { (s, d) => substringDupCounts(t(s, d, "documents")) },
    // incremental ingest gate: even doc_ids = existing corpus, odd = delta
    "d_incremental" -> { (s, d) =>
      val docs = t(s, d, "documents")
      incrementalNearDups(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    },
    // bloom-prefiltered exact ingest gate over the same corpus/delta split
    "d_bloom_gate" -> { (s, d) =>
      val docs = t(s, d, "documents")
      bloomGate(s,
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    },
    // character-level near-identity: PassJoin segment banding + exact
    // levenshtein verify (oracle brute-forces the length-filtered pairs).
    // The gate corpus has no raw texts within edit distance 2 of each
    // other (500 distinct normalized texts; the minhash dups are
    // TOKEN-level), so the entry runs on the 40-char normalized head —
    // where 25 identical-head pairs exist — UNIONED with a deterministic
    // single-deletion variant of every doc (drop char at doc_id mod 40),
    // which plants dist-1 pairs (doc ↔ its variant) and dist-2 pairs
    // (variants of same-head docs) so all three distances cross-check
    "d_fuzzy_join" -> { (s, d) =>
      val norm = t(s, d, "documents").select(col("doc_id"),
        substring(regexp_replace(trim(lower(col("text"))), "\\s+", " "),
          1, 40).as("text"))
      val p = pmod(col("doc_id"), lit(40L)).cast("int")
      val variants = norm.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text").substr(lit(1), p),
          col("text").substr(p + 2, lit(40))).as("text"))
      editDistanceJoin(norm.unionByName(variants), k = 2)
    }
  )

  // Shared SQL fragments for the oracles (DuckDB list lambdas mirror the
  // Spark higher-order functions 1:1; the char-hash is the same
  // polynomial mod 1e9+7).
  private def tokSql(docsRel: String) =
    s"SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM $docsRel"
  private val tokSqlDocs = tokSql("documents")
  private def chash(sExpr: String, seedExpr: String): String =
    s"list_reduce(list_prepend(CAST($seedExpr AS BIGINT), " +
      s"list_transform(regexp_extract_all($sExpr, '.'), c -> CAST(ord(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $HashMod)"
  private def shSql(docsRel: String) =
    s"""SELECT doc_id, source, list_distinct(
       |  CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END) AS sh
       |FROM (${tokSql(docsRel)})""".stripMargin
  private val shSqlDocs = shSql("documents")

  /** Full MinHash+LSH+verify CTE chain over any input relation — the
    * composable block the clean-corpus pipeline oracle reuses.
    */
  def minhashCtes(docsRel: String): String =
    s"""s AS (${shSql(docsRel)}),
       |base AS (
       |  SELECT doc_id, sh, list_transform(sh, s2 -> ${chash("s2", "1")}) AS bh
       |  FROM s WHERE len(sh) > 0),
       |sig AS (
       |  SELECT doc_id, sh, list_transform(range(1, 9), k ->
       |    list_min(list_transform(bh, h -> ((k*2+1) * h + k*31 + 7) % $HashMod))) AS sig
       |  FROM base),
       |bands AS (
       |  SELECT doc_id, sh, b, sig[2*b + 1] || '_' || sig[2*b + 2] AS key
       |  FROM sig, (SELECT unnest(range(0, 4)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT a_id, b_id,
       |    len(list_intersect(sa.sh, sb.sh)) * 1.0 /
       |      len(list_distinct(sa.sh || sb.sh)) AS jac
       |  FROM cand JOIN s sa ON sa.doc_id = a_id JOIN s sb ON sb.doc_id = b_id)""".stripMargin

  // n=8 token windows, mirroring substringDupCounts's shingles(,8)
  private val winConcat = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")

  /** Shingle/signature/band CTE chain over one relation, suffix-named so
    * two sides can coexist in one query (the incremental oracle).
    */
  private def bandCtes(docsRel: String, sfx: String): String =
    s"""s$sfx AS (${shSql(docsRel)}),
       |base$sfx AS (
       |  SELECT doc_id, sh, list_transform(sh, s2 -> ${chash("s2", "1")}) AS bh
       |  FROM s$sfx WHERE len(sh) > 0),
       |sig$sfx AS (
       |  SELECT doc_id, sh, list_transform(range(1, 9), k ->
       |    list_min(list_transform(bh, h -> ((k*2+1) * h + k*31 + 7) % $HashMod))) AS sig
       |  FROM base$sfx),
       |bands$sfx AS (
       |  SELECT doc_id, b, sig[2*b + 1] || '_' || sig[2*b + 2] AS key
       |  FROM sig$sfx, (SELECT unnest(range(0, 4)) AS b))""".stripMargin

  def oracle: Map[String, String] = Map(
    // banding is invisible to semantics: the oracle brute-forces the
    // length-filtered pair space with the same exact levenshtein over
    // the same head+variant corpus
    "d_fuzzy_join" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 40) AS t
        |  FROM documents),
        |v AS (
        |  SELECT doc_id + 100000 AS doc_id,
        |    substr(t, 1, p) || substr(t, p + 2, 40) AS t
        |  FROM (SELECT doc_id, doc_id % 40 AS p, t FROM n)),
        |u AS (SELECT doc_id, t FROM n UNION ALL SELECT doc_id, t FROM v)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
        |FROM u a JOIN u b
        |  ON a.doc_id < b.doc_id
        | AND abs(length(a.t) - length(b.t)) <= 2
        |WHERE levenshtein(a.t, b.t) <= 2""".stripMargin,

    // the bloom is invisible to semantics: novel = fingerprint not in corpus
    "d_bloom_gate" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 2 = 1
        |  AND md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) NOT IN (
        |    SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |    FROM documents WHERE doc_id % 2 = 0)""".stripMargin,

    "d_incremental" ->
      s"""WITH ${bandCtes("(SELECT * FROM documents WHERE doc_id % 2 = 0)", "c")},
         |${bandCtes("(SELECT * FROM documents WHERE doc_id % 2 = 1)", "d")},
         |cand AS (
         |  SELECT DISTINCT d.doc_id AS d_id, c.doc_id AS c_id
         |  FROM bandsd d JOIN bandsc c ON d.b = c.b AND d.key = c.key)
         |SELECT d_id, c_id,
         |  len(list_intersect(sd.sh, sc.sh)) * 1.0 /
         |    len(list_distinct(sd.sh || sc.sh)) AS jac
         |FROM cand JOIN sd ON sd.doc_id = d_id JOIN sc ON sc.doc_id = c_id
         |WHERE len(list_intersect(sd.sh, sc.sh)) * 1.0 /
         |    len(list_distinct(sd.sh || sc.sh)) >= 0.25""".stripMargin,

    "d_substring" ->
      s"""WITH s AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(t) >= 8 THEN list_transform(range(1, len(t) - 6),
         |      i -> $winConcat) ELSE [] END) AS sh
         |  FROM ($tokSqlDocs)),
         |w AS (SELECT doc_id, md5(unnest(sh)) AS wh FROM s),
         |dup AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
         |        FROM w GROUP BY doc_id),
         |dp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dupw
         |       FROM w JOIN dup USING (wh) GROUP BY doc_id)
         |SELECT per.doc_id, per.n_windows, COALESCE(dp.dupw, 0) AS n_dup_windows
         |FROM per LEFT JOIN dp USING (doc_id)""".stripMargin,

    "d_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,

    "d_ngram_jaccard" ->
      s"""WITH s AS ($shSqlDocs)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    len(list_distinct(a.sh || b.sh)) AS jac
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    len(list_distinct(a.sh || b.sh)) >= 0.2""".stripMargin,

    // same total order (snm_key, doc_id), same w−1 forward window,
    // same Jaccard expression as d_ngram_jaccard
    "d_sorted_neighborhood" ->
      s"""WITH s AS ($shSqlDocs),
         |k AS (
         |  SELECT doc_id,
         |    substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
         |      1, 16) AS snm_key
         |  FROM documents),
         |o AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY snm_key, doc_id) AS BIGINT)
         |      AS ordinal
         |  FROM k),
         |cand AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(b.ordinal - a.ordinal AS BIGINT) AS gap
         |  FROM o a JOIN o b
         |  ON b.ordinal > a.ordinal AND b.ordinal <= a.ordinal + 7)
         |SELECT c.a_id, c.b_id, c.gap,
         |  len(list_intersect(sa.sh, sb.sh)) * 1.0 /
         |    len(list_distinct(sa.sh || sb.sh)) AS jac
         |FROM cand c
         |JOIN s sa ON sa.doc_id = c.a_id
         |JOIN s sb ON sb.doc_id = c.b_id
         |WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
         |    len(list_distinct(sa.sh || sb.sh)) >= 0.2""".stripMargin,

    // brute-force pair scan (fine at oracle scale); common > 0 mirrors
    // the operator's pairs-meet-through-shared-shingles candidate set
    "d_containment" ->
      s"""WITH s0 AS ($shSqlDocs),
         |s AS (SELECT * FROM s0 WHERE len(sh) > 0),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS common,
         |    greatest(
         |      len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh),
         |      len(list_intersect(a.sh, b.sh)) * 1.0 / len(b.sh)) AS cont
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
         |SELECT a_id, b_id, common, cont FROM pairs
         |WHERE common > 0 AND cont >= 0.6""".stripMargin,

    "d_dedup_corpus" ->
      s"""WITH ${minhashCtes("documents")}
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM verified WHERE jac >= 0.25)""".stripMargin,

    "d_minhash_lsh" ->
      s"""WITH ${minhashCtes("documents")}
         |SELECT a_id, b_id, jac FROM verified WHERE jac >= 0.25""".stripMargin,

    // same closure formulation as the g_components oracle, over the
    // verified-pair edge list instead of the lineitem graph
    "d_dup_clusters" ->
      s"""WITH RECURSIVE ${minhashCtes("documents")},
         |pairs AS (SELECT a_id AS src, b_id AS dst FROM verified WHERE jac >= 0.25),
         |ue AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
         |reach(v, r) AS (
         |  SELECT DISTINCT src AS v, src AS r FROM ue
         |  UNION
         |  SELECT reach.v, ue.dst AS r FROM reach JOIN ue ON ue.src = reach.r)
         |SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v""".stripMargin,

    "d_keep_best" ->
      s"""WITH RECURSIVE ${minhashCtes("documents")},
         |pairs AS (SELECT a_id AS src, b_id AS dst FROM verified WHERE jac >= 0.25),
         |ue AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
         |reach(v, r) AS (
         |  SELECT DISTINCT src AS v, src AS r FROM ue
         |  UNION
         |  SELECT reach.v, ue.dst AS r FROM reach JOIN ue ON ue.src = reach.r),
         |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |ranked AS (
         |  SELECT d.doc_id, cl.cluster_id,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rk
         |  FROM documents d JOIN cl ON d.doc_id = cl.doc_id)
         |SELECT doc_id, cluster_id, rk = 1 AS keep FROM ranked
         |UNION ALL
         |SELECT d.doc_id, CAST(NULL AS BIGINT) AS cluster_id, true AS keep
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl)""".stripMargin,

    "d_simhash_pairs" ->
      s"""WITH h AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b ->
         |    CASE WHEN list_sum(list_transform(list_transform(list_distinct(t), tok ->
         |        ${chash("tok", "7")}), h2 ->
         |        CAST(floor(CAST(h2 AS DOUBLE) / pow(2, b)) AS BIGINT) % 2 * 2 - 1)) > 0
         |      THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM ($tokSqlDocs)),
         |bands AS (
         |  SELECT doc_id, simhash, b, (simhash >> CAST(8*b AS INTEGER)) & 255 AS key
         |  FROM h, (SELECT unnest(range(0, 4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         |  CAST(bit_count(xor(ha.simhash, hb.simhash)) AS BIGINT) AS hamming
         |FROM cand JOIN h ha ON ha.doc_id = a_id JOIN h hb ON hb.doc_id = b_id
         |WHERE bit_count(xor(ha.simhash, hb.simhash)) <= 3""".stripMargin,

    "d_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id, list_transform(list_distinct(t), tok ->
         |    ${chash("tok", "7")}) AS hs
         |  FROM ($tokSqlDocs))
         |SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b ->
         |  CASE WHEN list_sum(list_transform(hs, h2 ->
         |      CAST(floor(CAST(h2 AS DOUBLE) / pow(2, b)) AS BIGINT) % 2 * 2 - 1)) > 0
         |    THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM h""".stripMargin
  )
}
