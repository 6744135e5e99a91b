package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic training-mix sampling: per-source rates applied via
    * id-hash thresholding (`doc_id % 100 < rate`), the standard way a
    * mixture spec ("50% of even sources, 25% of odd") is realized
    * reproducibly — re-running selects the SAME documents, and the
    * filter is map-side, so at 100 TB it prunes before any shuffle.
    * Rates here key off the source suffix parity to stay re-derivable
    * by an independent engine.
    */
  def trainMix(docs: DataFrame): DataFrame = {
    val srcNum = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
    val rate = when(srcNum % 2 === 0, 50).otherwise(25)
    docs.filter(pmod(col("doc_id"), lit(100)) < rate)
      .select(col("doc_id"), col("source"), col("lang"),
        rate.as("mix_rate"))
  }

  /** Token-budget packing: assign documents (in doc_id order) to
    * fixed-budget bins by cumulative token count — the sequence-packing
    * step before training ("pack into ~4096-token rows"). The running
    * sum is an integer window aggregate (order-independent, exact), so
    * the binning is bit-identical across engines. Per-source windows
    * keep the cumsum partitioned — at 100 TB each source packs
    * independently instead of one global serial window.
    */
  def tokenPack(docs: DataFrame, budget: Long = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum_tokens") - col("n_tokens")) / budget))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("bin"))
  }

  /** Benchmark-decontamination: flag training documents that share a
    * word n-gram with the held-out benchmark slice (the standard
    * pre-training hygiene pass — e.g. "drop any doc containing a test-set
    * 13-gram"; n=4 here because the synthetic vocabulary is tiny).
    * The benchmark slice is the deterministic `doc_id % 50 == 0` subset
    * so an independent engine re-derives it.
    *
    * Scale shape: the benchmark n-gram set is small and broadcast; the
    * (huge) training side explodes its n-grams map-side and the join +
    * count are partial-aggregated before any shuffle — the corpus text
    * itself never moves.
    */
  def decontaminate(docs: DataFrame, n: Int = 4): DataFrame = {
    // spread: the shingle pass is the cost and a single-row-group scan
    // runs it on one core (Tables.spread scaladoc). PINNED because (a)
    // bench and train both consume it, and (b) exploding a LAZY
    // expensive array is a measured trap: InferFiltersFromGenerate
    // derives `size(sh) > 0` from the explode and pushes the whole
    // tokenize+shingle expression down into the scan as a DataFilter —
    // below the spread exchange — so the 30 s single-core pass ran
    // TWICE per arm (26 s warm); behind the cache boundary the filter
    // cannot be pushed into the build and the op runs in ~2 s.
    val sh = graft.Tables.spread(docs).select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), n)).as("sh"))
      .localCheckpoint(false)
    val bench = sh.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val train = sh.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    train.join(broadcast(bench), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /** Deterministic corpus shuffle — the "shuffle before training" step,
    * made reproducible: sort key = md5(seed ‖ doc_id), shard = the key's
    * first hex char, rank = position within the shard. Re-running with
    * the same seed yields the identical order; changing the seed
    * re-shuffles.
    *
    * Scale shape: sharding first keeps the window PARTITIONED — each
    * shard sorts independently (no global single-partition row_number);
    * at 100 TB the shards are written as separate files and a training
    * job streams them in (shard, rank) order.
    */
  def shuffleDeterministic(docs: DataFrame,
                           seed: String = "seed42"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("sort_key"), col("doc_id"))
    docs
      .select(col("doc_id"),
        md5(concat(lit(seed + "-"), col("doc_id").cast("string")))
          .as("sort_key"))
      .withColumn("shard", substring(col("sort_key"), 1, 1))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Per-source document cap — the web-corpus "domain cap" (bound how
    * much any one domain/source can contribute, so crawl-heavy hosts
    * don't dominate the mix): keep the `cap` highest-value documents per
    * source, priority = (n_chars DESC, doc_id) so the selection is
    * deterministic under re-runs.
    *
    * Scale shape: one shuffle keyed by source over (id, source, n_chars)
    * only — the text never moves — and row_number short-circuits: with a
    * WindowGroupLimit-capable plan Spark stops ranking a partition after
    * `cap` rows. A pathologically hot source is bounded by the cap
    * itself: output per source is <= cap regardless of input skew.
    */
  def sourceCap(docs: DataFrame, cap: Int = 40): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** Deterministic stratified sampling: exactly min(k, |stratum|)
    * documents per language, chosen by md5(seed ‖ doc_id) order — a
    * reproducible per-stratum uniform sample (same seed → same docs),
    * the "equal-representation eval slice" builder. Unlike the rate-based
    * [[trainMix]], this guarantees exact per-stratum COUNTS.
    *
    * Scale shape: same partitioned-window discipline as [[sourceCap]] —
    * the shuffle carries (id, lang, 32-byte key), per-stratum ranking
    * stops at k, and strata sample independently in parallel.
    */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 30,
                       seed: String = "s7"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("sample_key"), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        md5(concat(lit(seed + "-"), col("doc_id").cast("string")))
          .as("sample_key"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perStratum)
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  /** Deterministic weighted sampling (priority sampling): each document
    * draws a pseudo-uniform u ∈ (0, 1] from md5(seed ‖ doc_id) and gets
    * priority = weight / u; the k highest priorities per stratum are
    * kept. Heavier documents win proportionally more often, yet the
    * sample is a pure function of (seed, id, weight) — re-runs and
    * independent engines select the SAME rows. The only floating-point
    * ops are two IEEE-exact divisions (no transcendentals), so the
    * priority ordering is bit-identical across engines.
    *
    * Scale shape: u and the priority are map-side column expressions;
    * the per-stratum top-k is the same partitioned window-limit
    * discipline as [[sourceCap]] — no global sort, text never moves.
    */
  def weightedSample(docs: DataFrame, k: Int = 25,
                     seed: String = "w9"): DataFrame = {
    val h = conv(substring(
      md5(concat(lit(seed + "-"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h + lit(1)) / lit(4294967296.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("priority").desc, col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        (col("n_chars").cast("double") / u).as("priority"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  /** Deterministic GLOBAL row enumeration without a single-partition
    * window: `orderBy` range-partitions the sort (every partition holds
    * a contiguous key range, all partitions sort in parallel), then
    * `zipWithIndex` assigns contiguous global indices per partition
    * using only the O(partitions) per-partition counts. This is the
    * scale-correct replacement for `row_number() OVER (ORDER BY …)` —
    * Spark executes that window on ONE partition, exactly the pattern
    * that dies at 100 TB. The sort keys must be a total
    * order (include a unique id) for determinism.
    */
  def globalOrdinal(df: DataFrame,
                    sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "ordinal", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Curriculum ordering: score every document (mean word length — a
    * stand-in for any model-based difficulty signal), enumerate the
    * corpus easy→hard with [[globalOrdinal]], and cut it into
    * `phases` equal NTILE phases. The phase arithmetic reproduces SQL
    * ntile exactly (first N mod T phases get the extra row) so the
    * whole operator — including the distributed ranking — is
    * oracle-checked against `ntile() OVER` + `row_number() OVER`.
    * The difficulty score is one IEEE division: cross-engine ordering
    * is bit-identical.
    */
  def curriculum(docs: DataFrame, phases: Int = 4): DataFrame = {
    val scored = docs.select(col("doc_id"),
      (col("n_chars").cast("double") /
        size(tokens(col("text"))).cast("double")).as("difficulty"))
    // localCheckpoint: the ranked frame is consumed twice (the count
    // aggregate below and the output projection) — without it the full
    // range-partitioned sort + zipWithIndex would run twice
    val ranked = globalOrdinal(scored, Seq(col("difficulty"), col("doc_id")))
      .localCheckpoint(false)
    val n = ranked.agg(count(lit(1)).as("_n"))
    // ntile(T): r = N mod T phases of size big = N/T + 1 first, then
    // T - r phases of size small = N/T (all floor divisions)
    val r = col("_n") % phases
    val big = floor(col("_n") / phases).cast("long") + lit(1L)
    val small = floor(col("_n") / phases).cast("long")
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), col("ordinal"),
        when(col("ordinal") <= r * big,
          floor((col("ordinal") - 1) / big).cast("long") + lit(1L))
          .otherwise(r +
            floor((col("ordinal") - 1 - r * big) / small).cast("long") + lit(1L))
          .as("phase"))
  }

  /** Deterministic train/val/test assignment: split = a pure function
    * of (seed, id) via the shared md5-prefix hash, bucketed on a 0-99
    * range — re-runs, incremental ingests, and independent engines all
    * assign every document the SAME split (no global sample(), no
    * state). Map-side only; the property a 100 TB pipeline needs is
    * exactly this idempotence: yesterday's train doc can never migrate
    * into today's test set.
    */
  def deterministicSplit(docs: DataFrame, trainPct: Int = 80,
                         valPct: Int = 10,
                         seed: String = "split"): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val h = pmod(conv(substring(
      md5(concat(lit(seed + "-"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long"), lit(100L))
    docs.select(col("doc_id"), col("source"),
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-safe split: [[deterministicSplit]]'s idempotent hash
    * assignment, but keyed by the NEAR-DUP CLUSTER id instead of the
    * document id — every member of a near-duplicate cluster lands on
    * the same side, so a test document can never have a near-copy in
    * train (the train/test contamination that silently inflates evals;
    * splitting before deduping is the classic pipeline bug this
    * operator makes impossible by construction). Documents in no
    * cluster key by their own id, preserving deterministicSplit's
    * semantics for them.
    *
    * Scale shape: [[Dedup.dupClusters]] already runs on the
    * orders-smaller verified-pair graph; the only addition is one
    * left join of its (doc_id → cluster) table onto the corpus ids and
    * the same map-side hash. Incremental ingests stay idempotent as
    * long as the cluster's min-id representative is stable — which
    * keep-lowest-id makes true whenever the earliest member arrived
    * first.
    */
  def leakSafeSplit(spark: SparkSession, docs: DataFrame,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val clusters = Dedup.dupClusters(spark, docs)
    val keyed = docs.select(col("doc_id"), col("source"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
    val h = pmod(conv(substring(
      md5(concat(lit("lsplit-"), col("split_key").cast("string"))), 1, 8),
      16, 10).cast("long"), lit(100L))
    keyed.select(col("doc_id"), col("source"), col("split_key"),
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** DSIR-style importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much its HASHED-UNIGRAM distribution resembles a target
    * domain relative to the raw pool, then keep the top-N. This is the
    * standard lever for tilting a 100 TB crawl toward a high-quality
    * target corpus without training a classifier.
    *
    * Determinized for the oracle: bucket importance is the
    * floor-quantized smoothed ratio floor(SCALE·(tc+1)/(rc+1)) — one
    * IEEE division of exactly-represented integers, identical on both
    * engines — and a document's weight is the exact BIGINT sum of its
    * tokens' bucket scores (duplicates included, as DSIR weights
    * token OCCURRENCES). The real thing uses log-ratios; monotone
    * per-bucket, so the integerized form selects the same kind of
    * documents while staying hash-checkable.
    *
    * Scale shape: both bucket tables are ≤`buckets` rows — built with
    * ONE map-side-combinable aggregation over the exploded tokens,
    * then BROADCAST back onto the token stream, so the only per-corpus
    * shuffle is the per-doc weight sum (partial-aggregated map-side).
    * Top-N is a sort-limit (per-partition k-selection), never a global
    * sort; the rank window runs on the N surviving rows only.
    */
  def importanceResample(docs: DataFrame, targetLang: String = "en",
                         buckets: Int = 1024, topN: Int = 100): DataFrame = {
    val scale = 1000000L
    val tok = docs.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("w"))
      .withColumn("b",
        conv(substring(md5(concat(lit("dsir-"), col("w"))), 1, 8), 16, 10)
          .cast("long") % buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tgt = tok.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val score = raw.join(tgt, Seq("b"), "left")
      .select(col("b"),
        floor((lit(scale) * (coalesce(col("tc"), lit(0L)) + 1)).cast("double") /
          (col("rc") + 1).cast("double")).as("s"))
    val weights = tok.join(broadcast(score), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("s")).as("weight"), count(lit(1)).as("n_tokens"))
    val top = weights
      .orderBy(col("weight").desc, col("doc_id")).limit(topN)
    // eager: the token stream feeds raw/tgt/weights — materialize the
    // top-N before releasing the pin (a lazy return made the persist a
    // no-op and the explode+hash ran once per consumer)
    val res = top.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("weight").desc, col("doc_id"))).cast("long"))
      .localCheckpoint(true)
    tok.unpersist(blocking = false)
    res
  }

  /** Perceptron feature space: hashed token-count dims + one bias dim. */
  val PerceptronDims = 8
  val PerceptronSeed = 41
  val PerceptronEpochs = 3
  /** Label rule: +1 iff the doc has ≥ this many English-stopword tokens. */
  val PerceptronMinStops = 3

  /** Distributed quality-classifier TRAINING — synchronous batch
    * perceptron over hashed token-count features, the integer-exact
    * core of the fastText-style filters real pipelines train (labels
    * here come from a deterministic stopword-evidence rule so an
    * independent engine can re-derive them; swap in human labels and
    * nothing else changes). Per epoch: score every doc with the CURRENT
    * weights, collect the misclassified set, and add Σ y·x over it to
    * the weights — lr = 1 and integer features keep every weight an
    * exact BIGINT, so training is reproducible bit-for-bit and the
    * DuckDB oracle unrolls the same epochs as CTEs.
    *
    * This is THE distributed-training shape: the model (D+1 ints)
    * broadcasts to executors, the per-doc scoring and the mistake
    * gradient Σ y·x are map-combinable aggregates over the static
    * feature table (built once, persisted, shuffled once on doc_id),
    * and the driver sees D+1 rows per epoch — gradient aggregation via
    * partial sums, no parameter server needed below ~10⁶ dims. At 100
    * TB the same loop runs with the feature table bucketed on doc_id;
    * epochs cost one scan each.
    *
    * @return (epoch, dim, weight, n_mistakes): weights AFTER each
    *         epoch, with that epoch's pre-update mistake count
    */
  def perceptronTrain(docs: DataFrame,
                      dims: Int = PerceptronDims,
                      epochs: Int = PerceptronEpochs): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toked = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("y",
        when(lexiconHits(col("t"), Lexicons.head._2) >= PerceptronMinStops, 1L)
          .otherwise(-1L))
    val tf = toked
      .select(col("doc_id"), col("y"), explode(col("t")).as("w"))
      .withColumn("dim", pmod(charHash(col("w"), lit(PerceptronSeed)), lit(dims.toLong)))
      .groupBy(col("doc_id"), col("y"), col("dim"))
      .agg(count(lit(1)).as("cnt"))
    val feats = tf.unionAll(toked.select(col("doc_id"), col("y"),
        lit(dims.toLong).as("dim"), lit(1L).as("cnt")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feats.count()
    var w = Array.fill(dims + 1)(0L)
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    (1 to epochs).foreach { e =>
      val wDf = w.zipWithIndex
        .map { case (wt, d) => (d.toLong, wt) }.toSeq.toDF("dim", "wt")
      val dot = feats.join(broadcast(wDf), "dim")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * col("wt")).as("dot"))
      val mist = dot.filter(
        (col("y") === 1L && col("dot") <= 0L) ||
          (col("y") === -1L && col("dot") > 0L))
        .select(col("doc_id"), col("y"))
      // one D+2-row driver round-trip per epoch: the mistake count and
      // the per-dim gradient Σ y·x (both map-side combinable)
      val delta = mist.join(feats.select(col("doc_id"), col("dim"), col("cnt")),
          "doc_id")
        .groupBy(col("dim")).agg(sum(col("y") * col("cnt")).as("d"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      val nMistakes = mist.count()
      w = w.zipWithIndex.map { case (wt, d) => wt + delta.getOrElse(d, 0L) }
      w.zipWithIndex.foreach { case (wt, d) =>
        trace += ((e, d.toLong, wt, nMistakes))
      }
    }
    feats.unpersist(blocking = false)
    trace.toSeq.toDF("epoch", "dim", "weight", "n_mistakes")
  }

  /** Map-side classifier INFERENCE — the serving half of
    * [[perceptronTrain]] and the fastText-quality-filter deployment
    * shape: train on a sample, then score the WHOLE corpus with the
    * frozen weights. `weights` is the final-epoch (dims+1)-long
    * vector (last entry = bias), inlined as a literal array so the
    * per-doc score Σ_tokens wt[hash(w) mod D] + bias is ONE
    * higher-order column expression — zero shuffles, zero joins, the
    * text never leaves its partition; at 100 TB this is a pure scan.
    * Integer-exact (the training is), so the oracle reproduces every
    * score bit-for-bit. Returns (doc_id, score_int, label).
    */
  def perceptronScore(docs: DataFrame, weights: Array[Long],
                      dims: Int = PerceptronDims): DataFrame = {
    require(weights.length == dims + 1,
      s"weights must be dims+1 = ${dims + 1} long, got ${weights.length}")
    val wArr = array(weights.map(lit): _*)
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        (aggregate(col("t"), lit(0L), (acc, w) =>
          acc + element_at(wArr,
            (pmod(charHash(w, lit(PerceptronSeed)), lit(dims.toLong)) + 1)
              .cast("int")))
          + lit(weights(dims))).as("score_int"))
      .select(col("doc_id"), col("score_int"),
        when(col("score_int") > 0, 1L).otherwise(-1L).as("label"))
  }

  /** Fixed example length of [[packExamples]]. */
  val PackBudget = 512L

  /** Training-example packing WITH document splitting — the GPT-style
    * prep [[tokenPack]] (whole-doc binning) stops short of: each
    * source's documents are concatenated in deterministic (doc_id)
    * order into one token stream, and the stream is cut into exact
    * `budget`-token examples; a document longer than the remainder of
    * its example CONTINUES into the next one. Emits one row per
    * (document, example) overlap span — (source, doc_id, example_id,
    * tok_from, tok_to), token positions 1-based within the document —
    * from which the trainer materializes each example by slicing its
    * member docs. All integer arithmetic (cumulative offsets, span
    * intersection), so the oracle replays it bit-for-bit.
    *
    * Scale shape: one PARTITIONED window (per-source cumulative token
    * count — sources pack independently, so the sort parallelizes
    * across them) plus a map-side explode bounded by each doc's span
    * count (≈ n/budget + 1). The text itself is never moved or
    * exploded — only (id, count) rows shuffle.
    */
  def packExamples(docs: DataFrame, budget: Long = PackBudget): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n"))
      .withColumn("off", sum(col("n")).over(w) - col("n"))
      .withColumn("example_id", explode(sequence(
        floor(col("off") / budget).cast("long"),
        floor((col("off") + col("n") - 1) / budget).cast("long"))))
      .select(col("source"), col("doc_id"), col("example_id"),
        (greatest(lit(0L), col("example_id") * budget - col("off")) + 1)
          .as("tok_from"),
        least(col("n"), (col("example_id") + 1) * budget - col("off"))
          .as("tok_to"))
  }

  /** Chunk window / stride of [[slidingChunks]] (overlap = 8 tokens). */
  val ChunkW = 32
  val ChunkS = 24

  /** RAG / embedding-table chunking: split each document's token
    * stream into fixed-size sliding windows (`w` tokens, stride `s`,
    * overlap w−s) — the prep pass that turns a corpus into the chunk
    * table an embedding + ANN tier serves from. Emits (doc_id,
    * chunk_id, n_tokens, chunk) with engine-independent ids: chunk i
    * covers tokens [i·s+1 .. i·s+w], the chunk count is
    * 1 + ceil((n−w)/s) for n > w else 1 (all integer arithmetic), and
    * the last window clamps at the document end.
    *
    * Scale shape: pure map-side higher-order expressions — tokenize,
    * one sequence/explode bounded by the per-doc chunk count, two
    * slices. Zero shuffles, zero joins; text never leaves its
    * partition. At 100 TB this runs at scan speed and the output
    * lands partitioned however the downstream embedder wants it.
    */
  def slidingChunks(docs: DataFrame, w: Int = ChunkW,
                    s: Int = ChunkS): DataFrame = {
    require(w > 0 && s > 0 && s <= w, s"need 0 < stride <= window, got w=$w s=$s")
    val k = when(col("n") > w,
      floor((col("n") - w + (s - 1)) / s).cast("long") + 1L).otherwise(lit(1L))
    val start = (col("chunk_id") * s + 1).cast("int")
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), k - 1)))
      .select(col("doc_id"), col("chunk_id"),
        size(slice(col("t"), start, lit(w))).cast("long").as("n_tokens"),
        array_join(slice(col("t"), start, lit(w)), " ").as("chunk"))
  }

  /** Number of BPE merges the gate trains (the oracle unrolls the
    * same count as SQL CTE rounds). */
  val BpeMerges = 4

  /** Adjacent symbol pairs of every word's CURRENT segmentation,
    * weighted by word frequency — the classic overlap-counting BPE
    * ranking. Runs over the vocab-sized word table, never the corpus. */
  private def bpePairCounts(words: DataFrame): DataFrame =
    words.select(col("n"), split(col("s"), " ").as("a"))
      .withColumn("i", explode(when(size(col("a")) >= 2,
        sequence(lit(1), size(col("a")) - 1))
        .otherwise(array().cast("array<int>"))))
      .select(element_at(col("a"), col("i")).as("l"),
        element_at(col("a"), col("i") + 1).as("r"), col("n"))
      .groupBy(col("l"), col("r")).agg(sum(col("n")).as("freq"))

  /** Fuse one (l, r) symbol pair everywhere in a space-joined
    * segmentation: whitespace-delimited literal replace — leftmost
    * non-overlapping INCLUDING separators, the semantics Spark and
    * DuckDB `replace` share exactly (a run `a a a a` fuses once per
    * non-overlapping window and resumes after the consumed separator;
    * classic greedy BPE would also re-fuse the run's tail — on
    * natural text the divergence is confined to length-≥4 repeated-
    * symbol runs inside one word, and the variant is deterministic
    * and cross-engine bit-reproducible, which is what the gate pins). */
  private def bpeApply(s: Column, l: String, r: String): Column =
    trim(replace(concat(lit(" "), s, lit(" ")),
      lit(s" $l $r "), lit(s" $l$r ")))

  /** Character-level BPE tokenizer TRAINING — the Sennrich/GPT loop,
    * Spark-shaped. The missing piece between a cleaned corpus and its
    * token-budget operators (packing, chunking, token counts): those
    * assume a tokenizer; this trains one.
    *
    *   1. ONE corpus-scale pass: word frequencies. This is the only
    *      step that reads the data — everything after runs on the
    *      vocab-sized distinct-word table, the property that makes
    *      BPE training tractable at 100 TB (the corpus contributes
    *      counts, not sequences).
    *   2. Each distinct word becomes its space-joined character
    *      segmentation.
    *   3. `numMerges` rounds: count adjacent symbol pairs weighted by
    *      word frequency, take the argmax under the deterministic
    *      (freq desc, left asc, right asc) tie-break — a ONE-row
    *      driver round-trip per round — and fuse that pair in every
    *      word via [[bpeApply]].
    *
    * Returns the ordered merge table (rank, left, right, freq) — the
    * artifact an encoder ships ([[bpeEncodedCounts]] applies it as
    * `numMerges` literal map-side replaces).
    */
  def bpeTrain(docs: DataFrame, numMerges: Int = BpeMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat_ws(" ", split(col("w"), "")).as("s"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = words
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (rank <- 1 to numMerges) {
        val best = bpePairCounts(cur)
          .orderBy(col("freq").desc, col("l"), col("r"))
          .limit(1).collect()
        require(best.nonEmpty, s"corpus exhausted after ${rank - 1} merges")
        val (l, r, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((rank, l, r, f))
        cur = cur.select(bpeApply(col("s"), l, r).as("s"), col("n"))
        // bound the nested-replace lineage: without periodic
        // re-materialization, round i re-analyzes an i-deep expression
        // tree (O(rounds²) Catalyst work, stack overflow in the
        // thousands) — a vocab-sized checkpoint every 16 rounds keeps
        // both the plan and the per-round cost flat in `numMerges`
        if (rank % 16 == 0) cur = cur.localCheckpoint()
      }
      merges.result().toDF("rank", "left", "right", "freq")
        .select(col("rank").cast("int").as("rank"),
          col("left"), col("right"), col("freq"))
    } finally words.unpersist(blocking = false)
  }

  /** Per-document token counts under the TRAINED merges: each
    * whitespace token re-segmented by the learned merge sequence
    * (numMerges literal replaces — pure map work once the tiny merge
    * table is known), counted per doc. The end-to-end check that the
    * trained tokenizer actually tokenizes: training  + encode must
    * reproduce DuckDB running the identical unrolled rounds. */
  def bpeEncodedCounts(docs: DataFrame,
                       numMerges: Int = BpeMerges): DataFrame = {
    // the encode applies ALL merges as ONE nested column expression —
    // numMerges-deep; ~130 merges overflows the plan-conversion stack
    // (measured while building the deep-encode path). The unbounded
    // form is [[bpeEncodedCountsStored]]: batched passes over the
    // stored merge table, the production shape.
    require(numMerges <= 96,
      s"bpeEncodedCounts applies merges as one nested expression and " +
        s"overflows the plan-conversion stack near ~130; numMerges=" +
        s"$numMerges > 96 — use bpeEncodedCountsStored(docs, " +
        "bpeTrain(docs, n)) which applies the merge table in batches")
    val merges = bpeTrain(docs, numMerges)
      .orderBy(col("rank")).collect()
      .map(row => (row.getString(1), row.getString(2)))
    val seg = merges.foldLeft(
      concat_ws(" ", split(col("w"), "")): Column) {
      case (acc, (l, r)) => bpeApply(acc, l, r)
    }
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), size(split(seg, " ")).as("nt"))
      .groupBy(col("doc_id")).agg(sum(col("nt")).as("n_subtokens"))
  }

  /** Padding merges for the deep-encode gate: deterministic pairs over
    * a growing symbol list (seeded a-z0-9; each merge's fusion joins
    * the list, so later pairs reference built symbols — the shape of a
    * real merges.txt tail). Most never fire on a given batch, exactly
    * like the long tail of a production 32k-merge artifact — what they
    * exercise is the encoder's SEQUENTIAL depth, which is the property
    * the 256-merge expression ceiling used to cap. */
  private[operators] def paddingMerges(n: Int): Seq[(String, String)] = {
    val syms = scala.collection.mutable.ArrayBuffer[String](
      (('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)): _*)
    (1 to n).map { r =>
      val l = syms((r * 13) % syms.size)
      val rt = syms((r * 31 + 7) % syms.size)
      syms += (l + rt)
      (l, rt)
    }
  }

  /** Number of padding merges the deep-encode gate appends — the total
    * merge count is `corpus substrings + this`, always ≥ 1024. */
  val DeepPadding = 1024

  /** CLOSED-FORM frequency-ranked merge table: every substring (len ≥
    * 2) of the corpus vocabulary becomes merge (prefix, last-char),
    * ranked (length asc, corpus frequency desc, substring asc), plus
    * [[paddingMerges]] ranked after. Length-ascending order guarantees
    * every merge's left symbol has its own formation merge EARLIER in
    * the sequence, so chains can fire end-to-end.
    *
    * This is deliberately NOT iterative BPE training ([[bpeTrain]] is,
    * and is gated separately): re-ranking pair counts after every
    * fusion takes one sequential round per merge, which no independent
    * engine can replay 1000+ deep in closed form — while THIS ranking
    * any engine derives from one aggregation, which is what lets the
    * deep-ENCODE gate hash-match a DuckDB oracle at 1000+ merges. The
    * encoder ([[bpeEncodedCountsStored]]) is byte-identical either
    * way: a merge table is a merge table.
    *
    * Scale shape: substring explosion and ranking run on the DISTINCT
    * WORD table (corpus contributes counts, never sequences), and the
    * global rank is a sort of a vocab-artifact-sized frame — the same
    * O(vocab) class as bpeTrain's per-round argmax. */
  def frequencyMergeTable(docs: DataFrame,
                          padding: Int = DeepPadding): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val subs = words
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("n"),
        explode(sequence(lit(2), length(col("w")))).as("l"))
      .filter(col("l") >= 2 && col("l") <= length(col("w")))
      .select(col("n"), col("l"),
        explode(sequence(lit(1), length(col("w")) - col("l") + 1)).as("i"),
        col("w"))
      .select(expr("substring(w, i, l)").as("s"), col("n"))
      .groupBy(col("s")).agg(sum(col("n")).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(length(col("s")), col("freq").desc, col("s"))
    val corpus = subs
      .withColumn("rank", row_number().over(w))
      .select(col("rank"),
        expr("substring(s, 1, length(s) - 1)").as("left"),
        expr("substring(s, length(s), 1)").as("right"),
        col("freq"))
    val base = corpus.count().toInt
    val pad = paddingMerges(padding).zipWithIndex
      .map { case ((l, r), i) => (base + i + 1, l, r, 0L) }
      .toDF("rank", "left", "right", "freq")
    corpus.unionByName(pad)
  }

  /** Batched BPE ENCODE from a persisted merge table — the production
    * serving half [[bpeEncodedCounts]]'s 256-merge expression ceiling
    * points at: merges apply in rank order in batches of `batch`
    * nested replaces, with a vocab-sized localCheckpoint between
    * batches (the bpeTrain lineage pattern), so merge count is
    * unbounded — depth costs one vocab-table pass per batch, never a
    * deeper Catalyst tree.
    *
    * The segmentation runs over the DISTINCT WORD table and joins back
    * to per-doc tokens: at 100 TB the corpus pays one tokenize + one
    * vocab join, and the (merges × vocab) encode work is
    * corpus-size-invariant — same argument as [[bpeTrain]], applied to
    * serving. */
  def bpeEncodedCountsStored(docs: DataFrame, merges: DataFrame,
                             batch: Int = 32): DataFrame = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    // batch sizing: each merge is ~5 nested Column nodes (trim ∘
    // replace ∘ concat), and Spark's ColumnNode→Expression conversion
    // recurses the whole tree — 128 merges/batch overflows a default
    // driver stack (measured, not guessed); 32 keeps ~6× headroom
    // the merge table is the tokenizer artifact: rank-ordered, tiny
    // relative to any corpus (32k-256k rows in production) — the same
    // bounded driver collect bpeEncodedCounts does
    val ms = merges.orderBy(col("rank")).collect()
      .map(row => (row.getString(1), row.getString(2)))
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    var seg = toks.select(col("w")).distinct()
      .select(col("w"), concat_ws(" ", split(col("w"), "")).as("s"))
    ms.grouped(batch).foreach { grp =>
      val fused = grp.foldLeft(col("s")) {
        case (acc, (l, r)) => bpeApply(acc, l, r)
      }
      // lazy localCheckpoint: truncates the nested-replace lineage so
      // Catalyst never sees more than `batch` replaces at once
      seg = seg.select(col("w"), fused.as("s")).localCheckpoint(false)
    }
    toks.join(seg, "w")
      .select(col("doc_id"), size(split(col("s"), " ")).as("nt"))
      .groupBy(col("doc_id")).agg(sum(col("nt")).as("n_subtokens"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_train_classifier" -> { (s, d) => perceptronTrain(t(s, d, "documents")) },
    // sliding-window chunking (the RAG chunk-table prep): map-side
    // only, ids and window arithmetic engine-independent
    "p_chunk" -> { (s, d) => slidingChunks(t(s, d, "documents")) },
    // exact-budget example packing with cross-example doc splitting
    "p_pack_split" -> { (s, d) => packExamples(t(s, d, "documents")) },
    // train → freeze final weights (a dims+2-row bounded collect) →
    // zero-shuffle map-side scoring of the whole corpus
    "p_classify" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val w = new Array[Long](PerceptronDims + 1)
      perceptronTrain(docs)
        .filter(col("epoch") === PerceptronEpochs)
        .select(col("dim"), col("weight"))
        .collect().foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
      perceptronScore(docs, w)
    },
    "p_split" -> { (s, d) => deterministicSplit(t(s, d, "documents")) },
    "p_curriculum" -> { (s, d) => curriculum(t(s, d, "documents")) },
    "p_weighted_sample" -> { (s, d) => weightedSample(t(s, d, "documents")) },
    "p_shuffle" -> { (s, d) => shuffleDeterministic(t(s, d, "documents")) },
    "p_clean_corpus" -> { (s, d) => cleanCorpus(t(s, d, "documents")) },
    "p_decontaminate" -> { (s, d) => decontaminate(t(s, d, "documents")) },
    "p_train_mix" -> { (s, d) => trainMix(t(s, d, "documents")) },
    "p_token_pack" -> { (s, d) => tokenPack(t(s, d, "documents")) },
    "p_source_cap" -> { (s, d) => sourceCap(t(s, d, "documents")) },
    "p_stratified" -> { (s, d) => stratifiedSample(t(s, d, "documents")) },
    // DSIR importance resampling toward the English sub-corpus; the
    // integerized bucket-ratio weights are oracle-checked bit-for-bit
    "p_dsir" -> { (s, d) => importanceResample(t(s, d, "documents")) },
    // cluster-keyed split: near-dup families can never straddle
    // train/test (leakage-safe by construction)
    "p_leak_safe_split" -> { (s, d) => leakSafeSplit(s, t(s, d, "documents")) },
    // BPE tokenizer training (4 merges) and the encode it ships:
    // corpus read once for word counts, merges run vocab-sized
    "p_bpe" -> { (s, d) => bpeTrain(t(s, d, "documents")) },
    "p_bpe_encode" -> { (s, d) => bpeEncodedCounts(t(s, d, "documents")) },
    // deep encode: 1000+-merge artifact applied through the BATCHED
    // stored-table path (the 256-merge expression ceiling's production
    // fix) — vocab-level segmentation, corpus joins back at the end
    "p_bpe_encode_deep" -> { (s, d) =>
      val docs = t(s, d, "documents")
      bpeEncodedCountsStored(docs, frequencyMergeTable(docs))
    },
    // the SQL TVF surface of the same deep encode (registration + one
    // SELECT): must not change a row vs the API path — shared oracle
    "p_bpe_tvf_deep" -> { (s, d) =>
      TextTableFunctions.register(s)
      s.sql(s"SELECT * FROM text_bpe_encode('$d/documents.parquet')")
    }
  )

  def oracle: Map[String, String] = {
    val lex = Lexicons.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    val gatedRel =
      s"""(SELECT * FROM documents
         | WHERE length(text) >= $MinChars
         |   AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |         w -> list_contains($lex, w))) >= $MinStopwordHits)""".stripMargin
    // unrolled perceptron epochs; MATERIALIZED so the epoch chain stays
    // linear under DuckDB's CTE inlining (each epoch reads its
    // predecessor several times). The WITH-prefix is shared by the
    // trainer oracle (weight trace) and the classifier oracle (score
    // every doc with the final epoch's weights).
    val perceptronCtes = {
      val hash = s"list_reduce(list_prepend(CAST($PerceptronSeed AS BIGINT), " +
        "list_transform(regexp_extract_all(w, '.'), c -> CAST(ord(c) AS BIGINT))), " +
        s"(acc, x) -> (acc * 31 + x) % ${graft.functions.TextFunctions.HashMod})"
      val epochs = (1 to PerceptronEpochs).map { e =>
        val p = e - 1
        s"""dot$e AS MATERIALIZED (
           |  SELECT f.doc_id, any_value(f.y) AS y,
           |    CAST(sum(f.cnt * w.wt) AS BIGINT) AS dot
           |  FROM feats f JOIN w$p w ON w.dim = f.dim GROUP BY f.doc_id),
           |mist$e AS MATERIALIZED (
           |  SELECT doc_id, y FROM dot$e
           |  WHERE (y = 1 AND dot <= 0) OR (y = -1 AND dot > 0)),
           |w$e AS MATERIALIZED (
           |  SELECT w.dim, CAST(w.wt + coalesce(d.delta, 0) AS BIGINT) AS wt
           |  FROM w$p w LEFT JOIN (
           |    SELECT f.dim, sum(m.y * f.cnt) AS delta
           |    FROM mist$e m JOIN feats f ON f.doc_id = m.doc_id
           |    GROUP BY f.dim) d ON d.dim = w.dim)""".stripMargin
      }.mkString(",\n")
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id,
         |    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
         |  FROM documents),
         |lab AS MATERIALIZED (
         |  SELECT doc_id, t,
         |    CASE WHEN len(list_filter(t, w -> list_contains($lex, w)))
         |           >= $PerceptronMinStops
         |         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
         |  FROM tok),
         |tf AS (
         |  SELECT doc_id, any_value(y) AS y, dim,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT doc_id, y, $hash % $PerceptronDims AS dim
         |        FROM (SELECT doc_id, y, unnest(t) AS w FROM lab))
         |  GROUP BY doc_id, dim),
         |feats AS MATERIALIZED (
         |  SELECT doc_id, y, dim, cnt FROM tf
         |  UNION ALL
         |  SELECT doc_id, y, CAST($PerceptronDims AS BIGINT) AS dim,
         |    CAST(1 AS BIGINT) AS cnt FROM lab),
         |w0 AS (
         |  SELECT CAST(unnest(range(0, ${PerceptronDims + 1})) AS BIGINT) AS dim,
         |    CAST(0 AS BIGINT) AS wt),
         |$epochs""".stripMargin
    }
    val perceptronSql = {
      val rows = (1 to PerceptronEpochs).map { e =>
        s"""SELECT CAST($e AS INT) AS epoch, CAST(dim AS BIGINT) AS dim,
           |  wt AS weight,
           |  (SELECT CAST(count(*) AS BIGINT) FROM mist$e) AS n_mistakes
           |FROM w$e""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$perceptronCtes\n$rows"
    }
    // final-epoch weights applied to every doc's features — the same
    // integer sum the zero-shuffle Spark expression computes
    val classifySql =
      s"""$perceptronCtes
         |SELECT f.doc_id,
         |  CAST(sum(f.cnt * w.wt) AS BIGINT) AS score_int,
         |  CASE WHEN sum(f.cnt * w.wt) > 0 THEN CAST(1 AS BIGINT)
         |       ELSE CAST(-1 AS BIGINT) END AS label
         |FROM feats f JOIN w$PerceptronEpochs w ON w.dim = f.dim
         |GROUP BY f.doc_id""".stripMargin
    Map(
      "p_train_classifier" -> perceptronSql,
      "p_classify" -> classifySql,
      "p_chunk" ->
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, t,
           |    CASE WHEN len(t) > $ChunkW
           |      THEN ((len(t) - $ChunkW + ${ChunkS - 1}) // $ChunkS) + 1
           |      ELSE 1 END AS k
           |  FROM d)
           |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           |  CAST(len(t[(i*$ChunkS+1):(i*$ChunkS+$ChunkW)]) AS BIGINT) AS n_tokens,
           |  array_to_string(t[(i*$ChunkS+1):(i*$ChunkS+$ChunkW)], ' ') AS chunk
           |FROM c, unnest(range(0, k)) AS r(i)""".stripMargin,
      "p_pack_split" ->
        s"""WITH d AS (
           |  SELECT doc_id, source,
           |    CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
           |      AS BIGINT) AS n
           |  FROM documents),
           |o AS (
           |  SELECT doc_id, source, n,
           |    CAST(sum(n) OVER (PARTITION BY source ORDER BY doc_id)
           |      - n AS BIGINT) AS off
           |  FROM d)
           |SELECT source, doc_id, CAST(e AS BIGINT) AS example_id,
           |  CAST(greatest(0, e*$PackBudget - off) + 1 AS BIGINT) AS tok_from,
           |  CAST(least(n, (e+1)*$PackBudget - off) AS BIGINT) AS tok_to
           |FROM o, unnest(range(off // $PackBudget,
           |  (off + n - 1) // $PackBudget + 1)) AS r(e)""".stripMargin,
      "p_split" ->
        """SELECT doc_id, source,
          |  CASE
          |    WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)),
          |      1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
          |    WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)),
          |      1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
          |    ELSE 'test' END AS split
          |FROM documents""".stripMargin,

      "p_curriculum" ->
        """WITH s AS (
          |  SELECT doc_id,
          |    CAST(n_chars AS DOUBLE) /
          |      len(regexp_split_to_array(trim(lower(text)), '\s+')) AS difficulty
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(row_number() OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS ordinal,
          |  CAST(ntile(4) OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS phase
          |FROM s""".stripMargin,

      "p_weighted_sample" ->
        """WITH s AS (
          |  SELECT doc_id, lang, n_chars,
          |    CAST(('0x' || substr(md5('w9-' || CAST(doc_id AS VARCHAR)), 1, 8))
          |      AS BIGINT) AS h
          |  FROM documents),
          |p AS (
          |  SELECT doc_id, lang,
          |    CAST(n_chars AS DOUBLE) / ((h + 1) / 4294967296.0) AS priority
          |  FROM s),
          |r AS (
          |  SELECT doc_id, lang,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY priority DESC, doc_id) AS BIGINT) AS rk
          |  FROM p)
          |SELECT doc_id, lang, rk FROM r WHERE rk <= 25""".stripMargin,

      "p_clean_corpus" ->
        s"""WITH ${Dedup.minhashCtes(gatedRel)}
           |SELECT doc_id, source, length(text) AS n_chars_kept
           |FROM $gatedRel AS gated
           |WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM verified WHERE jac >= 0.25)""".stripMargin,

      "p_shuffle" ->
        """WITH s AS (
          |  SELECT doc_id,
          |    md5('seed42-' || CAST(doc_id AS VARCHAR)) AS sort_key
          |  FROM documents)
          |SELECT doc_id, sort_key, substr(sort_key, 1, 1) AS shard,
          |  CAST(row_number() OVER (PARTITION BY substr(sort_key, 1, 1)
          |    ORDER BY sort_key, doc_id) AS BIGINT) AS rank
          |FROM s""".stripMargin,

      "p_decontaminate" ->
        """WITH toks AS (
          |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
          |  FROM documents),
          |s AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 4 THEN
          |      list_transform(range(1, len(t) - 2),
          |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
          |    ELSE [] END) AS sh
          |  FROM toks),
          |bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 50 = 0),
          |tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 50 <> 0)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
          |FROM tr JOIN bench USING (g) GROUP BY doc_id""".stripMargin,

      "p_train_mix" ->
        // TRY_CAST: a digitless source gives '' — Spark's cast yields
        // null (→ rate 25); a plain CAST here would abort the query
        """WITH r AS (
          |  SELECT doc_id, source, lang,
          |    CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 2 = 0
          |      THEN 50 ELSE 25 END AS mix_rate
          |  FROM documents)
          |SELECT doc_id, source, lang, mix_rate FROM r
          |WHERE doc_id % 100 < mix_rate""".stripMargin,

      "p_source_cap" ->
        """WITH r AS (
          |  SELECT doc_id, source, n_chars,
          |    CAST(row_number() OVER (PARTITION BY source
          |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
          |  FROM documents)
          |SELECT doc_id, source, n_chars, rk FROM r WHERE rk <= 40""".stripMargin,

      "p_stratified" ->
        """WITH s AS (
          |  SELECT doc_id, lang,
          |    md5('s7-' || CAST(doc_id AS VARCHAR)) AS sample_key
          |  FROM documents),
          |r AS (
          |  SELECT doc_id, lang,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY sample_key, doc_id) AS BIGINT) AS rk
          |  FROM s)
          |SELECT doc_id, lang, rk FROM r WHERE rk <= 30""".stripMargin,

      "p_token_pack" ->
        """WITH tok AS (
          |  SELECT doc_id, source,
          |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
          |      AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, source, n_tokens,
          |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          |  FROM tok)
          |SELECT doc_id, source, n_tokens, cum_tokens,
          |  CAST(floor((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS bin
          |FROM c""".stripMargin,

      // dupClusters' closure (the d_dup_clusters oracle block) + the
      // p_split hash CASE, keyed by COALESCE(cluster, doc_id)
      "p_leak_safe_split" ->
        s"""WITH RECURSIVE ${Dedup.minhashCtes("documents")},
           |pairs AS (SELECT a_id AS src, b_id AS dst FROM verified
           |          WHERE jac >= 0.25),
           |ue AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
           |reach(v, r) AS (
           |  SELECT DISTINCT src AS v, src AS r FROM ue
           |  UNION
           |  SELECT reach.v, ue.dst AS r FROM reach JOIN ue ON ue.src = reach.r),
           |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
           |k AS (
           |  SELECT d.doc_id, d.source,
           |    COALESCE(cl.cluster_id, d.doc_id) AS split_key
           |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id)
           |SELECT doc_id, source, split_key,
           |  CASE
           |    WHEN CAST(('0x' || substr(md5('lsplit-' ||
           |      CAST(split_key AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
           |      THEN 'train'
           |    WHEN CAST(('0x' || substr(md5('lsplit-' ||
           |      CAST(split_key AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
           |      THEN 'val'
           |    ELSE 'test' END AS split
           |FROM k""".stripMargin,

      "p_dsir" ->
        """WITH tok AS (
          |  SELECT doc_id, lang,
          |    CAST(('0x' || substr(md5('dsir-' || w.w), 1, 8)) AS BIGINT)
          |      % 1024 AS b
          |  FROM documents,
          |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w(w)),
          |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM tok GROUP BY 1),
          |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS tc FROM tok
          |        WHERE lang = 'en' GROUP BY 1),
          |score AS (
          |  SELECT raw.b,
          |    CAST(floor(CAST(1000000 * (COALESCE(tgt.tc, 0) + 1) AS DOUBLE) /
          |      CAST(raw.rc + 1 AS DOUBLE)) AS BIGINT) AS s
          |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b),
          |w AS (
          |  SELECT tok.doc_id, tok.lang,
          |    CAST(sum(score.s) AS BIGINT) AS weight,
          |    CAST(count(*) AS BIGINT) AS n_tokens
          |  FROM tok JOIN score ON score.b = tok.b
          |  GROUP BY tok.doc_id, tok.lang),
          |r AS (
          |  SELECT doc_id, lang, weight, n_tokens,
          |    CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS BIGINT)
          |      AS rk
          |  FROM w)
          |SELECT doc_id, lang, weight, n_tokens, rk FROM r WHERE rk <= 100""".stripMargin
    ) ++ bpeOracle
  }

  /** BPE oracle: the training loop unrolled as [[BpeMerges]] CTE
    * rounds — per round the pair count over the previous round's word
    * table, the (freq desc, l, r) argmax, and the whitespace-replace
    * fuse, all in the identical op order the Spark side runs. */
  private def bpeOracle: Map[String, String] = {
    val tok = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    def repl(x: String, i: Int): String =
      s"trim(replace(' ' || $x || ' ', " +
        s"' ' || (SELECT l FROM best$i) || ' ' || (SELECT r FROM best$i) || ' ', " +
        s"' ' || (SELECT l FROM best$i) || (SELECT r FROM best$i) || ' '))"
    val rounds = (1 to BpeMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT a[ix.i] AS l, a[ix.i + 1] AS r, CAST(sum(n) AS BIGINT) AS freq
         |  FROM (SELECT string_split(s, ' ') AS a, n FROM w${i - 1}) t,
         |       LATERAL (SELECT unnest(range(1, len(a))) AS i) ix
         |  GROUP BY 1, 2),
         |best$i AS MATERIALIZED (
         |  SELECT l, r, freq FROM p$i ORDER BY freq DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT ${repl("s", i)} AS s, n FROM w${i - 1})""".stripMargin
    }.mkString(",\n")
    val ctes =
      s"""WITH w0 AS MATERIALIZED (
         |  SELECT array_to_string(string_split(w, ''), ' ') AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest($tok) AS w FROM documents)
         |  WHERE length(w) > 0 GROUP BY w),
         |$rounds""".stripMargin
    val mergeRows = (1 to BpeMerges).map(i =>
      s"""SELECT CAST($i AS INT) AS rank, l AS "left", r AS "right", freq
         |FROM best$i""".stripMargin).mkString("\nUNION ALL\n")
    val encodeSeg = (1 to BpeMerges).foldLeft(
      "array_to_string(string_split(w, ''), ' ')")((x, i) => repl(x, i))
    // deep-encode oracle: the closed-form frequency-ranked merge
    // table (substring aggregation — no iteration) + the padding
    // VALUES, applied merge-by-merge with a recursive CTE; final
    // segmentation joins back to per-doc tokens
    val padVals = paddingMerges(DeepPadding).zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1},'$l','$r')" }.mkString(", ")
    val deepSql =
      s"""WITH RECURSIVE tok AS (
         |  SELECT doc_id, w.w AS w FROM documents,
         |    unnest($tok) AS w(w)
         |  WHERE length(w.w) > 0),
         |words AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY w),
         |subs AS (
         |  SELECT s, CAST(sum(n) AS BIGINT) AS freq FROM (
         |    SELECT substr(w, st.i, ln.l) AS s, n
         |    FROM words,
         |      LATERAL (SELECT unnest(range(2, len(w) + 1)) AS l) ln,
         |      LATERAL (SELECT unnest(range(1, len(w) - ln.l + 2)) AS i) st)
         |  GROUP BY s),
         |cm AS (
         |  SELECT row_number() OVER (ORDER BY len(s), freq DESC, s) AS rank,
         |    substr(s, 1, len(s) - 1) AS l, substr(s, len(s), 1) AS r
         |  FROM subs),
         |pad(i, l, r) AS (FROM (VALUES $padVals) t(i, l, r)),
         |merges AS (
         |  SELECT rank, l, r FROM cm
         |  UNION ALL
         |  SELECT (SELECT count(*) FROM cm) + i, l, r FROM pad),
         |seg(w, s, rk) AS (
         |  SELECT w, array_to_string(string_split(w, ''), ' '), 0 FROM words
         |  UNION ALL
         |  SELECT seg.w,
         |    trim(replace(' ' || s || ' ', ' ' || m.l || ' ' || m.r || ' ',
         |                 ' ' || m.l || m.r || ' ')),
         |    rk + 1
         |  FROM seg JOIN merges m ON m.rank = seg.rk + 1),
         |fin AS (SELECT w, s FROM seg
         |        WHERE rk = (SELECT count(*) FROM merges))
         |SELECT doc_id, CAST(sum(len(string_split(s, ' '))) AS BIGINT)
         |  AS n_subtokens
         |FROM tok JOIN fin USING (w) GROUP BY doc_id""".stripMargin
    Map(
      "p_bpe" -> s"$ctes\n$mergeRows",
      "p_bpe_encode_deep" -> deepSql,
      "p_bpe_tvf_deep" -> deepSql,
      "p_bpe_encode" ->
        s"""$ctes,
           |toks AS (SELECT doc_id, unnest($tok) AS w FROM documents),
           |segs AS (
           |  SELECT doc_id, $encodeSeg AS s
           |  FROM toks WHERE length(w) > 0)
           |SELECT doc_id, CAST(sum(len(string_split(s, ' '))) AS BIGINT)
           |  AS n_subtokens
           |FROM segs GROUP BY doc_id""".stripMargin
    )
  }
}
