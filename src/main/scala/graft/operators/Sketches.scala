package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Mergeable-sketch aggregates — the approximate-analytics layer a
  * 100 TB pipeline leans on when exact global aggregation is too
  * expensive to recompute from scratch:
  *
  *   - Count-Min heavy hitters, as a CANDIDATE GATE feeding an exact
  *     verify pass (output is exact, the sketch only prunes the shuffle);
  *   - HyperLogLog (DataSketches) distinct counts, pre-aggregated per
  *     partition key and UNIONED later — the "store tiny sketches, merge
  *     on demand" incremental-distinct pattern;
  *   - rank-error-bounded approximate percentiles.
  *
  * The sketches themselves are approximate, so only the exact-output
  * heavy-hitter pass is DuckDB-oracle-checked; the HLL/percentile
  * accuracy contracts are pinned by SketchSpec instead (estimate within
  * analytic error bounds of the exact answer, union == one-shot).
  */
object Sketches {

  /** Exact heavy hitters with a Count-Min candidate gate.
    *
    * Pass 1 builds a Count-Min sketch of the key column (Spark's
    * `stat.countMinSketch` — a treeAggregate of mergeable partial
    * sketches, a few KB each). The broadcast sketch then gates rows
    * MAP-SIDE: only keys whose CMS estimate reaches `minCount` enter the
    * exact groupBy. CMS never under-counts, so the candidate set is a
    * superset of the true heavy hitters and the exact second pass makes
    * the output independent of sketch collisions — identical to a plain
    * `GROUP BY ... HAVING count(*) >= minCount`.
    *
    * Scale shape: the shuffle carries only candidate keys instead of
    * every distinct key — on a 100 TB table with a long-tailed key
    * column that is the difference between shuffling billions of
    * (key, partial-count) pairs and shuffling thousands. The sketch
    * probe is a broadcast lookup in a boolean filter (one hash per row,
    * outside any aggregation hot path).
    */
  def heavyHitters(spark: SparkSession, df: DataFrame, key: String,
                   minCount: Long, eps: Double = 0.0001): DataFrame = {
    val cms = df.select(col(key)).stat.countMinSketch(key, eps, 0.999, 42)
    val bc = spark.sparkContext.broadcast(cms)
    val gate = udf((k: Long) => bc.value.estimateCount(k) >= minCount)
    df.filter(col(key).isNotNull && gate(col(key)))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Per-group HLL sketches: one row per group with a binary
    * DataSketches HLL sketch of `valueCol`. The sketch column is what a
    * 100 TB pipeline PERSISTS (a few KB per group) so later jobs answer
    * "distinct users over any group subset / time range" by unioning
    * sketches instead of rescanning the fact table.
    */
  def distinctSketches(df: DataFrame, groupCol: String,
                       valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge per-group sketches to one global distinct estimate — the
    * second half of the persist-then-union pattern. Input can be any
    * subset of [[distinctSketches]] rows; no rescan of the base table.
    */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_est"))

  /** One-shot HLL estimate over the raw column (for comparing against
    * the union-of-parts path in specs). */
  def directEstimate(df: DataFrame, valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.agg(hll_sketch_estimate(
      hll_sketch_agg(col(valueCol), lit(lgK))).as("distinct_est"))

  /** Approximate percentiles with a bounded rank error: the mergeable
    * alternative to exact `percentile` when the value column is too big
    * to sort. `accuracy` bounds rank error at 1/accuracy of the row
    * count (Spark's approx_percentile contract).
    */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.agg(approx_percentile(col(valueCol),
      array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Bloom-gated join — an EXPLICIT runtime row-level filter: build a
    * Bloom filter over the (small, post-filter) dim side's join keys,
    * prune the fact side MAP-SIDE before its shuffle, then run the real
    * join. Results are exact regardless of fpp: false positives survive
    * the gate but die in the join; the bloom never admits a row the
    * join wouldn't.
    *
    * Scale shape: this is the semi-join reduction Spark's own runtime
    * bloom filters (spark.sql.optimizer.runtime.bloomFilter.enabled)
    * inject for shuffle joins — written out explicitly so the gate also
    * works where the optimizer won't place one (e.g. ahead of an
    * aggregation, or against a persisted fact table read by later
    * jobs). On a 100 TB fact table with a 0.1%-selective dim filter,
    * the shuffle carries ~fpp·rows instead of every row. The filter is
    * built distributed (`stat.bloomFilter` tree-aggregates mergeable
    * per-partition bitsets); only the fixed-size bitset reaches the
    * driver. The probe UDF is justified like [[heavyHitters]]'s: a
    * sketch probe has no Column-function equivalent.
    */
  def bloomJoin(spark: SparkSession, fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    // an EMPTY dim side yields a null sketch from bloom_filter_agg and
    // stat.bloomFilter NPEs on it; the join result is empty either way,
    // so gate the whole fact side out (keeping the schema). The isEmpty
    // probe is a limit-1 job over the dim side, which is small by
    // contract — a bloom gate for a LARGE dim side would be pointless.
    val keys = dim.select(col(dimKey)).na.drop()
    if (keys.isEmpty) {
      fact.filter(lit(false)).join(dim, col(factKey) === col(dimKey))
    } else {
      val bf = keys.stat.bloomFilter(dimKey, expectedItems, fpp)
      val bc = spark.sparkContext.broadcast(bf)
      val gate = udf((k: Long) => bc.value.mightContain(k))
      fact.filter(col(factKey).isNotNull && gate(col(factKey)))
        .join(dim, col(factKey) === col(dimKey))
    }
  }

  /** KMV (k-minimum-values) distinct-count sketch — unlike HLL, the
    * estimator here is a DETERMINISTIC pure function of the value set
    * (k smallest md5-derived 60-bit hashes; estimate (k−1)/r_k where
    * r_k is the kth smallest hash normalized to (0,1]), so the sketch
    * itself is DuckDB-oracle-checkable bit-for-bit, not just
    * tolerance-tested. Every fp op is single-rounded IEEE (one cast,
    * one exact power-of-two scale, one division, one quantized
    * multiply) — no accumulation order anywhere.
    *
    * Scale shape: the hash is a map-side expression; "k smallest" is
    * Spark's sort-limit (per-partition top-k, then a k-row merge on one
    * reducer — never a global sort), and only k longs reach the final
    * aggregate. The k-hash set is also a mergeable summary: union of
    * per-partition KMVs = KMV of the union, the same persist-then-merge
    * contract as [[distinctSketches]].
    */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 256,
                  seed: String = "kmv"): DataFrame = {
    val unit = (1L << 60).toDouble
    val hashes = df.select(
        conv(substring(md5(concat(lit(seed + "-"),
          col(valueCol).cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .where(col(valueCol).isNotNull).distinct()
    hashes.orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
      .select(col("n").as("n_used"),
        floor(
          when(col("n") < k, col("n").cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (col("hk").cast("double") / lit(unit)))
          * lit(1e6) + lit(0.5)).cast("long").as("est_micro"))
  }

  /** KMV set-operation estimates: union size, intersection size, and
    * Jaccard of two key sets from their k-minimum-values sketches —
    * WITHOUT touching the raw sets a second time. The union sketch is
    * the k smallest of the two k-sets (KMV's closure under union); ρ =
    * members of the union sketch present in BOTH input sketches
    * estimates Jaccard as ρ/k, and intersection as (ρ/k)·|A∪B|_est
    * (the Beyer et al. unbiased KMV estimator family).
    *
    * Like [[kmvDistinct]], every estimate is a DETERMINISTIC pure
    * function of the value sets (md5-derived 60-bit hashes, floor-
    * quantized micro-units, each fp op single-rounded in a fixed
    * order), so the sketch math itself is DuckDB-oracle-checkable
    * bit-for-bit. When |A∪B| < k the sketches are exhaustive and ρ is
    * the EXACT intersection cardinality.
    *
    * Scale shape: each side is one map-side hash projection + a
    * sort-limit top-k (per-partition k-selection, k-row merge); all
    * joins run on ≤k-row frames. This is the persist-then-combine
    * contract for set overlap: store one k-long sketch per partition /
    * day / source, answer any pairwise overlap question later without
    * rescanning — on a 100 TB corpus the difference between an
    * O(|A|+|B|) rescan per question and an O(k) lookup.
    */
  def kmvIntersect(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                   k: Int = 256, seed: String = "kmv"): DataFrame = {
    val unit = (1L << 60).toDouble
    def kmin(df: DataFrame, c: String): DataFrame =
      df.select(
          conv(substring(md5(concat(lit(seed + "-"),
            col(c).cast("string"))), 1, 15), 16, 10)
            .cast("long").as("h"))
        .where(col(c).isNotNull).distinct()
        .orderBy(col("h")).limit(k)
    val ka = kmin(a, aCol).withColumn("in_a", lit(1))
    val kb = kmin(b, bCol).withColumn("in_b", lit(1))
    val kc = ka.select(col("h")).unionAll(kb.select(col("h"))).distinct()
      .orderBy(col("h")).limit(k)
    val flags = kc
      .join(broadcast(ka), Seq("h"), "left")
      .join(broadcast(kb), Seq("h"), "left")
    val aggd = flags.agg(
      count(lit(1)).as("n"), max(col("h")).as("hk"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
        .as("rho"))
    // |A∪B| estimate from the union sketch's kth minimum (exact when
    // the union fits in k); reused verbatim for the intersection scale
    val u = when(col("n") < k, col("n").cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (col("hk").cast("double") / lit(unit)))
    val jac = col("rho").cast("double") / col("n").cast("double")
    aggd.select(
      col("n").as("n_used"), col("rho"),
      floor(u * lit(1e6) + lit(0.5)).cast("long").as("union_micro"),
      floor(jac * lit(1e6) + lit(0.5)).cast("long").as("jaccard_micro"),
      floor(jac * u * lit(1e6) + lit(0.5)).cast("long").as("inter_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact output (the CMS gate only prunes): oracle = plain HAVING
    "s_heavy_hitters" -> { (s, d) =>
      heavyHitters(s, t(s, d, "lineitem"), "l_partkey", minCount = 35)
        .withColumnRenamed("l_partkey", "key")
    },
    // deterministic KMV sketch of distinct l_orderkey — the estimate
    // itself is oracle-checked (see kmvDistinct scaladoc)
    "s_kmv_distinct" -> { (s, d) =>
      kmvDistinct(t(s, d, "lineitem"), "l_orderkey")
    },
    // KMV union/intersection/Jaccard of two order-key subsets — the
    // estimator chain is deterministic, so oracle-checked bit-for-bit
    "s_kmv_intersect" -> { (s, d) =>
      kmvIntersect(
        t(s, d, "lineitem").filter(col("l_quantity") > 25), "l_orderkey",
        t(s, d, "orders").filter(col("o_totalprice") > 150000), "o_orderkey")
    },
    // revenue by supplier for one nation's suppliers: the bloom prunes
    // lineitem ahead of the join shuffle; oracle = the plain join
    "s_bloom_join" -> { (s, d) =>
      val dim = t(s, d, "supplier")
        .join(t(s, d, "nation").filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      bloomJoin(s, t(s, d, "lineitem"), dim, "l_suppkey", "s_suppkey")
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
    }
  )

  def oracle: Map[String, String] = Map(
    "s_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5('kmv-' ||
        |    CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |k AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |a AS (SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS n FROM k)
        |SELECT n AS n_used,
        |  CAST(floor((CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE 255.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END)
        |    * 1000000.0 + 0.5) AS BIGINT) AS est_micro
        |FROM a""".stripMargin,

    "s_kmv_intersect" ->
      """WITH ha AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5('kmv-' ||
        |    CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem WHERE l_quantity > 25 AND l_orderkey IS NOT NULL),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |hb AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5('kmv-' ||
        |    CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM orders WHERE o_totalprice > 150000 AND o_orderkey IS NOT NULL),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |kc AS (SELECT DISTINCT h FROM
        |  (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |  ORDER BY h LIMIT 256),
        |f AS (
        |  SELECT kc.h,
        |    (ka.h IS NOT NULL AND kb.h IS NOT NULL) AS both_in
        |  FROM kc
        |  LEFT JOIN ka ON ka.h = kc.h
        |  LEFT JOIN kb ON kb.h = kc.h),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, max(h) AS hk,
        |    CAST(sum(CASE WHEN both_in THEN 1 ELSE 0 END) AS BIGINT) AS rho
        |  FROM f)
        |SELECT n AS n_used, rho,
        |  CAST(floor((CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |    ELSE 255.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END)
        |    * 1000000.0 + 0.5) AS BIGINT) AS union_micro,
        |  CAST(floor((CAST(rho AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro,
        |  CAST(floor((CAST(rho AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |       ELSE 255.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END)
        |    * 1000000.0 + 0.5) AS BIGINT) AS inter_micro
        |FROM a""".stripMargin,

    "s_heavy_hitters" ->
      """SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 35""".stripMargin,

    "s_bloom_join" ->
      """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY s_suppkey, s_name""".stripMargin
  )
}
