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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact output (the CMS gate only prunes): oracle = plain HAVING
    "s_heavy_hitters" -> { (s, d) =>
      heavyHitters(s, t(s, d, "lineitem"), "l_partkey", minCount = 35)
        .withColumnRenamed("l_partkey", "key")
    }
  )

  def oracle: Map[String, String] = Map(
    "s_heavy_hitters" ->
      """SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 35""".stripMargin
  )
}
