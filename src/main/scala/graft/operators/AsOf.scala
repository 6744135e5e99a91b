package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (backward) join: for every left row, the latest right value
  * with `right.time <= left.time` within the same key — the
  * quotes-to-trades / attach-last-state operator Spark has no built-in
  * for.
  *
  * Implementation: NOT an inequality join (which Spark plans as a
  * broadcast-nested-loop or a range-condition SMJ over every candidate
  * pair). Instead the two sides are tagged and unioned, and one window
  * pass per key propagates the last non-null right value forward:
  * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
  * isLeft ROWS UNBOUNDED PRECEDING)`. Right rows sort before left rows
  * at equal times, so `<=` semantics hold. One shuffle on `key`, linear
  * scan per partition — at 100 TB this is the only shape that survives
  * (pair enumeration is quadratic in the worst key).
  *
  * Determinism: callers must ensure at most one right row per
  * (key, time) — [[asofQuery]] pre-aggregates with max — otherwise the
  * winner among equal-time right rows is partition-order-dependent.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               value: String): DataFrame = {
    val rightVal = s"_r_$value"
    val lp = left.withColumn("_is_left", lit(1))
    val rp = right.select(col(key), col(time), col(value).as(rightVal))
      .withColumn("_is_left", lit(0))
    val u = lp.unionByName(rp, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Propagate a struct marking right-row PRESENCE, not value
    // non-nullness: a right row whose value is NULL must still win the
    // as-of match (and yield NULL), exactly as DuckDB ASOF JOIN does —
    // `last(value, ignoreNulls)` would instead skip it and leak an older
    // non-null value forward.
    u.withColumn("_r_state",
        last(when(col("_is_left") === 0, struct(col(rightVal))),
          ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .withColumn(s"asof_$value", col("_r_state")(rightVal))
      .drop("_is_left", rightVal, "_r_state")
  }

  /** Range (interval-containment) join: all (point, interval) pairs with
    * `start <= point.time <= end` per key. Spark would plan the raw
    * inequality as a broadcast-nested-loop; instead time is bucketized
    * (width ≥ typical interval length), intervals explode into the few
    * buckets they cover, and the join is an EQUI-join on (key, bucket)
    * with exact containment as a residual filter — shuffle on hashable
    * keys, no pair enumeration. Multi-bucket intervals can duplicate a
    * pair pre-filter only if a pair matches in two buckets, which
    * containment precludes (a point lives in exactly one bucket).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                time: String, start: String, end: String,
                bucketSeconds: Long): DataFrame = {
    val pb = points.withColumn("_bucket",
      floor(col(time).cast("long") / bucketSeconds))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(floor(col(start).cast("long") / bucketSeconds),
        floor(col(end).cast("long") / bucketSeconds))))
    pb.join(ib, Seq(key, "_bucket"))
      .filter(col(time) >= col(start) && col(time) <= col(end))
      .drop("_bucket")
  }

  // --------------------------------------------------------------- queries

  /** clicks ASOF LEFT JOIN purchases per user: each click carries the
    * value of the user's latest purchase at-or-before it.
    */
  private def asofQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("tss"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("tss"))
      .agg(max(col("value")).as("pv")) // unique per (key, time) → deterministic
      .select(col("user_id"), col("tss"), col("pv"))
    asofJoin(clicks, purchases, "user_id", "tss", "pv")
      .select(col("user_id"), col("event_id"), col("tss"),
        col("value"), col("asof_pv"))
  }

  /** clicks within the 2-hour attribution window after any purchase
    * by the same user (all matching pairs — range-join semantics).
    */
  private def rangeQuery(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("tss"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tss").as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 7200 SECONDS"))
    rangeJoin(clicks, windows, "user_id", "tss", "w_start", "w_end", 7200L)
      .select(col("user_id"), col("event_id"), col("tss"), col("w_start"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof" -> asofQuery,
    "q22_range_join" -> rangeQuery
  )

  /** DuckDB's native ASOF JOIN is the oracle — our windowed
    * re-expression must reproduce it row-for-row.
    */
  def oracle: Map[String, String] = Map(
    "q21_asof" ->
      """WITH c AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS tss, value
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, date_trunc('second', ts) AS tss, max(value) AS pv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.tss, c.value, p.pv AS asof_pv
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND p.tss <= c.tss""".stripMargin,

    // plain inequality join in DuckDB (it plans an IEJoin natively) —
    // our bucketized equi-join must produce exactly these pairs
    "q22_range_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS tss
        |  FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT DISTINCT user_id, date_trunc('second', ts) AS w_start,
        |    date_trunc('second', ts) + INTERVAL 7200 SECONDS AS w_end
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id, c.tss, w.w_start
        |FROM c JOIN w ON c.user_id = w.user_id
        |  AND c.tss >= w.w_start AND c.tss <= w.w_end""".stripMargin
  )
}
