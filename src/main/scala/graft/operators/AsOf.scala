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
    u.withColumn(s"asof_$value",
        last(col(rightVal), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .drop("_is_left", rightVal)
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof" -> asofQuery
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
        |  ON c.user_id = p.user_id AND p.tss <= c.tss""".stripMargin
  )
}
