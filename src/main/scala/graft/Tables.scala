package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects. Read them as raw nanos
    * (legacy.parquet.nanosAsLong) and truncate to microsecond
    * TimestampType — all downstream uses truncate to >= second anyway.
    *
    * KNOWN TRADE: the conf flip is session-wide and deliberately NOT
    * restored — nanosAsLong is consulted at physical-planning time (an
    * action on this lazy frame), so a save/restore around the read would
    * race the plan; there is no per-read option for it. Other
    * TIMESTAMP(NANOS) parquet in the same session will also surface as
    * LongType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
}
