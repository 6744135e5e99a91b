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

  /** The events table's `ts` column has shipped in two parquet
    * encodings across fixture generations: TIMESTAMP(NANOS) (which the
    * vectorized reader only accepts as raw longs via
    * legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark 4 infers as TIMESTAMP_NTZ).
    * Branch on the schema the read actually resolved — assuming one
    * encoding broke every events query when the fixture switched.
    * Downstream always sees microsecond TimestampType; the session
    * timezone is UTC everywhere (build.sbt javaOptions + the
    * Verify/Bench builders), so the NTZ→TZ cast preserves the stored
    * wall-clock values bit-for-bit.
    *
    * KNOWN TRADE: the conf flip is session-wide and deliberately NOT
    * restored — nanosAsLong is consulted at physical-planning time (an
    * action on this lazy frame), so a save/restore around the read would
    * race the plan; there is no per-read option for it. Other
    * TIMESTAMP(NANOS) parquet in the same session will also surface as
    * LongType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType          => // nanos surfaced as raw longs
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType  => // micros, not UTC-adjusted
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType     => raw
      case other => throw new IllegalStateException(
        s"events.ts resolved to unsupported type $other")
    }
  }
}
