package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering on
  * write, so that parquet file/row-group min-max statistics prune reads
  * that filter on ANY of the clustered columns — the standard
  * data-skipping layout for 100 TB fact tables where no single sort
  * column serves every query.
  *
  * A plain sort on (a, b) gives tight `a` ranges per file but each file
  * spans all of `b`; interleaving the bits of the two columns' quantile
  * ranks makes every file a small box in (a, b) space, so a range filter
  * on either column overlaps few boxes. Results are layout-independent —
  * the DuckDB oracle runs the same filter on the original table.
  */
object Layout {

  /** Per-column rank bucket (0..nBuckets-1) from approxQuantile cut
    * points. Rank-based (not uniform-width) bucketing keeps the z-curve
    * balanced under skew — each bucket holds ~1/nBuckets of the rows no
    * matter the value distribution. The cut points come from a mergeable
    * quantile sketch (one treeAggregate over the column), and the bucket
    * assignment is a map-side count over a 255-element literal array.
    */
  private def rankBucket(df: DataFrame, c: String, nBuckets: Int): Column = {
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts = df.stat.approxQuantile(c, probs, 0.001)
    val arr = array(cuts.toSeq.map(lit): _*)
    size(filter(arr, x => x <= col(c).cast("double"))).cast("int")
  }

  /** Interleave the low `bits` bits of a and b: z = ...b1 a1 b0 a0. */
  private def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i)
      val bi = shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_.bitwiseOR(_))

  /** Write `df` parquet at `path`, Z-ordered on two numeric columns.
    *
    * Scale shape: two sketch passes for cut points (no sort), one range
    * exchange on the z-value (`repartitionByRange` samples z, so files
    * are contiguous z-runs ≈ equal row counts), and an in-partition
    * sort. No global sort, no driver data; 100 TB writes as one shuffle.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
                  numFiles: Int = 16, bits: Int = 8): Unit =
    zorderFrame(df, colA, colB, numFiles, bits)
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** The staged pre-write frame (z computed, range-exchanged, sorted
    * within partitions) — exposed so plan tests can assert the shape:
    * one range exchange, no global sort.
    */
  def zorderFrame(df: DataFrame, colA: String, colB: String,
                  numFiles: Int = 16, bits: Int = 8): DataFrame = {
    val z = interleave(rankBucket(df, colA, 1 << bits),
      rankBucket(df, colB, 1 << bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
  }

  /** Per-file (min, max) boxes of the two clustered columns — the stats
    * a pruning reader consults. Used by specs to assert that a 2-D range
    * predicate overlaps few files after [[zorderWrite]].
    */
  def fileBoxes(spark: SparkSession, path: String,
                colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
        min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))

  /** The oracle-checked read-back: z-order a copy of lineitem on
    * (l_extendedprice, l_quantity), then run a 2-D range filter over the
    * clustered copy. Output equals the same filter on the original table
    * — the layout only changes WHICH FILES the scan touches.
    */
  def zorderQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val path = "/tmp/graft_zorder/lineitem"
    zorderWrite(li, "l_extendedprice", "l_quantity", path)
    spark.read.parquet(path)
      .filter(col("l_extendedprice").between(20000, 30000) &&
        col("l_quantity").between(10, 20))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"))
  }

  /** Hilbert-curve variant of [[zorderFrame]]: same two sketch passes
    * and single range exchange, but the clustering key is the Hilbert
    * index ([[graft.functions.HilbertIndexExpr]], a compiled Catalyst
    * expression) instead of the Morton interleave. The Hilbert curve
    * has no power-of-two "seams" — consecutive curve positions are
    * always 4-adjacent cells — so per-file boxes are tighter and a 2-D
    * range predicate overlaps fewer files (the spec quantifies this
    * against the Z-order boxes on the same data).
    */
  def hilbertFrame(df: DataFrame, colA: String, colB: String,
                   numFiles: Int = 16, bits: Int = 8): DataFrame = {
    val h = graft.functions.HilbertIndexExpr.hilbertc(
      rankBucket(df, colA, 1 << bits), rankBucket(df, colB, 1 << bits), bits)
    df.withColumn("_h", h)
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions(col("_h"))
  }

  def hilbertWrite(df: DataFrame, colA: String, colB: String, path: String,
                   numFiles: Int = 16, bits: Int = 8): Unit =
    hilbertFrame(df, colA, colB, numFiles, bits)
      .drop("_h")
      .write.mode("overwrite").parquet(path)

  /** Oracle-checked read-back of [[hilbertWrite]] (the p_zorder shape on
    * a different 2-D band): results are layout-independent, only the
    * set of files the scan touches changes.
    */
  def hilbertQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val path = "/tmp/graft_hilbert/lineitem"
    hilbertWrite(li, "l_extendedprice", "l_quantity", path)
    spark.read.parquet(path)
      .filter(col("l_extendedprice").between(40000, 55000) &&
        col("l_quantity").between(30, 45))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_zorder" -> { (s, d) => zorderQuery(s, d) },
    "p_hilbert" -> { (s, d) => hilbertQuery(s, d) }
  )

  def oracle: Map[String, String] = Map(
    "p_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_extendedprice BETWEEN 20000 AND 30000
        |  AND l_quantity BETWEEN 10 AND 20""".stripMargin,
    "p_hilbert" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_extendedprice BETWEEN 40000 AND 55000
        |  AND l_quantity BETWEEN 30 AND 45""".stripMargin
  )
}
