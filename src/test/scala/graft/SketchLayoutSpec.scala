package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Pipeline, Sketches}

/** Contracts the DuckDB gate can't express: sketch error bounds,
  * mergeability, and the file-pruning effect of the Z-order layout.
  */
class SketchLayoutSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"

  test("heavyHitters == plain HAVING, even with a collision-prone sketch") {
    val li = Tables.t(spark, sf, "lineitem")
    def exact(minCount: Long) = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= minCount)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (eps <- Seq(0.0001, 0.05)) { // 0.05 → tiny sketch, many collisions
      val got = Sketches.heavyHitters(spark, li, "l_partkey", 35, eps)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === exact(35), s"eps=$eps")
    }
  }

  test("HLL: direct estimate within 5% of exact; union of parts tracks direct") {
    val docs = Tables.t(spark, sf, "documents")
    val exact = docs.select(countDistinct(col("text"))).head.getLong(0)
    val direct = Sketches.directEstimate(docs, "text").head.getLong(0)
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"direct=$direct exact=$exact")
    // persist-then-union: per-source sketches, merged later
    val parts = Sketches.distinctSketches(docs, "source", "text")
    val merged = Sketches.unionEstimate(parts).head.getLong(0)
    assert(math.abs(merged - direct).toDouble / math.max(direct, 1) < 0.05,
      s"merged=$merged direct=$direct")
    // sketches are small enough to persist: a few KB each
    val maxBytes = parts.select(max(length(col("sketch")))).head.getInt(0)
    assert(maxBytes < 64 * 1024, s"sketch too big to persist: $maxBytes B")
  }

  test("approx_percentile within rank-error bound of exact percentile") {
    val li = Tables.t(spark, sf, "lineitem")
    val n = li.count()
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val accuracy = 10000
    val approx = Sketches.approxQuantiles(li, "l_extendedprice", probs, accuracy)
      .head.getSeq[Double](0)
    val sorted = li.select(col("l_extendedprice").cast("double"))
      .orderBy(col("l_extendedprice")).collect().map(_.getDouble(0))
    for ((p, est) <- probs.zip(approx)) {
      // value must sit within ±n/accuracy ranks of the exact rank
      val slack = math.max(1, n / accuracy).toInt + 1
      val r = (p * (n - 1)).toInt
      val lo = sorted(math.max(0, r - slack))
      val hi = sorted(math.min(sorted.length - 1, r + slack))
      assert(est >= lo && est <= hi, s"p=$p est=$est window=[$lo,$hi]")
    }
  }

  test("zorder: read-back equals source filter AND most files prune on a 2-D box") {
    val li = Tables.t(spark, sf, "lineitem")
    val path = "/tmp/graft_zorder_spec/lineitem"
    Layout.zorderWrite(li, "l_extendedprice", "l_quantity", path, numFiles = 16)
    // correctness: layout must not change query results
    val got = spark.read.parquet(path)
      .filter(col("l_extendedprice").between(20000, 30000) &&
        col("l_quantity").between(10, 20))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = li
      .filter(col("l_extendedprice").between(20000, 30000) &&
        col("l_quantity").between(10, 20))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
    // pruning: each file is a (price, qty) box; count boxes overlapping
    // the predicate box — a stats-pruning reader skips the rest.
    val boxes = Layout.fileBoxes(spark, path, "l_extendedprice", "l_quantity")
      .collect().map(r => (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val hits = boxes.count { case (minA, maxA, minB, maxB) =>
      maxA >= 20000 && minA <= 30000 && maxB >= 10 && minB <= 20 }
    assert(boxes.length >= 12, s"expected ~16 files, got ${boxes.length}")
    assert(hits.toDouble / boxes.length <= 0.5,
      s"z-order pruned too little: $hits/${boxes.length} files overlap")
    // contrast: the SAME data written sorted by orderkey (the natural
    // order) — nearly every file spans the full price range
    val natPath = "/tmp/graft_zorder_spec/natural"
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(natPath)
    val natBoxes = Layout.fileBoxes(spark, natPath, "l_extendedprice", "l_quantity")
      .collect().map(r => (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val natHits = natBoxes.count { case (minA, maxA, minB, maxB) =>
      maxA >= 20000 && minA <= 30000 && maxB >= 10 && minB <= 20 }
    assert(natHits > hits,
      s"z-order ($hits hit files) should beat natural order ($natHits)")
  }

  test("hilbert index: codegen == interpreted, bijective, unit-step curve") {
    import spark.implicits._
    import graft.functions.HilbertIndexExpr
    val bits = 4
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
      HilbertIndexExpr.hilbertc(col("x"), col("y"), bits).as("d"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // whole-stage-codegen result equals the interpreted twin everywhere
    got.foreach { case ((x, y), d) =>
      assert(d === HilbertIndexExpr.xy2d(x, y, bits), s"($x,$y)") }
    // bijection onto [0, 4^bits)
    assert(got.values.toSet === (0L until (n.toLong * n)).toSet)
    // THE Hilbert property: consecutive curve positions are 4-adjacent
    // cells (|dx|+|dy| = 1) — the locality the Z-curve lacks at seams
    val byD = got.map(_.swap)
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1, s"step at d=$d")
    }
  }

  test("hilbert layout: read-back equals source filter; boxes prune like z-order") {
    val li = Tables.t(spark, sf, "lineitem")
    val path = "/tmp/graft_hilbert_spec/lineitem"
    Layout.hilbertWrite(li, "l_extendedprice", "l_quantity", path, numFiles = 16)
    val got = spark.read.parquet(path)
      .filter(col("l_extendedprice").between(40000, 55000) &&
        col("l_quantity").between(30, 45))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = li
      .filter(col("l_extendedprice").between(40000, 55000) &&
        col("l_quantity").between(30, 45))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
    // pruning power over a probe grid, measured against z-order on the
    // SAME data: hilbert's tighter boxes must not be materially worse
    // on average (ties are common at this file count)
    val zPath = "/tmp/graft_hilbert_spec/zorder"
    Layout.zorderWrite(li, "l_extendedprice", "l_quantity", zPath, numFiles = 16)
    def hitCounts(p: String): Seq[Int] = {
      val boxes = Layout.fileBoxes(spark, p, "l_extendedprice", "l_quantity")
        .collect().map(r => (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      assert(boxes.length >= 12)
      for (pa <- Seq(5000.0, 25000.0, 45000.0, 65000.0, 85000.0);
           pb <- Seq(5.0, 20.0, 35.0))
        yield boxes.count { case (minA, maxA, minB, maxB) =>
          maxA >= pa && minA <= pa + 10000 && maxB >= pb && minB <= pb + 10 }
    }
    val h = hitCounts(path).sum
    val z = hitCounts(zPath).sum
    assert(h <= (z * 1.15).toInt + 1,
      s"hilbert pruning ($h box hits) materially worse than z-order ($z)")
  }

  test("weightedSample: deterministic, exactly k per stratum, weight-biased") {
    val docs = Tables.t(spark, sf, "documents")
    val a = Pipeline.weightedSample(docs, k = 25).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = Pipeline.weightedSample(docs, k = 25).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b, "same seed must select the same sample")
    val perLang = a.groupBy(_._2).view.mapValues(_.size).toMap
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- langSizes)
      assert(perLang.getOrElse(lang, 0) === math.min(25L, n).toInt, s"lang=$lang")
    // weight bias: sampled docs should be longer than average on the
    // whole corpus (priority ∝ n_chars)
    val sampledIds = a.map(_._1)
    val avgSampled = docs.filter(col("doc_id").isin(sampledIds.toSeq: _*))
      .agg(avg("n_chars")).head.getDouble(0)
    val avgAll = docs.agg(avg("n_chars")).head.getDouble(0)
    assert(avgSampled > avgAll,
      s"sample avg $avgSampled not above corpus avg $avgAll")
  }
}
