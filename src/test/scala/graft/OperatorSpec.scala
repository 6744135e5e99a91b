package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Operator-level sanity checks that the DuckDB gate can't express:
  * sketch accuracy and streaming dedup.
  */
class OperatorSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"

  test("simhashPairs: band bucketing finds EXACTLY the brute-force Hamming<=3 pairs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents").limit(120)
    val got = operators.Dedup.simhashPairs(docs, maxHamming = 3)
      .select("a_id", "b_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over all pairs of the same signatures
    val sigs = operators.Dedup.simhashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === want)
  }

  test("bloomGate == plain exact anti-join, and bloom routes novel docs past it") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 === 1)
    val got = operators.Dedup.bloomGate(spark, corpus, delta)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val want = delta.withColumn("fp", fp)
      .join(corpus.select(fp.as("fp")), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // routing: a fingerprint absent from the corpus is (almost surely at
    // fpp=0.01) rejected by the bloom — the short-circuit path is live
    val bf = corpus.select(fp.as("fp")).stat.bloomFilter("fp", 100000L, 0.01)
    val novelFps = delta.withColumn("fp", fp)
      .join(corpus.select(fp.as("fp")), Seq("fp"), "left_anti")
      .select("fp").collect().map(_.getString(0))
    assert(novelFps.count(!bf.mightContain(_)) > novelFps.length / 2,
      "bloom prefilter rejects almost no novel docs — short-circuit path dead")
  }

  test("sourceCap bounds every source at the cap; stratifiedSample takes exact per-lang counts") {
    val docs = Tables.t(spark, sf, "documents")
    val capped = operators.Pipeline.sourceCap(docs, cap = 7)
      .groupBy("source").count().collect()
    assert(capped.forall(_.getLong(1) <= 7L))
    assert(capped.exists(_.getLong(1) == 7L), "cap never binding — test data too small")
    val sampled = operators.Pipeline.stratifiedSample(docs, perStratum = 9)
    val got = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.min(9L, r.getLong(1))).toMap
    assert(got === want)
    // determinism: same seed → identical doc set
    val again = operators.Pipeline.stratifiedSample(docs, perStratum = 9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("minhashLshPairs hot-band cap drops oversized buckets, keeps the rest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 300 identical docs (one mass-hot band bucket) + 2 distinct near-dups
    val hot = (0 until 300).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val pair = Seq(
      (1000L, "completely different text about distributed query engines at scale"),
      (1001L, "completely different text about distributed query engines at large scale"))
    val docs = (hot ++ pair).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val unCapped = operators.Dedup.minhashLshPairs(docs).count()
    assert(unCapped >= 300L * 299 / 2, s"expected the hot all-pairs, got $unCapped")
    val capped = operators.Dedup.minhashLshPairs(docs, maxBandBucket = 50L)
    val rows = capped.collect()
    // hot-bucket pairs gone, the small near-dup pair survives
    assert(rows.exists(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L),
      s"near-dup pair lost by the cap: ${rows.mkString(";")}")
    assert(!rows.exists(_.getLong(0) < 300L), "hot bucket not dropped")
  }

  test("ColumnarChunkReader realigns groups that batch on different boundaries") {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.vectorized.ColumnarBatch
    import graft.sources.graphar.{ChunkIO, ColumnarChunkReader}
    // group A: 100 rows in batches of 7; group B: same rows in batches of 13
    def fakeReader(batchSize: Int, field: String): (ChunkIO.BatchReader, StructType) = {
      val sch = StructType(Seq(StructField(field, LongType, nullable = false)))
      val r = new ChunkIO.BatchReader {
        private var next = 0L
        private var b: ColumnarBatch = _
        override def nextBatch(): Boolean = {
          if (next >= 100) return false
          val n = math.min(batchSize.toLong, 100 - next).toInt
          val v = new OnHeapColumnVector(n, LongType)
          (0 until n).foreach(i => v.putLong(i, (next + i) * (if (field == "a") 1 else 10)))
          b = new ColumnarBatch(Array(v), n)
          next += n
          true
        }
        override def batch(): ColumnarBatch = b
        override def close(): Unit = ()
      }
      (r, sch)
    }
    val required = StructType(Seq(
      StructField("_graphArVertexIndex", LongType, nullable = false),
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    val reader = new ColumnarChunkReader(
      () => Seq(fakeReader(7, "a"), fakeReader(13, "b")),
      required, _ => 1000L, totalRows = 100)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    while (reader.next()) {
      val batch = reader.get()
      (0 until batch.numRows).foreach { i =>
        rows += ((batch.column(0).getLong(i), batch.column(1).getLong(i),
          batch.column(2).getLong(i)))
      }
    }
    reader.close()
    assert(rows.size === 100)
    assert(rows.zipWithIndex.forall { case ((idx, a, b), i) =>
      idx == 1000L + i && a == i.toLong && b == i * 10L
    }, s"misaligned zip: ${rows.take(20)}")
  }

  test("minhash kernel matches declarative spec on whitespace edge cases") {
    import spark.implicits._
    import graft.functions.{MinHashSigExpr, TextFunctions}
    // trailing \n survives the space-only trim → Spark split keeps a
    // trailing empty token; the kernel must tokenize identically
    val docs = Seq(
      "alpha beta gamma delta",
      "alpha beta gamma delta\n",      // trailing non-space whitespace
      "\talpha beta gamma",            // leading non-space whitespace
      "  alpha beta gamma  ",          // space-trimmed clean
      "a  b\t\tc d").toDF("text")
    val toks = TextFunctions.tokens(col("text"))
    val spec = when(size(toks) >= 3,
      TextFunctions.minhashSignature(
        array_distinct(TextFunctions.shingles(toks, 3)), 8))
    val diff = docs.select(
        MinHashSigExpr.minhashSig(col("text")).as("kernel"), spec.as("spec"))
      .filter(col("kernel").cast("string") =!= col("spec").cast("string") ||
        col("kernel").isNull =!= col("spec").isNull)
    assert(diff.count() === 0, diff.collect().mkString(";"))
  }

  test("compiled dot/cosine expressions match the HOF spec bit-for-bit") {
    val emb = Tables.t(spark, sf, "embeddings").limit(200)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.join(b, col("a_id") % 17 === col("b_id") % 17 && col("a_id") < col("b_id"))
    val diff = pairs.select(
      operators.Similarity.dot(col("a_emb"), col("b_emb")).as("dc"),
      operators.Similarity.dotSpec(col("a_emb"), col("b_emb")).as("ds"),
      operators.Similarity.cosine(col("a_emb"), col("b_emb")).as("cc"),
      operators.Similarity.cosineSpec(col("a_emb"), col("b_emb")).as("cs"))
      .filter(col("dc") =!= col("ds") || col("cc") =!= col("cs"))
    assert(diff.count() === 0, "compiled kernel diverged from HOF spec")
    // null parity: length mismatch and null input both yield null
    import spark.implicits._
    val odd = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("x", "y")
      .select(operators.Similarity.dot(col("x"), col("y")).as("d"),
        operators.Similarity.dotSpec(col("x"), col("y")).as("s"))
      .collect()(0)
    assert(odd.isNullAt(0) && odd.isNullAt(1))
  }

  test("sketches: approx_percentile within 1% rank error, count_min never undercounts") {
    val li = Tables.t(spark, sf, "lineitem")
    // approx_percentile vs exact percentile on a continuous column
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx")).collect()(0)
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // rank guarantee: the approx median's true rank is within accuracy⁻¹
    val n = li.count()
    val rankOfApprox = li.filter(col("l_extendedprice") <= approx).count()
    assert(math.abs(rankOfApprox.toDouble / n - 0.5) < 0.01,
      s"approx median $approx at rank ${rankOfApprox.toDouble / n} (exact $exact)")
    // count-min sketch: point estimates can only OVERcount
    val cms = li.select(expr(
      "count_min_sketch(l_returnflag, 0.001d, 0.99d, 1)").as("s")).collect()(0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cms.getAs[Array[Byte]](0)))
    val exactCounts = li.groupBy("l_returnflag").count().collect()
      .map(row => row.getString(0) -> row.getLong(1))
    exactCounts.foreach { case (k, c) =>
      // the agg adds string values as UTF-8 bytes → query the same way
      val est = sketch.estimateCount(k.getBytes("UTF-8"))
      assert(est >= c && est <= (c * 1.01).toLong + 10,
        s"count-min for '$k': est $est vs exact $c")
    }
  }

  test("approx_count_distinct (HLL) within 5% of exact") {
    val li = Tables.t(spark, sf, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("stream-static enrichment joins dimension attributes onto the stream") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.take(100)
    val dim = spark.createDataFrame(
      events.map(_.user_id).distinct.map(u => (u, s"segment_${u % 3}")))
      .toDF("user_id", "segment")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.enrich(stream.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val out = spark.table("enrich_out")
      assert(out.count() === events.length)
      assert(out.filter(col("segment").isNull).count() === 0)
      assert(out.filter(col("user_id") % 3 =!= 0 ||
        col("segment") === "segment_0").count() === events.length)
    } finally q.stop()
  }

  test("streaming decontamination drops exactly the batch operator's flagged docs") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val docsDf = docs.toDF("doc_id", "text")
    // the batch operator's benchmark slice and its flagged doc set
    val benchGrams = docsDf.filter(col("doc_id") % 50 === 0)
      .select(explode(array_distinct(shingles(tokens(col("text")), 4))).as("g"))
      .distinct()
    val flagged = operators.Pipeline.decontaminate(docsDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "fixture should contain contaminated docs")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val training = docs.filter { case (id, _) => id % 50 != 0 }
    val q = EventStreams.decontaminateStream(
        stream.toDF().toDF("doc_id", "text"), benchGrams)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      stream.addData(training)
      q.processAllAvailable()
      val kept = spark.table("decon_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === training.map(_._1).toSet -- flagged,
        "stream must keep exactly the batch operator's clean set")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    import spark.implicits._
    import graft.streaming.EventStreams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // (user, event_id, ts): purchases at 0 and 5000s; clicks around them
    val clicks = Seq((1L, 10L, ts(100)), (1L, 11L, ts(7300)), (1L, 12L, ts(7150)),
      (2L, 20L, ts(100)), (1L, 13L, ts(4999)))
    val purchases = Seq((1L, ts(0)), (1L, ts(5000)), (3L, ts(0)))
    val cStream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pStream = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStreams.attributionJoin(
      cStream.toDF().toDF("user_id", "event_id", "ts"),
      pStream.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      cStream.addData(clicks)
      pStream.addData(purchases)
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("click_id", "purchase_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      // batch twin over the same rows
      val want = operators.AsOf.rangeJoin(
        clicks.toDF("user_id", "click_id", "tss"),
        purchases.toDF("user_id", "w_start")
          .withColumn("w_end", col("w_start") + expr("INTERVAL 7200 SECONDS")),
        "user_id", "tss", "w_start", "w_end", 7200L)
        .select("click_id", "w_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(got === want, s"stream $got vs batch $want")
      assert(got.nonEmpty && got.contains((13L, ts(0))) && !got.contains((11L, ts(0))))
    } finally q.stop()
  }

  test("streaming GraphAr sink: versioned snapshots, atomic LATEST, prune") {
    import spark.implicits._
    import graft.streaming.GraphArSink
    val base = java.nio.file.Files.createTempDirectory("gar_sink").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    // complete-mode running edge aggregate: (src, dst) pairs seen so far
    val agg = stream.toDF().toDF("s", "d")
      .groupBy(col("s").as("src"), col("d").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
    val q = GraphArSink.edges(agg, base, "Snap", "U", "knows", "U",
      vertexCount = 100, chunkSize = 4, vertexChunkSize = 16).start()
    try {
      stream.addData((1L, 2L), (1L, 3L))
      q.processAllAvailable()
      val y1 = GraphArSink.latestYaml(spark, base)
      assert(y1 != null && spark.read.format("graphar").option("path", y1)
        .option("src", "U").option("type", "knows").option("dst", "U")
        .load().count() === 2)
      stream.addData((4L, 5L), (1L, 2L)) // dup edge → weight 2, not a new row
      q.processAllAvailable()
      val y2 = GraphArSink.latestYaml(spark, base)
      assert(y2 != y1, "LATEST should advance to the new snapshot")
      val snap2 = spark.read.format("graphar").option("path", y2)
        .option("src", "U").option("type", "knows").option("dst", "U").load()
      assert(snap2.count() === 3)
      assert(snap2.filter(col("_graphArSrcIndex") === 1L && col("_graphArDstIndex") === 2L)
        .select("w").collect()(0).getDouble(0) === 2.0)
      // time travel: versions list, read-by-version, read-latest-by-base
      assert(GraphArSink.versions(spark, base) === Seq(0L, 1L))
      val snap0 = spark.read.format("graphar")
        .option("snapshotBase", base).option("snapshot", "0")
        .option("src", "U").option("type", "knows").option("dst", "U").load()
      assert(snap0.count() === 2, "snapshot 0 must still show the pre-batch-1 graph")
      val snapLatest = spark.read.format("graphar")
        .option("snapshotBase", base)
        .option("src", "U").option("type", "knows").option("dst", "U").load()
      assert(snapLatest.count() === 3)
      val badVersion = intercept[IllegalArgumentException] {
        spark.read.format("graphar")
          .option("snapshotBase", base).option("snapshot", "7")
          .option("src", "U").option("type", "knows").option("dst", "U").load()
      }
      assert(badVersion.getMessage.contains("committed versions: [0, 1]"))
      // prune keeps the latest snapshot readable
      GraphArSink.prune(spark, base, keep = 1)
      assert(spark.read.format("graphar").option("path", GraphArSink.latestYaml(spark, base))
        .option("src", "U").option("type", "knows").option("dst", "U")
        .load().count() === 3)
      assert(!new java.io.File(new java.io.File(y1).getParent).exists,
        "pruned snapshot v0 should be gone")
      assert(GraphArSink.versions(spark, base) === Seq(1L),
        "pruned version must drop out of the committed list")
    } finally q.stop()
  }

  test("streaming vertex snapshots: deterministic index order, time travel") {
    import spark.implicits._
    import graft.streaming.GraphArSink
    val base = java.nio.file.Files.createTempDirectory("gar_vsink").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val agg = stream.toDF().toDF("uid", "s")
      .groupBy(col("uid")).agg(max(col("s")).as("best"))
    val q = GraphArSink.vertices(agg, base, "VSnap", "U", orderCol = "uid",
      chunkSize = 4).start()
    try {
      stream.addData((3L, 1.0), (1L, 2.0))
      q.processAllAvailable()
      stream.addData((2L, 5.0), (3L, 9.0))
      q.processAllAvailable()
      assert(GraphArSink.versions(spark, base) === Seq(0L, 1L))
      val latest = spark.read.format("graphar")
        .option("snapshotBase", base).option("type", "U").load()
        .orderBy("_graphArVertexIndex")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // index follows uid order deterministically; max-aggregate applied
      assert(latest.toSeq === Seq((0L, 1L, 2.0), (1L, 2L, 5.0), (2L, 3L, 9.0)))
      val v0 = spark.read.format("graphar")
        .option("snapshotBase", base).option("snapshot", "0")
        .option("type", "U").load().count()
      assert(v0 === 2)
    } finally q.stop()
  }

  test("streaming signature near-dedup keeps first arrival per MinHash signature") {
    import spark.implicits._
    import graft.streaming.EventStreams
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def t(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = EventStreams.signatureDedupStream(
      stream.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("sigdedup_out")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, t(0), "the quick brown fox jumps over the lazy dog today"),
        (2L, t(1), "the  quick   brown fox jumps over the lazy dog today"), // same tokens
        (3L, t(2), "a completely different document about spark engines"),
        (4L, t(3), "the quick brown fox jumps over the lazy dog today"), // exact dup
        (5L, t(4), "short"), // < n tokens → raw-text key
        (6L, t(5), "short"), // exact short dup
        (7L, t(6), "tiny"))
      q.processAllAvailable()
      val ids = spark.table("sigdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // 2 and 4 collapse into 1's signature; 6 collapses into 5's raw key
      assert(ids === Set(1L, 3L, 5L, 7L), s"got $ids")
      // batch twin: the same signature key yields the same groups
      val batchKeys = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "the  quick   brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text")
        .select(functions.MinHashSigExpr.minhashSig(col("text")).cast("string").as("k"))
        .collect().map(_.getString(0)).toSet
      assert(batchKeys.size === 1, "whitespace variants must share one signature")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids, keeps the rest") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    // duplicate every event once (same ids → must be dropped)
    val withDups = events ++ events.take(500)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(withDups)
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0))
      assert(ids.length === events.length) // one row per distinct id
      assert(ids.toSet === events.map(_.event_id).toSet)
    } finally q.stop()
  }

  test("streaming PII scrub matches the batch redaction row-for-row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.co from 10.0.0.1"),
      (2L, "call 415-555-0042 twice 415-555-0042"),
      (3L, "clean text")).toDF("doc_id", "text")
    val want = operators.TextAnalysis.piiRedact(docs, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(_.toSeq).toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.piiScrubStream(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, "mail a@b.co from 10.0.0.1"),
        (2L, "call 415-555-0042 twice 415-555-0042"), (3L, "clean text")))
      q.processAllAvailable()
      val got = spark.table("pii_out")
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
        .collect().map(_.toSeq).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("classifierScore: integer weight sums match a driver-side fold") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val got = operators.TextAnalysis.classifierScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mod = graft.functions.TextFunctions.HashMod
    def chash(s: String, seed: Long): Long =
      s.codePoints.toArray.foldLeft(seed)((acc, c) => (acc * 31 + c) % mod)
    for ((id, text) <- docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))) {
      val toks = text.trim.toLowerCase.split("\\s+")
      val scoreInt = toks.map(t => chash(t, 13) % 2001 - 1000).sum
      assert(got(id) === ((toks.length.toLong, scoreInt)), s"doc $id")
    }
  }

  test("incrementalNearDups finds exactly the cross-side subset of the self-join pairs") {
    val docs = Tables.t(spark, sf, "documents")
    val all = operators.Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val wantCross = all.filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    assert(wantCross.nonEmpty, "fixture should contain cross-parity near-dups")
    val got = operators.Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (d, c, j) => (math.min(d, c), math.max(d, c), j) }.toSet
    assert(got === wantCross)
  }

  test("substringDupCounts matches a brute-force token-window census") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val got = operators.Dedup.substringDupCounts(docs, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val windows = raw.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      id -> toks.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val counts = windows.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val want = windows.map { case (id, ws) =>
      (id, ws.size.toLong, ws.count(w => counts(w) >= 2).toLong)
    }.toSet
    assert(got === want)
  }

  test("piiRedact counts and redacts emails, ips, phones") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at a.b%c@mail-host.org or x@y.io from 192.168.0.1"),
      (2L, "call 415-555-0042 or 212-555-9999; bad ip 999.999 stays"),
      (3L, "no pii here at all")).toDF("id", "text")
    val out = operators.TextAnalysis.piiRedact(df, "text")
      .select("id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) === ((2, 1, 0, "reach me at <EMAIL> or <EMAIL> from <IP>")))
    assert(out(2L) === ((0, 0, 2, "call <PHONE> or <PHONE>; bad ip 999.999 stays")))
    assert(out(3L) === ((0, 0, 0, "no pii here at all")))
  }

  test("clusteringCoefficients matches hand-computed values on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every vertex lcc=1) + a path 4-5-6 (5 has deg 2,
    // no triangle → 0; 6 deg 1 → 0); duplicate + reverse edges collapse
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 5L), (4L, 5L)).toDF("src", "dst")
    val res = graph.GraphOps.clusteringCoefficients(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(res(1L) === ((3L, 3L, 1.0)))
    assert(res(2L) === ((3L, 3L, 1.0)))
    assert(res(3L) === ((3L, 3L, 1.0)))
    assert(res(4L) === ((4L, 3L, 0.5)))  // neighbors {1,2,3,5}: 3 of 6 pairs linked
    assert(res(5L) === ((2L, 0L, 0.0)))
    assert(res(6L) === ((1L, 0L, 0.0)))
  }

  test("profile counts nulls, distincts, and extrema per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1.5), Some("a")), (Some(2.5), None), (None, Some("b")),
      (Some(2.5), Some("a"))).toDF("x", "s")
    val rows = operators.Relational.profile(df, Seq("x"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert((x.getLong(1), x.getLong(2), x.getLong(3)) === ((4L, 1L, 2L)))
    assert((x.getDouble(4), x.getDouble(5)) === ((1.5, 2.5)))
    assert(x.isNullAt(6) && x.isNullAt(7))
    val sRow = rows("s")
    assert((sRow.getLong(1), sRow.getLong(2), sRow.getLong(3)) === ((4L, 1L, 2L)))
    assert(sRow.isNullAt(4) && sRow.isNullAt(5))
    assert((sRow.getString(6), sRow.getString(7)) === (("a", "b")))
  }

  test("events loader: ts is TimestampType and every events-backed query executes") {
    // Regression for round 5: the fixture's ts encoding switched from
    // TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and the loader's
    // nanos-as-long assumption silently failed ALL events queries out of
    // the correctness suite. The loader now branches on the resolved
    // schema; this pins the contract for any future encoding change.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
    val eventsBacked = Seq(
      "q11_events_window", "q12_sessionize", "q13_json", "q18_pivot",
      "q25_funnel", "q26_retention", "q21_asof", "q22_range_join")
    for (q <- eventsBacked) {
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$q returned no rows")
    }
  }
}
