package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate wiring for the WATERMARK semantics of the streaming
  * twins: a deterministic late + out-of-order feed of the events table
  * whose drop/keep outcome is fully SQL-expressible, so the DuckDB
  * oracle can hash-check what the watermark actually did (the in-order
  * feeds the spec uses never exercise the drop path).
  *
  * INGESTION IS FILE-BACKED: each feed batch is written as one parquet
  * file into a watched directory and consumed by Spark's file streaming
  * source with `maxFilesPerTrigger = 1` — the production ingest path
  * (source listing, schema enforcement, per-file micro-batches),
  * replacing the earlier MemoryStream harness that fed driver-collected
  * rows. Batch construction itself is pure DataFrame arithmetic (no
  * driver collect anywhere): block assignment, late-shift, planted
  * duplicates, and flush rows are all column expressions, and each
  * batch file is one `coalesce(1)` write moved into the watch dir in
  * sequence. Rows are scrambled INSIDE each file (md5 of the row) so
  * within-batch arrival order carries no information.
  *
  * Feed construction (all integer arithmetic, mirrored in the oracle):
  * events are cut into 4 event-time blocks by day quartile; rows with
  * `event_id % 17 == 0` arrive one block LATE (their true block's
  * successor batch). Batches are fed in block order, so a late row
  * meets a watermark of `max(tss of prior batches) − 10 min`:
  * mid-block stragglers are months of event-time late → DROPPED;
  * block-tail stragglers are inside the 10-minute allowance → KEPT and
  * merged into their (still-open) hour window. A final far-future
  * flush event pushes the watermark past every real window so append
  * mode emits them all; its own window stays open and never emits.
  *
  * Sum parity: per-value cast to DECIMAL(18,2) before SUM makes the
  * aggregate order-independent and exact on both engines (streaming
  * state merges in arrival order — a double sum would be
  * accumulation-order-dependent), then one cast to DOUBLE.
  */
object StreamingQueries {

  final case class Ev(event_id: Long, tss: Timestamp, event_type: String,
                      value: Double)

  val LateMod = 17L
  val WatermarkSec = 600L
  val Blocks = 4

  /** Add the day-quartile block column `b` (+ `late` shift, capped at
    * [[Blocks]]) — the same integer arithmetic the oracles replay:
    * day = ⌊epoch/86400⌋, b = ((day−dmin)·Blocks) div (dmax−dmin+1).
    */
  private def withBlocks(ev: DataFrame, tsCol: String,
                         late: Column): DataFrame = {
    val withDay = ev.withColumn("_day",
      expr(s"CAST($tsCol AS BIGINT) div 86400"))
    val bounds = withDay.agg(min(col("_day")).as("_dmin"),
      max(col("_day")).as("_dmax"))
    withDay.crossJoin(broadcast(bounds))
      .withColumn("b",
        least(expr(s"((_day - _dmin) * $Blocks) div (_dmax - _dmin + 1)")
          + late, lit(Blocks.toLong)))
      .drop("_day", "_dmin", "_dmax")
  }

  /** File-replay feed: batches land as sequenced single parquet files
    * in a fresh watched directory; the streaming query reads them
    * through the real file source. `add` writes one batch (scrambled
    * within the file by a row hash) and the caller then drains it with
    * `processAllAvailable()` — one file, one micro-batch.
    */
  private final class Replay(tag: String) {
    val dir = new java.io.File("/tmp/graft_replay/" + tag + "_" +
      java.util.UUID.randomUUID().toString.take(8))
    require(dir.mkdirs(), s"cannot create replay dir $dir")
    private var seq = 0

    def add(df: DataFrame): Unit = {
      val scramble = md5(concat_ws("",
        df.columns.map(c => col(c).cast("string")): _*))
      val stage = new java.io.File(dir, f".stage_$seq%05d")
      df.coalesce(1).sortWithinPartitions(scramble)
        .write.mode("overwrite").parquet(stage.getPath)
      val part = stage.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $stage"))
      val dst = new java.io.File(dir, f"b$seq%05d.parquet")
      require(part.renameTo(dst), s"rename $part -> $dst failed")
      stage.listFiles().foreach(_.delete())
      stage.delete()
      seq += 1
    }

    def source(spark: SparkSession,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getPath)

    def cleanup(): Unit = {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
      dir.delete()
    }
  }

  /** One far-future flush row pushing the watermark past every real
    * window: ts = max(ts) + 365 d, computed as a 1-row aggregate
    * FRAME (never collected). */
  private def flushRow(ev: DataFrame, tsCol: String): DataFrame =
    ev.agg(max(col(tsCol)).as("_m"))
      .select(lit(-1L).as("event_id"),
        (col("_m").cast("long") + lit(365L * 86400L)).cast("timestamp")
          .as(tsCol),
        lit("flush").as("event_type"), lit(0.0).as("value"))

  /** Run the watermarked hour-window aggregation over the late feed and
    * return every emitted (closed) window. Deterministic: batch
    * boundaries, watermark positions, and drops are pure functions of
    * the data — now proven over the FILE ingestion path.
    */
  def lateFeedWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_type"), col("value"))
    val assigned = withBlocks(ev, "tss",
      when(col("event_id") % LateMod === 0, 1L).otherwise(0L))
    val replay = new Replay("win")
    val agg = replay.source(spark, ev.schema)
      .withWatermark("tss", s"$WatermarkSec seconds")
      // append mode requires grouping on the watermarked window column
      // itself (projecting .start pre-agg severs the watermark link)
      .groupBy(window(col("tss"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"),
        col("total_value"))
    val name = "late_win_" + Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 to Blocks).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
      // flush: one far-future event closes every real window
      replay.add(flushRow(ev, "tss"))
      q.processAllAvailable()
    } finally { q.stop(); replay.cleanup() }
    spark.table(name).filter(col("event_type") =!= "flush")
  }

  /** CHECKPOINT-RECOVERY twin of [[lateFeedWindowCounts]]: the same
    * watermarked hour-window aggregation, but written through the
    * fault-tolerant FILE sink with a checkpoint, KILLED mid-feed —
    * stopped after block 1, with block 2's file landing while the
    * query is DOWN — then RESTARTED from the checkpoint to discover
    * and drain it plus the rest. The final output is the sink
    * directory read through its transactional `_spark_metadata` log,
    * so an aborted write attempt is invisible and every batch commits
    * exactly once. The oracle is [[lateFeedWindowCounts]]'s SQL
    * verbatim — the hash proves the interrupted+resumed run emits
    * exactly the uninterrupted run's rows: no duplicates, no gaps,
    * watermark + window state restored from the commit log.
    *
    * This is the production contract a 100 TB ingest actually leans
    * on: executors/drivers die mid-batch; offsets + state + sink
    * manifest must re-align on restart without an operator noticing.
    */
  def lateFeedWindowCountsRecovered(spark: SparkSession,
                                    sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_type"), col("value"))
    val assigned = withBlocks(ev, "tss",
      when(col("event_id") % LateMod === 0, 1L).otherwise(0L))
    val replay = new Replay("rec")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val outDir = s"/tmp/graft_recovery/out_$runId"
    val ckpt = s"/tmp/graft_recovery/ckpt_$runId"
    def start() = replay.source(spark, ev.schema)
      .withWatermark("tss", s"$WatermarkSec seconds")
      .groupBy(window(col("tss"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"),
        col("total_value"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      (0 to 1).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    // land block 2's file while the query is DOWN: the restart must
    // discover and commit it exactly once from the source listing.
    // (Deliberately NOT add-then-kill: a stop that catches the batch
    // mid-flight loses its uncommitted watermark advancement on
    // restart — legal Structured Streaming behavior, late rows then
    // survive that the uninterrupted run drops — which no
    // deterministic oracle can model. Observed exactly once under a
    // 3-JVM contended box: 15 extra under-dropped rows. Mid-batch
    // kill exactly-onceness is gated where its semantics ARE
    // deterministic: the index-ingest retry-in-place specs.)
    replay.add(assigned.filter(col("b") === 2).drop("b"))
    val q2 = start()
    try {
      q2.processAllAvailable() // drain whatever the kill left pending
      (3 to Blocks).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q2.processAllAvailable()
      }
      replay.add(flushRow(ev, "tss"))
      q2.processAllAvailable()
    } finally { q2.stop(); replay.cleanup() }
    spark.read.parquet(outDir).filter(col("event_type") =!= "flush")
  }

  /** Run the STATEFUL sessionize twin over a multi-batch feed: events
    * cut into 4 day-quartile blocks fed in time order, ARRIVAL order
    * scrambled within each batch file, one far-future flush event per
    * user closing every real session. Sessions spanning block
    * boundaries must be stitched by the state machine, so the oracle
    * (the q12 batch sessionization) checks cross-batch state
    * continuation end-to-end.
    *
    * Blocks stay time-ordered deliberately: within-batch disorder and
    * in-gap cross-batch continuation are batch-equivalent BY
    * CONSTRUCTION (the operator sorts each batch; time-partitioned
    * sorted batches concatenate to the global sort), while unbounded
    * cross-batch lateness provably is not — an event arriving two
    * sessions late can never be merged with intermediate events it
    * should have bridged (the state machine emits it standalone, the
    * batch twin merges all three). That bounded-disorder contract is
    * what a watermark formalizes; the late/drop semantics are
    * oracle-checked on the windowed twin (st_window_late) and
    * spec-checked for sessionize's two late branches.
    *
    * session_value is NOT emitted: streaming state accumulates doubles
    * in processing order, so the sum is accumulation-order-dependent;
    * counts and boundary timestamps are exact. The batch operator's
    * values stay oracle-checked by q12_sessionize.
    */
  def blockFeedSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import EventStreams.{Event, Session}
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val assigned = withBlocks(ev, "ts", lit(0L))
    // one flush event per user, ids below every real id
    val flush = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("_m"))))
      .select((lit(-1L) - col("user_id")).as("event_id"),
        (col("_m").cast("long") + lit(365L * 86400L)).cast("timestamp")
          .as("ts"),
        col("user_id"), lit("flush").as("event_type"), lit(0.0).as("value"))
    val replay = new Replay("sess")
    implicit val s: SparkSession = spark
    val name = "block_sess_" + Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = EventStreams.sessionize(replay.source(spark, ev.schema).as[Event])
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 until Blocks).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
      replay.add(flush)
      q.processAllAvailable()
    } finally { q.stop(); replay.cleanup() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    spark.table(name).as[Session].toDF()
      .filter(col("session_start") < Timestamp.valueOf("2090-01-01 00:00:00"))
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start").as("start_ts"), col("session_end").as("end_ts"))
  }

  /** Run the streaming FUNNEL state machine over the same
    * time-quartile block feed: per user, view → click → purchase with
    * strictly-increasing event times, final depth emitted on the
    * per-user flush event. The stream's real output is the per-user
    * depth table; it is summarized to q25_funnel's (stage, n_users)
    * rows so the SAME oracle SQL pins the batch and streaming twins to
    * identical numbers — cross-batch state continuation (a funnel
    * whose steps straddle block boundaries) is exactly what the
    * equality proves.
    */
  def blockFeedFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import EventStreams.Event
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val assigned = withBlocks(ev, "ts", lit(0L))
    val flush = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("_m"))))
      .select((lit(-1L) - col("user_id")).as("event_id"),
        (col("_m").cast("long") + lit(365L * 86400L)).cast("timestamp")
          .as("ts"),
        col("user_id"), lit("flush").as("event_type"), lit(0.0).as("value"))
    val replay = new Replay("funnel")
    implicit val s: SparkSession = spark
    val name = "block_funnel_" +
      Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = EventStreams.funnelStream(
        replay.source(spark, ev.schema).as[Event],
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 until Blocks).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
      replay.add(flush)
      q.processAllAvailable()
    } finally { q.stop(); replay.cleanup() }
    val depths = spark.table(name)
    def stage(nm: String, minDepth: Int) =
      depths.filter(col("depth") >= minDepth)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(nm).as("stage"), col("n_users"))
    stage("1_view", 1)
      .unionAll(stage("2_click", 2))
      .unionAll(stage("3_purchase", 3))
  }

  /** STATEFUL checkpoint-recovery twin of [[blockFeedSessions]]: the
    * same `flatMapGroupsWithState` sessionization, file sink +
    * checkpoint, KILLED mid-feed and restarted. This is the harder
    * recovery case next to [[lateFeedWindowCountsRecovered]]'s window
    * aggregation: per-user session state (open session start/end,
    * event count) lives in the STATE STORE, and the restart must
    * reload the exact pre-kill state snapshot for cross-batch session
    * stitching to survive the crash — a session spanning the kill
    * point is the thing being tested. Oracle =
    * [[blockFeedSessions]]'s batch sessionization SQL verbatim.
    */
  def blockFeedSessionsRecovered(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    import spark.implicits._
    import EventStreams.{Event, Session}
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val assigned = withBlocks(ev, "ts", lit(0L))
    val flush = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("_m"))))
      .select((lit(-1L) - col("user_id")).as("event_id"),
        (col("_m").cast("long") + lit(365L * 86400L)).cast("timestamp")
          .as("ts"),
        col("user_id"), lit("flush").as("event_type"), lit(0.0).as("value"))
    val replay = new Replay("srec")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val outDir = s"/tmp/graft_recovery/sess_out_$runId"
    val ckpt = s"/tmp/graft_recovery/sess_ckpt_$runId"
    implicit val s: SparkSession = spark
    def start() = EventStreams
      .sessionize(replay.source(spark, ev.schema).as[Event])
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      (0 to 1).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    // block 2 lands while the query is DOWN: sessions bridging the
    // block-1/2 gap must be stitched from RECOVERED state. (Landed
    // after the stop, not before — an add-then-kill can catch the
    // batch mid-flight and lose uncommitted watermark advancement on
    // restart, a legal-but-unmodelable timing; see
    // lateFeedWindowCountsRecovered.)
    replay.add(assigned.filter(col("b") === 2).drop("b"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      replay.add(assigned.filter(col("b") === 3).drop("b"))
      q2.processAllAvailable()
      replay.add(flush)
      q2.processAllAvailable()
    } finally { q2.stop(); replay.cleanup() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    spark.read.parquet(outDir).as[Session].toDF()
      .filter(col("session_start") < Timestamp.valueOf("2090-01-01 00:00:00"))
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start").as("start_ts"), col("session_end").as("end_ts"))
  }

  /** Checkpoint-recovery twin of [[blockFeedFunnel]]: the funnel state
    * machine's per-user (depth, last-transition-time) state lives in
    * the state store; the query is KILLED after draining two blocks
    * (block 2 landed but undrained) and restarted from the checkpoint.
    * A funnel whose steps straddle the kill point — view before it,
    * click after — only completes if the restart reloads the exact
    * pre-kill (depth, time) pair: depth alone would miss the
    * strictly-later time constraint, time alone the position. Oracle =
    * q25_funnel's batch SQL verbatim, the hardest recovery gate in the
    * tier because the state is ORDER-derived, not an aggregate.
    */
  def blockFeedFunnelRecovered(spark: SparkSession,
                               sfDir: String): DataFrame = {
    import spark.implicits._
    import EventStreams.Event
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val assigned = withBlocks(ev, "ts", lit(0L))
    val flush = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("_m"))))
      .select((lit(-1L) - col("user_id")).as("event_id"),
        (col("_m").cast("long") + lit(365L * 86400L)).cast("timestamp")
          .as("ts"),
        col("user_id"), lit("flush").as("event_type"), lit(0.0).as("value"))
    val replay = new Replay("frec")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val outDir = s"/tmp/graft_recovery/funnel_out_$runId"
    val ckpt = s"/tmp/graft_recovery/funnel_ckpt_$runId"
    implicit val s: SparkSession = spark
    def start() = EventStreams
      .funnelStream(replay.source(spark, ev.schema).as[Event],
        Seq("view", "click", "purchase"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      (0 to 1).foreach { k =>
        replay.add(assigned.filter(col("b") === k).drop("b"))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    // block 2 lands while the query is DOWN (not add-then-kill; see
    // lateFeedWindowCountsRecovered for the watermark-recovery race)
    replay.add(assigned.filter(col("b") === 2).drop("b"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      replay.add(assigned.filter(col("b") === 3).drop("b"))
      q2.processAllAvailable()
      replay.add(flush)
      q2.processAllAvailable()
    } finally { q2.stop(); replay.cleanup() }
    val depths = spark.read.parquet(outDir)
    def stage(nm: String, minDepth: Int) =
      depths.filter(col("depth") >= minDepth)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(nm).as("stage"), col("n_users"))
    stage("1_view", 1)
      .unionAll(stage("2_click", 2))
      .unionAll(stage("3_purchase", 3))
  }

  /** Streaming exact dedup twin — `dropDuplicatesWithinWatermark` on the
    * late + out-of-order feed, with PLANTED duplicates: every event with
    * `event_id % 5 == 0` is re-sent one batch after its arrival batch,
    * and every `event_id % 7 == 0` is duplicated WITHIN its batch. The
    * within-watermark dedup semantics make the outcome exactly
    * SQL-expressible: a duplicate is dropped when its key's state is
    * still live, and when the state has expired (event-time + delay ≤
    * watermark) the duplicate row is itself older than the watermark —
    * with expiry delay == watermark delay a non-late duplicate ALWAYS
    * finds live state, so duplicates never re-emit, and a late-shifted
    * original that was dropped as late leaves no state but its
    * duplicate (arriving under a still-higher watermark) is late too.
    * Emitted set ≡ first arrivals that beat the watermark, one row per
    * key — the same kept-rows rule st_window_late's oracle replays.
    *
    * Scale notes: dedup state is hash-partitioned by key and bounded by
    * watermark eviction to the delay horizon — the streaming twin of
    * [[graft.operators.Dedup]]'s incremental exact dedup, with the
    * retention the delta variant leaves to compaction handled by state
    * TTL instead.
    */
  def lateFeedDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_type"), col("value"))
    val assigned = withBlocks(ev, "tss",
      when(col("event_id") % LateMod === 0, 1L).otherwise(0L))
    // arrival schedule: originals as assigned lays them out, %7 dups
    // twice in the same batch, %5 dups re-sent one batch later
    val all = assigned
      .unionAll(assigned.filter(col("event_id") % 7 === 0))
      .unionAll(assigned.filter(col("event_id") % 5 === 0)
        .withColumn("b", col("b") + 1))
    val replay = new Replay("dedup")
    val deduped = replay.source(spark, ev.schema)
      .withWatermark("tss", s"$WatermarkSec seconds")
      .dropDuplicatesWithinWatermark("event_id")
    val name = "late_dedup_" + Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 to Blocks + 1).foreach { k =>
        replay.add(all.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
    } finally { q.stop(); replay.cleanup() }
    spark.table(name)
      .select(col("event_id"), col("tss"), col("event_type"), col("value"))
  }

  /** Event-time bound of the stream-stream join: a click matches a view
    * by the same user at most this many seconds later. */
  val JoinRangeSec = 7200L

  /** Watermarked STREAM-STREAM interval join: views ⋈ clicks of the same
    * user with `click.tss ∈ [view.tss, view.tss + 2 h]`, both sides
    * watermarked so Spark can evict view state once no future click can
    * match it (`view.tss + range < watermark`). The feed cuts both
    * streams into the same 4 day-quartile blocks fed in time order with
    * ARRIVAL order scrambled inside each batch file — matches that span
    * a batch boundary (click arrives a block after its view) must come
    * from retained state, which is the thing worth checking. Blocks are
    * day-partitioned, so the operative watermark `max(prior tss) − 10
    * min − 2 h` is always behind the earliest view a new click can
    * match — no eligible match is ever evicted, and the emitted pair set
    * equals the batch interval join (the DuckDB oracle) exactly.
    *
    * Scale notes: this is the streaming twin of q22_range_join — state
    * is partitioned by the join key, bounded by watermark eviction to a
    * ~2 h window per side, and emission is per-microbatch incremental;
    * nothing in the plan is proportional to history length.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("user_id"), col("event_type"))
    // both sides share the SAME day-quartile boundaries (bounds over
    // all events), exactly as the MemoryStream harness cut them
    val assigned = withBlocks(ev, "tss", lit(0L))
    val views = assigned.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("tss").as("v_tss"),
        col("user_id").as("v_user"), col("b"))
    val clicks = assigned.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("tss").as("c_tss"),
        col("user_id").as("c_user"), col("b"))
    val vReplay = new Replay("ssv")
    val cReplay = new Replay("ssc")
    val v = vReplay.source(spark, views.drop("b").schema)
      .withWatermark("v_tss", s"$WatermarkSec seconds")
    val c = cReplay.source(spark, clicks.drop("b").schema)
      .withWatermark("c_tss", s"$WatermarkSec seconds")
    val joined = v.join(c,
      expr(s"""v_user = c_user AND c_tss >= v_tss AND
               c_tss <= v_tss + interval $JoinRangeSec seconds"""))
      .select(col("view_id"), col("click_id"), col("v_user").as("user_id"),
        col("v_tss").as("view_ts"), col("c_tss").as("click_ts"))
    val name = "ss_join_" + Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 until Blocks).foreach { k =>
        vReplay.add(views.filter(col("b") === k).drop("b"))
        cReplay.add(clicks.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
    } finally { q.stop(); vReplay.cleanup(); cReplay.cleanup() }
    spark.table(name)
  }

  /** STREAM-STATIC enrichment join — the third join mode next to the
    * watermarked stream-stream interval join and the batch joins: a
    * static per-user profile (total event count and summed value,
    * computed batch-side) broadcast-joined into every micro-batch of
    * the purchase stream. No state, no watermark — the static side is
    * re-planned per batch, which is exactly the dimension-enrichment
    * shape of a production ingest (at 100 TB the dimension is a
    * broadcast or bucketed table; the stream never shuffles for it).
    * Fed in 4 scrambled day-quartile block files; output must equal
    * the batch join row-for-row.
    */
  def streamStaticJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), date_trunc("second", col("ts")).as("tss"),
        col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("v2"))
    val dim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("u_events"),
        sum(col("v2")).cast("double").as("u_value"))
    // block bounds over the PURCHASE stream only (its own day range)
    val purchases = withBlocks(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("tss"), col("user_id")),
      "tss", lit(0L))
    val replay = new Replay("stat")
    val joined = replay.source(spark, purchases.drop("b").schema)
      .join(dim, "user_id")
      .select(col("event_id"), col("user_id"), col("u_events"), col("u_value"))
    val name = "ss_static_" + Integer.toHexString(sfDir.hashCode).filter(_ != '-')
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 until Blocks).foreach { k =>
        replay.add(purchases.filter(col("b") === k).drop("b"))
        q.processAllAvailable()
      }
    } finally { q.stop(); replay.cleanup() }
    spark.table(name)
  }

  /** Build-once: a postings index whose delta generations arrive
    * through the real FILE streaming source + the
    * [[IndexIngest.appendBatch]] foreachBatch sink — one third of the
    * corpus at build time, the rest in two streamed micro-batches,
    * with the query KILLED between them and resumed from its
    * checkpoint. The searchable state the gate probes is therefore
    * the product of a restart on the continuous-indexing path. */
  def indexIngestFixture(spark: SparkSession,
                         sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_" +
      Integer.toHexString(canonical.hashCode) + "_ingest"
    val base = s"/tmp/graft_text/$name"
    val marker = new org.apache.hadoop.fs.Path(s"$base/_INGEST_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return base
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    graft.operators.Retrieval.writePostingsIndex(
      docs.filter(col("doc_id") % 3 === 0), base)
    val replay = new Replay("ingest")
    val ckpt = s"$base/_ingest_ckpt"
    def start() = replay.source(spark, docs.schema)
      .writeStream
      .foreachBatch(IndexIngest.appendBatch(base) _)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try {
      replay.add(docs.filter(col("doc_id") % 3 === 1))
      q1.processAllAvailable()
    } finally q1.stop() // the kill point: one batch in, one to come
    val q2 = start()    // resume from the checkpoint
    try {
      replay.add(docs.filter(col("doc_id") % 3 === 2))
      q2.processAllAvailable()
    } finally q2.stop()
    replay.cleanup()
    fs.create(marker, true).close()
    base
  }

  /** ANN twin of [[indexIngestFixture]]: IVF built over the even
    * vec_ids (every % 40 == 0 centroid source is even, so the frozen
    * centroid set equals the full corpus's), odds streamed through the
    * file source + [[IndexIngest.appendIvfBatch]] in two micro-batches
    * with a kill+resume between them. */
  def vectorIngestFixture(spark: SparkSession,
                          sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_" +
      Integer.toHexString(canonical.hashCode) + "_vingest"
    val base = s"/tmp/graft_ann/$name"
    val marker = new org.apache.hadoop.fs.Path(s"$base/_INGEST_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return base
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    graft.operators.Similarity.writeIvfIndex(
      emb.filter(col("vec_id") % 2 === 0), base)
    val replay = new Replay("vingest")
    val ckpt = s"$base/_ingest_ckpt"
    def start() = replay.source(spark, emb.schema)
      .writeStream
      .foreachBatch(IndexIngest.appendIvfBatch(base) _)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try {
      replay.add(emb.filter(col("vec_id") % 2 =!= 0 &&
        col("vec_id") % 3 === 0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      replay.add(emb.filter(col("vec_id") % 2 =!= 0 &&
        col("vec_id") % 3 =!= 0))
      q2.processAllAvailable()
    } finally q2.stop()
    replay.cleanup()
    fs.create(marker, true).close()
    base
  }

  /** CDC-sync fixture: the index starts on a third of the corpus, then
    * a change-feed stream mutates it — batch 1 deletes part of the
    * base and inserts new docs, batch 2 UPSERTS a slice of batch-1's
    * docs (delete-of-old + insert-of-marked-new, the CDF convention)
    * and inserts the rest — with the query KILLED between the batches
    * and resumed from its checkpoint. The served index must equal one
    * fresh build over the net corpus. */
  def indexCdcFixture(spark: SparkSession,
                      sfDir: String): String = synchronized {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val name = new java.io.File(sfDir).getName + "_" +
      Integer.toHexString(canonical.hashCode) + "_cdc"
    val base = s"/tmp/graft_text/$name"
    val marker = new org.apache.hadoop.fs.Path(s"$base/_INGEST_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return base
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    graft.operators.Retrieval.writePostingsIndex(
      docs.filter(col("doc_id") % 3 === 0), base)
    def cdc(df: DataFrame, op: String): DataFrame =
      df.select(col("doc_id"), col("text"), lit(op).as("_change_type"))
    val batch1 = cdc(docs.filter(col("doc_id") % 3 === 0 &&
        col("doc_id") % 5 === 0), "delete")
      .unionByName(cdc(docs.filter(col("doc_id") % 3 === 1), "insert"))
    val upserts = docs.filter(col("doc_id") % 3 === 1 &&
      col("doc_id") % 7 === 0)
    val batch2 = cdc(upserts, "delete")
      .unionByName(cdc(upserts.select(col("doc_id"),
        concat(col("text"), lit(" cdcmark")).as("text")), "insert"))
      .unionByName(cdc(docs.filter(col("doc_id") % 3 === 2), "insert"))
    val replay = new Replay("cdc")
    val ckpt = s"$base/_ingest_ckpt"
    def start() = replay.source(spark, batch1.schema)
      .writeStream
      .foreachBatch(IndexIngest.applyCdcBatch(base) _)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try { replay.add(batch1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // resume from the checkpoint
    try { replay.add(batch2); q2.processAllAvailable() } finally q2.stop()
    replay.cleanup()
    fs.create(marker, true).close()
    base
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_window_late" -> { (s, d) => lateFeedWindowCounts(s, d) },
    "st_sessionize_stream" -> { (s, d) => blockFeedSessions(s, d) },
    "st_funnel" -> { (s, d) => blockFeedFunnel(s, d) },
    "st_recovery_funnel" -> { (s, d) => blockFeedFunnelRecovered(s, d) },
    "st_stream_join" -> { (s, d) => streamStreamJoin(s, d) },
    "st_static_join" -> { (s, d) => streamStaticJoin(s, d) },
    "st_dedup_stream" -> { (s, d) => lateFeedDedup(s, d) },
    // kill-and-restart exactly-once: same aggregation as
    // st_window_late but through the file sink + checkpoint, stopped
    // mid-feed and resumed — the oracle (st_window_late's SQL
    // verbatim) hash-proves the recovery changed nothing
    "st_recovery" -> { (s, d) => lateFeedWindowCountsRecovered(s, d) },
    // the STATEFUL twin: flatMapGroupsWithState session state must be
    // reloaded from the state store on restart for sessions bridging
    // the kill point (oracle = st_sessionize_stream's SQL verbatim)
    "st_recovery_sessions" -> { (s, d) => blockFeedSessionsRecovered(s, d) },
    // continuous indexing: streamed docs become searchable as delta
    // generations via foreachBatch (exactly-once epoch commit), across
    // a kill+resume — the stored search then equals the whole-corpus
    // oracle (t_search's SQL verbatim)
    "st_index_ingest" -> { (s, d) =>
      graft.operators.Retrieval.conjunctiveSearchStored(s,
        indexIngestFixture(s, d), graft.operators.Retrieval.QueryTerms)
    },
    // the ANN twin: streamed vectors probeable from the stored IVF
    // index across a kill+resume — equals the monolithic-build oracle
    // because the frozen centroids are the full corpus's
    "st_vector_ingest" -> { (s, d) =>
      graft.operators.Similarity.ivfTopKStored(s, vectorIngestFixture(s, d),
        graft.Tables.t(s, d, "embeddings").filter(col("vec_id") < 8), 3)
    },
    // CDC sync: a change-feed stream (deletes, inserts, upserts) keeps
    // the index current across a kill+resume; stored search then
    // equals the oracle over the NET corpus
    "st_index_cdc" -> { (s, d) =>
      graft.operators.Retrieval.conjunctiveSearchStored(s,
        indexCdcFixture(s, d), graft.operators.Retrieval.QueryTerms)
    }
  )

  /** The oracle replays the same batch assignment and watermark rule in
    * SQL: a row of batch b is DROPPED iff its hour-window end is <= the
    * operative watermark `max(tss over batches < b) − 10 min` (Spark
    * evicts a window's state once the watermark reaches its end, so a
    * row arriving after that has nowhere to land). Kept rows aggregate
    * exactly like the streaming query.
    */
  def oracle: Map[String, String] = Map(
    // the ingested index is an access path: whatever generation layout
    // the stream left behind, search must equal the whole-corpus SQL
    "st_index_ingest" -> graft.operators.Retrieval.oracle("t_search"),
    "st_vector_ingest" -> graft.operators.Similarity.oracle("sim_ivf_stored"),
    // the net corpus after the CDC feed: base minus its %5 deletes,
    // batch-1 inserts with the %7 slice upserted (marked), batch-2
    // inserts
    "st_index_cdc" -> graft.operators.Retrieval.searchOracleOver(
      """SELECT doc_id, text FROM documents
        |    WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0
        |  UNION ALL SELECT doc_id, text FROM documents
        |    WHERE doc_id % 3 = 1 AND doc_id % 7 <> 0
        |  UNION ALL SELECT doc_id, text || ' cdcmark' AS text FROM documents
        |    WHERE doc_id % 3 = 1 AND doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, text FROM documents
        |    WHERE doc_id % 3 = 2""".stripMargin),
    // identical SQL: the killed-and-recovered run must hash-match the
    // uninterrupted semantics exactly (exactly-once across restart)
    "st_recovery" -> windowLateOracleSql,
    "st_window_late" -> windowLateOracleSql,
    // the batch sessionization (q12 shape, sans the order-dependent
    // value sum) — the streamed block feed must reproduce it exactly,
    // and the killed-and-recovered run identically (state-store
    // recovery must not lose or duplicate an open session)
    "st_sessionize_stream" -> sessionizeOracleSql,
    "st_recovery_sessions" -> sessionizeOracleSql,
    // the q25 batch funnel SQL verbatim: the streamed state machine's
    // stage counts must equal the three-stage min-ts join chain —
    // including across a mid-feed kill + checkpoint restart
    "st_funnel" -> graft.operators.Relational.oracle("q25_funnel"),
    "st_recovery_funnel" -> graft.operators.Relational.oracle("q25_funnel"),
    // the batch interval join the streamed block feed must reproduce
    // exactly (no drops: the day-partitioned feed keeps the watermark
    // behind every view a future click can still match)
    "st_stream_join" ->
      s"""WITH ev AS (
         |  SELECT event_id, date_trunc('second', ts) AS tss, user_id,
         |    event_type
         |  FROM events),
         |v AS (SELECT * FROM ev WHERE event_type = 'view'),
         |c AS (SELECT * FROM ev WHERE event_type = 'click')
         |SELECT v.event_id AS view_id, c.event_id AS click_id,
         |  v.user_id, v.tss AS view_ts, c.tss AS click_ts
         |FROM v JOIN c
         |  ON c.user_id = v.user_id AND c.tss >= v.tss
         | AND c.tss <= v.tss + INTERVAL $JoinRangeSec SECOND""".stripMargin,
    // kept-first-arrivals mirror of lateFeedDedup: a key emits iff its
    // first arrival beats that batch's operative watermark; duplicates
    // (live state or late) never emit — see the operator scaladoc
    "st_dedup_stream" ->
      s"""WITH ev AS (
         |  SELECT event_id, date_trunc('second', ts) AS tss, event_type,
         |    value, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
         |  FROM events),
         |bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ev),
         |assigned AS (
         |  SELECT ev.*,
         |    LEAST(((day - dmin) * $Blocks) // (dmax - dmin + 1)
         |      + CASE WHEN event_id % $LateMod = 0 THEN 1 ELSE 0 END,
         |      $Blocks) AS b
         |  FROM ev CROSS JOIN bounds),
         |wm AS (
         |  SELECT a.b, max(p.tss) - INTERVAL $WatermarkSec SECOND AS w
         |  FROM (SELECT DISTINCT b FROM assigned) a
         |  JOIN assigned p ON p.b < a.b GROUP BY a.b)
         |SELECT a.event_id, a.tss, a.event_type, a.value
         |FROM assigned a LEFT JOIN wm ON wm.b = a.b
         |WHERE wm.w IS NULL OR a.tss > wm.w""".stripMargin,

    // the batch enrichment join the streamed purchase feed reproduces;
    // per-value DECIMAL cast keeps the profile sum order-independent
    "st_static_join" ->
      """WITH dim AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS u_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS u_value
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, dim.u_events, dim.u_value
        |FROM events e JOIN dim ON dim.user_id = e.user_id
        |WHERE e.event_type = 'purchase'""".stripMargin
  )

  private lazy val sessionizeOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, date_trunc('second', ts) AS tss
      |  FROM events),
      |lagged AS (
      |  SELECT user_id, event_id, tss,
      |    lag(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev
      |  FROM ev),
      |flagged AS (
      |  SELECT user_id, event_id, tss,
      |    CASE WHEN prev IS NULL
      |           OR CAST(floor(epoch(tss)) AS BIGINT) - CAST(floor(epoch(prev)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM lagged),
      |sess AS (
      |  SELECT user_id, tss,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
      |  min(tss) AS start_ts, max(tss) AS end_ts
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  private lazy val windowLateOracleSql: String =
      s"""WITH ev AS (
         |  SELECT event_id, date_trunc('second', ts) AS tss, event_type,
         |    value, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
         |  FROM events),
         |bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ev),
         |assigned AS (
         |  SELECT ev.*,
         |    LEAST(((day - dmin) * $Blocks) // (dmax - dmin + 1)
         |      + CASE WHEN event_id % $LateMod = 0 THEN 1 ELSE 0 END,
         |      $Blocks) AS b
         |  FROM ev CROSS JOIN bounds),
         |wm AS (
         |  SELECT a.b, max(p.tss) - INTERVAL $WatermarkSec SECOND AS w
         |  FROM (SELECT DISTINCT b FROM assigned) a
         |  JOIN assigned p ON p.b < a.b GROUP BY a.b),
         |kept AS (
         |  SELECT a.* FROM assigned a LEFT JOIN wm ON wm.b = a.b
         |  WHERE wm.w IS NULL
         |     OR date_trunc('hour', a.tss) + INTERVAL 1 HOUR > wm.w)
         |SELECT date_trunc('hour', tss) AS h, event_type,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM kept GROUP BY 1, 2""".stripMargin
}
