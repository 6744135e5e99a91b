package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface at all (SURVEY.md §2.9); these
  * are the streaming-friendly operators the north star adds. Each has a
  * batch twin in the oracle-checked query set (q11_events_window,
  * q12_sessionize) so streaming results can be validated against the
  * batch plan on the same data (see StreamingSpec).
  *
  * Scale notes: watermarking bounds state; sessionization state is
  * per-user O(1); both run on key-partitioned state stores that scale
  * with executors.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(sessionStart: Timestamp, lastTs: Timestamp,
                                nEvents: Long, totalValue: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Funnel state machine position: steps matched so far and the
    * event-time (ms) of the last transition — the next step must be
    * STRICTLY later, the batch twin's `tss > t_prev` contract. */
  final case class FunnelState(depth: Int, lastMs: Long)

  final case class FunnelDepth(user_id: Long, depth: Int)

  /** Tumbling-window counts per event type: the streaming twin of
    * q11_events_window. Watermark allows 10 minutes of lateness and lets
    * Spark drop window state once the watermark passes.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).getField("start").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Streaming distinct-user counts per window via MERGEABLE HLL
    * sketch state (Spark's DataSketches `hll_sketch_agg`) — the
    * streaming twin of [[graft.operators.Sketches]]' persist-and-union
    * HLL tier. The state store holds one ~2^lgK-byte sketch per open
    * window instead of a per-user distinct set, so state size is
    * O(windows), INDEPENDENT of user cardinality — the only viable
    * contract when a 100 TB stream carries hundreds of millions of
    * distinct keys; exact streaming distinct would grow state without
    * bound. Watermark evicts closed windows. Same lgK as the batch
    * tier, so streaming and batch estimates agree exactly (the sketch
    * is deterministic for a given value multiset).
    */
  def windowedDistinctUsers(events: DataFrame, window_ : String = "1 hour",
                            watermark: String = "10 minutes",
                            lgK: Int = 12): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).getField("start").as("h"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(lgK))).as("distinct_users"))

  /** Stream-static enrichment: join the event stream against a batch
    * dimension table (re-read per micro-batch by Spark; broadcast when
    * small). The canonical "attach user/customer attributes to a
    * clickstream" shape.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming exact-dedup by key: keeps the first occurrence of each
    * event_id; `dropDuplicatesWithinWatermark` lets Spark evict dedup
    * state once the watermark passes (bounded state — the property that
    * makes streaming dedup viable on an unbounded stream).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-dedup by MinHash signature: the streaming twin of
    * the batch LSH dedup's candidate key. Documents whose texts collapse
    * to the SAME full signature (identical after tokenization, or
    * shingle-identical rewrites) keep only the first arrival; state is
    * watermark-bounded. The signature is the compiled one-pass
    * expression, so the map side is identical to the batch operator.
    * Full-signature equality is the sound streaming key — per-band
    * matching would need cross-row verify state (the batch operator's
    * exact-Jaccard stage) to reject LSH false positives.
    */
  def signatureDedupStream(docs: DataFrame, watermark: String = "1 hour",
                           n: Int = 3, k: Int = 8): DataFrame =
    docs
      .withColumn("sig",
        graft.functions.MinHashSigExpr.minhashSig(col("text"), n, k))
      // null signature (fewer than n tokens) → the raw text is the key,
      // so short docs only dedup on exact equality (concat_ws would fold
      // a null array to "" — an explicit branch keeps the cases apart)
      .withColumn("sig_key",
        when(col("sig").isNull, concat(lit("raw:"), col("text")))
          .otherwise(concat_ws(",", col("sig").cast("array<string>"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig_key")
      .drop("sig", "sig_key")

  /** Streaming benchmark-decontamination — the streaming twin of
    * `operators.Pipeline.decontaminate`: incoming documents are DROPPED
    * when they share a word n-gram with the static benchmark n-gram set
    * (the "never train on test data" gate, applied at ingest). The
    * benchmark n-gram set is collected ONCE driver-side (benchmark sets
    * are small by nature) and shipped as a literal array, so the filter
    * is a pure map-side `arrays_overlap` — stateless, no watermark, no
    * join state; per-microbatch work is one codegen'd scan. (An
    * anti-join formulation would make the per-doc distinct a stateful
    * streaming aggregation — needlessly.)
    */
  def decontaminateStream(docs: DataFrame, benchGrams: DataFrame,
                          n: Int = 4): DataFrame = {
    import graft.functions.TextFunctions._
    val grams = benchGrams.select(col("g")).collect().map(_.getString(0))
    if (grams.isEmpty) docs
    // typedlit: ONE array literal, not one expression node per n-gram
    // (a large benchmark suite as array(lit, lit, ...) would blow past
    // codegen method limits and slow every micro-batch's planning)
    else docs.filter(!arrays_overlap(
      shingles(tokens(col("text")), n), typedlit(grams.toSeq)))
  }

  /** Streaming PII scrubbing — the streaming twin of
    * `operators.TextAnalysis.piiRedact`. The batch operator is already
    * pure column expressions (no shuffle, no state), so it applies to an
    * unbounded stream VERBATIM: stateless, no watermark, per-microbatch
    * work is one codegen'd scan. This is the payoff of keeping pipeline
    * operators map-side — the batch/stream split disappears.
    */
  def piiScrubStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.operators.TextAnalysis.piiRedact(docs, textCol)

  /** Stream-stream interval join — the streaming twin of the batch
    * range join (`operators.AsOf.rangeJoin`): clicks join purchases by
    * the same user within `windowSeconds` AFTER the purchase. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark evicts join state once a purchase can no longer
    * match any future click — bounded state on two unbounded streams.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      windowSeconds: Long = 7200,
                      watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") >= col("purchase_ts") &&
        col("click_ts") <= col("purchase_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("click_id"), col("click_ts"), col("purchase_ts"))
  }

  /** Ordered-funnel state machine — the streaming CEP twin of
    * q25_funnel: per user, advance one step when the NEXT step's event
    * type arrives strictly after the last transition's event time;
    * earlier steps are never reconsidered (the batch twin's
    * earliest-view → earliest-later-click → earliest-later-purchase
    * chain, replayed as a left-to-right scan). Distinct from the other
    * stateful patterns in this tier: sessionize's state is a time gap,
    * dedup's is set membership — this one is ORDER-sensitive (a click
    * before the first view must not count), which is exactly what a
    * per-key state machine expresses and a windowed aggregation can't.
    *
    * Equivalence contract with the batch twin (the sessionize
    * bounded-disorder argument): each batch is sorted by (event time,
    * event id), and time-partitioned batches concatenate to the global
    * sort, under which "first qualifying event in scan order" =
    * "min(ts) qualifying event" — the batch stage definition. Ties
    * can't diverge: a transition needs a STRICTLY later timestamp, so
    * equal-time events advance nothing regardless of their relative
    * order.
    *
    * Emits each user's final depth on the far-future flush event (the
    * harness's end-of-stream marker, the sessionize convention);
    * depth-0 users emit nothing, matching the batch funnel whose
    * stage-1 table only contains users with a view.
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String])
                  (implicit spark: SparkSession): Dataset[FunnelDepth] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelDepth](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[FunnelDepth]
          sorted.foreach { e =>
            if (e.event_type == "flush") {
              if (st.depth > 0) out += FunnelDepth(userId, st.depth)
            } else if (st.depth < steps.length &&
                e.event_type == steps(st.depth) &&
                e.ts.getTime > st.lastMs) {
              st = FunnelState(st.depth + 1, e.ts.getTime)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Gap-based sessionization with explicit state — the streaming twin of
    * q12_sessionize. Emits a session when `gapSeconds` of event-time
    * silence elapses for a user (detected on the next event, or on state
    * timeout at end of stream).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            if (st == null) {
              st = SessionState(e.ts, e.ts, 1L, e.value)
            } else if (e.ts.getTime - st.lastTs.getTime > gapSeconds * 1000) {
              out += Session(userId, st.sessionStart, st.lastTs, st.nEvents, st.totalValue)
              st = SessionState(e.ts, e.ts, 1L, e.value)
            } else if (st.sessionStart.getTime - e.ts.getTime > gapSeconds * 1000) {
              // cross-batch event more than a gap OLDER than the current
              // session's start: the batch twin (globally sorted) would
              // have closed it as its own earlier session — emit it as
              // one, leave the current session untouched
              out += Session(userId, e.ts, e.ts, 1L, e.value)
            } else {
              // a late (cross-batch out-of-order) event within the gap
              // must not move lastTs backwards (false session split) and
              // pulls sessionStart back if it precedes it (matching the
              // batch twin, which sees globally sorted events)
              val last = if (e.ts.getTime > st.lastTs.getTime) e.ts else st.lastTs
              val start = if (e.ts.getTime < st.sessionStart.getTime) e.ts else st.sessionStart
              st = SessionState(start, last, st.nEvents + 1, st.totalValue + e.value)
            }
          }
          if (st != null) state.update(st) else state.remove()
          out.result().iterator
      }
  }

  /** Flush any open sessions (used at end-of-stream in tests / batch
    * equivalence checks — mirrors what a ProcessingTimeTimeout would emit).
    */
  def openSessions(events: Dataset[Event], gapSeconds: Long = 1800)
                  (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var st: SessionState = null
      val out = Seq.newBuilder[Session]
      sorted.foreach { e =>
        if (st == null) st = SessionState(e.ts, e.ts, 1L, e.value)
        else if (e.ts.getTime - st.lastTs.getTime > gapSeconds * 1000) {
          out += Session(userId, st.sessionStart, st.lastTs, st.nEvents, st.totalValue)
          st = SessionState(e.ts, e.ts, 1L, e.value)
        } else st = SessionState(st.sessionStart, e.ts, st.nEvents + 1, st.totalValue + e.value)
      }
      if (st != null) out += Session(userId, st.sessionStart, st.lastTs, st.nEvents, st.totalValue)
      out.result().iterator
    }
  }
}
