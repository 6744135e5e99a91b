package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE choke point where serving probes pin their tiny
  * (O(queries·nProbe)) intermediate frames, selected by the session
  * conf `spark.graft.probeCheckpoint`:
  *
  *  - `local` (default): lazy `localCheckpoint(false)` — blocks are
  *    ContextCleaner-reclaimed with the frame, so a long-lived serving
  *    session never accumulates cache entries per call. KNOWN TRADE:
  *    local checkpoints truncate lineage and are unreplicated — an
  *    executor loss (or dynamic-allocation decommission) mid-query
  *    fails the probe with a clear BlockNotFound instead of
  *    recomputing. For serving that is usually the right failure mode
  *    (the caller retries a sub-second probe).
  *  - `reliable`: lazy reliable `checkpoint(false)` to the session's
  *    `spark.sparkContext.setCheckpointDir` location — survives
  *    executor loss at the cost of a distributed-fs write per probe;
  *    the mode for pipelines that must ride out executor churn.
  *  - `persist`: `MEMORY_AND_DISK` cache — keeps lineage, so an
  *    executor loss RECOMPUTES instead of failing; the trade is a
  *    session-lifetime cache entry per probe call until the frame is
  *    garbage-collected (the reason it is not the default).
  *
  * Every `.localCheckpoint(false)` serving-probe site in
  * `Similarity.scala` routes through here; algorithm-internal
  * checkpoints (iterative frontier loops, training rounds) do not —
  * their pinning is part of the algorithm's cost model, not a serving
  * resilience choice.
  */
object ProbeCheckpoint {

  val ConfKey = "spark.graft.probeCheckpoint"

  private[graft] def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("local") match {
      case "local"    => df.localCheckpoint(eager = false)
      case "reliable" => df.checkpoint(eager = false)
      case "persist"  => df.persist(StorageLevel.MEMORY_AND_DISK)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be one of local|reliable|persist, got '$other'")
    }
}
