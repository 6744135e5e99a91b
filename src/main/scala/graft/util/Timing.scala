package graft.util

/** Stage timing analogous to the reference's
  * `SET graphar_time_logging = true` (GraphArSettings / ScopedTimer,
  * include/utils/benchmark.hpp:12-37): enable with
  * `spark.conf.set("spark.graft.timeLogging", "true")` to get per-stage
  * wall-clock lines on stderr for connector planning stages.
  */
object Timing {
  private def enabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.timeLogging", "false").toBoolean
    catch { case _: Throwable => false }

  /** Rounds-to-fixpoint report for the converged-form iterative graph
    * ops (same enable flag): one stderr line when a converged loop
    * exits, so scale benches can record ROUNDS alongside seconds
    * without threading a counter through every return type. */
  def convergedRounds(op: String, rounds: Int): Unit =
    if (enabled)
      System.err.println(s"[graft-converged] $op: $rounds rounds")

  def timed[T](stage: String)(f: => T): T = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f finally
        System.err.println(f"[graft-timing] $stage: ${(System.nanoTime() - t0) / 1e9}%.4f s")
    }
  }
}
