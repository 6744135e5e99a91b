package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-13 plan evidence dumper: for each named declared query, writes
  * `<outDir>/<name>_<suffix>.txt` containing (a) the returned frame's
  * formatted plan and (b) every EXECUTED plan observed while building
  * and running the query through the noop sink — the loop-based
  * operators (pageRank, kTruss, …) materialize per-round frames during
  * build, so their interesting plans (join strategy inside a round)
  * only show up here, not in the final frame's explain.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <name> [name ...]
  * Env: SPARK_GRAFT_CPUS (default 32), SWEEP_CONF (same as SweepBench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("SWEEP_CONF", "").split(',')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }
    new java.io.File(outDir).mkdirs()

    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.add(s"-- executed [$funcName] --\n" +
          qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    names.foreach { name =>
      captured.clear()
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(2000) // listener bus is async
      val sb = new StringBuilder
      sb.append(s"== $name ($suffix) — final frame, explain(formatted) ==\n")
      sb.append(finalPlan).append('\n')
      sb.append("== executed plans observed during build + noop run ==\n")
      val it = captured.iterator()
      var i = 0
      while (it.hasNext && i < 200) { sb.append(it.next()).append('\n'); i += 1 }
      if (it.hasNext) sb.append("... (truncated at 200 executed plans)\n")
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
