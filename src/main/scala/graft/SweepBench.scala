package graft

import org.apache.spark.sql.SparkSession

/** Round-13 measurement harness (guide §1): time any declared queries
  * through the noop sink — computes every column of every row, no
  * result collection — with per-query warm-up + repeated reps, one
  * line of output per rep plus a median summary. Used for the
  * interleaved A/B measurements recorded in OPTIMIZATION_r13.md; not
  * part of the driver bench contract.
  *
  * Usage: runMain graft.SweepBench <sfDir> <name> [name ...]
  * Env: SPARK_GRAFT_CPUS (default 32), SWEEP_REPS (default 3),
  *      SWEEP_WARMUP (default 1), SWEEP_CLEAR_CACHE (default 1 — clear
  *      the CacheManager between reps so each rep pays its own cache
  *      builds, the honest steady-state protocol from VERDICT r12).
  */
object SweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SWEEP_REPS", "3").toInt
    val warmup = sys.env.getOrElse("SWEEP_WARMUP", "1").toInt
    val clear = sys.env.getOrElse("SWEEP_CLEAR_CACHE", "1") == "1"
    // SWEEP_CONF="k=v,k=v" — extra session confs for A/B runs
    val extra = sys.env.getOrElse("SWEEP_CONF", "").split(',')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // probe-scale headroom for q30_recursive: the 1M-row default
      // RECURSION_ROW_LIMIT trips at sf0.1 only (the oracle gate runs
      // at sf0.01, well under it) — raised so the full-registry sweep
      // runs 254/254 (VERDICT r12 item 9)
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }

    val all = SparkEntry.queries
    val list = if (names == Seq("all")) all.keys.toSeq.sorted else names
    list.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query: $name"))
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      var failed: String = null
      while (i < warmup + reps && failed == null) {
        if (clear) spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(s"sweep:$name rep $i")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => failed = e.getMessage }
        val dt = (System.nanoTime() - t0) / 1e9
        if (failed == null) {
          if (i >= warmup) times += dt
          println(f"[sweep] $name rep $i: $dt%.3f s")
        }
        i += 1
      }
      if (failed != null) println(s"[sweep] $name FAILED: $failed")
      else {
        val s = times.sorted
        println(f"[sweep] $name MEDIAN ${s(s.length / 2)}%.3f s MIN ${s.head}%.3f (n=${s.length})")
      }
    }
    spark.stop()
  }
}
