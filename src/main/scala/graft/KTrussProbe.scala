package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measurement probe (not part of any query path): per-round
  * survivor counts of the g_ktruss peel at a given SF, to establish at
  * which round the peel reaches its fixed point (guide §1 — measure
  * before touching the loop).
  */
object KTrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = graph.GraphQueries.KTrussK
    val edges = graph.GraphQueries.edgesFrom(spark, sfDir)
    var cur = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    println(s"[probe] initial undirected simple edges: ${cur.count()}")
    var r = 0
    while (r < graph.GraphQueries.KTrussRounds) {
      r += 1
      val t0 = System.nanoTime()
      val und = cur
      val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ka = struct(col("da").as("d"), col("a").as("i"))
      val kb = struct(col("db").as("d"), col("b").as("i"))
      val o = und
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
        .select(
          when(ka < kb, col("a")).otherwise(col("b")).as("x"),
          when(ka < kb, col("b")).otherwise(col("a")).as("y"),
          when(ka < kb, kb).otherwise(ka).as("ky"))
        .localCheckpoint(true)
      val wedges = o.select(col("x"), col("y").as("u"), col("ky").as("ku"))
        .join(o.select(col("x"), col("y").as("w"), col("ky").as("kw")), "x")
        .filter(col("ku") < col("kw"))
        .select(col("x"), col("u"), col("w"))
      val tri = wedges.join(o.select(col("x").as("u"), col("y").as("w")), Seq("u", "w"))
        .select(col("x"), col("u"), col("w"))
      val support = tri
        .select(explode(array(
          struct(least(col("x"), col("u")).as("a"),
            greatest(col("x"), col("u")).as("b")),
          struct(least(col("x"), col("w")).as("a"),
            greatest(col("x"), col("w")).as("b")),
          struct(least(col("u"), col("w")).as("a"),
            greatest(col("u"), col("w")).as("b")))).as("ed"))
        .select(col("ed.a").as("a"), col("ed.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
      val next = cur.join(support, Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= k - 2)
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val n = next.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] round $r: survivors $n (${dt}%.2f s)")
      cur = next
    }
    spark.stop()
  }
}
