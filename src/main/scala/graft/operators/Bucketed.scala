package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.t

/** Bucketed-table support: materializes lineitem/orders copies bucketed +
  * sorted on the join key, so fact-to-fact joins plan with no Exchange on
  * either side (asserted in PlanSpec). At cluster scale this is how
  * repeatedly-joined fact tables are stored once and joined many times
  * without shuffling.
  */
object Bucketed {

  private val registered = scala.collection.mutable.Set.empty[String]

  /** Returns (lineitem, orders) as bucketed tables for the sf dir,
    * creating them on first use per (session, sf).
    */
  def tables(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = synchronized {
    // key on the FULL canonical path (hashed into the table name):
    // basename-only keys would silently reuse another dir's buckets when
    // two data dirs share a basename (/x/sf0.01 vs /y/sf0.01)
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val sfName = new java.io.File(sfDir).getName.replace(".", "_") + "_" +
      Integer.toHexString(canonical.hashCode)
    val (liName, oName) = (s"li_bucketed_$sfName", s"orders_bucketed_$sfName")
    val key = spark.hashCode() + "/" + sfName
    if (!registered.contains(key) || !spark.catalog.tableExists(liName)) {
      // a previous session's in-memory catalog forgot the tables but
      // their warehouse dirs persist — remove stale locations first
      Seq(liName, oName).foreach { n =>
        if (!spark.catalog.tableExists(n)) {
          val wh = spark.conf.get("spark.sql.warehouse.dir")
          val p = new org.apache.hadoop.fs.Path(s"$wh/$n")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
      t(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
      t(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oName)
      registered += key
    }
    (spark.table(liName), spark.table(oName))
  }
}
