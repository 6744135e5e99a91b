package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.util.ProbeCheckpoint

/** The serving-probe resilience knob: `spark.graft.probeCheckpoint`
  * selects HOW probes pin their tiny intermediate frames (local
  * checkpoint / reliable checkpoint / persist) at the one
  * [[ProbeCheckpoint]] choke point — rows must be identical under
  * every strategy (the knob trades failure mode, never results).
  */
class ProbeCheckpointSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def withMode(mode: Option[String])(body: => Unit): Unit = {
    mode.fold(spark.conf.unset(ProbeCheckpoint.ConfKey))(
      spark.conf.set(ProbeCheckpoint.ConfKey, _))
    try body finally spark.conf.unset(ProbeCheckpoint.ConfKey)
  }

  test("every probeCheckpoint mode serves identical rows; an unknown mode fails loud") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = "/tmp/graft_probepin_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Similarity.writeIvfIndex(emb, dir)
      val queries = emb.filter(col("vec_id") < 6)
      def serve(): Set[String] =
        Similarity.ivfTopKStored(spark, dir, queries, 3).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      val want = serve() // default (conf unset) = local
      assert(want.nonEmpty)
      withMode(Some("local")) { assert(serve() === want) }
      withMode(Some("persist")) { assert(serve() === want) }
      withMode(Some("reliable")) {
        spark.sparkContext.setCheckpointDir(s"$dir/_ckpt")
        assert(serve() === want)
      }
      withMode(Some("bogus")) {
        assertThrows[IllegalArgumentException](serve())
      }
    } finally rm(dir)
  }
}
