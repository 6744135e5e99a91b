package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A non-`file:` Hadoop FileSystem scheme backed by local disk — the
  * stand-in for an object store (s3a/gcs/abfs) in a no-network test
  * environment. Everything in the connector, writer, and mutation layer
  * goes through `Path.getFileSystem(conf)` / `FileContext`, so passing
  * this spec demonstrates the layer is scheme-agnostic: any store with a
  * registered Hadoop FileSystem (the same registration s3a uses) works.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** FileContext-side registration (commitLatest's atomic overwrite-rename
  * resolves through AbstractFileSystem, not FileSystem).
  */
class GraftTestAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftTestFs, conf, "graftfs", false)

class ObjectStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graftfs.impl", classOf[GraftTestFs].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.graftfs.impl",
        classOf[GraftTestAbstractFs].getName)
      .getOrCreate()
    // an existing session from another suite won't have picked up the
    // builder confs — register on the shared hadoopConfiguration too
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    s.sparkContext.hadoopConfiguration
      .set("fs.AbstractFileSystem.graftfs.impl", classOf[GraftTestAbstractFs].getName)
    s
  }

  test("writer, connector, and versioned mutations work on a non-file scheme") {
    import spark.implicits._
    import graft.sources.graphar.{GraphArMutations, GraphArWriter}
    val local = java.nio.file.Files.createTempDirectory("gar_objstore").toString
    val base = s"graftfs://$local"
    assert(new Path(base).getFileSystem(
      spark.sessionState.newHadoopConf()).getScheme === "graftfs")

    // versioned init + copy-on-write commit, all under the scheme
    GraphArMutations.initEdges(spark, base,
      Seq((0L, 1L, 10.0), (1L, 2L, 20.0)).toDF("src", "dst", "w"), "OS",
      GraphArWriter.EdgeSpec("N", "link", "N",
        srcVertexCount = 8, dstVertexCount = 8,
        chunkSize = 4, srcChunkSize = 4, dstChunkSize = 4))
    GraphArMutations.addEdges(spark, base, Seq((2L, 3L, 30.0)).toDF("src", "dst", "w"))

    // delta log (parquet writes + _MAX_SEQ FileContext rename) + fold
    GraphArMutations.stageDelta(spark, base,
      adds = Some(Seq((3L, 4L, 40.0)).toDF("src", "dst", "w")), seq = Some(0L))
    val folded = GraphArMutations.currentEdges(spark, base)
      .select("src", "dst", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(folded === Set((0L, 1L, 10.0), (1L, 2L, 20.0), (2L, 3L, 30.0), (3L, 4L, 40.0)))
    assert(GraphArMutations.compactDeltas(spark, base) === 2L)

    // DSv2 read of the committed snapshot through the scheme
    val yaml = graft.streaming.GraphArSink.latestYaml(spark, base)
    assert(yaml.startsWith("graftfs:"))
    val back = spark.read.format("graphar").option("path", yaml)
      .option("src", "N").option("type", "link").option("dst", "N").load()
    assert(back.count() === 4L)
    // pushed src seek works through the scheme too
    assert(back.filter(col("_graphArSrcIndex") === 2L).count() === 1L)
  }
}
