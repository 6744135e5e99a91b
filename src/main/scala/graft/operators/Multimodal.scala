package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction
  * running as partition-batched executor-side functions.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. Everything around it — binary schema, per-partition batching,
  * output schema, partition-preserving execution — is the real pattern
  * you'd use at 100 TB: media bytes never shuffle; decode is a narrow
  * (map-side) transformation emitting small typed features; column-prune
  * upstream keeps only the blob + key in flight.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, contentHash: String)

  /** STUB decode: a real implementation would hand `bytes` to an image
    * codec. Deterministic fake: dimensions from byte length, md5 content
    * hash (so an independent engine can recompute it).
    */
  def fakeDecode(bytes: Array[Byte]): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    MediaMeta((bytes.length % 640) + 16, ((bytes.length * 7) % 480) + 16, hex)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  /** Feature-extract over a (key, blob) DataFrame: partition-batched map,
    * no shuffle, blob dropped from the output.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val m = fakeDecode(bytes)
        Row(id, bytes.length, m.width, m.height, m.contentHash)
      }
    }(enc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ingest text as utf-8 "media" bytes, then run the decode pipeline
    "m_features" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      extractFeatures(media)
    }
  )

  def oracle: Map[String, String] = Map(
    "m_features" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  octet_length(CAST(text AS BLOB)) % 640 + 16 AS fake_width,
        |  (octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS fake_height,
        |  md5(text) AS content_hash
        |FROM documents""".stripMargin
  )
}
