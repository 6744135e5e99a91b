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

  /** STUB resize, expressed as pure column expressions (the codec-free
    * shape: when the "decode" is byte arithmetic, no mapPartitions is
    * needed and the whole op stays in whole-stage codegen). Real codec
    * semantics are stubbed as crop-to-`maxBytes` + dimension clamp; the
    * plumbing — blob in, small typed row out, no shuffle — is the real
    * pattern.
    */
  def resizeStub(media: DataFrame, maxBytes: Int = 256, maxDim: Int = 64): DataFrame = {
    val n = length(col("blob"))
    media.select(
      col("doc_id"),
      least(pmod(n, lit(640)) + 16, lit(maxDim)).as("out_width"),
      least(pmod(n * 7, lit(480)) + 16, lit(maxDim)).as("out_height"),
      least(n, lit(maxBytes)).as("out_bytes"),
      // byte range via the hex STRING (2 chars/byte): engines without
      // blob slicing (the DuckDB oracle) can reproduce it exactly
      md5(encode(substring(hex(col("blob")), 1, maxBytes * 2), "UTF-8"))
        .as("resized_hash"))
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_hash", StringType, nullable = false)))

  /** STUB frame sampling: treat the blob as a "video" and hash `k`
    * fixed-size windows at evenly spaced byte offsets (a real decoder
    * would seek keyframes). Partition-batched flatMap — one input row
    * fans out to k frame rows executor-side, the blob itself never
    * shuffles and is dropped from the output.
    */
  def sampleFrames(media: DataFrame, k: Int = 4, frameBytes: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val step = bytes.length / k
        (0 until k).iterator.map { i =>
          val off = i * step
          val frame = bytes.slice(off, math.min(off + frameBytes, bytes.length))
          val hex = frame.map("%02X".format(_)).mkString
          md.reset()
          val hash = md.digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
          Row(id, i.toLong, hash)
        }
      }
    }(enc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ingest text as utf-8 "media" bytes, then run the decode pipeline
    "m_features" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      extractFeatures(media)
    },
    "m_resize" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      resizeStub(media)
    },
    "m_frame_sample" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      sampleFrames(media)
    }
  )

  def oracle: Map[String, String] = Map(
    "m_features" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  octet_length(CAST(text AS BLOB)) % 640 + 16 AS fake_width,
        |  (octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS fake_height,
        |  md5(text) AS content_hash
        |FROM documents""".stripMargin,

    "m_resize" ->
      """SELECT doc_id,
        |  least(octet_length(CAST(text AS BLOB)) % 640 + 16, 64) AS out_width,
        |  least((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16, 64) AS out_height,
        |  least(octet_length(CAST(text AS BLOB)), 256) AS out_bytes,
        |  md5(substring(hex(CAST(text AS BLOB)), 1, 512)) AS resized_hash
        |FROM documents""".stripMargin,

    "m_frame_sample" ->
      """WITH m AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS h FROM documents)
        |SELECT doc_id, i AS frame_idx,
        |  md5(substring(h, CAST(1 + i * ((length(h) // 2) // 4) * 2 AS INTEGER), 32)) AS frame_hash
        |FROM m, (SELECT unnest(range(0, 4)) AS i)""".stripMargin
  )
}
