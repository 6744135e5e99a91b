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
  * The IMAGE path is real: [[renderPngs]] encodes actual PNG bytes with
  * the JDK's `javax.imageio` (no external deps), [[decodeGrayPixels]]
  * decodes any ImageIO-supported format (PNG/JPEG/BMP/GIF) back to
  * pixels, and pHash dedup + resize run over the DECODED pixels — the
  * gate proves the encode→decode round trip bit-for-bit because PNG is
  * lossless and the fixture's pixel values are a pure function of the
  * doc text the oracle can recompute. The AUDIO path is real too:
  * [[renderWavs]] writes RIFF/WAVE PCM with the JDK's
  * `javax.sound.sampled`, [[decodePcmSamples]] parses it back via the
  * container's own header, and [[audioFeatures]] runs over the DECODED
  * samples (lossless PCM → hash-checkable round trip). VIDEO runs on
  * a homemade length-prefixed container of REAL PNG frames
  * ([[renderVideos]]/[[sampleVideoFrames]]: container-index parse +
  * ImageIO decode of only the sampled frames — the JDK ships no video
  * codec, so the container is ours, but every frame goes through a
  * real image codec both ways). The codec-free byte-arithmetic shapes
  * (`fakeDecode`, [[resizeStub]], [[sampleFrames]]) are retained as
  * contrast fixtures pinning the plumbing — binary schema,
  * per-partition batching, output schema, partition-preserving
  * execution — which is the real pattern at 100 TB either way: media
  * bytes never shuffle; decode is a narrow (map-side) transformation
  * emitting small typed features; column-prune upstream keeps only the
  * blob + key in flight.
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

  /** REAL image resize: ImageIO-decode the blob, then 2× box-filter
    * (average-pool) downsample in exact integer arithmetic — out(x,y)
    * = ⌊Σ 2×2 block / 4⌋ — so the resized pixels are reproducible by
    * any engine from the source pixels (fp-free; AWT's own scalers
    * are platform-dependent, which a cross-engine gate can't accept).
    * Output: (doc_id, out_width, out_height, o0…o{ow·oh−1}). Same
    * shape as every decode op here: narrow map, blob dropped, small
    * typed row out.
    */
  def resizeImage(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val ow = ImgW / factor
    val oh = ImgH / factor
    val schema = StructType(
      StructField("doc_id", LongType, nullable = false) +:
        StructField("out_width", LongType, nullable = false) +:
        StructField("out_height", LongType, nullable = false) +:
        (0 until ow * oh).map(j =>
          StructField(s"o$j", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"doc $id: undecodable image blob")
        val raster = img.getRaster
        val out = (0 until ow * oh).map { j =>
          val ox = j % ow
          val oy = j / ow
          var s = 0L
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              s += raster.getSample(ox * factor + dx, oy * factor + dy, 0)
              dx += 1
            }
            dy += 1
          }
          s / (factor.toLong * factor)
        }
        Row.fromSeq(id +: ow.toLong +: oh.toLong +: out)
      }
    }(enc)
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

  /** Fixture image geometry: 8×4 grayscale = 32 pixels, matching the
    * 32-pseudo-pixel aHash the text-derived path uses. */
  val ImgW = 8
  val ImgH = 4

  private val pngSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  /** Render each doc as a REAL grayscale PNG (JDK ImageIO — no
    * external codec): pixel i (row-major) = charHash(text, i+100) mod
    * 256, the same value the DuckDB oracle recomputes from the text.
    * PNG is lossless, so a decode of these bytes must return exactly
    * these pixels — which is what makes a real codec round trip
    * oracle-checkable in a container with no image fixtures.
    */
  def renderPngs(docs: DataFrame, w: Int = ImgW, h: Int = ImgH): DataFrame = {
    val enc = RowEncoder.encoderFor(pngSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          val v = (graft.functions.TextFunctions
            .charHashLocal(text, i + 100L) % 256L).toInt
          raster.setSample(i % w, i / w, 0, v)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  private val pixelSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("p", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** REAL image decode (JDK ImageIO — PNG/JPEG/BMP/GIF): blob → gray
    * pixel array (band 0, row-major). Partition-batched map, blob
    * never shuffles, output is w·h longs per image. Content-identical
    * images in DIFFERENT container formats decode to the same array —
    * which is exactly why image dedup must run here, after decode,
    * not on the container bytes.
    */
  def decodeGrayPixels(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(pixelSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"doc $id: undecodable image blob")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val p = new Array[Long](w * h)
        var i = 0
        while (i < p.length) {
          p(i) = raster.getSample(i % w, i / w, 0).toLong
          i += 1
        }
        Row(id, p.toSeq)
      }
    }(enc)
  }

  private val wavSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  /** Fixture audio geometry: 64 samples of 16-bit mono PCM at 8 kHz. */
  val AudioSamples = 64
  val AudioRate = 8000f

  /** Render each doc as a REAL RIFF/WAVE file (JDK
    * `javax.sound.sampled` — no external codec): sample i =
    * charHash(text, i+300) mod 2¹⁶ − 32768, a signed 16-bit PCM value
    * the DuckDB oracle recomputes from the text. PCM WAV is lossless,
    * so a decode of these bytes must return exactly these samples —
    * the audio twin of [[renderPngs]]'s codec round trip.
    */
  def renderWavs(docs: DataFrame, n: Int = AudioSamples): DataFrame = {
    val enc = RowEncoder.encoderFor(wavSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = ((graft.functions.TextFunctions
            .charHashLocal(text, i + 300L) % 65536L) - 32768L).toInt
          pcm(2 * i) = (s & 0xff).toByte          // little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          AudioRate, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  private val sampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** REAL audio decode (JDK `javax.sound.sampled` — WAV/AIFF/AU PCM):
    * blob → signed 16-bit sample array via the container's parsed
    * format (sample rate, channels, endianness all come from the
    * header, not assumptions). Same shape as every decode op here:
    * narrow partition-batched map, blob never shuffles, small typed
    * row out.
    */
  def decodePcmSamples(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sampleSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"doc $id: expected 16-bit mono PCM, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1) & 0xff
          val v = if (fmt.isBigEndian) (bytes(2 * i) << 8) | hi
                  else (bytes(2 * i + 1) << 8) | lo
          out(i) = v.toShort.toLong
          i += 1
        }
        Row(id, out.toSeq)
      }
    }(enc)
  }

  /** Deterministic audio features over a (doc_id, s) sample frame —
    * all exact integers (a cross-engine gate can't hash fp RMS):
    * peak |s|, zero crossings (strict sign product < 0), energy Σs²,
    * Σ|s|. Pure column expressions over the decoded array, so the
    * whole op after decode stays in codegen.
    */
  def audioFeatures(samples: DataFrame): DataFrame =
    samples.select(
      col("doc_id"),
      size(col("s")).cast("long").as("n_samples"),
      aggregate(col("s"), lit(0L), (m, x) => greatest(m, abs(x)))
        .as("peak"),
      size(filter(sequence(lit(1), size(col("s")) - 1), i =>
        element_at(col("s"), i.cast("int")) *
          element_at(col("s"), i.cast("int") + 1) < 0))
        .cast("long").as("zero_cross"),
      aggregate(col("s"), lit(0L), (acc, x) => acc + x * x).as("energy"),
      aggregate(col("s"), lit(0L), (acc, x) => acc + abs(x)).as("sum_abs"))

  /** Fixture video geometry: 6 frames of the 8×4 gray image. */
  val VideoFrames = 6

  /** Render each doc as a VIDEO: a length-prefixed container (4-byte
    * big-endian frame length + PNG bytes, repeated) of [[VideoFrames]]
    * REAL PNG frames — frame f's pixel i = charHash(text, i+100+1000f)
    * mod 256, recomputable by the oracle. The JDK ships no video
    * codec, so the container is homemade — but every byte in it is a
    * real codec's output, and the decode side must do the two things
    * a real video pipeline does: parse the container index and run an
    * actual image codec per frame.
    */
  def renderVideos(docs: DataFrame, frames: Int = VideoFrames,
                   w: Int = ImgW, h: Int = ImgH): DataFrame = {
    val enc = RowEncoder.encoderFor(pngSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < w * h) {
            val v = (graft.functions.TextFunctions
              .charHashLocal(text, i + 100L + 1000L * f) % 256L).toInt
            raster.setSample(i % w, i / w, 0, v)
            i += 1
          }
          val fb = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", fb)
          val bytes = fb.toByteArray
          out.writeInt(bytes.length)
          out.write(bytes)
          f += 1
        }
        out.flush()
        Row(id, bos.toByteArray)
      }
    }(enc)
  }

  private val videoFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("psum", LongType, nullable = false),
    StructField("pmax", LongType, nullable = false)))

  /** SPARSE frame sampling over the real container: walk the length
    * prefixes to index the frames (a container parse, no decode),
    * then ImageIO-decode ONLY the k sampled frames (evenly spaced,
    * frame j·n/k) and emit integer pixel features per frame. This is
    * the production shape — a keyframe sampler seeks and decodes its
    * samples, never the whole stream. Narrow map, blob never
    * shuffles, k small typed rows out per video.
    */
  def sampleVideoFrames(media: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val enc = RowEncoder.encoderFor(videoFrameSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // container index pass: frame offsets from the length prefixes
        val offs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var p = 0
        while (p + 4 <= bytes.length) {
          val len = java.nio.ByteBuffer.wrap(bytes, p, 4).getInt
          offs += ((p + 4, len))
          p += 4 + len
        }
        val n = offs.length
        require(n > 0,
          s"doc $id: empty or truncated frame container (no length-prefixed frames)")
        // evenly-spaced sample; distinct because j*n/k repeats indices
        // when a video has fewer frames than k (duplicate (doc_id,
        // frame_idx) rows would violate the output's implied key)
        (0 until k).iterator.map(j => j * n / k).distinct.map { fi =>
          val (off, len) = offs(fi)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes, off, len))
          require(img != null, s"doc $id frame $fi: undecodable frame")
          val raster = img.getRaster
          var s = 0L
          var mx = 0L
          var i = 0
          val wh = img.getWidth * img.getHeight
          while (i < wh) {
            val v = raster.getSample(i % img.getWidth, i / img.getWidth, 0).toLong
            s += v
            if (v > mx) mx = v
            i += 1
          }
          Row(id, fi.toLong, s, mx)
        }
      }
    }(enc)
  }

  /** Perceptual-hash (aHash) near-duplicate detection over media — the
    * image-dedup step of a multimodal ingest pipeline. A real decoder
    * would downscale the image to a tiny grayscale grid; the STUB
    * derives 32 deterministic pseudo-pixels from the content (seeded
    * rolling hashes, so the oracle recomputes them), then applies the
    * textbook aHash: bit i = pixel i above the image mean (compared as
    * `32·p_i ≥ Σp` — integer cross-multiplication, no fp mean), packed
    * into one 32-bit code per image.
    *
    * Pairing uses the same 4-band pigeonhole as SimHash text dedup
    * (exhaustive for Hamming ≤ 3): images agreeing on ≥1 of 4 bytes
    * collide, exact bit-count verifies. Scale shape: one int per image
    * shuffles (never pixels or blobs), band buckets bound candidate
    * fan-out, verification is a tiny-pair join — the image twin of the
    * candidates-then-verify dedup family.
    */
  def phashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.charHash
    val px = transform(sequence(lit(0), lit(31)), i =>
      pmod(charHash(col("text"), i + 100), lit(256L)))
    phashFromPixels(media.select(col("doc_id"), px.as("p")), maxHamming)
  }

  /** The REAL-decode composition: render actual PNGs, decode them with
    * ImageIO, aHash the DECODED pixels, band-join. Because PNG is
    * lossless and the rendered pixel values are the same charHash
    * formula the text path uses, this produces the identical pair set
    * — with the whole codec round trip on the execution path (the
    * gate's oracle SQL is unchanged, so any decode drift hash-fails).
    */
  def phashPairsImageIO(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    phashFromPixels(decodeGrayPixels(renderPngs(docs)), maxHamming)

  /** aHash + banded pairing from an explicit (doc_id, p) pixel frame
    * (text-derived pseudo-pixels or [[decodeGrayPixels]] output). */
  def phashFromPixels(px: DataFrame, maxHamming: Int = 3): DataFrame = {
    val h = px
      .select(col("doc_id"), col("p"))
      .withColumn("psum", aggregate(col("p"), lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"),
        aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) =>
          acc + when(element_at(col("p"), b.cast("int") + 1) * 32 >= col("psum"),
            pow(lit(2.0), b).cast("long")).otherwise(lit(0L))).as("phash"))
    // band key b = bits [8b, 8b+8) via plain arithmetic (phash < 2^32,
    // exact in double) — the same mirror-able form SimHash banding uses
    val bands = h.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("key",
        pmod(floor(col("phash") / pow(lit(2.0), col("b") * 8)).cast("long"),
          lit(256L)))
    val a = bands.select(col("doc_id").as("a_id"), col("phash").as("a_hash"),
      col("b"), col("key"))
    val bb = bands.select(col("doc_id").as("b_id"), col("phash").as("b_hash"),
      col("b").as("b2"), col("key").as("k2"))
    a.join(bb, col("b") === col("b2") && col("key") === col("k2") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // perceptual-hash near-dup pairs over REAL PNG encode→ImageIO
    // decode (oracle recomputes the pixels from text — lossless PNG
    // makes the round trip hash-checkable)
    "m_phash_dup" -> { (s, d) =>
      phashPairsImageIO(t(s, d, "documents").select(col("doc_id"), col("text")))
    },
    // ingest text as utf-8 "media" bytes, then run the decode pipeline
    "m_features" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      extractFeatures(media)
    },
    // REAL decode + integer box-filter downsample of the rendered PNGs
    "m_resize" -> { (s, d) =>
      resizeImage(renderPngs(
        t(s, d, "documents").select(col("doc_id"), col("text"))))
    },
    // codec-free byte-arithmetic CONTRAST TWIN of m_resize: same
    // blob-in/typed-row-out plumbing with the decode replaced by
    // column arithmetic — kept beside the real ImageIO path to pin
    // the plumbing without a codec (the video-tier shape)
    "m_resize_bytes" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      resizeStub(media)
    },
    // REAL audio round trip: render RIFF/WAVE PCM bytes, decode them
    // with javax.sound.sampled, compute integer features over the
    // DECODED samples (oracle recomputes samples from text — lossless
    // PCM makes the codec round trip hash-checkable)
    "m_audio_features" -> { (s, d) =>
      audioFeatures(decodePcmSamples(renderWavs(
        t(s, d, "documents").select(col("doc_id"), col("text")))))
    },
    "m_frame_sample" -> { (s, d) =>
      val media = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      sampleFrames(media)
    },
    // REAL video path: render a length-prefixed container of real PNG
    // frames, then sparse-sample — container-index parse + ImageIO
    // decode of ONLY the sampled frames (oracle recomputes the frame
    // pixels from text; lossless PNG keeps it hash-exact)
    "m_video_frames" -> { (s, d) =>
      sampleVideoFrames(renderVideos(
        t(s, d, "documents").select(col("doc_id"), col("text"))))
    },
    // STUB embedder: k rolling-hash projections of the content → a
    // float vector (a real one would run a vision/audio encoder on the
    // decoded media; deterministic here so the oracle can recompute).
    // The gate sees per-dim doubles (float-array stringification differs
    // between pandas/duckdb renderers; float→double casts are exact and
    // render identically); the array column itself feeds m_embed_topk.
    "m_embed" -> { (s, d) =>
      embedStub(t(s, d, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id") +:
          (0 until 8).map(i =>
            element_at(col("embedding"), i + 1).cast("double").as(s"d$i")): _*)
    },
    // → straight into the ANN operator: top-3 neighbors of docs 0-3 by
    // cosine over the derived embeddings (the multimodal→similarity
    // pipeline end-to-end, oracle re-runs the whole chain)
    "m_embed_topk" -> { (s, d) =>
      val emb = embedStub(t(s, d, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id").as("vec_id"), col("embedding"))
      Similarity.bruteForceTopK(emb, col("vec_id") < 4, 3)
    }
  )

  /** Deterministic 8-dim embedding: dim i = charHash(text, seed=i+1)
    * scaled to [0, 1). Pure column expressions — map-side, codegen'd.
    */
  def embedStub(docs: DataFrame, dims: Int = 8): DataFrame =
    docs.select(col("doc_id"),
      array((1 to dims).map(i =>
        (pmod(graft.functions.TextFunctions.charHash(col("text"), lit(i)), lit(1000L)) /
          lit(1000.0)).cast("float")): _*).as("embedding"))

  def oracle: Map[String, String] = Map(
    "m_phash_dup" ->
      s"""WITH px AS (
         |  SELECT doc_id, list_transform(range(0, 32), i ->
         |    ${varSeedHashSql("i + 100")} % 256) AS p
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b ->
         |    CASE WHEN p[CAST(b AS INTEGER) + 1] * 32 >= list_sum(p)
         |      THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS phash
         |  FROM px),
         |bands AS (
         |  SELECT doc_id, phash, b, (phash >> CAST(8*b AS INTEGER)) & 255 AS key
         |  FROM h, (SELECT unnest(range(0, 4)) AS b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         |  CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
         |FROM cand JOIN h ha ON ha.doc_id = a_id JOIN h hb ON hb.doc_id = b_id
         |WHERE bit_count(xor(ha.phash, hb.phash)) <= 3""".stripMargin,

    "m_features" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  octet_length(CAST(text AS BLOB)) % 640 + 16 AS fake_width,
        |  (octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS fake_height,
        |  md5(text) AS content_hash
        |FROM documents""".stripMargin,

    // real-decode resize: recompute the rendered pixels from text and
    // apply the same ⌊2×2 block sum / 4⌋ pool the Spark side runs on
    // the DECODED image — exact integers end to end
    "m_resize" -> {
      val ow = ImgW / 2
      val oh = ImgH / 2
      val outs = (0 until ow * oh).map { j =>
        val ox = j % ow
        val oy = j / ow
        val cells = for (dy <- 0 until 2; dx <- 0 until 2)
          yield s"p[${(oy * 2 + dy) * ImgW + ox * 2 + dx + 1}]"
        s"CAST((${cells.mkString(" + ")}) // 4 AS BIGINT) AS o$j"
      }.mkString(",\n  ")
      s"""WITH px AS (
         |  SELECT doc_id, list_transform(range(0, ${ImgW * ImgH}), i ->
         |    ${varSeedHashSql("i + 100")} % 256) AS p
         |  FROM documents)
         |SELECT doc_id, CAST($ow AS BIGINT) AS out_width,
         |  CAST($oh AS BIGINT) AS out_height,
         |  $outs
         |FROM px""".stripMargin
    },

    // audio features over the decoded PCM: recompute sample i =
    // charHash(text, i+300) % 2^16 - 32768 and the same integer chain
    "m_audio_features" ->
      s"""WITH smp AS (
         |  SELECT doc_id, list_transform(range(0, $AudioSamples), i ->
         |    ${varSeedHashSql("i + 300")} % 65536 - 32768) AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST($AudioSamples AS BIGINT) AS n_samples,
         |  CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
         |  CAST(len(list_filter(range(1, $AudioSamples), i ->
         |    s[i] * s[i + 1] < 0)) AS BIGINT) AS zero_cross,
         |  CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS energy,
         |  CAST(list_sum(list_transform(s, x -> abs(x))) AS BIGINT) AS sum_abs
         |FROM smp""".stripMargin,

    "m_resize_bytes" ->
      """SELECT doc_id,
        |  least(octet_length(CAST(text AS BLOB)) % 640 + 16, 64) AS out_width,
        |  least((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16, 64) AS out_height,
        |  least(octet_length(CAST(text AS BLOB)), 256) AS out_bytes,
        |  md5(substring(hex(CAST(text AS BLOB)), 1, 512)) AS resized_hash
        |FROM documents""".stripMargin,

    // sampled frames 0/2/4 of the 6-frame container: recompute frame
    // f's pixels (seed i + 100 + 1000f) and the same integer features
    "m_video_frames" ->
      s"""WITH fx AS (SELECT unnest([0, 2, 4]) AS f),
         |px AS (
         |  SELECT doc_id, f, list_transform(range(0, ${ImgW * ImgH}), i ->
         |    ${varSeedHashSql("i + 100 + 1000*f")} % 256) AS p
         |  FROM documents CROSS JOIN fx)
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
         |  CAST(list_sum(p) AS BIGINT) AS psum,
         |  CAST(list_max(p) AS BIGINT) AS pmax
         |FROM px""".stripMargin,

    "m_frame_sample" ->
      """WITH m AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS h FROM documents)
        |SELECT doc_id, i AS frame_idx,
        |  md5(substring(h, CAST(1 + i * ((length(h) // 2) // 4) * 2 AS INTEGER), 32)) AS frame_hash
        |FROM m, (SELECT unnest(range(0, 4)) AS i)""".stripMargin,

    "m_embed" -> {
      val dims = (0 until 8).map(i =>
        s"CAST(CAST((${embedHashSql(i + 1)} % 1000) / 1000.0 AS FLOAT) AS DOUBLE) AS d$i")
        .mkString(",\n  ")
      s"SELECT doc_id,\n  $dims\nFROM documents"
    },

    "m_embed_topk" -> {
      val dimList = (1 to 8).map(i =>
        s"CAST((${embedHashSql(i)} % 1000) / 1000.0 AS FLOAT)").mkString(", ")
      s"""WITH emb AS (SELECT doc_id AS vec_id, [$dimList] AS embedding FROM documents),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM emb WHERE vec_id < 4),
         |c AS (SELECT vec_id AS n_id, embedding AS n_emb FROM emb),
         |scored AS (
         |  SELECT q_id, n_id, $embCosSql AS cos
         |  FROM c JOIN q ON q_id <> n_id),
         |ranked AS (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM scored)
         |SELECT q_id, n_id, rank FROM ranked WHERE rank <= 3""".stripMargin
    }
  )

  /** DuckDB twin of `TextFunctions.charHash(text, <expr>)` with the
    * seed given as a SQL expression (a lambda variable in practice).
    */
  private def varSeedHashSql(seedExpr: String): String =
    s"list_reduce(list_prepend(CAST($seedExpr AS BIGINT), " +
      s"list_transform(regexp_extract_all(text, '.'), c -> CAST(ord(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.TextFunctions.HashMod})"

  /** DuckDB twin of `TextFunctions.charHash(text, seed)`. */
  private def embedHashSql(seed: Int): String =
    s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"list_transform(regexp_extract_all(text, '.'), c -> CAST(ord(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.TextFunctions.HashMod})"

  /** 8-dim sequential-fold cosine — Similarity's shared parity fold. */
  private def embCosSql: String = Similarity.cosSql("q_emb", "n_emb", dims = 8)
}
