package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real-codec image path: ImageIO decode must (a) round-trip the
  * rendered PNG pixels exactly, and (b) make dedup CONTENT-based —
  * the same pixels shipped in two different container formats (PNG
  * vs BMP, different bytes) must hash identically and pair up.
  */
class MultimodalImageSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def encode(pixels: Array[Int], fmt: String): Array[Byte] = {
    val img = new BufferedImage(Multimodal.ImgW, Multimodal.ImgH,
      BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    pixels.zipWithIndex.foreach { case (v, i) =>
      raster.setSample(i % Multimodal.ImgW, i / Multimodal.ImgW, 0, v)
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos),
      s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  test("renderPngs -> decodeGrayPixels round-trips the charHash pixels exactly") {
    import spark.implicits._
    val docs = Seq((1L, "hello graft"), (2L, "a very different document"))
      .toDF("doc_id", "text")
    val decoded = Multimodal.decodeGrayPixels(Multimodal.renderPngs(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    Seq((1L, "hello graft"), (2L, "a very different document")).foreach {
      case (id, text) =>
        val want = (0 until Multimodal.ImgW * Multimodal.ImgH).map(i =>
          graft.functions.TextFunctions.charHashLocal(text, i + 100L) % 256L)
        assert(decoded(id) === want, s"doc $id pixel drift through the codec")
    }
  }

  test("same pixels in PNG and BMP containers: bytes differ, dedup pairs them") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pixA = Array.fill(Multimodal.ImgW * Multimodal.ImgH)(rnd.nextInt(256))
    // B = A inverted → aHash bits flip wholesale, far outside hamming 3
    val pixB = pixA.map(255 - _)
    val png = encode(pixA, "png")
    val bmp = encode(pixA, "bmp")
    assert(!java.util.Arrays.equals(png, bmp),
      "containers unexpectedly byte-identical")
    val media = Seq((0L, png), (1L, bmp), (2L, encode(pixB, "png")))
      .toDF("doc_id", "blob")
    val pairs = Multimodal.phashFromPixels(
        Multimodal.decodeGrayPixels(media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((0L, 1L, 0L)),
      s"cross-format duplicate not found at hamming 0: ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L),
      s"inverted image wrongly paired: ${pairs.mkString(",")}")
  }

  test("resizeImage box filter equals the integer pool of the source pixels") {
    import spark.implicits._
    val docs = Seq((9L, "resize me please")).toDF("doc_id", "text")
    val row = Multimodal.resizeImage(Multimodal.renderPngs(docs))
      .collect().head
    val src = (0 until Multimodal.ImgW * Multimodal.ImgH).map(i =>
      graft.functions.TextFunctions.charHashLocal("resize me please",
        i + 100L) % 256L)
    assert(row.getLong(1) === Multimodal.ImgW / 2)
    assert(row.getLong(2) === Multimodal.ImgH / 2)
    for (j <- 0 until (Multimodal.ImgW / 2) * (Multimodal.ImgH / 2)) {
      val ox = j % (Multimodal.ImgW / 2)
      val oy = j / (Multimodal.ImgW / 2)
      val want = (for (dy <- 0 until 2; dx <- 0 until 2)
        yield src((oy * 2 + dy) * Multimodal.ImgW + ox * 2 + dx)).sum / 4
      assert(row.getLong(3 + j) === want, s"pixel o$j")
    }
  }

  test("video container: sparse sampling decodes frames 0/2/4 with the rendered pixels") {
    import spark.implicits._
    val docs = Seq((5L, "roll the film")).toDF("doc_id", "text")
    val got = Multimodal.sampleVideoFrames(Multimodal.renderVideos(docs))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = Set(0L, 2L, 4L).map { f =>
      val px = (0 until Multimodal.ImgW * Multimodal.ImgH).map(i =>
        graft.functions.TextFunctions.charHashLocal("roll the film",
          i + 100L + 1000L * f) % 256L)
      (f, px.sum, px.max)
    }
    assert(got === want,
      "sampled frames diverged from the rendered per-frame pixels")
  }

  test("renderWavs -> decodePcmSamples round-trips the charHash samples exactly") {
    import spark.implicits._
    val docs = Seq((1L, "listen to this"), (2L, "another sound"))
      .toDF("doc_id", "text")
    val got = Multimodal.decodePcmSamples(Multimodal.renderWavs(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, text) <- Seq(1L -> "listen to this", 2L -> "another sound")) {
      val want = (0 until Multimodal.AudioSamples).map(i =>
        (graft.functions.TextFunctions.charHashLocal(text, i + 300L)
          % 65536L) - 32768L)
      assert(got(id) === want, s"doc $id samples diverged through the codec")
    }
  }

  test("identical text renders byte-identical WAVs; decoded features agree") {
    import spark.implicits._
    val docs = Seq((1L, "same sound"), (2L, "same sound"))
      .toDF("doc_id", "text")
    val blobs = Multimodal.renderWavs(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(blobs(1L), blobs(2L)),
      "same text must render the same WAV bytes")
    val feats = Multimodal.audioFeatures(
        Multimodal.decodePcmSamples(Multimodal.renderWavs(docs)))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(feats(1L) === feats(2L))
    assert(feats(1L).head === Multimodal.AudioSamples.toLong)
  }
}
