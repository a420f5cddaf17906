package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Image/audio/video quality signals (the curation pre-filter stage): exact
  * hand-computed values on known rasters/samples, the discrimination
  * claims (blur vs sharp, silence vs signal, clipping), the color->gray
  * conversion path, and quarantine posture.
  */
class MediaQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def grayPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def wavOf(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val b = new Array[Byte](44 + n)
    def putStr(s: String, off: Int): Unit =
      (0 until s.length).foreach(i => b(off + i) = s.charAt(i).toByte)
    def putLe32(v: Int, off: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def putLe16(v: Int, off: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    putStr("RIFF", 0); putLe32(36 + n, 4); putStr("WAVE", 8)
    putStr("fmt ", 12); putLe32(16, 16); putLe16(1, 20); putLe16(1, 22)
    putLe32(8000, 24); putLe32(8000, 28); putLe16(1, 32); putLe16(8, 34)
    putStr("data", 36); putLe32(n, 40)
    samples.indices.foreach(i => b(44 + i) = samples(i).toByte)
    b
  }

  test("imageQuality: exact hand-computed signals on a known 3x3 raster") {
    // raster: 10 20 30 / 40 50 60 / 70 80 90 — one interior pixel (1,1):
    // laplacian = 4*50 - 40 - 60 - 20 - 80 = 0 (a perfect gradient is
    // laplacian-flat); second image perturbs the center to 60:
    // laplacian = 4*60 - 40 - 60 - 20 - 80 = 40, squared 1600
    val flat = grayPng(3, 3, (x, y) => 10 + (y * 3 + x) * 10)
    val bump = grayPng(3, 3, (x, y) =>
      if (x == 1 && y == 1) 60 else 10 + (y * 3 + x) * 10)
    val got = Multimodal.imageQuality(
        Seq((1L, flat), (2L, bump)).toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    assert(got(1L) === ((9L, 50.0, 80, 0L, 0.0, true)))
    assert(got(2L)._4 === 1600L)
    assert(got(2L)._2 === (450.0 + 10.0) / 9)
  }

  test("imageQuality discriminates blur and exposure defects") {
    // constant image: zero contrast, zero laplacian (flat = no signal)
    val const = grayPng(9, 8, (_, _) => 128)
    // checkerboard at full rails: max contrast, huge laplacian, all
    // pixels clipped
    val checker = grayPng(9, 8, (x, y) => if ((x + y) % 2 == 0) 0 else 255)
    val got = Multimodal.imageQuality(
        Seq((1L, const), (2L, checker)).toDF("id", "payload"),
        "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(1L) === ((0, 0L, 0.0)))
    assert(got(2L)._1 === 255)
    assert(got(2L)._2 > 0L)
    assert(got(2L)._3 === 1.0)
  }

  test("imageQuality: color images convert to gray; junk quarantines") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x808080)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val rows = Multimodal.imageQuality(
        Seq((1L, buf.toByteArray), (2L, Array[Byte](9, 9)),
          (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload"),
        "id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(6))).toMap
    assert(rows(1L)._3 === true)
    assert(rows(1L)._1 === 16L)
    assert(math.abs(rows(1L)._2 - 128.0) <= 4.0) // gray conversion of 0x808080
    assert(!rows(2L)._3 && !rows(3L)._3)
  }

  test("audioQuality: exact signals, silence and clipping detection") {
    // 32 samples = 2 frames: frame 0 constant 128 (silent), frame 1
    // alternating 0/255 (clipped, loud)
    val s = Array.fill(16)(128) ++
      Array.tabulate(16)(i => if (i % 2 == 0) 0 else 255)
    val got = Multimodal.audioQuality(
        Seq((1L, wavOf(s))).toDF("id", "payload"), "id", "payload")
      .head()
    assert(got.getLong(1) === 32L)
    assert(got.getInt(2) === 0 && got.getInt(3) === 255)
    // rms: 16 * 0 + 8 * 128^2 + 8 * 127^2
    assert(got.getLong(4) === 8L * 128 * 128 + 8L * 127 * 127)
    assert(got.getDouble(5) === 16.0 / 32) // 16 rail samples
    assert(got.getDouble(6) === 1.0 / 2) // 1 of 2 frames silent
    assert(got.getBoolean(7))
    // non-wav payloads quarantine
    val junk = Multimodal.audioQuality(
        Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "payload"),
        "id", "payload").head()
    assert(!junk.getBoolean(7))
  }

  private def gifOf(frames: Seq[(Int, Int) => Int], w: Int = 9,
      h: Int = 8): Array[Byte] = {
    // identity 256-gray palette round-trips losslessly (the
    // syntheticAnimatedGifs trick)
    val cm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(_.toByte), Array.tabulate(256)(_.toByte),
      Array.tabulate(256)(_.toByte))
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        for (y <- 0 until h; x <- 0 until w)
          img.getRaster.setSample(x, y, 0, px(x, y))
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    buf.toByteArray
  }

  test("videoQuality: static video detected; activity measured exactly") {
    // video 1: three identical frames -> fully static, activity 0
    val still = gifOf(Seq.fill(3)((x, y) => 100))
    // video 2: frame 1 shifts every pixel by +5, frame 2 by +7 more ->
    // activity = (5*72 + 7*72) / (2*72) = 6.0, zero static pairs
    val moving = gifOf(Seq((_, _) => 100, (_, _) => 105, (_, _) => 112))
    // video 3: single frame -> static by definition
    val single = gifOf(Seq((_, _) => 40))
    val got = Multimodal.videoQuality(
        Seq((1L, still), (2L, moving), (3L, single)).toDF("id", "payload"),
        "id", "payload", maxFrames = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(got(1L) === ((3L, 100.0, 0.0, 1.0, true)))
    assert(got(2L)._3 === 6.0)
    assert(got(2L)._4 === 0.0)
    assert(got(2L)._2 === (100.0 + 105.0 + 112.0) / 3)
    assert(got(3L) === ((1L, 40.0, 0.0, 1.0, true)))
    // junk quarantines with a zeroed decoded=false row
    val junk = Multimodal.videoQuality(
        Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload"),
        "id", "payload", maxFrames = 8).head()
    assert(!junk.getBoolean(5))
  }
}
