package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** MJPEG-in-AVI: the hand-built RIFF container + JPEG frame walk.
  * The load-bearing test is decode == analytic: the synthetic frames
  * draw each row's 9 samples from levels 30 apart (a md5-rank
  * permutation), so the adjacent-sample orderings dHash reads must
  * survive the LOSSY quality-1.0 JPEG round-trip exactly — pinned here
  * over a whole corpus, which is what licenses the SQL oracle to replay
  * the pipeline from the permutation instead of the codec.
  */
class AviSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val families =
    (0 until 12).map(i => s"family content number $i with words")
  // two videos per family -> same-family pairs must all surface
  private def corpus = families.zipWithIndex.flatMap { case (fam, i) =>
    Seq((i.toLong * 2, fam), (i.toLong * 2 + 1, fam))
  }.toDF("vid", "family")

  private def avis = Multimodal.syntheticMjpegAvis(
    corpus, "vid", "family", nFrames = 4)

  /** independent reimplementation of the generator's rank contract */
  private def analyticDHash(family: String, f: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    var sig = 0L
    for (y <- 0 until 8) {
      val keys = (0 until 9).map(x => (hex(s"$family:$f:$y:$x"), x))
      val rank = keys.sorted.zipWithIndex.map { case ((_, x), r) => x -> r }
        .toMap
      for (x <- 0 until 8)
        if (rank(x) > rank(x + 1)) sig |= 1L << (y * 8 + x)
    }
    sig
  }

  test("decoded dHash equals the analytic permutation dHash for every frame") {
    val got = Multimodal.aviFrameDHash(avis, "id", "payload", maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size === 24 * 4)
    corpus.collect().foreach { r =>
      val (vid, fam) = (r.getLong(0), r.getString(1))
      for (f <- 0 until 4)
        assert(got((vid, f)) === analyticDHash(fam, f),
          s"vid=$vid frame=$f: lossy JPEG broke the rank ordering")
    }
  }

  test("jpeg round-trip error stays far below the 30-level gap") {
    // decode one container's frames and compare raw samples to the
    // stored levels: max error must be < 15 (half the gap) with margin
    val payload = avis.filter(col("id") === 0L)
      .select("payload").as[Array[Byte]].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // walk: find 00dc chunks naively (test-local)
    val hay = new String(payload, "ISO-8859-1")
    var idx = hay.indexOf("00dc")
    var maxErr = 0
    var nFrames = 0
    while (idx >= 0) {
      val size = (payload(idx + 4) & 0xff) | ((payload(idx + 5) & 0xff) << 8) |
        ((payload(idx + 6) & 0xff) << 16) | ((payload(idx + 7) & 0xff) << 24)
      val jb = java.util.Arrays.copyOfRange(payload, idx + 8, idx + 8 + size)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb))
      assert(img != null)
      val fam = families(0)
      val f = nFrames
      for (y <- 0 until 8) {
        val keys = (0 until 9).map(x => (hex(s"$fam:$f:$y:$x"), x))
        val rank = keys.sorted.zipWithIndex.map { case ((_, x), r) => x -> r }
          .toMap
        for (x <- 0 until 9) {
          val want = Multimodal.MjpegLevels(rank(x))
          val gotV = img.getRaster.getSample(x, y, 0)
          maxErr = math.max(maxErr, math.abs(gotV - want))
        }
      }
      nFrames += 1
      idx = hay.indexOf("00dc", idx + 8 + size)
    }
    assert(nFrames === 4)
    assert(maxErr < 15, s"jpeg error $maxErr eats the ordering margin")
  }

  test("videoNearDups over the AVI walk finds exactly the same-family pairs") {
    val frames = Multimodal.aviFrameDHash(avis, "id", "payload", maxFrames = 8)
      .filter(col("decoded"))
    val pairs = Multimodal.videoNearDups(frames, "id", "frame_idx", "phash",
      minFrames = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 12).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(pairs === want)
  }

  test("hostile payloads quarantine as stub rows; the walk never throws") {
    val good = avis.filter(col("id") < 2)
    val goodBytes = good.select("payload").as[Array[Byte]].head()
    val hostile = Seq(
      (100L, null.asInstanceOf[Array[Byte]]),
      (101L, Array[Byte](1, 2, 3)),
      (102L, "JUNKJUNKJUNKJUNK".getBytes("ISO-8859-1")),
      (103L, goodBytes.take(40)), // truncated inside hdrl
      (104L, {
        val b = goodBytes.clone()
        // corrupt a movi-area byte run so a frame fails to decode:
        // blank the JPEG SOI of every frame chunk
        val hay = new String(b, "ISO-8859-1")
        val i = hay.indexOf("00dc")
        b(i + 8) = 0; b(i + 9) = 0
        b
      })
    ).toDF("vid", "payload")
    val rows = Multimodal.aviFrameDHash(hostile, "vid", "payload",
      maxFrames = 8).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.getInt(1) === -1 && !r.getBoolean(3)))
  }

  test("maxFrames bounds the walk") {
    val capped = Multimodal.aviFrameDHash(avis.filter(col("id") === 0L),
      "id", "payload", maxFrames = 2).collect()
    assert(capped.length === 2)
    assert(capped.map(_.getInt(1)).sorted.toSeq === Seq(0, 1))
  }

  test("seeded byte fuzz: random mutations of a real AVI never throw, never inflate") {
    val base = avis.filter(col("id") === 0L)
      .select("payload").as[Array[Byte]].head()
    val rnd = new scala.util.Random(7)
    val mutants = (0 until 60).map { i =>
      val m = rnd.nextInt(4) match {
        case 0 => // random byte flips anywhere (headers, sizes, frames)
          val b = base.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case 1 => base.take(rnd.nextInt(base.length)) // truncation
        case 2 => // size-field corruption at a random chunk boundary
          val b = base.clone()
          val off = 4 + rnd.nextInt(b.length - 8)
          val v = rnd.nextInt()
          (0 until 4).foreach(k => b(off + k) = ((v >> (8 * k)) & 0xff).toByte)
          b
        case _ => // pure noise of plausible length
          val b = new Array[Byte](16 + rnd.nextInt(400))
          rnd.nextBytes(b); b
      }
      (1000L + i, m)
    }.toDF("vid", "payload")
    val rows = Multimodal.aviFrameDHash(mutants, "vid", "payload",
      maxFrames = 8).collect()
    // every mutant yields >= 1 row (stub or frames), never more than
    // maxFrames rows, and the job never threw to get here
    val byId = rows.groupBy(_.getLong(0))
    assert(byId.size === 60)
    assert(byId.values.forall(rs => rs.length >= 1 && rs.length <= 8))
  }
}
