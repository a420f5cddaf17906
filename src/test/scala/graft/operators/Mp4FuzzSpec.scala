package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Totality fuzz for the MP4/ISO-BMFF walk (the VideoFuzzSpec contract
  * over the box-structured container): truncations at every structural
  * boundary class, single-byte corruptions, random garbage with and
  * without a plausible ftyp prefix, box-size attacks (zero, negative,
  * 64-bit largesize pointing past the payload), null/empty — the walk
  * must never fail a task, must emit one observable row per id, and
  * must mark only genuinely decoded frames. Deterministic across runs
  * and layouts.
  */
class Mp4FuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("hostile MP4 sweep: total, deterministic, quarantined") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    val valid = Multimodal.syntheticMjpegMp4s(
      Seq((0L, "seed family")).toDF("id", "family"), "id", "family",
      nFrames = 4).collect()(0).getAs[Array[Byte]]("payload")
    val payloads = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var id = 1L
    // truncations: inside ftyp, inside mdat (sample data), at the
    // mdat/moov boundary, inside the sample tables, off-by-one at end
    for (cut <- Seq(1, 4, 9, 20, valid.length / 8, valid.length / 3,
        valid.length / 2, valid.length - 40, valid.length - 1)) {
      payloads += ((id, valid.take(cut))); id += 1
    }
    // single-byte corruptions at random offsets (sizes, fourccs, table
    // entries, sample bytes all get hit across 16 draws)
    for (_ <- 0 until 16) {
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      payloads += ((id, b)); id += 1
    }
    // box-size attacks on the first box (ftyp): size 0 at top level
    // (to-EOF), size 1 with a largesize pointing past the payload,
    // a negative-looking 32-bit size
    locally {
      val zero = valid.clone()
      zero(0) = 0; zero(1) = 0; zero(2) = 0; zero(3) = 0
      payloads += ((id, zero)); id += 1
      val large = valid.clone()
      large(0) = 0; large(1) = 0; large(2) = 0; large(3) = 1
      payloads += ((id, large)); id += 1 // largesize bytes = old body: huge
      val neg = valid.clone()
      neg(0) = 0xFF.toByte; neg(1) = 0xFF.toByte
      neg(2) = 0xFF.toByte; neg(3) = 0xF0.toByte
      payloads += ((id, neg)); id += 1
    }
    // random garbage, raw and ftyp-prefixed
    for (n <- Seq(0, 1, 7, 64, 512, 4096)) {
      val g = new Array[Byte](n); rnd.nextBytes(g)
      payloads += ((id, g)); id += 1
      val pre = valid.take(24) ++ g
      payloads += ((id, pre)); id += 1
    }
    payloads += ((id, null)); id += 1
    payloads += ((id, valid)) // the healthy row rides along
    val df = payloads.toSeq.toDF("id", "payload").repartition(5)
    def run() = Multimodal.mp4FrameDHash(df, "id", "payload",
      maxFrames = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val rows = run() // a task failure would throw here
    assert(rows.map(_._1).toSet == payloads.map(_._1).toSet,
      "an input id vanished from the walk output")
    rows.foreach { case (i, f, _, dec) =>
      assert(if (dec) f >= 0 else f == -1, s"row $i: frame=$f decoded=$dec")
    }
    assert(rows.filter(_._1 == id).count(_._4) == 4,
      "healthy container must still decode next to hostile ones")
    assert(run() == rows, "walk output must be deterministic")
  }

  test("sample-table bombs: stsz sizes and stco offsets pointing past " +
      "the payload quarantine; a huge stsz count cannot allocate") {
    import spark.implicits._
    val valid = Multimodal.syntheticMjpegMp4s(
      Seq((0L, "bomb family")).toDF("id", "family"), "id", "family",
      nFrames = 4).collect()(0).getAs[Array[Byte]]("payload")
    def findBox(tag: String): Int = {
      val t = tag.getBytes("ISO-8859-1")
      (0 until valid.length - 4).find(i =>
        valid(i) == t(0) && valid(i + 1) == t(1) &&
          valid(i + 2) == t(2) && valid(i + 3) == t(3)).get
    }
    def quarantined(b: Array[Byte]): Boolean = {
      val out = Multimodal.mp4FrameDHash(
        Seq((1L, b)).toDF("id", "payload"), "id", "payload",
        maxFrames = 8).collect()
      out.length == 1 && out(0).getInt(1) == -1 && !out(0).getBoolean(3)
    }
    // stsz: first sample size -> far past the payload
    val szBomb = valid.clone()
    val sz = findBox("stsz")
    szBomb(sz + 4 + 4 + 4 + 4) = 0x7F.toByte // sample 0 size high byte
    assert(quarantined(szBomb), "oversized stsz entry must quarantine")
    // stsz: sample COUNT inflated to billions — enumeration must stay
    // bounded (maxFrames) and the size reads must fail closed
    val cntBomb = valid.clone()
    cntBomb(sz + 4 + 4 + 4) = 0x7F.toByte // count high byte
    // a billions-claimed sample count must either quarantine or decode
    // at most maxFrames rows — bounded work, no hang, no task failure
    val cntOut = Multimodal.mp4FrameDHash(
      Seq((1L, cntBomb)).toDF("id", "payload"), "id", "payload",
      maxFrames = 8).collect()
    assert(cntOut.length <= 8, s"unbounded enumeration: ${cntOut.length}")
    // stco: chunk-2 offset past the payload end
    val co = findBox("stco")
    val coBomb = valid.clone()
    coBomb(co + 4 + 4 + 4 + 4) = 0x7F.toByte // offset 2 high byte
    assert(quarantined(coBomb), "out-of-range stco offset must quarantine")
  }
}
