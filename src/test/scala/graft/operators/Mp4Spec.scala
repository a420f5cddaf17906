package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** MJPEG-in-MP4 (ISO-BMFF): the hand-built box writer + the real
  * stsc/stsz/stco sample-table walk. The load-bearing facts: (1) the MP4
  * and AVI pipelines hash IDENTICALLY (one shared frame encoder — which
  * is what lets q_video_mp4 reuse the AVI rank-permutation oracle
  * verbatim), and (2) the walk actually CONSULTS the sample tables (the
  * two-chunk stsc split is load-bearing: corrupting one stco offset
  * must desync the affected chunk's frames, and moving an stsc run
  * boundary must change what gets hashed).
  */
class Mp4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val families =
    (0 until 12).map(i => s"family content number $i with words")
  private def corpus = families.zipWithIndex.flatMap { case (fam, i) =>
    Seq((i.toLong * 2, fam), (i.toLong * 2 + 1, fam))
  }.toDF("vid", "family")

  private def mp4s = Multimodal.syntheticMjpegMp4s(
    corpus, "vid", "family", nFrames = 4)

  test("MP4 walk == AVI walk: identical per-frame hashes from the shared encoder") {
    val mp4Hashes = Multimodal.mp4FrameDHash(mp4s, "id", "payload",
        maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    val aviHashes = Multimodal.aviFrameDHash(
        Multimodal.syntheticMjpegAvis(corpus, "vid", "family", nFrames = 4),
        "id", "payload", maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(mp4Hashes.size === 24 * 4)
    assert(mp4Hashes === aviHashes)
    assert(mp4Hashes.values.forall(_._2), "every frame decoded")
  }

  test("the walk consults the sample tables: stco corruption desyncs, stsc boundary moves desync") {
    val one = Seq((1L, "family content number 0 with words"))
      .toDF("vid", "family")
    val payload = Multimodal.syntheticMjpegMp4s(one, "vid", "family",
      nFrames = 4).select("payload").as[Array[Byte]].head()
    def hashesOf(b: Array[Byte]): Seq[(Int, Long, Boolean)] =
      Multimodal.mp4FrameDHash(Seq((1L, b)).toDF("id", "payload"),
          "id", "payload", maxFrames = 8)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getBoolean(3)))
        .toSeq.sortBy(_._1)
    val clean = hashesOf(payload)
    assert(clean.length === 4 && clean.forall(_._3))

    // find stco inside the payload and shift the SECOND chunk's offset
    // by one byte: frames 0-2 (chunk 1) must stay intact, frame 3
    // (chunk 2) must change or quarantine — a walk that ignores
    // stsc/stco and just scans for JPEG magics would be immune
    def findBox(tag: String): Int = {
      val t = tag.getBytes("ISO-8859-1")
      (0 until payload.length - 4).find(i =>
        payload(i) == t(0) && payload(i + 1) == t(1) &&
          payload(i + 2) == t(2) && payload(i + 3) == t(3)).get
    }
    val stcoTag = findBox("stco")
    val corrupted = payload.clone()
    // body: version/flags(4) + entry_count(4) + off1(4) + off2(4);
    // bump off2's low byte
    val off2Pos = stcoTag + 4 + 4 + 4 + 4 + 3
    corrupted(off2Pos) = (corrupted(off2Pos) + 1).toByte
    val got = hashesOf(corrupted)
    if (got.length == 1) assert(!got.head._3) // whole payload quarantined
    else {
      assert(got.take(3) === clean.take(3), "chunk-1 frames must be intact")
      assert(got(3) !== clean(3), "the shifted chunk-2 frame must desync")
    }

    // shrink the first stsc run's samples_per_chunk 3 -> 2: sample 2's
    // enumerated range moves from chunk 1 into chunk 2, so the walk must
    // now hash different bytes (or quarantine on the resulting truncated
    // JPEG) — a walk that ignores stsc would return the clean result
    val stscTag = findBox("stsc")
    val shrunk = payload.clone()
    // body: version/flags(4) + entry_count(4) + run1(first_chunk 4,
    // samples_per_chunk 4, sdi 4) — spc low byte sits at +4+4+4+4+3
    val spcPos = stscTag + 4 + 4 + 4 + 4 + 3
    assert(shrunk(spcPos) === 3.toByte)
    shrunk(spcPos) = 2
    val got2 = hashesOf(shrunk)
    assert(got2 !== clean, "moving an stsc boundary must not go unnoticed")
  }

  test("quarantine posture: junk, truncation, frameless moov — one stub row, no failure") {
    val payload = mp4s.select("payload").as[Array[Byte]].head()
    val junk = Seq(
      10L -> Array[Byte](1, 2, 3),
      11L -> null,
      12L -> payload.take(40), // truncated mid-box
      13L -> "ftypnonsense".getBytes("ISO-8859-1"),
      14L -> payload.dropRight(5) // mdat/moov boundary damage
    ).toDF("id", "payload")
    val rows = Multimodal.mp4FrameDHash(junk, "id", "payload", maxFrames = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(3)))
    assert(rows.length === 5)
    assert(rows.forall { case (_, (f, dec)) => f == -1 && !dec })
  }

  test("maxFrames bounds the walk") {
    val got = Multimodal.mp4FrameDHash(mp4s, "id", "payload", maxFrames = 2)
      .groupBy("id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .collect()
    assert(got.forall(r => r.getLong(1) == 2L && r.getInt(2) == 1))
  }

  private def mp4sSync = Multimodal.syntheticMjpegMp4s(
    corpus, "vid", "family", nFrames = 4, syncEvery = 3)

  test("co64 (64-bit chunk offsets) walks identically to stco") {
    val co64s = Multimodal.syntheticMjpegMp4s(corpus, "vid", "family",
      nFrames = 4, co64 = true)
    // the container really carries a co64 box and no stco
    val payload = co64s.select("payload").as[Array[Byte]].head()
    val s = new String(payload, "ISO-8859-1")
    assert(s.contains("co64") && !s.contains("stco"))
    val got = Multimodal.mp4FrameDHash(co64s, "id", "payload", maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    val want = Multimodal.mp4FrameDHash(mp4s, "id", "payload", maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got === want)
    assert(got.values.forall(_._2))
  }

  test("syncOnly decodes EXACTLY the stss samples, at their original indices, with identical hashes") {
    val full = Multimodal.mp4FrameDHash(mp4sSync, "id", "payload",
        maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val keys = Multimodal.mp4FrameDHash(mp4sSync, "id", "payload",
        maxFrames = 8, syncOnly = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3)))
    // stss = samples {1, 4} (1-based) -> frame_idx {0, 3}
    assert(keys.length === 24 * 2)
    assert(keys.forall(_._4))
    assert(keys.map(_._2).toSet === Set(0, 3))
    keys.foreach { case (id, f, h, _) => assert(full((id, f)) === h) }
    // stss presence doesn't perturb the full walk (4 frames as before)
    assert(full.size === 24 * 4)
  }

  test("absent stss means every sample is sync (ISO 14496-12 rule)") {
    val n = Multimodal.mp4FrameDHash(mp4s, "id", "payload",
        maxFrames = 8, syncOnly = true).filter(col("decoded")).count()
    assert(n === 24 * 4)
  }

  test("syncOnly maxFrames caps EMITTED keyframes; malformed stss quarantines") {
    val capped = Multimodal.mp4FrameDHash(mp4sSync, "id", "payload",
        maxFrames = 1, syncOnly = true)
      .groupBy("id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .collect()
    assert(capped.forall(r => r.getLong(1) == 1L && r.getInt(2) == 0))
    // corrupt the stss: point a sample number past nSamples
    val one = Seq((1L, "family content number 0 with words"))
      .toDF("vid", "family")
    val payload = Multimodal.syntheticMjpegMp4s(one, "vid", "family",
      nFrames = 4, syncEvery = 3).select("payload").as[Array[Byte]].head()
    val tag = "stss".getBytes("ISO-8859-1")
    val at = payload.indices.find(i => i + 4 <= payload.length &&
      payload(i) == tag(0) && payload(i + 1) == tag(1) &&
      payload(i + 2) == tag(2) && payload(i + 3) == tag(3)).get
    val bad = payload.clone()
    // first entry (4 tag + 4 version/flags + 4 count = offset 12): set
    // sample_number to 99 (> nSamples = 4)
    bad(at + 12) = 0; bad(at + 13) = 0; bad(at + 14) = 0; bad(at + 15) = 99
    val rows = Multimodal.mp4FrameDHash(
        Seq((1L, bad)).toDF("id", "payload"), "id", "payload",
        maxFrames = 8, syncOnly = true)
      .collect().map(r => (r.getInt(1), r.getBoolean(3)))
    assert(rows.toSeq === Seq((-1, false)))
    // the SAME damaged file still full-walks (stss ignored when
    // syncOnly is off) — damage isolation, not over-quarantine
    val fullRows = Multimodal.mp4FrameDHash(
        Seq((1L, bad)).toDF("id", "payload"), "id", "payload",
        maxFrames = 8)
      .filter(col("decoded")).count()
    assert(fullRows === 4L)
  }

  test("a hostile stsz declaring 2^31-1 samples quarantines fast in sync mode (no count-sized allocation)") {
    val one = Seq((1L, "family content number 0 with words"))
      .toDF("vid", "family")
    val payload = Multimodal.syntheticMjpegMp4s(one, "vid", "family",
      nFrames = 4, syncEvery = 3).select("payload").as[Array[Byte]].head()
    // corrupt stsz's sample_count to Int.MaxValue: the sync-set build
    // must stay bounded by the ACTUAL stss bytes (the set is keyed by
    // present entries, never sized by the declared count — a BitSet
    // sized by the claim would demand ~256 MB before validating a
    // single entry); the chunk tables bound the walk to the 4 real
    // samples, so the keyframes still decode
    val tag = "stsz".getBytes("ISO-8859-1")
    val at = payload.indices.find(i => i + 4 <= payload.length &&
      payload(i) == tag(0) && payload(i + 1) == tag(1) &&
      payload(i + 2) == tag(2) && payload(i + 3) == tag(3)).get
    val bad = payload.clone()
    // stsz body: 4 tag + 4 version/flags + 4 sample_size + 4 sample_count
    bad(at + 12) = 0x7f.toByte; bad(at + 13) = 0xff.toByte
    bad(at + 14) = 0xff.toByte; bad(at + 15) = 0xff.toByte
    val t0 = System.nanoTime()
    val rows = Multimodal.mp4FrameDHash(
        Seq((1L, bad)).toDF("id", "payload"), "id", "payload",
        maxFrames = 8, syncOnly = true)
      .collect().map(r => (r.getInt(1), r.getBoolean(3))).sortBy(_._1)
    assert(rows.toSeq === Seq((0, true), (3, true)))
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }
}
