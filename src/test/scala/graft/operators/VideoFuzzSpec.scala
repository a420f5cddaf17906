package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Totality fuzz for the video container walk: whatever bytes arrive —
  * random garbage, valid-GIF prefixes truncated at every length class,
  * random single-byte corruptions of a valid container, empty and null
  * payloads — [[Multimodal.videoFrameDHash]] must never fail a task,
  * must emit at least one row per input id, and must mark only genuinely
  * decoded frames `decoded = true`. Deterministic: same corpus, same
  * rows on every run (two-run equality is asserted).
  */
class VideoFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("hostile payload sweep: total, deterministic, quarantined") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val valid = Multimodal.syntheticAnimatedGifs(
      Seq((0L, "seed family")).toDF("id", "family"), "id", "family",
      nFrames = 4).collect()(0).getAs[Array[Byte]]("payload")
    val payloads = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    var id = 1L
    // truncations of the valid container at boundary classes: inside the
    // signature, the screen descriptor, each frame's data, the trailer
    for (cut <- Seq(1, 3, 6, 10, 13, valid.length / 4, valid.length / 2,
        valid.length - 2, valid.length - 1)) {
      payloads += ((id, valid.take(cut))); id += 1
    }
    // single-byte corruptions at random offsets
    for (_ <- 0 until 12) {
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      payloads += ((id, b)); id += 1
    }
    // random garbage of varied sizes (incl. GIF-signature-prefixed)
    for (n <- Seq(0, 1, 5, 64, 512, 4096)) {
      val g = new Array[Byte](n); rnd.nextBytes(g)
      payloads += ((id, g)); id += 1
      val sig = ("GIF89a".getBytes("ISO-8859-1") ++ g).take(math.max(6, n))
      payloads += ((id, sig)); id += 1
    }
    payloads += ((id, null)); id += 1
    payloads += ((id, valid)) // one healthy row rides along
    val df = payloads.toSeq.toDF("id", "payload").repartition(5)
    def run() = Multimodal.videoFrameDHash(df, "id", "payload",
      maxFrames = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val rows = run() // a task failure would throw here
    // every input id is observable in the output
    assert(rows.map(_._1).toSet == payloads.map(_._1).toSet,
      "an input id vanished from the walk output")
    // stub rows are frame_idx -1 and never decoded; decoded rows only
    // carry real frame indexes
    rows.foreach { case (i, f, _, dec) =>
      assert(if (dec) f >= 0 else f == -1, s"row $i: frame=$f decoded=$dec")
    }
    // the healthy container decodes all 4 frames
    assert(rows.filter(_._1 == id).count(_._4) == 4,
      "healthy container must still decode next to hostile ones")
    // deterministic across runs and layouts
    assert(run() == rows, "walk output must be deterministic")
    // and the downstream rollup is total over the mixed output
    val vids = Multimodal.videoNearDups(
      Multimodal.videoFrameDHash(df, "id", "payload", maxFrames = 8)
        .filter(col("decoded")), "id", "frame_idx", "phash", minFrames = 3)
      .collect()
    // corrupted copies of the same container that still decode are
    // near-dups of the healthy one — pairs may exist; the assertion is
    // totality (no throw) + determinism
    assert(vids.length >= 0)
  }

  test("per-frame bomb screen: a tiny logical screen hiding a huge frame " +
      "descriptor quarantines; stub rows cannot alias into phantom " +
      "pairs; negative video ids fail loudly") {
    import spark.implicits._
    val valid = Multimodal.syntheticAnimatedGifs(
      Seq((0L, "bomb family")).toDF("id", "family"), "id", "family",
      nFrames = 2).collect()(0).getAs[Array[Byte]]("payload")
    // patch the FIRST image descriptor (0x2C separator after the 13-byte
    // header + palette) to claim a 65535x65535 frame: headerPixels from
    // the logical screen stays 72, but reader.read would allocate ~4.3e9
    // pixels -- the per-frame screen must quarantine the payload
    val bombed = valid.clone()
    val sep = bombed.indexOf(0x2C.toByte, 13 + 768)
    assert(sep > 0, "no image descriptor found to patch")
    bombed(sep + 5) = 0xFF.toByte; bombed(sep + 6) = 0xFF.toByte // width LE
    bombed(sep + 7) = 0xFF.toByte; bombed(sep + 8) = 0xFF.toByte // height LE
    val out = Multimodal.videoFrameDHash(
      Seq((1L, bombed)).toDF("id", "payload"), "id", "payload",
      maxFrames = 8).collect()
    assert(out.length == 1 && out(0).getInt(1) == -1 &&
      !out(0).getBoolean(3),
      s"oversized frame descriptor must quarantine, got ${out.toSeq}")
    // stub-alias regression: two hostile payloads with IDENTICAL bytes
    // share a deterministic stub hash; fed UNFILTERED into the rollup,
    // their frame_idx = -1 rows would band at composite key id*64 - 1 =
    // (id-1)*64 + 63 and flag the WRONG videos -- the rollup's frame
    // range filter must drop them
    val garbage = "not a container".getBytes("UTF-8")
    val frames = Multimodal.videoFrameDHash(
      Seq((64L, garbage), (128L, garbage)).toDF("id", "payload"),
      "id", "payload", maxFrames = 8)
    val pairs = Multimodal.videoNearDups(frames, // no .filter(decoded)!
      "id", "frame_idx", "phash", minFrames = 1)
      .collect()
    assert(pairs.isEmpty,
      s"stub rows aliased into phantom video pairs: ${pairs.toSeq}")
    // negative video ids alias under the truncating DIV decompose: raise
    val neg = Seq((-3L, 0, 5L, true), (4L, 0, 5L, true))
      .toDF("id", "frame_idx", "phash", "decoded")
    val e = intercept[Exception] {
      Multimodal.videoNearDups(neg, "id", "frame_idx", "phash",
        minFrames = 1).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("non-negative"), msgs(e).take(200))
  }
}
