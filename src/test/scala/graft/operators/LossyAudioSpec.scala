package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Lossy audio codecs (G.711 mu-law, IMA ADPCM): codec laws over the
  * ENTIRE input domain (exhaustive where the domain is small enough),
  * the decode==encoder-reconstruction contract, container round-trips,
  * and hostile-byte quarantine in the Flac/Mp4Fuzz posture.
  */
class LossyAudioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  // ---------------- mu-law ----------------

  test("mu-law: exhaustive 16-bit error bound, sign symmetry, zero code") {
    // every 16-bit sample: |decode(encode(s)) - s| < the segment's step
    // (quantization can never exceed one segment step), and the coded
    // domain stays within the clip
    var s = -32768
    while (s <= 32767) {
      val rt = LossyAudio.muLawDecode(LossyAudio.muLawEncode(s))
      val mag = math.min(math.abs(s), 32635) + 132
      var e = 0
      while (e < 7 && mag >= (256 << e)) e += 1
      val step = 1 << (e + 3)
      assert(math.abs(rt - math.max(-32635, math.min(32635, s))) <= step,
        s"s=$s rt=$rt step=$step")
      if (s != -32768 && s != 0)
        assert(LossyAudio.muLawDecode(LossyAudio.muLawEncode(-s)) === -rt,
          s"sign asymmetry at $s")
      s += 1
    }
    assert(LossyAudio.muLawEncode(0) === 0xff)
    assert(LossyAudio.muLawDecode(0xff) === 0)
  }

  test("mu-law: idempotence over all 256 codes (decode is a fixed point of the codec)") {
    for (u <- 0 until 256) {
      val d = LossyAudio.muLawDecode(u)
      assert(LossyAudio.muLawDecode(LossyAudio.muLawEncode(d)) === d,
        s"code $u decodes to $d which does not re-code to itself")
    }
  }

  test("mu-law: decode is strictly monotone over the positive code ladder") {
    // codes 0xFF down to 0x80 are the non-negative ladder in
    // complemented order
    val pos = (0 to 0x7f).map(c => LossyAudio.muLawDecode(0xff - c))
    assert(pos.head === 0)
    pos.sliding(2).foreach { case Seq(a, b) => assert(a < b) }
  }

  // ---------------- IMA ADPCM ----------------

  private def pcm(n: Int, seed: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (i % 16 == 0) {
        md.reset(); md.update(s"$seed:${i / 16}".getBytes("UTF-8"))
      }
      val d = md.digest(s"$seed:$i".getBytes("UTF-8"))
      out(i) = (((d(0) & 0xff) - 128) << 8) + (d(1) & 0xff)
      i += 1
    }
    out
  }

  test("IMA: decode == the encoder's own reconstruction, exactly (multi-block)") {
    val s = pcm(1040, 7) // 3 blocks: 505 + 505 + 30
    val data = LossyAudio.imaEncode(s)
    val dec = LossyAudio.imaDecode(data, s.length)
    assert(dec.isDefined)
    // independent reference: replay the state chain with imaStep
    val want = new Array[Int](s.length)
    var idx = 0
    var off = 0
    while (off < s.length) {
      val n = math.min(LossyAudio.SamplesPerBlock, s.length - off)
      var pred = s(off)
      want(off) = pred
      var k = 1
      while (k < n) {
        val (_, p2, i2) = LossyAudio.imaStep(pred, idx, s(off + k))
        pred = p2; idx = i2
        want(off + k) = pred
        k += 1
      }
      off += n
    }
    assert(dec.get.toSeq === want.toSeq)
    // block-leading samples are carried verbatim (the format's contract)
    assert(dec.get(0) === s(0) && dec.get(505) === s(505))
  }

  test("IMA: tracks a slow signal within the adaptive step after attack") {
    // a slow ramp: after the initial adaptation the error stays within
    // a few minimum steps
    val s = Array.tabulate(600)(i => (i - 300) * 4)
    val dec = LossyAudio.imaDecode(LossyAudio.imaEncode(s), 600).get
    val tailErr = (100 until 600).map(i => math.abs(dec(i) - s(i))).max
    assert(tailErr <= 64, s"tail error $tailErr")
  }

  test("IMA: WAV container round-trips through imaToWav; mu-law through muLawToWav") {
    import spark.implicits._
    val fams = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "family")
    for ((synth, toWav) <- Seq(
      (LossyAudio.syntheticImaWavs(fams, "doc_id", "family"),
        LossyAudio.imaToWav(_: org.apache.spark.sql.DataFrame, "id", "payload")),
      (LossyAudio.syntheticMuLawWavs(fams, "doc_id", "family"),
        LossyAudio.muLawToWav(_: org.apache.spark.sql.DataFrame, "id", "payload")))) {
      val dec = toWav(synth).collect()
      assert(dec.length === 3 && dec.forall(_.getBoolean(2)),
        "some payload failed to decode")
      // canonical output: 44-byte header + 1040 8-bit samples
      dec.foreach { r =>
        val p = r.getAs[Array[Byte]](1)
        assert(p.length === 44 + 1040)
      }
    }
  }

  test("fuzz: every truncation of both containers quarantines or decodes, never throws") {
    val s = pcm(1040, 11)
    for (payload <- Seq(LossyAudio.imaWav(s), LossyAudio.muLawWav(s))) {
      import spark.implicits._
      val cuts = (0 until payload.length by 7)
        .map(n => java.util.Arrays.copyOf(payload, n))
      val df = cuts.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("id", "payload")
      val a = LossyAudio.imaToWav(df, "id", "payload").collect()
      val b = LossyAudio.muLawToWav(df, "id", "payload").collect()
      assert(a.length === cuts.length && b.length === cuts.length)
    }
  }

  test("fuzz: garbage, wrong tag, stereo, bad step index, fact bombs all quarantine") {
    import spark.implicits._
    val s = pcm(1040, 13)
    val good = LossyAudio.imaWav(s)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val hostile = Seq(
      (1L, Array.fill(64)(0x5a.toByte)), // garbage
      (2L, patched(b => b(20) = 1)), // PCM tag on nibble data
      (3L, patched(b => b(22) = 2)), // stereo
      (4L, patched(b => b(62) = 120.toByte)), // step index > 88 in block 0
      (5L, patched { b => // fact bomb: declared count >> real bytes
        b(48) = -1; b(49) = -1; b(50) = 0x7f; b(51) = 0
      }),
      (6L, Array.empty[Byte]),
      (7L, null.asInstanceOf[Array[Byte]]),
      // fact SMALLER than carried: a legitimate truncated stream —
      // decodes to exactly the declared count
      (8L, patched { b => b(48) = (1000 & 0xff).toByte; b(49) = 3; b(50) = 0; b(51) = 0 }))
    val out = LossyAudio.imaToWav(hostile.toDF("id", "payload"),
      "id", "payload").collect()
    val dec = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!dec(1L) && !dec(2L) && !dec(3L) && !dec(4L) && !dec(6L) &&
      !dec(7L))
    // a count the bytes cannot carry is malformed — quarantined loudly,
    // with the allocation bounded by the CARRIED count, never the
    // declaration
    assert(!dec(5L), "an over-declared fact must quarantine")
    assert(dec(8L), "fact below the carried count is a legal truncation")
    val p8 = out.find(_.getLong(0) == 8L).get.getAs[Array[Byte]](1)
    assert(p8.length === 44 + 1000)
  }

  test("the fact chunk is OPTIONAL: a fact-less IMA WAV decodes from block structure; a bomb fact never falls back") {
    import spark.implicits._
    // 1041 = 2*505 + 31: the partial block carries an odd residue, so
    // its 30 nibbles pack into 15 full bytes and the derived count is
    // EXACT (an even residue leaves an unpaired trailing nibble whose
    // padding-vs-sample status only a fact chunk can resolve)
    val s = pcm(1041, 19)
    val withFact = LossyAudio.imaWav(s)
    // strip the 12-byte fact chunk (bytes 40..51) and re-point RIFF size
    val noFact = new Array[Byte](withFact.length - 12)
    System.arraycopy(withFact, 0, noFact, 0, 40)
    System.arraycopy(withFact, 52, noFact, 40, withFact.length - 52)
    val sz = noFact.length - 8
    noFact(4) = (sz & 0xff).toByte; noFact(5) = ((sz >> 8) & 0xff).toByte
    noFact(6) = ((sz >> 16) & 0xff).toByte; noFact(7) = ((sz >> 24) & 0xff).toByte
    // a fact PAST the decoder cap is a declared-count bomb: it must
    // quarantine, never be treated as "absent" and fall back to derivation
    val bomb = withFact.clone()
    bomb(48) = -1; bomb(49) = -1; bomb(50) = -1; bomb(51) = 0x7f
    // a PRESENT but structurally malformed fact is a malformation
    // signal, not an absence: declared size < 4 must quarantine, never
    // be classified "absent" and fall back to derivation
    val badSize = withFact.clone()
    badSize(44) = 2; badSize(45) = 0; badSize(46) = 0; badSize(47) = 0
    // ... as must a fact whose 4-byte value field is truncated at EOF
    // (appended after the data chunk of the otherwise-valid fact-less
    // file; the walk ignores the RIFF size field but honors RIFF's
    // odd-size pad byte, so align the appended chunk accordingly —
    // data chunk header sits at offset 40 after the fact strip)
    val dSz = (noFact(44) & 0xff) | ((noFact(45) & 0xff) << 8) |
      ((noFact(46) & 0xff) << 16) | ((noFact(47) & 0xff) << 24)
    val pad: Array[Byte] =
      if ((dSz & 1) == 1) Array[Byte](0) else Array.emptyByteArray
    val trunc = noFact ++ pad ++
      Array[Byte]('f', 'a', 'c', 't', 4, 0, 0, 0, 1, 0)
    val out = LossyAudio.imaToWav(
      Seq((1L, withFact), (2L, noFact), (3L, bomb), (4L, badSize),
        (5L, trunc)).toDF("id", "payload"),
      "id", "payload").collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && out(2L)._2, "fact-less file failed to decode")
    assert(java.util.Arrays.equals(out(1L)._1, out(2L)._1),
      "fact-less decode diverged from the fact-ful decode")
    assert(!out(3L)._2, "an over-cap fact must quarantine, not derive")
    assert(!out(4L)._2, "an undersized fact chunk must quarantine, not derive")
    assert(!out(5L)._2, "an EOF-truncated fact value must quarantine, not derive")
  }
}
