package graft.operators

/** Pure-JVM FLAC subset codec (RFC 9639) — the one compressed audio
  * format whose LOSSLESSNESS is integer-exact by spec, so the analytic
  * PCM oracles carry over unchanged (the gray-PNG / identity-palette-GIF
  * precedent). No codec libraries exist in this container; both
  * directions are hand-written against the public spec, and the
  * correctness certificate is external: the planted samples are
  * analytically known, so the q_audio_flac oracle recomputes the
  * expected fingerprints from the formula — a matched encoder/decoder
  * bug that corrupts samples hash-mismatches immediately.
  *
  * SUBSET (the VERDICT-r17 cut, widened): mono, 8/16-bit, fixed
  * blocksize, CONSTANT + VERBATIM + FIXED(0-4) + LPC(1-32) subframes
  * (LPC: quantized coefficients, 64-bit accumulation, truncating shift
  * before the residual add — integer-exact by spec, so real-corpus LPC
  * streams decode rather than quarantine), 4/5-bit Rice partitions
  * (any partition order, incl. the raw-bits escape). Stereo
  * decorrelation and variable blocksize QUARANTINE (decode returns
  * None) — the documented approximation, same posture as the MP4
  * walk's codec cuts.
  *
  * Hardening discipline (the stss lesson, commit 7478e0b): nothing is
  * ever sized by a DECLARED count — sample buffers grow frame by frame
  * (each bounded by the 16-bit blocksize) under [[Flac.MaxSamples]];
  * the STREAMINFO 36-bit total-sample field is only cross-checked
  * against what was actually decoded. Every read is bounds-checked via
  * the bit reader; unary runs cannot scan past end-of-buffer; CRC-8
  * (header), CRC-16 (frame) and the STREAMINFO PCM MD5 are all
  * VERIFIED — a flipped bit anywhere quarantines the payload.
  */
object Flac {

  /** decode cap: total samples across all frames (bombs quarantine) */
  private[operators] val MaxSamples: Int = 1 << 24

  // ---- CRCs (MSB-first; FLAC frame CRCs, init 0) ----
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
      t(i) = c & 0xff
      i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
      t(i) = c & 0xffff
      i += 1
    }
    t
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table((c ^ (b(i) & 0xff)) & 0xff); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = (((c << 8) & 0xffff) ^ Crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff)) & 0xffff; i += 1 }
    c
  }

  // ---- bit IO ----
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(1024)
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        k -= 1
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignZero(): Unit = if (nbits != 0) writeBits(0, 8 - nbits)
    def bytes: Array[Byte] = { require(nbits == 0); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    private val end: Long = b.length.toLong * 8
    def fail(): Nothing = throw Corrupt
    def readBits(n: Int): Long = {
      if (n < 0 || n > 56 || pos + n > end) fail()
      var v = 0L
      var k = 0
      while (k < n) {
        val byte = (pos >>> 3).toInt
        val bit = 7 - (pos & 7L).toInt
        v = (v << 1) | ((b(byte) >> bit) & 1L)
        pos += 1
        k += 1
      }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (true) {
        if (pos >= end) fail()
        val byte = (pos >>> 3).toInt
        val bit = 7 - (pos & 7L).toInt
        pos += 1
        if (((b(byte) >> bit) & 1) != 0) return q
        q += 1
        if (q > (1 << 24)) fail() // unary bomb
      }
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def bytePos: Int = { require((pos & 7) == 0); (pos >>> 3).toInt }
    def atEnd: Boolean = pos >= end
    def remainingBits: Long = end - pos
  }

  private object Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** zigzag fold (RFC 9639 Rice coding): v >= 0 -> 2v, v < 0 -> -2v-1 */
  private def fold(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63))
  private def unfold(u: Long): Int = (((u >>> 1) ^ -(u & 1L))).toInt

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // =================================================================
  // ENCODER
  // =================================================================

  /** Encode mono `samples` (signed, within `bps` bits) at fixed
    * `blockSize`. Subframe choice per frame is deterministic on the
    * EFFECTIVE index `e = frameNo + schedulePhase`: all-equal ->
    * CONSTANT; else LPC when `lpcEvery > 0 && e % lpcEvery == 0 &&
    * e % 6 != 0`; else VERBATIM when `e % 6 == 0`; else FIXED order
    * `e % 6 - 1`. With `lpcEvery` coprime to 6 (the syntheticFlacs
    * setting, 5) every subset subframe type is reachable; `schedulePhase`
    * rotates the schedule so short clips (the 5-frame corpus) still
    * cover all types ACROSS clips. The phase affects only subframe
    * selection, never the coded frame number. Rice parameter per frame
    * is the bit-optimal 4-bit one (single partition, order 0). */
  def encode(samples: Array[Int], bps: Int, sampleRate: Int = 8000,
      blockSize: Int = 256, lpcEvery: Int = 0,
      schedulePhase: Int = 0): Array[Byte] = {
    require(bps == 8 || bps == 16, s"subset bps 8/16, got $bps")
    require(blockSize >= 16 && blockSize <= 65535, s"bad blockSize $blockSize")
    require(sampleRate == 8000, "subset encoder emits the 8 kHz rate code")
    require(schedulePhase >= 0, s"negative schedulePhase $schedulePhase")
    // decoder-side cap: a stream past MaxSamples round-trips to
    // quarantine ([[decode]] rejects total > MaxSamples), so fail loudly
    // at encode time instead of emitting a stream our own reader drops.
    // (The coded frame number itself is fine for any Int count — the
    // 5/6-byte writeUtf8Number forms cover 31 bits.)
    require(samples.length <= MaxSamples,
      s"sample count ${samples.length} exceeds the decoder cap $MaxSamples")
    val lim = 1L << (bps - 1)
    require(samples.forall(s => s >= -lim && s < lim), "sample out of range")
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block), 34 bytes
    val si = new BitWriter
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24) // frame sizes unknown
    si.writeBits(sampleRate, 20)
    si.writeBits(0, 3) // channels - 1
    si.writeBits(bps - 1, 5)
    si.writeBits(samples.length.toLong, 36)
    val md = java.security.MessageDigest.getInstance("MD5")
    val pcm = new Array[Byte](samples.length * (bps / 8))
    var i = 0
    while (i < samples.length) {
      if (bps == 8) pcm(i) = samples(i).toByte
      else {
        pcm(2 * i) = samples(i).toByte
        pcm(2 * i + 1) = (samples(i) >> 8).toByte
      }
      i += 1
    }
    val digest = md.digest(pcm)
    digest.foreach(x => si.writeBits(x & 0xffL, 8))
    val siBytes = si.bytes
    require(siBytes.length == 34)
    out.write(0x80) // last block + type 0
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes, 0, 34)

    var frameNo = 0
    var off = 0
    while (off < samples.length) {
      val bs = math.min(blockSize, samples.length - off)
      out.write(encodeFrame(samples, off, bs, frameNo, bps, blockSize,
        lpcEvery, schedulePhase))
      off += bs
      frameNo += 1
    }
    out.toByteArray // a zero-sample stream is just the header
  }

  /** `lpcEvery > 0` makes every `lpcEvery`-th frame an LPC-order-2
    * subframe (coefs [3, -1], precision 5, shift 1 — residuals computed
    * against the exact integer predictor, so round-trips stay
    * lossless): the conformance path FlacSpec uses to exercise the
    * decoder's LPC arithmetic with real in-format frames. */
  /** The non-CONSTANT subframe type the schedule selects for effective
    * frame index `eff` (see [[encode]]). Factored out so the corpus-
    * coverage spec asserts against the SAME selection the encoder runs:
    * with lpcEvery=5 and phases 0..29 (the syntheticFlacs geometry)
    * every subset subframe type appears. */
  private[operators] def scheduledType(eff: Int, lpcEvery: Int,
      bs: Int): String =
    if (lpcEvery > 0 && eff % lpcEvery == 0 &&
      (eff % 6 != 0 || lpcEvery == 1) && bs > 2) "LPC"
    else if (eff % 6 == 0) "VERBATIM"
    else s"FIXED${math.min(eff % 6 - 1, bs - 1)}"

  private def encodeFrame(samples: Array[Int], off: Int, bs: Int,
      frameNo: Int, bps: Int, nominalBlock: Int,
      lpcEvery: Int = 0, schedulePhase: Int = 0): Array[Byte] = {
    // effective schedule index: selects the subframe type only — the
    // frame number coded into the stream stays frameNo
    val eff = frameNo + schedulePhase
    val w = new BitWriter
    w.writeBits(0x3ffe, 14) // sync
    w.writeBits(0, 1) // reserved
    w.writeBits(0, 1) // fixed-blocksize stream
    val bsCode =
      if (bs == nominalBlock && Integer.bitCount(bs) == 1 && bs >= 256 &&
        bs <= 32768) 8 + Integer.numberOfTrailingZeros(bs) - 8
      else if (bs <= 256) 6 // 8-bit blocksize-1 at header end
      else 7 // 16-bit blocksize-1
    w.writeBits(bsCode.toLong, 4)
    w.writeBits(4, 4) // sample rate code: 8 kHz
    w.writeBits(0, 4) // channel assignment: mono
    w.writeBits(if (bps == 8) 1L else 4L, 3) // sample size code
    w.writeBits(0, 1) // reserved
    // coded frame number (UTF-8 style); subset streams stay < 2^31
    writeUtf8Number(w, frameNo)
    if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
    else if (bsCode == 7) w.writeBits((bs - 1).toLong, 16)
    val headNoCrc = { w.alignZero(); w.bytes }
    // header bits are all byte-aligned by construction here (14+1+1+4 =
    // 20 bits... not aligned) — so rebuild: CRC-8 must cover exact
    // header bytes; BitWriter accumulated them bit-exactly and the
    // field widths above sum to a whole number of bytes (32 bits + utf8
    // bytes + optional blocksize field), so alignZero was a no-op.
    val h = headNoCrc
    val withCrc = new BitWriter
    h.foreach(x => withCrc.writeBits(x & 0xffL, 8))
    withCrc.writeBits(crc8(h, 0, h.length).toLong, 8)
    // subframe
    val allEqual = {
      var e = true
      var i = 1
      while (e && i < bs) { e = samples(off + i) == samples(off); i += 1 }
      e
    }
    val sched = scheduledType(eff, lpcEvery, bs)
    if (allEqual) {
      withCrc.writeBits(0, 1); withCrc.writeBits(0, 6) // CONSTANT
      withCrc.writeBits(0, 1) // no wasted bits
      withCrc.writeBits(samples(off).toLong & ((1L << bps) - 1), bps)
    } else if (sched == "LPC") {
      val order = 2
      val prec = 5
      val shift = 1
      val coefs = Array(3L, -1L)
      withCrc.writeBits(0, 1)
      withCrc.writeBits((32 + order - 1).toLong, 6) // LPC order 2
      withCrc.writeBits(0, 1) // no wasted bits
      var i = 0
      while (i < order) { // warmup
        withCrc.writeBits(samples(off + i).toLong & ((1L << bps) - 1), bps)
        i += 1
      }
      withCrc.writeBits((prec - 1).toLong, 4)
      withCrc.writeBits(shift.toLong & 0x1f, 5)
      i = 0
      while (i < order) {
        withCrc.writeBits(coefs(i) & ((1L << prec) - 1), prec)
        i += 1
      }
      val res = new Array[Int](bs - order)
      i = order
      while (i < bs) {
        var p = 0L
        var j = 0
        while (j < order) { p += coefs(j) * samples(off + i - 1 - j); j += 1 }
        res(i - order) = (samples(off + i) - (p >> shift)).toInt
        i += 1
      }
      writeRice(withCrc, res)
    } else if (sched == "VERBATIM") {
      withCrc.writeBits(0, 1); withCrc.writeBits(1, 6) // VERBATIM
      withCrc.writeBits(0, 1)
      var i = 0
      while (i < bs) {
        withCrc.writeBits(samples(off + i).toLong & ((1L << bps) - 1), bps)
        i += 1
      }
    } else {
      val order = sched.stripPrefix("FIXED").toInt
      withCrc.writeBits(0, 1); withCrc.writeBits(8 + order, 6) // FIXED
      withCrc.writeBits(0, 1)
      var i = 0
      while (i < order) { // warmup
        withCrc.writeBits(samples(off + i).toLong & ((1L << bps) - 1), bps)
        i += 1
      }
      val res = new Array[Int](bs - order)
      val co = FixedCoefs(order)
      i = order
      while (i < bs) {
        var p = 0L
        var j = 0
        while (j < order) { p += co(j).toLong * samples(off + i - 1 - j); j += 1 }
        res(i - order) = (samples(off + i) - p).toInt
        i += 1
      }
      writeRice(withCrc, res)
    }
    withCrc.alignZero()
    val body = withCrc.bytes
    val fin = new BitWriter
    body.foreach(x => fin.writeBits(x & 0xffL, 8))
    fin.writeBits(crc16(body, 0, body.length).toLong, 16)
    fin.bytes
  }

  /** single-partition 4-bit Rice residual block with the bit-optimal
    * parameter — shared by the FIXED and LPC subframe writers */
  private def writeRice(w: BitWriter, res: Array[Int]): Unit = {
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var bits = 0L
      var r = 0
      while (r < res.length) { bits += (fold(res(r)) >>> k) + 1 + k; r += 1 }
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    w.writeBits(0, 2) // residual method: 4-bit rice
    w.writeBits(0, 4) // partition order 0
    w.writeBits(bestK.toLong, 4)
    var r = 0
    while (r < res.length) {
      val u = fold(res(r))
      w.writeUnary((u >>> bestK).toInt)
      if (bestK > 0) w.writeBits(u & ((1L << bestK) - 1), bestK)
      r += 1
    }
  }

  private def writeUtf8Number(w: BitWriter, v: Int): Unit = {
    if (v < 0x80) w.writeBits(v.toLong, 8)
    else if (v < 0x800) {
      w.writeBits(0xc0L | (v >> 6), 8); w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      w.writeBits(0xe0L | (v >> 12), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < (1 << 21)) {
      w.writeBits(0xf0L | (v >> 18), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < (1 << 26)) {
      // 5-byte form (2-bit lead payload) — the decoder already accepts
      // it; without this branch frame numbers >= 2^21 would overflow
      // the 4-byte lead's 3-bit payload into a malformed stream
      w.writeBits(0xf8L | (v >> 24), 8)
      w.writeBits(0x80L | ((v >> 18) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      // 6-byte form (1-bit lead payload): covers every non-negative Int
      w.writeBits(0xfcL | (v >>> 30), 8)
      w.writeBits(0x80L | ((v >> 24) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 18) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    }
  }

  // =================================================================
  // DECODER
  // =================================================================

  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Int])

  /** Decode a subset stream; None on ANY malformation (bad marker,
    * header/frame CRC mismatch, PCM-MD5 mismatch, out-of-subset
    * feature, truncation, bomb). */
  def decode(b: Array[Byte]): Option[Decoded] =
    try decodeOrThrow(b) catch { case Corrupt => None }

  private def decodeOrThrow(b: Array[Byte]): Option[Decoded] = {
    if (b == null || b.length < 42) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    var p = 4
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalDeclared = 0L
    var nominalBlock = 0
    var md5Declared: Array[Byte] = null
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (p + 4 > b.length) return None
      val hdr = b(p) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
        (b(p + 3) & 0xff)
      p += 4
      // Long arithmetic: near the 2^31 array limit `p + len` would wrap
      // negative in Int and escape the bounds check (then crash instead
      // of quarantining — the never-throw contract)
      if (p.toLong + len > b.length) return None
      if (btype == 0) {
        if (len != 34 || sawStreamInfo) return None
        sawStreamInfo = true
        val r = new BitReader(b, p)
        val minB = r.readBits(16).toInt
        val maxB = r.readBits(16).toInt
        r.readBits(24); r.readBits(24)
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalDeclared = r.readBits(36)
        md5Declared = new Array[Byte](16)
        var i = 0
        while (i < 16) { md5Declared(i) = r.readBits(8).toByte; i += 1 }
        if (minB != maxB) return None // subset: fixed blocksize
        nominalBlock = minB
        if (channels != 1 || (bps != 8 && bps != 16)) return None
        if (nominalBlock < 16 || sampleRate == 0) return None
      } else if (btype == 127) return None // invalid type
      p += len
    }
    if (!sawStreamInfo) return None
    val acc = new java.util.ArrayList[Array[Int]]()
    var total = 0L
    var expectFrame = 0L
    while (p < b.length) {
      val (frame, nextP) = decodeFrame(b, p, bps, nominalBlock, expectFrame)
      acc.add(frame)
      total += frame.length
      if (total > MaxSamples) return None
      expectFrame += 1
      p = nextP
    }
    val samples = new Array[Int](total.toInt)
    var o = 0
    acc.forEach { f => System.arraycopy(f, 0, samples, o, f.length); o += f.length }
    if (totalDeclared != 0 && totalDeclared != samples.length) return None
    // PCM MD5 verification (all-zero digest = unset, skip)
    if (md5Declared.exists(_ != 0)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val pcm = new Array[Byte](samples.length * (bps / 8))
      var i = 0
      while (i < samples.length) {
        if (bps == 8) pcm(i) = samples(i).toByte
        else {
          pcm(2 * i) = samples(i).toByte
          pcm(2 * i + 1) = (samples(i) >> 8).toByte
        }
        i += 1
      }
      if (!java.util.Arrays.equals(md.digest(pcm), md5Declared)) return None
    }
    Some(Decoded(sampleRate, channels, bps, samples))
  }

  /** decode one frame starting at byte `p`; returns (samples, next byte
    * offset). Throws [[Corrupt]] on malformation. */
  private def decodeFrame(b: Array[Byte], p: Int, bps: Int,
      nominalBlock: Int, expectFrame: Long): (Array[Int], Int) = {
    val r = new BitReader(b, p)
    if (r.readBits(14) != 0x3ffe) r.fail()
    if (r.readBits(1) != 0) r.fail()
    val varBlock = r.readBits(1)
    if (varBlock != 0) r.fail() // subset: fixed-blocksize streams only
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chCode = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    if (r.readBits(1) != 0) r.fail()
    val frameNo = readUtf8Number(r)
    if (frameNo != expectFrame) r.fail()
    val bs = bsCode match {
      case 0 => r.fail()
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    if (srCode == 12) r.readBits(8)
    else if (srCode == 13 || srCode == 14) r.readBits(16)
    else if (srCode == 15) r.fail()
    if (chCode != 0) r.fail() // subset: mono
    val frameBps = ssCode match {
      case 0 => bps
      case 1 => 8
      case 4 => 16
      case _ => r.fail()
    }
    if (frameBps != bps) r.fail()
    if (bs > nominalBlock) r.fail() // last frame may be short, never long
    // CRC-8 over header bytes (bit reader is byte-aligned here by
    // construction: 32 fixed bits + whole utf8/blocksize/rate bytes)
    val headEnd = r.bytePos
    if (r.readBits(8).toInt != crc8(b, p, headEnd)) r.fail()
    // subframe (mono: exactly one)
    if (r.readBits(1) != 0) r.fail()
    val sfType = r.readBits(6).toInt
    val wastedFlag = r.readBits(1)
    val wasted = if (wastedFlag != 0) r.readUnary() + 1 else 0
    if (wasted >= bps) r.fail()
    val eff = bps - wasted
    // predicted samples must fit eff bits (they shift up by `wasted`
    // afterwards): a crafted (CRC-valid) stream whose prediction walks
    // out of range would otherwise flow into consumers as silently
    // wrapped PCM instead of quarantining
    val effLim = 1L << (eff - 1)
    val out = new Array[Int](bs)
    if (sfType == 0) { // CONSTANT
      val v = r.readSigned(eff)
      java.util.Arrays.fill(out, v << wasted)
    } else if (sfType == 1) { // VERBATIM
      var i = 0
      while (i < bs) { out(i) = r.readSigned(eff) << wasted; i += 1 }
    } else if (sfType >= 32) { // LPC, order 1..32 (sfType - 31)
      // integer-exact by spec: quantized coefficients, arithmetic in
      // 64-bit, truncating right-shift BEFORE the residual add — the
      // same losslessness story as FIXED, so real-corpus LPC streams
      // decode rather than quarantine
      val order = sfType - 31
      if (order > bs) r.fail()
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      val precM1 = r.readBits(4).toInt
      if (precM1 == 0xf) r.fail() // invalid per RFC 9639
      val prec = precM1 + 1
      val shift = r.readSigned(5)
      if (shift < 0) r.fail() // negative shift: produced by no encoder
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(prec).toLong; i += 1 }
      val res = new Array[Int](bs - order)
      readResiduals(r, bs, order, res)
      i = order
      while (i < bs) {
        var psum = 0L
        var j = 0
        while (j < order) { psum += coefs(j) * out(i - 1 - j); j += 1 }
        val v = (psum >> shift) + res(i - order)
        if (v < -effLim || v >= effLim) r.fail()
        out(i) = v.toInt
        i += 1
      }
      if (wasted > 0) { i = 0; while (i < bs) { out(i) <<= wasted; i += 1 } }
    } else if (sfType >= 8 && sfType <= 12) { // FIXED order 0..4
      val order = sfType - 8
      if (order > bs) r.fail()
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      val res = new Array[Int](bs - order)
      readResiduals(r, bs, order, res)
      val co = FixedCoefs(order)
      i = order
      while (i < bs) {
        var psum = 0L
        var j = 0
        while (j < order) { psum += co(j).toLong * out(i - 1 - j); j += 1 }
        val v = psum + res(i - order)
        if (v < -effLim || v >= effLim) r.fail()
        out(i) = v.toInt
        i += 1
      }
      if (wasted > 0) { i = 0; while (i < bs) { out(i) <<= wasted; i += 1 } }
    } else r.fail() // reserved subframe types: out of subset
    r.alignByte()
    val bodyEnd = r.bytePos
    if (r.readBits(16).toInt != crc16(b, p, bodyEnd)) r.fail()
    (out, r.bytePos)
  }

  private def readResiduals(r: BitReader, bs: Int, order: Int,
      res: Array[Int]): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) r.fail()
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = r.readBits(4).toInt
    val parts = 1 << po
    if (bs % parts != 0) r.fail()
    val perPart = bs / parts
    if (perPart <= order && parts > 0) r.fail()
    var idx = 0
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      val k = r.readBits(pBits).toInt
      if (k == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { res(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << k) | (if (k > 0) r.readBits(k) else 0L)
          res(idx) = unfold(u)
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && n < 7) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) r.fail()
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val bx = r.readBits(8).toInt
      if ((bx & 0xc0) != 0x80) r.fail()
      v = (v << 6) | (bx & 0x3f)
      i += 1
    }
    v
  }
}
