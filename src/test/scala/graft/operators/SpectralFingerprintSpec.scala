package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** The spectral (Haitsma-Kalker / Walsh-Hadamard) audio fingerprint:
  * sequency-table self-validation, the EXACT invariances the operator's
  * scaladoc claims (gain, DC offset), robustness under lossy
  * re-quantization, and the quarantine posture on undecodable payloads.
  */
class SpectralFingerprintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // a real 8-bit mono PCM RIFF/WAVE container around the given samples —
  // the syntheticWavs header layout
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

  // deterministic pseudo-audio with real structure, samples in [0, 60]
  // so integer gains up to 4x stay inside the 8-bit range
  private def baseSamples(seed: Long): Array[Int] =
    Array.tabulate(9 * 32) { i =>
      val h = (i * 2654435761L + seed * 40503L) & 0xffffffffL
      ((h % 41) + (i % 16)).toInt
    }

  private def fpOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, (Long, Boolean)] =
    Multimodal.audioSpectralFingerprint(
        payloads.toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

  test("SeqToNat is a self-validated sequency permutation") {
    val t = Multimodal.SeqToNat
    assert(t.length === 32)
    assert(t.toSet.size === 32)
    // row t(s) has exactly s sign changes — the defining property
    (0 until 32).foreach { s =>
      val row = (0 until 32).map(j =>
        if (Integer.bitCount(t(s) & j) % 2 == 0) 1 else -1)
      val changes = row.sliding(2).count(p => p.head != p.last)
      assert(changes === s, s"sequency of natural row ${t(s)}")
    }
    assert(t(0) === 0) // DC row is natural 0 — the excluded coefficient
  }

  test("EXACT gain invariance: x2 and x4 flip zero bits") {
    val s = baseSamples(7)
    val fps = fpOf(Seq(
      1L -> wavOf(s),
      2L -> wavOf(s.map(_ * 2)),
      3L -> wavOf(s.map(_ * 4))))
    assert(fps(1L)._2 && fps(2L)._2 && fps(3L)._2)
    assert(fps(2L)._1 === fps(1L)._1)
    assert(fps(3L)._1 === fps(1L)._1)
  }

  test("EXACT DC-offset invariance: +40 flips zero bits (DC coefficient excluded)") {
    val s = baseSamples(11)
    val fps = fpOf(Seq(
      1L -> wavOf(s),
      2L -> wavOf(s.map(_ + 40)),
      3L -> wavOf(s.map(v => v * 2 + 50)))) // gain + offset combined
    assert(fps(2L)._1 === fps(1L)._1)
    assert(fps(3L)._1 === fps(1L)._1)
    // the TIME-DOMAIN fingerprint is also offset-stable on frame sums,
    // but its bits ride raw sums where re-quantization noise lands at
    // full weight — the next test pins the spectral advantage there
  }

  test("lossy re-quantization (x3/2 with truncation) flips few spectral bits") {
    val ids = 1L to 20L
    val pairs = ids.flatMap { i =>
      val s = baseSamples(i)
      Seq((i * 2) -> wavOf(s), (i * 2 + 1) -> wavOf(s.map(v => v * 3 / 2)))
    }
    val fps = fpOf(pairs)
    val flips = ids.map { i =>
      java.lang.Long.bitCount(fps(i * 2)._1 ^ fps(i * 2 + 1)._1)
    }
    // truncation is a per-sample perturbation of at most 0.5 LSB; band
    // energies see it at second order. Measured on this corpus: max 4
    // bits of 64 (vs an exact-gain flip count of 0); bound with margin
    assert(flips.max <= 8, s"flips=$flips")
    assert(flips.sum.toDouble / flips.size <= 4.0, s"flips=$flips")
  }

  test("near-dup families band together; quarantine posture on junk") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one"),
      (2L, "alpha beta gamma delta epsilon two"),
      (3L, "totally different words entirely here three"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("family"))
    val fps = Multimodal.audioSpectralFingerprint(
      Multimodal.syntheticWavs(docs, "doc_id", "family"), "id", "payload")
    val pairs = Dedup.hammingCandidates(
        fps.filter(col("decoded")), "id", "asfp")
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // junk payloads quarantine (decoded = false, stub hash), never throw
    val junk = fpOf(Seq(
      10L -> Array[Byte](1, 2, 3),
      11L -> null,
      12L -> wavOf(baseSamples(1).take(64)))) // too short
    assert(junk.values.forall(!_._2))
  }
}
