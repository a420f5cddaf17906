package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Unigram-LM tokenizer: the Viterbi DP contract (hand-checked
  * segmentations, smallest-k tie-break, losslessness, OOV pricing),
  * hard-EM training (determinism, coverage invariants, prune caps,
  * whole-word convergence) and the distributed encode path.
  */
class UnigramSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def m(pairs: (String, Double)*): Unigram.Model =
    Unigram.Model(pairs.toMap, maxPieceLen = 4)

  test("Viterbi picks the max-probability segmentation (hand-checked)") {
    val model = m("a" -> 0.125, "b" -> 0.125, "ab" -> 0.25, "abc" -> 0.5,
      "c" -> 0.0625)
    // 'abc' as one piece (0.5) beats ab+c (0.25*0.0625) and a+b+c
    assert(Unigram.segment("abc", model)._1 === Seq("abc"))
    // 'abab': ab+ab = 0.0625 beats a+b+ab etc.
    assert(Unigram.segment("abab", model)._1 === Seq("ab", "ab"))
    // best prob is the product
    assert(Unigram.segment("abab", model)._2 === 0.25 * 0.25)
    assert(Unigram.segment("", model)._1 === Seq.empty)
  }

  test("ties break to the SMALLEST piece ending at each position") {
    // p(a)*p(a) == p(aa): 0.25*0.25 == 0.0625 — exact in doubles; the
    // k=1 candidate is scanned first and strictly-greater replaces, so
    // single chars win
    val model = m("a" -> 0.25, "aa" -> 0.0625)
    assert(Unigram.segment("aa", model)._1 === Seq("a", "a"))
  }

  test("segmentation is lossless: concat == word, incl. OOV and unicode") {
    val model = m("a" -> 0.2, "ab" -> 0.3, "b" -> 0.1)
    for (w <- Seq("ababab", "azb", "zzz", "日本語", "a😀b", "x")) {
      val (ps, prob) = Unigram.segment(w, model)
      assert(ps.mkString === w, w)
      assert(prob > 0.0, w)
    }
  }

  test("an OOV char is priced at exactly pUnk per char") {
    val model = m("a" -> 0.5)
    val (ps, prob) = Unigram.segment("za", model)
    assert(ps === Seq("z", "a"))
    assert(prob === Unigram.DefaultPUnk * 0.5)
  }

  test("training is deterministic, keeps every seen char, and caps the multi-char vocab") {
    val words = Array(("thecat", 50L), ("thedog", 40L), ("cat", 30L),
      ("dog", 20L), ("the", 60L))
    val m1 = Unigram.learn(words, vocabSize = 8, maxPieceLen = 4,
      emRounds = 2, seedCap = 64)
    val m2 = Unigram.learn(words, vocabSize = 8, maxPieceLen = 4,
      emRounds = 2, seedCap = 64)
    assert(m1 === m2)
    // every char of every training word has positive probability
    val chars = words.flatMap(_._1.toSeq).map(_.toString).toSet
    chars.foreach(ch => assert(m1.getOrElse(ch, 0.0) > 0.0, ch))
    // multi-char vocab respects the cap
    assert(m1.keys.count(_.length > 1) <= 8)
    // probabilities are a distribution over the final counts
    assert(math.abs(m1.values.sum - 1.0) < 1e-12)
  }

  test("EM keeps a dominant whole word as ONE piece") {
    val words = Array(("spark", 1000L), ("spa", 3L), ("ark", 3L))
    val probs = Unigram.learn(words, vocabSize = 8, maxPieceLen = 4,
      emRounds = 2, seedCap = 64)
    val model = Unigram.Model(probs, maxPieceLen = 4)
    // maxPieceLen = 4 so 'spark' (5 chars) can never be one piece; but
    // EM must converge on a 2-piece split of multi-char vocab entries
    // (char-level segmentation of the dominant word would mean the EM
    // counts did nothing)
    val ps = Unigram.segment("spark", model)._1
    assert(ps.length === 2)
    assert(ps.forall(p => p.length > 1 && probs.contains(p)))
  }

  test("distributed encode == driver segment, and concatenation restores the text's words") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "sparkly things and the dog"),
      (3L, "zzz qqq unknown words")).toDF("id", "text")
    val model = Unigram.train(docs, "text", vocabSize = 16,
      maxVocabWords = 64, minCount = 1, emRounds = 2)
    val enc = Unigram.encode(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, text) <- Seq((1L, "the cat sat on the mat"),
        (2L, "sparkly things and the dog"), (3L, "zzz qqq unknown words"))) {
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val expect = words.flatMap(w => Unigram.segment(w, model)._1)
      assert(enc(id) === expect, s"doc $id")
      assert(enc(id).mkString === words.mkString, s"doc $id lossless")
    }
  }

  test("the shared pUnk constant matches the oracle's literal") {
    assert(Unigram.DefaultPUnk === 0.0009765625)
    // exactly representable: a power of two
    assert(java.lang.Double.toHexString(Unigram.DefaultPUnk) === "0x1.0p-10")
  }
}
