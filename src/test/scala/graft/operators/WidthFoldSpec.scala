package graft.operators

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Unicode width-fold ([[TextAnalysis.foldWidth]]): the ingest
  * normalization ahead of script-aware segmentation. The table is pinned
  * against `java.text.Normalizer` NFKC per codepoint (the two half-width
  * voiced sound marks excepted — documented below), and the composition
  * claims the operator exists for (tokenization, digit classes, PII
  * patterns see folded text) are each exercised. Half/full-width
  * literals below are safe — build.sbt pins scalac `-encoding UTF-8`
  * (the PipelineQueries convention).
  */
class WidthFoldSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def foldOf(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.foldWidth(col("t")).as("f")).as[String].head()

  test("from/to tables are aligned (no translate-deletion semantics in play)") {
    assert(TextAnalysis.WidthFoldFrom.length ===
      TextAnalysis.WidthFoldTo.length)
    // every source codepoint distinct — a duplicate would shadow a mapping
    assert(TextAnalysis.WidthFoldFrom.toSet.size ===
      TextAnalysis.WidthFoldFrom.length)
  }

  test("every pair IS the NFKC width mapping, except the two voiced marks") {
    val pairs = TextAnalysis.WidthFoldFrom.zip(TextAnalysis.WidthFoldTo)
    pairs.foreach { case (f, t) =>
      val nfkc = Normalizer.normalize(f.toString, Normalizer.Form.NFKC)
      if (f == 'ﾞ' || f == 'ﾟ') {
        // NFKC's targets U+3099/309A are COMBINING marks (they compose
        // onto a preceding letter); a per-codepoint translate cannot
        // compose, so the fold targets the standalone U+309B/309C forms
        assert(nfkc === (if (f == 'ﾞ') "゙" else "゚"))
        assert(t === (if (f == 'ﾞ') '゛' else '゜'))
      } else {
        assert(nfkc === t.toString, f"source U+${f.toInt}%04X")
      }
    }
    // the table covers exactly FF01-FF5E + U+3000 + FF61-FF9F
    assert(TextAnalysis.WidthFoldFrom.map(_.toInt).sorted ===
      ((0x3000 to 0x3000) ++ (0xFF01 to 0xFF5E) ++ (0xFF61 to 0xFF9F))
        .toIndexedSeq)
  }

  test("full-width ASCII and ideographic space fold; other text untouched") {
    // "ＡＢＣ　１２３！" -> "ABC 123!"
    assert(foldOf("ＡＢＣ　１２３！") ===
      "ABC 123!")
    // ASCII, Han, hiragana, hangul pass through unchanged
    val untouched = "plain 123 机器 こん 한국"
    assert(foldOf(untouched) === untouched)
  }

  test("half-width katakana folds into the segmented class (tokenizes per char)") {
    //  (FF86 FF8E FF9D FF7A FF9E) ->     (309B standalone)
    val half = "ﾆﾎﾝｺﾞ"
    val full = "ニホンコ゛"
    assert(foldOf(half) === full)
    // unfolded: one opaque token under seg (FF61-FF9F is outside
    // CjkCharClass); folded: one token per kana codepoint
    val raw = Seq(half).toDF("t")
      .select(TextAnalysis.tokens(col("t"), seg = true).as("x"))
      .as[Seq[String]].head()
    assert(raw === Seq(half))
    val folded = Seq(half).toDF("t")
      .select(TextAnalysis.tokens(TextAnalysis.foldWidth(col("t")),
        seg = true).as("x")).as[Seq[String]].head()
    assert(folded === full.map(_.toString))
    // half-width punctuation lands in the CJK punctuation class
    assert(foldOf("｢ﾊﾟﾝ｡｣") ===
      "「ハ゜ン。」")
  }

  test("a full-width phone number becomes visible to PhonePattern after the fold") {
    val fwPhone = "call ５５５－８６７" +
      "－５３０９ now"
    val counts = Seq(fwPhone).toDF("t").select(
      regexp_count(col("t"), lit(TextAnalysis.PhonePattern)).as("raw"),
      regexp_count(TextAnalysis.foldWidth(col("t")),
        lit(TextAnalysis.PhonePattern)).as("folded")).head()
    assert(counts.getInt(0) === 0)
    assert(counts.getInt(1) === 1)
  }

  test("fold is idempotent and a plain translate (NULL-safe, codegen-friendly)") {
    val s = "Ａ　ﾆﾞ mixed １２"
    assert(foldOf(foldOf(s)) === foldOf(s))
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.foldWidth(col("t")).as("f"))
      .filter(col("f").isNull).count()
    assert(n === 1L)
  }

  private def nfkcOf(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.foldWidthNfkc(col("t")).as("f"))
      .as[String].head()

  test("VoicedKanaPairs is exactly Unicode's katakana composition set (pinned vs Normalizer)") {
    assert(TextAnalysis.VoicedKanaPairs.size === 30)
    // keys distinct; no replacement char re-matches another pattern's base
    val keys = TextAnalysis.VoicedKanaPairs.map(_._1)
    assert(keys.toSet.size === keys.size)
    val bases = keys.map(_.charAt(0)).toSet
    assert(TextAnalysis.VoicedKanaPairs.forall { case (_, to) =>
      !bases.contains(to.charAt(0)) })
    TextAnalysis.VoicedKanaPairs.foreach { case (from, to) =>
      // NFC over (base, COMBINING mark) must produce our target
      val combining = if (from.charAt(1) == '゛') '゙' else '゚'
      val nfc = Normalizer.normalize(s"${from.charAt(0)}$combining",
        Normalizer.Form.NFC)
      assert(nfc === to, f"pair U+${from.charAt(0).toInt}%04X")
    }
    // and every composable katakana is covered: no (kana, combining)
    // pair outside the table composes under NFC
    (0x30A1 to 0x30FA).map(_.toChar).foreach { base =>
      Seq('゙', '゚').foreach { m =>
        val nfc = Normalizer.normalize(s"$base$m", Normalizer.Form.NFC)
        val key = s"$base${if (m == '゙') '゛' else '゜'}"
        if (nfc.length == 1)
          assert(TextAnalysis.VoicedKanaPairs.toMap.get(key)
            .contains(nfc), f"missing composable U+${base.toInt}%04X")
        else
          assert(!TextAnalysis.VoicedKanaPairs.toMap.contains(key))
      }
    }
  }

  test("foldWidthNfkc composes half-width voiced pairs to the NFKC result") {
    //  ﾆﾎﾝｺﾞ -> ニホンゴ (NFKC, fully composed)
    assert(nfkcOf("ﾆﾎﾝｺﾞ") ===
      Normalizer.normalize("ﾆﾎﾝｺﾞ", Normalizer.Form.NFKC))
    //  ﾊﾟﾝ -> パン; ｳﾞ -> ヴ; ﾜﾞ -> ヷ
    Seq("ﾊﾟﾝ", "ｳﾞｨｰﾅｽ", "ﾜﾞ", "ｦﾞ").foreach { s =>
      assert(nfkcOf(s) === Normalizer.normalize(s, Normalizer.Form.NFKC), s)
    }
    // a mark after a non-composable base stays decomposed (ｱﾞ -> ア゛ in
    // our non-combining spelling; NFKC keeps it decomposed too, with the
    // combining mark)
    assert(nfkcOf("ｱﾞ") === "ア゛")
    // composition is idempotent and leaves composed text alone
    assert(nfkcOf(nfkcOf("ﾊﾟｶﾞｰﾄﾞ")) === nfkcOf("ﾊﾟｶﾞｰﾄﾞ"))
    assert(nfkcOf("ガパヴ already composed") === "ガパヴ already composed")
  }

  test("composeVoicedKanaSql spells the identical chain (shared-table contract)") {
    val sql = TextAnalysis.composeVoicedKanaSql("tf")
    assert(sql.startsWith("replace(") && sql.contains("tf"))
    // one replace per pair
    assert("replace\\(".r.findAllIn(sql).size ===
      TextAnalysis.VoicedKanaPairs.size)
    TextAnalysis.VoicedKanaPairs.foreach { case (from, to) =>
      assert(sql.contains(s"'$from', '$to'"))
    }
  }
}
