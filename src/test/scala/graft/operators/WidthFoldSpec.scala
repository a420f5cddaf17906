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
}
