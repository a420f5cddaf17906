package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Script-aware (CJK) segmentation: the per-character tokenizer mode that
  * keeps the text/quality/dedup/DSIR family honest on the multilingual
  * slice every pretraining corpus has (a Chinese document is ONE
  * whitespace token otherwise). All strings below use unicode escapes so
  * the source file stays ASCII under any compiler platform charset.
  */
class SegmentationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // zh "machine learning" (4 han), ja "hello" kana, ko "korean" hangul
  private val Zh = "\u673a\u5668\u5b66\u4e60" // 
  private val Ja = "\u3053\u3093\u306b\u3061\u306f" // 
  private val Ko = "\ud55c\uad6d\uc5b4" // 
  private val IdeoStop = "\u3002" // 
  private val IdeoSpace = "\u3000" // ideographic space (excluded)

  private def tokensOf(s: String, seg: Boolean): Seq[String] =
    Seq(s).toDF("t")
      .select(TextAnalysis.tokens(col("t"), seg).as("ts"))
      .as[Seq[String]].head()

  test("segmentScripts splits CJK per codepoint and leaves Latin words intact") {
    val mixed = s"alpha $Zh beta$Ja gamma"
    assert(tokensOf(mixed, seg = false) ===
      Seq("alpha", Zh, s"beta$Ja", "gamma"))
    assert(tokensOf(mixed, seg = true) ===
      Seq("alpha") ++ Zh.map(_.toString) ++ Seq("beta") ++
        Ja.map(_.toString) ++ Seq("gamma"))
  }

  test("hangul and CJK punctuation are single-char tokens; U+3000 is excluded") {
    assert(tokensOf(Ko, seg = true) === Ko.map(_.toString))
    // ideographic full stop separates from a following Latin word
    assert(tokensOf(s"$Zh${IdeoStop}end", seg = true) ===
      Zh.map(_.toString) ++ Seq(IdeoStop, "end"))
    // U+3000 is NOT padded (it would mint whitespace-looking tokens):
    // ab stays ONE token under both modes
    assert(tokensOf(s"a${IdeoSpace}b", seg = false) === Seq(s"a${IdeoSpace}b"))
    assert(tokensOf(s"a${IdeoSpace}b", seg = true) === Seq(s"a${IdeoSpace}b"))
  }

  test("seg = true is a no-op on pure-Latin text (counts and n-grams unchanged)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val both = docs.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.tokenCount(col("text"), seg = true).as("sg"),
      size(TextAnalysis.wordNgrams(col("text"), 2)).as("nw"),
      size(TextAnalysis.wordNgrams(col("text"), 2, seg = true)).as("ns"))
    assert(both.filter((col("ws") =!= col("sg"))
      .or(col("nw") =!= col("ns"))).count() === 0L)
  }

  test("a CJK document is one whitespace token but per-char under seg") {
    val doc = Zh + IdeoStop + Zh // 9 codepoints, no whitespace
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.tokenCount(col("text"), seg = true).as("sg")).head()
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 9L)
  }

  test("qualitySignals(seg) fixes token-denominated signals, keeps char ratios raw") {
    val doc = Zh + " latin"
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val sg = TextAnalysis.qualitySignals(df, col("text"), seg = true).head()
    val ws = TextAnalysis.qualitySignals(df, col("text")).head()
    val iTok = sg.fieldIndex("n_tokens")
    val iChars = sg.fieldIndex("n_chars_m")
    val iSpace = sg.fieldIndex("space_ratio")
    assert(ws.getLong(iTok) === 2L)
    assert(sg.getLong(iTok) === 5L) // 4 han + "latin"
    // raw-text character signals must NOT see the inserted pad spaces
    assert(sg.getLong(iChars) === ws.getLong(iChars))
    assert(sg.getDouble(iSpace) === ws.getDouble(iSpace))
  }

  test("repetitionSignals(seg) surfaces repeated CJK n-grams invisible to whitespace") {
    val doc = (Zh + IdeoStop) * 6 // heavy repetition, zero whitespace
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val ws = TextAnalysis.repetitionSignals(df, "doc_id", "text").head()
    val sg = TextAnalysis.repetitionSignals(df, "doc_id", "text",
      seg = true).head()
    val i = ws.fieldIndex("top2_char_frac")
    assert(ws.getDouble(i) === 0.0) // one token -> no bigrams at all
    assert(sg.getDouble(i) > 0.3) // the repeated bigram covers the doc
  }

  test("DSIR with seg matches a CJK raw doc to a CJK target; without seg it cannot") {
    // target: two Chinese docs sharing characters; raw pool: one Chinese
    // doc sharing those characters (but not the exact full-doc string)
    // and one Latin doc. Whitespace mode sees four DISTINCT giant tokens
    // -> no shared features -> the Chinese raw doc gains nothing.
    val df = Seq(
      (1L, Zh + IdeoStop + Ja, true),
      (2L, Ja + IdeoStop + Zh, true),
      (3L, Zh + Ja + Zh, false),
      (4L, "totally unrelated latin text", false)
    ).toDF("id", "text", "tgt")
    assert(Dsir.select(df, "id", "text", col("tgt"), k = 1, buckets = 256,
      seg = true).select("id").as[Long].head() === 3L)
    // the crisp mechanism claim: under whitespace tokenization doc 3
    // shares ZERO feature buckets with the target (its whole text is one
    // never-seen token); under seg the shared characters overlap
    def bucketOverlap(seg: Boolean): Long = {
      val fc = Dsir.featureCounts(df, "id", "text", col("tgt"), 256,
        seg = seg)
      val tgtB = fc.filter(col("tgt")).select("b").distinct()
      fc.filter(!col("tgt") && col("id") === 3L).select("b").distinct()
        .join(tgtB, "b").count()
    }
    assert(bucketOverlap(seg = false) === 0L)
    assert(bucketOverlap(seg = true) > 0L)
  }

  test("composition covers the textCol-taking family: shingles, BPE, inverted index") {
    // the seg normalizer is PRE-tokenization, so any operator that takes
    // a text column gains CJK support by composing — no per-operator
    // plumbing. Pin that for the three families the r15 verdict named.
    val doc = Zh + IdeoStop + Ja // 10 codepoints, zero whitespace
    val segged = Seq((1L, doc), (2L, doc), (3L, doc))
      .toDF("doc_id", "text")
      .withColumn("text_seg",
        TextAnalysis.segmentScripts(col("text")))
    // shingles: whitespace mode sees ONE 1-token shingle; segmented mode
    // sees the char trigrams
    val shWs = segged.select(Dedup.shingles(col("text")).as("sh"))
      .as[Seq[String]].head()
    val shSeg = segged.select(Dedup.shingles(col("text_seg")).as("sh"))
      .as[Seq[String]].head()
    assert(shWs === Seq(doc))
    assert(shSeg.length === 8) // 10 chars -> 8 trigrams
    assert(shSeg.head === doc.take(3).map(_.toString).mkString(" "))
    // inverted index: segmented mode posts one term per Han codepoint
    val terms = TextAnalysis.invertedIndex(
      segged.select(col("doc_id"), col("text_seg").as("text")),
      "doc_id", "text")
      .select("term").distinct().as[String].collect().toSet
    assert(terms === doc.map(_.toString).toSet)
    // BPE: the word model over segmented text is per-character words, so
    // training learns no cross-word merges but ENCODES Han text (the
    // whitespace mode would feed the whole doc as one giant word)
    val model = Bpe.train(
      segged.select(col("text_seg").as("text")), "text",
      numMerges = 4, minCount = 1L)
    val enc = Bpe.encodeWord(Zh.take(1), model)
    assert(enc.nonEmpty)
  }

  test("gopherRules(seg) counts CJK words in the denominator") {
    val doc = Zh * 10 + " the and of to in " + Zh * 10
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val ws = TextAnalysis.gopherRules(df, col("text")).head()
    val sg = TextAnalysis.gopherRules(df, col("text"), seg = true).head()
    val i = ws.fieldIndex("n_words")
    assert(ws.getLong(i) === 7L) // 2 CJK blobs + 5 stopwords
    assert(sg.getLong(i) === 85L) // 80 han chars + 5 stopwords
  }
}
