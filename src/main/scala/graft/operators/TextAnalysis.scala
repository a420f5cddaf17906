package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column algebra:
  * whole-stage-codegen'd, no UDFs, no shuffles — each operator is a narrow
  * map over the documents table, so it scales linearly and fuses with any
  * downstream filter/aggregate Catalyst plans around it.
  *
  * DECLARED TOKENIZATION CONVENTION (shared bit-for-bit with every DuckDB
  * oracle twin — changing it means changing both engines in lockstep):
  * `trim` strips ASCII spaces ONLY (Spark semantics; tab/newline-edged
  * text keeps its edge whitespace) and `split(\s+)` keeps the resulting
  * leading/trailing empty tokens, so a newline-terminated document
  * counts one empty edge token and line-rule operators assume LF line
  * endings. This is the corpus contract (the generator emits LF/space
  * text); corpora with CRLF or exotic whitespace should be normalized at
  * ingest (`regexp_replace(text, "\\r\\n?", "\n")`) before these
  * operators. The hash fingerprints additionally rely on WRAPPING Long
  * arithmetic — run them with `spark.sql.ansi.enabled=false` (this
  * repo's session posture) or overflow throws under ANSI.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column; `seg = true` applies
    * script-aware segmentation ([[segmentScripts]]) first, so CJK text —
    * which carries no inter-word whitespace — tokenizes per character
    * instead of collapsing into one giant token.
    */
  def tokens(text: Column, seg: Boolean = false): Column =
    split(trim(if (seg) segmentScripts(text) else text), "\\s+")

  /** Token count (0 for empty/blank text); `seg` as in [[tokens]]. */
  def tokenCount(text: Column, seg: Boolean = false): Column = {
    val t = if (seg) segmentScripts(text) else text
    when(length(trim(t)) === 0, lit(0)).otherwise(size(tokens(t))).cast("long")
  }

  /** Character class of codepoints the script-aware tokenizer treats as
    * single-character words: Han (unified + extension A + compatibility),
    * Hiragana/Katakana, Hangul syllables, and CJK punctuation (EXCLUDING
    * U+3000 ideographic space — padding a whitespace char would mint
    * whitespace-looking tokens). `\x{...}` hex escapes carry identical
    * semantics in Java regex (Spark) and RE2 (DuckDB), so the oracle
    * replays segmentation byte-for-byte — the same cross-engine
    * discipline as [[HtmlWhitespacePattern]]. Thai/Khmer/Lao (also
    * space-free scripts) are deliberately out of scope: their combining
    * vowel marks make per-codepoint splitting wrong, not just crude.
    */
  val CjkCharClass: String =
    """\x{3001}-\x{303f}\x{3040}-\x{30ff}\x{3400}-\x{4dbf}""" +
      """\x{4e00}-\x{9fff}\x{ac00}-\x{d7af}\x{f900}-\x{faff}"""

  /** [[segmentScripts]]' pattern + per-engine replacement tokens (Java
    * spells group 1 `$1`, RE2 `\1` — the [[PhoneMaskSpark]] convention).
    */
  val SegmentPattern: String = s"([$CjkCharClass])"
  val SegmentReplSpark: String = " $1 "
  val SegmentReplDuck: String = """ \1 """

  /** Script-aware pre-tokenization normalizer: pad every CJK codepoint
    * with ASCII spaces, so the downstream whitespace split — the
    * engine-wide declared tokenization — sees one token per CJK
    * character and unchanged Latin words. This is the standard
    * per-character CJK heuristic of pretraining pipelines (a Chinese /
    * Japanese document is otherwise ONE whitespace token, silently
    * degrading quality rules, repetition signals, n-gram dedup and DSIR
    * features on the multilingual slice every real corpus has). One
    * codegen'd `regexp_replace`, zero shuffles; replayable in SQL via
    * [[SegmentPattern]]/[[SegmentReplDuck]].
    */
  def segmentScripts(text: Column): Column =
    regexp_replace(text, SegmentPattern, SegmentReplSpark)

  /** Half-width katakana (U+FF61–FF9F) -> full-width equivalents. The
    * two voiced sound marks fold to the NON-combining U+309B/309C
    * (NFKC's targets U+3099/309A are combining marks, which a pure
    * per-codepoint `translate` cannot compose onto the preceding
    * letter); every other pair IS the NFKC mapping, and WidthFoldSpec
    * pins that against `java.text.Normalizer`. */
  private val HalfKanaPairs: Seq[(Int, Int)] = Seq(
    0xFF61 -> 0x3002, 0xFF62 -> 0x300C, 0xFF63 -> 0x300D, 0xFF64 -> 0x3001,
    0xFF65 -> 0x30FB, 0xFF66 -> 0x30F2,
    0xFF67 -> 0x30A1, 0xFF68 -> 0x30A3, 0xFF69 -> 0x30A5, 0xFF6A -> 0x30A7,
    0xFF6B -> 0x30A9, 0xFF6C -> 0x30E3, 0xFF6D -> 0x30E5, 0xFF6E -> 0x30E7,
    0xFF6F -> 0x30C3, 0xFF70 -> 0x30FC,
    0xFF71 -> 0x30A2, 0xFF72 -> 0x30A4, 0xFF73 -> 0x30A6, 0xFF74 -> 0x30A8,
    0xFF75 -> 0x30AA, 0xFF76 -> 0x30AB, 0xFF77 -> 0x30AD, 0xFF78 -> 0x30AF,
    0xFF79 -> 0x30B1, 0xFF7A -> 0x30B3, 0xFF7B -> 0x30B5, 0xFF7C -> 0x30B7,
    0xFF7D -> 0x30B9, 0xFF7E -> 0x30BB, 0xFF7F -> 0x30BD, 0xFF80 -> 0x30BF,
    0xFF81 -> 0x30C1, 0xFF82 -> 0x30C4, 0xFF83 -> 0x30C6, 0xFF84 -> 0x30C8,
    0xFF85 -> 0x30CA, 0xFF86 -> 0x30CB, 0xFF87 -> 0x30CC, 0xFF88 -> 0x30CD,
    0xFF89 -> 0x30CE, 0xFF8A -> 0x30CF, 0xFF8B -> 0x30D2, 0xFF8C -> 0x30D5,
    0xFF8D -> 0x30D8, 0xFF8E -> 0x30DB, 0xFF8F -> 0x30DE, 0xFF90 -> 0x30DF,
    0xFF91 -> 0x30E0, 0xFF92 -> 0x30E1, 0xFF93 -> 0x30E2, 0xFF94 -> 0x30E4,
    0xFF95 -> 0x30E6, 0xFF96 -> 0x30E8, 0xFF97 -> 0x30E9, 0xFF98 -> 0x30EA,
    0xFF99 -> 0x30EB, 0xFF9A -> 0x30EC, 0xFF9B -> 0x30ED, 0xFF9C -> 0x30EF,
    0xFF9D -> 0x30F3, 0xFF9E -> 0x309B, 0xFF9F -> 0x309C)

  /** [[foldWidth]]'s per-codepoint table, exposed so a SQL oracle can
    * replay the fold verbatim (`translate` has identical semantics in
    * Spark and DuckDB — the `CjkTransFrom/To` convention): full-width
    * ASCII variants U+FF01–FF5E to ASCII U+0021–007E (offset -0xFEE0),
    * ideographic space U+3000 to ASCII space, half-width katakana to
    * full-width. `WidthFoldToSql` is the TO string escaped for embedding
    * in a single-quoted SQL literal (it contains the ASCII apostrophe —
    * the fold target of U+FF07). */
  val WidthFoldFrom: String =
    (0xFF01 to 0xFF5E).map(_.toChar).mkString + "　" +
      HalfKanaPairs.map(_._1.toChar).mkString
  val WidthFoldTo: String =
    (0x21 to 0x7E).map(_.toChar).mkString + " " +
      HalfKanaPairs.map(_._2.toChar).mkString
  val WidthFoldToSql: String = WidthFoldTo.replace("'", "''")

  /** Unicode width-fold — the ingest normalization real ja/zh web text
    * needs AHEAD of [[segmentScripts]]: legacy Japanese pages are full
    * of half-width katakana (ﾆﾎﾝｺﾞ) and standard ja/zh typography writes
    * Latin/digits full-width (ＡＢＣ１２３), both in the
    * Halfwidth-and-Fullwidth-Forms block that [[CjkCharClass]] and ASCII
    * `\d`/`\w` character classes deliberately exclude — unfolded, they
    * evade tokenization, the stopword/langid markers, PII digit patterns
    * ([[PhonePattern]] cannot see a full-width phone number) and dedup
    * shingles. One codegen'd `translate` (a per-codepoint map — the NFKC
    * width subset; NO multi-codepoint composition, so a half-width
    * voiced pair ｶﾞ folds to カ + U+309B rather than composing to ガ),
    * zero shuffles, replayable in SQL via [[WidthFoldFrom]] /
    * [[WidthFoldToSql]]. Compose as
    * `segmentScripts(foldWidth(text))` — the fold targets land INSIDE
    * the segmented class, so folded katakana tokenizes per character
    * like any other kana. */
  def foldWidth(text: Column): Column =
    translate(text, WidthFoldFrom, WidthFoldTo)

  /** The width-fold's multi-codepoint half: (katakana, voiced-mark)
    * PAIRS composed into the precomposed letter — `カ゛` -> `ガ`,
    * `ハ゜` -> `パ` — which a per-codepoint `translate` cannot do (the
    * r17 width-fold's one documented NFKC deviation). 25 voiced + 5
    * semi-voiced pairs, exactly Unicode's canonical-composition set for
    * katakana (ウ゛->ヴ and the archaic ワ行 ヷヸヹヺ included); a mark after a
    * non-composable base (ア゛) stays decomposed, as in NFC. Keys are
    * the NON-combining U+309B/309C — precisely what [[foldWidth]] emits
    * for half-width ﾞ/ﾟ — so `composeVoicedKana(foldWidth(text))`
    * yields the full NFKC result for half-width voiced kana
    * (WidthFoldSpec pins that against `java.text.Normalizer`). */
  val VoicedKanaPairs: Seq[(String, String)] = {
    val voiced = Seq(
      0x30A6 -> 0x30F4, // ウ -> ヴ
      0x30AB -> 0x30AC, 0x30AD -> 0x30AE, 0x30AF -> 0x30B0,
      0x30B1 -> 0x30B2, 0x30B3 -> 0x30B4, // カ行 -> ガ行
      0x30B5 -> 0x30B6, 0x30B7 -> 0x30B8, 0x30B9 -> 0x30BA,
      0x30BB -> 0x30BC, 0x30BD -> 0x30BE, // サ行 -> ザ行
      0x30BF -> 0x30C0, 0x30C1 -> 0x30C2, 0x30C4 -> 0x30C5,
      0x30C6 -> 0x30C7, 0x30C8 -> 0x30C9, // タ行 -> ダ行
      0x30CF -> 0x30D0, 0x30D2 -> 0x30D3, 0x30D5 -> 0x30D6,
      0x30D8 -> 0x30D9, 0x30DB -> 0x30DC, // ハ行 -> バ行
      0x30EF -> 0x30F7, 0x30F0 -> 0x30F8,
      0x30F1 -> 0x30F9, 0x30F2 -> 0x30FA) // ワヰヱヲ -> ヷヸヹヺ
    val semi = Seq(
      0x30CF -> 0x30D1, 0x30D2 -> 0x30D4, 0x30D5 -> 0x30D7,
      0x30D8 -> 0x30DA, 0x30DB -> 0x30DD) // ハ行 -> パ行
    voiced.map { case (b, v) => (s"${b.toChar}゛", v.toChar.toString) } ++
      semi.map { case (b, v) => (s"${b.toChar}゜", v.toChar.toString) }
  }

  /** Apply [[VoicedKanaPairs]] as a chain of literal `replace` calls —
    * each pair is a disjoint 2-char pattern (distinct first chars, no
    * replacement re-matches another pattern), so order is immaterial and
    * one pass per pair suffices; `replace` has identical semantics in
    * Spark and DuckDB, so the oracle replays the chain verbatim via
    * [[composeVoicedKanaSql]]. All 30 replaces stay inside whole-stage
    * codegen; absent-pattern passes are scan-only, no allocation. */
  def composeVoicedKana(text: Column): Column =
    VoicedKanaPairs.foldLeft(text) { case (acc, (from, to)) =>
      org.apache.spark.sql.functions.replace(acc, lit(from), lit(to))
    }

  /** the SQL spelling of [[composeVoicedKana]] over the expression
    * `inner` (nested `replace(...)` — no apostrophes occur in kana, so
    * plain single-quoted literals embed safely) */
  def composeVoicedKanaSql(inner: String): String =
    VoicedKanaPairs.foldLeft(inner) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }

  /** the full ingest normalization: width-fold, then voiced-mark
    * composition — NFKC on the width block including voiced half-width
    * kana */
  def foldWidthNfkc(text: Column): Column =
    composeVoicedKana(foldWidth(text))

  /** Feature-hashing document embeddings (the "hashing trick"): each
    * token lands in dimension `xxhash64(token) mod dim` with a ±1 sign
    * from an independent hash bit (sign cancellation keeps collision
    * bias unbiased — Weinberger et al.'s signed feature hashing), summed
    * per document and L2-normalized. A model-free bridge from raw text
    * into the vector stack: the output column feeds
    * [[Dedup.cosineNearDups]] / [[Similarity]] / [[Dedup.semanticDedup]]
    * directly.
    *
    * Shape at scale: ONE narrow codegen'd map
    * ([[graft.functions.HashEmbedVector]]) — zero shuffles, no exploded
    * per-token intermediate, no UDF, no driver vocabulary, vector width
    * fixed at `dim` regardless of corpus vocabulary (that is the point
    * of the trick). Byte-identical to the previous relational
    * formulation (explode + two corpus-wide shuffles + join), which is
    * retained as [[hashEmbedReference]] for the equivalence spec.
    *
    * `n` selects the feature granularity: 1 = unigram bag of words;
    * n >= 2 hashes word n-grams ([[wordNgrams]]) instead — the right
    * setting when the corpus vocabulary is small relative to document
    * length (unigram bags then overlap for ALL pairs and cosine stops
    * separating; n-grams re-expand the feature space combinatorially).
    *
    * Output: `(idCol, vec: array<float> of length dim)` — unit-norm, or
    * all-zero for documents with no tokens (no n-grams for n >= 2).
    */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64, n: Int = 1): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(n >= 1, s"n must be >= 1, got $n")
    // spread before the kernel projection: the per-feature hash loop is
    // CPU-dense per byte (5.9 task-CPU-s over the scan's 6 splits at
    // sf0.1, StageProfile r20); the kernel is a pure per-row map.
    // n >= 2 uses the FUSED n-gram kernel mode (r21): the former
    // wordNgrams feature column built every n-gram through
    // zip_with/concat — CodegenFallback lambdas that re-evaluated the
    // tokenization once per expression reference (six split(trim(...))
    // instances in the projection) and allocated a string per window.
    val spread = ScaleOps.spreadCpu(docs.select(col(idCol), col(textCol)))
    if (n == 1)
      spread.select(col(idCol), graft.functions.HashEmbedVector
        .hashEmbed(tokens(lower(col(textCol))), dim).as("vec"))
    else
      spread.select(col(idCol), graft.functions.HashEmbedVector
        .hashEmbedNgrams(tokens(lower(col(textCol))), dim, n,
          md5Mode = false).as("vec"))
  }

  /** The pre-kernel relational formulation of [[hashEmbed]] (explode →
    * (doc, idx)-keyed partial-agg shuffle → doc-keyed map assembly →
    * normalize → left-join for tokenless docs). Kept ONLY as the
    * independent reference the equivalence spec pins
    * [[graft.functions.HashEmbedVector]] against, byte for byte — the
    * two compute the identical function by construction (integral ±1
    * sums are order-exact; same ascending-fold norm; same XXH64 calls),
    * and the spec keeps that true.
    */
  private[graft] def hashEmbedReference(docs: DataFrame, idCol: String,
      textCol: String, dim: Int = 64, n: Int = 1): DataFrame =
    hashEmbedRelational(docs, idCol, textCol, dim, n,
      identity,
      t => pmod(xxhash64(t), lit(dim)).cast("int"),
      t => when(pmod(xxhash64(t, lit(7)), lit(2)) === 0, lit(1.0))
        .otherwise(lit(-1.0)))

  /** [[hashEmbed]] in md5 oracle mode: the slot is the first md5 half mod
    * `dim`, the sign the parity of the second half — every step (n-grams,
    * slot sums, L2 normalize, float round-trip) plain SQL, so a DuckDB
    * oracle can rebuild the vectors and replay whatever LSH/cosine
    * pipeline consumes them (q_text_embed_neardup). Same zero-shuffle
    * kernel shape as the xxhash default ([[graft.functions.Md5Hash]]
    * inside [[graft.functions.HashEmbedVector]]'s md5 mode) — switching
    * hash family costs no plan structure; the kernel is spec-pinned
    * byte-for-byte against [[hashEmbedMd5Reference]], exactly as the
    * xxhash pair is.
    */
  def hashEmbedMd5(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64, n: Int = 1): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(n >= 1, s"n must be >= 1, got $n")
    // same spread as [[hashEmbed]] (the md5 mode's per-feature digest is
    // the MOST CPU-dense map on the text surface); n >= 2 takes the
    // fused n-gram kernel mode — see [[hashEmbed]]
    val spread = ScaleOps.spreadCpu(docs.select(col(idCol), col(textCol)))
    if (n == 1)
      spread.select(col(idCol), graft.functions.HashEmbedVector
        .hashEmbedMd5(tokens(lower(col(textCol))), dim).as("vec"))
    else
      spread.select(col(idCol), graft.functions.HashEmbedVector
        .hashEmbedNgrams(tokens(lower(col(textCol))), dim, n,
          md5Mode = true).as("vec"))
  }

  /** The relational formulation of [[hashEmbedMd5]] — the independent
    * reference its kernel is spec-pinned against, byte for byte
    * (OperatorsSpec), mirroring the [[hashEmbedReference]] pair.
    */
  private[graft] def hashEmbedMd5Reference(docs: DataFrame, idCol: String,
      textCol: String, dim: Int = 64, n: Int = 1): DataFrame =
    hashEmbedRelational(docs, idCol, textCol, dim, n,
      t => md5(t.cast("binary")),
      x => pmod(conv(substring(x, 1, 8), 16, 10)
        .cast("long"), lit(dim)).cast("int"),
      x => when(pmod(conv(substring(x, 9, 8), 16, 10)
        .cast("long"), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0)))

  /** Shared relational body of [[hashEmbedReference]] /
    * [[hashEmbedMd5Reference]]:
    * `prep` stages the per-feature hash value under a MULTI-USE alias —
    * one md5 per feature, its two 32-bit halves sliced off the staged hex
    * (single-use aliases get CollapseProject-inlined and the hash would
    * re-run per consumer; the xxhash mode preps `identity` since its two
    * seeded hashes share nothing) — and `idx`/`sgn` map that staged value
    * to the slot and ±1 sign (the only places the two modes differ).
    */
  private def hashEmbedRelational(docs: DataFrame, idCol: String,
      textCol: String, dim: Int, n: Int,
      prep: Column => Column, idx: Column => Column, sgn: Column => Column
  ): DataFrame = {
    val featCol =
      if (n == 1) tokens(lower(col(textCol))) else wordNgrams(col(textCol), n)
    val contrib = docs
      .select(col(idCol), explode(featCol).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol), prep(col("__tok")).as("__hx"))
      .withColumn("__idx", idx(col("__hx")))
      .withColumn("__sgn", sgn(col("__hx")))
      .groupBy(col(idCol), col("__idx"))
      .agg(sum(col("__sgn")).as("__v"))
    val assembled = contrib
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__idx"), col("__v"))))
        .as("__m"))
      .withColumn("__raw", transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0.0))))
      .select(col(idCol),
        Similarity.normalized(col("__raw")).cast("array<float>").as("vec"))
    // tokenless documents (empty text) still get a (zero) vector
    docs.select(col(idCol)).join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("vec"), typedLit(Array.fill(dim)(0.0f))).as("vec"))
  }

  /** CCNet-style n-gram language-model perplexity scoring: train bigram
    * and unigram counts on the corpus itself, then score every document
    * by its mean negative log2 bigram probability under add-alpha
    * smoothing — `nll = -log2((c(w1,w2)+a) / (c(w1)+a*V))` averaged over
    * the document's bigrams. Low score = fluent/common text, high =
    * gibberish or vocabulary soup; the standard self-supervised quality
    * filter when no external LM exists.
    *
    * Shape at scale: two count shuffles (bigram-keyed, token-keyed),
    * then the corpus re-joins its own count tables — bigram-keyed, with
    * the (zipf-small) unigram table left to AQE to broadcast — and one
    * doc-keyed aggregate. At 100 TB the join key becomes
    * `xxhash64(bigram)` with counts riding the hash (the same 8-byte
    * trade as [[graft.operators.Dedup.shingleHashes]]); the string key
    * here keeps the oracle replayable. Per-bigram NLL terms are rounded
    * BEFORE the decimal-exact sum (the `q_text_bm25` pattern) so both
    * engines aggregate identical addends in any order; the vocabulary
    * size rides in as a broadcast single-row frame, keeping the whole
    * plan lazy.
    *
    * Output: `(idCol, n_bigrams, avg_nll_bits)` for documents with at
    * least one bigram (sub-2-token documents have no LM evidence and are
    * absent).
    */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // spread ONCE before the tokenize/explode passes: the bigram and
    // unigram tokenizations each ran as a ~0.9 s single task behind the
    // small-SF scan's one split (StageProfile r20); both consumers read
    // the SAME round-robin exchange (canonically equal subtrees ->
    // ReuseExchange), so the spread costs one narrow shuffle. Counts and
    // the decimal-exact NLL sum are placement-independent.
    val spread = ScaleOps.spreadCpu(
      docs.select(col(idCol), col(textCol)))
    val grams = spread.select(col(idCol),
      explode(wordNgrams(col(textCol), 2)).as("__bigram"))
    val biCounts = grams.groupBy("__bigram").agg(count(lit(1)).as("__c2"))
    val uniCounts = spread
      .select(explode(tokens(lower(col(textCol)))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy("__tok").agg(count(lit(1)).as("__c1"))
    val vocabSize = uniCounts.agg(count(lit(1)).as("__v"))
    grams
      .join(biCounts, "__bigram")
      .withColumn("__w1", substring_index(col("__bigram"), " ", 1))
      .join(uniCounts, col("__w1") === col("__tok"))
      .crossJoin(broadcast(vocabSize))
      .withColumn("__nll", round(-log2(
        (col("__c2") + lit(alpha)) /
          (col("__c1") + lit(alpha) * col("__v"))), 6))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (graft.functions.Exact.dsum(col("__nll")) / count(lit(1)))
          .as("avg_nll_bits"))
  }

  /** Inverted-index build (search-index construction): one posting row
    * per (term, document) carrying term frequency, the term's FIRST
    * 0-based token position (phrase/proximity seeds), and the term's
    * document frequency; terms below `minDf` documents are dropped
    * (hapax noise). Lowercased whitespace tokens.
    *
    * Shape at scale: explode, then ONE map-side-combined shuffle keyed on
    * (term, doc) for the tf/position aggregate, then df via a map-side-
    * combinable per-term aggregate JOINED back (never a term-keyed
    * window, which would funnel a zipfian head term's postings into one
    * task — see the comment at the df computation below) — the
    * distributed equivalent of the sort-by-term posting-list merge every
    * search-index builder runs. No driver materialization; downstream
    * writers partition by term range.
    *
    * Output: `(term, idCol, tf, first_pos, df)`.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    // spread before the posting explode (the 1-split small-SF scan
    // serialized the tokenize+explode+partial-agg stage; StageProfile
    // r20) — tf/min-position/df aggregates are placement-independent
    val posted = ScaleOps.spreadCpu(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(tokens(lower(col(textCol)))).as(Seq("__pos", "term")))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"), min("__pos").cast("long").as("first_pos"))
    // df via a map-side-combinable aggregate + term-keyed join, NOT a
    // count().over(partitionBy(term)) window: the window funnels every
    // posting of a zipfian head term ("the" ~ most of the corpus) into
    // ONE task; the aggregate collapses to one row per term before the
    // shuffle and AQE's skew split can still divide the join
    val dfCounts = posted.groupBy("term").agg(count(lit(1)).as("df"))
    posted.join(dfCounts, "term").filter(col("df") >= minDf)
  }

  /** Word n-grams of a text column (space-joined, lowercase): the corpus
    * n-gram-statistics building block (bigram/trigram frequency tables,
    * language-model counts). A document with fewer than n tokens yields
    * an EMPTY array (no partial n-gram — mirrors the windowed formula an
    * external engine computes, unlike [[graft.operators.Dedup.shingles]]
    * which emits the whole short text as one shingle for LSH recall).
    */
  def wordNgrams(text: Column, n: Int, seg: Boolean = false): Column = {
    val toks = split(trim(lower(if (seg) segmentScripts(text) else text)), "\\s+")
    // blank text physically splits to one empty token — without the
    // second clause wordNgrams(blank, 1) returned [""] against the
    // documented empty-array contract (n >= 2 already hit size < n)
    when(size(toks) < n ||
        (size(toks) === 1 && element_at(toks, 1) === ""),
      array().cast("array<string>"))
      .otherwise(slidingConcat(toks, n))
  }

  /** Space-joined sliding windows of length `n` over a token array, built
    * as `n-1` chained `zip_with`s of shifted slices. Each `zip_with`
    * evaluates its array children ONCE per row; the equivalent
    * `transform(sequence(...), i => slice(toks, i+1, n))` formulation
    * re-evaluates the token expression PER WINDOW (higher-order-function
    * lambdas inline their free subexpressions), turning tokenization into
    * O(tokens^2) per document — a 10x+ slowdown on real documents.
    */
  private[graft] def slidingConcat(toks: Column, n: Int): Column = {
    val m = greatest(size(toks) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), m), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** A BPE-ish subword proxy: counts alternating letter/digit/punctuation
    * runs rather than whitespace words — a deterministic stand-in for a
    * real tokenizer's token count (no tokenizer libs in this container).
    * Case-insensitive classes: an uppercase letter is a letter, not a
    * punctuation boundary ("Hello" is one run, not two).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text,
      "(?<=[A-Za-z0-9])(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9\\s])(?=[A-Za-z0-9])|\\s+"),
      t => length(t) > 0)).cast("long")

  /** Occurrences of a marker substring (deterministic, engine-portable:
    * implemented as length arithmetic so the DuckDB oracle can mirror it).
    * The divisor is the marker's CODE POINT count — Spark's `length()`
    * counts code points, so a supplementary-plane marker (emoji) of
    * UTF-16 length 2 still counts each occurrence as exactly 1.
    */
  def occurrences(text: Column, marker: String): Column = {
    // an empty marker would make the divisor 0 — a silent NULL under
    // non-ANSI that then passes threshold filters downstream
    require(marker.nonEmpty, "marker must be non-empty")
    (length(text) - length(replace(text, lit(marker), lit("")))) /
      marker.codePointCount(0, marker.length)
  }

  /** Regexes shared by the scrub operator and its oracle — deliberately
    * restricted to syntax with identical semantics in Java regex (Spark)
    * and RE2 (DuckDB): character classes, bounded repetition, alternation.
    */
  val emailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // \r excluded too: without it a URL on CRLF text matches through the
  // carriage return and the scrub swallows a non-URL control byte
  val urlRegex = "https?://[^ \\t\\n\\r]+"

  /** PII/boilerplate scrubbing: redact emails and URLs with typed
    * placeholders. A narrow codegen'd map — the shape of every
    * regex-scrub pass (phone numbers, ids, ...) a training-data pipeline
    * stacks on top.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, urlRegex, "<URL>"),
      emailRegex, "<EMAIL>")

  /** Count of email-shaped substrings (non-overlapping). */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailRegex))

  /** Language-ID by stopword-marker scoring over a fixed marker table.
    * N-gram-heuristic style: argmax over per-language marker hit counts,
    * deterministic tie-break by language code order.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " la "),
    "es" -> Seq(" el ", " y ", " los "),
    // space-free scripts use BARE substring markers (no space padding):
    // zh/ja/ko text carries no inter-word whitespace, so the marker is
    // the particle/copula itself (literal CJK — build.sbt pins -encoding
    // UTF-8 so a platform default cannot mojibake these)
    "zh" -> Seq("的", "了", "是"),
    "ja" -> Seq("の", "です", "ました"),
    "ko" -> Seq("입니다", "그리고", "에서"))

  /** Marker-occurrence score over ` lower(text) ` — LOWERCASED and
    * SPACE-PADDED exactly like [[gopherRules]]' stopword check, so
    * title-case text ("The Best Of...") and string-edge tokens
    * ("the cat...") hit the space-delimited lowercase markers; without
    * the normalization short English headlines scored 0 on every
    * language and fell to "und". */
  def langScore(text: Column, lang: String): Column =
    langScoreOnPadded(langIdPad(text), lang)

  /** [[langScore]] with the ` lower(text) ` padding already applied —
    * the shared building block that lets [[withLangId]] stage the padded
    * string ONCE for all `7 langs x 3 markers` occurrence scans. */
  def langScoreOnPadded(padded: Column, lang: String): Column =
    langMarkers(lang).map(m => occurrences(padded, m)).reduce(_ + _)

  /** the langId normalization: lowercase + space padding (see
    * [[langScore]]'s scaladoc for why) */
  def langIdPad(text: Column): Column =
    concat(lit(" "), lower(text), lit(" "))

  def langId(text: Column): Column = langIdOnPadded(langIdPad(text))

  /** [[langId]] over an already-padded column (see [[withLangId]]). */
  def langIdOnPadded(padded: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scores = langs.map(l => langScoreOnPadded(padded, l))
    val best = greatest(scores: _*)
    // first language (in code order) achieving the max; 'und' if none hit
    langs.zip(scores).reverse.foldLeft(lit("und")) {
      case (acc, (l, s)) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** [[langId]] appended as a column with the padded-lowercase text
    * staged in its OWN projection first. The plain Column form rebuilds
    * `concat(' ', lower(text), ' ')` inside all 21 marker scans and
    * most of those sit in CONDITIONAL branches (the when-chain), which
    * whole-stage codegen's subexpression elimination excludes — so the
    * lower+concat runs up to 21x per row. The projection boundary
    * materializes it once (CollapseProject leaves it alone: the alias
    * is expensive and multi-referenced); measured -17% on the langId
    * aggregate at sf0.1 (0.76 -> 0.63 s), the difference between the
    * r16 CJK marker growth (12 -> 21 markers) costing +62% and +35% on
    * langId consumers. Output is bit-identical to `langId(text)`. */
  def withLangId(df: DataFrame, text: Column, out: String): DataFrame = {
    // DOUBLE staging (r18: the LangIdTrained.score lesson applied back
    // here): stage the padded text, then ALSO stage the 7 per-language
    // scores in their own projection — the argmax when-chain references
    // every score in CONDITIONAL branches, which codegen's
    // subexpression elimination excludes, so the plain-Column form
    // re-ran each marker-scan sum ~2-3x per row even over staged
    // padding. Both boundaries survive CollapseProject (expensive,
    // multi-referenced aliases). Output bit-identical to langId(text).
    val p = "__langid_pad"
    val langs = langMarkers.keys.toSeq.sorted
    val scoreCols = langs.map(l => s"__lidsc_$l")
    val padded = df.withColumn(p, langIdPad(text))
    val staged = padded.select(
      (padded.columns.map(col).toIndexedSeq ++
        langs.zip(scoreCols).map { case (l, nm) =>
          langScoreOnPadded(col(p), l).as(nm)
        }): _*)
    val scores = scoreCols.map(col)
    val best = greatest(scores: _*)
    val pred = langs.zip(scores).reverse
      .foldLeft(lit("und"): Column) { case (acc, (l, s)) =>
        when(s === best && best > 0, lit(l)).otherwise(acc)
      }
    staged.withColumn(out, pred).drop(p +: scoreCols: _*)
  }

  /** Quality-scoring signals: ratios are integer-arithmetic divisions, so
    * they are bit-identical across engines. `seg = true` switches every
    * TOKEN-denominated signal (n_tokens, mean_token_len, stopword_ratio)
    * to the script-aware tokenizer ([[segmentScripts]]); the character
    * ratios stay on the RAW text — inserted segmentation spaces must not
    * inflate space_ratio or n_chars.
    */
  def qualitySignals(df: DataFrame, text: Column,
      seg: Boolean = false): DataFrame = df
    .withColumn("n_chars_m", length(text).cast("long"))
    .withColumn("n_tokens", tokenCount(text, seg))
    // denominators guarded like mean_token_len's: an empty document gets
    // ratio 0, not a NULL (non-ANSI) or an error (ANSI) from 0/0 — a
    // NULL ratio would silently pass `ratio < threshold` quality filters
    .withColumn("alpha_ratio",
      (length(regexp_replace(text, "[^A-Za-z]", "")) /
        greatest(length(text), lit(1))).cast("double"))
    .withColumn("digit_ratio",
      (length(regexp_replace(text, "[^0-9]", "")) /
        greatest(length(text), lit(1))).cast("double"))
    .withColumn("space_ratio",
      (length(regexp_replace(text, "[^ ]", "")) /
        greatest(length(text), lit(1))).cast("double"))
    .withColumn("mean_token_len",
      (length(regexp_replace(text, "\\s+", "")).cast("double") /
        greatest(tokenCount(text, seg), lit(1L))).cast("double"))
    .withColumn("stopword_ratio",
      (langScore(text, "en").cast("double") /
        greatest(tokenCount(text, seg), lit(1L))).cast("double"))

  /** Intra-document repetition: the fraction of duplicate sentences
    * (split on '. ') — a standard quality signal for boilerplate/spam.
    * Pure array algebra: split, distinct, size arithmetic.
    */
  def repetitionRatio(text: Column): Column = {
    val sents = split(text, "\\. ")
    (lit(1.0) - size(array_distinct(sents)).cast("double") /
      greatest(size(sents), lit(1))).cast("double")
  }

  /** URL host component (`parse_url` — codegen'd, handles ports/userinfo/
    * fragments per RFC; NULL for malformed URLs). The per-host/per-domain
    * aggregation this feeds is the standard web-corpus curation step
    * (host-level quality priors, domain quotas, robots blocklists).
    */
  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))

  /** URL path component. */
  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))

  /** Registered-domain approximation: the last two dot-labels of the host
    * ("a.b.example.com" -> "example.com"). A faithful version needs the
    * public-suffix list (external data, multi-label TLDs like "co.uk");
    * two labels is the standard dependency-free approximation. Hosts with
    * fewer than two labels pass through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    // a rooted FQDN ("example.com.") splits to a trailing empty label;
    // without stripping the dot, slice(-2, 2) would return ["com", ""]
    // and group the host under the garbage pseudo-domain "com."
    val h = regexp_replace(host, "\\.$", "")
    val labels = split(h, "\\.")
    when(size(labels) <= 2, h)
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Canonical URL form for URL-level deduplication — the curation rule
    * set crawlers apply before exact dedup so trivially-different spellings
    * of one page collapse: strip the fragment, lowercase scheme+host, drop
    * default ports (:80/:443), strip a trailing path slash (root stays
    * "/"), drop `utm_*` tracking parameters, and sort the surviving query
    * parameters. Built from engine-portable regex/array primitives (the
    * oracle replays the exact pipeline in SQL). Output omits the scheme:
    * http/https duplicates collapse too.
    */
  def canonicalizeUrl(url: Column): Column = {
    // (?i): crawled data spells schemes in any case (HTTP://, Https://) —
    // a case-sensitive match would pass those through un-canonicalized
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = regexp_extract(noFrag, "(?i)^(https?://[^/?]+)", 1)
    val rest = regexp_replace(noFrag, "(?i)^https?://[^/?]+", "")
    val host = lower(regexp_replace(schemeHost, ":(80|443)$", ""))
    val hostNoScheme = regexp_replace(host, "^https?://", "")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val query0 = when(instr(rest, "?") > 0,
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = filter(split(query0, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val q = array_join(array_sort(kept), "&")
    concat(hostNoScheme, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Thresholds for [[gopherRules]] — defaults follow the published Gopher
    * heuristics (Rae et al. 2021, "Scaling Language Models", §A.1.1):
    * word count in [50, 100k], mean word length in [3, 10], symbol-to-word
    * ratio (# and ellipsis) ≤ 0.1, ≤10% of lines bullet-started, ≤30% of
    * lines ellipsis-ended, ≥80% of words containing a letter, and at least
    * 2 distinct common-English stopwords present.
    */
  final case class GopherConfig(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.1,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2)

  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules: one boolean flag column per rule
    * plus the conjunction `quality_pass`. Pure column algebra over the
    * text — a narrow codegen'd map with no shuffle, so the filter fuses
    * into the scan stage and the full rule set costs one pass at any
    * scale. Each ratio guards its denominator (an empty doc fails the
    * word-count rule but produces 0-ratios, never NULL/0-div).
    */
  def gopherRules(df: DataFrame, text: Column,
      cfg: GopherConfig = GopherConfig(), seg: Boolean = false): DataFrame = {
    val nw = greatest(tokenCount(text, seg), lit(1L))
    val mwl = (length(regexp_replace(text, "\\s+", "")).cast("double") / nw)
    val symbols = (occurrences(text, "#") + occurrences(text, "...")).cast("double")
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1))
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => endswith(trim(l), lit("..."))))
    val alphaWords = size(filter(tokens(text, seg), t => t.rlike("[A-Za-z]")))
    val padded = concat(lit(" "), lower(text), lit(" "))
    val stopHits = gopherStopwords
      .map(sw => when(padded.contains(s" $sw "), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("n_words", tokenCount(text, seg))
      .withColumn("r_word_count",
        col("n_words") >= cfg.minWords && col("n_words") <= cfg.maxWords)
      .withColumn("r_mean_word_len",
        mwl >= cfg.minMeanWordLen && mwl <= cfg.maxMeanWordLen)
      .withColumn("r_symbol_ratio", symbols / nw <= cfg.maxSymbolRatio)
      .withColumn("r_bullet_ratio",
        bulletLines.cast("double") / nLines <= cfg.maxBulletRatio)
      .withColumn("r_ellipsis_ratio",
        ellipsisLines.cast("double") / nLines <= cfg.maxEllipsisLineRatio)
      .withColumn("r_alpha_words",
        alphaWords.cast("double") / nw >= cfg.minAlphaWordRatio)
      .withColumn("r_stopwords", stopHits >= cfg.minStopwordHits)
      .withColumn("quality_pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_ratio") && col("r_ellipsis_ratio") &&
          col("r_alpha_words") && col("r_stopwords"))
  }

  /** Gopher repetition-removal signals (Rae et al. 2021, §A.1.1 — the
    * repetition half of the published rule set, complementing
    * [[gopherRules]]' non-repetition half): per document,
    *
    *  - `dup_line_frac` — fraction of (trimmed, non-blank) lines whose
    *    content occurs more than once in the document;
    *  - `dup_line_char_frac` — fraction of line characters inside those
    *    duplicated lines;
    *  - `top{n}_char_frac` for n in `ns` — characters covered by the
    *    most frequent word n-gram (`count * length(gram)`, gram
    *    lowercase with single inner spaces) over `length(text)`; the
    *    most frequent gram ties deterministically to the
    *    lexicographically smallest.
    *
    * Shape at scale: the line signals are RELATIONAL — explode the
    * trimmed non-blank lines, one map-side-combinable (id, line) count
    * shuffle, one id-keyed collapse (a per-row higher-order occurrence
    * fold would be O(lines²) per document: a pathological million-line
    * doc turns one task into 10^12 comparisons, the skew no partitioner
    * can fix — the relational form is linear and spreads); the n-gram
    * signals explode ONCE over all `ns` tagged with n, one
    * map-side-combinable (id, n, gram) count shuffle, one id-partitioned
    * top-1 window, one conditional-aggregation collapse, one id-keyed
    * join back — corpus-length-bound work per document, no driver state.
    * Every ratio is a single double division of integer counts, so the
    * whole frame replays bit-exactly in SQL (q_repetition_rules).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4), seg: Boolean = false): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram sizes: $ns")
    // ONE guarded spread feeds all three consumers (line explode, length
    // base, tagged n-gram explode) — they read the SAME canonical
    // exchange (ReuseExchange, the lmPerplexity r20 pattern); unspread,
    // the explodes and their partial aggregates serialized behind the
    // 1-row-group scan split (7.1 task-CPU-s over 22 tasks, r21)
    val src = ScaleOps.spreadCpu(df.select(col(idCol), col(textCol)))
    val text = col(textCol)
    val lineRows = src.select(col(idCol).as("id"),
      explode(filter(transform(split(text, "\n"), l => trim(l)),
        l => length(l) > 0)).as("lt"))
    val lineStats = lineRows.groupBy("id", "lt")
      .agg(count(lit(1)).as("__c"))
      .groupBy("id")
      .agg(sum("__c").as("__nl"),
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
          .as("__dupl"),
        coalesce(sum(when(col("__c") > 1,
          col("__c") * length(col("lt")).cast("long"))), lit(0L))
          .as("__dupc"),
        sum(col("__c") * length(col("lt")).cast("long")).as("__totc"))
    val base = src.select(col(idCol).as("id"),
      greatest(length(text).cast("long"), lit(1L)).as("__len"))
      .join(lineStats, Seq("id"), "left")
      .select(col("id"), col("__len"),
        coalesce(col("__nl"), lit(0L)).as("n_lines"),
        (coalesce(col("__dupl"), lit(0L)).cast("double") /
          greatest(coalesce(col("__nl"), lit(0L)), lit(1L)))
          .as("dup_line_frac"),
        (coalesce(col("__dupc"), lit(0L)).cast("double") /
          greatest(coalesce(col("__totc"), lit(0L)), lit(1L)))
          .as("dup_line_char_frac"))
    // one tagged explode over every n: a single count shuffle + top-1
    // window serves all gram sizes
    val tagged = src.select(col(idCol).as("id"),
      explode(flatten(array(ns.map(n =>
        transform(wordNgrams(text, n, seg),
          g => struct(lit(n).as("n"), g.as("g")))): _*))).as("t"))
      .select(col("id"), col("t.n").as("n"), col("t.g").as("g"))
    val counts = tagged.groupBy("id", "n", "g")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("id", "n")
      .orderBy(col("c").desc, col("g").asc)
    val topAggs = ns.map(n =>
      max(when(col("n") === n, col("c") * length(col("g")).cast("long")))
        .as(s"__top${n}_chars"))
    val top = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy("id")
      .agg(topAggs.head, topAggs.tail: _*)
    val joined = base.join(top, Seq("id"), "left")
    val fracCols = ns.map(n =>
      (coalesce(col(s"__top${n}_chars"), lit(0L)).cast("double") /
        col("__len")).as(s"top${n}_char_frac"))
    joined.select(col("id") +: col("n_lines") +: col("dup_line_frac") +:
      col("dup_line_char_frac") +: fracCols: _*)
  }

  /** PII scrub patterns (the Dolma/CCNet-style masking pass): kept to
    * constructs Java regex and RE2 interpret identically (character
    * classes, bounded counts, \b word boundaries, leftmost-first
    * alternation) so the SQL oracle replays the scrub byte-for-byte.
    */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Pattern =
    """\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\b"""
  /** Left edge anchored by a CONSUMED context class (RE2 has no
    * lookbehind, and a bare \b still matches after a '-'): group 1
    * captures start-of-text or a char that is neither a digit nor a
    * '.'/'-' separator, and the replacement restores it. Without this, a
    * phone-shaped SUFFIX inside a longer separated digit run (the
    * '978-316-148-4100' ID shape, or '95551234 5678') was partially
    * masked, leaking the leading digits next to the mask token; now a
    * match can start neither mid-run nor right after a run's separator.
    * Spaces stay valid left context (they are the normal prose
    * delimiter). Known leak DIRECTION of this trade-off: a phone glued
    * directly to a preceding '.' or '-' with no space (sentence period
    * without a space — "call now.555-867-5309") reads as a continued
    * separated digit run and is left UNMASKED (a PII false negative);
    * the alternative (allowing '.'/'-' left context) re-opens the
    * partial-masking leak inside long IDs, which masks the WRONG span —
    * we prefer the rare no-space miss to a wrong-span mask. The
    * replacement token differs per engine ('$1' Java,
    * '\1' RE2) — [[PhoneMaskSpark]] / [[PhoneMaskDuck]]; counts are
    * replacement-free and shared. */
  val PhonePattern =
    """(^|[^0-9.-])((\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4})\b"""
  val PhoneMaskSpark = "$1|||PHONE|||"
  val PhoneMaskDuck = """\1|||PHONE|||"""

  /** Mask emails / IPv4 addresses / phone numbers with fixed tokens and
    * count the replacements — the standard pre-training PII pass. Applied
    * in THAT order, each count taken on the text the pattern actually saw
    * (post prior replacements), so the counts always equal the number of
    * masks inserted. Pure chained `regexp_replace`/`regexp_count` column
    * algebra: codegen'd, zero shuffles, scan-speed at any corpus size.
    * Appends `text_clean`, `n_emails`, `n_ips`, `n_phones`.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "|||EMAIL|||")
    val t2 = regexp_replace(t1, Ipv4Pattern, "|||IP|||")
    val t3 = regexp_replace(t2, PhonePattern, PhoneMaskSpark)
    df.withColumn("n_emails", regexp_count(t0, lit(EmailPattern)))
      .withColumn("n_ips", regexp_count(t1, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(t2, lit(PhonePattern)))
      .withColumn("text_clean", t3)
  }

  /** 64-bit rolling polynomial document fingerprint over tokens:
    * fp = fold(tokens, 0, (acc, t) -> acc * 31 + xxhash64(t)) in Long
    * arithmetic (wrapping). Order-sensitive by design — equal fingerprints
    * mean equal token streams. Pure higher-order-function column algebra.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(31L) + xxhash64(t))

  /** [[fingerprint]] with the per-token hash drawn from the first 8 hex
    * chars of md5 (a 32-bit value) instead of xxhash64 — bit-identical
    * fold, but replayable by any engine with md5 and 128-bit integers
    * (the DuckDB oracle folds in HUGEINT mod 2^64 and converts to signed
    * at the end, matching JVM Long wraparound). The xxhash64 default
    * stays the production path: one native codegen pass, no hex
    * round-trip per token.
    */
  def fingerprintMd5(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(31L) + shiftrightunsigned(
        graft.functions.Md5Hashes.md5Hash64(t), 32))

  /** HTML-to-text extraction — the step BEFORE every other text operator
    * in a web-crawl pipeline (quality rules, dedup, langid all expect
    * plain text). Deterministic regexp/replace column algebra, kept to
    * constructs Java regex and RE2 interpret identically (inline (?is)
    * flags, non-greedy spans, character classes — NO backreferences,
    * which RE2 lacks), so a SQL oracle replays the extraction
    * byte-for-byte:
    *
    *   1. strip `<!-- -->` comments, then `<script>`/`<style>` blocks
    *      WITH their content (code is not prose);
    *   2. block-level tags (`p`/`div`/`br`/`h1..6`/`li`/`tr`/
    *      `ul`/`ol`/`table`/`section`/`article`, open or close) become a
    *      single space (block boundaries must not glue words together);
    *   3. every remaining tag is dropped;
    *   4. the five standard entities + `&nbsp;` decode — `&amp;` LAST,
    *      so `&amp;lt;` yields the literal `&lt;`, not `<` (the classic
    *      double-decode bug);
    *   5. whitespace runs collapse to single spaces, ends trimmed.
    *
    * Also emits the two standard boilerplate-filter signals: `n_links`
    * (anchor-tag count in the RAW html) and `text_ratio`
    * (plain-text length / raw length, floor-rounded to 6 decimals —
    * boilerplate pages are tag-dominated, content pages text-dominated).
    * Appends `text_plain`, `n_links`, `text_ratio`.
    */
  def htmlExtract(df: DataFrame, htmlCol: String): DataFrame = {
    val raw = coalesce(col(htmlCol), lit(""))
    val noComment = regexp_replace(raw, HtmlCommentPattern, "")
    val noScript = regexp_replace(
      regexp_replace(noComment, HtmlScriptPattern, ""),
      HtmlStylePattern, "")
    val blocks = regexp_replace(noScript, HtmlBlockTagPattern, " ")
    val noTags = regexp_replace(blocks, HtmlTagPattern, "")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    val plain = trim(regexp_replace(decoded, HtmlWhitespacePattern, " "))
    df.withColumn("text_plain", plain)
      .withColumn("n_links",
        regexp_count(raw, lit(HtmlAnchorPattern)).cast("long"))
      .withColumn("text_ratio",
        when(length(raw) === 0, lit(0.0d))
          .otherwise(floor(length(plain).cast("double") /
            length(raw).cast("double") * 1e6d + 0.5d) / 1e6d))
  }

  /** [[htmlExtract]]'s patterns/tables, shared verbatim with the SQL
    * oracle (q_html_extract) so the two engines can never drift. RE2 has
    * no backreferences, so script/style close on explicit literals. */
  val HtmlCommentPattern = """(?s)<!--.*?-->"""
  val HtmlScriptPattern = """(?is)<script\b[^>]*>.*?</script\s*>"""
  val HtmlStylePattern = """(?is)<style\b[^>]*>.*?</style\s*>"""
  val HtmlBlockTagPattern =
    """(?i)</?(p|div|br|h[1-6]|li|tr|ul|ol|table|section|article)\b[^>]*/?>"""
  val HtmlTagPattern = """(?s)<[^>]*>"""
  val HtmlAnchorPattern = """(?i)<a\b"""
  /** explicit class, NOT `\s`: Java's `\s` includes vertical tab \x0B,
    * RE2's does not — a document containing one would silently diverge
    * between the engines (and flip the oracle). `\x0B` is a hex escape
    * both interpret identically. */
  val HtmlWhitespacePattern = """[ \t\n\x0B\f\r]+"""
  /** decode order matters: `&amp;` strictly last (see scaladoc) */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
}
