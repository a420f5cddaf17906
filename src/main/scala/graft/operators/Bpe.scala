package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the tokenizer
  * step of a training-data pipeline, shaped the way production BPE
  * training actually scales:
  *
  *  1. the DATA-SCALE pass is one distributed word-frequency aggregation
  *     (shuffle keyed on the word);
  *  2. the merge-learning loop runs DRIVER-side over the bounded
  *     word-frequency table (vocab-sized — a model artifact, not data;
  *     this is how standard tokenizer trainers work: merges are learned
  *     from word counts, never by re-scanning the corpus per merge);
  *  3. application broadcasts the learned merge ranks and encodes in a
  *     narrow `mapPartitions` (per-row sequential merging is inherently
  *     imperative — the documented last-resort case for partition-level
  *     logic).
  *
  * Word tokenization shares [[Corpus.spanTokens]] (lowercase, whitespace
  * split); each word is segmented as its characters plus a `</w>`
  * end-of-word marker, the classic BPE setup.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Learned merge rules in application order. */
  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Train `numMerges` BPE merges from the corpus word frequencies.
    * Deterministic: the vocab is the `maxVocab` most frequent words
    * (count desc, word asc), and each round merges the most frequent
    * pair with a lexicographic tie-break.
    *
    * The merge loop is INCREMENTAL: pair counts and a pair→words inverted
    * index are maintained across rounds, so each merge touches only the
    * words that actually contain the merged pair (decrement that word's
    * old adjacent pairs, re-segment, increment the new ones). A full
    * per-round recount over the vocab — O(numMerges · vocab · wordLen) —
    * is driver-prohibitive at production vocab sizes (32k merges); this
    * is O(totalSymbols + numMerges · (distinctPairs + affectedWork)),
    * the same bookkeeping standard tokenizer trainers use.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, maxVocab: Int = 50000): Model = {
    require(numMerges > 0 && maxVocab > 0, "numMerges and maxVocab must be positive")
    val words: Array[(Array[String], Long)] = ScaleOps
      .spreadCpu(docs.select(col(textCol)))
      .select(explode(Corpus.spanTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray :+ EndOfWord,
        r.getLong(1)))
    Model(learnMerges(words, numMerges))
  }

  /** Deterministic total order on (pair, count): highest count first,
    * then lexicographically smallest pair — identical to the recount
    * formulation's `maxBy (c, a, b)` with reversed string orderings.
    */
  private val bestPairOrdering: Ordering[((String, String), Long)] =
    Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
      Ordering.String.reverse).on { case ((a, b), c) => (c, a, b) }

  /** Incremental merge learning over a driver-resident word-frequency
    * table (vocab-sized — a model artifact, not data).
    */
  private[graft] def learnMerges(words: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] =
    learnMergesStats(words, numMerges)._1

  /** As `learnMerges`, also returning the total touched-word count
    * (sum of |affected| across rounds). The incremental loop's whole
    * claim is touched ≪ rounds × vocab — the count lets a spec pin that
    * property deterministically instead of asserting on wall time.
    */
  private[graft] def learnMergesStats(words: Array[(Array[String], Long)],
      numMerges: Int): (Seq[(String, String)], Long) = {
    import scala.collection.mutable
    val vocab: Array[(Array[String], Long)] = words.clone()
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(i: Int): Unit = {
      val (syms, c) = vocab(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    def removeWord(i: Int): Unit = {
      val (syms, c) = vocab(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val n = pairCounts(p) - c
        if (n == 0L) { pairCounts.remove(p); pairWords.remove(p) }
        else {
          pairCounts.update(p, n)
          // the same pair may recur later in this word; dropping index
          // membership once is fine — membership is re-added by addWord
          pairWords.get(p).foreach(_ -= i)
        }
        j += 1
      }
    }
    vocab.indices.foreach(addWord)
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var touched = 0L
    while (round < numMerges && pairCounts.nonEmpty) {
      val best = pairCounts.iterator.max(bestPairOrdering)._1
      merges += best
      // only words containing `best` change; snapshot the index entry
      // before mutating (removeWord/addWord edit the sets in place)
      val affected = pairWords.get(best).map(_.toArray).getOrElse(Array.empty)
      touched += affected.length
      affected.foreach { i =>
        removeWord(i)
        vocab(i) = (mergePair(vocab(i)._1, best), vocab(i)._2)
        addWord(i)
      }
      round += 1
    }
    (merges.toSeq, touched)
  }

  /** Reference recount formulation (full pair recount per round) — kept
    * verbatim for the spec that pins incremental == recount; O(rounds ·
    * vocab · wordLen), test-only.
    */
  private[operators] def learnMergesRecount(words: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        val best = pairCounts.toSeq.max(bestPairOrdering)._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** One left-to-right pass replacing every occurrence of `pair` — the
    * same rule at training and encoding time, so encoding a trained word
    * reproduces its training segmentation exactly (spec-pinned).
    */
  private[operators] def mergePair(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word: apply learned merges in rank order (lowest-rank
    * present pair first — the standard BPE application rule, equivalent
    * to replaying training's merge sequence on this word).
    */
  def encodeWord(word: String, model: Model): Seq[String] =
    greedyMerge(word.map(_.toString).toArray :+ EndOfWord, model)
      .toIndexedSeq

  /** the shared rank-greedy loop of [[encodeWord]] / [[encodeBytes]] */
  private def greedyMerge(init: Array[String],
      model: Model): Array[String] = {
    var syms = init
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = model.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergePair(syms, bestPair)
    }
    syms
  }

  // ------------------------------------------------------------------
  // BYTE-LEVEL BPE — the production tokenizer shape: a regex
  // pre-tokenizer cuts the text into pre-tokens (spaces attach to the
  // FOLLOWING token, the GPT-2 convention, so " the" and "the" are
  // distinct vocabulary entries and detokenization is pure
  // concatenation), each pre-token becomes its UTF-8 byte sequence, and
  // merges are learned/applied over bytes. No out-of-vocabulary symbol
  // can exist (every byte is in the base alphabet) and no end-of-word
  // marker is needed (token boundaries come from the pre-tokenizer).
  // ------------------------------------------------------------------

  /** The regex pre-tokenizer, shared verbatim with the q_bpe_bytes
    * oracle: ` ?letters | ?digits | ?other-run | whitespace-run`, kept to
    * constructs Java regex and RE2 read identically (`\p{L}`/`\p{N}`
    * are Unicode categories in both; NO lookahead — GPT-2's trailing-
    * space special case `\s+(?!\S)` is dropped because RE2 has no
    * lookahead, costing only a cosmetic difference on runs of trailing
    * whitespace; and NO `\s`, whose classes DIVERGE — Java includes
    * U+000B vertical tab, RE2 does not — so the whitespace class is
    * spelled out explicitly, putting U+000B in the other-run branch in
    * BOTH engines). The four branches cover every character class, so
    * the matches TILE the text: concatenating all pre-tokens reproduces
    * the input byte-for-byte (BpeBytesSpec pins this on the CJK corpus,
    * vertical tab included), which is what makes byte-level
    * detokenization a pure concat. */
  val BytePretokenPattern: String =
    """ ?\p{L}+| ?\p{N}+| ?[^\t\n\f\r \p{L}\p{N}]+|[\t\n\f\r ]+"""

  /** the pre-token array of a text column (one codegen'd
    * regexp_extract_all, no shuffle) */
  def pretokenize(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(text, lit(BytePretokenPattern), lit(0))

  /** A pre-token's UTF-8 bytes as FIXED-WIDTH lowercase-hex symbols
    * ("c3", "a4", ...). Fixed width makes merged symbols self-
    * delimiting: any symbol string decomposes uniquely into bytes, so
    * distinct byte sequences can never collide into one symbol (decimal
    * byte strings would: (195,164) and (19,51,64) both concatenate to
    * "195164"). */
  private[operators] def hexSymbols(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x")

  /** a symbol string (any concatenation of byte symbols) back to text —
    * only meaningful over a COMPLETE pre-token's subword sequence:
    * individual subwords may split a multi-byte UTF-8 character */
  private[graft] def decodeHex(syms: Seq[String]): String = {
    val hexStr = syms.mkString
    val bytes = new Array[Byte](hexStr.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(hexStr.substring(2 * i, 2 * i + 2), 16)
        .toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Train byte-level merges from the corpus pre-token frequencies: one
    * distributed pre-token frequency aggregation, then the SAME
    * incremental driver loop as [[train]] over hex byte symbols. The
    * learned `Model` is rank-compatible with [[encodeBytes]] /
    * [[tokenizeBytes]]. */
  def trainBytes(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, maxVocab: Int = 50000): Model = {
    require(numMerges > 0 && maxVocab > 0,
      "numMerges and maxVocab must be positive")
    val words: Array[(Array[String], Long)] = docs
      .select(explode(pretokenize(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (hexSymbols(r.getString(0)), r.getLong(1)))
    Model(learnMerges(words, numMerges))
  }

  /** Encode one pre-token over bytes: rank-greedy merging, no
    * end-of-word marker. */
  def encodeBytes(word: String, model: Model): Seq[String] =
    greedyMerge(hexSymbols(word), model).toIndexedSeq

  /** Byte-level corpus tokenization: pre-tokenize, encode each pre-token
    * with broadcast ranks, one narrow pass —
    * `(id, subwords array<string>)` of hex byte-symbol strings whose
    * per-pre-token concatenation round-trips to the input text
    * (BpeBytesSpec). */
  def tokenizeBytes(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // spread (guarded) BEFORE pretokenization: the per-word encode loop
    // is CPU-dense and a pure per-row map — serialized behind a 1-split
    // scan otherwise; spreading the raw text keeps the exchange narrow
    ScaleOps.spreadCpu(docs.select(col(idCol).cast("long").as("__id"),
        col(textCol).as("__txt")))
      .select(col("__id"), pretokenize(col("__txt")).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, ws) =>
          (id, ws.flatMap(w => encodeBytes(w, m)))
        }
      }
      .toDF("id", "subwords")
  }

  /** Tokenize the corpus with a trained model: merge ranks broadcast as a
    * task literal, one narrow pass, `(id, subwords array<string>)` out.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // same guarded raw-text spread as [[tokenizeBytes]]
    ScaleOps.spreadCpu(docs.select(col(idCol).cast("long").as("__id"),
        col(textCol).as("__txt")))
      .select(col("__id"), Corpus.spanTokens(col("__txt")).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, ws) => (id, ws.flatMap(w => encodeWord(w, m))) }
      }
      .toDF("id", "subwords")
  }
}
