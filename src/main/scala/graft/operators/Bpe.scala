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
    val words: Array[(Array[String], Long)] = docs
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
  def encodeWord(word: String, model: Model): Seq[String] = {
    var syms = word.map(_.toString).toArray :+ EndOfWord
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
    syms.toIndexedSeq
  }

  /** Tokenize the corpus with a trained model: merge ranks broadcast as a
    * task literal, one narrow pass, `(id, subwords array<string>)` out.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"),
        Corpus.spanTokens(col(textCol)).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, ws) => (id, ws.flatMap(w => encodeWord(w, m))) }
      }
      .toDF("id", "subwords")
  }
}
