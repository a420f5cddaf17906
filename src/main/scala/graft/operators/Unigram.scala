package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — the OTHER
  * production tokenizer family next to BPE (Kudo 2018: pieces carry
  * probabilities and a word's segmentation is the Viterbi-best product
  * of piece probabilities, rather than a greedy merge order). Shaped
  * exactly like [[Bpe]] for 100 TB:
  *
  *  1. the DATA-SCALE pass is one distributed word-frequency
  *     aggregation (shuffle keyed on the word);
  *  2. seed-vocabulary extraction and hard-EM refinement run
  *     DRIVER-side over the bounded word-frequency table (vocab-sized —
  *     a model artifact, not data);
  *  3. application broadcasts the piece table and Viterbi-segments in a
  *     narrow `mapPartitions` pass (per-word DP is inherently
  *     imperative — the documented last-resort case).
  *
  * EVERY arithmetic step is oracle-replayable by construction (the
  * q_quality_classifier discipline): probabilities are single divisions
  * of integer counts (`cnt / total` — one correctly-rounded IEEE op),
  * the DP accumulates via one multiplication per candidate in a FIXED
  * order, and the argmax tie-break is `(−prob, pieceLen)` lexicographic
  * with PRIMITIVE double comparison (no total ordering — `-0.0 == 0.0`
  * here exactly as in SQL, where DuckDB's struct list_sort provides the
  * identical order). No logarithms anywhere: products of ≤ dozens of
  * dyadic-friendly probabilities stay far from underflow, and log/exp
  * have no cross-engine bit parity.
  */
object Unigram {

  /** piece probabilities + the DP contract knobs. `pUnk` (an exact
    * power of two) prices a single character absent from the table —
    * the inference-time OOV path; every in-vocab probability is
    * `count / total`. */
  final case class Model(pieces: Map[String, Double], maxPieceLen: Int,
      pUnk: Double = DefaultPUnk) {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  }

  /** 2^-10 — exactly representable, so both engines see the same bits */
  val DefaultPUnk: Double = 0.0009765625

  /** Viterbi-best segmentation of one word under `m` — the SHARED DP
    * contract (mirrored verbatim by the SQL oracle):
    *
    *  - `best(0) = 1.0`; for p = 1..L:
    *    `best(p) = max over k = 1..min(maxPieceLen, p) of
    *       best(p−k) * prob(w[p−k..p])`
    *    where prob = table lookup, else `pUnk` when k = 1, else 0;
    *  - argmax tie-break: smallest k wins (candidates compared as
    *    `(−prob, k)` with primitive `<`, k ascending);
    *  - backtrace from L yields the piece list; concatenation always
    *    reproduces the word (single chars are always candidates).
    *
    * Returns (pieces, best(L)). */
  def segment(w: String, m: Model): (Seq[String], Double) = {
    val L = w.length
    if (L == 0) return (Seq.empty, 1.0)
    val best = new Array[Double](L + 1)
    val back = new Array[Int](L + 1)
    best(0) = 1.0
    var p = 1
    while (p <= L) {
      var bestNb = Double.PositiveInfinity
      var bestK = 0
      val kMax = math.min(m.maxPieceLen, p)
      var k = 1
      while (k <= kMax) {
        val piece = w.substring(p - k, p)
        val prob = m.pieces.getOrElse(piece,
          if (k == 1) m.pUnk else 0.0)
        val nb = -(best(p - k) * prob)
        // primitive comparison — NOT a total ordering: -0.0 == 0.0,
        // exactly the SQL struct-sort semantics
        if (nb < bestNb || (nb == bestNb && k < bestK)) {
          bestNb = nb; bestK = k
        }
        k += 1
      }
      best(p) = -bestNb
      back(p) = bestK
      p += 1
    }
    val ps = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = L
    while (pos > 0) {
      val k = back(pos)
      rev += w.substring(pos - k, pos)
      pos -= k
    }
    ps ++= rev.reverseIterator
    (ps.result(), best(L))
  }

  /** Train a unigram model by seed-substring extraction + `emRounds` of
    * hard EM (Viterbi counts) over the corpus word-frequency table.
    * Deterministic end to end:
    *
    *  - training words: lowercase whitespace tokens matching `^[a-z]+$`
    *    (chars == bytes == codepoints, so the SQL replay's codepoint
    *    `substring` agrees with the JVM's UTF-16 one) and of length
    *    <= 32 (the replay's seed-substring explosion uses a constant
    *    position range), count >= `minCount`, top `maxVocabWords` by
    *    (count desc, word asc);
    *  - seed: every substring of length 1..maxPieceLen of every word,
    *    seed count = Σ wordFreq × occurrences; ALL single chars kept,
    *    multi-char pieces capped at `seedCap` by (count desc, piece asc);
    *  - each EM round: probs = count / total (one IEEE division each),
    *    Viterbi-segment every word, usage(x) = Σ wordFreq per use;
    *    new single-char count = usage + 1 (Laplace — every seen char
    *    stays alive, so coverage never breaks), new multi-char vocab =
    *    the top `vocabSize` used pieces by (usage desc, piece asc);
    *  - final probs from the last round's counts.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 64,
      maxPieceLen: Int = 4, maxVocabWords: Int = 256, minCount: Long = 2L,
      emRounds: Int = 2, seedCap: Int = 512): Model = {
    require(vocabSize > 0 && seedCap >= vocabSize && emRounds >= 1,
      "need vocabSize > 0, seedCap >= vocabSize, emRounds >= 1")
    val words: Array[(String, Long)] = docs
      .select(explode(Corpus.spanTokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 32)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    Model(learn(words, vocabSize, maxPieceLen, emRounds, seedCap),
      maxPieceLen)
  }

  /** the driver-side learning loop over a bounded word table (exposed
    * for the spec's hand-checked examples) */
  private[graft] def learn(words: Array[(String, Long)], vocabSize: Int,
      maxPieceLen: Int, emRounds: Int, seedCap: Int): Map[String, Double] = {
    // ---- seed counts
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seed.update(p, seed.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val singles = seed.keysIterator.filter(_.length == 1).toVector.sorted
    var multiCounts: Vector[(String, Long)] = seed.iterator
      .filter(_._1.length > 1).toVector
      .sortBy { case (p, c) => (-c, p) }
      .take(seedCap)
    var singleCounts: Map[String, Long] =
      singles.map(ch => ch -> seed(ch)).toMap
    // ---- hard-EM rounds
    var round = 0
    var probs: Map[String, Double] = Map.empty
    while (round < emRounds) {
      val total = singleCounts.valuesIterator.sum +
        multiCounts.iterator.map(_._2).sum
      val totalD = total.toDouble
      probs = (singleCounts.iterator ++ multiCounts.iterator)
        .map { case (p, c) => p -> c.toDouble / totalD }.toMap
      val model = Model(probs, maxPieceLen)
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        segment(w, model)._1.foreach(p =>
          used.update(p, used.getOrElse(p, 0L) + c))
      }
      singleCounts = singles.map(ch => ch -> (used.getOrElse(ch, 0L) + 1L))
        .toMap
      multiCounts = used.iterator.filter(_._1.length > 1).toVector
        .sortBy { case (p, c) => (-c, p) }
        .take(vocabSize)
      round += 1
    }
    // ---- final probs from the last round's counts
    val total = singleCounts.valuesIterator.sum +
      multiCounts.iterator.map(_._2).sum
    val totalD = total.toDouble
    (singleCounts.iterator ++ multiCounts.iterator)
      .map { case (p, c) => p -> c.toDouble / totalD }.toMap
  }

  /** Tokenize the corpus with a trained model: piece table broadcast,
    * one narrow pass, `(id, pieces array<string>)` out — pieces
    * concatenate back to each word (lossless per word, spec-pinned). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"),
        Corpus.spanTokens(col(textCol)).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, ws) =>
          (id, ws.flatMap(w => segment(w, m)._1))
        }
      }
      .toDF("id", "pieces")
  }
}
