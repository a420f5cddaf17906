package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the DCLM/fastText-style curation
  * step: bootstrap labels from a cheap heuristic (the Gopher rules), train
  * a linear classifier over fixed-width hashed text features, score the
  * whole corpus with the trained weights. At 100 TB the heuristic runs
  * once over a bounded sample, training is driver-side arithmetic on a
  * model-sized array, and scoring is ONE narrow codegen'd map (embedding
  * kernel + dot against broadcast-literal weights) — zero shuffles, no
  * vocabulary state, no UDF.
  *
  * Determinism / oracle posture (the trained-model-replay technique,
  * SURVEY §5.3): training is fixed-round FULL-BATCH gradient descent over
  * an explicitly-ordered sample, with every accumulation an
  * ascending-index serial double fold — so the model, and therefore every
  * score, is a pure function of the data replayable in unrolled SQL.
  * The squashing link is the RATIONAL sigmoid (softsign)
  * `p = 0.5 + (0.5*m) / (1 + |m|)` rather than the logistic `1/(1+e^-m)`:
  * every operation in the whole pipeline is then a SINGLE-ROUNDED IEEE
  * double op (+, -, *, /, abs) which any engine computes bit-identically,
  * whereas `exp()` is correctly-rounded nowhere and differs across libm
  * implementations — the same reason the k-means replay (kmeansCtes) uses
  * only dot/sqrt. The gradient is the standard logistic-loss form
  * `(p - y) * x` with p from the rational link.
  *
  * Update rule, exact op order (the SQL replay mirrors each
  * parenthesization):
  * {{{
  *   m_i = fold_j(w_j * x_ij) + b          // ascending-j serial fold
  *   p_i = 0.5 + (0.5 * m_i) / (1 + |m_i|)
  *   e_i = p_i - y_i
  *   g_j = fold_i(e_i * x_ij)              // ascending-sample-id fold
  *   gb  = fold_i(e_i)
  *   w_j := w_j - (lr * g_j) / n
  *   b   := b   - (lr * gb)  / n
  * }}}
  */
object QualityClassifier {

  /** A trained linear model: `weights.length` fixes the feature width. */
  final case class LrModel(weights: Seq[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** Append the hybrid fastText-style feature vector (`array<double>`,
    * width `hashDim + 5`): `hashDim` md5-mode unit-norm hash-embedding
    * slots over unigram tokens (the content part — float round-trip, so
    * stored-vector parity holds), concatenated with 5 dense quality
    * signals. The dense block carries the document-length information
    * the unit-norm bag erases, CENTERED so GD converges in tens of
    * rounds, with SQUARED copies of the two banded signals — a linear
    * boundary over (x, x²) expresses "x in [lo, hi]", which a linear
    * boundary over x alone cannot (the Gopher word-count and
    * mean-word-length rules are bands):
    *  - d1 = (n_words - 52.5) / 27.5        (the [25,80] band -> ~[-1,1])
    *  - d2 = d1 * d1
    *  - d3 = mean_word_len - 4.0            (the [3,5] band -> ~[-1,1])
    *  - d4 = d3 * d3
    *  - d5 = stopword_hits / 4.0 - 1.0
    * Every op is a single-rounded IEEE double op on values both engines
    * compute bit-identically (counts, one division), and the centering
    * constants are binary-exact decimals (x.0 / x.5 — never a 0.4-style
    * literal whose decimal promotion could diverge, see q_lm_perplexity).
    */
  def withFeatures(df: DataFrame, textCol: String, hashDim: Int = 64,
      outCol: String = "feats"): DataFrame = {
    val text = col(textCol)
    val nw = TextAnalysis.tokenCount(text)
    val d1 = (nw.cast("double") - lit(52.5)) / lit(27.5)
    val mwl = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nw, lit(1L))
    val d3 = mwl - lit(4.0)
    val padded = concat(lit(" "), lower(text), lit(" "))
    val stopn = TextAnalysis.gopherStopwords
      .map(sw => when(padded.contains(s" $sw "), 1).otherwise(0))
      .reduce(_ + _)
    val d5 = stopn.cast("double") / lit(4.0) - lit(1.0)
    val hashed = graft.functions.HashEmbedVector.hashEmbedMd5(
      TextAnalysis.tokens(lower(text)), hashDim).cast("array<double>")
    df.withColumn(outCol,
      concat(hashed, array(d1, d1 * d1, d3, d3 * d3, d5)))
  }

  /** Train by deterministic full-batch GD on a bounded sample.
    *
    * `df` must carry `idCol`, `vecCol` (`array<float>`, fixed width —
    * e.g. [[TextAnalysis.hashEmbedMd5]] output) and `labelCol` (double
    * 0/1). The sample is the `maxSample` rows smallest by
    * `sampleOrderCol` (default: the id column — the oracle-replayable
    * order; pass a content-hash column for re-ingestion stability), via
    * distributed TakeOrdered — per-partition heaps, never a
    * single-partition funnel. Driver transfer is bounded by `maxSample`
    * rows of one vector column; GD is driver arithmetic on
    * `rounds * n * dim` doubles (model-sized, never data-sized).
    */
  def train(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      rounds: Int = 20, lr: Double = 0.5, maxSample: Int = 2000,
      sampleOrderCol: Option[String] = None): LrModel = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(maxSample >= 1, s"maxSample must be >= 1, got $maxSample")
    val orderCol = sampleOrderCol.getOrElse(idCol)
    val rows = df
      .select(col(idCol), col(vecCol), col(labelCol).cast("double"),
        col(orderCol).as("__ord"))
      .orderBy(col("__ord"))
      .limit(maxSample)
      .collect()
    require(rows.nonEmpty, "empty training sample")
    // re-sort driver-side so the fold order is the sample order by
    // construction, not by trust in the collect's ordering. Comparable
    // covers every sane order-column type (numerics, strings, dates);
    // note Java String order is UTF-16 code-unit order, which matches
    // Spark's binary UTF-8 order for ASCII keys (the oracle mode uses
    // numeric ids, where the two agree unconditionally).
    val sorted = rows.sortWith { (a, b) =>
      a.get(3).asInstanceOf[Comparable[Any]].compareTo(b.get(3)) < 0
    }
    val xs: Array[Array[Double]] = sorted.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case x => x.toString.toDouble
    }.toArray)
    val ys: Array[Double] = sorted.map(_.getDouble(2))
    val dim = xs(0).length
    require(xs.forall(_.length == dim),
      s"inconsistent feature width in training sample (expected $dim)")
    val n = xs.length.toDouble
    val w = new Array[Double](dim)
    var b = 0.0
    var t = 0
    while (t < rounds) {
      val e = new Array[Double](xs.length)
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        var s = 0.0
        var j = 0
        while (j < dim) { s += w(j) * x(j); j += 1 }
        val m = s + b
        val p = 0.5 + (0.5 * m) / (1.0 + math.abs(m))
        e(i) = p - ys(i)
        i += 1
      }
      val g = new Array[Double](dim)
      i = 0
      while (i < xs.length) {
        val x = xs(i)
        var j = 0
        while (j < dim) { g(j) += e(i) * x(j); j += 1 }
        i += 1
      }
      var gb = 0.0
      i = 0
      while (i < xs.length) { gb += e(i); i += 1 }
      var j = 0
      while (j < dim) { w(j) = w(j) - (lr * g(j)) / n; j += 1 }
      b = b - (lr * gb) / n
      t += 1
    }
    LrModel(w.toSeq, b)
  }

  /** Raw decision margin `w . vec + b` for an `array<float>` vector
    * column against broadcast-literal trained weights — a codegen'd
    * scalar that fuses into the scan stage (no join, no shuffle, no
    * driver round-trip at scoring time). `margin >= 0` is exactly
    * `prob >= 0.5` under the rational link.
    */
  def margin(vec: Column, model: LrModel): Column =
    Similarity.dot(vec, typedLit(model.weights)) + lit(model.bias)

  /** Rational-sigmoid probability of `margin` (see object scaladoc). */
  def probability(m: Column): Column =
    lit(0.5) + (lit(0.5) * m) / (lit(1.0) + abs(m))

  /** Score a frame: appends `margin`, `prob`, `pred` columns. */
  def score(df: DataFrame, vecCol: String, model: LrModel): DataFrame = {
    val m = margin(col(vecCol), model)
    df.withColumn("margin", m)
      .withColumn("prob", probability(col("margin")))
      .withColumn("pred", col("margin") >= lit(0.0))
  }
}
