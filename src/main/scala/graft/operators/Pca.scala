package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / whitening step in front of ANN retrieval
  * and SemDeDup-style semantic dedup (whitened embeddings equalize the
  * per-direction variance a raw cosine conflates; projecting to the top
  * components is the classic IVF/PQ preprocessing). Reference scope: the
  * reference library is metadata-only (no numeric kernels; see
  * /root/reference/src/cyclebane/graph.py) — this operator is part of
  * the [ext] pipeline surface.
  *
  * Training is fixed-round POWER ITERATION with deflation over a
  * bounded, deterministically-chosen sample (the
  * [[Similarity.trainCentroids]] posture): the sample is the
  * `maxSample` vectors with the smallest `xxhash64(vector)` values —
  * content-keyed, independent of partitioning and row order — or an
  * explicit `sampleOrderCol` (the oracle-replayable mode: an id-ordered
  * sample is plain ORDER BY/LIMIT SQL). Driver transfer is bounded by
  * `maxSample` rows of one array column; the iterations are driver-side
  * arithmetic on `nComp * dim` doubles (model-sized, never data-sized).
  *
  * Exact-op contract (the trained-model-replay rules — every op is a
  * single-rounded IEEE double op, no libm transcendental except the
  * correctly-rounded `sqrt`, so the model and every downstream
  * projection is bit-reproducible and the DuckDB oracle hash-matches
  * without tolerance):
  *  - mean_j   = fold_i(x_ij) / n            // ascending-sample-id fold
  *  - c_ij     = x_ij - mean_j
  *  - v(0)_j   = 1 / sqrt(dim)               // fixed deterministic start
  *  - per iteration: p_i = fold_j(c_ij * v_j)        // ascending-j dot
  *                   u_j = fold_i(p_i * c_ij)        // ascending-id fold
  *                   v_j = u_j / sqrt(fold_j(u_j^2)) // zero-norm: v := u
  *  - eigenvalue lambda = fold_i(p_i^2) / n  // p with the FINAL v
  *  - deflation c_ij := c_ij - p_i * v_j     // exact per-element ops
  * Scoring composes `zip_with(x, mean, -)` with the codegen'd
  * [[graft.functions.DotProduct]] kernel (ascending-index fold ==
  * DuckDB's `list_inner_product`) — per-row O(nComp * dim), no join, no
  * shuffle, no driver round-trip: the projection fuses into the scan
  * stage, which is what survives a 100x scale-up.
  *
  * Power iteration converges to the DOMINANT component at rate
  * (lambda2/lambda1)^iters; the certified model is "exactly `iters`
  * rounds from the fixed start", not "the converged eigenvector" — the
  * oracle replays the same rounds, so correctness never depends on
  * convergence. On a near-isotropic spectrum (the synthetic corpus
  * measures a ~2% top-two gap) the dominance ORDERING is therefore
  * only approximate at a fixed iteration count; the properties that
  * hold regardless — unit norm, near-orthogonality, variance-along-
  * component == eigenvalue, whitened unit variance, exact ordering
  * under a real gap — are the PcaSpec contract.
  */
object Pca {

  /** Trained model: `mean` and `components` are `dim`-length;
    * `eigenvalues(k)` is the sample variance along `components(k)`
    * (biased, /n — matching the fold contract above). */
  case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      eigenvalues: Seq[Double], nSample: Long)

  def train(df: DataFrame, vecCol: String, nComp: Int, iters: Int = 12,
      maxSample: Int = 1000,
      sampleOrderCol: Option[String] = None): PcaModel = {
    require(nComp >= 1, s"nComp must be >= 1, got $nComp")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the shared bounded-sample collection (content-hash order by
    // default, explicit column in the oracle mode; driver re-sorted so
    // the fold order is the sample order by construction)
    val sample: Array[Array[Double]] =
      Similarity.boundedSample(df, vecCol, maxSample, sampleOrderCol)
    require(sample.nonEmpty, "PCA sample is empty")
    val dim = sample(0).length
    require(sample.forall(_.length == dim),
      s"inconsistent vector width in PCA sample (expected $dim)")
    val n = sample.length.toDouble

    // mean_j: ascending-id serial fold, one division
    val mean = new Array[Double](dim)
    var i = 0
    while (i < sample.length) {
      val x = sample(i)
      var j = 0
      while (j < dim) { mean(j) += x(j); j += 1 }
      i += 1
    }
    var j = 0
    while (j < dim) { mean(j) = mean(j) / n; j += 1 }

    // centered working copy (deflated in place between components)
    val c = sample.map { x =>
      val r = new Array[Double](dim)
      var k = 0
      while (k < dim) { r(k) = x(k) - mean(k); k += 1 }
      r
    }

    val comps = new Array[Array[Double]](nComp)
    val eigs = new Array[Double](nComp)
    val v0 = 1.0 / math.sqrt(dim.toDouble)
    var kc = 0
    while (kc < nComp) {
      var v = Array.fill(dim)(v0)
      var t = 0
      while (t < iters) {
        // p_i = c_i . v (ascending-j), u_j = fold_i(p_i * c_ij)
        val u = new Array[Double](dim)
        i = 0
        while (i < c.length) {
          val ci = c(i)
          var s = 0.0
          j = 0
          while (j < dim) { s += ci(j) * v(j); j += 1 }
          j = 0
          while (j < dim) { u(j) += s * ci(j); j += 1 }
          i += 1
        }
        var n2 = 0.0
        j = 0
        while (j < dim) { n2 += u(j) * u(j); j += 1 }
        // zero-norm (sample lies entirely in the deflated subspace):
        // keep the zero u as v — projections and eigenvalue become 0,
        // mirrored by the oracle's CASE
        v = if (n2 == 0.0) u else {
          val nrm = math.sqrt(n2)
          u.map(_ / nrm)
        }
        t += 1
      }
      // final projections: eigenvalue + deflation share the same p_i
      var ss = 0.0
      i = 0
      while (i < c.length) {
        val ci = c(i)
        var p = 0.0
        j = 0
        while (j < dim) { p += ci(j) * v(j); j += 1 }
        ss += p * p
        j = 0
        while (j < dim) { ci(j) = ci(j) - p * v(j); j += 1 }
        i += 1
      }
      comps(kc) = v
      eigs(kc) = ss / n
      kc += 1
    }
    PcaModel(mean.toSeq, comps.map(_.toSeq).toSeq, eigs.toSeq,
      sample.length.toLong)
  }

  /** Element-wise centering against the broadcast-literal mean —
    * `zip_with` keeps the exact `x_j - mean_j` per-element op the
    * driver (and the oracle's `list(xj - m ORDER BY i)`) computes. A
    * wrong-width vector yields NULL (not a null-padded zip that the
    * downstream dot would score as if the missing dims equalled the
    * mean) — preserving [[graft.functions.DotProduct]]'s "a wrong-width
    * vector must never produce a plausible score" contract. */
  private def centered(vec: Column, model: PcaModel): Column = {
    val cast = vec.cast("array<double>")
    when(size(cast) === lit(model.mean.length),
      zip_with(cast, typedLit(model.mean), (x, m) => x - m))
  }

  /** Projection onto component `k` (0-based): the codegen'd
    * ascending-index dot over the centered vector. */
  def projection(vec: Column, model: PcaModel, k: Int): Column =
    Similarity.dot(centered(vec, model), typedLit(model.components(k)))

  /** Whitening of an already-computed projection column:
    * `pc_k / sqrt(lambda_k)` (0 when the component carries no
    * variance — a degenerate direction must not produce +/-Infinity
    * scores). `sqrt` is computed driver-side on the model eigenvalue;
    * correctly-rounded, so the oracle's `sqrt(ev)` is the same double.
    * Taking the projection AS A COLUMN lets callers reuse one centered
    * dot for both outputs instead of evaluating the O(dim) kernel
    * twice per component per row. */
  def whitenedFromProjection(pc: Column, model: PcaModel,
      k: Int): Column = {
    val ev = model.eigenvalues(k)
    if (ev == 0.0) lit(0.0) else pc / lit(math.sqrt(ev))
  }

  /** Whitened projection from the raw vector (recomputes the
    * projection; prefer [[whitenedFromProjection]] when the `pc`
    * column is already in the frame). */
  def whitened(vec: Column, model: PcaModel, k: Int): Column =
    whitenedFromProjection(projection(vec, model, k), model, k)

  /** Score a frame: appends `pc<i>` / `white<i>` columns (1-based names)
    * for the model's components — one scan, per-row O(nComp * dim),
    * fused into the read stage; each `white<i>` derives from its
    * already-computed `pc<i>` column (one centered dot per component). */
  def transform(df: DataFrame, vecCol: String, model: PcaModel): DataFrame =
    model.components.indices.foldLeft(df) { (d, k) =>
      d.withColumn(s"pc${k + 1}", projection(col(vecCol), model, k))
        .withColumn(s"white${k + 1}",
          whitenedFromProjection(col(s"pc${k + 1}"), model, k))
    }
}
