package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** PCA power-iteration training + projection/whitening scoring: the
  * numerical contracts the bit-exact oracle replay cannot see (it
  * proves determinism, not that the model is a PCA), plus the layout
  * and sampling-mode invariances the production path relies on.
  */
class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def emb = spark.read.parquet(
    "/root/testdata/sf0.001/embeddings.parquet")

  private def model = Pca.train(emb, "embedding", nComp = 2, iters = 12,
    maxSample = 400, sampleOrderCol = Some("vec_id"))

  test("components are unit-norm and mutually near-orthogonal; " +
    "eigenvalues are dominance-ordered and positive on the real corpus") {
    val m = model
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    m.components.foreach { c =>
      assert(math.abs(math.sqrt(dot(c, c)) - 1.0) < 1e-12)
    }
    // deflation orthogonalizes up to power-iteration residual; 12
    // rounds on the md5-derived corpus converge far below this bound
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-6)
    // the md5-noise corpus is near-isotropic (measured gap ~2%), so
    // strict dominance ordering is only guaranteed up to the spectral
    // gap at a fixed iteration count (Pca scaladoc); the hand-case test
    // below pins EXACT ordering where a real gap exists
    assert(m.eigenvalues(0) >= m.eigenvalues(1) * 0.9)
    assert(m.eigenvalues(0) > 0.0 && m.eigenvalues(1) > 0.0)
  }

  test("projection variance on the training sample equals the " +
    "eigenvalue; whitened variance is 1") {
    val m = model
    val scored = Pca.transform(
        emb.filter(col("vec_id") < 400), "embedding", m)
      .select("pc1", "white1").collect()
    val n = scored.length.toDouble
    val varPc = scored.map(r => math.pow(r.getDouble(0), 2)).sum / n -
      math.pow(scored.map(_.getDouble(0)).sum / n, 2)
    val varW = scored.map(r => math.pow(r.getDouble(1), 2)).sum / n -
      math.pow(scored.map(_.getDouble(1)).sum / n, 2)
    // centered projections have ~zero mean by construction; the raw
    // variance along comp 1 is the eigenvalue (its /n definition)
    assert(math.abs(varPc - m.eigenvalues(0)) < 1e-9 * (1 + m.eigenvalues(0)))
    assert(math.abs(varW - 1.0) < 1e-9)
  }

  test("hand case: points on a known line recover the direction, " +
    "second eigenvalue is ~0 and its whitened scores are 0") {
    val d = (0 until 32).map { i =>
      val t = i.toDouble - 15.5
      (i.toLong, Seq(3.0f * t.toFloat, 4.0f * t.toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.train(d, "embedding", nComp = 2, iters = 30,
      maxSample = 32, sampleOrderCol = Some("vec_id"))
    val c0 = m.components(0)
    // direction (3,4)/5 up to sign
    assert(math.abs(math.abs(c0(0)) - 0.6) < 1e-9)
    assert(math.abs(math.abs(c0(1)) - 0.8) < 1e-9)
    assert(m.eigenvalues(1) < 1e-18)
    val w2 = Pca.transform(d, "embedding", m).select("white2")
      .collect().map(_.getDouble(0))
    // degenerate direction: the 0-guard, never +/-Infinity
    assert(w2.forall(_ == 0.0))
  }

  test("model is layout-independent: repartitioned input trains the " +
    "identical model (content-hash mode) and scores identical rows") {
    val a = Pca.train(emb.repartition(13), "embedding", nComp = 2,
      iters = 12, maxSample = 400)
    val b = Pca.train(emb.repartition(2), "embedding", nComp = 2,
      iters = 12, maxSample = 400)
    assert(a === b)
    val ra = Pca.transform(emb.repartition(7), "embedding", a)
      .select("vec_id", "pc1", "pc2", "white1", "white2")
      .orderBy("vec_id").collect().toSeq
    val rb = Pca.transform(emb, "embedding", a)
      .select("vec_id", "pc1", "pc2", "white1", "white2")
      .orderBy("vec_id").collect().toSeq
    assert(ra === rb)
  }

  test("id-ordered and content-hash sampling train on the same rows " +
    "when the sample covers the table") {
    // maxSample >= table size makes both orders a permutation of the
    // same set; the MODELS differ (fold order differs) but the span
    // does not: total variance (sum over dims of per-dim variance) is
    // permutation-invariant up to float noise
    val mi = Pca.train(emb, "embedding", nComp = 1, iters = 12,
      maxSample = 4096, sampleOrderCol = Some("vec_id"))
    val mh = Pca.train(emb, "embedding", nComp = 1, iters = 12,
      maxSample = 4096)
    assert(mi.nSample === mh.nSample)
    assert(math.abs(mi.eigenvalues(0) - mh.eigenvalues(0)) <
      1e-9 * (1 + mi.eigenvalues(0)))
  }

  test("wrong-width corpus vector scores NULL, never a plausible " +
    "number (the DotProduct width contract survives the centering)") {
    val m = model
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = Pca.transform(bad, "embedding", m).select("pc1", "white1")
      .head()
    assert(r.isNullAt(0))
    // white1 derives from pc1 (eig1 > 0 on the real corpus) -> NULL too
    assert(r.isNullAt(1))
  }

  test("degenerate guards: empty sample and inconsistent widths are " +
    "loud errors") {
    val e = intercept[IllegalArgumentException] {
      Pca.train(emb.filter(col("vec_id") < 0), "embedding", nComp = 1)
    }
    assert(e.getMessage.contains("empty"))
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Pca.train(ragged, "embedding", nComp = 1,
        sampleOrderCol = Some("vec_id"))
    }
    assert(e2.getMessage.contains("width"))
  }
}
