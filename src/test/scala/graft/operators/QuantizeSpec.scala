package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** int8 scalar quantization: error bound, clamp range, zero-vector
  * safety, and retrieval recall of the quantized store vs exact floats.
  */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def emb = spark.read.parquet(
    "/root/testdata/sf0.001/embeddings.parquet")

  test("per-element reconstruction error is bounded by scale/2; q in [-127, 127]") {
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val joined = q.join(emb, "vec_id")
      .select(col("vec_id"), col("qscale"),
        zip_with(col("embedding").cast("array<double>"),
          Similarity.dequantizeInt8(col("qvec"), col("qscale")),
          (x, r) => abs(x - r)).as("errs"),
        col("qvec"))
    val bad = joined.filter(
      exists(col("errs"), e => e > col("qscale") / 2.0d + lit(1e-12)) ||
        exists(col("qvec"), v => abs(v) > 127))
    assert(bad.count() === 0L)
  }

  test("zero vectors quantize to zeros with scale 1, never divide by zero") {
    val z = Seq((1L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(z, "vec_id", "embedding").head()
    assert(r.getAs[Seq[Int]]("qvec").forall(_ == 0))
    assert(r.getAs[Double]("qscale") === 1.0)
  }

  test("degenerate vectors (zero, NaN) never appear in a top-k — engine-" +
      "portable contract shared with the oracle guards") {
    val rows = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq.fill(3)(0.0f)),            // zero vector -> NULL cosine
      (3L, Seq(Float.NaN, 1.0f, 1.0f)),   // NaN element -> NaN cosine
      (4L, Seq(3.0f, 2.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq(1.0, 1.0, 1.0)
    // k larger than the corpus: without the filter the degenerates would
    // pad the tail (Spark) or LEAD the list (DuckDB NaN-first on DESC)
    val got = Similarity.topK(rows, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
    val gotQ = Similarity.topKQuantized(
      Similarity.quantizeInt8(rows, "vec_id", "embedding"), "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(gotQ === Set(1L, 4L))
    // r17 review: the guard must hold in EVERY rank variant, not just
    // brute force — the sibling sites shared the unguarded sort
    val cents = Seq(0 -> Seq(1.0, 1.0, 1.0))
    val gotIvf = Similarity.topKIvf(rows, "vec_id", "embedding",
      cents, q, k = 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(gotIvf === Set(1L, 4L))
    val gotLsh = Similarity.topKLsh(rows, "vec_id", "embedding", dim = 3,
      q, k = 10, planesPerTable = 1, tables = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(gotLsh.subsetOf(Set(1L, 4L)) && gotLsh.nonEmpty)
    val cb = Similarity.trainPq(
      rows.filter(col("vec_id") === 1L)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vn")),
      "vn", m = 1, ksub = 1, sampleOrderCol = Some("vec_id"))
    val gotPq = Similarity.topKPq(
      Similarity.pqEncode(
        rows.select(col("vec_id"), col("embedding").cast("array<double>").as("vn")),
        "vn", cb),
      "vec_id", "vn", cb, q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(gotPq === Set(1L, 4L))
  }

  test("quantized top-10 recalls most of the exact top-10 on the corpus") {
    val query = graft.queries.PipelineQueries.fixedQueryVector
    val exact = Similarity.topK(emb, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val quant = Similarity.topKQuantized(
      Similarity.quantizeInt8(emb, "vec_id", "embedding"),
      "vec_id", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val overlap = (exact & quant).size
    assert(overlap >= 7, s"int8 recall degraded: $overlap/10 overlap")
  }
}
