package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** The native DotProduct expression against driver-side arithmetic and
  * the HOF formulation it replaced, on both codegen and interpreted
  * paths.
  */
class DotProductSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  test("matches driver-side arithmetic and the HOF formulation exactly") {
    val rnd = new scala.util.Random(1)
    val rows = (0 until 100).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", DotProduct.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaHof = df.select($"id", hofDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = rows.map { case (i, a, b) =>
      i -> a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    }.toMap
    assert(got == driver)  // bit-identical: same ascending-index fold
    assert(got == viaHof)
  }

  test("float arrays implicitly cast; null array yields null") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Seq(3.0, 4.0)),
      (2L, None, Seq(1.0, 1.0))
    ).toDF("id", "a", "b")
    val rows = df.select($"id", DotProduct.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1L) == 11.0)
    assert(rows(2L) == null)
  }

  test("mismatched dimensions yield null, never a partial score") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0)),  // 3 vs 2 dims
      (2L, Seq(1.0, 2.0), Seq(3.0, 4.0))
    ).toDF("id", "a", "b")
    val rows = df.select($"id", DotProduct.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1L) == null) // matches the zip_with null-pad semantics
    assert(rows(2L) == 11.0)
  }

  test("works on the real embeddings table and survives codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = emb.select($"vec_id", DotProduct.dot($"embedding", $"embedding").as("n2"))
    // plan compiles through whole-stage codegen: the starred `*(n)`
    // prefix marks operators inside a codegen stage
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_dot"),
      s"no codegen span:\n${plan.take(500)}")
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = emb.collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      r.getLong(r.fieldIndex("vec_id")) -> v.foldLeft(0.0)((s, x) => s + x * x)
    }.toMap
    assert(got == driver)
  }
}
