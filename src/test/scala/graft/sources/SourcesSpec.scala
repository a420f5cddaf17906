package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** CSV/JSON round-trips with explicit schemas. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("csv round-trip preserves rows and declared types") {
    val orig = spark.read.parquet(s"$dir/nation.parquet")
    Sources.writeCsv(orig, "/tmp/graft_src_test/nation_csv")
    val back = Sources.csv(spark, "/tmp/graft_src_test/nation_csv", orig.schema)
    assert(back.schema == orig.schema)
    assert(sortedRows(back) == sortedRows(orig))
  }

  test("json round-trip preserves rows and declared types") {
    val orig = spark.read.parquet(s"$dir/supplier.parquet")
    Sources.writeJson(orig, "/tmp/graft_src_test/supplier_json")
    val back = Sources.json(spark, "/tmp/graft_src_test/supplier_json", orig.schema)
    assert(back.schema == orig.schema)
    assert(sortedRows(back) == sortedRows(orig))
  }

  test("csv round-trip preserves padded strings; header mismatch fails fast") {
    import spark.implicits._
    val df = Seq((1L, "  padded  "), (2L, "x")).toDF("id", "s")
    Sources.writeCsv(df, "/tmp/graft_src_test/padded_csv")
    val back = Sources.csv(spark, "/tmp/graft_src_test/padded_csv", df.schema)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("  padded  ", "x"), "writer trimmed padded strings")
    // a schema whose names don't match the file header must fail loudly,
    // not silently mismap columns by position
    val wrong = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("other", org.apache.spark.sql.types.StringType)))
    intercept[Exception] {
      Sources.csv(spark, "/tmp/graft_src_test/padded_csv", wrong).collect()
    }
  }

  test("a csv-sourced param table drives the TaskGraph like any DataFrame") {
    val orig = spark.read.parquet(s"$dir/region.parquet")
    Sources.writeCsv(orig, "/tmp/graft_src_test/region_csv")
    val csv = Sources.csv(spark, "/tmp/graft_src_test/region_csv", orig.schema)
    val g = graft.core.TaskGraph.chain("a", "b")
      .mapFrame(csv, Map("a" -> "r_name"),
        indexCol = Some("r_regionkey"), dimName = "rk")
      .reduce(key = "b", name = "n", attrs = Map("func" -> "count"))
    assert(g.result("n").collect()(0).getAs[Long]("n") == orig.count())
  }
}
