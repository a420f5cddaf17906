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
