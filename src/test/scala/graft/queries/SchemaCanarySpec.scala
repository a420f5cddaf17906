package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession

/** Testdata schema canary: the driver regenerates the parquet tables
  * between rounds and has already changed physical types once
  * (`events.ts` went from TIMESTAMP(NANOS) to TIMESTAMP_MICROS/NTZ, which
  * silently broke eight tests and two queries spread across the tree).
  * This spec is the single loud tripwire: it asserts the NORMALIZED
  * ingestion schema every query builds on, at every SF directory present,
  * so the next type drift fails here with a type name in the message
  * instead of as scattered wrong-answer diffs.
  */
class SchemaCanarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private val root = new java.io.File("/root/testdata")
  private val sfDirs: Seq[String] =
    Option(root.listFiles).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted

  test("at least one testdata SF directory exists") {
    assert(sfDirs.nonEmpty, s"no sf* dirs under $root")
  }

  private def typeOf(df: org.apache.spark.sql.DataFrame, col: String): DataType =
    df.schema(col).dataType

  test("normalizeTs: nanos-Long, NTZ, and TimestampType inputs all land on " +
      "the same instant (value-level, not just schema)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    val fromLong = Tables.normalizeTs(
      Seq((1L, micros * 1000L + 789L)).toDF("event_id", "ts")) // nanos truncate
    val fromNtz = Tables.normalizeTs(
      Seq((1L, micros)).toDF("event_id", "us")
        .select($"event_id",
          timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.normalizeTs(
      Seq((1L, micros)).toDF("event_id", "us")
        .select($"event_id", timestamp_micros($"us").as("ts")))
    for ((df, tag) <- Seq((fromLong, "long"), (fromNtz, "ntz"), (fromTs, "ts"))) {
      assert(typeOf(df, "ts") == TimestampType, s"$tag: wrong type")
      val got = df.select(unix_micros($"ts")).head().getLong(0)
      assert(got == micros, s"$tag: normalized to $got, want $micros")
    }
  }

  for (dir <- sfDirs) {
    val sf = dir.substring(dir.lastIndexOf('/') + 1)

    test(s"[$sf] events: normalized ts is TIMESTAMP (tz-aware), keys are Long") {
      val ev = Tables.events(spark, dir)
      // THE canary: whatever the file stores (nanos-Long, NTZ micros, ...),
      // Tables.normalizeTs must deliver a plain TimestampType — every
      // unix_millis/unix_micros/window consumer depends on it
      assert(typeOf(ev, "ts") == TimestampType,
        s"events.ts normalized to ${typeOf(ev, "ts")} — ingestion stopped " +
          "normalizing; check Tables.normalizeTs vs the parquet footer")
      assert(typeOf(ev, "event_id") == LongType)
      assert(typeOf(ev, "user_id") == LongType)
      assert(typeOf(ev, "event_type") == StringType)
      assert(typeOf(ev, "value") == DoubleType)
      // and the streaming source derives the SAME normalized schema
      val streamSchema = graft.streaming.EventStreams
        .sourceSchema(spark, dir)
      val normalized = Tables.normalizeTs(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          streamSchema)).schema
      assert(normalized("ts").dataType == TimestampType,
        s"streaming sourceSchema normalizes ts to ${normalized("ts").dataType}")
    }

    test(s"[$sf] documents/embeddings: text + vector column types") {
      val docs = Tables.documents(spark, dir)
      assert(typeOf(docs, "doc_id") == LongType)
      assert(typeOf(docs, "text") == StringType)
      val emb = Tables.embeddings(spark, dir)
      val vecType = typeOf(emb, "embedding")
      assert(vecType.isInstanceOf[ArrayType] &&
        vecType.asInstanceOf[ArrayType].elementType == FloatType,
        s"embeddings.embedding is $vecType, expected array<float>")
    }

    test(s"[$sf] relational tables: join-key and measure types") {
      def isTimestampish(t: DataType): Boolean =
        t == TimestampType || t == TimestampNTZType
      val li = Tables.lineitem(spark, dir)
      assert(typeOf(li, "l_orderkey") == LongType)
      assert(typeOf(li, "l_quantity") == DoubleType)
      assert(typeOf(li, "l_extendedprice") == DoubleType)
      assert(isTimestampish(typeOf(li, "l_shipdate")),
        s"l_shipdate is ${typeOf(li, "l_shipdate")}")
      val o = Tables.orders(spark, dir)
      assert(typeOf(o, "o_orderkey") == LongType)
      assert(typeOf(o, "o_custkey") == LongType)
      assert(isTimestampish(typeOf(o, "o_orderdate")),
        s"o_orderdate is ${typeOf(o, "o_orderdate")}")
      val c = Tables.customer(spark, dir)
      assert(typeOf(c, "c_custkey") == LongType)
      assert(typeOf(c, "c_nationkey") == IntegerType)
      val n = Tables.nation(spark, dir)
      assert(typeOf(n, "n_nationkey") == IntegerType)
    }
  }
}
