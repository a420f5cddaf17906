package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SparkTestSession
import graft.queries.Tables

/** Batch/stream equivalence for the Structured-Streaming surface
  * (SURVEY §5.3: streaming verified against the batch query over the same
  * events data).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("streaming hourly agg == batch hourly agg") {
    val stream = EventStreams.readStream(spark, dir)
    val got = EventStreams.runToBatch(EventStreams.hourlyAgg(stream), "hourly_out")
    val want = EventStreams.hourlyAgg(Tables.events(spark, dir))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0)
  }

  test("streaming sliding agg == batch sliding agg") {
    val stream = EventStreams.readStream(spark, dir)
    val got = EventStreams.runToBatch(EventStreams.slidingAgg(stream), "sliding_out")
    val want = EventStreams.slidingAgg(Tables.events(spark, dir))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("streaming session windows == batch session windows") {
    val stream = EventStreams.readStream(spark, dir)
    val got = EventStreams.runToBatch(EventStreams.sessionAgg(stream), "session_out")
    val want = EventStreams.sessionAgg(Tables.events(spark, dir))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("stream-stream interval join == batch range join") {
    val stream = EventStreams.readStream(spark, dir)
    val got = EventStreams.runToBatch(
      EventStreams.clickPurchaseJoin(stream), "ssjoin_out", outputMode = "append")
    val want = EventStreams.clickPurchaseJoin(Tables.events(spark, dir))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0, "test vacuous: no click/purchase pairs in window")
  }

  test("dropDuplicatesWithinWatermark: streaming dedup matches exact key set") {
    import org.apache.spark.sql.functions._
    // duplicate every event (union with itself): the stream must emit one
    // row per event_id; which physical duplicate survives is unspecified,
    // so the assertion is on the key set, not exemplar rows
    val stream = EventStreams.readStream(spark, dir)
    val doubled = stream.union(stream)
    val got = EventStreams.runToBatch(
      EventStreams.dedupWithinWatermark(doubled, Seq("event_id")),
      "dedup_ww_out", outputMode = "append")
    val batch = Tables.events(spark, dir)
    val wantKeys = batch.select("event_id").distinct().count()
    assert(got.count() == wantKeys, "streaming dedup emitted duplicates or dropped keys")
    assert(got.select("event_id").distinct().count() == wantKeys)
    // batch execution of the same function reduces to plain dropDuplicates
    val gotBatch = EventStreams.dedupWithinWatermark(
      batch.union(batch), Seq("event_id"))
    assert(gotBatch.count() == wantKeys)
  }

  test("stateful first-per-key dedup: streaming == batch == naive") {
    val stream = EventStreams.readStream(spark, dir)
    val got = EventStreams.runToBatch(
      EventStreams.firstPerKey(stream), "first_out", outputMode = "append")
    val want = EventStreams.firstPerKey(Tables.events(spark, dir))
    assert(sortedRows(got) == sortedRows(want))
    // and both equal a naive windowed first-row computation
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val naive = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
    assert(sortedRows(want.select("user_id", "event_type", "event_id", "ts")) ==
      sortedRows(naive))
    assert(got.count() > 0)
  }
}
