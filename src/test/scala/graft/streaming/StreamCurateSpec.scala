package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession
import graft.operators.TextAnalysis

/** The streaming curation gate composite: decision semantics on planted
  * documents, equality to manual recomposition, and the stateless half
  * actually EXECUTING as a structured stream.
  */
class StreamCurateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val goodText =
    ("the quick brown fox jumps over the lazy dog and then walks to " +
      "town with many fine friends that have come along " +
      "to see the meadow and that was all good").trim
  private val cfg = TextAnalysis.GopherConfig(minWords = 25L,
    maxWords = 80L, minMeanWordLen = 3.0, maxMeanWordLen = 5.0,
    minStopwordHits = 1)

  private def corpus: DataFrame = Seq(
    (1L, goodText), // kept
    (2L, goodText + " extra"), // near-dup of 1 (arrives later) -> rejected
    (3L, "tiny"), // quality fail (word count)
    (4L, ("a completely different report about the harvest this year " +
      "with plenty of corn and wheat that the farmers have gathered " +
      "and sold at the market to happy buyers from the city " +
      "contact me at a.b@example.com today")) // kept, distinct, 1 pii
  ).toDF("doc_id", "text")
    .withColumn("ts", timestamp_micros((col("doc_id") + 10000L) * 1000000L))

  test("decision semantics: dup rejected, quality-fail rejected, clean kept, pii counted") {
    val r = StreamCurate.curate(corpus, "doc_id", "ts", "text",
      threshold = 0.5, cfg = cfg, md5Mode = true)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getLong(0) ->
      (x.getBoolean(1), x.getBoolean(2), x.getLong(3), x.getBoolean(4))).toMap
    assert(byId(1L) === ((true, false, 0L, true)))
    assert(byId(2L)._2 === true) // dup of 1
    assert(byId(2L)._4 === false)
    assert(byId(3L)._1 === false) // quality fail
    assert(byId(3L)._4 === false)
    assert(byId(4L) === ((true, false, 1L, true)))
  }

  test("curate honors a non-doc_id id column name (output keyed on it)") {
    val renamed = corpus.withColumnRenamed("doc_id", "item_id")
    val r = StreamCurate.curate(renamed, "item_id", "ts", "text",
      threshold = 0.5, cfg = cfg, md5Mode = true)
    assert(r.columns.head === "item_id")
    val byId = r.collect().map(x => x.getLong(0) ->
      (x.getBoolean(1), x.getBoolean(2), x.getLong(3), x.getBoolean(4)))
      .toMap
    val want = StreamCurate.curate(corpus, "doc_id", "ts", "text",
      threshold = 0.5, cfg = cfg, md5Mode = true).collect()
      .map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getLong(3), x.getBoolean(4)))
      .toMap
    assert(byId === want)
  }

  test("composite equals manual recomposition of its three stages") {
    val manualDups = StreamDedup.nearDupHits(corpus, "doc_id", "ts",
      "text", threshold = 0.5, md5Mode = true)
      .select("doc_id").distinct().as[Long].collect().toSet
    val manualGate = StreamCurate.gate(corpus, "text", cfg)
      .select(col("doc_id"), col("quality_pass"), col("n_pii")).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    val got = StreamCurate.curate(corpus, "doc_id", "ts", "text",
      threshold = 0.5, cfg = cfg, md5Mode = true).collect()
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1) === manualGate(id)._1)
      assert(r.getBoolean(2) === manualDups.contains(id))
      assert(r.getLong(3) === manualGate(id)._2)
      assert(r.getBoolean(4) === (manualGate(id)._1 && !manualDups(id)))
    }
  }

  test("the FULL composite runs as ONE streaming query (gate + stateful " +
      "dup hits + stream-stream outer join) and equals curate's batch frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus.select("doc_id", "ts", "text")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(_._1)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val streamDf = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamCurate.withStatefulChainAllowed(spark) {
      StreamCurate.curateStream(streamDf, "doc_id", "ts", "text",
        threshold = 0.5, cfg = cfg)
        .writeStream.format("memory").queryName("curate_full_sink")
        .outputMode("append").start()
    }
    try {
      // arrival order = ts order, split across micro-batches so the dup
      // pair (1, 2) spans state carried BETWEEN batches
      mem.addData(rows(0))
      q.processAllAvailable()
      mem.addData(rows(1), rows(2))
      q.processAllAvailable()
      mem.addData(rows(3))
      q.processAllAvailable()
      // two far-future sentinel batches: the first advances the max
      // event time, the second lets the new watermark take effect so
      // every outer-join row flushes (watermark is applied one batch
      // behind the data that moved it)
      val far1 = new java.sql.Timestamp(rows.map(_._2.getTime).max +
        9L * 3600 * 1000)
      val far2 = new java.sql.Timestamp(far1.getTime + 3600 * 1000)
      mem.addData((9901L, far1, "sentinel one body"))
      q.processAllAvailable()
      mem.addData((9902L, far2, "sentinel two body"))
      q.processAllAvailable()
      val got = spark.table("curate_full_sink")
        .filter(col("doc_id") < 9000L).collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
          r.getLong(3), r.getBoolean(4))).toMap
      val want = StreamCurate.curate(corpus, "doc_id", "ts", "text",
        threshold = 0.5, cfg = cfg).collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
          r.getLong(3), r.getBoolean(4))).toMap
      assert(got === want)
      assert(got.size === 4)
      assert(got(2L)._2 === true) // the dup flag crossed micro-batches
    } finally q.stop()
  }

  test("the composite's watermark survives a NON-NULLABLE event-time " +
      "column on a duplicate-free stream (the guard-folding regression)") {
    // ts derived from the non-nullable tuple field: nullable = false at
    // the source. If the heartbeat guard's watermark-column reference
    // ever becomes foldable (NullPropagation + SimplifyConditionals on
    // a provably non-nullable __dup_ts), the bare predicate is pushed
    // below the watermark node and the heartbeat branch becomes Filter
    // false — on a DUP-FREE stream no hit ever flows, the hits-branch
    // watermark pins at epoch, and the outer join emits NOTHING,
    // forever. Today the DupHit encoder's nullable ts field blocks the
    // fold; EventTimeAnchor removes the reliance on that accident, and
    // this test pins the end-to-end behavior under the most foldable
    // source schema either way.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "tsl", "text")
      .withColumn("ts", timestamp_micros(col("tsl") * 1000000L))
    assert(!streamDf.schema("ts").nullable,
      "precondition: this regression needs a non-nullable event time")
    val q = StreamCurate.withStatefulChainAllowed(spark) {
      StreamCurate.curateStream(streamDf, "doc_id", "ts", "text",
        threshold = 0.5, cfg = cfg)
        .writeStream.format("memory").queryName("curate_nn_sink")
        .outputMode("append").start()
    }
    try {
      // all distinct texts — zero duplicate hits anywhere
      mem.addData((1L, 10000L, goodText),
        (2L, 10001L, goodText.replace("fox", "owl").replace("dog", "cat")))
      q.processAllAvailable()
      val far = 10001L + 9L * 3600
      mem.addData((9901L, far, "sentinel one body"))
      q.processAllAvailable()
      mem.addData((9902L, far + 3600, "sentinel two body"))
      q.processAllAvailable()
      val got = spark.table("curate_nn_sink")
        .filter(col("doc_id") < 9000L).collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got.keySet === Set(1L, 2L),
        "dup-free rows never flushed — the heartbeat watermark froze")
      assert(got.values.forall(_ == false))
    } finally q.stop()
  }

  test("the stateless gate runs AS A STREAM and equals its batch execution") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val q = StreamCurate.gate(streamDf, "text", cfg)
      .select("doc_id", "quality_pass", "n_pii")
      .writeStream.format("memory").queryName("curate_gate_sink")
      .outputMode("append").start()
    try {
      mem.addData((1L, goodText), (3L, "tiny"))
      q.processAllAvailable()
      mem.addData((4L, goodText + " a.b@example.com"))
      q.processAllAvailable()
      val got = spark.table("curate_gate_sink").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
      val want = StreamCurate.gate(
        Seq((1L, goodText), (3L, "tiny"), (4L, goodText + " a.b@example.com"))
          .toDF("doc_id", "text"), "text", cfg)
        .select("doc_id", "quality_pass", "n_pii").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
      assert(got === want)
      assert(got.size === 3)
    } finally q.stop()
  }
}
