package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SparkTestSession

/** Multi-batch end-to-end run with a MID-STREAM stop and a checkpoint
  * restart — the failure mode a real ingest pipeline hits weekly, and
  * the one the batch==stream equivalence rows never exercise. A stateful
  * near-dup query processes half its micro-batches, the query is stopped,
  * more source batches land, a NEW query restarts from the same
  * checkpoint + durable file sink, and the union of committed output must
  * equal the batch oracle EXACTLY:
  *
  *  - exactly-once: no hit is emitted twice across the two runs (the file
  *    sink's batchId manifest dedups any batch re-executed after a stop
  *    that committed offsets but not output);
  *  - state recovery: a post-restart exact duplicate of a PRE-restart
  *    document must be flagged against it — the flag can only come from
  *    keyed state restored out of the checkpoint, not from anything in
  *    run 2's own input;
  *  - no reprocessing: run 2's committed output contains no hit for
  *    documents whose duplicates both arrived before the stop.
  *
  * Reading the sink path back goes through its `_spark_metadata` log
  * (Spark's file source honors it), so only COMMITTED batches count —
  * exactly the consumer contract of a production file sink.
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("stateful near-dup survives a mid-stream stop + checkpoint " +
      "restart: exactly-once output equal to the batch oracle, state " +
      "restored across the restart") {
    import spark.implicits._
    val srcDir = SparkTestSession.tmpPath("ckpt_rec_src")
    val ckpt = SparkTestSession.tmpPath("ckpt_rec_ckpt")
    val outDir = SparkTestSession.tmpPath("ckpt_rec_out")
    Seq(srcDir, ckpt, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    Files.createDirectories(Paths.get(srcDir))
    val t0 = 1700000000L

    // 6 batches x 10 docs, ids 0..59, strictly increasing ts. Unique
    // filler text per doc, except three planted exact-duplicate pairs
    // chosen to probe each recovery property:
    //   (5, 7)   both pre-stop    -> hit emitted in run 1, NOT re-emitted
    //   (3, 45)  across the stop  -> run 2 can only flag 45 via RESTORED
    //                               state (doc 3 is not in run 2's input)
    //   (41, 52) both post-stop   -> normal run-2 state accumulation
    def textOf(id: Long): String = id match {
      case 7L => textOf(5L)
      case 45L => textOf(3L)
      case 52L => textOf(41L)
      case _ => s"document $id body with enough distinct tokens " +
        s"alpha_$id beta_$id gamma_$id delta_$id epsilon_$id"
    }
    def write(name: String, ids: Range): Unit = {
      ids.map(i => (i.toLong,
          new java.sql.Timestamp((t0 + i) * 1000L), textOf(i.toLong)))
        .toDF("doc_id", "ts", "text")
        .repartition(1).write.parquet(s"$srcDir/$name")
      Thread.sleep(1100) // distinct mod-times => deterministic batch order
    }
    val schema = Seq((0L, new java.sql.Timestamp(0L), "t"))
      .toDF("doc_id", "ts", "text").schema
    def startQuery() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      StreamDedup.nearDupHits(stream, "doc_id", "ts", "text")
        .select("doc_id", "dup_of")
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    }

    // ---- run 1: three micro-batches, then a mid-stream stop
    write("b0", 0 until 10); write("b1", 10 until 20); write("b2", 20 until 30)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterRun1.contains((7L, 5L)),
      s"pre-stop duplicate not flagged in run 1: $afterRun1")
    assert(!afterRun1.exists(_._1 >= 30L), "run 1 saw post-stop docs")

    // ---- more batches land while the query is down
    write("b3", 30 until 40); write("b4", 40 until 50); write("b5", 50 until 60)

    // ---- run 2: a NEW query from the same checkpoint + sink
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    // committed output (via the sink's _spark_metadata manifest) must
    // equal the batch oracle over the full concatenated input — the
    // batch==stream law q_stream_neardup pins, now across a restart
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val staticDocs = (0L until 60L)
      .map(i => (i, new java.sql.Timestamp((t0 + i) * 1000L), textOf(i)))
      .toDF("doc_id", "ts", "text")
    val want = StreamDedup.nearDupHits(staticDocs, "doc_id", "ts", "text")
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"restart diverged from the batch oracle: extra=${got -- want}, " +
        s"missing=${want -- got}")
    // the planted pairs each probe one recovery property
    assert(got.contains((45L, 3L)),
      "cross-restart duplicate not flagged — keyed state was not " +
        "restored from the checkpoint")
    assert(got.contains((52L, 41L)), "post-restart duplicate not flagged")
    // exactly-once, stated directly: the operator legitimately emits one
    // row per MATCHING BAND (8 for an exact duplicate) — so per-key
    // committed row counts must equal the batch run's, not 1. A batch
    // re-executed after a stop that committed offsets but not output
    // would double a key's count if the sink manifest failed to dedup.
    def keyCounts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id", "dup_of").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val gotCounts = keyCounts(spark.read.parquet(outDir))
    val wantCounts = keyCounts(
      StreamDedup.nearDupHits(staticDocs, "doc_id", "ts", "text")
        .select("doc_id", "dup_of"))
    assert(gotCounts == wantCounts,
      s"committed row counts diverged from the batch run (re-emitted " +
        s"batch after restart?): got=$gotCounts want=$wantCounts")
  }
}
