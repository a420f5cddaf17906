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

  test("streaming CDC dedup survives a mid-stream stop + checkpoint " +
      "restart: exactly-once committed chunks equal to the batch run, " +
      "chunk state restored across the restart") {
    import spark.implicits._
    val srcDir = SparkTestSession.tmpPath("ckpt_cdc_src")
    val ckpt = SparkTestSession.tmpPath("ckpt_cdc_ckpt")
    val outDir = SparkTestSession.tmpPath("ckpt_cdc_out")
    Seq(srcDir, ckpt, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    Files.createDirectories(Paths.get(srcDir))
    val t0 = 1700000000L
    // the same three planted exact-duplicate pairs as the near-dup
    // recovery test: (5,7) pre-stop, (3,45) across the stop (45's chunk
    // hits can ONLY come from state restored out of the checkpoint),
    // (41,52) post-stop
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
      Thread.sleep(1100)
    }
    val schema = Seq((0L, new java.sql.Timestamp(0L), "t"))
      .toDF("doc_id", "ts", "text").schema
    def startQuery() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      StreamCdc.dupChunkHits(stream, "doc_id", "ts", "text")
        .select("doc_id", "cidx", "first_doc", "n_prev")
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    }
    write("b0", 0 until 10); write("b1", 10 until 20); write("b2", 20 until 30)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(afterRun1.exists(h => h._1 == 7L && h._3 == 5L),
      s"pre-stop duplicate chunks not flagged in run 1")
    assert(!afterRun1.exists(_._1 >= 30L), "run 1 saw post-stop docs")

    write("b3", 30 until 40); write("b4", 40 until 50); write("b5", 50 until 60)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val staticDocs = (0L until 60L)
      .map(i => (i, new java.sql.Timestamp((t0 + i) * 1000L), textOf(i)))
      .toDF("doc_id", "ts", "text")
    val want = StreamCdc.dupChunkHits(staticDocs, "doc_id", "ts", "text")
      .select("doc_id", "cidx", "first_doc", "n_prev").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want,
      s"restart diverged from the batch run: extra=${(got -- want).take(3)}, " +
        s"missing=${(want -- got).take(3)}")
    // state restoration: every chunk of 45 flagged against 3, which is
    // not in run 2's input — only restored keyed state can know it
    val g = graft.operators.Corpus.cdcWeights(8).toArray
    val n45 = graft.operators.Corpus.chunkWalk(textOf(45L), 8, 32, g).size
    assert(n45 > 0 && got.count(h => h._1 == 45L && h._3 == 3L) == n45,
      "cross-restart chunk state was not restored from the checkpoint")
    assert(got.exists(h => h._1 == 52L && h._3 == 41L),
      "post-restart duplicate not flagged")
    // exactly-once: committed multiset equals the batch run's rows (one
    // row per dup chunk instance; the set compare above plus identical
    // total counts rules out manifest-level double emission)
    assert(spark.read.parquet(outDir).count() ===
      StreamCdc.dupChunkHits(staticDocs, "doc_id", "ts", "text").count())
  }

  test("streaming repeat census survives a mid-stream stop + checkpoint " +
      "restart: exactly-once committed candidates equal to the batch " +
      "run, seed state restored across the restart") {
    import spark.implicits._
    val srcDir = SparkTestSession.tmpPath("ckpt_rep_src")
    val ckpt = SparkTestSession.tmpPath("ckpt_rep_ckpt")
    val outDir = SparkTestSession.tmpPath("ckpt_rep_out")
    Seq(srcDir, ckpt, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    Files.createDirectories(Paths.get(srcDir))
    val t0 = 1700000000L
    // the CDC recovery corpus: pair (3,45) straddles the stop — doc 45's
    // candidates can ONLY name doc 3 if the seed state came back out of
    // the checkpoint
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
      Thread.sleep(1100)
    }
    val schema = Seq((0L, new java.sql.Timestamp(0L), "t"))
      .toDF("doc_id", "ts", "text").schema
    def startQuery() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      StreamRepeats.repeatCandidates(stream, "doc_id", "ts", "text")
        .select("doc_id", "s0", "first_doc", "first_s0", "rk")
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    }
    write("b0", 0 until 10); write("b1", 10 until 20); write("b2", 20 until 30)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    write("b3", 30 until 40); write("b4", 40 until 50); write("b5", 50 until 60)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4))
    val got = spark.read.parquet(outDir).collect().map(key).toSet
    val staticDocs = (0L until 60L)
      .map(i => (i, new java.sql.Timestamp((t0 + i) * 1000L), textOf(i)))
      .toDF("doc_id", "ts", "text")
    val want = StreamRepeats
      .repeatCandidates(staticDocs, "doc_id", "ts", "text")
      .select("doc_id", "s0", "first_doc", "first_s0", "rk")
      .collect().map(key).toSet
    assert(got == want,
      s"restart diverged from the batch run: extra=${(got -- want).take(3)}, " +
        s"missing=${(want -- got).take(3)}")
    // state restoration: doc 45's candidates name doc 3, which run 2
    // never saw — only restored seed state can know it. (Not ALL of
    // 45's anchors name 3: seeds from the shared sentence template
    // first-arrived in earlier docs — so the evidence is non-emptiness,
    // with exactness carried by the got == want set equality above.)
    assert(got.count(h => h._1 == 45L && h._3 == 3L) > 0,
      "cross-restart seed state was not restored from the checkpoint")
    // exactly-once: committed multiset equals the batch run's rows
    assert(spark.read.parquet(outDir).count() ===
      StreamRepeats.repeatCandidates(staticDocs, "doc_id", "ts", "text")
        .count())
  }

  test("the FULL curation composite (gate + dup state + stream-stream " +
      "outer join) survives a mid-stream stop + checkpoint restart and " +
      "equals curate's batch frame") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val srcDir = SparkTestSession.tmpPath("ckpt_cur_src")
    val ckpt = SparkTestSession.tmpPath("ckpt_cur_ckpt")
    val outDir = SparkTestSession.tmpPath("ckpt_cur_out")
    Seq(srcDir, ckpt, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    Files.createDirectories(Paths.get(srcDir))
    val t0 = 1700000000L
    val cfg = TextAnalysis.GopherConfig(minWords = 10L, maxWords = 200L,
      minMeanWordLen = 2.0, maxMeanWordLen = 8.0, minStopwordHits = 1)

    // same dup-pair probes as the near-dup test, plus quality-fail docs
    // (every id ending in 9 is the single word "tiny" — which also makes
    // them exact dups of EACH OTHER, so the dup state and the quality
    // gate interact across the restart) and planted PII on id % 7 == 0
    def textOf(id: Long): String = id match {
      case 7L => textOf(5L)
      case 45L => textOf(3L)
      case 52L => textOf(41L)
      case i if i % 10 == 9 => "tiny"
      case i =>
        val base = s"the document $i body has alpha_$i beta_$i " +
          s"gamma_$i delta_$i epsilon_$i tokens and more filler words here"
        if (i % 7 == 0) base + " contact a.b@example.com now" else base
    }
    def write(name: String, ids: Range): Unit = {
      ids.map(i => (i.toLong,
          new java.sql.Timestamp((t0 + i) * 1000L), textOf(i.toLong)))
        .toDF("doc_id", "ts", "text")
        .repartition(1).write.parquet(s"$srcDir/$name")
      Thread.sleep(1100)
    }
    val schema = Seq((0L, new java.sql.Timestamp(0L), "t"))
      .toDF("doc_id", "ts", "text").schema
    def startQuery() = StreamCurate.withStatefulChainAllowed(spark) {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      StreamCurate.curateStream(stream, "doc_id", "ts", "text",
        threshold = 0.7, cfg = cfg)
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    }

    // ---- run 1: three micro-batches, then a mid-stream stop. Matched
    // (dup) rows emit immediately; unmatched rows wait on the watermark,
    // which never passes inside the 60 s data window — so run 1 commits
    // only dup rows
    write("b0", 0 until 10); write("b1", 10 until 20); write("b2", 20 until 30)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(afterRun1.get(7L) === Some(true),
      s"pre-stop duplicate not in run-1 output: $afterRun1")
    assert(!afterRun1.keys.exists(_ >= 30L), "run 1 saw post-stop docs")

    // ---- batches land while the query is down; then restart + two
    // far-future sentinel batches so the watermark (applied one batch
    // behind the data that moved it) flushes every outer-join row
    write("b3", 30 until 40); write("b4", 40 until 50); write("b5", 50 until 60)
    // sentinel ids map to ts = t0 + 9901/9902 s (~2.75 h ahead): the
    // first advances max event time past every doc's ts + the 2 h delay,
    // the second batch applies it
    write("s1", 9901 until 9902); write("s2", 9902 until 9903)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir)
      .filter(col("doc_id") < 9000L).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val staticDocs = (0L until 60L)
      .map(i => (i, new java.sql.Timestamp((t0 + i) * 1000L), textOf(i)))
      .toDF("doc_id", "ts", "text")
    val want = StreamCurate.curate(staticDocs, "doc_id", "ts", "text",
      threshold = 0.7, cfg = cfg).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == want,
      s"composite restart diverged from curate's batch frame: " +
        s"extra=${got -- want}, missing=${want -- got}")
    // cross-restart dup: doc 45's flag can only come from state restored
    // out of the checkpoint (doc 3 is not in run 2's input)
    assert(got.exists(r => r._1 == 45L && r._3), "doc 45 not flagged dup")
    // exactly-once: one committed row per document
    assert(got.size === 60)
  }
}
