package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for parquet BLOOM-FILTER row-group pruning — the
  * point-lookup IO story at 100 TB: a needle query on a
  * high-cardinality column whose values are RANDOMLY laid out across
  * row groups (so min/max statistics prune nothing) reads every row
  * group without blooms and almost none with them. This is the
  * third IO-pruning lever next to the partition pruning (q_time_layout)
  * and min/max-+ manifest skipping (q_zorder_layout) rows in SCALE.md —
  * blooms are the one that works when the column has no layout at all.
  *
  * Method: write the documents table twice (small row groups so a probe
  * spans many of them; `content_hash` = md5 of the text — high
  * cardinality, random layout), once plain and once with
  * `parquet.bloom.filter.enabled#content_hash=true`; run K needle
  * lookups against each and report bytes read (SparkListener input
  * metrics, the same machinery Bench uses) and wall time. Run with:
  *   sbt "runMain graft.tools.ParquetBloomProbe [sfDir] [k]"
  */
object ParquetBloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // small row groups: the probe must span MANY so pruning is visible
      .config("parquet.block.size", (1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytesRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
      .stripSuffix("/") + s"/graft-bloomprobe-pid${ProcessHandle.current().pid()}"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("content_hash", md5(coalesce(col("text"), lit(""))))
      .repartition(1) // one file, many row groups — worst case for IO
    // dictionaries OFF: at 100 TB a content-hash column blows past the
    // dictionary-page threshold and falls back to plain encoding, at
    // which point dictionary-filtering (which proves absence for free
    // at small scale) is gone — the regime blooms exist for. Modeled
    // here by disabling dictionaries on both variants.
    docs.write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .parquet(s"$base/plain")
    docs.write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.bloom.filter.enabled#content_hash", "true")
      .option("parquet.bloom.filter.expected.ndv#content_hash", "20000")
      .parquet(s"$base/bloom")
    // needles: real hashes picked by ROW position (doc_id stride), so
    // their VALUES sit anywhere in the hash space — a min/max-stats
    // reader cannot prune them on a randomly laid-out column, which is
    // precisely the regime blooms exist for
    val present = spark.read.parquet(s"$base/plain")
      .filter(col("doc_id") % 1000 === 7)
      .select("content_hash").limit(k).collect().map(_.getString(0)).toSeq
    // absent needles — the decontamination-membership shape (probe a
    // hash that is NOT in the corpus): textbook bloom territory, since
    // min/max cannot prove absence on a random column but a bloom can
    val absent = (0 until k).map(i => f"ffffffff$i%024x")
    def probe(dir: String, needles: Seq[String]): (Long, Double) = {
      // warm the file listing, then measure the needle scans alone
      spark.read.parquet(dir).count()
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      needles.foreach { h =>
        spark.read.parquet(dir)
          .filter(col("content_hash") === h).count()
      }
      // listener events are async; settle before reading the counter
      Thread.sleep(500)
      (bytesRead.get(), (System.nanoTime() - t0) / 1e9)
    }
    for ((vec, label, needles) <- Seq(
        (true, "present", present), (true, "absent", absent),
        (false, "present", present), (false, "absent", absent))) {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader",
        vec.toString)
      val (plainBytes, plainSec) = probe(s"$base/plain", needles)
      val (bloomBytes, bloomSec) = probe(s"$base/bloom", needles)
      println(f"[bloomprobe] vec=$vec%-5s $label%-7s needles=$k plain: " +
        f"${plainBytes / 1024}%d KiB read, $plainSec%.2f s; bloom: " +
        f"${bloomBytes / 1024}%d KiB read, $bloomSec%.2f s; bytes ratio " +
        f"${plainBytes.toDouble / math.max(bloomBytes, 1)}%.1fx")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
