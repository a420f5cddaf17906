package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.queries.{Differential, Tables}

/** Prints the measured xx-vs-md5 agreement stats behind the q_*_xx
  * differential certificates (Differential's scaladoc): run before
  * changing a pinned bound, so bounds always trace to a measurement.
  *
  *   sbt "runMain graft.tools.DiffProbe /root/testdata/sf0.01"
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)

    println(s"== minhash ($dir)")
    Differential.pairStats(docs, "doc_id", "text",
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5),
      Dedup.minhashNearDupsMd5(docs, "doc_id", "text", threshold = 0.5))
      .show(false)

    println("== simhash")
    Differential.pairStats(docs, "doc_id", "text",
      Dedup.simhashCandidates(docs, "doc_id", "text")
        .filter(col("hamming") <= 3),
      Dedup.simhashCandidatesMd5(docs, "doc_id", "text")
        .filter(col("hamming") <= 3))
      .show(false)

    println("== embed")
    val embXx = Dedup.stage(TextAnalysis.hashEmbed(
      docs, "doc_id", "text", dim = 256, n = 2))
    val embMd5 = Dedup.stage(TextAnalysis.hashEmbedMd5(
      docs, "doc_id", "text", dim = 256, n = 2))
    Differential.pairStats(docs, "doc_id", "text",
      Dedup.cosineNearDups(embXx, "doc_id", "vec", dim = 256, threshold = 0.6),
      Dedup.cosineNearDups(embMd5, "doc_id", "vec", dim = 256, threshold = 0.6))
      .show(false)

    println("== stream")
    val withTs = docs.withColumn("ts",
      timestamp_micros((col("doc_id") + 10000L) * 1000000L))
    val thr = graft.queries.PipelineQueries.streamNearDupThreshold
    Differential.docStats(docs, "doc_id", "text",
      graft.streaming.StreamDedup.nearDupHits(withTs, "doc_id", "ts", "text",
        threshold = thr),
      graft.streaming.StreamDedup.nearDupHits(withTs, "doc_id", "ts", "text",
        threshold = thr, md5Mode = true))
      .show(false)

    spark.stop()
  }
}
