package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming curation gate — the ingest-time composite every training
  * pipeline runs on arriving documents: PII masking + quality rules
  * (stateless, streaming-safe ANYWHERE: pure column algebra attaches to
  * a stream like any map) plus the arrival-ordered near-dup check
  * ([[StreamDedup.nearDupHits]] — the stateful half, streaming-proven in
  * StreamingSpec).
  *
  * Deployment shapes:
  *  - [[gate]] is the stateless half alone — attach it to any stream.
  *  - [[curate]] is the full composite in BATCH execution (the oracle
  *    surface, q_stream_curation): in a live stream the dup hits are a
  *    separate stateful stream and the gate joins them at the sink (a
  *    stream-stream join on the doc id under the arrival watermark) —
  *    the batch execution computes the identical function because
  *    nearDupHits' batch mode IS its stream semantics on the
  *    arrival-ordered frame (StreamingSpec's batch == stream law).
  *
  * Output: `(idCol, quality_pass, is_dup, n_pii, kept)` with
  * `kept = quality_pass AND NOT is_dup`.
  */
object StreamCurate {

  /** the stateless half: PII counts + Gopher quality booleans (on the
    * RAW text — masking must not change what quality sees) */
  def gate(docs: DataFrame, textCol: String,
      cfg: TextAnalysis.GopherConfig): DataFrame = {
    val scrubbed = TextAnalysis.piiScrub(docs, textCol)
    TextAnalysis.gopherRules(scrubbed, col(textCol), cfg)
      .withColumn("n_pii",
        (col("n_emails") + col("n_ips") + col("n_phones")).cast("long"))
  }

  /** the full arrival-ordered composite (batch execution; see scaladoc) */
  def curate(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, threshold: Double,
      cfg: TextAnalysis.GopherConfig = TextAnalysis.GopherConfig(),
      md5Mode: Boolean = false): DataFrame = {
    val dupIds = StreamDedup
      .nearDupHits(docs, idCol, tsCol, textCol,
        threshold = threshold, md5Mode = md5Mode)
      .select(col(idCol)).distinct()
      .withColumn("__dup", lit(true))
    gate(docs, textCol, cfg)
      .join(dupIds, Seq(idCol), "left")
      .select(col(idCol), col("quality_pass"),
        coalesce(col("__dup"), lit(false)).as("is_dup"),
        col("n_pii"),
        (col("quality_pass") &&
          !coalesce(col("__dup"), lit(false))).as("kept"))
  }
}
