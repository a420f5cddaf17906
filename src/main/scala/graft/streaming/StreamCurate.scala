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
  *  - [[curateStream]] is the full composite as ONE streaming query:
  *    gate + stateful dup hits tied by a stream-stream left outer join
  *    on the doc id under the arrival watermark.
  *  - [[curate]] is the same composite in BATCH execution (the oracle
  *    surface, q_stream_curation) — the batch execution computes the
  *    identical function because nearDupHits' batch mode IS its stream
  *    semantics on the arrival-ordered frame (StreamingSpec's batch ==
  *    stream law), and StreamCurateSpec pins curateStream == curate on
  *    the same data.
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

  /** The full composite AS ONE STREAMING QUERY — the deployment shape
    * the scaladoc above describes, executed: the stateless gate and the
    * stateful near-dup hits are two branches over the same source, tied
    * back together by a stream-stream LEFT OUTER join on the document id
    * under the arrival watermark. Three stateful operators chain in one
    * append-mode query:
    *
    *  1. [[StreamDedup.nearDupHits]] (flatMapGroupsWithState) — emits
    *     one hit per detecting bucket, each carrying the arriving
    *     document's own event time (so a hit is never older than the
    *     watermark that admitted its document: late rows are dropped
    *     BEFORE the state op, and an admitted row's ts is on-time by
    *     construction — the chain is watermark-sound);
    *  2. `dropDuplicatesWithinWatermark` — collapses multi-bucket hits
    *     to one row per duplicate document, state bounded by the
    *     horizon;
    *  3. the outer join — `doc_id` equality plus a two-sided range pin
    *     on the event times (a hit's ts IS its document's ts, so the
    *     range is exact equality; the two inequalities give the join
    *     state-cleanup bounds in both directions). A document with no
    *     hit emits with `is_dup = false` once the watermark passes its
    *     ts — an unmatched row is only provably dup-free when no
    *     on-time hit can still arrive.
    *
    * Output equals [[curate]]'s batch frame on the same (arrival-ordered)
    * data — StreamCurateSpec pins the equality and CheckpointRecoverySpec
    * pins the composite across a mid-stream stop/restart.
    */
  /** Starting [[curateStream]] trips Spark's STATIC chained-stateful
    * correctness check ("stateful operation which can emit rows older
    * than the current watermark"): the checker cannot see what the
    * flatMapGroupsWithState emits, so it assumes the worst. This chain
    * is watermark-sound by construction — a hit row carries the ARRIVING
    * document's own event time, late rows are dropped before the state
    * op, so an emitted hit's ts is always >= the watermark that admitted
    * its document and downstream state ops never see it as late. Scope
    * the query START (where the check runs) under this helper; the
    * previous setting is restored afterwards, so the conservative check
    * stays armed for every other query on the session. */
  def withStatefulChainAllowed[T](
      spark: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val key =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def curateStream(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, threshold: Double,
      cfg: TextAnalysis.GopherConfig = TextAnalysis.GopherConfig(),
      horizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    require(docs.isStreaming,
      "curateStream is the live deployment shape; batch frames use curate")
    // flatMapGroupsWithState output loses the event-time attribute, so
    // the hits branch must re-assign its watermark — but a watermark
    // node advances from the rows that FLOW THROUGH IT, and hits only
    // flow when duplicates arrive: assigned on the hits alone it stalls
    // at its epoch whenever the stream is duplicate-free, pinning the
    // query's GLOBAL (min-of-nodes) watermark to zero and freezing every
    // downstream state eviction and outer-join emission. The fix is a
    // stateless heartbeat branch — every arriving document's (id, ts)
    // unioned in BELOW the watermark node and filtered back out ABOVE
    // it — so this node tracks the true arrival time whether or not any
    // document is a duplicate. The heartbeat is a narrow projection of
    // the source (no shuffle, no state); the filter prunes it before the
    // dedup shuffle, so at scale it costs one extra scan branch, not
    // state.
    val rawHits = StreamDedup
      .nearDupHits(docs, idCol, tsCol, textCol,
        threshold = threshold, horizonMs = horizonMs)
      .select(col("doc_id").as("__dup_id"), col("ts").as("__dup_ts"),
        lit(true).as("__hit"))
    val heartbeat = docs.select(
      col(idCol).cast("long").as("__dup_id"),
      col(tsCol).as("__dup_ts"), lit(false).as("__hit"))
    // the heartbeat filter MUST reference the event-time column: a plain
    // filter(__hit) is legally pushed through the EventTimeWatermark node
    // and the union by PushPredicateThroughNonJoin (predicates that don't
    // reference the watermark attribute are pushable), where it constant-
    // folds to `Filter false` on the heartbeat branch — starving the
    // watermark node all over again (observed: the physical plan read
    // `Union > Filter false` and the query's watermark froze). The
    // reference must also SURVIVE optimization: a CASE WHEN over
    // __dup_ts (the first fix) folds to bare __hit whenever Catalyst
    // can prove __dup_ts non-nullable — today it happens to never
    // prove it, but ONLY because the hits branch routes through the
    // DupHit encoder whose java.sql.Timestamp field is nullable, an
    // accidental and invisible load-bearing fact (r17 review + A/B).
    // The anchoring is therefore a dedicated opaque expression
    // (EventTimeAnchor: returns __hit, carries __dup_ts in its
    // references, no rule knows how to simplify or split it) — robust
    // against any future encoder or schema change.
    val hits = rawHits.union(heartbeat)
      .withWatermark("__dup_ts", s"$horizonMs milliseconds")
      .filter(graft.functions.EventTimeAnchor.anchor(
        col("__hit"), col("__dup_ts")))
      .dropDuplicatesWithinWatermark("__dup_id")
      .drop("__hit")
    val g = gate(docs, textCol, cfg)
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col("quality_pass"), col("n_pii"))
      .withWatermark("ts", s"$horizonMs milliseconds")
    g.join(hits,
        g("doc_id") === hits("__dup_id") &&
          hits("__dup_ts") >= g("ts") && hits("__dup_ts") <= g("ts"),
        "left_outer")
      .select(col("doc_id").as(idCol), col("quality_pass"),
        col("__dup_id").isNotNull.as("is_dup"), col("n_pii"),
        (col("quality_pass") && col("__dup_id").isNull).as("kept"))
  }

  /** the full arrival-ordered composite (batch execution; see scaladoc) */
  def curate(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, threshold: Double,
      cfg: TextAnalysis.GopherConfig = TextAnalysis.GopherConfig(),
      md5Mode: Boolean = false): DataFrame = {
    // ONE guarded spread feeds both consumers (the near-dup signature
    // pass and the gopher/PII gate) — they read the same canonical
    // exchange (ReuseExchange, the lmPerplexity r20 pattern); unspread,
    // both CPU-dense per-row passes serialized behind the small-SF
    // scan's single split (2.3 task-CPU-s over 14 tasks, r21 noop
    // StageProfile). Both consumers are keyed/per-row — placement-free.
    val src = graft.operators.ScaleOps.spreadCpu(
      docs.select(col(idCol), col(tsCol), col(textCol)))
    // nearDupHits' output id column is always named doc_id (it casts
    // the caller's idCol) — rename back so the join keys on the
    // caller's column name whatever idCol is
    val dupIds = StreamDedup
      .nearDupHits(src, idCol, tsCol, textCol,
        threshold = threshold, md5Mode = md5Mode)
      .select(col("doc_id").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    gate(src, textCol, cfg)
      .join(dupIds, Seq(idCol), "left")
      .select(col(idCol), col("quality_pass"),
        coalesce(col("__dup"), lit(false)).as("is_dup"),
        col("n_pii"),
        (col("quality_pass") &&
          !coalesce(col("__dup"), lit(false))).as("kept"))
  }
}
