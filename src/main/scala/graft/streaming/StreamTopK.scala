package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a per-key Misra-Gries summary maintained in
  * keyed state — the at-ingest form of the batch `HeavyHittersAgg`
  * (functions/Aggregators.scala), for live "top terms / top actors per
  * key" over an event stream without ever holding per-term exact counts.
  *
  * State per key is EXACTLY `k` counters (the Misra-Gries bound), so
  * state size is `keys * k` regardless of stream cardinality; the whole
  * key's state drops once the event-time watermark passes its last
  * activity plus the horizon. Every processed batch emits the key's
  * current summary snapshot `(key, term, est, n_processed)` — consumers
  * read the latest snapshot per key (largest `n_processed` WITHIN the
  * current activity era: `n` restarts from 0 after a watermark eviction,
  * so across an idle gap longer than the horizon the freshest snapshot
  * is the one most recently EMITTED, not the largest-`n` ever — window
  * snapshot reads by emission recency when keys can go idle); the
  * standard guarantee `true_count - est <= n/k` holds at every snapshot.
  * Rows with a NULL term or NULL ts are DROPPED before the fold (a NULL
  * would otherwise kill the whole streaming query inside the sort
  * comparator — defined skip beats stream death).
  *
  * Rows inside one invocation are processed in `(ts, term)` order, so
  * the summary is deterministic for a given micro-batch layout, and a
  * BATCH execution (single invocation per key, state from empty) equals
  * the streaming run whose batches partition the same `(ts, term)`
  * order — both spec-verified against an independent driver reference.
  */
object StreamTopK {

  final case class TermRow(gkey: String, ts: java.sql.Timestamp,
      term: String)
  final case class MgState(terms: Seq[String], counts: Seq[Long],
      n: Long, lastMs: Long)
  final case class TopHit(gkey: String, term: String, est: Long, n: Long)

  /** One sequential Misra-Gries step: existing term +1; room for a new
    * counter: insert at 1; otherwise all counters -1, zeros evicted. */
  private[streaming] def mgStep(
      terms: Map[String, Long], k: Int, t: String): Map[String, Long] =
    if (terms.contains(t)) terms.updated(t, terms(t) + 1)
    else if (terms.size < k) terms.updated(t, 1L)
    else terms.flatMap { case (w, c) =>
      if (c - 1 > 0) Some(w -> (c - 1)) else None
    }

  def topTerms(df: DataFrame, keyCol: String, tsCol: String,
      termCol: String, k: Int = 10,
      horizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("gkey"), col(tsCol).as("ts"),
        col(termCol).cast("string").as("term"))
      .filter(col("gkey").isNotNull && col("ts").isNotNull &&
        col("term").isNotNull)
      // milliseconds, not seconds: integer division would silently
      // truncate a sub-second horizon to a shorter (possibly zero)
      // watermark than the timeout deadline uses
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[TermRow]
      .groupByKey(_.gkey)
      .flatMapGroupsWithState[MgState, TopHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (key, rows, state) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = if (state.exists) state.get
              else MgState(Vector.empty, Vector.empty, 0L, 0L)
            var terms = st.terms.zip(st.counts).toMap
            var n = st.n
            var lastMs = st.lastMs
            // deterministic order inside the invocation
            rows.toVector.sortBy(r => (r.ts.getTime, r.term)).foreach { r =>
              terms = mgStep(terms, k, r.term)
              n += 1
              lastMs = math.max(lastMs, r.ts.getTime)
            }
            val sorted = terms.toSeq.sortBy { case (w, c) => (-c, w) }
            state.update(MgState(sorted.map(_._1), sorted.map(_._2), n,
              lastMs))
            state.setTimeoutTimestamp(lastMs + horizonMs)
            sorted.iterator.map { case (w, c) => TopHit(key, w, c, n) }
          }
        })
      .toDF("gkey", "term", "est", "n")
  }
}
