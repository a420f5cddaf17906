package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming long-repeat CANDIDATE census — the ingest-time half of
  * the arbitrary-alignment repeat detector
  * (`graft.operators.Corpus.longRepeats`): as documents arrive, the
  * SAME anchor walk as batch (`Corpus.anchorWalk` — one shared
  * definition, the [[StreamCdc]] discipline, so anchors cannot drift)
  * emits `(s0, seed)` positions; seed-hash-keyed state tracks the
  * FIRST arrival per seed and emits one candidate pair per later
  * arrival up to the batch operator's star cap. The EXTENSION scan —
  * pulling both texts and finding the maximal equal run — is
  * deliberately NOT in the stream: it needs full document text at
  * pair time, which would mean unbounded per-key payload state. The
  * candidates feed the periodic batch extension job
  * (`Corpus.repeatSpansFromAnchors` over the censused pairs), the
  * compaction shape the batch operator already has.
  *
  * State per key is the constant-size record `(first_doc, first_s0,
  * n, last_activity)` — no list grows; hot boilerplate seeds stop
  * emitting pairs past `maxBucket` later-arrivals exactly like the
  * batch bucket cap, so output is rate-bounded too. Watermark timeout
  * reclaims idle keys. The state key is a LONG hash of the seed
  * (never a String on the hot path): xxhash64 in production, the
  * md5-hash64 twin in `md5Mode`; seed content is NOT re-verified here
  * (an 8-byte collision can only fabricate a CANDIDATE — the batch
  * extension step re-reads both texts and verifies equality before
  * any span is cut, so the end-to-end contract matches batch).
  *
  * Batch execution (state empty, one invocation per key, rows sorted
  * by `(ts, doc_id, s0)`) is a pure function of arrival order whose
  * output is expressible DECLARATIVELY — an anchor instance is a
  * candidate iff an earlier arrival of the same seed exists, with the
  * first arrival's `(doc, s0)` attached and arrival rank <= cap + 1 —
  * so the DuckDB oracle replays the anchor chain plus one window
  * (q_stream_repeats). Streaming == batch == declarative replay is
  * pinned in StreamingSpec.
  */
object StreamRepeats {

  final case class AnchorRow(doc_id: Long, ts: java.sql.Timestamp,
      s0: Int, akey: Long)
  final case class SeedState(firstDoc: Long, firstS0: Int, n: Long,
      lastMs: Long)
  final case class RepeatCand(doc_id: Long, ts: java.sql.Timestamp,
      s0: Int, first_doc: Long, first_s0: Int, rk: Long)

  /** Candidate pairs over a (possibly streaming) document frame: one
    * row per anchor instance whose seed was already seen inside the
    * horizon, capped at `maxBucket` later-arrivals per seed —
    * `(doc_id, ts, s0, first_doc, first_s0, rk)` with `rk` the arrival
    * rank (2-based first hit, matching the batch bucket's rank). Same-
    * document seed repeats DO hit (`first_doc == doc_id`); the batch
    * extension job filters them exactly as `longRepeats`' candidate
    * stage does. */
  def repeatCandidates(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, window: Int = 8, divisor: Int = 16,
      seedLen: Int = 16, maxBucket: Int = 8,
      horizonMs: Long = 2L * 3600 * 1000,
      md5Mode: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val streaming = docs.isStreaming
    val w = window
    val d = divisor
    val sl = seedLen
    val g = graft.operators.Corpus.cdcWeights(window).toArray
    val anchors = docs
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(textCol).cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("ts").isNotNull)
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        graft.operators.Corpus.anchorWalk(text, w, d, g, sl)
          .map { case (s0, seed) => (id, ts, s0, seed) }
      }
      .toDF("doc_id", "ts", "s0", "seed")
    val keyed = anchors
      .withColumn("akey",
        if (md5Mode) graft.functions.Md5Hashes.md5Hash64(col("seed"))
        else xxhash64(col("seed")))
      // seed text dropped BEFORE the stateful shuffle (the StreamCdc
      // posture): the census needs only the 8-byte key
      .select("doc_id", "ts", "s0", "akey")
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[AnchorRow]
    keyed
      .groupByKey(_.akey)
      .flatMapGroupsWithState[SeedState, RepeatCand](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_, rows, state) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st =
              if (state.exists) state.get else SeedState(0L, 0, 0L, 0L)
            var firstDoc = st.firstDoc
            var firstS0 = st.firstS0
            var n = st.n
            var lastMs = st.lastMs
            val out = Vector.newBuilder[RepeatCand]
            for (r <- rows.toSeq.sortBy(x => (x.ts.getTime, x.doc_id, x.s0))) {
              lastMs = math.max(lastMs, r.ts.getTime)
              if (n == 0L) { firstDoc = r.doc_id; firstS0 = r.s0 }
              else if (n <= maxBucket)
                out += RepeatCand(r.doc_id, r.ts, r.s0, firstDoc,
                  firstS0, n + 1)
              n += 1L
            }
            state.update(SeedState(firstDoc, firstS0, n, lastMs))
            if (streaming)
              state.setTimeoutTimestamp(math.max(lastMs + horizonMs,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
        })
      .toDF()
  }
}
