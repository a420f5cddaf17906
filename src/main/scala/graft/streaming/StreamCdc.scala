package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming content-defined-chunking dedup — the INGEST-TIME shape of
  * the batch CDC census (`graft.operators.Corpus.cdcChunks` /
  * q_doc_cdc): as documents arrive, each is chunked at content-defined
  * boundaries (the SAME rolling-hash walk as batch — one shared
  * definition, `Corpus.chunkWalk`, so boundaries cannot drift) and every
  * chunk is checked against chunk-hash-keyed state within the event-time
  * horizon. A chunk whose content was already seen emits a hit against
  * the FIRST arrival; the per-key state is a constant-size record
  * `(first_doc, count, last_activity)` — unlike the near-dup buckets no
  * list grows, so state is `O(distinct chunks in horizon)` with no
  * per-key cap needed, and the watermark timeout reclaims idle keys
  * (the StreamDedup posture).
  *
  * Batch execution (state starts empty, one invocation per key, rows
  * sorted by `(ts, doc_id, cidx)`) is a pure function of arrival order
  * whose output is expressible DECLARATIVELY — a chunk instance is a hit
  * iff an earlier arrival of the same content exists, with
  * `first_doc` = the first arrival's doc and `n_prev` = its arrival
  * rank − 1 — so the DuckDB oracle replays chunking (the shared CDC
  * CTE chain) plus one window (q_stream_cdc). Streaming == batch ==
  * declarative replay is pinned in StreamingSpec; checkpoint stop/
  * restart exactly-once in CheckpointRecoverySpec.
  *
  * The state key is a LONG hash of the chunk content (the StreamDedup
  * bucket-key lesson: never a String state key on the hot path):
  * xxhash64 in production, the md5-hash64 twin in `md5Mode` — key
  * EQUALITY is all dedup needs; the oracle groups on chunk content
  * itself, hash collisions being the md5 twins' accepted philosophy.
  * Rows with NULL id/ts are DROPPED (defined skip); null/empty text
  * emits no chunks, exactly like batch.
  */
object StreamCdc {

  final case class ChunkRow(doc_id: Long, ts: java.sql.Timestamp,
      cidx: Int, ckey: Long)
  final case class ChunkState(firstDoc: Long, n: Long, lastMs: Long)
  final case class CdcHit(doc_id: Long, ts: java.sql.Timestamp,
      cidx: Int, first_doc: Long, n_prev: Long)

  /** Per-chunk duplicate hits over a (possibly streaming) document
    * frame: output one row per chunk instance whose content was already
    * seen inside the horizon — `(doc_id, ts, cidx, first_doc, n_prev)`.
    * Same-document repeats DO hit (`first_doc == doc_id` then); filter
    * `first_doc =!= doc_id` for the cross-document boilerplate view. */
  def dupChunkHits(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, window: Int = 8, divisor: Int = 32,
      horizonMs: Long = 2L * 3600 * 1000,
      md5Mode: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val streaming = docs.isStreaming
    val w = window
    val d = divisor
    val g = graft.operators.Corpus.cdcWeights(window).toArray
    val chunks = docs
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(textCol).cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("ts").isNotNull)
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        graft.operators.Corpus.chunkWalk(text, w, d, g)
          .map { case (idx, chunk, _) => (id, ts, idx, chunk) }
      }
      .toDF("doc_id", "ts", "cidx", "chunk")
    val keyed = chunks
      .withColumn("ckey",
        if (md5Mode) graft.functions.Md5Hashes.md5Hash64(col("chunk"))
        else xxhash64(col("chunk")))
      // chunk text dropped BEFORE the stateful shuffle: the state fold
      // needs only the 8-byte key
      .select("doc_id", "ts", "cidx", "ckey")
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[ChunkRow]
    keyed
      .groupByKey(_.ckey)
      .flatMapGroupsWithState[ChunkState, CdcHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (_, rows, state) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = if (state.exists) state.get else ChunkState(0L, 0L, 0L)
            var firstDoc = st.firstDoc
            var n = st.n
            var lastMs = st.lastMs
            val hits = Vector.newBuilder[CdcHit]
            for (r <- rows.toSeq.sortBy(x => (x.ts.getTime, x.doc_id, x.cidx))) {
              lastMs = math.max(lastMs, r.ts.getTime)
              if (n == 0L) firstDoc = r.doc_id
              else hits += CdcHit(r.doc_id, r.ts, r.cidx, firstDoc, n)
              n += 1L
            }
            state.update(ChunkState(firstDoc, n, lastMs))
            if (streaming)
              state.setTimeoutTimestamp(math.max(lastMs + horizonMs,
                state.getCurrentWatermarkMs() + 1))
            hits.result().iterator
          }
        })
      .toDF()
  }
}
