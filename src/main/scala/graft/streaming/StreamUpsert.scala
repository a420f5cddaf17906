package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming changelog materialization: the streaming mirror of the batch
  * [[graft.operators.ScaleOps.mergeLatest]] CDC merge. Per-key state holds
  * the highest-version row seen so far; every batch emits the current
  * latest row for each key the batch touched (Update output mode — the
  * sink overwrites per key, exactly a materialized view maintained from a
  * CDC feed).
  *
  * `version` must be unique per key (a CDC log sequence number, an event
  * id): within a batch rows are folded in ascending version order, so a
  * batch containing several versions of one key resolves to the highest
  * exactly as replaying them one batch at a time would — batch boundaries
  * never change the materialized result (spec-verified). Tombstones ride
  * through as `deleted = true` rows: the state REMEMBERS the tombstone
  * (so a late lower-version update cannot resurrect the key) and the
  * consumer filters them from the materialized table.
  *
  * State per key is one (version, value, deleted) record — bytes per key,
  * the minimum any keyed materialization can hold. Batch execution (state
  * starts empty, one invocation per key) gives identical rows to the
  * windowed latest-per-key query, which is how the DuckDB oracle states
  * it (`q_stream_upsert`).
  */
object StreamUpsert {

  final case class Change(key: Long, version: Long, value: Double,
      deleted: Boolean)
  final case class KeyState(version: Long, value: Double, deleted: Boolean)
  final case class Latest(key: Long, version: Long, value: Double,
      deleted: Boolean)

  def latestState(changes: Dataset[Change]): Dataset[Latest] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[KeyState, Latest](GroupStateTimeout.NoTimeout)(
        (key, rows, state) => {
          var cur =
            if (state.exists) state.get
            else KeyState(Long.MinValue, 0.0d, deleted = false)
          for (r <- rows.toSeq.sortBy(_.version))
            if (r.version >= cur.version)
              cur = KeyState(r.version, r.value, r.deleted)
          state.update(cur)
          Latest(key, cur.version, cur.value, cur.deleted)
        })
  }
}
