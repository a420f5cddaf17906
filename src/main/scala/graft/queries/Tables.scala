package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scratch directory for queries exercising a write-then-read path:
    * rooted at java.io.tmpdir (SPARK_GRAFT_TMP overrides), never a
    * hardcoded checkout location, and keyed by (query, SF dir, pid) —
    * different SFs and concurrent processes can't clobber each other,
    * while repeated reps inside one JVM overwrite the same directory
    * instead of leaking a new one per rep.
    */
  def scratchPath(name: String, dir: String): String = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TMP",
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val sf = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"${base.stripSuffix("/")}/graft-scratch/${name}_${sf}_pid${ProcessHandle.current().pid()}"
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = read(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = read(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = read(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = read(s, dir, "region")
  /** Normalize an events frame's `ts` to a plain TimestampType whatever
    * the parquet file stored — the single ingestion point shared by the
    * batch reader and the streaming source, so the two cannot diverge.
    * Drift history: the driver's generator has produced both
    * TIMESTAMP(NANOS) and TIMESTAMP_MICROS with isAdjustedToUTC=false
    * (read as TIMESTAMP_NTZ).
    *   - LongType: nanos since epoch -> truncate to micros. NOTE: with
    *     the legacy nanosAsLong flag removed (round 10), a true parquet
    *     TIMESTAMP(NANOS) regen fails LOUDLY at read before this branch —
    *     SchemaCanarySpec names the type; the branch remains live for
    *     plain-INT64 `ts` columns (streaming test fixtures write those).
    *     `div` = integer division (`/` on longs is double division in
    *     Spark, which rounds and loses precision above 2^53).
    *   - TIMESTAMP_NTZ: cast to TIMESTAMP. The session timezone is pinned
    *     UTC in every entrypoint, so the cast is the identity on the
    *     stored micros and matches DuckDB's naive-as-UTC epoch_ms/us.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(read(s, dir, "events"))
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}

/** A declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL run by the driver's correctness gate.
  *
  * `verifyFn`, when set, REPLACES `fn` on the correctness surface
  * (SparkEntry.queries / Verify) while Bench keeps timing `fn`. The only
  * rows that use it are the four production-hash measurement twins
  * (q_*_xx): their bench row must time the xxhash64 pipeline ALONE (that
  * wall is the floor-guarded production number), but xxhash64 has no
  * DuckDB twin — so their correctness row is a one-row DIFFERENTIAL
  * certificate ([[Differential]]) that runs the production pipeline AND
  * its md5 twin and emits oracle-checkable agreement facts (twin row
  * count, exact-duplicate ground truth + recall contract, pair-set
  * Jaccard contract). A kernel regression (wrong hashes, broken banding)
  * collapses the agreement and the oracle goes red.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    verifyFn: Option[(SparkSession, String) => DataFrame] = None
)
