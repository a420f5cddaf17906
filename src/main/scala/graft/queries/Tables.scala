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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` it arrives
    * as nanos-since-epoch LongType and is converted here to a microsecond
    * timestamp (truncation — matching DuckDB's own ns->us read behavior).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val df = read(s, dir, "events")
    // `div` = integer division: `/` on longs is double division in Spark,
    // which both rounds (vs truncate) and loses precision above 2^53.
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}

/** A declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL run by the driver's correctness gate.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
