package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks beyond parquet. Schemas are always EXPLICIT: schema
  * inference reads the data twice (a full extra pass at 100 TB) and can
  * silently change types between runs — a pipeline's contract should be
  * declared, not sampled. Readers return plain DataFrames so everything
  * composes with the rest of the engine.
  */
object Sources {

  /** CSV with declared schema. `enforceSchema=false` makes Spark check the
    * file's header NAMES against the declared schema and fail on mismatch
    * (the default silently drops the header and maps columns by position —
    * a reordered file would silently mismap every column).
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false") // header names must match the schema
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .csv(path)

  /** Newline-delimited JSON with declared schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** CSV sink with round-trip-faithful options: the WRITER (unlike the
    * reader) trims leading/trailing whitespace by default, which corrupts
    * padded string values on the way out — disabled here.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC with declared schema — the columnar alternative when a lakehouse
    * standardizes on ORC instead of parquet. Same posture: explicit
    * schema (no inference pass), full predicate/column pushdown through
    * the native vectorized reader.
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
