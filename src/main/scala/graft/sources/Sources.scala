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

  /** The CSV NULL sentinel shared by [[csv]] and [[writeCsv]]: with the
    * default (empty-string) sentinel, an empty string value and a NULL
    * are indistinguishable on disk and every "" silently reads back as
    * NULL. The writer emits this marker for NULLs; the reader maps it
    * back — "" survives as "" (an unquoted empty field reads as empty
    * with emptyValue below). */
  private val NullMarker = "\\N"

  /** CSV with declared schema. `enforceSchema=false` makes Spark check the
    * file's header NAMES against the declared schema and fail on mismatch
    * (the default silently drops the header and maps columns by position —
    * a reordered file would silently mismap every column). `multiLine`
    * lets the reader parse quoted embedded newlines THIS MODULE'S OWN
    * writer produces (without it, a value containing \n splits into two
    * unparseable records); the cost is per-file (non-splittable) reads —
    * acceptable because CSV is the interchange format here, not the
    * at-scale layout (parquet is).
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false") // header names must match the schema
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .option("multiLine", "true")
      .option("nullValue", NullMarker)
      .option("emptyValue", "")
      .csv(path)

  /** Newline-delimited JSON with declared schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** CSV sink with round-trip-faithful options: the WRITER (unlike the
    * reader) trims leading/trailing whitespace by default, which corrupts
    * padded string values on the way out — disabled here. NULLs are
    * written as the explicit [[NullMarker]] so the reader can tell them
    * from genuine empty strings (the default empty-string sentinel makes
    * "" read back as NULL).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", NullMarker)
      .option("emptyValue", "\"\"")
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
