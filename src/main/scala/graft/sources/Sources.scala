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

  /** CSV with declared schema; header line expected and validated against
    * the schema by position.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .csv(path)

  /** Newline-delimited JSON with declared schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
