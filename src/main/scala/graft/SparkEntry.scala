package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CyclebaneQueries, PipelineQueries, QueryDef, RelationalQueries, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared correctness surface: one entry per implemented
  * operator family from SURVEY.md §2 (reference-surface queries in
  * graft.queries.CyclebaneQueries, [ext] relational in RelationalQueries,
  * [ext] pipeline/text/dedup/similarity/events in PipelineQueries).
  * `oracleSql` carries the DuckDB-equivalent SQL where expressible; hash
  * operators are rows-only and verified in the ScalaTest suites.
  */
object SparkEntry {

  val defs: Seq[QueryDef] =
    CyclebaneQueries.all ++ RelationalQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cb_reduce_all")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. The correctness
    * surface runs `verifyFn` where a row declares one (the four q_*_xx
    * differential certificates — see QueryDef's scaladoc); Bench times
    * the raw `fn`.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.verifyFn.getOrElse(d.fn)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
