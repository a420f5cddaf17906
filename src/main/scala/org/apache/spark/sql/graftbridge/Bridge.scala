package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql]-visibility bridge: Column <-> catalyst Expression
  * conversion for custom native expressions. Spark 4 made the direct
  * `new Column(expr)` constructor and `ExpressionUtils` sql-private; a
  * one-file bridge package is the standard extension-library technique.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan — e.g. a custom operator node — as a
    * DataFrame on the given session.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a function builder into an EXISTING session's registry
    * (SparkSessionExtensions only applies at session construction).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Release the executor blocks behind a `localCheckpoint`-ed Dataset.
    * A checkpointed Dataset is a `LogicalRDD` over a persisted internal
    * RDD; `Dataset.unpersist` does not reach it (it only touches the
    * cacheManager), so iterative algorithms that checkpoint per iteration
    * need this to free the previous iteration's blocks deterministically
    * instead of waiting for the ContextCleaner's GC-driven release.
    * The Dataset must not be used again afterwards (its lineage was cut).
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** The reliable-checkpoint file paths (if any) behind a `checkpoint`-ed
    * Dataset — `unpersistCheckpoint` cannot release those (the data lives
    * in files, not blocks); callers delete them explicitly.
    */
  def checkpointFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getCheckpointFile
    }.flatten
}
