package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Data-preparation operators: missing-value imputation and outlier
  * flagging, both engine-reproducible (decimal-exact moments — a plain
  * `avg`/`stddev` over doubles is accumulation-order dependent and can
  * never hash-match another engine or even a different partitioning).
  */
object Prep {

  /** Fill NULLs in `valueCol` with the per-group mean of the non-null
    * values: one aggregation over the groups (map-side partials), means
    * broadcast back onto the rows. Groups whose values are ALL null keep
    * their nulls (no global fallback — silently inventing a value across
    * strata is how quality bugs hide); chain a second pass with broader
    * groups if a fallback is wanted. Output: input + `<valueCol>_filled`.
    */
  def imputeWithGroupMean(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(!df.columns.contains("__mu"),
      "input must not already contain __mu")
    val means = df.groupBy(groupCols.map(col): _*)
      .agg(davg(col(valueCol)).as("__mu"))
    val (keyed, cond) = statsSide(df, means, groupCols)
    df.join(broadcast(keyed), cond, "inner")
      .select(df.columns.map(df(_)) :+
        coalesce(df(valueCol), col("__mu")).as(s"${valueCol}_filled"): _*)
  }

  /** Per-group z-scores from decimal-exact moments: mean = dsum(x)/n,
    * variance = (dsum(x^2) - dsum(x)^2/n) / (n-1) — every aggregate is an
    * order-independent decimal sum, so the scores are identical at any
    * parallelism and in any engine computing the same formula. The score
    * is rounded to 6 decimals (`z_r`) so downstream threshold comparisons
    * are boundary-stable across engines. Single-member or zero-variance
    * groups get NULL scores (no outlier can be defined there).
    *
    * Output: input + `z_r`. Use `abs(col("z_r")) > z` to flag.
    */
  def zScores(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val reserved = Seq("__n", "__s", "__s2").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input must not already contain ${reserved.mkString(", ")}")
    val x = col(valueCol)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(x).as("__n"), dsum(x).as("__s"), dsum(x * x).as("__s2"))
    val (keyed, cond) = statsSide(df, stats, groupCols)
    df.join(broadcast(keyed), cond, "inner")
      .select(df.columns.map(df(_)) :+ {
        val vx = df(valueCol)
        val n = col("__n").cast("double")
        val mu = col("__s") / n
        val variance = (col("__s2") - col("__s") * col("__s") / n) / (n - 1)
        when(col("__n") > 1 && variance > 0,
          round((vx - mu) / sqrt(variance), 6)).as("z_r")
      }: _*)
  }

  /** Prepare a per-group stats frame for joining back onto its own source:
    * group-key columns are re-aliased to fresh names (fresh attribute ids —
    * grouping keys keep the source's ids through the Aggregate, so a direct
    * self-join condition would be ambiguous) and the join condition is a
    * `<=>` conjunction, NOT plain equality: groupBy puts NULL keys in their
    * own group, and an equi-join would silently drop those rows from the
    * output, breaking the "input + extra column" contract.
    */
  private def statsSide(df: DataFrame, stats: DataFrame,
      groupCols: Seq[String]): (DataFrame, Column) = {
    val statCols = stats.columns.filterNot(groupCols.contains)
    val keyed = stats.select(
      groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__k$i") } ++
        statCols.map(col): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => df(c) <=> keyed(s"__k$i") }
      .reduce(_ && _)
    (keyed, cond)
  }
}
