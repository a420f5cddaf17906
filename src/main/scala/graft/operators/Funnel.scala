package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis (MATCH_RECOGNIZE-lite): how deep into an
  * ordered step sequence (view -> click -> purchase, ...) each user got,
  * where steps must occur in order but need not be adjacent.
  *
  * Scale shape: ONE shuffle keyed on the user; each user's events are
  * collected, sorted, and folded by a higher-order `aggregate` expression
  * (pure column algebra inside codegen — no UDF, no per-user driver
  * work). The fold is a single left-to-right pass advancing a stage
  * counter, so a user's cost is linear in their event count; the per-user
  * event list is the standard sessionization working set (bounded by
  * individual activity, not corpus size). The funnel report is
  * steps-sized.
  */
object Funnel {

  /** Deepest step index (0 = none, steps.length = completed) per key,
    * ordering events by `orderCol` (use a unique monotone id; ties in a
    * raw timestamp make "order" ambiguous). Output: (key, deepest).
    */
  def deepestStep(events: DataFrame, keyCol: String, orderCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepsLit: Column = array(steps.map(lit): _*)
    events
      .select(col(keyCol).as("key"),
        struct(col(orderCol).as("o"), col(typeCol).as("t")).as("e"))
      .groupBy("key")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("key"),
        aggregate(col("es"), lit(0),
          (acc, e) => when(
            acc < steps.length &&
              e.getField("t") === element_at(stepsLit, acc + 1),
            acc + 1).otherwise(acc)).as("deepest"))
  }

  /** Time-bounded deepest step: like [[deepestStep]], but steps 2..N only
    * count if they occur within `window` of the step-1 match — the form
    * real funnel analyses use ("purchased within 7 days of first view").
    * The fold's accumulator carries (depth, step-1 order value); the
    * anchor is GREEDY (the first step-1 event in order — a later re-entry
    * is not re-anchored, matching the unwindowed fold's greedy advance).
    * `orderCol` must be numeric here (e.g. `unix_micros(ts)`) with
    * `window` in the same units; unique per key, or tie order follows the
    * (order, type) struct sort. Output: (key, deepest).
    */
  def deepestStepWindowed(events: DataFrame, keyCol: String,
      orderCol: Column, typeCol: String, steps: Seq[String],
      window: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(window > 0, "window must be positive")
    val stepsLit: Column = array(steps.map(lit): _*)
    events
      .select(col(keyCol).as("key"),
        struct(orderCol.cast("long").as("o"), col(typeCol).as("t")).as("e"))
      .groupBy("key")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("key"),
        aggregate(col("es"),
          struct(lit(0).as("d"), lit(0L).as("o1")),
          (acc, e) => {
            val d = acc.getField("d")
            val o1 = acc.getField("o1")
            val starts = d === 0 && e.getField("t") === element_at(stepsLit, 1)
            val advances = d > 0 && d < steps.length &&
              e.getField("t") === element_at(stepsLit, d + 1) &&
              e.getField("o") <= o1 + lit(window)
            when(starts, struct(lit(1).as("d"), e.getField("o").as("o1")))
              .when(advances, struct((d + 1).as("d"), o1.as("o1")))
              .otherwise(acc)
          }).getField("d").as("deepest"))
  }

  /** Funnel report: for each step, how many keys reached AT LEAST that
    * step (the classic conversion table). Output: (step, step_name,
    * n_keys), steps-sized.
    */
  def report(events: DataFrame, keyCol: String, orderCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    reportFrom(deepestStep(events, keyCol, orderCol, typeCol, steps), steps)

  /** Conversion table from any (key, deepest) frame — [[deepestStep]] or
    * [[deepestStepWindowed]] output. Output: (step, step_name, n_keys),
    * steps-sized.
    */
  def reportFrom(deepest: DataFrame, steps: Seq[String]): DataFrame = {
    val perDepth = deepest.groupBy("deepest")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val spark = deepest.sparkSession
    import spark.implicits._
    // cumulative from the deepest end: reached(k) = sum_{d >= k} n(d) —
    // driver arithmetic over a steps-sized frame, never data-sized
    steps.indices.map { i =>
      val k = i + 1
      (k, steps(i), perDepth.collect { case (d, n) if d >= k => n }.sum)
    }.toDF("step", "step_name", "n_keys")
  }
}
