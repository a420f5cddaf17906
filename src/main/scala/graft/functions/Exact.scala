package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent floating-point aggregates.
  *
  * A plain `sum(double)` depends on accumulation order, which differs
  * between engines and between runs at different parallelism — it can never
  * hash-match an oracle, and at 1000-executor scale it isn't even stable
  * run-to-run. Summing via decimal is exact and associative: the per-row
  * double->decimal rounding is deterministic and engine-independent, the
  * decimal sum is exact, and the single final decimal->double cast is
  * IEEE-deterministic. DuckDB mirror:
  * `CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)`.
  */
object Exact {

  /** Exact (order-independent) sum of a double column. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(${21 + scale},$scale)")).cast("double")

  /** Exact mean: exact sum (cast to double) divided by count — one
    * deterministic double division, matching DuckDB's decimal/int
    * promotion-to-double semantics.
    */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(${21 + scale},$scale)")).cast("double") / count(c)

  /** SQL-text forms for oracle queries. */
  def dsumSql(e: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL(${21 + scale},$scale))) AS DOUBLE)"

  def davgSql(e: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL(${21 + scale},$scale))) AS DOUBLE) / COUNT($e)"
}
