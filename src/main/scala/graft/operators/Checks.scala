package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (the expectations/validation pass a
  * production ingest runs before publishing a table): declarative row
  * rules evaluated in ONE scan, plus referential-integrity checks as
  * anti-joins. Reports violation COUNTS (a data-quality dashboard row),
  * not failing rows — at 100 TB the report is KBs while the failing rows
  * can be re-derived with the rule predicate when someone drills in.
  */
object Checks {

  /** Violation counts for named row rules, all from one pass over the
    * frame: `sum(rule violated ? 1 : 0)` per rule inside a single
    * aggregate, unpivoted to `(rule, violations)` long form with
    * `stack()`. A rule evaluating to NULL (e.g. a comparison on a NULL
    * column) counts as a violation — SQL three-valued logic must not let
    * unknowns pass a quality gate silently.
    */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.length == rules.length,
      "rule names must be unique")
    // coalesce: sum() over ZERO rows is NULL — an empty delta partition
    // must report 0 violations, not unknown
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"__r$i")
    }
    // escape backslashes BEFORE quotes: Spark string literals are
    // backslash-escaped, so a rule name like "matches \d+" would
    // otherwise come back silently corrupted ("matches d+")
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) =>
        val esc = name.replace("\\", "\\\\").replace("'", "\\'")
        s"'$esc', __r$i"
      }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${rules.length}, $stackArgs) AS (rule, violations)"))
  }

  /** Referential-integrity violation count: child rows whose non-null
    * `childKey` has no match in `parent`. Anti-join keyed on the FK —
    * broadcast when the parent is dimension-sized, shuffle otherwise
    * (Catalyst's choice); NULL keys are excluded (SQL FK semantics: a
    * null reference is absent, not broken).
    */
  def fkViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as("__pk")).distinct()
    child.filter(col(childKey).isNotNull)
      .join(parentKeys, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
  }
}
