package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** A filter predicate PINNED ABOVE an `EventTimeWatermark` node: returns
  * `pred` unchanged, but carries the event-time column as a child so the
  * expression's `references` include the watermark attribute —
  * `PushPredicateThroughNonJoin` refuses to push any predicate that
  * references the watermark attribute through the node, and no optimizer
  * rule simplifies an expression it does not know, so the anchoring
  * survives EVERY schema. The r17 review flagged the previous CASE WHEN
  * formulation — `when(ts.isNull, false).otherwise(pred)` — which folds
  * to bare `pred` whenever Catalyst proves the event-time column
  * non-nullable (NullPropagation + SimplifyConditionals); the fold then
  * pushes the predicate below the watermark node where it constant-
  * folds the heartbeat branch to `Filter false`, re-freezing the global
  * watermark the guard exists to protect. The A/B showed the fold is
  * blocked today only by an ACCIDENT (the hits-branch encoder's
  * nullable Timestamp field keeps the union column nullable) — this
  * expression replaces the accident with a structural guarantee.
  *
  * Semantics: `anchor(pred, ts)` = `pred`, with SQL null-intolerance on
  * BOTH children (a null ts row is dropped — such rows carry no event
  * time and must not reach watermark-governed state anyway). One
  * codegen'd pass-through; the event-time child costs a column read.
  */
case class EventTimeAnchor(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case BooleanType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a boolean predicate, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = true

  // never constant-folded, whatever the children claim: the whole point
  // is surviving optimization untouched
  override def foldable: Boolean = false

  override def nullSafeEval(predValue: Any, ts: Any): Any = predValue

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, _) => s"${ev.value} = $p;")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_event_time_anchor"
}

object EventTimeAnchor {
  /** `pred`, structurally anchored to `eventTime`'s watermark node. */
  def anchor(pred: Column, eventTime: Column): Column =
    Bridge.column(EventTimeAnchor(
      Bridge.expression(pred), Bridge.expression(eventTime)))
}
