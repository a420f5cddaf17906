package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns, with
  * whole-stage codegen.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * allocates an intermediate products array per row and evaluates every
  * lambda step interpreted with boxed elements; this expression compiles
  * to a primitive `for` loop over the two `ArrayData`s — no intermediate
  * array, no boxing, fused into the surrounding generated code. It is the
  * scalar kernel under every similarity operator (cosine top-k, IVF cell
  * assignment, hyperplane LSH bits, near-dup verification), which is
  * exactly where a custom Expression beats composition of built-ins.
  *
  * `array<float>` inputs are cast in the Column wrapper ([[DotProduct.dot]]).
  * Elements are assumed non-null (embedding vectors); a null ARRAY yields
  * null via the standard null-intolerant binary-expression contract.
  * Summation order is ascending-index, identical to the left-fold of the
  * HOF formulation — results are bit-for-bit unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // mismatched dimensions yield null, matching the zip_with/aggregate
    // formulation (null-padded product -> null sum): a wrong-width vector
    // must never produce a plausible similarity score
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Column-level entry point; float arrays are cast to double here (the
    * expression itself is strict about its input type).
    */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}
