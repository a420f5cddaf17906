package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-vs-rest linear-classifier scoring as ONE native Catalyst
  * expression: all K margins (`fold_j(w_cj * x_j) + b_c`, ascending-j
  * serial double fold — the exact arithmetic of
  * [[graft.operators.LangIdTrained.train]] and its SQL replay) plus the
  * argmax, in a single codegen'd loop over a broadcast-referenced
  * `double[K][dim]` weight matrix.
  *
  * Why an Expression and not K staged dot-product Columns: the staged
  * form is K separate 64-double LITERAL trees. The moment a consumer
  * FILTERS on the prediction (the curation-gate shape), predicate
  * pushdown substitutes the whole staged chain into the filter
  * condition — re-inlining the feature kernel and all K dots per
  * reference — and at K=32 the re-expanded conditions exhaust multi-GB
  * heaps in janino before a single row moves. Here the weights live in
  * one `ctx.addReferenceObj` matrix and the generated code is two `for`
  * loops, CONSTANT size in K and dim: pushdown can copy it anywhere for
  * free. This is the same composition-fails threshold that produced
  * [[DotProduct]] and [[CharTrigramEmbed]].
  *
  * Output: `struct<lang_pred: string, margin_best: double>`.
  * Tie rule: strict `>` keeps the FIRST class index achieving the
  * maximum — the oracle's `ORDER BY m DESC, c ASC` top-1. A NULL or
  * wrong-width vector yields NULL; a NaN margin (impossible from finite
  * features, but corrupt inputs exist) yields NULL rather than a
  * silently-arbitrary label.
  */
case class MulticlassArgmax(child: Expression,
    weights: Seq[Seq[Double]], biases: Seq[Double],
    labels: Seq[String]) extends UnaryExpression {

  require(weights.nonEmpty && weights.length == biases.length &&
    weights.length == labels.length,
    "weights/biases/labels must agree on the class count")
  require(weights.forall(_.length == weights.head.length),
    "every class needs the same weight width")

  // model params are Seqs so case-class equals/hashCode compare by
  // CONTENT — Catalyst canonicalization / common-subexpression
  // elimination unify two structurally identical argmax columns (JVM
  // arrays compare by reference and would silently evaluate twice)
  private val dim: Int = weights.head.length
  // converted once for the hot loops; referenced from both eval paths
  @transient private lazy val wArr: Array[Array[Double]] =
    weights.map(_.toArray).toArray
  @transient private lazy val bArr: Array[Double] = biases.toArray
  @transient private lazy val utf8Labels: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType),
    StructField("margin_best", DoubleType)))

  override def nullable: Boolean = true

  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var bi = -1
    var bm = 0.0
    var c = 0
    while (c < wArr.length) {
      val w = wArr(c)
      var s = 0.0
      var j = 0
      while (j < dim) { s += w(j) * x.getDouble(j); j += 1 }
      val m = s + bArr(c)
      if (java.lang.Double.isNaN(m)) return null
      if (bi < 0 || m > bm) { bi = c; bm = m }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](utf8Labels(bi), bm))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val wRef = ctx.addReferenceObj("amxWeights", wArr, "double[][]")
      val bRef = ctx.addReferenceObj("amxBiases", bArr, "double[]")
      val lRef = ctx.addReferenceObj("amxLabels", utf8Labels,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val bi = ctx.freshName("bi")
      val bm = ctx.freshName("bm")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val nan = ctx.freshName("nan")
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bi = -1;
         |  double $bm = 0.0;
         |  boolean $nan = false;
         |  for (int $c = 0; $c < ${weights.length}; $c++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += $wRef[$c][$j] * $x.getDouble($j);
         |    }
         |    double $m = $s + $bRef[$c];
         |    if (Double.isNaN($m)) { $nan = true; break; }
         |    if ($bi < 0 || $m > $bm) { $bi = $c; $bm = $m; }
         |  }
         |  if ($nan) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[] { $lRef[$bi], Double.valueOf($bm) });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "graft_multiclass_argmax"
}

object MulticlassArgmax {
  /** Column entry point; float vectors cast here (the expression is
    * strict about its input type). */
  def argmax(vec: Column, weights: Seq[Seq[Double]], biases: Seq[Double],
      labels: Seq[String]): Column =
    Bridge.column(MulticlassArgmax(
      Bridge.expression(vec.cast("array<double>")),
      weights.map(_.toVector).toVector, biases.toVector, labels.toVector))
}
