package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric array columns
  * (`array<float>` or `array<double>` on each side independently).
  *
  * The declarative form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) runs on
  * Catalyst's interpreted higher-order-function path — per-element lambda
  * dispatch on every row. This expression emits a tight primitive loop
  * inside whole-stage codegen instead (SURVEY.md §7.3: custom Catalyst work
  * reserved for the extension hot paths).
  *
  * Semantics are IDENTICAL to the HOF form: a sequential left-to-right fold
  * in double of `(double)a(i) * (double)b(i)` — the same IEEE operation
  * order, so results hash-match the DuckDB oracle exactly like the HOF
  * implementation did. Mixed float×double support exists for weighted
  * projections against driver-computed constant planes (q42's hyperplane
  * signatures), where rounding the weights to float would change results.
  * Length = min of the two arrays (inputs are fixed-dim in practice).
  * Lives under org.apache.spark.sql because the expression plumbing
  * (ExpressionUtils) is private[sql]; the engine-facing API is
  * graft.functions.vec.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  private def getter(e: Expression): (ArrayData, Int) => Double =
    if (elemType(e).contains(DoubleType)) (a, i) => a.getDouble(i)
    else (a, i) => a.getFloat(i).toDouble

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = getter(left); val gy = getter(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += gx(x, i) * gy(y, i)
      i += 1
    }
    acc
  }

  private def genGet(e: Expression, arr: String, i: String): String =
    if (elemType(e).contains(DoubleType)) s"$arr.getDouble($i)"
    else s"(double) $arr.getFloat($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(left, x, i)} * ${genGet(right, y, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

object VectorDot {
  /** Column ↔ Expression bridge (private[sql] plumbing) */
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
