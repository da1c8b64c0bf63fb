package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
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
  * implementation did. Length = min of the two arrays (inputs are fixed-dim
  * in practice). Lives under org.apache.spark.sql because the expression
  * plumbing (ExpressionUtils, AbstractDataType) is private[sql]; the
  * engine-facing API is graft.functions.vec.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
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
