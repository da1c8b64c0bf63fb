package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.VectorDot

/** Column-API entry points for the native vector expressions
  * (implementation: [[org.apache.spark.sql.graftshim.VectorDot]], a
  * codegen'd Catalyst expression).
  */
object vec {
  def dot(a: Column, b: Column): Column = VectorDot.dotColumn(a, b)

  /** ‖a‖₂ via the same fold (sqrt applied outside, as in the HOF form) */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

/** Column-API entry points for the custom aggregates. */
object agg {
  /** `collect_list` whose aggregation buffer is HARD-bounded at `cap + 1`
    * elements — the safe form of the LSH bucket-cap pattern
    * (implementation + contract: [[org.apache.spark.sql.graftshim.CollectListCapped]]).
    * Callers MUST drop groups whose result exceeds `cap` elements
    * (`filter(size(...) <= cap)`), exactly as with the filter-after-
    * collect_list form this replaces.
    */
  def collectListCapped(c: Column, cap: Int): Column =
    org.apache.spark.sql.graftshim.CollectListCapped.column(c, cap)
}

/** Session extension (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * registering `vec_dot` for SQL-text users and the range-join rewrite rule
  * ([[graft.plans.RangeJoinRule]], inert until its bucket-width conf is
  * set). The Column API above works without registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule())
  }
}
