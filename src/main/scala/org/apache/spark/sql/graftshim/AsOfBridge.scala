package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.types.LongType

import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}

/** DataFrame facade for the custom sorted-merge as-of join
  * ([[graft.plans.AsOfJoinExec]]): builds the custom logical node over
  * two ANALYZED child plans and registers [[AsOfJoinStrategy]] on the
  * session (idempotently, via `spark.experimental.extraStrategies` — the
  * same runtime-registration path RangeJoinSpec uses for the optimizer
  * rule; `spark.sql.extensions=graft.functions.GraftExtensions` also
  * registers it at session build). Lives in the sql package for
  * `Dataset.ofRows` (the BloomBridge/VectorDot shim pattern).
  *
  * Contract: all four key/ts columns are LongType (pack wider keys
  * first); output = left columns ++ right columns (right nullable,
  * LEFT-asof semantics) — alias collisions are the caller's to avoid.
  */
object AsOfBridge {
  def sortedAsOf(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side"))
    val (lk, lt) = (attr(lp, leftKey, "left"), attr(lp, leftTs, "left"))
    val (rk, rt) = (attr(rp, rightKey, "right"), attr(rp, rightTs, "right"))
    Seq(lk, lt, rk, rt).foreach { a =>
      if (a.dataType != LongType) throw new IllegalArgumentException(
        s"as-of join: column '${a.name}' must be LongType, got ${a.dataType}")
    }
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinNode(lp, rp, lk, lt, rk, rt))
  }
}
