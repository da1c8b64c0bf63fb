package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair that
  * powers Catalyst's runtime-filter join optimization, exercised by
  * PlanSpec's bloom-join test). Catalyst exposes them only to the
  * optimizer, not as SQL functions or Column API, hence this shim (the
  * VectorDot / CollectListCapped pattern: private[sql] plumbing lives
  * under org.apache.spark.sql, the engine-facing API is
  * graft.functions.bloom).
  *
  * Both sides are codegen-path expressions: the aggregate is a
  * TypedImperativeAggregate with map-side partial merge (each executor
  * folds its rows into a local filter; filters OR together on the
  * reduce side), and might_contain evaluates inside whole-stage codegen
  * against a broadcast-literal filter.
  */
object BloomBridge {
  /** Aggregate a LONG column (hash the key first — xxhash64) into a
    * serialized bloom filter (binary). `numBits` bounds the filter size:
    * the driver-side result is exactly `numBits/8` bytes + header, a
    * bounded model parameter like q159's centroids, NEVER O(rows).
    */
  def filterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True if `hashed` MIGHT be in the serialized filter (no false
    * negatives; false-positive rate set by numBits/expectedItems).
    * `filter` must be foldable — pass `lit(bytes)`.
    */
  def mightContain(hashed: Column, filter: Column): Column =
    ExpressionUtils.column(
      // constructor order is (bloomFilterExpression, valueExpression)
      BloomFilterMightContain(ExpressionUtils.expression(filter),
        ExpressionUtils.expression(hashed)))
}
