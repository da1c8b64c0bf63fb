package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join — the scale path for joins whose ONLY predicate is
  * a range containment (no equi key).
  *
  * Spark plans an equi-key-less theta join as BroadcastNestedLoopJoin:
  * O(|L|·|R|) comparisons and a full broadcast of one side — unusable at
  * 100 TB. The standard fix (DuckDB's IEJoin, Databricks' range-join
  * binning) maps both sides onto coarse buckets of width `w`:
  *
  *  - a point lands in exactly one bucket (`p DIV w`);
  *  - an interval explodes to every bucket it overlaps
  *    (`sequence(s DIV w, e DIV w)` — `(e-s)/w + 2` rows at most);
  *  - bucket-equality then becomes a plain shuffled equi-join key, with
  *    the original containment predicate left as a residual filter.
  *
  * Truncating division is monotone, so `s ≤ p ≤ e` implies
  * `s DIV w ≤ p DIV w ≤ e DIV w` — every true match shares a bucket
  * (no false negatives, for negative domains too), and each match is
  * emitted exactly once because the point side owns exactly one bucket.
  * Cost: shuffle O(|L| + |R|·span/w) instead of compare O(|L|·|R|); pick
  * `w` near the typical interval span so the explode factor stays ~2.
  *
  * [[graft.plans.RangeJoinRule]] applies this rewrite automatically to
  * eligible logical joins; this operator is the explicit library form.
  */
object RangeJoin {

  /** All (interval, point) pairs with `points(pt) ∈ [start, end]`
    * (inclusive). Column sets of the two inputs must be disjoint; the
    * bound columns are long-typed (epoch micros in the event queries).
    */
  def pointInInterval(points: DataFrame, pt: String,
      intervals: DataFrame, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = points.withColumn("__rj_bucket", expr(s"$pt DIV $bucketWidth"))
    val ivs = intervals.withColumn("__rj_bucket",
      explode(sequence(expr(s"$start DIV $bucketWidth"),
        expr(s"$end DIV $bucketWidth"), lit(1L))))
    pts.join(ivs, Seq("__rj_bucket"))
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("__rj_bucket")
  }
}
