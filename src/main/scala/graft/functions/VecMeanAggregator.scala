package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of a fixed-dimension vector column — the
  * k-means M-step as a single `Aggregator[IN, BUF, OUT]` instead of a
  * posexplode + shuffle-per-dimension plan (q83). One buffer of `dim`
  * doubles per group; merges are element-wise sums, so the aggregation is
  * fully partial-aggregable (map-side combine) and shuffles exactly one
  * buffer per group per partition — the shape that wins when groups are few
  * and dimensions are dense.
  *
  * The reference has no user extension points at all (SURVEY.md §2.3,
  * "UDF/UDAF surface: absent"); this is the documented Spark-native
  * extension path: `Aggregator` → `functions.udaf` → usable in
  * `agg(...)` / SQL.
  *
  * Determinism note: plain double addition here — bit-exact only when
  * accumulation order is fixed, so tests compare against the declarative
  * q83 path with a tolerance; the oracle-checked query keeps the
  * rounded-decimal form.
  */
class VecMeanAggregator(dim: Int)
    extends Aggregator[Array[Float], VecMeanAggregator.Buf, Array[Double]] {
  import VecMeanAggregator.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, a: Array[Float]): Buf = {
    require(a.length == dim, s"expected $dim-dim vector, got ${a.length}")
    var i = 0
    while (i < dim) { b.sums(i) += a(i); i += 1 }
    Buf(b.sums, b.n + 1)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    Buf(x.sums, x.n + y.n)
  }

  override def finish(b: Buf): Array[Double] =
    if (b.n == 0) Array.empty else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VecMeanAggregator {
  final case class Buf(sums: Array[Double], n: Long)

  /** untyped-column form for `df.agg(vecMean(col("embedding")))` */
  def udafColumn(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VecMeanAggregator(dim))
}
