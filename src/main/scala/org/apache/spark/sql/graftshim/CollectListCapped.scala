package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a HARD per-group accumulation bound.
  *
  * The LSH-bucket queries (q38, q154) group candidate members into
  * per-bucket lists and drop buckets larger than a cap — a bucket every
  * document falls into (boilerplate band hash, ubiquitous fingerprint) is
  * noise, not near-dup signal, and its pair expansion is quadratic. A
  * plain `collect_list(...)` + `filter(size(...) <= cap)` has the right
  * SEMANTICS but the wrong MEMORY shape: the full member list — at 100 TB
  * potentially 10⁸ entries for one hot key — materializes in a single
  * aggregation buffer *before* the size filter discards it, which is
  * exactly an executor OOM. This aggregate enforces the bound where it
  * matters, inside the aggregation buffer: it accumulates at most
  * `cap + 1` values (update and merge both stop there) so an over-cap
  * group yields a `cap + 1`-sized list — enough for the caller's
  * `size(...) <= cap` filter to prove overflow and drop the group — while
  * buffer growth stays O(cap) no matter how many rows the group receives.
  *
  * For groups with at most `cap` members the result is exactly
  * `collect_list` (every value present; callers normalize order with
  * `sort_array`, as partial-aggregation merge order is nondeterministic
  * for both this and the built-in). For larger groups the surviving
  * `cap + 1` values are an arbitrary subset — callers MUST drop such
  * groups, which is the documented contract of the bucket cap.
  *
  * Implementation follows the built-in `Collect` TypedImperativeAggregate
  * shape (object aggregation buffer, UnsafeRow-serialized between partial
  * and final stages) so it is partial-aggregable: map-side combine already
  * caps per-partition state before anything shuffles.
  */
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap > 0, s"collect_list_capped: cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  // stop at cap + 1: the extra element is the overflow proof the caller's
  // size filter inspects; values are copied out of the (reused) input row
  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.length <= cap && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val bufferSerializer =
    UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    bufferSerializer(
      InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buf += v)
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_list_capped"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)
}

object CollectListCapped {
  /** Column ↔ Expression bridge (private[sql] plumbing, like VectorDot) */
  def column(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      CollectListCapped(ExpressionUtils.expression(c), cap).toAggregateExpression())
}
