package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CollectListCapped
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** [[org.apache.spark.sql.graftshim.CollectListCapped]]: the HARD-bounded
  * bucket-member aggregate behind q38/q154's LSH bucket caps. The key
  * property (r4 verdict task 2) is that a pathological hot key — one every
  * row shares — grows the aggregation buffer to at most cap+1 elements,
  * not O(group size), BEFORE any size filter runs.
  */
class CappedCollectSpec extends AnyFunSuite with SparkFixture {

  import graft.functions.agg.collectListCapped

  test("matches collect_list exactly for groups at or under the cap") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 10, i)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(sort_array(collectListCapped(col("v"), 10)).as("vs"))
      .orderBy("k").collect()
    val want = df.groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("vs"))
      .orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("adversarial hot key: buffer growth is O(cap), not O(group)") {
    // drive the aggregate directly, the way a grouped hash aggregation
    // would for one key every row shares: 100k updates against cap=16
    // must leave at most 17 buffered elements at every step
    val agg = CollectListCapped(BoundReference(0, LongType, nullable = false), 16)
    val buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    (1 to 100000).foreach { i =>
      row.update(0, i.toLong)
      agg.update(buf, row)
      assert(buf.length <= 17, s"buffer overflowed the cap at row $i: ${buf.length}")
    }
    assert(buf.length == 17)
    // merging two full partial buffers stays bounded too
    val merged = agg.merge(buf.clone(), buf.clone())
    assert(merged.length == 17)
  }

  test("partial-buffer serialization round-trips") {
    val agg = CollectListCapped(BoundReference(0, LongType, nullable = false), 8)
    val buf = mutable.ArrayBuffer[Any](5L, 3L, 9L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq == Seq(5L, 3L, 9L))
  }

  test("end-to-end hot key: over-cap groups expose exactly cap+1 and get dropped") {
    import spark.implicits._
    // key 0: 1000 members (hot); key 1: 3 members (signal)
    val df = ((1L to 1000L).map(i => (0L, i)) ++ Seq((1L, 1L), (1L, 2L), (1L, 3L)))
      .toDF("k", "v")
    val agged = df.groupBy("k")
      .agg(collectListCapped(col("v"), 64).as("vs"))
    val sizes = agged.select(col("k"), size(col("vs")).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(sizes == Seq((0L, 65), (1L, 3)))
    // the caller contract: size <= cap keeps exactly the bounded groups
    assert(agged.filter(size(col("vs")) <= 64).count() == 1)
  }

  test("struct elements (the q38 member shape) survive copy + shuffle") {
    import spark.implicits._
    val df = Seq((1L, 10L, "abc"), (1L, 11L, "def"), (2L, 12L, "ghi"))
      .toDF("k", "id", "s")
    val got = df.groupBy("k")
      .agg(sort_array(collectListCapped(
        struct(col("id"), col("s")), 4)).as("ms"))
      .orderBy("k")
      .selectExpr("k", "transform(ms, m -> m.s) AS ss")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
    assert(got == Seq((1L, Seq("abc", "def")), (2L, Seq("ghi"))))
  }
}
