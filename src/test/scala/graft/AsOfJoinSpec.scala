package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.AsOfBridge
import org.scalatest.funsuite.AnyFunSuite

/** The custom sorted-merge as-of join (AsOfJoinNode / AsOfJoinStrategy /
  * AsOfJoinExec): semantics on a constructed case, null LEFT semantics,
  * equality with the q29 tagged-union+window form on real events data,
  * and the plan shape (custom exec present; EnsureRequirements supplied
  * the exchanges+sorts — none hand-scheduled).
  */
class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  test("constructed case: latest right at-or-before, per key, left semantics") {
    val s = spark
    import s.implicits._
    val quotes = Seq( // (key, ts, px)
      (1L, 10L, 100L), (1L, 20L, 110L), (1L, 30L, 120L),
      (2L, 15L, 200L))
      .toDF("qk", "qts", "px")
    val trades = Seq( // (key, ts, vol)
      (1L, 5L, 7L),   // before any quote → NULL
      (1L, 20L, 8L),  // ties take <= → px 110
      (1L, 25L, 9L),  // between → px 110
      (1L, 99L, 10L), // after all → px 120
      (2L, 14L, 11L), // before key-2's only quote → NULL
      (3L, 50L, 12L)) // key with no quotes at all → NULL
      .toDF("tk", "tts", "vol")
    val out = AsOfBridge.sortedAsOf(trades, "tk", "tts", quotes, "qk", "qts")
      .select(col("tk"), col("tts"), col("vol"), col("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sorted.toSeq
    assert(out == Seq(
      (1L, 5L, 7L, -1L), (1L, 20L, 8L, 110L), (1L, 25L, 9L, 110L),
      (1L, 99L, 10L, 120L), (2L, 14L, 11L, -1L), (3L, 50L, 12L, -1L)))
  }

  test("NULL left keys/ts retained unmatched, NULL right rows excluded; negative keys merge correctly") {
    val s = spark
    import s.implicits._
    // nullable schema (Option[Long]) + a negative key: the combination
    // that would break the merge's non-decreasing-key invariant if NULLs
    // (read as 0 by getLong but sorted nulls-first) reached the exec.
    // LEFT rows with a NULL key/ts never match but keep their place in
    // the output (vendor ASOF LEFT semantics — cardinality = |left|)
    val l = Seq(
      (Option(1L), Option(10L), 1L),   // matches px=100
      (Option.empty[Long], Option(20L), 2L), // NULL key → retained, px NULL
      (Option(1L), Option.empty[Long], 3L),  // NULL ts → retained, px NULL
      (Option(-5L), Option(10L), 4L))  // negative key, matches px=50
      .toDF("k", "ts", "id")
    val r = Seq(
      (Option(1L), Option(5L), 100L),
      (Option.empty[Long], Option(1L), 999L), // NULL right key → never matches
      (Option(-5L), Option(3L), 50L))
      .toDF("rk", "rts", "px")
    val out = AsOfBridge.sortedAsOf(l, "k", "ts", r, "rk", "rts")
      .select("id", "px").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .sorted.toSeq
    assert(out == Seq((1L, 100L), (2L, -1L), (3L, -1L), (4L, 50L)))
  }

  test("plan: AsOfJoinExec node planned, exchanges/sorts inserted by the framework") {
    val s = spark
    import s.implicits._
    val l = (0L until 1000L).map(i => (i % 7, i)).toDF("k", "ts")
    val r = (0L until 100L).map(i => (i % 7, i * 3, i)).toDF("k2", "ts2", "v")
    val df = AsOfBridge.sortedAsOf(l, "k", "ts", r, "k2", "ts2")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      s"framework exchanges missing:\n$p")
    assert("\\bSort\\b".r.findAllIn(p).nonEmpty, s"framework sorts missing:\n$p")
    assert(df.count() == 1000L)
  }

  test("matches the q29 tagged-union+window form on real events") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.events(spark, sf).withColumn("tsu", expr("ts div 1000"))
    // right side made unique per (user, tsu): the q29 tie-break (highest
    // event_id at equal µs) applied by construction
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("vuser"), col("tsu").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tsu"))
    val viaExec = AsOfBridge.sortedAsOf(
        clicks, "user_id", "tsu", views, "vuser", "vts")
      .filter(col("view_id").isNotNull)
      .select("click_id", "user_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val viaWindow = SparkEntry.queries("q29_asof_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(viaExec == viaWindow)
  }
}
