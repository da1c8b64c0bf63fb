package graft

import graft.streaming.EventStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics: the streaming run of each windowed
  * aggregation must produce exactly the rows of the batch run over the same
  * data (the unified-model contract EventQueries relies on), and the
  * flatMapGroupsWithState path must maintain correct keyed state.
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def streamEqualsBatch(agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                                sink: String): Unit = {
    val batch = agg(Tables.events(spark, sf)).collect()
    val q = agg(EventStream.readEventStream(spark, sf))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table(sink).collect()
    assert(canon(streamed) == canon(batch),
      s"stream/batch mismatch: ${streamed.length} vs ${batch.length} rows")
    assert(batch.nonEmpty)
  }

  test("tumbling window: streaming output == batch output") {
    streamEqualsBatch(EventStream.tumblingAgg(_), "tumbling_sink")
  }

  test("session window: streaming output == batch output") {
    streamEqualsBatch(EventStream.sessionAgg(_), "session_sink")
  }

  test("sliding window: streaming output == batch output") {
    streamEqualsBatch(EventStream.slidingAgg(_), "sliding_sink")
  }

  test("stream-static join: streaming output == batch output") {
    val static = Tables.customer(spark, sf)
    streamEqualsBatch(EventStream.enrichedSegmentAgg(_, static), "enrich_sink")
  }

  test("stream-stream interval join: streaming output == batch output") {
    val batch = EventStream.viewClickJoin(Tables.events(spark, sf)).collect()
    val q = EventStream.viewClickJoin(EventStream.readEventStream(spark, sf))
      .writeStream.format("memory").queryName("ssjoin_sink")
      .outputMode("append")                     // required for stream-stream joins
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssjoin_sink").collect()
    assert(canon(streamed) == canon(batch),
      s"stream/batch mismatch: ${streamed.length} vs ${batch.length} rows")
    assert(batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: matched rows identical, outer rows a prefix") {
    // outer rows emit only when the watermark passes the view's join
    // horizon, so on a bounded stream the tail's unmatched views stay in
    // state: streamed outer rows ⊆ batch outer rows, matched rows equal
    val batch = EventStream.viewClickJoinOuter(Tables.events(spark, sf)).collect()
    val q = EventStream.viewClickJoinOuter(EventStream.readEventStream(spark, sf))
      .writeStream.format("memory").queryName("ssouter_sink")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssouter_sink").collect()
    def split(rows: Array[Row]) = {
      val (outer, matched) = rows.partition(_.isNullAt(2))
      (canon(matched), canon(outer))
    }
    val (bm, bo) = split(batch)
    val (sm, so) = split(streamed)
    assert(sm == bm, s"matched rows differ: ${sm.length} vs ${bm.length}")
    assert(so.toSet.subsetOf(bo.toSet), "streamed outer rows not in batch result")
    assert(bo.nonEmpty, "fixture has no drop-off views — test is vacuous")
  }

  test("streaming dedup emits each event id exactly once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Ev]
    // Ev.ts is epoch-nano Long, same contract as the events table
    val q = EventStream.dedupeById(input.toDS().toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.Ev(1L, 1_000_000_000L, 7L, 1.0),
        EventStream.Ev(1L, 1_000_000_000L, 7L, 1.0),   // dup in-batch
        EventStream.Ev(2L, 2_000_000_000L, 7L, 2.0))
      q.processAllAvailable()
      input.addData(
        EventStream.Ev(2L, 2_000_000_000L, 7L, 2.0),   // dup across batches
        EventStream.Ev(3L, 3_000_000_000L, 8L, 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("watermark drops data later than the threshold (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val q = EventStream
      .tumblingAgg(input.toDS().toDF("ts", "event_type", "value"),
        "1 minute", "10 minutes")
      .writeStream.format("memory").queryName("late_sink")
      .outputMode("append")                    // emits only finalized windows
      .start()
    try {
      def nanos(min: Long): Long = min * 60L * 1000000000L
      input.addData((nanos(0) + 1000, "view", 1.0), (nanos(0) + 2000, "view", 1.0))
      q.processAllAvailable()
      // advance event time to 30 min → watermark 20 min, far past window [0,1)
      input.addData((nanos(30), "view", 1.0))
      q.processAllAvailable()
      // late arrival inside [0,1), 20 min behind the watermark → dropped
      input.addData((nanos(0) + 3000, "view", 5.0))
      q.processAllAvailable()
      input.addData((nanos(60), "view", 1.0))  // flush remaining state
      q.processAllAvailable()
      val w0 = spark.table("late_sink").collect()
        .filter(_.getAs[java.sql.Timestamp]("window_start").getTime == 0L)
      assert(w0.length == 1, s"window [0,1) emitted ${w0.length} times")
      assert(w0.head.getAs[Long]("n") == 2L, "late row was not dropped")
    } finally q.stop()
  }

  test("foreachBatch sink lands every micro-batch's rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val dir = java.nio.file.Files.createTempDirectory("graft_fb_sink").toString
    val batches = new java.util.concurrent.atomic.AtomicLong
    val q = input.toDS().toDF("ts", "event_type", "value")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // the arbitrary-sink escape hatch: per-batch idempotent append
        df.write.mode("append").parquet(dir)
        batches.incrementAndGet(); ()
      }
      .start()
    try {
      input.addData((1000L, "a", 1.0), (2000L, "b", 2.0))
      q.processAllAvailable()
      input.addData((3000L, "c", 3.0))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 3)
      assert(batches.get() >= 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Ev]
    val q = EventStream.runningUserStats(input.toDS())
      .writeStream
      .format("memory")
      .queryName("user_stats_sink")
      .outputMode("update")
      .start()
    try {
      input.addData(
        EventStream.Ev(1L, 1000L, 7L, 1.25),
        EventStream.Ev(2L, 2000L, 7L, 2.50),
        EventStream.Ev(3L, 1500L, 8L, 4.00))
      q.processAllAvailable()
      input.addData(EventStream.Ev(4L, 9000L, 7L, 0.25))
      q.processAllAvailable()
      val rows = spark.table("user_stats_sink").collect()
        .map(r => (r.getLong(0), r.getStruct(1)))
      // last emitted state per user wins
      val last = rows.groupBy(_._1).map { case (k, v) => k -> v.last._2 }
      assert(last(7L).getLong(0) == 3L)          // n
      assert(last(7L).getDouble(1) == 4.0)       // 1.25+2.50+0.25
      assert(last(7L).getLong(2) == 9000L)       // maxTs
      assert(last(8L).getLong(0) == 1L)
      assert(last(8L).getDouble(1) == 4.0)
    } finally q.stop()
  }

  test("transformWithState emits each spend threshold exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the transformWithState operator requires the RocksDB state store
    withConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val input = MemoryStream[EventStream.Ev]
      // step = 5.00 so small fixture values cross thresholds quickly
      val q = EventStream.spendAlerts(input.toDS(), stepCents = 500L)
        .writeStream
        .format("memory")
        .queryName("spend_alerts_sink")
        .outputMode("append")
        .start()
      try {
        input.addData(
          EventStream.Ev(1L, 1000L, 7L, 3.00),   // total 3.00 — no alert
          EventStream.Ev(2L, 2000L, 7L, 3.00),   // 6.00 — crosses 5.00
          EventStream.Ev(3L, 1500L, 8L, 12.00))  // 12.00 — crosses 5, 10
        q.processAllAvailable()
        input.addData(
          EventStream.Ev(4L, 9000L, 7L, 4.50),   // 10.50 — crosses 10.00
          EventStream.Ev(5L, 9500L, 8L, 1.00))   // 13.00 — nothing new
        q.processAllAvailable()
        // refund drops user 7 below already-alerted thresholds; re-crossing
        // them must NOT re-alert (high-water mark), only NEW multiples fire
        input.addData(
          EventStream.Ev(6L, 9600L, 7L, -6.00),  // 4.50 — below 5.00 again
          EventStream.Ev(7L, 9700L, 7L, 6.50),   // 11.00 — re-crosses 5,10: silent
          EventStream.Ev(8L, 9800L, 7L, 5.00))   // 16.00 — crosses 15.00: alert
        q.processAllAvailable()
        val rows = spark.table("spend_alerts_sink").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        assert(rows == Seq(
          (7L, 500L, 600L), (7L, 1000L, 1050L), (7L, 1500L, 1600L),
          (8L, 500L, 1200L), (8L, 1000L, 1200L)))
      } finally q.stop()
    }
  }

  test("event-time timers: idle sessions emit exactly one alert when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val input = MemoryStream[EventStream.Ev]
      // gap 10s, watermark delay 2s (test timeline in small ms values)
      val q = EventStream.idleAlerts(input.toDS(), gapMs = 10000L)
        .writeStream
        .format("memory")
        .queryName("idle_alerts_sink")
        .outputMode("append")
        .start()
      try {
        // user 7: events at 1s..5s → last=5s, timer armed at 15s
        input.addData(
          EventStream.Ev(1L, 1000L, 7L, 1.0),
          EventStream.Ev(2L, 5000L, 7L, 1.0))
        q.processAllAvailable()
        // watermark is still ~3s — no alert yet
        assert(spark.table("idle_alerts_sink").count() == 0L)
        // user 8 event at 60s advances the watermark past 15s…
        input.addData(EventStream.Ev(3L, 60000L, 8L, 1.0))
        q.processAllAvailable()
        // …and one more batch lets the new watermark drive timer expiry
        input.addData(EventStream.Ev(4L, 61000L, 8L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("idle_alerts_sink").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(rows == Seq((7L, 5000L, 2L)), s"got $rows")
        // the alert fired once: state cleared, no re-emission on later batches
        input.addData(EventStream.Ev(5L, 120000L, 8L, 1.0))
        q.processAllAvailable()
        val again = spark.table("idle_alerts_sink").collect()
          .filter(_.getLong(0) == 7L)
        assert(again.length == 1)
      } finally q.stop()
    }
  }

  test("streaming near-dup: LSH bucket state flags duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = EventStream.nearDupCandidates(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode("append").start()
    try {
      val a = "the quick brown fox jumps over the lazy dog"
      val b = "entirely different content about spark and columnar engines"
      input.addData((1L, a), (2L, b))
      q.processAllAvailable()
      assert(spark.table("neardup_sink").count() == 0L, "unique docs must not flag")
      // doc 3 duplicates doc 1 (all bands collide); doc 4 is new
      input.addData((3L, a), (4L, "yet another unrelated document body here"))
      q.processAllAvailable()
      val cands = spark.table("neardup_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cands == Set((3L, 1L)), s"got $cands")
      // in-batch duplicate pair: both new, smaller id wins ownership
      input.addData((6L, b + " v2 extra"), (5L, b + " v2 extra"))
      q.processAllAvailable()
      val cands2 = spark.table("neardup_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cands2 == Set((3L, 1L), (6L, 5L)), s"got $cands2")
      // batch execution of the SAME operator agrees with the stream
      val batchCands = EventStream.nearDupCandidates(
        Seq((1L, a), (2L, b), (3L, a), (4L, "yet another unrelated document body here"),
          (5L, b + " v2 extra"), (6L, b + " v2 extra"))
          .toDF("doc_id", "text"))
        .collect().map(c => (c.doc_id, c.dup_of)).toSet
      assert(batchCands == cands2, s"batch $batchCands != stream $cands2")
    } finally q.stop()
  }

  test("streaming snapshot dedup: bloom-routed stream-static confirm, batch == stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // prior snapshot: two known documents (normalized keys)
    val prior = Seq("known document one", "known document two")
      .toDF("text")
      .select(lower(regexp_replace(col("text"), "\\s+", " ")).as("k"))
    val bloom = prior
      .agg(graft.functions.bloom.filterAgg(xxhash64(col("k")), 1024L, 1L << 14))
      .head.getAs[Array[Byte]](0)
    val input = MemoryStream[(Long, String)]
    val q = EventStream.snapshotDedup(
        input.toDS().toDF("doc_id", "text"), prior, bloom)
      .writeStream.format("memory").queryName("snapdedup_sink")
      .outputMode("append").start()
    try {
      val batch = Seq(
        (1L, "known  document one"),     // dup (normalization collapses ws)
        (2L, "a brand new document"),    // new (bloom-negative fast path)
        (3L, "known document two"),      // dup
        (4L, "another unseen text"))     // new
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("snapdedup_sink").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false), got)
      // the SAME operator on a batch frame agrees with the stream
      val b = EventStream.snapshotDedup(batch.toDF("doc_id", "text"), prior, bloom)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(b == got, s"batch $b != stream $got")
    } finally q.stop()
  }

  test("snapshot dedup session: the filter ROTATES per commit — a batch-1 doc is bloom-routed in batch 3") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val keyDir = java.nio.file.Files
      .createTempDirectory("snapkeys").toString + "/keys"
    val sess = new EventStream.SnapshotDedupSession(
      spark, keyDir, expectedItems = 1024L, numBits = 1L << 14)
    val sink = scala.collection.concurrent.TrieMap[Long, Boolean]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // sink the flags FIRST, then commit — the session's order contract
        sess.flags(batch).collect()
          .foreach(r => sink(r.getLong(0)) = r.getBoolean(1))
        sess.commit(batch)
        ()
      }.start()
    try {
      input.addData((1L, "first snapshot document"), (2L, "second document body"))
      q.processAllAvailable()
      assert(sink.toMap == Map(1L -> false, 2L -> false), sink)
      // the ROTATED filter must now contain batch-1 keys — bloom routing,
      // not just confirm-join correctness
      val probed = Seq("first snapshot document").toDF("k")
        .select(graft.functions.bloom.mightContain(xxhash64(col("k")),
          lit(sess.filterBytes.get)).as("m")).head.getBoolean(0)
      assert(probed, "batch-1 key missing from the rotated filter")
      input.addData((3L, "unrelated third document"))
      q.processAllAvailable()
      assert(!sink(3L), sink)
      // batch 3: a re-ingest of the batch-1 doc (ws-normalization must
      // collapse the extra spaces) alongside a genuinely new doc
      input.addData((4L, "first  snapshot   document"), (5L, "wholly new again"))
      q.processAllAvailable()
      assert(sink(4L), s"batch-1 doc not flagged dup in batch 3: $sink")
      assert(!sink(5L), sink)
    } finally q.stop()
  }

  test("snapshot dedup session: the scheduled FULL REBUILD keeps earlier batches routed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // rebuildEvery = 2: the SECOND commit takes the rebuild-from-store
    // branch instead of OR-merging — a batch-1 key must survive it,
    // proving the rebuild reads the durable key store, not just the
    // latest batch
    val keyDir = java.nio.file.Files
      .createTempDirectory("snapkeys2").toString + "/keys"
    val sess = new EventStream.SnapshotDedupSession(
      spark, keyDir, expectedItems = 1024L, numBits = 1L << 14,
      rebuildEvery = 2)
    val sink = scala.collection.concurrent.TrieMap[Long, Boolean]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sess.flags(batch).collect()
          .foreach(r => sink(r.getLong(0)) = r.getBoolean(1))
        sess.commit(batch)
        ()
      }.start()
    try {
      input.addData((1L, "rebuild survivor document"))
      q.processAllAvailable()
      input.addData((2L, "second batch document")) // commit #2 → rebuild
      q.processAllAvailable()
      // post-rebuild filter must still contain the batch-1 key
      val probed = Seq("rebuild survivor document").toDF("k")
        .select(graft.functions.bloom.mightContain(xxhash64(col("k")),
          lit(sess.filterBytes.get)).as("m")).head.getBoolean(0)
      assert(probed, "batch-1 key lost by the full rebuild")
      input.addData((3L, "rebuild  survivor  document"), (4L, "still new"))
      q.processAllAvailable()
      assert(sink(3L), s"batch-1 doc not dup after rebuild: $sink")
      assert(!sink(4L), sink)
    } finally q.stop()
  }

  test("snapshot dedup session: RESTART over an existing key store seeds the filter — pre-restart dups flagged in batch 1, changed geometry survives a rebuild boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keyDir = java.nio.file.Files
      .createTempDirectory("snapkeys3").toString + "/keys"
    // session A ingests the pre-restart corpus, then "crashes" (dropped)
    val a = new EventStream.SnapshotDedupSession(
      spark, keyDir, expectedItems = 1024L, numBits = 1L << 14)
    val batch1 = Seq((1L, "pre restart corpus document"),
      (2L, "another original document")).toDF("doc_id", "text")
    a.flags(batch1).collect()
    a.commit(batch1)
    // session B restarts over the SAME key store with DIFFERENT geometry:
    // the constructor seed must route pre-restart keys from its very
    // first batch (the ADVICE false-negative), and because the seed is
    // built in B's geometry, the next OR-merge has identical-geometry
    // sides despite the parameter change
    val b = new EventStream.SnapshotDedupSession(
      spark, keyDir, expectedItems = 2048L, numBits = 1L << 15,
      rebuildEvery = 2)
    assert(b.filterBytes.isDefined, "restart did not seed the filter")
    val batch2 = Seq((3L, "pre  restart  corpus document"), // dup of doc 1
      (4L, "wholly new post restart")).toDF("doc_id", "text")
    val got2 = b.flags(batch2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got2 == Map(3L -> true, 4L -> false),
      s"seeded restart misrouted batch 1: $got2")
    b.commit(batch2) // commit #1: OR-merge seed (B geometry) + batch filter
    val batch3 = Seq((5L, "another original  document"), // dup of doc 2
      (6L, "fresh doc after merge")).toDF("doc_id", "text")
    val got3 = b.flags(batch3).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got3 == Map(5L -> true, 6L -> false), got3)
    b.commit(batch3) // commit #2: scheduled FULL rebuild (rebuildEvery=2)
    // post-rebuild: keys from every epoch — pre-restart, merged, rebuilt —
    // must still route as dups
    val batch4 = Seq((7L, "pre restart corpus document"),
      (8L, "wholly  new post restart"), (9L, "fresh doc  after merge"),
      (10L, "never seen before")).toDF("doc_id", "text")
    val got4 = b.flags(batch4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got4 == Map(7L -> true, 8L -> true, 9L -> true, 10L -> false),
      s"post-rebuild routing wrong: $got4")
  }

  test("streaming aggregate maintains a catalog table via upsert (materialized view)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.catalog.DB
    // derive the view schema from the aggregation itself (batch run)
    val probe = EventStream.tumblingAgg(
      Seq((60_000_000_000L, "view", 1.0)).toDF("ts", "event_type", "value"))
    val mvSchema = org.apache.spark.sql.types.StructType(
      probe.schema.fields.map(_.copy(nullable = false)))
    val db = DB.init(
      java.nio.file.Files.createTempDirectory("graft_mv").toString,
      Seq("mv" -> mvSchema))
    val input = MemoryStream[(Long, String, Double)]
    val q = EventStream
      .tumblingAgg(input.toDS().toDF("ts", "event_type", "value"),
        "1 minute", "10 minutes")
      .writeStream
      .outputMode("update")   // only changed windows flow per batch
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // incremental materialized-view maintenance: changed windows
        // REPLACE their previous values by key
        if (!df.isEmpty) db.upsert("mv", df, Seq("window_start", "event_type"))
        ()
      }
      .start()
    try {
      def nanos(min: Long): Long = min * 60L * 1000000000L
      input.addData(
        (nanos(0) + 1000, "view", 1.00), (nanos(0) + 2000, "view", 2.50),
        (nanos(1), "click", 4.00))
      q.processAllAvailable()
      // second batch UPDATES window [0,1) and adds a new window
      input.addData((nanos(0) + 3000, "view", 0.50), (nanos(2), "view", 9.99))
      q.processAllAvailable()
      val got = db.table("mv").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
      // the maintained table equals the batch aggregation of ALL the data
      val want = EventStream.tumblingAgg(Seq(
          (nanos(0) + 1000, "view", 1.00), (nanos(0) + 2000, "view", 2.50),
          (nanos(1), "click", 4.00), (nanos(0) + 3000, "view", 0.50),
          (nanos(2), "view", 9.99)).toDF("ts", "event_type", "value"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
      assert(got == want, s"mv: $got\nbatch: $want")
      assert(got.exists { case (ts, t, n, sv) =>
        ts == 0L && t == "view" && n == 3L && sv == 4.0 })  // updated window
    } finally q.stop()
  }

  test("DASH reassembly (q510 core): a media emits exactly when its last " +
      "segment lands — media segments arriving BEFORE their init segment, " +
      "spanning micro-batches — and the stats match the closed form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real fragmented files, split at the shipping grain
    def segsOf(id: Long): Seq[Array[Byte]] = {
      val docs = Seq(id).toDF("doc_id")
      val bytes = graft.multimodal.Multimodal
        .mp4FragMediaKeyed(docs, Long.MaxValue).collect().head._2
      graft.multimodal.Mp4Codec.dashSegments(bytes).get
    }
    val a = segsOf(7L) // nf = 3 → 2 frags → 3 segments
    val b = segsOf(6L) // nf = 2 → 1 frag  → 2 segments
    assert(a.length == 3 && b.length == 2)
    def sumPx(id: Long, nf: Int): Long =
      (for (f <- 0 until nf; bl <- 0 until 16)
        yield ((id + 3) * (f * 17 + bl * bl + 1) * 7) % 256).sum * 64
    val input = MemoryStream[(Long, Int, Int, Array[Byte])]
    val q = graft.multimodal.Multimodal.dashReassembly(input.toDS())
      .writeStream.format("memory").queryName("dash_sink")
      .outputMode("append").start()
    try {
      // wave 1: only media segments — nothing can complete
      input.addData((7L, 2, 3, a(2)), (6L, 1, 2, b(1)))
      q.processAllAvailable()
      assert(spark.table("dash_sink").count() == 0,
        "no media is complete yet — emission would be premature")
      // wave 2: both inits — media 6 completes, media 7 still short
      input.addData((6L, 0, 2, b(0)), (7L, 0, 3, a(0)))
      q.processAllAvailable()
      val mid = spark.table("dash_sink")
        .select("media_id").collect().map(_.getLong(0)).toSeq
      assert(mid == Seq(6L), s"exactly media 6 must have emitted: $mid")
      // wave 3: media 7's missing middle segment
      input.addData((7L, 1, 3, a(1)))
      q.processAllAvailable()
      val rows = spark.table("dash_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(7))).sortBy(_._1).toSeq
      assert(rows == Seq(
        (6L, 2L, 2L, 1L, 2L * 40000, sumPx(6L, 2)),
        (7L, 3L, 3L, 2L, 3L * 40000, sumPx(7L, 3))),
        s"reassembled stats must match the closed form: $rows")
    } finally q.stop()
  }
}
