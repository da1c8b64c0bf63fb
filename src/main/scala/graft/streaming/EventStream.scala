package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the `events` table.
  *
  * The reference's "streaming" is block-at-a-time pipelining inside one
  * query (`/root/reference/README.md:62`), not event streams — SURVEY.md
  * §2.3 lists real stream processing as an engine extension. Everything
  * here follows the unified batch/stream model: [[tumblingAgg]] and
  * [[sessionAgg]] are single code paths that accept either a batch
  * DataFrame or a `readStream` DataFrame; watermarks are attached only in
  * streaming mode. That unification is the point at 100 TB — the same
  * query text backfills from Parquet history and then tails the live
  * stream.
  *
  * Event time: `Tables.events` normalizes the on-disk `ts` — either
  * TIMESTAMP(NANOS)-as-int64 (legacy nanosAsLong read) or
  * TIMESTAMP(MICROS) (round-8 testdata) — to an epoch-nano Long
  * (`Tables.normalizeEventsTs`); [[withEventTime]] derives a µs-precision
  * TimestampType column for window()/watermark use.
  */
object EventStream {

  /** epoch-nano Long → TimestampType (µs truncation, exact integer div) */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling event-time window aggregation — one code path for batch and
    * streaming (watermark only applies on a streaming DF).
    *
    * `extraGroup` names additional input columns to group by and carry
    * through (appended after the canonical output columns) — e.g. a
    * replay-batch tag, letting an MV maintenance harness prepare every
    * micro-batch delta in ONE input scan (q150/q156).
    */
  def tumblingAgg(
      events: DataFrame,
      window: String = "1 minute",
      watermark: String = "10 minutes",
      extraGroup: Seq[String] = Seq.empty): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", watermark) else e
    wm.groupBy(
        (Seq(
          org.apache.spark.sql.functions.window(col("event_time"), window).as("w"),
          col("event_type")) ++ extraGroup.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select((Seq(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value")) ++ extraGroup.map(col)): _*)
  }

  /** Hopping (sliding) event-time windows: every event lands in
    * size/slide overlapping windows (epoch-aligned, exactly like tumbling).
    * Same unified batch/stream code path as [[tumblingAgg]].
    */
  def slidingAgg(
      events: DataFrame,
      size: String = "2 minutes",
      slide: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", watermark) else e
    wm.groupBy(
        org.apache.spark.sql.functions.window(col("event_time"), size, slide).as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Stream-static enrichment join: the event stream joins a static
    * dimension (user → market segment) that Spark re-reads per micro-batch
    * without any streaming state. The dimension is broadcast — the only
    * sane shape for a dim join at 100 TB/day stream volume. One code path
    * for batch and streaming.
    */
  def enrichedSegmentAgg(events: DataFrame, customers: DataFrame): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", "10 minutes") else e
    wm.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
  }

  /** Gap-based sessionization via the built-in `session_window` (merges
    * events closer than `gap`; an event at exactly last+gap opens a new
    * session) — again one code path for batch and streaming.
    */
  def sessionAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", watermark) else e
    wm.groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("user_id"), col("first_event"), col("last_event"),
        col("n_events"), col("sum_value"))
  }

  /** File-based stream source over the same Parquet the batch path reads —
    * schema pinned from the batch reader (required by file stream sources).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // schema pinned from the RAW file (not Tables.events, whose epoch-nano
    // normalization is a derived column the file source can't read); the
    // same normalization then applies on top, so batch ≡ stream across
    // testdata generations (Tables.normalizeEventsTs)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // file stream sources take a directory; select just the events file
    Tables.normalizeEventsTs(
      spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Watermarked stream-stream interval join: every (view, click) pair of
    * the same user where the click lands within 10 minutes after the view.
    * One code path for batch and streaming; in streaming both sides carry
    * the watermark, which combined with the time bound lets Spark expire
    * join state — the only viable stream-stream join shape at scale.
    * Execution is an equi-join on user_id with a range predicate — never a
    * time-range cross-join.
    */
  def viewClickJoin(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", watermark) else e
    val views = wm.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_time").as("v_time"))
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
    views.join(clicks, expr(
        """v_user = c_user AND
           c_time >= v_time AND
           c_time <= v_time + interval 10 minutes"""))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
  }

  /** Left-outer variant of [[viewClickJoin]]: views with no click inside
    * the 10-minute horizon surface with a NULL click_id (funnel drop-off
    * detection). Streaming caveat (inherent to outer stream-stream joins):
    * an unmatched view emits only once the watermark passes its join
    * horizon, so a bounded stream's tail views (within watermark+horizon
    * of the final event) stay in state — the streamed outer rows are a
    * prefix of the batch result, with matched rows always identical
    * (StreamingSpec asserts exactly that).
    */
  def viewClickJoinOuter(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame = {
    val e = withEventTime(events)
    val wm = if (e.isStreaming) e.withWatermark("event_time", watermark) else e
    val views = wm.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_time").as("v_time"))
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
    views.join(clicks, expr(
        """v_user = c_user AND
           c_time >= v_time AND
           c_time <= v_time + interval 10 minutes"""), "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"))
  }

  /** Exactly-once event dedup by id — unified: plain dropDuplicates in
    * batch; in streaming, dropDuplicatesWithinWatermark so dedup state is
    * bounded (expired past the watermark) instead of growing forever —
    * the only viable form at 100 TB/day event volumes.
    */
  def dedupeById(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      withEventTime(events)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  // ── custom keyed state: flatMapGroupsWithState ─────────────────────────

  final case class Ev(event_id: Long, ts: Long, user_id: Long, value: Double)
  final case class UserStat(n: Long, sumValue: Double, maxTs: Long)

  /** Per-user running statistics with explicit keyed state — the
    * `flatMapGroupsWithState` extension point for stateful logic the
    * built-in aggregations can't express. Emits the updated stat for every
    * group seen in each micro-batch.
    */
  def runningUserStats(events: Dataset[Ev]): Dataset[(Long, UserStat)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStat, (Long, UserStat)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(0L, 0.0, Long.MinValue))
          val next = evs.foldLeft(prev) { (st, e) =>
            UserStat(st.n + 1,
              // exact 2-decimal accumulation in cents to stay order-robust
              (BigDecimal(st.sumValue).setScale(2, BigDecimal.RoundingMode.HALF_UP) +
                BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toDouble,
              math.max(st.maxTs, e.ts))
          }
          state.update(next)
          Iterator.single(userId -> next)
      }
  }

  // ── transformWithState (the Spark 4 arbitrary-state successor) ─────────

  final case class Alert(user_id: Long, threshold_cents: Long,
      total_cents: Long)

  /** Per-user cumulative-spend alerts: one row each time a user's running
    * `value` total crosses another multiple of `stepCents`. State is a
    * single typed `ValueState[Long]` (total in exact cents) managed by the
    * `transformWithState` API — typed state variables, explicit TimeMode,
    * TTL support, RocksDB-backed — the extension point that replaces
    * `flatMapGroupsWithState` for new stateful operators. Requires
    * `spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider`.
    */
  def spendAlerts(events: Dataset[Ev],
      stepCents: Long = 10000L): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).transformWithState(
      new SpendAlertProcessor(stepCents),
      org.apache.spark.sql.streaming.TimeMode.None(),
      OutputMode.Append())
  }

  class SpendAlertProcessor(stepCents: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, Alert] {
    import org.apache.spark.sql.streaming.{TimerValues, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders}

    @transient private var totalCents: ValueState[Long] = _
    @transient private var maxAlertedK: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totalCents = getHandle.getValueState[Long]("totalCents",
        Encoders.scalaLong, TTLConfig.NONE)
      // high-water mark of the highest threshold multiple ever alerted:
      // a refund (negative value) may drop the total below a threshold and
      // a later purchase re-cross it — "alert once per threshold" means
      // only multiples ABOVE this mark ever fire
      maxAlertedK = getHandle.getValueState[Long]("maxAlertedK",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Alert] = {
      val prev = if (totalCents.exists()) totalCents.get() else 0L
      var maxK = if (maxAlertedK.exists()) maxAlertedK.get() else 0L
      // exact cents accumulation (double values are 2-decimal by contract);
      // events fold in iterator order within the batch — each threshold is
      // crossed exactly once regardless of batching or refunds
      var total = prev
      val alerts = Seq.newBuilder[Alert]
      rows.foreach { e =>
        val next = total + math.round(e.value * 100)
        // floorDiv: a negative running total truncates toward -inf, so
        // threshold k=1 still means "reached stepCents", never shifted
        val kNext = Math.floorDiv(next, stepCents)
        var k = maxK + 1
        while (k <= kNext) {
          alerts += Alert(userId, k * stepCents, next)
          k += 1
        }
        maxK = math.max(maxK, kNext)
        total = next
      }
      totalCents.update(total)
      maxAlertedK.update(maxK)
      alerts.result().iterator
    }
  }

  // ── streaming near-duplicate detection (online MinHash-LSH) ────────────

  final case class DupCandidate(doc_id: Long, dup_of: Long)

  /** ONLINE near-dup detection: the streaming form of q38's MinHash-LSH.
    * Each document explodes to its 4 (band, bandHash) keys
    * ([[graft.operators.TextQueries.bandKeys]] — the identical signature
    * pipeline); per bucket, keyed state remembers the FIRST claimant, and
    * any later arrival in an occupied bucket emits a (doc, dup_of)
    * candidate against that first claimant. Multi-band hits dedupe
    * downstream on doc_id (same candidate semantics as the batch query).
    *
    * State is one long per non-empty bucket — bounded by corpus
    * signature diversity, not stream length, and each key is touched by
    * exactly the docs that hash into it: the shape that survives an
    * unbounded ingest stream. Deterministic under replay: within a batch,
    * claimants resolve by min doc_id before emission. Works identically
    * on a batch frame (flatMapGroupsWithState executes once per group).
    */
  def nearDupCandidates(docs: DataFrame): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.TextQueries.bandKeys(docs)
      .select(col("band"), col("bh"), col("doc_id"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, bh, _) => (band, bh) }
      .flatMapGroupsWithState[Long, DupCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), rows: Iterator[(Int, String, Long)],
            state: GroupState[Long]) =>
          // batch arrivals resolve deterministically: smallest id first
          val ids = rows.map(_._3).toArray.sorted
          val owner = state.getOption.getOrElse {
            val first = ids.head
            state.update(first)
            first
          }
          ids.iterator.filter(_ != owner).map(DupCandidate(_, owner))
      }
  }

  final case class SnapshotFlag(doc_id: Long, is_dup: Boolean)

  /** Streaming cross-snapshot dedup — q164's bloom routing, unified
    * batch/stream: each arriving document probes a broadcast bloom filter
    * of the PRIOR corpus's normalized keys; bloom-negative rows are
    * flagged new without ever joining (at a 1% FP rate, 99% of genuinely
    * new stream traffic takes this zero-state fast path), and only
    * bloom-positive rows take the stream-static left join against the
    * prior key table for exact confirmation. No streaming state at all —
    * the filter is a fixed broadcast and the join side is static — so the
    * operator survives an unbounded ingest stream by construction.
    * Works identically on a batch frame (the same lineage, no stream
    * operators involved).
    */
  def snapshotDedup(docs: DataFrame, priorKeys: DataFrame,
      bloom: Array[Byte]): DataFrame = {
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val keyed = docs.select(col("doc_id"), norm.as("k"))
      .withColumn("maybe", graft.functions.bloom.mightContain(
        xxhash64(col("k")), lit(bloom)))
    val neg = keyed.filter(!col("maybe"))
      .select(col("doc_id"), lit(false).as("is_dup"))
    val pos = keyed.filter(col("maybe"))
      .join(priorKeys.select(col("k")).distinct()
        .withColumn("m", lit(1)), Seq("k"), "left")
      .select(col("doc_id"), col("m").isNotNull.as("is_dup"))
    neg.union(pos)
  }

  /** Long-running snapshot dedup whose prior-corpus filter REFRESHES as
    * snapshots commit (the r7 verdict's task 6 — [[snapshotDedup]] takes
    * a filter built once, so a stream outliving its launch snapshot
    * stops routing correctly: docs ingested after launch would always
    * take the bloom-negative fast path and re-ingest as "new").
    *
    * Drive it from `foreachBatch`: `flags(batch)` computes the per-row
    * dup verdicts against the CURRENT prior corpus (same lineage as
    * [[snapshotDedup]] — bloom-negative rows bypass the confirm join,
    * results exact); after the caller has SUNK those flags,
    * `commit(batch)` folds the batch's keys into the corpus — appending
    * them to the durable key store and rotating the in-memory filter.
    * The order contract (sink, then commit) is the standard
    * foreachBatch idempotence discipline: flags are planned against the
    * key-store file listing and filter bytes as of plan time, so commit
    * must not run until the flags query finished executing.
    *
    * Filter maintenance is O(batch) per batch: commit builds a bloom over
    * the BATCH's keys only (one aggregation; bytes to the driver, never
    * rows) and OR-merges it into the running filter — bloom filters of
    * identical geometry merge losslessly. OR-merge accretion can only
    * raise the false-POSITIVE rate (routing cost, never correctness), so
    * every `rebuildEvery` commits the filter is rebuilt from the full key
    * store, bounding FP drift on unbounded streams while keeping the
    * common path cheap. State beyond the fixed-size bytes lives on disk
    * (`keyDir`), not on the driver — the 100 TB posture.
    *
    * RESTART: a session constructed over a pre-existing `keyDir` (process
    * restart mid-stream) seeds its filter from the durable key store at
    * construction — one bloom aggregation, O(corpus) once. Without the
    * seed, pre-restart corpus keys would take the bloom-negative fast
    * path and their duplicates would flag is_dup=false (a correctness
    * false negative, not just a routing miss) until the next scheduled
    * full rebuild. The seed also makes the session's bloom GEOMETRY pin
    * total: every filter this session ever holds — seed, per-batch, or
    * scheduled rebuild — is built from THIS session's (expectedItems,
    * numBits), so the lossless OR-merge precondition (identical geometry)
    * holds by construction even when a restart changes the parameters;
    * the merge path asserts it anyway, failing loud rather than
    * corrupting routing if the invariant is ever broken.
    */
  final class SnapshotDedupSession(spark: SparkSession, keyDir: String,
      expectedItems: Long = 1 << 16, numBits: Long = 1L << 19,
      rebuildEvery: Int = 16) {
    import org.apache.spark.util.sketch.BloomFilter

    require(expectedItems > 0 && numBits > 0 && rebuildEvery > 0,
      s"bad session geometry: expectedItems=$expectedItems numBits=$numBits " +
        s"rebuildEvery=$rebuildEvery")

    @volatile private[graft] var filterBytes: Option[Array[Byte]] = None
    private var commits = 0

    private def norm = lower(regexp_replace(col("text"), "\\s+", " "))

    private def priorKeys: DataFrame =
      if (new java.io.File(keyDir).exists()) spark.read.parquet(keyDir)
      else spark.emptyDataFrame.select(lit("").as("k")).limit(0)

    /** one bloom aggregation over a key frame → serialized filter bytes
      * in THIS session's geometry (None for an empty frame)
      */
    private def buildFilter(src: DataFrame): Option[Array[Byte]] = {
      val row = src
        .agg(graft.functions.bloom
          .filterAgg(xxhash64(col("k")), expectedItems, numBits).as("bf"))
        .head
      if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
    }

    // restart seed: an existing durable key store means a prior corpus
    // this session must route against from its FIRST batch (see scaladoc)
    if (new java.io.File(keyDir).exists()) filterBytes = buildFilter(priorKeys)

    /** dup verdicts (doc_id, is_dup) for one micro-batch vs the PRIOR
      * corpus — empty-corpus state until the first commit: everything is
      * definitely new and never joins
      */
    def flags(batch: DataFrame): DataFrame = filterBytes match {
      case None =>
        batch.select(col("doc_id"), lit(false).as("is_dup"))
      case Some(bytes) => snapshotDedup(batch, priorKeys, bytes)
    }

    /** fold one sunk micro-batch into the prior corpus: durable key
      * append + filter rotation (OR-merge, periodic full rebuild)
      */
    def commit(batch: DataFrame): Unit = {
      val keys = batch.select(norm.as("k")).distinct()
      keys.write.mode("append").option("compression", "lz4").parquet(keyDir)
      commits += 1
      val add = if (commits % rebuildEvery == 0) buildFilter(priorKeys)
                else buildFilter(keys)
      add.foreach { bytes =>
        filterBytes = filterBytes match {
          case Some(cur) if commits % rebuildEvery != 0 =>
            val a = BloomFilter.readFrom(new java.io.ByteArrayInputStream(cur))
            val b = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
            // geometry pin: both sides were built by buildFilter with the
            // session's constants, so this can only fire on a code bug —
            // and firing beats mergeInPlace corrupting the routing filter
            require(a.bitSize == b.bitSize,
              s"bloom geometry drift: ${a.bitSize} vs ${b.bitSize} bits")
            a.mergeInPlace(b)
            val out = new java.io.ByteArrayOutputStream()
            a.writeTo(out)
            Some(out.toByteArray)
          case _ => Some(bytes) // first commit, or scheduled full rebuild
        }
      }
    }
  }

  // ── transformWithState with EVENT-TIME TIMERS ──────────────────────────

  /** Ev + the watermark column event-time timers require */
  final case class EvT(event_id: Long, ts: Long, user_id: Long,
      value: Double, event_time: java.sql.Timestamp)
  final case class IdleAlert(user_id: Long, last_ts: Long, n_events: Long)

  /** Idle-session detection via event-time TIMERS: each user's state keeps
    * (last event time, event count); every batch re-arms a timer at
    * `last + gapMs`, and when the WATERMARK passes that expiry
    * `handleExpiredTimer` emits one idle alert and clears the state —
    * the push-based complement of the gap-sessionization in `sessionAgg`
    * (which only emits when a later batch happens to close the window).
    * Timer bookkeeping is O(1) per key: stale timers are deleted on
    * re-arm, and a belt-and-braces staleness guard on expiry keeps the
    * operator correct even if one slips through. State and timers are
    * bounded by the live-key count — the 100 TB requirement for any
    * stateful streaming operator.
    */
  def idleAlerts(events: Dataset[Ev], gapMs: Long = 10000L,
      watermarkDelay: String = "2 seconds"): Dataset[IdleAlert] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("ts")))
      .as[EvT]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new IdleSessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  class IdleSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvT, IdleAlert] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var lastTs: ValueState[Long] = _
    @transient private var nEvents: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTs = getHandle.getValueState[Long]("lastTs",
        Encoders.scalaLong, TTLConfig.NONE)
      nEvents = getHandle.getValueState[Long]("nEvents",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, rows: Iterator[EvT],
        timerValues: TimerValues): Iterator[IdleAlert] = {
      var last = if (lastTs.exists()) lastTs.get() else Long.MinValue
      var n = if (nEvents.exists()) nEvents.get() else 0L
      rows.foreach { e => last = math.max(last, e.ts); n += 1 }
      lastTs.update(last)
      nEvents.update(n)
      // one live timer per key: drop the previous arm, set the new one
      // (materialize before deleting — never mutate under a live state
      // iterator)
      getHandle.listTimers().toSeq.foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[IdleAlert] = {
      // staleness guard: only the CURRENT session-end timer may emit
      if (lastTs.exists() &&
          expiredTimerInfo.getExpiryTimeInMs() >= lastTs.get() + gapMs) {
        val out = IdleAlert(userId, lastTs.get(), nEvents.get())
        lastTs.clear(); nEvents.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }
}
