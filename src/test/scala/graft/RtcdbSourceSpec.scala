package graft

import java.nio.file.{Files, Paths}

import graft.sources.rtcdb.{RtcdbFormat, RtcdbScanStats}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The rtcdb byte-format source: index-entry golden bytes (the reference's
  * own unit-test vector, `/root/reference/src/storage.rs:108-139`),
  * write→read round trips, and the two pruning behaviors the format exists
  * for — column pruning (per-column files) and zone-map block skipping.
  */
class RtcdbSourceSpec extends AnyFunSuite with SparkFixture {

  private val eventsSchema = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  private def freshDb(tag: String): String = {
    val dir = Files.createTempDirectory(s"rtcdb_$tag")
    RtcdbFormat.writeMetadata(dir, Seq("events" -> eventsSchema))
    dir.toString
  }

  private def readEvents(root: String) =
    spark.read.format("rtcdb").option("path", root).option("table", "events").load()

  test("index entry serializes to the reference's golden 40 bytes") {
    // the exact vector from the reference's own unit test
    val entry = RtcdbFormat.IndexEntry(1L, 2L, 3L,
      RtcdbFormat.longToBytes8(4L), RtcdbFormat.prefix8("longlonglong"))
    val expected: Array[Byte] = Array[Byte](
      0, 0, 0, 0, 0, 0, 0, 1,
      0, 0, 0, 0, 0, 0, 0, 2,
      0, 0, 0, 0, 0, 0, 0, 3,
      0, 0, 0, 0, 0, 0, 0, 4) ++ "longlong".getBytes("UTF-8")
    assert(entry.toBytes.toSeq == expected.toSeq)
    val back = RtcdbFormat.IndexEntry.fromBytes(entry.toBytes)
    assert(back.startPosition == 1L && back.compressedSize == 2L &&
      back.decompressedSize == 3L)
  }

  test("string prefix zone maps: empty, short, long (reference edge cases)") {
    assert(RtcdbFormat.prefix8("").toSeq == Seq.fill(8)(0: Byte))
    assert(RtcdbFormat.prefix8("a").toSeq ==
      ("a".getBytes("UTF-8") ++ Array.fill(7)(0: Byte)).toSeq)
    assert(RtcdbFormat.prefix8("longlonglong").toSeq ==
      "longlong".getBytes("UTF-8").toSeq)
  }

  test("write → spark.read round trip preserves all rows (multi-block)") {
    val root = freshDb("rt")
    val rows = (1L to 3000L).map(i => Row(s"ev${i % 7}", 1700000000L + i, i))
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    val back = readEvents(root)
    assert(back.schema.fieldNames.toSeq == Seq("event", "timestamp", "id"))
    assert(back.count() == 3000)
    val got = back.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq ==
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted)
  }

  test("appends accumulate (storage.rs:155-177 append semantics)") {
    val root = freshDb("append")
    RtcdbFormat.write(root, "events", eventsSchema, Seq(Row("a", 1L, 1L)))
    RtcdbFormat.write(root, "events", eventsSchema, Seq(Row("b", 2L, 2L)))
    assert(readEvents(root).count() == 2)
  }

  test("column pruning: only requested columns' data files are opened") {
    val root = freshDb("prune_cols")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 100L).map(i => Row(s"e$i", i, i)))
    // delete the 'event' column's DATA file only (its index stays, so the
    // shortest-column scan length is unaffected — a missing INDEX means an
    // unfinished commit and reads as the empty view, covered below): a
    // projected read that prunes the column must succeed because it never
    // opens the data file; one that needs the column must fail
    Files.delete(Paths.get(root, "events.event.data"))
    // force actual reads of the surviving columns (count() would prune to
    // zero columns and fall back to the first declared column)
    val projected = readEvents(root).select("timestamp", "id").collect()
    assert(projected.length == 100 && projected.map(_.getLong(1)).sum == 5050)
    intercept[Exception] { readEvents(root).select("event").collect() }
  }

  test("zone-map pruning skips blocks on a sorted long column") {
    val root = freshDb("prune_blocks")
    // 8 blocks of 1024, sorted by id → tight per-block [min,max]
    val rows = (0L until 8192L).map(i => Row(s"ev${i % 5}", 1700000000L + i, i))
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    RtcdbScanStats.reset()
    val hit = readEvents(root).filter(col("id") >= 7000L)
    assert(hit.count() == 1192)
    assert(RtcdbScanStats.prunedBlocks.get() >= 6,
      s"expected >=6 of 8 blocks pruned, pruned=${RtcdbScanStats.prunedBlocks.get()}")
    // pruning is visible in the scan description too
    val p = hit.queryExecution.executedPlan.toString
    assert(p.contains("rtcdb"), p)
  }

  test("leading-column range planning is O(log n) driver probes, not O(n)") {
    // README.md:54's declared binary search: the driver must locate the
    // qualifying block range with logarithmically many 40-byte probes —
    // at 10⁹ blocks, reading every entry driver-side (the round-2
    // implementation) is tens of GB of planning work per scan.
    val dir = Files.createTempDirectory("rtcdb_binsearch")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("value", LongType, nullable = false)))
    RtcdbFormat.writeMetadata(dir, Seq("big" -> schema))
    val n = 256 * 1024 // 256 blocks, sorted by the leading column
    RtcdbFormat.write(dir.toString, "big", schema,
      (0L until n).map(i => Row(i, i * 2)))
    RtcdbScanStats.reset()
    val hit = spark.read.format("rtcdb").option("path", dir.toString)
      .option("table", "big").load()
      .filter(col("id") >= 131072L && col("id") < 133120L) // 2 mid blocks
    assert(hit.count() == 2048)
    val probes = RtcdbScanStats.driverIndexEntryReads.get()
    // two bounds × ⌈log₂ 256⌉ ≈ 18 probes per planning pass; Spark may
    // plan a scan several times — anything near 256 means the linear path
    assert(probes > 0 && probes <= 100,
      s"driver probes=$probes for 256 blocks — expected O(log n)")
    // and only the two matching blocks were ever decoded
    assert(RtcdbScanStats.plannedBlocks.get() == 2,
      s"planned=${RtcdbScanStats.plannedBlocks.get()}")
  }

  test("runtime filtering (DPP): a joined dim's key set prunes blocks at runtime") {
    // the 100 TB shape on the custom source: fact ⋈ small filtered dim,
    // where the dim's surviving join keys arrive via SupportsRuntimeV2-
    // Filtering AFTER the broadcast side executes — the sparse index then
    // drops fact blocks containing none of those keys, before any data
    // file is opened
    val root = freshDb("runtime_filter")
    val rows = (0L until 8192L).map(i => Row(s"ev${i % 5}", 1700000000L + i, i))
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    val s = spark
    import s.implicits._
    // file-backed dim (a LocalRelation would constant-fold the filter away
    // and the pruning rule needs a surviving selective Filter), restricted
    // on a NON-key column — so no static key predicate can be inferred and
    // only the runtime IN-set can prune the fact side. Surviving keys all
    // land in the first 1024-row block.
    val dimPath = Files.createTempDirectory("rtcdb_dpp_dim").toString
    (0L until 2000L).map(i => (i, s"u$i")).toDF("user_id", "name")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("name").isin((0L until 100L).map(i => s"u$i"): _*))
    RtcdbScanStats.reset()
    // the DPP benefit heuristic is stats-based and vetoes pruning on
    // kilobyte-sized test tables; force the decision (at real scale the
    // default heuristic passes on its own)
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000") {
      val q = readEvents(root).join(broadcast(dim), col("id") === col("user_id"))
        .agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) == 100L)
    }
    assert(RtcdbScanStats.runtimeFilteredScans.get() >= 1,
      "runtime filter was never delivered to the scan")
    // no static filter exists (the dim restriction is on a non-key column),
    // so every pruned block was pruned by the runtime key set: the re-plan
    // keeps only the single block covering ids [0, 1024)
    assert(RtcdbScanStats.prunedBlocks.get() >= 7,
      s"expected the runtime IN-set to prune 7 of 8 blocks, " +
        s"pruned=${RtcdbScanStats.prunedBlocks.get()}")
  }

  test("EMPTY runtime IN-set prunes every block without inflating the bloom stat") {
    // a dim whose filter survives planning but matches zero rows delivers
    // an empty runtime key set: every block must be pruned up front, and
    // bloomPrunedBlocks (spec-asserted as 'a bloom probe refused this
    // block') must stay untouched — no probe ever ran
    val root = freshDb("runtime_empty")
    val rows = (0L until 4096L).map(i => Row(s"ev${i % 5}", 1700000000L + i, i))
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    val s = spark
    import s.implicits._
    val dimPath = Files.createTempDirectory("rtcdb_dpp_empty").toString
    (0L until 2000L).map(i => (i, s"u$i")).toDF("user_id", "name")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("name") === "no_such_user")
    RtcdbScanStats.reset()
    withConf(
      // AQE would fold the empty broadcast side into an empty relation
      // and never execute the scan at all — turn it off so the EMPTY
      // IN-set actually reaches the partition reader
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000") {
      val q = readEvents(root).join(broadcast(dim), col("id") === col("user_id"))
        .agg(count(lit(1)).as("n"))
      assert(q.collect().head.getLong(0) == 0L)
    }
    assert(RtcdbScanStats.runtimeFilteredScans.get() >= 1,
      "runtime filter was never delivered to the scan")
    assert(RtcdbScanStats.plannedBlocks.get() == 0,
      s"no block should decode, planned=${RtcdbScanStats.plannedBlocks.get()}")
    assert(RtcdbScanStats.bloomPrunedBlocks.get() == 0,
      s"bloom stat inflated by empty IN-set: ${RtcdbScanStats.bloomPrunedBlocks.get()}")
  }

  test("zone-map pruning is conservative on string prefixes") {
    val root = freshDb("prune_str")
    // sorted by event string: aaa... < mmm... < zzz...
    val rows = (0L until 2048L).map { i =>
      val s = if (i < 1024) f"aaa$i%06d" else f"zzz$i%06d"
      Row(s, i, i)
    }
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    RtcdbScanStats.reset()
    val hit = readEvents(root).filter(col("event") >= "zzz")
    assert(hit.count() == 1024)
    // the non-matching block is pruned (driver range search and/or executor
    // zone maps; Spark may run planning more than once, so pruned can
    // exceed 1) and exactly ONE surviving block is ever decoded
    assert(RtcdbScanStats.prunedBlocks.get() >= 1 &&
      RtcdbScanStats.plannedBlocks.get() == 1,
      s"pruned=${RtcdbScanStats.prunedBlocks.get()} planned=${RtcdbScanStats.plannedBlocks.get()}")
    // equality at the truncation boundary must NOT prune (conservative)
    RtcdbScanStats.reset()
    assert(readEvents(root).filter(col("event") === "aaa000007").count() == 1)
  }

  test("writer rejects mismatched cell types") {
    val root = freshDb("badtype")
    intercept[IllegalArgumentException] {
      RtcdbFormat.write(root, "events", eventsSchema, Seq(Row("a", "bad", 1L)))
    }
  }

  test("RtcdbDB: the reference's full API cycle on its own format") {
    import graft.sources.rtcdb.RtcdbDB
    implicit val s = spark
    val dir = Files.createTempDirectory("rtcdb_db").toString
    val db = RtcdbDB.init(dir, Seq("events" -> eventsSchema))
    // the reference integration test's exact write (integration_test.rs:48-59)
    db.write("events", Seq(
      Row("test", 123L, 456L),
      Row("test2", 1234L, 4567L)))
    val reopened = RtcdbDB.open(dir)
    assert(reopened.tables == Map("events" -> eventsSchema))
    // …and the declared query pipeline the reference never could run:
    val agg = reopened.table("events")
      .filter(col("timestamp") > 200L)
      .groupBy("event").agg(count(lit(1)).as("n"))
      .collect()
    assert(agg.toSeq.map(r => (r.getString(0), r.getLong(1))) == Seq(("test2", 1L)))
    intercept[IllegalArgumentException] { db.write("nope", Seq(Row("a", 1L, 1L))) }
    intercept[IllegalArgumentException] {
      db.write("events", Seq(Row("a", "bad", 1L)))
    }
    intercept[IllegalArgumentException] { RtcdbDB.open(dir + "_nope") }
    // distributed ingest through the same facade (the 100 TB path)
    val sess = spark
    import sess.implicits._
    db.write("events", (10L until 2000L).map(i => (s"bulk$i", i, i))
      .toDF("event", "timestamp", "id"))
    assert(db.table("events").count() == 2L + 1990L)
    intercept[Exception] {
      db.write("events", Seq(("x", 1L)).toDF("event", "timestamp"))
    }
  }

  test("metadata.json round-trips the reference serde shape") {
    val root = freshDb("meta")
    val tables = RtcdbFormat.readMetadata(Paths.get(root))
    assert(tables == Seq("events" -> eventsSchema))
    val json = Files.readString(Paths.get(root, "metadata.json"))
    assert(json.contains("\"dtype\" : \"Uint64\"") || json.contains("\"dtype\":\"Uint64\""))
  }

  test("COUNT/MIN/MAX are answered from the index alone (aggregate pushdown)") {
    val root = freshDb("aggpush")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2500L).map(i => Row(s"e$i", 1700000000L + i, i)))
    // delete EVERY data file: only the 40-byte-entry index files remain.
    // The reference's declared design goal — "fast aggregate queries" off
    // the sparse index (README.md:8,44) — means these must still answer.
    Seq("event", "timestamp", "id").foreach { c =>
      Files.delete(Paths.get(root, s"events.$c.data"))
    }
    val r = readEvents(root)
      .agg(count(lit(1)).as("n"), min(col("timestamp")).as("mn"),
        max(col("id")).as("mx"))
      .collect().head
    assert(r.getLong(0) == 2500L)
    assert(r.getLong(1) == 1700000001L)
    assert(r.getLong(2) == 2500L)
    // COUNT(col) on a non-nullable source column also pushes
    val n2 = readEvents(root).agg(count(col("id"))).collect().head.getLong(0)
    assert(n2 == 2500L)
  }

  test("aggregate pushdown agrees with the row scan on truncated tables") {
    val root = freshDb("aggtrunc")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2500L).map(i => Row(s"e$i", 1700000000L + i, i)))
    // truncate ONE column's index to 2 blocks — the reference's unequal-
    // length case (its read loop stops at the shortest column being read,
    // src/storage.rs:313-322). Scan length is the table-wide minimum, so
    // BOTH paths must see exactly 2 × 1024 rows.
    val idIdx = Paths.get(root, "events.id.index")
    Files.write(idIdx, Files.readAllBytes(idIdx).take(2 * 40))
    val pushed = readEvents(root).agg(
      count(lit(1)).as("n"), max(col("timestamp")).as("mx"))
      .collect().head
    // row path: a residual filter disables pushdown; predicate keeps all rows
    val scanned = readEvents(root).filter(col("timestamp") > 0)
      .agg(count(lit(1))).collect().head.getLong(0)
    assert(pushed.getLong(0) == 2048L, s"pushed count=${pushed.getLong(0)}")
    assert(scanned == 2048L, s"row-scan count=$scanned")
    // the pushed MAX must also ignore blocks past the truncation point
    assert(pushed.getLong(1) == 1700000000L + 2048L)
  }

  test("row scan reads the shortest-column prefix on unequal column files") {
    // the reference's loop-termination contract (EOF on any column's index
    // stops the scan — scan length = shortest column, src/storage.rs:
    // 313-322). The writer can't produce such tables, but the read path
    // must honor the contract on files that arrive that way: rows, not
    // garbage or a hang, and exactly the shortest column's block count.
    val root = freshDb("shortcol")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2500L).map(i => Row(s"e$i", 1700000000L + i, i)))
    val idIdx = Paths.get(root, "events.id.index")
    Files.write(idIdx, Files.readAllBytes(idIdx).take(2 * 40))
    val rows = readEvents(root).select("id", "timestamp").collect()
    assert(rows.length == 2048, s"expected shortest-column prefix, got ${rows.length}")
    assert(rows.map(_.getLong(0)).max == 2048L)
    assert(rows.map(_.getLong(1)).max == 1700000000L + 2048L)
    // projecting ONLY the untruncated columns must still honor the
    // TABLE-wide minimum (not the projected subset's), so row counts can
    // never depend on the projection — the reference's §1.4-class defect
    // we deliberately do not replicate
    assert(readEvents(root).select("event").count() == 2048L)
  }

  test("a torn trailing index entry is ignored, never decoded as garbage") {
    // crash-mid-append artifact: a trailing fragment smaller than one
    // 40-byte entry. Whole-entry units only — the fragment must not
    // corrupt the scan, shift block boundaries, or hang the reader.
    val root = freshDb("torn")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2500L).map(i => Row(s"e$i", 1700000000L + i, i)))
    val tsIdx = Paths.get(root, "events.timestamp.index")
    Files.write(tsIdx, Files.readAllBytes(tsIdx) ++ Array.fill(13)(0x7F.toByte))
    val back = readEvents(root)
    assert(back.count() == 2500L)
    assert(back.agg(max(col("timestamp"))).collect().head.getLong(0) ==
      1700000000L + 2500L)
    // pushed aggregate path sees the same floor(size/40) block count
    assert(back.agg(count(lit(1))).collect().head.getLong(0) == 2500L)
    // a commit AFTER the torn fragment must chop it before appending —
    // otherwise every appended entry's boundary would misalign
    val s = spark
    import s.implicits._
    Seq(("zz", 1800000000L, 9001L)).toDF("event", "timestamp", "id")
      .write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    val after = readEvents(root)
    assert(after.count() == 2501L)
    assert(after.filter(col("id") === 9001L).collect()
      .map(_.getString(0)).toSeq == Seq("zz"))
  }

  test("crash between data append and index publish leaves a readable OLD view") {
    // the staged commit's crash window: phase 1 (data bytes appended +
    // fsync'd) completed, phase 2 (index rename) never ran. Readers derive
    // scan length from the index, so the dangling data bytes must be
    // invisible: row scan and pushed COUNT both see exactly the old table.
    val root = freshDb("crashwin")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2000L).map(i => Row(s"e$i", 1700000000L + i, i)))
    val before = readEvents(root).count()
    // simulate phase-1-only: garbage appended to every column's DATA file,
    // index files untouched
    Seq("event", "timestamp", "id").foreach { c =>
      val p = Paths.get(root, s"events.$c.data")
      Files.write(p, Files.readAllBytes(p) ++ Array.fill(999)(0x55.toByte))
    }
    assert(readEvents(root).count() == before)
    assert(readEvents(root).agg(count(lit(1))).collect().head.getLong(0) == before)
    assert(readEvents(root).agg(max(col("id"))).collect().head.getLong(0) == 2000L)
  }

  test("a missing per-column index reads as the consistent empty view") {
    // first-commit crash window: the commit published some columns'
    // index files but died before the rest. The repair pass counts a
    // missing index as 0 entries (truncate-to-min), so the READ path must
    // apply the same rule — shortest column = 0 blocks = empty table —
    // instead of throwing FileNotFoundException on the unpublished column
    val root = freshDb("missingidx")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 100L).map(i => Row(s"e$i", 1700000000L + i, i)))
    // intact table: nothing suspicious to warn about
    assert(!RtcdbFormat.warnIfAbsentIndexes(Paths.get(root), "events",
      eventsSchema.fieldNames.toSeq, "spec"))
    Files.delete(Paths.get(root, "events.timestamp.index"))
    // absent index beside non-empty siblings is ALSO the lost-index
    // signature — the empty view stands, but the reader must flag it
    // (r5 advice: silent total data loss otherwise)
    assert(RtcdbFormat.warnIfAbsentIndexes(Paths.get(root), "events",
      eventsSchema.fieldNames.toSeq, "spec"))
    assert(readEvents(root).count() == 0)
    // pushed-aggregate (index-only) path applies the identical rule
    assert(readEvents(root).agg(count(lit(1)))
      .collect().head.getLong(0) == 0L)
    // the next commit repairs: everything becomes readable again
    val s = spark
    import s.implicits._
    Seq(("r1", 1800000000L, 9001L))
      .toDF("event", "timestamp", "id")
      .write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    assert(readEvents(root).count() == 1)
  }

  test("commit repairs cross-generation indexes left by a crash between renames") {
    // crash window: a prior commit renamed column A's index (carrying its
    // entries) but died before column B's. The columns now sit at
    // different commit generations; appending onto that state would
    // positionally misalign blocks across columns (readers zip block k of
    // every column into rows). The next commit must first truncate every
    // index to the common minimum — the prefix readers already observed —
    // then append.
    val s = spark
    import s.implicits._
    val root = freshDb("repair")
    RtcdbFormat.write(root, "events", eventsSchema,
      (1L to 2048L).map(i => Row(s"e$i", 1700000000L + i, i)))
    // simulate the half-renamed state: 'event' alone gains one extra entry
    val evIdx = Paths.get(root, "events.event.index")
    val bytes = Files.readAllBytes(evIdx)
    Files.write(evIdx, bytes ++ bytes.take(40))
    Seq(("zz1", 1800000000L, 9001L), ("zz2", 1800000001L, 9002L))
      .toDF("event", "timestamp", "id")
      .write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    val back = readEvents(root)
    assert(back.count() == 2050)
    // the appended rows must be intact ACROSS columns (alignment proof)
    val zz = back.filter(col("id") >= 9001L).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSet
    assert(zz == Set(("zz1", 9001L), ("zz2", 9002L)), s"misaligned: $zz")
    // and every index is back to a single generation (equal entry counts)
    val counts = Seq("event", "timestamp", "id").map(c =>
      Files.size(Paths.get(root, s"events.$c.index")) / 40)
    assert(counts.distinct.size == 1, s"unequal generations: $counts")
  }

  test("u64 values >= 2^63 anywhere in a sorted leading column abort planning") {
    // the reference format holds uint64; Spark LongType can't represent
    // values >= 2^63 (they decode negative and invert zone-map order).
    // The driver's binary search probes only O(log n) entries, so the
    // guard additionally probes the FIRST and LAST entries: under the
    // unsigned sort contract any >= 2^63 value sorts to the tail, so the
    // last entry's max catches it even when the search itself would never
    // land there — refusing to read beats silently excluding blocks.
    val longLeadSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("event", StringType, nullable = false)))
    val dir = Files.createTempDirectory("rtcdb_u64")
    RtcdbFormat.writeMetadata(dir, Seq("events" -> longLeadSchema))
    val root = dir.toString
    RtcdbFormat.write(root, "events", longLeadSchema,
      (1L to 2500L).map(i => Row(i, s"e$i")))
    // hand-patch the LAST index entry's max to a >= 2^63 value (the writer
    // itself rejects them, so such a file can only arrive from outside)
    val idIdx = Paths.get(root, "events.id.index")
    val bytes = Files.readAllBytes(idIdx)
    val patched = bytes.clone()
    patched(bytes.length - 8) = 0x80.toByte // big-endian max, high bit set
    Files.write(idIdx, patched)
    val df = spark.read.format("rtcdb").option("path", root)
      .option("table", "events").load()
    // a leading-column range filter triggers the driver binary search; the
    // probed midpoints never touch the poisoned tail entry, but the O(1)
    // tail probe must
    val e = intercept[Exception] {
      df.filter(col("id") < 100L).collect()
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    val msg = Option(rootCause(e).getMessage).getOrElse(e.getMessage)
    assert(msg.contains("refusing to read"), s"unexpected error: $msg")
  }

  test("aggregate pushdown declines: filters, grouping, string min/max") {
    val root = freshDb("aggdecline")
    val rows = (1L to 500L).map(i => Row(f"e$i%04d", 1700000000L + i, i))
    RtcdbFormat.write(root, "events", eventsSchema, rows)
    // a WHERE clause forces row-level evaluation — data files get read
    val filtered = readEvents(root).filter(col("id") <= 100)
      .agg(count(lit(1))).collect().head.getLong(0)
    assert(filtered == 100L)
    // grouping is never pushed
    val grouped = readEvents(root).groupBy(col("id") % 2)
      .count().collect().map(_.getLong(1)).sorted.toSeq
    assert(grouped == Seq(250L, 250L))
    // string min/max: zone maps are 8-byte prefixes (not exact values) —
    // must fall back to the row scan and still be exact
    val smin = readEvents(root).agg(min(col("event"))).collect().head.getString(0)
    assert(smin == "e0001")
  }

  test("distributed writer: df.write round-trips and matches the serial writer's bytes") {
    // the reference ingests through one driver loop (storage.rs:224-297);
    // the DSv2 writer distributes encode+compress across tasks and
    // concatenates staged parts at commit. Same rows in, same golden
    // bytes out — proven three ways below.
    val s = spark
    import s.implicits._
    val rows = (0L until 3000L).map(i => (f"ev$i%05d", 1700000000L + i, i))
    val df = rows.toDF("event", "timestamp", "id")
      .select(col("event"), col("timestamp"), col("id"))

    // (a) distributed write (4 tasks; RequiresDistributionAndOrdering makes
    // Spark range-sort by column order — the format's sort contract)
    val dRoot = freshDb("dwrite")
    df.repartition(4).write.format("rtcdb")
      .option("path", dRoot).option("table", "events")
      .mode("append").save()

    // (b) the serial golden writer on the same (sorted) rows
    val sRoot = freshDb("swrite")
    RtcdbFormat.write(sRoot, "events", eventsSchema,
      rows.sortBy(r => (r._1, r._2, r._3)).map(r => Row(r._1, r._2, r._3)))

    // round trip: the distributed store reads back to exactly the input
    val back = readEvents(dRoot).orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(back.toSeq == rows.sortBy(_._3))

    // golden-byte check: indexes describe the same logical blocks when the
    // task split lands on block boundaries ONLY at the file tail, so
    // compare decoded CONTENT equality per column instead of raw
    // concatenated bytes (mid-file short blocks are format-legal), plus
    // exact byte equality of the data files' decompressed streams
    for (c <- Seq("event", "timestamp", "id")) {
      def decoded(root: String): Seq[Byte] = {
        val idx = Files.readAllBytes(Paths.get(root, s"events.$c.index"))
          .grouped(40).filter(_.length == 40)
          .map(RtcdbFormat.IndexEntry.fromBytes).toSeq
        val raf = new java.io.RandomAccessFile(
          Paths.get(root, s"events.$c.data").toFile, "r")
        try idx.flatMap(e => RtcdbFormat.readBlock(raf, e).toSeq)
        finally raf.close()
      }
      assert(decoded(dRoot) == decoded(sRoot),
        s"column '$c': distributed and serial decoded streams differ")
    }

    // and the rtcdb scan over the distributed store hash-agrees with the
    // same data served from parquet
    val pq = Files.createTempDirectory("rtcdb_pq").toString + "/t"
    df.write.parquet(pq)
    val viaParquet = s.read.parquet(pq)
      .groupBy(col("event").substr(1, 4).as("pfx"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .orderBy("pfx").collect().toSeq
    val viaRtcdb = readEvents(dRoot)
      .groupBy(col("event").substr(1, 4).as("pfx"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .orderBy("pfx").collect().toSeq
    assert(viaRtcdb == viaParquet)
  }

  // ── bloom sidecar (our extension; RtcdbFormat doc comment) ─────────────

  private val bloomSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),      // leading, sorted
    StructField("tag", StringType, nullable = false),  // scattered strings
    StructField("v", LongType, nullable = false)))     // scattered longs

  /** 16 blocks sorted by k; tag/v values scatter so every block's zone map
    * spans the domain — the exact shape zone maps cannot prune and the
    * bloom sidecar exists for */
  private def scatteredStore(tag: String): String = {
    val dir = Files.createTempDirectory(s"rtcdb_$tag")
    RtcdbFormat.writeMetadata(dir, Seq("t" -> bloomSchema))
    val rows = (0L until 16 * 1024L).map { i =>
      val h = (i * 2654435761L) % 100003L
      Row(i, s"tag$h", h)
    }
    RtcdbFormat.write(dir.toString, "t", bloomSchema, rows)
    dir.toString
  }

  private def readT(root: String) =
    spark.read.format("rtcdb").option("path", root).option("table", "t").load()

  test("bloom sidecar prunes blocks for equality on scattered non-leading columns") {
    val root = scatteredStore("bloom")
    // the value at i=5000 lives in exactly one block (values are unique mod
    // 100003 over this range); zone maps admit ~all 16 blocks
    val needle = (5000L * 2654435761L) % 100003L
    RtcdbScanStats.reset()
    val hitL = readT(root).filter(col("v") === needle).collect()
    assert(hitL.length == 1 && hitL.head.getLong(0) == 5000L)
    assert(RtcdbScanStats.bloomPrunedBlocks.get() >= 12,
      s"bloom pruned ${RtcdbScanStats.bloomPrunedBlocks.get()} of 16 blocks")
    assert(RtcdbScanStats.plannedBlocks.get() <= 4,
      s"decoded ${RtcdbScanStats.plannedBlocks.get()} blocks — bloom not consulted?")
    // string column: 8-byte prefix zone maps can NEVER prove equality
    // absent here (shared "tag" prefix) — only the bloom can skip
    RtcdbScanStats.reset()
    val hitS = readT(root).filter(col("tag") === s"tag$needle").collect()
    assert(hitS.length == 1 && hitS.head.getLong(0) == 5000L)
    assert(RtcdbScanStats.bloomPrunedBlocks.get() >= 12)
    assert(RtcdbScanStats.plannedBlocks.get() <= 4)
    // a never-wrong-skip sanity sweep: every 97th row must be found
    val sample = (0L until 16 * 1024L by 97L).toSeq
    val expected = sample.map(i => (i * 2654435761L) % 100003L).toSet
    val got = readT(root)
      .filter(col("v").isin(sample.map(i => (i * 2654435761L) % 100003L): _*))
      .collect().map(_.getLong(2)).toSet
    assert(got == expected)
  }

  test("a stale or missing bloom sidecar degrades to no pruning, identical results") {
    val root = scatteredStore("bloomstale")
    val needle = (9000L * 2654435761L) % 100003L
    // missing sidecar: delete v's bloom entirely
    Files.delete(Paths.get(root, "t.v.bloom"))
    RtcdbScanStats.reset()
    val hit = readT(root).filter(col("v") === needle).collect()
    assert(hit.length == 1 && hit.head.getLong(0) == 9000L)
    assert(RtcdbScanStats.bloomPrunedBlocks.get() == 0)
    assert(RtcdbScanStats.plannedBlocks.get() == 16,
      "without a sidecar every zone-admitted block must decode")
    // misaligned sidecar (the r9-advice partial-tail crash artifact): 100
    // garbage bytes appended — integer division still equals the entry
    // count, but the size equation fails ⇒ reader must ignore it
    val bp = Paths.get(root, "t.tag.bloom")
    Files.write(bp, Array.fill[Byte](100)(0x5a),
      java.nio.file.StandardOpenOption.APPEND)
    RtcdbScanStats.reset()
    val hitS = readT(root).filter(col("tag") === s"tag$needle").collect()
    assert(hitS.length == 1 && hitS.head.getLong(0) == 9000L)
    assert(RtcdbScanStats.bloomPrunedBlocks.get() == 0,
      "a misaligned sidecar must never be consulted")
    // and the next serial append DELETES the unaligned sidecar instead of
    // appending at an unaligned offset (which would shift every later
    // block's filter bytes into wrong-skip territory)
    RtcdbFormat.write(root, "t", bloomSchema, Seq(Row(99999L, "tagx", 1L)))
    assert(!Files.exists(bp), "partial-tail sidecar must be deleted, not appended to")
    // v's sidecar was deleted above: append must not resurrect it half-built
    assert(!Files.exists(Paths.get(root, "t.v.bloom")))
  }

  test("bloom sidecar stays in lockstep with the index across appends and repair") {
    val root = freshDb("bloomstep")
    def entries(c: String) =
      Files.size(Paths.get(root, s"events.$c.index")) / RtcdbFormat.IndexEntryBytes
    def blooms(c: String) =
      Files.size(Paths.get(root, s"events.$c.bloom")) / RtcdbFormat.BloomBytesPerBlock
    RtcdbFormat.write(root, "events", eventsSchema,
      (0L until 2500L).map(i => Row(s"e$i", i, i)))
    RtcdbFormat.write(root, "events", eventsSchema,
      (2500L until 3000L).map(i => Row(s"e$i", i, i)))
    for (c <- Seq("event", "timestamp", "id")) {
      assert(entries(c) == 4 && blooms(c) == 4, s"col $c out of lockstep")
      assert(Files.size(Paths.get(root, s"events.$c.bloom"))
        % RtcdbFormat.BloomBytesPerBlock == 0)
    }
    // an OVER-LONG sidecar (commit crashed after bloom append, before the
    // index publish) is truncated back to the entry count by the next
    // distributed commit's repair pass, then maintained normally
    Files.write(Paths.get(root, "events.id.bloom"),
      Array.fill[Byte](2 * RtcdbFormat.BloomBytesPerBlock)(1),
      java.nio.file.StandardOpenOption.APPEND)
    val s = spark
    import s.implicits._
    Seq(("z1", 9000L, 9000L)).toDF("event", "timestamp", "id")
      .write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    assert(entries("id") == blooms("id"),
      s"repair left id at ${blooms("id")} blooms for ${entries("id")} entries")
  }

  test("bloom filter property: no false negatives ever, FP rate stays sane") {
    // the filter's one-sided error is the whole soundness argument for
    // the read path: a present value must ALWAYS probe true (else a
    // wrong skip), an absent value may rarely probe true (a wasted
    // decode, bounded ~1% at 1024 inserts / 10240 bits / 7 hashes)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val bits = new Array[Byte](RtcdbFormat.BloomBytesPerBlock)
      val present = Array.fill(1024) {
        val b = new Array[Byte](rnd.nextInt(24) + 1); rnd.nextBytes(b); b
      }
      present.foreach(RtcdbFormat.bloomInsert(bits, _))
      present.foreach { v =>
        assert(RtcdbFormat.bloomMayContain(bits, v),
          s"false negative in trial $trial")
      }
      val probes = 20000
      var fp = 0
      for (_ <- 0 until probes) {
        val b = new Array[Byte](32); rnd.nextBytes(b) // 32B ∉ present (≤25B)
        if (RtcdbFormat.bloomMayContain(bits, b)) fp += 1
      }
      assert(fp < probes * 5 / 100,
        s"trial $trial: FP rate ${fp.toDouble / probes} >= 5%")
    }
  }

  test("distributed writer's bloom sidecar bytes match the serial writer's") {
    // drive the DSv2 write path directly with task splits on block
    // boundaries (2 tasks × 2048 rows), so blocks — and therefore per-block
    // filters — must be byte-identical to one serial write of the same rows
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.rtcdb.{RtcdbWriterFactory, RtcdbBatchWrite}
    val rows = (0L until 4096L).map { i =>
      val h = (i * 40503L) % 65521L
      (f"w$i%06d", h, i)
    }
    val dDir = Files.createTempDirectory("rtcdb_dbloom")
    RtcdbFormat.writeMetadata(dDir, Seq("events" -> eventsSchema))
    val factory = new RtcdbWriterFactory(dDir.toString, "events", eventsSchema)
    val msgs = Seq(0, 1).map { task =>
      val w = factory.createWriter(task, task.toLong)
      rows.slice(task * 2048, (task + 1) * 2048).foreach { r =>
        w.write(new GenericInternalRow(Array[Any](
          UTF8String.fromString(r._1), r._2, r._3)))
      }
      w.commit()
    }
    new RtcdbBatchWrite(dDir.toString, "events", eventsSchema, false)
      .commit(msgs.toArray)
    val sDir = freshDb("sbloom")
    RtcdbFormat.write(sDir, "events", eventsSchema,
      rows.map(r => Row(r._1, r._2, r._3)))
    for (c <- Seq("event", "timestamp", "id")) {
      val d = Files.readAllBytes(dDir.resolve(s"events.$c.bloom"))
      val s2 = Files.readAllBytes(Paths.get(sDir, s"events.$c.bloom"))
      assert(d.length == 4 * RtcdbFormat.BloomBytesPerBlock)
      assert(java.util.Arrays.equals(d, s2),
        s"column '$c': distributed and serial bloom sidecars differ")
    }
  }

  test("distributed writer: overwrite truncates, nulls and negatives abort") {
    val s = spark
    import s.implicits._
    val root = freshDb("dwrite2")
    val df1 = (0L until 100L).map(i => (s"a$i", i, i)).toDF("event", "timestamp", "id")
    df1.write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    (100L until 150L).map(i => (s"b$i", i, i)).toDF("event", "timestamp", "id")
      .write.format("rtcdb").option("path", root).option("table", "events")
      .mode("append").save()
    assert(readEvents(root).count() == 150L)
    df1.write.format("rtcdb").option("path", root).option("table", "events")
      .mode("overwrite").save()
    assert(readEvents(root).count() == 100L)
    // a null cell aborts the batch (the format has no null encoding) and
    // leaves the committed table untouched
    intercept[Exception] {
      Seq((null.asInstanceOf[String], 1L, 1L)).toDF("event", "timestamp", "id")
        .write.format("rtcdb").option("path", root).option("table", "events")
        .mode("append").save()
    }
    assert(readEvents(root).count() == 100L)
    // negative longs are not uint64 — reject, don't corrupt zone maps
    intercept[Exception] {
      Seq(("x", -5L, 1L)).toDF("event", "timestamp", "id")
        .write.format("rtcdb").option("path", root).option("table", "events")
        .mode("append").save()
    }
    assert(readEvents(root).count() == 100L)
  }
}
