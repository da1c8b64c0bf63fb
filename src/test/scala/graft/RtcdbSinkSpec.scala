package graft

import java.nio.file.Files

import graft.streaming.RtcdbSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exactly-once foreachBatch sink ([[graft.streaming.RtcdbSink]]):
  * replay no-ops, mid-append crash rollback, and multi-batch commits. The
  * crash cases are driven through the ledger protocol directly — the spec
  * plays the role of a restarting driver.
  */
class RtcdbSinkSpec extends AnyFunSuite with SparkFixture {

  private def batchDf(from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).map(i => (i, s"t${i % 3}", i * 100L))
      .toDF("event_id", "event_type", "cents")
  }

  private def fresh(tag: String) = {
    val dir = Files.createTempDirectory(s"rtcdbsink_$tag")
    (s"$dir/db", dir.resolve("ledger"))
  }

  private def readBack(dbRoot: String): DataFrame =
    spark.read.format("rtcdb").option("path", dbRoot)
      .option("table", "t").load()

  test("replayed batch is a no-op (done mark wins)") {
    val (db, ledger) = fresh("replay")
    assert(RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10)))
    // Structured Streaming redelivers the last batch after restart
    assert(!RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10)))
    assert(!RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10)))
    assert(readBack(db).count() == 10L)
    assert(readBack(db).agg(sum("cents")).head.getLong(0) == 4500L)
  }

  test("crash AFTER append but BEFORE done mark rolls back, then re-commits exactly once") {
    val (db, ledger) = fresh("crash")
    assert(RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10)))
    // simulate the crashed attempt of batch 1: the ledger got the pending
    // record and the data append COMPLETED, but the done mark never
    // landed — the worst case (full duplicate bytes on disk)
    val pending = ledger.resolve("batch-000001.pending")
    val rootP = java.nio.file.Paths.get(db)
    def len(p: java.nio.file.Path) =
      if (Files.exists(p)) Files.size(p) else -1L
    val rec = Seq("event_id", "event_type", "cents").map { c =>
      s"$c,${len(graft.sources.rtcdb.RtcdbFormat.dataPath(rootP, "t", c))}," +
        s"${len(graft.sources.rtcdb.RtcdbFormat.indexPath(rootP, "t", c))}," +
        s"${len(graft.sources.rtcdb.RtcdbFormat.bloomPath(rootP, "t", c))}"
    }.mkString("\n")
    Files.write(pending, rec.getBytes("UTF-8"))
    batchDf(10, 20).write.format("rtcdb").option("path", db)
      .option("table", "t").mode("append").save()
    assert(readBack(db).count() == 20L) // torn state: bytes present, no mark
    // the restarted driver redelivers batch 1 through the normal path:
    // rollback must truncate the orphaned bytes, then append ONCE
    assert(RtcdbSink.commitBatch(db, "t", ledger, 1L, batchDf(10, 20)))
    assert(readBack(db).count() == 20L)
    assert(readBack(db).agg(sum("cents")).head.getLong(0) == (0 until 20).map(_ * 100L).sum)
    assert(Files.exists(ledger.resolve("batch-000001.done")))
    assert(!Files.exists(pending))
  }

  test("crash BEFORE any append (pending only) rolls back to the prior table") {
    val (db, ledger) = fresh("early")
    assert(RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 5)))
    // pending written, crash before the DSv2 append started
    val pending = ledger.resolve("batch-000001.pending")
    val rootP = java.nio.file.Paths.get(db)
    def len(p: java.nio.file.Path) =
      if (Files.exists(p)) Files.size(p) else -1L
    val rec = Seq("event_id", "event_type", "cents").map { c =>
      s"$c,${len(graft.sources.rtcdb.RtcdbFormat.dataPath(rootP, "t", c))}," +
        s"${len(graft.sources.rtcdb.RtcdbFormat.indexPath(rootP, "t", c))}," +
        s"${len(graft.sources.rtcdb.RtcdbFormat.bloomPath(rootP, "t", c))}"
    }.mkString("\n")
    Files.write(pending, rec.getBytes("UTF-8"))
    assert(RtcdbSink.commitBatch(db, "t", ledger, 1L, batchDf(5, 9)))
    assert(readBack(db).count() == 9L)
  }

  test("multi-batch commit accumulates in order and each batch is fenced independently") {
    val (db, ledger) = fresh("multi")
    (0 until 4).foreach { b =>
      assert(RtcdbSink.commitBatch(db, "t", ledger, b.toLong,
        batchDf(b * 10L, b * 10L + 10L)))
    }
    // replay an OLD batch (not just the last): still fenced
    assert(!RtcdbSink.commitBatch(db, "t", ledger, 2L, batchDf(20, 30)))
    assert(readBack(db).count() == 40L)
    assert(readBack(db).agg(min("event_id"), max("event_id")).head ==
      org.apache.spark.sql.Row(0L, 39L))
  }

  // ── the source half: tail-the-table micro-batch reads ──────────────────

  private def runTail(db: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("rtcdb")
      .option("path", db).option("table", "t").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("malformed pending record fails loudly BEFORE touching any table file") {
    val (db, ledger) = fresh("torn")
    assert(RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 5)))
    val rootP = java.nio.file.Paths.get(db)
    val dataP = graft.sources.rtcdb.RtcdbFormat.dataPath(rootP, "t", "event_id")
    val lenBefore = Files.size(dataP)
    // a torn record (crash mid-write on a pre-atomic-move ledger)
    Files.createDirectories(ledger)
    val pending = ledger.resolve("batch-000001.pending")
    Files.write(pending, "event_id,123".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      RtcdbSink.commitBatch(db, "t", ledger, 1L, batchDf(5, 10))
    }
    assert(ex.getMessage.contains("pending"))
    // parse-before-touch: nothing was truncated by the failed rollback
    assert(Files.size(dataP) == lenBefore)
    assert(Files.exists(pending)) // mark retained for manual inspection
    // non-numeric lengths fail the same way
    Files.write(pending, "event_id,abc,def,ghi".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      RtcdbSink.commitBatch(db, "t", ledger, 1L, batchDf(5, 10))
    }
    ()
  }

  test("pending mark is atomic (no .tmp residue) and separator column names are rejected") {
    val (db, ledger) = fresh("atomic")
    assert(RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 5)))
    import scala.jdk.CollectionConverters._
    val residue = Files.list(ledger).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".tmp")).toSeq
    assert(residue.isEmpty, s"tmp residue: $residue")
    val bad = batchDf(0, 3).withColumnRenamed("cents", "a,b")
    val ex = intercept[IllegalArgumentException] {
      // batch id 1: id 0's done mark (from the commit above) would
      // short-circuit the replay before the name validation runs
      RtcdbSink.commitBatch(db, "t2", ledger, 1L, bad)
    }
    assert(ex.getMessage.contains("separator"))
  }

  test("streaming source reads committed blocks, then ONLY the delta after restart") {
    val (db, ledger) = fresh("tail")
    val dir = Files.createTempDirectory("rtcdbtail_io")
    val (ckpt, out) = (s"$dir/ckpt", s"$dir/out")
    RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10))
    RtcdbSink.commitBatch(db, "t", ledger, 1L, batchDf(10, 30))
    runTail(db, ckpt, out)
    val first = spark.read.parquet(out)
    assert(first.count() == 30L)
    assert(first.agg(sum("cents")).head.getLong(0) ==
      (0 until 30).map(_ * 100L).sum)
    // new append lands; the SAME checkpoint must resume past the old
    // offset and emit only the new blocks (incremental, not a rescan)
    RtcdbSink.commitBatch(db, "t", ledger, 2L, batchDf(30, 35))
    runTail(db, ckpt, out)
    val second = spark.read.parquet(out)
    assert(second.count() == 35L)
    assert(second.agg(sum("cents")).head.getLong(0) ==
      (0 until 35).map(_ * 100L).sum)
    // restart with nothing new: zero additional rows
    runTail(db, ckpt, out)
    assert(spark.read.parquet(out).count() == 35L)
  }

  test("maxBlocksPerTrigger paces the catch-up into multiple bounded micro-batches") {
    val (db, ledger) = fresh("paced")
    val dir = Files.createTempDirectory("rtcdbpaced_io")
    // 5 sink batches → ≥5 committed row blocks
    (0 until 5).foreach { b =>
      RtcdbSink.commitBatch(db, "t", ledger, b.toLong,
        batchDf(b * 10L, b * 10L + 10L))
    }
    var batches = 0
    var maxRowsInBatch = 0L
    val q = spark.readStream.format("rtcdb")
      .option("path", db).option("table", "t")
      .option("maxBlocksPerTrigger", "1").load()
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) => {
        val n = b.count()
        if (n > 0) { batches += 1; maxRowsInBatch = math.max(maxRowsInBatch, n) }
        ()
      })
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // each block holds ≤ RowsPerBlock rows and each DSv2 sink batch here
    // lands one block per writer task — pacing must split the 50-row
    // backlog into multiple micro-batches, each ≤ one block
    assert(batches >= 2, s"expected paced catch-up, got $batches batch(es)")
    assert(maxRowsInBatch <= graft.sources.rtcdb.RtcdbFormat.RowsPerBlock,
      s"a paced batch exceeded one block: $maxRowsInBatch rows")
  }

  test("filters push through the streaming tail (zone maps prune per block, results exact)") {
    val (db, ledger) = fresh("tailfilter")
    val dir = Files.createTempDirectory("rtcdbtailf_io")
    RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 40))
    val q = spark.readStream.format("rtcdb")
      .option("path", db).option("table", "t").load()
      .filter(col("event_id") >= 30L)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 10L)
    assert(out.agg(min("event_id"), max("event_id")).head ==
      org.apache.spark.sql.Row(30L, 39L))
  }

  test("two tables under one DB root sink and tail independently") {
    val (db, ledger) = fresh("twotables")
    val l2 = ledger.resolveSibling("ledger2")
    RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10))
    RtcdbSink.commitBatch(db, "u", l2, 0L, batchDf(100, 130))
    // the per-table ledgers and block counters must not interfere
    assert(readBack(db).count() == 10L)
    assert(spark.read.format("rtcdb").option("path", db)
      .option("table", "u").load().count() == 30L)
    // replay of table t must not block a fresh batch on table u
    assert(!RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10)))
    assert(RtcdbSink.commitBatch(db, "u", l2, 1L, batchDf(130, 140)))
    assert(spark.read.format("rtcdb").option("path", db)
      .option("table", "u").load().count() == 40L)
  }

  test("streaming source column pruning flows through the micro-batch reader") {
    val (db, ledger) = fresh("tailprune")
    val dir = Files.createTempDirectory("rtcdbtailp_io")
    RtcdbSink.commitBatch(db, "t", ledger, 0L, batchDf(0, 10))
    val q = spark.readStream.format("rtcdb")
      .option("path", db).option("table", "t").load()
      .select("event_type")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.schema.fieldNames.toSeq == Seq("event_type"))
    assert(out.count() == 10L)
  }
}
