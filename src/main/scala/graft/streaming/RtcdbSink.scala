package graft.streaming

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

import graft.sources.rtcdb.RtcdbFormat

/** Exactly-once micro-batch append into an rtcdb table — the
  * `writeStream.foreachBatch` sink where the streaming surface meets the
  * byte format. Structured Streaming's contract is AT-LEAST-ONCE delivery
  * to foreachBatch (the last batch is redelivered after every restart);
  * this ledger turns that into exactly-once on the table.
  *
  * Protocol, per batch id (single-writer: a streaming sink has exactly
  * one driver):
  *   1. `batch-<id>.done` exists → the batch committed fully; the replay
  *      is a no-op.
  *   2. `batch-<id>.pending` exists → a previous attempt crashed after
  *      starting to append. Every rtcdb file is APPEND-ONLY, so the
  *      pending record's pre-append lengths identify the exact consistent
  *      prefix: truncate each data/index/bloom file back to it (delete
  *      files the record marks absent) and fall through to a fresh
  *      attempt.
  *   3. Fresh attempt: write pending (current lengths) → distributed
  *      DSv2 append → write done → delete pending.
  *
  * A crash at ANY point therefore leaves either a replay-skippable done
  * mark (data fully present) or a rollback-able pending mark (partial or
  * full bytes that the next attempt truncates away) — never a duplicated
  * or torn batch. This is the same write-ahead-intent idea the
  * reference's batch-oriented ingest implies but never needed (its
  * writes were single-process, `/root/reference/src/storage.rs:141-258`);
  * under a restarting stream driver it becomes load-bearing.
  */
object RtcdbSink {

  /** Commit one micro-batch. Returns true if this call appended, false
    * if the ledger proved the batch already committed (replay no-op).
    */
  def commitBatch(dbRoot: String, table: String, ledger: Path,
      batchId: Long, batch: DataFrame): Boolean = {
    val done = ledger.resolve(f"batch-$batchId%06d.done")
    val pending = ledger.resolve(f"batch-$batchId%06d.pending")
    if (Files.exists(done)) return false
    if (Files.exists(pending)) rollback(dbRoot, table, pending)
    val rootP = Paths.get(dbRoot)
    // bootstrap: declare the DB and/or THIS table if absent (the V2
    // provider resolves the table's schema from metadata.json at
    // planning, BEFORE the write's own commit could register it — so a
    // second table joining an existing DB must be declared here too)
    Files.createDirectories(rootP)
    val declared = org.apache.spark.sql.types.StructType(
      batch.schema.fields.map(_.copy(nullable = false)))
    if (!Files.exists(rootP.resolve("metadata.json")))
      RtcdbFormat.writeMetadata(rootP, Seq(table -> declared))
    else {
      val existing = RtcdbFormat.readMetadata(rootP)
      if (!existing.exists(_._1 == table))
        RtcdbFormat.writeMetadata(rootP, existing :+ (table -> declared))
    }
    def len(p: Path) = if (Files.exists(p)) Files.size(p) else -1L
    val rec = batch.schema.fieldNames.map { c =>
      s"$c,${len(RtcdbFormat.dataPath(rootP, table, c))}," +
        s"${len(RtcdbFormat.indexPath(rootP, table, c))}," +
        s"${len(RtcdbFormat.bloomPath(rootP, table, c))}"
    }.mkString("\n")
    Files.createDirectories(ledger)
    Files.write(pending, rec.getBytes("UTF-8"))
    batch.write.format("rtcdb").option("path", dbRoot)
      .option("table", table).mode("append").save()
    Files.write(done, Array.emptyByteArray)
    Files.delete(pending)
    true
  }

  /** Restore every column file to its pending-recorded pre-append length
    * (append-only files make truncation the complete undo), then retire
    * the pending mark.
    */
  private[graft] def rollback(dbRoot: String, table: String,
      pending: Path): Unit = {
    val rootP = Paths.get(dbRoot)
    def restore(p: Path, l: Long): Unit =
      if (l < 0L) { Files.deleteIfExists(p); () }
      else if (Files.exists(p) && Files.size(p) > l) {
        val ch = FileChannel.open(p, StandardOpenOption.WRITE)
        try ch.truncate(l) finally ch.close()
        ()
      }
    new String(Files.readAllBytes(pending), "UTF-8").split("\n")
      .filter(_.nonEmpty).foreach { line =>
        val Array(c, dl, il, bl) = line.split(",", 4)
        restore(RtcdbFormat.dataPath(rootP, table, c), dl.toLong)
        restore(RtcdbFormat.indexPath(rootP, table, c), il.toLong)
        restore(RtcdbFormat.bloomPath(rootP, table, c), bl.toLong)
      }
    Files.delete(pending)
  }
}
