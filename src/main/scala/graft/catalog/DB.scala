package graft.catalog

import java.nio.file.{Files, Paths, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, raise_error, when}
import org.apache.spark.sql.types.{DataType, StructType}

/** The `DB` facade — capability-parity port of the reference's public API
  * (`/root/reference/src/lib.rs:16-49`):
  *
  *   - [[DB.init]]  ≙ `DB::init`  (`src/lib.rs:31-38`) — create a database
  *     directory with a `metadata.json` catalog (`src/metadata.rs:62-76`).
  *   - [[DB.open]]  ≙ `DB::open`  (`src/lib.rs:22-29`) — load the catalog
  *     (`src/metadata.rs:44-60`).
  *   - [[DB.write]] ≙ `DB::write_data` (`src/lib.rs:40-49`,
  *     `src/storage.rs:224-297`) — validated, append-only batch ingest.
  *   - [[DB.table]] — the read path the reference declared but left dead
  *     (`src/storage.rs:299-351`, SURVEY.md §1.4.2), returned as a DataFrame
  *     so the whole declared query pipeline (`README.md:51-62`) composes on
  *     top via Catalyst.
  *
  * Storage mapping (SURVEY.md §1.3): each table is a directory of Parquet
  * files with LZ4-compressed column chunks — the same capability set as the
  * reference's per-column `.data`/`.index` block files (columnar layout,
  * per-block compression, per-column min/max zone maps) supplied natively by
  * the format. The reference's sort-order contract (`README.md:44`: rows
  * sorted by column order so leading-column filters prune) is realized at
  * write time by a range-repartition + within-partition sort on the schema
  * columns, which is what makes Parquet row-group statistics pruning
  * effective.
  */
final class DB private (val root: Path, val spark: SparkSession) {

  /** table name → declared schema, as recorded in metadata.json */
  def tables: Map[String, StructType] = Catalog.read(root)

  private def tableDir(name: String): Path = root.resolve(name)

  /** Schema-enforced scan of a table — delivers the reference's projected
    * scan (O10) and full scan (O11) plus the declared prune/filter pipeline
    * (D1-D3) through Catalyst; see SURVEY.md §4.
    */
  def table(name: String): DataFrame = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    val dir = tableDir(name)
    snapshotFiles(name) match {
      // snapshot-committed table (see upsertPartitioned): the manifest IS
      // the table — files on disk outside it are uncommitted or
      // superseded and must stay invisible. basePath keeps partition-
      // column inference (and PartitionFilters pruning) identical to the
      // whole-directory read.
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", dir.toString).schema(schema)
          .parquet(files.map(f => dir.resolve(f).toString): _*)
          .select(schema.fieldNames.map(col): _*)
      case Some(_) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case None if Files.exists(dir) =>
        spark.read.schema(schema).parquet(dir.toString)
          // directory-partitioned layouts surface partition columns LAST
          // regardless of the requested schema; pin the declared order so
          // positional access never depends on the physical layout
          .select(schema.fieldNames.map(col): _*)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
  }

  // ── snapshot manifest (old-or-new commit for partition-grain merges) ──
  /** `_snapshot.json` — the per-table snapshot pointer [[upsertPartitioned]]
    * commits through (underscore prefix: Spark's directory reader already
    * ignores it as metadata). Holds the relative paths of every CURRENT
    * data file; absent for tables that only ever saw whole-directory
    * operations (their single-swap semantics need no manifest).
    */
  private def snapshotPath(name: String): Path =
    tableDir(name).resolve("_snapshot.json")

  /** current committed file set, or None when the table has no manifest */
  private[graft] def snapshotFiles(name: String): Option[Seq[String]] = {
    val p = snapshotPath(name)
    if (!Files.exists(p)) None
    else {
      val doc = new ObjectMapper().readTree(Files.readString(p))
      Some(doc.get("files").elements().asScala.map(_.asText()).toSeq)
    }
  }

  // ── snapshot HISTORY (time travel / Iceberg-style retention) ─────────
  /** `_snapshots/vN.json` — one retained manifest per committed version.
    * Written BEFORE the pointer swap (a crash in between leaves an
    * orphan history file one version ahead of the pointer; the next
    * commit re-derives the same version number and overwrites it —
    * self-healing). Data files referenced by ANY retained manifest are
    * never swept, so [[tableAsOf]] reads stay valid until
    * [[expireSnapshots]] releases them — the Iceberg/Delta snapshot
    * lifecycle on plain parquet.
    */
  private def historyDir(name: String): Path =
    tableDir(name).resolve("_snapshots")

  /** retained snapshot versions, ascending (empty: no commits yet) */
  def snapshotVersions(name: String): Seq[Long] = {
    val h = historyDir(name)
    if (!Files.exists(h)) Seq.empty
    else {
      val ls = Files.list(h)
      try ls.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d+\\.json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
      finally ls.close()
    }
  }

  /** version of the CURRENT pointer (0 = manifest-less / pre-versioning) */
  private def currentVersion(name: String): Long = {
    val p = snapshotPath(name)
    if (!Files.exists(p)) 0L
    else {
      val doc = new ObjectMapper().readTree(Files.readString(p))
      if (doc.has("version")) doc.get("version").asLong() else 0L
    }
  }

  /** file list of a retained manifest version (None: expired/never) */
  private[graft] def snapshotFilesAsOf(name: String,
      version: Long): Option[Seq[String]] = {
    val p = historyDir(name).resolve(s"v$version.json")
    if (!Files.exists(p)) None
    else {
      val doc = new ObjectMapper().readTree(Files.readString(p))
      Some(doc.get("files").elements().asScala.map(_.asText()).toSeq)
    }
  }

  /** every data file some retained manifest (history or pointer) still
    * references — the sweep exclusion set
    */
  private def retainedFiles(name: String): Set[String] =
    (snapshotFiles(name).getOrElse(Seq.empty) ++
      snapshotVersions(name)
        .flatMap(v => snapshotFilesAsOf(name, v).getOrElse(Seq.empty))).toSet

  /** TIME TRAVEL: the table exactly as manifest `version` committed it —
    * same pinned schema and basePath partition inference as [[table]].
    * Valid until [[expireSnapshots]] drops the version.
    */
  def tableAsOf(name: String, version: Long): DataFrame = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    val files = snapshotFilesAsOf(name, version).getOrElse(
      throw new IllegalArgumentException(
        s"No retained snapshot v$version for table '$name' " +
          s"(retained: ${snapshotVersions(name).mkString(", ")})"))
    val dir = tableDir(name)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.option("basePath", dir.toString).schema(schema)
      .parquet(files.map(f => dir.resolve(f).toString): _*)
      .select(schema.fieldNames.map(col): _*)
  }

  /** Release history: keep the newest `keepLast` versions (the pointer's
    * version always survives), delete older manifests, then delete every
    * data file no longer referenced by ANY retained manifest — the
    * space-reclamation half of the snapshot lifecycle. Returns
    * (#versions expired, #data files reclaimed).
    */
  def expireSnapshots(name: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val versions = snapshotVersions(name)
    val cur = currentVersion(name)
    val drop = versions.dropRight(keepLast).filterNot(_ == cur)
    drop.foreach(v =>
      Files.deleteIfExists(historyDir(name).resolve(s"v$v.json")))
    val keep = retainedFiles(name)
    val dir = tableDir(name)
    val orphans = listRelParquet(name).filterNot(keep)
    orphans.foreach(f => Files.deleteIfExists(dir.resolve(f)))
    (drop.size, orphans.size)
  }

  /** THE commit point: write the versioned manifest into the history dir
    * (fsync'd), then stage the same doc to a temp sibling, fsync,
    * atomically move over `_snapshot.json`, fsync the directory — the
    * same staged-rename discipline as the rtcdb index commit
    * (RtcdbWrite.scala), so readers see the old file set or the new one,
    * never a mix, even across power loss.
    */
  private def commitSnapshot(name: String, files: Seq[String]): Unit = {
    val mapper = new ObjectMapper()
    val doc = mapper.createObjectNode()
    doc.put("version", currentVersion(name) + 1)
    val arr = doc.putArray("files")
    files.sorted.foreach(arr.add)
    // history first: a retained copy must exist before the pointer can
    // name this version (see historyDir scaladoc for the crash window)
    Files.createDirectories(historyDir(name))
    val hist = historyDir(name).resolve(s"v${currentVersion(name) + 1}.json")
    val hch = java.nio.channels.FileChannel.open(hist,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      hch.write(java.nio.ByteBuffer.wrap(
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(doc)))
      hch.force(true)
    } finally hch.close()
    val tmp = tableDir(name).resolve("_snapshot.json.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(doc)))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, snapshotPath(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // POSIX: the rename itself needs a directory fsync to be durable;
    // not every filesystem allows opening a directory channel — best
    // effort, matching the rtcdb write path
    try {
      val dch = java.nio.channels.FileChannel.open(tableDir(name),
        java.nio.file.StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    } catch { case _: Exception => () }
  }

  /** data files under the table dir, relative to it (manifest encoding) */
  private def listRelParquet(name: String): Seq[String] = {
    val dir = tableDir(name)
    if (!Files.exists(dir)) Seq.empty
    else parquetFiles(dir).map(f => dir.relativize(f).toString)
  }

  /** relative parent dir of a relative file path ("" at table root) */
  private def parentRel(relFile: String): String = {
    val i = relFile.lastIndexOf('/')
    if (i < 0) "" else relFile.substring(0, i)
  }

  /** Append-only batch ingest of driver-side rows, mirroring
    * `write_data`'s per-cell validation (`src/storage.rs:250-252`: a
    * mismatched value aborts the whole write) and the reference's no-null
    * type system (`src/data.rs:10-13` has no Null variant).
    */
  def write(name: String, rows: Seq[Row]): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    rows.foreach { r =>
      if (r.length != schema.length)
        throw new IllegalArgumentException("Mismatched data type")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v = r.get(i)
        if (v == null) throw new IllegalArgumentException("Mismatched data type")
        val ok = (f.dataType.typeName, v) match {
          case ("long", _: java.lang.Long)      => true
          case ("integer", _: java.lang.Integer) => true
          case ("double", _: java.lang.Double)  => true
          case ("string", _: String)            => true
          case ("timestamp", _: java.sql.Timestamp) => true
          case ("boolean", _: java.lang.Boolean) => true
          case _ => false
        }
        if (!ok) throw new IllegalArgumentException("Mismatched data type")
      }
    }
    writeValidated(spark.createDataFrame(rows.asJava, schema), name, schema)
  }

  /** Distributed append ingest: the 100 TB path. Schema must match the
    * catalog exactly; nulls anywhere fail the batch.
    *
    * Validation strategy: a pre-scan rejects null batches BEFORE any file
    * is written (the reference aborts the whole write on a bad cell —
    * partial appends would be worse than an extra scan), and the written
    * projection additionally carries a raise_error null guard so a
    * non-deterministic source that produces nulls only on the write-time
    * evaluation still cannot land them in the table.
    */
  def write(name: String, df: DataFrame): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val anyNull = schema.fieldNames.map(col(_).isNull).reduce(_ || _)
    if (!df.filter(anyNull).isEmpty)
      throw new IllegalArgumentException("Mismatched data type")
    writeValidated(nullGuarded(df, schema), name, schema)
  }

  /** Null-guarded projection: the written plan itself raises on any null
    * cell, so a NON-DETERMINISTIC source that passes the pre-scan null
    * check cannot materialize nulls on the (separate) write-time
    * evaluation. Shared by every write path — the pre-scan gives the
    * clean whole-batch abort before any file exists; this guard makes
    * the abort airtight without persisting the input.
    */
  private def nullGuarded(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map { f =>
      when(col(f.name).isNull,
        raise_error(lit("Mismatched data type")).cast(f.dataType))
        .otherwise(col(f.name)).as(f.name)
    }.toSeq: _*)

  /** Compaction — the small-files remedy every append-only warehouse
    * needs: N appends leave N×P files whose per-file row-group statistics
    * overlap, degrading both scan planning (file-listing cost) and
    * zone-map pruning (overlapping min/max ranges prune nothing). Rewrites
    * the table as one globally range-sorted layout targeting
    * `targetFileBytes` per file, then swaps directories atomically
    * (write to `<table>.__compact`, move the old dir away, move the new
    * one in, delete the old — a crash before the final move leaves the
    * original table intact).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(name: String, targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    val dir = tableDir(name)
    if (!Files.exists(dir)) return (0, 0)
    // COMMITTED files only, on both sides of the report: superseded
    // generations retained for time travel are not part of the table —
    // counting them would make every compaction look like a no-op
    def committed: Seq[String] =
      snapshotFiles(name).getOrElse(listRelParquet(name))
    val before = committed
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(f => Files.size(dir.resolve(f))).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // read through table(): on a snapshot-committed table the manifest is
    // the truth — a raw directory read would resurrect superseded files.
    // The rewrite commits a new manifest generation; the old one stays
    // readable via tableAsOf until expireSnapshots reclaims it.
    atomicRewrite(name, table(name), schema, Some(nFiles))
    (before.size, committed.size)
  }

  /** SCD1 upsert (MERGE semantics on plain parquet): rows of `df` REPLACE
    * existing rows sharing the same `keys` values; everything else is
    * preserved. Validation matches the distributed [[write]] (schema
    * equality, whole-batch null abort); the rewrite reuses the compaction
    * swap, so readers either see the old table or the fully-merged one —
    * never a partial state.
    *
    * Scale note: this is the rewrite-on-merge form (cost O(table)); the
    * at-scale refinement is partition-scoped rewrites via
    * [[writePartitioned]] layouts (only directories containing touched
    * keys re-write), which composes with this same swap primitive.
    */
  def upsert(name: String, df: DataFrame, keys: Seq[String]): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"upsert keys must be table columns, got $keys")
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    // STAGE-AND-VALIDATE in ONE evaluation: the null-guarded projection
    // raises on any null cell while the batch is staged to an invisible
    // temp dir — the same whole-batch abort a pre-scan gives (staging
    // residue is wiped, the table untouched), but the caller's plan is
    // evaluated exactly once. Before, the pre-scan + key anti-join +
    // rewrite each re-evaluated it: three computations of a possibly
    // expensive merge plan (measured on q150's MV loop: the dominant
    // per-batch cost).
    val tmp = root.resolve(s"$name.__stage")
    def wipeTmp(): Unit = if (Files.exists(tmp))
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    wipeTmp()
    try {
      nullGuarded(df, schema).write
        .option("compression", "lz4").parquet(tmp.toString)
      val staged = spark.read.schema(
        StructType(schema.fields.map(_.copy(nullable = true))))
        .parquet(tmp.toString)
      val kept = table(name)
        .join(staged.select(keys.map(col): _*).distinct(), keys, "left_anti")
      atomicRewrite(name, kept.unionByName(staged), schema, None)
    } finally wipeTmp()
  }

  /** Keyed DELETE — the MERGE family's third verb: rows matching any key
    * tuple in `keyDf` are removed, committed through the same atomic
    * snapshot rewrite (old-or-new, the deleted version stays readable via
    * [[tableAsOf]] until [[expireSnapshots]]). `keyDf` must carry exactly
    * the key columns.
    */
  def delete(name: String, keyDf: DataFrame, keys: Seq[String]): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"delete keys must be table columns, got $keys")
    require(keyDf.schema.fieldNames.toSeq == keys,
      s"keyDf must carry exactly the key columns $keys, " +
        s"got ${keyDf.schema.fieldNames.toSeq}")
    val kept = table(name).join(keyDf.distinct(), keys, "left_anti")
    atomicRewrite(name, kept, schema, None)
  }

  /** Change-data-capture DIFF between two retained snapshot versions (the
    * Delta CDF / Iceberg changelog read, on plain parquet): one full
    * outer join of `tableAsOf(vOld)` against `vNew` (default: current) on
    * the keys, rows classified I / U / D, unchanged keys emitted not at
    * all. Output: `op`, the keys, and `before_X` / `after_X` for every
    * non-key column. The downstream of every incremental pipeline —
    * "what changed since the version I last processed" — as one keyed
    * join over two MV-sized snapshots.
    */
  def diff(name: String, keys: Seq[String], vOld: Long,
      vNew: Option[Long] = None): DataFrame = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"diff keys must be table columns, got $keys")
    val attrs = schema.fieldNames.filterNot(keys.contains).toSeq
    val o = tableAsOf(name, vOld).as("o")
    val n = vNew.map(tableAsOf(name, _)).getOrElse(table(name)).as("n")
    val cond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val oldExists = col(s"o.${keys.head}").isNotNull
    val newExists = col(s"n.${keys.head}").isNotNull
    val changed = attrs.map(a => !(col(s"o.$a") <=> col(s"n.$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, cond, "full_outer")
      .withColumn("op",
        when(!oldExists, lit("I")).when(!newExists, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(Seq(col("op")) ++
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
        attrs.flatMap(a => Seq(col(s"o.$a").as(s"before_$a"),
          col(s"n.$a").as(s"after_$a"))): _*)
  }

  /** History-preserving SCD2 upsert (the warehouse dimension-history
    * pattern): the table's pinned schema is the BUSINESS columns plus the
    * system pair (`valid_from`, `valid_to` — BIGINT versions; current
    * rows carry `valid_to = Long.MaxValue` so the no-null ingest contract
    * holds). For a delta batch at `version`:
    *   - keys whose current row differs in ANY business attribute get the
    *     old row CLOSED (`valid_to = version`) and a new current row
    *     appended (`valid_from = version`);
    *   - brand-new keys append as current;
    *   - attribute-identical rows are a NO-OP (standard SCD2 change
    *     detection — re-sending an unchanged dimension must not spawn
    *     history).
    * Point-in-time view: `valid_from <= t < valid_to`; current view:
    * `valid_to = Long.MaxValue`. Commit goes through [[atomicRewrite]]
    * (snapshot-manifest swap), so readers see old-or-new, never a mix;
    * at scale the same merge drops onto [[upsertPartitioned]]'s
    * touched-partition machinery since closures only touch the delta's
    * key partitions.
    */
  def upsertScd2(name: String, df: DataFrame, keys: Seq[String],
      version: Long): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    val sys = Seq("valid_from", "valid_to")
    require(sys.forall(schema.fieldNames.contains),
      s"SCD2 table $name must declare valid_from/valid_to BIGINT columns")
    val bizSchema = StructType(schema.fields.filterNot(f => sys.contains(f.name)))
    require(keys.nonEmpty && keys.forall(bizSchema.fieldNames.contains),
      s"upsert keys must be business columns, got $keys")
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        bizSchema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val attrs = bizSchema.fieldNames.filterNot(keys.contains).toSeq
    // stage-and-validate once, the [[upsert]] discipline
    val tmp = root.resolve(s"$name.__stage")
    def wipeTmp(): Unit = if (Files.exists(tmp))
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    wipeTmp()
    try {
      nullGuarded(df, bizSchema).write
        .option("compression", "lz4").parquet(tmp.toString)
      val staged = spark.read.schema(
        StructType(bizSchema.fields.map(_.copy(nullable = true))))
        .parquet(tmp.toString)
      val hist = table(name)
      val cur = hist.filter(col("valid_to") === Long.MaxValue)
      val past = hist.filter(col("valid_to") =!= Long.MaxValue)
      val joinCond = keys.map(k => col(s"d.$k") === col(s"c.$k"))
        .reduce(_ && _)
      val joined = staged.as("d").join(cur.as("c"), joinCond, "left_outer")
      // changed = new key (no current row) OR any attribute differs
      val isChanged = col(s"c.${keys.head}").isNull ||
        attrs.map(a => !(col(s"d.$a") <=> col(s"c.$a"))).reduce(_ || _)
      val changed = joined.filter(isChanged)
        .select(bizSchema.fieldNames.map(f => col(s"d.$f").as(f)).toSeq: _*)
      val changedKeys = changed.select(keys.map(col): _*).distinct()
      val newRows = changed
        .withColumn("valid_from", lit(version))
        .withColumn("valid_to", lit(Long.MaxValue))
        .select(schema.fieldNames.map(col).toSeq: _*)
      val closed = cur.join(changedKeys, keys, "left_semi")
        .withColumn("valid_to", lit(version))
        .select(schema.fieldNames.map(col).toSeq: _*)
      val keptCur = cur.join(changedKeys, keys, "left_anti")
      atomicRewrite(name,
        past.unionByName(keptCur).unionByName(closed).unionByName(newRows),
        schema, None)
    } finally wipeTmp()
  }

  /** Partition-scoped SCD1 upsert — the at-scale refinement [[upsert]]'s
    * scaladoc promises: on a directory-partitioned table (written via
    * [[writePartitioned]]), rows of `df` replace same-key rows and ONLY
    * the partitions `df` touches are rewritten — merge cost is
    * O(touched partitions), not O(table), which is what makes MERGE
    * affordable on a 100 TB fact table where a day's update touches a
    * handful of date partitions.
    *
    * Contract: `partitionCols ⊆ keys` — a key must not move between
    * partitions, otherwise its old row (in an untouched partition) would
    * survive alongside the new one. Enforced with `require`.
    *
    * Mechanics: the merged content of the touched partitions is staged to
    * a temp directory FIRST (the merge reads the same files the overwrite
    * would delete), then written back under dynamic partition overwrite,
    * which replaces exactly the partitions present in the staged data and
    * leaves every other directory byte-identical (asserted in DBSpec).
    *
    * The read side is O(touched partitions) STATICALLY: the touched
    * partition tuples (tiny — one row per partition) are collected to the
    * driver and pushed as a literal partition filter on the table scan, so
    * directory pruning never depends on runtime DPP deciding to fire
    * against the semi join (asserted in DBSpec: the merge scan's
    * PartitionFilters name the touched values).
    *
    * Durability contract — old-or-new, SAME strength as [[upsert]] (r5
    * verdict task 4): the merge never deletes or overwrites a live file.
    * New files are APPENDED next to the old generation, then a per-table
    * snapshot manifest (`_snapshot.json`, the Iceberg/Delta snapshot-
    * pointer idea on plain parquet) is atomically swapped to the new file
    * set — that single staged rename is the commit point, so a reader
    * sees the complete old view or the complete new view across ALL
    * touched partitions, never a mix of generations. A crash before the
    * swap leaves only invisible uncommitted files (swept by the next
    * upsert); a crash after it leaves superseded files that are equally
    * invisible through the manifest. Readers resolve the manifest in
    * [[table]]; at 100 TB the manifest is the same driver-side
    * file-listing a directory scan needs anyway, just pinned to a
    * consistent generation set.
    */
  def upsertPartitioned(name: String, df: DataFrame,
      partitionCols: Seq[String], keys: Seq[String],
      literalCap: Int = DB.UpsertPruneLiteralCap): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    require(keys.nonEmpty && keys.forall(schema.fieldNames.contains),
      s"upsert keys must be table columns, got $keys")
    require(partitionCols.nonEmpty && partitionCols.forall(keys.contains),
      s"partition columns must be part of the upsert key, got $partitionCols vs $keys")
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val dir = tableDir(name)
    // the committed view this merge starts from: the manifest if one
    // exists, else the live listing (first snapshot commit adopts it)
    val current = snapshotFiles(name).getOrElse(listRelParquet(name))
    val currentSet = current.toSet
    // sweep residue of a crashed prior merge: files referenced by NO
    // retained manifest are uncommitted — invisible to readers, safe to
    // drop (superseded-but-retained generations stay for tableAsOf and
    // are reclaimed by expireSnapshots)
    if (Files.exists(snapshotPath(name))) {
      val retained = retainedFiles(name)
      listRelParquet(name).filterNot(retained)
        .foreach(f => Files.deleteIfExists(dir.resolve(f)))
    }
    val tmp = root.resolve(s"$name.__upsert")
    def wipeTmp(): Unit = if (Files.exists(tmp))
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    wipeTmp()
    try {
      // STAGE-AND-VALIDATE the batch in ONE evaluation (see upsert): the
      // null guard raises during this invisible staging write, giving the
      // whole-batch abort without a pre-scan, and the touched-partition
      // probe + merge below re-read tiny parquet instead of re-running
      // the caller's plan
      val nullableSchema = StructType(schema.fields.map(_.copy(nullable = true)))
      nullGuarded(df, schema).write
        .option("compression", "lz4").parquet(s"$tmp/batch")
      val batch = spark.read.schema(nullableSchema).parquet(s"$tmp/batch")
      val merged = upsertMergeInput(name, batch, partitionCols, keys,
          literalCap)
        .getOrElse(return) // empty batch: nothing to merge, nothing to touch
      // The merge reads the OLD generation's files and appends NEW ones
      // (unique part names; nothing is deleted before the manifest swap
      // below — the sweep at entry only ever removes files no retained
      // manifest references), so the merged frame can be written
      // directly: the r5-era intermediate staging write+read-back of the
      // whole merged content predated the append+manifest commit and was
      // one full extra materialization per batch (measured: the dominant
      // single-task stages of q156/q185's profile). A failure mid-write
      // leaves only unreferenced files — swept by the next merge, same
      // as a failed staging write.
      val sortCols = (partitionCols ++
        schema.fieldNames.filterNot(partitionCols.contains)).map(col)
      merged
        .repartition(partitionCols.map(col): _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode("append").option("compression", "lz4")
        .partitionBy(partitionCols: _*)
        .parquet(dir.toString)
      // every touched partition carries ≥1 batch row, so the new
      // generation's directories are exactly the touched partitions
      val newFiles = listRelParquet(name).filterNot(currentSet)
      val replacedDirs = newFiles.map(parentRel).toSet
      val (superseded, kept) =
        current.partition(f => replacedDirs.contains(parentRel(f)))
      commitSnapshot(name, kept ++ newFiles) // ← THE commit point
      // superseded files stay on disk: the previous version's retained
      // manifest still references them (tableAsOf), and expireSnapshots
      // is the reclamation point — the Iceberg lifecycle
      locally { val _ = superseded }
    } finally wipeTmp() // staging residue must not outlive a failed merge
  }

  /** The partition-pruned merge input for [[upsertPartitioned]]: current
    * rows of the TOUCHED partitions only, minus same-key rows, plus the
    * batch. Exposed for DBSpec's pruning assertion. Returns None for an
    * empty batch.
    *
    * Prune form is capacity-tiered: up to `literalCap` touched
    * partitions, the touched tuples are collected (one small driver
    * round trip, one row per touched partition) and pushed as a literal
    * filter — static partition pruning the planner can never decline.
    * ABOVE the cap, a collected disjunction would itself be the problem
    * (a 10⁵-term filter is a pathological plan: analysis/codegen cost
    * scales with plan size, and the driver holds every tuple), so the
    * prune switches to a broadcast-semi-join of the touched-partition
    * frame against the table — runtime DPP/semi-join pruning instead of
    * static pruning, the right trade once the touched set is no longer
    * plan-sized. The cap is a parameter so the fallback is testable
    * without staging a thousand partition directories.
    */
  private[graft] def upsertMergeInput(name: String, batch: DataFrame,
      partitionCols: Seq[String], keys: Seq[String],
      literalCap: Int = DB.UpsertPruneLiteralCap): Option[DataFrame] = {
    val touchedDf = batch.select(partitionCols.map(col): _*).distinct()
    // collect at most cap+1 tuples: enough to decide the tier without
    // ever materializing an unbounded touched list on the driver
    val touched = touchedDf.limit(literalCap + 1).collect()
    if (touched.isEmpty) None
    else {
      val pruned =
        if (touched.length <= literalCap) {
          val prune = touched.map(r =>
            partitionCols.zipWithIndex
              .map { case (c, i) => col(c) === lit(r.get(i)) }
              .reduce(_ && _))
            .reduce(_ || _)
          table(name).filter(prune)
        } else
          table(name).join(
            org.apache.spark.sql.functions.broadcast(touchedDf),
            partitionCols, "left_semi")
      val kept = pruned
        .join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
      Some(kept.unionByName(batch))
    }
  }

  /** Z-ordered (Morton-curve) ingest: rows sort by the bit-interleave of
    * two long columns, so per-file min/max ranges stay tight on BOTH
    * dimensions — a filter on EITHER column prunes files/row-groups,
    * where a linear sort only ever prunes on its leading column. This is
    * the multi-dimensional clustering layout (Databricks OPTIMIZE ZORDER,
    * Iceberg sort orders) expressed as a pure Column expression: the
    * classic mask-spread interleave, 12 bitwise ops per row, whole-stage
    * codegen, no UDF.
    *
    * Same validation as [[write]]; appends compose (re-[[compact]] after
    * many appends to restore global clustering).
    */
  def writeZOrdered(name: String, df: DataFrame, colA: String,
      colB: String): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    require(Seq(colA, colB).forall(c => schema.fields.exists(f =>
      f.name == c && f.dataType.typeName == "long")),
      s"z-order columns must be long table columns, got $colA/$colB")
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val anyNull = schema.fieldNames.map(col(_).isNull).reduce(_ || _)
    if (!df.filter(anyNull).isEmpty)
      throw new IllegalArgumentException("Mismatched data type")
    val z = DB.zValue(col(colA), col(colB))
    val before = if (Files.exists(snapshotPath(name)))
      Some(listRelParquet(name).toSet) else None
    nullGuarded(df, schema).withColumn("__z", z)
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("append").option("compression", "lz4")
      .parquet(tableDir(name).toString)
    before.foreach { b =>
      val cur = snapshotFiles(name).getOrElse(Seq.empty)
      commitSnapshot(name, cur ++ listRelParquet(name).filterNot(b))
    }
  }

  private def parquetFiles(p: Path): Seq[Path] =
    Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet")).toSeq

  /** write `df` as the table's new range-sorted contents, then swap
    * directories atomically (temp write → move-aside → move-in → delete;
    * a crash before the final move leaves the original table intact)
    */
  private def atomicRewrite(name: String, df: DataFrame, schema: StructType,
      nFiles: Option[Int]): Unit = {
    val dir = tableDir(name)
    val sortCols = schema.fieldNames.map(col).toSeq
    // sweep residue no retained manifest references (crashed commits,
    // expired generations) — the upsertPartitioned preamble
    if (Files.exists(snapshotPath(name))) {
      val retained = retainedFiles(name)
      listRelParquet(name).filterNot(retained)
        .foreach(f => Files.deleteIfExists(dir.resolve(f)))
    }
    val tmp = root.resolve(s"$name.__rewrite")
    // When the caller doesn't pin a file count, derive it from the
    // COMMITTED generation's size (≈ the rewrite's size for merge-style
    // rewrites; superseded-but-retained files must not inflate it):
    // file count scales with data at 100 TB, while a small table
    // rewrites to ONE file instead of spark.sql.shuffle.partitions
    // shards — an upsert loop on an MV-sized table otherwise pays a
    // range-sampling job plus a 32-tiny-file write+read per merge
    // (measured: the dominant cost of q150's maintenance steps).
    val n = nFiles.getOrElse {
      val bytes =
        if (!Files.exists(dir)) 0L
        else snapshotFiles(name) match {
          case Some(files) => files.map(f => Files.size(dir.resolve(f))).sum
          case None => parquetFiles(dir).map(Files.size).sum
        }
      math.max(1, math.ceil(bytes.toDouble / (128L * 1024 * 1024)).toInt)
    }
    // stage the rewrite FIRST (it reads the generation it supersedes),
    // then adopt the staged part-files next to the old generation and
    // swap the snapshot manifest — the commit point. Old files stay on
    // disk for retained manifests ([[tableAsOf]]); [[expireSnapshots]]
    // is the reclamation point. This gives every rewrite verb (upsert,
    // SCD2, delete, compact) the same old-or-new durability AND time
    // travel as the partitioned merge path.
    def wipeTmp(): Unit = if (Files.exists(tmp))
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    wipeTmp()
    try {
      df.repartitionByRange(n, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode("overwrite").option("compression", "lz4")
        .parquet(tmp.toString)
      Files.createDirectories(dir)
      val gen = s"g${currentVersion(name) + 1}"
      val newFiles = parquetFiles(tmp).map { p =>
        val nm = s"$gen-${p.getFileName}"
        Files.move(p, dir.resolve(nm))
        nm
      }
      commitSnapshot(name, newFiles)
    } finally wipeTmp()
  }

  /** Range-sorted LZ4 Parquet append — realizes `README.md:44`'s sort
    * contract so min/max pruning works (SURVEY.md §1.3, §7.4.3).
    */
  private def writeValidated(df: DataFrame, name: String, schema: StructType): Unit = {
    val sortCols = schema.fieldNames.map(col).toSeq
    // snapshot-committed tables (a prior rewrite/merge versioned them):
    // an append must join the manifest or it would be invisible — record
    // the physical listing BEFORE the write so only THIS batch's files
    // are adopted (the writePartitioned discipline)
    val before = if (Files.exists(snapshotPath(name)))
      Some(listRelParquet(name).toSet) else None
    df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write
      .mode("append")
      .option("compression", "lz4")
      .parquet(tableDir(name).toString)
    before.foreach { b =>
      val cur = snapshotFiles(name).getOrElse(Seq.empty)
      commitSnapshot(name, cur ++ listRelParquet(name).filterNot(b))
    }
  }

  /** Bucketed ingest: hash-bucket the table by `bucketCols` into `numBuckets`
    * files, sorted within buckets. Joins and aggregations between tables
    * bucketed the same way on the same keys then run WITHOUT a shuffle —
    * the co-located-join layout that matters most at 100 TB (a fact-fact
    * join at that scale is otherwise a full-network shuffle of both sides).
    *
    * Registered in the Spark session catalog (bucketing metadata lives
    * there); data files land under the warehouse dir configured by the
    * session. Batch-validates like [[write]].
    */
  /** Directory-partitioned append ingest (`{table}/{col}={value}/...`):
    * coarse-grained data skipping — filters on the partition columns prune
    * whole directories before any file is opened (PartitionFilters in the
    * scan, asserted in DBSpec). The complement of the range-sort layout:
    * partition on low-cardinality operational keys (date, category),
    * range-sort within partitions for row-group pruning on the rest.
    */
  def writePartitioned(name: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val anyNull = schema.fieldNames.map(col(_).isNull).reduce(_ || _)
    if (!df.filter(anyNull).isEmpty)
      throw new IllegalArgumentException("Mismatched data type")
    // partition columns FIRST in the in-partition sort: the dynamic-
    // partition writer requires ordering by them, so leading with them
    // means our sort satisfies that requirement (no second SortExec) and
    // the data-column ordering inside each directory is preserved exactly
    val sortCols = (partitionCols ++
      schema.fieldNames.filterNot(partitionCols.contains)).map(col)
    // snapshot-committed tables: record the physical listing BEFORE the
    // append so only THIS batch's files join the manifest — residue from
    // a crashed merge must stay invisible, not get adopted
    val before = if (Files.exists(snapshotPath(name)))
      Some(listRelParquet(name).toSet) else None
    nullGuarded(df, schema).repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
      .write
      .mode("append")
      .option("compression", "lz4")
      .partitionBy(partitionCols: _*)
      .parquet(tableDir(name).toString)
    before.foreach { b =>
      val cur = snapshotFiles(name).get
      commitSnapshot(name, cur ++ listRelParquet(name).filterNot(b))
    }
  }

  /** Partition-preserving compaction — the small-files remedy for
    * DIRECTORY-PARTITIONED tables, where [[compact]]'s whole-table
    * range-sort rewrite would flatten the layout (and with it every
    * PartitionFilters prune). Each partition's committed files are
    * rewritten into one output file per partition (append-only new
    * generation, partition columns re-derived from the directory names),
    * then a SINGLE snapshot-manifest swap commits every compacted
    * partition at once — readers see the complete old file set or the
    * complete new one, exactly the [[upsertPartitioned]] discipline. At
    * 100 TB this is the nightly maintenance job: N streaming appends
    * leave N small files per partition whose row-group stats overlap;
    * compaction restores one well-sorted file per partition without ever
    * taking the table offline or touching partitions that are already
    * compact.
    *
    * Returns (committedFilesBefore, committedFilesAfter).
    */
  def compactPartitions(name: String): (Int, Int) = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    val dir = tableDir(name)
    if (!Files.exists(dir)) return (0, 0)
    val current = snapshotFiles(name).getOrElse(listRelParquet(name))
    val currentSet = current.toSet
    // sweep uncommitted residue first (crashed merge/compact leftovers);
    // retained-manifest generations stay (tableAsOf / expireSnapshots)
    if (Files.exists(snapshotPath(name))) {
      val retained = retainedFiles(name)
      listRelParquet(name).filterNot(retained)
        .foreach(f => Files.deleteIfExists(dir.resolve(f)))
    }
    val byPart = current.groupBy(parentRel)
    require(!byPart.contains(""),
      s"compactPartitions requires a directory-partitioned table; " +
        s"'$name' has files at the table root (use compact)")
    val victims = byPart.filter { case (_, fs) => fs.size > 1 }
    if (victims.isEmpty) return (current.size, current.size)
    // partition column names, from the directory structure itself
    val partitionCols = victims.head._1.split('/').map(_.split("=")(0)).toSeq
    val victimFiles = victims.values.flatten.toSeq
    spark.read.option("basePath", dir.toString).schema(schema)
      .parquet(victimFiles.map(f => dir.resolve(f).toString): _*)
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++
        schema.fieldNames.filterNot(partitionCols.contains)).map(col): _*)
      .write.mode("append").option("compression", "lz4")
      .partitionBy(partitionCols: _*)
      .parquet(dir.toString)
    val newFiles = listRelParquet(name).filterNot(currentSet)
    val compactedDirs = victims.keySet
    val kept = current.filterNot(f => compactedDirs.contains(parentRel(f)))
    commitSnapshot(name, kept ++ newFiles) // ← THE commit point
    // victims remain referenced by the pre-compaction retained manifest;
    // expireSnapshots reclaims them (compaction changes LAYOUT, and
    // time travel must still see the pre-compaction layout)
    (current.size, kept.size + newFiles.size)
  }

  /** session-catalog identifier for a bucketed table, unique per DB root */
  private def bucketedName(name: String): String =
    s"graft_${name}_${java.lang.Integer.toHexString(root.toString.hashCode)}"

  def writeBucketed(name: String, df: DataFrame, numBuckets: Int,
      bucketCols: Seq[String]): Unit = {
    val schema = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table not found: $name"))
    if (df.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalArgumentException("Mismatched data type")
    val anyNull = schema.fieldNames.map(col(_).isNull).reduce(_ || _)
    if (!df.filter(anyNull).isEmpty)
      throw new IllegalArgumentException("Mismatched data type")
    val cat = bucketedName(name)
    spark.sql(s"DROP TABLE IF EXISTS $cat")
    nullGuarded(df, schema).write
      .mode("overwrite")
      .option("compression", "lz4")
      // external table: data lives under the DB root, not the warehouse dir
      .option("path", tableDir(s"$name.bucketed").toString)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(cat)
  }

  /** Scan of a bucketed table written by [[writeBucketed]] — carries the
    * bucketing metadata, so equi-joins/aggs on the bucket keys skip the
    * exchange (asserted in DBSpec).
    */
  def bucketedTable(name: String): DataFrame =
    spark.table(bucketedName(name))
}

object DB {

  /** [[DB.upsertMergeInput]]'s tier boundary: the most touched-partition
    * tuples worth pushing as a collected literal disjunction before the
    * plan itself becomes the cost (each literal term is an analysis +
    * codegen node, and the driver holds the whole list). ~1000 terms is
    * comfortably plan-sized; beyond it the broadcast-semi-join prune wins.
    */
  val UpsertPruneLiteralCap = 1000

  /** Morton (Z-order) value: bit-interleave of the low 32 bits of two
    * longs — `spread(a) | spread(b) << 1` with the classic mask-spread
    * ladder. Pure Column arithmetic (codegen'd); inputs beyond 32 bits
    * contribute their low 32 (the curve's usual domain contract — rank or
    * bucket wider keys first).
    */
  def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var v = x.bitwiseAND(lit(0xFFFFFFFFL))
      v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
      v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
      v
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Create a database: writes `metadata.json` holding every table's schema
    * (≙ `DB::init`, `/root/reference/src/lib.rs:31-38`).
    */
  def init(path: String, tables: Seq[(String, StructType)])(
      implicit spark: SparkSession): DB = {
    val root = Paths.get(path)
    Files.createDirectories(root)
    Catalog.write(root, tables)
    new DB(root, spark)
  }

  /** Open an existing database (≙ `DB::open`, `/root/reference/src/lib.rs:22-29`);
    * fails if `metadata.json` is absent, like the reference's
    * `fs::read_to_string` error path (`src/metadata.rs:46`).
    */
  def open(path: String)(implicit spark: SparkSession): DB = {
    val root = Paths.get(path)
    if (!Files.exists(Catalog.metadataFile(root)))
      throw new IllegalArgumentException(s"No database at $path")
    new DB(root, spark)
  }
}

/** `metadata.json` codec — same role as the reference's serde round-trip
  * (`/root/reference/src/metadata.rs:44-76`), with Spark `StructType` JSON
  * as the per-table schema encoding.
  *
  * Shape: `{"tables": [{"name": "...", "schema": <StructType.json>}]}`.
  */
object Catalog {
  private val mapper = new ObjectMapper()

  def metadataFile(root: Path): Path = root.resolve("metadata.json")

  def write(root: Path, tables: Seq[(String, StructType)]): Unit = {
    val doc = mapper.createObjectNode()
    val arr = doc.putArray("tables")
    tables.foreach { case (name, schema) =>
      val t = arr.addObject()
      t.put("name", name)
      t.set[ObjectNode]("schema", mapper.readTree(schema.json).asInstanceOf[ObjectNode])
    }
    Files.writeString(metadataFile(root),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc))
  }

  def read(root: Path): Map[String, StructType] = {
    val doc = mapper.readTree(Files.readString(metadataFile(root)))
    doc.get("tables").elements().asScala.map { t =>
      t.get("name").asText() ->
        DataType.fromJson(t.get("schema").toString).asInstanceOf[StructType]
    }.toMap
  }
}
