package graft.sources.rtcdb

import java.io.RandomAccessFile
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Count}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import RtcdbFormat._

/** DataSource V2 reader for the rtcdb on-disk format — the query pipeline
  * the reference *declares* (`/root/reference/README.md:51-62`) but never
  * shipped (its read path is dead code, SURVEY.md §1.4.2), expressed as a
  * first-class Spark source:
  *
  *  - **column pruning** (README stage "read only needed columns"): only
  *    the requested columns' `.data`/`.index` files are ever opened —
  *    [[SupportsPushDownRequiredColumns]];
  *  - **zone-map block skipping** (README stages 1-2: index range location
  *    + min/max filtering): pushed filters are evaluated against each
  *    block's 40-byte index entry on the driver and non-qualifying blocks
  *    are never read — [[SupportsPushDownFilters]]. String zone maps are
  *    8-byte prefixes, so string pruning is conservative (a block is only
  *    skipped when the prefix comparison *proves* no row matches); all
  *    filters are also left in the plan for exact row-level evaluation
  *    (README stage 3 = Spark's FilterExec);
  *  - blocks are split across input partitions for parallel scan — the
  *    stage the single-threaded reference could never reach.
  *
  * Usage:
  * `spark.read.format("rtcdb").option("path", root).option("table", t).load()`
  */
class RtcdbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rtcdb"

  private def tableOf(options: CaseInsensitiveStringMap): (String, String, StructType) = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("rtcdb: 'path' option required"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("rtcdb: 'table' option required"))
    val schema = readMetadata(Paths.get(root)).toMap.getOrElse(table,
      throw new IllegalArgumentException(s"Table not found: $table"))
    (root, table, schema)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableOf(options)._3

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (root, table, declared) = tableOf(opts)
    new RtcdbTable(root, table, declared)
  }
}

class RtcdbTable(root: String, table: String, declared: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"rtcdb:$table"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RtcdbScanBuilder(root, table, declared)
}

class RtcdbScanBuilder(root: String, table: String, declared: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = declared
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Seq[RtcdbAggSpec]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept comparisons on declared columns for block pruning; zone maps
    // are conservative, so EVERY filter stays a residual for row-level eval
    pushed = filters.filter {
      case EqualTo(a, _)            => declared.fieldNames.contains(a)
      case GreaterThan(a, _)        => declared.fieldNames.contains(a)
      case GreaterThanOrEqual(a, _) => declared.fieldNames.contains(a)
      case LessThan(a, _)           => declared.fieldNames.contains(a)
      case LessThanOrEqual(a, _)    => declared.fieldNames.contains(a)
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  // ── aggregate pushdown: answer COUNT/MIN/MAX from the index alone ──────
  // The reference's design goal is "fast aggregate queries" backed by the
  // sparse index (/root/reference/README.md:8,44). Its zone maps make
  // global COUNT(*)/COUNT(col)/MIN/MAX on uint64 columns answerable from
  // the 40-byte index entries without touching ANY data block:
  //  - row count: Σ decompressed_size/8 over a uint64 column's entries
  //    (fixed 8-byte codec, src/storage.rs:372-374);
  //  - min/max: fold of exact per-block zone maps (src/storage.rs:277-290).
  // String min/max are 8-byte PREFIXES (truncated, src/storage.rs:30-37) —
  // not exact values — so they are never pushed. Filters or grouping force
  // row-level evaluation, so those plans are not pushed either.
  private def parseAgg(agg: Aggregation): Option[Seq[RtcdbAggSpec]] = {
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty) return None
    val longCols = declared.fields.filter(_.dataType == LongType).map(_.name)
    if (longCols.isEmpty) return None // row counts need a fixed-width column
    def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames.head)
        case _ => None
      }
    val specs = agg.aggregateExpressions.map {
      case _: CountStar => Some(RtcdbCountAll(longCols.head))
      case c: Count if !c.isDistinct =>
        // rtcdb columns are non-nullable (no Null DValue, data.rs:10-13),
        // so COUNT(col) ≡ COUNT(*)
        refName(c.column).filter(declared.fieldNames.contains)
          .map(_ => RtcdbCountAll(longCols.head))
      case m: Min => refName(m.column).filter(longCols.contains)
        .map(RtcdbMinLong)
      case m: Max => refName(m.column).filter(longCols.contains)
        .map(RtcdbMaxLong)
      case _ => None
    }
    if (specs.forall(_.isDefined)) Some(specs.flatten.toSeq) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    parseAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    parseAgg(agg) match {
      case some @ Some(_) => pushedAgg = some; true
      case None => false
    }
  }

  override def build(): Scan = pushedAgg match {
    case Some(specs) => new RtcdbAggScan(root, table, declared, specs)
    case None => new RtcdbScan(root, table, declared, required, pushed)
  }
}

sealed trait RtcdbAggSpec extends Serializable
/** COUNT(*): row count derived from `countVia`'s fixed-width entries */
final case class RtcdbCountAll(countVia: String) extends RtcdbAggSpec
final case class RtcdbMinLong(col: String) extends RtcdbAggSpec
final case class RtcdbMaxLong(col: String) extends RtcdbAggSpec

final case class RtcdbAggPartition(values: Array[Long], isNull: Array[Boolean])
    extends InputPartition

/** Index-only aggregate scan: one driver-side pass over the (tiny) index
  * files, one single-row partition out. Data files are never opened —
  * RtcdbSourceSpec proves it by deleting them first.
  */
class RtcdbAggScan(root: String, table: String, declared: StructType,
    specs: Seq[RtcdbAggSpec]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(specs.map {
    case RtcdbCountAll(_) => StructField("count", LongType, nullable = false)
    case RtcdbMinLong(c)  => StructField(s"min_$c", LongType, nullable = true)
    case RtcdbMaxLong(c)  => StructField(s"max_$c", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"rtcdb table=$table PushedAggregates=[${specs.mkString(", ")}] (index-only)"

  private def entriesOf(col: String): Array[IndexEntry] = {
    val bytes = Files.readAllBytes(indexPath(Paths.get(root), table, col))
    bytes.grouped(IndexEntryBytes).filter(_.length == IndexEntryBytes)
      .map(IndexEntry.fromBytes).toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // scan length = shortest column across the WHOLE table (the reference's
    // loop-termination rule, src/storage.rs:313-322). The row scan enforces
    // this; truncate here too so a pushed COUNT/MIN/MAX can never disagree
    // with the same query computed through the row path. Columns not named
    // by the aggregate contribute via index-file size only (missing index
    // ⇒ no constraint, matching the row scan).
    // a table directory with NO index files at all is an empty table (the
    // row scan reads it as zero rows): minOption, not .min, so a pushed
    // COUNT(*) returns 0 instead of throwing on the empty collection
    val nBlocks = declared.fieldNames.flatMap { c =>
      val p = indexPath(Paths.get(root), table, c)
      if (Files.exists(p)) Some((Files.size(p) / IndexEntryBytes).toInt)
      else None
    }.minOption.getOrElse(0)
    val cache = scala.collection.mutable.Map.empty[String, Array[IndexEntry]]
    def entries(c: String) =
      cache.getOrElseUpdate(c, entriesOf(c).take(nBlocks))
    def guard(c: String, es: Array[IndexEntry]): Unit = es.foreach { e =>
      if (java.nio.ByteBuffer.wrap(e.min).getLong < 0 ||
          java.nio.ByteBuffer.wrap(e.max).getLong < 0)
        throw new IllegalStateException(
          s"rtcdb: column '$c' holds uint64 values >= 2^63, which are not " +
            "representable as Spark LongType; refusing to read")
    }
    val results = specs.map {
      case RtcdbCountAll(via) =>
        // fixed 8-byte big-endian codec ⇒ decompressed bytes / 8 = rows.
        // Block-grain consistency contract: every writer (reference
        // storage.rs and RtcdbFormat alike) emits the SAME rows-per-block
        // for every column of a block, so counting via any one long column
        // agrees with the row path; a hand-corrupted store that violates
        // this diverges in both paths equally (each sizes block k by one
        // column's entry k).
        (entries(via).map(_.decompressedSize / 8).sum, false)
      case RtcdbMinLong(c) =>
        val es = entries(c); guard(c, es)
        if (es.isEmpty) (0L, true)
        else (es.map(e => java.nio.ByteBuffer.wrap(e.min).getLong).min, false)
      case RtcdbMaxLong(c) =>
        val es = entries(c); guard(c, es)
        if (es.isEmpty) (0L, true)
        else (es.map(e => java.nio.ByteBuffer.wrap(e.max).getLong).max, false)
    }
    Array(RtcdbAggPartition(results.map(_._1).toArray,
      results.map(_._2).toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RtcdbAggReaderFactory
}

class RtcdbAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RtcdbAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      private val row = new GenericInternalRow(
        p.values.indices.map(i =>
          if (p.isNull(i)) null else p.values(i): Any).toArray)
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** test/observability hook: block counts from the most recent planning */
object RtcdbScanStats {
  val plannedBlocks = new AtomicLong(0)
  val prunedBlocks = new AtomicLong(0)
  val runtimeFilteredScans = new AtomicLong(0)
  def reset(): Unit = {
    plannedBlocks.set(0); prunedBlocks.set(0); runtimeFilteredScans.set(0)
  }
}

final case class RtcdbColSpec(name: String, isLong: Boolean, dataPath: String)
final case class RtcdbBlockSpec(entries: Array[IndexEntry])
final case class RtcdbInputPartition(cols: Array[RtcdbColSpec],
    blocks: Array[RtcdbBlockSpec]) extends InputPartition

class RtcdbScan(root: String, table: String, declared: StructType,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch
    with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"rtcdb table=$table cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"

  // ── runtime filtering (DSv2 dynamic pruning) ───────────────────────────
  // A broadcast-join build side's key set arrives here AFTER that side has
  // executed (AQE re-plan): blocks whose zone map contains none of the keys
  // are dropped before any data file is opened — the reference's sparse
  // index doing the work of dynamic partition pruning. Only uint64 columns
  // participate (string zone maps are 8-byte prefixes; equality can't be
  // proven, only range-disproven — not worth advertising for runtime IN).
  private var runtimeInSets: Map[String, Array[Long]] = Map.empty

  override def filterAttributes(): Array[NamedReference] =
    // only columns of the PRUNED output schema: Spark resolves these against
    // the scan's output, so advertising a pruned-away column fails analysis
    required.fields.filter(_.dataType == LongType)
      .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
    val sets = predicates.flatMap { p =>
      p.name() match {
        case "IN" => p.children().toSeq match {
          case Seq(ref: NamedReference, rest @ _*)
              if ref.fieldNames.length == 1 &&
                rest.forall(_.isInstanceOf[V2Literal[_]]) =>
            val vals = rest.collect {
              case l: V2Literal[_] if l.value().isInstanceOf[Long] =>
                l.value().asInstanceOf[Long]
            }.toArray
            if (vals.length == rest.size) Some(ref.fieldNames.head -> vals)
            else None
          case _ => None
        }
        case "=" => p.children().toSeq match {
          case Seq(ref: NamedReference, l: V2Literal[_])
              if ref.fieldNames.length == 1 && l.value().isInstanceOf[Long] =>
            Some(ref.fieldNames.head -> Array(l.value().asInstanceOf[Long]))
          case _ => None
        }
        case _ => None
      }
    }
    // intersect across predicates in this call AND any earlier filter()
    // call — Spark may deliver runtime filters from different joins in
    // separate invocations, and each one can only shrink the key sets
    val incoming = sets.groupBy(_._1).map { case (c, vs) =>
      c -> vs.map(_._2.toSet).reduce(_ intersect _)
    }
    runtimeInSets = (runtimeInSets.keySet ++ incoming.keySet).iterator.map {
      c =>
        val merged = (runtimeInSets.get(c).map(_.toSet).toSeq ++
          incoming.get(c).toSeq).reduce(_ intersect _)
        c -> merged.toArray.sorted
    }.toMap
  }

  /** columns the reader must materialize: the required schema, or the first
    * declared column for count-only scans (row counts still need one column)
    */
  private def outputColNames: Array[String] =
    if (required.fieldNames.isEmpty) Array(declared.fieldNames.head)
    else required.fieldNames

  /** columns whose index entries we need: output cols ∪ filtered cols (the
    * union guarantees every output column has entries even if Spark ever
    * prunes the schema below the filtered columns)
    */
  private def plannedCols: Array[String] = {
    val filterCols = pushed.flatMap {
      case EqualTo(a, _) => Some(a)
      case GreaterThan(a, _) => Some(a)
      case GreaterThanOrEqual(a, _) => Some(a)
      case LessThan(a, _) => Some(a)
      case LessThanOrEqual(a, _) => Some(a)
      case _ => None
    }
    (outputColNames ++ filterCols ++ runtimeInSets.keys).distinct
  }

  /** any value of the (sorted) runtime key set inside the block's range? */
  private def anyKeyInRange(sorted: Array[Long], mn: Long, mx: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(sorted, mn)
    val from = if (i >= 0) i else -(i + 1)
    from < sorted.length && sorted(from) <= mx
  }

  private def isLongCol(name: String): Boolean =
    declared(name).dataType == LongType

  private def entriesOf(col: String): Array[IndexEntry] = {
    val bytes = Files.readAllBytes(indexPath(Paths.get(root), table, col))
    bytes.grouped(IndexEntryBytes).filter(_.length == IndexEntryBytes)
      .map(IndexEntry.fromBytes).toArray
  }

  /** can any row in this block satisfy the filter? (false ⇒ provably none) */
  private def blockMayMatch(col: String, e: IndexEntry, f: Filter): Boolean = {
    if (isLongCol(col)) {
      val mn = java.nio.ByteBuffer.wrap(e.min).getLong
      val mx = java.nio.ByteBuffer.wrap(e.max).getLong
      f match {
        case EqualTo(`col`, v: Long)            => v >= mn && v <= mx
        case GreaterThan(`col`, v: Long)        => mx > v
        case GreaterThanOrEqual(`col`, v: Long) => mx >= v
        case LessThan(`col`, v: Long)           => mn < v
        case LessThanOrEqual(`col`, v: Long)    => mn <= v
        case _ => true
      }
    } else {
      // 8-byte prefix zone map: skip only when the prefix order PROVES
      // emptiness (prefix(a) < prefix(b) ⇒ a < b; equal prefixes prove
      // nothing)
      def p(v: Any): Array[Byte] = prefix8(v.asInstanceOf[String])
      f match {
        case EqualTo(`col`, v) =>
          !(compareBytes(p(v), e.min) < 0 || compareBytes(p(v), e.max) > 0)
        case GreaterThan(`col`, v)        => !(compareBytes(e.max, p(v)) < 0)
        case GreaterThanOrEqual(`col`, v) => !(compareBytes(e.max, p(v)) < 0)
        case LessThan(`col`, v)           => !(compareBytes(e.min, p(v)) > 0)
        case LessThanOrEqual(`col`, v)    => !(compareBytes(e.min, p(v)) > 0)
        case _ => true
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val cols = plannedCols
    val perCol = cols.map(c => c -> entriesOf(c)).toMap
    // u64 guard: the reference format allows values >= 2^63, but those decode
    // negative as Spark LongType and invert zone-map ordering (signed vs
    // unsigned). The write path already rejects them; reject such files at
    // read time too instead of silently mis-pruning / mis-decoding.
    for ((c, es) <- perCol if isLongCol(c); e <- es) {
      if (java.nio.ByteBuffer.wrap(e.min).getLong < 0 ||
          java.nio.ByteBuffer.wrap(e.max).getLong < 0)
        throw new IllegalStateException(
          s"rtcdb: column '$c' holds uint64 values >= 2^63, which are not " +
            "representable as Spark LongType; refusing to read")
    }
    // scan length = shortest column across the WHOLE table, not just the
    // projected subset. The reference stops at the shortest column *being
    // read* (src/storage.rs:313-322), which makes row counts depend on the
    // projection for inconsistent tables — a §1.4-class defect we don't
    // replicate. Equal for consistent writes; table-wide min keeps every
    // projection (and the pushed-aggregate path) in agreement otherwise.
    // Unplanned columns contribute via index-file SIZE only (40 B/entry,
    // one stat call) — their data files are never touched, and a missing
    // index (column physically removed) simply can't constrain the scan.
    val nBlocks =
      if (perCol.isEmpty) 0
      else declared.fieldNames.flatMap { c =>
        perCol.get(c).map(_.length).orElse {
          val p = indexPath(Paths.get(root), table, c)
          if (Files.exists(p)) Some((Files.size(p) / IndexEntryBytes).toInt)
          else None
        }
      }.min

    val colFilters: Map[String, Array[Filter]] = pushed.groupBy {
      case EqualTo(a, _) => a
      case GreaterThan(a, _) => a
      case GreaterThanOrEqual(a, _) => a
      case LessThan(a, _) => a
      case LessThanOrEqual(a, _) => a
      case _ => ""
    }

    val outputCols = outputColNames.map(c => RtcdbColSpec(c, isLongCol(c),
      dataPath(Paths.get(root), table, c).toString))

    val surviving = (0 until nBlocks).filter { b =>
      colFilters.forall { case (c, fs) =>
        c.isEmpty || fs.forall(f => blockMayMatch(c, perCol(c)(b), f))
      } && runtimeInSets.forall { case (c, keys) =>
        !isLongCol(c) || {
          val e = perCol(c)(b)
          anyKeyInRange(keys,
            java.nio.ByteBuffer.wrap(e.min).getLong,
            java.nio.ByteBuffer.wrap(e.max).getLong)
        }
      }
    }
    RtcdbScanStats.plannedBlocks.addAndGet(surviving.size.toLong)
    RtcdbScanStats.prunedBlocks.addAndGet((nBlocks - surviving.size).toLong)
    if (runtimeInSets.nonEmpty)
      RtcdbScanStats.runtimeFilteredScans.incrementAndGet()

    val blockSpecs = surviving.map { b =>
      RtcdbBlockSpec(outputCols.map(c => perCol(c.name)(b)))
    }.toArray

    // chunk contiguous block runs across the default parallelism
    val parallelism = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    val slices = math.max(1, math.min(blockSpecs.length, parallelism))
    val perSlice = math.ceil(blockSpecs.length.toDouble / slices).toInt
    if (blockSpecs.isEmpty) Array.empty
    else blockSpecs.grouped(perSlice)
      .map(bs => RtcdbInputPartition(outputCols, bs): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RtcdbReaderFactory(required.fieldNames.isEmpty)
}

class RtcdbReaderFactory(countOnly: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RtcdbPartitionReader(partition.asInstanceOf[RtcdbInputPartition], countOnly)
}

class RtcdbPartitionReader(part: RtcdbInputPartition, countOnly: Boolean)
    extends PartitionReader[InternalRow] {

  private val files = part.cols.map(c => new RandomAccessFile(c.dataPath, "r"))
  private var blockIdx = -1
  private var rows: Array[InternalRow] = Array.empty
  private var rowIdx = 0
  private val empty = InternalRow.empty

  private def loadNextBlock(): Boolean = {
    blockIdx += 1
    if (blockIdx >= part.blocks.length) return false
    val spec = part.blocks(blockIdx)
    val colVals: Array[Array[Any]] = part.cols.zipWithIndex.map { case (c, i) =>
      val raw = readBlock(files(i), spec.entries(i))
      if (c.isLong) decodeLongs(raw).map(_.asInstanceOf[Any])
      else decodeStringBytes(raw)
        .map(UTF8String.fromBytes(_).asInstanceOf[Any])
    }
    val n = colVals.head.length
    rows = Array.tabulate(n) { r =>
      if (countOnly) empty
      else new GenericInternalRow(part.cols.indices.map(c => colVals(c)(r)).toArray)
    }
    rowIdx = 0
    true
  }

  override def next(): Boolean = {
    while (rowIdx >= rows.length) if (!loadNextBlock()) return false
    true
  }

  override def get(): InternalRow = {
    val r = rows(rowIdx); rowIdx += 1; r
  }

  override def close(): Unit = files.foreach(_.close())
}
