package graft.sources.rtcdb

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import net.jpountz.lz4.LZ4Factory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The rtcdb on-disk format, re-implemented from the reference's behavior
  * (NOT a code port):
  *
  *  - one `{table}.{col}.data` + `{table}.{col}.index` file pair per column
  *    (`/root/reference/src/storage.rs:353-359`), in the DB root;
  *  - values: u64 → 8-byte big-endian; string → u32-BE length prefix +
  *    UTF-8 bytes (`src/storage.rs:361-394`);
  *  - blocks of 1024 rows (`src/storage.rs:17`), each column's block buffer
  *    LZ4 block-compressed (`src/storage.rs:264-268`; lz4-java's raw block
  *    format is the same LZ4 block spec as the reference's lz4_flex);
  *  - a 40-byte big-endian index entry per block per column:
  *    start_position, compressed_size, decompressed_size (8B each), then
  *    min and max as 8 bytes — the u64 BE, or the first 8 bytes of the
  *    string zero-padded (`src/storage.rs:72-106`, golden-tested below and
  *    in the reference at `src/storage.rs:108-139`);
  *  - `metadata.json` = `{"tables":[{"name":…,"columns":[{"name":…,
  *    "dtype":"Uint64"|"String"}]}]}` (`src/metadata.rs:9-46`).
  *
  * Divergence from the reference, deliberate (SURVEY.md §1.4.1): the
  * reference writes the whole preallocated compression buffer (zero
  * padding included) while advancing its bookkeeping by `compressed_len`,
  * leaving files whose stored offsets don't match their bytes — its own
  * read path could never have worked. This writer writes exactly
  * `compressed_len` bytes, which is the behavior the index format implies.
  *
  * Type mapping (SURVEY.md §1.2): Uint64 ↔ LongType (test data stays in
  * signed range; min/max compare as signed), String ↔ StringType with
  * byte-wise UTF-8 ordering (Rust `String` `<`), nothing nullable.
  */
object RtcdbFormat {

  val RowsPerBlock = 1024
  val IndexEntryBytes = 40

  /** Per-block bloom sidecar (`{table}.{col}.bloom`) — OUR extension, not
    * part of the reference format. Additive: `.data`/`.index` bytes stay
    * byte-identical to the reference, and a reader that ignores the
    * sidecar (the reference, older versions of this source) sees the same
    * table. Purpose: the 40-byte zone maps prune nothing for equality
    * predicates on NON-leading columns whose values scatter across blocks
    * (every block's [min,max] spans the domain) and for strings sharing an
    * 8-byte prefix — at 10⁹ blocks a point lookup on such a column decodes
    * every block. One bloom per block per column closes that: 10240 bits /
    * 7 hashes over the block's FULL values (whole string bytes, not the
    * prefix) ≈ 1% false positives at 1024 rows — so an equality scan
    * decodes ~1% of blocks instead of all of them, and a false positive
    * only costs a wasted decode (row-level eval still filters exactly).
    * The file is headerless like the index: block k's filter lives at
    * byte offset k*1280, so append and concat-commit work identically to
    * index entries. Consistency contract: a column's bloom is VALID only
    * when its block count equals its index entry count — every writer
    * either appends both in lockstep or deletes the sidecar (legacy
    * tables, lost files), and readers verify the size equation before
    * consulting it, so a stale sidecar degrades to "no pruning", never to
    * a wrong skip.
    */
  val BloomBytesPerBlock = 1280
  val BloomHashes = 7
  private val BloomBits = BloomBytesPerBlock * 8

  def bloomPath(root: Path, table: String, col: String): Path =
    root.resolve(s"$table.$col.bloom")

  private def fnv64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** set the value's k bit positions in `bits` (double hashing) */
  def bloomInsert(bits: Array[Byte], value: Array[Byte]): Unit = {
    val h1 = fnv64(value, 0xcbf29ce484222325L)
    val h2 = fnv64(value, 0x84222325cbf29ce4L) | 1L
    var i = 0
    while (i < BloomHashes) {
      val bit = (((h1 + i * h2) % BloomBits + BloomBits) % BloomBits).toInt
      bits(bit >>> 3) = (bits(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** false ⇒ the value is PROVABLY absent from the block */
  def bloomMayContain(bits: Array[Byte], value: Array[Byte]): Boolean = {
    val h1 = fnv64(value, 0xcbf29ce484222325L)
    val h2 = fnv64(value, 0x84222325cbf29ce4L) | 1L
    var i = 0
    while (i < BloomHashes) {
      val bit = (((h1 + i * h2) % BloomBits + BloomBits) % BloomBits).toInt
      if ((bits(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  def bloomValueBytes(isLong: Boolean, v: Any): Array[Byte] =
    if (isLong) longToBytes8(v.asInstanceOf[Long])
    else v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)

  private val lz4 = LZ4Factory.fastestInstance()

  // ── value codecs ────────────────────────────────────────────────────────

  def encodeLong(buf: java.io.ByteArrayOutputStream, v: Long): Unit =
    buf.write(ByteBuffer.allocate(8).putLong(v).array())

  def encodeString(buf: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    buf.write(ByteBuffer.allocate(4).putInt(b.length).array())
    buf.write(b)
  }

  /** first 8 UTF-8 bytes, zero-padded (string zone-map precision) */
  def prefix8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.copyOf(b, 8)
  }

  def longToBytes8(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  /** unsigned byte-array comparison (Rust byte-wise string order) */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  // ── 40-byte index entry ─────────────────────────────────────────────────

  final case class IndexEntry(
      startPosition: Long,
      compressedSize: Long,
      decompressedSize: Long,
      min: Array[Byte],  // 8 bytes
      max: Array[Byte]) {

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(IndexEntryBytes)
      bb.putLong(startPosition).putLong(compressedSize).putLong(decompressedSize)
      bb.put(min).put(max)
      bb.array()
    }
  }

  object IndexEntry {
    def fromBytes(bytes: Array[Byte]): IndexEntry = {
      val bb = ByteBuffer.wrap(bytes)
      val (sp, cs, ds) = (bb.getLong, bb.getLong, bb.getLong)
      val min = new Array[Byte](8); bb.get(min)
      val max = new Array[Byte](8); bb.get(max)
      IndexEntry(sp, cs, ds, min, max)
    }
  }

  // ── metadata.json (reference serde shape) ──────────────────────────────

  private val mapper = new ObjectMapper()

  def writeMetadata(root: Path, tables: Seq[(String, StructType)]): Unit = {
    val doc = mapper.createObjectNode()
    val arr = doc.putArray("tables")
    tables.foreach { case (name, schema) =>
      val t = arr.addObject()
      t.put("name", name)
      val cols = t.putArray("columns")
      schema.fields.foreach { f =>
        val c = cols.addObject()
        c.put("name", f.name)
        c.put("dtype", f.dataType match {
          case LongType   => "Uint64"
          case StringType => "String"
          case other => throw new IllegalArgumentException(
            s"rtcdb supports only Uint64/String columns, got $other")
        })
      }
    }
    Files.writeString(root.resolve("metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc))
  }

  def readMetadata(root: Path): Seq[(String, StructType)] = {
    val doc = mapper.readTree(Files.readString(root.resolve("metadata.json")))
    doc.get("tables").elements().asScala.map { t =>
      val fields = t.get("columns").elements().asScala.map { c =>
        val dt = c.get("dtype").asText() match {
          case "Uint64" => LongType
          case "String" => StringType
          case other => throw new IllegalArgumentException(s"Unknown dtype $other")
        }
        StructField(c.get("name").asText(), dt, nullable = false)
      }.toArray
      t.get("name").asText() -> StructType(fields)
    }.toSeq
  }

  def dataPath(root: Path, table: String, col: String): Path =
    root.resolve(s"$table.$col.data")
  def indexPath(root: Path, table: String, col: String): Path =
    root.resolve(s"$table.$col.index")

  /** 'Never published' vs 'lost': a missing per-column index normally
    * means the crash window between a FIRST commit's per-column index
    * publishes, and every reader/repair path treats it as the consistent
    * empty view. But an index lost to external causes (disk fault,
    * partial copy, manual deletion) has the same signature — and there the
    * empty view silently hides the whole table, and the next append's
    * truncate-to-min repair makes the loss permanent. The two cases are
    * not distinguishable from file sizes alone (a torn first commit also
    * leaves non-empty siblings), so when a declared column's index is
    * ABSENT while sibling indexes hold entries, warn loudly naming the
    * files — the operator can restore them BEFORE the next append
    * (r5 advice). Returns true when that suspicious shape was seen.
    */
  def warnIfAbsentIndexes(root: Path, table: String,
      fields: Seq[String], context: String): Boolean = {
    val sized = fields.map { c =>
      val p = indexPath(root, table, c)
      c -> (if (java.nio.file.Files.exists(p))
        java.nio.file.Files.size(p) / IndexEntryBytes else -1L)
    }
    val missing = sized.collect { case (c, -1L) => c }
    val suspicious = missing.nonEmpty && sized.exists(_._2 > 0L)
    if (suspicious)
      org.slf4j.LoggerFactory.getLogger("graft.rtcdb").warn(
        s"$context: table '$table' declares column(s) " +
          missing.mkString("[", ", ", "]") +
          " with NO index file while sibling indexes are non-empty (" +
          sized.collect { case (c, n) if n > 0 => s"$c=$n" }
            .mkString(", ") +
          " entries). Treating this as the never-published empty view; " +
          "if these index files were lost to external causes, restore " +
          "them NOW — the next append's truncate-to-min repair makes the " +
          "loss permanent.")
    suspicious
  }

  // ── writer (append-only batch ingest, storage.rs:224-297 semantics) ────

  def write(root: String, table: String, schema: StructType,
      rows: Seq[Row]): Unit = {
    val rootP = Paths.get(root)
    val compressor = lz4.fastCompressor()
    // append mode: position starts at current data file length
    val dataFiles = schema.fields.map { f =>
      new RandomAccessFile(dataPath(rootP, table, f.name).toFile, "rw")
    }
    val indexFiles = schema.fields.map { f =>
      new RandomAccessFile(indexPath(rootP, table, f.name).toFile, "rw")
    }
    // bloom lockstep check BEFORE appending: a column whose sidecar block
    // count doesn't match its index entry count (legacy table, lost file)
    // can't take positional appends — delete the sidecar and stop
    // maintaining it (advisory data; readers then just skip bloom pruning).
    // The alignment guard matters as much as the count: a partial bloom
    // tail (crash mid-bloom-append) can pass the integer-division count
    // while ending at a NON-multiple of BloomBytesPerBlock — appending at
    // that unaligned offset would permanently shift every later block's
    // filter bytes, turning the sidecar's "provably absent" answers into
    // wrong skips once a reader consults it (r9 advice).
    val bloomOk = schema.fields.map { f =>
      val ip = indexPath(rootP, table, f.name)
      val bp = bloomPath(rootP, table, f.name)
      val entries = if (Files.exists(ip)) Files.size(ip) / IndexEntryBytes else 0L
      val blooms = if (Files.exists(bp)) Files.size(bp) / BloomBytesPerBlock else 0L
      val aligned = !Files.exists(bp) ||
        Files.size(bp) % BloomBytesPerBlock == 0
      if (entries == blooms && aligned) true
      else { Files.deleteIfExists(bp); false }
    }
    val bloomFiles = schema.fields.zip(bloomOk).map { case (f, ok) =>
      if (ok) new RandomAccessFile(bloomPath(rootP, table, f.name).toFile, "rw")
      else null
    }
    try {
      val positions = dataFiles.map(_.length())
      dataFiles.foreach(f => f.seek(f.length()))
      indexFiles.foreach(f => f.seek(f.length()))
      bloomFiles.foreach(f => if (f != null) f.seek(f.length()))

      rows.grouped(RowsPerBlock).foreach { block =>
        schema.fields.zipWithIndex.foreach { case (field, ci) =>
          val buf = new java.io.ByteArrayOutputStream()
          var minB: Array[Byte] = null
          var maxB: Array[Byte] = null
          var minL = Long.MaxValue
          var maxL = Long.MinValue
          val bloom = new Array[Byte](BloomBytesPerBlock)
          block.foreach { row =>
            val v = row.get(ci)
            (field.dataType, v) match {
              case (LongType, l: java.lang.Long) =>
                encodeLong(buf, l)
                minL = math.min(minL, l); maxL = math.max(maxL, l)
                bloomInsert(bloom, longToBytes8(l))
              case (StringType, s: String) =>
                encodeString(buf, s)
                val p = prefix8(s)
                if (minB == null || compareBytes(p, minB) < 0) minB = p
                if (maxB == null || compareBytes(p, maxB) > 0) maxB = p
                bloomInsert(bloom, s.getBytes(StandardCharsets.UTF_8))
              case _ =>
                throw new IllegalArgumentException("Mismatched data type")
            }
          }
          val raw = buf.toByteArray
          val comp = compressor.compress(raw)
          dataFiles(ci).write(comp)
          val entry = IndexEntry(positions(ci), comp.length.toLong, raw.length.toLong,
            if (field.dataType == LongType) longToBytes8(minL) else minB,
            if (field.dataType == LongType) longToBytes8(maxL) else maxB)
          indexFiles(ci).write(entry.toBytes)
          if (bloomFiles(ci) != null) bloomFiles(ci).write(bloom)
          positions(ci) += comp.length
        }
      }
    } finally {
      dataFiles.foreach(_.close()); indexFiles.foreach(_.close())
      bloomFiles.foreach(f => if (f != null) f.close())
    }
  }

  // ── block decode (the read path the reference declared but left dead) ──

  /** decompress + decode one column block into values (UTF8String/Long
    * handled by the caller via `decodeLongs`/`decodeStrings`) */
  def readBlock(file: RandomAccessFile, e: IndexEntry): Array[Byte] = {
    val comp = new Array[Byte](e.compressedSize.toInt)
    file.seek(e.startPosition)
    file.readFully(comp)
    lz4.fastDecompressor().decompress(comp, e.decompressedSize.toInt)
  }

  def decodeLongs(raw: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(raw)
    val out = new Array[Long](raw.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  def decodeStringBytes(raw: Array[Byte]): Array[Array[Byte]] = {
    val bb = ByteBuffer.wrap(raw)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (bb.remaining() > 0) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out += b
    }
    out.toArray
  }
}
