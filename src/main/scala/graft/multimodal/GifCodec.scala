package graft.multimodal

/** A REAL palette-image codec, dependency-free: GIF87a with a global color
  * table and genuine variable-width LZW compression of the index stream —
  * the third entropy coder in the library after zlib-inflate
  * ([[PngCodec]]) and baseline-DCT Huffman ([[JpegCodec]]). Everything
  * here is from the public GIF87a/89a specification: the logical screen
  * descriptor, global color table, image descriptor, LZW-in-sub-blocks
  * data stream, and the trailer.
  *
  * LZW conventions (the GIF variant):
  *  - codes are packed LSB-first into bytes;
  *  - initial code width = minCodeSize+1; CLEAR = 2^minCodeSize,
  *    EOI = CLEAR+1; first free table slot = CLEAR+2;
  *  - the width counter advances once per data code on BOTH sides (the
  *    decoder counts codes read, one ahead of its actual table fill —
  *    the standard compensation that keeps encoder and decoder widths in
  *    lockstep), bumping when the counter no longer fits the width, to a
  *    maximum of 12 bits;
  *  - a full table (4096) simply stops growing (no mid-stream CLEAR —
  *    spec-legal, and any conforming decoder handles it).
  *
  * Decode is STRICT: None on wrong magic, missing global color table,
  * interlace, local color tables, out-of-range LZW codes, truncated
  * sub-blocks, palette-exceeding indices, or a pixel count that doesn't
  * match the descriptor — a codec must never crash or mis-read foreign
  * bytes (the BmpCodec/PngCodec discipline; fuzzed in MultimodalSpec).
  * GIF89a extension blocks (0x21) are skipped, so real-world files with
  * graphics-control extensions still decode.
  */
object GifCodec {

  /** decoded image: RGB palette (3 bytes per entry) + row-major indices */
  final case class Gif(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte])

  /** palette entries (padded to a power of two ≥ 2 on encode) */
  private def paletteSlots(n: Int): Int = {
    var p = 2
    while (p < n) p <<= 1
    p
  }

  // ── LSB-first bit IO over a growable byte buffer ───────────────────────
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nbits
      nbits += width
      while (nbits >= 8) {
        out.write(acc & 0xff)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { out.write(acc & 0xff); acc = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0
    private var nbits = 0
    /** next `width`-bit code, or -1 past end */
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xff) << nbits
        pos += 1
        nbits += 8
      }
      val v = acc & ((1 << width) - 1)
      acc >>>= width
      nbits -= width
      v
    }
  }

  /** GIF-variant LZW compression of the index stream */
  private def lzwEncode(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val first = clear + 2
    val bw = new BitWriter
    var width = minCodeSize + 1
    var next = first // advances once per data code emitted (width counter)
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, k: Int): Long = (prefix.toLong << 12) | k.toLong
    bw.write(clear, width)
    var current = indices(0) & 0xff
    def emitData(c: Int): Unit = {
      bw.write(c, width)
      next += 1
      if (next > (1 << width) - 1 && width < 12) width += 1
    }
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val got = dict.get(key(current, k))
      if (got != null) current = got.intValue()
      else {
        // the new entry takes the CURRENT next slot; emitData then
        // advances the shared width counter past it
        val slot = next
        emitData(current)
        if (slot < 4096) dict.put(key(current, k), slot)
        current = k
      }
      i += 1
    }
    emitData(current)
    bw.write(eoi, width)
    bw.finish()
  }

  /** strict GIF-variant LZW decode to exactly `expected` indices */
  private def lzwDecode(minCodeSize: Int, data: Array[Byte], expected: Int,
      paletteSize: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val first = clear + 2
    val br = new BitReader(data)
    val out = new java.io.ByteArrayOutputStream(expected)
    // table entries as (prefix code, suffix byte); literals implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var width = minCodeSize + 1
    var counter = first // per-code-read width counter (one ahead of fill)
    var tableNext = first
    var prev = -1
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= first) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Boolean = {
      // expand iteratively (deep chains would overflow recursion)
      val stack = new java.util.ArrayDeque[Byte]()
      var c = code
      while (c >= first) { stack.push(suffix(c)); c = prefix(c) }
      if (c >= paletteSize) return false // padded-slot index: hostile
      stack.push(c.toByte)
      while (!stack.isEmpty) out.write(stack.pop().toInt)
      true
    }
    var done = false
    while (!done) {
      val code = br.read(width)
      if (code < 0) return None // truncated stream before EOI
      if (code == clear) {
        tableNext = first; counter = first; width = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (prev == -1) {
          if (code >= clear || code >= paletteSize) return None
          out.write(code)
        } else {
          if (code < tableNext) {
            if (!emit(code)) return None
          } else if (code == tableNext) {
            // KwKwK: prev's string + its own first byte
            if (!emit(prev)) return None
            out.write(firstByte(prev).toInt & 0xff)
          } else return None
          if (tableNext < 4096) {
            prefix(tableNext) = prev
            suffix(tableNext) =
              if (code == tableNext) firstByte(prev) else firstByte(code)
            tableNext += 1
          }
        }
        counter += 1
        if (counter > (1 << width) - 1 && width < 12) width += 1
        prev = code
        if (out.size() > expected) return None // more pixels than declared
      }
    }
    if (out.size() != expected) return None
    Some(out.toByteArray)
  }

  /** encode as a spec-conformant GIF87a (global color table, one image) */
  def encode(img: Gif): Array[Byte] = {
    require(img.palette.length % 3 == 0 && img.palette.length >= 3,
      "palette must hold RGB triples")
    require(img.indices.length == img.width * img.height,
      s"index buffer ${img.indices.length} != ${img.width}x${img.height}")
    val nColors = img.palette.length / 3
    val slots = paletteSlots(nColors)
    require(img.indices.forall(i => (i & 0xff) < nColors),
      "index out of palette range")
    val sizeBits = Integer.numberOfTrailingZeros(slots) // 2^(bits) slots
    val minCodeSize = math.max(2, sizeBits)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0x80 | ((sizeBits - 1) & 0x07)) // GCT present, size bits
    out.write(0) // background color index
    out.write(0) // aspect ratio
    out.write(img.palette, 0, nColors * 3)
    var pad = (slots - nColors) * 3
    while (pad > 0) { out.write(0); pad -= 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(0) // no local color table, not interlaced
    out.write(minCodeSize)
    val lzw = lzwEncode(minCodeSize, img.indices)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** strict decode: None on anything malformed or unsupported */
  def decode(bytes: Array[Byte]): Option[Gif] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val w = u16(6)
    val h = u16(8)
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return None // global color table required
    val slots = 1 << ((packed & 0x07) + 1)
    var pos = 13
    if (pos + slots * 3 > bytes.length) return None
    val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + slots * 3)
    pos += slots * 3
    // walk blocks: skip 89a extensions, decode the first image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var len = if (pos < bytes.length) bytes(pos) & 0xff else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = bytes(pos) & 0xff
          }
          pos += 1
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val left = u16(pos + 1); val top = u16(pos + 3)
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          // full-frame, non-interlaced, no local color table only
          if (left != 0 || top != 0 || iw != w || ih != h) return None
          if ((ipacked & 0x80) != 0 || (ipacked & 0x40) != 0) return None
          pos += 10
          if (pos >= bytes.length) return None
          val minCodeSize = bytes(pos) & 0xff
          if (minCodeSize < 2 || minCodeSize > 11) return None
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < bytes.length) bytes(pos) & 0xff else return None
          while (len != 0) {
            if (pos + 1 + len > bytes.length) return None
            data.write(bytes, pos + 1, len)
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = bytes(pos) & 0xff
          }
          pos += 1
          if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
          return lzwDecode(minCodeSize, data.toByteArray, w * h, slots)
            .map(idx => Gif(w, h, palette, idx))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** RGB pixel bytes (3 per pixel, row-major) via the palette */
  def rgbPixels(img: Gif): Array[Byte] = {
    val out = new Array[Byte](img.indices.length * 3)
    var i = 0
    while (i < img.indices.length) {
      val k = (img.indices(i) & 0xff) * 3
      out(i * 3) = img.palette(k)
      out(i * 3 + 1) = img.palette(k + 1)
      out(i * 3 + 2) = img.palette(k + 2)
      i += 1
    }
    out
  }

  /** exact per-channel sums of the palette-resolved pixels */
  def channelSums(img: Gif): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.indices.length) {
      val k = (img.indices(i) & 0xff) * 3
      r += img.palette(k) & 0xff
      g += img.palette(k + 1) & 0xff
      b += img.palette(k + 2) & 0xff
      i += 1
    }
    (r, g, b)
  }
}
