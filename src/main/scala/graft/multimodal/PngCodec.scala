package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL entropy-coded image codec, dependency-free: 8-bit/channel
  * non-interlaced PNG in the three color types real corpora actually
  * contain — grayscale (0), truecolor RGB (2), truecolor+alpha RGBA (6) —
  * using only the JDK's zlib bindings (`java.util.zip.Deflater`/
  * `Inflater`). BMP/WAV/AVI cover the uncompressed multimodal paths; PNG
  * adds DEFLATE plus the five scanline filters.
  *
  * Layout (PNG specification, RFC 2083 / W3C PNG):
  *   8-byte signature 89 50 4E 47 0D 0A 1A 0A, then chunks of
  *   [u32 BE length][4-byte type][data][u32 BE CRC32(type+data)]:
  *   IHDR (width u32, height u32, bit depth, color type, compression,
  *   filter method, interlace), one or more IDAT carrying ONE zlib stream
  *   of the concatenated scanlines, IEND. Each scanline = 1 filter-type
  *   byte (0..4: None, Sub, Up, Average, Paeth) + width·channels filtered
  *   bytes; the Sub/Average/Paeth "left" neighbor is `channels` bytes
  *   back (spec: bpp = bytes per complete pixel).
  *
  * Encoder: filter type y mod 5 per row — deliberately cycling through all
  * five filters so a round trip exercises every unfilter path — and IDAT
  * split into ≤96-byte chunks so multi-IDAT reassembly is exercised too.
  * Decoder: strict Option-typed decode — wrong signature, truncated or
  * overflowing chunk lengths, CRC mismatches, unsupported variants
  * (bit depth ≠ 8, color type ∉ {0,2,6}, interlaced), hostile dimensions,
  * short/corrupt zlib streams, and a missing Adler-32 trailer (the stream
  * must run to `finished()`, not merely yield the expected byte count) all
  * yield None, never a crash or a mis-read (MultimodalSpec fuzzes each
  * case).
  */
object PngCodec {

  /** decoded image: pixels TOP-DOWN row-major, `channels` interleaved
    * bytes per pixel. colorType ∈ {0 gray (1ch), 2 RGB (3ch),
    * 6 RGBA (4ch)}.
    */
  final case class Png(width: Int, height: Int, pixels: Array[Byte],
      colorType: Int = 2) {
    def channels: Int = PngCodec.channelsOf(colorType)
  }

  def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case c => throw new IllegalArgumentException(s"unsupported color type $c")
  }

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (PNG spec §6.6): closest of left/up/up-left to a+b-c */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** encode top-down pixels as a spec-conformant PNG of the image's
    * color type
    */
  def encode(img: Png): Array[Byte] = {
    val bpp = img.channels
    require(img.pixels.length == img.width * img.height * bpp,
      s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}x$bpp")
    val w = img.width; val h = img.height; val stride = w * bpp
    // raw zlib payload: per row, filter byte (y mod 5) + filtered bytes
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = img.pixels(y * stride + i) & 0xff
        val left = if (i >= bpp) img.pixels(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp)
          img.pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, false) // zlib wrapper
    deflater.setInput(raw)
    deflater.finish()
    val z = new ByteArrayOutputStream
    val buf = new Array[Byte](512)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val zbytes = z.toByteArray

    val out = new ByteArrayOutputStream
    out.write(Signature)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)                  // bit depth
      .put(img.colorType.toByte)      // 0 gray / 2 RGB / 6 RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    chunk(out, "IHDR", ihdr)
    // multiple IDATs (≤96 bytes each): one zlib stream split across chunks
    var off = 0
    while (off < zbytes.length) {
      val n = math.min(96, zbytes.length - off)
      chunk(out, "IDAT", java.util.Arrays.copyOfRange(zbytes, off, off + n))
      off += n
    }
    if (zbytes.isEmpty) chunk(out, "IDAT", Array.emptyByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** strict decode: None on wrong signature / unsupported variant /
    * truncation / hostile lengths / CRC or zlib corruption / a zlib
    * stream that doesn't terminate cleanly (missing Adler-32 trailer)
    */
  def decode(bytes: Array[Byte]): Option[Png] = {
    if (bytes.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    val bb = ByteBuffer.wrap(bytes)
    var pos = Signature.length
    var w = 0; var h = 0; var color = 0
    var seenIhdr = false; var seenIend = false
    val idat = new ByteArrayOutputStream
    while (!seenIend) {
      // hostile/truncated chunk framing must fail closed, not overflow
      if (pos + 8 > bytes.length) return None
      val len = bb.getInt(pos)
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != bb.getInt(pos + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          w = bb.getInt(pos + 8)
          h = bb.getInt(pos + 12)
          val depth = bytes(pos + 16); color = bytes(pos + 17)
          val interlace = bytes(pos + 20)
          if (depth != 8 || interlace != 0) return None
          if (color != 0 && color != 2 && color != 6) return None
          // bound so h·(1+4w) stays far inside Int range: a hostile header
          // must not drive a negative-size or multi-GB allocation
          if (w <= 0 || h <= 0 || w > (1 << 12) || h > (1 << 12)) return None
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => if (!seenIhdr) return None // ancillary chunks: skip
      }
      pos += 12 + len
    }
    if (!seenIhdr) return None
    val bpp = channelsOf(color)
    val stride = w * bpp
    val expect = h * (1 + stride)
    val raw = new Array[Byte](expect)
    val inflater = new Inflater(false)
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(raw, got, expect - got)
        // n == 0 while unfinished: short stream or preset-dictionary
        // demand — either way not a valid PNG pixel stream
        if (n == 0) return None
        got += n
      }
      if (got != expect) return None
      // The stream must TERMINATE, not merely yield the expected byte
      // count: drain one more step so the inflater consumes the deflate
      // end-of-stream marker and verifies the Adler-32 trailer. Extra
      // decompressed bytes mean the header lied about the dimensions; a
      // still-unfinished stream means the trailer is truncated or the
      // checksum never validated (r5 advice: inflate(new Array(1))
      // returning 0 with needsInput used to slip through).
      if (!inflater.finished()) {
        if (inflater.inflate(new Array[Byte](1)) > 0) return None
        if (!inflater.finished()) return None
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // unfilter scanlines (spec §6: predictors over the RECONSTRUCTED bytes)
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      var i2 = 0
      while (i2 < stride) {
        val x = raw(y * (1 + stride) + 1 + i2) & 0xff
        val left = if (i2 >= bpp) px(y * stride + i2 - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i2) & 0xff else 0
        val ul = if (y > 0 && i2 >= bpp)
          px((y - 1) * stride + i2 - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        px(y * stride + i2) = ((x + pred) & 0xff).toByte
        i2 += 1
      }
      y += 1
    }
    Some(Png(w, h, px, color))
  }

  /** exact per-channel byte sums (R, G, B) for truecolor images — the
    * feature-extraction kernel in integer space, mirroring
    * [[BmpCodec.channelSums]]. For other color types use
    * [[channelSumsN]].
    */
  def channelSums(img: Png): (Long, Long, Long) = {
    require(img.colorType == 2, s"channelSums expects RGB, got ${img.colorType}")
    val s = channelSumsN(img)
    (s(0), s(1), s(2))
  }

  /** exact per-channel byte sums for ANY supported color type: one entry
    * per interleaved channel (gray: 1; RGB: 3; RGBA: 4 with alpha last)
    */
  def channelSumsN(img: Png): Array[Long] = {
    val nch = img.channels
    val sums = new Array[Long](nch)
    var i = 0
    while (i < img.pixels.length) {
      sums(i % nch) += img.pixels(i) & 0xff
      i += 1
    }
    sums
  }
}
