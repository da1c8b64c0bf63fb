package graft.multimodal

import java.io.ByteArrayOutputStream

/** A REAL baseline-DCT JPEG codec, dependency-free: 8-bit baseline
  * (SOF0) grayscale and 4:4:4 YCbCr color — the r8 verdict's largest
  * remaining multimodal gap (real corpora are JPEG-heavy; PNG proved
  * entropy coding is in scope, this adds the Huffman + 8×8 IDCT half).
  *
  * Layout (ITU-T T.81 / ISO 10918-1): SOI, APP0 (JFIF), DQT (8-bit
  * tables in zigzag order), SOF0 (precision 8, dims, per-component
  * sampling + quant table id), DHT (canonical code-length counts +
  * symbol values, Annex C), SOS, entropy-coded scan with 0xFF00 byte
  * stuffing, EOI. The scan is Huffman-coded per 8×8 block: DC as a
  * DIFFERENCE from the component's predictor in magnitude-category form
  * (size symbol + `size` extend bits), AC as (run, size) symbols over
  * the zigzag sequence with ZRL (0xF0) for 16-zero runs and EOB (0x00)
  * for a trailing zero tail.
  *
  * The codec is layered so each half is independently testable:
  * marker framing, the ENTROPY layer (Huffman + DC prediction +
  * stuffing — exposed `private[graft]` so MultimodalSpec can prove it
  * bit-exact on arbitrary coefficient blocks, where the lossy DCT can't
  * mask a defect), and the TRANSFORM layer (forward DCT + quantize /
  * dequantize + IDCT, StrictMath cosines so results are bit-identical
  * across JVMs).
  *
  * Huffman tables are written into DHT like any conformant encoder, so
  * the decoder implements the GENERAL Annex C canonical construction
  * (it decodes any baseline table, not just ours). Our fixed tables:
  * DC = twelve 4-bit codes (categories 0–11), AC = all 162 baseline
  * symbols at 8 bits — both leave the all-ones code unassigned so the
  * 1-padding at scan end can never decode as a spurious symbol.
  *
  * Decoder strictness (the PngCodec discipline): wrong/missing markers,
  * truncated segments, hostile dimensions, progressive/arithmetic/
  * 12-bit/subsampled variants, undefined or malformed Huffman and quant
  * tables, invalid codes, coefficient overrun past index 63, and a scan
  * that runs out of bits all yield None — never a crash or a mis-read
  * (MultimodalSpec fuzzes each case).
  */
object JpegCodec {

  /** decoded image: pixels TOP-DOWN row-major, `nComp` interleaved bytes
    * per pixel. nComp ∈ {1 grayscale, 3 RGB}.
    */
  final case class Jpeg(width: Int, height: Int, nComp: Int,
      pixels: Array[Byte])

  // ── zigzag order (generated, not transcribed): zz index → row-major ──
  private[graft] val Zigzag: Array[Int] = {
    val order = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15) {
      val rs = if (s % 2 == 1) 0 to s else s to 0 by -1
      for (r <- rs; c = s - r; if r < 8 && c < 8) {
        order(i) = r * 8 + c; i += 1
      }
    }
    order
  }

  // ── fixed canonical Huffman tables (written to DHT; see scaladoc) ───
  /** (#codes of length 1..16, symbol values in canonical order) */
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    Array(0x00, 0xF0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)

  /** Annex C canonical code assignment: symbol → (code, length) */
  private def buildEncodeTable(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = 0
      while (n < bits(len - 1)) {
        out += vals(k) -> ((code, len)); code += 1; k += 1; n += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** decode table: (length → (minCode, maxCode, first-symbol index)) +
    * symbol values; the standard mincode/maxcode/valptr walk
    */
  private final class DecodeTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1) // -1 = none at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  private lazy val DcEnc = buildEncodeTable(DcBits, DcVals)
  private lazy val AcEnc = buildEncodeTable(AcBits, AcVals)

  // ── bit I/O with JPEG byte stuffing ─────────────────────────────────
  private final class BitWriter {
    private val out = new ByteArrayOutputStream
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** byte-align with 1-padding, then write a restart marker RAW
      * (markers are never stuffed — that's how decoders find them)
      */
    def restartMarker(m: Int): Unit = {
      while (nbits != 0) put(1, 1)
      out.write(0xFF); out.write(0xD0 + (m & 7))
    }
    def finish(): Array[Byte] = {
      while (nbits != 0) put(1, 1) // 1-padding to a byte boundary
      out.toByteArray
    }
  }

  /** reads MSB-first from an UNSTUFFED byte array; -1 = exhausted */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0; private var bit = 0
    def read(): Int =
      if (pos >= data.length) -1
      else {
        val v = (data(pos) >> (7 - bit)) & 1
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        v
      }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = read(); if (b < 0) return -1
        v = (v << 1) | b; i += 1
      }
      v
    }
  }

  private def magnitudeSize(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** extend (T.81 F.2.2.1): `size` raw bits → signed coefficient */
  private def extend(bits: Int, size: Int): Int =
    if (size == 0) 0
    else if (bits < (1 << (size - 1))) bits - (1 << size) + 1
    else bits

  // ── ENTROPY layer: zigzag coeff blocks ⇄ scan bytes ─────────────────
  /** Huffman-encode blocks (each 64 ints, ZIGZAG order) in MCU order —
    * for nComp = 3 the caller interleaves Y,Cb,Cr per MCU; component of
    * block i is i % nComp (4:4:4), each with its own DC predictor.
    * `private[graft]` so the spec can pin the layer bit-exact on
    * arbitrary coefficients.
    */
  private[graft] def entropyEncode(blocks: Array[Array[Int]],
      nComp: Int, restartEvery: Int = 0): Array[Byte] = {
    val w = new BitWriter
    val pred = new Array[Int](nComp)
    var i = 0
    while (i < blocks.length) {
      // restart boundary (T.81 §B.2.1.2): every `restartEvery` MCUs,
      // byte-align, emit RSTm (m cycling 0..7), reset every DC predictor
      if (restartEvery > 0 && i > 0 && i % (restartEvery * nComp) == 0) {
        w.restartMarker(i / (restartEvery * nComp) - 1)
        java.util.Arrays.fill(pred, 0)
      }
      val b = blocks(i); val comp = i % nComp
      require(b.length == 64, s"block $i has ${b.length} coeffs")
      val diff = b(0) - pred(comp); pred(comp) = b(0)
      val dsz = magnitudeSize(diff)
      require(dsz <= 11, s"DC diff $diff out of baseline range")
      val (dc, dl) = DcEnc(dsz)
      w.put(dc, dl)
      if (dsz > 0)
        w.put(if (diff > 0) diff else diff + (1 << dsz) - 1, dsz)
      var k = 1; var run = 0
      while (k < 64) {
        if (b(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = AcEnc(0xF0); w.put(c, l); run -= 16 }
          val sz = magnitudeSize(b(k))
          require(sz <= 10, s"AC coeff ${b(k)} out of baseline range")
          val (c, l) = AcEnc((run << 4) | sz)
          w.put(c, l)
          w.put(if (b(k) > 0) b(k) else b(k) + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = AcEnc(0x00); w.put(c, l) } // EOB
      i += 1
    }
    w.finish()
  }

  /** inverse of [[entropyEncode]] (our fixed tables): accepts the
    * STUFFED scan exactly as entropyEncode emits it, strips the 0xFF00
    * stuffing like the file decoder does, then Huffman-decodes. None on
    * broken stuffing, invalid codes, coefficient overrun, or bit
    * exhaustion.
    */
  private[graft] def entropyDecode(scan: Array[Byte], nBlocks: Int,
      nComp: Int): Option[Array[Array[Int]]] = {
    val raw = new ByteArrayOutputStream
    var i = 0
    while (i < scan.length) {
      val b = scan(i) & 0xff
      raw.write(b)
      if (b == 0xFF) {
        if (i + 1 >= scan.length || scan(i + 1) != 0) return None
        i += 2
      } else i += 1
    }
    entropyDecodeSegments(Array(raw.toByteArray), nBlocks, nComp, nBlocks,
      Array.fill(nComp)(new DecodeTable(DcBits, DcVals)),
      Array.fill(nComp)(new DecodeTable(AcBits, AcVals)))
  }

  private def decodeSymbol(r: BitReader, t: DecodeTable): Int = {
    var code = 0; var len = 0
    while (len < 16) {
      val b = r.read(); if (b < 0) return -1
      code = (code << 1) | b; len += 1
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
        return t.vals(t.valPtr(len) + code - t.minCode(len))
    }
    -1 // no code of length <= 16 matched: corrupt stream
  }

  /** decode `nBlocks` blocks from UNSTUFFED restart segments: each
    * segment carries `blocksPerSeg` blocks (the last one the remainder)
    * with freshly-reset DC predictors and a byte-aligned bit stream —
    * exactly the independence restart markers exist to provide. The
    * no-restart case is one segment with blocksPerSeg = nBlocks.
    */
  private def entropyDecodeSegments(segments: Array[Array[Byte]],
      nBlocks: Int, nComp: Int, blocksPerSeg: Int, dcT: Array[DecodeTable],
      acT: Array[DecodeTable]): Option[Array[Array[Int]]] = {
    if (blocksPerSeg <= 0) return None
    val needSegs = math.max(1, (nBlocks + blocksPerSeg - 1) / blocksPerSeg)
    if (segments.length != needSegs) return None
    val out = Array.ofDim[Int](nBlocks, 64)
    var seg = 0
    var i = 0
    while (seg < segments.length) {
      val r = new BitReader(segments(seg))
      val pred = new Array[Int](nComp)
      val end = math.min(i + blocksPerSeg, nBlocks)
      while (i < end) {
        val comp = i % nComp
        val dsz = decodeSymbol(r, dcT(comp))
        if (dsz < 0 || dsz > 11) return None
        val dbits = if (dsz == 0) 0 else r.readBits(dsz)
        if (dbits < 0) return None
        pred(comp) += extend(dbits, dsz)
        out(i)(0) = pred(comp)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val sym = decodeSymbol(r, acT(comp))
          if (sym < 0) return None
          if (sym == 0x00) eob = true
          else if (sym == 0xF0) {
            k += 16
            if (k > 64) return None // ZRL overrunning the block
          } else {
            val run = sym >> 4; val sz = sym & 0xF
            k += run
            if (k > 63 || sz == 0 || sz > 10) return None
            val bits = r.readBits(sz)
            if (bits < 0) return None
            out(i)(k) = extend(bits, sz)
            k += 1
          }
        }
        i += 1
      }
      seg += 1
    }
    Some(out)
  }

  // ── TRANSFORM layer: DCT / IDCT (StrictMath — bit-identical JVMs) ───
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)

  /** forward DCT + quantize: 64 level-shifted samples (row-major) →
    * 64 quantized coeffs in ZIGZAG order
    */
  private def fdctQuant(s: Array[Int], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            acc += s(y * 8 + x) * Cos(x)(u) * Cos(y)(v)
            y += 1
          }
          x += 1
        }
        val coeff = 0.25 * Cu(u) * Cu(v) * acc
        val zz = zzIndexOf(v * 8 + u)
        out(zz) = Math.round(coeff / q(zz)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** dequantize + IDCT: 64 ZIGZAG quantized coeffs → 64 row-major
    * level-shifted samples (un-rounded doubles rounded by the caller).
    *
    * Sparse form, BIT-IDENTICAL to the dense double loop: real scan
    * blocks are mostly zeros after quantization (a DC-only block has 1
    * nonzero in 64), and a zero coefficient's term is an exact IEEE
    * ±0.0 whose addition never changes the accumulator (the sum starts
    * at +0.0, and +0.0 + −0.0 = +0.0 under round-to-nearest), so
    * skipping zero terms while keeping the surviving terms in the SAME
    * (u outer, v inner) order and the SAME multiplication grouping
    * (((Cu(u)·Cu(v))·coef)·Cos(x)(u))·Cos(y)(v) reproduces every bit of
    * the dense result. Per-pixel cost drops from 64 terms to nnz terms
    * — ~64× on the DC-only blocks that dominate decode time.
    */
  private def dequantIdct(zz: Array[Int], q: Array[Int]): Array[Int] = {
    val coef = new Array[Double](64) // row-major v*8+u
    var k = 0
    while (k < 64) {
      coef(Zigzag(k)) = zz(k).toDouble * q(k)
      k += 1
    }
    // surviving terms in dense-loop order, with the order-preserving
    // prefix product w = (Cu(u)·Cu(v))·coef folded once per term
    val nzU = new Array[Int](64)
    val nzV = new Array[Int](64)
    val nzW = new Array[Double](64)
    var m = 0
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val c = coef(v * 8 + u)
        if (c != 0.0) {
          nzU(m) = u; nzV(m) = v; nzW(m) = Cu(u) * Cu(v) * c; m += 1
        }
        v += 1
      }
      u += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val cy = Cos(y)
      var x = 0
      while (x < 8) {
        val cx = Cos(x)
        var acc = 0.0
        var t = 0
        while (t < m) {
          acc += nzW(t) * cx(nzU(t)) * cy(nzV(t))
          t += 1
        }
        out(y * 8 + x) = Math.round(0.25 * acc).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** row-major index → zigzag position (inverse of [[Zigzag]]) */
  private val ZzOf: Array[Int] = {
    val a = new Array[Int](64)
    var k = 0
    while (k < 64) { a(Zigzag(k)) = k; k += 1 }
    a
  }
  private def zzIndexOf(rowMajor: Int): Int = ZzOf(rowMajor)

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ── color transforms (JFIF) ─────────────────────────────────────────
  private def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    clamp(Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt),
    clamp(Math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt),
    clamp(Math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt))

  private def yccToRgb(yy: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp(Math.round(yy + 1.402 * (cr - 128)).toInt),
    clamp(Math.round(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)).toInt),
    clamp(Math.round(yy + 1.772 * (cb - 128)).toInt))

  // ── marker framing ──────────────────────────────────────────────────
  private def seg(out: ByteArrayOutputStream, marker: Int,
      data: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = data.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(data, 0, data.length)
  }

  /** all-ones quant table: the EXACT-RECOVERY regime (dequant is still a
    * real multiply; constant 8×8 blocks survive the DCT round trip
    * bit-exactly — the q136/q137 sketch precedent)
    */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  /** encode top-down pixels (nComp ∈ {1, 3}; 3 = interleaved RGB) as a
    * spec-conformant baseline JFIF JPEG, 4:4:4 for color. Non-multiple-
    * of-8 dimensions pad by edge replication (the standard practice);
    * `quant` applies to every component (zigzag order, as written to
    * DQT).
    */
  def encode(img: Jpeg, quant: Array[Int] = FlatQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(restartInterval >= 0 && restartInterval <= 0xFFFF,
      s"restart interval $restartInterval out of DRI range")
    require(img.nComp == 1 || img.nComp == 3, s"nComp ${img.nComp}")
    require(img.pixels.length == img.width * img.height * img.nComp,
      s"pixel buffer ${img.pixels.length} != " +
        s"${img.width}x${img.height}x${img.nComp}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 bytes of 1..255")
    val w = img.width; val h = img.height; val nc = img.nComp
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    // component planes in YCbCr (color) or the gray plane
    val planes = Array.ofDim[Int](nc, w * h)
    var p = 0
    while (p < w * h) {
      if (nc == 1) planes(0)(p) = img.pixels(p) & 0xff
      else {
        val (yy, cb, cr) = rgbToYcc(img.pixels(p * 3) & 0xff,
          img.pixels(p * 3 + 1) & 0xff, img.pixels(p * 3 + 2) & 0xff)
        planes(0)(p) = yy; planes(1)(p) = cb; planes(2)(p) = cr
      }
      p += 1
    }
    // MCU-ordered blocks: for each block position, one block per comp
    val blocks = new Array[Array[Int]](wb * hb * nc)
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        var c = 0
        while (c < nc) {
          val s = new Array[Int](64)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val sx = math.min(bx * 8 + xx, w - 1) // edge-clamp pad
              val sy = math.min(by * 8 + yy, h - 1)
              s(yy * 8 + xx) = planes(c)(sy * w + sx) - 128 // level shift
              xx += 1
            }
            yy += 1
          }
          blocks((by * wb + bx) * nc + c) = fdctQuant(s, quant)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    val scan = entropyEncode(blocks, nc, restartInterval)

    val out = new ByteArrayOutputStream
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xDB, (Array(0x00) ++ quant).map(_.toByte)) // DQT, Pq=0 Tq=0
    val sof = Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc) ++
      (0 until nc).flatMap(c => Seq(c + 1, 0x11, 0)) // id, 1x1, quant 0
    seg(out, 0xC0, sof.map(_.toByte))
    seg(out, 0xC4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte)) // DC 0
    seg(out, 0xC4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte)) // AC 0
    if (restartInterval > 0) // DRI before SOS (T.81 §B.2.4.4)
      seg(out, 0xDD,
        Array((restartInterval >> 8).toByte, (restartInterval & 0xFF).toByte))
    val sos = Array(nc) ++ (0 until nc).flatMap(c => Seq(c + 1, 0x00)) ++
      Seq(0, 63, 0) // Ss, Se, AhAl
    seg(out, 0xDA, sos.map(_.toByte))
    out.write(scan, 0, scan.length)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** strict decode: None on anything that isn't a well-formed baseline
    * 8-bit sequential JPEG with 1×1 sampling (see object scaladoc)
    */
  def decode(bytes: Array[Byte]): Option[Jpeg] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xFF ||
      (bytes(1) & 0xff) != 0xD8) return None
    var pos = 2
    var w = 0; var h = 0; var nc = 0
    var seenSof = false
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val huffDc = scala.collection.mutable.Map.empty[Int, DecodeTable]
    val huffAc = scala.collection.mutable.Map.empty[Int, DecodeTable]
    var compQuant: Array[Int] = null // per-comp quant table id
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var scanSegments: Array[Array[Byte]] = null
    var restartInterval = 0
    var seenEoi = false
    while (!seenEoi) {
      if (pos + 2 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xff
      marker match {
        case 0xD9 => seenEoi = true; pos += 2
        case 0x01 => pos += 2 // TEM: standalone
        case m if m >= 0xD0 && m <= 0xD7 => return None // stray RSTn
        case 0xC0 => // baseline SOF
          if (seenSof || pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (len < 8 || pos + 2 + len > bytes.length) return None
          val prec = bytes(pos + 4) & 0xff
          h = u16(bytes, pos + 5); w = u16(bytes, pos + 7)
          nc = bytes(pos + 9) & 0xff
          if (prec != 8 || (nc != 1 && nc != 3)) return None
          if (w <= 0 || h <= 0 || w > (1 << 12) || h > (1 << 12)) return None
          if (len != 8 + 3 * nc) return None
          compQuant = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val samp = bytes(pos + 11 + 3 * c) & 0xff
            if (samp != 0x11) return None // only 4:4:4 / gray 1x1
            compQuant(c) = bytes(pos + 12 + 3 * c) & 0xff
            c += 1
          }
          seenSof = true
          pos += 2 + len
        case m if m == 0xC1 || m == 0xC2 || m == 0xC3 ||
          (m >= 0xC5 && m <= 0xC7) || (m >= 0xC9 && m <= 0xCF) =>
          // extended / progressive / lossless / hierarchical SOFs, DAC:
          // not baseline sequential — fail closed, never mis-decode
          return None
        case 0xDB => // DQT: one or more tables
          if (pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (pos + 2 + len > bytes.length) return None
          var o = pos + 4
          val end = pos + 2 + len
          while (o < end) {
            val pqtq = bytes(o) & 0xff
            if ((pqtq >> 4) != 0) return None // 16-bit tables: not baseline
            if (o + 65 > end) return None
            quant((pqtq & 0xF)) =
              Array.tabulate(64)(i => bytes(o + 1 + i) & 0xff)
            if (quant(pqtq & 0xF).exists(_ == 0)) return None
            o += 65
          }
          if (o != end) return None
          pos += 2 + len
        case 0xC4 => // DHT: one or more tables
          if (pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (pos + 2 + len > bytes.length) return None
          var o = pos + 4
          val end = pos + 2 + len
          while (o < end) {
            val tcth = bytes(o) & 0xff
            if (o + 17 > end) return None
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val nvals = bits.sum
            if (nvals == 0 || nvals > 256 || o + 17 + nvals > end) return None
            val vals = Array.tabulate(nvals)(i => bytes(o + 17 + i) & 0xff)
            val t = new DecodeTable(bits, vals)
            (tcth >> 4) match {
              case 0 => huffDc(tcth & 0xF) = t
              case 1 => huffAc(tcth & 0xF) = t
              case _ => return None
            }
            o += 17 + nvals
          }
          if (o != end) return None
          pos += 2 + len
        case 0xDD => // DRI: restart interval
          if (pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (len != 4 || pos + 2 + len > bytes.length) return None
          restartInterval = u16(bytes, pos + 4)
          pos += 2 + len
        case 0xDA => // SOS + entropy data
          if (!seenSof || pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (pos + 2 + len > bytes.length) return None
          val ns = bytes(pos + 4) & 0xff
          if (ns != nc || len != 6 + 2 * ns) return None
          compDc = new Array[Int](nc); compAc = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            // component ids were written 1..nc in SOF order
            if ((bytes(pos + 5 + 2 * c) & 0xff) != c + 1) return None
            val tt = bytes(pos + 6 + 2 * c) & 0xff
            compDc(c) = tt >> 4; compAc(c) = tt & 0xF
            c += 1
          }
          val ss = bytes(pos + 5 + 2 * ns) & 0xff
          val se = bytes(pos + 6 + 2 * ns) & 0xff
          val ahal = bytes(pos + 7 + 2 * ns) & 0xff
          if (ss != 0 || se != 63 || ahal != 0) return None
          // unstuff entropy data up to the next marker, splitting into
          // restart segments at RSTn (legal only under a DRI interval,
          // and the modulo-8 marker sequence must cycle in order)
          var o = pos + 2 + len
          val segs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var raw = new ByteArrayOutputStream
          var rstExpect = 0
          var endFound = false
          while (!endFound) {
            if (o >= bytes.length) return None
            val b = bytes(o) & 0xff
            if (b != 0xFF) { raw.write(b); o += 1 }
            else {
              if (o + 1 >= bytes.length) return None
              val nxt = bytes(o + 1) & 0xff
              if (nxt == 0x00) { raw.write(0xFF); o += 2 }
              else if (nxt >= 0xD0 && nxt <= 0xD7) {
                if (restartInterval == 0) return None // stray RST, no DRI
                if (nxt - 0xD0 != rstExpect % 8) return None // out of cycle
                rstExpect += 1
                segs += raw.toByteArray
                raw = new ByteArrayOutputStream
                o += 2
              }
              else endFound = true // next marker: scan ends here
            }
          }
          segs += raw.toByteArray
          scanSegments = segs.toArray
          pos = o
        case _ => // APPn / COM / other length-framed segments: skip
          if (pos + 4 > bytes.length) return None
          val len = u16(bytes, pos + 2)
          if (len < 2 || pos + 2 + len > bytes.length) return None
          pos += 2 + len
      }
    }
    if (!seenSof || scanSegments == null) return None
    // resolve per-component tables; every referenced id must be defined
    val qts = new Array[Array[Int]](nc)
    val dcT = new Array[DecodeTable](nc)
    val acT = new Array[DecodeTable](nc)
    var c = 0
    while (c < nc) {
      qts(c) = quant.getOrElse(compQuant(c), null)
      dcT(c) = huffDc.getOrElse(compDc(c), null)
      acT(c) = huffAc.getOrElse(compAc(c), null)
      if (qts(c) == null || dcT(c) == null || acT(c) == null) return None
      c += 1
    }
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    val nBlocks = wb * hb * nc
    val blocksPerSeg =
      if (restartInterval > 0) restartInterval * nc else nBlocks
    entropyDecodeSegments(scanSegments, nBlocks, nc, blocksPerSeg,
        dcT, acT).map { blocks =>
      val planes = Array.ofDim[Int](nc, w * h)
      var i = 0
      while (i < nBlocks) {
        val comp = i % nc
        val mcu = i / nc
        val bx = mcu % wb; val by = mcu / wb
        val s = dequantIdct(blocks(i), qts(comp))
        var yy = 0
        while (yy < 8) {
          val py = by * 8 + yy
          var xx = 0
          while (xx < 8) {
            val px = bx * 8 + xx
            if (px < w && py < h) // crop the padded partial blocks
              planes(comp)(py * w + px) = clamp(s(yy * 8 + xx) + 128)
            xx += 1
          }
          yy += 1
        }
        i += 1
      }
      val out = new Array[Byte](w * h * nc)
      var p2 = 0
      while (p2 < w * h) {
        if (nc == 1) out(p2) = planes(0)(p2).toByte
        else {
          val (r, g, b) =
            yccToRgb(planes(0)(p2), planes(1)(p2), planes(2)(p2))
          out(p2 * 3) = r.toByte; out(p2 * 3 + 1) = g.toByte
          out(p2 * 3 + 2) = b.toByte
        }
        p2 += 1
      }
      Jpeg(w, h, nc, out)
    }
  }

  /** exact sum of every decoded channel byte — the feature-extraction
    * kernel in integer space (the BmpCodec/PngCodec channelSums shape)
    */
  def pixelSum(img: Jpeg): Long = {
    var s = 0L; var i = 0
    while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
    s
  }
}
