package graft.multimodal

/** Motion-compensated, entropy-coded video — the H.264-CLASS toy codec
  * completing the modality ladder's last named gap (BMP/PNG/GIF cover
  * stills, JPEG the transform-domain image family, AVI/MJPEG the
  * intra-only video family, WAV/μ-law/ADPCM/MDCT the audio family; this
  * adds INTER-frame prediction). Implemented dependency-free from the
  * published textbook math every hybrid video codec shares:
  *
  *   - GOP structure: frame 0 intra (I), frames 1.. predicted (P);
  *   - block motion search: full-search SAD over a ±[[R]] window in the
  *     previous RECONSTRUCTED frame (closed-loop prediction — the
  *     decoder reconstructs with the same reference the encoder used),
  *     deterministic tie-break (min SAD, then min dy, then min dx),
  *     candidate vectors restricted so the reference block stays inside
  *     the frame;
  *   - residual transform: 8×8 orthonormal 2-D DCT-II of the prediction
  *     residual (intra blocks transform the pixels themselves), uniform
  *     quantization at step 2^−[[ScaleBits]];
  *   - entropy coding: H.264's own variable-length family — unsigned/
  *     signed Exp-Golomb codes over (nonzero-count, zigzag run-before,
  *     level) per block and signed Exp-Golomb motion vectors, MSB-first
  *     bit packing.
  *
  * Exact-recovery regime (the JPEG/MDCT flat-quant discipline): the 2-D
  * orthonormal DCT-8 basis satisfies Σ_k |φ_k(n)| < 15, so a step of
  * 2^−5 = 1/32 bounds the per-pixel inverse error by 15·step/2 < 0.24
  * < 1/2 — rounding recovers every 8-bit pixel (and therefore every
  * integer residual) BIT-EXACTLY. Prediction is closed-loop, so exact
  * residual recovery makes every decoded frame bit-identical to the
  * input — which is what lets the DuckDB oracle recompute decoded-pixel
  * sums from the generative formula alone. Any defect in the motion
  * search bounds, compensation, DCT, zigzag, or the Exp-Golomb reader
  * breaks the recovery and the hash.
  *
  * Container: "MCV1", u8 B(8), u8 R(3), u8 scaleBits(5), u16 w, u16 h,
  * u16 nFrames, then the bitstream. Strict decode: fails closed (None)
  * on magic/parameter/dimension/truncation errors — dimensions are
  * bounded BEFORE any size math so a hostile header cannot wrap an Int
  * or force a giant allocation (the MDCT lesson).
  */
object MotionCodec {

  /** block size */
  val B = 8

  /** motion-search radius (full search over (2R+1)² candidates) */
  val R = 3

  /** quantization: step = 2^−ScaleBits (5 → exact 8-bit recovery) */
  val ScaleBits = 5

  /** a video: grayscale frames, w·h bytes each (unsigned 0..255) */
  final case class Video(w: Int, h: Int, frames: Array[Array[Byte]])

  // orthonormal 1-D DCT-II kernel: kern(k)(n) = c(k)·cos(π(2n+1)k/2B)
  private val kern: Array[Array[Double]] = Array.tabulate(B, B) { (k, n) =>
    val c = if (k == 0) StrictMath.sqrt(1.0 / B) else StrictMath.sqrt(2.0 / B)
    c * StrictMath.cos(StrictMath.PI * (2 * n + 1) * k / (2.0 * B))
  }

  /** the canonical JPEG zigzag walk over the B×B grid, as (y, x) pairs:
    * anti-diagonals in order, direction alternating per diagonal
    */
  private[multimodal] val zigzag: Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](B * B)
    var i = 0
    for (d <- 0 until 2 * B - 1) {
      val ys =
        if (d % 2 == 0) (math.min(d, B - 1) to math.max(0, d - B + 1) by -1)
        else (math.max(0, d - B + 1) to math.min(d, B - 1))
      for (y <- ys) { out(i) = (y, d - y); i += 1 }
    }
    out
  }

  // ── Exp-Golomb bit I/O (H.264 §9.1) ─────────────────────────────────────

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    /** unsigned Exp-Golomb: v+1 in binary, prefixed by len−1 zeros */
    def ue(v: Long): Unit = {
      val x = v + 1
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
      var i = 0
      while (i < len - 1) { bit(0); i += 1 }
      i = len - 1
      while (i >= 0) { bit(((x >> i) & 1L).toInt); i -= 1 }
    }
    /** signed Exp-Golomb: v>0 → 2v−1, v≤0 → −2v */
    def se(v: Long): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def result(): Array[Byte] = {
      while (nBits != 0) bit(0) // byte-align with zero padding
      buf.toByteArray
    }
  }

  /** truncation-safe reader: any read past the end throws the private
    * marker exception, which decode converts to a fail-closed None
    */
  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start * 8
    private val end = bytes.length * 8
    def bit(): Int = {
      if (pos >= end) throw Truncated
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def ue(): Long = {
      var zeros = 0
      while (bit() == 0) {
        zeros += 1
        if (zeros > 62) throw Truncated // corrupt prefix, not a real code
      }
      var x = 1L
      var i = 0
      while (i < zeros) { x = (x << 1) | bit(); i += 1 }
      x - 1
    }
    def se(): Long = {
      val u = ue()
      if (u % 2 == 1) (u + 1) / 2 else -(u / 2)
    }
  }
  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ── transform ───────────────────────────────────────────────────────────

  /** forward 2-D DCT of an 8×8 residual (row-major Ints) → quantized
    * Longs (round(X · 2^ScaleBits)), zigzag order
    */
  private def forwardQuant(res: Array[Int]): Array[Long] = {
    val tmp = new Array[Double](B * B)
    // rows: tmp = res · K^T
    var y = 0
    while (y < B) {
      var k = 0
      while (k < B) {
        val kk = kern(k)
        var acc = 0.0
        var n = 0
        while (n < B) { acc += res(y * B + n) * kk(n); n += 1 }
        tmp(y * B + k) = acc
        k += 1
      }
      y += 1
    }
    val scale = (1L << ScaleBits).toDouble
    val out = new Array[Long](B * B)
    var i = 0
    while (i < B * B) {
      val (zy, zx) = zigzag(i)
      val kk = kern(zy)
      var acc = 0.0
      var n = 0
      while (n < B) { acc += kk(n) * tmp(n * B + zx); n += 1 }
      out(i) = Math.round(acc * scale)
      i += 1
    }
    out
  }

  /** inverse: quantized zigzag coefficients → rounded residual Ints */
  private def inverseDequant(q: Array[Long]): Array[Int] = {
    val invScale = 1.0 / (1L << ScaleBits).toDouble
    val coef = new Array[Double](B * B)
    var i = 0
    while (i < B * B) {
      val (zy, zx) = zigzag(i)
      coef(zy * B + zx) = q(i) * invScale
      i += 1
    }
    val tmp = new Array[Double](B * B)
    // rows of K^T · X: tmp(n, kx) = Σ_ky kern(ky)(n) · coef(ky, kx)
    var n = 0
    while (n < B) {
      var kx = 0
      while (kx < B) {
        var acc = 0.0
        var ky = 0
        while (ky < B) { acc += kern(ky)(n) * coef(ky * B + kx); ky += 1 }
        tmp(n * B + kx) = acc
        kx += 1
      }
      n += 1
    }
    val out = new Array[Int](B * B)
    var y = 0
    while (y < B) {
      var x = 0
      while (x < B) {
        var acc = 0.0
        var kx = 0
        while (kx < B) { acc += tmp(y * B + kx) * kern(kx)(x); kx += 1 }
        out(y * B + x) = Math.round(acc).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  // ── codec ───────────────────────────────────────────────────────────────

  /** encode a video (w, h multiples of [[B]]; ≥1 frame; within the
    * container's u16 header fields and the decoder's size clamps)
    */
  def encode(v: Video): Array[Byte] = {
    require(v.w > 0 && v.h > 0 && v.w % B == 0 && v.h % B == 0,
      s"dimensions must be positive multiples of $B")
    require(v.frames.nonEmpty && v.frames.forall(_.length == v.w * v.h),
      "every frame must be w*h bytes")
    // the header stores w/h/nFrames as u16 and decode() enforces its own
    // size clamps — an out-of-range video must throw HERE, not silently
    // truncate the header into a container that decodes to wrong
    // dimensions (or fails closed) with no hint at the encode site
    require(v.w <= 65535 && v.h <= 65535 && v.frames.length <= 65535,
      "w, h, nFrames must fit the container's u16 header fields")
    require(v.w.toLong * v.h <= (1 << 24) &&
      v.w.toLong * v.h * v.frames.length <= (1 << 26),
      "video exceeds the decoder's size clamp (2^24 px/frame, 2^26 total)")
    val head = new java.io.ByteArrayOutputStream
    head.write('M'); head.write('C'); head.write('V'); head.write('1')
    head.write(B); head.write(R); head.write(ScaleBits)
    head.write((v.w >> 8) & 0xff); head.write(v.w & 0xff)
    head.write((v.h >> 8) & 0xff); head.write(v.h & 0xff)
    head.write((v.frames.length >> 8) & 0xff)
    head.write(v.frames.length & 0xff)
    val bw = new BitWriter
    // closed-loop reference: the decoder's reconstruction (bit-exact
    // here, but reconstructing keeps the loop honest by construction)
    var recon: Array[Int] = null
    for (fi <- v.frames.indices) {
      val cur = v.frames(fi).map(_ & 0xff)
      val next = new Array[Int](v.w * v.h)
      var by = 0
      while (by < v.h / B) {
        var bx = 0
        while (bx < v.w / B) {
          val y0 = by * B; val x0 = bx * B
          var dy = 0; var dx = 0
          if (fi > 0) {
            // full-search SAD over the in-frame candidate window
            var best = Long.MaxValue
            var cdy = -R
            while (cdy <= R) {
              if (y0 + cdy >= 0 && y0 + cdy + B <= v.h) {
                var cdx = -R
                while (cdx <= R) {
                  if (x0 + cdx >= 0 && x0 + cdx + B <= v.w) {
                    var sad = 0L
                    var yy = 0
                    while (yy < B && sad < best) {
                      val co = (y0 + yy) * v.w + x0
                      val ro = (y0 + cdy + yy) * v.w + x0 + cdx
                      var xx = 0
                      while (xx < B) {
                        val dd = cur(co + xx) - recon(ro + xx)
                        sad += (if (dd < 0) -dd else dd)
                        xx += 1
                      }
                      yy += 1
                    }
                    // strict < keeps the (min SAD, min dy, min dx) rule
                    if (sad < best) { best = sad; dy = cdy; dx = cdx }
                  }
                  cdx += 1
                }
              }
              cdy += 1
            }
            bw.se(dy.toLong); bw.se(dx.toLong)
          }
          // residual (intra: prediction 0)
          val res = new Array[Int](B * B)
          var yy = 0
          while (yy < B) {
            var xx = 0
            while (xx < B) {
              val c = cur((y0 + yy) * v.w + x0 + xx)
              val p = if (fi == 0) 0
                else recon((y0 + dy + yy) * v.w + x0 + dx + xx)
              res(yy * B + xx) = c - p
              xx += 1
            }
            yy += 1
          }
          val q = forwardQuant(res)
          var nz = 0
          var i = 0
          while (i < B * B) { if (q(i) != 0) nz += 1; i += 1 }
          bw.ue(nz.toLong)
          var run = 0
          i = 0
          while (i < B * B) {
            if (q(i) == 0) run += 1
            else { bw.ue(run.toLong); bw.se(q(i)); run = 0 }
            i += 1
          }
          // reconstruct the block for the prediction loop
          val rhat = inverseDequant(q)
          yy = 0
          while (yy < B) {
            var xx = 0
            while (xx < B) {
              val p = if (fi == 0) 0
                else recon((y0 + dy + yy) * v.w + x0 + dx + xx)
              var px = p + rhat(yy * B + xx)
              if (px < 0) px = 0 else if (px > 255) px = 255
              next((y0 + yy) * v.w + x0 + xx) = px
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      recon = next
    }
    val out = new java.io.ByteArrayOutputStream
    head.writeTo(out)
    out.write(bw.result())
    out.toByteArray
  }

  /** header fields, bounds-checked BEFORE any size arithmetic */
  private def header(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 13) return None
    if (bytes(0) != 'M' || bytes(1) != 'C' || bytes(2) != 'V' ||
      bytes(3) != '1') return None
    if ((bytes(4) & 0xff) != B || (bytes(5) & 0xff) != R ||
      (bytes(6) & 0xff) != ScaleBits) return None
    val w = ((bytes(7) & 0xff) << 8) | (bytes(8) & 0xff)
    val h = ((bytes(9) & 0xff) << 8) | (bytes(10) & 0xff)
    val f = ((bytes(11) & 0xff) << 8) | (bytes(12) & 0xff)
    // bound dims before any multiplication: u16 each, plus the sane-size
    // clamp (≤ 2^24 pixels/frame, ≤ 2^26 total) that keeps a hostile
    // header from forcing a giant allocation
    if (w == 0 || h == 0 || f == 0 || w % B != 0 || h % B != 0) return None
    if (w.toLong * h > (1 << 24) || w.toLong * h * f > (1 << 26)) return None
    Some((w, h, f))
  }

  /** strict decode: container → video (bit-exact for encodes of real
    * frames — see object scaladoc error bound); None on any corruption
    */
  def decode(bytes: Array[Byte]): Option[Video] =
    try header(bytes).map { case (w, h, f) =>
      val br = new BitReader(bytes, 13)
      val frames = new Array[Array[Byte]](f)
      var recon: Array[Int] = null
      var fi = 0
      while (fi < f) {
        val next = new Array[Int](w * h)
        var by = 0
        while (by < h / B) {
          var bx = 0
          while (bx < w / B) {
            val y0 = by * B; val x0 = bx * B
            var dy = 0; var dx = 0
            if (fi > 0) {
              dy = br.se().toInt; dx = br.se().toInt
              // an out-of-window or out-of-frame vector is corruption
              if (dy < -R || dy > R || dx < -R || dx > R ||
                y0 + dy < 0 || y0 + dy + B > h ||
                x0 + dx < 0 || x0 + dx + B > w) throw Truncated
            }
            val nz = br.ue()
            if (nz < 0 || nz > B * B) throw Truncated
            val q = new Array[Long](B * B)
            var seen = 0L
            var i = -1
            while (seen < nz) {
              val run = br.ue()
              // bound BEFORE the Int add: a corrupt 2^40 run must not
              // wrap toInt into a "valid" position
              if (run >= B * B) throw Truncated
              i += run.toInt + 1
              if (i >= B * B) throw Truncated
              val lvl = br.se()
              if (lvl == 0) throw Truncated // levels are nonzero by def
              q(i) = lvl
              seen += 1
            }
            val rhat = inverseDequant(q)
            var yy = 0
            while (yy < B) {
              var xx = 0
              while (xx < B) {
                val p = if (fi == 0) 0
                  else recon((y0 + dy + yy) * w + x0 + dx + xx)
                var px = p + rhat(yy * B + xx)
                if (px < 0) px = 0 else if (px > 255) px = 255
                next((y0 + yy) * w + x0 + xx) = px
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        frames(fi) = next.map(_.toByte)
        recon = next
        fi += 1
      }
      Video(w, h, frames)
    } catch { case Truncated => None }

  /** the decoded motion field — one (frame, blockY, blockX, dy, dx) per
    * P-frame block, in stream order (spec surface: lets a test assert a
    * planted global shift is actually FOUND by the search, which the
    * bit-exact round trip alone cannot distinguish from residual-only
    * coding)
    */
  def motionField(bytes: Array[Byte]): Option[Seq[(Int, Int, Int, Int, Int)]] =
    decode(bytes).map { v =>
      // re-walk the stream, now that decode vouched for its integrity
      val br = new BitReader(bytes, 13)
      val out = Seq.newBuilder[(Int, Int, Int, Int, Int)]
      var fi = 0
      while (fi < v.frames.length) {
        var by = 0
        while (by < v.h / B) {
          var bx = 0
          while (bx < v.w / B) {
            if (fi > 0) {
              val dy = br.se().toInt; val dx = br.se().toInt
              out += ((fi, by, bx, dy, dx))
            }
            val nz = br.ue()
            var seen = 0L
            while (seen < nz) { br.ue(); br.se(); seen += 1 }
            bx += 1
          }
          by += 1
        }
        fi += 1
      }
      out.result()
    }
}
