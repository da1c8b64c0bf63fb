package graft.multimodal

import java.io.ByteArrayOutputStream

/** MDCT — the TRANSFORM-DOMAIN lossy audio codec completing the audio
  * family (μ-law quantizes samples, ADPCM quantizes prediction error;
  * every modern perceptual codec — MP3, AAC, Opus/CELT, Vorbis —
  * quantizes MODIFIED-DCT coefficients of 50%-overlapped windowed
  * frames). Implemented dependency-free from the published math
  * (Princen & Bradley 1986; the lapped-transform formulation in every
  * signal-processing text):
  *
  *   forward, frame of 2N samples → N coefficients:
  *     X[k] = Σ_{n=0}^{2N−1} w[n]·x[n]·cos(π/N·(n + 0.5 + N/2)·(k + 0.5))
  *   inverse, N coefficients → 2N samples:
  *     y[n] = (2/N)·Σ_{k=0}^{N−1} X[k]·cos(π/N·(n + 0.5 + N/2)·(k + 0.5))·w[n]
  *
  * with the sine window w[n] = sin(π/(2N)·(n+0.5)) over the 2N-sample
  * frame (symmetric, and w[n]² + w[n+N]² = sin² + cos² = 1 — the
  * Princen–Bradley condition) — overlap-adding the
  * inverses of consecutive half-overlapped frames cancels the time-
  * domain aliasing EXACTLY (TDAC), so the unquantized round trip is
  * perfect reconstruction.
  *
  * Exact-recovery regime (the JPEG/flat-quant discipline, q179): with
  * quantization step 2^−ScaleBits = 1/16, the per-sample reconstruction
  * error is bounded by 2·step = 1/8 < 1/2 LSB (each of the two
  * overlapping frames contributes ≤ (2/N)·N·(step/2) = step), so
  * rounding recovers the original 16-bit samples BIT-EXACTLY — any
  * defect in windowing, the cosine kernel, framing, or overlap-add
  * breaks the recovery and the oracle hash.
  *
  * Container: "MDC1", u16 N, u32 nSamples, u8 scaleBits, then
  * ceil(ns/N)+1 frames × N coefficients as i32 big-endian. Strict
  * decode: fails closed (None) on magic/length/parameter mismatch.
  */
object MdctCodec {

  /** coefficients per frame (frames are 2N samples, hop N) */
  val N = 32

  /** quantization: step = 2^−ScaleBits */
  val ScaleBits = 4

  private val win: Array[Double] = Array.tabulate(2 * N)(n =>
    StrictMath.sin(StrictMath.PI / (2.0 * N) * (n + 0.5)))

  /** cos(π/N·(n + 0.5 + N/2)·(k + 0.5)), [k][n] */
  private val kern: Array[Array[Double]] = Array.tabulate(N, 2 * N)((k, n) =>
    StrictMath.cos(StrictMath.PI / N * (n + 0.5 + N / 2.0) * (k + 0.5)))

  /** frames needed for ns samples: one per hop plus the lead-in frame */
  def frameCount(ns: Int): Int = (ns + N - 1) / N + 1

  /** encode 16-bit PCM → MDCT container (quantized coefficients) */
  def encode(pcm: Array[Short]): Array[Byte] = {
    val ns = pcm.length
    val f = frameCount(ns)
    // padded signal: N leading zeros, then pcm, zeros to (f+1)·N
    val p = new Array[Double]((f + 1) * N)
    var i = 0
    while (i < ns) { p(N + i) = pcm(i).toDouble; i += 1 }
    val out = new ByteArrayOutputStream
    out.write('M'); out.write('D'); out.write('C'); out.write('1')
    out.write((N >> 8) & 0xff); out.write(N & 0xff)
    out.write((ns >> 24) & 0xff); out.write((ns >> 16) & 0xff)
    out.write((ns >> 8) & 0xff); out.write(ns & 0xff)
    out.write(ScaleBits)
    val scale = (1L << ScaleBits).toDouble
    var fr = 0
    while (fr < f) {
      val base = fr * N
      var k = 0
      while (k < N) {
        val kk = kern(k)
        var acc = 0.0
        var n = 0
        while (n < 2 * N) {
          acc += win(n) * p(base + n) * kk(n)
          n += 1
        }
        val q = Math.round(acc * scale) // round(X / 2^-bits)
        val qi = q.toInt
        out.write((qi >> 24) & 0xff); out.write((qi >> 16) & 0xff)
        out.write((qi >> 8) & 0xff); out.write(qi & 0xff)
        k += 1
      }
      fr += 1
    }
    out.toByteArray
  }

  /** strict decode: container → 16-bit PCM (exact recovery for encodes
    * of 16-bit inputs — see object scaladoc error bound)
    */
  def decode(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 11) return None
    if (bytes(0) != 'M' || bytes(1) != 'D' || bytes(2) != 'C' ||
      bytes(3) != '1') return None
    val n0 = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    if (n0 != N) return None
    val ns = ((bytes(6) & 0xff) << 24) | ((bytes(7) & 0xff) << 16) |
      ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
    // bound ns BEFORE deriving sizes: a hostile header with ns ~ 2^30
    // would otherwise wrap the Int length check below (11 + f·N·4
    // overflows 32 bits) and the "strict" decode would allocate
    // gigabytes / throw instead of failing closed
    if (ns < 0 || ns > (1 << 26)) return None
    val sb = bytes(10) & 0xff
    if (sb != ScaleBits) return None
    val f = frameCount(ns)
    if (bytes.length.toLong != 11L + f.toLong * N * 4) return None
    val invScale = 1.0 / (1L << sb).toDouble
    // overlap-add buffer over the padded timeline
    val y = new Array[Double]((f + 1) * N)
    var fr = 0
    var o = 11
    while (fr < f) {
      val base = fr * N
      var k = 0
      while (k < N) {
        val qi = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        o += 4
        val xk = qi.toDouble * invScale
        if (xk != 0.0) { // zero coeffs contribute exact ±0.0 — skip
          val kk = kern(k)
          val c = 2.0 / N * xk
          var n = 0
          while (n < 2 * N) {
            y(base + n) += c * kk(n) * win(n)
            n += 1
          }
        }
        k += 1
      }
      fr += 1
    }
    val pcm = new Array[Short](ns)
    var i = 0
    while (i < ns) {
      val v = Math.round(y(N + i))
      if (v < -32768 || v > 32767) return None // corrupt stream
      pcm(i) = v.toShort
      i += 1
    }
    Some(pcm)
  }
}
