package graft.multimodal

/** G.711 μ-law — a REAL standardized LOSSY audio codec (ITU-T G.711,
  * the telephone-network companding standard), implemented dependency-free
  * as the closed-form segment algorithm (equivalent to the classic
  * exp-lut C implementation; re-derived from the published algorithm, not
  * ported from any codebase):
  *
  *   encode(s):  sign ← s < 0;  a ← min(|s|, 32635) + 132 (the 0x84 bias)
  *               e ← ⌊log₂ a⌋ − 7              (segment, 0..7 — a ≥ 132)
  *               m ← (a >> (e+3)) & 0xF        (mantissa, leading 1 stripped)
  *               byte ← ~(sign·0x80 | e<<4 | m)  (G.711 transmits inverted)
  *   decode(b):  b ← ~b;  magnitude ← ((m·8 + 132) << e) − 132, signed.
  *
  * Unlike the container formats (BMP/WAV/PNG/JPEG/GIF), this codec is
  * LOSSY by design: decode(encode(s)) quantizes s to its segment's step
  * (error < 2^e·8). Both directions are pure integer arithmetic, so the
  * DuckDB oracle can replay encode∘decode per sample in closed form —
  * the quantized values themselves are oracle-checked, not just features
  * (q253). This closes the "lossy codecs are extension-point-only" gap
  * for audio within the dependency-free constraint; the remaining lossy
  * families (MP3/AAC/H.264) still need entropy/transform machinery beyond
  * a from-scratch build and stay behind the mapPartitions extension point.
  */
object MuLawCodec {

  private val Bias = 132  // 0x84
  private val Clip = 32635

  /** one 16-bit linear sample → one μ-law byte */
  def encodeSample(s: Int): Byte = {
    val sign = if (s < 0) 0x80 else 0x00
    val a0 = math.min(math.abs(s), Clip) + Bias
    var e = 7
    while (e > 0 && a0 < (256 << (e - 1))) e -= 1
    val m = (a0 >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | m)).toByte
  }

  /** one μ-law byte → the quantized 16-bit linear sample */
  def decodeSample(b: Byte): Int = {
    val u = ~b & 0xff
    val e = (u >> 4) & 0x07
    val m = u & 0x0f
    val mag = (((m << 3) + Bias) << e) - Bias
    if ((u & 0x80) != 0) -mag else mag
  }

  def encode(samples: Array[Int]): Array[Byte] =
    samples.map(encodeSample)

  def decode(bytes: Array[Byte]): Array[Int] =
    bytes.map(decodeSample)
}
