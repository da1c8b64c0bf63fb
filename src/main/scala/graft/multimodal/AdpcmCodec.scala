package graft.multimodal

/** IMA/DVI ADPCM — the second REAL LOSSY audio codec in the family and
  * the STATEFUL one: 4-bit adaptive differential PCM (the IMA standard
  * used in WAV format 0x11 and countless game/telephony stacks),
  * implemented dependency-free from the published algorithm (step-size
  * and index-adaptation tables are the IMA specification's public
  * constants).
  *
  * Where μ-law ([[MuLawCodec]]) quantizes each sample independently,
  * ADPCM quantizes the PREDICTION ERROR and adapts its step size as it
  * goes — per-sample state (predictor, step index) threads through the
  * whole clip, so a single wrong bit anywhere corrupts every later
  * sample. That is exactly what makes it the right oracle subject: the
  * DuckDB oracle replays the encoder's state machine sample by sample
  * (unrolled rounds, the BPE-oracle discipline), so the hash match pins
  * the entire state trajectory, not just end features.
  *
  * Encoding one sample s against state (pred, idx):
  *   step ← StepTable(idx);  d ← s − pred;  sign ← d < 0;  a ← |d|
  *   b2 ← a ≥ step;        a ← a − b2·step
  *   b1 ← a ≥ step/2;      a ← a − b1·(step/2)
  *   b0 ← a ≥ step/4
  *   nibble ← sign·8 + b2·4 + b1·2 + b0
  *   vpdiff ← step/8 + b2·step + b1·(step/2) + b0·(step/4)   (int div)
  *   pred  ← clamp(pred ± vpdiff, −32768, 32767)
  *   idx   ← clamp(idx + IndexTable(nibble), 0, 88)
  * The decoder reconstructs vpdiff from the nibble identically, so
  * decode(encode(x)) is exactly the encoder's predictor trajectory.
  * Nibbles pack two per byte, low nibble first (the IMA convention).
  */
object AdpcmCodec {

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** index adaptation by nibble (sign bit ignored: entries repeat) */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8,
    -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampPred(p: Int): Int =
    math.max(-32768, math.min(32767, p))
  private def clampIdx(i: Int): Int = math.max(0, math.min(88, i))

  /** one encode step: (state, sample) → (state', nibble) */
  def encodeStep(pred: Int, idx: Int, s: Int): (Int, Int, Int) = {
    val step = StepTable(idx)
    val d = s - pred
    val sign = if (d < 0) 8 else 0
    var a = math.abs(d)
    var nib = sign
    var vpdiff = step >> 3
    if (a >= step) { nib |= 4; a -= step; vpdiff += step }
    if (a >= (step >> 1)) { nib |= 2; a -= step >> 1; vpdiff += step >> 1 }
    if (a >= (step >> 2)) { nib |= 1; vpdiff += step >> 2 }
    val p2 = clampPred(if (sign != 0) pred - vpdiff else pred + vpdiff)
    val i2 = clampIdx(idx + IndexTable(nib))
    (p2, i2, nib)
  }

  /** one decode step: (state, nibble) → state' (the reconstructed sample
    * IS the new predictor) */
  def decodeStep(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = StepTable(idx)
    var vpdiff = step >> 3
    if ((nib & 4) != 0) vpdiff += step
    if ((nib & 2) != 0) vpdiff += step >> 1
    if ((nib & 1) != 0) vpdiff += step >> 2
    val p2 = clampPred(if ((nib & 8) != 0) pred - vpdiff else pred + vpdiff)
    (p2, clampIdx(idx + IndexTable(nib)))
  }

  /** clip encode from the zero state; two nibbles per byte, low first */
  def encode(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte]((samples.length + 1) / 2)
    var pred = 0; var idx = 0
    var i = 0
    while (i < samples.length) {
      val (p2, i2, nib) = encodeStep(pred, idx, samples(i))
      pred = p2; idx = i2
      if (i % 2 == 0) out(i / 2) = nib.toByte
      else out(i / 2) = (out(i / 2) | (nib << 4)).toByte
      i += 1
    }
    out
  }

  /** clip decode from the zero state */
  def decode(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pred = 0; var idx = 0
    var i = 0
    while (i < n) {
      val nib = if (i % 2 == 0) bytes(i / 2) & 0x0f
        else (bytes(i / 2) >> 4) & 0x0f
      val (p2, i2) = decodeStep(pred, idx, nib)
      pred = p2; idx = i2
      out(i) = pred
      i += 1
    }
    out
  }
}
