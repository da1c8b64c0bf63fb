package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL audio codec, dependency-free: 16-bit mono PCM in a RIFF/WAVE
  * container. PCM needs no entropy coder, so — like [[BmpCodec]] for
  * images — decode, feature extraction, and resampling here are genuine
  * kernels, not stubs.
  *
  * The decoder WALKS CHUNKS the way real WAV readers must: 'RIFF' +
  * 'WAVE', then any sequence of `<fourcc><u32-LE size><payload>` chunks
  * (word-aligned), picking up 'fmt ' and 'data' wherever they appear and
  * skipping foreign chunks ('LIST', 'INFO', …) — files in the wild carry
  * them. Strict rejection of non-PCM, non-mono, non-16-bit variants and
  * truncated payloads.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, samples: Array[Short])

  /** encode 16-bit mono PCM into a canonical RIFF/WAVE file */
  def encode(w: Wav): Array[Byte] = {
    val dataSize = w.samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(w.sampleRate)
      .putInt(w.sampleRate * 2)          // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    w.samples.foreach(bb.putShort)
    bb.array()
  }

  /** strict chunk-walking decode: None on anything that is not 16-bit
    * mono PCM with complete payloads
    */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(pos: Int): String =
      new String(bytes, pos, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var okFmt = false
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = bb.getShort(pos + 8)
          val channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22)
          okFmt = audioFormat == 1 && channels == 1 && bits == 16 && rate > 0
        case "data" =>
          if (size % 2 != 0) return None
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) {
            out(i) = bb.getShort(pos + 8 + i * 2); i += 1
          }
          data = out
        case _ => () // foreign chunk (LIST/INFO/fact/…): skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (okFmt && data != null) Some(Wav(rate, data)) else None
  }

  /** exact integer features: sample count, Σ s², peak |s| — hash-stable
    * (RMS = sqrt(sumSq/n) is derivable; the sqrt stays out of the oracle)
    */
  def stats(w: Wav): (Long, Long, Long) = {
    var sumSq = 0L
    var peak = 0L
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toLong
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    (w.samples.length.toLong, sumSq, peak)
  }

  /** nearest-neighbor resample to n2 samples: out(j) = in(j·n / n2),
    * truncating division — same closed-form mapping as the image kernel
    */
  def resampleNearest(w: Wav, n2: Int, newRate: Int): Wav = {
    require(n2 > 0 && w.samples.nonEmpty)
    val out = new Array[Short](n2)
    var j = 0
    while (j < n2) {
      out(j) = w.samples((j.toLong * w.samples.length / n2).toInt)
      j += 1
    }
    Wav(newRate, out)
  }
}
