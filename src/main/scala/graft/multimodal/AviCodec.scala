package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL video container, dependency-free: RIFF/AVI with either
  * uncompressed DIB frames ('00db' chunks — the classic uncompressed-AVI
  * layout) or baseline-JPEG frames ('00dc' chunks — the classic
  * Motion-JPEG-in-AVI layout). Container walking is genuine RIFF work
  * (the same chunk discipline as [[WavCodec]]): 'RIFF'+'AVI ', a 'hdrl'
  * LIST whose 'avih' declares µs-per-frame and frame count, a 'movi'
  * LIST holding one frame chunk per frame, foreign chunks skipped with
  * word alignment. Frame pixel decode is [[BmpCodec.decodeDib]] for DIB
  * frames and the full [[JpegCodec]] baseline pipeline (marker walk,
  * DHT/DQT, Huffman, dequant, IDCT) for MJPEG frames — so frame
  * extraction, per-frame features, and frame sampling all run on real
  * bytes end to end, and MJPEG closes the transform-domain lossy video
  * family BY COMPOSITION of two already-verified codecs. (Inter-frame
  * predictive codecs — H.264-class — stay behind the mapPartitions
  * extension point, as with entropy-coded audio.)
  */
object AviCodec {

  final case class Avi(microsPerFrame: Int, frames: Seq[BmpCodec.Bmp])

  /** MJPEG-in-AVI: every frame a full baseline JPEG ([[JpegCodec.Jpeg]]). */
  final case class Mjpeg(microsPerFrame: Int, frames: Seq[JpegCodec.Jpeg])

  def encode(v: Avi): Array[Byte] = {
    val (w0, h0) = v.frames.headOption
      .map(f => (f.width, f.height)).getOrElse((0, 0))
    encodeContainer(v.microsPerFrame, w0, h0, "00db",
      v.frames.map(BmpCodec.encodeDib))
  }

  /** MJPEG encode: identical RIFF/AVI layout to [[encode]], but each
    * frame payload is a REAL baseline JPEG in a '00dc' (compressed)
    * chunk — the JPEG bytes come from the real encoder (forward DCT,
    * quantize, canonical Huffman, stuffing).
    */
  def encodeMjpeg(v: Mjpeg): Array[Byte] = {
    val (w0, h0) = v.frames.headOption
      .map(f => (f.width, f.height)).getOrElse((0, 0))
    encodeContainer(v.microsPerFrame, w0, h0, "00dc",
      v.frames.map(f => JpegCodec.encode(f)))
  }

  /** shared RIFF/AVI layout: hdrl(avih) + movi with one `frameId` chunk
    * per payload, word-aligned
    */
  private def encodeContainer(microsPerFrame: Int, w0: Int, h0: Int,
      frameId: String, payloads: Seq[Array[Byte]]): Array[Byte] = {
    def padded(n: Int) = n + (n & 1)
    // hdrl LIST: 'hdrl' + avih chunk (56-byte payload, standard size)
    val avihPayload = 56
    val hdrlSize = 4 + 8 + avihPayload
    val moviSize = 4 + payloads.map(d => 8 + padded(d.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
      .put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(avihPayload)
    bb.putInt(microsPerFrame)
    bb.putInt(0).putInt(0).putInt(0)          // maxBytesPerSec, pad, flags
    bb.putInt(payloads.length)                 // dwTotalFrames
    bb.putInt(0).putInt(1)                     // initialFrames, streams
    bb.putInt(0)                               // suggestedBufferSize
    bb.putInt(w0).putInt(h0)                   // dwWidth, dwHeight
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // reserved[4]
    bb.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
      .put("movi".getBytes("US-ASCII"))
    payloads.foreach { d =>
      bb.put(frameId.getBytes("US-ASCII")).putInt(d.length).put(d)
      if ((d.length & 1) == 1) bb.put(0: Byte)
    }
    bb.array()
  }

  /** strict container walk; None unless RIFF/'AVI ' with a decodable
    * 'movi' stream (frames that fail DIB decode fail the file — a video
    * with corrupt frames must not silently shrink)
    */
  def decode(bytes: Array[Byte]): Option[Avi] =
    walkFrames(bytes, "00db").flatMap { case (micros, spans) =>
      val frames = spans.map { case (off, _) => BmpCodec.decodeDib(bytes, off) }
      if (frames.forall(_.isDefined)) Some(Avi(micros, frames.map(_.get)))
      else None
    }

  /** strict MJPEG walk: same container discipline, '00dc' frames decoded
    * through the full baseline-JPEG pipeline; any undecodable frame
    * fails the FILE (never a silently-shorter video)
    */
  def decodeMjpeg(bytes: Array[Byte]): Option[Mjpeg] =
    walkFrames(bytes, "00dc").flatMap { case (micros, spans) =>
      val frames = spans.map { case (off, sz) =>
        JpegCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + sz))
      }
      if (frames.forall(_.isDefined)) Some(Mjpeg(micros, frames.map(_.get)))
      else None
    }

  /** the shared strict RIFF walk: returns (microsPerFrame, one
    * (offset, size) span per `frameId` chunk inside 'movi'), or None
    * unless the bytes are a well-formed RIFF/'AVI ' with a 'movi' LIST;
    * foreign chunks (including the OTHER frame flavor) skip with word
    * alignment, torn chunk bounds fail the file
    */
  private def walkFrames(bytes: Array[Byte],
      frameId: String): Option[(Int, Seq[(Int, Int)])] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(pos: Int): String = new String(bytes, pos, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var micros = 0
    val spans = Seq.newBuilder[(Int, Int)]
    var sawMovi = false
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = fourcc(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == "LIST" && size >= 4) {
        fourcc(pos + 8) match {
          case "hdrl" =>
            // avih is the first chunk inside hdrl
            if (size >= 12 + 4 && fourcc(pos + 12) == "avih")
              micros = bb.getInt(pos + 20)
          case "movi" =>
            sawMovi = true
            var p = pos + 12
            val end = pos + 8 + size
            while (p + 8 <= end) {
              val cid = fourcc(p)
              val csz = bb.getInt(p + 4)
              if (csz < 0 || p + 8 + csz > end) return None
              if (cid == frameId) spans += ((p + 8, csz))
              p += 8 + csz + (csz & 1)
            }
          case _ => ()
        }
      }
      pos += 8 + size + (size & 1)
    }
    if (sawMovi) Some((micros, spans.result())) else None
  }
}
