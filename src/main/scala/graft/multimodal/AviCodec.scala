package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL video container, dependency-free: RIFF/AVI with uncompressed DIB
  * frames ('00db' chunks), the classic uncompressed-AVI layout. Container
  * walking is genuine RIFF work (the same chunk discipline as
  * [[WavCodec]]): 'RIFF'+'AVI ', a 'hdrl' LIST whose 'avih' declares
  * µs-per-frame and frame count, a 'movi' LIST holding one '00db' DIB per
  * frame, foreign chunks skipped with word alignment. Frame pixel decode
  * is [[BmpCodec.decodeDib]] — so frame extraction, per-frame features,
  * and frame sampling all run on real bytes end to end. (Inter-frame
  * compressed codecs stay behind the mapPartitions extension point, as
  * with entropy-coded images/audio.)
  */
object AviCodec {

  final case class Avi(microsPerFrame: Int, frames: Seq[BmpCodec.Bmp])

  def encode(v: Avi): Array[Byte] = {
    val dibs = v.frames.map(BmpCodec.encodeDib)
    def padded(n: Int) = n + (n & 1)
    // hdrl LIST: 'hdrl' + avih chunk (56-byte payload, standard size)
    val avihPayload = 56
    val hdrlSize = 4 + 8 + avihPayload
    val moviSize = 4 + dibs.map(d => 8 + padded(d.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
      .put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(avihPayload)
    bb.putInt(v.microsPerFrame)
    bb.putInt(0).putInt(0).putInt(0)          // maxBytesPerSec, pad, flags
    bb.putInt(v.frames.length)                 // dwTotalFrames
    bb.putInt(0).putInt(1)                     // initialFrames, streams
    bb.putInt(0)                               // suggestedBufferSize
    val (w0, h0) = v.frames.headOption
      .map(f => (f.width, f.height)).getOrElse((0, 0))
    bb.putInt(w0).putInt(h0)                   // dwWidth, dwHeight
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // reserved[4]
    bb.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
      .put("movi".getBytes("US-ASCII"))
    dibs.foreach { d =>
      bb.put("00db".getBytes("US-ASCII")).putInt(d.length).put(d)
      if ((d.length & 1) == 1) bb.put(0: Byte)
    }
    bb.array()
  }

  /** strict container walk; None unless RIFF/'AVI ' with a decodable
    * 'movi' stream (frames that fail DIB decode fail the file — a video
    * with corrupt frames must not silently shrink)
    */
  def decode(bytes: Array[Byte]): Option[Avi] = {
    if (bytes.length < 12) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(pos: Int): String = new String(bytes, pos, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var micros = 0
    val frames = Seq.newBuilder[BmpCodec.Bmp]
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
              if (cid == "00db") {
                BmpCodec.decodeDib(bytes, p + 8) match {
                  case Some(f) => frames += f
                  case None => return None
                }
              }
              p += 8 + csz + (csz & 1)
            }
          case _ => ()
        }
      }
      pos += 8 + size + (size & 1)
    }
    if (sawMovi) Some(Avi(micros, frames.result())) else None
  }
}
