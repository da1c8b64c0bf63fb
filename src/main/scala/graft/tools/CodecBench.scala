package graft.tools

import graft.multimodal.{AviCodec, JpegCodec, MotionCodec, Mp4Codec, Multimodal}

/** Single-thread micro-profile of the codec hot loops (optimization-round
  * instrument): per-media encode and decode cost for the MJPEG/MP4/motion
  * fixtures, so per-task work (guide §1.2 step 2) is attributed before it
  * is optimized — the Spark rows bundle generate+decode+agg and cannot
  * localize the hot half.
  */
object CodecBench {
  private def time(label: String, n: Int)(body: Int => Unit): Unit = {
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { body(i); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"$label%-28s n=$n%6d total=$dt%7.3f s  per=${dt / n * 1e6}%9.1f us")
  }

  def main(args: Array[String]): Unit = {
    def frames(ck: Long) = {
      val nf = (ck % 3 + 2).toInt
      (0 until nf).map { f =>
        val px = new Array[Byte](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val b = (y / 8) * 4 + x / 8
            px(y * 32 + x) = Multimodal.mjpegBlockValue(ck, f, b).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.Jpeg(32, 32, 1, px)
      }
    }
    // warm up JIT
    (0 until 200).foreach { i =>
      val b = AviCodec.encodeMjpeg(AviCodec.Mjpeg(40000, frames(i)))
      AviCodec.decodeMjpeg(b)
    }
    val n = 2000
    time("mjpeg frames-gen", n)(i => frames(i))
    val encoded = (0 until n).map(i =>
      AviCodec.encodeMjpeg(AviCodec.Mjpeg(40000, frames(i)))).toArray
    time("mjpeg encode", n)(i =>
      AviCodec.encodeMjpeg(AviCodec.Mjpeg(40000, frames(i))))
    time("mjpeg decode", n)(i => AviCodec.decodeMjpeg(encoded(i)))
    val mp4 = (0 until n).map(i =>
      Mp4Codec.encode(Mp4Codec.Mp4(1000000, 40000, frames(i)))).toArray
    time("mp4 encode", n)(i =>
      Mp4Codec.encode(Mp4Codec.Mp4(1000000, 40000, frames(i))))
    time("mp4 decode", n)(i => Mp4Codec.decode(mp4(i)))
    // motion clips (the q500 clipVideo formula, replicated)
    def clip(key: Long): MotionCodec.Video = {
      val fr = Array.tabulate(3) { fi =>
        val px = new Array[Byte](256)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val pos = ((y + fi) % 16) * 16 + (x + 2 * fi) % 16
            px(y * 16 + x) = ((key * 31 + pos.toLong * 7) % 256).toByte
            x += 1
          }
          y += 1
        }
        px
      }
      MotionCodec.Video(16, 16, fr)
    }
    val clips = (0 until n).map(i => clip(i.toLong)).toArray
    time("motion encode", n)(i => MotionCodec.encode(clips(i)))
    val menc = clips.map(MotionCodec.encode(_))
    time("motion decode", n)(i => MotionCodec.decode(menc(i)))
  }
}
