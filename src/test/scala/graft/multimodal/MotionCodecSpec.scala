package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Proofs for the motion-compensated video codec: bit-exact recovery in
  * the flat-quant regime, the motion SEARCH actually finding a planted
  * translation (which a bit-exact round trip alone cannot distinguish
  * from residual-only coding), the inter-coding bitrate win, zigzag
  * completeness, and fail-closed decodes on hostile/corrupt containers.
  */
class MotionCodecSpec extends AnyFunSuite {

  private def lcgBytes(seed: Long, n: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
  }

  test("round trip is bit-exact on pseudo-random frames (the < 1/2 LSB " +
      "flat-quant bound), including clamp-free reconstruction") {
    for (seed <- 1L to 4L) {
      val frames = Array.tabulate(3)(fi => lcgBytes(seed * 7 + fi, 24 * 16))
      val v = MotionCodec.Video(16, 24, frames)
      val out = MotionCodec.decode(MotionCodec.encode(v))
      assert(out.isDefined)
      assert(out.get.w == 16 && out.get.h == 24)
      for (fi <- 0 until 3)
        assert(java.util.Arrays.equals(out.get.frames(fi), frames(fi)),
          s"frame $fi of seed $seed not bit-exact")
    }
  }

  test("a planted translation is FOUND by the search: every interior " +
      "block of the P-frame carries exactly the (-1,-2) vector that " +
      "points back to the shifted content") {
    val w = 32; val h = 32
    val f0 = lcgBytes(99, w * h)
    val f1 = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      f1(y * w + x) =
        if (y >= 1 && x >= 2) f0((y - 1) * w + (x - 2))
        else ((y * 31 + x * 7) % 256).toByte // border fill
    val bytes = MotionCodec.encode(MotionCodec.Video(w, h, Array(f0, f1)))
    val mvs = MotionCodec.motionField(bytes).get
    // interior blocks: pixels all satisfy the translation AND the
    // reference window stays in frame for (dy, dx) = (1, 2)
    // f1(y,x) = f0(y-1,x-2), so the reference offset is (dy,dx)=(-1,-2)
    val interior = mvs.filter { case (_, by, bx, _, _) =>
      by >= 1 && by <= 2 && bx >= 1 && bx <= 2 }
    assert(interior.size == 4)
    interior.foreach { case (fi, by, bx, dy, dx) =>
      assert(dy == -1 && dx == -2,
        s"block ($by,$bx) of frame $fi found ($dy,$dx), expected (-1,-2)")
    }
  }

  test("inter coding wins: the 2-frame shifted sequence encodes smaller " +
      "than the two frames coded independently (intra-only)") {
    val w = 32; val h = 32
    val f0 = lcgBytes(7, w * h)
    val f1 = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      f1(y * w + x) =
        if (y >= 1 && x >= 2) f0((y - 1) * w + (x - 2))
        else 0.toByte
    val inter = MotionCodec.encode(MotionCodec.Video(w, h, Array(f0, f1)))
    val intra =
      MotionCodec.encode(MotionCodec.Video(w, h, Array(f0))).length +
        MotionCodec.encode(MotionCodec.Video(w, h, Array(f1))).length
    assert(inter.length < intra,
      s"inter ${inter.length} B should beat 2×intra $intra B")
  }

  test("zigzag covers every coefficient position exactly once") {
    assert(MotionCodec.zigzag.toSet.size == 64)
    assert(MotionCodec.zigzag.forall { case (y, x) =>
      y >= 0 && y < 8 && x >= 0 && x < 8 })
    // the canonical start: DC, then the first anti-diagonal
    assert(MotionCodec.zigzag.take(3).toSeq ==
      Seq((0, 0), (0, 1), (1, 0)))
  }

  test("decode fails closed: bad magic, hostile dimensions (no giant " +
      "allocation), truncation, and out-of-window motion vectors") {
    val good = MotionCodec.encode(MotionCodec.Video(16, 16,
      Array(lcgBytes(1, 256), lcgBytes(2, 256))))
    assert(MotionCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(MotionCodec.decode(badMagic).isEmpty)
    // hostile header: w = h = 0xff00 (multiples of 8) → 2^32 pixels —
    // must fail the sane-size clamp BEFORE allocating
    val hostile = good.clone()
    hostile(7) = 0xff.toByte; hostile(8) = 0
    hostile(9) = 0xff.toByte; hostile(10) = 0
    assert(MotionCodec.decode(hostile).isEmpty)
    // truncation mid-stream
    assert(MotionCodec.decode(good.take(good.length - 8)).isEmpty)
    // non-multiple-of-8 width
    val badW = good.clone(); badW(8) = 17.toByte
    assert(MotionCodec.decode(badW).isEmpty)
  }

  test("encode fails loud on videos outside the u16 header fields or the " +
      "decoder's size clamps (no silent header truncation)") {
    // u16 overflow: 65536 frames would truncate the nFrames field to 0
    val one = lcgBytes(9, 64)
    intercept[IllegalArgumentException] {
      MotionCodec.encode(MotionCodec.Video(8, 8, Array.fill(65536)(one)))
    }
    // per-frame clamp: 2^12 × 2^13 = 2^25 px > the decoder's 2^24/frame —
    // an encode would produce a container its own decoder rejects
    intercept[IllegalArgumentException] {
      MotionCodec.encode(MotionCodec.Video(4096, 8192,
        Array(new Array[Byte](4096 * 8192))))
    }
    // total clamp: 2^24 px/frame is legal per frame, but 8 frames make
    // 2^27 > the decoder's 2^26 total
    intercept[IllegalArgumentException] {
      MotionCodec.encode(MotionCodec.Video(4096, 4096,
        Array.fill(8)(new Array[Byte](4096 * 4096))))
    }
  }

  test("the q500 generative clip replays: decoded weighted checksum " +
      "equals the closed-form formula (the oracle's identity)") {
    val key = 42L
    val frames = Array.tabulate(3) { fi =>
      val px = new Array[Byte](256)
      for (y <- 0 until 16; x <- 0 until 16) {
        val pos = ((y + fi) % 16) * 16 + (x + 2 * fi) % 16
        px(y * 16 + x) = ((key * 31 + pos.toLong * 7) % 256).toByte
      }
      px
    }
    val v = MotionCodec
      .decode(MotionCodec.encode(MotionCodec.Video(16, 16, frames))).get
    var got = 0L
    var want = 0L
    for (fi <- 0 until 3; p <- 0 until 256) {
      got += (fi + 1L) * (p + 1L) * (v.frames(fi)(p) & 0xff)
      val pos = (((p / 16) + fi) % 16) * 16 + ((p % 16) + 2 * fi) % 16
      want += (fi + 1L) * (p + 1L) * ((key * 31 + pos.toLong * 7) % 256)
    }
    assert(got == want)
  }
}
