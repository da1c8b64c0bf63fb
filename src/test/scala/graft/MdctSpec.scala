package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MdctCodec

/** MDCT codec proofs: window identity, exact recovery across frame
  * boundaries and lengths, container strictness.
  */
class MdctSpec extends AnyFunSuite {

  private def pcmOf(seed: Long, ns: Int): Array[Short] =
    Array.tabulate(ns)(n =>
      (((seed * 31 + n.toLong * n * 7) % 4001) - 2000).toShort)

  test("sine window satisfies Princen–Bradley: w[n]^2 + w[n+N]^2 = 1") {
    val N = MdctCodec.N
    val w = Array.tabulate(2 * N)(n =>
      StrictMath.sin(StrictMath.PI / (2.0 * N) * (n + 0.5)))
    for (n <- 0 until N)
      assert(math.abs(w(n) * w(n) + w(n + N) * w(n + N) - 1.0) < 1e-12,
        s"PB violated at n=$n")
    // and symmetric over the frame
    for (n <- 0 until 2 * N)
      assert(math.abs(w(2 * N - 1 - n) - w(n)) < 1e-12)
  }

  test("round trip is bit-exact across lengths incl. frame boundaries") {
    for (ns <- Seq(1, 31, 32, 33, 63, 64, 65, 200, 1000)) {
      val pcm = pcmOf(ns.toLong * 17 + 5, ns)
      val back = MdctCodec.decode(MdctCodec.encode(pcm))
      assert(back.exists(_.sameElements(pcm)), s"round trip broke at ns=$ns")
    }
  }

  test("full-amplitude 16-bit content recovers exactly") {
    val pcm = Array.tabulate(500)(n =>
      (if (n % 2 == 0) 32767 - n * 13 else -32768 + n * 11).toShort)
    val back = MdctCodec.decode(MdctCodec.encode(pcm))
    assert(back.exists(_.sameElements(pcm)))
  }

  test("strict decode fails closed") {
    val good = MdctCodec.encode(pcmOf(1, 100))
    assert(MdctCodec.decode(good).isDefined)
    assert(MdctCodec.decode(Array[Byte]()).isEmpty, "empty")
    assert(MdctCodec.decode(good.take(10)).isEmpty, "truncated header")
    assert(MdctCodec.decode(good.dropRight(1)).isEmpty, "truncated body")
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(MdctCodec.decode(badMagic).isEmpty, "magic")
    val badN = good.clone(); badN(5) = (MdctCodec.N + 1).toByte
    assert(MdctCodec.decode(badN).isEmpty, "N mismatch")
    assert(MdctCodec.decode(good ++ Array[Byte](0)).isEmpty, "trailing junk")
    // hostile header: ns = 2^30 would overflow an Int length check
    // (11 + f·N·4 wraps) and masquerade as consistent — must fail
    // closed, not allocate gigabytes or throw
    val hugeNs = good.clone()
    hugeNs(6) = 0x40.toByte; hugeNs(7) = 0; hugeNs(8) = 0; hugeNs(9) = 0
    assert(MdctCodec.decode(hugeNs).isEmpty, "hostile ns")
  }

  test("the codec is genuinely lossy in the transform domain: coefficients " +
      "quantize (container smaller than a verbatim spectrum), yet recovery " +
      "is exact by the error bound") {
    val pcm = pcmOf(99, 320)
    val enc = MdctCodec.encode(pcm)
    // container = header + frames*N i32 coeffs
    assert(enc.length ==
      11 + MdctCodec.frameCount(320) * MdctCodec.N * 4)
    assert(MdctCodec.decode(enc).exists(_.sameElements(pcm)))
  }
}
