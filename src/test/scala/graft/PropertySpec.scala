package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, BmpCodec, WavCodec}

/** Property-based tests (ScalaCheck) for the pure-JVM kernels: the codecs
  * and the Morton interleave must hold their invariants for ARBITRARY
  * inputs, not just the handful of fixtures the example tests pin.
  */
class PropertySpec extends AnyFunSuite {

  /** run a ScalaCheck property under the default 100-case regime and fail
    * the ScalaTest test with the counterexample on violation
    */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  // ── BMP: encode/decode is the identity for any dimensions/pixels ──────
  test("BMP round-trips arbitrary images exactly") {
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(-128, 127).map(_.toByte))
    } yield BmpCodec.Bmp(w, h, px)
    check(forAll(genImg) { img =>
      BmpCodec.decode(BmpCodec.encode(img)).exists(b =>
        b.width == img.width && b.height == img.height &&
          java.util.Arrays.equals(b.pixels, img.pixels))
    })
  }

  test("BMP resize preserves the nearest-neighbor mapping for arbitrary sizes") {
    val gen = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
      w2 <- Gen.choose(1, 24); h2 <- Gen.choose(1, 24)
      px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(-128, 127).map(_.toByte))
    } yield (BmpCodec.Bmp(w, h, px), w2, h2)
    check(forAll(gen) { case (img, w2, h2) =>
      val r = BmpCodec.resizeNearest(img, w2, h2)
      r.width == w2 && r.height == h2 &&
        (0 until h2).forall(y2 => (0 until w2).forall { x2 =>
          val sx = (x2.toLong * img.width / w2).toInt
          val sy = (y2.toLong * img.height / h2).toInt
          (0 until 3).forall(c =>
            r.pixels((y2 * w2 + x2) * 3 + c) ==
              img.pixels((sy * img.width + sx) * 3 + c))
        })
    })
  }

  // ── WAV: round trip for arbitrary sample buffers and rates ────────────
  test("WAV round-trips arbitrary PCM buffers exactly") {
    val gen = for {
      rate <- Gen.choose(1, 192000)
      samples <- Gen.containerOf[Array, Short](
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    } yield WavCodec.Wav(rate, samples)
    check(forAll(gen) { w =>
      WavCodec.decode(WavCodec.encode(w)).exists(b =>
        b.sampleRate == w.sampleRate &&
          java.util.Arrays.equals(b.samples, w.samples))
    })
  }

  // ── AVI: round trip for arbitrary frame sequences ─────────────────────
  test("AVI round-trips arbitrary frame sequences exactly") {
    val genFrame = for {
      w <- Gen.choose(1, 12); h <- Gen.choose(1, 12)
      px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.choose(-128, 127).map(_.toByte))
    } yield BmpCodec.Bmp(w, h, px)
    val gen = for {
      micros <- Gen.choose(1, 1000000)
      frames <- Gen.listOfN(3, genFrame) // fixed count keeps cases cheap
    } yield AviCodec.Avi(micros, frames)
    check(forAll(gen) { v =>
      AviCodec.decode(AviCodec.encode(v)).exists(b =>
        b.microsPerFrame == v.microsPerFrame &&
          b.frames.length == v.frames.length &&
          b.frames.zip(v.frames).forall { case (x, y) =>
            x.width == y.width && x.height == y.height &&
              java.util.Arrays.equals(x.pixels, y.pixels)
          })
    })
  }

  // ── Morton interleave: bijective on 32-bit pairs, order-compatible ────
  test("zValue is the exact Morton interleave (bijective on 32-bit pairs)") {
    // reference de-interleave: collect even/odd bits back out
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      var i = 0
      while (i < 32) {
        a |= ((z >>> (2 * i)) & 1L) << i
        b |= ((z >>> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (a, b)
    }
    val spark = SparkFixture.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOfN(50, for {
      a <- Gen.choose(0L, 0xFFFFFFFFL)
      b <- Gen.choose(0L, 0xFFFFFFFFL)
    } yield (a, b))
    check(forAll(gen) { pairs =>
      pairs.isEmpty || {
        val rows = pairs.toDF("a", "b")
          .select(col("a"), col("b"),
            graft.catalog.DB.zValue(col("a"), col("b")).as("z"))
          .collect()
        rows.forall { r =>
          deinterleave(r.getLong(2)) == ((r.getLong(0), r.getLong(1)))
        }
      }
    })
  }
}
