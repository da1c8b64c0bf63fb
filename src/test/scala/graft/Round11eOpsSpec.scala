package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-7 operators (Holt smoothing, ACF, DP clipped mean,
  * ECE).
  */
class Round11eOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Holt: level/trend/forecast match a pure-Scala sequential fold exactly; linear series is tracked exactly") {
    // closed-form sanity: on x_t = a + c*t the recursion converges to
    // level = current value, trend = c; after a long run the forecast
    // extrapolates the line. Run the same fold in Scala.
    def holt(xs: Seq[Double]): (Double, Double) =
      xs.tail.foldLeft((xs.head, 0.0)) { case ((l, b), x) =>
        val nl = 0.5 * x + 0.5 * (l + b)
        (nl, 0.25 * (nl - l) + 0.75 * b)
      }
    val line = (0 until 200).map(t => 10.0 + 3.0 * t)
    val (ll, lb) = holt(line)
    assert(math.abs(lb - 3.0) < 1e-6, s"trend on a line: $lb")
    assert(math.abs(ll - line.last) < 1e-4, s"level on a line: $ll")
    // operator vs the same fold over the real day grain
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val xs = Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("cnt")).orderBy("day")
      .collect().map(_.getLong(1).toDouble).toSeq
    val (rl, rb) = holt(xs)
    val out = run("q357_holt_winters").head
    assert(out.getLong(0) == xs.length.toLong)
    assert(out.getDouble(1) == rl, s"level ${out.getDouble(1)} != $rl")
    assert(out.getDouble(2) == rb, s"trend ${out.getDouble(2)} != $rb")
    assert(out.getDouble(3) == rl + 7.0 * rb)
  }

  test("ACF: r_0-analogue is 1 by construction; all lags within [-1,1]; lag-k pairs counted exactly") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val daily = Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val days = daily.map(_._1).toSet
    val rows = run("q358_acf").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (lag, nPairs, acf) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val expectPairs = daily.count(p => days.contains(p._1 + lag)).toLong
      assert(nPairs == expectPairs, s"lag $lag pair count")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9,
        s"r($lag)=$acf out of range")
    }
    // exact reimplementation of lag 1 with BigInt moments
    val n = BigInt(daily.length); val sx = BigInt(daily.map(_._2).sum)
    val xm = daily.map(p => p._1 -> BigInt(p._2)).toMap
    val den = daily.map(p => (n * xm(p._1) - sx) * (n * xm(p._1) - sx)).sum
    val num = daily.filter(p => days.contains(p._1 + 1))
      .map(p => (n * xm(p._1) - sx) * (n * xm(p._1 + 1) - sx)).sum
    val r1 = num.toDouble / den.toDouble
    assert(rows.head.getDouble(2) == r1, s"r(1) ${rows.head.getDouble(2)} != $r1")
  }

  test("DP clipped mean: noisy values differ from the true ones by the seeded noise exactly; clipping accounted") {
    val out = run("q359_dp_mean").head
    val (nUsers, clipSum, nClipped, noisySum, noisyN) = (out.getLong(0),
      out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
    val users = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    assert(nUsers == users.length.toLong)
    assert(clipSum == users.map(u => math.min(u, 64L)).sum)
    assert(nClipped == users.count(_ > 64L).toLong)
    // the noise the release added is exactly recoverable (audit), and
    // bounded: |Laplace sample| realized here must be finite and the
    // release internally consistent with its own mean
    val noiseSum = noisySum - clipSum * 1000000L
    val noiseN = noisyN - nUsers * 1000000L
    assert(noiseSum != 0L || noiseN != 0L, "seeded noise cannot be zero")
    assert(out.getDouble(5) == noisySum.toDouble / noisyN.toDouble)
  }

  test("ECE: recomputes from q308's reliability bins; MCE >= ECE") {
    val bins = run("q308_reliability_bins").collect()
    val gaps = bins.map { b =>
      val (n, pr, ms) = (b.getLong(1), b.getLong(3), b.getLong(4))
      (n, math.abs(pr - ms))
    }
    val nTot = gaps.map(_._1).sum
    val ece = gaps.map { case (n, g) => n * g }.sum / nTot
    val mce = gaps.map(_._2).max
    val out = run("q360_ece").head
    assert(out.getLong(0) == nTot)
    assert(out.getLong(1) == ece, s"ece ${out.getLong(1)} != $ece")
    assert(out.getLong(2) == mce)
    assert(out.getLong(2) >= out.getLong(1), "MCE must dominate ECE")
  }
}
