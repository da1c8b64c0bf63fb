package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-14 operators (PACF, energy distance, Nelson-Aalen,
  * IV Wald, QTE deciles, cluster-aware split).
  */
class Round11lOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def dailyEvents(): Array[(Long, Long)] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("PACF: phi1/phi2/phi3 match the shared closed forms from BigInt moments, and phi3 solves the Yule-Walker system") {
    val xs = dailyEvents().sortBy(_._1)
    val n = xs.length.toLong
    val sx = xs.map(_._2).sum
    val byDay = xs.toMap
    val den = xs.map { case (_, x) =>
      val c = BigInt(n * x - sx); c * c }.sum
    def numK(k: Long): BigInt = xs.flatMap { case (day, x) =>
      byDay.get(day + k).map(xj =>
        BigInt(n * x - sx) * BigInt(n * xj - sx)) }.sum
    val r1 = numK(1).toDouble / den.toDouble
    val r2 = numK(2).toDouble / den.toDouble
    val r3 = numK(3).toDouble / den.toDouble
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p3 = (r3 - 2.0 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 +
      r1 * r1 * r1) /
      (1.0 - 2.0 * r1 * r1 + 2.0 * r1 * r1 * r2 - r2 * r2)
    val out = run("q397_pacf").head
    assert(out.getLong(0) == n)
    assert(out.getDouble(1) == r1 && out.getDouble(2) == p2 &&
      out.getDouble(3) == p3)
    // phi3 really solves R3 phi = r (Gaussian elimination, tolerance)
    val a = Array(
      Array(1.0, r1, r2, r1),
      Array(r1, 1.0, r1, r2),
      Array(r2, r1, 1.0, r3))
    for (i <- 0 until 3; j <- i + 1 until 3) {
      val f = a(j)(i) / a(i)(i)
      for (c <- i until 4) a(j)(c) -= f * a(i)(c)
    }
    val x3 = a(2)(3) / a(2)(2)
    assert(math.abs(out.getDouble(3) - x3) < 1e-12,
      s"${out.getDouble(3)} vs $x3")
  }

  test("energy distance: matches a brute-force all-pairs recomputation; nonnegative") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    val a1 = rows.filter(_._1 == 1L).map(_._2)
    val a0 = rows.filter(_._1 == 0L).map(_._2)
    def cross(x: Array[Long], y: Array[Long]): BigInt =
      x.map(v => y.map(u => BigInt(math.abs(v - u))).sum).sum
    def within(x: Array[Long]): BigInt = {
      var s = BigInt(0)
      for (i <- x.indices; j <- i + 1 until x.length)
        s += math.abs(x(i) - x(j))
      s
    }
    val sab = cross(a1, a0)
    val s11 = within(a1); val s00 = within(a0)
    val e = 2.0 * sab.toDouble / (a1.length.toDouble * a0.length.toDouble) -
      2.0 * s11.toDouble / (a1.length.toDouble * a1.length.toDouble) -
      2.0 * s00.toDouble / (a0.length.toDouble * a0.length.toDouble)
    val out = run("q398_energy_distance").head
    assert(out.getLong(0) == a1.length.toLong)
    assert(out.getLong(1) == a0.length.toLong)
    assert(out.getDouble(2) == e, s"${out.getDouble(2)} != $e")
    assert(out.getDouble(2) >= 0.0, "energy distance is nonnegative")
  }

  test("Nelson-Aalen: integer hazards match a direct lifetime recomputation; cumulative hazard is nondecreasing") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val life = Tables.events(spark, sf)
      .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .map(g => (g.map(_._2).min, g.map(_._2).max)).toSeq
    val hmax = life.map(_._2).max
    val grain = life.map { case (f, l) => (l - f, l == hmax) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) =>
        (t, g.count(!_._2).toLong, g.count(_._2).toLong) }
    val n = life.length.toLong
    var atRisk = n
    var hc = 0L; var vc = 0L
    val expect = grain.map { case (t, d, c) =>
      val hz = (BigInt(1000000000L) * d / atRisk).toLong
      val vz = (BigInt("1000000000000000000") * d /
        (BigInt(atRisk) * atRisk)).toLong
      hc += hz; vc += vz
      val row = (t, atRisk, d, c, hc.toDouble / 1e9, vc.toDouble / 1e18)
      atRisk -= d + c
      row
    }
    val out = run("q399_nelson_aalen").collect()
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, e) =>
      assert(r.getLong(0) == e._1 && r.getLong(1) == e._2 &&
        r.getLong(2) == e._3 && r.getLong(3) == e._4, s"t=${e._1}")
      assert(r.getDouble(4) == e._5, s"H at t=${e._1}")
      assert(r.getDouble(5) == e._6, s"varH at t=${e._1}")
    }
    val hs = out.map(_.getDouble(4))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, "monotone")
  }

  test("IV Wald: matches direct conditional means; LATE = ITT / first-stage identity holds") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey")), "o_custkey")
      .select(col("o_custkey"), col("o_orderpriority"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0) % 2,
        if (r.getString(1) == "1-URGENT" || r.getString(1) == "2-HIGH") 1L
        else 0L,
        r.getLong(2)))
    val z1 = rows.filter(_._1 == 1L); val z0 = rows.filter(_._1 == 0L)
    val fs = z1.map(_._2).sum.toDouble / z1.length -
      z0.map(_._2).sum.toDouble / z0.length
    val itt = z1.map(_._3).sum.toDouble / z1.length -
      z0.map(_._3).sum.toDouble / z0.length
    val out = run("q400_iv_wald").head
    assert(out.getLong(0) == z1.length.toLong &&
      out.getLong(1) == z0.length.toLong)
    assert(out.getDouble(2) == fs && out.getDouble(3) == itt)
    assert(out.getDouble(4) == itt / fs, "Wald identity")
  }

  test("QTE deciles: both arms' order statistics match direct sorted midpoint lookups; QTE is their difference") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"),
        col("o_orderkey"))
      .collect()
      .map(r => (
        if (r.getString(0) == "1-URGENT" || r.getString(0) == "2-HIGH") 1L
        else 0L,
        r.getLong(1), r.getLong(2)))
    def q(arm: Long, dec: Long): Long = {
      val a = rows.filter(_._1 == arm).sortBy(x => (x._2, x._3))
      val tr = ((dec * 100000L + 50000L) * a.length) / 1000000L + 1L
      a((tr - 1).toInt)._2
    }
    val out = run("q401_qte_deciles").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val dec = r.getLong(0)
      assert(r.getLong(1) == q(1L, dec), s"treated d$dec")
      assert(r.getLong(2) == q(0L, dec), s"control d$dec")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("cluster split: zero near-dup leakage by construction; naive leakage matches a direct md5 recomputation") {
    val out = run("q402_cluster_split").head
    assert(out.getLong(0) ==
      Tables.documents(spark, sf).count(), "doc census")
    assert(out.getLong(4) == 0L,
      "cluster-aware split must leak zero pairs")
    // naive leakage: recompute from the pair table + the same md5 split
    val pairs = operators.TextQueries.winnowPairs(spark, sf)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def train(id: Long): Boolean = h32(s"split$id") % 10 < 8
    val naiveLeak = pairs.count { case (a, b) => train(a) != train(b) }
    assert(out.getLong(3) == pairs.length.toLong, "pair census")
    assert(out.getLong(5) == naiveLeak.toLong, "naive leakage")
    // the split is reproducible
    val again = run("q402_cluster_split").head
    assert(out.getLong(1) == again.getLong(1) &&
      out.getLong(2) == again.getLong(2))
    // both splits keep roughly 80% in train (loose sanity bound)
    assert(out.getLong(2).toDouble / out.getLong(0) > 0.6 &&
      out.getLong(2).toDouble / out.getLong(0) < 0.95)
  }
}
