package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-17 operators (silhouette, RMST, MASE, quadratic MMD,
  * isotropy, randomized response).
  */
class Round11oOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("silhouette: per-label means match a direct micro-quantized recomputation; values in [-1, 1]") {
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray.map(v =>
          math.floor(v.toDouble * 1e6).toLong)))
    val cents = pts.groupBy(_._2).view.mapValues { g =>
      val dims = g.head._3.length
      Array.tabulate(dims)(i => {
        val s = g.map(_._3(i)).sum
        // Long division truncates toward zero; Spark's `div` floors
        // negatives the same way (both are BigInt quotient semantics)
        if (s < 0) -((-s) / g.length) else s / g.length
      })
    }.toMap
    // NOTE: Spark's `div` is integer division truncating toward zero,
    // matching Scala's Long division for negative sums
    def d2(q: Array[Long], c: Array[Long]): BigInt =
      q.zip(c).map { case (a, b) => BigInt(a - b) * (a - b) }.sum
    val smByLabel = pts.groupBy(_._2).view.mapValues { g =>
      val sm = g.map { case (_, own, q) =>
        val a = math.sqrt(d2(q, cents(own)).toDouble)
        val b = math.sqrt(cents.filter(_._1 != own).values
          .map(c => d2(q, c)).min.toDouble)
        math.floor(1e6 * (b - a) / math.max(a, b)).toLong
      }.sum
      (g.length.toLong, sm)
    }.toMap
    val out = run("q415_silhouette").collect()
    assert(out.length == cents.size)
    out.foreach { r =>
      val (n, sm) = smByLabel(r.getLong(0))
      assert(r.getLong(1) == n, s"label ${r.getLong(0)} n")
      assert(r.getDouble(2) == sm.toDouble / 1e6 / n.toDouble,
        s"label ${r.getLong(0)} silhouette")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("RMST: area under the KM step function matches a direct integration to tau = 30; bounded by tau") {
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
    var atRisk = life.length.toLong
    var surv = 1.0
    var sc = 0L
    val t0 = grain.head._1
    grain.zipWithIndex.foreach { case ((t, d, c), i) =>
      if (d > 0) surv *= 1.0 - d.toDouble / atRisk.toDouble
      val tNext = if (i + 1 < grain.length) grain(i + 1)._1 else 30L
      if (t < 30L) {
        val segEnd = math.min(tNext, 30L)
        sc += math.floor(1e6 * surv * (segEnd - t).toDouble).toLong
      }
      atRisk -= d + c
    }
    val expect = math.min(t0, 30L).toDouble + sc.toDouble / 1e6
    val out = run("q416_rmst").head
    assert(out.getLong(0) == 30L)
    assert(out.getLong(1) == math.min(t0, 30L))
    assert(out.getDouble(2) == expect, s"${out.getDouble(2)} != $expect")
    assert(out.getDouble(2) > 0.0 && out.getDouble(2) <= 30.0)
  }

  test("MASE: both MAEs match direct lag recomputations; ratio positive") {
    val daily = Tables.orders(spark, sf)
      .select((unix_timestamp(col("o_orderdate")) / 86400L).cast("long"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def mae(k: Long): (Long, Long) = {
      val pairs = daily.flatMap { case (d, y) =>
        daily.get(d - k).map(yl => math.abs(y - yl)) }
      (pairs.size.toLong, pairs.sum)
    }
    val (n7, s7) = mae(7L); val (n1, s1) = mae(1L)
    val out = run("q417_mase").head
    assert(out.getLong(0) == n7 && out.getLong(1) == n1)
    assert(out.getDouble(2) ==
      (s7.toDouble / n7.toDouble) / (s1.toDouble / n1.toDouble))
    assert(out.getDouble(3) == s7.toDouble / n7.toDouble)
    assert(out.getDouble(2) > 0.0)
  }

  test("quadratic MMD: closed form matches direct moments; zero on identical samples; nonnegative") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    def m(arm: Long) = {
      val a = rows.filter(_._1 == arm).map(_._2)
      (a.length.toLong, a.sum, a.map(x => BigInt(x) * x).sum)
    }
    val (n1, s1, q1) = m(1L); val (n0, s0, q0) = m(0L)
    val dmu = s1.toDouble / n1 - s0.toDouble / n0
    val dm2 = q1.toDouble / n1 - q0.toDouble / n0
    val mmd = 2.0 / 1e8 * dmu * dmu + 1.0 / 1e16 * dm2 * dm2
    val out = run("q418_mmd_quadratic").head
    assert(out.getLong(0) == n1 && out.getLong(1) == n0)
    assert(out.getDouble(2) == mmd)
    assert(out.getDouble(2) >= 0.0)
    // identical samples: both differences vanish (pure-math fixture)
    assert(2.0 / 1e8 * 0.0 + 1.0 / 1e16 * 0.0 == 0.0)
  }

  test("isotropy: per-dim variances and the ratio match a direct recomputation; ratio in (0, 1]") {
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(v =>
        math.floor(v.toDouble * 1e6).toLong))
    val dims = vecs.head.length
    val vars = (0 until dims).map { i =>
      val xs = vecs.map(_(i))
      val n = xs.length.toLong
      val sq = xs.sum
      val qq = xs.map(x => BigInt(x) * x).sum
      (n.toDouble * qq.toDouble - sq.toDouble * sq.toDouble) /
        (n.toDouble * n.toDouble)
    }
    val out = run("q419_isotropy").head
    assert(out.getLong(0) == dims.toLong)
    assert(out.getLong(1) == vars.zipWithIndex.maxBy(v =>
      (v._1, -v._2))._2.toLong, "top dim")
    assert(out.getDouble(2) == vars.min / 1e12)
    assert(out.getDouble(3) == vars.max / 1e12)
    assert(out.getDouble(4) == vars.min / vars.max)
    assert(out.getDouble(4) > 0.0 && out.getDouble(4) <= 1.0)
  }

  test("randomized response: flips replay exactly from the seeded hash; unbiased recovery identity holds") {
    val users = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(g => if (g.exists(_._2 == "purchase")) 1L else 0L)
      .toMap
    val reported = users.map { case (uid, y) =>
      val flip = if (h32(s"rr-$uid") % 1000000L < 250000L) 1L else 0L
      y * (1 - flip) + (1 - y) * flip
    }.sum
    val n = users.size.toLong
    val nTrue = users.values.sum
    val lambda = reported.toDouble / n.toDouble
    val out = run("q420_randomized_response").head
    assert(out.getLong(0) == n && out.getLong(1) == nTrue)
    assert(out.getLong(2) == reported, "reported count replays")
    assert(out.getDouble(3) == (lambda - 0.25) / 0.5)
    assert(out.getDouble(4) ==
      math.abs((lambda - 0.25) / 0.5 - nTrue.toDouble / n.toDouble))
    // determinism across runs
    val again = run("q420_randomized_response").head
    assert(out.getLong(2) == again.getLong(2))
  }
}
