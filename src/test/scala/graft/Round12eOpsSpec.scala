package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-12 batch-5
  * operators (seasonal decomposition, MAD anomalies, SRM, join-size
  * estimator audit).
  */
class Round12eOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val daily: Seq[(Long, Long)] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf).selectExpr(s"ts div ${dayNs}L AS day")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (d, v) => (d, v.length.toLong) }
      .toSeq.sortBy(_._1)
  }

  test("q458: decomposition reconstructs exactly; components match a direct recompute") {
    val out = run("q458_seasonal_decompose").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // direct recompute
    val xs = daily.toArray
    val trend = (3 until xs.length - 3).map { i =>
      xs(i)._1 -> (3 to -3 by -1).map(k => xs(i - k)._2).sum * 1000L / 7L
    }.toMap
    assert(out.length == trend.size, "full-window days only")
    val detr = out.map(r => (r._1 % 7) -> (r._2 * 1000L - trend(r._1)))
    val seas = detr.groupBy(_._1).map { case (dw, v) =>
      dw -> math.floor(v.map(_._2).sum.toDouble / v.length).toLong
    }
    out.foreach { case (day, x, tr, dow, se, res) =>
      assert(tr == trend(day), s"trend day $day")
      assert(dow == day % 7)
      assert(se == seas(dow), s"seasonal dow $dow")
      assert(res == x * 1000L - tr - se, s"residual day $day")
      assert(x * 1000L == tr + se + res, "exact reconstruction")
    }
  }

  test("q459: median/MAD match the deterministic lower-median ranks; flags recompute") {
    val out = run("q459_mad_anomaly_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val n = daily.length
    def lowerMedian(v: Seq[(Long, Long)]): Long =
      v.sortBy(t => (t._2, t._1)).apply((n + 1) / 2 - 1)._2
    val med = lowerMedian(daily)
    val mad = lowerMedian(daily.map(t => (t._1, math.abs(t._2 - med))))
    assert(out.length == n)
    out.foreach { case (day, x, m, md, flag) =>
      assert(m == med && md == mad, s"day $day")
      assert(flag == (math.abs(x - med) * 10000L > 44478L * mad), s"day $day")
    }
  }

  test("q460: arms cover every user; chi2 matches the pinned formula") {
    def h32(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val r = run("q460_srm_check").head
    val users = Tables.events(spark, sf).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val na = users.count(u => h32(s"srm$u") % 10 < 9).toLong
    assert(r.getLong(0) == users.length.toLong)
    assert(r.getLong(1) == na && r.getLong(2) == users.length - na)
    val nU = users.length.toDouble
    val chi2 = math.floor(1e6 * (
      math.pow(na - 0.9 * nU, 2) / (0.9 * nU) +
        math.pow((users.length - na) - 0.1 * nU, 2) / (0.1 * nU))).toLong
    assert(r.getLong(3) == chi2)
    assert(r.getBoolean(4) == (chi2 > 10828000L))
  }

  test("q461: the exact join size closes as the per-user dot product; the estimate uses max-d uniformity") {
    val r = run("q461_join_size_audit").head
    val per = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, v) =>
        (v.count(_._2 == "click").toLong, v.count(_._2 == "view").toLong)
      }
    val nc = per.map(_._1).sum; val nv = per.map(_._2).sum
    val dc = per.count(_._1 > 0).toLong; val dv = per.count(_._2 > 0).toLong
    val truth = per.map(p => p._1 * p._2).sum
    assert(r.getLong(0) == nc && r.getLong(1) == nv)
    assert(r.getLong(2) == dc && r.getLong(3) == dv)
    assert(r.getLong(5) == truth)
    assert(r.getLong(4) == nc * nv / math.max(dc, dv))
    assert(math.abs(r.getDouble(6) -
      (nc * nv / math.max(dc, dv)).toDouble / truth) < 1e-12)
  }
}
