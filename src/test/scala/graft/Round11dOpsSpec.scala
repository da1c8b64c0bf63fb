package graft

import graft.operators.Shared
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-6 operators (conformal intervals, MDE, jackknife
  * ratio variance, weighted median).
  */
class Round11dOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("conformal: coverage recomputes exactly from raw facts; radius/median structurally sound") {
    val rows = run("q353_conformal_interval").collect()
    assert(rows.nonEmpty)
    // independent recomputation on the small fixture
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        (Shared.h32(concat(lit("conf-"), col("user_id"))) % 2).as("split"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (t, nCal, med, radius, nTest, covPpm) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      val cal = raw.collect { case (`t`, 0L, v) => v }.sorted
      val test = raw.collect { case (`t`, 1L, v) => v }
      assert(cal.length.toLong == nCal)
      // median: smallest v with 2*rank >= n
      val medRef = cal((math.ceil(cal.length / 2.0) - 1).toInt)
      assert(med == medRef, s"$t: med $med != $medRef")
      val resid = cal.map(v => math.abs(v - med)).sorted
      val k = math.ceil((nCal + 1) * 9 / 10.0).toInt
      val radRef = resid(math.min(k, resid.length) - 1)
      assert(radius == radRef, s"$t: radius $radius != $radRef")
      val covered = test.count(v => math.abs(v - med) <= radius).toLong
      assert(nTest == test.length.toLong)
      assert(covPpm == 1000000L * covered / nTest)
      // split-conformal should land near its 90% design point
      assert(covPpm >= 820000L && covPpm <= 1000000L,
        s"$t: coverage $covPpm far from design")
    }
  }

  test("MDE: closed form on planted counts; real rows positive and shrinking with traffic") {
    // na = nb = 100, pooled p = 0.5
    val planted = math.floor(1e6 *
      (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(0.5 * 0.5 * (1.0 / 100 + 1.0 / 100))).toLong
    assert(planted == 198101L, s"planted MDE=$planted")
    val rows = run("q354_power_mde").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (na, nb, rate, mde) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rate >= 0L && rate <= 1000000L)
      assert(mde > 0L, "MDE must be positive")
      // MDE at this scale must beat the planted n=100 example
      assert(na + nb < 200 || mde < planted)
    }
  }

  test("jackknife ratio: theta and SE recompute exactly from raw facts (including nano floors)") {
    val out = run("q355_jackknife_ratio").head
    val raw = Tables.events(spark, sf)
      .select((Shared.h32(concat(lit("jk-"), col("user_id"))) % 32).as("b"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bkt = raw.groupBy(_._1).map { case (b, vs) =>
      (b, vs.map(_._2).sum, vs.length.toLong)
    }.toSeq
    val vt = bkt.map(_._2).sum; val nt = bkt.map(_._3).sum
    val thetas = bkt.map { case (_, v, n) =>
      math.floor(1e9 * (vt - v).toDouble / (nt - n).toDouble).toLong
    }
    val b = bkt.length.toLong
    val st = thetas.map(BigInt(_)).sum
    val st2 = thetas.map(t => BigInt(t) * BigInt(t)).sum
    val seRef = math.sqrt((b - 1.0) / b *
      (st2.toDouble - st.toDouble * st.toDouble / b)) / 1e9
    assert(out.getLong(0) == b)
    assert(out.getLong(1) ==
      math.floor(1e9 * vt.toDouble / nt.toDouble).toLong)
    assert(math.abs(out.getDouble(2) - seRef) < 1e-12 * math.max(1.0, seRef),
      s"jk_se ${out.getDouble(2)} != $seRef")
  }

  test("weighted median: recomputes exactly from raw weighted values; sits inside the value range") {
    val rows = run("q356_weighted_median").collect()
    assert(rows.length == 5)
    val ly = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("wt"))
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("vc"))
      .join(ly, col("o_orderkey") === ly("l_orderkey"))
      .select("pri", "vc", "wt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (pri, wSum, wMed) = (r.getString(0), r.getLong(1), r.getLong(2))
      val vals = raw.filter(_._1 == pri).map(p => (p._2, p._3))
        .sortBy(_._1)
      assert(vals.map(_._2).sum == wSum)
      var cum = 0L
      val ref = vals.find { case (_, w) =>
        cum += w; 2 * cum >= wSum
      }.get._1
      assert(wMed == ref, s"$pri: wmedian $wMed != $ref")
      assert(wMed >= vals.head._1 && wMed <= vals.last._1)
    }
  }
}
