package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-16 operators (Chow test, mutual information,
  * component census, odds ratio, weekday ANOVA, vocab coverage).
  */
class Round11nOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Chow test: F matches a BigInt-moment recomputation of the three SSEs; nonnegative") {
    val daily = Tables.orders(spark, sf)
      .select((unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
        .as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (daily.map(_._1).min + daily.map(_._1).max) / 2
    def sse(seg: Array[(Long, Long)]): Double = {
      val n = seg.length.toLong
      val sx = seg.map(_._1).sum; val sy = seg.map(_._2).sum
      val sxx = seg.map { case (x, _) =>
        val c = BigInt(n * x - sx); c * c }.sum
      val sxy = seg.map { case (x, y) =>
        BigInt(n * x - sx) * BigInt(n * y - sy) }.sum
      val syy = seg.map { case (_, y) =>
        val c = BigInt(n * y - sy); c * c }.sum
      (syy.toDouble - sxy.toDouble * sxy.toDouble / sxx.toDouble) /
        (n.toDouble * n.toDouble)
    }
    val s1 = daily.filter(_._1 <= mid); val s2 = daily.filter(_._1 > mid)
    val f = ((sse(daily) - sse(s1) - sse(s2)) / 2.0) /
      ((sse(s1) + sse(s2)) / (daily.length.toDouble - 4.0))
    val out = run("q409_chow_test").head
    assert(out.getLong(0) == daily.length.toLong)
    assert(out.getLong(1) == s1.length.toLong &&
      out.getLong(2) == s2.length.toLong)
    assert(out.getDouble(3) == f, s"${out.getDouble(3)} != $f")
    assert(out.getDouble(3) >= 0.0)
  }

  test("mutual information: MI/H/NMI match a same-floored recomputation; information inequalities hold") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nn = rows.length.toLong
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val nx = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ny = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val miM = cells.map { case ((x, y), c) =>
      math.floor(1e6 * c.toDouble / nn.toDouble *
        math.log(c.toDouble * nn.toDouble /
          (nx(x).toDouble * ny(y).toDouble))).toLong
    }.sum
    def hMicro(m: Map[String, Long]): Long = m.values.map(c =>
      math.floor(1e6 * c.toDouble / nn.toDouble *
        math.log(nn.toDouble / c.toDouble)).toLong).sum
    val out = run("q410_mutual_information").head
    assert(out.getLong(0) == cells.size.toLong)
    assert(out.getDouble(1) == miM.toDouble / 1e6)
    assert(out.getDouble(2) == hMicro(nx).toDouble / 1e6)
    assert(out.getDouble(3) == hMicro(ny).toDouble / 1e6)
    // flooring shifts each term by < 1e-6: MI >= -cells*1e-6, MI <= min(H)
    assert(out.getDouble(1) > -cells.size * 1e-6)
    assert(out.getDouble(1) <=
      math.min(out.getDouble(2), out.getDouble(3)) + cells.size * 1e-6)
    assert(out.getDouble(4) <= 1.0 + 1e-3)
  }

  test("component census: matches a direct recount of the winnow components; singleton identity holds") {
    val comps = operators.TextQueries.winnowComponents(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = comps.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nDocs = Tables.documents(spark, sf).count()
    val out = run("q411_component_census").head
    assert(out.getLong(0) == nDocs)
    assert(out.getLong(1) == sizes.size.toLong)
    assert(out.getLong(2) == sizes.values.sum)
    assert(out.getLong(3) == nDocs - sizes.values.sum, "singletons")
    assert(out.getLong(4) == sizes.values.max)
    assert(out.getLong(5) == sizes.values.count(_ == 2L).toLong)
    assert(out.getLong(6) == sizes.values.max * 1000000L / nDocs)
    // every component has >= 2 members (it came from a pair)
    assert(sizes.values.forall(_ >= 2L))
  }

  test("odds ratio: cells and all derived measures match a direct recomputation; CI brackets the point estimate") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0) == "1-URGENT" || r.getString(0) == "2-HIGH",
        r.getString(1) == "O"))
    val a = rows.count(r => r._1 && r._2).toLong
    val b = rows.count(r => r._1 && !r._2).toLong
    val c = rows.count(r => !r._1 && r._2).toLong
    val dd = rows.count(r => !r._1 && !r._2).toLong
    val or = a.toDouble * dd.toDouble / (b.toDouble * c.toDouble)
    val rr = (a.toDouble / (a + b).toDouble) / (c.toDouble / (c + dd).toDouble)
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)
    val out = run("q412_odds_ratio").head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((a, b, c, dd)))
    assert(out.getDouble(4) == or && out.getDouble(5) == rr)
    assert(out.getDouble(6) == math.exp(math.log(or) - 1.96 * se))
    assert(out.getDouble(7) == math.exp(math.log(or) + 1.96 * se))
    assert(out.getDouble(6) < or && or < out.getDouble(7))
  }

  test("weekday ANOVA: eta2 and F match a same-floored recomputation; eta2 in [0,1]") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val daily = Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = daily.groupBy(_._1 % 7).values.toSeq
    val k = groups.length.toLong
    val n = daily.length.toLong
    val sx = daily.map(_._2).sum
    val sb = groups.map { g =>
      val sw = g.map(_._2).sum
      math.floor(sw.toDouble * sw.toDouble / g.length.toDouble *
        1000000.0).toLong
    }.sum
    val qx = daily.map(d => BigInt(d._2) * d._2).sum
    val sst = qx.toDouble * 1000000.0 -
      math.floor(sx.toDouble * sx.toDouble / n.toDouble * 1000000.0)
    val ssb = sb.toDouble -
      math.floor(sx.toDouble * sx.toDouble / n.toDouble * 1000000.0)
    val out = run("q413_weekday_anova").head
    assert(out.getLong(0) == n && out.getLong(1) == k)
    assert(out.getDouble(2) == ssb / sst, "eta2")
    assert(out.getDouble(3) ==
      (ssb / (k - 1).toDouble) / ((sst - ssb) / (n - k).toDouble), "F")
    assert(out.getDouble(2) >= -1e-9 && out.getDouble(2) <= 1.0)
  }

  test("vocab coverage: counts match a direct recount; coverage is monotone in k and bounded by 1e6 ppm") {
    val toks = Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val nn = toks.length.toLong
    val out = run("q414_vocab_coverage").collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(10, 100, 1000).foreach { k =>
      val top = counts.take(k)
      val r = out(k.toLong)
      assert(r.getLong(1) == top.length.toLong, s"k=$k types")
      assert(r.getLong(2) == top.map(_._2).sum, s"k=$k covered")
      assert(r.getLong(3) == counts.length.toLong)
      assert(r.getLong(4) == top.map(_._2).sum * 1000000L / nn)
    }
    val ppms = Seq(10L, 100L, 1000L).map(k => out(k).getLong(4))
    assert(ppms.zip(ppms.tail).forall { case (x, y) => x <= y })
    assert(ppms.forall(_ <= 1000000L))
  }
}
