package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-19 operators (SAX motifs, burstiness, diversity
  * indices, Kendall's W, pinball loss, negative-binomial fit).
  */
class Round11qOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dailyEvents(): Array[(Long, Long)] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("SAX motifs: symbols and top motifs match a direct z-score symbolization over contiguous triples") {
    val xs = dailyEvents()
    val n = xs.length.toLong
    val sx = xs.map(_._2).sum
    val qx = xs.map(x => BigInt(x._2) * x._2).sum
    val mu = sx.toDouble / n.toDouble
    val sd = math.sqrt((n.toDouble * qx.toDouble -
      sx.toDouble * sx.toDouble) / (n.toDouble * n.toDouble))
    val sym = xs.map { case (d, x) =>
      val z = (x.toDouble - mu) / sd
      (d, if (z < -0.6745) "a" else if (z < 0.0) "b"
      else if (z < 0.6745) "c" else "d")
    }.toMap
    val motifs = sym.keys.toSeq.flatMap { d =>
      for (s1 <- sym.get(d + 1); s2 <- sym.get(d + 2))
        yield sym(d) + s1 + s2
    }
    val counts = motifs.groupBy(identity).view.mapValues(_.length.toLong)
    val total = motifs.length.toLong
    val top = counts.toSeq.sortBy { case (m, c) => (-c, m) }.take(5)
    val out = run("q427_sax_motifs").collect()
    assert(out.length == math.min(5, counts.size))
    out.zip(top).foreach { case (r, (m, c)) =>
      assert(r.getString(0) == m && r.getLong(1) == c)
      assert(r.getLong(2) == c * 1000000L / total)
    }
  }

  test("burstiness: pooled gap moments match a per-user sequential recomputation; B in (-1, 1)") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000L").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gaps = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.map(_._2).sorted
      s.zip(s.tail).map { case (a, b) => b - a }
    }.toSeq
    val n = gaps.length.toLong
    val sg = gaps.sum
    val qg = gaps.map(x => BigInt(x) * x).sum
    val mu = sg.toDouble / n.toDouble
    val sd = math.sqrt((n.toDouble * qg.toDouble -
      sg.toDouble * sg.toDouble) / (n.toDouble * n.toDouble))
    val out = run("q428_burstiness").head
    assert(out.getLong(0) == n)
    assert(out.getDouble(1) == mu && out.getDouble(2) == sd)
    assert(out.getDouble(3) == (sd - mu) / (sd + mu))
    assert(out.getDouble(3) > -1.0 && out.getDouble(3) < 1.0)
  }

  test("diversity indices: all five match a direct recomputation; Simpson and evenness bounded") {
    val srcs = Tables.documents(spark, sf)
      .select("source").collect().map(_.getString(0))
    val counts = srcs.groupBy(identity).view.mapValues(_.length.toLong)
    val nn = srcs.length.toLong
    val h = counts.values.map(c =>
      math.floor(1e6 * c.toDouble / nn.toDouble *
        math.log(nn.toDouble / c.toDouble)).toLong).sum
    val simp = counts.values.map(c => BigInt(c) * (c - 1)).sum
    val out = run("q429_diversity_indices").head
    assert(out.getLong(0) == counts.size.toLong)
    assert(out.getDouble(1) == h.toDouble / 1e6)
    assert(out.getDouble(2) ==
      1.0 - simp.toDouble / (nn.toDouble * (nn.toDouble - 1.0)))
    assert(out.getLong(3) == counts.values.max * 1000000L / nn)
    assert(out.getDouble(4) ==
      h.toDouble / 1e6 / math.log(counts.size.toDouble))
    assert(out.getDouble(2) >= 0.0 && out.getDouble(2) <= 1.0)
    assert(out.getDouble(4) >= 0.0 && out.getDouble(4) <= 1.0 + 1e-6)
  }

  test("Kendall's W: matches the chi2/(m(k-1)) identity against q391 and a direct rank recomputation") {
    val w = run("q430_kendalls_w").head
    val chi = run("q391_friedman").head
    val m = w.getLong(0).toDouble
    val k = w.getLong(1).toDouble
    assert(w.getLong(0) == chi.getLong(0) && w.getLong(1) == chi.getLong(1))
    // W = chi2 / (m (k-1)) in exact arithmetic; both are pinned doubles
    // computed from the same integers via different expressions
    assert(math.abs(w.getDouble(2) -
      chi.getDouble(2) / (m * (k - 1.0))) < 1e-12, "Friedman identity")
    assert(w.getDouble(2) >= 0.0 && w.getDouble(2) <= 1.0 + 1e-12)
  }

  test("pinball loss: exact integer increments match a direct recomputation at both quantiles") {
    val daily = Tables.orders(spark, sf)
      .select((unix_timestamp(col("o_orderdate")) / 86400L).cast("long"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val es = daily.flatMap { case (d, y) =>
      daily.get(d - 7).map(yh => y - yh) }.toSeq
    val p50 = es.map(e => math.max(e * 5, e * -5)).sum
    val p90 = es.map(e => math.max(e * 9, e * -1)).sum
    val out = run("q431_pinball_loss").head
    assert(out.getLong(0) == es.length.toLong)
    assert(out.getDouble(1) == p50.toDouble / 10.0 / es.length.toDouble)
    assert(out.getDouble(2) == p90.toDouble / 10.0 / es.length.toDouble)
    // pinball at tau=0.5 is half the MAE
    val mae = es.map(math.abs(_)).sum.toDouble / es.length.toDouble
    assert(math.abs(out.getDouble(1) - mae / 2.0) < 1e-9)
  }

  test("negative-binomial fit: moments and (r, p) match a direct recomputation; overdispersed types only") {
    val cu = Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
    val out = run("q432_negbin_fit").collect()
      .map(r => r.getString(0) -> r).toMap
    cu.keys.map(_._1).toSeq.distinct.foreach { t =>
      val cs = cu.filter(_._1._1 == t).values.toSeq
      val n = cs.length.toLong
      val sc = cs.sum
      val qc = cs.map(c => BigInt(c) * c).sum
      val m = sc.toDouble / n.toDouble
      val v = (n.toDouble * qc.toDouble - sc.toDouble * sc.toDouble) /
        (n.toDouble * (n.toDouble - 1.0))
      val r = out(t)
      assert(r.getLong(1) == n, s"$t n")
      assert(r.getDouble(2) == m && r.getDouble(3) == v, s"$t moments")
      if (v > m) {
        assert(r.getDouble(4) == m * m / (v - m), s"$t r_hat")
        assert(r.getDouble(5) == m / v, s"$t p_hat")
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5), s"$t underdispersed")
      }
    }
  }
}
