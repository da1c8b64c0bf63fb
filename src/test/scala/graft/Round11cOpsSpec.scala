package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and invariant proofs for the round-11 batch-5
  * operators: Kruskal-Wallis closed forms on separated/identical planted
  * groups, a full independent Scala reimplementation of the log-rank
  * accumulation, Cramér's V = 1 on a planted diagonal, the
  * Cochran-Armitage z² = n perfect-trend extreme, TOST's structural
  * ordering, A/A calibration sanity, and overdispersion recomputed
  * exactly from the raw facts.
  */
class Round11cOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** KW H via the operator's exact-rank formula, in pure Scala. */
  private def kwH(groups: Seq[Seq[Long]]): Double = {
    val all = groups.flatten.sorted
    val n = all.size.toLong
    // doubled average rank per value: 2*|{u<v}| + cnt(v) + 1
    val cnt: Map[Long, Long] =
      all.groupBy(x => x).map { case (k, vs) => (k, vs.size.toLong) }
    val below: Map[Long, Long] = cnt.keys.map { v =>
      (v, 2L * all.count(_ < v) + cnt(v) + 1L)
    }.toMap
    val termSum = groups.map { g =>
      val r2j = g.map(below).sum.toDouble
      math.floor(1e6 * r2j * r2j /
        (4.0 * g.size * n * (n + 1.0))).toLong
    }.sum
    val tsum = cnt.values.map(c => c * c * c - c).sum
    (12.0 * termSum / 1e6 - 3.0 * (n + 1.0)) /
      (1.0 - tsum.toDouble / (n.toDouble * n * n - n))
  }

  test("Kruskal-Wallis: closed form 12.5 on fully separated planted groups, 0 on identical groups; real H finite and nonnegative") {
    val sep = Seq(Seq(1L, 2L, 3L, 4L, 5L), Seq(6L, 7L, 8L, 9L, 10L),
      Seq(11L, 12L, 13L, 14L, 15L))
    assert(math.abs(kwH(sep) - 12.5) < 0.01, s"separated H=${kwH(sep)}")
    val same = Seq.fill(3)(Seq(1L, 2L, 3L, 4L, 5L))
    assert(math.abs(kwH(same)) < 0.01, s"identical H=${kwH(same)}")
    val r = run("q346_kruskal_wallis").head
    val h = r.getDouble(4)
    assert(!h.isNaN && h >= -0.01, s"real H=$h")
    assert(r.getLong(1) == 5L, "expected 5 event-type groups")
  }

  test("log-rank: O1/E1/V match an independent Scala reimplementation exactly (including the per-term floors)") {
    val out = run("q347_logrank").head
    // independent reference: collect the small fixture's user grain
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase",
        expr(s"ts div ${dayNs}L"))).as("t"))
      .collect()
      .map(r => (r.getLong(0) % 2, if (r.isNullAt(1)) None
        else Some(r.getLong(1))))
    val u = Array(users.count(_._1 == 0).toLong,
      users.count(_._1 == 1).toLong)
    val deaths = users.collect { case (g, Some(t)) => (g, t) }
    val days = deaths.map(_._2).distinct.sorted
    var o1 = 0L; var e1 = 0L; var v = 0L
    for (t <- days) {
      val d1 = deaths.count(p => p._1 == 0 && p._2 == t).toLong
      val d2 = deaths.count(p => p._1 == 1 && p._2 == t).toLong
      val n1 = u(0) - deaths.count(p => p._1 == 0 && p._2 < t)
      val n2 = u(1) - deaths.count(p => p._1 == 1 && p._2 < t)
      val dt = d1 + d2; val nt = n1 + n2
      if (dt > 0 && nt > 1) {
        o1 += d1
        e1 += math.floor(1e6 * dt.toDouble * n1 / nt).toLong
        v += math.floor(1e6 * dt.toDouble * n1 / nt * n2 / nt *
          (nt - dt).toDouble / (nt - 1.0)).toLong
      }
    }
    assert(out.getLong(0) == o1, s"O1 ${out.getLong(0)} != $o1")
    assert(out.getLong(1) == e1, s"E1 ${out.getLong(1)} != $e1")
    assert(out.getLong(2) == v, s"V ${out.getLong(2)} != $v")
  }

  test("Cramer's V: planted diagonal hits 1; real V in [0, 1]") {
    // 2x2 diagonal: o=(30,0;0,70) -> chi2 = n, V = 1
    val cells = Seq((0L, 0L, 30L), (1L, 1L, 70L))
    val n = 100L
    val rt = Map(0L -> 30L, 1L -> 70L); val ct = rt
    var chi2 = 0L
    for (i <- 0L to 1L; jj <- 0L to 1L) {
      val o = cells.collectFirst { case (a, b, c) if a == i && b == jj => c }
        .getOrElse(0L)
      chi2 += math.floor(1e6 *
        math.pow(o.toDouble * n - rt(i).toDouble * ct(jj), 2) /
        (n.toDouble * rt(i) * ct(jj))).toLong
    }
    val vPlanted = math.sqrt(chi2 / 1e6 / (n * 1.0))
    assert(math.abs(vPlanted - 1.0) < 1e-6, s"diagonal V=$vPlanted")
    val r = run("q348_cramers_v").head
    val vReal = r.getDouble(4)
    assert(vReal >= 0.0 && vReal <= 1.0, s"V out of range: $vReal")
  }

  test("Cochran-Armitage: perfect planted trend gives z2 = n; real z2 bounded by n") {
    // w=1: (n=10, c=0); w=2: (n=10, c=10)
    val (n, c, swc, swn, sw2n) = (20L, 10L, 20L, 30L, 50L)
    val a = n * swc - c * swn
    val b = c * (n - c) * (n * sw2n - swn * swn)
    assert(a * a * n / b == n, "perfect trend z2 != n")
    val r = run("q349_cochran_armitage").head
    val z2 = r.getDouble(3)
    assert(z2 >= 0.0 && z2 <= r.getLong(0).toDouble, s"z2_ca=$z2")
  }

  test("TOST: z_lo > z_hi structurally; the equivalence flag recomputes from the row's own z values") {
    val rows = run("q350_tost_equivalence").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (zLo, zHi, eq) = (r.getDouble(5), r.getDouble(6), r.getLong(7))
      assert(zLo > zHi, "margin flip must order the two z's")
      val expect = if (zLo >= 1.6448536269514722 &&
        zHi <= -1.6448536269514722) 1L else 0L
      assert(eq == expect, s"equivalence flag $eq != $expect")
    }
  }

  test("A/A calibration: 16 seeds, equal test counts, rejection fraction far below half") {
    val rows = run("q351_aa_calibration").collect()
    assert(rows.length == 16)
    val nTests = rows.map(_.getLong(1)).distinct
    assert(nTests.length == 1 && nTests.head == 5L)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val sigFrac = rows.map(_.getLong(2)).sum.toDouble / (16 * 5)
    assert(sigFrac <= 0.3,
      s"null splits reject ${sigFrac * 100}% — platform would be broken")
  }

  test("overdispersion: d_milli recomputes exactly from the raw day-grain counts; fano = d/(n-1)") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val ref = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        val xs = rs.map(_.getLong(2))
        val n = xs.length.toLong
        val sx = xs.sum; val sxx = xs.map(x => x * x).sum
        t -> (n, (1000L * (n * sxx - sx * sx)) / sx)
      }
    run("q352_overdispersion").collect().foreach { r =>
      val (n, d, fano) = (ref(r.getString(0))._1, r.getLong(3), r.getLong(4))
      assert(d == ref(r.getString(0))._2, s"${r.getString(0)}: d mismatch")
      assert(fano == d / (n - 1))
    }
  }
}
