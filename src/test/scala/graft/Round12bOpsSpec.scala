package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-12 batch-2
  * operators (training-mix toolkit).
  */
class Round12bOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** per-source (docs, tokens, fails) recomputed independently */
  private lazy val panel: Map[String, (Long, Long, Long)] = {
    Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        val stats = rows.map { r =>
          val t = r.getString(1)
          val nt = t.trim.split("\\s+").length.toLong
          val alpha = t.count(_.isLetter).toLong
          val ok = t.length >= 100 && t.length <= 400 &&
            alpha * 4 > t.length.toLong * 3
          (nt, if (ok) 0L else 1L)
        }
        src -> (rows.length.toLong, stats.map(_._1).sum, stats.map(_._2).sum)
      }
  }

  test("q443: temperature shares match a BigDecimal recompute; upsampling order is size-inverse") {
    val out = run("q443_temperature_mix").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ttok = panel.values.map(_._2).sum
    def r6sqrt(t: Long): BigDecimal =
      BigDecimal(math.sqrt(t.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val tssq = panel.values.map(v => r6sqrt(v._2)).sum
    out.foreach { case (src, (nt, raw, temp)) =>
      assert(nt == panel(src)._2, src)
      assert(raw == nt * 1000000L / ttok, s"$src raw")
      val want = (1e6 * (r6sqrt(nt).toDouble / tssq.toDouble)).floor.toLong
      assert(temp == want, s"$src temp: $temp vs $want")
    }
    // α = 0.5 compresses the range: the upsampling factor temp/raw
    // decreases with size
    val bySize = out.values.toSeq.sortBy(_._1)
    bySize.sliding(2).foreach { case Seq((t1, r1, p1), (t2, r2, p2)) =>
      assert(p1.toDouble / r1 >= p2.toDouble / r2 - 1e-3,
        "smaller sources must be upsampled at least as much")
    case _ => ()
    }
  }

  test("q444: slope/intercept match a direct OLS on the micro-floored log points") {
    val row = run("q444_scaling_law_fit").head
    val pts = panel.values.map { case (nd, nt, nf) =>
      val x = math.floor(1e6 * math.log(nt.toDouble)).toLong
      val y = math.floor(1e6 * math.log((nf * 1000000L / nd + 1).toDouble)).toLong
      (x, y)
    }.toSeq
    val n = pts.length.toDouble
    val sx = pts.map(_._1).map(BigInt(_)).sum.toDouble
    val sy = pts.map(_._2).map(BigInt(_)).sum.toDouble
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
    val den = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / den
    assert(row.getLong(0) == pts.length.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-9 * math.abs(slope) + 1e-12)
    val intercept = (sy - slope * sx) / n
    assert(math.abs(row.getDouble(2) - intercept) < math.abs(intercept) * 1e-9 + 1e-6)
  }

  test("q445: weights stay mean-1000 up to truncation and rank with the excess signal") {
    val out = run("q445_doremi_lite").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    val sumW = out.map(_._3).sum
    assert(sumW <= 1000L * n && sumW > 1000L * n - n * 3,
      s"renormalized mean drifted: $sumW for $n sources")
    val maxExcess = out.maxBy(_._2)
    val minExcess = out.minBy(_._2)
    assert(maxExcess._3 >= out.map(_._3).max - 1, "max excess gets max weight")
    assert(minExcess._3 <= out.map(_._3).min + 1, "min excess gets min weight")
  }

  test("q446: allocation exhausts the budget exactly and respects the water level") {
    val out = run("q446_token_budget_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ttok = panel.values.map(_._2).sum
    val b = ttok / 4
    assert(out.map(_._3).sum == b, s"Σalloc must be EXACTLY the budget $b")
    out.foreach { case (src, nt, alloc, rate) =>
      assert(alloc <= nt, src)
      assert(rate == alloc * 1000 / nt, src)
    }
    // water level: every unfilled source sits within 1 token of the
    // common level; every filled source is below it
    val unfilled = out.filter(o => o._3 < o._2).map(_._3)
    if (unfilled.nonEmpty) {
      assert(unfilled.max - unfilled.min <= 1, "common level")
      val filled = out.filter(o => o._3 == o._2).map(_._2)
      filled.foreach(f => assert(f <= unfilled.max, "filled below level"))
    }
  }

  test("q447: the Pareto sweep is monotone in the threshold and bounded by the census") {
    val out = run("q447_quality_dedup_pareto").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    out.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4,
        "tightening the gate can only shrink every column")
    case _ => ()
    }
    out.foreach { case (_, nd, _, dup) => assert(dup <= nd) }
  }

  test("q448: per-source KL contributions use q443's exact shares and sum ≥ 0 up to truncation") {
    val shares = run("q443_temperature_mix").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val out = run("q448_mix_kl_drift").collect()
    out.foreach { r =>
      val (raw, temp) = shares(r.getString(0))
      assert(r.getLong(1) == raw && r.getLong(2) == temp, r.getString(0))
      val want =
        if (temp > 0 && raw > 0)
          math.floor(1e6 * (temp / 1e6) * math.log((temp / 1e6) / (raw / 1e6))).toLong
        else 0L
      assert(r.getLong(3) == want, r.getString(0))
    }
    // Gibbs: true KL ≥ 0; each floor loses < 1 micro
    assert(out.map(_.getLong(3)).sum >= -out.length.toLong)
  }
}
