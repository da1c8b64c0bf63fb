package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-8 operators (Brier/Murphy, MCC, transitivity,
  * assortativity, randomization test, Gini).
  */
class Round11fOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Brier: closed-form cells match a direct per-row Scala recomputation; Murphy identity holds to ppm rounding") {
    // independent recomputation from raw events: per-type train rates on
    // even users, per-row (p - y)^2 on odd users — the DIRECT sum the
    // operator's closed form must equal exactly (BigInt arithmetic)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        (col("value") >= 50.0).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = ev.groupBy(_._1)
    val pPpm = byType.flatMap { case (t, rows) =>
      val tr = rows.filter(_._2 % 2 == 0)
      if (tr.isEmpty) None
      else Some(t -> BigInt(tr.map(_._3).sum) * 1000000 / tr.length)
    }
    val test = ev.filter(r => r._2 % 2 == 1 && pPpm.contains(r._1))
    val n = test.length
    val dd = test.map { case (t, _, y) =>
      val d = pPpm(t) - BigInt(y) * 1000000; d * d
    }.sum
    val out = run("q361_brier").head
    assert(out.getLong(0) == n.toLong, "n_test")
    val ybar = BigInt(test.map(_._3).sum) * 1000000 / n
    assert(out.getLong(1) == ybar.toLong, "ybar_ppm")
    assert(out.getDouble(2) == dd.toDouble / n.toDouble, "brier exact")
    // Murphy: brier = rel - res + unc, up to the ppm floor rounding in
    // acc/ybar (each bounded by 1 ppm per division; gaps scale by ~2e6)
    val (brier, rel, res) = (out.getDouble(2), out.getDouble(3),
      out.getDouble(4))
    val unc = out.getLong(5).toDouble
    assert(math.abs(brier - (rel - res + unc)) < 5e6,
      s"Murphy identity: $brier vs ${rel - res + unc}")
    assert(rel >= 0.0 && res >= 0.0 && unc >= 0.0)
  }

  test("MCC: cells, coefficient and balanced accuracy match an exact reimplementation over the score grain; bounds hold") {
    val rows = operators.TextQueries.nbScores(spark, sf)
      .select(col("pred"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tp = rows.count(r => r._1 == 1 && r._2 == 1).toLong
    val fp = rows.count(r => r._1 == 1 && r._2 == 0).toLong
    val fn = rows.count(r => r._1 == 0 && r._2 == 1).toLong
    val tn = rows.count(r => r._1 == 0 && r._2 == 0).toLong
    val out = run("q362_mcc").head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((tp, fp, fn, tn)), "confusion cells")
    // identical pinned arithmetic: exact integer numerator, double sqrt
    val num = (BigInt(tp) * tn - BigInt(fp) * fn).toDouble
    val den = math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
      (tn + fp).toDouble * (tn + fn).toDouble)
    assert(out.getDouble(4) == num / den, "mcc exact")
    assert(out.getDouble(4) >= -1.0 && out.getDouble(4) <= 1.0)
    val bacc = (tp * 1000000L / (tp + fn) + tn * 1000000L / (tn + fp)) / 2L
    assert(out.getLong(5) == bacc, "balanced accuracy")
  }

  test("transitivity: triangle count agrees with q218; wedges match the degree closed form; ratio is the pinned division") {
    val t218 = run("q218_triangle_count").head
    val out = run("q363_transitivity").head
    assert(out.getLong(0) == t218.getLong(0), "n_nodes vs q218")
    assert(out.getLong(2) == t218.getLong(2), "n_triangles vs q218")
    // wedges from collected degrees (edge set is model-sized at sf0.001)
    val e = operators.GraphQueries.coPurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (_, vs) => vs.length.toLong }
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    assert(out.getLong(1) == wedges, "wedge closed form")
    assert(out.getDouble(3) ==
      (3L * out.getLong(2)).toDouble / wedges.toDouble)
    // a transitivity is a probability
    assert(out.getDouble(3) >= 0.0 && out.getDouble(3) <= 1.0)
  }

  test("assortativity: matches an exact BigInt-moment reimplementation; symmetrized moments are balanced") {
    val e = operators.GraphQueries.coPurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (v, vs) => v -> BigInt(vs.length) }
    val pairs = e.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    assert(sx == sy && sxx == syy, "symmetrization balance")
    val r = (m.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (m.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val out = run("q364_assortativity").head
    assert(out.getLong(0) == e.length.toLong, "n_edges")
    assert(out.getDouble(1) == r, s"assortativity ${out.getDouble(1)} != $r")
    assert(out.getDouble(1) >= -1.0 && out.getDouble(1) <= 1.0)
  }

  test("randomization test: observed diff matches a direct recomputation; p-value mechanics and determinism hold") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (a, b) = orders.partition(r =>
      r._1 == "1-URGENT" || r._1 == "2-HIGH")
    val dObs = a.map(_._2).sum.toDouble / a.length.toDouble -
      b.map(_._2).sum.toDouble / b.length.toDouble
    val out = run("q365_perm_test").head
    assert(out.getLong(0) == a.length.toLong &&
      out.getLong(1) == b.length.toLong, "observed split sizes")
    assert(out.getDouble(2) == dObs, "observed diff exact")
    assert(out.getLong(3) == 64L, "n_perms")
    val exceed = out.getLong(4)
    assert(exceed >= 0L && exceed <= 64L)
    assert(out.getDouble(5) == (exceed + 1L).toDouble / 65.0,
      "add-one MC p-value")
    // seeded md5 draws: a second run is bit-identical
    val again = run("q365_perm_test").head
    assert(out == again, "determinism across runs")
  }

  test("Gini: coefficient and top shares match an exact sorted reimplementation; planted uniform spend gives 0") {
    val cust = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val sorted = cust.sortBy(c => (c._2, c._1))
    val n = sorted.length.toLong
    val sx = sorted.map(c => BigInt(c._2)).sum
    val six = sorted.zipWithIndex
      .map { case ((_, x), i) => BigInt(i + 1) * x }.sum
    val gini = (2.0 * six.toDouble - (n + 1).toDouble * sx.toDouble) /
      (n.toDouble * sx.toDouble)
    val top1 = sorted.drop((n - n / 100).toInt).map(c => BigInt(c._2)).sum
    val top10 = sorted.drop((n - n / 10).toInt).map(c => BigInt(c._2)).sum
    val out = run("q366_gini").head
    assert(out.getLong(0) == n, "n_customers")
    assert(out.getDouble(1) == gini, s"gini ${out.getDouble(1)} != $gini")
    assert(out.getDouble(2) == top1.toDouble / sx.toDouble, "top1 share")
    assert(out.getDouble(3) == top10.toDouble / sx.toDouble, "top10 share")
    // closed form: identical spends => the Gini numerator
    // 2·Σi·x − (n+1)·Σx = x·n(n+1) − (n+1)·n·x is exactly zero
    val eq = Seq.fill(10)(500L)
    val sixEq = eq.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    assert(2L * sixEq - 11L * eq.sum == 0L,
      "uniform spend: Gini numerator is exactly 0")
  }
}
