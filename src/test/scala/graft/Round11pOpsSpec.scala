package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-18 operators (user turnover, cohort LTV, elasticity,
  * decision stump, trimmed A/B, dedup bias).
  */
class Round11pOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def monthUsers(): Map[Long, Set[Long]] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf)
      .select(expr(s"(ts div ${dayNs}L) div 30L").as("m"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("user turnover: Jaccard and churn match direct set algebra on consecutive months") {
    val mu = monthUsers()
    val out = run("q421_user_turnover").collect()
      .map(r => r.getLong(0) -> r).toMap
    mu.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(p, c) if c == p + 1 =>
        val (a, b) = (mu(p), mu(c))
        val inter = a.intersect(b).size.toLong
        val r = out(c)
        assert(r.getLong(1) == a.size.toLong &&
          r.getLong(2) == b.size.toLong)
        assert(r.getLong(3) == inter)
        assert(r.getLong(4) ==
          inter * 1000000L / (a.size + b.size - inter))
        assert(r.getLong(5) == (a.size - inter) * 1000000L / a.size)
      case _ => ()
    }
  }

  test("cohort LTV: cumulative revenue per user matches a direct replay; monotone along age") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        expr(s"(ts div ${dayNs}L) div 30L").as("m"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rev = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .view.mapValues(_.map(_._3).sum).toMap
    val out = run("q422_cohort_ltv").collect()
    out.foreach { r =>
      val (co, age) = (r.getLong(0), r.getLong(1))
      val cum = (0L to age).map(a => rev.getOrElse((co, a), 0L)).sum
      assert(r.getLong(2) == sizes(co), s"cohort $co size")
      assert(r.getLong(3) == cum, s"($co,$age) cum")
      assert(r.getLong(4) == cum * 1000000L / sizes(co))
    }
    out.groupBy(_.getLong(0)).values.foreach { g =>
      val cums = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    }
  }

  test("elasticity: per-brand slopes match a micro-log BigInt recomputation") {
    val demand = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"),
        (col("p_retailprice").cast(DecimalType(12, 2)) * 100)
          .cast("long"))
      .collect().flatMap { r =>
        demand.get(r.getLong(0)).filter(_ > 0).map(q =>
          (r.getString(1),
            math.floor(1e6 * math.log(r.getLong(2).toDouble)).toLong,
            math.floor(1e6 * math.log(q.toDouble)).toLong))
      }
    val out = run("q423_elasticity").collect()
      .map(r => r.getString(0) -> r).toMap
    parts.groupBy(_._1).foreach { case (brand, ps) =>
      val n = ps.length.toLong
      val sx = ps.map(_._2).sum; val sy = ps.map(_._3).sum
      val sxy = ps.map(p => BigInt(p._2) * p._3).sum
      val sxx = ps.map(p => BigInt(p._2) * p._2).sum
      val slope = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      val r = out(brand)
      assert(r.getLong(1) == n, s"$brand n")
      assert(r.getDouble(2) == slope, s"$brand slope")
    }
  }

  test("decision stump: best split matches a direct 64-bucket scan; beats the baseline impurity") {
    val rows = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("long"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
      .collect().map(r => (math.min(63L, r.getLong(0) / 80000L),
        r.getLong(1)))
    val n = rows.length.toLong
    val p = rows.map(_._2).sum
    val hist = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    var (nl, pl) = (0L, 0L)
    val splits = (0L to 63L).flatMap { b =>
      val (nb, pb) = hist.getOrElse(b, (0L, 0L))
      nl += nb; pl += pb
      if (nl > 0 && nl < n && hist.contains(b)) {
        val imp = 2.0 * (pl.toDouble * (nl - pl).toDouble / nl.toDouble +
          (p - pl).toDouble * ((n - nl) - (p - pl)).toDouble /
            (n - nl).toDouble) / n.toDouble
        Some((b, nl, imp))
      } else None
    }
    val best = splits.minBy(s => (s._3, s._1))
    val out = run("q424_decision_stump").head
    assert(out.getLong(0) == (best._1 + 1) * 80000L)
    assert(out.getLong(1) == best._2 && out.getLong(2) == n - best._2)
    assert(out.getDouble(3) == best._3)
    val baseline = 2.0 * p.toDouble * (n - p).toDouble /
      (n.toDouble * n.toDouble)
    assert(out.getDouble(4) == baseline)
    assert(out.getDouble(3) <= baseline + 1e-12,
      "a split never increases weighted Gini")
  }

  test("trimmed A/B: both arm means match q370-style sorted trims; diff is their difference") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    def tmean(arm: Long): (Long, Double) = {
      val xs = rows.filter(_._1 == arm).map(_._2).sorted
      val n = xs.length.toLong
      val lo = n / 10
      val kept = xs.slice(lo.toInt, (n - lo).toInt)
      (n, kept.sum.toDouble / (n - 2 * lo).toDouble)
    }
    val (n1, m1) = tmean(1L); val (n0, m0) = tmean(0L)
    val out = run("q425_trimmed_ab").head
    assert(out.getLong(0) == n1 && out.getLong(1) == n0)
    assert(out.getDouble(2) == m1 && out.getDouble(3) == m0)
    assert(out.getDouble(4) == m1 - m0)
  }

  test("dedup bias: kept count equals component count; sums match a direct election replay") {
    val comps = operators.TextQueries.winnowComponents(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        comps.get(r.getLong(0)).map { c =>
          val t = r.getString(1)
          val alpha = t.count(_.isLetter).toLong
          (r.getLong(0), c, t.length.toLong, alpha,
            alpha.toDouble / t.length)
        }
      }
    val kept = docs.groupBy(_._2).values.map(g =>
      g.minBy(d => (-d._5, d._1))._1).toSet
    val (k, drop) = docs.partition(d => kept(d._1))
    val out = run("q426_dedup_bias").head
    assert(out.getLong(0) == k.length.toLong &&
      out.getLong(1) == drop.length.toLong)
    assert(out.getLong(0) == comps.values.toSet.size.toLong,
      "one representative per component")
    assert(out.getDouble(2) ==
      k.map(_._3).sum.toDouble / k.length.toDouble)
    assert(out.getDouble(3) ==
      drop.map(_._3).sum.toDouble / drop.length.toDouble)
    assert(out.getLong(4) == k.map(_._4).sum * 1000000L / k.map(_._3).sum)
    assert(out.getLong(5) ==
      drop.map(_._4).sum * 1000000L / drop.map(_._3).sum)
  }
}
