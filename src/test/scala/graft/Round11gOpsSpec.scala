package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-9 operators (TextRank, CCF, Cohen's d, robust means,
  * stratified PPS, centroid drift).
  */
class Round11gOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("TextRank: top-20 matches a pure-Scala 3-round integer PageRank over the same weighted graph; stopwords excluded") {
    val stop = Set("the", "a")
    val bg = operators.TextQueries.bigramTable(spark, sf)._1
      .select("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(p => p._1 != p._2 && !stop(p._1) && !stop(p._2))
    val e0 = bg.groupBy(identity).map { case ((a, b), v) =>
      ((a, b), v.length.toLong) }
    val e = (e0.toSeq ++ e0.toSeq.map { case ((a, b), w) => ((b, a), w) })
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    val wsum = e.groupBy(_._1._1).map { case (s, es) =>
      (s, es.values.sum) }
    val wp = e.map { case ((s, t), w) => ((s, t), w * 1000000L / wsum(s)) }
    val S = 10000000000L
    val n = wsum.size.toLong
    val base = (15L * S) / (100L * n)
    var ranks: Map[String, Long] = wsum.map { case (v, _) => v -> S / n }
    for (_ <- 1 to 3) {
      val cs = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      wp.foreach { case ((s, t), p) =>
        cs(t) += (ranks(s) * p) / 1000000L }
      ranks = cs.map { case (v, c) => v -> (base + (85L * c) / 100L) }.toMap
    }
    val expect = ranks.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    val got = run("q367_textrank").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"top-20 mismatch:\n got $got\n exp $expect")
    assert(got.forall(r => !stop(r._1)))
  }

  test("CCF: every lag matches an exact BigInt-moment reimplementation; |r| bounded; pair counts exact") {
    def daily(rows: Array[(Long, Long)]) = rows.toMap
    val x = daily(Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1))).collect().map(r => (r.getLong(0), r.getLong(1))))
    val y = daily(Tables.lineitem(spark, sf)
      .groupBy(datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1))).collect().map(r => (r.getLong(0), r.getLong(1))))
    val (nx, sx) = (BigInt(x.size), BigInt(x.values.sum))
    val (ny, sy) = (BigInt(y.size), BigInt(y.values.sum))
    val dx = x.values.map(v => (nx * v - sx) * (nx * v - sx)).sum
    val dy = y.values.map(v => (ny * v - sy) * (ny * v - sy)).sum
    val rows = run("q368_ccf").collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (lag, nPairs, ccf) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val pairs = x.keys.filter(d => y.contains(d + lag)).toSeq
      assert(nPairs == pairs.length.toLong, s"lag $lag pairs")
      val num = pairs.map(d =>
        (nx * x(d) - sx) * (ny * y(d + lag) - sy)).sum
      val expect = num.toDouble /
        math.sqrt(dx.toDouble * dy.toDouble)
      assert(ccf == expect, s"lag $lag: $ccf != $expect")
      assert(ccf >= -1.0 - 1e-9 && ccf <= 1.0 + 1e-9)
    }
  }

  test("Cohen's d: matches a direct reimplementation with identical pinned arithmetic; Hedges g shrinks toward zero") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (a, b) = orders.partition(r =>
      r._1 == "1-URGENT" || r._1 == "2-HIGH")
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val (sa, sb) = (a.map(_._2).sum, b.map(_._2).sum)
    val qa = a.map(r => BigInt(r._2) * r._2).sum
    val qb = b.map(r => BigInt(r._2) * r._2).sum
    val md = sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble
    val sp2 = ((qa.toDouble - sa.toDouble * sa.toDouble / na.toDouble)
      + (qb.toDouble - sb.toDouble * sb.toDouble / nb.toDouble)) /
      (na + nb - 2L).toDouble
    val dEff = md / math.sqrt(sp2)
    val out = run("q369_cohens_d").head
    assert((out.getLong(0), out.getLong(1)) == ((na, nb)))
    assert(out.getDouble(2) == md, "mean diff exact")
    assert(out.getDouble(3) == dEff, "cohens_d exact")
    val g = dEff * (1.0 - 3.0 / (4L * (na + nb) - 9L).toDouble)
    assert(out.getDouble(4) == g, "hedges_g exact")
    assert(math.abs(out.getDouble(4)) <= math.abs(out.getDouble(3)),
      "correction shrinks toward zero")
  }

  test("robust means: trimmed/winsorized match an exact sorted reimplementation per type; cut values are real order stats") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val out = run("q370_robust_mean").collect()
    assert(out.length == byType.size)
    out.foreach { r =>
      val t = r.getString(0)
      val xs = byType(t)
      val n = xs.length.toLong
      assert(r.getLong(1) == n)
      val lo = (n / 10L).toInt
      val vLo = xs(lo) // (lo+1)-th order statistic, 0-indexed
      val vHi = xs((n - n / 10L - 1L).toInt) // the (n-lo)-th
      assert(r.getLong(2) == vLo, s"$t v_lo")
      assert(r.getLong(3) == vHi, s"$t v_hi")
      val kept = xs.slice(lo, (n - lo).toInt)
      assert(r.getDouble(4) ==
        kept.sum.toDouble / kept.length.toDouble, s"$t trimmed")
      val wsum = kept.sum + lo * vLo + lo * vHi
      assert(r.getDouble(5) == wsum.toDouble / n.toDouble, s"$t winsor")
      assert(r.getDouble(4) >= vLo.toDouble &&
        r.getDouble(4) <= vHi.toDouble, s"$t trimmed mean inside cuts")
    }
  }

  test("stratified PPS: each stratum draws exactly k_g picks; allocation is floor-proportional to char mass") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val wg = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = wg.values.sum
    val kg = wg.view.mapValues(g => 60L * g / w).toMap
    val rows = run("q371_stratified_pps").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    rows.foreach { case (srcName, _, kgOut, m) =>
      assert(kgOut == kg(srcName), s"$srcName kg")
      assert(m >= 1L)
    }
    // Madow property: per-stratum multiplicities sum to exactly k_g
    val perSrc = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    kg.filter(_._2 > 0).foreach { case (srcName, k) =>
      assert(perSrc.getOrElse(srcName, 0L) == k,
        s"$srcName total picks ${perSrc.get(srcName)} != $k")
    }
    // strata with zero allocation draw nothing
    kg.filter(_._2 == 0).foreach { case (srcName, _) =>
      assert(!perSrc.contains(srcName)) }
  }

  test("centroid drift: cosines match an exact micro-quantized reimplementation; matrix covers all label pairs once") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val byLabel = vecs.groupBy(_._1)
    val cent = byLabel.map { case (l, vs) =>
      val dims = vs.head._2.length
      val c = (0 until dims).map { i =>
        val sq = vs.map(v =>
          math.floor(v._2(i).toDouble * 1000000.0).toLong).sum
        sq / vs.length.toLong // truncating div, both engines
      }
      (l, c)
    }
    val out = run("q372_centroid_drift").collect()
    val labels = byLabel.keys.toSeq.sorted
    assert(out.length == labels.size * (labels.size - 1) / 2)
    out.foreach { r =>
      val (la, lb, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (ca, cb) = (cent(la), cent(lb))
      val dot = ca.zip(cb).map { case (x, y) => BigInt(x) * y }.sum
      val na = ca.map(x => BigInt(x) * x).sum
      val nb = cb.map(x => BigInt(x) * x).sum
      val expect = dot.toDouble /
        (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      assert(cos == expect, s"($la,$lb): $cos != $expect")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
  }
}
