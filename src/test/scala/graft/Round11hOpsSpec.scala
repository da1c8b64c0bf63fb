package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-10 operators (CEM, profile, quantile normalization,
  * Brown-Forsythe, isotonic PAV, negative sampling).
  */
class Round11hOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("CEM: ATT matches a direct cell-by-cell Scala recomputation; matched mass is a subset of treated mass") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey")
        .as("o_custkey"), col("c_nationkey")), "o_custkey")
      .select(date_trunc("month", col("o_orderdate")).cast("long"),
        col("c_nationkey").cast("long"),
        col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        r.getString(2) == "1-URGENT" || r.getString(2) == "2-HIGH",
        r.getLong(3)))
    val cells = rows.groupBy(_._1)
    var (syT, syC, mMatched) = (BigInt(0), BigInt(0), 0L)
    var nMatched = 0L
    cells.foreach { case (_, cs) =>
      val (t, c) = cs.partition(_._2)
      if (t.nonEmpty && c.nonEmpty) {
        nMatched += 1
        mMatched += t.length
        syT += t.map(x => BigInt(x._3)).sum
        syC += BigInt(t.length) * (c.map(_._3).sum / c.length) // trunc div
      }
    }
    val out = run("q373_cem_att").head
    assert(out.getLong(0) == cells.size.toLong, "n_cells")
    assert(out.getLong(1) == nMatched, "n_matched")
    assert(out.getLong(3) == mMatched, "m_matched")
    assert(out.getLong(3) <= out.getLong(2), "matched <= treated")
    assert(out.getDouble(4) ==
      (syT.toDouble - syC.toDouble) / mMatched.toDouble, "ATT exact")
  }

  test("profile: stats match direct per-column recomputation on the collected table") {
    val o = Tables.orders(spark, sf).collect()
    val out = run("q374_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    val keys = o.map(_.getLong(0))
    val kr = out("o_orderkey")
    assert(kr.getLong(1) == 0L && kr.getLong(2) == keys.distinct.length)
    assert(kr.getDouble(3) == keys.min.toDouble &&
      kr.getDouble(4) == keys.max.toDouble)
    assert(kr.isNullAt(5) && kr.isNullAt(6))
    val stats = o.map(_.getString(2))
    val sr = out("o_orderstatus")
    assert(sr.getLong(2) == stats.distinct.length)
    assert(sr.isNullAt(3) && sr.isNullAt(4))
    assert(sr.getLong(5) == stats.map(_.length).min.toLong &&
      sr.getLong(6) == stats.map(_.length).max.toLong)
    val prices = o.map(_.getDouble(3))
    val pr = out("o_totalprice")
    assert(pr.getDouble(3) == prices.min && pr.getDouble(4) == prices.max)
  }

  test("quantile normalization: within-source deciles partition each source; pooled values are real pooled order stats; raw means exact") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = docs.length.toLong
    val pooledSorted = docs.map(_._2).sorted
    val out = run("q375_quantile_norm").collect()
    // per-source decile counts sum back to the source size
    val bySrc = out.groupBy(_.getString(0))
    docs.groupBy(_._1).foreach { case (srcName, ds) =>
      assert(bySrc(srcName).map(_.getLong(2)).sum == ds.length.toLong,
        s"$srcName decile partition")
    }
    out.foreach { r =>
      val (srcName, dec) = (r.getString(0), r.getLong(1))
      // raw mean: recompute from the ranked source docs in this decile
      val ds = docs.filter(_._1 == srcName)
        .sortBy(x => (x._2, x._3)) // (n_chars, doc_id) — the packed order
      val ng = ds.length.toLong
      val inDec = ds.zipWithIndex.filter { case (_, i) =>
        ((2L * (i + 1) - 1L) * 1000000L) / (2L * ng) / 100000L == dec }
      assert(r.getLong(2) == inDec.length.toLong, s"$srcName/$dec n_docs")
      assert(r.getDouble(3) == inDec.map(_._1._2).sum.toDouble /
        inDec.length.toDouble, s"$srcName/$dec raw mean")
      // pooled value: the order statistic at the decile-midpoint rank
      val t = ((dec * 100000L + 50000L) * n) / 1000000L + 1L
      assert(r.getLong(4) == pooledSorted((t - 1).toInt),
        s"$srcName/$dec pooled value")
    }
  }

  test("Brown-Forsythe: F matches an exact reimplementation from group medians; uniform-shift invariance holds") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types
          .DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def med(xs: Seq[Long]): Long = { // lower median, q267 convention
      val s = xs.sorted
      s.zipWithIndex.find { case (_, i) =>
        2L * (i + 1) >= s.length }.get._1
    }
    val terms = groups.map { case (_, xs) =>
      val m = med(xs)
      val z = xs.map(x => math.abs(x - m))
      val sz = z.sum
      val qz = z.map(v => BigInt(v) * v).sum
      (xs.length.toLong, sz, qz,
        math.floor(sz.toDouble * sz.toDouble / xs.length.toDouble *
          1000000.0).toLong)
    }.toSeq
    val k = terms.length.toLong
    val n = terms.map(_._1).sum
    val szg = terms.map(_._2).sum
    val qzg = terms.map(_._3).sum
    val sb = terms.map(_._4).sum
    // the r12 formula: no floor on the global term (it saturates Spark's
    // floor->long past Long.MaxValue at sf1) — sb stays micro-floored
    // per group, the F block is pure double algebra
    val ssb = sb.toDouble / 1000000.0 -
      szg.toDouble * szg.toDouble / n.toDouble
    val ssw = qzg.toDouble - sb.toDouble / 1000000.0
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    val out = run("q376_brown_forsythe").head
    assert((out.getLong(0), out.getLong(1)) == ((k, n)))
    assert(out.getDouble(4) == f, s"F ${out.getDouble(4)} != $f")
    assert(out.getDouble(4) >= 0.0)
  }

  test("isotonic: fitted rates match a pure-Scala PAV on the real bins and are monotone; a planted violator pools correctly") {
    // classic PAV (stack of (sum, n) pools, merge while decreasing)
    def pav(bins: Seq[(Long, Long)]): Seq[Double] = { // (sy, n) per bin
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(BigInt, BigInt, Int)] // (sy, n, width)
      bins.foreach { case (sy, bn) =>
        var (s0, n0, w0) = (BigInt(sy), BigInt(bn), 1)
        while (stack.nonEmpty &&
          stack.last._1 * n0 >= s0 * stack.last._2) { // prev rate >= cur
          val (s1, n1, w1) = stack.remove(stack.length - 1)
          s0 += s1; n0 += n1; w0 += w1
        }
        stack += ((s0, n0, w0))
      }
      stack.flatMap { case (s0, n0, w0) =>
        Seq.fill(w0)(s0.toDouble / n0.toDouble) }.toSeq
    }
    // planted violator: rates 0.5, 0.2 must pool to 7/20 in both bins
    assert(pav(Seq((5L, 10L), (2L, 10L))) == Seq(0.35, 0.35))
    // strictly increasing input is a fixed point
    assert(pav(Seq((1L, 10L), (5L, 10L), (9L, 10L))) ==
      Seq(0.1, 0.5, 0.9))
    val out = run("q377_isotonic").collect()
    val bins = operators.TextQueries.nbScores(spark, sf)
      .select(col("y"),
        greatest(lit(-5L), least(lit(4L), expr("score_ppm div 2000L")))
          .as("bin"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(v => (v.map(_._2).sum, v.length.toLong))
      .toSeq.sortBy(_._1)
    val expect = pav(bins.map(_._2))
    assert(out.length == bins.length)
    out.zip(expect).foreach { case (r, e) =>
      assert(r.getLong(3) == math.floor(e * 1000000.0).toLong,
        s"bin ${r.getLong(0)}: ${r.getLong(3)} != ${math.floor(e * 1e6)}")
    }
    // monotone non-decreasing
    val iso = out.map(_.getLong(3))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("negative sampling: draws are deterministic, collide with no positive, and come from the part key space") {
    val out = run("q378_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pos = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        "o_orderkey")
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = Tables.part(spark, sf).count()
    assert(out.nonEmpty && out.length <= 4 * pos.size)
    out.foreach { case (cust, posKey, draw, neg) =>
      assert(pos((cust, posKey)), "positive pair exists")
      assert(draw >= 0L && draw <= 3L)
      assert(neg >= 0L && neg < p, "negative inside the catalog")
      assert(neg != posKey, "never the positive itself")
      assert(!pos((cust, neg)), "never any positive of the customer")
    }
    // determinism across runs
    val again = run("q378_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sorted.sameElements(again.sorted))
  }
}
