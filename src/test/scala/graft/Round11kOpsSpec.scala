package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-13 operators (Friedman, Cliff's delta, vocab churn,
  * n-gram diversity, Theil/Atkinson, ANCOVA).
  */
class Round11kOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Friedman: chi2 matches a direct blocked-rank recomputation with tied-average doubled ranks") {
    val rows = Tables.orders(spark, sf)
      .select(date_trunc("month", col("o_orderdate")).cast("long")
        .as("block"),
        col("o_orderpriority").as("treat"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cells = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(g => g.map(_._3).sum / g.length) // truncating div
      .toMap
    val blocks = cells.keys.map(_._1).toSeq.distinct
      .filter(b => cells.keys.count(_._1 == b) == 5)
    val r2ByTreat = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    blocks.foreach { b =>
      val vs = cells.filter(_._1._1 == b).toSeq
      vs.foreach { case ((_, treat), v) =>
        val less = vs.count(_._2 < v).toLong
        val eq = vs.count(_._2 == v).toLong
        r2ByTreat(treat) += 2L * less + eq + 1L
      }
    }
    val n = blocks.length.toLong
    val k = 5L
    val sr2 = r2ByTreat.values.map(v => BigInt(v) * v).sum
    val chi2 = 3.0 * sr2.toDouble /
      (n.toDouble * k.toDouble * (k + 1).toDouble) -
      3.0 * n.toDouble * (k + 1).toDouble
    val out = run("q391_friedman").head
    assert(out.getLong(0) == n && out.getLong(1) == k)
    assert(out.getDouble(2) == chi2, s"${out.getDouble(2)} != $chi2")
    // doubled ranks per block always sum to k(k+1) = 30
    assert(r2ByTreat.values.sum == n * 30L)
  }

  test("Cliff's delta: matches a brute-force all-pairs count; gt+lt+ties partitions the pair space") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0) % 2, r.getLong(1)))
    val a1 = rows.filter(_._1 == 1L).map(_._2)
    val a0 = rows.filter(_._1 == 0L).map(_._2)
    var (gt, lt, ties) = (0L, 0L, 0L)
    a1.foreach { x =>
      a0.foreach { y =>
        if (x > y) gt += 1 else if (x < y) lt += 1 else ties += 1
      }
    }
    val out = run("q392_cliffs_delta").head
    assert(out.getLong(0) == a1.length.toLong)
    assert(out.getLong(1) == a0.length.toLong)
    assert(out.getLong(2) == gt && out.getLong(3) == lt &&
      out.getLong(4) == ties)
    assert(out.getLong(2) + out.getLong(3) + out.getLong(4) ==
      a1.length.toLong * a0.length.toLong, "pair-space partition")
    assert(out.getDouble(5) ==
      (gt.toDouble - lt.toDouble) /
        (a1.length.toDouble * a0.length.toDouble))
  }

  test("vocab churn: top-100 sets and Jaccard match a direct recomputation") {
    val toks = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .map(t => (r.getLong(0) % 2, t)))
    def top(h: Long) = toks.filter(_._1 == h).groupBy(_._2).view
      .mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(100).map(_._1).toSet
    val (ta, tb) = (top(0L), top(1L))
    val overlap = ta.intersect(tb).size.toLong
    val out = run("q393_vocab_churn").head
    assert(out.getLong(0) == ta.size.toLong &&
      out.getLong(1) == tb.size.toLong)
    assert(out.getLong(2) == overlap)
    assert(out.getLong(3) == overlap * 1000000L /
      (ta.size + tb.size - overlap))
  }

  test("n-gram diversity: totals and distincts match a sliding-window recomputation; distinct-n rises with n") {
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+")))
    assert(docs.forall(_._2.length >= 3), "corpus contract: >= 3 tokens")
    val out = run("q394_ngram_diversity").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    docs.groupBy(_._1).foreach { case (src, ds) =>
      (1 to 3).foreach { n =>
        val grams = ds.flatMap(_._2.sliding(n).map(_.mkString(" ")))
        val r = out((src, n.toLong))
        assert(r.getLong(2) == grams.length.toLong, s"$src/$n total")
        assert(r.getLong(3) == grams.distinct.length.toLong,
          s"$src/$n distinct")
        assert(r.getLong(4) ==
          grams.distinct.length.toLong * 1000000L / grams.length,
          s"$src/$n ppm")
      }
      // bigram diversity >= unigram diversity on natural-ish text
      assert(out((src, 2L)).getLong(4) >= out((src, 1L)).getLong(4), src)
    }
  }

  test("Theil + Atkinson: match a same-floored direct recomputation; both nonnegative, Atkinson < 1") {
    val xs = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val n = xs.length.toLong
    val s = xs.sum
    val sm = xs.map { x =>
      val ratio = x.toDouble * n.toDouble / s.toDouble
      math.floor(1e6 * ratio * math.log(ratio)).toLong
    }.sum
    val sl = xs.map(x => math.floor(1e9 * math.log(x.toDouble)).toLong).sum
    val theil = sm.toDouble / 1e6 / n.toDouble
    val atk = 1.0 - math.exp(sl.toDouble / (n.toDouble * 1e9)) *
      n.toDouble / s.toDouble
    val out = run("q395_theil_atkinson").head
    assert(out.getLong(0) == n)
    assert(out.getDouble(1) == s.toDouble / n.toDouble)
    assert(out.getDouble(2) == theil, "theil")
    assert(out.getDouble(3) == atk, "atkinson")
    // flooring shifts Theil by < 1e-6; both indices positive on unequal data
    assert(out.getDouble(2) > -1e-6 && out.getDouble(3) >= 0.0 &&
      out.getDouble(3) < 1.0)
  }

  test("ANCOVA: tau matches a BigInt Frisch-Waugh recomputation; naive term equals the raw mean difference") {
    val rows = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_acctbal")),
        "o_custkey")
      .select(
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long"),
        (unix_timestamp(col("o_orderdate")) / 86400L).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length.toLong
    val sy = rows.map(_._1).sum; val st = rows.map(_._2).sum
    val sx1 = rows.map(_._3).sum; val sx2 = rows.map(_._4).sum
    def mom(a: ((Long, Long, Long, Long)) => Long, sa: Long,
        b: ((Long, Long, Long, Long)) => Long, sb: Long): BigInt =
      rows.map(r => BigInt(n * a(r) - sa) * BigInt(n * b(r) - sb)).sum
    val y = (r: (Long, Long, Long, Long)) => r._1
    val t = (r: (Long, Long, Long, Long)) => r._2
    val x1 = (r: (Long, Long, Long, Long)) => r._3
    val x2 = (r: (Long, Long, Long, Long)) => r._4
    val s11 = mom(x1, sx1, x1, sx1); val s22 = mom(x2, sx2, x2, sx2)
    val s12 = mom(x1, sx1, x2, sx2)
    val s1y = mom(x1, sx1, y, sy); val s2y = mom(x2, sx2, y, sy)
    val s1t = mom(x1, sx1, t, st); val s2t = mom(x2, sx2, t, st)
    val syt = mom(y, sy, t, st); val stt = mom(t, st, t, st)
    val det = s11.toDouble * s22.toDouble - s12.toDouble * s12.toDouble
    def b1(sz1: BigInt, sz2: BigInt) =
      (sz1.toDouble * s22.toDouble - sz2.toDouble * s12.toDouble) / det
    def b2(sz1: BigInt, sz2: BigInt) =
      (sz2.toDouble * s11.toDouble - sz1.toDouble * s12.toDouble) / det
    val cov = syt.toDouble - b1(s1y, s2y) * s1t.toDouble -
      b2(s1y, s2y) * s2t.toDouble
    val varr = stt.toDouble - b1(s1t, s2t) * s1t.toDouble -
      b2(s1t, s2t) * s2t.toDouble
    val out = run("q396_ancova").head
    assert(out.getLong(0) == n)
    assert(out.getDouble(1) == syt.toDouble / stt.toDouble, "naive")
    assert(out.getDouble(2) == cov / varr, "adjusted")
    // the simple-regression coefficient on a binary regressor IS the
    // mean difference (float tolerance: different op order)
    val tr = rows.filter(_._2 == 1L); val co = rows.filter(_._2 == 0L)
    val rawDiff = tr.map(_._1).sum.toDouble / tr.length -
      co.map(_._1).sum.toDouble / co.length
    assert(math.abs(out.getDouble(1) - rawDiff) <
      1e-9 * math.abs(rawDiff))
  }
}
