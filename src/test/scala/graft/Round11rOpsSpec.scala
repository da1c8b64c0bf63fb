package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-20 operators (dedup by source, 1-D EMD, keyness,
  * leakage screen, James-Stein, capture-recapture).
  */
class Round11rOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dedup by source: clustered counts match a direct label join; totals reconcile with the census") {
    val clustered = operators.TextQueries.winnowComponents(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = run("q433_dedup_by_source").collect()
    out.foreach { r =>
      val ds = docs.filter(_._2 == r.getString(0))
      val c = ds.count(d => clustered(d._1)).toLong
      assert(r.getLong(1) == ds.length.toLong && r.getLong(2) == c,
        r.getString(0))
      assert(r.getLong(3) == c * 1000000L / ds.length, "ppm")
    }
    val census = run("q411_component_census").head
    assert(out.map(_.getLong(2)).sum == census.getLong(2),
      "per-source clustered counts sum to the census")
  }

  test("1-D EMD: matches a direct CDF integration; zero on identical distributions; symmetric in the arms") {
    val docs = Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val a = docs.filter(_._1 == "src0").map(_._2)
    val b = docs.filter(_._1 == "src1").map(_._2)
    val vals = (a ++ b).distinct.sorted
    var (f1, f0) = (0L, 0L)
    var num = BigInt(0)
    vals.zip(vals.tail).foreach { case (v, vn) =>
      f1 += a.count(_ == v); f0 += b.count(_ == v)
      num += (BigInt(f1) * b.length - BigInt(f0) * a.length).abs *
        (vn - v)
    }
    val expect = num.toDouble / (a.length.toDouble * b.length.toDouble)
    val out = run("q434_emd_1d").head
    assert(out.getLong(0) == a.length.toLong &&
      out.getLong(1) == b.length.toLong)
    assert(out.getDouble(2) == expect, s"${out.getDouble(2)} != $expect")
    // identical samples fixture: zero transport
    val xs = Seq(1L, 5L, 9L)
    var acc = BigInt(0); var (g1, g0) = (0L, 0L)
    xs.zip(xs.tail).foreach { case (v, vn) =>
      g1 += 1; g0 += 1
      acc += (BigInt(g1) * 3 - BigInt(g0) * 3).abs * (vn - v)
    }
    assert(acc == 0)
  }

  test("keyness: top-10 G2 matches a direct Dunning recomputation with the same micro-flooring") {
    val toks = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .map(t => (r.getString(0) == "src0", t)))
    val byTok = toks.groupBy(_._2).view.mapValues { g =>
      (g.count(_._1).toLong, g.count(!_._1).toLong) }.toMap
    val r1 = toks.count(_._1).toLong
    val r2 = toks.length.toLong - r1
    def g2micro(o1: Long, o2: Long): Long = {
      val n = (r1 + r2).toDouble
      val t1 = if (o1 > 0) o1.toDouble *
        math.log(o1.toDouble * n / (r1.toDouble * (o1 + o2).toDouble))
      else 0.0
      val t2 = if (o2 > 0) o2.toDouble *
        math.log(o2.toDouble * n / (r2.toDouble * (o1 + o2).toDouble))
      else 0.0
      math.floor(1e6 * 2.0 * (t1 + t2)).toLong
    }
    val top = byTok.toSeq.map { case (t, (o1, o2)) =>
      (t, o1, o2, g2micro(o1, o2)) }
      .sortBy { case (t, _, _, g) => (-g, t) }.take(10)
    val out = run("q435_keyness").collect()
    out.zip(top).foreach { case (r, (t, o1, o2, g)) =>
      assert(r.getString(0) == t, s"token order: ${r.getString(0)} vs $t")
      assert(r.getLong(1) == o1 && r.getLong(2) == o2)
      assert(r.getDouble(3) == g.toDouble / 1e6)
    }
  }

  test("leakage screen: point-biserial correlations match BigInt moments; all within [-1, 1]") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("long"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"),
        (unix_timestamp(col("o_orderdate")) / 86400L).cast("long"),
        (col("o_custkey") % 100L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length.toLong
    def corr(f: ((Long, Long, Long, Long)) => Long): Double = {
      val st = rows.map(_._1).sum
      val sf0 = rows.map(f).sum
      val stt = rows.map(r => { val c = BigInt(n * r._1 - st); c * c }).sum
      val sff = rows.map(r => { val c = BigInt(n * f(r) - sf0); c * c }).sum
      val sft = rows.map(r =>
        BigInt(n * f(r) - sf0) * BigInt(n * r._1 - st)).sum
      sft.toDouble / math.sqrt(sff.toDouble * stt.toDouble)
    }
    val out = run("q436_leakage_screen").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("totalprice") == corr(_._2))
    assert(out("order_day") == corr(_._3))
    assert(out("custkey_mod100") == corr(_._4))
    out.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("James-Stein: shrinkage replays exactly; every shrunk effect lies between its raw value and the grand mean") {
    val out = run("q437_james_stein").collect()
    val shrink = out.head.getDouble(3)
    assert(out.forall(_.getDouble(3) == shrink), "one global factor")
    assert(shrink >= 0.0 && shrink <= 1.0)
    // reconstruct dbar from any row: shrunk = dbar + s*(raw - dbar)
    if (shrink < 1.0) {
      val dbar = (out.head.getDouble(2) -
        shrink * out.head.getDouble(1)) / (1.0 - shrink)
      out.foreach { r =>
        val expect = dbar + shrink * (r.getDouble(1) - dbar)
        assert(math.abs(r.getDouble(2) - expect) < 1e-6,
          s"nation ${r.get(0)}")
        // betweenness
        val (lo, hi) = (math.min(r.getDouble(1), dbar),
          math.max(r.getDouble(1), dbar))
        assert(r.getDouble(2) >= lo - 1e-6 && r.getDouble(2) <= hi + 1e-6)
      }
    }
  }

  test("capture-recapture: counts match the pair memos; Lincoln-Petersen never undershoots the observed union") {
    val wp = operators.TextQueries.winnowPairs(spark, sf)
      .select("a", "b").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val jp = operators.TextQueries.jaccardPrefixPairs(spark, sf)
      .select("d1", "d2").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val m = wp.intersect(jp).size.toLong
    val out = run("q438_dedup_capture_recapture").head
    assert(out.getLong(0) == wp.size.toLong)
    assert(out.getLong(1) == jp.size.toLong)
    assert(out.getLong(2) == m)
    assert(out.getLong(3) == wp.union(jp).size.toLong)
    if (m > 0) {
      assert(out.getLong(4) == wp.size.toLong * jp.size.toLong / m)
      // (n1-m)(n2-m) >= 0 ⇒ N̂ >= union, always
      assert(out.getLong(4) >= out.getLong(3))
    } else assert(out.isNullAt(4))
  }
}
