package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and invariant proofs for the round-11 batch-4
  * operators — semantics the sf0.01 oracle can confirm but not EXPLAIN:
  * Kendall's ±1 extremes on planted grids, BH's prefix-rejection
  * property, JS's zero floor on identical distributions and its ln 2
  * ceiling, entropy's uniform-distribution closed form, Chao1's
  * all-singleton extreme, the Zipf slope's sign, Levenshtein blocking
  * soundness against an independent DP, target encoding's shrinkage
  * direction, Mann-Kendall's strictly-increasing closed form, and the
  * SPRT decision's LLR consistency recomputed from the raw facts.
  */
class Round11bOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Kendall tau-b: +1 on a planted concordant grid, -1 on a planted inverse; real output in range with consistent pair counts") {
    val s = spark
    import s.implicits._
    def tau(cells: Seq[(Long, Long, Long)]): (Long, Long, Double) = {
      cells.toDF("x", "y", "cnt").createOrReplaceTempView("planted_kt")
      val r = s.sql(
        """WITH pair AS (SELECT
              sum(CASE WHEN i.y < j.y THEN i.cnt * j.cnt ELSE 0 END) AS conc,
              sum(CASE WHEN i.y > j.y THEN i.cnt * j.cnt ELSE 0 END) AS disc
            FROM planted_kt i JOIN planted_kt j ON i.x < j.x),
          gx AS (SELECT sum((nx * (nx - 1)) div 2) AS tx
            FROM (SELECT sum(cnt) AS nx FROM planted_kt GROUP BY x)),
          gy AS (SELECT sum((ny * (ny - 1)) div 2) AS ty
            FROM (SELECT sum(cnt) AS ny FROM planted_kt GROUP BY y)),
          nn AS (SELECT sum(cnt) AS n FROM planted_kt)
          SELECT conc, disc,
            ((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
             / sqrt((CAST((n * (n - 1)) div 2 AS DOUBLE) - CAST(tx AS DOUBLE))
                  * (CAST((n * (n - 1)) div 2 AS DOUBLE) - CAST(ty AS DOUBLE))))
          FROM pair, gx, gy, nn""").head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val mono = (1L to 10L).map(i => (i, i, 1L))
    val inv = (1L to 10L).map(i => (i, 11L - i, 1L))
    val (c1, d1, t1) = tau(mono)
    assert(c1 == 45L && d1 == 0L && math.abs(t1 - 1.0) < 1e-12)
    val (c2, d2, t2) = tau(inv)
    assert(c2 == 0L && d2 == 45L && math.abs(t2 + 1.0) < 1e-12)
    val r = run("q336_kendall_tau").head
    val (n, conc, disc, n0) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))
    assert(n0 == n * (n - 1) / 2 && conc + disc <= n0)
    val tb = r.getDouble(6)
    assert(tb >= -1.0 && tb <= 1.0, s"tau_b out of range: $tb")
  }

  test("BH-FDR: rejections are a PREFIX of the p-ascending ranking, p is monotone in rank, cells are consistent") {
    val rows = run("q337_bh_fdr").collect()
    assert(rows.length > 1)
    val ps = rows.map(_.getLong(6))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "p_micro not monotone in rank")
    val rej = rows.map(_.getLong(8))
    // once a row is kept (0), no later row may be rejected (1)
    assert(!rej.zip(rej.tail).exists { case (a, b) => a == 0L && b == 1L },
      s"rejection set is not a prefix: ${rej.mkString(",")}")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3),
        "conversions exceed trials")
    }
  }

  test("JS divergence: exactly 0 on planted identical distributions, bounded by ln2 micro; full 190-pair matrix") {
    val s = spark
    import s.implicits._
    // two sources with IDENTICAL token counts -> every shared term is
    // p*ln(1) = 0 and no private mass -> js_micro must be exactly 0
    Seq(("sA", "t1", 3L), ("sA", "t2", 5L), ("sB", "t1", 3L),
      ("sB", "t2", 5L)).toDF("source", "tok", "c")
      .createOrReplaceTempView("planted_js")
    val js0 = s.sql(
      """WITH tot AS (SELECT source, sum(c) AS n FROM planted_js GROUP BY 1),
        a AS (SELECT p.source AS s1, tok, c AS c1, n AS n1
          FROM planted_js p JOIN tot ON p.source = tot.source),
        b AS (SELECT p.source AS s2, tok, c AS c2, n AS n2
          FROM planted_js p JOIN tot ON p.source = tot.source),
        t AS (SELECT s1, s2, n1, n2, c1, c2,
            CAST(floor(1000000000000.0 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
              * ln(2.0 * CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / (CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    + CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE)))) AS BIGINT) AS t1p,
            CAST(floor(1000000000000.0 * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              * ln(2.0 * CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  / (CAST(c2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                    + CAST(c1 AS DOUBLE) * CAST(n2 AS DOUBLE)))) AS BIGINT) AS t2p
          FROM a JOIN b USING (tok) WHERE s1 < s2),
        m AS (SELECT s1, s2, n1, n2, sum(c1) AS sc1, sum(c2) AS sc2,
            sum(t1p) AS t1, sum(t2p) AS t2 FROM t GROUP BY 1, 2, 3, 4)
        SELECT CAST(floor(500000.0 * ((CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE))
              / 1000000000000.0
            + 0.6931471805599453
              * ((CAST(n1 AS DOUBLE) - CAST(sc1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
               + (CAST(n2 AS DOUBLE) - CAST(sc2 AS DOUBLE)) / CAST(n2 AS DOUBLE))))
           AS BIGINT) FROM m""").head.getLong(0)
    assert(js0 == 0L, s"identical distributions gave js_micro=$js0")
    val rows = run("q338_js_source_matrix").collect()
    assert(rows.length == 190, s"expected 20*19/2 pairs, got ${rows.length}")
    rows.foreach { r =>
      val js = r.getLong(3)
      assert(js >= -1L && js <= 693148L, s"js_micro out of [0, ln2]: $js")
    }
  }

  test("entropy: uniform planted counts hit the closed form floor(1e6*ln N); real profiles bounded by ln(vocab)") {
    val s = spark
    import s.implicits._
    (1 to 4).map(i => (s"t$i", 1L)).toDF("tok", "c")
      .createOrReplaceTempView("planted_h")
    val h = s.sql(
      """WITH g AS (SELECT sum(c) AS n_tok,
          sum(CAST(floor(1000000.0 * CAST(c AS DOUBLE)
            * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS sclc_micro
        FROM planted_h)
        SELECT CAST(floor(1000000.0 * ln(CAST(n_tok AS DOUBLE))
          - CAST(sclc_micro AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS BIGINT)
        FROM g""").head.getLong(0)
    assert(h == math.floor(1e6 * math.log(4.0)).toLong, s"uniform H=$h")
    run("q339_entropy_profile").collect().foreach { r =>
      val (v, hm, ttr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hm >= 0L && hm <= math.ceil(1e6 * math.log(v.toDouble)).toLong,
        s"H out of [0, ln vocab]: $hm vocab=$v")
      assert(ttr >= 0L && ttr <= 1000000L)
    }
  }

  test("Chao1: all-singleton extreme V + V(V-1)/2; real estimates never below observed vocabulary") {
    // f1 = V, f2 = 0  ->  chao1 = V + V(V-1)/2 by the bias-corrected form
    val v = 7L
    assert(v + (v * (v - 1)) / (2 * (0 + 1)) == 28L)
    run("q340_chao1_vocab").collect().foreach { r =>
      val (vocab, n, f1, f2, chao1, unseen) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(chao1 >= vocab, s"chao1 $chao1 < observed $vocab")
      assert(f1 + f2 <= vocab && f1 <= n)
      assert(unseen >= 0L && unseen <= 1000000L)
    }
  }

  test("Zipf fit: planted exact power law recovers slope -1; the real corpus slope is negative") {
    val s = spark
    import s.implicits._
    // c(r) = 10^9 / r exactly -> ln c = ln 1e9 - ln r -> slope -1
    (1L to 100L).map(r => (r, 1000000000L / r)).toDF("rk", "c")
      .createOrReplaceTempView("planted_z")
    val slope = s.sql(
      """WITH xy AS (SELECT
          CAST(floor(1000000.0 * ln(CAST(rk AS DOUBLE))) AS BIGINT) AS x,
          CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
        FROM planted_z),
        m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
            sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
        SELECT ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) FROM m""")
      .head.getDouble(0)
    // 1e9/r floors, so the fit is -1 within the quantization wiggle
    assert(math.abs(slope + 1.0) < 1e-3, s"planted slope $slope")
    val real = run("q341_zipf_fit").head
    assert(real.getLong(0) > 10L && real.getDouble(1) < 0.0,
      s"real corpus slope should be negative: ${real.getDouble(1)}")
  }

  test("Levenshtein join: distances verified by an independent DP, blocks sound, multiplicities exact") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val rows = run("q342_levenshtein_join").collect()
    assert(rows.nonEmpty)
    val counts = Tables.part(spark, sf).groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (n1, n2, dist, mult) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(dist == lev(n1, n2).toLong, s"dist mismatch for ($n1, $n2)")
      assert(dist >= 1L && dist <= 4L)
      assert(n1.length == n2.length &&
        n1.takeWhile(_ != ' ') == n2.takeWhile(_ != ' '), "block violated")
      assert(mult == counts(n1) * counts(n2), "row multiplicity wrong")
    }
  }

  test("target encoding: every encoding lies between the category mean and the global prior (shrinkage)") {
    val rows = run("q343_target_encoding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sy, enc, prior) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val catMean = 1000000L * sy / n
      val lo = math.min(catMean, prior) - 1
      val hi = math.max(catMean, prior) + 1
      assert(enc >= lo && enc <= hi,
        s"enc $enc outside shrinkage interval [$lo, $hi]")
    }
  }

  test("Mann-Kendall: strictly increasing planted series hits the closed form; real var18 and S bounded") {
    val s = spark
    import s.implicits._
    (1L to 20L).map(i => (i, i * 10L)).toDF("day", "x")
      .createOrReplaceTempView("planted_mk")
    val r = s.sql(
      """WITH ss AS (SELECT CAST(sum(CASE WHEN j.x > i.x THEN 1 ELSE 0 END)
            - sum(CASE WHEN j.x < i.x THEN 1 ELSE 0 END) AS BIGINT) AS s
          FROM planted_mk i JOIN planted_mk j ON i.day < j.day),
        nd AS (SELECT count(*) AS n FROM planted_mk),
        ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
          FROM (SELECT count(*) AS t FROM planted_mk GROUP BY x))
        SELECT s, n * (n - 1) * (2 * n + 5) - tsum FROM ss, nd, ties""").head
    assert(r.getLong(0) == 190L, "S != n(n-1)/2 on strict increase")
    assert(r.getLong(1) == 20L * 19L * 45L, "var18 wrong with no ties")
    val real = run("q344_mann_kendall").head
    val (n, sv, var18) = (real.getLong(0), real.getLong(1), real.getLong(2))
    assert(math.abs(sv) <= n * (n - 1) / 2 && var18 >= 0L)
  }

  test("SPRT: the reported LLR recomputes exactly from raw facts, and the decision matches the boundaries") {
    val out = run("q345_sprt").head
    val (day, llr, decision) =
      (out.getLong(0), out.getLong(3), out.getString(4))
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val recomputed = Tables.events(spark, sf)
      .filter(expr(s"ts div ${dayNs}L") <= day)
      .agg(sum(when(col("value") >= 50.0, 133531L).otherwise(-80043L)))
      .head.getLong(0)
    assert(recomputed == llr, s"LLR $llr != recomputed $recomputed")
    decision match {
      case "accept_h1" => assert(llr >= 2944439L)
      case "accept_h0" => assert(llr <= -2944440L)
      case "continue" => assert(llr > -2944440L && llr < 2944439L)
      case other => fail(s"unknown decision $other")
    }
  }
}
