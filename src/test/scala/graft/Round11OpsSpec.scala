package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and invariant proofs for the round-11 operator
  * families — the semantics the sf0.01 oracle can confirm but not
  * EXPLAIN: Adamic-Adar's common-neighbor preference, Spearman's ±1
  * extremes and tie handling, the κ/McNemar identities, k-center's
  * non-increasing radius, PSI's zero-drift floor, and the A-ES sample's
  * weight-bias direction.
  */
class Round11OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Adamic-Adar: probe-driven top pairs are non-adjacent, probes obey the 1-in-32 catalog rule") {
    val rows = run("q316_adamic_adar").collect()
    assert(rows.length > 0 && rows.length <= 20)
    // ordering contract: non-increasing score, (p,b) tiebreak ascending
    val scores = rows.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self-pair leaked")
      // every probe satisfies the deterministic catalog predicate
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getLong(0).toString.getBytes("UTF-8"))
        .take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      assert(h % 32 == 0, s"probe ${r.getLong(0)} not in the catalog")
    }
  }

  test("Spearman: rho = +1 on a perfect monotone relation, -1 on a perfect inverse (planted)") {
    // plant via the same 2r-rank + shared formula the operator uses,
    // exercised through raw SQL on a planted relation
    val s = spark
    import s.implicits._
    def rho(pairs: Seq[(Long, Long)]): Double = {
      val df = pairs.toDF("x", "y")
      df.createOrReplaceTempView("planted_sp")
      val r = s.sql(
        """WITH gx AS (SELECT x, count(*) AS c FROM planted_sp GROUP BY x),
          rx AS (SELECT x, 2 * (SELECT coalesce(sum(c), 0) FROM gx g2
              WHERE g2.x < gx.x) + c + 1 AS r2x FROM gx),
          gy AS (SELECT y, count(*) AS c FROM planted_sp GROUP BY y),
          ry AS (SELECT y, 2 * (SELECT coalesce(sum(c), 0) FROM gy g2
              WHERE g2.y < gy.y) + c + 1 AS r2y FROM gy),
          j AS (SELECT r2x, r2y FROM planted_sp
            JOIN rx USING (x) JOIN ry USING (y)),
          m AS (SELECT count(*) AS n, sum(r2x) AS sx, sum(r2y) AS sy,
              sum(r2x * r2y) AS sxy, sum(r2x * r2x) AS sxx,
              sum(r2y * r2y) AS syy FROM j)
          SELECT ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) FROM m""")
        .head.getDouble(0)
      r
    }
    val mono = (1L to 40L).map(i => (i, i * i)) // monotone, nonlinear
    val inv = (1L to 40L).map(i => (i, 100L - i))
    assert(math.abs(rho(mono) - 1.0) < 1e-12, s"monotone rho=${rho(mono)}")
    assert(math.abs(rho(inv) + 1.0) < 1e-12, s"inverse rho=${rho(inv)}")
    // the table-bound operator stays in the legal range
    val real = run("q317_spearman").head
    val rs = real.getDouble(1)
    assert(rs >= -1.0 && rs <= 1.0, s"rho_s out of range: $rs")
  }

  test("template dedup: per-source docs - templates = dup_docs, and totals match the corpus") {
    val rows = run("q318_template_dedup").collect()
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) <= r.getLong(1))
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("longest streak histogram covers every active user exactly once") {
    val hist = run("q320_longest_streak").collect()
    val nUsers = hist.map(_.getLong(1)).sum
    val truth = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(nUsers == truth, s"histogram covers $nUsers of $truth users")
    hist.foreach(r => assert(r.getLong(0) >= 1))
  }

  test("kappa and McNemar agree on the discordant cells, kappa within [-1,1] ppm") {
    val k = run("q321_cohens_kappa").head
    val m = run("q322_mcnemar").head
    assert(k.getLong(1) == m.getLong(0), "n10 != b_only_a")
    assert(k.getLong(2) == m.getLong(1), "n01 != c_only_b")
    val kp = k.getLong(4)
    assert(kp >= -1000000L && kp <= 1000000L, s"kappa_ppm out of range: $kp")
    // perfect-agreement identity on a planted table: kappa formula hits
    // exactly 1e6 when the raters are the SAME column
    val s = spark
    import s.implicits._
    val t = Seq((1L, 1L), (0L, 0L), (1L, 1L), (0L, 0L), (1L, 1L))
      .toDF("a", "b")
      .agg(sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      .select(expr("""(2000000 * (n11 * n00 - n10 * n01))
        div ((n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00))"""))
      .head.getLong(0)
    assert(t == 1000000L, s"perfect agreement kappa_ppm=$t")
  }

  test("EWMA: first day equals its count; all values within the count range (convexity)") {
    val rows = run("q319_ewma_control").orderBy("day").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(2) == rows.head.getLong(1).toDouble,
      "z_0 must equal x_0")
    val (lo, hi) = (rows.map(_.getLong(1)).min.toDouble,
      rows.map(_.getLong(1)).max.toDouble)
    rows.foreach { r =>
      val z = r.getDouble(2)
      assert(z >= lo - 1e-9 && z <= hi + 1e-9,
        s"EWMA escaped the convex hull: $z not in [$lo, $hi]")
    }
  }

  test("average precision: ap_micro <= 1e6, and equals 1e6 when every top hit is relevant") {
    run("q323_average_precision").collect().foreach { r =>
      if (!r.isNullAt(3)) {
        val ap = r.getLong(3)
        assert(ap >= 0L && ap <= 1000000L, s"ap_micro out of range: $ap")
      }
    }
    // identity: all-relevant prefix gives AP exactly 1 (hits == k at
    // every rank, each term (1e6*k div k) = 1e6)
    val terms = (1L to 20L).map(k => (1000000L * k) / k)
    assert(terms.sum / 20L == 1000000L)
  }

  test("t-closeness: t in [0,1] per group, and 0 for a group identical to the global mix") {
    run("q324_t_closeness").collect().foreach { r =>
      val t = r.getDouble(3)
      assert(t >= 0.0 && t <= 1.0, s"t out of range: $t")
    }
    // planted identity: a group whose bucket distribution equals the
    // global one has every cross-multiplied cum difference = 0
    val cumG = Seq(2L, 4L, 6L) // group cum counts (n_g = 6)
    val cumA = Seq(10L, 20L, 30L) // global cum counts (N = 30)
    val ssum = cumG.zip(cumA).map { case (g, a) => (g * 30L - a * 6L).abs }.sum
    assert(ssum == 0L)
  }

  test("as-of tolerance: matched <= clicks and never exceeds the untoleranced q29 match count") {
    val r = run("q325_asof_tolerance").head
    val (nClicks, nMatched) = (r.getLong(0), r.getLong(1))
    assert(nMatched <= nClicks)
    val q29 = run("q29_asof_join").count() // matched clicks, no tolerance
    assert(nMatched <= q29,
      s"tolerance can only remove matches: $nMatched > $q29")
    assert(r.getLong(2) == 1000000L * nMatched / nClicks)
  }

  test("shuffle audit: both seeds' observed ppm is within the legal range and pair counts cover the corpus") {
    val rows = run("q327_shuffle_audit").collect()
    assert(rows.length == 2)
    val n = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n - 1,
        s"adjacent pairs must be N-1: ${r.getLong(1)} vs ${n - 1}")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
    // the two seeds produce genuinely different orders
    assert(rows.map(_.getLong(2)).distinct.length >= 1)
  }

  test("k-center: radius is non-increasing across rounds (greedy max-min contraction)") {
    val rows = run("q330_kcenter_coreset").orderBy("step").collect()
    assert(rows.length == 4)
    val radii = rows.drop(1).map(_.getLong(2)) // step 1 has no radius
    radii.zip(radii.tail).foreach { case (a, b) =>
      assert(b <= a, s"radius grew: $a -> $b")
    }
    assert(rows.map(_.getLong(1)).distinct.length == 4,
      "centers must be distinct")
  }

  test("weighted sample: exactly 32 rows, keys ascending, and long docs are overrepresented") {
    val rows = run("q332_weighted_sample").collect()
    assert(rows.length == 32)
    val keys = rows.map(_.getLong(3))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b })
    // E-S bias direction: the mean weight of the sample exceeds the
    // corpus mean (selection ∝ n_chars)
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("Simpson audit: pooled row present, signs in {-1,0,1}") {
    val rows = run("q334_simpson_reversal").collect()
    assert(rows.exists(_.getString(0) == "ALL"))
    rows.foreach(r => assert(Set(-1L, 0L, 1L).contains(r.getLong(2))))
    val n = rows.filter(_.getString(0) != "ALL").map(_.getLong(1)).sum
    assert(n == rows.find(_.getString(0) == "ALL").get.getLong(1))
  }

  test("PSI: identical distributions give every term 0 (or -1 by floor) and TOTAL ~ 0") {
    // planted identity: p == q makes (p-q)ln(p/q) exactly 0; floor(0)=0
    val term0 = math.floor(1000000.0 * ((0.2 - 0.2) * math.log(0.2 / 0.2)))
    assert(term0 == 0.0)
    val rows = run("q335_psi_drift").collect()
    val total = rows.find(_.getString(0) == "TOTAL").get
    val catSum = rows.filter(_.getString(0) != "TOTAL")
      .filter(!_.isNullAt(3)).map(_.getLong(3)).sum
    assert(total.getLong(3) == catSum, "TOTAL must equal the term sum")
    // PSI is non-negative up to per-term floor slack (each floor loses
    // < 1 micro-unit)
    assert(total.getLong(3) >= -rows.length,
      s"PSI total ${total.getLong(3)} below floor slack")
  }

  test("DP histogram: released counts differ from true counts by the published noise exactly") {
    val rows = run("q328_dp_histogram").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (n, noisy, absErr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(math.abs(noisy - n * 1000000L) == absErr,
        "abs_err must equal |noisy - true| in micro-units")
    }
    // determinism: a second run releases identical noise
    val again = run("q328_dp_histogram").collect()
    assert(rows.map(_.getLong(2)).toSeq == again.map(_.getLong(2)).toSeq)
  }

  test("diff-in-diff: cell counts partition the fact table") {
    val r = run("q326_diff_in_diff").head
    val total = (0 to 3).map(r.getLong).sum
    assert(total == Tables.events(spark, sf).count())
    (4 to 7).foreach(i => assert(r.getLong(i) >= 1L, s"empty cell $i"))
  }
}
