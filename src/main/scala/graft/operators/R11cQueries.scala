package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 5: the inferential completions — Kruskal-Wallis
  * (k-group rank test, extending q261's two-group Mann-Whitney), the
  * log-rank test (survival-curve comparison, the inferential complement
  * to q295's Kaplan-Meier ESTIMATE), Cramér's V (categorical
  * association), Cochran-Armitage (ordered-category trend in
  * proportions), TOST equivalence testing (the "provably NO difference"
  * claim fixed-horizon A/B can't make), A/A-test calibration of the
  * experiment platform itself, and the Poisson overdispersion check.
  *
  * Determinism: the library-wide rules (exact integer/decimal until one
  * pinned double block; per-term micro/pico floors before any
  * distributed double sum — a float SUM across rows is never allowed
  * because Spark's partial-aggregation order is nondeterministic).
  */
object R11cQueries {

  import Shared._

  /** Continuity-free normal z from exact operands (q347). */
  private val LogRankSql =
    """CASE WHEN v_micro <= 0 THEN NULL ELSE
       (CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1000000.0)
         / sqrt(CAST(v_micro AS DOUBLE) / 1000000.0) END"""

  /** Kruskal-Wallis H with tie correction (q346), from the exact
    * integer operands: term_sum = Σ_j floor(10⁶·R2j²/(4·nj·n·(n+1)))
    * with R2j = per-group sum of DOUBLED average ranks, so
    * term_sum/10⁶ = Σ_j Rj²/(nj·n·(n+1)) and
    * H = 12·term_sum/10⁶ − 3(n+1); tsum = Σ(t³−t) over value ties.
    * (The planted closed-form test in Round11cOpsSpec pins the 12 —
    * the oracle alone cannot, since both engines share this text.)
    */
  private val KwSql =
    """((12.0 * CAST(term_sum AS DOUBLE) / 1000000.0
        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
       / (1.0 - CAST(tsum AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(n AS DOUBLE))))"""

  /** Cramér's V from the micro-floored chi² and exact dims (q348). */
  private val CramersVSql =
    """sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
       / (CAST(n AS DOUBLE) * CAST(dmin AS DOUBLE)))"""

  /** Cochran-Armitage z² from exact DECIMAL operands (q349):
    * A = n·Σwc − C·Σwn (T·n), B = C·(n−C)·(n·Σw²n − (Σwn)²) (Var·n³)
    * → z² = A²·n/B.
    */
  private val CaSql =
    """CASE WHEN b = 0 THEN NULL ELSE
       (CAST(a AS DOUBLE) * CAST(a AS DOUBLE) * CAST(n AS DOUBLE)
        / CAST(b AS DOUBLE)) END"""

  /** Unpooled two-proportion TOST z at margin δ = 0.01 (q350); `sgn`
    * flips the margin sign between the two one-sided tests. The 95%
    * one-sided critical value 1.6448536269514722 is applied by the
    * caller as a pinned literal comparison.
    */
  private def tostZSql(sgn: String) =
    s"""((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) $sgn 0.01)
       / sqrt(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
            * (1.0 - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
            / CAST(na AS DOUBLE)
          + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
            * (1.0 - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
            / CAST(nb AS DOUBLE)))"""

  val all: Seq[QueryDef] = Seq(

    // ── KRUSKAL-WALLIS H (k-group rank test) ──────────────────────────────
    QueryDef(
      "q346_kruskal_wallis",
      // "Do the k event types draw their values from the same
      // distribution?" — the k-group extension of q261's Mann-Whitney,
      // on exact DOUBLED average ranks (2r is an integer even under
      // ties: 2·avgrank(v) = 2·|{u<v}| + cnt(v) + 1, the q317 backbone).
      // Per-group rank sums and the tie term Σ(t³−t) stay exact
      // DECIMAL(38,0); each group's H contribution floors to micro
      // BEFORE the k-row sum (a distributed double sum is never
      // order-safe), and H surfaces through one pinned block with the
      // standard tie correction.
      //
      // Shape, and why it scales: fact → (value, type) joint grain (one
      // hash agg, value-domain-bounded), value-grain prefix-sum ranks,
      // one k-row fold. No fact joins, no global row windows.
      (s, d) => Shared.withCheckpointDir(s) {
        val joint = Tables.events(s, d)
          .select(expr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"),
            col("event_type"))
          .groupBy("vc", "event_type").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val g = joint.groupBy("vc").agg(sum(col("cnt")).as("c"))
        val r2 = distributedPrefixSum(g, "vc", "c", 1L << 12)
          .select(col("vc"), (lit(2L) * col("cum") + col("c") + 1L).as("r2"))
        val grp = joint.join(r2, "vc")
          .groupBy("event_type")
          .agg(sum(col("cnt")).as("nj"),
            sum((col("cnt") * col("r2")).cast(DecimalType(38, 0)))
              .as("r2j"))
        val nT = grp.agg(sum(col("nj")).as("n"),
          count(lit(1)).as("k"))
        val ties = g.agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c"))
          .as("tsum_d"))
        grp.crossJoin(broadcast(nT))
          .select(col("n"), col("k"),
            expr("""CAST(floor(1000000.0 * CAST(r2j AS DOUBLE)
                * CAST(r2j AS DOUBLE)
                / (4.0 * CAST(nj AS DOUBLE) * CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) + 1.0))) AS BIGINT)""").as("term"))
          .groupBy("n", "k").agg(sum(col("term")).as("term_sum"))
          .crossJoin(broadcast(ties))
          .select(col("n"), col("k"), col("term_sum"),
            expr("CAST(tsum_d AS BIGINT)").as("tsum"))
          .select(col("n"), col("k"), col("term_sum"), col("tsum"),
            expr(KwSql).as("h"))
      },
      Some(s"""WITH joint AS (SELECT
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
                  event_type, count(*) AS cnt
                FROM events GROUP BY 1, 2),
              g AS (SELECT vc, sum(cnt) AS c FROM joint GROUP BY 1),
              r AS (SELECT vc, 2 * coalesce(sum(c) OVER (ORDER BY vc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + c + 1 AS r2 FROM g),
              grp AS (SELECT event_type, sum(cnt) AS nj,
                  sum(cnt * r2) AS r2j
                FROM joint JOIN r USING (vc) GROUP BY 1),
              nt AS (SELECT sum(nj) AS n, count(*) AS k FROM grp),
              terms AS (SELECT CAST(floor(1000000.0 * CAST(r2j AS DOUBLE)
                    * CAST(r2j AS DOUBLE)
                    / (4.0 * CAST(nj AS DOUBLE) * CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) + 1.0))) AS BIGINT) AS term
                FROM grp, nt),
              ts AS (SELECT CAST(sum(term) AS BIGINT) AS term_sum
                FROM terms),
              ties AS (SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tsum
                FROM g),
              m AS (SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
                  term_sum, tsum
                FROM nt, ts, ties)
              SELECT n, k, term_sum, tsum, $KwSql AS h FROM m"""),
      headline = true
    ),

    // ── LOG-RANK TEST (survival-curve comparison) ─────────────────────────
    QueryDef(
      "q347_logrank",
      // The inferential complement to q295's Kaplan-Meier ESTIMATE: do
      // the two user cohorts (user_id parity) convert at the same rate
      // over time? Event = first purchase day per user; users who never
      // purchase are censored at the observation end and simply remain
      // in the at-risk sets. Per death-day: observed deaths O₁ exact;
      // the hypergeometric expectation and variance terms floor to
      // micro BEFORE their day sums; z = (O₁ − E₁)/√V is the one pinned
      // block.
      //
      // Shape, and why it scales: facts fold to user grain (first
      // purchase), then to the calendar-bounded (day × cohort) grain; at
      // -risk counts are prefix sums over a partitioned day window.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        // user grain checkpoints (bounded by |users| ≪ fact): consumed
        // by the cohort totals AND the death-day grain
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase",
            expr(s"ts div ${dayNs}L"))).as("t_death"))
          .withColumn("grp", (col("user_id") % 2).cast("long"))
          .checkpoint()
        val ug = users.groupBy("grp").agg(count(lit(1)).as("u"))
        val deaths = users.filter(col("t_death").isNotNull)
          .groupBy(col("grp"), col("t_death").as("day"))
          .agg(count(lit(1)).as("dg"))
          .checkpoint() // day×cohort grain, 3 consumers
        // day-grain pivot to the two cohorts; at-risk before day t is
        // Ug − deaths strictly before t (censoring happens only at the
        // observation end, so censored users stay at risk for every
        // death day) — computed by ONE prefix pass over the union grid,
        // which also covers days where a cohort has no death of its own
        val dayGrid = deaths.select("day").distinct()
        val g0 = deaths.filter(col("grp") === 0)
          .select(col("day"), col("dg").as("d1"))
        val g1 = deaths.filter(col("grp") === 1)
          .select(col("day"), col("dg").as("d2"))
        val u0 = ug.filter(col("grp") === 0).select(col("u").as("u1"))
        val u1 = ug.filter(col("grp") === 1).select(col("u").as("u2"))
        val allDays = dayGrid
          .join(g0, Seq("day"), "left").join(g1, Seq("day"), "left")
          .crossJoin(broadcast(u0)).crossJoin(broadcast(u1))
        val w1 = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val filled = allDays
          .withColumn("d1z", coalesce(col("d1"), lit(0L)))
          .withColumn("d2z", coalesce(col("d2"), lit(0L)))
          .withColumn("n1", col("u1")
            - coalesce(sum(col("d1z")).over(w1), lit(0L)))
          .withColumn("n2", col("u2")
            - coalesce(sum(col("d2z")).over(w1), lit(0L)))
          .withColumn("dt", col("d1z") + col("d2z"))
          .withColumn("nt", col("n1") + col("n2"))
          .filter(col("dt") > 0 && col("nt") > 1)
        filled
          .withColumn("e1t", expr(
            """CAST(floor(1000000.0 * CAST(dt AS DOUBLE)
                * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT)"""))
          .withColumn("vt", expr(
            """CAST(floor(1000000.0 * CAST(dt AS DOUBLE)
                * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)
                * CAST(n2 AS DOUBLE) / CAST(nt AS DOUBLE)
                * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                / (CAST(nt AS DOUBLE) - 1.0)) AS BIGINT)"""))
          .agg(sum(col("d1z")).as("o1"), sum(col("e1t")).as("e1_micro"),
            sum(col("vt")).as("v_micro"))
          .select(col("o1"), col("e1_micro"), col("v_micro"),
            expr(LogRankSql).as("z_logrank"))
      },
      Some(s"""WITH ev AS (SELECT user_id, event_type,
                  epoch_us(ts) // 86400000000 AS day FROM events),
              users AS (SELECT user_id,
                  min(CASE WHEN event_type = 'purchase' THEN day END)
                    AS t_death,
                  CAST(user_id % 2 AS BIGINT) AS grp
                FROM ev GROUP BY user_id),
              ug AS (SELECT grp, count(*) AS u FROM users GROUP BY 1),
              deaths AS (SELECT grp, t_death AS day, count(*) AS dg
                FROM users WHERE t_death IS NOT NULL GROUP BY 1, 2),
              grid AS (SELECT DISTINCT day FROM deaths),
              filled AS (SELECT g.day,
                  coalesce(d0.dg, 0) AS d1z, coalesce(d1.dg, 0) AS d2z,
                  (SELECT u FROM ug WHERE grp = 0)
                    - coalesce((SELECT sum(dg) FROM deaths dd
                        WHERE dd.grp = 0 AND dd.day < g.day), 0) AS n1,
                  (SELECT u FROM ug WHERE grp = 1)
                    - coalesce((SELECT sum(dg) FROM deaths dd
                        WHERE dd.grp = 1 AND dd.day < g.day), 0) AS n2
                FROM grid g
                LEFT JOIN deaths d0 ON d0.day = g.day AND d0.grp = 0
                LEFT JOIN deaths d1 ON d1.day = g.day AND d1.grp = 1),
              t AS (SELECT d1z, d2z, n1, n2,
                  d1z + d2z AS dt, n1 + n2 AS nt FROM filled
                WHERE d1z + d2z > 0 AND n1 + n2 > 1),
              terms AS (SELECT d1z,
                  CAST(floor(1000000.0 * CAST(dt AS DOUBLE)
                    * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT)
                    AS e1t,
                  CAST(floor(1000000.0 * CAST(dt AS DOUBLE)
                    * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)
                    * CAST(n2 AS DOUBLE) / CAST(nt AS DOUBLE)
                    * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                    / (CAST(nt AS DOUBLE) - 1.0)) AS BIGINT) AS vt
                FROM t),
              m AS (SELECT CAST(sum(d1z) AS BIGINT) AS o1,
                  CAST(sum(e1t) AS BIGINT) AS e1_micro,
                  CAST(sum(vt) AS BIGINT) AS v_micro
                FROM terms)
              SELECT o1, e1_micro, v_micro, $LogRankSql AS z_logrank
              FROM m"""),
      headline = true
    ),

    // ── CRAMÉR'S V (categorical association strength) ─────────────────────
    QueryDef(
      "q348_cramers_v",
      // "ARE nation and market segment associated, and how strongly?" —
      // the normalized effect size the raw chi² (q244's readout) can't
      // give. Full r×c grid INCLUDING zero cells (a zero cell still
      // contributes its expectation); per-cell term
      // (o·n − rt·ct)²/(n·rt·ct) floors to micro before the exact sum;
      // V = √(χ²/(n·min(r−1, c−1))) is the one pinned block.
      //
      // Shape, and why it scales: one dim pass to cells + two marginal
      // folds; the grid is value-bounded (25 × 5) and built by a
      // broadcast marginal×marginal join — never a fact join.
      (s, d) => Shared.withCheckpointDir(s) {
        val cells = Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("nat"),
            col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("o"))
          .checkpoint()
        val rt = cells.groupBy("nat").agg(sum(col("o")).as("rt"))
        val ct = cells.groupBy("seg").agg(sum(col("o")).as("ct"))
        val nn = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("nat")).as("r"),
          countDistinct(col("seg")).as("c"))
        val grid = rt.crossJoin(broadcast(ct))
          .join(cells, Seq("nat", "seg"), "left")
          .withColumn("oz", coalesce(col("o"), lit(0L)))
          .crossJoin(broadcast(nn))
          .withColumn("term", expr(
            """CAST(floor(1000000.0
                * (CAST(oz AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                * (CAST(oz AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)
                  * CAST(ct AS DOUBLE))) AS BIGINT)"""))
        grid.groupBy("n", "r", "c")
          .agg(sum(col("term")).as("chi2_micro"))
          .withColumn("dmin", least(col("r") - 1, col("c") - 1))
          .select(col("n"), col("r"), col("c"), col("chi2_micro"),
            expr(CramersVSql).as("cramers_v"))
      },
      Some(s"""WITH cells AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
                  count(*) AS o FROM customer GROUP BY 1, 2),
              rt AS (SELECT nat, sum(o) AS rt FROM cells GROUP BY 1),
              ct AS (SELECT seg, sum(o) AS ct FROM cells GROUP BY 1),
              nn AS (SELECT sum(o) AS n, count(DISTINCT nat) AS r,
                  count(DISTINCT seg) AS c FROM cells),
              grid AS (SELECT rt.nat, ct.seg, rt.rt, ct.ct,
                  coalesce(o, 0) AS oz
                FROM rt CROSS JOIN ct
                LEFT JOIN cells ON cells.nat = rt.nat
                  AND cells.seg = ct.seg),
              terms AS (SELECT CAST(floor(1000000.0
                    * (CAST(oz AS DOUBLE) * CAST(n AS DOUBLE)
                      - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                    * (CAST(oz AS DOUBLE) * CAST(n AS DOUBLE)
                      - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)
                      * CAST(ct AS DOUBLE))) AS BIGINT) AS term
                FROM grid, nn),
              m AS (SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
                  CAST(c AS BIGINT) AS c,
                  (SELECT CAST(sum(term) AS BIGINT) FROM terms)
                    AS chi2_micro,
                  CAST(least(r - 1, c - 1) AS BIGINT) AS dmin
                FROM nn)
              SELECT n, r, c, chi2_micro, $CramersVSql AS cramers_v
              FROM m""")
    ),

    // ── COCHRAN-ARMITAGE TREND TEST (ordered proportions) ─────────────────
    QueryDef(
      "q349_cochran_armitage",
      // "Does the fully-shipped rate TREND across the ordered priority
      // classes?" — the ordered-category test a flat chi² wastes power
      // on. Scores w = the priority's leading digit (1..5); the
      // statistic z² = A²·n/B with A = n·Σwc − C·Σwn and
      // B = C(n−C)(n·Σw²n − (Σwn)²) — BOTH exact DECIMAL(38,0) — is one
      // pinned block at the end.
      //
      // Shape, and why it scales: one fact pass to the 5-row category
      // grain; everything after is model-sized arithmetic.
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("w"),
            (col("o_orderstatus") === "F").cast("long").as("y"))
          .groupBy("w")
          .agg(count(lit(1)).as("ni"), sum(col("y")).as("ci"))
        g.agg(sum(col("ni")).as("n"), sum(col("ci")).as("cc"),
            sum(col("w") * col("ci")).as("swc"),
            sum(col("w") * col("ni")).as("swn"),
            sum(col("w") * col("w") * col("ni")).as("sw2n"))
          .select(col("n"), col("cc"),
            expr("""CAST(n AS DECIMAL(38,0)) * swc
                - CAST(cc AS DECIMAL(38,0)) * swn""").as("a_d"),
            expr("""CAST(cc AS DECIMAL(38,0)) * (n - cc)
                * (CAST(n AS DECIMAL(38,0)) * sw2n
                  - CAST(swn AS DECIMAL(38,0)) * swn)""").as("b_d"))
          .select(col("n"), col("cc"),
            expr("CAST(a_d AS BIGINT)").as("a"),
            expr("CAST(b_d AS DECIMAL(38,0))").as("b"))
          .select(col("n"), col("cc"), col("a"),
            expr(CaSql).as("z2_ca"))
      },
      Some(s"""WITH g AS (SELECT
                  CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
                  count(*) AS ni,
                  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ci
                FROM orders GROUP BY 1),
              m AS (SELECT CAST(sum(ni) AS BIGINT) AS n,
                  CAST(sum(ci) AS BIGINT) AS cc,
                  CAST(sum(w * ci) AS BIGINT) AS swc,
                  CAST(sum(w * ni) AS BIGINT) AS swn,
                  CAST(sum(w * w * ni) AS BIGINT) AS sw2n
                FROM g),
              ab AS (SELECT n, cc,
                  CAST(CAST(n AS DECIMAL(38,0)) * swc
                    - CAST(cc AS DECIMAL(38,0)) * swn AS BIGINT) AS a,
                  CAST(cc AS DECIMAL(38,0)) * (n - cc)
                    * (CAST(n AS DECIMAL(38,0)) * sw2n
                      - CAST(swn AS DECIMAL(38,0)) * swn) AS b
                FROM m)
              SELECT n, cc, a, $CaSql AS z2_ca FROM ab""")
    ),

    // ── TOST EQUIVALENCE TEST ─────────────────────────────────────────────
    QueryDef(
      "q350_tost_equivalence",
      // The claim q244's significance test can NEVER make: "these two
      // arms are provably the SAME to within ±1pp" — the launch-safety
      // criterion for refactors and infra migrations. Two one-sided
      // unpooled z-tests at the ±0.01 margin; equivalence requires BOTH
      // z₁ ≥ 1.645 and z₂ ≤ −1.645 (the pinned one-sided 95% critical
      // value). Counts exact; both z's are the same pinned block with
      // the margin sign flipped.
      //
      // Shape, and why it scales: one fact pass to the (type × arm)
      // sums; model-sized arithmetic after.
      (s, d) => {
        val arm = (col("user_id") % 2 === 0).cast("long")
        val conv = (col("value") >= 50.0).cast("long")
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(sum(arm).as("na"), sum(arm * conv).as("ca"),
            sum(lit(1L) - arm).as("nb"),
            sum((lit(1L) - arm) * conv).as("cb"))
          .withColumn("z_lo", expr(tostZSql("+")))
          .withColumn("z_hi", expr(tostZSql("-")))
          .withColumn("equivalent",
            (col("z_lo") >= 1.6448536269514722 &&
              col("z_hi") <= -1.6448536269514722).cast("long"))
          .orderBy("event_type")
      },
      Some(s"""WITH g AS (SELECT event_type,
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
                  CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= 50.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
                  CAST(sum(CASE WHEN user_id % 2 = 1 AND value >= 50.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS cb
                FROM events GROUP BY 1),
              z AS (SELECT *, ${tostZSql("+")} AS z_lo,
                  ${tostZSql("-")} AS z_hi
                FROM g)
              SELECT event_type, na, ca, nb, cb, z_lo, z_hi,
                CAST(z_lo >= 1.6448536269514722
                  AND z_hi <= -1.6448536269514722 AS BIGINT) AS equivalent
              FROM z ORDER BY event_type""")
    ),

    // ── A/A CALIBRATION (experiment-platform health) ──────────────────────
    QueryDef(
      "q351_aa_calibration",
      // The test of the TESTING SYSTEM: 16 seeded null splits (A/A) per
      // event type; a healthy platform rejects ≈5% of them at the χ²₁
      // 95% cut (micro literal 3841459). Splits derive from the shared
      // 32-bit md5 family, so assignment is deterministic cross-engine;
      // z² reuses the q337 pooled formula (exact Δ, one pinned block,
      // micro-floored); exceedance COUNTING is pure integers.
      //
      // Shape, and why it scales: fact → user×type grain FIRST (the
      // 16-way seed explode multiplies the small user grain, never the
      // fact), then one hash agg to 16×k cells.
      (s, d) => Shared.withCheckpointDir(s) {
        val ug = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("evs"),
            sum((col("value") >= 50.0).cast("long")).as("convs"))
          .checkpoint()
        val seeded = ug.select(col("user_id"), col("event_type"),
            col("evs"), col("convs"),
            explode(array((0 until 16).map(i => lit(i.toLong)): _*))
              .as("seed"))
          .withColumn("arm",
            h32(concat(lit("aa"), col("seed"), lit("-"), col("user_id")))
              % 2)
        val cells = seeded.groupBy("seed", "event_type")
          .agg(sum(when(col("arm") === 0, col("evs")).otherwise(0L))
            .as("na"),
            sum(when(col("arm") === 0, col("convs")).otherwise(0L))
              .as("ca"),
            sum(when(col("arm") === 1, col("evs")).otherwise(0L))
              .as("nb"),
            sum(when(col("arm") === 1, col("convs")).otherwise(0L))
              .as("cb"))
          .withColumn("dlt", expr(
            """CAST(ca AS DECIMAL(38,0)) * nb
               - CAST(cb AS DECIMAL(38,0)) * na"""))
          .withColumn("z2_micro", expr(R11bQueries.Z2Sql))
        cells.groupBy("seed")
          .agg(count(lit(1)).as("n_tests"),
            sum((col("z2_micro") >= 3841459L).cast("long")).as("n_sig"))
          .orderBy("seed")
      },
      Some(s"""WITH ug AS (SELECT user_id, event_type, count(*) AS evs,
                  sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS convs
                FROM events GROUP BY 1, 2),
              seeded AS (SELECT user_id, event_type, evs, convs, seed,
                  ${SQL_H32("'aa' || seed || '-' || user_id")} % 2 AS arm
                FROM ug CROSS JOIN (SELECT unnest(range(0, 16)) AS seed)),
              cells AS (SELECT seed, event_type,
                  CAST(sum(CASE WHEN arm = 0 THEN evs ELSE 0 END)
                    AS BIGINT) AS na,
                  CAST(sum(CASE WHEN arm = 0 THEN convs ELSE 0 END)
                    AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN arm = 1 THEN evs ELSE 0 END)
                    AS BIGINT) AS nb,
                  CAST(sum(CASE WHEN arm = 1 THEN convs ELSE 0 END)
                    AS BIGINT) AS cb
                FROM seeded GROUP BY 1, 2),
              z AS (SELECT seed,
                  CAST(ca AS DECIMAL(38,0)) * nb
                    - CAST(cb AS DECIMAL(38,0)) * na AS dlt,
                  na, ca, nb, cb
                FROM cells),
              z2 AS (SELECT seed, ${R11bQueries.Z2Sql} AS z2_micro FROM z)
              SELECT CAST(seed AS BIGINT) AS seed,
                CAST(count(*) AS BIGINT) AS n_tests,
                CAST(sum(CASE WHEN z2_micro >= 3841459 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_sig
              FROM z2 GROUP BY 1 ORDER BY 1"""),
      headline = true
    ),

    // ── POISSON OVERDISPERSION CHECK ──────────────────────────────────────
    QueryDef(
      "q352_overdispersion",
      // Before any Poisson-assuming alert threshold (q206/q222/q298)
      // can be trusted: IS daily traffic Poisson? The dispersion
      // statistic D = Σ(x−x̄)²/x̄ = (n·Σx² − (Σx)²)/Σx and the Fano
      // factor D/(n−1) — both EXACT integer rationals surfaced in
      // milli-units via integer division. No doubles anywhere.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // (day × type) grain, one fold per type.
      (s, d) => {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        Tables.events(s, d)
          .groupBy(col("event_type"), expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n_days"), col("sx"),
            expr("(1000 * (n_days * sxx - sx * sx)) div sx").as("d_milli"),
            expr("((1000 * (n_days * sxx - sx * sx)) div sx) div (n_days - 1)")
              .as("fano_milli"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day, count(*) AS x
                FROM events GROUP BY 1, 2),
              g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(x * x) AS BIGINT) AS sxx
                FROM daily GROUP BY 1)
              SELECT event_type, n_days, sx,
                CAST((1000 * (n_days * sxx - sx * sx)) // sx AS BIGINT)
                  AS d_milli,
                CAST(((1000 * (n_days * sxx - sx * sx)) // sx)
                  // (n_days - 1) AS BIGINT) AS fano_milli
              FROM g ORDER BY event_type""")
    )
  )
}
