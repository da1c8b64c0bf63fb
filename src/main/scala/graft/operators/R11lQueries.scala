package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 14: time-series, distributional and causal
  * completions — the partial autocorrelation function (the AR-order
  * picker next to q358's ACF and q379's Ljung-Box), the two-sample
  * energy distance computed entirely from prefix sums (no pairwise
  * pass, no doubles until the final division), the Nelson-Aalen
  * cumulative hazard (the additive — and here fully INTEGER —
  * companion to q295's Kaplan-Meier), the instrumental-variable Wald
  * estimator (the causal family's answer to non-compliance), quantile
  * treatment effects at the deciles (the distributional view q396's
  * single ATE averages away), and the contamination-safe cluster-aware
  * train/test split (the near-dup-leakage fix every LLM data pipeline
  * needs — naive doc-level splits leak winnow pairs across the
  * boundary; splitting by component leaks exactly zero).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) products over
  * value grains, packed-key prefix ranks with raise_error bounds
  * guards, integer hazards via (10⁹·d) div n, seeded md5 splits, one
  * pinned double block per statistic.
  */
object R11lQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── PARTIAL AUTOCORRELATION (lags 1–3) ────────────────────────────────
    QueryDef(
      "q397_pacf",
      // The AR-order diagnostic: PACF at lags 1–3 of the daily event
      // counts, via Cramer's rule on the Toeplitz Yule-Walker systems —
      // φ₁ = r₁, φ₂ = (r₂−r₁²)/(1−r₁²), φ₃ = det(A₃)/det(R₃) expanded
      // in closed form. The r_k ride q358's exact n²-scaled
      // DECIMAL(38,0) moments; each φ is one pinned double block with
      // shared expression text.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); 3 keyed lag joins; a 3-column pivot
      // collapses to 1 row before any double math.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val nS = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val den = daily.crossJoin(broadcast(nS))
          .agg(sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
              * (n * x - sx)""")).as("den"))
        val lags = daily.select(col("day"), col("x"),
          explode(array((1 to 3).map(i => lit(i.toLong)): _*)).as("k"))
        val j = daily.select(col("day").as("dayj"), col("x").as("xj"))
        val nums = lags.withColumn("dayk", col("day") + col("k"))
          .join(j, col("dayk") === col("dayj"))
          .crossJoin(broadcast(nS))
          .groupBy("k")
          .agg(sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
              * (n * xj - sx)""")).as("num"))
          .agg(sum(when(col("k") === 1L, col("num"))).as("num1"),
            sum(when(col("k") === 2L, col("num"))).as("num2"),
            sum(when(col("k") === 3L, col("num"))).as("num3"))
        nums.crossJoin(broadcast(den)).crossJoin(broadcast(nS))
          .withColumn("r1",
            expr("CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE)"))
          .withColumn("r2",
            expr("CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE)"))
          .withColumn("r3",
            expr("CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE)"))
          .select(col("n").as("n_days"), col("r1").as("pacf1"),
            expr("(r2 - r1 * r1) / (1.0 - r1 * r1)").as("pacf2"),
            expr("""(r3 - 2.0 * r1 * r2 - r1 * r1 * r3
                + r1 * r2 * r2 + r1 * r1 * r1)
              / (1.0 - 2.0 * r1 * r1 + 2.0 * r1 * r1 * r2 - r2 * r2)""")
              .as("pacf3"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              ns AS (SELECT count(*) AS n, sum(x) AS sx FROM daily),
              den AS (SELECT sum(CAST(n * x - sx AS DECIMAL(38,0))
                    * (n * x - sx)) AS den
                FROM daily, ns),
              lags AS (SELECT k FROM (SELECT unnest(range(1, 4)) AS k)),
              pairs AS (SELECT k,
                  sum(CAST(n * a.x - sx AS DECIMAL(38,0))
                    * (n * b.x - sx)) AS num
                FROM daily a
                JOIN lags ON true
                JOIN daily b ON b.day = a.day + k, ns
                GROUP BY 1),
              piv AS (SELECT
                  sum(CASE WHEN k = 1 THEN num END) AS num1,
                  sum(CASE WHEN k = 2 THEN num END) AS num2,
                  sum(CASE WHEN k = 3 THEN num END) AS num3
                FROM pairs),
              r AS (SELECT
                  CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
                  CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
                  CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
                FROM piv, den)
              SELECT (SELECT CAST(n AS BIGINT) FROM ns) AS n_days,
                r1 AS pacf1,
                (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2,
                (r3 - 2.0 * r1 * r2 - r1 * r1 * r3
                    + r1 * r2 * r2 + r1 * r1 * r1)
                  / (1.0 - 2.0 * r1 * r1 + 2.0 * r1 * r1 * r2 - r2 * r2)
                  AS pacf3
              FROM r""")
    ),

    // ── TWO-SAMPLE ENERGY DISTANCE ────────────────────────────────────────
    QueryDef(
      "q398_energy_distance",
      // Székely's energy distance between the user-split arms' event
      // values: E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — sensitive to ANY
      // distributional difference, not just location. NEVER a pairwise
      // pass: on the pooled value grain, Σ|x−y| masses decompose into
      // c·(v·C<(v) − S<(v)) prefix products, so FOUR prefix sums over
      // one checkpointed grain (counts and value-sums per arm) give all
      // three pair sums as exact DECIMAL(38,0); E is one pinned block.
      //
      // Shape, and why it scales: one fact pass to the value-bounded
      // grain; four grain-sized prefix rounds; a 1-row totals
      // broadcast; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val vg = Tables.events(s, d)
          .select((col("user_id") % 2L).as("arm"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("cents")
          .agg(sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("c0"))
          .withColumn("v0", col("c0") * col("cents"))
          .withColumn("v1", col("c1") * col("cents"))
          .checkpoint()
        val tot = vg.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
        val pre = Seq(("c0", "cc0"), ("v0", "cs0"), ("c1", "cc1"),
          ("v1", "cs1")).foldLeft(vg) { case (df, (v, out)) =>
          Shared.distributedPrefixSum(df, "cents", v)
            .withColumnRenamed("cum", out)
        }
        pre.crossJoin(broadcast(tot))
          .agg(max(col("n1")).as("n1"), max(col("n0")).as("n0"),
            sum(expr("""CAST(c1 AS DECIMAL(38,0)) * (cents * cc0 - cs0)
              + CAST(c0 AS DECIMAL(38,0)) * (cents * cc1 - cs1)"""))
              .as("sab"),
            sum(expr("CAST(c1 AS DECIMAL(38,0)) * (cents * cc1 - cs1)"))
              .as("s11"),
            sum(expr("CAST(c0 AS DECIMAL(38,0)) * (cents * cc0 - cs0)"))
              .as("s00"))
          .select(col("n1"), col("n0"),
            expr("""2.0 * CAST(sab AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
              - 2.0 * CAST(s11 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
              - 2.0 * CAST(s00 AS DOUBLE)
                / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))""")
              .as("energy_dist_cents"))
      },
      Some("""WITH ev AS (SELECT user_id % 2 AS arm,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
                FROM events),
              vg AS (SELECT cents,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS c1,
                  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS c0
                FROM ev GROUP BY 1),
              tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                  CAST(sum(c0) AS BIGINT) AS n0 FROM vg),
              cum AS (SELECT cents, c1, c0,
                  CAST(coalesce(sum(c0) OVER w, 0) AS BIGINT) AS cc0,
                  CAST(coalesce(sum(c0 * cents) OVER w, 0) AS BIGINT)
                    AS cs0,
                  CAST(coalesce(sum(c1) OVER w, 0) AS BIGINT) AS cc1,
                  CAST(coalesce(sum(c1 * cents) OVER w, 0) AS BIGINT)
                    AS cs1
                FROM vg
                WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING)),
              f AS (SELECT n1, n0,
                  sum(CAST(c1 AS DECIMAL(38,0)) * (cents * cc0 - cs0)
                    + CAST(c0 AS DECIMAL(38,0)) * (cents * cc1 - cs1))
                    AS sab,
                  sum(CAST(c1 AS DECIMAL(38,0)) * (cents * cc1 - cs1))
                    AS s11,
                  sum(CAST(c0 AS DECIMAL(38,0)) * (cents * cc0 - cs0))
                    AS s00
                FROM cum, tot GROUP BY 1, 2)
              SELECT n1, n0,
                2.0 * CAST(sab AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
                  - 2.0 * CAST(s11 AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
                  - 2.0 * CAST(s00 AS DOUBLE)
                    / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
                  AS energy_dist_cents
              FROM f""")
    ),

    // ── NELSON-AALEN CUMULATIVE HAZARD ────────────────────────────────────
    QueryDef(
      "q399_nelson_aalen",
      // The additive survival estimator beside q295's multiplicative
      // Kaplan-Meier — and unlike KM it is FULLY INTEGER here: the
      // per-time hazard d/n becomes (10⁹·d) div n (an exact truncating
      // division), the cumulative hazard is a prefix sum of those nano
      // integers, and Breslow's variance Σd/n² rides the same pass at
      // atto scale. Same censoring contract as q295 (horizon-touching
      // users are censored).
      //
      // Shape, and why it scales: one fact pass to the user grain, one
      // to the time-bounded lifetime grain; risk sets AND both
      // cumulatives via [[Shared.distributedPrefixSum]] — no global
      // window, no fold. Output is one row per distinct lifetime.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val life = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
          .groupBy("user_id")
          .agg(min(col("day")).as("first"), max(col("day")).as("last"))
        val hmax = life.agg(max(col("last"))).head.getLong(0)
        val grain = life
          .select((col("last") - col("first")).as("t"),
            (col("last") === hmax).cast("long").as("cens"))
          .groupBy("t").agg(
            sum(lit(1L) - col("cens")).as("d"),
            sum(col("cens")).as("c"))
          .withColumn("tot", col("d") + col("c"))
          .checkpoint()
        val n = grain.agg(sum(col("tot"))).head.getLong(0)
        val risky = Shared.distributedPrefixSum(grain, "t", "tot")
          .withColumn("n_at_risk", lit(n) - col("cum"))
          // DECIMAL(38,0) intermediates: 10¹⁸·d overflows BIGINT once
          // d ≥ 10 — the quotient always fits (d ≤ n_at_risk)
          .withColumn("hz_nano", expr(
            """CAST(CAST(1000000000 AS DECIMAL(38,0)) * d
              div n_at_risk AS BIGINT)"""))
          .withColumn("vz_atto", expr(
            """CAST(CAST(1000000000000000000 AS DECIMAL(38,0)) * d
              div (n_at_risk * n_at_risk) AS BIGINT)"""))
          .drop("cum")
          .checkpoint()
        val h = Shared.distributedPrefixSum(risky, "t", "hz_nano")
          .withColumnRenamed("cum", "hc")
        val hv = Shared.distributedPrefixSum(h, "t", "vz_atto")
          .withColumnRenamed("cum", "vc")
        hv.select(col("t"), col("n_at_risk"), col("d").as("n_events"),
            col("c").as("n_censored"),
            expr("CAST(hc + hz_nano AS DOUBLE) / 1e9").as("cum_hazard"),
            expr("CAST(vc + vz_atto AS DOUBLE) / 1e18").as("var_hazard"))
          .orderBy("t")
      },
      Some("""WITH life AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
                FROM events GROUP BY 1),
              hm AS (SELECT max(l) AS hmax FROM life),
              grain AS (SELECT l - f AS t,
                  sum(CASE WHEN l = hmax THEN 0 ELSE 1 END) AS d,
                  sum(CASE WHEN l = hmax THEN 1 ELSE 0 END) AS c
                FROM life CROSS JOIN hm GROUP BY 1),
              tot AS (SELECT sum(d + c) AS n FROM grain),
              pre AS (SELECT t, d, c,
                  n - coalesce(sum(d + c) OVER (ORDER BY t ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
                FROM grain CROSS JOIN tot),
              hz AS (SELECT t, d, c, n_at_risk,
                  CAST((CAST(1000000000 AS HUGEINT) * d) // n_at_risk
                    AS BIGINT) AS hz_nano,
                  CAST((CAST(1000000000000000000 AS HUGEINT) * d)
                    // (n_at_risk * n_at_risk) AS BIGINT) AS vz_atto
                FROM pre)
              SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
                CAST(d AS BIGINT) AS n_events,
                CAST(c AS BIGINT) AS n_censored,
                CAST(sum(hz_nano) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9
                  AS cum_hazard,
                CAST(sum(vz_atto) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e18
                  AS var_hazard
              FROM hz ORDER BY t""")
    ),

    // ── INSTRUMENTAL-VARIABLE WALD ESTIMATOR ──────────────────────────────
    QueryDef(
      "q400_iv_wald",
      // The causal family's non-compliance answer (q326 DiD, q303
      // CUPED, q373 CEM, q396 ANCOVA): with customer-key parity as the
      // instrument, LATE = ITT / first-stage — the Wald ratio of two
      // exact conditional-mean differences. Every mean is sum/count on
      // exact cents; the ratio is one pinned block. The first-stage
      // difference doubles as the instrument-strength report.
      //
      // Shape, and why it scales: one orders⋈customer keyed join, one
      // conditional aggregation to 1 row.
      (s, d) => {
        Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey")), "o_custkey")
          .select((col("o_custkey") % 2L).as("z"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("long").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("y"))
          .agg(sum(when(col("z") === 1L, 1L).otherwise(0L)).as("n1"),
            sum(when(col("z") === 0L, 1L).otherwise(0L)).as("n0"),
            sum(when(col("z") === 1L, col("t")).otherwise(0L)).as("t1"),
            sum(when(col("z") === 0L, col("t")).otherwise(0L)).as("t0"),
            sum(when(col("z") === 1L, col("y")).otherwise(0L)).as("y1"),
            sum(when(col("z") === 0L, col("y")).otherwise(0L)).as("y0"))
          .select(col("n1"), col("n0"),
            expr("""CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE)""")
              .as("first_stage"),
            expr("""CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE)""").as("itt_cents"))
          .withColumn("late_cents",
            expr("itt_cents / nullif(first_stage, 0.0)"))
      },
      Some("""WITH base AS (SELECT o_custkey % 2 AS z,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS y
                FROM orders JOIN customer ON o_custkey = c_custkey),
              f AS (SELECT
                  CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1,
                  CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n0,
                  CAST(sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS BIGINT)
                    AS t1,
                  CAST(sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS BIGINT)
                    AS t0,
                  CAST(sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT)
                    AS y1,
                  CAST(sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT)
                    AS y0
                FROM base),
              r AS (SELECT n1, n0,
                  CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                    AS first_stage,
                  CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS itt_cents
                FROM f)
              SELECT n1, n0, first_stage, itt_cents,
                itt_cents / nullif(first_stage, 0.0) AS late_cents
              FROM r""")
    ),

    // ── QUANTILE TREATMENT EFFECTS AT THE DECILES ─────────────────────────
    QueryDef(
      "q401_qte_deciles",
      // The distributional view q396's single ATE averages away: the
      // urgent-vs-other order-value difference at each decile. Both
      // arms' EXACT order statistics come from ONE packed-key prefix
      // sum (arm·2⁶² + cents·2³⁰ + orderkey — arms contiguous, bounds
      // raise_error-guarded); decile-midpoint ranks probe by plain rank
      // equality (ranks are dense 1..n_g per arm), and the arm pivot
      // collapses to 10 rows.
      //
      // Shape, and why it scales: one fact pass; one prefix-sum round;
      // a 20-row broadcast target probe; output is 10 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("long").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"),
            col("o_orderkey"))
          .withColumn("key",
            when(col("cents") < 0L || col("cents") >= lit(1L << 31) ||
              col("o_orderkey") < 0L ||
              col("o_orderkey") >= lit(1L << 30),
              raise_error(concat(lit("q401: packed-key bounds contract " +
                "violated for orderkey "), col("o_orderkey"))))
              .otherwise(col("t") * lit(1L << 62) +
                col("cents") * lit(1L << 30) + col("o_orderkey")))
          .withColumn("one", lit(1L))
          .checkpoint()
        val wArm = Window.orderBy("t")
        val arms = base.groupBy("t").agg(count(lit(1)).as("ng"))
          .withColumn("coff",
            coalesce(sum(col("ng")).over(
              wArm.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val targets = arms.crossJoin(
            broadcast(base.sparkSession.range(0, 10)
              .select(col("id").as("decile"))))
          .select(col("t").as("tt"), col("decile"),
            expr("""((decile * 100000L + 50000L) * ng) div 1000000L + 1L""")
              .as("tr"))
        val ranked = Shared.distributedPrefixSum(base, "key", "one")
          .join(broadcast(arms.select("t", "coff")), "t")
          .withColumn("rnk", col("cum") + 1L - col("coff"))
        ranked.join(broadcast(targets),
            col("t") === col("tt") && col("rnk") === col("tr"))
          .groupBy("decile")
          .agg(sum(when(col("t") === 1L, col("cents")))
              .as("q_treated_cents"),
            sum(when(col("t") === 0L, col("cents")))
              .as("q_control_cents"))
          .select(col("decile"), col("q_treated_cents"),
            col("q_control_cents"),
            (col("q_treated_cents") - col("q_control_cents"))
              .as("qte_cents"))
          .orderBy("decile")
      },
      Some("""WITH base AS (SELECT
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents,
                  o_orderkey
                FROM orders),
              arms AS (SELECT t, CAST(count(*) AS BIGINT) AS ng
                FROM base GROUP BY 1),
              ranked AS (SELECT t, cents,
                  CAST(row_number() OVER (PARTITION BY t
                    ORDER BY cents, o_orderkey) AS BIGINT) AS rnk
                FROM base),
              targets AS (SELECT t, k AS decile,
                  ((k * 100000 + 50000) * ng) // 1000000 + 1 AS tr
                FROM arms CROSS JOIN (SELECT unnest(range(0, 10)) AS k)),
              f AS (SELECT decile,
                  CAST(sum(CASE WHEN r.t = 1 THEN cents END) AS BIGINT)
                    AS q_treated_cents,
                  CAST(sum(CASE WHEN r.t = 0 THEN cents END) AS BIGINT)
                    AS q_control_cents
                FROM ranked r JOIN targets g
                  ON r.t = g.t AND r.rnk = g.tr
                GROUP BY 1)
              SELECT CAST(decile AS BIGINT) AS decile, q_treated_cents,
                q_control_cents,
                CAST(q_treated_cents - q_control_cents AS BIGINT)
                  AS qte_cents
              FROM f ORDER BY decile""")
    ),

    // ── CONTAMINATION-SAFE CLUSTER-AWARE SPLIT ────────────────────────────
    QueryDef(
      "q402_cluster_split",
      // The near-dup-leakage fix every LLM data pipeline needs: a naive
      // doc-level train/test split puts winnow near-dup pairs on
      // opposite sides of the boundary (test contamination); splitting
      // by CONNECTED COMPONENT (the q73/q165 labels — memoized) leaks
      // exactly zero pairs by construction. Both splits use the seeded
      // md5 hash (80/20, the q72 idiom); the leakage counts come from
      // ONE pass over the memoized pair table.
      //
      // Shape, and why it scales: component labels are pair-graph-
      // bounded (broadcast); the audit is one keyed join + one
      // aggregation over pairs; the doc census is one corpus pass.
      (s, d) => Shared.withCheckpointDir(s) {
        val comp = TextQueries.winnowComponents(s, d)
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .join(broadcast(comp), col("doc_id") === col("id"), "left_outer")
          .withColumn("comp", coalesce(col("comp"), col("doc_id")))
          .withColumn("train_cluster",
            (h32(concat(lit("split"), col("comp"))) % 10L < 8L)
              .cast("long"))
          .withColumn("train_naive",
            (h32(concat(lit("split"), col("doc_id"))) % 10L < 8L)
              .cast("long"))
          .checkpoint()
        val census = docs.agg(count(lit(1)).as("n_docs"),
          sum(col("train_cluster")).as("n_train_cluster"),
          sum(col("train_naive")).as("n_train_naive"))
        val sides = docs.select(col("doc_id"), col("train_cluster"),
          col("train_naive"))
        // keyed joins (the split table is corpus-sized — never broadcast
        // it; the pair table is the small side and AQE picks the build)
        val leak = TextQueries.winnowPairs(s, d).select("a", "b")
          .join(sides.select(col("doc_id").as("a"),
            col("train_cluster").as("ca"), col("train_naive").as("na")),
            "a")
          .join(sides.select(col("doc_id").as("b"),
            col("train_cluster").as("cb"), col("train_naive").as("nb")),
            "b")
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("ca") =!= col("cb")).cast("long"))
              .as("leak_pairs_cluster"),
            sum((col("na") =!= col("nb")).cast("long"))
              .as("leak_pairs_naive"))
        census.crossJoin(broadcast(leak))
      },
      Some("WITH RECURSIVE " +
        TextQueries.SQL_WINNOW_PAIR_CTES.stripPrefix("WITH ") + s""",
           wedges AS (SELECT a, b FROM wpairs
                      UNION ALL SELECT b AS a, a AS b FROM wpairs),
           wnodes AS (SELECT DISTINCT a AS id FROM wedges),
           reach AS (SELECT id, id AS r FROM wnodes
                     UNION
                     SELECT e.b, reach.r FROM reach
                     JOIN wedges e ON e.a = reach.id),
           wcomp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
           docs AS (SELECT d.doc_id,
               coalesce(c.comp, d.doc_id) AS comp
             FROM documents d LEFT JOIN wcomp c ON d.doc_id = c.id),
           split AS (SELECT doc_id,
               CASE WHEN ${SQL_H32("'split' || comp")} % 10 < 8
                 THEN 1 ELSE 0 END AS train_cluster,
               CASE WHEN ${SQL_H32("'split' || doc_id")} % 10 < 8
                 THEN 1 ELSE 0 END AS train_naive
             FROM docs),
           census AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(train_cluster) AS BIGINT) AS n_train_cluster,
               CAST(sum(train_naive) AS BIGINT) AS n_train_naive
             FROM split),
           leak AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN sa.train_cluster <> sb.train_cluster
                 THEN 1 ELSE 0 END) AS BIGINT) AS leak_pairs_cluster,
               CAST(sum(CASE WHEN sa.train_naive <> sb.train_naive
                 THEN 1 ELSE 0 END) AS BIGINT) AS leak_pairs_naive
             FROM wpairs p
             JOIN split sa ON p.a = sa.doc_id
             JOIN split sb ON p.b = sb.doc_id)
           SELECT * FROM census, leak""")
    )
  )
}
