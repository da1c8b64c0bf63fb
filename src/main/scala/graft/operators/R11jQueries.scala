package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 12: corpus-health, inference and release completions —
  * Flesch readability (the classic per-source text-difficulty gauge),
  * fixed-effect meta-analysis with Cochran's Q / I² heterogeneity (the
  * cross-strata effect pooler the per-stratum tests feed), one-way
  * cluster-robust standard errors (the A/B variance correction when
  * users contribute many events), the Hill tail-index estimator (the
  * heavy-tail gauge for value distributions), a differentially-private
  * median via the exponential mechanism (the quantile release q359's
  * mean can't give), and the two-sample Anderson-Darling statistic (the
  * tail-sensitive companion to q262's KS).
  *
  * Determinism: library-wide rules — exact integer/DECIMAL(38,0)
  * moments, row-local micro/nano-floored double terms BEFORE any
  * cross-row sum (the q348/q376 discipline), seeded md5-family noise,
  * one pinned double block per statistic with shared expression text.
  */
object R11jQueries {

  import Shared._

  /** standard uniform from a 32-bit hash: U = (h + 0.5)/2³² ∈ (0,1) */
  private def uSql(h: String) =
    s"((CAST($h AS DOUBLE) + 0.5) / 4294967296.0)"

  /** Gumbel(0,1) inverse-CDF — the exponential mechanism's argmax form:
    * argmax_c (score_c + Gumbel_c) samples ∝ exp(score_c). */
  private def gumbelSql(h: String) =
    s"(-ln(-ln(${uSql(h)})))"

  val all: Seq[QueryDef] = Seq(

    // ── FLESCH READABILITY PER SOURCE ─────────────────────────────────────
    QueryDef(
      "q385_readability",
      // Flesch Reading Ease and Flesch-Kincaid grade per source, from
      // the classic syllable heuristic (a syllable ≈ one maximal vowel
      // group). The corpus has no sentence punctuation, so sentences =
      // documents (documented; the formulas degrade gracefully). Word
      // and vowel-group COUNTS are exact integers summed per source;
      // each formula is one pinned double block over those sums.
      //
      // Shape, and why it scales: ONE corpus pass — both counts are
      // row-local codegen expressions — into a source-grain hash
      // aggregation; output is |sources| rows.
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"),
            size(tokens(col("text"))).cast("long").as("w"),
            size(expr("regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)"))
              .cast("long").as("y"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
            sum(col("y")).as("syllables"))
          .select(col("source"), col("n_docs"), col("words"),
            col("syllables"),
            expr("""206.835
              - 1.015 * (CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE))
              - 84.6 * (CAST(syllables AS DOUBLE)
                / CAST(words AS DOUBLE))""").as("flesch_ease"),
            expr("""0.39 * (CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE))
              + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
              - 15.59""").as("fk_grade"))
          .orderBy("source")
      },
      Some(s"""WITH per AS (SELECT source,
                  CAST(len($SQL_TOKENS) AS BIGINT) AS w,
                  CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                    AS BIGINT) AS y
                FROM documents),
              g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(w) AS BIGINT) AS words,
                  CAST(sum(y) AS BIGINT) AS syllables
                FROM per GROUP BY 1)
              SELECT source, n_docs, words, syllables,
                206.835
                  - 1.015 * (CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE))
                  - 84.6 * (CAST(syllables AS DOUBLE)
                    / CAST(words AS DOUBLE)) AS flesch_ease,
                0.39 * (CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE))
                  + 11.8 * (CAST(syllables AS DOUBLE)
                    / CAST(words AS DOUBLE))
                  - 15.59 AS fk_grade
              FROM g ORDER BY source""")
    ),

    // ── FIXED-EFFECT META-ANALYSIS (Cochran's Q, I²) ──────────────────────
    QueryDef(
      "q386_meta_analysis",
      // Pool the urgent-vs-other order-value effect across nation
      // "studies" by inverse-variance weighting, and score heterogeneity
      // (Cochran's Q, Higgins' I²). Per-stratum moments are exact
      // DECIMAL(38,0); each stratum's d_g, pooled variance and weight
      // w_g = 1/v_g are ROW-LOCAL pinned doubles; the cross-stratum sums
      // run on ATTO-floored integers (w·10¹⁸, wd·10¹⁸ — the q348/q376
      // per-term discipline at the scale the weights live at), so the
      // pooled effect is one exact-operand division. Q's per-stratum
      // terms re-floor at micro against the broadcast pooled effect.
      //
      // Shape, and why it scales: one fact pass to the (nation × arm)
      // grain; everything after runs on the ≤25-row stratum table;
      // output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val strata = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nation")), "o_custkey")
          .select(col("nation"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("nation")
          .agg(sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
            sum(when(col("t"), col("cents")).otherwise(0L)).as("st"),
            sum(when(col("t"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("qt"),
            sum(when(!col("t"), 1L).otherwise(0L)).as("nc"),
            sum(when(!col("t"), col("cents")).otherwise(0L)).as("sc"),
            sum(when(!col("t"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("qc"))
          .filter(col("nt") >= 2L && col("nc") >= 2L)
          // row-local pinned doubles: effect, pooled variance, weight
          .withColumn("d_g", expr("""CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
            - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)"""))
          .withColumn("v_g", expr(
            """((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                  / CAST(nt AS DOUBLE))
                + (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE)
                  * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)))
              / CAST(nt + nc - 2 AS DOUBLE)
              * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))"""))
          .filter(col("v_g") > 0.0)
          .withColumn("w_atto", expr(
            "CAST(floor(1e18 / v_g) AS BIGINT)"))
          .withColumn("wd_atto", expr(
            "CAST(floor(1e18 / v_g * d_g) AS BIGINT)"))
          .checkpoint()
        val pooled = strata.agg(count(lit(1)).as("k"),
            sum(col("w_atto")).as("sw"), sum(col("wd_atto")).as("swd"))
          .withColumn("d_pool",
            expr("CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE)"))
        strata.crossJoin(broadcast(pooled))
          .withColumn("q_micro", expr(
            """CAST(floor(1e6 / v_g * (d_g - d_pool) * (d_g - d_pool))
              AS BIGINT)"""))
          .groupBy("k", "d_pool")
          .agg(sum(col("q_micro")).as("qm"))
          .select(col("k").as("n_strata"), col("d_pool").as("pooled_cents"),
            expr("CAST(qm AS DOUBLE) / 1e6").as("q_cochran"),
            expr("""greatest(0.0, (CAST(qm AS DOUBLE) / 1e6
                - CAST(k - 1 AS DOUBLE)) / (CAST(qm AS DOUBLE) / 1e6))""")
              .as("i2"))
      },
      Some("""WITH j AS (SELECT c_nationkey AS nation,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents
                FROM orders JOIN customer ON o_custkey = c_custkey),
              g AS (SELECT nation,
                  CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nt,
                  CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS st,
                  sum(CASE WHEN t = 1
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS qt,
                  CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nc,
                  CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sc,
                  sum(CASE WHEN t = 0
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS qc
                FROM j GROUP BY 1
                HAVING nt >= 2 AND nc >= 2),
              e AS (SELECT *,
                  CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS d_g,
                  ((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)
                      * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
                    + (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE)
                      * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)))
                  / CAST(nt + nc - 2 AS DOUBLE)
                  * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))
                    AS v_g
                FROM g),
              f AS (SELECT *,
                  CAST(floor(1e18 / v_g) AS BIGINT) AS w_atto,
                  CAST(floor(1e18 / v_g * d_g) AS BIGINT) AS wd_atto
                FROM e WHERE v_g > 0.0),
              p AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  sum(w_atto) AS sw, sum(wd_atto) AS swd,
                  CAST(sum(wd_atto) AS DOUBLE) / CAST(sum(w_atto) AS DOUBLE)
                    AS d_pool
                FROM f),
              q AS (SELECT k, d_pool,
                  CAST(sum(CAST(floor(1e6 / v_g * (d_g - d_pool)
                    * (d_g - d_pool)) AS BIGINT)) AS BIGINT) AS qm
                FROM f, p GROUP BY 1, 2)
              SELECT k AS n_strata, d_pool AS pooled_cents,
                CAST(qm AS DOUBLE) / 1e6 AS q_cochran,
                greatest(0.0, (CAST(qm AS DOUBLE) / 1e6
                  - CAST(k - 1 AS DOUBLE)) / (CAST(qm AS DOUBLE) / 1e6))
                  AS i2
              FROM q""")
    ),

    // ── ONE-WAY CLUSTER-ROBUST STANDARD ERRORS ────────────────────────────
    QueryDef(
      "q387_cluster_robust_se",
      // The A/B variance correction q244's iid t-test silently needs
      // when users contribute many events each: arm = user_id % 2 (the
      // q72 split idiom), outcome = event value in cents, clusters =
      // users. The cluster-residual sums never materialize residuals:
      // Σ_g(Σ_{i∈g} e_i)² = Σ_g (n_a·T_g − m_g·S_a)²/n_a² with T_g/m_g
      // the cluster sum/size and S_a/n_a the arm totals — every term
      // exact DECIMAL(38,0). SEs and the t statistic are one pinned
      // double block.
      //
      // Shape, and why it scales: one fact pass to the (arm, user)
      // cluster grain; one 1-row arm-totals broadcast onto it; a
      // conditional-sum pivot collapses both arms into 1 output row.
      (s, d) => Shared.withCheckpointDir(s) {
        val cl = Tables.events(s, d)
          .select((col("user_id") % 2L).as("arm"), col("user_id"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("arm", "user_id")
          .agg(count(lit(1)).as("m_g"), sum(col("cents")).as("t_g"))
          .checkpoint()
        val tot = cl.groupBy("arm")
          .agg(sum(col("m_g")).as("n_a"), sum(col("t_g")).as("s_a"),
            count(lit(1)).as("g_a"))
        val e2 = cl.join(broadcast(tot), "arm")
          .groupBy("arm")
          .agg(max(col("n_a")).as("n_a"), max(col("s_a")).as("s_a"),
            max(col("g_a")).as("g_a"),
            sum(expr("""CAST(n_a * t_g - m_g * s_a AS DECIMAL(38,0))
              * (n_a * t_g - m_g * s_a)""")).as("e2"))
        e2.agg(
            sum(when(col("arm") === 1L, col("n_a"))).as("n1"),
            sum(when(col("arm") === 0L, col("n_a"))).as("n0"),
            sum(when(col("arm") === 1L, col("s_a"))).as("s1"),
            sum(when(col("arm") === 0L, col("s_a"))).as("s0"),
            sum(when(col("arm") === 1L, col("g_a"))).as("g1"),
            sum(when(col("arm") === 0L, col("g_a"))).as("g0"),
            sum(when(col("arm") === 1L, col("e2"))).as("e21"),
            sum(when(col("arm") === 0L, col("e2"))).as("e20"))
          .select(col("n1"), col("n0"), (col("g1") + col("g0"))
              .as("n_clusters"),
            expr("""CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)""").as("diff_cents"),
            expr("""sqrt(CAST(e21 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                  * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
              + CAST(e20 AS DOUBLE)
                / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)
                  * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)))""")
              .as("se_cluster"))
          .withColumn("t_cluster",
            expr("diff_cents / nullif(se_cluster, 0.0)"))
      },
      Some("""WITH ev AS (SELECT user_id % 2 AS arm, user_id,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
                FROM events),
              cl AS (SELECT arm, user_id, CAST(count(*) AS BIGINT) AS m_g,
                  CAST(sum(cents) AS BIGINT) AS t_g
                FROM ev GROUP BY 1, 2),
              tot AS (SELECT arm, CAST(sum(m_g) AS BIGINT) AS n_a,
                  CAST(sum(t_g) AS BIGINT) AS s_a,
                  CAST(count(*) AS BIGINT) AS g_a
                FROM cl GROUP BY 1),
              e2 AS (SELECT cl.arm, max(n_a) AS n_a, max(s_a) AS s_a,
                  max(g_a) AS g_a,
                  sum(CAST(n_a * t_g - m_g * s_a AS DECIMAL(38,0))
                    * (n_a * t_g - m_g * s_a)) AS e2
                FROM cl JOIN tot ON cl.arm = tot.arm GROUP BY 1),
              piv AS (SELECT
                  sum(CASE WHEN arm = 1 THEN n_a END) AS n1,
                  sum(CASE WHEN arm = 0 THEN n_a END) AS n0,
                  sum(CASE WHEN arm = 1 THEN s_a END) AS s1,
                  sum(CASE WHEN arm = 0 THEN s_a END) AS s0,
                  sum(CASE WHEN arm = 1 THEN g_a END) AS g1,
                  sum(CASE WHEN arm = 0 THEN g_a END) AS g0,
                  sum(CASE WHEN arm = 1 THEN e2 END) AS e21,
                  sum(CASE WHEN arm = 0 THEN e2 END) AS e20
                FROM e2),
              f AS (SELECT CAST(n1 AS BIGINT) AS n1,
                  CAST(n0 AS BIGINT) AS n0,
                  CAST(g1 + g0 AS BIGINT) AS n_clusters,
                  CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff_cents,
                  sqrt(CAST(e21 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                        * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
                    + CAST(e20 AS DOUBLE)
                      / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)
                        * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)))
                    AS se_cluster
                FROM piv)
              SELECT n1, n0, n_clusters, diff_cents, se_cluster,
                diff_cents / nullif(se_cluster, 0.0) AS t_cluster
              FROM f""")
    ),

    // ── HILL TAIL-INDEX ESTIMATOR ─────────────────────────────────────────
    QueryDef(
      "q388_hill_tail_index",
      // How heavy is the right tail of order values? The Hill estimator
      // over the top k = 200 order statistics: H = (1/k)Σ ln x_(i) −
      // ln x_(k+1), α = 1/H. Each ln is NANO-floored row-locally (the
      // q341 micro-log discipline, 3 digits finer) so the cross-row sum
      // is pure BIGINT; ties at the threshold don't matter because
      // equal values have equal logs.
      //
      // Shape, and why it scales: one fact pass through TakeOrdered-201
      // (no global sort); the fold runs on the 201-row model table;
      // output is 1 row.
      (s, d) => {
        val top = Tables.orders(s, d)
          .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
          .orderBy(col("cents").desc)
          .limit(201)
        val w = Window.orderBy(col("cents").desc)
        val ranked = top
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("ln_nano",
            expr("CAST(floor(1e9 * ln(CAST(cents AS DOUBLE))) AS BIGINT)"))
        ranked.agg(
            sum(when(col("rk") <= 200L, col("ln_nano"))).as("sl"),
            sum(when(col("rk") === 201L, col("ln_nano"))).as("l201"),
            sum(when(col("rk") === 201L, col("cents"))).as("x201"))
          .select(lit(200L).as("k"), col("x201").as("threshold_cents"),
            expr("""(CAST(sl AS DOUBLE) / 200.0 - CAST(l201 AS DOUBLE))
              / 1e9""").as("hill_h"))
          .withColumn("alpha", expr("1.0 / hill_h"))
      },
      Some("""WITH top AS (SELECT
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents
                FROM orders ORDER BY cents DESC LIMIT 201),
              r AS (SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents DESC) AS BIGINT)
                    AS rk,
                  CAST(floor(1e9 * ln(CAST(cents AS DOUBLE))) AS BIGINT)
                    AS ln_nano
                FROM top),
              f AS (SELECT
                  CAST(sum(CASE WHEN rk <= 200 THEN ln_nano END) AS BIGINT)
                    AS sl,
                  CAST(sum(CASE WHEN rk = 201 THEN ln_nano END) AS BIGINT)
                    AS l201,
                  CAST(sum(CASE WHEN rk = 201 THEN cents END) AS BIGINT)
                    AS x201
                FROM r)
              SELECT CAST(200 AS BIGINT) AS k, x201 AS threshold_cents,
                (CAST(sl AS DOUBLE) / 200.0 - CAST(l201 AS DOUBLE)) / 1e9
                  AS hill_h,
                1.0 / ((CAST(sl AS DOUBLE) / 200.0 - CAST(l201 AS DOUBLE))
                  / 1e9) AS alpha
              FROM f""")
    ),

    // ── DIFFERENTIALLY-PRIVATE MEDIAN (exponential mechanism) ─────────────
    QueryDef(
      "q389_dp_quantile",
      // The quantile release q359's noisy mean can't give: an
      // ε=1-DP median of event values via the EXPONENTIAL MECHANISM
      // over a fixed 64-point candidate grid (data-independent range
      // [0, 512) dollars, 8-dollar steps — grid design never reads the
      // data). Utility u(c) = −|rank(c) − n/2| is a pure integer from
      // one bucket-histogram prefix sum; selection uses the Gumbel-max
      // identity with seeded md5 noise — argmax_c(ε·u/2 + G_c) samples
      // ∝ exp(ε·u/2), reproducibly in both engines.
      //
      // Shape, and why it scales: one fact pass to a 64-bucket
      // histogram; everything after runs on the 64-row model grid
      // (tiny unpartitioned window — model-sized by construction).
      // Output is 1 row.
      (s, d) => {
        val step = 800L // cents
        val hist = Tables.events(s, d)
          .select(least(lit(63L),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
              s" div ${step}L")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("cnt"))
        val spine = s.range(0, 64).select(col("id").as("b"))
        val w = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)
        val grid = spine.join(hist, Seq("b"), "left_outer")
          .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
          .withColumn("rank", sum(col("cnt")).over(w))
          .withColumn("nn", sum(col("cnt")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("u2", -abs(col("rank") * 2L - col("nn")))
          .withColumn("h", h32(concat(lit("dpq-"), col("b"))))
          .withColumn("key",
            expr(s"CAST(u2 AS DOUBLE) / 4.0 + ${gumbelSql("h")}"))
        grid.orderBy(col("key").desc, col("b").asc).limit(1)
          .select(col("nn").as("n"),
            ((col("b") + 1L) * step).as("dp_median_cents"),
            abs(col("rank") * 2L - col("nn")).as("rank_error_x2"))
      },
      Some(s"""WITH hist AS (SELECT least(63,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 800)
                    AS b,
                  count(*) AS cnt
                FROM events GROUP BY 1),
              spine AS (SELECT unnest(range(0, 64)) AS b),
              grid AS (SELECT spine.b,
                  coalesce(cnt, 0) AS cnt
                FROM spine LEFT JOIN hist ON spine.b = hist.b),
              cum AS (SELECT b, cnt,
                  sum(cnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS rank,
                  sum(cnt) OVER () AS nn
                FROM grid),
              keyed AS (SELECT b, rank, nn,
                  -abs(rank * 2 - nn) AS u2,
                  ${SQL_H32("'dpq-' || b")} AS h
                FROM cum),
              sel AS (SELECT b, rank, nn,
                  CAST(u2 AS DOUBLE) / 4.0 + ${gumbelSql("h")} AS key
                FROM keyed
                ORDER BY key DESC, b LIMIT 1)
              SELECT CAST(nn AS BIGINT) AS n,
                CAST((b + 1) * 800 AS BIGINT) AS dp_median_cents,
                CAST(abs(rank * 2 - nn) AS BIGINT) AS rank_error_x2
              FROM sel""")
    ),

    // ── TWO-SAMPLE ANDERSON-DARLING ───────────────────────────────────────
    QueryDef(
      "q390_anderson_darling",
      // The tail-sensitive two-sample test q262's KS underweights: AD²
      // between src0's and src1's doc-length distributions. Pooled
      // order positions come from ONE packed-key
      // [[Shared.distributedPrefixSum]] carrying BOTH counters at once
      // (value = isA·2³⁰ + 1, so cum decodes to (M_i, i) by div/mod —
      // bounds raise_error-guarded); ties break by doc_id (the
      // deterministic variant of the randomized tie-break, documented).
      // Each position's term (N·M_i − n·i)²/(i(N−i)) is micro-floored
      // row-locally; the sum is pure BIGINT and AD² is one pinned
      // division.
      //
      // Shape, and why it scales: one filtered corpus pass; one
      // prefix-sum round (never a global window); output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val docs = Tables.documents(s, d)
          .filter(col("source").isin("src0", "src1"))
          .select(col("doc_id"), col("n_chars"),
            (col("source") === "src0").cast("long").as("isa"))
          .withColumn("key",
            when(col("doc_id") < 0L || col("doc_id") >= lit(1L << 30) ||
              col("n_chars") < 0L || col("n_chars") >= lit(1L << 20),
              raise_error(concat(lit("q390: packed-key bounds contract " +
                "violated for doc_id "), col("doc_id"))))
              .otherwise(col("n_chars") * lit(1L << 30) + col("doc_id")))
          .withColumn("v", col("isa") * lit(1L << 30) + lit(1L))
          .checkpoint()
        val tot = docs.agg(sum(col("isa")).as("na"),
          count(lit(1)).as("nn"))
        val terms = Shared.distributedPrefixSum(docs, "key", "v")
          .withColumn("i", expr(s"cum % ${1L << 30}L + 1L"))
          .withColumn("mi", expr(s"cum div ${1L << 30}L") + col("isa"))
          .crossJoin(broadcast(tot))
          .filter(col("i") < col("nn"))
          .withColumn("t_micro", expr(
            """CAST(floor(1e6
              * CAST(nn * mi - na * i AS DOUBLE)
              * CAST(nn * mi - na * i AS DOUBLE)
              / (CAST(i AS DOUBLE) * CAST(nn - i AS DOUBLE))) AS BIGINT)"""))
        terms.groupBy("na", "nn")
          .agg(sum(col("t_micro")).as("sm"))
          .select(col("na").as("n_a"), (col("nn") - col("na")).as("n_b"),
            expr("""CAST(sm AS DOUBLE) / 1e6
              / (CAST(na AS DOUBLE) * CAST(nn - na AS DOUBLE))""")
              .as("ad_stat"))
      },
      Some("""WITH docs AS (SELECT doc_id, n_chars,
                  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS isa
                FROM documents WHERE source IN ('src0', 'src1')),
              tot AS (SELECT CAST(sum(isa) AS BIGINT) AS na,
                  CAST(count(*) AS BIGINT) AS nn
                FROM docs),
              r AS (SELECT isa,
                  CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                    AS BIGINT) AS i,
                  CAST(sum(isa) OVER (ORDER BY n_chars, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS mi
                FROM docs),
              t AS (SELECT
                  CAST(sum(CAST(floor(1e6
                    * CAST(nn * mi - na * i AS DOUBLE)
                    * CAST(nn * mi - na * i AS DOUBLE)
                    / (CAST(i AS DOUBLE) * CAST(nn - i AS DOUBLE)))
                    AS BIGINT)) AS BIGINT) AS sm,
                  max(na) AS na, max(nn) AS nn
                FROM r, tot WHERE i < nn)
              SELECT na AS n_a, CAST(nn - na AS BIGINT) AS n_b,
                CAST(sm AS DOUBLE) / 1e6
                  / (CAST(na AS DOUBLE) * CAST(nn - na AS DOUBLE))
                  AS ad_stat
              FROM t""")
    )
  )
}
