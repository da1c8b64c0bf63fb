package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 13: nonparametric inference, corpus-diversity and
  * adjustment completions — the Friedman rank test over blocked
  * treatments (the repeated-measures ANOVA the Kruskal-Wallis q346
  * can't do), Cliff's delta ordinal effect size (the nonparametric
  * companion to q369's Cohen's d, riding q261's rank machinery),
  * top-k vocabulary churn between corpus halves (the drift check on
  * the vocabulary itself), the distinct-n n-gram diversity profile
  * (the generation-quality metric), Theil + Atkinson inequality
  * indices (the decomposable complements to q366's Gini), and a
  * two-covariate regression-adjusted treatment effect via the
  * Frisch-Waugh identity with Cramer's-rule solves on exact moments
  * (the multi-covariate upgrade of q303's CUPED).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) n²-scaled
  * moments, doubled integer ranks for tie-averaging, row-local
  * micro/nano-floored log terms before cross-row sums, one pinned
  * double block per statistic with shared expression text.
  */
object R11kQueries {

  import Shared._

  /** Cramer's-rule solve for regressing z on (x1, x2), numerators over
    * the shared determinant: b1 = (S1z·S22 − S2z·S12)/det. */
  private def bSql(z: String, first: Boolean): String =
    if (first)
      s"""((CAST(s1$z AS DOUBLE) * CAST(s22 AS DOUBLE)
        - CAST(s2$z AS DOUBLE) * CAST(s12 AS DOUBLE)) / det)"""
    else
      s"""((CAST(s2$z AS DOUBLE) * CAST(s11 AS DOUBLE)
        - CAST(s1$z AS DOUBLE) * CAST(s12 AS DOUBLE)) / det)"""

  val all: Seq[QueryDef] = Seq(

    // ── FRIEDMAN RANK TEST (blocked treatments) ───────────────────────────
    QueryDef(
      "q391_friedman",
      // Do the five order priorities rank consistently across months?
      // Friedman's blocked rank test: blocks = order months, treatments
      // = priorities, cell value = the month×priority mean order total
      // (truncating cents division — identical both engines). Within-
      // block tied-average ranks use DOUBLED integers (2·r̄ = 2·#less +
      // #eq + 1 — the q261/q317 discipline), so Σ_j R_j² is exact and
      // χ²_F = 3·ΣR2_j²/(nk(k+1)) − 3n(k+1) is one pinned block.
      //
      // Shape, and why it scales: one fact pass to the (month ×
      // priority) cell grain; ranking windows partition BY BLOCK (5
      // rows each); the treatment fold is a k-row aggregation.
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(date_trunc("month", col("o_orderdate")).as("block"),
            col("o_orderpriority").as("treat"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("block", "treat")
          .agg(expr("sum(cents) div count(1)").as("cell"))
        val wb = Window.partitionBy("block")
        val complete = cells
          .withColumn("ncell", count(lit(1)).over(wb))
          .filter(col("ncell") === 5L)
        val ranked = complete
          .withColumn("r", rank().over(wb.orderBy("cell")).cast("long"))
          .withColumn("eq", count(lit(1))
            .over(Window.partitionBy("block", "cell")).cast("long"))
          .withColumn("r2", (col("r") - 1L) * 2L + col("eq") + 1L)
        val nS = ranked.groupBy("treat")
          .agg(sum(col("r2")).as("rj2"),
            count(lit(1)).as("nb"))
        nS.agg(max(col("nb")).as("n"), count(lit(1)).as("k"),
            sum(expr("CAST(rj2 AS DECIMAL(38,0)) * rj2")).as("sr2"))
          .select(col("n").as("n_blocks"), col("k"),
            expr("""3.0 * CAST(sr2 AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                  * CAST(k + 1 AS DOUBLE))
              - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE)""")
              .as("chi2_friedman"))
      },
      Some("""WITH cells AS (SELECT
                  date_trunc('month', o_orderdate) AS block,
                  o_orderpriority AS treat,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT))
                    // count(*) AS cell
                FROM orders GROUP BY 1, 2),
              complete AS (SELECT * FROM cells
                WHERE block IN (SELECT block FROM cells GROUP BY 1
                  HAVING count(*) = 5)),
              ranked AS (SELECT treat,
                  (CAST(rank() OVER (PARTITION BY block ORDER BY cell)
                    AS BIGINT) - 1) * 2
                  + CAST(count(*) OVER (PARTITION BY block, cell)
                    AS BIGINT) + 1 AS r2
                FROM complete),
              rj AS (SELECT treat, CAST(sum(r2) AS BIGINT) AS rj2,
                  CAST(count(*) AS BIGINT) AS nb
                FROM ranked GROUP BY 1),
              f AS (SELECT max(nb) AS n, CAST(count(*) AS BIGINT) AS k,
                  sum(CAST(rj2 AS DECIMAL(38,0)) * rj2) AS sr2
                FROM rj)
              SELECT CAST(n AS BIGINT) AS n_blocks, k,
                3.0 * CAST(sr2 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                      * CAST(k + 1 AS DOUBLE))
                  - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE)
                  AS chi2_friedman
              FROM f""")
    ),

    // ── CLIFF'S DELTA ORDINAL EFFECT SIZE ─────────────────────────────────
    QueryDef(
      "q392_cliffs_delta",
      // The nonparametric effect size q261's Mann-Whitney p-value
      // doesn't give: δ = (#(x₁>x₀) − #(x₁<x₀))/(n₁·n₀) between the
      // user-split arms' event values. NEVER a pairwise pass: the
      // pooled (cents → c₁, c₀) value grain plus ONE
      // [[Shared.distributedPrefixSum]] of the control counts gives
      // every greater/less/tie mass as c₁·cum-products in exact
      // DECIMAL(38,0); δ is one pinned division.
      //
      // Shape, and why it scales: one fact pass to the value-bounded
      // grain; one prefix-sum round; a 1-row totals broadcast; output
      // is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val vg = Tables.events(s, d)
          .select((col("user_id") % 2L).as("arm"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("cents")
          .agg(sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("c0"))
          .checkpoint()
        val tot = vg.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
        Shared.distributedPrefixSum(vg, "cents", "c0")
          .crossJoin(broadcast(tot))
          .agg(max(col("n1")).as("n1"), max(col("n0")).as("n0"),
            sum(expr("CAST(c1 AS DECIMAL(38,0)) * cum")).as("gt"),
            sum(expr("CAST(c1 AS DECIMAL(38,0)) * (n0 - cum - c0)"))
              .as("lt"),
            sum(expr("CAST(c1 AS DECIMAL(38,0)) * c0")).as("ties"))
          .select(col("n1"), col("n0"),
            expr("CAST(gt AS DECIMAL(38,0))").as("n_gt"),
            expr("CAST(lt AS DECIMAL(38,0))").as("n_lt"),
            expr("CAST(ties AS DECIMAL(38,0))").as("n_ties"))
          .select(col("n1"), col("n0"),
            col("n_gt").cast("long").as("n_gt"),
            col("n_lt").cast("long").as("n_lt"),
            col("n_ties").cast("long").as("n_ties"),
            expr("""(CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
              / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))""")
              .as("cliffs_delta"))
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
                  CAST(coalesce(sum(c0) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum
                FROM vg),
              f AS (SELECT n1, n0,
                  CAST(sum(CAST(c1 AS DECIMAL(38,0)) * cum) AS BIGINT)
                    AS n_gt,
                  CAST(sum(CAST(c1 AS DECIMAL(38,0)) * (n0 - cum - c0))
                    AS BIGINT) AS n_lt,
                  CAST(sum(CAST(c1 AS DECIMAL(38,0)) * c0) AS BIGINT)
                    AS n_ties
                FROM cum, tot GROUP BY 1, 2)
              SELECT n1, n0, n_gt, n_lt, n_ties,
                (CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
                  AS cliffs_delta
              FROM f""")
    ),

    // ── TOP-K VOCABULARY CHURN ────────────────────────────────────────────
    QueryDef(
      "q393_vocab_churn",
      // Vocabulary drift between corpus halves (the doc_id-parity
      // split, q72's idiom): the Jaccard overlap of the two halves'
      // top-100 token sets. The check a mix change shows up in before
      // any distribution test does. Ranks tie-break by token — both
      // top-k sets are deterministic TakeOrdered results.
      //
      // Shape, and why it scales: ONE corpus pass to the (half, token)
      // grain (checkpointed — both top-k consumers reuse it); two
      // TakeOrdered-100s; the overlap join runs on 100-row sets.
      (s, d) => Shared.withCheckpointDir(s) {
        val counts = Tables.documents(s, d)
          .select((col("doc_id") % 2L).as("half"),
            explode(tokens(col("text"))).as("tok"))
          .groupBy("half", "tok").agg(count(lit(1)).as("c"))
          .checkpoint()
        def top(h: Long) = counts.filter(col("half") === h)
          .orderBy(col("c").desc, col("tok").asc).limit(100)
          .select(col("tok"))
        val a = top(0L).withColumn("ina", lit(1L))
        val b = top(1L).withColumn("inb", lit(1L))
        a.join(b, Seq("tok"), "full_outer")
          .agg(sum(coalesce(col("ina"), lit(0L))).as("n_a"),
            sum(coalesce(col("inb"), lit(0L))).as("n_b"),
            sum(coalesce(col("ina"), lit(0L)) *
              coalesce(col("inb"), lit(0L))).as("overlap"))
          .select(col("n_a"), col("n_b"), col("overlap"),
            expr("overlap * 1000000L div (n_a + n_b - overlap)")
              .as("jaccard_ppm"))
      },
      Some(s"""WITH toks AS (SELECT doc_id % 2 AS half,
                  unnest($SQL_TOKENS) AS tok
                FROM documents),
              counts AS (SELECT half, tok, count(*) AS c
                FROM toks GROUP BY 1, 2),
              ta AS (SELECT tok FROM counts WHERE half = 0
                ORDER BY c DESC, tok LIMIT 100),
              tb AS (SELECT tok FROM counts WHERE half = 1
                ORDER BY c DESC, tok LIMIT 100),
              j AS (SELECT
                  CAST(sum(CASE WHEN ta.tok IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN tb.tok IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
                  CAST(sum(CASE WHEN ta.tok IS NOT NULL
                    AND tb.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS overlap
                FROM ta FULL OUTER JOIN tb ON ta.tok = tb.tok)
              SELECT n_a, n_b, overlap,
                CAST(overlap * 1000000 // (n_a + n_b - overlap) AS BIGINT)
                  AS jaccard_ppm
              FROM j""")
    ),

    // ── DISTINCT-N N-GRAM DIVERSITY PROFILE ───────────────────────────────
    QueryDef(
      "q394_ngram_diversity",
      // The generation-quality diversity metric: distinct-n = unique
      // n-grams / total n-grams, per source, for n = 1, 2, 3 — low
      // distinct-2/3 flags templated or looping text. All three n-gram
      // streams ride ONE corpus scan: per document the three tagged
      // gram arrays concatenate and explode once. Docs shorter than 3
      // tokens are excluded (none exist in this corpus — the spec
      // asserts it), keeping every sequence() ascending.
      //
      // Shape, and why it scales: one corpus pass → explode → one hash
      // aggregation to the (source, n, gram) grain, one to (source, n).
      // Output is |sources|×3 rows.
      (s, d) => {
        val grams = Tables.documents(s, d)
          .select(col("source"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("source"), explode(expr(
            """concat(
              transform(t, x -> named_struct('n', CAST(1 AS BIGINT),
                'gram', x)),
              transform(sequence(1, size(t) - 1),
                i -> named_struct('n', CAST(2 AS BIGINT),
                  'gram', concat_ws(' ', slice(t, i, 2)))),
              transform(sequence(1, size(t) - 2),
                i -> named_struct('n', CAST(3 AS BIGINT),
                  'gram', concat_ws(' ', slice(t, i, 3)))))"""))
            .as("g"))
          .select(col("source"), col("g.n").as("n"), col("g.gram"))
        grams.groupBy("source", "n", "gram")
          .agg(count(lit(1)).as("c"))
          .groupBy("source", "n")
          .agg(sum(col("c")).as("n_total"), count(lit(1)).as("n_distinct"))
          .select(col("source"), col("n"), col("n_total"),
            col("n_distinct"),
            expr("n_distinct * 1000000L div n_total").as("distinct_ppm"))
          .orderBy("source", "n")
      },
      Some(s"""WITH d0 AS (SELECT source, $SQL_TOKENS AS t
                FROM documents),
              d AS (SELECT * FROM d0 WHERE len(t) >= 3),
              grams AS (
                SELECT source, 1 AS n, unnest(t) AS gram FROM d
                UNION ALL
                SELECT source, 2 AS n,
                  unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM d
                UNION ALL
                SELECT source, 3 AS n,
                  unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                  AS gram
                FROM d),
              g AS (SELECT source, n, gram, count(*) AS c
                FROM grams GROUP BY 1, 2, 3),
              f AS (SELECT source, CAST(n AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS n_total,
                  CAST(count(*) AS BIGINT) AS n_distinct
                FROM g GROUP BY 1, 2)
              SELECT source, n, n_total, n_distinct,
                CAST(n_distinct * 1000000 // n_total AS BIGINT)
                  AS distinct_ppm
              FROM f ORDER BY source, n""")
    ),

    // ── THEIL + ATKINSON INEQUALITY INDICES ───────────────────────────────
    QueryDef(
      "q395_theil_atkinson",
      // The decomposable inequality indices q366's Gini sits beside:
      // Theil T = (1/n)Σ(xᵢ/μ)·ln(xᵢ/μ) and Atkinson(ε=1) = 1 −
      // geomean/μ over per-customer revenue. Each customer's Theil term
      // is a ROW-LOCAL pinned double from the broadcast exact totals,
      // micro-floored before the BIGINT sum (q376's discipline); the
      // geometric mean rides nano-floored per-row logs. Two pinned
      // blocks at the end.
      //
      // Shape, and why it scales: one fact pass to the customer grain;
      // one 1-row totals broadcast; one aggregation. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val rev = Tables.orders(s, d)
          .select(col("o_custkey"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("o_custkey").agg(sum(col("cents")).as("x"))
          .checkpoint()
        val tot = rev.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        rev.crossJoin(broadcast(tot))
          .select(col("n"), col("s"),
            expr("""CAST(floor(1e6
              * (CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
              * ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                / CAST(s AS DOUBLE))) AS BIGINT)""").as("t_micro"),
            expr("CAST(floor(1e9 * ln(CAST(x AS DOUBLE))) AS BIGINT)")
              .as("ln_nano"))
          .groupBy("n", "s")
          .agg(sum(col("t_micro")).as("sm"), sum(col("ln_nano")).as("sl"))
          .select(col("n").as("n_customers"),
            expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_cents"),
            expr("CAST(sm AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)")
              .as("theil_t"),
            expr("""1.0 - exp(CAST(sl AS DOUBLE)
                / (CAST(n AS DOUBLE) * 1e9))
              * CAST(n AS DOUBLE) / CAST(s AS DOUBLE)""").as("atkinson_1"))
      },
      Some("""WITH rev AS (SELECT o_custkey,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS BIGINT) AS x
                FROM orders GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS s FROM rev),
              terms AS (SELECT n, s,
                  CAST(floor(1e6
                    * (CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(s AS DOUBLE))
                    * ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(s AS DOUBLE))) AS BIGINT) AS t_micro,
                  CAST(floor(1e9 * ln(CAST(x AS DOUBLE))) AS BIGINT)
                    AS ln_nano
                FROM rev, tot),
              f AS (SELECT n, s, CAST(sum(t_micro) AS BIGINT) AS sm,
                  CAST(sum(ln_nano) AS BIGINT) AS sl
                FROM terms GROUP BY 1, 2)
              SELECT n AS n_customers,
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
                CAST(sm AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS theil_t,
                1.0 - exp(CAST(sl AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9))
                  * CAST(n AS DOUBLE) / CAST(s AS DOUBLE) AS atkinson_1
              FROM f""")
    ),

    // ── REGRESSION-ADJUSTED TREATMENT EFFECT (Frisch-Waugh) ───────────────
    QueryDef(
      "q396_ancova",
      // The multi-covariate upgrade of q303's one-covariate CUPED: the
      // OLS treatment coefficient from y ~ t + acctbal + orderday,
      // computed by the Frisch-Waugh identity — residualize y and t on
      // the two covariates (each a 2×2 Cramer's-rule solve over exact
      // n²-scaled DECIMAL(38,0) centered moments), then τ =
      // cov(ỹ,t̃)/var(t̃). Nine moments, one fact pass, every double in
      // ONE pinned block with shared text.
      //
      // Shape, and why it scales: one orders⋈customer keyed join, one
      // 1-row sums broadcast, one moments aggregation. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val base = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_acctbal")),
            "o_custkey")
          .select(
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("y"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("long").as("t"),
            (col("c_acctbal").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("x1"),
            (unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
              .as("x2"))
          .checkpoint()
        val sums = base.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("t")).as("st"), sum(col("x1")).as("sx1"),
          sum(col("x2")).as("sx2"))
        def m(a: String, sa: String, b: String, sb: String) =
          sum(expr(s"""CAST(n * $a - $sa AS DECIMAL(38,0))
            * (n * $b - $sb)"""))
        val mom = base.crossJoin(broadcast(sums))
          .agg(m("x1", "sx1", "x1", "sx1").as("s11"),
            m("x2", "sx2", "x2", "sx2").as("s22"),
            m("x1", "sx1", "x2", "sx2").as("s12"),
            m("x1", "sx1", "y", "sy").as("s1y"),
            m("x2", "sx2", "y", "sy").as("s2y"),
            m("x1", "sx1", "t", "st").as("s1t"),
            m("x2", "sx2", "t", "st").as("s2t"),
            m("y", "sy", "t", "st").as("syt"),
            m("t", "st", "t", "st").as("stt"),
            max(col("n")).as("n"))
        mom
          .withColumn("det", expr("""CAST(s11 AS DOUBLE)
            * CAST(s22 AS DOUBLE)
            - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)"""))
          .withColumn("covr", expr(s"""CAST(syt AS DOUBLE)
            - ${bSql("y", first = true)} * CAST(s1t AS DOUBLE)
            - ${bSql("y", first = false)} * CAST(s2t AS DOUBLE)"""))
          .withColumn("varr", expr(s"""CAST(stt AS DOUBLE)
            - ${bSql("t", first = true)} * CAST(s1t AS DOUBLE)
            - ${bSql("t", first = false)} * CAST(s2t AS DOUBLE)"""))
          .select(col("n"),
            expr("CAST(syt AS DOUBLE) / CAST(stt AS DOUBLE)")
              .as("naive_diff_cents"),
            expr("covr / varr").as("adjusted_diff_cents"))
      },
      Some(s"""WITH base AS (SELECT
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS y,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS x1,
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS x2
                FROM orders JOIN customer ON o_custkey = c_custkey),
              sums AS (SELECT count(*) AS n, sum(y) AS sy, sum(t) AS st,
                  sum(x1) AS sx1, sum(x2) AS sx2
                FROM base),
              mom AS (SELECT max(n) AS n,
                  sum(CAST(n * x1 - sx1 AS DECIMAL(38,0)) * (n * x1 - sx1))
                    AS s11,
                  sum(CAST(n * x2 - sx2 AS DECIMAL(38,0)) * (n * x2 - sx2))
                    AS s22,
                  sum(CAST(n * x1 - sx1 AS DECIMAL(38,0)) * (n * x2 - sx2))
                    AS s12,
                  sum(CAST(n * x1 - sx1 AS DECIMAL(38,0)) * (n * y - sy))
                    AS s1y,
                  sum(CAST(n * x2 - sx2 AS DECIMAL(38,0)) * (n * y - sy))
                    AS s2y,
                  sum(CAST(n * x1 - sx1 AS DECIMAL(38,0)) * (n * t - st))
                    AS s1t,
                  sum(CAST(n * x2 - sx2 AS DECIMAL(38,0)) * (n * t - st))
                    AS s2t,
                  sum(CAST(n * y - sy AS DECIMAL(38,0)) * (n * t - st))
                    AS syt,
                  sum(CAST(n * t - st AS DECIMAL(38,0)) * (n * t - st))
                    AS stt
                FROM base, sums),
              dd AS (SELECT *, CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)
                  - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE) AS det
                FROM mom),
              r AS (SELECT n,
                  CAST(syt AS DOUBLE) / CAST(stt AS DOUBLE)
                    AS naive_diff_cents,
                  (CAST(syt AS DOUBLE)
                    - ${bSql("y", first = true)} * CAST(s1t AS DOUBLE)
                    - ${bSql("y", first = false)} * CAST(s2t AS DOUBLE))
                  / (CAST(stt AS DOUBLE)
                    - ${bSql("t", first = true)} * CAST(s1t AS DOUBLE)
                    - ${bSql("t", first = false)} * CAST(s2t AS DOUBLE))
                    AS adjusted_diff_cents
                FROM dd)
              SELECT CAST(n AS BIGINT) AS n, naive_diff_cents,
                adjusted_diff_cents
              FROM r""")
    )
  )
}
