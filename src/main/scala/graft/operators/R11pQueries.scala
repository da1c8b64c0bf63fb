package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 18: product-analytics, econometrics, ML-primitive and
  * dedup-governance completions — month-over-month user turnover (the
  * set-overlap churn view q194's retention matrix doesn't give), the
  * cohort LTV curve (cumulative revenue per user by cohort age), price
  * elasticity by brand (log-log OLS on exact micro-log moments), a
  * decision-stump split finder (the single-feature CART step, exact
  * Gini over a bounded histogram), the robust trimmed-mean A/B
  * difference (q370's order statistics on the user-split arms), and
  * the dedup survivorship-bias audit (does representative election
  * skew the surviving corpus?).
  *
  * Determinism: library-wide rules — exact integer set algebra, cohort
  * grids with bounded windows, micro-floored row-local logs, pinned
  * double blocks with shared text.
  */
object R11pQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── MONTH-OVER-MONTH USER TURNOVER ────────────────────────────────────
    QueryDef(
      "q421_user_turnover",
      // The churn view retention matrices hide: for each consecutive
      // month pair, the exact Jaccard overlap of active-user sets and
      // the churn share of the earlier month. Sets never materialize —
      // one (month, user) grain, one keyed self-join on month+1, and
      // |A∪B| = |A| + |B| − |A∩B| closes the algebra in integers.
      //
      // Shape, and why it scales: one fact pass to the (month, user)
      // grain; one keyed equi-join on (month+1, user); month-grain
      // aggregations. Output is months−1 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val mu = Tables.events(s, d)
          .select(expr(s"(ts div ${dayNs}L) div 30L").as("month"),
            col("user_id"))
          .distinct()
          .checkpoint()
        val sizes = mu.groupBy("month").agg(count(lit(1)).as("n"))
        val inter = mu.select((col("month") + 1L).as("month"),
            col("user_id"))
          .join(mu, Seq("month", "user_id"))
          .groupBy("month").agg(count(lit(1)).as("n_inter"))
        sizes.select(col("month"), col("n").as("n_curr"))
          .join(sizes.select((col("month") + 1L).as("month"),
            col("n").as("n_prev")), "month")
          .join(inter, Seq("month"), "left_outer")
          .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
          .select(col("month"), col("n_prev"), col("n_curr"),
            col("n_inter"),
            expr("""n_inter * 1000000L
              div (n_prev + n_curr - n_inter)""").as("jaccard_ppm"),
            expr("(n_prev - n_inter) * 1000000L div n_prev")
              .as("churn_ppm"))
          .orderBy("month")
      },
      Some("""WITH mu AS (SELECT DISTINCT
                  (epoch_us(ts) // 86400000000) // 30 AS month, user_id
                FROM events),
              sizes AS (SELECT month, CAST(count(*) AS BIGINT) AS n
                FROM mu GROUP BY 1),
              inter AS (SELECT a.month + 1 AS month,
                  CAST(count(*) AS BIGINT) AS n_inter
                FROM mu a JOIN mu b
                  ON b.month = a.month + 1 AND b.user_id = a.user_id
                GROUP BY 1),
              f AS (SELECT c.month, p.n AS n_prev, c.n AS n_curr,
                  coalesce(n_inter, 0) AS n_inter
                FROM sizes c JOIN sizes p ON c.month = p.month + 1
                LEFT JOIN inter ON inter.month = c.month)
              SELECT month, n_prev, n_curr,
                CAST(n_inter AS BIGINT) AS n_inter,
                CAST(n_inter * 1000000 // (n_prev + n_curr - n_inter)
                  AS BIGINT) AS jaccard_ppm,
                CAST((n_prev - n_inter) * 1000000 // n_prev AS BIGINT)
                  AS churn_ppm
              FROM f ORDER BY month""")
    ),

    // ── COHORT LTV CURVE ──────────────────────────────────────────────────
    QueryDef(
      "q422_cohort_ltv",
      // The revenue companion to q194's retention matrix: for each
      // signup cohort (first-event month) and age, cumulative revenue
      // per cohort member. Revenue sums are exact cents; the cumulative
      // runs along age inside a COHORT-partitioned window over the
      // bounded (cohort × age) grid; per-member LTV is a truncating
      // division (micro-cents per user).
      //
      // Shape, and why it scales: one fact pass to the user grain for
      // cohorts, one to the (cohort, age) grid; the window partitions
      // by cohort over the calendar-bounded grid. Output is grid rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr(s"(ts div ${dayNs}L) div 30L").as("month"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .checkpoint()
        val cohort = ev.groupBy("user_id")
          .agg(min(col("month")).as("cohort"))
        val sizes = cohort.groupBy("cohort")
          .agg(count(lit(1)).as("n_users"))
        val grid = ev.join(cohort, "user_id")
          .groupBy(col("cohort"), (col("month") - col("cohort")).as("age"))
          .agg(sum(col("cents")).as("rev"))
        val w = Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.withColumn("cum_rev", sum(col("rev")).over(w))
          .join(broadcast(sizes), "cohort")
          .select(col("cohort"), col("age"), col("n_users"),
            col("cum_rev"),
            expr("cum_rev * 1000000L div n_users")
              .as("ltv_microcents_per_user"))
          .orderBy("cohort", "age")
      },
      Some("""WITH ev AS (SELECT user_id,
                  (epoch_us(ts) // 86400000000) // 30 AS month,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
                FROM events),
              cohort AS (SELECT user_id, min(month) AS cohort FROM ev
                GROUP BY 1),
              sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
                FROM cohort GROUP BY 1),
              grid AS (SELECT c.cohort, e.month - c.cohort AS age,
                  CAST(sum(cents) AS BIGINT) AS rev
                FROM ev e JOIN cohort c ON e.user_id = c.user_id
                GROUP BY 1, 2),
              cum AS (SELECT cohort, age, rev,
                  CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_rev
                FROM grid)
              SELECT cum.cohort AS cohort, CAST(age AS BIGINT) AS age,
                n_users, cum_rev,
                CAST(cum_rev * 1000000 // n_users AS BIGINT)
                  AS ltv_microcents_per_user
              FROM cum JOIN sizes ON cum.cohort = sizes.cohort
              ORDER BY 1, 2""")
    ),

    // ── PRICE ELASTICITY BY BRAND (log-log OLS) ───────────────────────────
    QueryDef(
      "q423_elasticity",
      // The econometric workhorse: per brand, the log-log regression of
      // demanded quantity on retail price across parts — the slope IS
      // the elasticity estimate. Both logs are micro-floored
      // row-locally (q341's Zipf discipline), so the per-brand OLS
      // moments are exact BIGINTs and each slope is one pinned division.
      //
      // Shape, and why it scales: one lineitem pass to the part grain
      // (demand), one keyed join to part, one brand-grain aggregation.
      (s, d) => Shared.withCheckpointDir(s) {
        val demand = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("qty_c"))
        val pts = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"),
            (col("p_retailprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("price_c"))
          .join(demand, "p_partkey")
          .filter(col("qty_c") > 0L && col("price_c") > 0L)
          .select(col("p_brand"),
            expr("CAST(floor(1e6 * ln(CAST(price_c AS DOUBLE))) AS BIGINT)")
              .as("x"),
            expr("CAST(floor(1e6 * ln(CAST(qty_c AS DOUBLE))) AS BIGINT)")
              .as("y"))
        pts.groupBy("p_brand")
          .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
          .select(col("p_brand"), col("n_parts"),
            expr("""(CAST(n_parts AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / nullif(CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)""")
              .as("elasticity"))
          .orderBy("p_brand")
      },
      Some("""WITH demand AS (SELECT l_partkey AS p_partkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * 100)
                    AS BIGINT) AS qty_c
                FROM lineitem GROUP BY 1),
              pts AS (SELECT p_brand,
                  CAST(floor(1e6 * ln(CAST(
                    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                      AS BIGINT) AS DOUBLE))) AS BIGINT) AS x,
                  CAST(floor(1e6 * ln(CAST(qty_c AS DOUBLE))) AS BIGINT)
                    AS y
                FROM part JOIN demand USING (p_partkey)
                WHERE qty_c > 0
                  AND CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                    AS BIGINT) > 0),
              m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(y) AS BIGINT) AS sy,
                  sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                  sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
                FROM pts GROUP BY 1)
              SELECT p_brand, n_parts,
                (CAST(n_parts AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / nullif(CAST(n_parts AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)
                  AS elasticity
              FROM m ORDER BY p_brand""")
    ),

    // ── DECISION-STUMP SPLIT FINDER (exact Gini) ──────────────────────────
    QueryDef(
      "q424_decision_stump",
      // The single-feature CART step, exactly: find the order-value
      // threshold that best separates urgent orders by weighted Gini
      // impurity. The 64-bucket histogram plus one prefix pass gives
      // every candidate split's (n_l, p_l) as exact integers; the
      // weighted impurity 2[p_l(n_l−p_l)/n_l + p_r(n_r−p_r)/n_r]/n is a
      // row-local pinned double, and the argmin ties break by bucket.
      //
      // Shape, and why it scales: one fact pass to a bounded histogram;
      // the split scan runs on 64 rows. Output is 1 row.
      (s, d) => {
        val step = 80000L // cents: 64 buckets over [0, 51.2M)
        val hist = Tables.orders(s, d)
          .select(least(lit(63L),
            expr(s"""CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
              AS BIGINT) div ${step}L""")).as("b"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("long").as("t"))
          .groupBy("b")
          .agg(count(lit(1)).as("nb"), sum(col("t")).as("pb"))
        val w = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = hist.agg(sum(col("nb")).as("n"), sum(col("pb")).as("p"))
        val splits = hist
          .withColumn("nl", sum(col("nb")).over(w))
          .withColumn("pl", sum(col("pb")).over(w))
          .crossJoin(broadcast(tot))
          .filter(col("nl") > 0L && col("nl") < col("n"))
          .withColumn("impurity", expr(
            """2.0 * (CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)
                / CAST(nl AS DOUBLE)
              + CAST(p - pl AS DOUBLE) * CAST((n - nl) - (p - pl)
                AS DOUBLE) / CAST(n - nl AS DOUBLE))
              / CAST(n AS DOUBLE)"""))
        splits.orderBy(col("impurity").asc, col("b").asc).limit(1)
          .select(((col("b") + 1L) * step).as("split_cents"),
            col("nl").as("n_left"), (col("n") - col("nl")).as("n_right"),
            col("impurity").as("gini_weighted"),
            expr("""2.0 * CAST(p AS DOUBLE) * CAST(n - p AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))""")
              .as("gini_baseline"))
      },
      Some("""WITH hist AS (SELECT least(63,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT) // 80000) AS b,
                  count(*) AS nb,
                  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS pb
                FROM orders GROUP BY 1),
              tot AS (SELECT sum(nb) AS n, sum(pb) AS p FROM hist),
              cum AS (SELECT b,
                  sum(nb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS nl,
                  sum(pb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS pl
                FROM hist),
              splits AS (SELECT b, nl, pl, n, p,
                  2.0 * (CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)
                      / CAST(nl AS DOUBLE)
                    + CAST(p - pl AS DOUBLE) * CAST((n - nl) - (p - pl)
                      AS DOUBLE) / CAST(n - nl AS DOUBLE))
                    / CAST(n AS DOUBLE) AS impurity
                FROM cum, tot
                WHERE nl > 0 AND nl < n),
              best AS (SELECT * FROM splits
                ORDER BY impurity, b LIMIT 1)
              SELECT CAST((b + 1) * 80000 AS BIGINT) AS split_cents,
                CAST(nl AS BIGINT) AS n_left,
                CAST(n - nl AS BIGINT) AS n_right,
                impurity AS gini_weighted,
                2.0 * CAST(p AS DOUBLE) * CAST(n - p AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                  AS gini_baseline
              FROM best""")
    ),

    // ── ROBUST TRIMMED-MEAN A/B DIFFERENCE ────────────────────────────────
    QueryDef(
      "q425_trimmed_ab",
      // The outlier-robust A/B readout: 10% trimmed means per user-split
      // arm and their difference, with q370's exact order-statistic
      // machinery (arm-partitioned cumulative counts on the value
      // grain, kept-mass overlap min(ci, n−lo) − max(ce, lo) clamped —
      // all BIGINT; means and the diff are pinned blocks).
      //
      // Shape, and why it scales: one fact pass to the (arm, cents)
      // value grain; windows partition by arm over the bounded grain;
      // a 2-row pivot closes it. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val vg = Tables.events(s, d)
          .select((col("user_id") % 2L).as("arm"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("arm", "cents").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val tot = vg.groupBy("arm").agg(sum(col("cnt")).as("n"))
        val w = Window.partitionBy("arm").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val arms = vg.join(broadcast(tot), "arm")
          .withColumn("ce", coalesce(sum(col("cnt")).over(w), lit(0L)))
          .withColumn("ci", col("ce") + col("cnt"))
          .withColumn("lo", expr("n div 10L"))
          .withColumn("keep", greatest(lit(0L),
            least(col("ci"), col("n") - col("lo")) -
              greatest(col("ce"), col("lo"))))
          .groupBy("arm", "n", "lo")
          .agg(sum(col("cents") * col("keep")).as("tsum"))
          .withColumn("tmean", expr(
            "CAST(tsum AS DOUBLE) / CAST(n - 2L * lo AS DOUBLE)"))
        arms.agg(
            sum(when(col("arm") === 1L, col("n"))).as("n1"),
            sum(when(col("arm") === 0L, col("n"))).as("n0"),
            sum(when(col("arm") === 1L, col("tmean"))).as("m1"),
            sum(when(col("arm") === 0L, col("tmean"))).as("m0"))
          .select(col("n1"), col("n0"),
            col("m1").as("trimmed_mean_1"),
            col("m0").as("trimmed_mean_0"),
            (col("m1") - col("m0")).as("trimmed_diff_cents"))
      },
      Some("""WITH vg AS (SELECT user_id % 2 AS arm,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              tot AS (SELECT arm, sum(cnt) AS n FROM vg GROUP BY 1),
              c AS (SELECT vg.arm, cents, cnt, n,
                  coalesce(sum(cnt) OVER (PARTITION BY vg.arm
                    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS ce,
                  n // 10 AS lo
                FROM vg JOIN tot ON vg.arm = tot.arm),
              k AS (SELECT arm, n, lo,
                  sum(cents * greatest(0, least(ce + cnt, n - lo)
                    - greatest(ce, lo))) AS tsum
                FROM c GROUP BY 1, 2, 3),
              a AS (SELECT arm, n,
                  CAST(tsum AS DOUBLE) / CAST(n - 2 * lo AS DOUBLE)
                    AS tmean
                FROM k),
              piv AS (SELECT
                  sum(CASE WHEN arm = 1 THEN n END) AS n1,
                  sum(CASE WHEN arm = 0 THEN n END) AS n0,
                  sum(CASE WHEN arm = 1 THEN tmean END) AS m1,
                  sum(CASE WHEN arm = 0 THEN tmean END) AS m0
                FROM a)
              SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
                m1 AS trimmed_mean_1, m0 AS trimmed_mean_0,
                m1 - m0 AS trimmed_diff_cents
              FROM piv""")
    ),

    // ── DEDUP SURVIVORSHIP-BIAS AUDIT ─────────────────────────────────────
    QueryDef(
      "q426_dedup_bias",
      // Does near-dup representative election skew the surviving
      // corpus? Within the winnow clusters (the only place election
      // drops anything), compare kept vs dropped documents on exact
      // length and alphabetic-ratio sums — the audit that catches a
      // quality-election rule silently biasing the corpus mix.
      //
      // Shape, and why it scales: component labels broadcast (pair-
      // graph-bounded); one documents scan; the election window
      // partitions by cluster (q165's shape); one conditional fold.
      (s, d) => Shared.withCheckpointDir(s) {
        val comp = TextQueries.winnowComponents(s, d)
        val docs = Tables.documents(s, d)
          .withColumn("len", length(col("text")).cast("long"))
          .withColumn("alpha",
            length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
              .cast("long"))
          .join(broadcast(comp), col("doc_id") === col("id"), "inner")
          .withColumn("alpha_ratio",
            col("alpha").cast("double") / col("len"))
        val w = Window.partitionBy("comp")
          .orderBy(col("alpha_ratio").desc, col("doc_id").asc)
        docs.withColumn("keep", (row_number().over(w) === 1).cast("long"))
          .agg(sum(col("keep")).as("n_kept"),
            sum(lit(1L) - col("keep")).as("n_dropped"),
            sum(when(col("keep") === 1L, col("len"))).as("len_kept"),
            sum(when(col("keep") === 0L, col("len"))).as("len_dropped"),
            sum(when(col("keep") === 1L, col("alpha"))).as("al_kept"),
            sum(when(col("keep") === 0L, col("alpha"))).as("al_dropped"))
          .select(col("n_kept"), col("n_dropped"),
            expr("CAST(len_kept AS DOUBLE) / CAST(n_kept AS DOUBLE)")
              .as("mean_len_kept"),
            expr("""CAST(len_dropped AS DOUBLE)
              / CAST(n_dropped AS DOUBLE)""").as("mean_len_dropped"),
            expr("al_kept * 1000000L div len_kept")
              .as("alpha_ppm_kept"),
            expr("al_dropped * 1000000L div len_dropped")
              .as("alpha_ppm_dropped"))
      },
      Some("WITH RECURSIVE " +
        TextQueries.SQL_WINNOW_PAIR_CTES.stripPrefix("WITH ") + """,
           wedges AS (SELECT a, b FROM wpairs
                      UNION ALL SELECT b AS a, a AS b FROM wpairs),
           wnodes AS (SELECT DISTINCT a AS id FROM wedges),
           reach AS (SELECT id, id AS r FROM wnodes
                     UNION
                     SELECT e.b, reach.r FROM reach
                     JOIN wedges e ON e.a = reach.id),
           wcomp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
           docs AS (SELECT d.doc_id, comp,
               CAST(length(text) AS BIGINT) AS len,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 AS BIGINT) AS alpha,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 AS DOUBLE) / length(text) AS alpha_ratio
             FROM documents d JOIN wcomp c ON d.doc_id = c.id),
           sel AS (SELECT *, CASE WHEN row_number() OVER (
                 PARTITION BY comp ORDER BY alpha_ratio DESC, doc_id)
                 = 1 THEN 1 ELSE 0 END AS keep
               FROM docs),
           f AS (SELECT CAST(sum(keep) AS BIGINT) AS n_kept,
               CAST(sum(1 - keep) AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN keep = 1 THEN len END) AS BIGINT)
                 AS len_kept,
               CAST(sum(CASE WHEN keep = 0 THEN len END) AS BIGINT)
                 AS len_dropped,
               CAST(sum(CASE WHEN keep = 1 THEN alpha END) AS BIGINT)
                 AS al_kept,
               CAST(sum(CASE WHEN keep = 0 THEN alpha END) AS BIGINT)
                 AS al_dropped
             FROM sel)
           SELECT n_kept, n_dropped,
             CAST(len_kept AS DOUBLE) / CAST(n_kept AS DOUBLE)
               AS mean_len_kept,
             CAST(len_dropped AS DOUBLE) / CAST(n_dropped AS DOUBLE)
               AS mean_len_dropped,
             CAST(al_kept * 1000000 // len_kept AS BIGINT)
               AS alpha_ppm_kept,
             CAST(al_dropped * 1000000 // len_dropped AS BIGINT)
               AS alpha_ppm_dropped
           FROM f""")
    )
  )
}
