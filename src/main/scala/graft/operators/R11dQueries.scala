package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 6: the uncertainty-quantification surface —
  * split-conformal prediction intervals (finite-sample coverage with NO
  * distributional assumption), experiment power analysis (minimum
  * detectable effect), delete-one-bucket jackknife variance for ratio
  * metrics (the big-data alternative to the delta method), and the
  * exact weighted median.
  *
  * Determinism: library-wide rules. Conformal and weighted-median are
  * PURE INTEGER (rank selection over value grains via partitioned
  * prefix sums); MDE and jackknife quantize per-unit terms before any
  * distributed sum and finish in one pinned block.
  */
object R11dQueries {

  import Shared._

  /** MDE for a two-arm test at α = 0.05 (two-sided), power 80% (q354):
    * (z_{α/2} + z_β)·√(p(1−p)(1/na+1/nb)) with the two correctly-
    * rounded critical literals pinned — never a runtime quantile.
    */
  private val MdeSql =
    """CAST(floor(1000000.0 * (CAST(1.959963984540054 AS DOUBLE)
          + CAST(0.8416212335729143 AS DOUBLE))
        * sqrt((CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
          * (1.0 - CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
          * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))))
       AS BIGINT)"""

  /** Jackknife SE from exact nano-quantized leave-one-out ratios
    * (q355): Var_jk = (B−1)/B · (Σθ² − (Σθ)²/B), operands exact
    * DECIMAL(38,0) in nano² units.
    */
  private val JkSeSql =
    """sqrt((CAST(b AS DOUBLE) - 1.0) / CAST(b AS DOUBLE)
       * (CAST(st2 AS DOUBLE)
         - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(b AS DOUBLE)))
       / 1000000000.0"""

  val all: Seq[QueryDef] = Seq(

    // ── SPLIT-CONFORMAL PREDICTION INTERVAL ───────────────────────────────
    QueryDef(
      "q353_conformal_interval",
      // Distribution-free uncertainty: per event type, a calibration
      // half (hash parity over users — the q72 family) fits center =
      // exact median and radius = the ⌈(n_cal+1)·0.9⌉-th smallest
      // absolute residual; split-conformal theory then GUARANTEES ≥90%
      // coverage on exchangeable data, and the query AUDITS it on the
      // held-out half (exact ppm). Everything is integer cents: medians
      // and quantile ranks select by partitioned prefix sums over the
      // value-domain-bounded grain — order statistics without any
      // global sort.
      //
      // Shape, and why it scales: one fact pass to the (type, split,
      // cents) grain; all selection runs on that bounded grain
      // (partitioned windows over value grain, never over rows).
      (s, d) => Shared.withCheckpointDir(s) {
        val base = Tables.events(s, d)
          .select(col("event_type").as("t"),
            (h32(concat(lit("conf-"), col("user_id"))) % 2).as("split"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("vc"))
          .groupBy("t", "split", "vc").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val cal = base.filter(col("split") === 0)
        // exact median of the calibration half: smallest vc with
        // 2*cum_incl >= n_cal
        val wV = Window.partitionBy("t").orderBy("vc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nCal = cal.groupBy("t").agg(sum(col("cnt")).as("n_cal"))
        val med = cal
          .withColumn("cum", sum(col("cnt")).over(wV))
          .join(broadcast(nCal), "t")
          .filter(col("cum") * 2 >= col("n_cal"))
          .groupBy("t").agg(min(col("vc")).as("med"))
        // nonconformity grain |vc - med|, then the conformal rank
        // k = floor((n_cal+1)*0.9) selects the radius
        val resid = cal.join(broadcast(med), "t")
          .groupBy(col("t"), abs(col("vc") - col("med")).as("r"))
          .agg(sum(col("cnt")).as("cnt"))
        val wR = Window.partitionBy("t").orderBy("r")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val radius = resid
          .withColumn("cum", sum(col("cnt")).over(wR))
          .join(broadcast(nCal), "t")
          .filter(col("cum") * 10 >= (col("n_cal") + 1) * 9)
          .groupBy("t").agg(min(col("r")).as("radius"))
        // audit coverage on the held-out half
        val model = med.join(radius, "t").join(nCal, "t")
        base.filter(col("split") === 1)
          .join(broadcast(model), "t")
          .groupBy(col("t").as("event_type"), col("n_cal"), col("med"),
            col("radius"))
          .agg(sum(col("cnt")).as("n_test"),
            sum(when(abs(col("vc") - col("med")) <= col("radius"),
              col("cnt")).otherwise(0L)).as("covered"))
          .select(col("event_type"), col("n_cal"), col("med"),
            col("radius"), col("n_test"),
            expr("(1000000 * covered) div n_test").as("coverage_ppm"))
          .orderBy("event_type")
      },
      Some(s"""WITH base AS (SELECT event_type AS t,
                  ${SQL_H32("'conf-' || user_id")} % 2 AS split,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2, 3),
              cal AS (SELECT * FROM base WHERE split = 0),
              ncal AS (SELECT t, sum(cnt) AS n_cal FROM cal GROUP BY 1),
              cum AS (SELECT t, vc, sum(cnt) OVER (PARTITION BY t
                    ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cum
                FROM cal),
              med AS (SELECT c.t, min(vc) AS med
                FROM cum c JOIN ncal ON c.t = ncal.t
                WHERE cum * 2 >= n_cal GROUP BY 1),
              resid AS (SELECT cal.t, abs(vc - med) AS r, sum(cnt) AS cnt
                FROM cal JOIN med ON cal.t = med.t GROUP BY 1, 2),
              rcum AS (SELECT t, r, sum(cnt) OVER (PARTITION BY t
                    ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cum
                FROM resid),
              radius AS (SELECT rc.t, min(r) AS radius
                FROM rcum rc JOIN ncal ON rc.t = ncal.t
                WHERE cum * 10 >= (n_cal + 1) * 9 GROUP BY 1),
              test AS (SELECT b.t, n_cal, med, radius,
                  sum(cnt) AS n_test,
                  sum(CASE WHEN abs(vc - med) <= radius THEN cnt ELSE 0 END)
                    AS covered
                FROM base b JOIN med ON b.t = med.t
                JOIN radius ON b.t = radius.t
                JOIN ncal ON b.t = ncal.t
                WHERE split = 1 GROUP BY 1, 2, 3, 4)
              SELECT t AS event_type, CAST(n_cal AS BIGINT) AS n_cal,
                CAST(med AS BIGINT) AS med, CAST(radius AS BIGINT) AS radius,
                CAST(n_test AS BIGINT) AS n_test,
                CAST((1000000 * covered) // n_test AS BIGINT)
                  AS coverage_ppm
              FROM test ORDER BY event_type"""),
      headline = true
    ),

    // ── POWER ANALYSIS / MINIMUM DETECTABLE EFFECT ────────────────────────
    QueryDef(
      "q354_power_mde",
      // The experiment-DESIGN step before any q244/q337/q350 readout:
      // at the current traffic split, what effect size COULD this test
      // even see? MDE at α = 0.05 two-sided / 80% power from the pooled
      // rate and observed arm sizes; the two normal critical values are
      // pinned correctly-rounded literals. Also reports the runtime
      // needed to halve it (4× the traffic — from MDE ∝ 1/√n, exact
      // integer).
      //
      // Shape, and why it scales: one fact pass to (type, arm) sums;
      // model-sized arithmetic after.
      (s, d) => {
        val arm = (col("user_id") % 2 === 0).cast("long")
        val conv = (col("value") >= 50.0).cast("long")
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(sum(arm).as("na"), sum(lit(1L) - arm).as("nb"),
            sum(conv).as("cc"))
          .withColumn("n", col("na") + col("nb"))
          .select(col("event_type"), col("na"), col("nb"),
            expr("(1000000 * cc) div n").as("rate_ppm"),
            expr(MdeSql).as("mde_micro"),
            (col("n") * 3).as("extra_n_to_halve"))
          .orderBy("event_type")
      },
      Some(s"""WITH g AS (SELECT event_type,
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
                  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
                  CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cc
                FROM events GROUP BY 1),
              m AS (SELECT *, na + nb AS n FROM g)
              SELECT event_type, na, nb,
                CAST((1000000 * cc) // n AS BIGINT) AS rate_ppm,
                $MdeSql AS mde_micro,
                CAST(n * 3 AS BIGINT) AS extra_n_to_halve
              FROM m ORDER BY event_type""")
    ),

    // ── JACKKNIFE VARIANCE FOR RATIO METRICS ──────────────────────────────
    QueryDef(
      "q355_jackknife_ratio",
      // Ratio metrics (revenue per event, CTR, items per order) have no
      // closed-form variance; the production answer is the delete-one-
      // BUCKET jackknife over B = 32 hash buckets of USERS (respecting
      // the randomization unit — deleting events would understate).
      // Leave-one-out ratios θ᢮ᵢ = (V−vᵢ)/(N−nᵢ) quantize to nano
      // BEFORE the moment sums (exact DECIMAL), so the jackknife SE is
      // one pinned block over exact operands.
      //
      // Shape, and why it scales: one fact pass to the 32-row bucket
      // grain (map-side combine does the work); 1-row totals broadcast;
      // the moment fold runs on 32 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        // 32-row bucket grain checkpoints: consumed by the totals AND
        // the leave-one-out join — one fact scan
        val bkt = Tables.events(s, d)
          .select((h32(concat(lit("jk-"), col("user_id"))) % 32).as("b"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("vc"))
          .groupBy("b").agg(sum(col("vc")).as("v"), count(lit(1)).as("n"))
          .checkpoint()
        val tot = bkt.agg(sum(col("v")).as("vt"), sum(col("n")).as("nt"),
          count(lit(1)).as("nb"))
        bkt.crossJoin(broadcast(tot))
          .withColumn("theta_nano", expr(
            """CAST(floor(1000000000.0
                * (CAST(vt AS DOUBLE) - CAST(v AS DOUBLE))
                / (CAST(nt AS DOUBLE) - CAST(n AS DOUBLE))) AS BIGINT)"""))
          .groupBy("vt", "nt", "nb")
          .agg(sum(col("theta_nano").cast(DecimalType(38, 0))).as("st_d"),
            sum(col("theta_nano").cast(DecimalType(38, 0))
              * col("theta_nano")).as("st2_d"))
          .select(col("nb").as("b"),
            expr("""CAST(floor(1000000000.0 * CAST(vt AS DOUBLE)
                / CAST(nt AS DOUBLE)) AS BIGINT)""").as("theta_nano"),
            expr("CAST(st_d AS DECIMAL(38,0))").as("st"),
            expr("CAST(st2_d AS DECIMAL(38,0))").as("st2"))
          .select(col("b"), col("theta_nano"),
            expr(JkSeSql).as("jk_se"))
      },
      Some(s"""WITH bkt AS (SELECT
                  ${SQL_H32("'jk-' || user_id")} % 32 AS b,
                  sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS v,
                  count(*) AS n
                FROM events GROUP BY 1),
              tot AS (SELECT sum(v) AS vt, sum(n) AS nt, count(*) AS nb
                FROM bkt),
              loo AS (SELECT nb,
                  CAST(floor(1000000000.0
                    * (CAST(vt AS DOUBLE) - CAST(v AS DOUBLE))
                    / (CAST(nt AS DOUBLE) - CAST(n AS DOUBLE))) AS BIGINT)
                    AS theta_nano,
                  vt, nt
                FROM bkt, tot),
              m AS (SELECT CAST(nb AS BIGINT) AS b,
                  CAST(floor(1000000000.0 * CAST(vt AS DOUBLE)
                    / CAST(nt AS DOUBLE)) AS BIGINT) AS theta_nano,
                  CAST(sum(theta_nano) AS DECIMAL(38,0)) AS st,
                  CAST(sum(CAST(theta_nano AS DECIMAL(38,0)) * theta_nano)
                    AS DECIMAL(38,0)) AS st2
                FROM loo GROUP BY 1, 2)
              SELECT b, theta_nano, $JkSeSql AS jk_se FROM m""")
    ),

    // ── EXACT WEIGHTED MEDIAN ─────────────────────────────────────────────
    QueryDef(
      "q356_weighted_median",
      // The robust center the MEAN-based suites can't give when rows
      // carry unequal weight: per priority class, the order-total
      // median WEIGHTED by item count (an order with 7 items counts
      // 7×). Selection rule: smallest value whose inclusive cumulative
      // weight doubles to ≥ total — pure integers over the value grain,
      // prefix sums in a partitioned window. No global sort, no
      // doubles.
      //
      // Shape, and why it scales: facts fold to the (priority, cents)
      // grain; the window runs per-priority over the value-bounded
      // grain, never over rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val ly = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("wt"))
        val grain = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("vc"))
          .join(ly, col("o_orderkey") === ly("l_orderkey"), "inner")
          .groupBy("pri", "vc").agg(sum(col("wt")).as("w"))
          .checkpoint()
        val wTot = grain.groupBy("pri").agg(sum(col("w")).as("wt_sum"))
        val wv = Window.partitionBy("pri").orderBy("vc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grain
          .withColumn("cum", sum(col("w")).over(wv))
          .join(broadcast(wTot), "pri")
          .filter(col("cum") * 2 >= col("wt_sum"))
          .groupBy(col("pri"), col("wt_sum"))
          .agg(min(col("vc")).as("wmedian_cents"))
          .select(col("pri"), col("wt_sum"), col("wmedian_cents"))
          .orderBy("pri")
      },
      Some("""WITH ly AS (SELECT l_orderkey, count(*) AS wt
                FROM lineitem GROUP BY 1),
              grain AS (SELECT o_orderpriority AS pri,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS vc,
                  sum(wt) AS w
                FROM orders JOIN ly ON o_orderkey = l_orderkey
                GROUP BY 1, 2),
              tot AS (SELECT pri, sum(w) AS wt_sum FROM grain GROUP BY 1),
              cum AS (SELECT pri, vc, sum(w) OVER (PARTITION BY pri
                    ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cum
                FROM grain)
              SELECT c.pri, CAST(wt_sum AS BIGINT) AS wt_sum,
                CAST(min(vc) AS BIGINT) AS wmedian_cents
              FROM cum c JOIN tot ON c.pri = tot.pri
              WHERE cum * 2 >= wt_sum
              GROUP BY 1, 2 ORDER BY 1""")
    )
  )
}
