package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-12 batch 5: the observability layer a data platform runs over
  * its own event stream — additive seasonal decomposition of the daily
  * series, MAD-based robust anomaly days, the sample-ratio-mismatch
  * check every experiment platform gates on, and a join-cardinality
  * estimator audit (textbook uniformity estimate vs exact truth).
  *
  * Determinism: the day grain is the q358 convention (epoch-day integer
  * from the epoch-nano ts); all decomposition arithmetic stays in exact
  * milli-count BIGINTs with explicit floor() where operands can be
  * negative (Spark `div` truncates toward zero where DuckDB `//`
  * floors — floor(double/double) on <2^53 integers is exact and
  * identical in both engines).
  */
object R12eQueries {

  import Shared._

  private val DayNs = 86400L * 1000L * 1000L * 1000L

  /** daily event counts — the q358 grain, shared by q458/q459 */
  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr(s"ts div ${DayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))

  private val SQL_DAILY =
    """daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         count(*) AS x FROM events GROUP BY 1)"""

  val all: Seq[QueryDef] = Seq(

    // ── ADDITIVE SEASONAL DECOMPOSITION (trend + weekly + residual) ───────
    QueryDef(
      "q458_seasonal_decompose",
      // The classical decomposition behind every ops dashboard: daily
      // count = trend (centered 7-day moving average) + weekly seasonal
      // (day-of-week mean of the detrended series) + residual. All in
      // exact MILLI-counts: the MA is sum·1000 div 7 (nonnegative —
      // integer div safe), the seasonal mean uses an explicit
      // floor(double/double) because detrended values go negative
      // (where truncating div and flooring div diverge); day-of-week is
      // epoch-day mod 7 (NOT the engines' 1-vs-0-based dayofweek()).
      // Only days with a full ±3 window decompose — the honest edge
      // handling, identical in both engines.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain; the MA window and seasonal aggregation run on the
      // model-sized day table (the one place an unpartitioned window is
      // the honest plan — q358's note).
      (s, d) => {
        val wMa = Window.orderBy("day").rowsBetween(-3, 3)
        val base = dailyCounts(s, d)
          .withColumn("wsum", sum(col("x")).over(wMa))
          .withColumn("wcnt", count(lit(1)).over(wMa))
          .filter(col("wcnt") === 7)
          .withColumn("trend_milli", expr("wsum * 1000L div 7L"))
          .withColumn("dow", expr("day % 7L"))
          .withColumn("detr_milli", col("x") * 1000L - col("trend_milli"))
        val seas = base.groupBy("dow")
          .agg(sum(col("detr_milli")).as("sdet"),
            count(lit(1)).as("cnt"))
          .select(col("dow"),
            expr("CAST(floor(CAST(sdet AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)")
              .as("seasonal_milli"))
        base.join(broadcast(seas), "dow")
          .select(col("day"), col("x"), col("trend_milli"), col("dow"),
            col("seasonal_milli"),
            (col("x") * 1000L - col("trend_milli") - col("seasonal_milli"))
              .as("residual_milli"))
      },
      Some(s"""WITH $SQL_DAILY,
              ma AS (SELECT day, x,
                  CAST(sum(x) OVER w AS BIGINT) AS wsum,
                  count(*) OVER w AS wcnt
                FROM daily
                WINDOW w AS (ORDER BY day
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              base AS (SELECT day, x,
                  wsum * 1000 // 7 AS trend_milli,
                  day % 7 AS dow,
                  x * 1000 - wsum * 1000 // 7 AS detr_milli
                FROM ma WHERE wcnt = 7),
              seas AS (SELECT dow,
                  CAST(floor(CAST(sum(detr_milli) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seasonal_milli
                FROM base GROUP BY 1)
              SELECT day, x, CAST(trend_milli AS BIGINT) AS trend_milli,
                CAST(base.dow AS BIGINT) AS dow, seasonal_milli,
                CAST(x * 1000 - trend_milli - seasonal_milli AS BIGINT)
                  AS residual_milli
              FROM base JOIN seas ON base.dow = seas.dow""")
    ),

    // ── MAD-BASED ROBUST ANOMALY DAYS ─────────────────────────────────────
    QueryDef(
      "q459_mad_anomaly_days",
      // The robust counterpart of a 3σ control chart: flag days whose
      // count sits more than 3·1.4826 MADs from the median — the
      // estimator outliers can't poison (they inflate σ but not MAD).
      // Median = the lower median by rank (deterministic, both
      // engines); the flag closes in exact integers:
      // |x − med|·10000 > 44478·mad (3·1.4826 = 4.4478 ×10⁴).
      //
      // Shape, and why it scales: two rank passes over the
      // calendar-bounded day grain (model-sized unpartitioned windows,
      // q358's note); output is day-grain.
      (s, d) => Shared.withCheckpointDir(s) {
        val daily = dailyCounts(s, d).checkpoint()
        def lowerMedian(df: DataFrame, c: String): Long = {
          val n = df.count()
          df.withColumn("rn", row_number().over(
              Window.orderBy(col(c).asc, col("day").asc)))
            .filter(col("rn") === (n + 1) / 2)
            .head.getAs[Long](c)
        }
        val med = lowerMedian(daily, "x")
        val dev = daily.select(col("day"),
          abs(col("x") - lit(med)).as("x")) // reuse the rank helper
        val mad = lowerMedian(dev, "x")
        daily.select(col("day"), col("x"), lit(med).as("median"),
            lit(mad).as("mad"),
            (abs(col("x") - lit(med)) * 10000L > lit(44478L) * lit(mad))
              .as("is_anomaly"))
      },
      Some(s"""WITH $SQL_DAILY,
              n AS (SELECT count(*) AS n FROM daily),
              med AS (SELECT x AS med FROM (
                  SELECT x, row_number() OVER (ORDER BY x, day) AS rn
                  FROM daily), n
                WHERE rn = (n + 1) // 2),
              mad AS (SELECT dx AS mad FROM (
                  SELECT abs(x - med) AS dx, day,
                    row_number() OVER (ORDER BY abs(x - med), day) AS rn
                  FROM daily, med), n
                WHERE rn = (n + 1) // 2)
              SELECT day, x, CAST(med AS BIGINT) AS median,
                CAST(mad AS BIGINT) AS mad,
                abs(x - med) * 10000 > 44478 * mad AS is_anomaly
              FROM daily, med, mad""")
    ),

    // ── SAMPLE-RATIO-MISMATCH CHECK (the experiment-platform gate) ────────
    QueryDef(
      "q460_srm_check",
      // The first thing an experimentation platform checks before
      // reading ANY metric: does the realized 90/10 split match the
      // declared one? Users assign by seeded hash (q420's coin); the
      // χ²(1) statistic is ONE pinned double block micro-floored, and
      // the flag fires above the 99.9th percentile (10.828 — SRM is
      // checked at strict α because a true mismatch invalidates
      // everything downstream).
      //
      // Shape, and why it scales: one distinct-user pass, a 2-cell
      // aggregation, scalar algebra.
      (s, d) => {
        val arms = Tables.events(s, d)
          .select(col("user_id")).distinct()
          .select(when(h32(concat(lit("srm"), col("user_id").cast("string")))
            % 10 < 9, lit("a")).otherwise(lit("b")).as("arm"))
        arms.agg(
            count(lit(1)).as("n_users"),
            sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"))
          .withColumn("chi2_micro", expr(
            """CAST(floor(1e6 * (
              (CAST(n_a AS DOUBLE) - 0.9 * n_users)
                * (CAST(n_a AS DOUBLE) - 0.9 * n_users) / (0.9 * n_users)
              + (CAST(n_b AS DOUBLE) - 0.1 * n_users)
                * (CAST(n_b AS DOUBLE) - 0.1 * n_users) / (0.1 * n_users)))
              AS BIGINT)"""))
          .withColumn("srm_flag", col("chi2_micro") > 10828000L)
      },
      Some(s"""WITH arms AS (SELECT CASE WHEN
                  ${Shared.SQL_H32("'srm' || CAST(user_id AS VARCHAR)")}
                    % 10 < 9 THEN 'a' ELSE 'b' END AS arm
                FROM (SELECT DISTINCT user_id FROM events)),
              c AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                  CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_b
                FROM arms)
              SELECT n_users, n_a, n_b,
                CAST(floor(1e6 * (
                  (CAST(n_a AS DOUBLE) - 0.9 * n_users)
                    * (CAST(n_a AS DOUBLE) - 0.9 * n_users) / (0.9 * n_users)
                  + (CAST(n_b AS DOUBLE) - 0.1 * n_users)
                    * (CAST(n_b AS DOUBLE) - 0.1 * n_users) / (0.1 * n_users)))
                  AS BIGINT) AS chi2_micro,
                CAST(floor(1e6 * (
                  (CAST(n_a AS DOUBLE) - 0.9 * n_users)
                    * (CAST(n_a AS DOUBLE) - 0.9 * n_users) / (0.9 * n_users)
                  + (CAST(n_b AS DOUBLE) - 0.1 * n_users)
                    * (CAST(n_b AS DOUBLE) - 0.1 * n_users) / (0.1 * n_users)))
                  AS BIGINT) > 10828000 AS srm_flag
              FROM c""")
    ),

    // ── JOIN-CARDINALITY ESTIMATOR AUDIT ──────────────────────────────────
    QueryDef(
      "q461_join_size_audit",
      // The optimizer-statistics audit every engine should run on its
      // own estimator: for the clicks ⋈ views self-join on user_id, the
      // textbook uniformity estimate |R|·|S| / max(d_R, d_S) against the
      // EXACT size Σ_u clicks(u)·views(u). Skewed keys are precisely
      // where uniformity lies, and this measures by how much (one
      // pinned ratio). All counts exact; the true size closes as an
      // integer dot product on the per-user grain — never by
      // materializing the join.
      //
      // Shape, and why it scales: two conditional aggregations on one
      // fact pass to the user grain, then scalar algebra.
      (s, d) => {
        val per = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("nc"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("nv"))
        per.agg(
            sum(col("nc")).as("n_clicks"),
            sum(col("nv")).as("n_views"),
            sum(when(col("nc") > 0, 1L).otherwise(0L)).as("d_click_users"),
            sum(when(col("nv") > 0, 1L).otherwise(0L)).as("d_view_users"),
            sum(col("nc") * col("nv")).as("true_rows"))
          .withColumn("est_rows", expr(
            "n_clicks * n_views div greatest(d_click_users, d_view_users)"))
          .withColumn("err_ratio", expr(
            "CAST(est_rows AS DOUBLE) / CAST(true_rows AS DOUBLE)"))
          .select("n_clicks", "n_views", "d_click_users", "d_view_users",
            "est_rows", "true_rows", "err_ratio")
      },
      Some("""WITH per AS (SELECT user_id,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc,
                  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nv
                FROM events WHERE event_type IN ('click', 'view')
                GROUP BY 1)
              SELECT CAST(sum(nc) AS BIGINT) AS n_clicks,
                CAST(sum(nv) AS BIGINT) AS n_views,
                CAST(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS d_click_users,
                CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS d_view_users,
                CAST(sum(nc) * sum(nv)
                  // greatest(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END),
                     sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END)) AS BIGINT)
                  AS est_rows,
                CAST(sum(nc * nv) AS BIGINT) AS true_rows,
                CAST(sum(nc) * sum(nv)
                  // greatest(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END),
                     sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END)) AS DOUBLE)
                  / CAST(sum(nc * nv) AS DOUBLE) AS err_ratio
              FROM per""")
    )
  )
}
