package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 7: forecasting and release completions — Holt's
  * double exponential smoothing (level + trend, the step between q319's
  * EWMA and q220's seasonal model), the autocorrelation function at
  * lags 1–7 (the diagnostic every forecaster reads first),
  * differentially-private CLIPPED-mean release (the aggregate
  * companion to q328's histogram), and expected calibration error
  * (folding q308's reliability bins into the standard one-number
  * metric).
  *
  * Determinism: library-wide rules — sequential folds for recursions
  * (identical IEEE sequence both engines), exact DECIMAL moments for
  * ACF, seeded integer-quantized noise for the DP release, pure-ppm
  * integers for ECE.
  */
object R11eQueries {

  import Shared._

  /** Holt step, shared verbatim between Spark's `aggregate` HOF and the
    * oracle's recursive CTE: α = 0.5, β = 0.25 (both exact in binary).
    * `L`/`B` are the accumulator fields, `X` the new observation.
    */
  private def holtL(x: String, l: String, b: String) =
    s"""(CAST(0.5 AS DOUBLE) * $x + CAST(0.5 AS DOUBLE) * ($l + $b))"""
  private def holtB(x: String, l: String, b: String) =
    s"""(CAST(0.25 AS DOUBLE) * (${holtL(x, l, b)} - $l)
       + CAST(0.75 AS DOUBLE) * $b)"""

  /** ACF at lag k from exact integer operands (q358): both sides are
    * n²-scaled so the global mean never becomes a double before the
    * one pinned division.
    */
  private val AcfSql =
    """(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"""

  /** Laplace(b=1) inverse-CDF from a 32-bit hash column (the q328
    * transform, parameterized over the column name).
    */
  private def lapSql(h: String) =
    s"""(-(CAST(sign((CAST($h AS DOUBLE) + 0.5) / 4294967296.0 - 0.5)
        AS DOUBLE))
      * ln(1.0 - 2.0 * abs((CAST($h AS DOUBLE) + 0.5) / 4294967296.0
        - 0.5)))"""

  val all: Seq[QueryDef] = Seq(

    // ── HOLT DOUBLE EXPONENTIAL SMOOTHING (level + trend) ─────────────────
    QueryDef(
      "q357_holt_winters",
      // Trend-aware smoothing over daily event volume: l_t = αx_t +
      // (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1},
      // l₀ = x₀, b₀ = 0, α = ½, β = ¼ (exact binary). The recursion is
      // order-sensitive, so BOTH engines run it as the identical
      // SEQUENTIAL fold over the day-ordered series (Spark `aggregate`
      // HOF ≡ DuckDB recursive CTE, step text shared verbatim — the
      // q319 discipline). Reports the final level/trend and the 7-day-
      // ahead forecast l + 7b.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain; the fold runs over a model-sized array on one row.
      (s, d) => {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("cnt"))
          .agg(sort_array(collect_list(struct(col("day"), col("cnt"))))
            .as("a"))
          .select(size(col("a")).cast("long").as("n_days"),
            expr("transform(a, e -> CAST(e.cnt AS DOUBLE))").as("xs"))
          .select(col("n_days"), expr(
            s"""aggregate(slice(xs, 2, size(xs) - 1),
                named_struct('l', element_at(xs, 1),
                  'b', CAST(0.0 AS DOUBLE)),
                (acc, x) -> named_struct(
                  'l', ${holtL("x", "acc.l", "acc.b")},
                  'b', ${holtB("x", "acc.l", "acc.b")}))""").as("hw"))
          .select(col("n_days"), col("hw.l").as("level"),
            col("hw.b").as("trend"),
            expr("hw.l + CAST(7.0 AS DOUBLE) * hw.b").as("forecast7"))
      },
      Some(s"""WITH RECURSIVE daily AS (
                SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
                FROM events GROUP BY 1),
              ord AS (SELECT CAST(row_number() OVER (ORDER BY day)
                    AS BIGINT) AS rn,
                  CAST(cnt AS DOUBLE) AS x
                FROM daily),
              hw(rn, l, b) AS (
                SELECT rn, x, CAST(0.0 AS DOUBLE) FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.rn,
                  ${holtL("o.x", "hw.l", "hw.b")},
                  ${holtB("o.x", "hw.l", "hw.b")}
                FROM hw JOIN ord o ON o.rn = hw.rn + 1),
              fin AS (SELECT * FROM hw ORDER BY rn DESC LIMIT 1)
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM ord) AS n_days,
                l AS level, b AS trend,
                l + CAST(7.0 AS DOUBLE) * b AS forecast7
              FROM fin"""),
      headline = true
    ),

    // ── AUTOCORRELATION FUNCTION (lags 1–7) ───────────────────────────────
    QueryDef(
      "q358_acf",
      // The forecaster's first diagnostic: r_k for k = 1..7 over daily
      // event counts. Mean-centering normally forces doubles early; here
      // both numerator and denominator are n²-SCALED so every term is
      // the exact integer (n·x_t − Σx)(n·x_{t+k} − Σx), accumulated as
      // DECIMAL(38,0), and r_k is one pinned division per lag.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); the lag pairing is a keyed equi-join
      // on day+k — 7 lags × day grain, all model-sized.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val nS = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val den = daily.crossJoin(broadcast(nS))
          .agg(sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
              * (n * x - sx)""")).as("den_d"))
        val lags = daily.select(col("day"), col("x"),
          explode(array((1 to 7).map(i => lit(i.toLong)): _*)).as("k"))
        val j = daily.select(col("day").as("dayj"), col("x").as("xj"))
        lags.withColumn("dayk", col("day") + col("k"))
          .join(j, col("dayk") === col("dayj"))
          .crossJoin(broadcast(nS))
          .groupBy("k", "n", "sx")
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
                * (n * xj - sx)""")).as("num_d"))
          .crossJoin(broadcast(den))
          .select(col("k").as("lag"), col("n_pairs"),
            expr("CAST(num_d AS DECIMAL(38,0))").as("num"),
            expr("CAST(den_d AS DECIMAL(38,0))").as("den"))
          .select(col("lag"), col("n_pairs"), expr(AcfSql).as("r_acf"))
          .orderBy("lag")
      },
      Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              ns AS (SELECT count(*) AS n, sum(x) AS sx FROM daily),
              den AS (SELECT sum(CAST(n * x - sx AS DECIMAL(38,0))
                    * (n * x - sx)) AS den
                FROM daily, ns),
              lags AS (SELECT k FROM (SELECT unnest(range(1, 8)) AS k)),
              pairs AS (SELECT k,
                  CAST(count(*) AS BIGINT) AS n_pairs,
                  sum(CAST(n * a.x - sx AS DECIMAL(38,0))
                    * (n * b.x - sx)) AS num
                FROM daily a
                JOIN lags ON true
                JOIN daily b ON b.day = a.day + k, ns
                GROUP BY 1),
              m AS (SELECT CAST(k AS BIGINT) AS lag, n_pairs,
                  CAST(num AS DECIMAL(38,0)) AS num,
                  (SELECT CAST(den AS DECIMAL(38,0)) FROM den) AS den
                FROM pairs)
              SELECT lag, n_pairs, $AcfSql AS r_acf FROM m
              ORDER BY lag""")
    ),

    // ── DIFFERENTIALLY-PRIVATE CLIPPED MEAN ───────────────────────────────
    QueryDef(
      "q359_dp_mean",
      // The aggregate release q328's histogram can't give: "events per
      // user" with a per-user sensitivity CLIP (C = 64) and ε = 1 split
      // evenly between the noisy sum (Laplace b = C/½ = 128) and the
      // noisy count (b = 2). Noise draws are SEEDED via the shared md5
      // family over release labels, floored to micro — reproducible in
      // both engines; the DP mean is one pinned division of the two
      // noisy micro-integers.
      //
      // Shape, and why it scales: one fact pass to the user grain, one
      // fold; noise is row-local on a 1-row frame.
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("nu"))
          .agg(count(lit(1)).as("n_users"),
            sum(least(col("nu"), lit(64L))).as("clipped_sum"),
            sum((col("nu") > 64L).cast("long")).as("n_clipped"))
          .withColumn("h1", h32(lit("dpm-sum")))
          .withColumn("h2", h32(lit("dpm-cnt")))
          .select(col("n_users"), col("clipped_sum"), col("n_clipped"),
            (col("clipped_sum") * 1000000L + expr(
              s"CAST(floor(${lapSql("h1")} * 128000000.0) AS BIGINT)"))
              .as("noisy_sum_micro"),
            (col("n_users") * 1000000L + expr(
              s"CAST(floor(${lapSql("h2")} * 2000000.0) AS BIGINT)"))
              .as("noisy_n_micro"))
          .withColumn("dp_mean", expr(
            """CAST(noisy_sum_micro AS DOUBLE)
               / CAST(noisy_n_micro AS DOUBLE)"""))
      },
      Some(s"""WITH u AS (SELECT user_id, count(*) AS nu
                FROM events GROUP BY 1),
              g AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(least(nu, 64)) AS BIGINT) AS clipped_sum,
                  CAST(sum(CASE WHEN nu > 64 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_clipped
                FROM u),
              h AS (SELECT *, ${SQL_H32("'dpm-sum'")} AS h1,
                  ${SQL_H32("'dpm-cnt'")} AS h2
                FROM g),
              r AS (SELECT n_users, clipped_sum, n_clipped,
                  clipped_sum * 1000000
                    + CAST(floor(${lapSql("h1")} * 128000000.0) AS BIGINT)
                    AS noisy_sum_micro,
                  n_users * 1000000
                    + CAST(floor(${lapSql("h2")} * 2000000.0) AS BIGINT)
                    AS noisy_n_micro
                FROM h)
              SELECT n_users, clipped_sum, n_clipped, noisy_sum_micro,
                noisy_n_micro,
                CAST(noisy_sum_micro AS DOUBLE)
                  / CAST(noisy_n_micro AS DOUBLE) AS dp_mean
              FROM r""")
    ),

    // ── EXPECTED CALIBRATION ERROR ────────────────────────────────────────
    QueryDef(
      "q360_ece",
      // Folds q308's reliability table into the two numbers every model
      // card reports: ECE = Σ_b (n_b/N)·|acc_b − conf_b| and MCE =
      // max_b |acc_b − conf_b|, over the same clamped score bands on
      // the memoized classifier-score grain. The per-bin gap uses the
      // n_b-weighted EXACT form n_b·|n_pos·10⁶ − ssum·…| — all integer
      // ppm; no doubles anywhere.
      //
      // Shape, and why it scales: rides the [[TextQueries.nbScores]]
      // doc-grain memo; one bounded-bin aggregation; output is 1 row.
      (s, d) => {
        TextQueries.nbScores(s, d)
          .select(col("y"),
            greatest(lit(-5L), least(lit(4L),
              expr("score_ppm div 2000L"))).as("bin"),
            col("score_ppm"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum(col("y")).as("n_pos"),
            sum(col("score_ppm")).as("ssum"))
          // per-bin gap in ppm: |pos_rate - mean_score| with both as
          // exact integer divisions at bin grain
          .select(col("n"),
            abs(expr("n_pos * 1000000L div n") - expr("ssum div n"))
              .as("gap_ppm"))
          .agg(sum(col("n")).as("n_total"),
            sum(col("n") * col("gap_ppm")).as("wsum"),
            max(col("gap_ppm")).as("mce_ppm"))
          .select(col("n_total"),
            expr("wsum div n_total").as("ece_ppm"), col("mce_ppm"))
      },
      Some(s"""WITH base AS (${TextQueries.nbScoreSql}),
              b AS (SELECT y,
                  greatest(-5, least(4, score_ppm // 2000)) AS bin,
                  score_ppm
                FROM base),
              bins AS (SELECT bin, count(*) AS n, sum(y) AS n_pos,
                  sum(score_ppm) AS ssum
                FROM b GROUP BY 1),
              gaps AS (SELECT n,
                  abs((n_pos * 1000000) // n - ssum // n) AS gap_ppm
                FROM bins)
              SELECT CAST(sum(n) AS BIGINT) AS n_total,
                CAST(sum(n * gap_ppm) // sum(n) AS BIGINT) AS ece_ppm,
                CAST(max(gap_ppm) AS BIGINT) AS mce_ppm
              FROM gaps""")
    )
  )
}
