package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 19: symbolic time series, temporal-pattern, ecology,
  * concordance, forecast-loss and count-model completions — SAX
  * symbolization with motif mining (the symbolic view of the daily
  * series), the burstiness coefficient over inter-event gaps (are
  * arrivals Poisson-like or bursty?), the ecology diversity dashboard
  * (Shannon/Simpson/Berger-Parker over sources — the corpus-mix
  * one-pager), Kendall's W concordance (do months agree on the
  * priority ranking? — the multi-rater view of q391), pinball loss at
  * two quantiles for the seasonal-naive forecast (the quantile-loss
  * scorecard beside q417's MASE), and a negative-binomial
  * method-of-moments fit per event type (the overdispersed count model
  * q352's Fano factor points at).
  *
  * Determinism: library-wide rules — exact integer/DECIMAL(38,0)
  * moments, literal Gaussian breakpoints shared by both engines,
  * doubled integer ranks, integer pinball increments (τ in tenths),
  * one pinned block per statistic.
  */
object R11qQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── SAX SYMBOLIZATION + MOTIF MINING ──────────────────────────────────
    QueryDef(
      "q427_sax_motifs",
      // The symbolic view of the daily event-count series: z-score each
      // day against the exact global moments, map to a 4-letter
      // alphabet at the Gaussian quartile breakpoints (±0.6745, 0 —
      // shared literals), and mine the top-5 three-day motifs over
      // CONTIGUOUS day triples (two keyed lag joins — gaps break a
      // motif by construction). Symbols are row-local pinned
      // comparisons; motif counts are exact.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); two keyed day+1/day+2 joins; a
      // 4³-bounded motif aggregation; TakeOrdered-5.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val mS = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"))
        val sym = daily.crossJoin(broadcast(mS))
          .withColumn("z", expr(
            """(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"""))
          .withColumn("sym", expr(
            """CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
              WHEN z < 0.6745 THEN 'c' ELSE 'd' END"""))
          .select(col("day"), col("sym"))
        val s1 = sym.select((col("day") - 1L).as("day"),
          col("sym").as("sym1"))
        val s2 = sym.select((col("day") - 2L).as("day"),
          col("sym").as("sym2"))
        val tot = sym.join(s1, "day").join(s2, "day")
          .select(concat(col("sym"), col("sym1"), col("sym2"))
            .as("motif"))
          .groupBy("motif").agg(count(lit(1)).as("n_occ"))
          .checkpoint()
        val nAll = tot.agg(sum(col("n_occ")).as("nt"))
        tot.orderBy(col("n_occ").desc, col("motif").asc).limit(5)
          .crossJoin(broadcast(nAll))
          .select(col("motif"), col("n_occ"),
            expr("n_occ * 1000000L div nt").as("share_ppm"))
          .orderBy(col("n_occ").desc, col("motif").asc)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              m AS (SELECT count(*) AS n, sum(x) AS sx,
                  sum(CAST(x AS DECIMAL(38,0)) * x) AS qx
                FROM daily),
              sym AS (SELECT day,
                  CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
                    WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
                FROM (SELECT day,
                    (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z
                  FROM daily, m)),
              motifs AS (SELECT a.sym || b.sym || c.sym AS motif,
                  count(*) AS n_occ
                FROM sym a JOIN sym b ON b.day = a.day + 1
                JOIN sym c ON c.day = a.day + 2
                GROUP BY 1),
              nt AS (SELECT sum(n_occ) AS nt FROM motifs),
              top AS (SELECT motif, n_occ FROM motifs
                ORDER BY n_occ DESC, motif LIMIT 5)
              SELECT motif, CAST(n_occ AS BIGINT) AS n_occ,
                CAST(n_occ * 1000000 // nt AS BIGINT) AS share_ppm
              FROM top, nt ORDER BY n_occ DESC, motif""")
    ),

    // ── BURSTINESS COEFFICIENT ────────────────────────────────────────────
    QueryDef(
      "q428_burstiness",
      // Are arrivals Poisson-like or bursty? Goh-Barabási B =
      // (σ−μ)/(σ+μ) over all inter-event gaps (seconds), pooled across
      // users: B ≈ 0 for exponential gaps, → 1 for heavy bursts, < 0
      // for regular schedules. Gaps come from a USER-partitioned lag
      // window (q226's shape); moments are exact DECIMAL(38,0); B is
      // one pinned block.
      //
      // Shape, and why it scales: one fact pass; the lag window
      // partitions by user (never global); one moments fold to 1 row.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        Tables.events(s, d)
          .select(col("user_id"), expr("ts div 1000000000L").as("ts_s"))
          .withColumn("prev", lag(col("ts_s"), 1).over(
            Window.partitionBy("user_id").orderBy("ts_s")))
          .filter(col("prev").isNotNull)
          .select((col("ts_s") - col("prev")).as("gap"))
          .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"),
            sum(expr("CAST(gap AS DECIMAL(38,0)) * gap")).as("qg"))
          .withColumn("mu", expr(
            "CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("sigma", expr(
            """sqrt((CAST(n AS DOUBLE) * CAST(qg AS DOUBLE)
              - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"""))
          .select(col("n").as("n_gaps"), col("mu").as("mean_gap_s"),
            col("sigma").as("sd_gap_s"),
            expr("(sigma - mu) / (sigma + mu)").as("burstiness"))
      },
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s
                FROM events),
              gaps AS (SELECT ts_s - lag(ts_s) OVER (PARTITION BY user_id
                    ORDER BY ts_s) AS gap
                FROM g),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(gap) AS BIGINT) AS sg,
                  sum(CAST(gap AS DECIMAL(38,0)) * gap) AS qg
                FROM gaps WHERE gap IS NOT NULL),
              m AS (SELECT n,
                  CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                  sqrt((CAST(n AS DOUBLE) * CAST(qg AS DOUBLE)
                    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
                FROM f)
              SELECT n AS n_gaps, mu AS mean_gap_s, sigma AS sd_gap_s,
                (sigma - mu) / (sigma + mu) AS burstiness
              FROM m""")
    ),

    // ── DIVERSITY-INDEX DASHBOARD ─────────────────────────────────────────
    QueryDef(
      "q429_diversity_indices",
      // The corpus-mix one-pager ecology already solved: source
      // richness, Shannon H (micro-floored per-source terms — q339's
      // discipline), Simpson's diversity 1 − Σnᵢ(nᵢ−1)/(N(N−1)) as an
      // exact rational pinned once, Berger-Parker dominance in integer
      // ppm, and Pielou evenness H/ln(S).
      //
      // Shape, and why it scales: one corpus pass to the source grain;
      // one fold. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val src = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("ni"))
          .checkpoint()
        val tot = src.agg(sum(col("ni")).as("nn"))
        src.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("s_rich"), max(col("nn")).as("nn"),
            max(col("ni")).as("n_max"),
            sum(expr("""CAST(floor(1e6 * CAST(ni AS DOUBLE)
              / CAST(nn AS DOUBLE) * ln(CAST(nn AS DOUBLE)
              / CAST(ni AS DOUBLE))) AS BIGINT)""")).as("h_micro"),
            sum(expr("CAST(ni AS DECIMAL(38,0)) * (ni - 1)")).as("simp"))
          .select(col("s_rich").as("n_sources"),
            expr("CAST(h_micro AS DOUBLE) / 1e6").as("shannon_h"),
            expr("""1.0 - CAST(simp AS DOUBLE)
              / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))""")
              .as("simpson_diversity"),
            expr("n_max * 1000000L div nn").as("berger_parker_ppm"),
            expr("""CAST(h_micro AS DOUBLE) / 1e6
              / ln(CAST(s_rich AS DOUBLE))""").as("pielou_evenness"))
      },
      Some("""WITH src AS (SELECT source, count(*) AS ni FROM documents
                GROUP BY 1),
              tot AS (SELECT sum(ni) AS nn FROM src),
              f AS (SELECT CAST(count(*) AS BIGINT) AS s_rich,
                  max(nn) AS nn, CAST(max(ni) AS BIGINT) AS n_max,
                  CAST(sum(CAST(floor(1e6 * CAST(ni AS DOUBLE)
                    / CAST(nn AS DOUBLE) * ln(CAST(nn AS DOUBLE)
                    / CAST(ni AS DOUBLE))) AS BIGINT)) AS BIGINT)
                    AS h_micro,
                  sum(CAST(ni AS DECIMAL(38,0)) * (ni - 1)) AS simp
                FROM src, tot)
              SELECT s_rich AS n_sources,
                CAST(h_micro AS DOUBLE) / 1e6 AS shannon_h,
                1.0 - CAST(simp AS DOUBLE)
                  / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
                  AS simpson_diversity,
                CAST(n_max * 1000000 // nn AS BIGINT)
                  AS berger_parker_ppm,
                CAST(h_micro AS DOUBLE) / 1e6 / ln(CAST(s_rich AS DOUBLE))
                  AS pielou_evenness
              FROM f""")
    ),

    // ── KENDALL'S W CONCORDANCE ───────────────────────────────────────────
    QueryDef(
      "q430_kendalls_w",
      // Do the months AGREE on the priority ranking? Kendall's W over
      // q391's blocked doubled ranks: with R2_j = Σ_blocks(2·r̄) and the
      // identity mean(R2) = m(k+1), W = 3·Σ(R2_j − m(k+1))²/(m²(k³−k))
      // — pure integers to the single pinned division. W = χ²_F/(m(k−1))
      // by construction (the spec asserts it).
      //
      // Shape, and why it scales: identical to q391 — one fact pass to
      // the (month × priority) cell grain, block-partitioned 5-row
      // ranking windows, a k-row fold.
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(date_trunc("month", col("o_orderdate")).as("block"),
            col("o_orderpriority").as("treat"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("block", "treat")
          .agg(expr("sum(cents) div count(1)").as("cell"))
        val wb = Window.partitionBy("block")
        val ranked = cells
          .withColumn("ncell", count(lit(1)).over(wb))
          .filter(col("ncell") === 5L)
          .withColumn("r", rank().over(wb.orderBy("cell")).cast("long"))
          .withColumn("eq", count(lit(1))
            .over(Window.partitionBy("block", "cell")).cast("long"))
          .withColumn("r2", (col("r") - 1L) * 2L + col("eq") + 1L)
        ranked.groupBy("treat")
          .agg(sum(col("r2")).as("rj2"), count(lit(1)).as("m"))
          .agg(max(col("m")).as("m"), count(lit(1)).as("k"),
            sum(expr("""CAST(rj2 - m * 6 AS DECIMAL(38,0))
              * (rj2 - m * 6)""")).as("sdev"))
          .select(col("m").as("n_blocks"), col("k"),
            expr("""3.0 * CAST(sdev AS DOUBLE)
              / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                  * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)))""")
              .as("kendalls_w"))
      },
      Some("""WITH cells AS (SELECT
                  date_trunc('month', o_orderdate) AS block,
                  o_orderpriority AS treat,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) // count(*) AS cell
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
                  CAST(count(*) AS BIGINT) AS m
                FROM ranked GROUP BY 1),
              f AS (SELECT max(m) AS m, CAST(count(*) AS BIGINT) AS k,
                  sum(CAST(rj2 - m * 6 AS DECIMAL(38,0)) * (rj2 - m * 6))
                    AS sdev
                FROM rj)
              SELECT CAST(m AS BIGINT) AS n_blocks, k,
                3.0 * CAST(sdev AS DOUBLE)
                  / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                    * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                      * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)))
                  AS kendalls_w
              FROM f""")
    ),

    // ── PINBALL (QUANTILE) FORECAST LOSS ──────────────────────────────────
    QueryDef(
      "q431_pinball_loss",
      // The quantile-loss scorecard beside q417's MASE: pinball loss of
      // the seasonal-naive forecast ŷ_t = y_{t−7} at τ = 0.5 and 0.9.
      // With τ in TENTHS the per-pair increment max(τ₁₀·e, (τ₁₀−10)·e)
      // is a pure integer (e = y − ŷ in cents), so both losses are
      // exact integer sums with one pinned division each.
      //
      // Shape, and why it scales: one fact pass to the day grain
      // (checkpointed); one keyed day+7 join; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val daily = Tables.orders(s, d)
          .select((unix_timestamp(col("o_orderdate")) / 86400L)
            .cast("long").as("day"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("day").agg(sum(col("cents")).as("y"))
          .checkpoint()
        daily
          .join(daily.select((col("day") + 7L).as("day"),
            col("y").as("yhat")), "day")
          .withColumn("e", col("y") - col("yhat"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(greatest(col("e") * 5L, col("e") * -5L)).as("p50x10"),
            sum(greatest(col("e") * 9L, col("e") * -1L)).as("p90x10"))
          .select(col("n_pairs"),
            expr("""CAST(p50x10 AS DOUBLE) / 10.0
              / CAST(n_pairs AS DOUBLE)""").as("pinball_50_cents"),
            expr("""CAST(p90x10 AS DOUBLE) / 10.0
              / CAST(n_pairs AS DOUBLE)""").as("pinball_90_cents"))
      },
      Some("""WITH daily AS (SELECT
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS day,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS y
                FROM orders GROUP BY 1),
              pairs AS (SELECT a.y - b.y AS e
                FROM daily a JOIN daily b ON a.day = b.day + 7),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(greatest(e * 5, e * -5)) AS BIGINT) AS p50x10,
                  CAST(sum(greatest(e * 9, e * -1)) AS BIGINT) AS p90x10
                FROM pairs)
              SELECT n_pairs,
                CAST(p50x10 AS DOUBLE) / 10.0 / CAST(n_pairs AS DOUBLE)
                  AS pinball_50_cents,
                CAST(p90x10 AS DOUBLE) / 10.0 / CAST(n_pairs AS DOUBLE)
                  AS pinball_90_cents
              FROM f""")
    ),

    // ── NEGATIVE-BINOMIAL METHOD-OF-MOMENTS FIT ───────────────────────────
    QueryDef(
      "q432_negbin_fit",
      // The count model q352's overdispersion check points at: per
      // event type, fit NB(r, p) to events-per-active-user by the
      // method of moments — r̂ = m²/(v−m), p̂ = m/v, defined only when
      // v > m (NULL otherwise, the underdispersed guard). Moments are
      // exact integers per type; the fits are group-local pinned
      // blocks.
      //
      // Shape, and why it scales: one fact pass to the (type, user)
      // grain, one to the type grain. Output is |types| rows.
      (s, d) => {
        Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), sum(col("c")).as("sc"),
            sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("qc"))
          .withColumn("m", expr(
            "CAST(sc AS DOUBLE) / CAST(n_users AS DOUBLE)"))
          .withColumn("v", expr(
            """(CAST(n_users AS DOUBLE) * CAST(qc AS DOUBLE)
              - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
              / (CAST(n_users AS DOUBLE)
                * (CAST(n_users AS DOUBLE) - 1.0))"""))
          .select(col("event_type"), col("n_users"),
            col("m").as("mean_per_user"), col("v").as("var_per_user"),
            expr("CASE WHEN v > m THEN m * m / (v - m) END").as("r_hat"),
            expr("CASE WHEN v > m THEN m / v END").as("p_hat"))
          .orderBy("event_type")
      },
      Some("""WITH cu AS (SELECT event_type, user_id, count(*) AS c
                FROM events GROUP BY 1, 2),
              g AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(c) AS BIGINT) AS sc,
                  sum(CAST(c AS DECIMAL(38,0)) * c) AS qc
                FROM cu GROUP BY 1),
              mv AS (SELECT event_type, n_users,
                  CAST(sc AS DOUBLE) / CAST(n_users AS DOUBLE) AS m,
                  (CAST(n_users AS DOUBLE) * CAST(qc AS DOUBLE)
                    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                    / (CAST(n_users AS DOUBLE)
                      * (CAST(n_users AS DOUBLE) - 1.0)) AS v
                FROM g)
              SELECT event_type, n_users, m AS mean_per_user,
                v AS var_per_user,
                CASE WHEN v > m THEN m * m / (v - m) END AS r_hat,
                CASE WHEN v > m THEN m / v END AS p_hat
              FROM mv ORDER BY event_type""")
    )
  )
}
