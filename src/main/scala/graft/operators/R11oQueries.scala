package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 17: clustering-quality, survival, forecasting-eval,
  * distributional, embedding-health and privacy completions — the
  * centroid-simplified silhouette score (does the label partition
  * actually separate in embedding space?), restricted mean survival
  * time (the clinically-standard single-number summary of q295's KM
  * curve), MASE forecast evaluation (scale-free accuracy of the
  * seasonal-naive predictor), a closed-form quadratic-kernel MMD (the
  * moment-matching two-sample distance beside q398's energy distance),
  * the per-dimension isotropy audit of the embedding space, and
  * randomized-response frequency recovery (the local-DP collection
  * mechanism beside the central-DP releases q328/q359/q389).
  *
  * Determinism: library-wide rules — micro-quantized embedding space
  * (integer distances, q372's discipline), exact DECIMAL(38,0)
  * moments, row-local micro-floored double terms before cross-row
  * sums, seeded md5 mechanisms, one pinned block per statistic.
  */
object R11oQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── CENTROID-SIMPLIFIED SILHOUETTE ────────────────────────────────────
    QueryDef(
      "q415_silhouette",
      // Does the label partition separate in embedding space? The
      // centroid-simplified silhouette (documented variant: a(i)/b(i)
      // are distances to centroids, not mean pairwise distances — the
      // O(n·K) form that scales): points and centroids both live in
      // the micro-quantized integer space (q372), so every squared
      // distance is an exact BIGINT; per-point s = (b−a)/max(a,b) is a
      // row-local pinned double micro-floored before the per-label sum.
      //
      // Shape, and why it scales: one fact pass explodes to (vec, dim)
      // — dim model-bounded — joins the broadcast labels×dim centroid
      // grain, and hash-aggregates twice; fan-out is 64·K per point
      // with K = |labels| bounded. Output is K rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val pts = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("own"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("own"),
            col("pos").cast("long").as("dim"),
            expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("q"))
          .checkpoint()
        val cent = pts.groupBy(col("own").as("label"), col("dim"))
          .agg(count(lit(1)).as("nv"), sum(col("q")).as("sq"))
          .select(col("label"), col("dim"), expr("sq div nv").as("c"))
        val d2 = pts.join(broadcast(cent), "dim")
          .groupBy("vec_id", "own", "label")
          .agg(sum(expr("CAST(q - c AS DECIMAL(38,0)) * (q - c)"))
            .as("d2"))
        val perPoint = d2.groupBy("vec_id", "own")
          .agg(sum(when(col("label") === col("own"), col("d2"))).as("a2"),
            min(when(col("label") =!= col("own"), col("d2"))).as("b2"))
          .withColumn("s_micro", expr(
            """CAST(floor(1e6 * (sqrt(CAST(b2 AS DOUBLE))
                - sqrt(CAST(a2 AS DOUBLE)))
              / greatest(sqrt(CAST(a2 AS DOUBLE)),
                sqrt(CAST(b2 AS DOUBLE)))) AS BIGINT)"""))
        perPoint.groupBy(col("own").as("label"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("s_micro")).as("sm"))
          .select(col("label"), col("n_points"),
            expr("""CAST(sm AS DOUBLE) / 1e6
              / CAST(n_points AS DOUBLE)""").as("mean_silhouette"))
          .orderBy("label")
      },
      Some("""WITH pts AS (SELECT vec_id, CAST(label AS BIGINT) AS own,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                    AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS q
                FROM embeddings),
              cent AS (SELECT own AS label, dim,
                  sum(q) // count(*) AS c
                FROM pts GROUP BY 1, 2),
              d2 AS (SELECT vec_id, own, label,
                  sum(CAST(q - c AS DECIMAL(38,0)) * (q - c)) AS d2
                FROM pts JOIN cent USING (dim)
                GROUP BY 1, 2, 3),
              pp AS (SELECT vec_id, own,
                  sum(CASE WHEN label = own THEN d2 END) AS a2,
                  min(CASE WHEN label <> own THEN d2 END) AS b2
                FROM d2 GROUP BY 1, 2),
              sm AS (SELECT own AS label,
                  CAST(count(*) AS BIGINT) AS n_points,
                  CAST(sum(CAST(floor(1e6 * (sqrt(CAST(b2 AS DOUBLE))
                      - sqrt(CAST(a2 AS DOUBLE)))
                    / greatest(sqrt(CAST(a2 AS DOUBLE)),
                      sqrt(CAST(b2 AS DOUBLE)))) AS BIGINT)) AS BIGINT)
                    AS sm
                FROM pp GROUP BY 1)
              SELECT label, n_points,
                CAST(sm AS DOUBLE) / 1e6 / CAST(n_points AS DOUBLE)
                  AS mean_silhouette
              FROM sm ORDER BY label""")
    ),

    // ── RESTRICTED MEAN SURVIVAL TIME ─────────────────────────────────────
    QueryDef(
      "q416_rmst",
      // The single-number KM summary clinicians actually report: RMST
      // at τ = 30 days = the area under q295's survival step function.
      // Survival values ride q295's model-array left-to-right product
      // fold; each step's contribution S·Δt is micro-floored
      // row-locally before the BIGINT sum; the initial [0, t₁) segment
      // contributes at S = 1 exactly.
      //
      // Shape, and why it scales: q295's lifetime grain (time-bounded,
      // model-sized) + one prefix round for next-time deltas; the fold
      // runs on the broadcast model array. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val tau = 30L
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
        val pre = Shared.distributedPrefixSum(grain, "t", "tot")
          .withColumn("n_at_risk", lit(n) - col("cum"))
          .checkpoint()
        val model = pre.agg(sort_array(collect_list(
            struct(col("t"), col("d"), col("n_at_risk").as("nr"))))
          .as("arr"))
        // next event time per row (model-sized rank join)
        val one = pre.withColumn("one", lit(1L))
        val rk = Shared.distributedPrefixSum(one, "t", "one")
          .withColumn("rnk", col("cum") + 1L)
          .select(col("t"), col("d"), col("rnk"))
        val nxt = rk.select((col("rnk") - 1L).as("rnk"),
          col("t").as("t_next"))
        val steps = rk.join(nxt, Seq("rnk"), "left_outer")
          .crossJoin(broadcast(model))
          .withColumn("surv", expr(
            """aggregate(filter(arr, e -> e.t <= t AND e.d > 0),
              CAST(1.0 AS DOUBLE),
              (acc, e) -> acc * (CAST(1.0 AS DOUBLE)
                - CAST(e.d AS DOUBLE) / CAST(e.nr AS DOUBLE)))"""))
          .withColumn("seg_end",
            least(coalesce(col("t_next"), lit(tau)), lit(tau)))
          .filter(col("t") < lit(tau))
          .withColumn("contrib_micro", expr(
            "CAST(floor(1e6 * surv * CAST(seg_end - t AS DOUBLE)) AS BIGINT)"))
        val firstT = grain.agg(min(col("t")).as("t0"))
        steps.agg(sum(col("contrib_micro")).as("sc"))
          .crossJoin(broadcast(firstT))
          .select(lit(tau).as("tau_days"),
            least(col("t0"), lit(tau)).as("full_surv_days"),
            expr("""CAST(least(t0, 30) AS DOUBLE)
              + CAST(sc AS DOUBLE) / 1e6""").as("rmst_days"))
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
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk,
                  CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rnk
                FROM grain CROSS JOIN tot),
              steps AS (SELECT a.t, a.rnk,
                  coalesce((SELECT list_aggregate(
                      list(1.0 - CAST(g2.d AS DOUBLE)
                        / CAST(g2.n_at_risk AS DOUBLE) ORDER BY g2.t),
                      'product')
                    FROM pre g2 WHERE g2.t <= a.t AND g2.d > 0),
                    1.0) AS surv,
                  least(coalesce(b.t, 30), 30) AS seg_end
                FROM pre a LEFT JOIN pre b ON b.rnk = a.rnk + 1
                WHERE a.t < 30),
              f AS (SELECT CAST(sum(CAST(floor(1e6 * surv
                    * CAST(seg_end - t AS DOUBLE)) AS BIGINT)) AS BIGINT)
                    AS sc
                FROM steps),
              t0 AS (SELECT min(t) AS t0 FROM grain)
              SELECT CAST(30 AS BIGINT) AS tau_days,
                CAST(least(t0, 30) AS BIGINT) AS full_surv_days,
                CAST(least(t0, 30) AS DOUBLE) + CAST(sc AS DOUBLE) / 1e6
                  AS rmst_days
              FROM f, t0""")
    ),

    // ── MASE FORECAST EVALUATION ──────────────────────────────────────────
    QueryDef(
      "q417_mase",
      // Scale-free forecast accuracy for the seasonal-naive predictor
      // (the q220/q287 family's missing scorecard): MASE = MAE(model) /
      // MAE(naive) where the model predicts y(t−7) and the naive
      // in-sample benchmark is the one-step lag. Both MAEs are exact
      // integer sums over keyed lag joins; MASE is one pinned division.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); two keyed lag joins; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val daily = Tables.orders(s, d)
          .select((unix_timestamp(col("o_orderdate")) / 86400L)
            .cast("long").as("day"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("day").agg(sum(col("cents")).as("y"))
          .checkpoint()
        def lagJoin(k: Long) = daily
          .join(daily.select((col("day") + k).as("day"),
            col("y").as("yl")), "day")
          .agg(count(lit(1)).as(s"n$k"),
            sum(abs(col("y") - col("yl"))).as(s"sae$k"))
        lagJoin(7L).crossJoin(broadcast(lagJoin(1L)))
          .select(col("n7").as("n_seasonal_pairs"),
            col("n1").as("n_naive_pairs"),
            expr("""CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE)
              / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE))""")
              .as("mase"),
            expr("CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE)")
              .as("mae_seasonal_cents"))
      },
      Some("""WITH daily AS (SELECT
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS day,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS y
                FROM orders GROUP BY 1),
              l7 AS (SELECT CAST(count(*) AS BIGINT) AS n7,
                  CAST(sum(abs(a.y - b.y)) AS BIGINT) AS sae7
                FROM daily a JOIN daily b ON a.day = b.day + 7),
              l1 AS (SELECT CAST(count(*) AS BIGINT) AS n1,
                  CAST(sum(abs(a.y - b.y)) AS BIGINT) AS sae1
                FROM daily a JOIN daily b ON a.day = b.day + 1)
              SELECT n7 AS n_seasonal_pairs, n1 AS n_naive_pairs,
                CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE)
                  / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mase,
                CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE)
                  AS mae_seasonal_cents
              FROM l7, l1""")
    ),

    // ── QUADRATIC-KERNEL MMD (closed form) ────────────────────────────────
    QueryDef(
      "q418_mmd_quadratic",
      // The moment-matching two-sample distance beside q398's energy
      // distance: with the quadratic kernel k(x,y) = (1 + xy/s)², the
      // V-statistic MMD² collapses to the CLOSED FORM 2/s·(μ₁−μ₀)² +
      // 1/s²·(m₂,₁−m₂,₀)² — four exact DECIMAL(38,0) moments, one
      // pinned block (s = 10⁸ cents², the value-scale normalizer).
      // Detects any mean or second-moment difference exactly.
      //
      // Shape, and why it scales: one conditional moments pass to 1 row.
      (s, d) => {
        Tables.events(s, d)
          .select((col("user_id") % 2L).as("arm"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .agg(sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1L, col("cents")).otherwise(0L))
              .as("s1"),
            sum(when(col("arm") === 0L, col("cents")).otherwise(0L))
              .as("s0"),
            sum(when(col("arm") === 1L,
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("q1"),
            sum(when(col("arm") === 0L,
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("q0"))
          .withColumn("dmu", expr("""CAST(s1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)
            - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"""))
          .withColumn("dm2", expr("""CAST(q1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)
            - CAST(q0 AS DOUBLE) / CAST(n0 AS DOUBLE)"""))
          .select(col("n1"), col("n0"),
            expr("""2.0 / 1e8 * dmu * dmu
              + 1.0 / 1e16 * dm2 * dm2""").as("mmd2_quadratic"))
      },
      Some("""WITH ev AS (SELECT user_id % 2 AS arm,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
                FROM events),
              m AS (SELECT
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1,
                  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n0,
                  CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS s1,
                  CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS s0,
                  sum(CASE WHEN arm = 1
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS q1,
                  sum(CASE WHEN arm = 0
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS q0
                FROM ev),
              dd AS (SELECT n1, n0,
                  CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS dmu,
                  CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(q0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS dm2
                FROM m)
              SELECT n1, n0,
                2.0 / 1e8 * dmu * dmu + 1.0 / 1e16 * dm2 * dm2
                  AS mmd2_quadratic
              FROM dd""")
    ),

    // ── EMBEDDING ISOTROPY AUDIT ──────────────────────────────────────────
    QueryDef(
      "q419_isotropy",
      // Is the embedding space healthy, or has it collapsed onto a few
      // dominant axes? Per-dimension variance in the micro-quantized
      // space (q372's discipline: exact integer moments per dim), then
      // the isotropy ratio min(var)/max(var) and the top-variance
      // dimension — the quick-look version of the PCA spectrum q199
      // computes.
      //
      // Shape, and why it scales: one fact pass explodes to the
      // (dim) grain — model-bounded — and hash-aggregates; the fold
      // runs on 64 rows. Output is 1 row.
      (s, d) => {
        val dims = Tables.embeddings(s, d)
          .select(posexplode(col("embedding")))
          .select(col("pos").cast("long").as("dim"),
            expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("q"))
          .groupBy("dim")
          .agg(count(lit(1)).as("nv"), sum(col("q")).as("sq"),
            sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("qq"))
          .withColumn("var_micro2", expr(
            """(CAST(nv AS DOUBLE) * CAST(qq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
              / (CAST(nv AS DOUBLE) * CAST(nv AS DOUBLE))"""))
        val top = dims.orderBy(col("var_micro2").desc, col("dim").asc)
          .limit(1).select(col("dim").as("top_dim"))
        dims.agg(count(lit(1)).as("n_dims"),
            min(col("var_micro2")).as("min_var"),
            max(col("var_micro2")).as("max_var"))
          .crossJoin(broadcast(top))
          .select(col("n_dims"), col("top_dim"),
            expr("min_var / 1e12").as("min_var_unit"),
            expr("max_var / 1e12").as("max_var_unit"),
            expr("min_var / max_var").as("isotropy_ratio"))
      },
      Some("""WITH x AS (SELECT
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                    AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS q
                FROM embeddings),
              dims AS (SELECT dim, count(*) AS nv,
                  CAST(sum(q) AS BIGINT) AS sq,
                  sum(CAST(q AS DECIMAL(38,0)) * q) AS qq
                FROM x GROUP BY 1),
              v AS (SELECT dim,
                  (CAST(nv AS DOUBLE) * CAST(qq AS DOUBLE)
                    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    / (CAST(nv AS DOUBLE) * CAST(nv AS DOUBLE))
                    AS var_micro2
                FROM dims),
              top AS (SELECT dim AS top_dim FROM v
                ORDER BY var_micro2 DESC, dim LIMIT 1),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n_dims,
                  min(var_micro2) AS min_var, max(var_micro2) AS max_var
                FROM v)
              SELECT n_dims, CAST(top_dim AS BIGINT) AS top_dim,
                min_var / 1e12 AS min_var_unit,
                max_var / 1e12 AS max_var_unit,
                min_var / max_var AS isotropy_ratio
              FROM f, top""")
    ),

    // ── RANDOMIZED-RESPONSE FREQUENCY RECOVERY ────────────────────────────
    QueryDef(
      "q420_randomized_response",
      // The LOCAL-DP collection mechanism beside the central-DP
      // releases (q328 histogram, q359 mean, q389 quantile): each user
      // reports whether they purchased, but a seeded md5 coin flips the
      // answer with probability q = ¼; the aggregator recovers the true
      // rate as p̂ = (λ − q)/(1 − 2q). The flip is reproducible in both
      // engines; observed and true counts are exact integers; the
      // recovery and its error are pinned blocks.
      //
      // Shape, and why it scales: one fact pass to the user grain, one
      // fold. Output is 1 row.
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(max((col("event_type") === "purchase").cast("long"))
            .as("y"))
          .withColumn("flip",
            (h32(concat(lit("rr-"), col("user_id"))) % 1000000L
              < 250000L).cast("long"))
          .withColumn("rep",
            col("y") * (lit(1L) - col("flip")) +
              (lit(1L) - col("y")) * col("flip"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n_true"),
            sum(col("rep")).as("n_reported"))
          .withColumn("lambda", expr(
            "CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE)"))
          .select(col("n"), col("n_true"), col("n_reported"),
            expr("(lambda - 0.25) / 0.5").as("recovered_rate"),
            expr("""abs((lambda - 0.25) / 0.5
              - CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE))""")
              .as("abs_err"))
      },
      Some(s"""WITH users AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS y
                FROM events GROUP BY 1),
              rr AS (SELECT y,
                  CASE WHEN ${SQL_H32("'rr-' || user_id")} % 1000000
                    < 250000 THEN 1 ELSE 0 END AS flip
                FROM users),
              rep AS (SELECT y,
                  y * (1 - flip) + (1 - y) * flip AS rep
                FROM rr),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_true,
                  CAST(sum(rep) AS BIGINT) AS n_reported
                FROM rep),
              g AS (SELECT *, CAST(n_reported AS DOUBLE)
                    / CAST(n AS DOUBLE) AS lambda
                FROM f)
              SELECT n, n_true, n_reported,
                (lambda - 0.25) / 0.5 AS recovered_rate,
                abs((lambda - 0.25) / 0.5
                  - CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE)) AS abs_err
              FROM g""")
    )
  )
}
