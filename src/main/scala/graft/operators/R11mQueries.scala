package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 15: randomness, attribution, extremes and retrieval-
  * audit completions — the Wald-Wolfowitz runs test (is the daily
  * series' up/down pattern random?), exact Shapley-value channel
  * attribution over the bounded channel lattice (the game-theoretic
  * answer to q214/q251's heuristic credit rules), Gumbel block-maxima
  * fitting by the method of moments (extreme-value theory next to
  * q388's Hill index), rank-biased overlap between the lexical and
  * vector rankers (do the two retrieval systems agree?), the Haar
  * wavelet energy decomposition of the daily series (which timescale
  * carries the variance?), and position-weighted source-exposure share
  * in the retrieval panel (the fairness audit on q384's results).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) moments,
  * integer micro-discount literals generated once and embedded in BOTH
  * engines' texts, coalition cells as exact conditional sums, one
  * pinned double block per statistic.
  */
object R11mQueries {

  import Shared._

  /** micro-scaled NDCG-style position discounts floor(10⁶/log₂(r+1)),
    * r = 1..10 — INTEGER literals shared by both engines, so exposure
    * sums are pure BIGINT (never a cross-row double sum). */
  private val discMicro: Seq[Long] = (1 to 10).map(r =>
    math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  private val discCaseSql: String =
    "CASE rnk " + discMicro.zipWithIndex.map { case (m, i) =>
      s"WHEN ${i + 1} THEN ${m}" }.mkString(" ") + " ELSE 0 END"

  /** truncated RBO@10 weights (1−p)·p^(d−1), p = 0.9 — double literals
    * generated once, identical text in both engines. */
  private val rboTermSql: String = (1 to 10).map { dd =>
    val w = 0.1 * math.pow(0.9, dd - 1)
    s"$w * CAST(ov$dd AS DOUBLE) / $dd.0"
  }.mkString(" + ")

  val all: Seq[QueryDef] = Seq(

    // ── WALD-WOLFOWITZ RUNS TEST ──────────────────────────────────────────
    QueryDef(
      "q403_runs_test",
      // Is the daily event-count series' up/down pattern random? Count
      // runs of consecutive same-sign deltas (ties excluded — the
      // classic convention, documented), then z = (R − μ)/σ with μ =
      // 2n₊n₋/n + 1 and σ² = (μ−1)(μ−2)/(n−1). Signs, runs and counts
      // are exact integers; consecutive pairing of the FILTERED delta
      // sequence rides a prefix-sum rank (never a global window).
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); one keyed day+1 join for deltas; one
      // prefix-sum round + one keyed rank+1 join for run boundaries.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val nxt = daily.select((col("day") - 1L).as("day"),
          col("x").as("x1"))
        val deltas = daily.join(nxt, "day")
          .filter(col("x1") =!= col("x"))
          .select(col("day"), (col("x1") > col("x")).cast("long").as("up"))
          .withColumn("one", lit(1L))
        val ranked = Shared.distributedPrefixSum(deltas, "day", "one")
          .select(col("up"), (col("cum") + 1L).as("rnk"))
          .checkpoint()
        val prev = ranked.select((col("rnk") + 1L).as("rnk"),
          col("up").as("up_prev"))
        val changes = ranked.join(prev, "rnk")
          .agg(sum((col("up") =!= col("up_prev")).cast("long")).as("chg"))
        ranked.agg(sum(col("up")).as("n_up"),
            sum(lit(1L) - col("up")).as("n_down"))
          .crossJoin(broadcast(changes))
          .select(col("n_up"), col("n_down"),
            (col("chg") + 1L).as("n_runs"))
          .withColumn("mu", expr(
            """2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
              / CAST(n_up + n_down AS DOUBLE) + 1.0"""))
          .withColumn("z_runs", expr(
            """(CAST(n_runs AS DOUBLE) - mu)
              / sqrt((mu - 1.0) * (mu - 2.0)
                / (CAST(n_up + n_down AS DOUBLE) - 1.0))"""))
          .drop("mu")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              deltas AS (SELECT a.day,
                  CASE WHEN b.x > a.x THEN 1 ELSE 0 END AS up
                FROM daily a JOIN daily b ON b.day = a.day + 1
                WHERE b.x <> a.x),
              ranked AS (SELECT up,
                  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rnk
                FROM deltas),
              chg AS (SELECT CAST(sum(CASE WHEN a.up <> b.up THEN 1
                    ELSE 0 END) AS BIGINT) AS chg
                FROM ranked a JOIN ranked b ON b.rnk = a.rnk + 1),
              f AS (SELECT CAST(sum(up) AS BIGINT) AS n_up,
                  CAST(sum(1 - up) AS BIGINT) AS n_down,
                  (SELECT chg FROM chg) + 1 AS n_runs
                FROM ranked),
              m AS (SELECT n_up, n_down, CAST(n_runs AS BIGINT) AS n_runs,
                  2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                    / CAST(n_up + n_down AS DOUBLE) + 1.0 AS mu
                FROM f)
              SELECT n_up, n_down, n_runs,
                (CAST(n_runs AS DOUBLE) - mu)
                  / sqrt((mu - 1.0) * (mu - 2.0)
                    / (CAST(n_up + n_down AS DOUBLE) - 1.0)) AS z_runs
              FROM m""")
    ),

    // ── EXACT SHAPLEY CHANNEL ATTRIBUTION ─────────────────────────────────
    QueryDef(
      "q404_shapley_attribution",
      // The game-theoretic attribution q214 (position) and q251 (decay)
      // approximate: Shapley values over the 3-channel lattice {click,
      // view, signup} with v(S) = purchase rate of users whose channel
      // set is EXACTLY S. The lattice is bounded (8 cells), so the
      // Shapley sum is closed-form: φᵢ = Σ_S w(|S|)·(v(S∪i) − v(S)),
      // w = (1/3, 1/6, 1/6, 1/3). Cells are exact conditional sums from
      // ONE user-grain pass; empty cells contribute v = 0 (documented);
      // each φ is one pinned block with shared (1/3, 1/6) literal text.
      //
      // Shape, and why it scales: one fact pass to the user grain, one
      // 8-cell pivot to a single row. Output is 1 row.
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max((col("event_type") === "click").cast("long")).as("hc"),
            max((col("event_type") === "view").cast("long")).as("hv"),
            max((col("event_type") === "signup").cast("long")).as("hs"),
            max((col("event_type") === "purchase").cast("long")).as("y"))
          .withColumn("cell",
            col("hc") + col("hv") * 2L + col("hs") * 4L)
        val pivCols = (0 to 7).flatMap(c => Seq(
          sum(when(col("cell") === c.toLong, 1L).otherwise(0L))
            .as(s"u$c"),
          sum(when(col("cell") === c.toLong, col("y")).otherwise(0L))
            .as(s"c$c")))
        val piv = users.agg(pivCols.head, pivCols.tail: _*)
        val withV = (0 to 7).foldLeft(piv) { (df, c) =>
          df.withColumn(s"v$c", expr(
            s"""coalesce(CAST(c$c AS DOUBLE)
              / CAST(nullif(u$c, 0) AS DOUBLE), 0.0)"""))
        }
        withV.select(
          expr("""(CAST(1.0 AS DOUBLE) / 3.0) * (v1 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v3 - v2)
            + (CAST(1.0 AS DOUBLE) / 6.0) * (v5 - v4) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v6)""")
            .as("phi_click"),
          expr("""(CAST(1.0 AS DOUBLE) / 3.0) * (v2 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v3 - v1)
            + (CAST(1.0 AS DOUBLE) / 6.0) * (v6 - v4) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v5)""")
            .as("phi_view"),
          expr("""(CAST(1.0 AS DOUBLE) / 3.0) * (v4 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v5 - v1)
            + (CAST(1.0 AS DOUBLE) / 6.0) * (v6 - v2) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v3)""")
            .as("phi_signup"),
          col("v7").as("v_all"), col("v0").as("v_none"))
      },
      Some(s"""WITH users AS (SELECT user_id,
                  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS hc,
                  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS hv,
                  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS hs,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS y
                FROM events GROUP BY 1),
              cells AS (SELECT hc + hv * 2 + hs * 4 AS cell, y
                FROM users),
              piv AS (SELECT
                  ${(0 to 7).map(c =>
                    s"""sum(CASE WHEN cell = $c THEN 1 ELSE 0 END) AS u$c,
                    sum(CASE WHEN cell = $c THEN y ELSE 0 END) AS c$c""")
                    .mkString(", ")}
                FROM cells),
              v AS (SELECT
                  ${(0 to 7).map(c =>
                    s"""coalesce(CAST(c$c AS DOUBLE)
                      / CAST(nullif(u$c, 0) AS DOUBLE), 0.0) AS v$c""")
                    .mkString(", ")}
                FROM piv)
              SELECT
                (CAST(1.0 AS DOUBLE) / 3.0) * (v1 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v3 - v2)
                  + (CAST(1.0 AS DOUBLE) / 6.0) * (v5 - v4) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v6)
                  AS phi_click,
                (CAST(1.0 AS DOUBLE) / 3.0) * (v2 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v3 - v1)
                  + (CAST(1.0 AS DOUBLE) / 6.0) * (v6 - v4) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v5)
                  AS phi_view,
                (CAST(1.0 AS DOUBLE) / 3.0) * (v4 - v0) + (CAST(1.0 AS DOUBLE) / 6.0) * (v5 - v1)
                  + (CAST(1.0 AS DOUBLE) / 6.0) * (v6 - v2) + (CAST(1.0 AS DOUBLE) / 3.0) * (v7 - v3)
                  AS phi_signup,
                v7 AS v_all, v0 AS v_none
              FROM v""")
    ),

    // ── GUMBEL BLOCK-MAXIMA FIT (EVT) ─────────────────────────────────────
    QueryDef(
      "q405_gumbel_maxima",
      // Extreme-value theory beside q388's Hill index: monthly maxima
      // of daily order revenue, fitted to a Gumbel by the method of
      // moments — β̂ = s·√6/π, μ̂ = m̄ − γβ̂ — plus the 12-block return
      // level μ̂ − β̂·ln(−ln(1 − 1/12)). Block maxima and both moment
      // sums are exact integers (Σm, Σm² in DECIMAL(38,0)); the fit is
      // one pinned block whose √6/π and γ literals are shared text.
      //
      // Shape, and why it scales: one fact pass to the day grain, one
      // hash agg to the month grain (calendar-bounded), a 1-row fold.
      (s, d) => {
        val dayCents = Tables.orders(s, d)
          .select((unix_timestamp(col("o_orderdate")) / 86400L)
            .cast("long").as("day"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("day").agg(sum(col("cents")).as("y"))
        val maxima = dayCents
          .groupBy(expr("day div 30").as("block"))
          .agg(max(col("y")).as("m"))
        maxima.agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
            sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("qm"))
          .withColumn("mbar",
            expr("CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("sd", expr(
            """sqrt((CAST(n AS DOUBLE) * CAST(qm AS DOUBLE)
                - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""))
          .withColumn("beta", expr("sd * 0.7796968012336609"))
          .withColumn("mu", expr("mbar - 0.5772156649015329 * beta"))
          .select(col("n").as("n_blocks"), col("mu").as("gumbel_mu"),
            col("beta").as("gumbel_beta"),
            expr("mu - beta * ln(-ln(1.0 - CAST(1.0 AS DOUBLE) / 12.0))")
              .as("return_level_12"))
      },
      Some("""WITH daily AS (SELECT
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS day,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS y
                FROM orders GROUP BY 1),
              maxima AS (SELECT day // 30 AS block, max(y) AS m
                FROM daily GROUP BY 1),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(m) AS BIGINT) AS sm,
                  sum(CAST(m AS DECIMAL(38,0)) * m) AS qm
                FROM maxima),
              g AS (SELECT n,
                  CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mbar,
                  sqrt((CAST(n AS DOUBLE) * CAST(qm AS DOUBLE)
                      - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                    AS sd
                FROM f),
              h AS (SELECT n, mbar, sd,
                  sd * 0.7796968012336609 AS beta
                FROM g),
              i AS (SELECT n, beta,
                  mbar - 0.5772156649015329 * beta AS mu
                FROM h)
              SELECT n AS n_blocks, mu AS gumbel_mu, beta AS gumbel_beta,
                mu - beta * ln(-ln(1.0 - CAST(1.0 AS DOUBLE) / 12.0)) AS return_level_12
              FROM i""")
    ),

    // ── RANK-BIASED OVERLAP OF TWO RANKERS ────────────────────────────────
    QueryDef(
      "q406_rbo",
      // Do the lexical and vector retrieval systems agree? Truncated
      // RBO@10 (p = 0.9) between the BM25 top-10 (the q305/q306 shared
      // candidate stage) and the cosine top-10 for query doc 0:
      // RBO = Σ_d (1−p)p^(d−1)·|A_d ∩ B_d|/d. Depth overlaps are exact
      // integers from a 10×10 bounded rank join; the weighted sum is
      // ONE pinned block whose ten weight literals are generated once
      // and shared by both engines.
      //
      // Shape, and why it scales: stage 1 rides the memoized/checkpointed
      // BM25 candidates; the cosine top-10 is the q41 broadcast-brute
      // baseline; everything after runs on 10-row sets.
      (s, d) => Shared.withCheckpointDir(s) {
        val wA = Window.orderBy(col("bm25").desc, col("doc_id").asc)
        val a = ExtQueries.bm25Top50(s, d)
          .withColumn("ra", row_number().over(wA).cast("long"))
          .filter(col("ra") <= 10L)
          .select(col("doc_id"), col("ra"))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
          .select(col("embedding").as("qv"))
        val wB = Window.orderBy(col("cosine").desc, col("vec_id").asc)
        val b = Tables.embeddings(s, d)
          .filter(col("vec_id") =!= 0L)
          .select(col("vec_id"), col("embedding").as("dv"))
          .crossJoin(broadcast(qv))
          .withColumn("cosine",
            graft.functions.vec.dot(col("qv"), col("dv")) /
              (graft.functions.vec.norm(col("qv")) *
                graft.functions.vec.norm(col("dv"))))
          // TakeOrdered-10 first (no global sort), THEN rank the
          // 10-row model set — the window never sees the corpus
          .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
          .withColumn("rb", row_number().over(wB).cast("long"))
          .select(col("vec_id").as("doc_id"), col("rb"))
        val joined = a.join(b, Seq("doc_id"), "inner")
        // an empty overlap join sums to NULL — coalesce every depth to 0
        val ovs = joined.agg(
            sum(when(col("ra") <= 1L && col("rb") <= 1L, 1L).otherwise(0L))
              .as("ov1"),
            (2 to 10).map(dd =>
              sum(when(col("ra") <= dd.toLong && col("rb") <= dd.toLong,
                1L).otherwise(0L)).as(s"ov$dd")): _*)
          .select((1 to 10).map(dd =>
            coalesce(col(s"ov$dd"), lit(0L)).as(s"ov$dd")): _*)
        ovs.select(col("ov10").as("overlap_at_10"),
          expr(rboTermSql).as("rbo_10"))
      },
      Some(s"""WITH ${ExtQueries.SQL_BM25_CAND},
              a AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                    AS BIGINT) AS ra
                FROM cand ORDER BY bm25 DESC, doc_id LIMIT 10),
              qv AS (SELECT embedding AS qv FROM embeddings
                WHERE vec_id = 0),
              b0 AS (SELECT vec_id AS doc_id,
                  ${ExtQueries.SQL_DOT_EXT("qv", "embedding")} /
                    (${ExtQueries.SQL_NORM_EXT("qv")}
                      * ${ExtQueries.SQL_NORM_EXT("embedding")}) AS cosine
                FROM embeddings CROSS JOIN qv
                WHERE vec_id <> 0),
              b AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
                    AS BIGINT) AS rb
                FROM b0 ORDER BY cosine DESC, doc_id LIMIT 10),
              j AS (SELECT ra, rb FROM a JOIN b USING (doc_id)),
              ovs AS (SELECT
                  ${(1 to 10).map(dd =>
                    s"""CAST(coalesce(sum(CASE WHEN ra <= $dd AND rb <= $dd
                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ov$dd""")
                    .mkString(", ")}
                FROM j)
              SELECT ov10 AS overlap_at_10, $rboTermSql AS rbo_10
              FROM ovs""")
    ),

    // ── HAAR WAVELET ENERGY DECOMPOSITION ─────────────────────────────────
    QueryDef(
      "q407_haar_energy",
      // Which timescale carries the variance? Haar detail energy of the
      // daily event-count series at dyadic levels 1–3: at level ℓ the
      // detail is (left-half sum − right-half sum) over complete 2^ℓ-day
      // blocks, a pure integer; the energy Σdetail² accumulates as
      // DECIMAL(38,0). No padding tricks — incomplete blocks are
      // excluded per level (documented; counts reported).
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); one hash agg per level (3); output is
      // 3 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val levels = (1 to 3).map { l =>
          val span = 1L << l
          val half = 1L << (l - 1)
          daily
            .groupBy(expr(s"day div ${span}L").as("block"))
            .agg(count(lit(1)).as("cnt"),
              sum(when(expr(s"(day div ${half}L) % 2") === 0L, col("x"))
                .otherwise(0L)).as("left"),
              sum(when(expr(s"(day div ${half}L) % 2") =!= 0L, col("x"))
                .otherwise(0L)).as("right"))
            .filter(col("cnt") === span)
            .agg(count(lit(1)).as("n_blocks"),
              sum(expr("""CAST(left - right AS DECIMAL(38,0))
                * (left - right)""")).as("en"))
            .select(lit(l.toLong).as("level"), col("n_blocks"),
              expr("CAST(en AS BIGINT)").as("energy"))
        }
        levels.reduce(_ unionAll _).orderBy("level")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              lv AS (SELECT l FROM (SELECT unnest(range(1, 4)) AS l)),
              blocks AS (SELECT l, day // (1 << l) AS block,
                  count(*) AS cnt,
                  sum(CASE WHEN (day // (1 << (l - 1))) % 2 = 0
                    THEN x ELSE 0 END) AS lft,
                  sum(CASE WHEN (day // (1 << (l - 1))) % 2 <> 0
                    THEN x ELSE 0 END) AS rgt
                FROM daily CROSS JOIN lv
                GROUP BY 1, 2),
              f AS (SELECT l, count(*) AS n_blocks,
                  sum(CAST(lft - rgt AS DECIMAL(38,0)) * (lft - rgt))
                    AS en
                FROM blocks WHERE cnt = (1 << l)
                GROUP BY 1)
              SELECT CAST(l AS BIGINT) AS level,
                CAST(n_blocks AS BIGINT) AS n_blocks,
                CAST(en AS BIGINT) AS energy
              FROM f ORDER BY level""")
    ),

    // ── SOURCE-EXPOSURE SHARE IN THE RETRIEVAL PANEL ──────────────────────
    QueryDef(
      "q408_exposure_share",
      // The retrieval fairness audit on q384's panel: position-weighted
      // exposure per candidate SOURCE across the 10-query top-10
      // results, against each source's share of the corpus (the
      // "fair" baseline). Discounts are INTEGER micro literals
      // floor(10⁶/log₂(r+1)) generated once for both engines, so
      // exposure sums are pure BIGINT and shares are integer ppm.
      //
      // Shape, and why it scales: the panel is q384's broadcast-brute
      // baseline (IVF route at corpus scale); exposure and the corpus
      // census are two hash aggregations. Output is ≤|sources| rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val qs = broadcast(Tables.embeddings(s, d)
          .filter(col("vec_id") < 10L)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")))
        val w = Window.partitionBy("qid")
          .orderBy(col("cosine").desc, col("vec_id").asc)
        val top = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("dv"))
          .crossJoin(qs)
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cosine",
            graft.functions.vec.dot(col("qv"), col("dv")) /
              (graft.functions.vec.norm(col("qv")) *
                graft.functions.vec.norm(col("dv"))))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 10L)
        val expo = top.join(Tables.documents(s, d)
            .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
          .withColumn("disc", expr(discCaseSql))
          .groupBy("source")
          .agg(count(lit(1)).as("n_hits"), sum(col("disc")).as("em"))
          .checkpoint()
        val totE = expo.agg(sum(col("em")).as("te"))
        val census = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
        val totD = census.agg(sum(col("n_docs")).as("td"))
        expo.join(census, "source")
          .crossJoin(broadcast(totE)).crossJoin(broadcast(totD))
          .select(col("source"), col("n_hits"),
            expr("em * 1000000L div te").as("exposure_ppm"),
            expr("n_docs * 1000000L div td").as("doc_share_ppm"))
          .orderBy("source")
      },
      Some(s"""WITH qs AS (SELECT vec_id AS qid, embedding AS qv
                FROM embeddings WHERE vec_id < 10),
              c AS (SELECT qid, vec_id,
                  ${ExtQueries.SQL_DOT_EXT("qv", "dv")} /
                    (${ExtQueries.SQL_NORM_EXT("qv")}
                      * ${ExtQueries.SQL_NORM_EXT("dv")}) AS cosine
                FROM (SELECT vec_id, embedding AS dv FROM embeddings)
                CROSS JOIN qs
                WHERE vec_id <> qid),
              r AS (SELECT qid, vec_id, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cosine DESC, vec_id)
                  AS BIGINT) AS rnk
                FROM c),
              t AS (SELECT source, $discCaseSql AS disc
                FROM r JOIN documents ON doc_id = vec_id
                WHERE rnk <= 10),
              expo AS (SELECT source, CAST(count(*) AS BIGINT) AS n_hits,
                  CAST(sum(disc) AS BIGINT) AS em
                FROM t GROUP BY 1),
              te AS (SELECT sum(em) AS te FROM expo),
              census AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY 1),
              td AS (SELECT sum(n_docs) AS td FROM census)
              SELECT source, n_hits,
                CAST(em * 1000000 // te AS BIGINT) AS exposure_ppm,
                CAST(n_docs * 1000000 // td AS BIGINT) AS doc_share_ppm
              FROM expo JOIN census USING (source), te, td
              ORDER BY source""")
    )
  )
}
