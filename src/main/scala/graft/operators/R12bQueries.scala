package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-12 batch 2: the training-MIX toolkit — the decisions a
  * pretraining data team makes AFTER curation: temperature-scaled
  * sampling weights per source, a scaling-law (log-log OLS) fit over the
  * source panel, DoReMi-style multiplicative-weights domain reweighting,
  * exact water-filling token-budget allocation, the quality×dedup Pareto
  * sweep, and the KL divergence the temperature mix induces against the
  * raw token distribution.
  *
  * Everything operates at the SOURCE grain (model-sized at any corpus
  * scale): one corpus pass (or a memo read) builds the panel, every
  * derived quantity is exact-integer or a pinned double block with
  * expression text shared verbatim with the oracle.
  */
object R12bQueries {

  import Shared._

  /** per-source token/doc/quality panel shared by q443–q448: n_docs,
    * n_tokens (whitespace), n_fail (q33's exact alpha-ratio gate,
    * failing side) — ONE corpus pass, mirrored verbatim in SQL
    */
  private def sourcePanel(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("nt"),
        (!(length(col("text")).between(100, 400) &&
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")) * 4 >
            length(col("text")) * 3)).cast("long").as("fail"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("fail")).as("n_fail"))

  private val SQL_PANEL =
    s"""panel AS (SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len($SQL_TOKENS)) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN length(text) BETWEEN 100 AND 400
              AND length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 4
                > length(text) * 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
        FROM documents GROUP BY 1)"""

  /** the pinned temperature-share expression (α = 0.5, i.e. T = 2):
    * shares of sqrt(tokens), exact DECIMAL sums of 6-decimal-rounded
    * roots, ONE double division micro-floored — text shared verbatim
    */
  private val SQL_TEMP_MICRO =
    "CAST(floor(1e6 * CAST(ssq AS DOUBLE) / CAST(tssq AS DOUBLE)) AS BIGINT)"

  val all: Seq[QueryDef] = Seq(

    // ── TEMPERATURE-SCALED SAMPLING MIX (α = 0.5) ─────────────────────────
    QueryDef(
      "q443_temperature_mix",
      // The multilingual-LM sampling rule (α-smoothed source weights,
      // the mBERT/XLM-R exponent family at α = 0.5): small sources get
      // upsampled relative to their raw token share, large ones
      // downsampled. Raw shares are exact integer ppm; the α = 0.5
      // weight is sqrt(tokens) — each root rounded to 6 decimals and
      // cast DECIMAL so the TOTAL is an exact order-free sum, then ONE
      // pinned double division per source, micro-floored.
      //
      // Shape, and why it scales: one corpus pass to the source grain;
      // the totals row broadcasts back onto ≤|sources| rows.
      (s, d) => {
        val p = sourcePanel(s, d)
          .withColumn("ssq", round(sqrt(col("n_tokens").cast("double")), 6)
            .cast(DecimalType(18, 6)))
        val tot = p.agg(sum(col("n_tokens")).as("ttok"),
          sum(col("ssq")).as("tssq"))
        p.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            expr("n_tokens * 1000000L div ttok").as("p_raw_ppm"),
            expr(SQL_TEMP_MICRO).as("p_temp_micro"))
      },
      Some(s"""WITH $SQL_PANEL,
              px AS (SELECT source, n_tokens,
                  CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS ssq
                FROM panel),
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok,
                  CAST(sum(ssq) AS DECIMAL(18,6)) AS tssq FROM px)
              SELECT source, n_tokens,
                CAST(n_tokens * 1000000 // ttok AS BIGINT) AS p_raw_ppm,
                $SQL_TEMP_MICRO AS p_temp_micro
              FROM px, tot""")
    ),

    // ── SCALING-LAW FIT (log-log OLS over the source panel) ───────────────
    QueryDef(
      "q444_scaling_law_fit",
      // The Chinchilla-style diagnostic on observational data: regress
      // ln(quality-failure rate) on ln(tokens) across sources — the
      // slope says whether bigger sources come cleaner (economies of
      // curation) or dirtier. Each point's logs are micro-floored
      // row-locally (exact BIGINTs), moments accumulate as exact
      // DECIMAL(38,0), slope and intercept are pinned double blocks
      // (intercept re-states the slope formula inline — one shared
      // text, the q436 discipline), NULL on a degenerate panel.
      //
      // Shape, and why it scales: the regression runs on the
      // source-grain panel — one corpus pass, then model-sized algebra.
      (s, d) => {
        val pts = sourcePanel(s, d)
          .select(
            expr("CAST(floor(1e6 * ln(CAST(n_tokens AS DOUBLE))) AS BIGINT)")
              .as("x"),
            expr("""CAST(floor(1e6 * ln(CAST(n_fail * 1000000 div n_docs
              + 1 AS DOUBLE))) AS BIGINT)""").as("y"))
        val m = pts.agg(count(lit(1)).as("n"),
          sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        m.select(col("n").as("n_points"),
          expr("""CASE WHEN n * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
            ELSE (n * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (n * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END""").as("slope"),
          expr("""CASE WHEN n * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (n * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE)) / n END""").as("intercept"))
      },
      Some(s"""WITH $SQL_PANEL,
              pts AS (SELECT
                  CAST(floor(1e6 * ln(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    AS x,
                  CAST(floor(1e6 * ln(CAST(n_fail * 1000000 // n_docs
                    + 1 AS DOUBLE))) AS BIGINT) AS y
                FROM panel),
              m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
                  CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
                  CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
                  CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
                FROM pts)
              SELECT n AS n_points,
                CASE WHEN n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
                  ELSE (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
                CASE WHEN n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
                  ELSE (CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n END AS intercept
              FROM m""")
    ),

    // ── DoReMi-LITE DOMAIN REWEIGHTING (multiplicative weights) ───────────
    QueryDef(
      "q445_doremi_lite",
      // The domain-reweighting loop (Xie et al.'s DoReMi, the
      // excess-loss-driven multiplicative-weights shape) in EXACT
      // integer milli-weights: each source's excess signal is its
      // quality-failure rate minus the corpus rate (ppm, can be
      // negative), and three unrolled rounds multiply w by
      // (1e6 + excess) then renormalize to mean 1000 by integer
      // division — deterministic truncation both engines compute
      // identically (the q304 raking discipline).
      //
      // Shape, and why it scales: the loop grain is the source panel —
      // model-sized at any corpus scale; each round is one tiny
      // aggregation + a broadcast-back join.
      (s, d) => {
        val corp = sourcePanel(s, d)
        val tot = corp.agg(sum(col("n_fail")).as("tf"),
          sum(col("n_docs")).as("td"))
        var w = corp.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_fail"),
            expr("n_fail * 1000000L div n_docs - tf * 1000000L div td")
              .as("excess_ppm"),
            lit(1000L).as("w"))
        for (_ <- 1 to 3) {
          val u = w.withColumn("u", col("w") * (lit(1000000L) + col("excess_ppm")))
          val su = u.agg(sum(col("u")).as("su"), count(lit(1)).as("ns"))
          w = u.crossJoin(broadcast(su))
            .select(col("source"), col("n_docs"), col("n_fail"),
              col("excess_ppm"),
              expr("u * 1000L * ns div su").as("w"))
        }
        w.select(col("source"), col("excess_ppm"), col("w").as("w_milli"))
      },
      Some(s"""WITH $SQL_PANEL,
              tot AS (SELECT CAST(sum(n_fail) AS BIGINT) AS tf,
                  CAST(sum(n_docs) AS BIGINT) AS td FROM panel),
              w0 AS (SELECT source,
                  CAST(n_fail * 1000000 // n_docs
                    - tf * 1000000 // td AS BIGINT) AS excess_ppm,
                  CAST(1000 AS BIGINT) AS w
                FROM panel, tot),
              ${(1 to 3).map { r =>
                s"""u$r AS (SELECT source, excess_ppm,
                    w * (1000000 + excess_ppm) AS u FROM w${r - 1}),
                  s$r AS (SELECT CAST(sum(u) AS BIGINT) AS su,
                    CAST(count(*) AS BIGINT) AS ns FROM u$r),
                  w$r AS (SELECT source, excess_ppm,
                    CAST(u * 1000 * ns // su AS BIGINT) AS w
                  FROM u$r, s$r)"""
              }.mkString(",\n")}
              SELECT source, excess_ppm, w AS w_milli FROM w3""")
    ),

    // ── EXACT WATER-FILLING TOKEN-BUDGET ALLOCATION ───────────────────────
    QueryDef(
      "q446_token_budget_allocation",
      // Allocate a token budget B = total/4 across sources with a
      // fairness level: every source gets min(its tokens, L), L the
      // exact water level, and the integer remainder goes one token at
      // a time to the smallest unfilled sources — Σ alloc = B EXACTLY.
      // The level falls out of the classic sorted-prefix construction:
      // sort sources by size, a source is fully absorbed iff filling it
      // and every larger source to its size still fits the budget, and
      // the survivors split the remainder by integer division. Every
      // step is integer arithmetic on the sorted panel.
      //
      // Shape, and why it scales: the sort/window grain is the source
      // panel (model-sized — the one place a single-partition window is
      // the honest plan); the corpus is touched once for the panel.
      (s, d) => {
        val p = sourcePanel(s, d).select("source", "n_tokens")
        val tot = p.agg(sum(col("n_tokens")).as("tt"),
          count(lit(1)).as("ns"))
        val wOrd = Window.orderBy(col("n_tokens").asc, col("source").asc)
        val ranked = p.crossJoin(broadcast(tot))
          .withColumn("b", expr("tt div 4L"))
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("pfx", coalesce(sum(col("n_tokens")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("isfull",
            col("pfx") + col("n_tokens") * (col("ns") - col("rn") + 1L) <=
              col("b"))
        val k = ranked.agg(
          sum(when(col("isfull"), 1L).otherwise(0L)).as("k"),
          sum(when(col("isfull"), col("n_tokens")).otherwise(0L)).as("pk"))
        ranked.crossJoin(broadcast(k))
          .withColumn("alloc", expr(
            """CASE WHEN isfull THEN n_tokens
              ELSE (b - pk) div (ns - k)
                + (CASE WHEN rn - k <= (b - pk) % (ns - k)
                   THEN 1L ELSE 0L END) END"""))
          .select(col("source"), col("n_tokens"), col("alloc"),
            expr("alloc * 1000L div n_tokens").as("rate_milli"))
      },
      Some(s"""WITH $SQL_PANEL,
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
                  CAST(count(*) AS BIGINT) AS ns FROM panel),
              rk AS (SELECT source, n_tokens, tt // 4 AS b, ns,
                  CAST(row_number() OVER (ORDER BY n_tokens, source)
                    AS BIGINT) AS rn,
                  CAST(coalesce(sum(n_tokens) OVER (
                    ORDER BY n_tokens, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS pfx
                FROM panel, tot),
              fl AS (SELECT *,
                  pfx + n_tokens * (ns - rn + 1) <= b AS isfull FROM rk),
              kk AS (SELECT CAST(sum(CASE WHEN isfull THEN 1 ELSE 0 END)
                    AS BIGINT) AS k,
                  CAST(sum(CASE WHEN isfull THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS pk
                FROM fl),
              al AS (SELECT source, n_tokens,
                  CASE WHEN isfull THEN n_tokens
                    ELSE (b - pk) // (ns - k)
                      + (CASE WHEN rn - k <= (b - pk) % (ns - k)
                         THEN 1 ELSE 0 END) END AS alloc
                FROM fl, kk)
              SELECT source, n_tokens, CAST(alloc AS BIGINT) AS alloc,
                CAST(alloc * 1000 // n_tokens AS BIGINT) AS rate_milli
              FROM al""")
    ),

    // ── QUALITY × DEDUP PARETO SWEEP ──────────────────────────────────────
    QueryDef(
      "q447_quality_dedup_pareto",
      // The curve a curation team actually trades along: tightening the
      // alpha-ratio quality gate (thresholds t/4, t = 0..3 — t = 3 is
      // q33's production rule) shrinks the corpus AND shifts its
      // near-dup exposure. Per threshold: surviving docs, tokens, and
      // survivors inside ANY winnow near-dup cluster (the memoized q158
      // labels, broadcast — the q433 discipline). One corpus pass with
      // a 4-way threshold explode; all exact integers.
      //
      // Shape, and why it scales: thresholds explode INSIDE codegen on
      // the doc grain (4×, constant), labels broadcast (pair-graph-
      // bounded), one aggregation to 4 rows.
      (s, d) => {
        val lab = TextQueries.winnowComponents(s, d)
          .select(col("id").as("doc_id")).withColumn("dup", lit(1L))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("nt"),
            length(col("text")).cast("long").as("len"),
            length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
              .cast("long").as("alpha"))
          .join(broadcast(lab), Seq("doc_id"), "left")
          .select(col("nt"), col("len"), col("alpha"),
            coalesce(col("dup"), lit(0L)).as("dup"),
            explode(typedlit(Seq(0L, 1L, 2L, 3L))).as("t"))
          .filter(col("alpha") * 4 > col("t") * col("len"))
          .groupBy("t")
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
            sum(col("dup")).as("n_neardup"))
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
           wcomp AS (SELECT DISTINCT id FROM reach),
           base AS (SELECT d.doc_id,
               CAST(len($SQL_TOKENS) AS BIGINT) AS nt,
               CAST(length(text) AS BIGINT) AS len,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 AS BIGINT) AS alpha,
               CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS dup
             FROM documents d LEFT JOIN wcomp c ON d.doc_id = c.id),
           sw AS (SELECT base.*, CAST(t AS BIGINT) AS t
             FROM base, unnest(range(4)) u(t))
           SELECT t, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(dup) AS BIGINT) AS n_neardup
           FROM sw WHERE alpha * 4 > t * len
           GROUP BY 1""")
    ),

    // ── MIX-INDUCED KL DRIFT ──────────────────────────────────────────────
    QueryDef(
      "q448_mix_kl_drift",
      // How far does the α = 0.5 temperature mix (q443's exact shares)
      // pull sampling away from the raw token distribution? Per-source
      // KL contribution p·ln(p/q) with p = temperature share, q = raw
      // share — both exact integers from q443's formulas, the ln a
      // row-local pinned double micro-floored (the q410 mutual-
      // information discipline). Negative contributions are real
      // (sources the mix downsamples); Σ ≥ 0 by Gibbs.
      //
      // Shape, and why it scales: source-grain algebra on the panel.
      (s, d) => {
        val p = sourcePanel(s, d)
          .withColumn("ssq", round(sqrt(col("n_tokens").cast("double")), 6)
            .cast(DecimalType(18, 6)))
        val tot = p.agg(sum(col("n_tokens")).as("ttok"),
          sum(col("ssq")).as("tssq"))
        p.crossJoin(broadcast(tot))
          .select(col("source"),
            expr("n_tokens * 1000000L div ttok").as("p_raw_ppm"),
            expr(SQL_TEMP_MICRO).as("p_temp_micro"))
          .withColumn("kl_contrib_micro", expr(
            """CASE WHEN p_temp_micro > 0 AND p_raw_ppm > 0
              THEN CAST(floor(1e6 * (CAST(p_temp_micro AS DOUBLE) / 1e6)
                * ln((CAST(p_temp_micro AS DOUBLE) / 1e6)
                  / (CAST(p_raw_ppm AS DOUBLE) / 1e6))) AS BIGINT)
              ELSE 0 END"""))
      },
      Some(s"""WITH $SQL_PANEL,
              px AS (SELECT source, n_tokens,
                  CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS ssq
                FROM panel),
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ttok,
                  CAST(sum(ssq) AS DECIMAL(18,6)) AS tssq FROM px),
              sh AS (SELECT source,
                  CAST(n_tokens * 1000000 // ttok AS BIGINT) AS p_raw_ppm,
                  $SQL_TEMP_MICRO AS p_temp_micro
                FROM px, tot)
              SELECT source, p_raw_ppm, p_temp_micro,
                CASE WHEN p_temp_micro > 0 AND p_raw_ppm > 0
                  THEN CAST(floor(1e6 * (CAST(p_temp_micro AS DOUBLE) / 1e6)
                    * ln((CAST(p_temp_micro AS DOUBLE) / 1e6)
                      / (CAST(p_raw_ppm AS DOUBLE) / 1e6))) AS BIGINT)
                  ELSE 0 END AS kl_contrib_micro
              FROM sh""")
    )
  )
}
