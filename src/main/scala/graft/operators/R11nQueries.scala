package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 16: structural-break, dependence, dedup-health,
  * epidemiology, seasonality and tokenizer-design completions — the
  * Chow structural-break test (did the revenue trend change at the
  * midpoint?), categorical mutual information with normalized MI (the
  * dependence audit between label columns), the near-dup component
  * census (the dedup blast-radius report on the winnow graph), odds
  * ratio + relative risk with the Woolf CI (the 2×2 epidemiology pair
  * q348/q349 lead to), weekday seasonality strength as one-way ANOVA
  * η² (how much of daily variance is day-of-week?), and the top-k
  * vocabulary coverage curve (the tokenizer-budget design table).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) moments and
  * contingency cells, row-local micro-floored p·ln terms before any
  * cross-row sum, SSE identities instead of materialized residuals,
  * one pinned double block per statistic.
  */
object R11nQueries {

  import Shared._

  /** the q380 SSE identity on n²-scaled moments, parameterized by a
    * column suffix: SSE·n² = Syy − Sxy²/Sxx. */
  private def sseSql(sfx: String): String =
    s"""(CAST(syy$sfx AS DOUBLE)
      - CAST(sxy$sfx AS DOUBLE) * CAST(sxy$sfx AS DOUBLE)
        / CAST(nullif(sxx$sfx, 0) AS DOUBLE))
      / (CAST(n$sfx AS DOUBLE) * CAST(n$sfx AS DOUBLE))"""

  val all: Seq[QueryDef] = Seq(

    // ── CHOW STRUCTURAL-BREAK TEST ────────────────────────────────────────
    QueryDef(
      "q409_chow_test",
      // Did the daily-revenue trend change? The Chow test at the
      // calendar midpoint: fit y ~ day on each half and pooled, F =
      // ((SSE_p − SSE_1 − SSE_2)/k) / ((SSE_1 + SSE_2)/(n−2k)), k = 2.
      // No residual ever materializes — each SSE is the q380 identity
      // (Syy − Sxy²/Sxx)/n² on exact n²-scaled DECIMAL(38,0) moments,
      // computed for both halves AND pooled in ONE conditional
      // aggregation pass over the day grain.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); one 1-row sums broadcast; one moments
      // aggregation; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val daily = Tables.orders(s, d)
          .select((unix_timestamp(col("o_orderdate")) / 86400L)
            .cast("long").as("day"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("day").agg(sum(col("cents")).as("y"))
          .checkpoint()
        val sums = daily.agg(count(lit(1)).as("n"),
          min(col("day")).as("dmin"), max(col("day")).as("dmax"),
          sum(col("day")).as("sx"), sum(col("y")).as("sy"))
        val seg = daily.crossJoin(broadcast(sums))
          .withColumn("g",
            (col("day") <= expr("(dmin + dmax) div 2")).cast("long"))
        val gs = seg.groupBy("g")
          .agg(count(lit(1)).as("ng"), sum(col("day")).as("sxg"),
            sum(col("y")).as("syg"))
        def moms(sfx: String, flag: Column, nc: String, sxc: String,
            syc: String) = Seq(
          sum(when(flag, expr(s"""CAST($nc * day - $sxc AS DECIMAL(38,0))
            * ($nc * day - $sxc)"""))).as(s"sxx$sfx"),
          sum(when(flag, expr(s"""CAST($nc * day - $sxc AS DECIMAL(38,0))
            * ($nc * y - $syc)"""))).as(s"sxy$sfx"),
          sum(when(flag, expr(s"""CAST($nc * y - $syc AS DECIMAL(38,0))
            * ($nc * y - $syc)"""))).as(s"syy$sfx"))
        val withG = seg.join(broadcast(gs.filter(col("g") === 1L)
            .select(col("ng").as("n1"), col("sxg").as("sx1"),
              col("syg").as("sy1"))), lit(true))
          .join(broadcast(gs.filter(col("g") === 0L)
            .select(col("ng").as("n2"), col("sxg").as("sx2"),
              col("syg").as("sy2"))), lit(true))
        val momCols = moms("p", lit(true), "n", "sx", "sy") ++
          moms("1", col("g") === 1L, "n1", "sx1", "sy1") ++
          moms("2", col("g") === 0L, "n2", "sx2", "sy2") ++
          Seq(max(col("n")).as("np"), max(col("n1")).as("n1v"),
            max(col("n2")).as("n2v"))
        val mom = withG.agg(momCols.head, momCols.tail: _*)
          .withColumn("n1", col("n1v")).withColumn("n2", col("n2v"))
        mom
          .withColumn("ssep", expr(sseSql("p")))
          .withColumn("sse1", expr(sseSql("1")))
          .withColumn("sse2", expr(sseSql("2")))
          .select(col("np").as("n_days"), col("n1").as("n_first"),
            col("n2").as("n_second"),
            expr("""((ssep - sse1 - sse2) / 2.0)
              / ((sse1 + sse2) / (CAST(np AS DOUBLE) - 4.0))""")
              .as("f_chow"))
      },
      Some("""WITH daily AS (SELECT
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS day,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS y
                FROM orders GROUP BY 1),
              sums AS (SELECT count(*) AS n, min(day) AS dmin,
                  max(day) AS dmax, sum(day) AS sx, sum(y) AS sy
                FROM daily),
              seg AS (SELECT day, y,
                  CASE WHEN day <= (dmin + dmax) // 2 THEN 1 ELSE 0 END
                    AS g, n, sx, sy
                FROM daily, sums),
              gs AS (SELECT g, count(*) AS ng, sum(day) AS sxg,
                  sum(y) AS syg
                FROM seg GROUP BY 1),
              g1 AS (SELECT ng AS n1, sxg AS sx1, syg AS sy1 FROM gs
                WHERE g = 1),
              g2 AS (SELECT ng AS n2, sxg AS sx2, syg AS sy2 FROM gs
                WHERE g = 0),
              mom AS (SELECT max(n) AS np, max(n1) AS n1, max(n2) AS n2,
                  sum(CAST(n * day - sx AS DECIMAL(38,0)) * (n * day - sx))
                    AS sxxp,
                  sum(CAST(n * day - sx AS DECIMAL(38,0)) * (n * y - sy))
                    AS sxyp,
                  sum(CAST(n * y - sy AS DECIMAL(38,0)) * (n * y - sy))
                    AS syyp,
                  sum(CASE WHEN g = 1 THEN
                    CAST(n1 * day - sx1 AS DECIMAL(38,0))
                    * (n1 * day - sx1) END) AS sxx1,
                  sum(CASE WHEN g = 1 THEN
                    CAST(n1 * day - sx1 AS DECIMAL(38,0))
                    * (n1 * y - sy1) END) AS sxy1,
                  sum(CASE WHEN g = 1 THEN
                    CAST(n1 * y - sy1 AS DECIMAL(38,0))
                    * (n1 * y - sy1) END) AS syy1,
                  sum(CASE WHEN g = 0 THEN
                    CAST(n2 * day - sx2 AS DECIMAL(38,0))
                    * (n2 * day - sx2) END) AS sxx2,
                  sum(CASE WHEN g = 0 THEN
                    CAST(n2 * day - sx2 AS DECIMAL(38,0))
                    * (n2 * y - sy2) END) AS sxy2,
                  sum(CASE WHEN g = 0 THEN
                    CAST(n2 * y - sy2 AS DECIMAL(38,0))
                    * (n2 * y - sy2) END) AS syy2
                FROM seg, g1, g2),
              sse AS (SELECT np, n1, n2,
                  (CAST(syyp AS DOUBLE) - CAST(sxyp AS DOUBLE)
                    * CAST(sxyp AS DOUBLE)
                    / CAST(nullif(sxxp, 0) AS DOUBLE))
                    / (CAST(np AS DOUBLE) * CAST(np AS DOUBLE)) AS ssep,
                  (CAST(syy1 AS DOUBLE) - CAST(sxy1 AS DOUBLE)
                    * CAST(sxy1 AS DOUBLE)
                    / CAST(nullif(sxx1, 0) AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS sse1,
                  (CAST(syy2 AS DOUBLE) - CAST(sxy2 AS DOUBLE)
                    * CAST(sxy2 AS DOUBLE)
                    / CAST(nullif(sxx2, 0) AS DOUBLE))
                    / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS sse2
                FROM mom)
              SELECT CAST(np AS BIGINT) AS n_days,
                CAST(n1 AS BIGINT) AS n_first,
                CAST(n2 AS BIGINT) AS n_second,
                ((ssep - sse1 - sse2) / 2.0)
                  / ((sse1 + sse2) / (CAST(np AS DOUBLE) - 4.0)) AS f_chow
              FROM sse""")
    ),

    // ── CATEGORICAL MUTUAL INFORMATION ────────────────────────────────────
    QueryDef(
      "q410_mutual_information",
      // How dependent are the label columns? I(priority; status) from
      // the exact 5×3 contingency grid: each cell's p·ln(pN²/(n_x·n_y))
      // term is a ROW-LOCAL pinned double from exact integers,
      // micro-floored before the BIGINT sum (q348's per-cell
      // discipline); marginal entropies ride the same pass, and NMI =
      // I/min(H_x, H_y) is one pinned block.
      //
      // Shape, and why it scales: one fact pass to the bounded grid;
      // marginals broadcast back onto it; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val cells = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("x"),
            col("o_orderstatus").as("y"))
          .agg(count(lit(1)).as("nxy"))
          .checkpoint()
        val mx = cells.groupBy("x").agg(sum(col("nxy")).as("nx"))
        val my = cells.groupBy("y").agg(sum(col("nxy")).as("ny"))
        val tot = cells.agg(sum(col("nxy")).as("nn"))
        val terms = cells.join(broadcast(mx), "x")
          .join(broadcast(my), "y")
          .crossJoin(broadcast(tot))
          .withColumn("mi_micro", expr(
            """CAST(floor(1e6 * CAST(nxy AS DOUBLE) / CAST(nn AS DOUBLE)
              * ln(CAST(nxy AS DOUBLE) * CAST(nn AS DOUBLE)
                / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))))
              AS BIGINT)"""))
        val hx = mx.crossJoin(broadcast(tot))
          .agg(sum(expr("""CAST(floor(1e6 * CAST(nx AS DOUBLE)
            / CAST(nn AS DOUBLE) * ln(CAST(nn AS DOUBLE)
            / CAST(nx AS DOUBLE))) AS BIGINT)""")).as("hx_micro"))
        val hy = my.crossJoin(broadcast(tot))
          .agg(sum(expr("""CAST(floor(1e6 * CAST(ny AS DOUBLE)
            / CAST(nn AS DOUBLE) * ln(CAST(nn AS DOUBLE)
            / CAST(ny AS DOUBLE))) AS BIGINT)""")).as("hy_micro"))
        terms.agg(count(lit(1)).as("n_cells"),
            sum(col("mi_micro")).as("mi_m"))
          .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
          .select(col("n_cells"),
            expr("CAST(mi_m AS DOUBLE) / 1e6").as("mi_nats"),
            expr("CAST(hx_micro AS DOUBLE) / 1e6").as("h_priority"),
            expr("CAST(hy_micro AS DOUBLE) / 1e6").as("h_status"),
            expr("""(CAST(mi_m AS DOUBLE) / 1e6)
              / least(CAST(hx_micro AS DOUBLE) / 1e6,
                CAST(hy_micro AS DOUBLE) / 1e6)""").as("nmi"))
      },
      Some("""WITH cells AS (SELECT o_orderpriority AS x,
                  o_orderstatus AS y, count(*) AS nxy
                FROM orders GROUP BY 1, 2),
              mx AS (SELECT x, sum(nxy) AS nx FROM cells GROUP BY 1),
              my AS (SELECT y, sum(nxy) AS ny FROM cells GROUP BY 1),
              tot AS (SELECT sum(nxy) AS nn FROM cells),
              terms AS (SELECT
                  CAST(floor(1e6 * CAST(nxy AS DOUBLE)
                    / CAST(nn AS DOUBLE)
                    * ln(CAST(nxy AS DOUBLE) * CAST(nn AS DOUBLE)
                      / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))))
                    AS BIGINT) AS mi_micro
                FROM cells JOIN mx USING (x) JOIN my USING (y), tot),
              hx AS (SELECT CAST(sum(CAST(floor(1e6
                    * CAST(nx AS DOUBLE) / CAST(nn AS DOUBLE)
                    * ln(CAST(nn AS DOUBLE) / CAST(nx AS DOUBLE)))
                    AS BIGINT)) AS BIGINT) AS hx_micro
                FROM mx, tot),
              hy AS (SELECT CAST(sum(CAST(floor(1e6
                    * CAST(ny AS DOUBLE) / CAST(nn AS DOUBLE)
                    * ln(CAST(nn AS DOUBLE) / CAST(ny AS DOUBLE)))
                    AS BIGINT)) AS BIGINT) AS hy_micro
                FROM my, tot),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                  CAST(sum(mi_micro) AS BIGINT) AS mi_m
                FROM terms)
              SELECT n_cells,
                CAST(mi_m AS DOUBLE) / 1e6 AS mi_nats,
                CAST(hx_micro AS DOUBLE) / 1e6 AS h_priority,
                CAST(hy_micro AS DOUBLE) / 1e6 AS h_status,
                (CAST(mi_m AS DOUBLE) / 1e6)
                  / least(CAST(hx_micro AS DOUBLE) / 1e6,
                    CAST(hy_micro AS DOUBLE) / 1e6) AS nmi
              FROM f, hx, hy""")
    ),

    // ── NEAR-DUP COMPONENT CENSUS ─────────────────────────────────────────
    QueryDef(
      "q411_component_census",
      // The dedup blast-radius report: how big are the winnow near-dup
      // clusters, how much of the corpus sits inside ANY cluster, and
      // how dominant is the largest one? Rides the memoized component
      // labels (pair-graph-bounded); the census is two hash
      // aggregations and a corpus count.
      //
      // Shape, and why it scales: component labels broadcast; one
      // aggregation to the component grain, one fold; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val comp = TextQueries.winnowComponents(s, d)
        val sizes = comp.groupBy("comp").agg(count(lit(1)).as("sz"))
          .checkpoint()
        val summary = sizes.agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_clustered_docs"),
          max(col("sz")).as("max_size"),
          sum((col("sz") === 2L).cast("long")).as("n_pairs_only"))
        val total = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        summary.crossJoin(broadcast(total))
          .select(col("n_docs"), col("n_components"),
            col("n_clustered_docs"),
            (col("n_docs") - col("n_clustered_docs"))
              .as("n_singleton_docs"),
            col("max_size"), col("n_pairs_only"),
            expr("max_size * 1000000L div n_docs").as("max_share_ppm"))
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
           sizes AS (SELECT comp, count(*) AS sz FROM wcomp GROUP BY 1),
           summary AS (SELECT CAST(count(*) AS BIGINT) AS n_components,
               CAST(sum(sz) AS BIGINT) AS n_clustered_docs,
               CAST(max(sz) AS BIGINT) AS max_size,
               CAST(sum(CASE WHEN sz = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pairs_only
             FROM sizes),
           total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
             FROM documents)
           SELECT n_docs, n_components, n_clustered_docs,
             CAST(n_docs - n_clustered_docs AS BIGINT)
               AS n_singleton_docs,
             max_size, n_pairs_only,
             CAST(max_size * 1000000 // n_docs AS BIGINT)
               AS max_share_ppm
           FROM summary, total""")
    ),

    // ── ODDS RATIO + RELATIVE RISK (Woolf CI) ─────────────────────────────
    QueryDef(
      "q412_odds_ratio",
      // The 2×2 epidemiology pair the χ²-family tests (q348/q349) lead
      // to: exposure = urgent/high priority, outcome = order still
      // open (status 'O'). OR = ad/bc, RR = (a/(a+b))/(c/(c+d)), and
      // Woolf's CI exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) — four exact
      // cells from one conditional aggregation, every double in pinned
      // blocks with shared text.
      //
      // Shape, and why it scales: one fact pass to 1 row.
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .as("e"), (col("o_orderstatus") === "O").as("o"))
          .agg(sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
            sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
          .withColumn("odds_ratio", expr(
            """(CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
              / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"""))
          .withColumn("rel_risk", expr(
            """(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
              / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))"""))
          .withColumn("se_ln_or", expr(
            """sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
              + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))"""))
          .select(col("a"), col("b"), col("c"), col("d"),
            col("odds_ratio"), col("rel_risk"),
            expr("exp(ln(odds_ratio) - 1.96 * se_ln_or)").as("or_ci_lo"),
            expr("exp(ln(odds_ratio) + 1.96 * se_ln_or)").as("or_ci_hi"))
      },
      Some("""WITH f AS (SELECT
                  CAST(sum(CASE WHEN o_orderpriority IN
                    ('1-URGENT', '2-HIGH') AND o_orderstatus = 'O'
                    THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(sum(CASE WHEN o_orderpriority IN
                    ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'O'
                    THEN 1 ELSE 0 END) AS BIGINT) AS b,
                  CAST(sum(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH') AND o_orderstatus = 'O'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c,
                  CAST(sum(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'O'
                    THEN 1 ELSE 0 END) AS BIGINT) AS d
                FROM orders),
              g AS (SELECT *,
                  (CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                    AS odds_ratio,
                  (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                    / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))
                    AS rel_risk,
                  sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                    + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))
                    AS se_ln_or
                FROM f)
              SELECT a, b, c, d, odds_ratio, rel_risk,
                exp(ln(odds_ratio) - 1.96 * se_ln_or) AS or_ci_lo,
                exp(ln(odds_ratio) + 1.96 * se_ln_or) AS or_ci_hi
              FROM g""")
    ),

    // ── WEEKDAY SEASONALITY STRENGTH (one-way ANOVA η²) ───────────────────
    QueryDef(
      "q413_weekday_anova",
      // How much of the daily event-count variance is day-of-week? One-
      // way ANOVA of daily counts by weekday: η² = SSB/SST and the F
      // statistic, from exact integer moments — each weekday's Σ²/n
      // term is micro-floored to BIGINT before the cross-group sum
      // (q376's discipline), SST rides the q358 n²-scaled identity
      // rescaled to the same micro units.
      //
      // Shape, and why it scales: one fact pass to the day grain; one
      // hash agg to the 7-row weekday grain; 1-row folds.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val wk = daily.groupBy(expr("day % 7").as("w"))
          .agg(count(lit(1)).as("nw"), sum(col("x")).as("sw"))
          .withColumn("b_micro", expr(
            """CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
              / CAST(nw AS DOUBLE) * 1000000.0) AS BIGINT)"""))
          .agg(count(lit(1)).as("k"), sum(col("nw")).as("n"),
            sum(col("sw")).as("sx"), sum(col("b_micro")).as("sb"))
        val qx = daily.agg(
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"))
        wk.crossJoin(broadcast(qx))
          .withColumn("sst_micro", expr(
            """CAST(qx AS DOUBLE) * 1000000.0
              - floor(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE) * 1000000.0)"""))
          .withColumn("ssb_micro", expr(
            """CAST(sb AS DOUBLE) - floor(CAST(sx AS DOUBLE)
              * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)"""))
          .select(col("n").as("n_days"), col("k").as("k_weekdays"),
            expr("ssb_micro / sst_micro").as("eta_sq"),
            expr("""(ssb_micro / (CAST(k AS DOUBLE) - 1.0))
              / ((sst_micro - ssb_micro)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))""")
              .as("f_anova"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              wk AS (SELECT day % 7 AS w, count(*) AS nw, sum(x) AS sw
                FROM daily GROUP BY 1),
              b AS (SELECT count(*) AS k, sum(nw) AS n, sum(sw) AS sx,
                  sum(CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                    / CAST(nw AS DOUBLE) * 1000000.0) AS BIGINT)) AS sb
                FROM (SELECT *, 0 AS z FROM wk)),
              qx AS (SELECT sum(CAST(x AS DECIMAL(38,0)) * x) AS qx
                FROM daily),
              f AS (SELECT k, n, sb,
                  CAST(qx AS DOUBLE) * 1000000.0
                    - floor(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1000000.0) AS sst_micro,
                  CAST(sb AS DOUBLE) - floor(CAST(sx AS DOUBLE)
                    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
                    AS ssb_micro
                FROM b, qx)
              SELECT CAST(n AS BIGINT) AS n_days,
                CAST(k AS BIGINT) AS k_weekdays,
                ssb_micro / sst_micro AS eta_sq,
                (ssb_micro / (CAST(k AS DOUBLE) - 1.0))
                  / ((sst_micro - ssb_micro)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                  AS f_anova
              FROM f""")
    ),

    // ── TOP-K VOCABULARY COVERAGE CURVE ───────────────────────────────────
    QueryDef(
      "q414_vocab_coverage",
      // The tokenizer-budget design table: what share of all token
      // OCCURRENCES do the top 10 / 100 / 1000 types cover? One corpus
      // pass to token counts, TakeOrdered-1000 (never a global sort),
      // ranks and cumulative coverage on the 1000-row model table,
      // shares in integer ppm.
      //
      // Shape, and why it scales: corpus pass → token-grain hash agg →
      // TakeOrdered; everything after is model-sized. Output is 3 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val counts = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .checkpoint()
        val tot = counts.agg(sum(col("c")).as("nn"),
          count(lit(1)).as("n_types"))
        val w = Window.orderBy(col("c").desc, col("tok").asc)
        val top = counts.orderBy(col("c").desc, col("tok").asc).limit(1000)
          .withColumn("rk", row_number().over(w).cast("long"))
        val ks = Seq(10L, 100L, 1000L)
        val cov = top.select(col("rk"), col("c"),
            explode(array(ks.map(lit): _*)).as("k"))
          .filter(col("rk") <= col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_types_used"),
            sum(col("c")).as("covered"))
        cov.crossJoin(broadcast(tot))
          .select(col("k"), col("n_types_used"), col("covered"),
            col("n_types").as("n_types_total"),
            expr("covered * 1000000L div nn").as("coverage_ppm"))
          .orderBy("k")
      },
      Some(s"""WITH counts AS (SELECT tok, count(*) AS c FROM (
                  SELECT unnest($SQL_TOKENS) AS tok FROM documents)
                GROUP BY 1),
              tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
                  CAST(count(*) AS BIGINT) AS n_types FROM counts),
              top AS (SELECT tok, c,
                  CAST(row_number() OVER (ORDER BY c DESC, tok)
                    AS BIGINT) AS rk
                FROM counts ORDER BY c DESC, tok LIMIT 1000),
              ks AS (SELECT k FROM (SELECT unnest([10, 100, 1000]) AS k)),
              cov AS (SELECT k,
                  CAST(count(*) AS BIGINT) AS n_types_used,
                  CAST(sum(c) AS BIGINT) AS covered
                FROM top JOIN ks ON rk <= k
                GROUP BY 1)
              SELECT CAST(k AS BIGINT) AS k, n_types_used, covered,
                n_types AS n_types_total,
                CAST(covered * 1000000 // nn AS BIGINT) AS coverage_ppm
              FROM cov, tot ORDER BY k""")
    )
  )
}
