package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 20: dedup drill-downs, exact transport distance,
  * corpus keyness, leakage screening and shrinkage — the per-source
  * near-dup exposure report (q411's census drilled to the source
  * grain), the 1-D earth mover's distance between two sources' length
  * distributions (EXACT — Σ|F₁−F₂|dv closes in integers on the value
  * grain), Dunning log-likelihood keyness (the signature-term extractor
  * source-vs-rest), a feature→target leakage screen (point-biserial
  * correlations from exact moments), James-Stein shrinkage of
  * per-stratum effects (the winner's-curse correction over q386's
  * strata), and dedup capture-recapture (Lincoln-Petersen estimate of
  * the TRUE near-dup pair population from two independent detectors —
  * the winnow and prefix-Jaccard pair memos).
  *
  * Determinism: library-wide rules — exact integer CDF cross-products,
  * micro-floored row-local ln terms, exact DECIMAL(38,0) moments,
  * pinned blocks with shared text.
  */
object R11rQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── NEAR-DUP EXPOSURE BY SOURCE ───────────────────────────────────────
    QueryDef(
      "q433_dedup_by_source",
      // q411's blast-radius census drilled to the source grain: which
      // sources carry the near-dup mass? Component labels (memoized,
      // pair-graph-bounded) broadcast onto one documents pass; share of
      // each source's docs inside ANY winnow cluster, in integer ppm.
      //
      // Shape, and why it scales: one corpus pass + a broadcast keyed
      // join; one source-grain aggregation. Output is |sources| rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val comp = TextQueries.winnowComponents(s, d)
          .select(col("id"), lit(1L).as("clustered"))
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(comp), col("doc_id") === col("id"),
            "left_outer")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("clustered"), lit(0L))).as("n_clustered"))
          .select(col("source"), col("n_docs"), col("n_clustered"),
            expr("n_clustered * 1000000L div n_docs")
              .as("clustered_ppm"))
          .orderBy("source")
      },
      Some("WITH RECURSIVE " +
        TextQueries.SQL_WINNOW_PAIR_CTES.stripPrefix("WITH ") + """,
           wedges AS (SELECT a, b FROM wpairs
                      UNION ALL SELECT b AS a, a AS b FROM wpairs),
           wnodes AS (SELECT DISTINCT a AS id FROM wedges),
           f AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN wnodes.id IS NOT NULL THEN 1 ELSE 0
                 END) AS BIGINT) AS n_clustered
             FROM documents LEFT JOIN wnodes ON doc_id = wnodes.id
             GROUP BY 1)
           SELECT source, n_docs, n_clustered,
             CAST(n_clustered * 1000000 // n_docs AS BIGINT)
               AS clustered_ppm
           FROM f ORDER BY source""")
    ),

    // ── 1-D EARTH MOVER'S DISTANCE (exact) ────────────────────────────────
    QueryDef(
      "q434_emd_1d",
      // The transport distance beside q262's KS and q390's AD: in one
      // dimension EMD(F₁, F₂) = ∫|F₁ − F₂|dv, which closes EXACTLY on
      // the pooled value grain — per segment the integrand is the
      // integer cross-product |c₁cum·n₀ − c₀cum·n₁| times the gap to
      // the next distinct value, summed as DECIMAL(38,0) and divided
      // once by n₁·n₀.
      //
      // Shape, and why it scales: one filtered corpus pass to the
      // value grain; prefix sums + a rank join for next-value gaps
      // (never a global window); output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val vg = Tables.documents(s, d)
          .filter(col("source").isin("src0", "src1"))
          .groupBy(col("n_chars").as("v"))
          .agg(sum((col("source") === "src0").cast("long")).as("c1"),
            sum((col("source") === "src1").cast("long")).as("c0"))
          .withColumn("one", lit(1L))
          .checkpoint()
        val tot = vg.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
        val p1 = Shared.distributedPrefixSum(vg, "v", "c1")
          .withColumnRenamed("cum", "e1")
        val p0 = Shared.distributedPrefixSum(p1, "v", "c0")
          .withColumnRenamed("cum", "e0")
        val rk = Shared.distributedPrefixSum(p0, "v", "one")
          .withColumn("rnk", col("cum") + 1L)
        val nxt = rk.select((col("rnk") - 1L).as("rnk"),
          col("v").as("v_next"))
        rk.join(nxt, Seq("rnk"), "inner") // last value has F1=F2=1: skip
          .crossJoin(broadcast(tot))
          .agg(max(col("n1")).as("n1"), max(col("n0")).as("n0"),
            sum(expr("""abs(CAST((e1 + c1) AS DECIMAL(38,0)) * n0
                - CAST((e0 + c0) AS DECIMAL(38,0)) * n1)
              * (v_next - v)""")).as("num"))
          .select(col("n1"), col("n0"),
            expr("""CAST(num AS DOUBLE)
              / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))""")
              .as("emd_chars"))
      },
      Some("""WITH vg AS (SELECT n_chars AS v,
                  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0
                FROM documents WHERE source IN ('src0', 'src1')
                GROUP BY 1),
              tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                  CAST(sum(c0) AS BIGINT) AS n0 FROM vg),
              cum AS (SELECT v,
                  CAST(sum(c1) OVER w AS BIGINT) AS f1,
                  CAST(sum(c0) OVER w AS BIGINT) AS f0,
                  lead(v) OVER (ORDER BY v) AS v_next
                FROM vg
                WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
              f AS (SELECT n1, n0,
                  sum(abs(CAST(f1 AS DECIMAL(38,0)) * n0
                    - CAST(f0 AS DECIMAL(38,0)) * n1) * (v_next - v))
                    AS num
                FROM cum, tot WHERE v_next IS NOT NULL
                GROUP BY 1, 2)
              SELECT n1, n0,
                CAST(num AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS emd_chars
              FROM f""")
    ),

    // ── DUNNING LOG-LIKELIHOOD KEYNESS ────────────────────────────────────
    QueryDef(
      "q435_keyness",
      // The signature-term extractor: which tokens are OVER-represented
      // in src0 vs the rest of the corpus? Dunning's G² = 2Σ O·ln(O/E)
      // over the 2-cell split per token, with expected counts from the
      // broadcast row totals — each token's G² is a row-local pinned
      // double micro-floored for the deterministic top-10 ordering
      // (count ties break by token).
      //
      // Shape, and why it scales: one corpus pass to the (token, side)
      // grain; 1-row totals broadcast; TakeOrdered-10 on the
      // vocabulary-bounded term table.
      (s, d) => Shared.withCheckpointDir(s) {
        val tok = Tables.documents(s, d)
          .select((col("source") === "src0").cast("long").as("side"),
            explode(tokens(col("text"))).as("tok"))
          .groupBy("tok")
          .agg(sum(when(col("side") === 1L, 1L).otherwise(0L)).as("o1"),
            sum(when(col("side") === 0L, 1L).otherwise(0L)).as("o2"))
          .checkpoint()
        val tot = tok.agg(sum(col("o1")).as("r1"), sum(col("o2")).as("r2"))
        val g2 = tok.crossJoin(broadcast(tot))
          .withColumn("g2_micro", expr(
            """CAST(floor(1e6 * 2.0 * (
              CASE WHEN o1 > 0 THEN CAST(o1 AS DOUBLE)
                * ln(CAST(o1 AS DOUBLE) * (CAST(r1 AS DOUBLE)
                  + CAST(r2 AS DOUBLE)) / (CAST(r1 AS DOUBLE)
                  * (CAST(o1 AS DOUBLE) + CAST(o2 AS DOUBLE))))
                ELSE 0.0 END
              + CASE WHEN o2 > 0 THEN CAST(o2 AS DOUBLE)
                * ln(CAST(o2 AS DOUBLE) * (CAST(r1 AS DOUBLE)
                  + CAST(r2 AS DOUBLE)) / (CAST(r2 AS DOUBLE)
                  * (CAST(o1 AS DOUBLE) + CAST(o2 AS DOUBLE))))
                ELSE 0.0 END)) AS BIGINT)"""))
        g2.orderBy(col("g2_micro").desc, col("tok").asc).limit(10)
          .select(col("tok"), col("o1").as("n_src0"),
            col("o2").as("n_rest"),
            expr("CAST(g2_micro AS DOUBLE) / 1e6").as("g2"))
      },
      Some(s"""WITH tok AS (SELECT tok,
                  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS o1,
                  CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS o2
                FROM (SELECT source, unnest($SQL_TOKENS) AS tok
                  FROM documents)
                GROUP BY 1),
              tot AS (SELECT CAST(sum(o1) AS BIGINT) AS r1,
                  CAST(sum(o2) AS BIGINT) AS r2 FROM tok),
              g AS (SELECT tok, o1, o2,
                  CAST(floor(1e6 * 2.0 * (
                    CASE WHEN o1 > 0 THEN CAST(o1 AS DOUBLE)
                      * ln(CAST(o1 AS DOUBLE) * (CAST(r1 AS DOUBLE)
                        + CAST(r2 AS DOUBLE)) / (CAST(r1 AS DOUBLE)
                        * (CAST(o1 AS DOUBLE) + CAST(o2 AS DOUBLE))))
                      ELSE 0.0 END
                    + CASE WHEN o2 > 0 THEN CAST(o2 AS DOUBLE)
                      * ln(CAST(o2 AS DOUBLE) * (CAST(r1 AS DOUBLE)
                        + CAST(r2 AS DOUBLE)) / (CAST(r2 AS DOUBLE)
                        * (CAST(o1 AS DOUBLE) + CAST(o2 AS DOUBLE))))
                      ELSE 0.0 END)) AS BIGINT) AS g2_micro
                FROM tok, tot),
              top AS (SELECT * FROM g
                ORDER BY g2_micro DESC, tok LIMIT 10)
              SELECT tok, o1 AS n_src0, o2 AS n_rest,
                CAST(g2_micro AS DOUBLE) / 1e6 AS g2
              FROM top ORDER BY g2_micro DESC, tok""")
    ),

    // ── FEATURE→TARGET LEAKAGE SCREEN ─────────────────────────────────────
    QueryDef(
      "q436_leakage_screen",
      // The pre-training screen every feature pipeline needs: point-
      // biserial correlation of each candidate feature with the target
      // (urgent priority), from exact n²-scaled DECIMAL(38,0) moments —
      // a feature correlating suspiciously high is leakage. Three
      // features ride ONE conditional moments pass; each r is a pinned
      // block; the 3-row unpivot is a struct explode.
      //
      // Shape, and why it scales: one fact pass; output is 3 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("long").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("f1"),
            (unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
              .as("f2"),
            (col("o_custkey") % 100L).as("f3"))
          .checkpoint()
        val sums = base.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
          sum(col("f1")).as("s1"), sum(col("f2")).as("s2"),
          sum(col("f3")).as("s3"))
        def m(a: String, sa: String, b: String, sb: String) =
          sum(expr(s"""CAST(n * $a - $sa AS DECIMAL(38,0))
            * (n * $b - $sb)"""))
        val mom = base.crossJoin(broadcast(sums)).agg(
          m("t", "st", "t", "st").as("stt"),
          m("f1", "s1", "f1", "s1").as("s11"),
          m("f2", "s2", "f2", "s2").as("s22"),
          m("f3", "s3", "f3", "s3").as("s33"),
          m("f1", "s1", "t", "st").as("s1t"),
          m("f2", "s2", "t", "st").as("s2t"),
          m("f3", "s3", "t", "st").as("s3t"))
        def r(num: String, den: String) =
          s"""CAST($num AS DOUBLE) / sqrt(CAST($den AS DOUBLE)
            * CAST(stt AS DOUBLE))"""
        mom.select(explode(array(
            struct(lit("totalprice").as("feature"),
              expr(r("s1t", "s11")).as("point_biserial_r")),
            struct(lit("order_day").as("feature"),
              expr(r("s2t", "s22")).as("point_biserial_r")),
            struct(lit("custkey_mod100").as("feature"),
              expr(r("s3t", "s33")).as("point_biserial_r"))))
            .as("p"))
          .select(col("p.*"))
          .orderBy("feature")
      },
      Some("""WITH base AS (SELECT
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS f1,
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS f2,
                  o_custkey % 100 AS f3
                FROM orders),
              sums AS (SELECT count(*) AS n, sum(t) AS st, sum(f1) AS s1,
                  sum(f2) AS s2, sum(f3) AS s3
                FROM base),
              mom AS (SELECT
                  sum(CAST(n * t - st AS DECIMAL(38,0)) * (n * t - st))
                    AS stt,
                  sum(CAST(n * f1 - s1 AS DECIMAL(38,0)) * (n * f1 - s1))
                    AS s11,
                  sum(CAST(n * f2 - s2 AS DECIMAL(38,0)) * (n * f2 - s2))
                    AS s22,
                  sum(CAST(n * f3 - s3 AS DECIMAL(38,0)) * (n * f3 - s3))
                    AS s33,
                  sum(CAST(n * f1 - s1 AS DECIMAL(38,0)) * (n * t - st))
                    AS s1t,
                  sum(CAST(n * f2 - s2 AS DECIMAL(38,0)) * (n * t - st))
                    AS s2t,
                  sum(CAST(n * f3 - s3 AS DECIMAL(38,0)) * (n * t - st))
                    AS s3t
                FROM base, sums)
              SELECT 'custkey_mod100' AS feature,
                CAST(s3t AS DOUBLE) / sqrt(CAST(s33 AS DOUBLE)
                  * CAST(stt AS DOUBLE)) AS point_biserial_r FROM mom
              UNION ALL
              SELECT 'order_day',
                CAST(s2t AS DOUBLE) / sqrt(CAST(s22 AS DOUBLE)
                  * CAST(stt AS DOUBLE)) FROM mom
              UNION ALL
              SELECT 'totalprice',
                CAST(s1t AS DOUBLE) / sqrt(CAST(s11 AS DOUBLE)
                  * CAST(stt AS DOUBLE)) FROM mom
              ORDER BY feature""")
    ),

    // ── JAMES-STEIN SHRINKAGE OF STRATUM EFFECTS ──────────────────────────
    QueryDef(
      "q437_james_stein",
      // The winner's-curse correction over q386's per-nation effects:
      // shrink each stratum's urgent-vs-other difference toward the
      // grand mean by the positive-part James-Stein factor
      // 1 − (k−3)·v̄/S (S = Σ(d_g − d̄)², v̄ = mean sampling variance).
      // Per-stratum d/v are row-local pinned doubles from exact
      // moments; the shrink factor folds on atto-floored integers
      // (q386's discipline) and applies row-locally.
      //
      // Shape, and why it scales: one fact pass to the (nation × arm)
      // grain; two folds over the ≤25-row stratum table; output is one
      // row per stratum.
      (s, d) => Shared.withCheckpointDir(s) {
        val strata = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nation")), "o_custkey")
          .select(col("nation"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("nation")
          .agg(sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
            sum(when(col("t"), col("cents")).otherwise(0L)).as("st"),
            sum(when(col("t"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("qt"),
            sum(when(!col("t"), 1L).otherwise(0L)).as("nc"),
            sum(when(!col("t"), col("cents")).otherwise(0L)).as("sc"),
            sum(when(!col("t"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("qc"))
          .filter(col("nt") >= 2L && col("nc") >= 2L)
          .withColumn("d_g", expr("""CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
            - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)"""))
          .withColumn("v_g", expr(
            """((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                  / CAST(nt AS DOUBLE))
                + (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE)
                  * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)))
              / CAST(nt + nc - 2 AS DOUBLE)
              * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))"""))
          .withColumn("d_micro", expr("CAST(floor(1e6 * d_g) AS BIGINT)"))
          // variance lives at cents² scale (~10¹²): milli-floor, not
          // micro — 10⁶·v would overflow the BIGINT sum
          .withColumn("v_milli", expr("CAST(floor(1e3 * v_g) AS BIGINT)"))
          .checkpoint()
        val fold1 = strata.agg(count(lit(1)).as("k"),
            sum(col("d_micro")).as("sd"), sum(col("v_milli")).as("sv"))
          .withColumn("dbar",
            expr("CAST(sd AS DOUBLE) / 1e6 / CAST(k AS DOUBLE)"))
          .withColumn("vbar",
            expr("CAST(sv AS DOUBLE) / 1e3 / CAST(k AS DOUBLE)"))
        val fold2 = strata.crossJoin(broadcast(fold1))
          .agg(max(col("k")).as("k"), max(col("dbar")).as("dbar"),
            max(col("vbar")).as("vbar"),
            // squared deviations are already ~10¹² cents²: floor at
            // unit scale so the cross-stratum sum stays in BIGINT
            sum(expr("""CAST(floor((d_g - dbar) * (d_g - dbar))
              AS BIGINT)""")).as("ss_unit"))
          .withColumn("shrink", expr(
            """greatest(0.0, 1.0 - (CAST(k AS DOUBLE) - 3.0) * vbar
              / CAST(ss_unit AS DOUBLE))"""))
        strata.crossJoin(broadcast(fold2))
          .select(col("nation"), col("d_g").as("raw_effect_cents"),
            expr("dbar + shrink * (d_g - dbar)")
              .as("shrunk_effect_cents"),
            col("shrink").as("shrink_factor"))
          .orderBy("nation")
      },
      Some("""WITH j AS (SELECT c_nationkey AS nation,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents
                FROM orders JOIN customer ON o_custkey = c_custkey),
              g AS (SELECT nation,
                  CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nt,
                  CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS st,
                  sum(CASE WHEN t = 1
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS qt,
                  CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nc,
                  CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sc,
                  sum(CASE WHEN t = 0
                    THEN CAST(cents AS DECIMAL(38,0)) * cents END) AS qc
                FROM j GROUP BY 1
                HAVING nt >= 2 AND nc >= 2),
              e AS (SELECT nation,
                  CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS d_g,
                  ((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)
                      * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
                    + (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE)
                      * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)))
                  / CAST(nt + nc - 2 AS DOUBLE)
                  * (1.0 / CAST(nt AS DOUBLE) + 1.0 / CAST(nc AS DOUBLE))
                    AS v_g
                FROM g),
              f1 AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(CAST(floor(1e6 * d_g) AS BIGINT)) AS BIGINT)
                    AS sd,
                  CAST(sum(CAST(floor(1e3 * v_g) AS BIGINT)) AS BIGINT)
                    AS sv
                FROM e),
              f1b AS (SELECT k,
                  CAST(sd AS DOUBLE) / 1e6 / CAST(k AS DOUBLE) AS dbar,
                  CAST(sv AS DOUBLE) / 1e3 / CAST(k AS DOUBLE) AS vbar
                FROM f1),
              f2 AS (SELECT k, dbar, vbar,
                  CAST(sum(CAST(floor((d_g - dbar) * (d_g - dbar))
                    AS BIGINT)) AS BIGINT) AS ss_unit
                FROM e, f1b GROUP BY 1, 2, 3),
              f2b AS (SELECT dbar,
                  greatest(0.0, 1.0 - (CAST(k AS DOUBLE) - 3.0) * vbar
                    / CAST(ss_unit AS DOUBLE)) AS shrink
                FROM f2)
              SELECT nation, d_g AS raw_effect_cents,
                dbar + shrink * (d_g - dbar) AS shrunk_effect_cents,
                shrink AS shrink_factor
              FROM e, f2b ORDER BY nation""")
    ),

    // ── DEDUP CAPTURE-RECAPTURE ───────────────────────────────────────────
    QueryDef(
      "q438_dedup_capture_recapture",
      // How many near-dup pairs exist that NO detector found? Treat the
      // winnow and prefix-Jaccard pair memos as independent captures
      // and estimate the true pair population by Lincoln-Petersen
      // N̂ = n₁·n₂/m — the coverage meta-audit over the whole dedup
      // family. Both pair tables are memoized and pair-graph-bounded;
      // the overlap is one keyed equi-join on the canonical (lo, hi)
      // pair key.
      //
      // Shape, and why it scales: two pair-memo scans + one keyed join
      // + a fold. Output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val wp = TextQueries.winnowPairs(s, d)
          .select(least(col("a"), col("b")).as("lo"),
            greatest(col("a"), col("b")).as("hi"))
          .distinct().checkpoint()
        val jp = TextQueries.jaccardPrefixPairs(s, d)
          .select(least(col("d1"), col("d2")).as("lo"),
            greatest(col("d1"), col("d2")).as("hi"))
          .distinct().checkpoint()
        val nw = wp.agg(count(lit(1)).as("n_winnow"))
        val nj = jp.agg(count(lit(1)).as("n_jaccard"))
        val ov = wp.join(jp, Seq("lo", "hi"))
          .agg(count(lit(1)).as("n_overlap"))
        nw.crossJoin(broadcast(nj)).crossJoin(broadcast(ov))
          .select(col("n_winnow"), col("n_jaccard"), col("n_overlap"),
            (col("n_winnow") + col("n_jaccard") - col("n_overlap"))
              .as("n_union"),
            expr("""CASE WHEN n_overlap > 0
              THEN n_winnow * n_jaccard div n_overlap END""")
              .as("lincoln_petersen_est"))
      },
      // the two CTE chains both define `tok`/`shingled`/`e`; the jpair
      // chain's are renamed (jtok/jshingled/je, with `e` kept as a table
      // ALIAS so its column references survive verbatim)
      Some("WITH RECURSIVE " +
        TextQueries.SQL_WINNOW_PAIR_CTES.stripPrefix("WITH ") + ",\n" +
        TextQueries.SQL_JPAIR_CTES.stripPrefix("WITH ")
          .replace("tok AS (SELECT", "jtok AS (SELECT")
          .replace("FROM tok)", "FROM jtok)")
          .replace("shingled AS (SELECT", "jshingled AS (SELECT")
          .replace("FROM jshingled AS (SELECT", "FROM shingled AS (SELECT")
          .replace("FROM shingled))", "FROM jshingled))")
          .replace("e AS (SELECT DISTINCT doc_id",
            "je AS (SELECT DISTINCT doc_id")
          .replace("FROM e GROUP BY 1", "FROM je GROUP BY 1")
          .replace("FROM e JOIN szt", "FROM je e JOIN szt")
          .replace("JOIN e ea", "JOIN je ea")
          .replace("JOIN e eb", "JOIN je eb") + """,
           wp AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
             FROM wpairs),
           jpp AS (SELECT DISTINCT least(d1, d2) AS lo,
               greatest(d1, d2) AS hi
             FROM jp),
           nw AS (SELECT CAST(count(*) AS BIGINT) AS n_winnow FROM wp),
           nj AS (SELECT CAST(count(*) AS BIGINT) AS n_jaccard FROM jpp),
           ov AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap
             FROM wp JOIN jpp USING (lo, hi))
           SELECT n_winnow, n_jaccard, n_overlap,
             CAST(n_winnow + n_jaccard - n_overlap AS BIGINT) AS n_union,
             CASE WHEN n_overlap > 0
               THEN CAST(n_winnow * n_jaccard // n_overlap AS BIGINT) END
               AS lincoln_petersen_est
           FROM nw, nj, ov""")
    )
  )
}
