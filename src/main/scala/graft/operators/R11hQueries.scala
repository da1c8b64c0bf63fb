package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 10: causal, curation and calibration completions —
  * coarsened exact matching (the matching-based ATT that complements
  * q326's DiD and q301's post-stratification), a per-column dataset
  * profile (the dataset-card stats every curation pipeline publishes),
  * cross-source quantile normalization (the distribution harmonizer),
  * the Brown-Forsythe variance-equality test (the robust Levene variant,
  * guarding every equal-variance assumption in the t/F family),
  * isotonic calibration via the PAV minimax identity (the calibration
  * MAP q360 only measures), and deterministic negative sampling (the
  * contrastive-training data generator).
  *
  * Determinism: library-wide rules — cell means as truncating integer
  * divisions, micro-floored per-group terms before any cross-group sum
  * of doubles, packed-key prefix ranks, exact rational interval
  * averages ordered by pinned doubles, md5-family negative draws.
  */
object R11hQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── COARSENED EXACT MATCHING (ATT) ────────────────────────────────────
    QueryDef(
      "q373_cem_att",
      // Iacus/King/Porro's CEM: coarsen the confounders (order month ×
      // customer nation), keep only cells where BOTH treated (urgent/
      // high priority) and control orders exist, and estimate the ATT
      // as the treated mean minus the cell-reweighted control mean.
      // Each cell's control mean is a TRUNCATING integer division in
      // cents (identical both engines; ≤1-cent coarsening, documented),
      // so the reweighted sum Σ m_t·c̄_c accumulates as exact
      // DECIMAL(38,0) — never an order-dependent double sum.
      //
      // Shape, and why it scales: one keyed orders⋈customer join, one
      // hash aggregation to the (month × nation) cell grain, a 1-row
      // fold; output is 1 row.
      (s, d) => {
        val cells = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nation")), "o_custkey")
          .select(date_trunc("month", col("o_orderdate")).as("month"),
            col("nation"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("t"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("month", "nation")
          .agg(sum(when(col("t"), 1L).otherwise(0L)).as("mt"),
            sum(when(col("t"), col("cents")).otherwise(0L)).as("st"),
            sum(when(!col("t"), 1L).otherwise(0L)).as("mc"),
            sum(when(!col("t"), col("cents")).otherwise(0L)).as("sc"))
        cells.agg(count(lit(1)).as("n_cells"),
            sum((col("mt") > 0L && col("mc") > 0L).cast("long"))
              .as("n_matched"),
            sum(col("mt")).as("m_treated"),
            sum(when(col("mt") > 0L && col("mc") > 0L, col("mt"))
              .otherwise(0L)).as("m_matched"),
            sum(when(col("mt") > 0L && col("mc") > 0L, col("st"))
              .otherwise(0L)).as("sy_t"),
            sum(when(col("mt") > 0L && col("mc") > 0L,
              expr("CAST(mt AS DECIMAL(38,0)) * (sc div mc)"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sy_c"))
          .select(col("n_cells"), col("n_matched"), col("m_treated"),
            col("m_matched"),
            expr("""(CAST(sy_t AS DOUBLE) - CAST(sy_c AS DOUBLE))
              / CAST(nullif(m_matched, 0L) AS DOUBLE)""").as("att_cents"),
            expr("m_matched * 1000000L div nullif(m_treated, 0L)")
              .as("match_rate_ppm"))
      },
      Some("""WITH j AS (SELECT date_trunc('month', o_orderdate) AS month,
                  c_nationkey AS nation,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS t,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents
                FROM orders JOIN customer ON o_custkey = c_custkey),
              cells AS (SELECT month, nation,
                  CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS mt,
                  CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS st,
                  CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS mc,
                  CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sc
                FROM j GROUP BY 1, 2),
              f AS (SELECT count(*) AS n_cells,
                  sum(CASE WHEN mt > 0 AND mc > 0 THEN 1 ELSE 0 END)
                    AS n_matched,
                  sum(mt) AS m_treated,
                  sum(CASE WHEN mt > 0 AND mc > 0 THEN mt ELSE 0 END)
                    AS m_matched,
                  sum(CASE WHEN mt > 0 AND mc > 0 THEN st ELSE 0 END)
                    AS sy_t,
                  sum(CASE WHEN mt > 0 AND mc > 0
                    THEN CAST(mt AS DECIMAL(38,0)) * (sc // mc)
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS sy_c
                FROM cells)
              SELECT CAST(n_cells AS BIGINT) AS n_cells,
                CAST(n_matched AS BIGINT) AS n_matched,
                CAST(m_treated AS BIGINT) AS m_treated,
                CAST(m_matched AS BIGINT) AS m_matched,
                (CAST(sy_t AS DOUBLE) - CAST(sy_c AS DOUBLE))
                  / CAST(nullif(m_matched, 0) AS DOUBLE) AS att_cents,
                CAST(m_matched * 1000000 // nullif(m_treated, 0)
                  AS BIGINT) AS match_rate_ppm
              FROM f""")
    ),

    // ── PER-COLUMN DATASET PROFILE (dataset-card stats) ───────────────────
    QueryDef(
      "q374_profile",
      // The dataset card every curation pipeline publishes: per column
      // of the orders table — null count, exact distinct count, numeric
      // min/max (timestamps as epoch seconds; NULL for strings) and
      // string length min/max (NULL for non-strings). ONE aggregation
      // row computes all 6×5 statistics (multi-distinct expands
      // map-side, the q69 shape), then unpivots through a 6-struct
      // array — one fact scan total.
      //
      // Shape, and why it scales: one hash aggregation (Expand ×6 for
      // the exact distincts — linear, the documented multi-distinct
      // cost); the unpivot is a 1-row explode. Output is 6 rows.
      (s, d) => {
        def nn(c: String) = sum(col(c).isNull.cast("long")).as(s"nn_$c")
        def nd(c: String) = countDistinct(col(c)).as(s"nd_$c")
        val o = Tables.orders(s, d)
        o.agg(nn("o_orderkey"), nn("o_custkey"), nn("o_orderstatus"),
            nn("o_totalprice"), nn("o_orderdate"), nn("o_orderpriority"),
            nd("o_orderkey"), nd("o_custkey"), nd("o_orderstatus"),
            nd("o_totalprice"), nd("o_orderdate"), nd("o_orderpriority"),
            min(col("o_orderkey")).cast("double").as("mn_k"),
            max(col("o_orderkey")).cast("double").as("mx_k"),
            min(col("o_custkey")).cast("double").as("mn_c"),
            max(col("o_custkey")).cast("double").as("mx_c"),
            min(col("o_totalprice")).as("mn_p"),
            max(col("o_totalprice")).as("mx_p"),
            min(unix_timestamp(col("o_orderdate"))).cast("double")
              .as("mn_d"),
            max(unix_timestamp(col("o_orderdate"))).cast("double")
              .as("mx_d"),
            min(length(col("o_orderstatus"))).cast("long").as("ml_s"),
            max(length(col("o_orderstatus"))).cast("long").as("xl_s"),
            min(length(col("o_orderpriority"))).cast("long").as("ml_r"),
            max(length(col("o_orderpriority"))).cast("long").as("xl_r"))
          .select(explode(array(
            struct(lit("o_orderkey").as("col_name"),
              col("nn_o_orderkey").as("n_nulls"),
              col("nd_o_orderkey").as("n_distinct"),
              col("mn_k").as("min_num"), col("mx_k").as("max_num"),
              lit(null).cast("long").as("min_len"),
              lit(null).cast("long").as("max_len")),
            struct(lit("o_custkey").as("col_name"),
              col("nn_o_custkey").as("n_nulls"),
              col("nd_o_custkey").as("n_distinct"),
              col("mn_c").as("min_num"), col("mx_c").as("max_num"),
              lit(null).cast("long").as("min_len"),
              lit(null).cast("long").as("max_len")),
            struct(lit("o_orderstatus").as("col_name"),
              col("nn_o_orderstatus").as("n_nulls"),
              col("nd_o_orderstatus").as("n_distinct"),
              lit(null).cast("double").as("min_num"),
              lit(null).cast("double").as("max_num"),
              col("ml_s").as("min_len"), col("xl_s").as("max_len")),
            struct(lit("o_totalprice").as("col_name"),
              col("nn_o_totalprice").as("n_nulls"),
              col("nd_o_totalprice").as("n_distinct"),
              col("mn_p").as("min_num"), col("mx_p").as("max_num"),
              lit(null).cast("long").as("min_len"),
              lit(null).cast("long").as("max_len")),
            struct(lit("o_orderdate").as("col_name"),
              col("nn_o_orderdate").as("n_nulls"),
              col("nd_o_orderdate").as("n_distinct"),
              col("mn_d").as("min_num"), col("mx_d").as("max_num"),
              lit(null).cast("long").as("min_len"),
              lit(null).cast("long").as("max_len")),
            struct(lit("o_orderpriority").as("col_name"),
              col("nn_o_orderpriority").as("n_nulls"),
              col("nd_o_orderpriority").as("n_distinct"),
              lit(null).cast("double").as("min_num"),
              lit(null).cast("double").as("max_num"),
              col("ml_r").as("min_len"), col("xl_r").as("max_len"))
          )).as("p"))
          .select(col("p.*"))
      },
      Some("""WITH a AS (SELECT
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS nn_k,
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS nn_c,
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS nn_s,
                  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS nn_p,
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS nn_d,
                  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS nn_r,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_k,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_c,
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_s,
                  CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_p,
                  CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_d,
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_r,
                  CAST(min(o_orderkey) AS DOUBLE) AS mn_k,
                  CAST(max(o_orderkey) AS DOUBLE) AS mx_k,
                  CAST(min(o_custkey) AS DOUBLE) AS mn_c,
                  CAST(max(o_custkey) AS DOUBLE) AS mx_c,
                  min(o_totalprice) AS mn_p, max(o_totalprice) AS mx_p,
                  CAST(min(date_diff('second', TIMESTAMP '1970-01-01',
                    o_orderdate)) AS DOUBLE) AS mn_d,
                  CAST(max(date_diff('second', TIMESTAMP '1970-01-01',
                    o_orderdate)) AS DOUBLE) AS mx_d,
                  CAST(min(length(o_orderstatus)) AS BIGINT) AS ml_s,
                  CAST(max(length(o_orderstatus)) AS BIGINT) AS xl_s,
                  CAST(min(length(o_orderpriority)) AS BIGINT) AS ml_r,
                  CAST(max(length(o_orderpriority)) AS BIGINT) AS xl_r
                FROM orders)
              SELECT 'o_orderkey' AS col_name, nn_k AS n_nulls,
                nd_k AS n_distinct, mn_k AS min_num, mx_k AS max_num,
                CAST(NULL AS BIGINT) AS min_len,
                CAST(NULL AS BIGINT) AS max_len FROM a
              UNION ALL SELECT 'o_custkey', nn_c, nd_c, mn_c, mx_c,
                NULL, NULL FROM a
              UNION ALL SELECT 'o_orderstatus', nn_s, nd_s, NULL, NULL,
                ml_s, xl_s FROM a
              UNION ALL SELECT 'o_totalprice', nn_p, nd_p, mn_p, mx_p,
                NULL, NULL FROM a
              UNION ALL SELECT 'o_orderdate', nn_d, nd_d, mn_d, mx_d,
                NULL, NULL FROM a
              UNION ALL SELECT 'o_orderpriority', nn_r, nd_r, NULL, NULL,
                ml_r, xl_r FROM a""")
    ),

    // ── CROSS-SOURCE QUANTILE NORMALIZATION ───────────────────────────────
    QueryDef(
      "q375_quantile_norm",
      // The distribution harmonizer: map each source's document-length
      // distribution onto the POOLED distribution, reported as the
      // per-(source × decile) mapping table a normalizer would apply —
      // raw decile mean vs the pooled value at the decile midpoint.
      // Within-source ranks are EXACT and never a corpus global window:
      // the packed key src_idx·2⁵⁰ + n_chars·2³⁰ + doc_id (bounds
      // raise_error-guarded) makes strata contiguous, so ONE
      // [[Shared.distributedPrefixSum]] serves every source; the
      // midquantile r = (2·rank−1)·10⁶ div (2·n_g) is pure BIGINT. The
      // pooled inverse-CDF is evaluated at the 10 decile midpoints only
      // (a 10-row broadcast interval probe into the pooled value-grain
      // CDF — model-sized by construction).
      //
      // Shape, and why it scales: one corpus pass to (doc, chars); one
      // prefix-sum round for within-source ranks; one value-grain
      // prefix sum for the pooled CDF; output is sources×10 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .checkpoint()
        val n = docs.count()
        // source index + cumulative doc-count offsets (source-bounded)
        val wIdx = Window.orderBy("source")
        val src = docs.groupBy("source").agg(count(lit(1)).as("ng"))
          .withColumn("idx", row_number().over(wIdx).cast("long") - 1L)
          .withColumn("coff",
            coalesce(sum(col("ng")).over(
              wIdx.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val keyed = docs.join(broadcast(src), "source")
          .withColumn("key",
            when(col("doc_id") < 0L || col("doc_id") >= lit(1L << 30) ||
              col("n_chars") < 0L || col("n_chars") >= lit(1L << 20),
              raise_error(concat(lit("q375: packed-key bounds contract " +
                "violated for doc_id "), col("doc_id"))))
              .otherwise(col("idx") * lit(1L << 50) +
                col("n_chars") * lit(1L << 30) + col("doc_id")))
        val ranked = Shared.distributedPrefixSum(
            keyed.withColumn("one", lit(1L)), "key", "one")
          .withColumn("rnk", col("cum") + 1L - col("coff"))
          .withColumn("r_ppm",
            expr("((2L * rnk - 1L) * 1000000L) div (2L * ng)"))
          .withColumn("decile", expr("r_ppm div 100000L"))
        // pooled inverse CDF at the 10 decile midpoints
        val pooled = Shared.distributedPrefixSum(
          docs.groupBy("n_chars").agg(count(lit(1)).as("cnt")),
          "n_chars", "cnt")
        val targets = s.range(0, 10).select(col("id").as("decile"),
          expr(s"(((id * 100000L) + 50000L) * ${n}L) div 1000000L + 1L")
            .as("t"))
        val dmap = pooled.join(broadcast(targets),
            col("t") > col("cum") && col("t") <= col("cum") + col("cnt"))
          .select(col("decile"), col("n_chars").as("pooled_value"))
        ranked.groupBy("source", "decile")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("schars"))
          .join(broadcast(dmap), "decile")
          .select(col("source"), col("decile"), col("n_docs"),
            expr("CAST(schars AS DOUBLE) / CAST(n_docs AS DOUBLE)")
              .as("raw_mean"),
            col("pooled_value"))
          .orderBy("source", "decile")
      },
      Some("""WITH docs AS (SELECT doc_id, source, n_chars
                FROM documents),
              nn AS (SELECT count(*) AS n FROM docs),
              sg AS (SELECT source, count(*) AS ng FROM docs GROUP BY 1),
              ranked AS (SELECT d.source, n_chars, ng,
                  CAST(row_number() OVER (PARTITION BY d.source
                    ORDER BY n_chars, doc_id) AS BIGINT) AS rnk
                FROM docs d JOIN sg ON d.source = sg.source),
              dec AS (SELECT source, n_chars,
                  (((2 * rnk - 1) * 1000000) // (2 * ng)) // 100000
                    AS decile
                FROM ranked),
              vg AS (SELECT n_chars, count(*) AS cnt,
                  coalesce(sum(count(*)) OVER (ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS ce
                FROM docs GROUP BY n_chars),
              targets AS (SELECT k AS decile,
                  ((k * 100000 + 50000) * (SELECT n FROM nn)) // 1000000
                    + 1 AS t
                FROM (SELECT unnest(range(0, 10)) AS k)),
              dmap AS (SELECT decile, n_chars AS pooled_value
                FROM vg JOIN targets ON t > ce AND t <= ce + cnt)
              SELECT d.source, CAST(d.decile AS BIGINT) AS decile,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS raw_mean,
                CAST(pooled_value AS BIGINT) AS pooled_value
              FROM dec d JOIN dmap ON d.decile = dmap.decile
              GROUP BY 1, 2, 5 ORDER BY 1, 2""")
    ),

    // ── BROWN-FORSYTHE VARIANCE-EQUALITY TEST ─────────────────────────────
    QueryDef(
      "q376_brown_forsythe",
      // Do event types have equal value spread? The robust Levene
      // variant: one-way ANOVA on absolute deviations from each group's
      // MEDIAN (exact lower median from the value grain, q267's order-
      // statistic pattern — never a percentile approximation). The
      // between-group sum Σ s_t²/n_t crosses groups, so each per-group
      // term is micro-FLOORED to a BIGINT first (q348's per-cell χ²
      // discipline) — cross-group addition is exact integer arithmetic,
      // and F is one pinned double block.
      //
      // Shape, and why it scales: one fact pass to the (type, cents)
      // value grain; medians via type-partitioned value-grain windows;
      // deviation moments re-aggregate the SAME value grain (cnt-
      // weighted — no second fact pass); output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val vg = Tables.events(s, d)
          .select(col("event_type"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val tot = vg.groupBy("event_type").agg(sum(col("cnt")).as("n"))
        val w = Window.partitionBy("event_type").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, 0)
        val med = vg.join(broadcast(tot), "event_type")
          .withColumn("ci", sum(col("cnt")).over(w))
          .filter(col("ci") * 2L >= col("n"))
          .groupBy("event_type").agg(min(col("cents")).as("med"))
        val g = vg.join(broadcast(med), "event_type")
          .withColumn("z", abs(col("cents") - col("med")))
          .groupBy("event_type")
          .agg(sum(col("cnt")).as("n_t"),
            sum(col("cnt") * col("z")).as("sz"),
            sum(expr("CAST(cnt AS DECIMAL(38,0)) * z * z")).as("qz"))
          // DECIMAL(38,0), not BIGINT: per-group b_micro reaches ~2.4e18
          // at sf1 (measured), so the k-group SUM overflows a Long —
          // the r12 sf1 full-suite pass caught exactly that. The floored
          // double is identical in both engines either way; the decimal
          // accumulator keeps the cross-group addition exact and
          // order-free at any scale.
          .withColumn("b_micro", expr(
            """CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
              / CAST(n_t AS DOUBLE) * 1000000.0) AS DECIMAL(38,0))"""))
        g.agg(count(lit(1)).as("k"), sum(col("n_t")).as("n"),
            sum(col("sz")).as("szg"), sum(col("qz")).as("qzg"),
            sum(col("b_micro")).as("sb"))
          // no floor() in the final block: the global szg²/n·1e6 term
          // reaches 1.18e19 at sf1 — past Long.MaxValue, where Spark's
          // floor(double)→long SATURATES (silently, outside the ANSI
          // add path) while DuckDB's floor stays exact; the r12 sf1
          // oracle run caught the 1000× F inflation. The F block is now
          // pure double algebra on identical exact operands (sb micro-
          // floored per group, szg/qzg/n/k exact integers) — identical
          // IEEE results in both engines at any magnitude.
          .select(col("k"), col("n"),
            (col("k") - 1L).as("df1"), (col("n") - col("k")).as("df2"),
            expr("""((CAST(sb AS DOUBLE) / 1000000.0 - CAST(szg AS DOUBLE)
                  * CAST(szg AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(k - 1L AS DOUBLE))
              / ((CAST(qzg AS DOUBLE) - CAST(sb AS DOUBLE) / 1000000.0)
                / CAST(n - k AS DOUBLE))""").as("f_bf"))
      },
      Some("""WITH vg AS (SELECT event_type,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              tot AS (SELECT event_type, sum(cnt) AS n FROM vg
                GROUP BY 1),
              c AS (SELECT vg.event_type, cents, n,
                  sum(cnt) OVER (PARTITION BY vg.event_type
                    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS ci
                FROM vg JOIN tot ON vg.event_type = tot.event_type),
              med AS (SELECT event_type, min(cents) AS med FROM c
                WHERE ci * 2 >= n GROUP BY 1),
              g AS (SELECT vg.event_type,
                  CAST(sum(cnt) AS BIGINT) AS n_t,
                  CAST(sum(cnt * abs(cents - med)) AS BIGINT) AS sz,
                  sum(CAST(cnt AS DECIMAL(38,0)) * abs(cents - med)
                    * abs(cents - med)) AS qz
                FROM vg JOIN med ON vg.event_type = med.event_type
                GROUP BY 1),
              b AS (SELECT *,
                  CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                    / CAST(n_t AS DOUBLE) * 1000000.0) AS DECIMAL(38,0))
                    AS b_micro
                FROM g),
              f AS (SELECT count(*) AS k, sum(n_t) AS n,
                  sum(sz) AS szg, sum(qz) AS qzg, sum(b_micro) AS sb
                FROM b)
              SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                CAST(k - 1 AS BIGINT) AS df1,
                CAST(n - k AS BIGINT) AS df2,
                ((CAST(sb AS DOUBLE) / 1000000.0 - CAST(szg AS DOUBLE)
                    * CAST(szg AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(k - 1 AS DOUBLE))
                / ((CAST(qzg AS DOUBLE) - CAST(sb AS DOUBLE) / 1000000.0)
                  / CAST(n - k AS DOUBLE)) AS f_bf
              FROM f""")
    ),

    // ── ISOTONIC CALIBRATION (PAV via the minimax identity) ───────────────
    QueryDef(
      "q377_isotonic",
      // The calibration MAP q360 only measures: fit the monotone
      // score→probability map by isotonic regression over the q360
      // score bands. Pool-adjacent-violators is sequential, but on a
      // BOUNDED bin table the minimax identity computes it in closed
      // form: iso(i) = max_{j≤i} min_{l≥i} avg(y over bins j..l) — all
      // 55 interval averages enumerate on the 10-row cumulative table,
      // comparisons order by pinned double averages, and the fitted
      // rate is micro-floored at the very end.
      //
      // Shape, and why it scales: rides the [[TextQueries.nbScores]]
      // doc-grain memo; one bounded-bin aggregation; everything after
      // runs on ≤10-row model tables (the interval grid is 55 rows).
      (s, d) => {
        val bins = TextQueries.nbScores(s, d)
          .select(col("y"),
            greatest(lit(-5L), least(lit(4L),
              expr("score_ppm div 2000L"))).as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val wc = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = bins
          .withColumn("cn", sum(col("n")).over(wc))
          .withColumn("cs", sum(col("sy")).over(wc))
        val lo = cum.select(col("bin").as("j"),
          (col("cn") - col("n")).as("cnj"), (col("cs") - col("sy")).as("csj"))
        val hi = cum.select(col("bin").as("l"), col("cn").as("cnl"),
          col("cs").as("csl"))
        val ivals = lo.join(hi, col("j") <= col("l"))
          .select(col("j"), col("l"),
            expr("""CAST(csl - csj AS DOUBLE)
              / CAST(cnl - cnj AS DOUBLE)""").as("avg_d"))
        val per = bins.select(col("bin"), col("n"), col("sy"))
          .join(ivals, col("j") <= col("bin") && col("bin") <= col("l"))
          .groupBy("bin", "n", "sy", "j").agg(min(col("avg_d")).as("mn"))
          .groupBy("bin", "n", "sy").agg(max(col("mn")).as("iso_d"))
        per.select(col("bin"), col("n"),
            expr("sy * 1000000L div n").as("raw_ppm"),
            expr("CAST(floor(iso_d * 1000000.0) AS BIGINT)").as("iso_ppm"))
          .orderBy("bin")
      },
      Some(s"""WITH base AS (${TextQueries.nbScoreSql}),
              bins AS (SELECT greatest(-5, least(4, score_ppm // 2000))
                    AS bin,
                  count(*) AS n, sum(y) AS sy
                FROM base GROUP BY 1),
              cum AS (SELECT bin, n, sy,
                  sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cn,
                  sum(sy) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cs
                FROM bins),
              ivals AS (SELECT lo.bin AS j, hi.bin AS l,
                  CAST(hi.cs - (lo.cs - lo.sy) AS DOUBLE)
                    / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS avg_d
                FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
              per AS (SELECT b.bin, b.n, b.sy, j, min(avg_d) AS mn
                FROM bins b JOIN ivals
                  ON j <= b.bin AND b.bin <= l
                GROUP BY 1, 2, 3, 4),
              iso AS (SELECT bin, n, sy, max(mn) AS iso_d FROM per
                GROUP BY 1, 2, 3)
              SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
                CAST(sy * 1000000 // n AS BIGINT) AS raw_ppm,
                CAST(floor(iso_d * 1000000.0) AS BIGINT) AS iso_ppm
              FROM iso ORDER BY bin""")
    ),

    // ── DETERMINISTIC NEGATIVE SAMPLING ───────────────────────────────────
    QueryDef(
      "q378_negative_sampling",
      // The contrastive-training data generator: for every observed
      // (customer, part) purchase pair, draw 4 candidate negative parts
      // from the catalog via the seeded md5 family (reproducible across
      // engines, shards and reruns — the q72 hash-split argument), then
      // drop collisions with the positive itself and with ANY of the
      // customer's other positives (the standard observed-positive
      // exclusion) by one left-anti join.
      //
      // Shape, and why it scales: positives are one keyed orders⋈
      // lineitem join + distinct; the 4-way draw explode rides inside
      // codegen; exclusion is one keyed left-anti join on
      // (customer, candidate). Output ≈ 4 rows per positive.
      (s, d) => Shared.withCheckpointDir(s) {
        val pos = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
            "o_orderkey")
          .select(col("o_custkey").as("custkey"),
            col("l_partkey").as("pos_partkey"))
          .distinct()
          .checkpoint()
        val p = Tables.part(s, d).count()
        pos
          .select(col("custkey"), col("pos_partkey"),
            explode(array((0 until 4).map(i => lit(i.toLong)): _*))
              .as("draw"))
          .withColumn("neg_partkey",
            h32(concat(lit("neg"), col("custkey"), lit("-"),
              col("pos_partkey"), lit("-"), col("draw"))) % p)
          .filter(col("neg_partkey") =!= col("pos_partkey"))
          .join(pos.select(col("custkey"),
            col("pos_partkey").as("neg_partkey")),
            Seq("custkey", "neg_partkey"), "left_anti")
          // using-column anti join hoists the keys to the front; pin the
          // documented order back
          .select(col("custkey"), col("pos_partkey"), col("draw"),
            col("neg_partkey"))
      },
      Some(s"""WITH pos AS (SELECT DISTINCT o_custkey AS custkey,
                  l_partkey AS pos_partkey
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              p AS (SELECT count(*) AS np FROM part),
              cand AS (SELECT custkey, pos_partkey, draw,
                  ${SQL_H32(
                    "'neg' || custkey || '-' || pos_partkey || '-' || draw"
                  )} % np AS neg_partkey
                FROM pos CROSS JOIN (SELECT unnest(range(0, 4)) AS draw)
                CROSS JOIN p)
              SELECT custkey, pos_partkey, CAST(draw AS BIGINT) AS draw,
                CAST(neg_partkey AS BIGINT) AS neg_partkey
              FROM cand c
              WHERE neg_partkey <> pos_partkey
                AND NOT EXISTS (SELECT 1 FROM pos x
                  WHERE x.custkey = c.custkey
                    AND x.pos_partkey = c.neg_partkey)""")
    )
  )
}
