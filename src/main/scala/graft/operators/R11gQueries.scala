package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 9: corpus/series/metric completions — TextRank keyword
  * extraction (the graph-ranking counterpart to q286's RAKE, reusing the
  * bigram memo and q145's integer-PageRank discipline), the lead-lag
  * cross-correlation function between two business series (the
  * two-series companion to q358's ACF), Cohen's d / Hedges' g effect
  * size (the magnitude read q365's p-value doesn't give), trimmed +
  * winsorized robust means (completing q267's fence family), stratified
  * proportional PPS sampling (q265's Madow walk inside each stratum),
  * and the per-label embedding-centroid drift matrix (micro-quantized
  * centroids, the corpus-level companion to q126's SemDeDup).
  *
  * Determinism: library-wide rules — integer rank/weight arithmetic with
  * mass-conserving bounds for TextRank, exact DECIMAL(38,0) moments with
  * one pinned double block for CCF/effect size/cosines, value-grain
  * order statistics for the robust means, packed-key prefix sums for the
  * stratified walk, micro-floored quantization for float embeddings.
  */
object R11gQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── TEXTRANK KEYWORD EXTRACTION ───────────────────────────────────────
    QueryDef(
      "q367_textrank",
      // Mihalcea & Tarau's TextRank: PageRank over the token-adjacency
      // graph (undirected — each bigram contributes both directions),
      // stop words excluded as vertices, 3 unrolled rounds of q145's
      // INTEGER rank discipline at scale S = 10¹⁰. Edge weights are
      // ppm-normalized per source vertex FIRST (wp = w·10⁶ div W_u ≤
      // 10⁶), so every contribution r·wp div 10⁶ is Long-bounded at ANY
      // corpus size — rank mass is conserved, so cs ≤ S always.
      //
      // Shape, and why it scales: reads the memoized bigram scratch
      // (shared with q188/q209/q210); edges/ranks are vocabulary-bounded
      // tables; each round is one keyed equi-join + hash agg; the
      // iteration is 3 fixed rounds over checkpointed invariants.
      (s, d) => Shared.withCheckpointDir(s) {
        val S = 10000000000L
        val stop = Seq("the", "a")
        val bg = TextQueries.bigramTable(s, d)._1
          .filter(col("w1") =!= col("w2") &&
            !col("w1").isInCollection(stop) &&
            !col("w2").isInCollection(stop))
        val e0 = bg.groupBy(col("w1").as("src"), col("w2").as("dst"))
          .agg(count(lit(1)).as("w"))
        val e = e0.unionAll(e0.select(col("dst").as("src"),
            col("src").as("dst"), col("w")))
          .groupBy("src", "dst").agg(sum(col("w")).as("w"))
        val wdeg = e.groupBy("src").agg(sum(col("w")).as("wsum"))
        val edges = e.join(wdeg, "src")
          .select(col("src"), col("dst"),
            expr("w * 1000000L div wsum").as("wp"))
          .checkpoint()
        val n = wdeg.count()
        val base = (15L * S) / (100L * n)
        var ranks = wdeg.select(col("src").as("node"), lit(S / n).as("r"))
        for (_ <- 1 to 3) {
          ranks = edges.join(ranks, col("src") === col("node"))
            .select(col("dst"), expr("(r * wp) div 1000000L").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("cs"))
            .select(col("dst").as("node"),
              (lit(base) + expr("(85 * cs) div 100")).as("r"))
        }
        ranks.orderBy(col("r").desc, col("node").asc).limit(20)
          .select(col("node").as("token"), col("r").as("rank_i"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS t FROM documents),
              bg AS (SELECT t[p] AS w1, t[p+1] AS w2
                FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS p
                      FROM tok WHERE len(t) >= 2)
                WHERE t[p] <> t[p+1] AND t[p] NOT IN ('the', 'a')
                  AND t[p+1] NOT IN ('the', 'a')),
              e0 AS (SELECT w1 AS src, w2 AS dst, count(*) AS w
                FROM bg GROUP BY 1, 2),
              e AS (SELECT src, dst, sum(w) AS w FROM
                  (SELECT src, dst, w FROM e0
                   UNION ALL SELECT dst, src, w FROM e0)
                GROUP BY 1, 2),
              wdeg AS (SELECT src, sum(w) AS wsum FROM e GROUP BY 1),
              edges AS (SELECT e.src, e.dst, w * 1000000 // wsum AS wp
                FROM e JOIN wdeg ON e.src = wdeg.src),
              nn AS (SELECT count(*) AS n FROM wdeg),
              r0 AS (SELECT src AS node,
                  CAST(10000000000 // n AS BIGINT) AS r FROM wdeg, nn),
              r1 AS (SELECT edges.dst AS node,
                  CAST((15 * 10000000000) // (100 * (SELECT n FROM nn))
                    + (85 * sum((r0.r * wp) // 1000000)) // 100 AS BIGINT)
                    AS r
                FROM edges JOIN r0 ON r0.node = edges.src GROUP BY 1),
              r2 AS (SELECT edges.dst AS node,
                  CAST((15 * 10000000000) // (100 * (SELECT n FROM nn))
                    + (85 * sum((r1.r * wp) // 1000000)) // 100 AS BIGINT)
                    AS r
                FROM edges JOIN r1 ON r1.node = edges.src GROUP BY 1),
              r3 AS (SELECT edges.dst AS node,
                  CAST((15 * 10000000000) // (100 * (SELECT n FROM nn))
                    + (85 * sum((r2.r * wp) // 1000000)) // 100 AS BIGINT)
                    AS r
                FROM edges JOIN r2 ON r2.node = edges.src GROUP BY 1)
              SELECT node AS token, r AS rank_i FROM r3
              ORDER BY r DESC, node LIMIT 20""")
    ),

    // ── LEAD-LAG CROSS-CORRELATION (two business series) ──────────────────
    QueryDef(
      "q368_ccf",
      // Does order volume LEAD shipment volume? The cross-correlation
      // function between daily order counts (x) and daily line-item
      // ship counts (y) at lags −7..+7. q358's n²-scaling generalizes:
      // each numerator term (n_x·x_t − Σx)(n_y·y_{t+k} − Σy) =
      // n_x·n_y·(x−x̄)(y−ȳ) exactly, and the same n_x·n_y factor
      // multiplies the denominator √(n_x²·A · n_y²·B) — so the exact
      // DECIMAL(38,0) integer moments cancel to the true r_k with ONE
      // pinned double block per lag.
      //
      // Shape, and why it scales: two fact passes to calendar-bounded
      // day grains (both checkpointed); lag pairing is a keyed equi-join
      // on day+k; 1-row moment broadcasts; output is 15 rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val x = Tables.orders(s, d)
          .groupBy(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"))
          .agg(count(lit(1)).as("x")).checkpoint()
        val y = Tables.lineitem(s, d)
          .groupBy(datediff(col("l_shipdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"))
          .agg(count(lit(1)).as("y")).checkpoint()
        val mx = x.agg(count(lit(1)).as("nx"), sum(col("x")).as("sx"))
        val my = y.agg(count(lit(1)).as("ny"), sum(col("y")).as("sy"))
        val dx = x.crossJoin(broadcast(mx))
          .agg(sum(expr("""CAST(nx * x - sx AS DECIMAL(38,0))
              * (nx * x - sx)""")).as("dx"))
        val dy = y.crossJoin(broadcast(my))
          .agg(sum(expr("""CAST(ny * y - sy AS DECIMAL(38,0))
              * (ny * y - sy)""")).as("dy"))
        x.select(col("day"), col("x"),
            explode(array((-7 to 7).map(i => lit(i.toLong)): _*)).as("k"))
          .join(y.select(col("day").as("dayy"), col("y")),
            col("day") + col("k") === col("dayy"))
          .crossJoin(broadcast(mx)).crossJoin(broadcast(my))
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("""CAST(nx * x - sx AS DECIMAL(38,0))
                * (ny * y - sy)""")).as("num"))
          .crossJoin(broadcast(dx)).crossJoin(broadcast(dy))
          .select(col("k").as("lag"), col("n_pairs"),
            expr("""CAST(num AS DOUBLE)
              / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))""")
              .as("r_ccf"))
          .orderBy("lag")
      },
      Some("""WITH x AS (SELECT date_diff('day', TIMESTAMP '1970-01-01',
                    date_trunc('day', o_orderdate)) AS day,
                  count(*) AS x
                FROM orders GROUP BY 1),
              y AS (SELECT date_diff('day', TIMESTAMP '1970-01-01',
                    date_trunc('day', l_shipdate)) AS day,
                  count(*) AS y
                FROM lineitem GROUP BY 1),
              mx AS (SELECT count(*) AS nx, sum(x) AS sx FROM x),
              my AS (SELECT count(*) AS ny, sum(y) AS sy FROM y),
              dx AS (SELECT sum(CAST(nx * x - sx AS DECIMAL(38,0))
                    * (nx * x - sx)) AS dx FROM x, mx),
              dy AS (SELECT sum(CAST(ny * y - sy AS DECIMAL(38,0))
                    * (ny * y - sy)) AS dy FROM y, my),
              lags AS (SELECT k FROM (SELECT unnest(range(-7, 8)) AS k)),
              pairs AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
                  sum(CAST(nx * x.x - sx AS DECIMAL(38,0))
                    * (ny * y.y - sy)) AS num
                FROM x JOIN lags ON true
                JOIN y ON y.day = x.day + k, mx, my
                GROUP BY 1)
              SELECT CAST(k AS BIGINT) AS lag, n_pairs,
                CAST(num AS DOUBLE)
                  / sqrt(CAST((SELECT dx FROM dx) AS DOUBLE)
                    * CAST((SELECT dy FROM dy) AS DOUBLE)) AS r_ccf
              FROM pairs ORDER BY lag""")
    ),

    // ── COHEN'S D / HEDGES' G EFFECT SIZE ─────────────────────────────────
    QueryDef(
      "q369_cohens_d",
      // The magnitude q365's p-value doesn't carry: the standardized
      // mean difference of order value between high-priority and other
      // orders, with the small-sample Hedges correction. Counts and
      // cents moments (Σx, Σx²) accumulate as exact DECIMAL(38,0) in
      // ONE conditional aggregation; d and g are one pinned double
      // block (pooled variance via the sum-of-squares identity).
      //
      // Shape, and why it scales: one fact pass, one hash agg to 1 row.
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .as("g"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .agg(sum(when(col("g"), 1L).otherwise(0L)).as("na"),
            sum(when(col("g"), col("cents")).otherwise(0L)).as("sa"),
            sum(when(col("g"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("qa"),
            sum(when(!col("g"), 1L).otherwise(0L)).as("nb"),
            sum(when(!col("g"), col("cents")).otherwise(0L)).as("sb"),
            sum(when(!col("g"),
              expr("CAST(cents AS DECIMAL(38,0)) * cents"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("qb"))
          .select(col("na"), col("nb"),
            expr("""CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
              - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)""")
              .as("mean_diff_cents"),
            expr("""(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
              / sqrt(((CAST(qa AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                    / CAST(na AS DOUBLE))
                + (CAST(qb AS DOUBLE)
                  - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                    / CAST(nb AS DOUBLE)))
                / CAST(na + nb - 2L AS DOUBLE))""").as("cohens_d"))
          .withColumn("hedges_g", expr(
            """cohens_d * (CAST(1 AS DOUBLE)
              - CAST(3 AS DOUBLE) / CAST(4L * (na + nb) - 9L AS DOUBLE))"""))
      },
      Some("""WITH g AS (SELECT
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS grp,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    AS cents
                FROM orders),
              m AS (SELECT
                  CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS na,
                  CAST(sum(CASE WHEN grp = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS sa,
                  sum(CASE WHEN grp = 1
                    THEN CAST(cents AS DECIMAL(38,0)) * cents
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS qa,
                  CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nb,
                  CAST(sum(CASE WHEN grp = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sb,
                  sum(CASE WHEN grp = 0
                    THEN CAST(cents AS DECIMAL(38,0)) * cents
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS qb
                FROM g),
              t AS (SELECT na, nb,
                  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                    - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                    AS mean_diff_cents,
                  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                    - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                  / sqrt(((CAST(qa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                        / CAST(na AS DOUBLE))
                    + (CAST(qb AS DOUBLE)
                      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                        / CAST(nb AS DOUBLE)))
                    / CAST(na + nb - 2 AS DOUBLE)) AS cohens_d
                FROM m)
              SELECT na, nb, mean_diff_cents, cohens_d,
                cohens_d * (CAST(1 AS DOUBLE)
                  - CAST(3 AS DOUBLE)
                    / CAST(4 * (na + nb) - 9 AS DOUBLE)) AS hedges_g
              FROM t""")
    ),

    // ── TRIMMED + WINSORIZED ROBUST MEANS ─────────────────────────────────
    QueryDef(
      "q370_robust_mean",
      // The robust location estimates q267's MAD fences complement: the
      // 10% trimmed mean (drop each tail) and 10% winsorized mean
      // (clamp each tail to the cut values) of event value per type.
      // Order statistics are EXACT on the distinct-value grain: a
      // type-partitioned cumulative count window (value-grain-bounded,
      // q267's shape), tail cut lo = n div 10, kept-mass overlap per
      // value row = min(ci, n−lo) − max(ce, lo) clamped at 0 — all
      // BIGINT; each mean is one pinned double division.
      //
      // Shape, and why it scales: one fact pass to the (type, cents)
      // value grain; windows partition by type over the bounded grain;
      // one hash agg back to the type table.
      (s, d) => {
        val vg = Tables.events(s, d)
          .select(col("event_type"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
        val tot = vg.groupBy("event_type").agg(sum(col("cnt")).as("n"))
        val w = Window.partitionBy("event_type").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        vg.join(broadcast(tot), "event_type")
          .withColumn("ce", coalesce(sum(col("cnt")).over(w), lit(0L)))
          .withColumn("ci", col("ce") + col("cnt"))
          .withColumn("lo", expr("n div 10L"))
          .withColumn("keep", greatest(lit(0L),
            least(col("ci"), col("n") - col("lo")) -
              greatest(col("ce"), col("lo"))))
          .groupBy("event_type", "n", "lo")
          .agg(sum(col("cents") * col("keep")).as("tsum"),
            min(when(col("ci") >= col("lo") + 1L, col("cents")))
              .as("v_lo"),
            min(when(col("ci") >= col("n") - col("lo"), col("cents")))
              .as("v_hi"))
          .select(col("event_type"), col("n"), col("v_lo"), col("v_hi"),
            expr("""CAST(tsum AS DOUBLE)
              / CAST(n - 2L * lo AS DOUBLE)""").as("trimmed_mean"),
            expr("""CAST(tsum + lo * v_lo + lo * v_hi AS DOUBLE)
              / CAST(n AS DOUBLE)""").as("winsorized_mean"))
          .orderBy("event_type")
      },
      Some("""WITH vg AS (SELECT event_type,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              tot AS (SELECT event_type, sum(cnt) AS n FROM vg GROUP BY 1),
              c AS (SELECT vg.event_type, cents, cnt, n,
                  coalesce(sum(cnt) OVER (PARTITION BY vg.event_type
                    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS ce,
                  n // 10 AS lo
                FROM vg JOIN tot ON vg.event_type = tot.event_type),
              k AS (SELECT event_type, n, lo, cents, cnt, ce,
                  ce + cnt AS ci,
                  greatest(0, least(ce + cnt, n - lo)
                    - greatest(ce, lo)) AS keep
                FROM c),
              a AS (SELECT event_type, n, lo,
                  sum(cents * keep) AS tsum,
                  min(CASE WHEN ci >= lo + 1 THEN cents END) AS v_lo,
                  min(CASE WHEN ci >= n - lo THEN cents END) AS v_hi
                FROM k GROUP BY 1, 2, 3)
              SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST(v_lo AS BIGINT) AS v_lo, CAST(v_hi AS BIGINT) AS v_hi,
                CAST(tsum AS DOUBLE) / CAST(n - 2 * lo AS DOUBLE)
                  AS trimmed_mean,
                CAST(tsum + lo * v_lo + lo * v_hi AS DOUBLE)
                  / CAST(n AS DOUBLE) AS winsorized_mean
              FROM a ORDER BY event_type""")
    ),

    // ── STRATIFIED PROPORTIONAL PPS SAMPLE ────────────────────────────────
    QueryDef(
      "q371_stratified_pps",
      // q265's Madow systematic walk run INSIDE each stratum, with
      // proportional allocation: stratum g gets k_g = (K·W_g) div W of
      // the K = 60 draws (char-budget-proportional), and each stratum
      // walks its own cumulative n_chars line — so per-source coverage
      // is guaranteed by construction, the thing the global walk can't
      // promise. The within-stratum prefix comes from ONE global
      // [[Shared.distributedPrefixSum]] over the packed key
      // src_idx·2⁴² + doc_id (strata are contiguous in that order, so
      // within-cum = global cum − stratum offset; raise_error guards
      // doc_id < 2⁴²); multiplicity is the same pure-BIGINT
      // floor-difference as q265.
      //
      // Shape, and why it scales: one corpus pass to (doc, chars); the
      // stratum table is source-bounded (tiny window for index +
      // offsets, broadcast back); one prefix-sum round; stateless
      // projected filter. Output ≤ K rows.
      (s, d) => Shared.withCheckpointDir(s) {
        val K = 60L
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val src0 = docs.groupBy("source")
          .agg(sum(col("n_chars")).as("wg"), count(lit(1)).as("cg"))
        val wTot = src0.agg(sum(col("wg"))).head.getLong(0)
        val wIdx = Window.orderBy("source")
        val src = src0
          .withColumn("idx", row_number().over(wIdx).cast("long") - 1L)
          .withColumn("off",
            coalesce(sum(col("wg")).over(
              wIdx.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("kg", expr(s"(${K}L * wg) div ${wTot}L"))
        val keyed = docs.join(broadcast(src), "source")
          .withColumn("key",
            when(col("doc_id") < 0L || col("doc_id") >= lit(1L << 42),
              raise_error(concat(lit("q371: packed-key bounds contract " +
                "violated for doc_id "), col("doc_id"))))
              .otherwise(col("idx") * lit(1L << 42) + col("doc_id")))
        Shared.distributedPrefixSum(keyed, "key", "n_chars")
          .withColumn("ce", col("cum") - col("off"))
          .withColumn("ci", col("ce") + col("n_chars"))
          .filter(col("kg") > 0L)
          .select(col("source"), col("doc_id"), col("n_chars"), col("kg"),
            expr("(kg * ci) div wg").as("fi"),
            expr("(kg * ce) div wg").as("fe"))
          .filter(col("fi") > col("fe"))
          .select(col("source"), col("doc_id"), col("n_chars"), col("kg"),
            (col("fi") - col("fe")).as("multiplicity"))
      },
      Some("""WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
              src AS (SELECT source, sum(n_chars) AS wg FROM docs
                GROUP BY 1),
              w AS (SELECT sum(wg) AS w FROM src),
              kgs AS (SELECT source, wg, (60 * wg) // w AS kg
                FROM src CROSS JOIN w),
              pre AS (SELECT doc_id, source, n_chars,
                  coalesce(sum(n_chars) OVER (PARTITION BY source
                    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS ce
                FROM docs),
              sel AS (SELECT p.source, doc_id, n_chars, kg,
                  CAST(kg * (ce + n_chars) AS BIGINT) // wg AS fi,
                  CAST(kg * ce AS BIGINT) // wg AS fe
                FROM pre p JOIN kgs ON p.source = kgs.source
                WHERE kg > 0)
              SELECT source, doc_id, n_chars, CAST(kg AS BIGINT) AS kg,
                CAST(fi - fe AS BIGINT) AS multiplicity
              FROM sel WHERE fi > fe""")
    ),

    // ── EMBEDDING CENTROID DRIFT MATRIX ───────────────────────────────────
    QueryDef(
      "q372_centroid_drift",
      // Are the label populations drifting apart in embedding space?
      // Per-label centroids and their pairwise cosine matrix — the
      // corpus-level mixing diagnostic (SemDeDup q126 asks it per
      // cluster; this asks it per labeled population). Floats never
      // aggregate directly (order-dependent): each dimension is
      // micro-FLOORED to an exact BIGINT first, centroids are integer
      // truncating divisions, and each cosine is one pinned double
      // block over the label-bounded centroid table.
      //
      // Shape, and why it scales: one pass over the embeddings fact
      // explodes to (label, dim) — dim is model-bounded — and hash-
      // aggregates; the pairwise stage runs on the labels×dim model
      // table (keyed equi-join on dim, label_a < label_b).
      (s, d) => {
        val g = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")))
          .select(col("label"), col("pos").cast("long").as("dim"),
            expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("q"))
          .groupBy("label", "dim")
          .agg(count(lit(1)).as("nv"), sum(col("q")).as("sq"))
          .select(col("label"), col("dim"), expr("sq div nv").as("c"))
        val a = g.select(col("label").as("label_a"), col("dim"),
          col("c").as("ca"))
        val b = g.select(col("label").as("label_b"), col("dim"),
          col("c").as("cb"))
        a.join(b, "dim").filter(col("label_a") < col("label_b"))
          .groupBy("label_a", "label_b")
          .agg(sum(expr("ca * cb")).as("dot"),
            sum(expr("ca * ca")).as("na"),
            sum(expr("cb * cb")).as("nb"))
          .select(col("label_a"), col("label_b"),
            expr("""CAST(dot AS DOUBLE)
              / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))""")
              .as("cosine"))
          .orderBy("label_a", "label_b")
      },
      Some("""WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                  generate_subscripts(embedding, 1) AS dim1,
                  unnest(embedding) AS v
                FROM embeddings),
              g AS (SELECT label, CAST(dim1 - 1 AS BIGINT) AS dim,
                  sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0)
                    AS BIGINT)) // count(*) AS c
                FROM x GROUP BY 1, 2),
              p AS (SELECT a.label AS label_a, b.label AS label_b,
                  sum(a.c * b.c) AS dot,
                  sum(a.c * a.c) AS na, sum(b.c * b.c) AS nb
                FROM g a JOIN g b ON a.dim = b.dim AND a.label < b.label
                GROUP BY 1, 2)
              SELECT label_a, label_b,
                CAST(dot AS DOUBLE)
                  / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
                  AS cosine
              FROM p ORDER BY 1, 2""")
    )
  )
}
