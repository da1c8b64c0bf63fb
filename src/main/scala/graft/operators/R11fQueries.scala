package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 8: forecast-quality, classifier-quality, graph-quality
  * and inequality completions — the Brier score with its Murphy
  * decomposition (the proper-scoring companion to q360's ECE), the
  * Matthews correlation coefficient + balanced accuracy (the
  * prevalence-robust numbers q266's F1 report omits), global graph
  * transitivity (the wedge-closure ratio q218's raw triangle count feeds),
  * degree assortativity (Newman's r — do hubs attach to hubs?), a
  * deterministic 64-draw randomization test (the nonparametric companion
  * to q244's chi-square), and the Gini coefficient with top-share
  * concentration (the revenue-inequality read every marketplace reports).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) accumulators
  * with ONE pinned double division at the end, seeded md5-family
  * assignment for the randomization draws, packed-key distributed ranks
  * (never a single-partition global window) for the Gini order
  * statistics.
  */
object R11fQueries {

  import Shared._

  /** Matthews correlation from the four confusion cells — shared verbatim
    * between engines. `tpn` is the exact DECIMAL numerator tp·tn − fp·fn;
    * the denominator's four marginals multiply as doubles (exact for any
    * plausible corpus) and a zero marginal NULLs the result rather than
    * dividing by zero.
    */
  private val MccSql =
    """(CAST(tpn AS DOUBLE)
       / sqrt(nullif(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
         * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE),
         CAST(0 AS DOUBLE))))"""

  val all: Seq[QueryDef] = Seq(

    // ── BRIER SCORE + MURPHY DECOMPOSITION ────────────────────────────────
    QueryDef(
      "q361_brier",
      // Proper-scoring-rule audit of a probabilistic forecast: train
      // per-event-type conversion rates (value ≥ 50) on EVEN user_ids,
      // forecast those rates (ppm) for ODD users, and score with the
      // Brier score plus Murphy's decomposition — reliability (is the
      // forecast miscalibrated?), resolution (does it separate
      // outcomes?), uncertainty (base-rate variance). Because the
      // forecast is constant inside a type, every Σ(p − y·10⁶)² has the
      // closed form n·p² − 2·10⁶·p·pos + 10¹²·pos — so ALL components
      // fall out of one (type × train/test) contingency grain: integer-
      // ppm floor divisions identical in both engines, squared terms in
      // exact DECIMAL(38,0), ONE pinned double division by N per
      // component. (The textbook identity brier = rel − res + unc holds
      // up to ppm floor-rounding — the spec asserts the bound.)
      //
      // Shape, and why it scales: ONE fact pass to the ≤|types| grain
      // (conditional sums split train/test in the same aggregation);
      // everything after is arithmetic on a type-bounded table.
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"), (col("user_id") % 2 === 0).as("tr"),
            (col("value") >= 50.0).cast("long").as("y"))
          .groupBy("event_type")
          .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("ntr"),
            sum(when(col("tr"), col("y")).otherwise(0L)).as("ptr"),
            sum(when(!col("tr"), 1L).otherwise(0L)).as("n_t"),
            sum(when(!col("tr"), col("y")).otherwise(0L)).as("pos_t"))
          .filter(col("ntr") > 0L && col("n_t") > 0L)
          .withColumn("p_ppm", expr("ptr * 1000000L div ntr"))
          .withColumn("acc_ppm", expr("pos_t * 1000000L div n_t"))
        val tot = cells.agg(sum(col("n_t")).as("n"),
          sum(col("pos_t")).as("pos")).withColumn("ybar_ppm",
          expr("pos * 1000000L div n"))
        cells.crossJoin(broadcast(tot))
          .groupBy("n", "ybar_ppm")
          .agg(
            sum(expr("""CAST(n_t AS DECIMAL(38,0)) * p_ppm * p_ppm
                - CAST(2000000 AS DECIMAL(38,0)) * p_ppm * pos_t
                + CAST(1000000000000 AS DECIMAL(38,0)) * pos_t"""))
              .as("sdd"),
            sum(expr("""CAST(n_t AS DECIMAL(38,0))
                * ((p_ppm - acc_ppm) * (p_ppm - acc_ppm))""")).as("srel"),
            sum(expr("""CAST(n_t AS DECIMAL(38,0))
                * ((acc_ppm - ybar_ppm) * (acc_ppm - ybar_ppm))"""))
              .as("sres"))
          .select(col("n").as("n_test"), col("ybar_ppm"),
            expr("CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE)")
              .as("brier_ppm2"),
            expr("CAST(srel AS DOUBLE) / CAST(n AS DOUBLE)").as("rel_ppm2"),
            expr("CAST(sres AS DOUBLE) / CAST(n AS DOUBLE)").as("res_ppm2"),
            expr("ybar_ppm * (1000000L - ybar_ppm)").as("unc_ppm2"))
      },
      Some("""WITH ev AS (SELECT event_type, user_id % 2 = 0 AS tr,
                  CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
                FROM events),
              cells0 AS (SELECT event_type,
                  sum(CASE WHEN tr THEN 1 ELSE 0 END) AS ntr,
                  sum(CASE WHEN tr THEN y ELSE 0 END) AS ptr,
                  sum(CASE WHEN tr THEN 0 ELSE 1 END) AS n_t,
                  sum(CASE WHEN tr THEN 0 ELSE y END) AS pos_t
                FROM ev GROUP BY 1),
              cells AS (SELECT *,
                  ptr * 1000000 // ntr AS p_ppm,
                  pos_t * 1000000 // n_t AS acc_ppm
                FROM cells0 WHERE ntr > 0 AND n_t > 0),
              tot AS (SELECT sum(n_t) AS n, sum(pos_t) AS pos,
                  sum(pos_t) * 1000000 // sum(n_t) AS ybar_ppm
                FROM cells),
              g AS (SELECT n, ybar_ppm,
                  sum(CAST(n_t AS DECIMAL(38,0)) * p_ppm * p_ppm
                    - CAST(2000000 AS DECIMAL(38,0)) * p_ppm * pos_t
                    + CAST(1000000000000 AS DECIMAL(38,0)) * pos_t) AS sdd,
                  sum(CAST(n_t AS DECIMAL(38,0))
                    * ((p_ppm - acc_ppm) * (p_ppm - acc_ppm))) AS srel,
                  sum(CAST(n_t AS DECIMAL(38,0))
                    * ((acc_ppm - ybar_ppm) * (acc_ppm - ybar_ppm)))
                    AS sres
                FROM cells, tot GROUP BY 1, 2)
              SELECT CAST(n AS BIGINT) AS n_test,
                CAST(ybar_ppm AS BIGINT) AS ybar_ppm,
                CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE) AS brier_ppm2,
                CAST(srel AS DOUBLE) / CAST(n AS DOUBLE) AS rel_ppm2,
                CAST(sres AS DOUBLE) / CAST(n AS DOUBLE) AS res_ppm2,
                CAST(ybar_ppm * (1000000 - ybar_ppm) AS BIGINT) AS unc_ppm2
              FROM g""")
    ),

    // ── MATTHEWS CORRELATION + BALANCED ACCURACY ──────────────────────────
    QueryDef(
      "q362_mcc",
      // The prevalence-robust classifier summary: MCC (the binary-case
      // Pearson φ over the confusion matrix) and balanced accuracy at
      // q188's shipped decision rule (pred = score > 0), over the
      // memoized classifier-score grain. q266 reports precision/recall/
      // F1 — which ignore TN entirely; MCC is the number that stays
      // honest under class imbalance. Cells are exact BIGINT counts, the
      // MCC numerator is exact DECIMAL, and the one pinned division
      // NULLs (never divides by) a zero marginal.
      //
      // Shape, and why it scales: rides the [[TextQueries.nbScores]]
      // doc-grain memo; one hash aggregation to 1 row.
      (s, d) => {
        TextQueries.nbScores(s, d)
          .agg(sum(expr("CASE WHEN pred = 1 AND y = 1 THEN 1L ELSE 0L END"))
            .as("tp"),
            sum(expr("CASE WHEN pred = 1 AND y = 0 THEN 1L ELSE 0L END"))
              .as("fp"),
            sum(expr("CASE WHEN pred = 0 AND y = 1 THEN 1L ELSE 0L END"))
              .as("fn"),
            sum(expr("CASE WHEN pred = 0 AND y = 0 THEN 1L ELSE 0L END"))
              .as("tn"))
          .withColumn("tpn", expr(
            "CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn"))
          .select(col("tp"), col("fp"), col("fn"), col("tn"),
            expr(MccSql).as("mcc"),
            expr("""(tp * 1000000L div nullif(tp + fn, 0L)
               + tn * 1000000L div nullif(tn + fp, 0L)) div 2L""")
              .as("bacc_ppm"))
      },
      Some(s"""WITH base AS (${TextQueries.nbScoreSql}),
              c AS (SELECT
                  CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
                  CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
                  CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
                  CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
                FROM base),
              m AS (SELECT *,
                  CAST(tp AS DECIMAL(38,0)) * tn
                    - CAST(fp AS DECIMAL(38,0)) * fn AS tpn
                FROM c)
              SELECT tp, fp, fn, tn, $MccSql AS mcc,
                CAST((tp * 1000000 // nullif(tp + fn, 0)
                  + tn * 1000000 // nullif(tn + fp, 0)) // 2 AS BIGINT)
                  AS bacc_ppm
              FROM m""")
    ),

    // ── GLOBAL TRANSITIVITY (wedge-closure ratio) ─────────────────────────
    QueryDef(
      "q363_transitivity",
      // The clustering statistic q218's raw triangle count exists to
      // feed: global transitivity = 3·triangles / wedges, where wedges =
      // Σ_v deg(v)·(deg(v)−1)/2. Triangles reuse the q218 discipline
      // end-to-end — the shared [[GraphQueries.coPurchaseEdges]] scratch
      // memo, (deg, id) total-order orientation (Suri & Vassilvitskii),
      // shuffled-hash wedge + closing-edge equi-joins — and the wedge
      // denominator is one integer aggregation over the degree table.
      //
      // Shape, and why it scales: the memo bounds pair generation by
      // order size; orientation bounds wedge fan-out by sqrt-degeneracy;
      // both joins are keyed equi-joins on edge-list-sized tables.
      (s, d) => Shared.withCheckpointDir(s) {
        val deg = GraphQueries.coPurchaseDegrees(s, d) // shared memo
        // the oriented triangle enumeration is the shared
        // [[GraphQueries.coPurchaseTriangles]] scratch memo
        val tri = GraphQueries.coPurchaseTriangles(s, d)
        val nW = deg.agg(sum(expr("deg * (deg - 1L) div 2L")).as("w"))
          .head.getLong(0)
        val nNodes = deg.count()
        tri.agg(count(lit(1)).as("n_triangles"))
          .select(lit(nNodes).as("n_nodes"), lit(nW).as("n_wedges"),
            col("n_triangles"),
            expr(s"""CAST(3L * n_triangles AS DOUBLE)
              / CAST(${nW}L AS DOUBLE)""").as("transitivity"))
      },
      Some("""WITH e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              deg AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                GROUP BY 1),
              ed AS (SELECT
                  CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                    THEN e.a ELSE e.b END AS u,
                  CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                    THEN e.b ELSE e.a END AS v,
                  CASE WHEN (da.deg, e.a) < (db.deg, e.b)
                    THEN db.deg ELSE da.deg END AS dv
                FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
              wedges AS (SELECT x.u, x.v AS w1, y.v AS w2
                FROM ed x JOIN ed y ON x.u = y.u
                WHERE (x.dv, x.v) < (y.dv, y.v)),
              tri AS (SELECT count(*) AS t FROM wedges JOIN ed c
                  ON wedges.w1 = c.u AND wedges.w2 = c.v),
              wsum AS (SELECT sum(deg * (deg - 1) // 2) AS w FROM deg)
              SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
                CAST(w AS BIGINT) AS n_wedges,
                CAST(t AS BIGINT) AS n_triangles,
                CAST(3 * t AS DOUBLE) / CAST(w AS DOUBLE) AS transitivity
              FROM tri, wsum""")
    ),

    // ── DEGREE ASSORTATIVITY (Newman's r) ─────────────────────────────────
    QueryDef(
      "q364_assortativity",
      // Do hubs co-purchase with hubs? Newman's degree assortativity:
      // the Pearson correlation of (deg(a), deg(b)) over every DIRECTED
      // edge instance (each undirected edge contributes both
      // orientations — the standard symmetrized estimator). Moments
      // accumulate as exact DECIMAL(38,0) integers over the shared
      // [[GraphQueries.coPurchaseEdges]] memo; r is one pinned double
      // block with a NULLed zero-variance guard (q103's exact-Pearson
      // discipline on graph data).
      //
      // Shape, and why it scales: degree attach is two keyed equi-joins
      // of the edge list against the node-grain degree table; moments
      // are one hash aggregation to 1 row.
      (s, d) => {
        val e = GraphQueries.coPurchaseEdges(s, d)
        val deg = GraphQueries.coPurchaseDegrees(s, d) // shared memo
        val dd = e
          .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
          .select(col("da"), col("db"))
        dd.select(col("da").as("x"), col("db").as("y"))
          .unionAll(dd.select(col("db").as("x"), col("da").as("y")))
          .agg(count(lit(1)).as("m"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
          .select(expr("m div 2L").as("n_edges"),
            expr("""(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / sqrt(nullif(
                (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                CAST(0 AS DOUBLE)))""").as("assortativity"))
      },
      Some("""WITH e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              deg AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                GROUP BY 1),
              dd AS (SELECT da.deg AS dx, db.deg AS dy
                FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
              pairs AS (SELECT dx AS x, dy AS y FROM dd
                UNION ALL SELECT dy, dx FROM dd),
              m AS (SELECT count(*) AS m,
                  sum(CAST(x AS DECIMAL(38,0))) AS sx,
                  sum(CAST(y AS DECIMAL(38,0))) AS sy,
                  sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                  sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                  sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
                FROM pairs)
              SELECT CAST(m // 2 AS BIGINT) AS n_edges,
                (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt(nullif(
                  (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                  CAST(0 AS DOUBLE))) AS assortativity
              FROM m""")
    ),

    // ── RANDOMIZATION (PERMUTATION) TEST ──────────────────────────────────
    QueryDef(
      "q365_perm_test",
      // The nonparametric significance read q244's chi-square can't
      // give for a CONTINUOUS metric: is mean order value different for
      // high-priority orders? 64 seeded null reassignments (md5 family —
      // identical draws cross-engine) rebuild the group means under the
      // null; p = (1 + #{|d_r| ≥ |d_obs|}) / 65 (the standard add-one
      // Monte-Carlo estimator). The observed split rides the SAME
      // aggregation as seed −1, so observed and null statistics share
      // one code path; means are pinned double divisions of exact cents
      // sums.
      //
      // Shape, and why it scales: UN-EXPLODED fact passes — each null
      // arm is a row-local expression (the md5 draw), so the 64 null
      // (count, sum) pairs ride as conditional-sum columns through hash
      // aggregation to a single row (na/sa per seed; nb/sb recover as
      // total − arm, so only half the sums are carried), and the
      // 65-cell table unpivots from that 1-row frame. The r13 shape
      // exploded the fact 65× before aggregating — same math, 65× the
      // aggregated rows and shuffle write; this form keeps fact bytes
      // read and shuffle volume both constant in the seed count's row
      // dimension. The seeds split across TWO scans of ≤68 aggregate
      // fields each because one 132-field aggregate trips
      // spark.sql.codegen.maxFields (100) and falls out of whole-stage
      // codegen — two codegen'd passes (same total md5 work, the real
      // per-row cost) beat one interpreted pass by ~2×. The observed
      // row attaches as a 1-row broadcast.
      (s, d) => Shared.withCheckpointDir(s) {
        val grain = Tables.orders(s, d)
          .select(col("o_orderkey").as("okey"),
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("long").as("g_obs"),
            (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          // the md5 draws are 64 digests per ROW — far heavier than the
          // 24-byte rows they ride on, so spread the projected grain
          // across all cores first (a single-file scan would otherwise
          // run the whole digest budget on one task; the one tiny
          // shuffle is amortized over both seed-half passes)
          .repartition(s.sparkContext.defaultParallelism)
        // project each seed's arm once (the md5 is used by both its
        // count and its sum — CollapseProject keeps non-cheap exprs
        // shared rather than re-inlining them into the aggregate)
        def half(rs: Range, extras: Boolean): DataFrame = {
          val armed = grain.select(
            col("g_obs") +: col("cents") +:
              rs.map(r => (h32(concat(lit("pt"), lit(r.toLong),
                lit("-"), col("okey"))) % 2).as(s"arm_$r")): _*)
          val base = if (extras) Seq(count(lit(1)).as("n_tot"),
            sum(col("cents")).as("s_tot"),
            sum(col("g_obs")).as("na_obs"),
            sum(col("g_obs") * col("cents")).as("sa_obs")) else Nil
          val aggCols = base ++ rs.flatMap(r => Seq(
            sum(col(s"arm_$r")).as(s"na_$r"),
            sum(col(s"arm_$r") * col("cents")).as(s"sa_$r")))
          armed.agg(aggCols.head, aggCols.tail: _*)
        }
        val one = half(0 to 31, extras = true)
          .crossJoin(half(32 to 63, extras = false))
          // 1 row; checkpoint so the two consumers below (observed cell
          // + 64 null cells) never re-run the corpus aggregation
          .checkpoint()
        val cells = one.select(explode(array((-1 to 63).map { r =>
            val na = if (r == -1) col("na_obs") else col(s"na_$r")
            val sa = if (r == -1) col("sa_obs") else col(s"sa_$r")
            struct(lit(r.toLong).as("seed"), na.as("na"), sa.as("sa"),
              (col("n_tot") - na).as("nb"), (col("s_tot") - sa).as("sb"))
          }: _*)).as("c"))
          .select(col("c.seed").as("seed"), col("c.na").as("na"),
            col("c.sa").as("sa"), col("c.nb").as("nb"), col("c.sb").as("sb"))
          .withColumn("dm", expr("""CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
            - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)"""))
        val obs = cells.filter(col("seed") === -1L)
          .select(col("na").as("na_obs"), col("nb").as("nb_obs"),
            col("dm").as("d_obs"))
        cells.filter(col("seed") >= 0L)
          .crossJoin(broadcast(obs))
          .groupBy("na_obs", "nb_obs", "d_obs")
          .agg(count(lit(1)).as("n_perms"),
            sum((abs(col("dm")) >= abs(col("d_obs"))).cast("long"))
              .as("n_exceed"))
          .select(col("na_obs"), col("nb_obs"),
            col("d_obs").as("d_obs_cents"), col("n_perms"), col("n_exceed"),
            expr("""CAST(n_exceed + 1L AS DOUBLE)
              / CAST(n_perms + 1L AS DOUBLE)""").as("p_value"))
      },
      Some(s"""WITH grain AS (SELECT o_orderkey AS okey,
                  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS g_obs,
                  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT) AS cents
                FROM orders),
              seeded AS (SELECT okey, g_obs, cents, seed,
                  CASE WHEN seed = -1 THEN g_obs
                    ELSE ${SQL_H32("'pt' || seed || '-' || okey")} % 2
                  END AS arm
                FROM grain CROSS JOIN
                  (SELECT unnest(range(-1, 64)) AS seed)),
              cells AS (SELECT seed,
                  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS na,
                  CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END)
                    AS BIGINT) AS sa,
                  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS nb,
                  CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END)
                    AS BIGINT) AS sb
                FROM seeded GROUP BY 1),
              d AS (SELECT seed, na, nb,
                  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                    - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS dm
                FROM cells),
              obs AS (SELECT na AS na_obs, nb AS nb_obs, dm AS d_obs
                FROM d WHERE seed = -1)
              SELECT na_obs, nb_obs, d_obs AS d_obs_cents,
                CAST(count(*) AS BIGINT) AS n_perms,
                CAST(sum(CASE WHEN abs(dm) >= abs(d_obs) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exceed,
                CAST(sum(CASE WHEN abs(dm) >= abs(d_obs) THEN 1 ELSE 0 END)
                    + 1 AS DOUBLE)
                  / CAST(count(*) + 1 AS DOUBLE) AS p_value
              FROM d, obs WHERE seed >= 0
              GROUP BY 1, 2, 3"""),
      headline = true
    ),

    // ── GINI COEFFICIENT + TOP-SHARE CONCENTRATION ────────────────────────
    QueryDef(
      "q366_gini",
      // Revenue inequality over the customer base: the Gini coefficient
      // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over per-customer lifetime
      // cents sorted ascending, plus the top-1% / top-10% revenue
      // shares. The order statistic i is EXACT but never a single-
      // partition global window: spend packs into the UNIQUE key
      // cents·2³² + custkey ([[Shared.distributedPrefixSum]] — the q227
      // discipline, raise_error bounds guard included: per-customer
      // cents < 2³⁰, custkey < 2³²), parallel per-bucket windows deliver
      // the global rank, and every accumulator is exact DECIMAL with
      // ONE pinned double division per reported ratio.
      //
      // Shape, and why it scales: one fact pass to the customer grain
      // (checkpointed); one prefix-sum round (parallel bucket windows +
      // a model-sized offset table); one hash aggregation to 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val cust = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long")).as("cents"))
          .checkpoint()
        val n = cust.count()
        val keyed = cust.withColumn("key",
          when(col("cents") < 0L || col("cents") >= lit(1L << 30) ||
            col("o_custkey") < 0L || col("o_custkey") >= lit(1L << 32),
            raise_error(concat(lit("q366: packed-key bounds contract " +
              "violated for custkey "), col("o_custkey"))))
            .otherwise(col("cents") * lit(1L << 32) + col("o_custkey")))
        val ranked = Shared.distributedPrefixSum(
            keyed.withColumn("one", lit(1L)), "key", "one")
          .withColumn("rnk", col("cum") + 1L)
        ranked.agg(
            sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(rnk AS DECIMAL(38,0)) * cents")).as("six"),
            sum(expr(s"CASE WHEN rnk > ${n}L - ${n}L div 100L " +
              "THEN CAST(cents AS DECIMAL(38,0)) ELSE CAST(0 AS " +
              "DECIMAL(38,0)) END")).as("top1"),
            sum(expr(s"CASE WHEN rnk > ${n}L - ${n}L div 10L " +
              "THEN CAST(cents AS DECIMAL(38,0)) ELSE CAST(0 AS " +
              "DECIMAL(38,0)) END")).as("top10"))
          .select(lit(n).as("n_customers"),
            expr(s"""(CAST(2 AS DOUBLE) * CAST(six AS DOUBLE)
                - CAST(${n}L + 1L AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(${n}L AS DOUBLE) * CAST(sx AS DOUBLE))""").as("gini"),
            expr("CAST(top1 AS DOUBLE) / CAST(sx AS DOUBLE)")
              .as("top1_share"),
            expr("CAST(top10 AS DOUBLE) / CAST(sx AS DOUBLE)")
              .as("top10_share"))
      },
      Some("""WITH cust AS (SELECT o_custkey,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY 1),
              nn AS (SELECT count(*) AS n FROM cust),
              ranked AS (SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents, o_custkey)
                    AS BIGINT) AS rnk
                FROM cust),
              g AS (SELECT sum(CAST(cents AS DECIMAL(38,0))) AS sx,
                  sum(CAST(rnk AS DECIMAL(38,0)) * cents) AS six,
                  sum(CASE WHEN rnk > n - n // 100
                    THEN CAST(cents AS DECIMAL(38,0))
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS top1,
                  sum(CASE WHEN rnk > n - n // 10
                    THEN CAST(cents AS DECIMAL(38,0))
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS top10
                FROM ranked, nn GROUP BY n)
              SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_customers,
                (CAST(2 AS DOUBLE) * CAST(six AS DOUBLE)
                  - CAST((SELECT n + 1 FROM nn) AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                / (CAST((SELECT n FROM nn) AS DOUBLE)
                  * CAST(sx AS DOUBLE)) AS gini,
                CAST(top1 AS DOUBLE) / CAST(sx AS DOUBLE) AS top1_share,
                CAST(top10 AS DOUBLE) / CAST(sx AS DOUBLE) AS top10_share
              FROM g"""),
      headline = true
    )
  )
}
