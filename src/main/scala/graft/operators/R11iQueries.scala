package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-11 batch 11: time-series diagnostics, link analysis and eval
  * completions — the Ljung-Box white-noise portmanteau (the significance
  * companion to q358's ACF), the Durbin-Watson residual-autocorrelation
  * statistic (the regression-diagnostic the q205 OLS family lacked),
  * HITS hubs & authorities (the bipartite-graph dual of q145's
  * PageRank), Newman modularity of the nation partition (scores the
  * community structure q256's label propagation only produces),
  * effective sample size + design effect for importance weights (the
  * one-line health check on every weighted estimator: q265/q291/q304/
  * q371), and mean reciprocal rank over a 10-query retrieval panel
  * (closing the eval family after q276 recall, q307 NDCG, q323 AP).
  *
  * Determinism: library-wide rules — exact DECIMAL(38,0) moments with
  * n²-scaled centering (q358), ppm/fixed-point integer iteration for
  * graph loops (q145), one pinned double block per statistic with the
  * literal expression text shared between engines.
  */
object R11iQueries {

  import Shared._

  /** Ljung-Box Q = n(n+2) Σ_k r_k²/(n−k): the 7 lag terms added in ONE
    * fixed written order — identical IEEE ops in both engines. */
  private val LjungSql: String = {
    val terms = (1 to 7).map { k =>
      s"((CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE))" +
        s" * (CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE))" +
        s" / CAST(n - $k AS DOUBLE))"
    }.mkString(" + ")
    s"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ($terms)"
  }

  /** OLS slope b = Sxy/Sxx from the n²-scaled exact moments. */
  private val SlopeSql: String =
    "(CAST(sxy AS DOUBLE) / CAST(nullif(sxx, 0) AS DOUBLE))"

  /** Durbin-Watson d = Σ(e_t−e_{t−1})² / Σe_t². The numerator expands
    * over consecutive-day pairs (Δx = 1) as dyy − 2b·dy + b²·npairs;
    * the denominator is the SSE identity (Syy − Sxy²/Sxx), computed on
    * n²-scaled moments and rescaled by n². Every input is an exact
    * integer; this is the single pinned double block. */
  private val DwSql: String =
    s"""((CAST(dyy AS DOUBLE) - 2.0 * $SlopeSql * CAST(dy AS DOUBLE)
       + $SlopeSql * $SlopeSql * CAST(npairs AS DOUBLE))
     / ((CAST(syy AS DOUBLE)
         - CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)
           / CAST(nullif(sxx, 0) AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"""

  val all: Seq[QueryDef] = Seq(

    // ── LJUNG-BOX WHITE-NOISE TEST ────────────────────────────────────────
    QueryDef(
      "q379_ljung_box",
      // Is the daily event-count series white noise? The portmanteau
      // test over q358's first 7 autocorrelations: Q = n(n+2)·Σ r_k²/
      // (n−k) against χ²(7). Every r_k numerator and the shared
      // denominator are exact n²-scaled DECIMAL(38,0) moments (q358's
      // trick — (n·x_t − Σx)(n·x_{t+k} − Σx) is a pure integer), the 7
      // lags pivot to columns, and Q is ONE pinned double block whose
      // term order is fixed by the shared expression text.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); 7 keyed lag joins on that grain; the
      // pivot collapses to 1 row before any double math.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val nS = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val den = daily.crossJoin(broadcast(nS))
          .agg(sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
              * (n * x - sx)""")).as("den"))
        val lags = daily.select(col("day"), col("x"),
          explode(array((1 to 7).map(i => lit(i.toLong)): _*)).as("k"))
        val j = daily.select(col("day").as("dayj"), col("x").as("xj"))
        val nums = lags.withColumn("dayk", col("day") + col("k"))
          .join(j, col("dayk") === col("dayj"))
          .crossJoin(broadcast(nS))
          .groupBy("k")
          .agg(sum(expr("""CAST(n * x - sx AS DECIMAL(38,0))
              * (n * xj - sx)""")).as("num"))
          .agg(sum(when(col("k") === 1L, col("num"))).as("num1"),
            (2 to 7).map(i =>
              sum(when(col("k") === i.toLong, col("num"))).as(s"num$i")): _*)
        nums.crossJoin(broadcast(den)).crossJoin(broadcast(nS))
          .select(col("n").as("n_days"), lit(7L).as("df"),
            expr(LjungSql).as("q_lb"))
      },
      Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              ns AS (SELECT count(*) AS n, sum(x) AS sx FROM daily),
              den AS (SELECT sum(CAST(n * x - sx AS DECIMAL(38,0))
                    * (n * x - sx)) AS den
                FROM daily, ns),
              lags AS (SELECT k FROM (SELECT unnest(range(1, 8)) AS k)),
              pairs AS (SELECT k,
                  sum(CAST(n * a.x - sx AS DECIMAL(38,0))
                    * (n * b.x - sx)) AS num
                FROM daily a
                JOIN lags ON true
                JOIN daily b ON b.day = a.day + k, ns
                GROUP BY 1),
              piv AS (SELECT
                  ${(1 to 7).map(i =>
                    s"sum(CASE WHEN k = $i THEN num END) AS num$i")
                    .mkString(", ")}
                FROM pairs)
              SELECT (SELECT CAST(n AS BIGINT) FROM ns) AS n_days,
                CAST(7 AS BIGINT) AS df, $LjungSql AS q_lb
              FROM piv, den, ns"""),
      headline = true
    ),

    // ── DURBIN-WATSON RESIDUAL AUTOCORRELATION ────────────────────────────
    QueryDef(
      "q380_durbin_watson",
      // Are the residuals of the daily-revenue trend regression
      // autocorrelated? DW = Σ(e_t−e_{t−1})²/Σe_t² over the OLS fit of
      // daily order revenue (cents) on the day index — WITHOUT ever
      // materializing a residual: the numerator expands over
      // consecutive-day pairs as dyy − 2b·dy + b²·n_pairs and the
      // denominator is the SSE identity (Syy − Sxy²/Sxx)/n², so every
      // aggregate is an exact integer (n²-scaled DECIMAL(38,0)
      // centering, q358) and the statistic is one pinned double block.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain (checkpointed); one keyed self-join on day+1; three
      // 1-row model broadcasts; output is 1 row.
      (s, d) => Shared.withCheckpointDir(s) {
        val daily = Tables.orders(s, d)
          .select((unix_timestamp(col("o_orderdate")) / 86400L)
            .cast("long").as("day"),
            (col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
              .cast("long").as("cents"))
          .groupBy("day").agg(sum(col("cents")).as("y"))
          .checkpoint()
        val nS = daily.agg(count(lit(1)).as("n"),
          sum(col("day")).as("sx"), sum(col("y")).as("sy"))
        val mom = daily.crossJoin(broadcast(nS))
          .agg(sum(expr("""CAST(n * day - sx AS DECIMAL(38,0))
                * (n * day - sx)""")).as("sxx"),
            sum(expr("""CAST(n * day - sx AS DECIMAL(38,0))
                * (n * y - sy)""")).as("sxy"),
            sum(expr("""CAST(n * y - sy AS DECIMAL(38,0))
                * (n * y - sy)""")).as("syy"))
        val nxt = daily.select((col("day") - 1L).as("day"),
          col("y").as("y1"))
        val del = daily.join(nxt, "day")
          .agg(count(lit(1)).as("npairs"),
            sum(col("y1") - col("y")).as("dy"),
            sum(expr("CAST(y1 - y AS DECIMAL(38,0)) * (y1 - y)"))
              .as("dyy"))
        del.crossJoin(broadcast(mom)).crossJoin(broadcast(nS))
          .select(col("n").as("n_days"), col("npairs").as("n_pairs"),
            expr(SlopeSql).as("slope_cents_per_day"),
            expr(DwSql).as("dw"))
      },
      Some(s"""WITH daily AS (SELECT
                  date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                    // 86400 AS day,
                  sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS y
                FROM orders GROUP BY 1),
              ns AS (SELECT count(*) AS n, sum(day) AS sx, sum(y) AS sy
                FROM daily),
              mom AS (SELECT
                  sum(CAST(n * day - sx AS DECIMAL(38,0)) * (n * day - sx))
                    AS sxx,
                  sum(CAST(n * day - sx AS DECIMAL(38,0)) * (n * y - sy))
                    AS sxy,
                  sum(CAST(n * y - sy AS DECIMAL(38,0)) * (n * y - sy))
                    AS syy
                FROM daily, ns),
              del AS (SELECT CAST(count(*) AS BIGINT) AS npairs,
                  CAST(sum(b.y - a.y) AS BIGINT) AS dy,
                  sum(CAST(b.y - a.y AS DECIMAL(38,0)) * (b.y - a.y))
                    AS dyy
                FROM daily a JOIN daily b ON b.day = a.day + 1)
              SELECT CAST(n AS BIGINT) AS n_days, npairs AS n_pairs,
                $SlopeSql AS slope_cents_per_day, $DwSql AS dw
              FROM del, mom, ns""")
    ),

    // ── HITS HUBS & AUTHORITIES ───────────────────────────────────────────
    QueryDef(
      "q381_hits",
      // Kleinberg's HITS on the customer→supplier trade graph:
      // customers are hubs (they point), suppliers are authorities
      // (they are pointed at). Two full update rounds in exact
      // fixed-point arithmetic — scores live at scale 10¹², each
      // normalization is (score·10¹²) div Σscores with the sum
      // accumulated in DECIMAL(38,0) (q145's integer-PageRank
      // discipline: both engines iterate identically, and fixed-point
      // truncation is irrelevant to the ranking). Output: top-10
      // authorities and top-10 hubs.
      //
      // Shape, and why it scales: each half-round is one keyed
      // edges-join + one hash aggregation (the distributed HITS shape);
      // normalization sums are 1-row model broadcasts; edges and each
      // round's scores are checkpointed so lineage stays one round deep.
      (s, d) => Shared.withCheckpointDir(s) {
        val S2 = 1000000000000L // score scale: 1.0 ≡ 10¹²
        val edges = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey")
          .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
          .distinct()
          .checkpoint()
        // normalize: score_i ← score_i·S2 div Σscore (sum exact DECIMAL)
        def normalize(df: DataFrame, node: String, raw: String): DataFrame = {
          val tot = df.agg(
            sum(expr(s"CAST($raw AS DECIMAL(38,0))")).as("tot"))
          df.crossJoin(broadcast(tot))
            .select(col(node),
              expr(s"CAST((CAST($raw AS DECIMAL(38,0)) * ${S2}L)" +
                " div tot AS BIGINT)").as("score"))
            .checkpoint()
        }
        // h0 = S2 for every customer → a_raw(s) = Σ_in h = S2·indeg(s)
        val a1 = normalize(
          edges.groupBy("supp").agg((count(lit(1)) * S2).as("raw")),
          "supp", "raw")
        val h1 = normalize(
          edges.join(a1.withColumnRenamed("score", "a"), "supp")
            .groupBy("cust").agg(sum(col("a")).as("raw")),
          "cust", "raw")
        val a2 = normalize(
          edges.join(h1.withColumnRenamed("score", "h"), "cust")
            .groupBy("supp").agg(sum(col("h")).as("raw")),
          "supp", "raw")
        val h2 = normalize(
          edges.join(a2.withColumnRenamed("score", "a"), "supp")
            .groupBy("cust").agg(sum(col("a")).as("raw")),
          "cust", "raw")
        val topA = a2.orderBy(col("score").desc, col("supp").asc).limit(10)
          .select(lit("authority").as("role"), col("supp").as("node"),
            col("score"))
        val topH = h2.orderBy(col("score").desc, col("cust").asc).limit(10)
          .select(lit("hub").as("role"), col("cust").as("node"),
            col("score"))
        topA.unionAll(topH)
      },
      Some("""WITH edges AS (SELECT DISTINCT o_custkey AS cust,
                  l_suppkey AS supp
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              a1r AS (SELECT supp, count(*) * 1000000000000 AS raw
                FROM edges GROUP BY 1),
              a1 AS (SELECT supp, CAST(CAST(raw AS HUGEINT)
                    * 1000000000000
                    // (SELECT sum(CAST(raw AS HUGEINT)) FROM a1r)
                  AS BIGINT) AS score
                FROM a1r),
              h1r AS (SELECT cust, sum(score) AS raw
                FROM edges JOIN a1 USING (supp) GROUP BY 1),
              h1 AS (SELECT cust, CAST(CAST(raw AS HUGEINT)
                    * 1000000000000
                    // (SELECT sum(CAST(raw AS HUGEINT)) FROM h1r)
                  AS BIGINT) AS score
                FROM h1r),
              a2r AS (SELECT supp, sum(score) AS raw
                FROM edges JOIN h1 USING (cust) GROUP BY 1),
              a2 AS (SELECT supp, CAST(CAST(raw AS HUGEINT)
                    * 1000000000000
                    // (SELECT sum(CAST(raw AS HUGEINT)) FROM a2r)
                  AS BIGINT) AS score
                FROM a2r),
              h2r AS (SELECT cust, sum(score) AS raw
                FROM edges JOIN a2 USING (supp) GROUP BY 1),
              h2 AS (SELECT cust, CAST(CAST(raw AS HUGEINT)
                    * 1000000000000
                    // (SELECT sum(CAST(raw AS HUGEINT)) FROM h2r)
                  AS BIGINT) AS score
                FROM h2r),
              ta AS (SELECT 'authority' AS role, supp AS node, score
                FROM a2 ORDER BY score DESC, supp LIMIT 10),
              th AS (SELECT 'hub' AS role, cust AS node, score
                FROM h2 ORDER BY score DESC, cust LIMIT 10)
              SELECT * FROM ta UNION ALL SELECT * FROM th""")
    ),

    // ── NEWMAN MODULARITY OF THE NATION PARTITION ─────────────────────────
    QueryDef(
      "q382_modularity",
      // How community-like is the nation partition on the undirected
      // customer–supplier trade graph? Newman's Q = Σ_c [e_c/m −
      // (d_c/2m)²] — computed EXACTLY: Q = (4·m·intra − Σd_c²)/(4m²)
      // where intra = edges whose two endpoints share a nation, d_c =
      // total degree inside community c (customers and suppliers both
      // map to their nation), and Σd_c² accumulates as DECIMAL(38,0).
      // One pinned double division at the end.
      //
      // Shape, and why it scales: the edge list is one keyed
      // orders⋈lineitem distinct (checkpointed, scanned three times);
      // degrees are two hash aggregations to the nation grain; the
      // final fold crosses three 1-row model broadcasts.
      (s, d) => Shared.withCheckpointDir(s) {
        val e = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey")
          .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
          .distinct()
          .checkpoint()
        val cn = Tables.customer(s, d)
          .select(col("c_custkey").as("cust"), col("c_nationkey").as("cn"))
        val sn = Tables.supplier(s, d)
          .select(col("s_suppkey").as("supp"), col("s_nationkey").as("sn"))
        val mS = e.agg(count(lit(1)).as("m"))
        val intraS = e.join(cn, "cust").join(sn, "supp")
          .agg(sum((col("cn") === col("sn")).cast("long")).as("intra"))
        val degC = e.groupBy("cust").agg(count(lit(1)).as("deg"))
          .join(cn, "cust").select(col("cn").as("nation"), col("deg"))
        val degS = e.groupBy("supp").agg(count(lit(1)).as("deg"))
          .join(sn, "supp").select(col("sn").as("nation"), col("deg"))
        val dc = degC.unionAll(degS)
          .groupBy("nation").agg(sum(col("deg")).as("dc"))
          .agg(count(lit(1)).as("n_communities"),
            sum(expr("CAST(dc AS DECIMAL(38,0)) * dc")).as("sdc2"))
        mS.crossJoin(broadcast(intraS)).crossJoin(broadcast(dc))
          .select(col("m").as("m_edges"), col("intra").as("intra_edges"),
            col("n_communities"),
            expr("""(4.0 * CAST(m AS DOUBLE) * CAST(intra AS DOUBLE)
                - CAST(sdc2 AS DOUBLE))
              / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))""")
              .as("modularity"))
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS cust,
                  l_suppkey AS supp
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              m AS (SELECT count(*) AS m FROM e),
              intra AS (SELECT CAST(sum(CASE WHEN c_nationkey = s_nationkey
                    THEN 1 ELSE 0 END) AS BIGINT) AS intra
                FROM e JOIN customer ON cust = c_custkey
                  JOIN supplier ON supp = s_suppkey),
              degc AS (SELECT c_nationkey AS nation, deg
                FROM (SELECT cust, count(*) AS deg FROM e GROUP BY 1)
                JOIN customer ON cust = c_custkey),
              degs AS (SELECT s_nationkey AS nation, deg
                FROM (SELECT supp, count(*) AS deg FROM e GROUP BY 1)
                JOIN supplier ON supp = s_suppkey),
              dc AS (SELECT nation, sum(deg) AS dc
                FROM (SELECT * FROM degc UNION ALL SELECT * FROM degs)
                GROUP BY 1),
              f AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
                  sum(CAST(dc AS DECIMAL(38,0)) * dc) AS sdc2
                FROM dc)
              SELECT CAST(m AS BIGINT) AS m_edges, intra AS intra_edges,
                n_communities,
                (4.0 * CAST(m AS DOUBLE) * CAST(intra AS DOUBLE)
                    - CAST(sdc2 AS DOUBLE))
                  / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
                  AS modularity
              FROM m, intra, f""")
    ),

    // ── EFFECTIVE SAMPLE SIZE OF IMPORTANCE WEIGHTS ───────────────────────
    QueryDef(
      "q383_ess_weights",
      // The one-line health check on every weighted estimator (q265
      // PPS, q291 DSIR, q304 raking, q371 stratified PPS): Kish's
      // effective sample size ESS = (Σw)²/Σw² and the design effect
      // deff = n·Σw²/(Σw)², for the document-length importance weights,
      // per source AND overall in the same rollup. Σw² accumulates as
      // exact DECIMAL(38,0); ESS/deff are each one pinned double block.
      //
      // Shape, and why it scales: ONE corpus pass through a rollup hash
      // aggregation (sources + grand total in the same shuffle); output
      // is sources+1 rows.
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), col("n_chars").as("w"))
          .rollup("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_w"),
            sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sw2"))
          .select(coalesce(col("source"), lit("__all__")).as("src"),
            col("n_docs"), col("sum_w"),
            expr("""CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
              / CAST(sw2 AS DOUBLE)""").as("ess"),
            expr("""CAST(n_docs AS DOUBLE) * CAST(sw2 AS DOUBLE)
              / (CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE))""")
              .as("deff"))
      },
      Some("""SELECT coalesce(source, '__all__') AS src,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_w,
                CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)
                  / CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
                    AS DOUBLE) AS ess,
                CAST(count(*) AS DOUBLE)
                  * CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
                    AS DOUBLE)
                  / (CAST(sum(n_chars) AS DOUBLE)
                    * CAST(sum(n_chars) AS DOUBLE)) AS deff
              FROM documents GROUP BY ROLLUP(source)""")
    ),

    // ── MEAN RECIPROCAL RANK (10-query retrieval panel) ───────────────────
    QueryDef(
      "q384_mrr",
      // The last member of the retrieval-eval family (q276 recall@k,
      // q307 NDCG, q323 AP): for each of 10 query documents, rank every
      // other document by embedding cosine, call a hit "relevant" when
      // it shares the query's source, and report the first relevant
      // rank in the top-10 with its reciprocal in exact ppm (10⁶ div
      // rank — never an engine-native float average). Cosines ride the
      // codegen'd sequential-fold dot product both engines share.
      //
      // Shape, and why it scales: this is the documented brute-force
      // eval baseline (q41) — a 10-row query broadcast fanned over the
      // embedding table, ranked by a QUERY-PARTITIONED window (10
      // partitions; at corpus scale the candidate set rides the IVF
      // route, q44/q151, before this ranking). Output is 10 rows.
      (s, d) => {
        val qs = broadcast(Tables.embeddings(s, d)
          .filter(col("vec_id") < 10L)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          .join(Tables.documents(s, d)
            .select(col("doc_id").as("qid"), col("source").as("qsrc")),
            "qid"))
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
        top.join(Tables.documents(s, d)
            .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
          .withColumn("rel", col("source") === col("qsrc"))
          .groupBy("qid")
          .agg(sum(col("rel").cast("long")).as("n_rel_top10"),
            min(when(col("rel"), col("rnk"))).as("first_rank"))
          .select(col("qid"), col("n_rel_top10"), col("first_rank"),
            expr("CAST(coalesce(1000000 div first_rank, 0) AS BIGINT)")
              .as("rr_ppm"))
          .orderBy("qid")
      },
      Some("""WITH qs AS (SELECT vec_id AS qid, embedding AS qv,
                  source AS qsrc
                FROM embeddings JOIN documents ON doc_id = vec_id
                WHERE vec_id < 10),
              c AS (SELECT qid, qsrc, vec_id,
                  list_aggregate(list_transform(range(1, 65),
                      i -> CAST(qv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)),
                    'sum')
                  / (sqrt(list_aggregate(list_transform(range(1, 65),
                      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                    'sum'))
                    * sqrt(list_aggregate(list_transform(range(1, 65),
                      i -> CAST(dv[i] AS DOUBLE) * CAST(dv[i] AS DOUBLE)),
                    'sum'))) AS cosine
                FROM (SELECT vec_id, embedding AS dv FROM embeddings)
                CROSS JOIN qs
                WHERE vec_id <> qid),
              r AS (SELECT qid, qsrc, vec_id, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cosine DESC, vec_id)
                  AS BIGINT) AS rnk
                FROM c),
              t AS (SELECT qid, rnk, (source = qsrc) AS rel
                FROM r JOIN documents ON doc_id = vec_id
                WHERE rnk <= 10)
              SELECT qid,
                CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_rel_top10,
                min(CASE WHEN rel THEN rnk END) AS first_rank,
                CAST(coalesce(1000000 // min(CASE WHEN rel THEN rnk END),
                  0) AS BIGINT) AS rr_ppm
              FROM t GROUP BY qid ORDER BY qid""")
    )
  )
}
