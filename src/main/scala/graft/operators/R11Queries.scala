package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 extension surface: graph link prediction (Adamic-Adar),
  * rank statistics (Spearman's ρ on exact distributed average ranks),
  * slot-normalized template deduplication, activity streaks, and the
  * paired-rater evaluation suite (Cohen's κ, McNemar).
  *
  * Determinism rules are the library-wide ones (see [[graft.QueryDef]]):
  * exact integer/decimal accumulation everywhere, ONE pinned double
  * expression shared token-identically with the oracle where a float
  * must surface, unique tie-breaks on every ranking.
  */
object R11Queries {

  import Shared._

  /** Pearson-from-moments formula text shared verbatim with the oracle
    * (the q315 pattern) — operands are exact sums, so both engines run
    * the identical IEEE sequence.
    */
  private object CorrSql {
    val r: String =
      """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
  }

  /** Slot normalization applied before template hashing (q318): shared
    * step order lower → URL → EMAIL → NUM → whitespace-collapse → trim.
    * Patterns are RE2/Java-identical constructs only.
    */
  private val UrlPat = "https?://[^\\s]+"
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  private val NumPat = "[0-9]+"

  /** Rater rules for the paired-evaluation suite (q321/q322): three
    * deterministic document-quality judges over (whitespace word count,
    * n_chars). Thresholds chosen so all four agreement cells are
    * populated on the synthetic corpus.
    */
  private def wcCol = size(tokens(col("text"))).cast("long")
  private val SqlWc = s"len($SQL_TOKENS)"
  private def raterA = (wcCol >= 25) && (col("n_chars") < 1500)
  private val SqlRaterA = s"($SqlWc >= 25 AND n_chars < 1500)"
  private def raterB = (wcCol >= 40) && (col("n_chars") < 1800)
  private val SqlRaterB = s"($SqlWc >= 40 AND n_chars < 1800)"

  val all: Seq[QueryDef] = Seq(

    // ── ADAMIC-ADAR LINK PREDICTION (hub-capped) ──────────────────────────
    QueryDef(
      "q316_adamic_adar",
      // PROBE-DRIVEN common-neighbor link prediction over the part
      // co-purchase graph: for a deterministic 1-in-32 probe catalog
      // (the query-driven shape link prediction ships as — q41's probe
      // KNN discipline), score every non-adjacent candidate b by
      // Σ_{z ∈ Γ(p)∩Γ(b)} 1/ln(deg z). Weights are exact micro-units
      // (floor(1e6/ln(deg)) — floor, not cast: DuckDB's double→BIGINT
      // cast ROUNDS where Spark's truncates), so scores are exact
      // BIGINTs and the top-20 ordering is integer-deterministic.
      // Wedge centers above degree 256 are EXCLUDED by spec (hub
      // mitigation), mirrored exactly by the oracle.
      //
      // Shape, and why it scales: the co-purchase graph's degrees are
      // corpus-INVARIANT (≈120 median at every sf — they depend on
      // basket size and catalog density, not row count), so the global
      // all-pairs wedge explosion is quadratic-per-center with a huge
      // constant (298M wedges at sf0.1, measured). The probe shape cuts
      // it to |probes|·deg² ≈ catalog/32 · 26k wedges — LINEAR in the
      // catalog with a tiny constant — via three keyed equi-joins
      // (probe→neighbors, neighbors→adj, anti-join on the edge set).
      // Per-center neighbor baskets come from ONE aggregation; never a
      // fact×fact join.
      (s, d) => Shared.withCheckpointDir(s) {
        val e = GraphQueries.coPurchaseEdges(s, d)
        val sym = e.select(col("a").as("z"), col("b").as("n"))
          .unionAll(e.select(col("b").as("z"), col("a").as("n")))
        val adj = sym.groupBy("z")
          .agg(sort_array(collect_set(col("n"))).as("ns"))
          .withColumn("dg", size(col("ns")).cast("long"))
          .filter(col("dg").between(2, 256))
          .withColumn("wz",
            expr("CAST(floor(1000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)"))
          .checkpoint() // part-grain, consumed by probes AND the z-join
        val probes = adj
          .filter(h32(col("z").cast("string")) % 32 === 0)
          .select(col("z").as("p"), explode(col("ns")).as("zc"))
        val cand = probes
          .join(adj.select(col("z").as("zc"), col("wz"), col("ns")), "zc")
          .select(col("p"), col("wz"), explode(col("ns")).as("b"))
          .filter(col("b") =!= col("p"))
          .groupBy("p", "b").agg(sum(col("wz")).as("score_micro"))
        cand
          .join(sym.select(col("z").as("p"), col("n").as("b")),
            Seq("p", "b"), "left_anti")
          .orderBy(col("score_micro").desc, col("p"), col("b"))
          .limit(20)
      },
      Some(s"""WITH e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              sym AS (SELECT a AS z, b AS n FROM e0
                UNION ALL SELECT b, a FROM e0),
              deg AS (SELECT z, count(*) AS dg FROM sym GROUP BY 1),
              w AS (SELECT z,
                  CAST(floor(1000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)
                    AS wz
                FROM deg WHERE dg BETWEEN 2 AND 256),
              probes AS (SELECT z AS p FROM w
                WHERE ${SQL_H32("CAST(z AS VARCHAR)")} % 32 = 0),
              pn AS (SELECT p, s.n AS zc FROM probes
                JOIN sym s ON s.z = p),
              wedge AS (SELECT pn.p, w.wz, s2.n AS b
                FROM pn JOIN w ON pn.zc = w.z
                JOIN sym s2 ON s2.z = pn.zc),
              sc AS (SELECT p, b, sum(wz) AS score_micro FROM wedge
                WHERE b <> p GROUP BY 1, 2),
              nonadj AS (SELECT sc.p, sc.b, sc.score_micro FROM sc
                LEFT JOIN sym ON sym.z = sc.p AND sym.n = sc.b
                WHERE sym.z IS NULL)
              SELECT p, b, CAST(score_micro AS BIGINT) AS score_micro
              FROM nonadj ORDER BY score_micro DESC, p, b LIMIT 20"""),
      headline = true
    ),

    // ── SPEARMAN RANK CORRELATION (exact distributed average ranks) ───────
    QueryDef(
      "q317_spearman",
      // Rank correlation between an order's total price and its item
      // count — the robust, monotone-invariant complement to q103's
      // Pearson. Tied values take AVERAGE ranks, kept exact by working
      // with 2·rank (an integer: 2·avgrank(v) = 2·|{u<v}| + cnt(v) + 1),
      // computed at VALUE grain with the distributedPrefixSum backbone —
      // never a global row window. Moment sums accumulate as
      // DECIMAL(38,0) (Σ(2r)² reaches ~n³: past Long at 10⁹ rows);
      // ρ surfaces through the one shared Pearson-from-moments text.
      //
      // Shape, and why it scales: fact → (x,y) joint grain (one hash
      // agg), two value-grain prefix-sum rank tables joined back on
      // value, one 5-sum fold; no global windows, no self-joins.
      (s, d) => Shared.withCheckpointDir(s) {
        val ly = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("y"))
        val oy = Tables.orders(s, d)
          .select(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("x"), col("o_orderkey"))
          .join(ly, col("o_orderkey") === ly("l_orderkey"), "left")
          .select(col("x"), coalesce(col("y"), lit(0L)).as("y"))
        val joint = oy.groupBy("x", "y").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        def rank2(grainCol: String, bucket: Long): DataFrame = {
          val g = joint.groupBy(grainCol).agg(sum(col("cnt")).as("c"))
          distributedPrefixSum(g, grainCol, "c", bucket)
            .select(col(grainCol),
              (lit(2L) * col("cum") + col("c") + 1L).as(s"r2_$grainCol"))
        }
        val rx = rank2("x", 1L << 20)
        val ry = rank2("y", 256L)
        joint.join(rx, "x").join(ry, "y")
          .select(col("cnt"), col("r2_x"), col("r2_y"))
          .agg(sum(col("cnt")).as("n"),
            sum((col("cnt") * col("r2_x")).cast(DecimalType(38, 0))).as("sx"),
            sum((col("cnt") * col("r2_y")).cast(DecimalType(38, 0))).as("sy"),
            sum((col("cnt") * col("r2_x") * col("r2_y"))
              .cast(DecimalType(38, 0))).as("sxy"),
            sum((col("cnt") * col("r2_x") * col("r2_x"))
              .cast(DecimalType(38, 0))).as("sxx"),
            sum((col("cnt") * col("r2_y") * col("r2_y"))
              .cast(DecimalType(38, 0))).as("syy"))
          .select(col("n"), expr(CorrSql.r).as("rho_s"))
      },
      Some(s"""WITH ly AS (SELECT l_orderkey, count(*) AS y
                FROM lineitem GROUP BY 1),
              oy AS (SELECT
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS x,
                  coalesce(y, 0) AS y
                FROM orders LEFT JOIN ly ON o_orderkey = l_orderkey),
              joint AS (SELECT x, y, count(*) AS cnt FROM oy GROUP BY 1, 2),
              gx AS (SELECT x, sum(cnt) AS c FROM joint GROUP BY 1),
              rx AS (SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + c + 1 AS r2x FROM gx),
              gy AS (SELECT y, sum(cnt) AS c FROM joint GROUP BY 1),
              ry AS (SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + c + 1 AS r2y FROM gy),
              m AS (SELECT sum(cnt) AS n,
                  sum(cnt * r2x) AS sx, sum(cnt * r2y) AS sy,
                  sum(cnt * r2x * r2y) AS sxy,
                  sum(cnt * r2x * r2x) AS sxx,
                  sum(cnt * r2y * r2y) AS syy
                FROM joint JOIN rx USING (x) JOIN ry USING (y))
              SELECT CAST(n AS BIGINT) AS n, ${CorrSql.r} AS rho_s FROM m""")
    ),

    // ── TEMPLATE DEDUP (slot-normalized exact dedup) ──────────────────────
    QueryDef(
      "q318_template_dedup",
      // Instruction/boilerplate dedup as FLAN-class pipelines do it:
      // normalize volatile slots (URLs, emails, numbers) to placeholder
      // tokens, collapse whitespace, and exact-hash the resulting
      // TEMPLATE — documents differing only in slot values collapse to
      // one cluster. Reported per source: docs, distinct templates, the
      // dup count (docs − templates), and the largest cluster.
      //
      // Shape, and why it scales: pure row-local normalization (codegen
      // regexes) → md5 → two hash aggregations; no joins, no windows.
      (s, d) => {
        val tpl = md5(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(lower(col("text")),
            UrlPat, " <url> "),
          EmailPat, " <email> "),
          NumPat, " <num> "),
          "\\s+", " "))
        Tables.documents(s, d)
          .select(col("source"), tpl.as("tpl"))
          .groupBy("source", "tpl").agg(count(lit(1)).as("c"))
          .groupBy("source").agg(
            sum(col("c")).as("n_docs"),
            count(lit(1)).as("n_templates"),
            (sum(col("c")) - count(lit(1))).as("dup_docs"),
            max(col("c")).as("max_cluster"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, md5(regexp_replace(regexp_replace(
                  regexp_replace(regexp_replace(lower(text),
                    '$UrlPat', ' <url> ', 'g'),
                  '$EmailPat', ' <email> ', 'g'),
                  '$NumPat', ' <num> ', 'g'),
                  '\\s+', ' ', 'g')) AS tpl
                FROM documents),
              cl AS (SELECT source, tpl, count(*) AS c
                FROM t GROUP BY 1, 2)
              SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
                count(*) AS n_templates,
                CAST(sum(c) - count(*) AS BIGINT) AS dup_docs,
                CAST(max(c) AS BIGINT) AS max_cluster
              FROM cl GROUP BY source ORDER BY source""")
    ),

    // ── LONGEST ACTIVITY STREAK (gaps-and-islands) ────────────────────────
    QueryDef(
      "q320_longest_streak",
      // Longest run of CONSECUTIVE active days per user — the retention
      // statistic q194's cohort grid doesn't expose — via the classic
      // gaps-and-islands key (day − row_number(): constant exactly on a
      // consecutive run), then the distribution of per-user maxima.
      //
      // Shape, and why it scales: fact → (user, day) grain, one window
      // PARTITIONED BY user (never global), three hash aggregations;
      // output is streak-length-bounded.
      (s, d) => {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val du = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        du.withColumn("grp", col("day") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max(col("len")).as("streak"))
          .groupBy("streak").agg(count(lit(1)).as("n_users"))
          .orderBy("streak")
      },
      Some("""WITH du AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
              g AS (SELECT user_id, day - row_number()
                  OVER (PARTITION BY user_id ORDER BY day) AS grp
                FROM du),
              runs AS (SELECT user_id, count(*) AS len
                FROM g GROUP BY user_id, grp),
              best AS (SELECT user_id, max(len) AS streak
                FROM runs GROUP BY 1)
              SELECT CAST(streak AS BIGINT) AS streak,
                count(*) AS n_users
              FROM best GROUP BY 1 ORDER BY 1""")
    ),

    // ── COHEN'S KAPPA (inter-rater agreement) ─────────────────────────────
    QueryDef(
      "q321_cohens_kappa",
      // Chance-corrected agreement between two deterministic document-
      // quality judges — the statistic every labeling/eval pipeline
      // reports before trusting a rater pair. For the 2×2 table the
      // closed form κ = 2(n11·n00 − n10·n01) /
      // ((n11+n10)(n10+n00) + (n11+n01)(n01+n00)) is EXACT integer
      // arithmetic end-to-end; κ surfaces in ppm via integer division —
      // no doubles anywhere.
      //
      // Shape, and why it scales: one row-local projection folding to a
      // single 4-count row; output is 1 row.
      (s, d) =>
        Tables.documents(s, d)
          .select(raterA.cast("long").as("a"), raterB.cast("long").as("b"))
          .agg(
            sum(col("a") * col("b")).as("n11"),
            sum(col("a") * (lit(1L) - col("b"))).as("n10"),
            sum((lit(1L) - col("a")) * col("b")).as("n01"),
            sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
          .select(col("n11"), col("n10"), col("n01"), col("n00"),
            expr("""(2000000 * (n11 * n00 - n10 * n01))
              div ((n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00))""")
              .as("kappa_ppm")),
      Some(s"""WITH r AS (SELECT
                  CASE WHEN $SqlRaterA THEN 1 ELSE 0 END AS a,
                  CASE WHEN $SqlRaterB THEN 1 ELSE 0 END AS b
                FROM documents),
              c AS (SELECT
                  sum(a * b) AS n11, sum(a * (1 - b)) AS n10,
                  sum((1 - a) * b) AS n01,
                  sum((1 - a) * (1 - b)) AS n00
                FROM r)
              SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
                CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
                CAST((2000000 * (n11 * n00 - n10 * n01))
                  // ((n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00))
                  AS BIGINT) AS kappa_ppm
              FROM c""")
    ),

    // ── McNEMAR PAIRED TEST (did the second judge change verdicts?) ───────
    QueryDef(
      "q322_mcnemar",
      // The paired-classifier significance test on the SAME documents
      // the κ suite rates: only the DISCORDANT cells matter (b = A-only
      // accepts, c = B-only accepts); the continuity-corrected statistic
      // (|b−c|−1)²/(b+c) surfaces exact in milli-units via integer
      // division. Zero discordance guards to NULL rather than a silent
      // divide-by-zero.
      (s, d) =>
        Tables.documents(s, d)
          .select(raterA.cast("long").as("a"), raterB.cast("long").as("b"))
          .agg(
            sum(col("a") * (lit(1L) - col("b"))).as("b_only_a"),
            sum((lit(1L) - col("a")) * col("b")).as("c_only_b"))
          .select(col("b_only_a"), col("c_only_b"),
            expr("""(1000 * (abs(b_only_a - c_only_b) - 1)
                * (abs(b_only_a - c_only_b) - 1))
              div nullif(b_only_a + c_only_b, 0)""").as("chi2_milli")),
      Some(s"""WITH r AS (SELECT
                  CASE WHEN $SqlRaterA THEN 1 ELSE 0 END AS a,
                  CASE WHEN $SqlRaterB THEN 1 ELSE 0 END AS b
                FROM documents),
              c AS (SELECT sum(a * (1 - b)) AS b_only_a,
                  sum((1 - a) * b) AS c_only_b FROM r)
              SELECT CAST(b_only_a AS BIGINT) AS b_only_a,
                CAST(c_only_b AS BIGINT) AS c_only_b,
                CAST((1000 * (abs(b_only_a - c_only_b) - 1)
                    * (abs(b_only_a - c_only_b) - 1))
                  // nullif(b_only_a + c_only_b, 0) AS BIGINT) AS chi2_milli
              FROM c""")
    ),

    // ── EWMA SMOOTHING / CONTROL LINE ─────────────────────────────────────
    QueryDef(
      "q319_ewma_control",
      // The exponentially-weighted moving average over daily event
      // volume — the control-chart smoother between q206's z-score and
      // q222's CUSUM. The recursion z_t = α·x_t + (1−α)·z_{t-1}, z_0 =
      // x_0 (α = 0.25 — exact in binary) runs as a SEQUENTIAL left fold
      // over the day-ordered prefix in BOTH engines (Spark `aggregate`
      // seeded with the first element ≡ DuckDB `list_reduce`, which
      // seeds from the head), so every IEEE step is identical.
      //
      // Shape, and why it scales: the fact folds to DAY grain (one hash
      // agg — model-sized at any corpus size); the per-day prefix folds
      // run over a broadcast copy of that tiny grain (the q295
      // Kaplan-Meier pattern). No global windows.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        // day grain checkpoints (model-sized): consumed by both the row
        // stream and the broadcast model — without it the fact scan runs
        // twice (the lineage-bifurcation trap)
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val model = daily.agg(sort_array(collect_list(
          struct(col("day"), col("cnt")))).as("arr"))
        daily.crossJoin(broadcast(model))
          .withColumn("pfx", expr(
            "transform(filter(arr, e -> e.day <= day), e -> CAST(e.cnt AS DOUBLE))"))
          .select(col("day"), col("cnt"),
            expr("""aggregate(slice(pfx, 2, size(pfx) - 1),
                element_at(pfx, 1),
                (acc, x) -> CAST(0.75 AS DOUBLE) * acc
                  + CAST(0.25 AS DOUBLE) * x)""").as("ewma"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS cnt FROM events GROUP BY 1)
              SELECT d.day, CAST(d.cnt AS BIGINT) AS cnt,
                (SELECT list_reduce(
                    list(CAST(d2.cnt AS DOUBLE) ORDER BY d2.day),
                    (acc, x) -> CAST(0.75 AS DOUBLE) * acc
                      + CAST(0.25 AS DOUBLE) * x)
                  FROM daily d2 WHERE d2.day <= d.day) AS ewma
              FROM daily d ORDER BY d.day""")
    ),

    // ── AVERAGE PRECISION (retrieval ranking quality) ─────────────────────
    QueryDef(
      "q323_average_precision",
      // The ranking-eval statistic between q276's recall@k and q307's
      // NDCG: AP@20 per probe — precision accumulated at each relevant
      // hit, normalized by the number of relevant items retrieved.
      // Relevance = label match against the probe. EVERY step is exact
      // integer arithmetic: per-hit precision terms floor to micro-units
      // ((10⁶·hits) div k), so no double ever rides an aggregation.
      //
      // Shape, and why it scales: 5 broadcast probes × streamed corpus
      // (the q41 discipline), one probe-partitioned window for ranks +
      // running hits, one hash agg; candidate set per probe is
      // k-bounded before the window aggregate.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").as("qlabel"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").as("clabel"))
        val vec = graft.functions.vec
        val w = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid").asc)
        val wh = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        broadcast(q).crossJoin(c)
          .withColumn("cos", vec.dot(col("qv"), col("cv")) /
            (vec.norm(col("qv")) * vec.norm(col("cv"))))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20)
          .withColumn("rel", (col("qlabel") === col("clabel"))
            .cast("long"))
          .withColumn("hits", sum(col("rel")).over(wh))
          .groupBy("qid").agg(
            sum(col("rel")).as("hits20"),
            sum(when(col("rel") === 1L,
              expr("(1000000 * hits) div rk")).otherwise(0L))
              .as("ap_sum_micro"))
          .withColumn("ap_micro",
            expr("ap_sum_micro div nullif(hits20, 0)"))
          .orderBy("qid")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  label AS qlabel FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  label AS clabel FROM embeddings WHERE vec_id >= 5),
              scored AS (SELECT qid, cid, qlabel, clabel,
                  ${SqlDot("qv", "cv")} / (${SqlNorm("qv")} * ${SqlNorm("cv")})
                    AS cos
                FROM q CROSS JOIN c),
              rk AS (SELECT qid, clabel, qlabel,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, cid) AS rk
                FROM scored QUALIFY rk <= 20),
              h AS (SELECT qid, rk,
                  CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS rel,
                  sum(CASE WHEN qlabel = clabel THEN 1 ELSE 0 END)
                    OVER (PARTITION BY qid ORDER BY rk
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS hits
                FROM rk)
              SELECT qid, CAST(sum(rel) AS BIGINT) AS hits20,
                CAST(sum(CASE WHEN rel = 1
                    THEN (1000000 * hits) // rk ELSE 0 END) AS BIGINT)
                  AS ap_sum_micro,
                CAST(sum(CASE WHEN rel = 1
                    THEN (1000000 * hits) // rk ELSE 0 END)
                  // nullif(sum(rel), 0) AS BIGINT) AS ap_micro
              FROM h GROUP BY qid ORDER BY qid""")
    ),

    // ── t-CLOSENESS (distribution-distance privacy audit) ─────────────────
    QueryDef(
      "q324_t_closeness",
      // The third rung of the privacy-audit ladder (k-anonymity q237,
      // l-diversity q280): per quasi-identifier group, the ordered-
      // distance Earth Mover's Distance between the group's sensitive-
      // attribute distribution and the global one — t = (1/(m−1)) ·
      // Σᵢ |Σ_{j≤i}(p_j − q_j)| over m ordered value buckets (Li et
      // al.'s numeric-attribute form). Account balances bucket to a
      // 20-bin equi-width grid; the inner sums stay EXACT integers by
      // cross-multiplying (cum_g·N − cum·n_g); only the final t is one
      // pinned double division.
      //
      // Shape, and why it scales: one customer scan to the QI×bucket
      // matrix (cardinality-bounded: |QI| × 20 — model-sized at any row
      // count), dense-grid completion via a generated bucket spine,
      // per-group windows over ≤20 rows. No row-scale windows or joins.
      (s, d) => Shared.withCheckpointDir(s) {
        val c = Tables.apply(s, d, "customer")
          .select(col("c_nationkey").cast("long").as("nat"),
            col("c_mktsegment").as("seg"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("cents"))
        val mm = c.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        val bucketed = c.crossJoin(broadcast(mm))
          .select(col("nat"), col("seg"),
            expr("CAST(((cents - lo) * 20) div (hi - lo + 1) AS BIGINT)")
              .as("bkt"))
          .groupBy("nat", "seg", "bkt").agg(count(lit(1)).as("cg"))
          .checkpoint()
        val spine = bucketed.select("nat", "seg").distinct()
          .crossJoin(spark_sequence_0_19(s))
        val grid = spine.join(bucketed, Seq("nat", "seg", "bkt"), "left")
          .withColumn("cg", coalesce(col("cg"), lit(0L)))
        val wg = Window.partitionBy("nat", "seg").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gcum = grid.withColumn("cumg", sum(col("cg")).over(wg))
        val glob = bucketed.groupBy("bkt").agg(sum(col("cg")).as("cb"))
        val globCum = distributedPrefixSum(glob, "bkt", "cb")
          .select(col("bkt"), (col("cum") + col("cb")).as("cumb"))
        val ng = bucketed.groupBy("nat", "seg").agg(sum(col("cg")).as("n_g"))
        val n = c.count()
        gcum.join(broadcast(globCum), "bkt")
          .join(broadcast(ng), Seq("nat", "seg"))
          .groupBy("nat", "seg")
          .agg(max(col("n_g")).as("n_g"),
            sum(abs(col("cumg") * lit(n) - col("cumb") * col("n_g")))
              .as("ssum"))
          .select(col("nat"), col("seg"), col("n_g"),
            expr(s"""(CAST(ssum AS DOUBLE)
              / (CAST(n_g AS DOUBLE) * CAST(${n}L AS DOUBLE)
                * CAST(19 AS DOUBLE)))""").as("t_emd"))
          .orderBy("nat", "seg")
      },
      Some("""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
                  c_mktsegment AS seg,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS cents
                FROM customer),
              mm AS (SELECT min(cents) AS lo, max(cents) AS hi,
                  count(*) AS n FROM c),
              b AS (SELECT nat, seg,
                  CAST(((cents - lo) * 20) // (hi - lo + 1) AS BIGINT)
                    AS bkt,
                  count(*) AS cg
                FROM c CROSS JOIN mm GROUP BY 1, 2, 3),
              spine AS (SELECT nat, seg, r.bkt
                FROM (SELECT DISTINCT nat, seg FROM b)
                CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS bkt) r),
              grid AS (SELECT s.nat, s.seg, s.bkt, coalesce(b.cg, 0) AS cg
                FROM spine s LEFT JOIN b
                ON s.nat = b.nat AND s.seg = b.seg AND s.bkt = b.bkt),
              gcum AS (SELECT nat, seg, bkt, cg,
                  sum(cg) OVER (PARTITION BY nat, seg ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cumg
                FROM grid),
              gtot AS (SELECT bkt, sum(cg) AS cb FROM b GROUP BY 1),
              globcum AS (SELECT bkt,
                  sum(cb) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cumb
                FROM gtot),
              ng AS (SELECT nat, seg, sum(cg) AS n_g FROM b GROUP BY 1, 2)
              SELECT g.nat, g.seg, CAST(ng.n_g AS BIGINT) AS n_g,
                (CAST(sum(abs(g.cumg * mm.n - gc.cumb * ng.n_g)) AS DOUBLE)
                  / (CAST(ng.n_g AS DOUBLE) * CAST(mm.n AS DOUBLE)
                    * CAST(19 AS DOUBLE))) AS t_emd
              FROM gcum g JOIN globcum gc ON g.bkt = gc.bkt
              JOIN ng ON g.nat = ng.nat AND g.seg = ng.seg
              CROSS JOIN mm
              GROUP BY g.nat, g.seg, ng.n_g, mm.n
              ORDER BY g.nat, g.seg""")
    ),

    // ── AS-OF JOIN WITH TOLERANCE (max-staleness matching) ────────────────
    QueryDef(
      "q325_asof_tolerance",
      // The q29 as-of with the production knob every feature-store and
      // tick-data join carries: a MAX STALENESS — a click only matches a
      // view at most 60 s older; staler matches count as unmatched.
      // Reports the match rate (exact ppm) and the matched-staleness
      // mass, with the mean as the one pinned division.
      //
      // Shape, and why it scales: identical to q29 — tagged union + ONE
      // user-keyed window pass (never a range join); the tolerance is a
      // row-local post-filter on the matched timestamp delta.
      (s, d) => {
        val TolUs = 60L * 1000 * 1000
        val e = Tables.events(s, d).withColumn("tsu", expr("ts div 1000"))
        val u = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("tsu"), lit(0).as("tag"),
            col("event_id").as("id"))
          .unionByName(e.filter(col("event_type") === "click")
            .select(col("user_id"), col("tsu"), lit(1).as("tag"),
              col("event_id").as("id")))
        val w = Window.partitionBy("user_id")
          .orderBy(col("tsu").asc, col("tag").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("vts",
            last(when(col("tag") === 0, col("tsu")), ignoreNulls = true)
              .over(w))
          .filter(col("tag") === 1)
          .withColumn("ok", (col("vts").isNotNull &&
            (col("tsu") - col("vts") <= TolUs)).cast("long"))
          .agg(count(lit(1)).as("n_clicks"),
            sum(col("ok")).as("n_matched"),
            sum(when(col("ok") === 1L,
              expr("(tsu - vts) div 1000")).otherwise(0L))
              .as("sum_staleness_ms"))
          .select(col("n_clicks"), col("n_matched"),
            expr("(1000000 * n_matched) div n_clicks").as("match_ppm"),
            col("sum_staleness_ms"),
            expr("""(CAST(sum_staleness_ms AS DOUBLE)
              / CAST(nullif(n_matched, 0) AS DOUBLE))""")
              .as("avg_staleness_ms"))
      },
      Some("""WITH v AS (SELECT user_id AS vuser, epoch_us(ts) AS vts
                FROM events WHERE event_type = 'view'),
              c AS (SELECT user_id, epoch_us(ts) AS tsu
                FROM events WHERE event_type = 'click'),
              j AS (SELECT c.tsu, v.vts
                FROM c ASOF LEFT JOIN v
                ON c.user_id = v.vuser AND v.vts <= c.tsu),
              m AS (SELECT count(*) AS n_clicks,
                  sum(CASE WHEN vts IS NOT NULL
                      AND tsu - vts <= 60000000 THEN 1 ELSE 0 END)
                    AS n_matched,
                  sum(CASE WHEN vts IS NOT NULL
                      AND tsu - vts <= 60000000
                      THEN (tsu - vts) // 1000 ELSE 0 END)
                    AS sum_staleness_ms
                FROM j)
              SELECT CAST(n_clicks AS BIGINT) AS n_clicks,
                CAST(n_matched AS BIGINT) AS n_matched,
                CAST((1000000 * n_matched) // n_clicks AS BIGINT)
                  AS match_ppm,
                CAST(sum_staleness_ms AS BIGINT) AS sum_staleness_ms,
                (CAST(sum_staleness_ms AS DOUBLE)
                  / CAST(nullif(n_matched, 0) AS DOUBLE))
                  AS avg_staleness_ms
              FROM m""")
    ),

    // ── DIFFERENCE-IN-DIFFERENCES (quasi-experimental readout) ────────────
    QueryDef(
      "q326_diff_in_diff",
      // The quasi-experimental estimator the A/B suite (q244/q285/q303)
      // can't cover when assignment isn't randomized at exposure time:
      // treatment = a deterministic user split, periods = the corpus
      // midpoint, outcome = events per active user per cell, DiD =
      // (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre). Cell counts are
      // exact integers; the four means and the estimate are pinned
      // double expressions over identical operands in both engines.
      //
      // Shape, and why it scales: one fact pass folding to a single
      // 8-count row (conditional aggregation — no per-cell subqueries);
      // output is 1 row.
      (s, d) => {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val base = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
        val mm = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val cells = base.crossJoin(broadcast(mm))
          .select(col("user_id"),
            (col("user_id") % 2 === 1).cast("long").as("treat"),
            (col("day") >= expr("lo + (hi - lo + 1) div 2"))
              .cast("long").as("post"))
        cells.agg(
            count(when(col("treat") === 1 && col("post") === 1, 1)).as("e11"),
            count(when(col("treat") === 1 && col("post") === 0, 1)).as("e10"),
            count(when(col("treat") === 0 && col("post") === 1, 1)).as("e01"),
            count(when(col("treat") === 0 && col("post") === 0, 1)).as("e00"),
            countDistinct(when(col("treat") === 1 && col("post") === 1,
              col("user_id"))).as("u11"),
            countDistinct(when(col("treat") === 1 && col("post") === 0,
              col("user_id"))).as("u10"),
            countDistinct(when(col("treat") === 0 && col("post") === 1,
              col("user_id"))).as("u01"),
            countDistinct(when(col("treat") === 0 && col("post") === 0,
              col("user_id"))).as("u00"))
          .select(col("e11"), col("e10"), col("e01"), col("e00"),
            col("u11"), col("u10"), col("u01"), col("u00"),
            expr(DidSql.did).as("did"))
      },
      Some(s"""WITH base AS (SELECT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
              mm AS (SELECT min(day) AS lo, max(day) AS hi FROM base),
              cells AS (SELECT user_id,
                  CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
                  CASE WHEN day >= lo + (hi - lo + 1) // 2
                    THEN 1 ELSE 0 END AS post
                FROM base CROSS JOIN mm),
              m AS (SELECT
                  count(CASE WHEN treat = 1 AND post = 1 THEN 1 END) AS e11,
                  count(CASE WHEN treat = 1 AND post = 0 THEN 1 END) AS e10,
                  count(CASE WHEN treat = 0 AND post = 1 THEN 1 END) AS e01,
                  count(CASE WHEN treat = 0 AND post = 0 THEN 1 END) AS e00,
                  count(DISTINCT CASE WHEN treat = 1 AND post = 1
                    THEN user_id END) AS u11,
                  count(DISTINCT CASE WHEN treat = 1 AND post = 0
                    THEN user_id END) AS u10,
                  count(DISTINCT CASE WHEN treat = 0 AND post = 1
                    THEN user_id END) AS u01,
                  count(DISTINCT CASE WHEN treat = 0 AND post = 0
                    THEN user_id END) AS u00
                FROM cells)
              SELECT e11, e10, e01, e00,
                CAST(u11 AS BIGINT) AS u11, CAST(u10 AS BIGINT) AS u10,
                CAST(u01 AS BIGINT) AS u01, CAST(u00 AS BIGINT) AS u00,
                ${DidSql.did} AS did
              FROM m""")
    ),

    // ── DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE ──────────────────────────
    QueryDef(
      "q328_dp_histogram",
      // The privacy ladder's RELEASE step (audits: q237/q280/q324; this
      // one actually perturbs): per-category counts plus Laplace(1/ε)
      // noise, ε = 1. The noise is SEEDED — uniform u ∈ (−½,½) derives
      // from the shared 32-bit md5 family over the category value, then
      // the inverse-CDF transform −b·sgn(u)·ln(1−2|u|) — so the release
      // is reproducible in both engines and the abs-error audit rides
      // along exactly.
      //
      // Shape, and why it scales: one hash aggregation to category
      // grain (model-sized), then row-local noise; output is
      // category-bounded.
      // Noise surfaces in exact MICRO-UNITS (floor): the raw double
      // differs between engines by 1 ulp (JVM Math.log vs DuckDB libm —
      // neither is correctly rounded), so the release quantizes before
      // comparison; the 5 category noise values are fixed at every
      // scale, none near a floor boundary.
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .withColumn("h", h32(concat(lit("dp1-"), col("event_type"))))
          .withColumn("noise_micro",
            expr(s"CAST(floor(${DidSql.lap} * 1000000.0) AS BIGINT)"))
          .select(col("event_type"), col("n"),
            (col("n") * 1000000L + col("noise_micro")).as("noisy_n_micro"),
            abs(col("noise_micro")).as("abs_err_micro"),
            lit(1000000L).as("epsilon_micro"))
          .orderBy("event_type"),
      Some(s"""WITH g AS (SELECT event_type, count(*) AS n
                FROM events GROUP BY 1),
              h AS (SELECT event_type, n,
                  ${SQL_H32("concat('dp1-', event_type)")} AS h
                FROM g),
              z AS (SELECT event_type, n,
                  CAST(floor(${DidSql.lap} * 1000000.0) AS BIGINT)
                    AS noise_micro
                FROM h)
              SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST(n * 1000000 + noise_micro AS BIGINT) AS noisy_n_micro,
                CAST(abs(noise_micro) AS BIGINT) AS abs_err_micro,
                CAST(1000000 AS BIGINT) AS epsilon_micro
              FROM z ORDER BY event_type""")
    ),

    // ── EPOCH-SHUFFLE QUALITY AUDIT (training-order autocorrelation) ──────
    QueryDef(
      "q327_shuffle_audit",
      // Training-data ORDERING is a data-quality surface: a bad epoch
      // shuffle leaves same-source documents adjacent, and models see
      // correlated batches. This audits the deterministic hash shuffle
      // (order by h32(seed‖doc_id), the same family q72's shard split
      // uses) for two seeds: the fraction of ADJACENT pairs sharing a
      // source, against the exact expected collision rate under a
      // uniform random permutation, Σ nₛ(nₛ−1)/(N(N−1)) — both in exact
      // ppm.
      //
      // Shape, and why it scales: adjacency in hash order is computed
      // WITHOUT a global window — 256 hash-range buckets get per-bucket
      // lag windows in parallel, and the ≤255 cross-bucket boundary
      // pairs come from a bucket-grain first/last table stitched with
      // one tiny window (the distributedPrefixSum offsets discipline).
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source")
        val exp = docs.groupBy("source").agg(count(lit(1)).as("ns"))
          .agg(sum(col("ns") * (col("ns") - 1)).as("coll"),
            sum(col("ns")).as("n"))
        val perSeed = Seq("ep1", "ep2").map { seed =>
          val keyed = docs
            .withColumn("k", h32(concat(lit(seed + "-"), col("doc_id"))))
            .withColumn("bkt", expr("k div 16777216"))
          val wB = Window.partitionBy("bkt").orderBy(col("k"), col("doc_id"))
          // ONE window pass + ONE aggregation per seed: in-bucket pair
          // counts AND the bucket's first/last doc fold out of the same
          // shuffle (a second pass for the edges would re-scan the fact)
          val perBkt = keyed
            .withColumn("prev_src", lag(col("source"), 1).over(wB))
            .groupBy("bkt").agg(
              sum(col("prev_src").isNotNull.cast("long")).as("np"),
              sum((col("prev_src") === col("source")).cast("long"))
                .as("same"),
              min(struct(col("k"), col("doc_id"), col("source")))
                .as("first"),
              max(struct(col("k"), col("doc_id"), col("source")))
                .as("last"))
          // bucket-grain stitch (≤256 rows): cross-bucket boundary pairs
          // via one tiny window
          val wE = Window.orderBy("bkt")
          perBkt
            .withColumn("prev_last_src", lag(col("last.source"), 1).over(wE))
            .agg(
              (sum(col("np")) + sum(col("prev_last_src").isNotNull
                .cast("long"))).as("n_pairs"),
              (sum(col("same")) + sum((col("prev_last_src") ===
                col("first.source")).cast("long"))).as("same_src"))
            .crossJoin(broadcast(exp))
            .select(lit(seed).as("seed"), col("n_pairs"), col("same_src"),
              expr("(1000000 * same_src) div n_pairs").as("same_ppm"),
              expr("(1000000 * coll) div (n * (n - 1))").as("expected_ppm"))
        }
        perSeed.reduce(_ unionAll _).orderBy("seed")
      },
      Some(s"""WITH seeds AS (SELECT 'ep1' AS seed UNION ALL SELECT 'ep2'),
              keyed AS (SELECT seed, doc_id, source,
                  ${SQL_H32("concat(seed, '-', doc_id)")} AS k
                FROM documents CROSS JOIN seeds),
              adj AS (SELECT seed, source,
                  lag(source) OVER (PARTITION BY seed
                    ORDER BY k, doc_id) AS prev_src
                FROM keyed),
              pairs AS (SELECT seed, count(*) AS n_pairs,
                  sum(CASE WHEN source = prev_src THEN 1 ELSE 0 END)
                    AS same_src
                FROM adj WHERE prev_src IS NOT NULL GROUP BY 1),
              exp AS (SELECT sum(ns * (ns - 1)) AS coll, sum(ns) AS n
                FROM (SELECT source, count(*) AS ns
                  FROM documents GROUP BY 1))
              SELECT seed, CAST(n_pairs AS BIGINT) AS n_pairs,
                CAST(same_src AS BIGINT) AS same_src,
                CAST((1000000 * same_src) // n_pairs AS BIGINT) AS same_ppm,
                CAST((1000000 * coll) // (n * (n - 1)) AS BIGINT)
                  AS expected_ppm
              FROM pairs CROSS JOIN exp ORDER BY seed""")
    ),

    // ── GREEDY k-CENTER CORESET (coverage-first data selection) ───────────
    QueryDef(
      "q330_kcenter_coreset",
      // Diversity selection by COVERAGE, the complement of q195's MMR
      // (relevance-diversity reranking) and q126's SemDeDup (redundancy
      // removal): the classic 2-approximation greedy k-center — seed
      // with the lowest vec_id, then repeatedly take the point FARTHEST
      // from its nearest selected center. 4 unrolled rounds (the q145/
      // q236 discipline; the oracle unrolls identically). Distances are
      // cosine, floored to exact micro-units BEFORE any comparison, so
      // every argmax is integer-deterministic (ties → lowest vec_id).
      //
      // Shape, and why it scales: each round is one broadcast of ≤k
      // centers against the streamed corpus + a top-1 TakeOrdered (no
      // global sort materializes); k driver-side scalar probes total.
      (s, d) => Shared.withCheckpointDir(s) {
        val vec = graft.functions.vec
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding")).checkpoint()
        val seedId = e.agg(min(col("vec_id"))).head.getLong(0)
        var centers = Seq(seedId)
        val rows = Seq.newBuilder[(Long, Long, Long)]
        rows += ((1L, seedId, -1L))
        (2 to 4).foreach { step =>
          val c = e.filter(col("vec_id").isin(centers: _*))
            .select(col("vec_id").as("cid"), col("embedding").as("cv"))
          val far = e.filter(!col("vec_id").isin(centers: _*))
            .crossJoin(broadcast(c))
            .withColumn("cos", vec.dot(col("embedding"), col("cv")) /
              (vec.norm(col("embedding")) * vec.norm(col("cv"))))
            .withColumn("dist_micro",
              floor(lit(1000000.0) * (lit(1.0) - col("cos"))).cast("long"))
            .groupBy("vec_id").agg(min(col("dist_micro")).as("dmin"))
            .orderBy(col("dmin").desc, col("vec_id").asc)
            .limit(1).head()
          centers = centers :+ far.getLong(0)
          rows += ((step.toLong, far.getLong(0), far.getLong(1)))
        }
        val s2 = s
        import s2.implicits._
        rows.result().toDF("step", "center_id", "radius_micro")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
              c1 AS (SELECT min(vec_id) AS cid FROM e),
              d1 AS (SELECT e.vec_id,
                  CAST(floor(1000000.0 * (1.0 - ${SqlCos("e.embedding", "c.embedding")}))
                    AS BIGINT) AS dmin
                FROM e JOIN e c ON c.vec_id = (SELECT cid FROM c1)
                WHERE e.vec_id <> (SELECT cid FROM c1)),
              c2 AS (SELECT vec_id AS cid, dmin FROM d1
                ORDER BY dmin DESC, vec_id LIMIT 1),
              d2 AS (SELECT d1.vec_id,
                  least(d1.dmin, CAST(floor(1000000.0 * (1.0 -
                    ${SqlCos("e.embedding", "c.embedding")})) AS BIGINT))
                    AS dmin
                FROM d1 JOIN e ON d1.vec_id = e.vec_id
                JOIN e c ON c.vec_id = (SELECT cid FROM c2)
                WHERE d1.vec_id <> (SELECT cid FROM c2)),
              c3 AS (SELECT vec_id AS cid, dmin FROM d2
                ORDER BY dmin DESC, vec_id LIMIT 1),
              d3 AS (SELECT d2.vec_id,
                  least(d2.dmin, CAST(floor(1000000.0 * (1.0 -
                    ${SqlCos("e.embedding", "c.embedding")})) AS BIGINT))
                    AS dmin
                FROM d2 JOIN e ON d2.vec_id = e.vec_id
                JOIN e c ON c.vec_id = (SELECT cid FROM c3)
                WHERE d2.vec_id <> (SELECT cid FROM c3)),
              c4 AS (SELECT vec_id AS cid, dmin FROM d3
                ORDER BY dmin DESC, vec_id LIMIT 1)
              SELECT CAST(1 AS BIGINT) AS step,
                CAST((SELECT cid FROM c1) AS BIGINT) AS center_id,
                CAST(-1 AS BIGINT) AS radius_micro
              UNION ALL SELECT 2, (SELECT cid FROM c2),
                (SELECT dmin FROM c2)
              UNION ALL SELECT 3, (SELECT cid FROM c3),
                (SELECT dmin FROM c3)
              UNION ALL SELECT 4, (SELECT cid FROM c4),
                (SELECT dmin FROM c4)""")
    ),

    // ── WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis-Spirakis) ───────
    QueryDef(
      "q332_weighted_sample",
      // The one-pass distributed weighted sample every corpus-mixing
      // job needs (q265's PPS is systematic/with-replacement; this is
      // WITHOUT replacement): the A-ES key k = −ln(u)/w with u hash-
      // seeded per doc and w = n_chars — the 32 SMALLEST keys are an
      // exact weighted sample. Keys floor to pico-units so selection
      // and ordering are integer-deterministic (tie → doc_id).
      //
      // Shape, and why it scales: row-local key computation + a top-32
      // TakeOrdered — no sort, no shuffle beyond the k-item heap merge.
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("h", h32(concat(lit("ws1-"), col("doc_id"))))
          .withColumn("key_pico", expr(
            """CAST(floor(1000000000000.0
              * (-ln((CAST(h AS DOUBLE) + 0.5) / 4294967296.0))
              / CAST(n_chars AS DOUBLE)) AS BIGINT)"""))
          .orderBy(col("key_pico").asc, col("doc_id").asc)
          .limit(32)
          .select(col("doc_id"), col("source"),
            col("n_chars").as("w"), col("key_pico")),
      Some(s"""WITH k AS (SELECT doc_id, source, n_chars,
                  ${SQL_H32("concat('ws1-', doc_id)")} AS h
                FROM documents)
              SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
                CAST(floor(1000000000000.0
                  * (-ln((CAST(h AS DOUBLE) + 0.5) / 4294967296.0))
                  / CAST(n_chars AS DOUBLE)) AS BIGINT) AS key_pico
              FROM k ORDER BY key_pico, doc_id LIMIT 32""")
    ),

    // ── SIMPSON'S-PARADOX REVERSAL AUDIT ──────────────────────────────────
    QueryDef(
      "q334_simpson_reversal",
      // The aggregation-safety audit behind every pooled metric: does
      // the pooled trend's SIGN survive disaggregation? Pooled and
      // per-group regression-slope signs for price-vs-discount, where
      // sign(slope) = sign(n·Σxy − Σx·Σy) — an EXACT integer (DECIMAL
      // accumulation; no division, no doubles anywhere). Reversal =
      // every group trend opposes the pooled trend.
      //
      // Shape, and why it scales: one fact pass folding to per-group
      // moment sums (group-bounded), signs and the flag in plain
      // integer arithmetic; output is 1 row + group rows.
      (s, d) => {
        val base = Tables.lineitem(s, d).select(
          col("l_returnflag").as("grp"),
          expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("x"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("y"))
        def moments(g: org.apache.spark.sql.RelationalGroupedDataset) = g.agg(
          count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum(col("y").cast(DecimalType(38, 0))).as("sy"),
          sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"))
        val sign = expr("""CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
            WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)""")
        val perGrp = moments(base.groupBy("grp"))
          .select(col("grp"), col("n").cast("long").as("n"),
            sign.as("slope_sign"))
        val pooled = moments(base.groupBy())
          .select(lit("ALL").as("grp"), col("n").cast("long").as("n"),
            sign.as("slope_sign"))
        perGrp.unionAll(pooled).orderBy("grp")
      },
      Some("""WITH base AS (SELECT l_returnflag AS grp,
                  CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS x,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y
                FROM lineitem),
              g AS (SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x * y) AS sxy
                FROM base GROUP BY 1
                UNION ALL
                SELECT 'ALL', count(*), sum(x), sum(y), sum(x * y)
                FROM base)
              SELECT grp, CAST(n AS BIGINT) AS n,
                CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT)
                  AS slope_sign
              FROM g ORDER BY grp""")
    ),

    // ── POPULATION STABILITY INDEX (categorical drift) ────────────────────
    QueryDef(
      "q335_psi_drift",
      // The ML-monitoring drift metric between q262's KS (continuous,
      // two-sample) and q232's embedding drift: PSI over the event-type
      // distribution, pre- vs post-midpoint — Σ (p−q)·ln(p/q). Each
      // category's term quantizes to micro-units (floor) BEFORE the
      // total, so the 1-ulp ln divergence between engines (the q328
      // finding) can't surface; categories empty on either side yield
      // NULL terms and are excluded by both engines' sum semantics.
      //
      // Shape, and why it scales: one fact pass to (category, period)
      // grain (model-sized), row-local terms, one tiny rollup.
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val base = Tables.events(s, d)
          .select(col("event_type"), expr(s"ts div ${dayNs}L").as("day"))
        val mm = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val cells = base.crossJoin(broadcast(mm))
          .groupBy(col("event_type"))
          .agg(
            sum((col("day") < expr("lo + (hi - lo + 1) div 2"))
              .cast("long")).as("n_pre"),
            sum((col("day") >= expr("lo + (hi - lo + 1) div 2"))
              .cast("long")).as("n_post"))
          .checkpoint()
        val tot = cells.agg(sum(col("n_pre")).as("tp"),
          sum(col("n_post")).as("tq"))
        val terms = cells.crossJoin(broadcast(tot))
          .withColumn("term_micro", expr(PsiSql.term))
        terms.select(col("event_type"), col("n_pre"), col("n_post"),
            col("term_micro"))
          .unionAll(terms.agg(sum(col("n_pre")).as("n_pre"),
              sum(col("n_post")).as("n_post"),
              sum(col("term_micro")).as("term_micro"))
            .select(lit("TOTAL").as("event_type"), col("n_pre"),
              col("n_post"), col("term_micro")))
          .orderBy("event_type")
      },
      Some(s"""WITH base AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day FROM events),
              mm AS (SELECT min(day) AS lo, max(day) AS hi FROM base),
              cells AS (SELECT event_type,
                  sum(CASE WHEN day < lo + (hi - lo + 1) // 2
                    THEN 1 ELSE 0 END) AS n_pre,
                  sum(CASE WHEN day >= lo + (hi - lo + 1) // 2
                    THEN 1 ELSE 0 END) AS n_post
                FROM base CROSS JOIN mm GROUP BY 1),
              tot AS (SELECT sum(n_pre) AS tp, sum(n_post) AS tq
                FROM cells),
              terms AS (SELECT event_type, n_pre, n_post,
                  ${PsiSql.term} AS term_micro
                FROM cells CROSS JOIN tot)
              SELECT event_type, CAST(n_pre AS BIGINT) AS n_pre,
                CAST(n_post AS BIGINT) AS n_post,
                CAST(term_micro AS BIGINT) AS term_micro
              FROM terms
              UNION ALL
              SELECT 'TOTAL', CAST(sum(n_pre) AS BIGINT),
                CAST(sum(n_post) AS BIGINT),
                CAST(sum(term_micro) AS BIGINT)
              FROM terms
              ORDER BY event_type""")
    )
  )

  /** 0..19 bucket spine for the t-closeness dense grid */
  private def spark_sequence_0_19(s: SparkSession): DataFrame =
    s.range(0, 20).select(col("id").as("bkt"))

  /** shared pinned-double texts for q326/q328 */
  private object DidSql {
    private def y(e: String, u: String) =
      s"(CAST($e AS DOUBLE) / CAST($u AS DOUBLE))"
    val did: String =
      s"((${y("e11", "u11")} - ${y("e10", "u10")})" +
        s" - (${y("e01", "u01")} - ${y("e00", "u00")}))"
    /** Laplace(b=1) inverse-CDF from the 32-bit hash column `h` */
    val lap: String =
      """(-(CAST(sign((CAST(h AS DOUBLE) + 0.5) / 4294967296.0 - 0.5)
          AS DOUBLE))
        * ln(1.0 - 2.0 * abs((CAST(h AS DOUBLE) + 0.5) / 4294967296.0
          - 0.5)))"""
  }

  /** DuckDB vector mirrors (dim 64, the SimilarityQueries convention) */
  private def SqlDot(a: String, b: String) =
    s"list_aggregate(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')"
  private def SqlNorm(a: String) =
    s"sqrt(list_aggregate(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), 'sum'))"
  private def SqlCos(a: String, b: String) =
    s"(${SqlDot(a, b)} / (${SqlNorm(a)} * ${SqlNorm(b)}))"

  /** PSI term in exact micro-units; a zero count on either side yields
    * NULL (excluded from both engines' sums identically)
    */
  private object PsiSql {
    private val p = "(CAST(nullif(n_pre, 0) AS DOUBLE) / CAST(tp AS DOUBLE))"
    private val q =
      "(CAST(nullif(n_post, 0) AS DOUBLE) / CAST(tq AS DOUBLE))"
    val term: String =
      s"CAST(floor(1000000.0 * (($p - $q) * ln($p / $q))) AS BIGINT)"
  }
}
