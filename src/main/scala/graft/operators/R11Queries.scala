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
      // The classic common-neighbor link-prediction score over the part
      // co-purchase graph: for non-adjacent pairs (a,b), score =
      // Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z). Weights are exact micro-units
      // (floor(1e6/ln(deg)) — floor, not cast: DuckDB's double→BIGINT
      // cast ROUNDS where Spark's truncates), so the sum is an exact
      // BIGINT and the top-20 ordering is integer-deterministic.
      //
      // Shape, and why it scales: wedges are generated from per-center
      // sorted neighbor baskets (ONE aggregation + an array-HOF ordered-
      // pair explode — the q218 discipline, never a fact×fact join),
      // with centers above degree 256 EXCLUDED by spec: a hub's wedge
      // fan-out is quadratic while its per-wedge weight 1/ln(deg) is the
      // graph's minimum, so the cap bounds work per center at ≤ 256²/2
      // pairs with negligible score distortion — the standard production
      // mitigation, mirrored exactly by the oracle. Candidate pairs then
      // aggregate by (a,b) and anti-join the existing edge set.
      (s, d) => {
        val e = GraphQueries.coPurchaseEdges(s, d)
        val sym = e.select(col("a").as("z"), col("b").as("n"))
          .unionAll(e.select(col("b").as("z"), col("a").as("n")))
        val adj = sym.groupBy("z")
          .agg(sort_array(collect_set(col("n"))).as("ns"))
          .withColumn("dg", size(col("ns")).cast("long"))
          .filter(col("dg").between(2, 256))
          .withColumn("wz",
            expr("CAST(floor(1000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)"))
        val cand = adj
          .select(col("wz"), explode(flatten(transform(col("ns"), (x, i) =>
            transform(slice(col("ns"), i + lit(2), size(col("ns"))),
              y => struct(x.as("a"), y.as("b")))))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("wz")).as("score_micro"))
        cand.join(e, Seq("a", "b"), "left_anti")
          .orderBy(col("score_micro").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""WITH e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              sym AS (SELECT a AS z, b AS n FROM e0
                UNION ALL SELECT b, a FROM e0),
              deg AS (SELECT z, count(*) AS dg FROM sym GROUP BY 1),
              w AS (SELECT z,
                  CAST(floor(1000000.0 / ln(CAST(dg AS DOUBLE))) AS BIGINT)
                    AS wz
                FROM deg WHERE dg BETWEEN 2 AND 256),
              wedge AS (SELECT s1.n AS a, s2.n AS b, s1.z
                FROM sym s1 JOIN sym s2 ON s1.z = s2.z AND s1.n < s2.n
                JOIN w ON s1.z = w.z),
              sc AS (SELECT wg.a, wg.b, sum(w.wz) AS score_micro
                FROM wedge wg JOIN w ON wg.z = w.z
                LEFT JOIN e0 ON wg.a = e0.a AND wg.b = e0.b
                WHERE e0.a IS NULL GROUP BY 1, 2)
              SELECT a, b, CAST(score_micro AS BIGINT) AS score_micro
              FROM sc ORDER BY score_micro DESC, a, b LIMIT 20"""),
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
    )
  )
}
