package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch 4: release-governance audits and the truss layer —
  * k-truss decomposition of the co-purchase graph (the cohesion screen
  * one notch above q236's k-core), a k-anonymity / l-diversity audit
  * over quasi-identifiers, a Benford first-digit conformance check on
  * order amounts, and deterministic Laplace-mechanism DP counts (the
  * ε-accounted release next to q420's randomized response).
  *
  * Determinism: library-wide rules — exact integer counts and ppm
  * shares, hash-derived uniforms, every ln a row-local pinned double
  * micro-floored with expression text shared verbatim with the oracle.
  */
object R12dQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── k-TRUSS DECOMPOSITION (peel to FIXPOINT, k = 18) ──────────────────
    QueryDef(
      "q454_ktruss",
      // The edge-cohesion ladder above q236's vertex k-core: an
      // 18-truss keeps only edges supported by ≥ 16 triangles (the
      // co-purchase graph is dense — mean support ~10 — so k = 4 would
      // peel nothing; 16 keeps ~10%, a real backbone), and peeling
      // re-counts because removing an edge removes its triangles. The
      // peel runs to FIXPOINT (r12 verdict task 4 — pageRankConverged's
      // probe + valve discipline): each round runs the q218 triangle
      // machinery — (deg, id) orientation over the CURRENT edge set,
      // shuffled-hash wedge + closing joins — explodes each triangle
      // into its 3 canonical edges, aggregates per-edge support, keeps
      // support ≥ 16. The convergence probe is EXACT, not heuristic:
      // peeling is monotone decreasing, so consecutive-count equality
      // ⟺ the edge set is unchanged ⟺ every surviving edge already
      // holds support ≥ k−2 — the honest truss. Round 1 rides the
      // shared triangle memo (q218/q363 consume the same artifact);
      // later rounds re-derive on the shrinking survivor set. The
      // 24-round cap is a safety valve that THROWS (a wrong answer must
      // never be silent), not a terminator; the oracle's 8-round unroll
      // bounds what any tested dataset needs (sf0.001/sf0.01 converge
      // in ≤ 4), and extra oracle rounds past the fixpoint are no-ops
      // by the same monotonicity.
      //
      // Shape, and why it scales: the memoized edge set bounds pair
      // generation; orientation bounds wedge fan-out by degeneracy;
      // support is one hash aggregation on the triangle stream; every
      // round's edge set is reliably checkpointed, so lineage stays one
      // round deep however many rounds the fixpoint takes.
      (s, d) => Shared.withCheckpointDir(s) {
        type DF = DataFrame
        def degOf(e: DF): DF =
          e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
            .groupBy("v").agg(count(lit(1)).as("deg"))
        def triangles(e: DF, deg: DF): DF = {
          val ed = e
            .join(deg.select(col("v").as("a"), col("deg").as("dega")), "a")
            .join(deg.select(col("v").as("b"), col("deg").as("degb")), "b")
            .select(
              when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
                col("a")).otherwise(col("b")).as("u"),
              when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
                col("b")).otherwise(col("a")).as("v"),
              when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
                col("degb")).otherwise(col("dega")).as("dv"))
            .checkpoint()
          val x = ed.select(col("u"), col("v").as("w1"), col("dv").as("d1"))
          val y = ed.select(col("u"), col("v").as("w2"), col("dv").as("d2"))
          x.join(y.hint("shuffle_hash"), "u")
            .filter(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
            .join(ed.select(col("u").as("w1"), col("v").as("w2"))
              .hint("shuffle_hash"), Seq("w1", "w2"))
            .select("u", "w1", "w2")
        }
        val MaxRounds = 24
        var e = GraphQueries.coPurchaseEdges(s, d)
        var nE = e.count()
        var rounds = 0
        var lastTri = 0L
        var converged = false
        while (!converged && rounds < MaxRounds) {
          val tri = (if (rounds == 0) GraphQueries.coPurchaseTriangles(s, d)
            else triangles(e, degOf(e))).checkpoint()
          lastTri = tri.count()
          val support = tri.select(explode(array(
              struct(least(col("u"), col("w1")).as("a"),
                greatest(col("u"), col("w1")).as("b")),
              struct(least(col("u"), col("w2")).as("a"),
                greatest(col("u"), col("w2")).as("b")),
              struct(least(col("w1"), col("w2")).as("a"),
                greatest(col("w1"), col("w2")).as("b")))).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("supp"))
          e = e.join(support, Seq("a", "b"), "left")
            .filter(coalesce(col("supp"), lit(0L)) >= 16L)
            .select("a", "b").checkpoint()
          val nE2 = e.count()
          converged = nE2 == nE // exact: peel is monotone decreasing
          nE = nE2
          rounds += 1
        }
        if (!converged) throw new IllegalStateException(
          s"q454: truss peel did not reach a fixpoint in $MaxRounds rounds")
        import s.implicits._
        // lastTri enumerated e(rounds−1); at the fixpoint e(rounds) is the
        // same set, so it IS the final truss's triangle count
        Seq((18L, rounds.toLong, nE, lastTri))
          .toDF("k", "rounds_to_fixpoint", "n_edges_final",
            "n_triangles_final")
      },
      Some {
        val R = 8 // unroll bound; fixpoint lands well inside it (spec-pinned)
        def roundSql(r: Int): String = {
          val e = s"e${r - 1}"
          s"""deg$r AS MATERIALIZED (SELECT v, count(*) AS deg FROM
                (SELECT a AS v FROM $e UNION ALL SELECT b FROM $e)
              GROUP BY 1),
            ed$r AS MATERIALIZED (SELECT
                CASE WHEN (da.deg, $e.a) < (db.deg, $e.b)
                  THEN $e.a ELSE $e.b END AS u,
                CASE WHEN (da.deg, $e.a) < (db.deg, $e.b)
                  THEN $e.b ELSE $e.a END AS v,
                CASE WHEN (da.deg, $e.a) < (db.deg, $e.b)
                  THEN db.deg ELSE da.deg END AS dv
              FROM $e JOIN deg$r da ON $e.a = da.v
                JOIN deg$r db ON $e.b = db.v),
            tri$r AS MATERIALIZED (SELECT w.u, w.w1, w.w2 FROM
                (SELECT x.u, x.v AS w1, y.v AS w2
                 FROM ed$r x JOIN ed$r y ON x.u = y.u
                 WHERE (x.dv, x.v) < (y.dv, y.v)) w
              JOIN ed$r cl ON w.w1 = cl.u AND w.w2 = cl.v),
            sup$r AS MATERIALIZED (SELECT a, b, count(*) AS supp FROM (
                SELECT least(u, w1) AS a, greatest(u, w1) AS b FROM tri$r
                UNION ALL SELECT least(u, w2), greatest(u, w2) FROM tri$r
                UNION ALL SELECT least(w1, w2), greatest(w1, w2) FROM tri$r)
              GROUP BY 1, 2),
            e$r AS MATERIALIZED (SELECT $e.a, $e.b FROM $e
              JOIN sup$r s ON $e.a = s.a AND $e.b = s.b
              WHERE s.supp >= 16)"""
        }
        // the first r with c_r = c_{r−1} is the fixpoint round — the same
        // exact monotone-count probe the Spark loop terminates on
        val fixRound = (1 to R).map(r =>
          s"WHEN c$r = c${r - 1} THEN $r").mkString(" ")
        def pick(v: Int => String): String =
          "CASE " + (1 to R).map(r =>
            s"WHEN c$r = c${r - 1} THEN ${v(r)}").mkString(" ") + " END"
        s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
            ${(1 to R).map(roundSql).mkString(",\n")},
            cnt AS (SELECT
              (SELECT count(*) FROM e0) AS c0,
              ${(1 to R).map(r =>
                s"(SELECT count(*) FROM e$r) AS c$r, " +
                s"(SELECT count(*) FROM tri$r) AS t$r").mkString(",\n")})
            SELECT CAST(18 AS BIGINT) AS k,
              CAST(CASE $fixRound END AS BIGINT) AS rounds_to_fixpoint,
              CAST(${pick(r => s"c$r")} AS BIGINT) AS n_edges_final,
              CAST(${pick(r => s"t$r")} AS BIGINT) AS n_triangles_final
            FROM cnt"""
      }
    ),

    // ── k-ANONYMITY / l-DIVERSITY AUDIT ───────────────────────────────────
    QueryDef(
      "q455_k_anonymity",
      // The release-governance check before publishing a partner
      // extract: group the table by its quasi-identifiers (nation ×
      // market segment) and flag every equivalence class that is
      // k-anonymity-deficient (fewer than 5 members — re-identifiable
      // by linkage) or l-diversity-deficient (fewer than 2 distinct
      // sensitive values — attribute disclosure even when k holds).
      // Sensitive attribute = account-balance sign (debt is the
      // disclosure). Exact integer counts only.
      //
      // Shape, and why it scales: one customer pass to the
      // QI-combination grain (nations × segments — model-sized).
      (s, d) =>
        Tables.customer(s, d)
          .select(col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_mktsegment"),
            when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("nonneg"))
              .as("sens"))
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("grp_n"),
            countDistinct(col("sens")).as("n_sensitive"))
          .withColumn("at_risk",
            col("grp_n") < 5L || col("n_sensitive") < 2L),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                c_mktsegment,
                count(*) AS grp_n,
                CAST(count(DISTINCT CASE WHEN c_acctbal < 0
                  THEN 'neg' ELSE 'nonneg' END) AS BIGINT) AS n_sensitive,
                count(*) < 5 OR count(DISTINCT CASE WHEN c_acctbal < 0
                  THEN 'neg' ELSE 'nonneg' END) < 2 AS at_risk
              FROM customer GROUP BY 1, 2""")
    ),

    // ── BENFORD FIRST-DIGIT CONFORMANCE ───────────────────────────────────
    QueryDef(
      "q456_benford",
      // The fraud/data-quality screen on amounts: the first significant
      // digit of order totals against Benford's law. Amounts go through
      // the exact 2-decimal cent representation (integral BIGINT — no
      // float→string surprises), the digit is the first character, the
      // expected share per digit is the row-local pinned
      // floor(1e6·ln(1+1/d)/ln(10)), observed shares exact integer ppm.
      //
      // Shape, and why it scales: one orders pass to a 9-row digit
      // grain; the totals row broadcasts back.
      (s, d) => {
        val dg = Tables.orders(s, d)
          .select(substring(
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = dg.agg(sum(col("n_obs")).as("tn"))
        dg.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            expr("n_obs * 1000000L div tn").as("obs_ppm"),
            expr("""CAST(floor(1e6 * ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
              / ln(10.0)) AS BIGINT)""").as("benford_ppm"))
      },
      Some("""WITH dg AS (SELECT CAST(substring(CAST(
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                count(*) AS n_obs
              FROM orders GROUP BY 1),
              tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS tn FROM dg)
              SELECT digit, n_obs,
                CAST(n_obs * 1000000 // tn AS BIGINT) AS obs_ppm,
                CAST(floor(1e6 * ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
                  / ln(10.0)) AS BIGINT) AS benford_ppm
              FROM dg, tot""")
    ),

    // ── LAPLACE-MECHANISM DP COUNTS (ε = 1) ───────────────────────────────
    QueryDef(
      "q457_dp_laplace_counts",
      // The ε-differentially-private count release (the Laplace
      // mechanism at sensitivity 1, b = 1/ε = 1) next to q420's
      // randomized response: per nation, the true customer count plus
      // Laplace noise derived from a SEEDED hash uniform — the
      // reproducible-noise regime every DP test harness uses (the q420
      // seeded-coin discipline; production swaps the seed source for a
      // CSPRNG, the query shape is identical). u ∈ (0,1) comes exact
      // from the md5-derived integer; the inverse-CDF
      // −sign(u−½)·ln(1−2|u−½|) is ONE pinned double expression
      // micro-floored, shared verbatim with the oracle.
      //
      // Shape, and why it scales: one customer pass to the nation
      // grain; noise is row-local arithmetic on the model table.
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
          .agg(count(lit(1)).as("n_true"))
          .withColumn("u",
            (h32(concat(lit("dp"), col("c_nationkey").cast("string")))
              % 1000000L + 1L).cast("double") / lit(1000001.0))
          .withColumn("noise_micro", expr(
            """CAST(floor(1e6 * (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
              * ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT)"""))
          .select(col("c_nationkey"), col("n_true"), col("noise_micro"),
            (col("n_true") * 1000000L + col("noise_micro"))
              .as("noisy_micro")),
      Some(s"""WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                count(*) AS n_true
              FROM customer GROUP BY 1),
              nz AS (SELECT c_nationkey, n_true,
                CAST(${Shared.SQL_H32("'dp' || CAST(c_nationkey AS VARCHAR)")}
                  % 1000000 + 1 AS DOUBLE) / CAST(1000001.0 AS DOUBLE) AS u
              FROM g)
              SELECT c_nationkey, n_true,
                CAST(floor(1e6 * (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                  * ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT) AS noise_micro,
                CAST(n_true * 1000000 + CAST(floor(1e6
                  * (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                  * ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT) AS BIGINT)
                  AS noisy_micro
              FROM nz""")
    )
  )
}
