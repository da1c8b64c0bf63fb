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

    // ── k-TRUSS DECOMPOSITION (2 unrolled peel rounds, k = 18) ────────────
    QueryDef(
      "q454_ktruss",
      // The edge-cohesion ladder above q236's vertex k-core: an
      // 18-truss keeps only edges supported by ≥ 16 triangles (the
      // co-purchase graph is dense — mean support ~10 — so k = 4 would
      // peel nothing; 16 keeps ~10%, a real backbone), and peeling
      // re-counts because removing an edge removes its triangles. Two
      // unrolled rounds (q236's unroll discipline; a fixpoint variant
      // follows pageRankConverged): each round runs the q218 triangle
      // machinery — (deg, id) orientation over the CURRENT edge set,
      // shuffled-hash wedge + closing joins — then explodes each
      // triangle into its 3 canonical edges, aggregates per-edge
      // support, and keeps support ≥ 16. Round 1 rides the shared
      // triangle memo; round 2 re-derives orientation and triangles on
      // the ~10× smaller survivor set (the honest peel, at a fraction
      // of round 1's cost).
      //
      // Shape, and why it scales: the memoized edge set bounds pair
      // generation; orientation bounds wedge fan-out by degeneracy;
      // support is one hash aggregation on the triangle stream; every
      // round's edge set is reliably checkpointed.
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
        var e = GraphQueries.coPurchaseEdges(s, d)
        val out = (1 to 2).map { r =>
          // round 1's enumeration is the shared triangle memo (q218/q363
          // consume the same artifact); later rounds re-derive on the
          // (much smaller) surviving edge set
          val tri = (if (r == 1) GraphQueries.coPurchaseTriangles(s, d)
            else triangles(e, degOf(e))).checkpoint()
          val nE = e.count()
          val nT = tri.count()
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
          (r.toLong, nE, nT, e.count())
        }
        import s.implicits._
        out.toDF("round", "n_edges_in", "n_triangles", "n_edges_surviving")
      },
      Some {
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
        s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
            ${roundSql(1)},
            ${roundSql(2)}
            SELECT CAST(1 AS BIGINT) AS round,
              CAST((SELECT count(*) FROM e0) AS BIGINT) AS n_edges_in,
              CAST((SELECT count(*) FROM tri1) AS BIGINT) AS n_triangles,
              CAST((SELECT count(*) FROM e1) AS BIGINT) AS n_edges_surviving
            UNION ALL SELECT 2, (SELECT count(*) FROM e1),
              (SELECT count(*) FROM tri2), (SELECT count(*) FROM e2)"""
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
