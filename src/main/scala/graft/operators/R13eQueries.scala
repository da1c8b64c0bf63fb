package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.SQL_COS

/** Round-13 batch 5: the data-valuation leg — exact closed-form
  * kNN-Shapley over the labeled embedding table (the published O(n log n)
  * recursion, not a Monte-Carlo estimate) and the selective-prediction
  * risk/coverage curve over the q468 vote stream.
  *
  * Determinism: the Shapley recursion is restated as a reverse cumulative
  * sum of EXACT micro-integer terms — every per-rank division is a
  * positive-integer div (truncate ≡ floor on positives, so Spark's `div`
  * and DuckDB's `//` agree) with the sign applied AFTER the division;
  * integer addition commutes, so the window sum is order-free.
  */
object R13eQueries {

  /** kNN vote count K shared by q468/q480/q481 */
  private final val K = 5

  val all: Seq[QueryDef] = Seq(

    // ── EXACT kNN-SHAPLEY DATA VALUATION ──────────────────────────────────
    QueryDef(
      "q480_knn_shapley",
      // Which training points are worth keeping? The exact Shapley
      // value of every corpus point for a K-NN classifier admits a
      // closed form (Jia et al., PVLDB 2019): sort by similarity to the
      // probe, then s(N) = 1[y_N = y]/N and
      // s(i) = s(i+1) + (1[y_i = y] − 1[y_{i+1} = y]) · min(K,i)/(K·i)
      // — an O(n log n) recursion, not the 2^n definition and not a
      // Monte-Carlo estimate. Restated distributively: the value is a
      // REVERSE CUMULATIVE SUM over ranks of exact micro-floored terms,
      // one ranked window per probe. Output: per corpus point, its
      // label and its total micro-value over the 5-probe panel — the
      // table a curation loop reads to drop harmful points (negative
      // value = the point pushes neighbors toward wrong votes).
      //
      // Shape, and why it scales: the broadcast probe panel × streamed
      // corpus (the q41/q468 brute discipline); per-probe windows
      // partition by qid; at serve scale the ranked candidate set comes
      // from the routed generators (q44/q439/q462) and the recursion is
      // unchanged — it only ever sees the candidate list.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").cast("long").as("tlabel"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").cast("long").as("clabel"))
        val w = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid").asc)
        val ranked = broadcast(q).crossJoin(c)
          .select(col("qid"), col("cid"), col("clabel"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"),
            when(col("clabel") === col("tlabel"), 1L).otherwise(0L)
              .as("ind"))
          .withColumn("r", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("qid")))
          .withColumn("ind_next", lead(col("ind"), 1).over(w))
        // contribution at rank r: the tail term 1[y_N=y]·(10⁶ div N) at
        // r=N, else sign·(min(K,r)·10⁶ div (K·r)) — positive div, sign
        // applied after (Spark div truncates toward zero, DuckDB //
        // floors; they agree only on non-negatives)
        val contrib = ranked.withColumn("contrib", expr(
          s"""CASE WHEN r = n THEN ind * (1000000L div n)
             ELSE (ind - ind_next)
               * (least(${K}L, r) * 1000000L div (${K}L * r)) END"""))
        contrib
          .withColumn("s_micro", sum(col("contrib")).over(
            Window.partitionBy("qid").orderBy(col("r").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("cid", "clabel")
          .agg(sum(col("s_micro")).as("value_micro"),
            count(lit(1)).as("n_probes"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS tlabel
                FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  CAST(label AS BIGINT) AS clabel
                FROM embeddings WHERE vec_id >= 5),
              ranked AS (SELECT qid, cid, clabel, ind,
                  CAST(row_number() OVER wr AS BIGINT) AS r,
                  CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS n,
                  lead(ind, 1) OVER wr AS ind_next
                FROM (SELECT q.qid, c.cid, c.clabel,
                    ${SQL_COS("q.qv", "c.cv")} AS cos,
                    CASE WHEN c.clabel = q.tlabel THEN 1 ELSE 0 END AS ind
                  FROM q CROSS JOIN c)
                WINDOW wr AS (PARTITION BY qid ORDER BY cos DESC, cid)),
              contrib AS (SELECT qid, cid, clabel, r,
                  CASE WHEN r = n THEN ind * (1000000 // n)
                  ELSE (ind - ind_next)
                    * (least($K, r) * 1000000 // ($K * r)) END AS contrib
                FROM ranked),
              vals AS (SELECT qid, cid, clabel,
                  CAST(sum(contrib) OVER (PARTITION BY qid ORDER BY r DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s_micro
                FROM contrib)
              SELECT cid, clabel,
                CAST(sum(s_micro) AS BIGINT) AS value_micro,
                CAST(count(*) AS BIGINT) AS n_probes
              FROM vals GROUP BY 1, 2""")
    ),

    // ── SELECTIVE-PREDICTION RISK/COVERAGE CURVE ──────────────────────────
    QueryDef(
      "q481_selective_risk",
      // The abstention curve a deployed classifier is tuned on: keep
      // only predictions whose top-5 vote margin clears a threshold t,
      // and report coverage vs selective accuracy at every t ∈ 1..5.
      // Rides the exact q468 vote stream (same top-5, same tie-breaks).
      // A well-calibrated voter shows accuracy non-decreasing in t as
      // coverage falls — the trade the abstention threshold buys.
      //
      // Shape, and why it scales: the vote table is probe-grain
      // (panel-bounded); the 5-row threshold spine cross-joins onto it
      // broadcast; everything exact integers.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").cast("long").as("tlabel"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").cast("long").as("clabel"))
        val top5 = broadcast(q).crossJoin(c)
          .select(col("qid"), col("tlabel"), col("cid"), col("clabel"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
          .withColumn("rk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid").asc)))
          .filter(col("rk") <= K)
        val votes = top5.groupBy("qid", "tlabel", "clabel")
          .agg(count(lit(1)).as("nv"))
          .withColumn("vr", row_number().over(Window.partitionBy("qid")
            .orderBy(col("nv").desc, col("clabel").asc)))
          .filter(col("vr") === 1)
          .select(col("qid"), col("nv"),
            (col("tlabel") === col("clabel")).as("ok"))
        val nq = votes.agg(count(lit(1)).as("n_probes"))
        import s.implicits._
        val spine = (1L to K.toLong).toDF("t")
        spine.crossJoin(broadcast(votes)).filter(col("nv") >= col("t"))
          .groupBy("t")
          .agg(count(lit(1)).as("n_kept"),
            sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"))
          .crossJoin(broadcast(nq))
          .select(col("t"), col("n_kept"), col("n_correct"),
            expr("n_kept * 1000000L div n_probes").as("coverage_ppm"),
            expr("n_correct * 1000000L div n_kept").as("sel_accuracy_ppm"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS tlabel
                FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  CAST(label AS BIGINT) AS clabel
                FROM embeddings WHERE vec_id >= 5),
              top5 AS (SELECT qid, tlabel, clabel FROM (
                  SELECT q.qid, q.tlabel, c.clabel,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${SQL_COS("qv", "cv")} DESC, c.cid) AS rk
                  FROM q CROSS JOIN c) WHERE rk <= $K),
              votes AS (SELECT qid, nv, tlabel = clabel AS ok FROM (
                  SELECT qid, tlabel, clabel,
                    CAST(count(*) AS BIGINT) AS nv,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY count(*) DESC, clabel) AS vr
                  FROM top5 GROUP BY 1, 2, 3) WHERE vr = 1),
              nq AS (SELECT CAST(count(*) AS BIGINT) AS n_probes
                FROM votes),
              spine AS (SELECT CAST(range + 1 AS BIGINT) AS t
                FROM range($K))
              SELECT t, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_correct,
                CAST(count(*) * 1000000 // max(n_probes) AS BIGINT)
                  AS coverage_ppm,
                CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS sel_accuracy_ppm
              FROM spine JOIN votes ON votes.nv >= spine.t
                CROSS JOIN nq
              GROUP BY 1""")
    )
  )
}
