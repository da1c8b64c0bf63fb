package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.SQL_COS

/** Round-13 batch 6: the curation-loop capstone — act on the q480
  * valuation and measure the effect, with the valuation/eval probe
  * panels DISJOINT (value on probes 0–2, evaluate on held-out probes
  * 3–4), the separation an honest data-pruning loop requires.
  */
object R13fQueries {

  private final val K = 5

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q482_shapley_prune_eval",
      // The loop q480 exists to drive, closed end to end: (1) value
      // every corpus point by exact kNN-Shapley against the VALUATION
      // probes (vec_id 0–2); (2) prune the negatively-valued points;
      // (3) re-run the q468 top-5 label vote for the HELD-OUT probes
      // (vec_id 3–4) on the full vs the pruned corpus. Output: one row
      // per (variant, eval probe) with the corpus size it voted over,
      // the prediction and its correctness — the before/after table a
      // curation loop reads to decide whether the prune ships. The
      // probe-panel split is the point: pruning on the same probes you
      // evaluate on is selection leakage (the q471/q479 audits' lesson
      // applied to valuation).
      //
      // Shape, and why it scales: two probe-panel-broadcast × streamed
      // corpus passes (the q41/q468/q480 brute discipline — routed
      // candidate generators swap in at scale); the prune set is a
      // corpus-keyed anti-join; every window partitions by probe.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        def probes(lo: Long, hi: Long) = e
          .filter(col("vec_id") >= lo && col("vec_id") < hi)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").cast("long").as("tlabel"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").cast("long").as("clabel"))
        // exact kNN-Shapley vs the valuation panel (q480's recursion)
        val w = Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid").asc)
        val ranked = broadcast(probes(0, 3)).crossJoin(c)
          .select(col("qid"), col("cid"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"),
            when(col("clabel") === col("tlabel"), 1L).otherwise(0L)
              .as("ind"))
          .withColumn("r", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("qid")))
          .withColumn("ind_next", lead(col("ind"), 1).over(w))
          .withColumn("contrib", expr(
            s"""CASE WHEN r = n THEN ind * (1000000L div n)
               ELSE (ind - ind_next)
                 * (least(${K}L, r) * 1000000L div (${K}L * r)) END"""))
        val harmful = ranked
          .withColumn("s_micro", sum(col("contrib")).over(
            Window.partitionBy("qid").orderBy(col("r").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("cid").agg(sum(col("s_micro")).as("value_micro"))
          .filter(col("value_micro") < 0L)
          .select("cid")
        // held-out vote on full vs pruned corpus
        def vote(corpus: DataFrame, variant: String): DataFrame = {
          val n = corpus.agg(count(lit(1)).as("n_corpus"))
          broadcast(probes(3, 5)).crossJoin(corpus)
            .select(col("qid"), col("tlabel"), col("cid"), col("clabel"),
              R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
            .withColumn("rk", row_number().over(Window.partitionBy("qid")
              .orderBy(col("cos").desc, col("cid").asc)))
            .filter(col("rk") <= K)
            .groupBy("qid", "tlabel", "clabel")
            .agg(count(lit(1)).as("nv"))
            .withColumn("vr", row_number().over(Window.partitionBy("qid")
              .orderBy(col("nv").desc, col("clabel").asc)))
            .filter(col("vr") === 1)
            .crossJoin(broadcast(n))
            .select(lit(variant).as("variant"), col("n_corpus"),
              col("qid"), col("tlabel"),
              col("clabel").as("pred_label"),
              (col("tlabel") === col("clabel")).as("correct"))
        }
        vote(c, "full")
          .unionAll(vote(
            c.join(broadcast(harmful), Seq("cid"), "left_anti"), "pruned"))
      },
      Some(s"""WITH vq AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS tlabel
                FROM embeddings WHERE vec_id >= 0 AND vec_id < 3),
              eq AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS tlabel
                FROM embeddings WHERE vec_id >= 3 AND vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  CAST(label AS BIGINT) AS clabel
                FROM embeddings WHERE vec_id >= 5),
              ranked AS (SELECT qid, cid, ind,
                  CAST(row_number() OVER wr AS BIGINT) AS r,
                  CAST(count(*) OVER (PARTITION BY qid) AS BIGINT) AS n,
                  lead(ind, 1) OVER wr AS ind_next
                FROM (SELECT vq.qid, c.cid,
                    ${SQL_COS("vq.qv", "c.cv")} AS cos,
                    CASE WHEN c.clabel = vq.tlabel THEN 1 ELSE 0 END AS ind
                  FROM vq CROSS JOIN c)
                WINDOW wr AS (PARTITION BY qid ORDER BY cos DESC, cid)),
              contrib AS (SELECT qid, cid, r,
                  CASE WHEN r = n THEN ind * (1000000 // n)
                  ELSE (ind - ind_next)
                    * (least($K, r) * 1000000 // ($K * r)) END AS contrib
                FROM ranked),
              harmful AS (SELECT cid FROM (
                  SELECT cid, CAST(sum(s_micro) AS BIGINT) AS value_micro
                  FROM (SELECT qid, cid,
                      sum(contrib) OVER (PARTITION BY qid ORDER BY r DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS s_micro
                    FROM contrib) GROUP BY 1)
                WHERE value_micro < 0),
              cp AS (SELECT c.* FROM c
                WHERE cid NOT IN (SELECT cid FROM harmful)),
              vf AS (SELECT 'full' AS variant,
                  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_corpus,
                  qid, tlabel, clabel AS pred_label,
                  tlabel = clabel AS correct
                FROM (SELECT qid, tlabel, clabel,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY nv DESC, clabel) AS vr
                  FROM (SELECT qid, tlabel, clabel,
                      CAST(count(*) AS BIGINT) AS nv
                    FROM (SELECT eq.qid, eq.tlabel, c.clabel,
                        row_number() OVER (PARTITION BY eq.qid
                          ORDER BY ${SQL_COS("eq.qv", "c.cv")} DESC, c.cid)
                          AS rk
                      FROM eq CROSS JOIN c)
                    WHERE rk <= $K GROUP BY 1, 2, 3))
                WHERE vr = 1),
              vp AS (SELECT 'pruned' AS variant,
                  CAST((SELECT count(*) FROM cp) AS BIGINT) AS n_corpus,
                  qid, tlabel, clabel AS pred_label,
                  tlabel = clabel AS correct
                FROM (SELECT qid, tlabel, clabel,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY nv DESC, clabel) AS vr
                  FROM (SELECT qid, tlabel, clabel,
                      CAST(count(*) AS BIGINT) AS nv
                    FROM (SELECT eq.qid, eq.tlabel, cp.clabel,
                        row_number() OVER (PARTITION BY eq.qid
                          ORDER BY ${SQL_COS("eq.qv", "cp.cv")} DESC,
                            cp.cid) AS rk
                      FROM eq CROSS JOIN cp)
                    WHERE rk <= $K GROUP BY 1, 2, 3))
                WHERE vr = 1)
              SELECT * FROM vf UNION ALL SELECT * FROM vp""")
    )
  )
}
