package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R13gQueries.{conformalTestGrain, SQL_CONFORMAL_CTES}
import R13hQueries.{subsetKnn, SQL_KNN_CTES}

/** Round-13 batch 9: ACT on the batch-7/8 diagnostics — the composition
  * capstones that turn audit tables into serving and labeling policy:
  * conformal-gated selective serving (answer only when the 90% set is a
  * singleton), the mutual-kNN vote (the published hubness remedy, scored
  * against the plain vote q487 diagnosed), and the label-spreading
  * seed-fraction curve (how much labeling the neighborhood structure
  * actually needs). Every stage reuses the batch-7/8 grains — the
  * q478/q482 capstone discipline.
  */
object R13iQueries {

  private final val K = 5

  val all: Seq[QueryDef] = Seq(

    // ── CONFORMAL-GATED SELECTIVE SERVE ───────────────────────────────────
    QueryDef(
      "q490_conformal_gated_serve",
      // The policy q483's table exists to drive: serve an answer ONLY
      // when the 90% conformal set is a singleton — the distribution-
      // free abstention rule (vs q481's margin-threshold policy, which
      // tunes a cutoff with no coverage guarantee). Per held-out probe:
      // the set size, whether the gate answered, the answer, and its
      // correctness, with the policy's exact coverage and selective
      // accuracy (ppm) attached — the one-sheet comparison point
      // against any row of q481's risk/coverage curve.
      //
      // Shape, and why it scales: one conformal pipeline pass (the
      // q483 shape — 50-probe broadcast × streamed corpus, model-sized
      // grains after), then a 10-row per-probe aggregation and two
      // 1-row scalar attaches.
      (s, d) => {
        val gated = conformalTestGrain(s, d)
          .withColumn("in_set",
            lit(10L) * (lit(1L) + col("cnt_ge")) > col("n_cal") + lit(1L))
          .groupBy("qid", "true_label")
          .agg(sum(when(col("in_set"), 1L).otherwise(0L)).as("set_size"),
            max(when(col("in_set"), col("lbl"))).as("only_lbl"))
          .withColumn("answered", col("set_size") === 1L)
          .withColumn("answer",
            when(col("answered"), col("only_lbl")).otherwise(lit(-1L)))
          .withColumn("correct",
            col("answered") && col("answer") === col("true_label"))
          .drop("only_lbl")
        val tot = gated.agg(
          count(lit(1)).as("n_test"),
          sum(when(col("answered"), 1L).otherwise(0L)).as("n_ans"),
          sum(when(col("correct"), 1L).otherwise(0L)).as("n_corr"))
        gated.crossJoin(broadcast(tot))
          .select(col("qid"), col("true_label"), col("set_size"),
            col("answered"), col("answer"), col("correct"),
            expr("n_ans * 1000000L div n_test").as("coverage_ppm"),
            expr("CASE WHEN n_ans > 0 THEN n_corr * 1000000L div n_ans " +
              "ELSE 0L END").as("sel_acc_ppm"))
      },
      Some(s"""WITH $SQL_CONFORMAL_CTES,
              gated AS (SELECT qid, true_label,
                  CAST(sum(CASE WHEN 10 * (1 + cnt_ge) > n_cal + 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS set_size,
                  max(CASE WHEN 10 * (1 + cnt_ge) > n_cal + 1
                    THEN lbl END) AS only_lbl
                FROM tg GROUP BY 1, 2),
              g2 AS (SELECT qid, true_label, set_size,
                  set_size = 1 AS answered,
                  CASE WHEN set_size = 1 THEN only_lbl ELSE -1 END
                    AS answer
                FROM gated),
              g3 AS (SELECT *,
                  answered AND answer = true_label AS correct FROM g2),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
                  CAST(sum(CASE WHEN answered THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ans,
                  CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_corr
                FROM g3)
              SELECT qid, true_label, set_size, answered, answer, correct,
                n_ans * 1000000 // n_test AS coverage_ppm,
                CASE WHEN n_ans > 0 THEN n_corr * 1000000 // n_ans
                  ELSE 0 END AS sel_acc_ppm
              FROM g3 CROSS JOIN tot""")
    ),

    // ── MUTUAL-kNN VOTE (the hubness remedy, measured) ────────────────────
    QueryDef(
      "q491_mutual_knn_vote",
      // The published fix for the pathology q488 diagnoses: count a
      // neighbor's vote ONLY when the relation is mutual (a ∈ top-K(b)
      // AND b ∈ top-K(a)) — hubs lose their asymmetric reach, antihubs
      // stop being drowned out. Per panel point: the plain leave-one-out
      // vote (q487's) and the mutual-kNN vote side by side with their
      // correctness — the before/after table that says whether mutuality
      // buys accuracy on THIS corpus. Points with no mutual neighbor
      // abstain (−1).
      //
      // Shape, and why it scales: the mutual edge set is ONE self-join
      // of the memoized panel-kNN grain on the reversed key (K-bounded
      // per point, keyed equi-join — never re-scoring); both votes are
      // grain aggregations.
      (s, d) => {
        val knn = subsetKnn(s, d)
        def majority(edges: DataFrame): DataFrame = edges
          .groupBy("aid", "blbl").agg(count(lit(1)).as("nv"))
          .withColumn("vr", row_number().over(Window.partitionBy("aid")
            .orderBy(col("nv").desc, col("blbl").asc)))
          .filter(col("vr") === 1)
          .select(col("aid"), col("blbl").as("pred"))
        val full = majority(knn)
        val mutual = majority(knn.join(
          knn.select(col("aid").as("bid"), col("bid").as("aid")),
          Seq("aid", "bid")))
        knn.select("aid", "albl").distinct()
          .join(full.withColumnRenamed("pred", "full_pred"), "aid")
          .join(mutual.withColumnRenamed("pred", "mutual_pred"),
            Seq("aid"), "left")
          .select(col("aid"), col("albl").as("true_label"),
            col("full_pred"),
            (col("full_pred") === col("albl")).as("full_correct"),
            coalesce(col("mutual_pred"), lit(-1L)).as("mutual_pred"),
            (coalesce(col("mutual_pred"), lit(-1L)) === col("albl"))
              .as("mutual_correct"))
      },
      Some(s"""WITH $SQL_KNN_CTES,
              fullv AS (SELECT aid, blbl AS full_pred FROM (
                  SELECT aid, blbl, row_number() OVER (PARTITION BY aid
                      ORDER BY nv DESC, blbl) AS vr
                  FROM (SELECT aid, blbl, CAST(count(*) AS BIGINT) AS nv
                    FROM knn GROUP BY 1, 2)) WHERE vr = 1),
              medges AS (SELECT k1.aid, k1.blbl FROM knn k1
                JOIN knn k2 ON k1.aid = k2.bid AND k1.bid = k2.aid),
              mutv AS (SELECT aid, blbl AS mutual_pred FROM (
                  SELECT aid, blbl, row_number() OVER (PARTITION BY aid
                      ORDER BY nv DESC, blbl) AS vr
                  FROM (SELECT aid, blbl, CAST(count(*) AS BIGINT) AS nv
                    FROM medges GROUP BY 1, 2)) WHERE vr = 1),
              pan AS (SELECT DISTINCT aid, albl FROM knn)
              SELECT pan.aid, pan.albl AS true_label, fullv.full_pred,
                fullv.full_pred = pan.albl AS full_correct,
                COALESCE(mutv.mutual_pred, -1) AS mutual_pred,
                COALESCE(mutv.mutual_pred, -1) = pan.albl
                  AS mutual_correct
              FROM pan JOIN fullv USING (aid)
              LEFT JOIN mutv USING (aid)""")
    ),

    // ── LABEL-SPREADING SEED-FRACTION CURVE ───────────────────────────────
    QueryDef(
      "q492_spreading_seed_curve",
      // q489's operator swept over the labeling budget: seed boundaries
      // at 25% / 50% / 75% of the panel, each running the same two
      // exact synchronous rounds, reported as one row per boundary —
      // seeds, round-1/round-2 reach, unreached, and transductive
      // accuracy (exact ppm) on the non-seed points an annotation
      // campaign actually cares about. The curve answers "how much
      // labeling does the neighborhood structure need" before anyone
      // pays for more labels.
      //
      // Shape, and why it scales: the 3-row boundary spine crosses the
      // memoized panel grain (3× a model-sized table); every vote and
      // window partitions by (boundary, point) — the q489 rounds,
      // vectorized over the spine instead of re-run per setting.
      (s, d) => {
        val knn3 = subsetKnn(s, d).filter(col("rk") <= 3)
          .select("aid", "bid")
        val panel = subsetKnn(s, d).select("aid", "albl").distinct()
        val bounds = { import s.implicits._; Seq(114L, 178L, 242L)
          .toDF("bound") }
        val l0 = panel.crossJoin(broadcast(bounds))
          .withColumn("lbl", when(col("aid") < col("bound"), col("albl")))
        def round(lbls: DataFrame): DataFrame = {
          val picked = knn3
            .join(lbls.filter(col("lbl").isNotNull)
              .select(col("bound"), col("aid").as("bid"),
                col("lbl").as("nl")), Seq("bid"))
            .join(lbls.filter(col("lbl").isNull)
              .select("bound", "aid"), Seq("bound", "aid"))
            .groupBy("bound", "aid", "nl").agg(count(lit(1)).as("c"))
            .withColumn("pr", row_number().over(
              Window.partitionBy("bound", "aid")
                .orderBy(col("c").desc, col("nl").asc)))
            .filter(col("pr") === 1)
            .select(col("bound"), col("aid"), col("nl"))
          lbls.join(picked, Seq("bound", "aid"), "left")
            .select(col("bound"), col("aid"), col("albl"),
              coalesce(col("lbl"), col("nl")).as("lbl"),
              col("nl").isNotNull.as("fresh"))
        }
        val r1 = round(l0)
        val r2 = round(r1.drop("fresh"))
        r1.select(col("bound"), col("aid"), col("fresh").as("f1"))
          .join(r2, Seq("bound", "aid"))
          .groupBy("bound")
          .agg(
            sum(when(col("aid") < col("bound"), 1L).otherwise(0L))
              .as("n_seeds"),
            sum(when(col("f1"), 1L).otherwise(0L)).as("reached_r1"),
            sum(when(col("fresh"), 1L).otherwise(0L)).as("reached_r2"),
            sum(when(col("lbl").isNull, 1L).otherwise(0L))
              .as("unreached"),
            sum(when(col("aid") >= col("bound") && col("lbl").isNotNull,
              1L).otherwise(0L)).as("assigned_nonseed"),
            sum(when(col("aid") >= col("bound") &&
              col("lbl") === col("albl"), 1L).otherwise(0L))
              .as("correct_nonseed"))
          .select(col("bound"), col("n_seeds"), col("reached_r1"),
            col("reached_r2"), col("unreached"),
            expr("CASE WHEN assigned_nonseed > 0 THEN correct_nonseed " +
              "* 1000000L div assigned_nonseed ELSE 0L END")
              .as("acc_ppm"))
      },
      Some(s"""WITH $SQL_KNN_CTES,
              k3 AS (SELECT aid, bid FROM knn WHERE rk <= 3),
              pan AS (SELECT DISTINCT aid, albl FROM knn),
              bounds AS (SELECT unnest([114, 178, 242]) AS bound),
              l0 AS (SELECT b.bound, p.aid, p.albl,
                  CASE WHEN p.aid < b.bound THEN p.albl END AS lbl
                FROM pan p CROSS JOIN bounds b),
              p1 AS (SELECT bound, aid, nl FROM (SELECT bound, aid, nl,
                    row_number() OVER (PARTITION BY bound, aid
                      ORDER BY c DESC, nl) AS pr
                  FROM (SELECT la.bound, k3.aid, lb.lbl AS nl,
                      CAST(count(*) AS BIGINT) AS c
                    FROM k3
                    JOIN l0 la ON k3.aid = la.aid AND la.lbl IS NULL
                    JOIN l0 lb ON k3.bid = lb.aid AND lb.lbl IS NOT NULL
                      AND lb.bound = la.bound
                    GROUP BY 1, 2, 3)) WHERE pr = 1),
              l1 AS (SELECT l0.bound, l0.aid, l0.albl,
                  COALESCE(l0.lbl, p1.nl) AS lbl,
                  p1.nl IS NOT NULL AS f1
                FROM l0 LEFT JOIN p1
                  ON l0.bound = p1.bound AND l0.aid = p1.aid),
              p2 AS (SELECT bound, aid, nl FROM (SELECT bound, aid, nl,
                    row_number() OVER (PARTITION BY bound, aid
                      ORDER BY c DESC, nl) AS pr
                  FROM (SELECT la.bound, k3.aid, lb.lbl AS nl,
                      CAST(count(*) AS BIGINT) AS c
                    FROM k3
                    JOIN l1 la ON k3.aid = la.aid AND la.lbl IS NULL
                    JOIN l1 lb ON k3.bid = lb.aid AND lb.lbl IS NOT NULL
                      AND lb.bound = la.bound
                    GROUP BY 1, 2, 3)) WHERE pr = 1),
              l2 AS (SELECT l1.bound, l1.aid, l1.albl,
                  COALESCE(l1.lbl, p2.nl) AS lbl, l1.f1,
                  p2.nl IS NOT NULL AS f2
                FROM l1 LEFT JOIN p2
                  ON l1.bound = p2.bound AND l1.aid = p2.aid)
              SELECT CAST(bound AS BIGINT) AS bound,
                CAST(sum(CASE WHEN aid < bound THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_seeds,
                CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_r1,
                CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS reached_r2,
                CAST(sum(CASE WHEN lbl IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS unreached,
                CASE WHEN sum(CASE WHEN aid >= bound AND lbl IS NOT NULL
                    THEN 1 ELSE 0 END) > 0
                  THEN CAST(sum(CASE WHEN aid >= bound AND lbl = albl
                      THEN 1 ELSE 0 END) AS BIGINT) * 1000000
                    // CAST(sum(CASE WHEN aid >= bound AND lbl IS NOT
                      NULL THEN 1 ELSE 0 END) AS BIGINT)
                  ELSE 0 END AS acc_ppm
              FROM l2 GROUP BY 1""")
    )
  )
}
