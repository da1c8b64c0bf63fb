package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.SQL_COS
import Shared.{h32, SQL_H32, tokens, SQL_TOKENS}

/** Round-13 batch 7: the model-evaluation governance leg — distribution-
  * free uncertainty (split-conformal CLASSIFICATION sets, the discrete
  * sibling of q353's regression intervals), random-projection pairwise-
  * distortion audit (the JL check q102/q419 don't cover), eval-set
  * hygiene (the 13-gram per-source decontamination sheet next to q89's
  * scalar 3-shingle flag), and probabilistic-calibration audit over the
  * kNN vote (the vote-confidence sibling of q360's classifier-score
  * ECE) — four operators every serving/eval loop over the corpus
  * eventually needs, all in the suite's exact oracle regime.
  */
object R13gQueries {

  private final val K = 5

  /** q483's conformal pipeline through the test grain — shared with the
    * q490 gated-serve composition: per (test probe, label) the score,
    * the calibration histogram count and n_cal (from which p-values and
    * set membership derive). One 50-probe broadcast × streamed corpus
    * pass; every later grain is model-sized.
    */
  private[operators] def conformalTestGrain(s: SparkSession, d: String)
      : DataFrame = {
    val e = Tables.embeddings(s, d)
    val panel = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("label").cast("long").as("true_label"))
    val c = e.filter(col("vec_id") >= 50)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("label").cast("long").as("clabel"))
    val labels = c.select(col("clabel").as("lbl")).distinct()
    val top5 = broadcast(panel).crossJoin(c)
      .select(col("qid"), col("true_label"), col("cid"), col("clabel"),
        R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") <= K)
    val votes = top5.groupBy(col("qid"), col("clabel").as("lbl"))
      .agg(count(lit(1)).as("nv"))
    // (probe × label) grain with explicit zero votes — the score a
    // label gets when none of the top-K neighbors carry it
    val grain = panel.select("qid", "true_label")
      .crossJoin(broadcast(labels))
      .join(votes, Seq("qid", "lbl"), "left")
      .withColumn("score", lit(K.toLong) - coalesce(col("nv"), lit(0L)))
    val calScores = grain.filter(col("qid") < 40 &&
      col("lbl") === col("true_label")).select(col("score").as("a"))
    val nCal = calScores.agg(count(lit(1)).as("n_cal"))
    // cnt_ge per possible score 0..K, built as a LEFT join FROM the 0..K
    // spine: every threshold row survives with cnt_ge = 0 even when NO
    // calibration point reaches it — including the degenerate empty-
    // calibration case, where every (test, label) row then carries
    // cnt_ge = 0 / n_cal = 0 and the downstream p-value is the honest
    // p = 1/(n_cal+1) = 1 (a cross-joined histogram would have zero
    // rows and silently drop the whole test grain). The theta join is
    // spine(K+1 rows) × calibration(panel-sized) — model-bounded.
    val hist = s.range(0, K + 1).toDF("t")
      .join(calScores, col("a") >= col("t"), "left")
      .groupBy("t")
      .agg(count(col("a")).as("cnt_ge"))
    grain.filter(col("qid") >= 40)
      .join(broadcast(hist), col("score") === col("t"))
      .crossJoin(broadcast(nCal))
  }

  /** the oracle's mirror of [[conformalTestGrain]] (CTE chain ending in
    * `tg` = the test grain with cnt_ge and n_cal columns)
    */
  private[operators] val SQL_CONFORMAL_CTES: String =
    s"""panel AS (SELECT vec_id AS qid, embedding AS qv,
          CAST(label AS BIGINT) AS true_label
        FROM embeddings WHERE vec_id < 50),
      c AS (SELECT vec_id AS cid, embedding AS cv,
          CAST(label AS BIGINT) AS clabel
        FROM embeddings WHERE vec_id >= 50),
      labels AS (SELECT DISTINCT clabel AS lbl FROM c),
      top5 AS (SELECT qid, true_label, clabel FROM (
          SELECT panel.qid, panel.true_label, c.clabel,
            row_number() OVER (PARTITION BY panel.qid
              ORDER BY ${SQL_COS("qv", "cv")} DESC, c.cid) AS rk
          FROM panel CROSS JOIN c) WHERE rk <= $K),
      votes AS (SELECT qid, clabel AS lbl,
          CAST(count(*) AS BIGINT) AS nv
        FROM top5 GROUP BY 1, 2),
      grain AS (SELECT p.qid, p.true_label, l.lbl,
          ${K}::BIGINT - COALESCE(v.nv, 0) AS score
        FROM (SELECT qid, true_label FROM panel) p
        CROSS JOIN labels l
        LEFT JOIN votes v ON v.qid = p.qid AND v.lbl = l.lbl),
      cal AS (SELECT score AS a FROM grain
        WHERE qid < 40 AND lbl = true_label),
      ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
      hist AS (SELECT t, CAST(count(a) AS BIGINT) AS cnt_ge
        FROM (SELECT unnest(range(0, ${K + 1})) AS t)
        LEFT JOIN cal ON a >= t
        GROUP BY t),
      tg AS (SELECT g.qid, g.true_label, g.lbl, g.score, h.cnt_ge,
          n.n_cal
        FROM grain g JOIN hist h ON g.score = h.t CROSS JOIN ncal n
        WHERE g.qid >= 40)"""

  val all: Seq[QueryDef] = Seq(

    // ── SPLIT-CONFORMAL PREDICTION SETS (exact rank p-values) ─────────────
    QueryDef(
      "q483_conformal_prediction",
      // Distribution-free prediction sets over the kNN vote (Vovk et
      // al.'s split-conformal recipe): nonconformity of (point, label)
      // is A = K − votes_for_label among the exact top-K cosine
      // neighbors (integer 0..K); the calibration panel (vec_id 0–39)
      // scores its TRUE labels once, and each held-out test probe
      // (vec_id 40–49) gets, per candidate label, the exact rank
      // p-value p = (1 + #{cal: a_cal ≥ a}) / (n_cal + 1). A label
      // enters the 90% prediction set iff 10·(1+cnt_ge) > n_cal+1 —
      // the inequality kept in integers so no division truncation can
      // flip a membership. This is the coverage-guaranteed layer a
      // selective-prediction stack (q481) sits under.
      //
      // Shape, and why it scales: one 50-probe broadcast × streamed
      // corpus pass (the q41/q468 brute discipline — routed candidate
      // generation swaps in at scale, the conformal layer is unchanged);
      // everything downstream lives on model-sized grains (50×10 vote
      // grain, 6-row calibration histogram, 1-row n_cal attach) and
      // every window partitions by probe.
      (s, d) =>
        conformalTestGrain(s, d)
          .select(col("qid"), col("true_label"), col("lbl"), col("score"),
            expr("(1L + cnt_ge) * 1000000L div (n_cal + 1L)").as("p_ppm"),
            (lit(10L) * (lit(1L) + col("cnt_ge")) >
              col("n_cal") + lit(1L)).as("in_set")),
      Some(s"""WITH $SQL_CONFORMAL_CTES
              SELECT qid, true_label, lbl, score,
                (1 + cnt_ge) * 1000000 // (n_cal + 1) AS p_ppm,
                10 * (1 + cnt_ge) > n_cal + 1 AS in_set
              FROM tg""")
    ),

    // ── RANDOM-PROJECTION (JL) DISTORTION AUDIT ───────────────────────────
    QueryDef(
      "q484_jl_distortion_audit",
      // Before an index swaps 64-dim vectors for a cheaper 16-dim
      // random projection (the Johnson–Lindenstrauss move every
      // at-scale ANN deployment considers), this audits what the
      // projection does to PAIRWISE similarity — the thing neighbor
      // order actually depends on, which q102's per-row norm-survival
      // and q419's variance isotropy don't see. A 64-point audit panel
      // takes all C(64,2) pairs; each pair's full-space cosine and its
      // cosine under the q42 LCG hyperplane projection (first 16
      // planes, real-valued projections rather than sign bits) differ
      // by a distortion FLOORED to exact micro-units (the q252
      // discipline — the doubles are engine-identical via the pinned
      // sequential folds, so the floor is too). Output: distortion
      // histogram (0.05-cos buckets) with per-bucket max and the global
      // mean attached — the sheet that says whether 16 dims is enough.
      //
      // Shape, and why it scales: the panel is model-sized by
      // construction (the bounded-subset audit regime — you sample a
      // panel, you don't all-pairs the corpus); projections are 16
      // codegen'd dots per row; everything after the floor is exact
      // BIGINT on a ≤21-row grain.
      (s, d) => {
        val P = 16
        val planes16: Array[Array[Double]] = Array.tabulate(P, 64) {
          (p, i) => ((1103515245L * (p * 64L + i) + 12345L) %
            2147483648L).toDouble / 2147483648.0 - 0.5
        }
        def dotD(a: Column, b: Column): Column =
          Shared.fsum(zip_with(a, b, (x, y) => x * y))
        val sub = Tables.embeddings(s, d)
          .filter(col("vec_id") >= 50 && col("vec_id") < 114)
          .select(col("vec_id").as("aid"),
            col("embedding").cast("array<double>").as("av"))
          .withColumn("pv", array((0 until P).map(j =>
            dotD(col("av"), typedlit(planes16(j).toSeq))): _*))
        val pairs = sub.crossJoin(broadcast(sub
            .select(col("aid").as("bid"), col("av").as("bv"),
              col("pv").as("qv"))))
          .filter(col("aid") < col("bid"))
          .withColumn("cos_full", dotD(col("av"), col("bv")) /
            (sqrt(dotD(col("av"), col("av"))) *
              sqrt(dotD(col("bv"), col("bv")))))
          .withColumn("cos_proj", dotD(col("pv"), col("qv")) /
            (sqrt(dotD(col("pv"), col("pv"))) *
              sqrt(dotD(col("qv"), col("qv")))))
          .withColumn("du",
            floor(abs(col("cos_full") - col("cos_proj")) * 1000000.0)
              .cast("long"))
        // ONE pass over the pair grid: the histogram also carries each
        // bucket's exact du sum, so the global mean folds from the
        // ≤21-row histogram instead of re-running the scan/projection/
        // pair subtree a second time (sum-of-bucket-sums ≡ global sum,
        // both exact BIGINT). The tiny histogram is checkpointed because
        // it feeds two consumers (its own rows + the 1-row mean fold).
        Shared.withCheckpointDir(s) {
          val hist = pairs.groupBy(expr("du div 50000L").as("bucket"))
            .agg(count(lit(1)).as("n_pairs"), max(col("du")).as("max_du"),
              sum(col("du")).as("s_du"))
            .checkpoint()
          val mean = hist
            .agg(expr("sum(s_du) div sum(n_pairs)").as("mean_du"))
          hist.crossJoin(broadcast(mean))
            .select("bucket", "n_pairs", "max_du", "mean_du")
        }
      },
      Some {
        val P = 16
        def planeTerm(j: Int) =
          s"""list_aggregate(list_transform(range(1, 65),
             i -> CAST(av[i] AS DOUBLE) * ((CAST((1103515245 *
             (${j * 64} + (i-1)) + 12345) % 2147483648 AS DOUBLE))
             / 2147483648 - 0.5)), 'sum')"""
        def dot16(a: String, b: String) =
          s"list_aggregate(list_transform(range(1, ${P + 1}), " +
            s"i -> $a[i] * $b[i]), 'sum')"
        s"""WITH sub AS (SELECT vec_id AS aid,
                  CAST(embedding AS DOUBLE[]) AS av
                FROM embeddings WHERE vec_id >= 50 AND vec_id < 114),
              proj AS (SELECT aid, av, list_value(
                  ${(0 until P).map(planeTerm).mkString(",\n")}) AS pv
                FROM sub),
              pairs AS (SELECT a.aid, b.aid AS bid,
                  ${SQL_COS("a.av", "b.av")} AS cos_full,
                  ${dot16("a.pv", "b.pv")} /
                    (sqrt(${dot16("a.pv", "a.pv")}) *
                     sqrt(${dot16("b.pv", "b.pv")})) AS cos_proj
                FROM proj a JOIN proj b ON a.aid < b.aid),
              du AS (SELECT CAST(floor(abs(cos_full - cos_proj) * 1000000)
                  AS BIGINT) AS du FROM pairs),
              hist AS (SELECT du // 50000 AS bucket,
                  CAST(count(*) AS BIGINT) AS n_pairs,
                  max(du) AS max_du, CAST(sum(du) AS BIGINT) AS s_du
                FROM du GROUP BY 1),
              mean AS (SELECT CAST(sum(s_du) // sum(n_pairs) AS BIGINT)
                  AS mean_du FROM hist)
              SELECT bucket, n_pairs, max_du, mean_du
              FROM hist CROSS JOIN mean"""
      }
    ),

    // ── BENCHMARK n-GRAM DECONTAMINATION (eval-set hygiene) ───────────────
    QueryDef(
      "q485_benchmark_decontamination",
      // The published pretraining-hygiene rule (GPT-3 appendix C's
      // 13-gram filter): a training document is CONTAMINATED iff it
      // shares any word 13-gram with the benchmark/eval panel (here the
      // deterministic holdout doc_id % 50 = 0). Reported per source:
      // train docs, contaminated docs, exact contamination ppm, and how
      // many distinct benchmark 13-grams the source's documents leak —
      // the sheet that decides whether an eval number can be trusted.
      //
      // Shape, and why it scales: the benchmark panel is eval-sized, so
      // its distinct gram-hash set broadcasts; the corpus-sized work is
      // ONE documents scan exploded to (doc, gram-hash) and semi-joined
      // against that broadcast — never a train×eval document join, and
      // only 8-byte hashes ride the explode (the winnowing discipline).
      // Totals come from a grams-free aggregate of the same scan.
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
        def grams(df: DataFrame): DataFrame = df
          .withColumn("gh", explode(when(size(col("t")) >= 13,
            transform(sequence(lit(1), size(col("t")) - 12),
              i => h32(concat_ws(" ", slice(col("t"), i, lit(13))))))
            .otherwise(array().cast("array<long>"))))
          .select("doc_id", "source", "gh")
        val bench = grams(docs.filter(col("doc_id") % 50 === 0))
          .select("gh").distinct()
        val hits = grams(docs.filter(col("doc_id") % 50 =!= 0))
          .join(broadcast(bench), "gh")
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_contaminated"),
            countDistinct(col("gh")).as("n_dirty_grams"))
        docs.filter(col("doc_id") % 50 =!= 0)
          .groupBy("source").agg(count(lit(1)).as("n_train"))
          .join(hits, Seq("source"), "left")
          .select(col("source"), col("n_train"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            expr("coalesce(n_contaminated, 0L) * 1000000L div n_train")
              .as("contaminated_ppm"),
            coalesce(col("n_dirty_grams"), lit(0L)).as("n_dirty_grams"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $SQL_TOKENS AS t
                FROM documents),
              g AS (SELECT doc_id, source,
                  ${SQL_H32("array_to_string(t[i:i+12], ' ')")} AS gh
                FROM (SELECT doc_id, source, t,
                    unnest(range(1, len(t) - 11)) AS i
                  FROM toks WHERE len(t) >= 13)),
              bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 50 = 0),
              hits AS (SELECT source,
                  CAST(count(DISTINCT g.doc_id) AS BIGINT)
                    AS n_contaminated,
                  CAST(count(DISTINCT g.gh) AS BIGINT) AS n_dirty_grams
                FROM g JOIN bench USING (gh)
                WHERE doc_id % 50 != 0 GROUP BY 1),
              tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_train
                FROM toks WHERE doc_id % 50 != 0 GROUP BY 1)
              SELECT tot.source, tot.n_train,
                COALESCE(hits.n_contaminated, 0) AS n_contaminated,
                COALESCE(hits.n_contaminated, 0) * 1000000 // tot.n_train
                  AS contaminated_ppm,
                COALESCE(hits.n_dirty_grams, 0) AS n_dirty_grams
              FROM tot LEFT JOIN hits USING (source)""")
    ),

    // ── VOTE-CALIBRATION RELIABILITY / ECE ────────────────────────────────
    QueryDef(
      "q486_vote_calibration_ece",
      // The reliability diagram of the kNN classifier's vote confidence,
      // with exact-integer Expected Calibration Error: 50 probes
      // (vec_id < 50) each get a q468-style top-5 vote over the corpus
      // (vec_id ≥ 50); the winning vote count v ∈ 1..5 is the
      // confidence bucket (conf = v/K in ppm). Per bucket: probes,
      // correct predictions, exact accuracy ppm, and the suite-wide
      // ECE_ppm = (Σ_b n_b·|acc_b − conf_b|) div N attached to every
      // row — the one number that says whether "4 of 5 neighbors
      // agreed" actually means 80%. Complements q481: selective risk
      // ranks BY confidence; this audits whether the confidence is
      // honest.
      //
      // Shape, and why it scales: one 50-probe broadcast × streamed
      // corpus pass; buckets are a ≤K-row grain and the ECE attach is a
      // 1-row cross join (the suite's scalar-attach idiom).
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").cast("long").as("true_label"))
        val c = e.filter(col("vec_id") >= 50)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").cast("long").as("clabel"))
        val winner = broadcast(q).crossJoin(c)
          .select(col("qid"), col("true_label"), col("cid"), col("clabel"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
          .withColumn("rk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid").asc)))
          .filter(col("rk") <= K)
          .groupBy("qid", "true_label", "clabel")
          .agg(count(lit(1)).as("nv"))
          .withColumn("vr", row_number().over(Window.partitionBy("qid")
            .orderBy(col("nv").desc, col("clabel").asc)))
          .filter(col("vr") === 1)
        val buckets = winner
          .groupBy(col("nv").as("bucket"))
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("true_label") === col("clabel"), 1L)
              .otherwise(0L)).as("n_correct"))
          .withColumn("acc_ppm",
            expr("n_correct * 1000000L div n_probes"))
          .withColumn("conf_ppm", expr(s"bucket * 1000000L div ${K}L"))
        val ece = buckets.agg(
          expr("sum(n_probes * abs(acc_ppm - conf_ppm)) div sum(n_probes)")
            .as("ece_ppm"))
        buckets.crossJoin(broadcast(ece))
          .select(col("bucket"), col("n_probes"), col("n_correct"),
            col("acc_ppm"), col("conf_ppm"), col("ece_ppm"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS true_label
                FROM embeddings WHERE vec_id < 50),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  CAST(label AS BIGINT) AS clabel
                FROM embeddings WHERE vec_id >= 50),
              top5 AS (SELECT qid, true_label, clabel FROM (
                  SELECT q.qid, q.true_label, c.clabel,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${SQL_COS("qv", "cv")} DESC, c.cid) AS rk
                  FROM q CROSS JOIN c) WHERE rk <= $K),
              votes AS (SELECT qid, true_label, clabel,
                  CAST(count(*) AS BIGINT) AS nv
                FROM top5 GROUP BY 1, 2, 3),
              winner AS (SELECT * FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY nv DESC, clabel) AS vr
                FROM votes) WHERE vr = 1),
              buckets AS (SELECT nv AS bucket,
                  CAST(count(*) AS BIGINT) AS n_probes,
                  CAST(sum(CASE WHEN true_label = clabel THEN 1 ELSE 0
                    END) AS BIGINT) AS n_correct
                FROM winner GROUP BY 1),
              b2 AS (SELECT bucket, n_probes, n_correct,
                  n_correct * 1000000 // n_probes AS acc_ppm,
                  bucket * 1000000 // $K AS conf_ppm FROM buckets),
              ece AS (SELECT CAST(sum(n_probes * abs(acc_ppm - conf_ppm))
                    // sum(n_probes) AS BIGINT) AS ece_ppm FROM b2)
              SELECT bucket, n_probes, n_correct, acc_ppm, conf_ppm,
                ece_ppm
              FROM b2 CROSS JOIN ece""")
    )
  )
}
