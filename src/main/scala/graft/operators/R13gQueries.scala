package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.SQL_COS
import Shared.{h32, SQL_H32, tokens, SQL_TOKENS}

/** Round-13 batch 7: the model-evaluation governance leg — distribution-
  * free uncertainty (split conformal), drift localization in time (CUSUM
  * changepoint), eval-set hygiene (benchmark n-gram decontamination),
  * and probabilistic-calibration audit (reliability/ECE) — four
  * operators every serving/eval loop over the corpus eventually needs,
  * all in the suite's exact-integer oracle regime.
  */
object R13gQueries {

  private final val K = 5

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
      (s, d) => {
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
        // cnt_ge per possible score 0..K (kept total so a threshold no
        // calibration point reaches still joins, with cnt_ge = 0)
        val hist = s.range(0, K + 1).toDF("t")
          .crossJoin(calScores)
          .groupBy("t")
          .agg(sum(when(col("a") >= col("t"), 1L).otherwise(0L))
            .as("cnt_ge"))
        grain.filter(col("qid") >= 40)
          .join(broadcast(hist), col("score") === col("t"))
          .crossJoin(broadcast(nCal))
          .select(col("qid"), col("true_label"), col("lbl"), col("score"),
            expr("(1L + cnt_ge) * 1000000L div (n_cal + 1L)").as("p_ppm"),
            (lit(10L) * (lit(1L) + col("cnt_ge")) >
              col("n_cal") + lit(1L)).as("in_set"))
      },
      Some(s"""WITH panel AS (SELECT vec_id AS qid, embedding AS qv,
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
              hist AS (SELECT t, CAST(sum(CASE WHEN a >= t THEN 1
                    ELSE 0 END) AS BIGINT) AS cnt_ge
                FROM (SELECT unnest(range(0, ${K + 1})) AS t) CROSS JOIN cal
                GROUP BY t)
              SELECT g.qid, g.true_label, g.lbl, g.score,
                (1 + h.cnt_ge) * 1000000 // (n.n_cal + 1) AS p_ppm,
                10 * (1 + h.cnt_ge) > n.n_cal + 1 AS in_set
              FROM grain g JOIN hist h ON g.score = h.t CROSS JOIN ncal n
              WHERE g.qid >= 40""")
    ),

    // ── CUSUM CHANGEPOINT (per-type daily volume) ─────────────────────────
    QueryDef(
      "q484_cusum_changepoint",
      // Page's CUSUM localized to its max: per event type, the daily
      // count series n_1..n_D (observed days, ordered) accumulates the
      // integer-scaled statistic C_t = D·Σ_{s≤t} n_s − t·Σ n — exactly
      // D times the classic cumulative deviation from the mean, so the
      // argmax is unchanged and every intermediate is an exact BIGINT.
      // The day with max |C_t| (earliest on ties) is the single-
      // changepoint estimate — where a level shift in event volume most
      // likely happened. Counts are integers, so unlike the pinned-
      // double families (q448) nothing here needs term-text pinning.
      //
      // Shape, and why it scales: one events scan collapses to the
      // (type × day) grain map-side; the cumulative window partitions
      // by event_type over a days-long frame (bounded by the calendar,
      // not the data), and the argmax is a per-type rank on that same
      // grain.
      (s, d) => {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        val daily = Tables.events(s, d)
          .select(col("event_type"), expr(s"ts div ${dayNs}L").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"))
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
        daily
          .withColumn("cum", sum(col("n")).over(wOrd))
          .withColumn("k", row_number().over(wOrd).cast("long"))
          .withColumn("n_days", count(lit(1)).over(wAll))
          .withColumn("total", sum(col("n")).over(wAll))
          .withColumn("cusum",
            col("n_days") * col("cum") - col("k") * col("total"))
          .withColumn("pick", row_number().over(Window
            .partitionBy("event_type")
            .orderBy(abs(col("cusum")).desc, col("day").asc)))
          .filter(col("pick") === 1)
          .select(col("event_type"), col("n_days"), col("total"),
            col("day").as("cp_day"), abs(col("cusum")).as("cusum_abs"))
      },
      Some("""WITH daily AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
              st AS (SELECT event_type, day, n,
                  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS k,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                    AS n_days,
                  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                    AS total
                FROM daily),
              cu AS (SELECT event_type, day, n_days, total,
                  n_days * cum - k * total AS cusum FROM st)
              SELECT event_type, n_days, total, day AS cp_day,
                abs(cusum) AS cusum_abs
              FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY abs(cusum) DESC, day) AS pick FROM cu)
              WHERE pick = 1""")
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
