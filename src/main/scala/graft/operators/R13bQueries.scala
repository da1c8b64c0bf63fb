package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.SQL_COS

/** Round-13 batch 2: the supervised-evaluation leg over the labeled
  * embedding table (kNN label vote, exact-integer nearest-centroid
  * classifier) and the split-management ops every training pipeline
  * runs (deterministic stratified splits, cross-split leakage audit).
  *
  * Determinism: library-wide rules — cosine via the pinned sequential
  * folds, micro-quantized integer centroids (no doubles anywhere in the
  * q469 scoring path), seeded h32 split assignment, every argmax window
  * carrying an exact tie-break.
  */
object R13bQueries {

  import Shared.{h32, SQL_H32}

  val all: Seq[QueryDef] = Seq(

    // ── kNN LABEL VOTE (classifier eval over the vector table) ────────────
    QueryDef(
      "q468_knn_label_vote",
      // The evaluation loop of a kNN classifier on the labeled corpus:
      // per probe, the exact top-5 cosine neighbors vote; majority
      // label wins with (votes DESC, label ASC) as the exact tie-break.
      // Output is probe-grain: true label, prediction, the winning vote
      // count, and correctness — the confusion stream every embedding-
      // quality dashboard aggregates.
      //
      // Shape, and why it scales: 5 broadcast probes × streamed corpus
      // (the q41 brute discipline — at scale the candidate generator
      // swaps to q44/q439's routed paths, the vote is unchanged); the
      // vote is a k-bounded aggregation per probe.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("label").cast("long").as("true_label"))
        val c = e.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("label").cast("long").as("clabel"))
        val top5 = broadcast(q).crossJoin(c)
          .select(col("qid"), col("true_label"), col("cid"), col("clabel"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
          .withColumn("rk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid").asc)))
          .filter(col("rk") <= 5)
        top5.groupBy("qid", "true_label", "clabel")
          .agg(count(lit(1)).as("n_votes"))
          .withColumn("vr", row_number().over(Window.partitionBy("qid")
            .orderBy(col("n_votes").desc, col("clabel").asc)))
          .filter(col("vr") === 1)
          .select(col("qid"), col("true_label"),
            col("clabel").as("pred_label"), col("n_votes"),
            (col("true_label") === col("clabel")).as("correct"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                  CAST(label AS BIGINT) AS true_label
                FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS cv,
                  CAST(label AS BIGINT) AS clabel
                FROM embeddings WHERE vec_id >= 5),
              top5 AS (SELECT qid, true_label, clabel FROM (
                  SELECT q.qid, q.true_label, c.clabel,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${SQL_COS("qv", "cv")} DESC, c.cid) AS rk
                  FROM q CROSS JOIN c) WHERE rk <= 5),
              votes AS (SELECT qid, true_label, clabel,
                  CAST(count(*) AS BIGINT) AS n_votes
                FROM top5 GROUP BY 1, 2, 3)
              SELECT qid, true_label, clabel AS pred_label, n_votes,
                true_label = clabel AS correct
              FROM (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY n_votes DESC, clabel) AS vr FROM votes)
              WHERE vr = 1""")
    ),

    // ── NEAREST-CENTROID CLASSIFIER (exact integer scoring) ───────────────
    QueryDef(
      "q469_nearest_centroid",
      // The Rocchio/nearest-centroid classifier with a fully EXACT
      // serve path: per-label centroids are the integer means of the
      // micro-quantized components (sum(floor(10⁶·x)) div n — the q372
      // quantization), and each probe's score per label is the integer
      // inner product Σ p_micro·c_micro (≤ 64·10¹² — BIGINT-safe), so
      // argmax has no float tie ambiguity ANYWHERE: scores are exact,
      // ties break to the smaller label. Output is probe-grain with the
      // winning score.
      //
      // Shape, and why it scales: one corpus pass to the (label × 64)
      // centroid grain (model-sized), probes explode to (probe × 64)
      // and join the BROADCAST centroid grain on dim — fan-out
      // 64·|labels| per probe, independent of corpus size.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cpts = e.filter(col("vec_id") >= 5)
          .select(col("label").cast("long").as("clabel"),
            posexplode(col("embedding")))
          .select(col("clabel"), col("pos").cast("long").as("dim"),
            expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("q"))
        val cent = cpts.groupBy("clabel", "dim")
          .agg(count(lit(1)).as("nv"), sum(col("q")).as("sq"))
          .select(col("clabel"), col("dim"), expr("sq div nv").as("c"))
        val ppts = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            col("label").cast("long").as("true_label"),
            posexplode(col("embedding")))
          .select(col("qid"), col("true_label"),
            col("pos").cast("long").as("dim"),
            expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0) AS BIGINT)")
              .as("p"))
        ppts.join(broadcast(cent), "dim")
          .groupBy("qid", "true_label", "clabel")
          .agg(sum(col("p") * col("c")).as("score"))
          .withColumn("rk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("score").desc, col("clabel").asc)))
          .filter(col("rk") === 1)
          .select(col("qid"), col("true_label"),
            col("clabel").as("pred_label"), col("score"),
            (col("true_label") === col("clabel")).as("correct"))
      },
      Some("""WITH cpts AS (SELECT CAST(label AS BIGINT) AS clabel,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                    AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS q
                FROM embeddings WHERE vec_id >= 5),
              cent AS (SELECT clabel, dim, sum(q) // count(*) AS c
                FROM cpts GROUP BY 1, 2),
              ppts AS (SELECT vec_id AS qid,
                  CAST(label AS BIGINT) AS true_label,
                  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                    AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS p
                FROM embeddings WHERE vec_id < 5),
              scores AS (SELECT qid, true_label, clabel,
                  CAST(sum(p * c) AS BIGINT) AS score
                FROM ppts JOIN cent USING (dim)
                GROUP BY 1, 2, 3)
              SELECT qid, true_label, clabel AS pred_label, score,
                true_label = clabel AS correct
              FROM (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY score DESC, clabel) AS rk FROM scores)
              WHERE rk = 1""")
    ),

    // ── DETERMINISTIC STRATIFIED SPLIT ASSIGNMENT ─────────────────────────
    QueryDef(
      "q470_split_assignment",
      // The reproducible train/valid/test split every pipeline needs
      // BEFORE any shuffling infrastructure exists: split by the seeded
      // h32 of the doc id (bucket mod 100 → <80 train, <90 valid, else
      // test), audited per (source, split): docs, whitespace tokens,
      // chars, and the doc share within the source (ppm). Hash-based
      // assignment is the production rule because it is stable under
      // appends — a new shipment never reassigns an old document.
      //
      // Shape, and why it scales: one documents pass to the
      // (source × 3) grain; the per-source total joins back on that
      // bounded grain.
      (s, d) => {
        val a = Tables.documents(s, d)
          .select(col("source"), col("n_chars"),
            size(Shared.tokens(col("text"))).cast("long").as("ntok"),
            (h32(concat(lit("split"), col("doc_id").cast("string")))
              % 100L).as("bucket"))
          .withColumn("split",
            when(col("bucket") < 80L, "train")
              .when(col("bucket") < 90L, "valid").otherwise("test"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"))
        val st = a.groupBy("source").agg(sum(col("n_docs")).as("src_docs"))
        a.join(st, "source")
          .select(col("source"), col("split"), col("n_docs"),
            col("n_tokens"), col("n_chars"),
            expr("n_docs * 1000000L div src_docs").as("share_ppm"))
      },
      Some(s"""WITH a AS (SELECT source,
                CASE WHEN ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")}
                    % 100 < 80 THEN 'train'
                  WHEN ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")}
                    % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(${Shared.SQL_TOKENS})) AS BIGINT) AS n_tokens,
                CAST(sum(n_chars) AS BIGINT) AS n_chars
              FROM documents GROUP BY 1, 2),
              st AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs
                FROM a GROUP BY 1)
              SELECT a.source, split, n_docs, n_tokens, n_chars,
                CAST(n_docs * 1000000 // src_docs AS BIGINT) AS share_ppm
              FROM a JOIN st ON a.source = st.source""")
    ),

    // ── CROSS-SPLIT LEAKAGE AUDIT ─────────────────────────────────────────
    QueryDef(
      "q471_split_leakage",
      // The audit q470's split needs before anyone trusts an eval
      // number: does any TEST document's exact normalized text (lower,
      // whitespace-collapsed — the q30 dedup normalization) also appear
      // in TRAIN? Exact-duplicate leakage inflates eval scores
      // silently; the near-dup extension rides the existing MinHash
      // machinery, this is the exact tier. One row: test size, leaked
      // docs, leakage ppm.
      //
      // Shape, and why it scales: ONE documents pass to the
      // (text-hash) grain carrying per-split counts — the leak test is
      // a row-local predicate on that keyed aggregate, never a
      // train×test join.
      (s, d) =>
        Tables.documents(s, d)
          .select(
            md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
              .as("h"),
            (h32(concat(lit("split"), col("doc_id").cast("string")))
              % 100L).as("bucket"))
          .select(col("h"),
            when(col("bucket") >= 90L, 1L).otherwise(0L).as("is_test"),
            when(col("bucket") < 80L, 1L).otherwise(0L).as("is_train"))
          .groupBy("h")
          .agg(sum(col("is_test")).as("nt"), sum(col("is_train")).as("ntr"))
          .agg(sum(col("nt")).as("n_test"),
            sum(when(col("ntr") > 0L, col("nt")).otherwise(0L))
              .as("n_leaked"))
          .select(col("n_test"), col("n_leaked"),
            expr("n_leaked * 1000000L div n_test").as("leaked_ppm")),
      Some(s"""WITH g AS (SELECT
                md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                  AS h,
                CAST(sum(CASE WHEN
                    ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")}
                    % 100 >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                CAST(sum(CASE WHEN
                    ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")}
                    % 100 < 80 THEN 1 ELSE 0 END) AS BIGINT) AS ntr
              FROM documents GROUP BY 1),
              agg AS (SELECT CAST(sum(nt) AS BIGINT) AS n_test,
                CAST(sum(CASE WHEN ntr > 0 THEN nt ELSE 0 END) AS BIGINT)
                  AS n_leaked
              FROM g)
              SELECT n_test, n_leaked,
                CAST(n_leaked * 1000000 // n_test AS BIGINT) AS leaked_ppm
              FROM agg""")
    )
  )
}
