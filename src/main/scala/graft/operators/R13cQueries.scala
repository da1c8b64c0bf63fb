package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.{SQL_COS, SQL_ENTRIES_CTE, SQL_KNN_GRAPH_CTES}

/** Round-13 batch 3: the split-quality audits that close the q470 split
  * family (label balance, class rebalancing, re-split migration), the
  * soft-dedup weighting alternative to hard dedup, the exact-integer
  * MinHash-LSH banding planner, and the HNSW recall-vs-beam-width curve
  * that gives q462 the same serve-tuning surface q450 gave IVF.
  *
  * Determinism: library-wide rules — exact integer counts and ppm
  * divisions everywhere, the one pinned-double χ² term text shared
  * verbatim with the oracle (the q466 discipline), seeded h32 hashing,
  * and the LSH planner computed in exact ≥64-bit integer arithmetic on
  * BOTH engines (DECIMAL(38,0) squaring chain here, HUGEINT in DuckDB —
  * doubles would lose the low digits of (10^r − k^r)^b at 10^32).
  */
object R13cQueries {

  import Shared.{h32, SQL_H32}

  /** the q470 hash-split rule over an id column (80/10/10) */
  private def splitOf(id: Column): Column = {
    val b = h32(concat(lit("split"), id.cast("string"))) % 100L
    when(b < 80L, "train").when(b < 90L, "valid").otherwise("test")
  }
  private def sqlSplitOf(id: String): String =
    s"""CASE WHEN ${SQL_H32(s"'split' || CAST($id AS VARCHAR)")} % 100 < 80
          THEN 'train'
        WHEN ${SQL_H32(s"'split' || CAST($id AS VARCHAR)")} % 100 < 90
          THEN 'valid'
        ELSE 'test' END"""

  /** the q466 pinned-double Pearson-χ² cell term (expected = mt·st/gt),
    * micro-floored; text shared verbatim with the oracle
    */
  private def chiTerm(mt: String): String =
    s"""CAST(floor(1e6
      * (CAST(obs AS DOUBLE) - (CAST($mt AS DOUBLE) * CAST(st AS DOUBLE) / CAST(gt AS DOUBLE)))
      * (CAST(obs AS DOUBLE) - (CAST($mt AS DOUBLE) * CAST(st AS DOUBLE) / CAST(gt AS DOUBLE)))
      / (CAST($mt AS DOUBLE) * CAST(st AS DOUBLE) / CAST(gt AS DOUBLE))) AS BIGINT)"""

  val all: Seq[QueryDef] = Seq(

    // ── SPLIT LABEL-BALANCE χ² AUDIT ──────────────────────────────────────
    QueryDef(
      "q472_split_label_balance",
      // The class-balance audit q470's hash split needs on the LABELED
      // table: is the label distribution independent of the split? A
      // skewed draw (rare label concentrated in test) silently biases
      // every eval number. Pearson χ² of the (split × label) contingency
      // table against independence, reported per split (the partial χ²
      // sum localizes WHICH split drew badly) next to its size and the
      // number of labels it carries. Terms are the q466 pinned-double
      // micro-floored expression; sums are exact integers (order-free).
      //
      // Shape, and why it scales: one embeddings pass to the
      // (3 × |labels|) contingency grain; marginals are aggregations OF
      // that grain; the 1-row grand total broadcasts back onto it.
      (s, d) => {
        val cell = Tables.embeddings(s, d)
          .select(splitOf(col("vec_id")).as("split"),
            col("label").cast("long").as("label"))
          .groupBy("split", "label").agg(count(lit(1)).as("obs"))
        val st = cell.groupBy("split").agg(sum(col("obs")).as("st"))
        val lt = cell.groupBy("label").agg(sum(col("obs")).as("lt"))
        val gt = cell.agg(sum(col("obs")).as("gt"))
        cell.join(st, "split").join(lt, "label")
          .crossJoin(broadcast(gt))
          .withColumn("term_micro", expr(chiTerm("lt")))
          .groupBy("split")
          .agg(max(col("st")).as("n_vecs"),
            count(lit(1)).as("n_labels"),
            sum(col("term_micro")).as("chi2_micro"))
      },
      Some(s"""WITH cell AS (SELECT ${sqlSplitOf("vec_id")} AS split,
                CAST(label AS BIGINT) AS label,
                CAST(count(*) AS BIGINT) AS obs
              FROM embeddings GROUP BY 1, 2),
              stt AS (SELECT split, CAST(sum(obs) AS BIGINT) AS st
                FROM cell GROUP BY 1),
              ltt AS (SELECT label, CAST(sum(obs) AS BIGINT) AS lt
                FROM cell GROUP BY 1),
              gtt AS (SELECT CAST(sum(obs) AS BIGINT) AS gt FROM cell),
              terms AS (SELECT cell.split, stt.st,
                ${chiTerm("lt")} AS term_micro
              FROM cell JOIN stt ON cell.split = stt.split
                JOIN ltt ON cell.label = ltt.label
                CROSS JOIN gtt)
              SELECT split, CAST(max(st) AS BIGINT) AS n_vecs,
                CAST(count(*) AS BIGINT) AS n_labels,
                CAST(sum(term_micro) AS BIGINT) AS chi2_micro
              FROM terms GROUP BY 1""")
    ),

    // ── SOFT-DEDUP WEIGHTING (effective source sizes) ─────────────────────
    QueryDef(
      "q473_soft_dedup_weights",
      // The alternative to hard dedup that modern mixes actually train
      // with: keep every copy but DOWNWEIGHT it by 1/cluster-size (a
      // doc duplicated 4× contributes 1/4 each — total influence one
      // doc). Clusters are the exact normalized-text-hash groups (the
      // q30 grain); per-doc weight is the exact integer 10⁶ div csize.
      // Per source: raw docs, singleton docs (weight exactly 10⁶), and
      // the effective doc mass in ppm — the number that replaces raw
      // counts in every mix computation downstream (q443/q445/q446).
      //
      // Shape, and why it scales: one documents pass to the
      // (hash × source) grain; cluster sizes are an aggregation OF that
      // grain joined back on the hash key (hash-partitioned, never
      // all-pairs); source rollup is bounded.
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(
            md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
              .as("h"),
            col("source"))
          .groupBy("h", "source").agg(count(lit(1)).as("cnt"))
        val cs = g.groupBy("h").agg(sum(col("cnt")).as("csize"))
        g.join(cs, "h")
          .groupBy("source")
          .agg(sum(col("cnt")).as("n_docs"),
            sum(when(col("csize") === 1L, col("cnt")).otherwise(0L))
              .as("n_singleton_docs"),
            sum(expr("cnt * (1000000L div csize)")).as("eff_docs_ppm"))
      },
      Some("""WITH g AS (SELECT
                md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                  AS h,
                source, CAST(count(*) AS BIGINT) AS cnt
              FROM documents GROUP BY 1, 2),
              cs AS (SELECT h, CAST(sum(cnt) AS BIGINT) AS csize
                FROM g GROUP BY 1)
              SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN csize = 1 THEN cnt ELSE 0 END) AS BIGINT)
                  AS n_singleton_docs,
                CAST(sum(cnt * (1000000 // csize)) AS BIGINT) AS eff_docs_ppm
              FROM g JOIN cs USING (h) GROUP BY 1""")
    ),

    // ── CLASS-REBALANCE DOWNSAMPLING PLAN ─────────────────────────────────
    QueryDef(
      "q474_class_rebalance_plan",
      // Rebalancing a skewed label distribution WITHIN each split by
      // hash-rate downsampling — the production sampler shape: target
      // quota = the split's minority-class count; each row keeps iff
      // h32('bal'‖id) mod 10⁶ < quota·10⁶ div n (a pure row-local
      // predicate — append-stable, no global sort, no rank). The kept
      // count is BINOMIAL around the quota, not exact — that is the
      // deliberate trade (an exact rank-based cut needs a per-class
      // global sort; at 100 TB the hash-rate rule is the one that
      // ships), and the audit reports the achieved kept_ppm so the
      // operator can see the sampling error.
      //
      // Shape, and why it scales: one embeddings pass to the
      // (split × label) grain; the quota table (bounded) broadcasts
      // back onto a second row-level pass; the keep test is row-local.
      (s, d) => {
        val rows = Tables.embeddings(s, d)
          .select(splitOf(col("vec_id")).as("split"),
            col("label").cast("long").as("label"),
            (h32(concat(lit("bal"), col("vec_id").cast("string")))
              % 1000000L).as("r"))
        val grain = rows.groupBy("split", "label")
          .agg(count(lit(1)).as("n"))
          .withColumn("quota",
            min(col("n")).over(Window.partitionBy("split")))
        rows.join(broadcast(grain), Seq("split", "label"))
          .groupBy("split", "label")
          .agg(max(col("n")).as("n_vecs"), max(col("quota")).as("quota"),
            sum(when(col("r") < expr("quota * 1000000L div n"), 1L)
              .otherwise(0L)).as("n_kept"))
          .select(col("split"), col("label"), col("n_vecs"), col("quota"),
            col("n_kept"),
            expr("n_kept * 1000000L div n_vecs").as("kept_ppm"))
      },
      Some(s"""WITH rws AS (SELECT ${sqlSplitOf("vec_id")} AS split,
                CAST(label AS BIGINT) AS label,
                ${SQL_H32("'bal' || CAST(vec_id AS VARCHAR)")} % 1000000
                  AS r
              FROM embeddings),
              grain AS (SELECT split, label,
                CAST(count(*) AS BIGINT) AS n
              FROM rws GROUP BY 1, 2),
              q AS (SELECT split, label, n,
                min(n) OVER (PARTITION BY split) AS quota FROM grain)
              SELECT split, label, n_vecs, quota, n_kept,
                CAST(n_kept * 1000000 // n_vecs AS BIGINT) AS kept_ppm
              FROM (SELECT r2.split, r2.label,
                  CAST(max(q.n) AS BIGINT) AS n_vecs,
                  CAST(max(q.quota) AS BIGINT) AS quota,
                  CAST(sum(CASE WHEN r2.r < q.quota * 1000000 // q.n
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
                FROM rws r2 JOIN q ON r2.split = q.split
                  AND r2.label = q.label
                GROUP BY 1, 2)""")
    ),

    // ── MinHash-LSH BANDING PLANNER (exact S-curves) ──────────────────────
    QueryDef(
      "q475_lsh_banding_planner",
      // The planning table behind every LSH deployment decision (q38's
      // banding included): for candidate configs (bands b × rows r) at
      // equal signature budget b·r = 32, the detection probability
      // p = 1 − (1 − s^r)^b over the Jaccard grid s = k/10. Computed
      // EXACTLY: with s = k/10, p·10⁶ floors to
      // 10⁶ − (10^r − k^r)^b div 10^26 (since (10^r)^b = 10^32) — a
      // pure ≥64-bit integer pipeline (DECIMAL(38,0) squaring chain
      // here, HUGEINT in DuckDB; a double pow() loses the low digits
      // at 10^32 and the two engines would round differently). The
      // output is the S-curve table an operator reads to pick the
      // config whose threshold sits at the dedup τ.
      //
      // Shape, and why it scales: 27 literal rows of model-sized math —
      // the planner is corpus-free by construction; the corpus enters
      // only through the τ the operator brings.
      (s, d) => {
        import s.implicits._
        def leg(b: Int, r: Int): DataFrame = {
          val ks = (1L to 9L).toDF("s_tenths")
          val kr = expr(Seq.fill(r)("s_tenths").mkString(" * "))
          val pow10r = math.pow(10, r).toLong
          var m: Column = (lit(pow10r) - kr).cast("decimal(38,0)")
          // base^b by repeated squaring: b ∈ {4,8,16} = 2^{2,3,4}
          val sq = (math.log(b) / math.log(2)).round.toInt
          for (_ <- 1 to sq) m = (m * m).cast("decimal(38,0)")
          ks.withColumn("miss", m)
            .select(lit(b.toLong).as("n_bands"),
              lit(r.toLong).as("rows_per_band"), col("s_tenths"),
              (lit(1000000L) - expr("""CAST(miss div
                CAST('100000000000000000000000000' AS DECIMAL(38,0))
                AS BIGINT)""")).as("detect_ppm"))
        }
        leg(4, 8).unionAll(leg(8, 4)).unionAll(leg(16, 2))
      },
      Some("""WITH ks AS (SELECT CAST(range + 1 AS BIGINT) AS s_tenths
                FROM range(9)),
              l1 AS (SELECT CAST(4 AS BIGINT) AS n_bands,
                CAST(8 AS BIGINT) AS rows_per_band, s_tenths,
                CAST(100000000 - s_tenths*s_tenths*s_tenths*s_tenths
                  *s_tenths*s_tenths*s_tenths*s_tenths AS HUGEINT) AS base
              FROM ks),
              m1 AS (SELECT n_bands, rows_per_band, s_tenths,
                (base*base)*(base*base) AS miss FROM l1),
              l2 AS (SELECT CAST(8 AS BIGINT) AS n_bands,
                CAST(4 AS BIGINT) AS rows_per_band, s_tenths,
                CAST(10000 - s_tenths*s_tenths*s_tenths*s_tenths
                  AS HUGEINT) AS base
              FROM ks),
              m2 AS (SELECT n_bands, rows_per_band, s_tenths,
                ((base*base)*(base*base))*((base*base)*(base*base)) AS miss
              FROM l2),
              l3 AS (SELECT CAST(16 AS BIGINT) AS n_bands,
                CAST(2 AS BIGINT) AS rows_per_band, s_tenths,
                CAST(100 - s_tenths*s_tenths AS HUGEINT) AS base FROM ks),
              m3 AS (SELECT n_bands, rows_per_band, s_tenths,
                (((base*base)*(base*base))*((base*base)*(base*base)))
                  *(((base*base)*(base*base))*((base*base)*(base*base)))
                  AS miss
              FROM l3),
              u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
                UNION ALL SELECT * FROM m3)
              SELECT n_bands, rows_per_band, s_tenths,
                CAST(1000000 - miss
                  // CAST('100000000000000000000000000' AS HUGEINT)
                  AS BIGINT) AS detect_ppm
              FROM u""")
    ),

    // ── HNSW RECALL-vs-BEAM-WIDTH CURVE ───────────────────────────────────
    QueryDef(
      "q476_hnsw_recall_curve",
      // q450 gave IVF its nprobe tuning curve; this is the same surface
      // for the q462 hierarchical searcher: recall@3 vs BASE beam width
      // W ∈ {2, 4, 8} with the upper-layer descent held fixed (top-64
      // tier, W=4, entry at the 4 global hubs, each query descending at
      // its top-2 upper hits). The W=8 leg is exactly q462's
      // configuration, so the curve calibrates against the shipped
      // default. The table an operator reads to trade serve latency
      // (beam width bounds per-hop scoring) against recall.
      //
      // Shape, and why it scales: the three legs SHARE one upper
      // descent and one brute table (checkpointed); every beam is
      // probe×W-bounded; scoring streams the corpus past a broadcast
      // frontier (beamScore — no corpus shuffle, no corpus broadcast);
      // per-round checkpoints bound lineage.
      //
      // Oracle note: this is the suite's deepest CTE unroll (three beam
      // legs × 2 rounds each over a shared graph), so the SQL goes
      // through Shared.materializeCtes — without it DuckDB re-inlines
      // the shared CTEs at every reference and the expression tree
      // spills tens of GB (the r13 oracle-side OOM).
      (s, d) => Shared.withCheckpointDir(s) {
        val graph = R12Queries.knnGraphMemoized(s, d)
        // the upper descent and the brute denominator come from the
        // shared scratch memos (identical stages in q462 — built once)
        val (_, _, ent) = R13Queries.hnswUpper(s, d)
        val entry = ent.checkpoint()
        val brute = R13Queries.bruteTop3(s, d)
        val legs = Seq(2, 4, 8).map { w =>
          var bb = entry
          for (_ <- 1 to 2) bb = R13Queries.beamRound(s, d, bb, graph, w)
          val ans = R13Queries.top(bb, 3).select("qid", "cid")
          (w.toLong,
            ans.join(brute, Seq("qid", "cid"), "left_semi").count(), 15L)
        }
        import s.implicits._
        legs.toDF("base_w", "n_hits", "n_possible")
      },
      Some(Shared.materializeCtes(s"""WITH $SQL_KNN_GRAPH_CTES,
              $SQL_ENTRIES_CTE,
              degt AS (SELECT src, count(*) AS dg FROM graph GROUP BY src),
              upper_nodes AS (SELECT src AS n FROM (
                  SELECT src, dg FROM degt
                  ORDER BY dg DESC, src LIMIT ${R13Queries.UpperK})),
              upper_edges AS (SELECT g.src, g.dst FROM graph g
                JOIN upper_nodes a ON g.src = a.n
                JOIN upper_nodes b ON g.dst = b.n),
              u0 AS (SELECT qid, cid, cos FROM (
                  SELECT qid, cid, cos, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                  FROM (SELECT q.qid, e.cid,
                      ${SQL_COS("q.qv", "c.cv")} AS cos
                    FROM q CROSS JOIN entries e JOIN c ON e.cid = c.cid))
                WHERE rk <= 4),
              ${R13Queries.sqlBeamRound("u0", "u1", "upper_edges", 4)},
              ${R13Queries.sqlBeamRound("u1", "u2", "upper_edges", 4)},
              ent AS (SELECT qid, cid, cos FROM (
                  SELECT qid, cid, cos, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                  FROM u2) WHERE rk <= 2),
              ${R13Queries.sqlBeamRound("ent", "w2a", "graph", 2)},
              ${R13Queries.sqlBeamRound("w2a", "w2b", "graph", 2)},
              ${R13Queries.sqlBeamRound("ent", "w4a", "graph", 4)},
              ${R13Queries.sqlBeamRound("w4a", "w4b", "graph", 4)},
              ${R13Queries.sqlBeamRound("ent", "w8a", "graph", 8)},
              ${R13Queries.sqlBeamRound("w8a", "w8b", "graph", 8)},
              brute AS (SELECT qid, cid FROM (
                  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
                    ORDER BY ${SQL_COS("qv", "cv")} DESC, c.cid) AS rk
                  FROM q CROSS JOIN c) WHERE rk <= 3),
              a2 AS (SELECT qid, cid FROM (
                  SELECT qid, cid, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                  FROM w2b) WHERE rk <= 3),
              a4 AS (SELECT qid, cid FROM (
                  SELECT qid, cid, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                  FROM w4b) WHERE rk <= 3),
              a8 AS (SELECT qid, cid FROM (
                  SELECT qid, cid, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS rk
                  FROM w8b) WHERE rk <= 3)
              SELECT CAST(2 AS BIGINT) AS base_w,
                CAST((SELECT count(*) FROM a2 JOIN brute USING (qid, cid))
                  AS BIGINT) AS n_hits,
                CAST(15 AS BIGINT) AS n_possible
              UNION ALL
              SELECT CAST(4 AS BIGINT),
                CAST((SELECT count(*) FROM a4 JOIN brute USING (qid, cid))
                  AS BIGINT), CAST(15 AS BIGINT)
              UNION ALL
              SELECT CAST(8 AS BIGINT),
                CAST((SELECT count(*) FROM a8 JOIN brute USING (qid, cid))
                  AS BIGINT), CAST(15 AS BIGINT)"""))
    ),

    // ── RE-SPLIT MIGRATION MATRIX ─────────────────────────────────────────
    QueryDef(
      "q477_resplit_migration",
      // The audit run before changing split GRANULARITY (percent grain
      // → permille grain, e.g. to carve sub-percent calibration sets):
      // both rules hash the same domain (h32('split'‖doc_id)), old =
      // mod-100 banding (80/10/10), new = mod-1000 banding
      // (800/100/100) — same ratios, finer boundaries, so a band of
      // documents MIGRATES (e.g. h mod 1000 ∈ [800,900) with
      // h mod 100 < 80: train → valid). The (old × new) confusion
      // matrix with each cell's share of its old split — the exact
      // cost sheet of the re-split (every train→eval migration is a
      // document whose eval signal is now contaminated-by-history and
      // must be dropped or quarantined).
      //
      // Shape, and why it scales: one documents pass to the ≤9-cell
      // matrix grain; old-split totals are an aggregation OF that
      // grain joined back on it.
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(h32(concat(lit("split"), col("doc_id").cast("string")))
            .as("h"))
          .select(
            when(col("h") % 100L < 80L, "train")
              .when(col("h") % 100L < 90L, "valid").otherwise("test")
              .as("old_split"),
            when(col("h") % 1000L < 800L, "train")
              .when(col("h") % 1000L < 900L, "valid").otherwise("test")
              .as("new_split"))
          .groupBy("old_split", "new_split").agg(count(lit(1)).as("n_docs"))
        val ot = base.groupBy("old_split").agg(sum(col("n_docs")).as("ot"))
        base.join(ot, "old_split")
          .select(col("old_split"), col("new_split"), col("n_docs"),
            expr("n_docs * 1000000L div ot").as("row_ppm"),
            (col("old_split") =!= col("new_split")).as("migrated"))
      },
      Some(s"""WITH b AS (SELECT
                CASE WHEN h % 100 < 80 THEN 'train'
                  WHEN h % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS old_split,
                CASE WHEN h % 1000 < 800 THEN 'train'
                  WHEN h % 1000 < 900 THEN 'valid'
                  ELSE 'test' END AS new_split,
                CAST(count(*) AS BIGINT) AS n_docs
              FROM (SELECT
                  ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")} AS h
                FROM documents) GROUP BY 1, 2),
              ot AS (SELECT old_split, CAST(sum(n_docs) AS BIGINT) AS ot
                FROM b GROUP BY 1)
              SELECT b.old_split, b.new_split, n_docs,
                CAST(n_docs * 1000000 // ot AS BIGINT) AS row_ppm,
                b.old_split <> b.new_split AS migrated
              FROM b JOIN ot ON b.old_split = ot.old_split""")
    )
  )
}
