package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import R12Queries.{SQL_COS, SQL_DOT, SQL_KNN_GRAPH_CTES, SQL_QSEEDS_CTES}

/** Round-12 batch 3: ANN INDEX MAINTENANCE — the audits and incremental
  * paths a serving fleet runs continuously around the structures the
  * suite already builds: IVF bucket rebalance flags, the recall-vs-cost
  * multi-probe curve, the k-NN graph's structural health (degree bounds,
  * reachability from the entry points), incremental vector attach into
  * the frozen graph, and the LSH router's bucket-balance report.
  *
  * Every audit reads the SAME structure the serve path uses (shared CTE
  * text / shared builders), so what is audited is exactly what serves.
  */
object R12cQueries {

  val all: Seq[QueryDef] = Seq(

    // ── IVF BUCKET REBALANCE AUDIT ────────────────────────────────────────
    QueryDef(
      "q449_ivf_rebalance_audit",
      // The maintenance signal every IVF deployment watches: per-bucket
      // population vs the balanced share. A bucket over 2× the mean
      // needs a SPLIT (its scans cost double the design point); one
      // under half the mean is a MERGE candidate (probe overhead with
      // no selectivity payoff). Flags are exact integer
      // cross-multiplications against the declared bucket count — no
      // division, no doubles.
      //
      // Shape, and why it scales: the assignment is q44's broadcast
      // argmax (corpus-sized scan, centroids broadcast); the audit
      // itself is one aggregation to ≤K rows.
      (s, d) => {
        val per = SimilarityQueries.ivfCorpusAssign(s, d)
          .groupBy("cent_id").agg(count(lit(1)).as("n_vecs"))
        val tot = per.agg(sum(col("n_vecs")).as("tv"),
          count(lit(1)).as("nb"))
        per.crossJoin(broadcast(tot))
          .select(col("cent_id"), col("n_vecs"),
            expr("n_vecs * 1000000L div tv").as("share_ppm"),
            (col("n_vecs") * col("nb") > col("tv") * 2L).as("needs_split"),
            (col("n_vecs") * col("nb") * 2L < col("tv")).as("needs_merge"))
      },
      Some(s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS centv
                FROM embeddings WHERE vec_id < 8),
              corpus AS (SELECT vec_id AS cid, embedding AS cv
                FROM embeddings WHERE vec_id >= 13),
              corpus_a AS (SELECT cid, cent_id FROM (
                  SELECT cid, cent_id,
                    row_number() OVER (PARTITION BY cid
                      ORDER BY ${SQL_DOT("cv", "centv")} DESC, cent_id) AS rk
                  FROM corpus, cent) WHERE rk = 1),
              per AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vecs
                FROM corpus_a GROUP BY 1),
              tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS tv,
                  CAST(count(*) AS BIGINT) AS nb FROM per)
              SELECT cent_id, n_vecs,
                CAST(n_vecs * 1000000 // tv AS BIGINT) AS share_ppm,
                n_vecs * nb > tv * 2 AS needs_split,
                n_vecs * nb * 2 < tv AS needs_merge
              FROM per, tot""")
    ),

    // ── MULTI-PROBE RECALL-vs-COST CURVE ──────────────────────────────────
    QueryDef(
      "q450_ann_probe_recall_curve",
      // The operating curve an ANN deployment tunes on: for nprobe ∈
      // {1, 2, 4}, the candidate count actually scanned (cost) next to
      // recall@3 hits against exact search (value). Probing more
      // buckets can only ADD candidates and the re-rank is exact within
      // the candidate set, so both columns are monotone in nprobe (the
      // spec asserts it; the oracle pins the exact points). Reuses the
      // q151 multiprobe machinery and the q276 brute denominator
      // verbatim.
      //
      // Shape, and why it scales: per point, the probe panel broadcasts
      // and ~nprobe/K of the corpus is scanned; hits and costs are
      // scalar aggregates.
      (s, d) => {
        val brute = SimilarityQueries.exactTop3(s, d).select("qid", "cid")
        def rowFor(np: Int): DataFrame = {
          val cands = broadcast(SimilarityQueries.ivfQueryProbes(s, d, np))
            .join(SimilarityQueries.ivfCorpusAssign(s, d), "cent_id")
          val hits = SimilarityQueries.ivfMultiprobe(s, d, np)
            .select("qid", "cid")
            .join(brute, Seq("qid", "cid"), "left_semi")
          cands.agg(count(lit(1)).as("n_candidates"))
            .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
            .select(lit(np.toLong).as("nprobe"), col("n_candidates"),
              col("n_hits"), lit(15L).as("n_possible"))
        }
        rowFor(1).unionAll(rowFor(2)).unionAll(rowFor(4))
      },
      Some {
        val pts = Seq(1, 2, 4)
        val per = pts.map { np =>
          s"""q_a$np AS (SELECT qid, qv, cent_id FROM (
                SELECT qid, qv, cent_id,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY ${SQL_DOT("qv", "centv")} DESC, cent_id) AS rk
                FROM qs, cent) WHERE rk <= $np),
              cd$np AS (SELECT q_a$np.qid, corpus_a.cid, qv, cv
                FROM q_a$np JOIN corpus_a USING (cent_id)),
              nc$np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cd$np),
              top$np AS (SELECT qid, cid FROM (
                  SELECT qid, cid, row_number() OVER (PARTITION BY qid
                    ORDER BY ${SQL_COS("qv", "cv")} DESC, cid) AS rk
                  FROM cd$np) WHERE rk <= 3),
              ht$np AS (SELECT CAST(count(*) AS BIGINT) AS n
                FROM top$np JOIN brute USING (qid, cid))"""
        }.mkString(",\n")
        val rows = pts.map(np =>
          s"""SELECT CAST($np AS BIGINT) AS nprobe,
              (SELECT n FROM nc$np) AS n_candidates,
              (SELECT n FROM ht$np) AS n_hits,
              CAST(15 AS BIGINT) AS n_possible""")
          .mkString("\nUNION ALL ")
        s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS centv
              FROM embeddings WHERE vec_id < 8),
            corpus AS (SELECT vec_id AS cid, embedding AS cv
              FROM embeddings WHERE vec_id >= 13),
            qs AS (SELECT vec_id AS qid, embedding AS qv
              FROM embeddings WHERE vec_id BETWEEN 8 AND 12),
            corpus_a AS (SELECT cid, cv, cent_id FROM (
                SELECT cid, cv, cent_id,
                  row_number() OVER (PARTITION BY cid
                    ORDER BY ${SQL_DOT("cv", "centv")} DESC, cent_id) AS rk
                FROM corpus, cent) WHERE rk = 1),
            brute AS (SELECT qid, cid FROM (
                SELECT qs.qid, corpus.cid,
                  row_number() OVER (PARTITION BY qs.qid
                    ORDER BY ${SQL_COS("qv", "cv")} DESC, cid) AS rk
                FROM qs CROSS JOIN corpus) WHERE rk <= 3),
            $per
            $rows"""
      }
    ),

    // ── k-NN GRAPH STRUCTURAL AUDIT ───────────────────────────────────────
    QueryDef(
      "q451_knn_graph_audit",
      // The health report for q439's serve structure: node/edge counts,
      // the max degree (symmetrization can concentrate in-edges on
      // hubs — the number that bounds per-hop serve cost), isolated
      // corpus vectors (unreachable by ANY graph walk — they need the
      // router fallback), and the frontier growth from the DATA-derived
      // entry points (the 4 max-degree hubs q439 actually seeds from)
      // over 3 BFS rounds (the reachability the beam search actually
      // has). Counts are the q145/q263 scalar-probe pattern.
      //
      // Shape, and why it scales: the graph is edge-list-sized and
      // checkpointed once; each BFS round is one keyed join + distinct
      // on the (bounded) reached set.
      (s, d) => Shared.withCheckpointDir(s) {
        val g = R12Queries.knnGraphMemoized(s, d) // scratch-backed memo
        val nEdges = g.count()
        val nNodes = g.select("src").distinct().count()
        val maxDeg = g.groupBy("src").agg(count(lit(1)).as("dg"))
          .agg(max(col("dg"))).head.getLong(0)
        val nCorpus = R12Queries.corpusVecs(s, d).count()
        // entry points derive from the graph itself (max-degree hubs) —
        // they are graph nodes by construction, so the BFS starts exactly
        // where q439's beam does; checkpointed to sever the self-join
        // lineage against g
        var reach = R12Queries.entryPoints(g)
          .select(col("cid").as("n")).checkpoint()
        val sizes = scala.collection.mutable.ArrayBuffer(reach.count())
        for (_ <- 1 to 3) {
          reach = reach.unionAll(
              reach.join(g, reach("n") === g("src"))
                .select(col("dst").as("n")))
            .distinct().checkpoint()
          sizes += reach.count()
        }
        import s.implicits._
        Seq((nNodes, nEdges, maxDeg, nCorpus - nNodes,
          sizes(0), sizes(1), sizes(2), sizes(3)))
          .toDF("n_nodes", "n_edges", "max_degree", "n_isolated",
            "reach_0", "reach_1", "reach_2", "reach_3")
      },
      Some(Shared.materializeCtes(s"""WITH $SQL_KNN_GRAPH_CTES,
              ${R12Queries.SQL_ENTRIES_CTE},
              r0 AS (SELECT cid AS n FROM entries),
              ${(1 to 3).map(r =>
                s"""r$r AS (SELECT DISTINCT n FROM (
                  SELECT n FROM r${r - 1}
                  UNION ALL SELECT g.dst FROM r${r - 1} p
                    JOIN graph g ON p.n = g.src))""").mkString(",\n")}
              SELECT
                CAST((SELECT count(DISTINCT src) FROM graph) AS BIGINT)
                  AS n_nodes,
                CAST((SELECT count(*) FROM graph) AS BIGINT) AS n_edges,
                CAST((SELECT max(dg) FROM (SELECT count(*) AS dg
                  FROM graph GROUP BY src)) AS BIGINT) AS max_degree,
                CAST((SELECT count(*) FROM c)
                  - (SELECT count(DISTINCT src) FROM graph) AS BIGINT)
                  AS n_isolated,
                CAST((SELECT count(*) FROM r0) AS BIGINT) AS reach_0,
                CAST((SELECT count(*) FROM r1) AS BIGINT) AS reach_1,
                CAST((SELECT count(*) FROM r2) AS BIGINT) AS reach_2,
                CAST((SELECT count(*) FROM r3) AS BIGINT) AS reach_3"""))
    ),

    // ── INCREMENTAL GRAPH ATTACH (frozen graph, arriving vectors) ─────────
    QueryDef(
      "q452_knn_graph_append",
      // The q198 frozen-structure append discipline for the graph
      // family: new vectors (the probe split plays the arrivals) attach
      // WITHOUT rebuilding — each routes through its LSH band buckets,
      // scores its bucket mates exactly, and keeps its top-6 as new
      // edges; existing edges never move. Per arrival: candidate count,
      // edges attached, and the top-1 anchor. A vector whose buckets
      // are empty attaches nowhere (0 rows, NULL anchor — visible on
      // the arrival spine, the honest signal the router fallback must
      // handle).
      //
      // Shape, and why it scales: routing is the keyed (band, key)
      // equi-join; scoring touches only bucket mates (cap-bounded per
      // band); the output is arrival-grain.
      (s, d) => {
        val c = R12Queries.corpusVecs(s, d)
        val q = R12Queries.probeVecs(s, d)
        val qkeys = R12Queries.probeBandKeys(s, d)
        val candIds = qkeys
          .join(R12Queries.bandedCorpusKeys(s, d), Seq("band", "bk"))
          .select("qid", "cid").distinct()
        // plain keyed equi-joins (r12 verdict task 1): the corpus never
        // broadcasts — candidate ids are arrival-batch-bounded and AQE
        // broadcasts whichever side is actually small at runtime
        val ranked = candIds
          .join(c, "cid")
          .join(q, "qid")
          .select(col("qid"), col("cid"),
            R12Queries.cosCol(col("qv"), col("cv")).as("cos"))
          .withColumn("rk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid").asc)))
        val ag = ranked.groupBy("qid").agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("rk") <= R12Queries.KnnM, 1L).otherwise(0L))
            .as("n_attached"),
          min(when(col("rk") === 1, col("cid"))).as("top1_cid"))
        q.select("qid").join(ag, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_attached"), lit(0L)).as("n_attached"),
            col("top1_cid"))
      },
      Some(Shared.materializeCtes(s"""WITH $SQL_KNN_GRAPH_CTES,
              $SQL_QSEEDS_CTES,
              candi AS (SELECT DISTINCT qk.qid, k.cid FROM qkeys qk
                JOIN kcap k ON qk.band = k.band AND qk.bk = k.bk),
              sc AS (SELECT qid, cid,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, cid) AS rk
                FROM (SELECT candi.qid, candi.cid,
                    ${SQL_COS("q.qv", "c.cv")} AS cos
                  FROM candi JOIN q ON candi.qid = q.qid
                    JOIN c ON candi.cid = c.cid)),
              ag AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_candidates,
                  CAST(sum(CASE WHEN rk <= ${R12Queries.KnnM}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_attached,
                  min(CASE WHEN rk = 1 THEN cid END) AS top1_cid
                FROM sc GROUP BY 1)
              SELECT q.qid, coalesce(n_candidates, 0) AS n_candidates,
                coalesce(n_attached, 0) AS n_attached, top1_cid
              FROM q LEFT JOIN ag ON q.qid = ag.qid"""))
    ),

    // ── LSH ROUTER BALANCE REPORT ─────────────────────────────────────────
    QueryDef(
      "q453_lsh_router_balance",
      // The router's capacity report: per band, how evenly do the 2⁶
      // sign-buckets split the corpus? Bucket count, population, the
      // largest bucket (the hot shard a cap must bound), and the exact
      // in-bucket pair mass Σ n·(n−1)/2 — the candidate-generation cost
      // the build actually pays per band. Uncapped stream audited; the
      // build's cap is the mitigation this report sizes.
      //
      // Shape, and why it scales: one pass over the (corpus × bands)
      // key stream, two nested aggregations to ≤NBands rows.
      (s, d) =>
        R12Queries.bandedCorpusKeysRaw(s, d)
          .groupBy("band", "bk").agg(count(lit(1)).as("n"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("n")).as("n_vecs"),
            max(col("n")).as("max_bucket"),
            sum(expr("n * (n - 1L) div 2L")).as("pair_mass"))
          .select(col("band").cast("long").as("band"), col("n_buckets"),
            col("n_vecs"), col("max_bucket"), col("pair_mass")),
      Some(s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv
                FROM embeddings WHERE vec_id >= 5),
              keyed AS (${(0 until R12Queries.NBands).map(b =>
                s"SELECT cid, $b AS band, ${R12Queries.SQL_BAND_KEY("cv", b)} AS bk FROM c")
                .mkString("\nUNION ALL ")}),
              per AS (SELECT band, bk, CAST(count(*) AS BIGINT) AS n
                FROM keyed GROUP BY 1, 2)
              SELECT CAST(band AS BIGINT) AS band,
                CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(sum(n) AS BIGINT) AS n_vecs,
                CAST(max(n) AS BIGINT) AS max_bucket,
                CAST(sum(n * (n - 1) // 2) AS BIGINT) AS pair_mass
              FROM per GROUP BY 1""")
    )
  )
}
