package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries viable
  * at 100 TB are checked structurally, not just by result correctness
  * (SURVEY.md §5.3 — "assert via plan/metrics tests, not just results").
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: range predicate is pushed down to the parquet scan") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,300)]"), p)
  }

  test("q23 (TPC-H Q6): scan reads only the four needed columns") {
    val p = plan("q23_tpch_q6")
    val m = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
    assert(m.isDefined, p)
    val cols = m.get.group(1).split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"unexpected scan columns: $cols")
  }

  test("q09: dimension joins execute as broadcast hash joins (no shuffle)") {
    val p = plan("q09_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q04 (TPC-H Q1): aggregation is partial+final (map-side combine)") {
    val p = plan("q04_tpch_q1")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("q12/q13: semi/anti joins plan as real semi/anti joins") {
    assert(plan("q12_semijoin").contains("LeftSemi"), "q12")
    assert(plan("q13_antijoin").contains("LeftAnti"), "q13")
  }

  test("q38 (MinHash-LSH): candidate generation never cross-joins") {
    val p = plan("q38_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38 (MinHash-LSH): signature subtree executes exactly once — no joins at all") {
    // the flagship 100 TB dedup path must not rely on Catalyst deciding to
    // reuse a shared exchange: the shingle→minhash pipeline has one
    // consumer BY CONSTRUCTION (shingles ride through the band
    // aggregation), so the executed plan scans documents once and contains
    // zero join operators of any kind
    val df = SparkEntry.queries("q38_minhash_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"q38 must scan documents exactly once:\n$p")
    assert(!p.contains("Join"), s"q38 must plan no joins:\n$p")
    // the bucket member list must be the HARD-bounded aggregate, not a
    // plain collect_list whose buffer materializes a hot key unbounded
    // before the size filter (r4 verdict task 2)
    assert(p.contains("collect_list_capped"),
      s"q38 bucket lists must use the capped collect:\n$p")
  }

  test("q89 (decontamination): the benchmark shingle set builds a broadcast semi join") {
    // the candidate side must stream (never shuffle its exploded shingles);
    // the held-out benchmark's distinct shingle set is the broadcast build
    val p = plan("q89_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"q89 semi join must be broadcast:\n$p")
  }

  test("winnow ladder: one documents scan, no joins — pure per-row pipeline") {
    // the hx → wh → fps expression ladder all winnow queries share
    // (materialized to scratch parquet by winnowFingerprints before any
    // consumer reads it — this asserts the MATERIALIZATION stage's shape)
    val df = operators.TextQueries.winnowLadder(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"winnow ladder must scan documents exactly once:\n$p")
    assert(!p.contains("Join"), s"winnow ladder must plan no joins:\n$p")
  }

  test("q152 (winnowing): reads the materialized fingerprints once, no joins") {
    val df = SparkEntry.queries("q152_winnow_fingerprint")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("graft_winnow".r.findAllIn(p).size >= 1 &&
      "Scan parquet".r.findAllIn(p).size == 1,
      s"q152 must read the winnow scratch exactly once:\n$p")
    assert(!p.contains("Join"), s"q152 must plan no joins:\n$p")
  }

  test("q154 (winnow pairs): reads the memoized pair table — one scratch scan, no joins") {
    // r9: the pair pipeline itself (explode → ONE capped agg → in-bucket
    // pair HOFs, no self-join — the q38 pattern) moved behind the
    // winnowPairs memo, so q154's own plan is a single scan of the pair
    // scratch; the pipeline shape is pinned by the BUILD lineage test
    // below, which the memo build executes exactly once per process
    val df = SparkEntry.queries("q154_winnow_pairs")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("graft_winnowpairs".r.findAllIn(p).size >= 1 &&
      "Scan parquet".r.findAllIn(p).size == 1,
      s"q154 must read the pair scratch exactly once:\n$p")
    assert(!p.contains("Join"), s"q154 must plan no joins:\n$p")
  }

  test("winnow pair BUILD lineage: one fingerprint-scratch scan, capped bucket agg, no joins") {
    // the memo build's plan (what the first payer executes once): reads
    // the winnow fingerprint scratch exactly once, uses the HARD-bounded
    // bucket aggregate (r4 verdict task 2), and plans no join operator
    val df = graft.operators.TextQueries.winnowPairsLineage(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("graft_winnow".r.findAllIn(p).size >= 1 &&
      "Scan parquet".r.findAllIn(p).size == 1,
      s"pair build must read the winnow scratch exactly once:\n$p")
    assert(!p.contains("Join"), s"pair build must plan no joins:\n$p")
    assert(p.contains("collect_list_capped"),
      s"pair build must use the capped collect:\n$p")
  }

  test("q151 (multi-probe IVF): probe join is a broadcast equi-join, corpus never shuffles") {
    // the probe fan-out lives in the small broadcast query table (one row
    // per (query, probed centroid)); the corpus side must stream through a
    // BroadcastHashJoin on cent_id — a sort-merge or shuffled-hash join
    // here would shuffle the whole corpus per query batch at 100 TB
    val p = plan("q151_ann_ivf_multiprobe")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q153 (bucketed layout): join + agg on the bucket key plan zero shuffles") {
    // the write-once-shuffle-never layout: both sides bucketed on the join
    // key, the aggregation grouped on it — the executed plan must contain
    // no shuffle exchange at all (broadcast exchanges are fine: the dim
    // side broadcasting is the point of a small build side)
    val df = SparkEntry.queries("q153_bucketed_colocated_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join/agg must not shuffle:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"bucketed join/agg must not shuffle:\n$p")
  }

  test("q29 (as-of join): single shuffle on the key, no range cross-join") {
    val p = plan("q29_asof_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one exchange feeds the window (hashpartitioning on user_id)
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("q108 (Q9 shape): every dimension joins broadcast, fact never shuffles pre-agg") {
    val p = plan("q108_tpch_q9_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q100 (gap-fill): all three window passes share one sort, no self-join") {
    val p = plan("q100_interp_gapfill")
    assert("\\bWindow\\b".r.findAllIn(p).size == 3, p)
    // same partition key + same ordering for forward and backward frames:
    // a single per-partition sort feeds every Window operator
    assert("\\bSort\\b".r.findAllIn(p).size <= 2, p)
  }

  test("q94 (RANGE frame): one shuffle on the partition key feeds the window") {
    val p = plan("q94_time_range_window")
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size >= 1, p)
    assert("\\bWindow\\b".r.findAllIn(p).size == 1, p)
  }

  test("q113 (global sort): range partitioning, never a single-partition sort") {
    val p = plan("q113_global_sort")
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("partsupp shapes: broadcast dims, real semi/anti joins (q132/q134/q135)") {
    // the synthesized-partsupp TPC-H shapes keep the fact side streaming:
    // dim reductions broadcast, exclusions are real anti joins, the
    // excess-stock chain prunes with a semi join BEFORE its aggregation
    val p132 = plan("q132_tpch_q2_mincost")
    assert("BroadcastHashJoin".r.findAllIn(p132).size >= 2, p132)
    assert(p132.contains("Window"), p132)
    val p134 = plan("q134_tpch_q16_suppcnt")
    assert(p134.contains("LeftAnti"), p134)
    val p135 = plan("q135_tpch_q20_excess")
    assert(p135.contains("LeftSemi"), p135)
  }

  test("no query plans an unintentional cartesian product") {
    // bounded all-pairs comparisons are deliberately cartesian; everything
    // else must join with keys
    val intentional = Set("q36_ngram_jaccard", "q39b_simhash_pairs",
      "q41_knn_brute", "q43_cosine_neardup", "q44_ann_ivf",
      "q182_hard_negatives" /* broadcast-brute query fan-out, like q41 */,
      "q57_tfidf" /* 1-row broadcast of the corpus size N */,
      "q76_kmeans_step" /* K=8 centroid broadcast against every vector */,
      "q80_edit_distance" /* bounded all-pairs, like q36/q39b/q43 */,
      "q89_contamination" /* cross join of two single-row aggregates */,
      "q95_bm25" /* 1-row broadcast of corpus stats (N, Σdl), like q57 */,
      "q125_tpch_q22_idlerich" /* 1-row global-average broadcast, like q89 */,
      "q151_ann_ivf_multiprobe" /* K=8 centroid broadcast, like q44 */,
      "q159_ann_ivf_trained" /* K≤8 learned-centroid broadcast, like q151 */,
      "q168_ann_ivf_partitioned" /* K=8 centroid broadcast (probe ranking), like q151 */,
      "q172_ann_ivf_trained_partitioned" /* K≤8 learned-centroid broadcast (probe ranking), like q168 */,
      "q189_ann_ivfpq" /* K=8 centroid broadcast (probe ranking), like q168 */,
      "q195_mmr_rerank" /* broadcast-brute candidate generation, like q41 */,
      "q198_ann_ivfpq_incremental" /* K=8 centroid broadcast (probe ranking), like q189 */,
      "q196_length_buckets" /* 14-row powers-table broadcast range join */,
      "q200_rag_context" /* 3-query broadcast onto the chunk stream, like q41 */,
      "q210_langid_trained" /* 5-row language-table broadcast fan-outs (model + floor) */,
      "q173_quality_classifier" /* 1-row trained-model broadcast, like q89 */,
      "q188_hashed_ngram_classifier" /* 1-row train-totals broadcast, like q173 */,
      "q202_score_deciles" /* rides nbScores' 1-row broadcast, like q188 */,
      "q201_dq_expectations" /* cross join of two single-row aggregates, like q89 */,
      "q175_bpe_apply" /* 1-row vocab-size broadcast onto a 1-row totals agg, like q89 */,
      "q178_mix_upsample" /* 1-row n_max broadcast onto the per-stratum counts, like q130 */,
      "q130_temperature_mix" /* 1-row weight-total broadcast, like q89 */,
      "q251_decay_attribution" /* 1-row credit-total broadcast, like q130 */,
      "q257_threshold_at_fpr" /* 1-row threshold broadcast, like q89 */,
      "q262_ks_test" /* 1-row totals + 1-row max broadcasts, like q130 */,
      "q276_ann_recall" /* broadcast-brute ground truth + K=8 centroid broadcast, like q41/q44 */,
      "q289_dpo_pairs" /* 1-row side-sum broadcasts, like q130 */,
      "q294_oov_curve" /* vocab²-bounded rank self-join (broadcast non-equi) */,
      "q295_kaplan_meier" /* 1-row model-array broadcast for the hazard fold */,
      "q299_wilson_ci" /* 1-row traffic-total broadcast, like q130 */,
      "q302_consistent_hashing" /* 128/144-row vnode-ring broadcasts */,
      "q305_hybrid_retrieval" /* 1-row query-vector broadcast, like q41 */,
      "q306_rrf_fusion" /* 50-candidate rank self-joins + 1-row query vector */,
      "q307_ndcg_eval" /* 10-row rank/ideal self-joins + 1-row query vector */,
      "q259_dataset_card" /* cross join of three single-row aggregates, like q201 */,
      "q252_embedding_outliers" /* K=8 centroid broadcast, like q44/q76 */,
      "q132_tpch_q2_mincost" /* 1-row |supplier| broadcast (partsupp synth) */,
      "q133_tpch_q11_value" /* 1-row broadcasts: |supplier| + the Q11 total */,
      "q134_tpch_q16_suppcnt" /* 1-row |supplier| broadcast (partsupp synth) */,
      "q135_tpch_q20_excess" /* 1-row |supplier| broadcast (partsupp synth) */,
      "q319_ewma_control" /* 1-row fold-model array broadcast, like q295 */,
      "q323_average_precision" /* broadcast-brute probe fan-out, like q41 */,
      "q324_t_closeness" /* 1-row min/max broadcast + 20-row bucket spine */,
      "q326_diff_in_diff" /* 1-row corpus-midpoint broadcast, like q89 */,
      "q327_shuffle_audit" /* 1-row collision-expectation broadcast, like q89 */,
      "q335_psi_drift" /* 1-row min/max + 1-row totals broadcasts, like q262 */,
      "q336_kendall_tau" /* cells²-bounded grid self-join + 1-row folds, like q294 */,
      "q343_target_encoding" /* 1-row prior broadcast, like q89 */,
      "q344_mann_kendall" /* calendar-bounded day² self-join + 1-row folds */,
      "q346_kruskal_wallis" /* 1-row totals + 1-row tie-sum broadcasts, like q130 */,
      "q347_logrank" /* 1-row cohort-size broadcasts onto the day grid */,
      "q348_cramers_v" /* 25×5 marginal×marginal grid + 1-row n broadcast */,
      "q355_jackknife_ratio" /* 1-row totals broadcast onto the 32-bucket grain, like q89 */,
      "q358_acf" /* 1-row (n, Σx) + 1-row denominator broadcasts onto the day grain */,
      "q361_brier" /* 1-row (n, ybar) totals broadcast onto the type grain, like q358 */,
      "q365_perm_test" /* 1-row observed-split broadcast onto the 64-row null-draw table */,
      "q368_ccf" /* 1-row moment + denominator broadcasts onto the day grain, like q358 */,
      "q375_quantile_norm" /* 10-row decile-target broadcast interval probe into the pooled CDF */,
      "q377_isotonic" /* 55-row interval grid on the 10-bin cumulative table, like q336 */,
      "q379_ljung_box" /* 1-row (n, Σx) + 1-row denominator broadcasts onto the day grain, like q358 */,
      "q380_durbin_watson" /* 1-row moment broadcasts onto the day grain, like q358 */,
      "q381_hits" /* 1-row normalization-total broadcast per half-round, like q130 */,
      "q382_modularity" /* cross join of three single-row aggregates, like q259 */,
      "q384_mrr" /* 10-row query-panel broadcast onto the embedding table, like q41 */,
      "q386_meta_analysis" /* 1-row pooled-effect broadcast onto the ≤25-row stratum table */,
      "q390_anderson_darling" /* 1-row totals broadcast onto the pooled-rank stream, like q262 */,
      "q392_cliffs_delta" /* 1-row totals broadcast onto the value grain, like q262 */,
      "q395_theil_atkinson" /* 1-row totals broadcast onto the customer grain, like q89 */,
      "q396_ancova" /* 1-row sums broadcast onto the fact for the moment pass, like q358 */,
      "q397_pacf" /* 1-row (n, Σx) + denominator broadcasts onto the day grain, like q358 */,
      "q398_energy_distance" /* 1-row totals broadcast onto the value grain, like q392 */,
      "q401_qte_deciles" /* 10-row decile spine onto the 2-row arm table, like q375 */,
      "q402_cluster_split" /* cross join of two single-row aggregates, like q89 */,
      "q403_runs_test" /* 1-row run-boundary count broadcast, like q89 */,
      "q406_rbo" /* 1-row query-vector broadcast, like q305 */,
      "q408_exposure_share" /* 10-row query-panel broadcast + 1-row totals, like q384 */,
      "q409_chow_test" /* 1-row sums + two 1-row half-total broadcasts onto the day grain */,
      "q410_mutual_information" /* 1-row total broadcast onto the bounded grid, like q348 */,
      "q411_component_census" /* cross join of two single-row aggregates, like q89 */,
      "q413_weekday_anova" /* 1-row Σx² broadcast onto the 1-row weekday fold, like q89 */,
      "q414_vocab_coverage" /* 1-row totals broadcast onto the 3-row coverage table */,
      "q416_rmst" /* 1-row model-array broadcast for the KM fold, like q295 */,
      "q417_mase" /* cross join of two single-row MAE aggregates, like q89 */,
      "q419_isotropy" /* 1-row top-dim broadcast onto the 1-row variance fold */,
      "q424_decision_stump" /* 1-row totals broadcast onto the 64-row histogram, like q389 */,
      "q427_sax_motifs" /* 1-row moments + motif-total broadcasts onto the day grain, like q358 */,
      "q429_diversity_indices" /* 1-row corpus-total broadcast onto the source grain, like q89 */,
      "q434_emd_1d" /* 1-row totals broadcast onto the value grain, like q392 */,
      "q435_keyness" /* 1-row row-totals broadcast onto the token grain, like q89 */,
      "q436_leakage_screen" /* 1-row sums broadcast onto the fact moment pass, like q396 */,
      "q437_james_stein" /* 1-row fold broadcasts onto the ≤25-row stratum table, like q386 */,
      "q438_dedup_capture_recapture" /* cross join of three single-row pair counts, like q259 */,
      "q439_ann_knn_graph" /* 5-row probe-panel broadcast for the brute recall denominator, like q41; the build/serve path itself is keyed (Round12OpsSpec pins it) */,
      "q443_temperature_mix" /* 1-row totals broadcast onto the source panel, like q89 */,
      "q445_doremi_lite" /* 1-row totals broadcast per MW round onto the source panel, like q304 */,
      "q446_token_budget_allocation" /* 1-row totals + water-level broadcasts onto the source panel */,
      "q448_mix_kl_drift" /* 1-row totals broadcast onto the source panel, like q443 */,
      "q449_ivf_rebalance_audit" /* 1-row totals broadcast onto the <=K bucket table, like q89 */,
      "q450_ann_probe_recall_curve" /* cross joins of single-row cost/hit aggregates per nprobe point, like q259 */,
      "q451_knn_graph_audit" /* 1-row scalar-probe literal select (q145's pattern) */,
      "q456_benford" /* 1-row total broadcast onto the 9-row digit grain, like q89 */,
      "q462_hnsw_two_layer" /* 4-row hub panel + 5-row probe broadcast for seeds/brute, like q439 */,
      "q494_hnsw_three_layer" /* 4-row hub panel + 5-row probe broadcast for seeds/brute, like q462 */,
      "q497_hnsw_tier_planner" /* 3-row corpus-size grid × 20-row tier spine of literal planner math, like q475 */,
      "q498_hnsw_level_insert" /* 8-row and 64-row tier-panel broadcasts scored against keyed corpus vectors, like q462's hub panel */,
      "q463_ann_tombstone_serve" /* 4-row hub-panel fallback broadcast, like q439's seeds */,
      "q499_hnsw_tombstone_repair" /* 4-row hub panels (old + repaired graph) + 5-row probe broadcast for seeds/brute, like q463/q462 */,
      "q503_hnsw_rebuild_serve" /* 4-row rebuilt-graph hub panel + 5-row probe broadcast for seeds/brute, like q499 */,
      "q504_ann_churn_loop" /* 4-row hub panel + 5-row probe broadcast for the maintained serve's seeds, like q499/q503 */,
      "q464_embedding_qa" /* cross join of two single-row aggregates, like q89 */,
      "q466_doc_length_drift" /* 1-row grand total broadcast onto the bounded source×bucket grid, like q410 */,
      "q467_write_shard_plan" /* 1-row plan row broadcast onto the doc scan + shard grain, like q449 */,
      "q468_knn_label_vote" /* 5-row probe-panel broadcast × streamed corpus, like q41 */,
      "q472_split_label_balance" /* 1-row grand total broadcast onto the bounded split×label contingency grain, like q410 */,
      "q478_effective_budget_allocation" /* 1-row totals + water-level broadcasts onto the source panel, like q446 */,
      "q479_neardup_split_leakage" /* cross join of two single-row aggregates, like q89 */,
      "q480_knn_shapley" /* 5-row probe-panel broadcast × streamed corpus, like q41/q468 */,
      "q481_selective_risk" /* 5-row probe panel + 5-row threshold spine + 1-row total broadcasts, like q468/q408 */,
      "q482_shapley_prune_eval" /* 3+2-row probe panels broadcast × streamed corpus + 1-row corpus-count attaches, like q41/q468/q480 */,
      "q483_conformal_prediction" /* 50-row panel broadcast × streamed corpus + 10-row label spine + 1-row n_cal attach, like q468/q481 */,
      "q484_jl_distortion_audit" /* 64-row audit-panel self-pairs (bounded-subset regime, like q43) + 1-row mean attach */,
      "q486_vote_calibration_ece" /* 50-row probe-panel broadcast × streamed corpus + 1-row ECE attach, like q468 */,
      "q488_hubness_audit" /* 1-row panel-count attach onto the ≤K·panel distribution grain, like q89 */,
      "q490_conformal_gated_serve" /* the q483 conformal pipeline (50-row panel broadcast, spine + 1-row attaches) + a 1-row policy-totals attach */,
      "q492_spreading_seed_curve" /* 3-row boundary spine crossed onto the model-sized panel grain, like q481's threshold spine */,
      "q493_hub_ablation_robustness" /* 1-row census aggregates cross-joined per variant (nodes/edges/components/isolated), like q464/q411 */)
    val offenders = SparkEntry.defs
      .filterNot(q => intentional(q.name))
      .flatMap { q =>
        val p = q.fn(spark, sf).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty, s"unexpected cartesian/NLJ in: $offenders")
  }

  test("q212 (prefix-filter join): reads the memoized pair table — one scratch scan, no joins") {
    // the verified pair stream materializes once per process (jpairs memo
    // — four consumers: q212/q217/q219/q224), so q212's own plan is a
    // single scan of the pair scratch plus projection; the prefix-filter
    // pipeline shape runs exactly once inside the memo build
    val df = SparkEntry.queries("q212_jaccard_prefix_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("graft_jpairs".r.findAllIn(p).size >= 1 &&
      "Scan parquet".r.findAllIn(p).size == 1,
      s"q212 must read the pair scratch exactly once:\n$p")
    assert(!p.contains("Join"), s"q212 must plan no joins:\n$p")
  }

  test("q163 (substring spans): memoized starts scratch + semi join, no all-pairs") {
    val p = plan("q163_exact_substr_spans")
    // r8: the (doc_id, p, h) start table materializes ONCE to scratch
    // parquet (substrStarts — shared with q170), so the query plan reads
    // fixed-width scratch, never re-tokenizes documents; the xxhash64
    // shingle hashing lives in the one-time memo-write job. Duplicated-
    // shingle discovery still groups/joins on the 64-bit hash column, and
    // no pairwise stage exists anywhere.
    assert(p.contains("LeftSemi"), p)
    assert("graft_substr".r.findAllIn(p).nonEmpty,
      s"q163 must read the memoized starts scratch:\n$p")
    assert("documents\\.parquet".r.findAllIn(p).isEmpty,
      s"q163 must not re-scan documents:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q164 (bloom dedup): probe runs in the scan pipeline, confirm join is keyed") {
    val p = plan("q164_bloom_snapshot_dedup")
    // the might_contain routing predicate must be IN the plan (codegen
    // expression over the broadcast-literal filter), and the confirm join
    // must be an equi join on the normalized key
    assert(p.contains("might_contain"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q165 (representative election): cluster labels broadcast, one bounded window") {
    val p = plan("q165_dedup_select")
    // the label table is pair-graph-sized → must join to documents as a
    // broadcast, and the election is a single window (partitioned by comp,
    // never a global sort)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q166 (curation pipeline): the whole funnel reads documents ONCE") {
    // stage flags on one lineage — separate per-stage aggregates would
    // re-scan the corpus once per stage (5× reads at 100 TB)
    val p = plan("q166_curation_pipeline")
    val scans = "documents\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"documents scanned $scans times:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q300 (release funnel): the whole funnel reads documents ONCE") {
    // r11 verdict finding 1: the old form ran five driver actions, each
    // re-executing the upstream funnel — stage flags + one conditional
    // aggregation (q166's discipline) read the corpus exactly once
    val p = plan("q300_release_funnel")
    val scans = "documents\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"documents scanned $scans times:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q168 (partitioned IVF): probe scan prunes to the probed cent_id partitions") {
    // the ingest-time layout's payoff must be STATIC pruning — the plan
    // itself carries the literal partition filter, no runtime mechanism
    val p = plan("q168_ann_ivf_partitioned")
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(p)
      .map(_.group(1)).find(_.contains("cent_id"))
    assert(m.isDefined, s"no cent_id PartitionFilters in plan:\n$p")
    assert(m.get.contains("IN") || m.get.contains("in("), m.get)
  }

  test("q189 (IVF-PQ): code-only index scan prunes statically to probed partitions") {
    // the serving index is the PQ-coded layout: the plan must (a) read
    // the graft_ivfpq scratch with a literal cent_id partition filter and
    // (b) never rejoin the raw corpus floats at query time — queries are
    // the only embeddings.parquet scans (probe ranking + LUT)
    val p = plan("q189_ann_ivfpq")
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(p)
      .map(_.group(1)).find(_.contains("cent_id"))
    assert(m.isDefined, s"no cent_id PartitionFilters in plan:\n$p")
    assert(m.get.contains("IN") || m.get.contains("in("), m.get)
    assert("graft_ivfpq".r.findAllIn(p).nonEmpty,
      s"q189 must read the PQ-coded layout scratch:\n$p")
  }

  test("q174 (simhash LSH): memoized fingerprints, keyed band join, no corpus re-scan") {
    // the banded scale path reads the 16-byte/doc fingerprint artifact
    // (simhashTable scratch), never re-tokenizes documents, and candidate
    // generation is a KEYED (band, slice) equi-join — no all-pairs stage
    val p = plan("q174_simhash_lsh")
    assert("graft_simhash".r.findAllIn(p).nonEmpty,
      s"q174 must read the memoized fingerprint scratch:\n$p")
    assert("documents\\.parquet".r.findAllIn(p).isEmpty,
      s"q174 must not re-scan documents:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded LSH must join keyed, never all-pairs:\n$p")
  }

  test("winnow pair table is memoized: q154 and the q158 closure read ONE pairs materialization") {
    // four queries sit on the pair table (q154, q158, q165, q166); the
    // memo means each consumer's plan reads the graft_winnowpairs scratch
    // parquet instead of re-running the bucket explode + capped agg +
    // in-bucket pair HOFs from the fingerprint scratch
    val p154 = plan("q154_winnow_pairs")
    assert("graft_winnowpairs".r.findAllIn(p154).nonEmpty,
      s"q154 must read the memoized pair scratch:\n$p154")
    assert(!p154.contains("collectlistcapped"),
      s"q154 must not re-run the capped bucket agg:\n$p154")
    val p158 = plan("q158_winnow_clusters")
    assert("graft_winnowpairs".r.findAllIn(p158).isEmpty ||
      !p158.contains("collectlistcapped"),
      s"q158 must not re-derive pairs from fingerprints:\n$p158")
  }

  test("q181 (sequence packing): corpus windows partition by bucket, offsets attach broadcast") {
    // the distributed prefix sum's whole point: the corpus-sized
    // cumulative sum runs in a PER-BUCKET window (parallel), the only
    // unpartitioned window is over the model-sized bucket-offset table,
    // and offsets come back as a broadcast join — never a corpus shuffle
    // to one partition
    val p = plan("q181_sequence_packing")
    assert(p.contains("windowspecdefinition(__bkt"),
      s"corpus cumsum must partition by __bkt:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"offsets must attach as a broadcast:\n$p")
  }

  test("q207/q202: no corpus-sized single-partition window (r9 scale-killers)") {
    // both queries previously funneled their whole input through ONE
    // WindowExec task (q207: unpartitioned RANGE running max; q202:
    // global ntile). Now the corpus-sized windows must partition by the
    // price/key bucket, with only the model-sized bucket-offset table
    // allowed an unpartitioned window, and offsets attaching broadcast.
    val p207 = plan("q207_skyline_2d")
    assert(p207.contains("windowspecdefinition(pbkt"),
      s"q207 running max must partition by pbkt:\n$p207")
    assert(p207.contains("BroadcastHashJoin"),
      s"q207 prior-bucket maxima must attach broadcast:\n$p207")
    val p202 = plan("q202_score_deciles")
    assert(p202.contains("windowspecdefinition(__bkt"),
      s"q202 rank must partition by __bkt:\n$p202")
    assert(!p202.contains("ntile"),
      s"q202 must not run a global ntile:\n$p202")
    assert(p202.contains("BroadcastHashJoin"),
      s"q202 offsets must attach broadcast:\n$p202")
  }

  test("q247 (image near-dup LSH): keyed band join, never an all-pairs product") {
    // the pigeonhole argument only pays off if the plan actually probes
    // band keys — a cartesian/BNLJ over fingerprints would be the
    // all-pairs shape the operator exists to avoid
    val p = plan("q247_image_neardup_lsh")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q247 must not plan an all-pairs join:\n$p")
  }

  test("q439 family: corpus vectors never sit under a BroadcastExchange — build keyed, serve broadcasts only the beam/probe side") {
    // r12 verdict task 1 pin: with the auto-broadcast threshold disabled,
    // the only BroadcastExchanges left are the ones the code HINTS — so a
    // corpus-side (vec_id >= 5 embeddings scan) broadcast in any of these
    // plans is a reintroduced scale-killer, not an AQE size decision. The
    // probe panel (vec_id < 5) and the model-sized beam list MAY broadcast.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // executedPlan (exchanges inserted), with AQE off so the tree is the
    // static plan the hints produce, not a runtime size decision
    def corpusBroadcasts(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case b: BroadcastExchangeExec =>
          b.collectLeaves().map(_.toString).filter(l =>
            l.contains("embeddings") &&
              l.contains("GreaterThanOrEqual(vec_id,5)"))
      }.flatten
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import spark.implicits._
      val build = operators.R12Queries.knnGraphEdges(spark, sf)
      assert(corpusBroadcasts(build).isEmpty,
        s"graph BUILD must not broadcast the corpus:\n${build.queryExecution.sparkPlan}")
      val serve = operators.R12Queries.beamScore(spark, sf,
        Seq((0L, 5L)).toDF("qid", "cid"))
      assert(corpusBroadcasts(serve).isEmpty,
        s"SERVE scoring must not broadcast the corpus:\n${serve.queryExecution.sparkPlan}")
      assert(serve.queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec => b }.nonEmpty,
        "serve should broadcast the model-sized beam/probe side")
      val attach = SparkEntry.queries("q452_knn_graph_append")(spark, sf)
      assert(corpusBroadcasts(attach).isEmpty,
        s"incremental ATTACH must not broadcast the corpus:\n${attach.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("q173 (quality classifier): train is one reduction, model attaches broadcast") {
    // closed-form training: the stats subtree reduces to ONE row and the
    // corpus scoring pass receives it as a broadcast — never a shuffle
    // keyed on anything, never a driver round-trip
    val p = plan("q173_quality_classifier")
    assert(p.contains("BroadcastNestedLoopJoin"), s"model must broadcast:\n$p")
    val scans = "documents\\.parquet".r.findAllIn(p).size
    assert(scans == 2, s"expected train + score scans, got $scans:\n$p")
  }

  test("q172 (trained+partitioned IVF): the TRAINED layout prunes statically too") {
    // same static-pruning contract as q168, but over the layout written
    // from the LEARNED codebook — the composed production ANN path
    val p = plan("q172_ann_ivf_trained_partitioned")
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(p)
      .map(_.group(1)).find(_.contains("cent_id"))
    assert(m.isDefined, s"no cent_id PartitionFilters in plan:\n$p")
    assert(m.get.contains("IN") || m.get.contains("in("), m.get)
  }

  test("dynamic partition pruning fires on a partitioned fact ⋈ filtered dim") {
    // the 100 TB shape: the fact is directory-partitioned on the join key;
    // a selective dim filter must prune fact partitions AT RUNTIME (DPP),
    // not scan them all
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val s = spark
    import s.implicits._
    (0L until 20000L).map(i => (i, i % 25))
      .toDF("o_key", "nat").write.partitionBy("nat").parquet(s"$dir/fact")
    (0L until 25L).map(i => (i, s"NATION_$i")).toDF("n_key", "n_name")
      .write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("n_name") === "NATION_3")
    val q = fact.join(dim, col("nat") === col("n_key"))
      .agg(count(lit(1)).as("n"))
    assert(q.collect().head.getLong(0) == 800L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a DPP subquery filter in:\n$plan")
  }

  test("runtime bloom-filter join pruning injects on a selective fact join") {
    // row-level runtime filtering: a selective predicate on one join side
    // should inject a bloom filter evaluated on the other side's scan
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dir = java.nio.file.Files.createTempDirectory("bloom").toString
      (0L until 50000L).map(i => (i, i % 1000)).toDF("k", "v")
        .write.parquet(s"$dir/big")
      (0L until 50000L).map(i => (i, s"g${i % 500}")).toDF("k2", "tag")
        .write.parquet(s"$dir/small")
      val big = spark.read.parquet(s"$dir/big")
      val sel = spark.read.parquet(s"$dir/small").filter(col("tag") === "g7")
      val q = big.join(sel, col("k") === col("k2")).agg(count(lit(1)))
      assert(q.collect().head.getLong(0) == 100L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter in:\n$plan")
    }
  }

  test("fact-fact joins can run as sort-merge when hash build won't fit") {
    // the third physical join strategy (after broadcast + shuffled-hash):
    // when neither side fits a hash build, SMJ spills gracefully — the
    // 100 TB fallback. preferSortMergeJoin models that regime locally.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      val q = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").count()
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
    }
  }

  test("multi-consumer plans compute the shared subtree once, nothing executor-pinned") {
    // q120/q126 replaced localCheckpoint (executor-pinned, lineage-severed
    // — one lost executor fails the query at scale): q120 collapses its
    // twice-consumed aggregate through a global window-max; q126 (since
    // r7) materializes its argmax assignment ONCE to memoized scratch
    // parquet (semdedupAssigned), so all three consumers read the scratch
    // instead of re-deriving the corpus pass. The asserted property is
    // the OUTCOME: the expensive source is scanned once per declared use,
    // and no plan leaf is a pre-materialized RDD (which is how any
    // checkpoint variant would surface).
    def executed(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("LogicalRDD"),
        s"$name still materializes via checkpoint:\n$analyzed")
      df.collect()
      // the AQE string repeats the tree under "== Initial Plan ==" —
      // count scans only in what actually ran
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val p120 = executed("q120_tpch_q15_topsupp")
    assert("lineitem\\.parquet".r.findAllIn(p120).size == 1,
      s"q120 must scan the fact exactly once:\n$p120")
    val p126 = executed("q126_semdedup")
    // r7: the argmax assignment materializes ONCE to memoized scratch
    // parquet (semdedupAssigned), so the query plan itself contains ZERO
    // embeddings scans and ZERO vector argmax work — the r6 shape let the
    // member-count branch silently re-derive the corpus scan + broadcast
    // argmax (a second corpus pass at 100 TB). The one corpus scan lives
    // in the memo-write job; every consumer reads assignment-sized
    // scratch.
    assert("embeddings\\.parquet".r.findAllIn(p126).size == 0,
      s"q126 must read the memoized assignment, not re-scan the corpus:\n$p126")
    assert("graft_semdedup".r.findAllIn(p126).size >= 1,
      s"q126 must read the scratch assignment:\n$p126")
  }

  test("whole-stage codegen covers the scan→filter→aggregate pipeline") {
    // AQE only shows codegen spans in the final (post-execution) plan
    val df = SparkEntry.queries("q04_tpch_q1")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(") && "\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined, p)
  }

  test("q485 (decontamination): the benchmark gram set broadcasts; the " +
      "corpus explode is never under a cartesian") {
    // the corpus-sized side is ONE exploded documents pass semi-joined
    // against the (eval-sized, broadcast) benchmark gram hashes — the
    // q89 discipline at the 13-gram grain; a cartesian or a shuffled
    // corpus×bench join here becomes the bottleneck at 100×
    val df = SparkEntry.queries("q485_benchmark_decontamination")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q485 must plan keyed/broadcast joins only:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q485's bench-gram join must broadcast the small side:\n$p")
  }

  test("q487/q489 (panel diagnostics): consumers read the subsetknn " +
      "scratch, never re-scoring the panel") {
    // the 256-point leave-one-out kNN table materializes once per
    // (process, dataset) — q487/q488/q489 all read the scratch; a
    // consumer that re-derived it would re-pay the panel scoring pass
    // per query (the q212/q126 memo discipline)
    for (q <- Seq("q487_label_noise_matrix", "q489_label_spreading")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert("graft_subsetknn".r.findAllIn(p).nonEmpty,
        s"$q must read the memoized panel kNN scratch:\n$p")
      assert("embeddings\\.parquet".r.findAllIn(p).isEmpty,
        s"$q must not re-scan the corpus — the memo holds the grain:\n$p")
    }
  }

  test("every unpartitioned window in every declared query sits on a grain-reduced input, never a raw scan") {
    // r16 verdict item 7: a Window with no partitionBy moves ALL its
    // input to one task, so it is only viable when that input is bounded
    // by construction (a limit, an aggregation grain like source/day/
    // bucket panels, a pinned LocalRelation, a literal range). This
    // sweeps EVERY declared query's optimized plan and asserts each
    // unpartitioned window's subtree reduces grain on every path to a
    // leaf before any raw relation scan. Checkpointed frames (LogicalRDD)
    // are accepted as reduced: a checkpoint's own input was built by
    // audited code above — the property pinned here is that no
    // unpartitioned window consumes an UNREDUCED scan directly.
    import org.apache.spark.sql.catalyst.plans.logical._
    def reduced(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalRelation | _: Range |
           _: OneRowRelation => true
      case l if l.children.isEmpty =>
        // remaining leaves: LogicalRDD (checkpoint — accepted, see above)
        // vs raw relations (rejected)
        val n = l.nodeName
        n == "LogicalRDD" || n == "OneRowRelation"
      case j: Join =>
        // a join is reduced only if BOTH inputs are (a bounded list
        // broadcast against a corpus still yields corpus-sized output)
        reduced(j.left) && reduced(j.right)
      case other => other.children.forall(reduced)
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = try {
        SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      } catch { case e: Throwable =>
        fail(s"$name failed to construct at $sf: $e")
      }
      plan.collect {
        case w: Window if w.partitionSpec.isEmpty && !reduced(w.child) =>
          s"$name: unpartitioned window over unreduced input:\n${w.child.treeString}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
  }
}
