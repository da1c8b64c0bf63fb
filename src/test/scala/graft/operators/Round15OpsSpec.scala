package graft.operators

import graft.{SparkEntry, SparkFixture, Tables}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 proofs: the r14-verdict acceptance bars for the hardening
  * items — scratch-memo directory naming survives 32-bit hashCode
  * collisions, the conformal pipeline's empty-calibration edge yields
  * honest p = 1/(n_cal+1) rows instead of silently dropping the test
  * grain, q484's pair subtree is evaluated exactly once (zero parquet
  * scans in the consumer plan), and the anchored CTE-materialization
  * rewrite both rewrites every real CTE and fails loudly on non-CTE
  * ` AS (` occurrences.
  */
class Round15OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("scratchRoot: two dataset keys with COLLIDING String.hashCode get " +
      "distinct directories (md5 naming, the r14 memo-corruption class)") {
    // "Aa" and "BB" is the canonical Java hashCode collision pair; any
    // suffix shared by both preserves the collision (31*h trick)
    val k1 = "Aa/documents.parquet#v1"
    val k2 = "BB/documents.parquet#v1"
    assert(k1.hashCode == k2.hashCode, "fixture must collide on hashCode")
    val p1 = Shared.scratchRoot("spec15", k1)
    val p2 = Shared.scratchRoot("spec15", k2)
    assert(p1 != p2,
      s"colliding hashCodes must not share a scratch directory: $p1")
  }

  test("conformalTestGrain: an EMPTY calibration panel yields the full " +
      "test grain with cnt_ge = 0 / n_cal = 0 (p = 1), not zero rows") {
    // stage an embeddings table with NO calibration rows (vec_id < 40):
    // test probes 40-49 plus the corpus survive; calibration is empty
    val tmp = java.nio.file.Files.createTempDirectory("graft_spec15_")
    tmp.toFile.deleteOnExit()
    Tables.embeddings(spark, sf).filter(col("vec_id") >= 40)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val tg = R13gQueries
      .conformalTestGrain(spark, tmp.toString)
      .select("qid", "lbl", "cnt_ge", "n_cal").collect()
    val nLabels = Tables.embeddings(spark, tmp.toString)
      .filter(col("vec_id") >= 50).select("label").distinct().count()
    // every (test probe, label) row survives the spine left-join
    assert(tg.length == 10 * nLabels,
      s"expected ${10 * nLabels} (probe,label) rows, got ${tg.length}")
    assert(tg.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L),
      "empty calibration must read as cnt_ge = 0, n_cal = 0 on every row")
    // and the q483 layer on top derives the honest p = 1/(0+1) = 1 with
    // every label in the 90% set (10*(1+0) > 0+1)
    val q483 = SparkEntry.queries("q483_conformal_prediction")(
      spark, tmp.toString).collect()
    assert(q483.length == tg.length)
    assert(q483.forall(r => r.getAs[Long]("p_ppm") == 1000000L &&
      r.getAs[Boolean]("in_set")),
      "empty calibration must yield p = 1 and full prediction sets")
  }

  test("q484: the pair subtree is evaluated ONCE — the consumer plan " +
      "reads the checkpointed histogram, zero parquet scans") {
    val df = SparkEntry.queries("q484_jl_distortion_audit")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"q484 consumer plan must not rescan embeddings (found $scans scans" +
        " — the pair subtree would run once per consumer)")
  }

  test("q499: bridge set replays from scratch (scalar graph walk), and " +
      "repaired recall >= the tombstone-filtered serve at equal beam") {
    val out = SparkEntry.queries("q499_hnsw_tombstone_repair")(spark, sf)
      .collect().head
    val nDead = out.getLong(0); val nBridges = out.getLong(1)
    val hitsR = out.getLong(2); val hitsT = out.getLong(3)
    assert(out.getLong(4) == 15L)
    // the r14-verdict acceptance bar: compaction must not cost recall
    assert(hitsR >= hitsT,
      s"repaired recall $hitsR fell below tombstone-filtered $hitsT")
    // independent replay: load the memoized graph + corpus vectors and
    // recompute the repair in plain Scala (same sequential double fold
    // as VectorDot, same (cos DESC, v ASC) tie-break)
    val edges = graft.operators.R12Queries.knnGraphMemoized(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecs = graft.operators.R12Queries.corpusVecs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dead(x: Long) = x % 7 == 0
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(u: Long, v: Long): Double = {
      val (a, b) = (vecs(u), vecs(v))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val outNbrs = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    assert(nDead == outNbrs.keySet.count(dead),
      "tombstoned-node count must replay")
    val bridges = scala.collection.mutable.Set[(Long, Long)]()
    for {
      t <- outNbrs.keySet.toSeq.sorted if dead(t)
      u <- outNbrs(t).map(v => v).sorted // symmetric graph: in-nbrs = out
      if !dead(u)
    } {
      val top = outNbrs(t).filter(v => !dead(v) && v != u)
        .map(v => (cos(u, v), v)).sortBy { case (cs, v) => (-cs, v) }
        .take(3)
      top.foreach { case (_, v) => bridges += ((u, v)); bridges += ((v, u)) }
    }
    val liveEdgeSet = edges.filter(e => !dead(e._1) && !dead(e._2)).toSet
    assert(nBridges == bridges.diff(liveEdgeSet).size.toLong,
      "bridge-edge count must replay from the scalar walk")
  }

  test("q502/q503: the planner's repair volume replays from a scalar " +
      "walk, its ratio is exact, and repaired recall stays within the " +
      "measured envelope of the full live rebuild") {
    val plan = SparkEntry.queries("q502_ann_compaction_planner")(spark, sf)
      .collect().head
    val nDead = plan.getLong(0); val repairScored = plan.getLong(1)
    val rebuildScored = plan.getLong(2); val ratio = plan.getLong(3)
    assert(ratio == rebuildScored / math.max(repairScored, 1L))
    // scalar replay of the repair volume: one (u, t, v) row per live
    // in-neighbor × live out-neighbor of each tombstone, v != u
    val edges = R12Queries.knnGraphMemoized(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dead(x: Long) = x % 7 == 0
    val outNbrs = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var replay = 0L
    for (t <- outNbrs.keySet if dead(t); u <- outNbrs(t) if !dead(u))
      replay += outNbrs(t).count(v => !dead(v) && v != u)
    assert(repairScored == replay,
      s"planner repair volume $repairScored != scalar replay $replay")
    assert(nDead == outNbrs.keySet.count(dead))
    // quality envelope: the repair is ~ratio× cheaper than the rebuild;
    // its measured recall cost is ≤ 2 of 15 across tested scales (7 vs
    // 9 at sf0.001, 10 vs 10 at sf0.01) — the pin that justifies ever
    // choosing repair over rebuild
    val hitsRebuild = SparkEntry.queries("q503_hnsw_rebuild_serve")(
      spark, sf).collect().head.getLong(1)
    val hitsRepaired = SparkEntry.queries("q499_hnsw_tombstone_repair")(
      spark, sf).collect().head.getLong(2)
    assert(hitsRepaired >= hitsRebuild - 2,
      s"repaired recall $hitsRepaired fell below rebuild $hitsRebuild - 2")
  }

  test("triangle build plan: the bucketed oriented-edge layout makes the " +
      "wedge self-join exchange-free AND sort-free (only the closing " +
      "join shuffles)") {
    // disable broadcast so the spec sees the AT-SCALE shape (at sf0.001
    // the planner rightly broadcasts the tiny table instead; at bench/
    // cluster scale the wedge join is the bucketed sort-merge join
    // pinned here)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = GraphQueries
        .triangleTriplesBuild(spark, sf, useBloom = false)
        .queryExecution.executedPlan.toString
      // the wedge join must ride the bucketing metadata: both inputs
      // scan the bucketed table directly (no exchange, and sortBy(u)
      // means no sort either), so the ONLY shuffles in the whole build
      // are the closing join's two sides (keyed (w1, w2) — a key no
      // u-layout can pre-co-locate)
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("Bucketed: true"),
        "wedge inputs must be bucketed scans")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 2,
        s"expected exactly the closing join's 2 shuffles, found $shuffles:\n" +
          plan.take(3000))
      // at most ONE partition-local sort survives: Spark's planner only
      // propagates the scan's sortBy ordering to one side of a bucketed
      // SELF-join (the re-aliased side's ordering attribute no longer
      // matches its required ordering) — a known wart, and crucially a
      // per-bucket in-memory sort, NOT an exchange
      val sorts = "\\+- Sort ".r.findAllIn(plan).size
      assert(sorts <= 1,
        s"bucketed+sorted scans need at most the self-join wart's one " +
          s"local sort, found $sorts")
    }
  }

  test("materializeCtes: anchored rewrite — real CTEs (bare and with " +
      "column lists) rewritten, string literals untouched, non-CTE " +
      "' AS (' throws") {
    import Shared.materializeCtes
    assert(materializeCtes("WITH a AS (SELECT 1) SELECT * FROM a") ==
      "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
    assert(materializeCtes(
      "WITH ns(n, m) AS (VALUES (1, 2)) SELECT * FROM ns") ==
      "WITH ns(n, m) AS MATERIALIZED (VALUES (1, 2)) SELECT * FROM ns")
    // ' AS (' inside a single-quoted literal is data, not a CTE
    val lit = "WITH a AS (SELECT ' AS (' AS s) SELECT * FROM a"
    assert(materializeCtes(lit) ==
      "WITH a AS MATERIALIZED (SELECT ' AS (' AS s) SELECT * FROM a")
    // an aliased parenthesized subquery is NOT a CTE definition: loud
    // failure beats silently emitting 'AS MATERIALIZED (col)' nonsense
    intercept[IllegalArgumentException] {
      materializeCtes("SELECT * FROM (SELECT 1, 2) AS (a, b)")
    }
  }
}
