package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proofs for the round-14 batch-1 operator (the geometric HNSW tier
  * ladder): structural sanity of the new tier plus the r13-verdict
  * acceptance bar — recall at equal base beam never drops below the
  * two-layer searcher's.
  */
class Round14OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q494: tier-2 is the fixed top-8 panel, its edges close within the " +
      "tier, and recall >= the two-layer searcher at equal base beam") {
    val out = run("q494_hnsw_three_layer").collect()
    assert(out.length == 1)
    val r = out.head
    val nT2 = r.getLong(0); val nT2E = r.getLong(1)
    val hits3 = r.getLong(2); val poss = r.getLong(3)
    // the tier is fixed-cardinality by construction (top-8 by degree;
    // fewer only if the whole graph has fewer sources)
    assert(nT2 == 8L, s"tier-2 must hold 8 nodes, got $nT2")
    // an 8-node directed tier closes at most 8*7 edges
    assert(nT2E >= 0L && nT2E <= 56L, s"tier-2 edges out of range: $nT2E")
    assert(poss == 15L)
    assert(hits3 >= 0L && hits3 <= poss)
    // the acceptance bar: adding the geometric tier must not cost recall
    // vs q462 (same base beam W=8 x 2 rounds, same brute denominator)
    val twoLayer = run("q462_hnsw_two_layer").collect().head
    val hits2 = twoLayer.getLong(2)
    assert(hits3 >= hits2,
      s"three-layer recall $hits3/$poss fell below two-layer $hits2/$poss")
  }

  test("q496: planted duplicate clips cluster; cluster sizes account for " +
      "every document") {
    val hist = run("q496_mdct_pcm_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = Tables.documents(spark, sf).count()
    // Σ cluster_size × n_clusters = corpus size (every clip lands in
    // exactly one cluster)
    assert(hist.map { case (szc, n) => szc * n }.sum == nDocs)
    // the 257-way clip formula over >257 docs must produce real dups
    if (nDocs > 257) assert(hist.exists(_._1 > 1L), "expected planted dups")
  }

  test("q497: the planner's tier count is exactly ceil(log8 N) and serve " +
      "cost is logarithmic while brute is linear") {
    val rows = run("q497_hnsw_tier_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    def ceilLog8(n: Long): Long = {
      var t = 0L; var p = 1L
      while (p < n) { p *= 8; t += 1 }
      t
    }
    rows.foreach { case (n, tiers, scored, speedup) =>
      assert(tiers == ceilLog8(n), s"tiers($n)")
      assert(scored == 4 + 48 * (tiers - 1) + 96, s"scored($n)")
      assert(speedup == n / scored, s"speedup($n)")
    }
    // log-vs-linear: corpus grows 10^6×, scored cost under 2×
    assert(rows.last._3 < 2 * rows.head._3)
  }

  test("q498: level draws replay from local hash math; every arrival " +
      "inserts at exactly tiers 0..level with the per-layer M schedule") {
    val out = run("q498_hnsw_level_insert").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def levelOf(id: Long): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"ins$id").take(8), 16)
      if (h % 4 != 0) 0L else if ((h / 4) % 4 != 0) 1L else 2L
    }
    // spine: one row per (arrival, tier ≤ level), nothing else
    val want = (0L to 4L).flatMap(id => (0L to levelOf(id)).map(t => (id, t)))
    assert(out.map(r => (r._1, r._3)).toSet == want.toSet)
    out.foreach { case (qid, level, tier, nCand, nAtt) =>
      assert(level == levelOf(qid), s"level($qid)")
      val m = tier match { case 0 => 6L; case 1 => 4L; case 2 => 2L }
      assert(nAtt <= m && nAtt == math.min(m, nCand), s"attach($qid,$tier)")
      // tier panels are fixed-size: candidates = whole panel
      if (tier == 1L) assert(nCand == 64L)
      if (tier == 2L) assert(nCand == 8L)
    }
  }

  test("q494: tier-2 nodes are exactly the degree-top-8 of the kNN graph " +
      "(independent recomputation)") {
    // recompute the degree ranking locally from the shared graph memo
    val g = operators.R12Queries.knnGraphMemoized(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = g.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val top8 = deg.toSeq.sortBy { case (v, dg) => (-dg, v) }.take(8)
      .map(_._1).toSet
    // count the graph edges with both ends in that panel — must equal
    // the query's n_tier2_edges
    val wantEdges = g.count { case (s2, d2) => top8(s2) && top8(d2) }.toLong
    val got = run("q494_hnsw_three_layer").collect().head.getLong(1)
    assert(got == wantEdges,
      s"tier-2 edge count $got != locally recomputed $wantEdges")
  }
}
