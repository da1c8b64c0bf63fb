package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural and monotonicity proofs for the round-12 batch-3
  * operators (ANN index maintenance).
  */
class Round12cOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q449: bucket populations cover the corpus; flags are the exact integer tests") {
    val out = run("q449_ivf_rebalance_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    val nCorpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 13).count()
    val tv = out.map(_._2).sum
    assert(tv == nCorpus, "every corpus vector sits in exactly one bucket")
    val nb = out.length.toLong
    out.foreach { case (cid, n, ppm, split, merge) =>
      assert(ppm == n * 1000000L / tv, s"bucket $cid")
      assert(split == (n * nb > tv * 2), s"bucket $cid split")
      assert(merge == (n * nb * 2 < tv), s"bucket $cid merge")
      assert(!(split && merge), s"bucket $cid can't need both")
    }
  }

  test("q450: candidates and hits are monotone in nprobe") {
    val out = run("q450_ann_probe_recall_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L))
    out.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 >= a._2, "probing more buckets scans more candidates")
        assert(b._3 >= a._3, "exact re-rank over a superset can't lose hits")
      case _ => ()
    }
  }

  test("q451: audit numbers reconcile with the graph itself; reachability grows monotonically") {
    val r = run("q451_knn_graph_audit").head
    val edges = operators.R12Queries.knnGraphEdges(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.getLong(0) == edges.map(_._1).distinct.length.toLong, "n_nodes")
    assert(r.getLong(1) == edges.length.toLong, "n_edges")
    val maxDeg = edges.groupBy(_._1).map(_._2.length).max.toLong
    assert(r.getLong(2) == maxDeg, "max_degree")
    assert(r.getLong(3) >= 0, "n_isolated")
    val reaches = (4 to 7).map(r.getLong)
    assert(r.getLong(4) == 4L, "the four entry points")
    reaches.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, "frontier never shrinks")
      case _ => ()
    }
    // independent BFS recompute from independently re-derived entry
    // points (the data-derived rule: top-4 out-degree, ties to min id)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var reach = edges.groupBy(_._1).toSeq
      .map { case (id, es) => (id, es.length) }
      .sortBy { case (id, dg) => (-dg, id) }.take(4).map(_._1).toSet
    (1 to 3).foreach { i =>
      reach = reach ++ reach.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
      assert(r.getLong(4 + i) == reach.size.toLong, s"reach_$i")
    }
  }

  test("q452: every arrival attaches at most KnnM edges, bounded by its candidates; anchors live in the corpus") {
    val out = run("q452_knn_graph_append").collect()
    assert(out.length == 5, "arrival spine keeps every probe visible")
    out.foreach { r =>
      val (nc, na) = (r.getLong(1), r.getLong(2))
      assert(na <= math.min(6L, nc), s"qid ${r.getLong(0)}")
      if (nc == 0) assert(r.isNullAt(3), "empty buckets → NULL anchor")
      else {
        assert(!r.isNullAt(3))
        assert(r.getLong(3) >= 5L, "anchor is a corpus id")
      }
    }
  }

  test("q453: per-band populations cover the corpus; pair mass matches a direct recompute") {
    val out = run("q453_lsh_router_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nCorpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 5).count()
    assert(out.length == 4)
    out.foreach { case (band, nb, nv, mx, pm) =>
      assert(nv == nCorpus, s"band $band covers the corpus")
      assert(mx <= nv && nb <= 64, s"band $band")
      assert(pm >= mx * (mx - 1) / 2, s"band $band pair mass")
    }
    // direct recompute from the raw key stream
    val raw = operators.R12Queries.bandedCorpusKeysRaw(spark, sf).collect()
      .map(r => (r.getInt(1), r.getString(2)))
    val want = raw.groupBy(_._1).map { case (b, rows) =>
      b.toLong -> rows.groupBy(_._2).values
        .map(g => g.size.toLong * (g.size - 1) / 2).sum
    }
    out.foreach { case (band, _, _, _, pm) =>
      assert(pm == want(band), s"band $band pair mass recompute")
    }
  }
}
