package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-13 batch: the
  * two-layer HNSW search and tombstoned serve are replayed in full by a
  * local (driver-side, collection-based) simulator built on the same
  * pinned sequential folds; the QA/curriculum/drift/shard queries are
  * recomputed row by row from the raw collected tables.
  */
class Round13OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // exact local replicas of the pinned folds (sequential double adds)
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
  private lazy val graphEdges: Seq[(Long, Long)] =
    operators.R12Queries.knnGraphEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  private lazy val adj: Map[Long, Seq[Long]] =
    graphEdges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  private lazy val probeIds: Seq[Long] = vecs.keys.filter(_ < 5).toSeq.sorted
  private lazy val corpusIds: Seq[Long] = vecs.keys.filter(_ >= 5).toSeq

  /** (deg desc, id asc) hub ranking — the data-derived entry/tier rule */
  private lazy val hubOrder: Seq[Long] =
    graphEdges.groupBy(_._1).toSeq
      .map { case (id, es) => (id, es.length) }
      .sortBy { case (id, dg) => (-dg, id) }.map(_._1)

  private def topW(cands: Map[Long, Double], w: Int): Seq[(Long, Double)] =
    cands.toSeq.sortBy { case (cid, cos) => (-cos, cid) }.take(w)

  private def beamLocal(qid: Long, seeds: Set[Long],
      edges: Map[Long, Seq[Long]], w: Int, rounds: Int): Seq[(Long, Double)] = {
    val qv = vecs(qid)
    var beam = topW(seeds.map(c => c -> cosOf(qv, vecs(c))).toMap, w)
    for (_ <- 1 to rounds) {
      val frontier = beam.flatMap { case (c, _) =>
        edges.getOrElse(c, Nil) }.toSet
      beam = topW(
        beam.toMap ++ frontier.map(c => c -> cosOf(qv, vecs(c))), w)
    }
    beam
  }

  test("q462: the full two-layer descent replays exactly in a local simulator") {
    val r = run("q462_hnsw_two_layer").head
    val upper = hubOrder.take(64)
    val upperSet = upper.toSet
    val upperEdges = graphEdges.filter { case (a, b) =>
      upperSet(a) && upperSet(b) }
    val upperAdj = upperEdges.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    assert(r.getLong(0) == upper.size.toLong, "n_upper_nodes")
    assert(r.getLong(1) == upperEdges.size.toLong, "n_upper_edges")
    val entries = hubOrder.take(4).toSet
    val hits = probeIds.map { qid =>
      val ub = beamLocal(qid, entries, upperAdj, 4, 2)
      val baseSeeds = ub.take(2).map(_._1).toSet
      val ans = beamLocal(qid, baseSeeds, adj, 8, 2).take(3).map(_._1).toSet
      val qv = vecs(qid)
      val brute = corpusIds.map(c => c -> cosOf(qv, vecs(c))).toMap
      val bruteTop = topW(brute, 3).map(_._1).toSet
      (ans intersect bruteTop).size
    }.sum
    assert(r.getLong(2) == hits.toLong, "n_hits")
    assert(r.getLong(3) == 15L, "n_possible")
  }

  test("q463: tombstones are traversed but never emitted; beams replay exactly") {
    val out = run("q463_ann_tombstone_serve").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(out.forall { case (_, _, cid, _) => cid % 7 != 0 },
      "no tombstone may be emitted")
    // seeds exactly as served: LSH-routed bucket members + the hub panel
    val routed = operators.R12Queries.probeBandKeys(spark, sf)
      .join(operators.R12Queries.bandedCorpusKeys(spark, sf),
        Seq("band", "bk"))
      .select("qid", "cid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val entries = hubOrder.take(4).toSet
    val want = probeIds.flatMap { qid =>
      val beam = beamLocal(qid,
        routed.getOrElse(qid, Set.empty) ++ entries, adj, 8, 2)
      val nDead = beam.count(_._1 % 7 == 0).toLong
      beam.filter(_._1 % 7 != 0).take(3).zipWithIndex.map {
        case ((cid, _), i) => (qid, (i + 1).toLong, cid, nDead)
      }
    }.toSet
    assert(out.toSet == want, s"serve rows diverge:\n${out.toSet}\nvs\n$want")
  }

  test("q464: every QA stat recomputes from the raw embedding rows") {
    val r = run("q464_embedding_qa").head
    val rows = Tables.embeddings(spark, sf).collect()
      .map(x => x.getSeq[Float](1).map(_.toDouble).toArray)
    assert(r.getLong(0) == rows.length.toLong, "n_vecs")
    assert(r.getLong(1) == rows.count(_.length != 64).toLong, "n_dim_bad")
    assert(r.getLong(2) == rows.count(_.exists(x =>
      x.isNaN || x > 1e308 || x < -1e308)).toLong, "n_nonfinite")
    val norms = rows.map(v => math.sqrt(dot(v, v)))
    assert(r.getLong(3) == norms.count(_ == 0.0).toLong, "n_zero_norm")
    assert(r.getLong(4) == math.floor(1e6 * norms.min).toLong, "min_norm_micro")
    assert(r.getLong(5) == math.floor(1e6 * norms.max).toLong, "max_norm_micro")
    val sigs = rows.map(_.map(x => math.floor(1e6 * x).toLong).mkString(","))
    val groups = sigs.groupBy(identity).values.map(_.length).filter(_ >= 2)
    assert(r.getLong(6) == groups.size.toLong, "n_dup_groups")
    assert(r.getLong(7) == groups.sum.toLong, "n_dup_vectors")
  }

  test("q465: phases, token sums and exact means recompute from the raw docs") {
    val out = run("q465_curriculum_phases").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val docs = Tables.documents(spark, sf)
      .select("text", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val scored = docs.map { case (text, nc) =>
      val score = text.replaceAll("[^a-zA-Z]", "").length.toLong *
        1000000L / text.length
      val phase = if (score >= 825000L) 1L
        else if (score >= 820000L) 2L else 3L
      (phase, text.trim.split("\\s+").length.toLong, nc, score)
    }
    val want = scored.groupBy(_._1).map { case (p, g) =>
      p -> (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).sum / g.length)
    }
    assert(out == want)
    assert(out.keySet == Set(1L, 2L, 3L), "every phase carries mass")
  }

  test("q466: per-source chi-square recomputes term by term") {
    val out = run("q466_doc_length_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        math.min(r.getString(1).trim.split("\\s+").length.toLong / 8L, 16L)))
    val cells = docs.groupBy(identity).map { case ((s, b), g) =>
      (s, b, g.length.toLong) }.toSeq
    val bt = cells.groupBy(_._2).map { case (b, g) => b -> g.map(_._3).sum }
    val st = cells.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val gt = cells.map(_._3).sum
    val want = cells.groupBy(_._1).map { case (s, g) =>
      val chi2 = g.map { case (_, b, obs) =>
        val e = bt(b).toDouble * st(s) / gt
        math.floor(1e6 * (obs * 1.0 - e) * (obs * 1.0 - e) / e).toLong
      }.sum
      s -> (st(s), g.length.toLong, chi2)
    }
    assert(out == want)
  }

  test("q467: the shard plan and its balance recompute from h32 exactly") {
    val r = run("q467_write_shard_plan").head
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val tot = docs.map(_._2).sum
    val n = math.max(1L, (tot + 16383L) / 16384L)
    assert(r.getLong(0) == tot && r.getLong(1) == n)
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val per = docs.groupBy { case (id, _) => h32(s"shard$id") % n }
      .map { case (_, g) => g.map(_._2).sum }
    assert(r.getLong(2) == per.max, "max_shard_chars")
    assert(r.getLong(3) == per.min, "min_shard_chars")
    assert(r.getLong(4) == per.max * n * 1000000L / tot, "imbalance_ppm")
  }
}
