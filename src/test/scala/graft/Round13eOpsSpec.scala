package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-13 batch-5
  * operators: the exact kNN-Shapley recursion replays rank by rank from
  * the raw collected embeddings (same integer ops, driver-side), and the
  * selective-risk curve replays from a local vote recount.
  */
class Round13eOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private lazy val emb: Seq[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong)).toSeq

  private lazy val probes = emb.filter(_._1 < 5)
  private lazy val corpus = emb.filter(_._1 >= 5)

  test("q480: the closed-form recursion replays rank by rank with the " +
      "same integer ops") {
    val out = run("q480_knn_shapley").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, qv, tl) <- probes) {
      val ranked = corpus.map { case (cid, cv, cl) =>
        (cid, cl, cosOf(qv, cv)) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }
      val n = ranked.size.toLong
      // s(N) = ind(N)·(10⁶ div N); s(r) = s(r+1) + sign·(min(5,r)·10⁶
      // div (5r)) — the q480 contract verbatim
      val ind = ranked.map { case (_, cl, _) => if (cl == tl) 1L else 0L }
      val s = new Array[Long](ranked.size)
      s(ranked.size - 1) = ind.last * (1000000L / n)
      for (i <- ranked.size - 2 to 0 by -1) {
        val r = i + 1L
        s(i) = s(i + 1) +
          (ind(i) - ind(i + 1)) * (math.min(5L, r) * 1000000L / (5L * r))
      }
      for (((cid, cl, _), i) <- ranked.zipWithIndex)
        acc((cid, cl)) = acc.getOrElse((cid, cl), 0L) + s(i)
    }
    val want = acc.map { case ((cid, cl), v) =>
      (cid, cl, v, probes.size.toLong) }.toSet
    assert(out == want)
    // data valuation is only useful if it separates: the panel must
    // produce both positively and negatively valued points
    assert(out.exists(_._3 > 0L) && out.exists(_._3 < 0L))
  }

  test("q481: the risk/coverage curve replays from a local vote recount; " +
      "coverage is non-increasing in the threshold") {
    val out = run("q481_selective_risk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val votes = probes.map { case (_, qv, tl) =>
      val top5 = corpus.map { case (cid, cv, cl) => (cid, cl, cosOf(qv, cv)) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(5)
      val (pred, nv) = top5.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head
      (nv.toLong, tl == pred)
    }
    val nq = votes.size.toLong
    val want = (1L to 5L).flatMap { t =>
      val kept = votes.filter(_._1 >= t)
      if (kept.isEmpty) None
      else {
        val nc = kept.count(_._2).toLong
        Some((t, kept.size.toLong, nc,
          kept.size * 1000000L / nq, nc * 1000000L / kept.size))
      }
    }.toSet
    assert(out == want)
    val cov = out.toSeq.sortBy(_._1).map(_._4)
    assert(cov == cov.sorted.reverse)
  }
}
