package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proof for q482: the whole curation loop
  * (Shapley on the valuation panel → prune negatives → held-out vote on
  * full vs pruned) replays driver-side from the raw collected table.
  */
class Round13fOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("q482: the prune-and-re-measure loop replays end to end; the " +
      "panels are disjoint by construction") {
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong)).toSeq
    val corpus = emb.filter(_._1 >= 5)
    val valP = emb.filter(t => t._1 >= 0 && t._1 < 3)
    val evalP = emb.filter(t => t._1 >= 3 && t._1 < 5)
    // q480's recursion vs the valuation panel only
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, qv, tl) <- valP) {
      val ranked = corpus.map { case (cid, cv, cl) =>
        (cid, cl, cosOf(qv, cv)) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }
      val n = ranked.size.toLong
      val ind = ranked.map { case (_, cl, _) => if (cl == tl) 1L else 0L }
      val s = new Array[Long](ranked.size)
      s(ranked.size - 1) = ind.last * (1000000L / n)
      for (i <- ranked.size - 2 to 0 by -1) {
        val r = i + 1L
        s(i) = s(i + 1) +
          (ind(i) - ind(i + 1)) * (math.min(5L, r) * 1000000L / (5L * r))
      }
      for (((cid, _, _), i) <- ranked.zipWithIndex)
        acc(cid) = acc.getOrElse(cid, 0L) + s(i)
    }
    val harmful = acc.collect { case (cid, v) if v < 0L => cid }.toSet
    assert(harmful.nonEmpty && harmful.size < corpus.size)
    def vote(cs: Seq[(Long, Array[Double], Long)], variant: String) =
      evalP.map { case (qid, qv, tl) =>
        val top5 = cs.map { case (cid, cv, cl) => (cid, cl, cosOf(qv, cv)) }
          .sortBy { case (cid, _, cos) => (-cos, cid) }.take(5)
        val (pred, _) = top5.groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (l, c) => (-c, l) }.head
        (variant, cs.size.toLong, qid, tl, pred, tl == pred)
      }
    val want = (vote(corpus, "full") ++
      vote(corpus.filterNot(c => harmful(c._1)), "pruned")).toSet
    val out = SparkEntry.queries("q482_shapley_prune_eval")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out == want)
    // the pruned variant votes over strictly fewer points
    val byVar = out.groupBy(_._1).view.mapValues(_.head._2).toMap
    assert(byVar("pruned") < byVar("full"))
  }
}
