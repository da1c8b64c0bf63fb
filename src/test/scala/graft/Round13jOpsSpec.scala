package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proof for q493: the mutual graph, the
  * hub ranking, and both component censuses replay via plain union-find
  * over the raw collected embeddings.
  */
class Round13jOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("q493: hub ablation censuses replay via union-find; ablation " +
      "can only shrink the largest component") {
    val panel = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .filter(t => t._1 >= 50 && t._1 < 306).toSeq
    val knn: Map[Long, Seq[Long]] = panel.map { a =>
      a._1 -> panel.filter(_._1 != a._1)
        .map { b => (b._1, cosOf(a._2, b._2)) }
        .sortBy { case (bid, cos) => (-cos, bid) }.take(K).map(_._1)
    }.toMap
    val mutual = (for {
      (a, nbs) <- knn.toSeq; b <- nbs if a < b && knn(b).contains(a)
    } yield (a, b)).distinct
    val occ = knn.keys.map(id =>
      id -> knn.valuesIterator.count(_.contains(id)).toLong).toMap
    val hubs = occ.toSeq.sortBy { case (id, o) => (-o, id) }
      .take(8).map(_._1).toSet

    def censusOf(variant: String, nodes: Set[Long],
        edges: Seq[(Long, Long)]) = {
      val parent = scala.collection.mutable.Map(
        nodes.map(n => n -> n).toSeq: _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- edges) parent(find(a)) = find(b)
      val comps = nodes.groupBy(find)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val maxSz = comps.values.map(_.size).max.toLong
      (variant, nodes.size.toLong, edges.size.toLong,
        comps.size.toLong, (nodes -- touched).size.toLong, maxSz,
        maxSz * 1000000L / nodes.size)
    }
    val all = panel.map(_._1).toSet
    val want = Set(
      censusOf("full", all, mutual),
      censusOf("ablated", all -- hubs,
        mutual.filterNot(e => hubs(e._1) || hubs(e._2))))
    val out = SparkEntry.queries("q493_hub_ablation_robustness")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(out == want)
    val full = want.find(_._1 == "full").get
    val abl = want.find(_._1 == "ablated").get
    assert(abl._6 <= full._6) // largest component never grows
    assert(abl._2 == full._2 - hubs.size)
  }
}
