package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for round-13 batch 8 (q487–q489):
  * the shared panel-kNN contract and all three diagnostics replay
  * driver-side in plain Scala from the raw collected embeddings.
  */
class Round13hOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** panel + each point's exact top-K leave-one-out neighbor labels */
  private lazy val panel: Seq[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong))
      .filter(t => t._1 >= 50 && t._1 < 306).toSeq

  private lazy val knn: Map[Long, Seq[(Long, Long)]] = panel.map { a =>
    a._1 -> panel.filter(_._1 != a._1)
      .map { b => (b._1, b._3, cosOf(a._2, b._2)) }
      .sortBy { case (bid, _, cos) => (-cos, bid) }.take(K)
      .map { case (bid, blbl, _) => (bid, blbl) }
  }.toMap

  test("q487: the noise matrix replays from the LOO votes") {
    val voted = panel.map { a =>
      val votes = knn(a._1).groupBy(_._2).view.mapValues(_.size.toLong)
      val (pred, nv) = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head
      (a._3, pred, nv)
    }
    val cells = voted.groupBy(t => (t._1, t._2)).map { case ((g, p), rs) =>
      (g, p, rs.size.toLong, rs.count(_._3 >= K - 1).toLong)
    }.toSeq
    val rowN = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val want = cells.map { case (g, p, n, nc) =>
      (g, p, n, nc, n * 1000000L / rowN(g)) }.toSet
    val out = SparkEntry.queries("q487_label_noise_matrix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == want)
    // sanity: the diagonal dominates (the synthetic labels correlate
    // with embedding space) — at least one diagonal cell exists
    assert(want.exists(c => c._1 == c._2))
  }

  test("q488: the k-occurrence distribution replays, zeros included, " +
      "and masses conserve") {
    val occOf = panel.map(_._1).map { aid =>
      aid -> knn.valuesIterator.count(_.exists(_._1 == aid)).toLong
    }
    val nPanel = panel.size.toLong
    val want = occOf.groupBy(_._2).map { case (o, rs) =>
      (o, rs.size.toLong) }.toSeq.sortBy(_._1)
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (o, n)) =>
        (o, n, n * 1000000L / nPanel, cum + n) }.drop(1).toSet
    val out = SparkEntry.queries("q488_hubness_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == want)
    // total occurrences = K per panel point; points sum to the panel
    assert(occOf.map(_._2).sum == nPanel * K)
    assert(want.toSeq.map(_._2).sum == nPanel)
  }

  test("q489: two synchronous spreading rounds replay; seeds never move") {
    val seeds = panel.filter(_._1 < 178).map(t => t._1 -> t._3).toMap
    def round(lbls: Map[Long, Long]): Map[Long, Long] =
      panel.filterNot(t => lbls.contains(t._1)).flatMap { a =>
        val nb = knn(a._1).take(3).flatMap(b => lbls.get(b._1))
        if (nb.isEmpty) None
        else {
          val (l, _) = nb.groupBy(identity).view.mapValues(_.size).toSeq
            .sortBy { case (l, c) => (-c, l) }.head
          Some(a._1 -> l)
        }
      }.toMap
    val r1 = round(seeds)
    val r2 = round(seeds ++ r1)
    val want = panel.map { a =>
      val assigned = seeds.get(a._1).orElse(r1.get(a._1))
        .orElse(r2.get(a._1))
      val phase =
        if (seeds.contains(a._1)) "seed"
        else if (r1.contains(a._1)) "round1"
        else if (r2.contains(a._1)) "round2"
        else "unreached"
      (a._1, a._3, assigned.getOrElse(-1L), phase,
        assigned.getOrElse(-1L) == a._3)
    }.toSet
    val out = SparkEntry.queries("q489_label_spreading")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getBoolean(4))).toSet
    assert(out == want)
    // seeds are exactly the sub-boundary ids and are always correct
    assert(want.filter(_._4 == "seed").forall(_._5))
  }
}
