package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for round-13 batch 9 (q490–q492):
  * each composition replays driver-side in plain Scala from the raw
  * collected embeddings — the conformal gate, the mutual-kNN vote, and
  * the seed-fraction spreading curve.
  */
class Round13iOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private lazy val emb: Seq[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong)).toSeq

  test("q490: the singleton gate replays; coverage and selective " +
      "accuracy are the exact integer ratios") {
    val corpus = emb.filter(_._1 >= 50)
    val panel = emb.filter(_._1 < 50)
    val labels = corpus.map(_._3).distinct.sorted
    def votesOf(qv: Array[Double]): Map[Long, Long] =
      corpus.map { case (cid, cv, cl) => (cid, cl, cosOf(qv, cv)) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(K)
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val score = panel.map(p => p._1 ->
      labels.map(l => l -> (K - votesOf(p._2).getOrElse(l, 0L))).toMap
    ).toMap
    val calScores = panel.filter(_._1 < 40).map(p => score(p._1)(p._3))
    val nCal = calScores.size.toLong
    def inSet(a: Long): Boolean =
      10L * (1L + calScores.count(_ >= a)) > nCal + 1L
    val gated = panel.filter(_._1 >= 40).map { p =>
      val set = labels.filter(l => inSet(score(p._1)(l)))
      val answered = set.size == 1
      val answer = if (answered) set.head else -1L
      (p._1, p._3, set.size.toLong, answered, answer,
        answered && answer == p._3)
    }
    val nAns = gated.count(_._4).toLong
    val nCorr = gated.count(_._6).toLong
    val cov = nAns * 1000000L / gated.size
    val acc = if (nAns > 0) nCorr * 1000000L / nAns else 0L
    val want = gated.map(g => (g._1, g._2, g._3, g._4, g._5, g._6,
      cov, acc)).toSet
    val out = SparkEntry.queries("q490_conformal_gated_serve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5), r.getLong(6),
        r.getLong(7))).toSet
    assert(out == want)
  }

  test("q491: mutual edges are the exact intersection of the top-K " +
      "digraph with its reverse; both votes replay") {
    val panel = emb.filter(t => t._1 >= 50 && t._1 < 306)
    val knn: Map[Long, Seq[(Long, Long)]] = panel.map { a =>
      a._1 -> panel.filter(_._1 != a._1)
        .map { b => (b._1, b._3, cosOf(a._2, b._2)) }
        .sortBy { case (bid, _, cos) => (-cos, bid) }.take(K)
        .map { case (bid, blbl, _) => (bid, blbl) }
    }.toMap
    def maj(votes: Seq[Long]): Option[Long] =
      if (votes.isEmpty) None
      else Some(votes.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1)
    val want = panel.map { a =>
      val full = maj(knn(a._1).map(_._2)).get
      val mutual = maj(knn(a._1)
        .filter { case (bid, _) => knn(bid).exists(_._1 == a._1) }
        .map(_._2))
      (a._1, a._3, full, full == a._3,
        mutual.getOrElse(-1L), mutual.getOrElse(-1L) == a._3)
    }.toSet
    val out = SparkEntry.queries("q491_mutual_knn_vote")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out == want)
    // mutuality can only remove votes, never add
    assert(want.nonEmpty)
  }

  test("q492: the three-boundary curve replays; more seeds never " +
      "increases unreached") {
    val panel = emb.filter(t => t._1 >= 50 && t._1 < 306)
    val knn3: Map[Long, Seq[Long]] = panel.map { a =>
      a._1 -> panel.filter(_._1 != a._1)
        .map { b => (b._1, cosOf(a._2, b._2)) }
        .sortBy { case (bid, cos) => (-cos, bid) }.take(3).map(_._1)
    }.toMap
    val truth = panel.map(t => t._1 -> t._3).toMap
    def curveRow(bound: Long) = {
      val seeds = panel.filter(_._1 < bound).map(t => t._1 -> t._3).toMap
      def round(lbls: Map[Long, Long]): Map[Long, Long] =
        panel.filterNot(t => lbls.contains(t._1)).flatMap { a =>
          val nb = knn3(a._1).flatMap(lbls.get)
          if (nb.isEmpty) None
          else Some(a._1 -> nb.groupBy(identity).view.mapValues(_.size)
            .toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
        }.toMap
      val r1 = round(seeds)
      val r2 = round(seeds ++ r1)
      val all = seeds ++ r1 ++ r2
      val nonSeedAssigned = all.keys.filter(_ >= bound).toSeq
      val correct = nonSeedAssigned.count(id => all(id) == truth(id))
      (bound, seeds.size.toLong, r1.size.toLong, r2.size.toLong,
        (panel.size - all.size).toLong,
        if (nonSeedAssigned.nonEmpty)
          correct * 1000000L / nonSeedAssigned.size
        else 0L)
    }
    val want = Seq(114L, 178L, 242L).map(curveRow).toSet
    val out = SparkEntry.queries("q492_spreading_seed_curve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == want)
    val byBound = want.toSeq.sortBy(_._1)
    assert(byBound.sliding(2).forall {
      case Seq(a, b) => b._5 <= a._5; case _ => true })
  }
}
