package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for round-13 batch 7 (q483–q486):
  * each operator's contract replays driver-side in plain Scala from the
  * raw collected tables and must match the engine row for row.
  */
class Round13gOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def emb(): Seq[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong)).toSeq

  /** exact top-K label-vote counts per (probe, label), zero-filled */
  private def votesOf(q: (Long, Array[Double], Long),
      corpus: Seq[(Long, Array[Double], Long)]): Map[Long, Long] = {
    val top = corpus.map { case (cid, cv, cl) => (cid, cl, cosOf(q._2, cv)) }
      .sortBy { case (cid, _, cos) => (-cos, cid) }.take(K)
    top.groupBy(_._2).view.mapValues(_.size.toLong).toMap
  }

  test("q483: conformal p-values replay exactly; in_set is the exact " +
      "integer inequality; calibration coverage holds on its own panel") {
    val all = emb()
    val corpus = all.filter(_._1 >= 50)
    val panel = all.filter(_._1 < 50)
    val labels = corpus.map(_._3).distinct.sorted
    val score = panel.map { p =>
      p._1 -> labels.map { l =>
        l -> (K.toLong - votesOf(p, corpus).getOrElse(l, 0L))
      }.toMap
    }.toMap
    val cal = panel.filter(_._1 < 40)
    val calScores = cal.map(p => score(p._1)(p._3))
    val nCal = calScores.size.toLong
    def cntGe(a: Long): Long = calScores.count(_ >= a).toLong
    val want = panel.filter(_._1 >= 40).flatMap { p =>
      labels.map { l =>
        val a = score(p._1)(l)
        (p._1, p._3, l, a, (1L + cntGe(a)) * 1000000L / (nCal + 1L),
          10L * (1L + cntGe(a)) > nCal + 1L)
      }
    }.toSet
    val out = SparkEntry.queries("q483_conformal_prediction")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out == want)
    // on the calibration panel itself, the true label's p-value exceeds
    // alpha for >= (1-alpha) of points — the conformal guarantee's exact
    // finite-sample form, checkable without randomness on the cal side
    val covered = cal.count(p =>
      10L * (1L + cntGe(score(p._1)(p._3))) > nCal + 1L)
    assert(covered * 10L >= cal.size * 9L - 10L)
  }

  test("q484: the JL distortion histogram replays from raw vectors and " +
      "the LCG plane formula") {
    val P = 16
    val planes = Array.tabulate(P, 64) { (p, i) =>
      ((1103515245L * (p * 64L + i) + 12345L) % 2147483648L).toDouble /
        2147483648.0 - 0.5
    }
    val panel = emb().filter(t => t._1 >= 50 && t._1 < 114)
      .map(t => (t._1, t._2))
    def cosd(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val proj = panel.map { case (id, v) =>
      (id, v, planes.map(pl => dot(v, pl)))
    }
    val dus = for {
      (ai, av, ap) <- proj; (bi, bv, bp) <- proj if ai < bi
    } yield math.floor(math.abs(cosd(av, bv) - cosd(ap, bp)) *
      1000000.0).toLong
    val mean = dus.sum / dus.size
    val want = dus.groupBy(_ / 50000L).map { case (b, ds) =>
      (b, ds.size.toLong, ds.max, mean) }.toSet
    val out = SparkEntry.queries("q484_jl_distortion_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == want)
    // pair count conserves: C(64, 2) pairs land in the histogram
    assert(want.toSeq.map(_._2).sum == 64L * 63L / 2L)
  }

  test("q485: contamination replays from raw 13-gram sets; the benchmark " +
      "panel itself is excluded from the train side") {
    def h32(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(4).map("%02x".format(_))
        .mkString, 16)
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Set[Long] = {
      val t = text.trim.split("\\s+")
      if (t.length < 13) Set.empty
      else t.sliding(13).map(w => h32(w.mkString(" "))).toSet
    }
    val bench = docs.filter(_._1 % 50 == 0).flatMap(d => grams(d._3)).toSet
    val train = docs.filter(_._1 % 50 != 0)
    val want = train.groupBy(_._2).map { case (src, rows) =>
      val dirtyByDoc = rows.map(d => grams(d._3).intersect(bench))
      val nCont = dirtyByDoc.count(_.nonEmpty).toLong
      val nTrain = rows.size.toLong
      (src, nTrain, nCont, nCont * 1000000L / nTrain,
        dirtyByDoc.foldLeft(Set.empty[Long])(_ ++ _).size.toLong)
    }.toSet
    val out = SparkEntry.queries("q485_benchmark_decontamination")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == want)
    // the panel split is honest: some contamination signal exists in the
    // synthetic corpus OR every source reports clean — either way every
    // source appears exactly once
    assert(out.size == train.map(_._2).distinct.size)
  }

  test("q486: reliability buckets and the exact-integer ECE replay") {
    val all = emb()
    val corpus = all.filter(_._1 >= 50)
    val probes = all.filter(_._1 < 50)
    val winners = probes.map { p =>
      val v = votesOf(p, corpus)
      val (pred, nv) = v.toSeq.sortBy { case (l, c) => (-c, l) }.head
      (nv, p._3 == pred)
    }
    val buckets = winners.groupBy(_._1).map { case (b, rows) =>
      val n = rows.size.toLong
      val nc = rows.count(_._2).toLong
      (b, n, nc, nc * 1000000L / n, b * 1000000L / K)
    }.toSeq
    val ece = buckets.map { case (_, n, _, acc, conf) =>
      n * math.abs(acc - conf) }.sum / buckets.map(_._2).sum
    val want = buckets.map { case (b, n, nc, acc, conf) =>
      (b, n, nc, acc, conf, ece) }.toSet
    val out = SparkEntry.queries("q486_vote_calibration_ece")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == want)
  }
}
