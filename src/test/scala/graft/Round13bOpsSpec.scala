package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-13 batch-2
  * operators (supervised eval + split management): every query is
  * recomputed in full from the raw collected tables.
  */
class Round13bOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosOf(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private lazy val emb: Seq[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong)).toSeq

  test("q468: the vote replays exactly from a local top-5") {
    val out = run("q468_knn_label_vote").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val corpus = emb.filter(_._1 >= 5)
    val want = emb.filter(_._1 < 5).map { case (qid, qv, ql) =>
      val top5 = corpus.map { case (cid, cv, cl) =>
        (cid, cl, cosOf(qv, cv)) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(5)
      val (pred, votes) = top5.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      (qid, ql, pred, votes.toLong, ql == pred)
    }.toSet
    assert(out == want)
  }

  test("q469: integer centroids and integer scores replay exactly") {
    val out = run("q469_nearest_centroid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val corpus = emb.filter(_._1 >= 5)
    // micro-quantized integer centroids: per (label, dim) sum div n
    val cent: Map[Long, Array[Long]] = corpus.groupBy(_._3).map {
      case (l, g) =>
        l -> Array.tabulate(64) { i =>
          val qs = g.map { case (_, v, _) => math.floor(v(i) * 1e6).toLong }
          // BigInt mirrors Spark's `div` (truncation toward zero) for
          // possibly-negative sums
          (BigInt(qs.sum) / qs.length).toLong
        }
    }
    val want = emb.filter(_._1 < 5).map { case (qid, qv, ql) =>
      val p = qv.map(x => math.floor(x * 1e6).toLong)
      val scored = cent.toSeq.map { case (l, c) =>
        (l, (0 until 64).map(i => p(i) * c(i)).sum) }
      val (pred, score) = scored.sortBy { case (l, s) => (-s, l) }.head
      (qid, ql, pred, score, ql == pred)
    }.toSet
    assert(out == want)
  }

  private lazy val docs: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf).select("doc_id", "source", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  private def splitOf(docId: Long): String = {
    val b = h32(s"split$docId") % 100L
    if (b < 80) "train" else if (b < 90) "valid" else "test"
  }

  test("q470: stratified split audit replays exactly; assignment is append-stable by construction") {
    val out = run("q470_split_assignment").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val bySrc = docs.groupBy(_._2)
    val want = docs.groupBy(d => (d._2, splitOf(d._1))).map {
      case ((src, split), g) =>
        (src, split) -> (g.length.toLong,
          g.map(_._3.trim.split("\\s+").length.toLong).sum,
          g.map(_._4).sum,
          g.length.toLong * 1000000L / bySrc(src).length)
    }
    assert(out == want)
    // every (source, split) present implies shares within a source sum
    // to ~1e6 (floor loss < 3 ppm-units per source)
    out.keys.map(_._1).toSet.foreach { (src: String) =>
      val tot = out.collect { case ((s2, _), v) if s2 == src => v._4 }.sum
      assert(tot > 1000000L - 3 && tot <= 1000000L, s"$src shares: $tot")
    }
  }

  test("q471: leakage recomputes from the normalized-hash grain") {
    val r = run("q471_split_leakage").head
    val norm = (t: String) => t.trim.replaceAll("\\s+", " ").toLowerCase
    val byHash = docs.groupBy(d => norm(d._3))
    val nTest = docs.count(d => splitOf(d._1) == "test").toLong
    val nLeaked = byHash.values.map { g =>
      val hasTrain = g.exists(d => splitOf(d._1) == "train")
      if (hasTrain) g.count(d => splitOf(d._1) == "test").toLong else 0L
    }.sum
    assert(r.getLong(0) == nTest)
    assert(r.getLong(1) == nLeaked)
    assert(r.getLong(2) == nLeaked * 1000000L / nTest)
  }
}
