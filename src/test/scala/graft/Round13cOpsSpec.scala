package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-13 batch-3
  * operators (split-quality audits, soft-dedup weighting, the LSH
  * banding planner, the HNSW recall curve): every query is recomputed
  * in full from the raw collected tables or from exact BigInt math.
  */
class Round13cOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def splitOf(id: Long): String = {
    val b = h32(s"split$id") % 100L
    if (b < 80) "train" else if (b < 90) "valid" else "test"
  }

  private lazy val embLabels: Seq[(Long, Long)] =
    Tables.embeddings(spark, sf).selectExpr("vec_id", "CAST(label AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).selectExpr("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  test("q472: the split×label χ² replays from a local contingency table") {
    val out = run("q472_split_label_balance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val cells = embLabels.groupBy { case (id, l) => (splitOf(id), l) }
      .view.mapValues(_.size.toLong).toMap
    val st = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val lt = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val gt = cells.values.sum
    val want = cells.keys.groupBy(_._1).map { case (sp, ks) =>
      val chi = ks.toSeq.map { case k@(_, l) =>
        val e = lt(l).toDouble * st(sp).toDouble / gt.toDouble
        val d = cells(k).toDouble - e
        math.floor(1e6 * d * d / e).toLong
      }.sum
      (sp, st(sp), ks.size.toLong, chi)
    }.toSet
    assert(out == want)
  }

  test("q473: soft-dedup weights replay from local clusters; singletons " +
      "weigh exactly 1e6") {
    val out = run("q473_soft_dedup_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val keyed = docs.map { case (_, src, text) =>
      (md5hex(text.trim.replaceAll("\\s+", " ").toLowerCase), src)
    }
    val csize = keyed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = keyed.groupBy(_._2).map { case (src, g) =>
      (src, g.size.toLong,
        g.count(k => csize(k._1) == 1L).toLong,
        g.map(k => 1000000L / csize(k._1)).sum)
    }.toSet
    assert(out == want)
    // every source's effective mass is bounded by its raw mass, and a
    // corpus with no duplicates would sit exactly at n_docs·1e6
    out.foreach { case (_, n, _, eff) => assert(eff <= n * 1000000L) }
  }

  test("q474: the hash-rate rebalance plan replays row-exactly") {
    val out = run("q474_class_rebalance_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val rows = embLabels.map { case (id, l) =>
      (splitOf(id), l, h32(s"bal$id") % 1000000L)
    }
    val grain = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    val quota = grain.groupBy(_._1._1).view
      .mapValues(_.values.min).toMap
    val want = grain.map { case ((sp, l), n) =>
      val kept = rows.count(t =>
        t._1 == sp && t._2 == l && t._3 < quota(sp) * 1000000L / n).toLong
      (sp, l, n, quota(sp), kept, kept * 1000000L / n)
    }.toSet
    assert(out == want)
  }

  test("q475: all 27 S-curve rows match exact BigInt math") {
    val out = run("q475_lsh_banding_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = (for {
      (b, r) <- Seq((4, 8), (8, 4), (16, 2))
      k <- 1 to 9
    } yield {
      val base = BigInt(10).pow(r) - BigInt(k).pow(r)
      val miss = base.pow(b) / BigInt(10).pow(26)
      (b.toLong, r.toLong, k.toLong, 1000000L - miss.toLong)
    }).toSet
    assert(out == want)
    // the S-curve is monotone in s for every config
    out.groupBy(t => (t._1, t._2)).values.foreach { leg =>
      val curve = leg.toSeq.sortBy(_._3).map(_._4)
      assert(curve == curve.sorted)
    }
  }

  test("q476: the W=8 leg IS q462's configuration; every leg is sane") {
    val curve = run("q476_hnsw_recall_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(curve.map(_._1) == Seq(2L, 4L, 8L))
    assert(curve.forall(_._3 == 15L))
    assert(curve.forall(t => t._2 >= 0L && t._2 <= 15L))
    val q462hits = run("q462_hnsw_two_layer").collect().head.getLong(2)
    assert(curve.last._2 == q462hits)
  }

  test("q477: the migration matrix replays from local hashes and " +
      "conserves mass") {
    val out = run("q477_resplit_migration").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    def band(x: Long, t: Long, v: Long): String =
      if (x < t) "train" else if (x < v) "valid" else "test"
    val pairs = docs.map { case (id, _, _) =>
      val h = h32(s"split$id")
      (band(h % 100L, 80, 90), band(h % 1000L, 800, 900))
    }
    val cells = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = cells.map { case ((o, n), c) =>
      (o, n, c, c * 1000000L / ot(o), o != n)
    }.toSet
    assert(out == want)
    assert(out.toSeq.map(_._3).sum == docs.size.toLong)
    // old-split refinement conserves mass: each old split's cells sum to
    // its total, so the ppm shares sum to ≤ 1e6 (floor loss only)
    out.groupBy(_._1).values.foreach { g =>
      val s = g.toSeq.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - g.size.toLong)
    }
  }
}
