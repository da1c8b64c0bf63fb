package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and independent-reimplementation proofs for the
  * round-11 batch-15 operators (runs test, Shapley attribution, Gumbel
  * maxima, RBO, Haar energy, exposure share).
  */
class Round11mOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dailyEvents(): Array[(Long, Long)] = {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    Tables.events(spark, sf)
      .groupBy(expr(s"ts div ${dayNs}L").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("runs test: runs, counts and z match a direct sequential recomputation; alternating fixture maximizes runs") {
    val xs = dailyEvents().sortBy(_._1)
    val byDay = xs.toMap
    val signs = xs.flatMap { case (day, x) =>
      byDay.get(day + 1).collect {
        case x1 if x1 != x => (day, x1 > x) }
    }.sortBy(_._1).map(_._2)
    val nUp = signs.count(identity).toLong
    val nDown = signs.length.toLong - nUp
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val mu = 2.0 * nUp.toDouble * nDown.toDouble /
      (nUp + nDown).toDouble + 1.0
    val z = (runs.toDouble - mu) /
      math.sqrt((mu - 1.0) * (mu - 2.0) / ((nUp + nDown).toDouble - 1.0))
    val out = run("q403_runs_test").head
    assert(out.getLong(0) == nUp && out.getLong(1) == nDown)
    assert(out.getLong(2) == runs, "runs")
    assert(out.getDouble(3) == z, "z")
    // pure-Scala fixture: perfectly alternating signs give n runs
    val alt = Seq(true, false, true, false, true)
    assert(1 + alt.zip(alt.tail).count(p => p._1 != p._2) == alt.length)
  }

  test("Shapley: values match a direct lattice recomputation; efficiency sums to v(N) - v(empty)") {
    val users = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).values.map { g =>
        val ts = g.map(_._2).toSet
        val cell = (if (ts("click")) 1 else 0) +
          (if (ts("view")) 2 else 0) + (if (ts("signup")) 4 else 0)
        (cell, if (ts("purchase")) 1L else 0L)
      }.toSeq
    val v = (0 to 7).map { c =>
      val in = users.filter(_._1 == c)
      if (in.isEmpty) 0.0 else in.map(_._2).sum.toDouble / in.length
    }
    val w3 = 1.0 / 3.0; val w6 = 1.0 / 6.0
    val phiC = w3 * (v(1) - v(0)) + w6 * (v(3) - v(2)) +
      w6 * (v(5) - v(4)) + w3 * (v(7) - v(6))
    val phiV = w3 * (v(2) - v(0)) + w6 * (v(3) - v(1)) +
      w6 * (v(6) - v(4)) + w3 * (v(7) - v(5))
    val phiS = w3 * (v(4) - v(0)) + w6 * (v(5) - v(1)) +
      w6 * (v(6) - v(2)) + w3 * (v(7) - v(3))
    val out = run("q404_shapley_attribution").head
    assert(out.getDouble(0) == phiC && out.getDouble(1) == phiV &&
      out.getDouble(2) == phiS)
    assert(out.getDouble(3) == v(7) && out.getDouble(4) == v(0))
    // efficiency axiom (float tolerance: different summation order)
    assert(math.abs(out.getDouble(0) + out.getDouble(1) +
      out.getDouble(2) - (v(7) - v(0))) < 1e-12)
  }

  test("Gumbel maxima: method-of-moments fit matches a direct recomputation; scale positive, return level above location") {
    val daily = Tables.orders(spark, sf)
      .select((unix_timestamp(col("o_orderdate")) / 86400L).cast("long")
        .as("day"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long")
          .as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxima = daily.groupBy(_._1 / 30).values
      .map(_.map(_._2).max).toSeq
    val n = maxima.length.toLong
    val sm = maxima.sum
    val qm = maxima.map(m => BigInt(m) * m).sum
    val mbar = sm.toDouble / n.toDouble
    val sd = math.sqrt((n.toDouble * qm.toDouble -
      sm.toDouble * sm.toDouble) / (n.toDouble * (n.toDouble - 1.0)))
    val beta = sd * 0.7796968012336609
    val mu = mbar - 0.5772156649015329 * beta
    val rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 12.0))
    val out = run("q405_gumbel_maxima").head
    assert(out.getLong(0) == n)
    assert(out.getDouble(1) == mu && out.getDouble(2) == beta)
    assert(out.getDouble(3) == rl)
    assert(beta > 0.0 && rl > mu, "12-block return level above location")
  }

  test("RBO: matches a direct recomputation of both rankings; bounded in [0,1]; identical lists give the full truncated mass") {
    // ranker A: BM25 top-10
    val a = operators.ExtQueries.bm25Top50(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    // ranker B: cosine top-10 vs query 0
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }
        .foldLeft(0.0)(_ + _)
    val qv = embs.find(_._1 == 0L).get._2
    val b = embs.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(qv, v) /
        (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v)))) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val rbo = (1 to 10).map { dd =>
      val ov = a.take(dd).toSet.intersect(b.take(dd).toSet).size
      0.1 * math.pow(0.9, dd - 1) * ov.toDouble / dd.toDouble
    }.foldLeft(0.0)(_ + _)
    val out = run("q406_rbo").head
    assert(out.getLong(0) ==
      a.toSet.intersect(b.toSet).size.toLong, "overlap@10")
    assert(out.getDouble(1) == rbo, s"${out.getDouble(1)} != $rbo")
    assert(out.getDouble(1) >= 0.0 && out.getDouble(1) <= 1.0)
    // identical lists: truncated RBO mass = sum of the 10 weights
    val full = (1 to 10).map(dd => 0.1 * math.pow(0.9, dd - 1))
      .foldLeft(0.0)(_ + _)
    assert(full < 1.0 && full > 0.65)
  }

  test("Haar energy: level energies match a direct dyadic recomputation; constant fixture has zero energy") {
    val xs = dailyEvents().toMap
    val out = run("q407_haar_energy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1 to 3).foreach { l =>
      val span = 1L << l; val half = 1L << (l - 1)
      val blocks = xs.keys.groupBy(_ / span)
        .filter(_._2.size == span.toInt)
      val energy = blocks.map { case (_, days) =>
        val lft = days.filter(d => (d / half) % 2 == 0).map(xs).sum
        val rgt = days.filter(d => (d / half) % 2 != 0).map(xs).sum
        BigInt(lft - rgt) * (lft - rgt)
      }.sum
      assert(out(l.toLong)._1 == blocks.size.toLong, s"level $l blocks")
      assert(BigInt(out(l.toLong)._2) == energy, s"level $l energy")
    }
    // constant series fixture: every detail is zero
    val const = (0L until 8L).map(d => d -> 5L).toMap
    val e1 = const.keys.groupBy(_ / 2).map { case (_, ds) =>
      val l = ds.filter(d => d % 2 == 0).map(const).sum
      val r = ds.filter(d => d % 2 != 0).map(const).sum
      BigInt(l - r) * (l - r)
    }.sum
    assert(e1 == 0)
  }

  test("exposure share: matches a direct panel recomputation; exposure ppm sums to ~1e6") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val srcs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }
        .foldLeft(0.0)(_ + _)
    val discs = (1 to 10).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    val expo = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val hits = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    (0L until 10L).foreach { qid =>
      val qv = embs.find(_._1 == qid).get._2
      embs.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(qv, v) /
          (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v)))) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
        .zipWithIndex.foreach { case ((id, _), i) =>
          expo(srcs(id)) += discs(i)
          hits(srcs(id)) += 1
        }
    }
    val te = expo.values.sum
    val out = run("q408_exposure_share").collect()
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) == hits(src), s"$src hits")
      assert(r.getLong(2) == expo(src) * 1000000L / te, s"$src ppm")
    }
    assert(out.map(_.getLong(1)).sum == 100L, "panel is 10x10")
    val totPpm = out.map(_.getLong(2)).sum
    assert(totPpm <= 1000000L && totPpm > 1000000L - out.length,
      "floor-rounded shares sum to ~1e6")
  }
}
