package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-12 batch-4
  * operators (k-truss, governance audits, Benford, Laplace DP).
  */
class Round12dOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q454: full fixpoint peel recomputes exactly; every surviving edge holds support >= k-2 at termination") {
    val r = run("q454_ktruss").head
    assert(r.getLong(0) == 18L, "k")
    val (rounds, nFinal, tFinal) = (r.getLong(1), r.getLong(2), r.getLong(3))
    // independent LOCAL peel to fixpoint on the collected edge set
    def measure(es: Set[(Long, Long)]): (Map[(Long, Long), Long], Long) = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
        .withDefaultValue(Set.empty)
      es.foreach { case (a, b) => adj(a) = adj(a) + b; adj(b) = adj(b) + a }
      var nTri = 0L
      val supp = es.iterator.map { case (a, b) =>
        val common = adj(a) intersect adj(b)
        nTri += common.count(_ > b) // count each triangle at its max vertex
        (a, b) -> common.size.toLong
      }.toMap
      (supp, nTri)
    }
    var edges = operators.GraphQueries.coPurchaseEdges(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    var myRounds = 0
    var lastTri = 0L
    var done = false
    while (!done && myRounds < 24) {
      val (supp, nTri) = measure(edges)
      lastTri = nTri
      val next = edges.filter(e => supp(e) >= 16L)
      done = next.size == edges.size
      edges = next
      myRounds += 1
    }
    assert(done, "local peel must converge")
    assert(rounds == myRounds.toLong, s"rounds: query $rounds vs local $myRounds")
    assert(nFinal == edges.size.toLong, "final edge count")
    assert(tFinal == lastTri, "final triangle count")
    // the TERMINATION property, directly: every survivor has support
    // ≥ k−2 = 16 within the surviving set (this is what fixpoint means)
    val (fsupp, _) = measure(edges)
    edges.foreach(e => assert(fsupp(e) >= 16L, s"edge $e under-supported"))
    // and the oracle's 8-round unroll bound holds with margin
    assert(myRounds <= 6, s"fixpoint took $myRounds rounds — oracle unroll at risk")
  }

  test("q455: flags recompute exactly from the raw customer rows") {
    val out = run("q455_k_anonymity").collect()
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => ((r.getInt(0).toLong, r.getString(1)), r.getDouble(2) < 0))
    val by = rows.groupBy(_._1)
    assert(out.length == by.size)
    out.foreach { r =>
      val g = by((r.getLong(0), r.getString(1)))
      assert(r.getLong(2) == g.length.toLong)
      assert(r.getLong(3) == g.map(_._2).distinct.length.toLong)
      assert(r.getBoolean(4) == (g.length < 5 || g.map(_._2).distinct.length < 2))
    }
  }

  test("q456: digit counts cover every order; Benford shares match the closed form") {
    val out = run("q456_benford").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.map(_._2).sum == nOrders)
    assert(out.forall(o => o._1 >= 1 && o._1 <= 9))
    out.foreach { case (d, _, obs, ben) =>
      assert(ben ==
        math.floor(1e6 * math.log(1.0 + 1.0 / d) / math.log(10.0)).toLong, s"digit $d")
      assert(obs >= 0 && obs <= 1000000)
    }
    // Benford expectations themselves sum to ~1e6 (sanity of the formula)
    val full = (1 to 9).map(d =>
      math.floor(1e6 * math.log(1.0 + 1.0 / d) / math.log(10.0)).toLong).sum
    assert(full > 999990 && full <= 1000000)
  }

  test("q457: noise recomputes exactly from the seeded hash; noisy = true*1e6 + noise") {
    def h32(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val out = run("q457_dp_laplace_counts").collect()
    val truth = Tables.customer(spark, sf).groupBy("c_nationkey").count()
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(out.length == truth.size)
    out.foreach { r =>
      val nk = r.getLong(0)
      assert(r.getLong(1) == truth(nk))
      val u = (h32(s"dp$nk") % 1000000L + 1L).toDouble / 1000001.0
      val noise = math.floor(1e6 *
        (if (u >= 0.5) -1.0 else 1.0) * math.log(1.0 - 2.0 * math.abs(u - 0.5))).toLong
      assert(r.getLong(2) == noise, s"nation $nk")
      assert(r.getLong(3) == truth(nk) * 1000000L + noise)
    }
  }
}
