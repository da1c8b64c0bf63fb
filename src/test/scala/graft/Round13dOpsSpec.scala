package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation proofs for the round-13 batch-4
  * composition capstones: the effective-mass water-filling allocation
  * replays end-to-end from raw collected documents; the near-dup
  * leakage audit's aggregation replays from the component labels +
  * locally recomputed split flags, with the exact-conservation bounds
  * pinned.
  */
class Round13dOpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).selectExpr("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  test("q478: the dedup-discounted water-filling replays end-to-end and " +
      "conserves the budget exactly") {
    val out = run("q478_effective_budget_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // effective micro-token panel from raw docs
    val keyed = docs.map { case (_, src, text) =>
      (md5hex(text.trim.replaceAll("\\s+", " ").toLowerCase), src,
        text.trim.split("\\s+").length.toLong)
    }
    val csize = keyed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val panel = keyed.groupBy(_._2).view.mapValues(
      _.map { case (h, _, nt) => nt * (1000000L / csize(h)) }.sum).toMap
    // q446's sorted-prefix water level on the effective panel
    val tt = panel.values.sum
    val b = tt / 4
    val ns = panel.size.toLong
    val sorted = panel.toSeq.sortBy { case (src, e) => (e, src) }
    val pfx = sorted.map(_._2).scanLeft(0L)(_ + _)
    val isfull = sorted.zipWithIndex.map { case ((_, e), i) =>
      pfx(i) + e * (ns - i) <= b
    }
    val k = isfull.count(identity).toLong
    val pk = sorted.zip(isfull).collect { case ((_, e), true) => e }.sum
    val want = sorted.zipWithIndex.map { case ((src, e), i) =>
      val alloc =
        if (isfull(i)) e
        else (b - pk) / (ns - k) +
          (if (i + 1 - k <= (b - pk) % (ns - k)) 1L else 0L)
      (src, e, alloc, alloc * 1000L / e)
    }.toSet
    assert(out == want)
    // the construction's defining property: Σ alloc = B exactly
    assert(want.toSeq.map(_._3).sum == b)
    out.foreach { case (_, e, a, _) => assert(a <= e) }
  }

  test("q479: the near-dup leakage aggregation replays from component " +
      "labels and local split flags") {
    val out = run("q479_neardup_split_leakage").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    def bucket(id: Long): Long = h32(s"split$id") % 100L
    val nTest = docs.count(d => bucket(d._1) >= 90L).toLong
    // component labels are the shared memoized table (its own closure is
    // proven by QueriesSpec's q158 tests); the AUDIT's aggregation over
    // them is what replays here
    val comp = operators.TextQueries.winnowComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byComp = comp.groupBy(_._2)
    val nt = byComp.values.map(_.count(c => bucket(c._1) >= 90L)).sum.toLong
    val leaked = byComp.values.filter(_.exists(c => bucket(c._1) < 80L))
      .map(_.count(c => bucket(c._1) >= 90L)).sum.toLong
    assert(out == ((nTest, nt, leaked, leaked * 1000000L / nTest)))
    assert(out._3 <= out._2 && out._2 <= out._1)
  }
}
