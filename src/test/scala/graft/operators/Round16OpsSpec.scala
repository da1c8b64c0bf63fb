package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 proofs: the ANN churn-loop capstone (q504) — the decision
  * sequence is replayed from independently recomputed planner volumes, a
  * scalar walk re-derives the step-2 repair candidate count from the
  * collected edge list, the memoized mid-states are equivalence-checked
  * against a live replay of the verbs they cache, and the maintained
  * index's serve is pinned inside the gold rebuild's recall envelope on
  * a genuinely different graph (non-vacuity).
  */
class Round16OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private lazy val row = SparkEntry.queries("q504_ann_churn_loop")(spark, sf)
    .collect().head

  private def L(name: String) = row.getAs[Long](name)
  private def S(name: String) = row.getAs[String](name)

  test("q504: the decision sequence replays from the emitted planner " +
      "volumes against the literal crossover") {
    def decide(reb: Long, rep: Long): String =
      if (reb >= R16Queries.Crossover * rep) "repair" else "rebuild"
    assert(S("s2_decision") ==
      decide(L("s2_rebuild_scored"), L("s2_repair_scored")))
    assert(S("s3_decision") ==
      decide(L("s3_rebuild_scored"), L("s3_repair_scored")))
    assert(S("s4_decision") ==
      decide(L("s4_rebuild_scored"), L("s4_repair_scored")))
    // and the sequence is the one the schedule was sized to produce:
    // fixed-count tombstone batches repair, the ~31% bulk batch rebuilds
    assert(S("s2_decision") == "repair", row.toString)
    assert(S("s3_decision") == "rebuild", row.toString)
    assert(S("s4_decision") == "repair", row.toString)
  }

  test("q504: a scalar walk over the collected G1 edge list re-derives " +
      "the step-2 repair volume (u -> dead t -> v, v != u)") {
    val edges = R16Queries.churnG1(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def dead(x: Long) = x % 30 == 0 && x < 500
    val outOf = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var n = 0L
    for {
      (u, t) <- edges if !dead(u) && dead(t)
      v <- outOf.getOrElse(t, Array.empty[Long]) if !dead(v) && v != u
    } n += 1
    assert(n == L("s2_repair_scored"),
      s"scalar walk found $n candidates, query reported ${L("s2_repair_scored")}")
    // churn-sized, never corpus-quadratic: bounded by tombstones × the
    // graph's max in×out degree product
    val maxDeg = edges.groupBy(_._1).values.map(_.length.toLong).max
    assert(n <= L("s2_tombstoned") * maxDeg * maxDeg)
  }

  test("q504: the memoized mid-state G2 is EXACTLY the live replay of " +
      "the step-2 repair verb on G1 (decision-safety of the memo)") {
    Shared.withCheckpointDir(spark) {
      val c = R12Queries.corpusVecs(spark, sf)
      val g1 = R16Queries.churnG1(spark, sf)
      val dead = (x: org.apache.spark.sql.Column) => x % 30 === 0 && x < 500
      val live = R16Queries.repairGraph(c, g1,
        R16Queries.repairCand(g1, dead), dead)
      val (g2, _) = R16Queries.churnMid(spark, sf)
      assert(live.exceptAll(g2).isEmpty && g2.exceptAll(live).isEmpty,
        "memoized G2 must equal the live repair of G1")
    }
  }

  test("q504: non-vacuous eval — the maintained graph differs from the " +
      "one-shot gold rebuild, and its serve stays inside the recall " +
      "envelope") {
    // the final repair keeps bridge edges a fresh build would not draw;
    // if the two graphs coincided, the maintained-vs-gold comparison
    // would be comparing a thing to itself
    Shared.withCheckpointDir(spark) {
      val c = R12Queries.corpusVecs(spark, sf)
      val l4 = c.filter(col("cid") % 3 =!= 0 &&
        !(col("cid") % 50 === 4 && col("cid") < 500))
      val gold = R16Queries.memoBuild(spark, sf, "churngold", l4)
      assert(L("s4_edges") != gold.count() ||
        L("n_hits_maintained") != L("n_hits_gold"),
        "maintained state must be distinguishable from the gold rebuild")
    }
    // the measured envelope: churn-priced maintenance never costs more
    // than one hit of recall vs the corpus-priced always-rebuild policy
    assert(L("n_hits_maintained") >= L("n_hits_gold") - 1,
      s"maintained ${L("n_hits_maintained")} vs gold ${L("n_hits_gold")}")
    assert(L("n_possible") == 15L)
  }

  test("q504: churn bookkeeping is consistent — fixed-count batches, " +
      "fraction-sized bulk batch, edge counts monotone where verbs add") {
    // T1 and T3 are the bounded-below-500 sets (scale-stable by design)
    assert(L("s2_tombstoned") > 0 && L("s2_tombstoned") <= 17)
    assert(L("s4_tombstoned") > 0 && L("s4_tombstoned") <= 10)
    // the bulk batch is corpus-fraction-sized: ~a third of the live set
    assert(L("s3_tombstoned") > L("s2_tombstoned") * 4)
    // arrivals attach symmetrized edges: the post-insert graph can only
    // have grown vs the initial build's edge set it unions
    assert(L("s1_edges") > 0 && L("s2_edges") > 0)
    // the repair's real invariant (edge COUNT may move either way — up
    // to 2·RepairM bridges arrive per (in-neighbor, tombstone) while
    // dead-incident edges leave): no tombstone survives as an endpoint
    val (g2, _) = R16Queries.churnMid(spark, sf)
    val deadLeft = g2.filter(
      (col("src") % 30 === 0 && col("src") < 500) ||
      (col("dst") % 30 === 0 && col("dst") < 500)).count()
    assert(deadLeft == 0L,
      s"$deadLeft dead-incident edges survived the step-2 repair")
  }
}
