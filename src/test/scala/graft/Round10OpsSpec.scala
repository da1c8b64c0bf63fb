package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture property proofs for the round-10 operator families —
  * the semantics the sf0.01 oracle can confirm but not EXPLAIN: CDC's
  * resync property, Kaplan-Meier's censoring behavior, Merkle diff
  * localization, the consistent-hashing remap bound, raking's marginal
  * convergence, and NDCG's range contract.
  */
class Round10OpsSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  // the engine's shared 32-bit digest (Shared.h32), driver-side
  private def h32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("CDC chunking resyncs after an insertion where fixed-width chunking never does (q309's reason to exist)") {
    // 300-token sequence; B = A with ONE token inserted at position 5
    val a = (0 until 300).map(i => s"w$i")
    val b = a.take(5) ++ Seq("INSERTED") ++ a.drop(5)
    def cdcChunks(t: Seq[String]): Seq[String] = {
      val cuts = (0 until t.length).map(q =>
        q <= t.length - 3 &&
          h32(s"${t(q)} ${t(q + 1)} ${t(q + 2)}") % 16 == 0)
      val ids = cuts.scanLeft(0)((acc, c) => acc + (if (c) 1 else 0)).tail
      t.zip(ids).groupBy(_._2).values.map(_.map(_._1).mkString(" ")).toSeq
    }
    def fixedChunks(t: Seq[String]): Seq[String] =
      t.grouped(4).map(_.mkString(" ")).toSeq
    val cdcShared = cdcChunks(a).toSet.intersect(cdcChunks(b).toSet)
    val fixShared = fixedChunks(a).toSet.intersect(fixedChunks(b).toSet)
      .filterNot(c => a.take(5).mkString(" ").startsWith(c.split(" ").head))
    // content-defined boundaries realign downstream of the next cut —
    // most of A's chunks survive the edit; fixed-width boundaries shift
    // by one token forever, so nothing after the edit point matches
    assert(cdcShared.size >= 5,
      s"CDC should resync after the edit, shared=${cdcShared.size}")
    val fixAfterEdit = fixedChunks(a).drop(2).toSet
      .intersect(fixedChunks(b).drop(2).toSet)
    assert(fixAfterEdit.isEmpty,
      s"fixed-width chunks after the edit must all shift: $fixAfterEdit")
  }

  test("Kaplan-Meier treats the censored exit as still-alive (q295's correction of naive churn)") {
    // u1: lifetime 2 (churned); u2: lifetime 5 touching the horizon
    // (CENSORED); u3: lifetime 0 (churned); u4: lifetime 0 at the
    // horizon day (censored)
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val rows = Seq(
      (1L, 0L * dayNs, 1L, "view", "{}"), (2L, 2L * dayNs, 1L, "view", "{}"),
      (3L, 0L * dayNs, 2L, "view", "{}"), (4L, 5L * dayNs, 2L, "view", "{}"),
      (5L, 0L * dayNs, 3L, "view", "{}"),
      (6L, 5L * dayNs, 4L, "view", "{}"))
    val dir = Files.createTempDirectory("km").toString
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "props")
      .withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q295_kaplan_meier")(spark, dir)
      .orderBy("t").collect()
    // grain: t=0 (d=1 u3, c=1 u4), t=2 (d=1 u1), t=5 (c=1 u2)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 5L))
    val byT = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byT(0L) == ((4L, 1L, 1L, 0.75)))        // S(0)=1-1/4
    assert(byT(2L) == ((2L, 1L, 0L, 0.375)))       // S(2)=0.75*(1-1/2)
    // the censored exit at t=5 must NOT move the curve (d=0 there)
    assert(byT(5L) == ((1L, 0L, 1L, 0.375)))
    // naive churn (censored counted as churned) would read 0.0 — the
    // bias this estimator exists to avoid
  }

  test("Merkle digest localizes a single-row difference to its bucket (q310's O(log) diff)") {
    val schema = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    def write(dir: String, perturbKey: Long): Unit = {
      val s = spark
      import s.implicits._
      (0L until 600L).map(k => (k, k % 37,
          if (k == perturbKey) "X" else "O",
          100.0 + k, "2024-01-01 00:00:00", "1-URGENT"))
        .toDF(schema: _*)
        .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
    val d1 = Files.createTempDirectory("mk1").toString
    val d2 = Files.createTempDirectory("mk2").toString
    val d3 = Files.createTempDirectory("mk3").toString
    write(d1, -1L)   // clean
    write(d2, 500L)  // differs in bucket 1 (500 div 256)
    write(d3, 5L)    // differs in bucket 0
    def dig(dir: String): (String, String) = {
      val r = SparkEntry.queries("q310_merkle_digest")(spark, dir).head
      (r.getAs[String]("root_digest"), r.getAs[String]("bucket0_digest"))
    }
    val (r1, b1) = dig(d1); val (r2, b2) = dig(d2); val (r3, b3) = dig(d3)
    assert(r1 != r2 && r1 != r3, "any row change must move the root")
    assert(b1 == b2, "a bucket-1 change must leave bucket 0's digest intact")
    assert(b1 != b3, "a bucket-0 change must move bucket 0's digest")
  }

  test("consistent hashing remaps strictly less than mod-N on 8->9 growth (q302's claim)") {
    val out = SparkEntry.queries("q302_consistent_hashing")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("ring_16vn") < out("mod_n"),
      s"ring must beat mod-N: $out")
    // theory: ring ≈ 1/9 ≈ 111k ppm, mod ≈ 8/9 ≈ 889k ppm
    assert(out("mod_n") > 600000L && out("ring_16vn") < 400000L, s"$out")
  }

  test("raking hits both marginal targets within integer-truncation slack (q304's fixpoint)") {
    val df = SparkEntry.queries("q304_raking")(spark, sf)
    val tot = df.agg(sum("w_milli")).head.getLong(0)
    val bySrc = df.groupBy("source").agg(sum("w_milli").as("w"))
      .collect().map(_.getLong(1))
    val byLang = df.groupBy("lang").agg(sum("w_milli").as("w"))
      .collect().map(_.getLong(1))
    val ts = tot.toDouble / bySrc.length
    val cl = tot.toDouble / byLang.length
    // rows were scaled LAST → tight; columns one round earlier → looser
    bySrc.foreach(w => assert(math.abs(w - ts) / ts < 0.02,
      s"source marginal off: $w vs $ts"))
    byLang.foreach(w => assert(math.abs(w - cl) / cl < 0.25,
      s"lang marginal off: $w vs $cl"))
  }

  test("NDCG stays in [0,1] and IDCG dominates DCG (q307's contract)") {
    val r = SparkEntry.queries("q307_ndcg_eval")(spark, sf).head
    val (dcg, idcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"))
    if (r.getLong(0) > 0) {
      val ndcg = r.getAs[Double]("ndcg")
      assert(idcg >= dcg - 1e-12 && ndcg >= 0.0 && ndcg <= 1.0 + 1e-12,
        s"dcg=$dcg idcg=$idcg ndcg=$ndcg")
    }
  }
}
