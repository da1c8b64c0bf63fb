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

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)])
      : String = {
    val dir = Files.createTempDirectory("evfix").toString
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("KS on planted disjoint supports reads D = 1 at the crossing point (q262 known answer)") {
    // every 'view' value strictly below every 'error' value
    val dir = writeEvents(
      (1L to 20L).map(i => (i, i * 1000L, i, "view", 1.0 + i * 0.01)) ++
        (21L to 40L).map(i => (i, i * 1000L, i, "error", 10.0 + i * 0.01)))
    val r = SparkEntry.queries("q262_ks_test")(spark, dir).head
    assert(r.getAs[Double]("d_stat") == 1.0, r.toString)
    // the gap peaks at the largest 'view' value: 1.20 → 120 cents
    assert(r.getAs[Long]("ks_at_cents") == 120L, r.toString)
  }

  test("Mann-Whitney on a planted total shift reads U = n1*n2 (q261 known answer)") {
    // every 'click' value strictly above every 'purchase' value → every
    // pairwise comparison favors click: U hits its maximum exactly
    val dir = writeEvents(
      (1L to 15L).map(i => (i, i * 1000L, i, "click", 100.0 + i)) ++
        (16L to 27L).map(i => (i, i * 1000L, i, "purchase", 1.0 + i * 0.1)))
    val r = SparkEntry.queries("q261_mann_whitney")(spark, dir).head
    assert(r.getAs[Long]("n_a") == 15L && r.getAs[Long]("n_b") == 12L)
    assert(r.getAs[Double]("u_a") == 15.0 * 12.0, r.toString)
    assert(r.getAs[Double]("z_score") > 4.0, r.toString)
  }

  test("PPS sampling gives an oversized doc multiplicity >= 2 (q265's size-proportionality)") {
    val df = SparkEntry.queries("q265_pps_sample")(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long").as("nc"))
    val w = docs.agg(sum("nc")).head.getLong(0)
    // k=50 ticks: any doc with n_chars > 2·W/50 MUST be hit ≥ 2 times;
    // conversely no doc may exceed ceil(k·size/W)+1
    val big = docs.filter(col("nc") > lit(2L * w / 50L))
      .join(df, Seq("doc_id"), "left")
      .select(coalesce(col("multiplicity"), lit(0L))).collect()
    big.foreach(r => assert(r.getLong(0) >= 2L))
    df.join(docs, "doc_id").collect().foreach { r =>
      val m = r.getAs[Long]("multiplicity")
      val bound = (50L * r.getAs[Long]("nc")) / w + 2L
      assert(m <= bound, s"multiplicity $m exceeds PPS bound $bound")
    }
  }

  test("hash bootstrap is bit-deterministic across runs (q268's auditability claim)") {
    val a = SparkEntry.queries("q268_bootstrap_ci")(spark, sf).head
    val b = SparkEntry.queries("q268_bootstrap_ci")(spark, sf).head
    assert(a == b, s"$a vs $b")
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("mean_chars") &&
      a.getAs[Double]("mean_chars") <= a.getAs[Double]("ci_hi"))
  }

  test("deseasonalized fence flags a planted spike that a weekday-blind fence would mask (q312)") {
    // 28 days, strong weekday pattern (weekend ~5x weekday), plus ONE
    // planted spike on day 17: after removing the day-of-week component
    // the spike is the only large residual
    val dayNs = 86400L * 1000L * 1000L * 1000L
    var id = 0L
    val rows = (0 until 28).flatMap { day =>
      val base = if (day % 7 >= 5) 50 else 10
      val n = base + (if (day == 17) 60 else 0)
      (0 until n).map { i => id += 1
        (id, day * dayNs + i * 1000L, id % 7, "view", 1.0) }
    }
    val dir = writeEvents(rows)
    val r = SparkEntry.queries("q312_seasonal_outliers")(spark, dir).head
    // the spike day is flagged along with its 3 weekday siblings (the
    // spike contaminates its own weekday mean — the documented property
    // of mean-based deseasonalization; a weekday-blind fence on this
    // series would instead flag all 8 weekend days): 4 flagged, the
    // earliest being the first dow-3 sibling
    assert(r.getAs[Long]("n_outlier_days") == 4L, r.toString)
    assert(r.getAs[Long]("first_outlier_day") == 3L, r.toString)
  }

  test("growth accounting identity holds cell-for-cell (q313: actives = new + retained + resurrected)") {
    val out = SparkEntry.queries("q313_growth_accounting")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("actives") == r.getAs[Long]("new_users") +
        r.getAs[Long]("retained") + r.getAs[Long]("resurrected"), r.toString)
    }
  }

  test("peak concurrency counts overlap but not touching sessions (q314's end-before-start rule)") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    val h = 3600L * 1000L * 1000L * 1000L
    // u1 and u2 OVERLAP (both active 10:00-11:00); u3 starts a new
    // session the exact micro u2's ends at a far later day — touching,
    // never concurrent (ends sort before starts at the same instant)
    val rows = Seq(
      (1L, 10L * h, 1L, "view", 1.0), (2L, 11L * h, 1L, "view", 1.0),
      (3L, 10L * h + 1L, 2L, "view", 1.0), (4L, 11L * h - 1L, 2L, "view", 1.0),
      (5L, 5L * dayNs, 3L, "view", 1.0),
      (6L, 5L * dayNs, 4L, "view", 1.0))
    // u3/u4 both single-event sessions at the SAME instant → that
    // instant has concurrency 2 as well; earlier pair also 2 → peak 2
    val dir = writeEvents(rows)
    val r = SparkEntry.queries("q314_peak_concurrency")(spark, dir).head
    // the 1h intra-user gaps exceed the 5-min rule → u1/u2 each
    // contribute TWO point sessions
    assert(r.getAs[Long]("n_sessions") == 6L, r.toString)
    assert(r.getAs[Long]("peak_concurrency") == 2L, r.toString)
    // the FIRST peak instant is the early overlap, not the later tie
    assert(r.getAs[Long]("peak_at_micros") == (10L * h + 1L) / 1000L,
      r.toString)
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
