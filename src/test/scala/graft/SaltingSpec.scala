package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation/join must be value-identical to the unsalted forms —
  * salting only changes the partitioning of the work.
  */
class SaltingSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("salted count+sum equals plain groupBy on a skewed key") {
    val e = Tables.events(spark, sf)
    val salted = Salting.saltedCountSum(
        e, "event_type", (col("value") * 100).cast("long"), salts = 8)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum((col("value") * 100).cast("long")).as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join against a small dimension") {
    val e = Tables.events(spark, sf).select("event_id", "event_type", "user_id")
    val dim = Tables.events(spark, sf).select(col("event_type")).distinct()
      .withColumn("type_tag", upper(col("event_type")))
    val salted = Salting.saltedJoin(e, dim, "event_type", salts = 4)
      .select("event_id", "type_tag").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val plain = e.join(dim, "event_type")
      .select("event_id", "type_tag").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(salted.length == plain.length && salted.toSeq == plain.toSeq)
  }

  test("salted agg spreads a hot key across salt sub-groups in the plan") {
    // two-level aggregate: the first groupBy carries the salt column
    val e = Tables.events(spark, sf)
    val df = Salting.saltedCountSum(e, "event_type", col("event_id"), salts = 8)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("__salt"), p)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // The canonical 100× killer is a full shuffle onto one hot key. AQE's
    // skew-join handling must split the oversized partition at runtime —
    // thresholds lowered here so the small fixture triggers the same
    // re-plan a 100 TB hot key would. Salting.saltedJoin stays the static
    // fallback for plans AQE skew handling doesn't cover (broadcast-side,
    // non-sort-merge).
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // ~198k of 200k rows collapse onto key 0 → one partition holds >90%
      // of the join input; the rest are near-empty. The payload is an
      // incompressible md5 and flows INTO the aggregate — skew detection
      // reads compressed map-output sizes, so a pruned or all-zero column
      // would deflate the hot partition below the threshold.
      val big = spark.range(0, 200000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 2000)
        .select(col("id").as("k"), (col("id") % 7).as("w"))
      val j = big.join(dim, "k").groupBy("w")
        .agg(sum(length(col("payload"))).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected a runtime skew-split sort-merge join in:\n$p")
    }
  }
}
