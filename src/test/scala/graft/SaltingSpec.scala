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
}
