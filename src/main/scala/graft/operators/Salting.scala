package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (SURVEY.md §7.4.4; the "salting
  * for skew" tool in the 100 TB kit, complementing AQE's runtime skew-join
  * splitting which only covers sort-merge joins).
  *
  * Aggregation: `saltedAgg` spreads each hot key over `salts` partial
  * groups (two-level aggregate). Both levels are map-side-combining hash
  * aggregates; correctness holds for any decomposable aggregate passed as
  * (partial, merge) column pairs.
  *
  * Broadcast-side replication join: `saltedJoin` salts the big (skewed)
  * side randomly-but-deterministically (hash of all columns mod salts) and
  * replicates the small side once per salt — an equi-join whose key space
  * is `salts`× finer, so no single task drowns in one key.
  */
object Salting {

  /** Per-row salt in [0, salts), independent of row CONTENT — a
    * content-hash salt would put all copies of an identical hot row in one
    * sub-group, defeating the whole point for the classic duplicate-row
    * skew case. monotonically_increasing_id is partition-position based:
    * stable within a run (results are salt-invariant anyway) and spreads
    * identical rows evenly.
    */
  private def saltOf(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")

  /** Two-level salted sum/count aggregation over one key.
    * Output: key, n (count), sum of `valueCol` (long-exact).
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      saltOf(salts))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }

  /** Salted equi-join of a skewed big side against a small dimension:
    * big side gets a deterministic salt, dim side is exploded once per
    * salt value, and the join key becomes (key, salt).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      saltOf(salts))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(repDim,
      saltedBig(key) === repDim(key) && saltedBig("__salt") === repDim("__salt"))
      .drop(repDim(key)).drop(saltedBig("__salt")).drop(repDim("__salt"))
  }
}
