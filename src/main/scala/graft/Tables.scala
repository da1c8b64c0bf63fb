package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference engine's only scan operator is a projected columnar scan over
  * its block format (`/root/reference/src/storage.rs:189-222,299-351`); here the
  * scan is Spark's vectorized Parquet reader, which supplies the same column
  * pruning and min/max block skipping natively (SURVEY.md §4).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet's `ts` column has changed physical type across driver
    // testdata generations: TIMESTAMP(NANOS) (int64, which Spark only
    // reads with the legacy nanosAsLong conf) earlier, TIMESTAMP(MICROS)
    // (read natively as TIMESTAMP_NTZ) since round 8. The engine's
    // internal contract is unchanged either way: `ts` is an epoch-NANO
    // BIGINT (ordering-equivalent, exact — micros data is just whole
    // thousands). The DuckDB oracles consume `epoch_us(ts)`, which yields
    // identical micros for either physical type, so both engines agree
    // without touching any query. Sessions pin UTC (Bench/Verify/fixture),
    // making the NTZ→instant cast below exact and timezone-independent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** epoch-nano BIGINT view of an events frame whose on-disk `ts` may be
    * either physical generation (see [[apply]]); shared by the batch
    * loader and the file-stream source so batch ≡ stream holds across
    * testdata generations
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    if (df.schema.fields.exists(f => f.name == "ts" &&
        f.dataType != org.apache.spark.sql.types.LongType))
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) * 1000L"))
    else df

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
