package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Column names MUST match between the two (the driver sorts columns
  * by name before hashing values).
  *
  * Determinism rules used throughout the query library:
  *  - every double aggregation goes through an exact DECIMAL cast (the test
  *    data is exactly 2-decimal, FIXTURES.md) so sums are order-independent,
  *    then back to DOUBLE for a stable output type;
  *  - averages are written as sum/count (identical IEEE division on identical
  *    operands in both engines) rather than engine-native AVG;
  *  - top-k orderings always carry a unique tie-break key.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries worth timing at sf0.1 in the per-round bench */
    headline: Boolean = false
)
