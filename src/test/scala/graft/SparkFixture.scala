package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (reference tests use a fresh TempDir per
  * test, `/root/reference/tests/integration_test.rs:9-19`; the session is
  * shared, the per-test DB dirs are fresh).
  */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
