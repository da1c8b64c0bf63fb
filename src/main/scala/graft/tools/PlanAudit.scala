package graft.tools

import graft.SparkEntry

/** Plan-shape audit aid: prints window/exchange/scan counts (and the full
  * formatted plan with -v) for named queries at sf0.001 — the quick
  * ".explain and iterate" loop the build discipline calls for, runnable
  * without spinning up a spec.
  *
  * Usage: runMain graft.tools.PlanAudit [-v] <queryName> [...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- names) {
      val p = SparkEntry.queries(q)(s, sf).queryExecution.executedPlan.toString
      println(q + " windows=" + "\\bWindow\\b".r.findAllIn(p).size +
        " exchanges=" + "Exchange".r.findAllIn(p).size +
        " parquet_scans=" + "Scan parquet".r.findAllIn(p).size)
      if (verbose) println(p)
    }
    s.stop()
  }
}
