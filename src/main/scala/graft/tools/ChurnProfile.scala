package graft.operators

import org.apache.spark.sql.SparkSession

/** One-off cold/warm profiler for q504 (round-16 tuning aid, the
  * TriangleLayoutBench pattern): the cold run pays the churn memos
  * (`churng1`/`churnmid`/`churnb3`/`churngold`/`churneval`), warm runs
  * measure the loop's live verbs — planner sheets, the step-4 repair,
  * the maintained serve. Not part of the driver contract.
  */
object ChurnProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val fn = graft.SparkEntry.queries("q504_ann_churn_loop")
    t("cold") { fn(spark, d).write.format("noop").mode("overwrite").save() }
    t("warm1") { fn(spark, d).write.format("noop").mode("overwrite").save() }
    t("warm2") { fn(spark, d).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
