package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    Tables.lineitem(spark, d).groupBy("l_returnflag").count().collect()
    for (name <- args) {
      // time construction separately: queries that materialize scratch
      // intermediates (winnow family) run a real job inside fn()
      val tC = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      println(s"PROBE $name construct=${(t0-tC)/1e9} exec=${(t1-t0)/1e9} total=${(t1-tC)/1e9}")
      df.explain("formatted")
    }
    spark.stop()
  }
}
