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
      val df = SparkEntry.queries(name)(spark, d)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"PROBE $name ${(System.nanoTime()-t0)/1e9}")
      df.explain("formatted")
    }
    spark.stop()
  }
}
