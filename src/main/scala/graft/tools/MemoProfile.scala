package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Times the internal memoized BUILDERS in isolation (fresh JVM, one
  * builder per arg, in arg order) with a per-stage breakdown — the §1
  * measurement loop for costs that the per-query bench can only
  * attribute to a first payer. Builder names resolve through
  * [[graft.operators.BuilderPlans]]; each is forced with a noop write.
  *
  * Usage: runMain graft.tools.MemoProfile shingleset jpairs [...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object MemoProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, ms: Long, nTasks: Int, taskSumMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.add(St(i.stageId, i.name.takeWhile(_ != '\n'), ms,
          i.numTasks, i.taskMetrics.executorRunTime))
      }
    })
    Tables.lineitem(spark, d).groupBy("l_returnflag").count().collect()
    import scala.jdk.CollectionConverters._
    for (name <- args) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.operators.BuilderPlans(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val all = stages.asScala.toSeq.sortBy(-_.ms)
      println(f"MEMOPROFILE $name total=$secs%.2f stages=${all.size} " +
        f"sum_stage_wall=${all.map(_.ms).sum / 1e3}%.2f s cpus=$cpus")
      all.take(20).foreach { s =>
        println(f"  stage ${s.id}%5d ${s.ms}%6d ms tasks=${s.nTasks}%4d " +
          f"taskSum=${s.taskSumMs}%6d ms  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
