package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task breakdown for one or more declared queries —
  * the measurement harness the optimization guide's §1 loop needs when
  * the aggregate per-query number doesn't say WHERE the time goes.
  *
  * Usage: runMain graft.tools.StageProfile qNNN_name [more...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR (default sf0.1).
  * Prints each completed stage's duration, task count, and the
  * max/median task runtime (the §2.5 skew read), sorted by duration.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, ms: Long, nTasks: Int,
        taskMaxMs: Long, taskSumMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.add(St(i.stageId, i.name.takeWhile(_ != '\n'), ms,
          i.numTasks, -1L, i.taskMetrics.executorRunTime))
      }
    })
    Tables.lineitem(spark, d).groupBy("l_returnflag").count().collect()
    import scala.jdk.CollectionConverters._
    // GRAFT_PROFILE_WARM=1: also print the FIRST (warm) run's stages —
    // that run is where memo builds execute, so it is the only place
    // their stage breakdown is observable
    val profWarm = sys.env.get("GRAFT_PROFILE_WARM").contains("1")
    for (name <- args) {
      // warm run first: memo builds and JIT land here, the profiled run
      // reads steady state (what the bench's min-of-2 reports)
      stages.clear()
      val w0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      if (profWarm) {
        val all = stages.asScala.toSeq.sortBy(-_.ms)
        println(f"WARMPROFILE $name total=${(System.nanoTime() - w0) / 1e9}%.2f" +
          f" stages=${all.size} sum_stage_wall=${all.map(_.ms).sum / 1e3}%.2f s")
        all.take(30).foreach { s =>
          println(f"  wstage ${s.id}%5d ${s.ms}%6d ms tasks=${s.nTasks}%4d " +
            f"taskSum=${s.taskSumMs}%6d ms  ${s.name.take(90)}")
        }
      }
      stages.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"STAGEPROFILE $name construct=${(t1 - t0) / 1e9}%.2f " +
        f"exec=${(t2 - t1) / 1e9}%.2f total=${(t2 - t0) / 1e9}%.2f cpus=$cpus")
      val all = stages.asScala.toSeq.sortBy(-_.ms)
      val totMs = all.map(_.ms).sum
      println(f"  stages=${all.size} sum_stage_wall=${totMs / 1e3}%.2f s")
      all.take(30).foreach { s =>
        println(f"  stage ${s.id}%5d ${s.ms}%6d ms tasks=${s.nTasks}%4d " +
          f"taskSum=${s.taskSumMs}%6d ms  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
