package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every declared query
  * at `SPARK_GRAFT_SF_DIR` and prints exactly one JSON line.
  *
  * A short warmup action runs first so the first timed query doesn't absorb
  * session/codegen/JIT startup (~4s otherwise lands on an arbitrary query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional args: restrict to named queries (local iteration aid; the
    // driver passes none, so the contract surface is unchanged)
    val only = args.toSet
    // a typo'd name must not silently bench zero queries and "succeed"
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + shuffle + codegen machinery once, untimed
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // noop sink materializes EVERY output column (count() would let
      // Catalyst prune expensive projections and under-measure)
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            // a failed query must NOT masquerade as a fast one
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      // min of two runs: steady-state time, robust to one-off GC pauses
      val (a, b) = (once(), once())
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (-1 sentinel) must invalidate the suite, not shrink the
    // total: exclude them from the sum, list them, and exit nonzero
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
