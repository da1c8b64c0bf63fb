package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the r14-verdict task-5 question: does riding
  * the oriented-edge (`ed`) table on a BUCKETED layout (bucketBy(u) +
  * sortBy(u) — the q153 write-once-shuffle-never contract) beat the
  * shipped checkpoint + shuffle_hash wedge join, in local mode, at sf1?
  *
  * The bucketed layout removes BOTH exchanges feeding the wedge
  * self-join (x and y co-locate on u straight off the scan); the closing
  * join's wedge-stream exchange (Σ outdeg² rows on (w1, w2)) is
  * unavoidable under either layout because its key differs from the
  * wedge key. So the experiment isolates exactly the exchange the
  * bucketed layout can save, plus the cost it adds (a sorted bucketed
  * write of `ed` instead of a checkpoint).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 runMain graft.tools.TriangleLayoutBench
  * Prints one line per variant: build seconds + triple count (the count
  * doubles as the equivalence check between variants).
  */
object TriangleLayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft_tribench_wh_")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shared inputs (memoized once, paid before either timed variant)
    val e = graft.operators.GraphQueries.coPurchaseEdges(spark, sfDir)
    val deg = graft.operators.GraphQueries.coPurchaseDegrees(spark, sfDir)
    e.count(); deg.count()

    def orientedEdges = e
      .join(deg.select(col("v").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("degb")), "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("degb")).otherwise(col("dega")).as("dv"))

    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[tribench] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s" +
        f"  n_triples=$n%d")
    }

    // variant A: the shipped local path (checkpoint + shuffle_hash)
    time("shipped-exchange") {
      graft.operators.GraphQueries
        .triangleTriplesBuild(spark, sfDir, useBloom = false).count()
    }

    // variant B: bucketed ed — wedge join co-located off the scan
    // (repartition-first = one file per bucket, the shipped form: the
    // scan then reports the sortBy ordering and the SMJ needs at most
    // the self-join wart's one local sort)
    time("bucketed-layout") {
      spark.sql("DROP TABLE IF EXISTS graft_tribench_ed")
      orientedEdges.repartition(cpus.toInt, col("u"))
        .write.mode("overwrite")
        .bucketBy(cpus.toInt, "u").sortBy("u")
        .format("parquet").saveAsTable("graft_tribench_ed")
      val edb = spark.table("graft_tribench_ed")
      val x = edb.select(col("u"), col("v").as("w1"), col("dv").as("d1"))
      val y = edb.select(col("u"), col("v").as("w2"), col("dv").as("d2"))
      x.join(y, "u")
        .filter(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
        .join(edb.select(col("u").as("w1"), col("v").as("w2"))
          .hint("shuffle_hash"), Seq("w1", "w2"))
        .select("u", "w1", "w2")
        .count()
    }

    spark.stop()
  }
}
