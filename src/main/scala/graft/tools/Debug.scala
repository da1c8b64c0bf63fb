package graft.tools
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def h32c(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def hashA(j: Int): Long = ((1103515245L * (j + 1) + 12345) % 1048576) | 1L
    def hashB(j: Int): Long = (1103515245L * (j + 101) + 12345) % 1048576

    val docs = Tables.documents(spark, sfDir).repartition(32)
    val tok = docs.withColumn("t", split(trim(col("text")), "\\s+"))
    val sh = tok.withColumn("sh",
      when(size(col("t")) >= 3, array_distinct(expr(
        "transform(sequence(1, size(t)-2), i -> concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2)))")))
        .otherwise(array().cast("array<string>")))
    val shF = sh.filter(size(col("sh")) > 0)
    val shh  = sh.withColumn("shh", transform(col("sh"), s => h32c(s)))
    val shhF = shF.withColumn("shh", transform(col("sh"), s => h32c(s)))
    def mh(base: org.apache.spark.sql.DataFrame, j: Int) =
      array_min(transform(col("shh"), h => (h * lit(hashA(j)) + lit(hashB(j))) % lit(4294967296L)))
    val sig16    = shh.select(col("doc_id") +: (0 until 16).map(j => mh(shh, j).as(s"mh$j")): _*)
    val sig16F   = shhF.select(col("doc_id") +: (0 until 16).map(j => mh(shhF, j).as(s"mh$j")): _*)
    val sigCat   = shh.select(col("doc_id"), concat_ws("|", (0 until 16).map(j => mh(shh, j)): _*).as("sig"))
    val sigCatF  = shhF.select(col("doc_id"), concat_ws("|", (0 until 16).map(j => mh(shhF, j)): _*).as("sig"))

    noop(docs) // warmup
    time("sig16 (16 cols, no filter)")(noop(sig16))
    time("sig16 + filter")(noop(sig16F))
    time("concat_ws, no filter")(noop(sigCat))
    time("concat_ws + filter")(noop(sigCatF))
    time("q37 full")(noop(SparkEntry.queries("q37_minhash_sig")(spark, sfDir)))
    spark.stop()
  }
}
