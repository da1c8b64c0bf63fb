package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 is declared as a [[QueryDef]]
  * in one of the operator modules; this object flattens them into the
  * driver-facing maps.
  */
object SparkEntry {

  /** All declared queries, assembled from the operator modules. */
  def defs: Seq[QueryDef] =
    operators.CoreQueries.all ++
      operators.TextQueries.all ++
      operators.SimilarityQueries.all ++
      operators.MultimodalQueries.all ++
      operators.EventQueries.all ++
      operators.ExtQueries.all ++
      operators.ShapeQueries.all ++
      operators.PartsuppQueries.all ++
      operators.SketchQueries.all ++
      operators.GraphQueries.all ++
      operators.R11Queries.all ++
      operators.R11bQueries.all ++
      operators.R11cQueries.all ++
      operators.R11dQueries.all ++
      operators.R11eQueries.all ++
      operators.R11fQueries.all ++
      operators.R11gQueries.all ++
      operators.R11hQueries.all ++
      operators.R11iQueries.all ++
      operators.R11jQueries.all ++
      operators.R11kQueries.all ++
      operators.R11lQueries.all ++
      operators.R11mQueries.all ++
      operators.R11nQueries.all ++
      operators.R11oQueries.all ++
      operators.R11pQueries.all ++
      operators.R11qQueries.all ++
      operators.R11rQueries.all ++
      operators.R12Queries.all ++
      operators.R12bQueries.all ++
      operators.R12cQueries.all ++
      operators.R12dQueries.all ++
      operators.R12eQueries.all ++
      operators.R13Queries.all ++
      operators.R13bQueries.all ++
      operators.R13cQueries.all ++
      operators.R13dQueries.all ++
      operators.R13eQueries.all ++
      operators.R13fQueries.all ++
      operators.R13gQueries.all ++
      operators.R13hQueries.all ++
      operators.R13iQueries.all ++
      operators.R13jQueries.all ++
      operators.R14Queries.all ++
      operators.R15Queries.all ++
      operators.R16Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is SURVEY.md §7.2's minimum slice: pruned scan → filter → hash
    * aggregate over the star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    defs.find(_.name == "q04_tpch_q1").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
