package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Cross-engine determinism helpers shared by every operator file.
  *
  * Each convention exists in exactly one place — a Spark-side form and,
  * where the oracles need it, a token-identical DuckDB mirror (`SQL_*`) so
  * the decimal promotion chain / hash family can never drift between
  * queries or engines (the driver compare is value-hash exact).
  */
private[operators] object Shared {

  // ── exact decimal arithmetic (order-independent aggregation) ───────────
  /** exact 2-decimal cast — makes double aggregation order-independent */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec12(c: Column): Column = c.cast(DecimalType(12, 2))
  def dec3(c: Column): Column = c.cast(DecimalType(3, 2))
  val one: Column = lit(1).cast(DecimalType(3, 2))
  /** order-independent exact sum of a 2-decimal double, as double */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")
  def SUMD(c: String) = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** exact discounted revenue: price × (1 − discount), all DECIMAL */
  def rev: Column =
    dec12(col("l_extendedprice")) * (one - dec3(col("l_discount")))
  val SQL_REV =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  /** timestamp literal (session timezone is pinned to UTC everywhere) */
  def ts(s: String): Column = lit(s).cast(TimestampType)

  // ── text tokenization + the shared 32-bit hash family ──────────────────
  /** whitespace tokens of the trimmed text */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Fixed scratch root for queries that materialize layouts/intermediates:
    * one directory per (tag, JVM, dataset dir), so repeated invocations in
    * a process overwrite one directory instead of accumulating copies,
    * while concurrent sessions on the same machine (different pids) and
    * different datasets (path hash — pid scoping also confines any Int
    * hashCode collision between data dirs to a single process) never race
    * on the same path.
    */
  def scratchRoot(tag: String, d: String): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(d.hashCode))
  val SQL_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"

  /** 32-bit base hash of a string: first 8 md5 hex chars as a Long — the
    * one digest both engines share. MinHash seeds derive from it with
    * affine transforms (see TextQueries) rather than fresh digests.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  def SQL_H32(x: String) =
    s"CAST(('0x' || substring(md5($x), 1, 8)) AS BIGINT)"

  /** sequential left-to-right sum fold — matches DuckDB list_aggregate sum
    * (double addition is order-sensitive; never use a parallel reduce)
    */
  def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)
}
