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

  /** ensure a RELIABLE checkpoint dir is set (deployment: durable HDFS/S3
    * path; single-node runs default to the local tmpdir), then run body
    */
  def withCheckpointDir[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        sys.props("java.io.tmpdir") + "/graft-checkpoints")
    body
  }

  /** Distributed connected components via min-label propagation to a
    * fixpoint (the step after pair generation in any dedup pipeline —
    * q73's loop, extracted so every candidate-pair source can reuse it):
    * each round ships every node's current label to its neighbors and
    * keeps the minimum — O(diameter) rounds, each one shuffle join + one
    * shuffle aggregation, with RELIABLE checkpoints truncating the growing
    * lineage (localCheckpoint would pin loop state to executor storage and
    * sever lineage — one lost executor over a many-round job at 100 TB
    * fails the whole query; reliable checkpoint survives it, costing one
    * small write per round of label-table size, not fact size). At extreme
    * scale the round count drops to O(log n) with the large-star/small-star
    * transform; near-dup graph diameters are tiny in practice.
    *
    * Input: `nodes` with column id, `edges` with columns (a, b), treated
    * as undirected. Output: (id, comp), comp = the component's min id.
    */
  def minLabelComponents(s: org.apache.spark.sql.SparkSession,
      nodes: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    withCheckpointDir(s) {
      // checkpoint: edges are scanned every round — compute them once
      val e = edges.select("a", "b").checkpoint()
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      var labels = nodes.select(col("id"), col("id").as("comp")).checkpoint()
      // labels only ever decrease, so Σcomp strictly decreases until the
      // fixpoint — a single scalar aggregate per round detects convergence
      // without a compare join (null sum = empty node set = converged)
      def labelSum(df: org.apache.spark.sql.DataFrame): Long =
        Option(df.agg(sum("comp")).collect()(0).get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
      var prevSum = labelSum(labels)
      var iter = 0
      // ONE propagation hop per materialized round (measured: a second
      // hop before each checkpoint doubles the joins per round, and at
      // near-dup graph diameters — tiny in practice — the extra join
      // costs more than the saved per-round job overhead; r3 bench
      // regressed 2.14→2.82 s with double-hop)
      def hop(l: org.apache.spark.sql.DataFrame) = {
        val prop = sym.join(l, sym("a") === l("id"))
          .select(col("b").as("id"), col("comp"))
        l.union(prop).groupBy("id").agg(min("comp").as("comp"))
      }
      var converged = false
      while (!converged && iter < 25) {
        // LAZY checkpoint: the convergence probe right below is the
        // action that materializes it — one job per round, not two
        val next = hop(labels).checkpoint(eager = false)
        val nextSum = labelSum(next)
        labels = next
        iter += 1
        converged = nextSum == prevSum
        prevSum = nextSum
      }
      // a wrong answer must never be silent: 25 rounds covers any
      // component of diameter ≤ 25; beyond that, fail loudly rather than
      // emit partial components
      if (!converged) throw new IllegalStateException(
        s"minLabelComponents: label propagation did not converge in $iter rounds")
      labels
    }

  /** Fixed scratch root for queries that materialize layouts/intermediates:
    * one directory per (tag, JVM, dataset dir), so repeated invocations in
    * a process overwrite one directory instead of accumulating copies,
    * while concurrent sessions on the same machine (different pids) and
    * different datasets (path hash — pid scoping also confines any Int
    * hashCode collision between data dirs to a single process) never race
    * on the same path. Every root handed out is registered for recursive
    * deletion at JVM exit, and the first call per process also sweeps
    * stale `graft_*` roots whose owning pid is no longer alive, so
    * repeated benchmark/test processes don't accumulate unbounded tmp
    * usage (the roots hold sf-sized bucketed table copies / fingerprint
    * ladders).
    */
  def scratchRoot(tag: String, d: String): java.nio.file.Path = {
    scratchJanitor // one-time per process: exit hook + stale sweep
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(d.hashCode))
    createdScratchRoots.add(p)
    p
  }

  private val createdScratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      // best-effort: a file vanishing mid-walk (another cleaner, the OS
      // tmp reaper) must not abort the rest of the sweep
      try walk.sorted(java.util.Comparator.reverseOrder[Path]()).forEach {
        (q: Path) => try Files.deleteIfExists(q)
          catch { case _: java.io.IOException => () }
      } finally walk.close()
    }
  }

  /** One-time janitor: (a) an exit hook deleting every scratch root this
    * JVM created — scratch is by definition reproducible, so nothing of
    * value can be lost; (b) a startup sweep of `graft_<tag>_<pid>_<hash>`
    * directories whose pid is dead (crashed/killed JVMs never reach their
    * exit hook). Live pids — including this one — are never touched, so
    * concurrent sessions remain safe.
    */
  private lazy val scratchJanitor: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      createdScratchRoots.forEach(deleteRecursively(_))))
    val self = ProcessHandle.current().pid()
    val pat = java.util.regex.Pattern.compile("graft_.+_(\\d+)_[0-9a-f]+")
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val ls = java.nio.file.Files.list(tmp)
    try ls.forEach { (p: java.nio.file.Path) =>
      val m = pat.matcher(p.getFileName.toString)
      if (m.matches()) {
        val pid = m.group(1).toLong
        if (pid != self && !ProcessHandle.of(pid).map[Boolean](_.isAlive)
              .orElse(false))
          deleteRecursively(p)
      }
    } finally ls.close()
  }
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
