package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining distinctive TPC-H query shapes expressible on the trimmed
  * driver schema (no partsupp table, no shipmode/commit/receipt dates, no
  * container/phone columns — Q2/Q11/Q16/Q20 need partsupp and are not
  * expressible; Q12/Q21/Q22 are adapted to the available columns with their
  * plan shapes intact).
  *
  * Like the rest of the library these exist for their PLAN shapes — CASE
  * aggregation over a fact-fact join, view + scalar-max reuse, correlated
  * per-group thresholds, disjunctive join predicates, two-level market-share
  * division, double-correlated EXISTS/NOT EXISTS on one fact, anti join
  * against a global scalar — each the canonical stress of one optimizer
  * capability (SURVEY.md §2.3 joins/aggregations rows).
  *
  * Determinism rules are the library-wide ones (graft.QueryDef): exact
  * DECIMAL sums, pinned double expressions written token-identically in the
  * DuckDB oracles, no engine-native averages inside comparisons (x > avg
  * is restated as x·n > Σ — exact integer/decimal math on both sides).
  */
object ShapeQueries {

  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── TPC-H Q12 shape: CASE aggregation over a fact-fact join ───────────
    QueryDef(
      "q118_tpch_q12_lateship",
      // late-shipment priority split: lines shipped >30 days after their
      // order date, classified by order priority per return flag. Both
      // inputs are facts — the join shuffles on the order key, the CASE
      // sums ride the same aggregation (no second pass).
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00"))
        li.join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
          .groupBy(col("l_returnflag").as("flag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag AS flag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY
              GROUP BY 1""")
    ),

    // ── TPC-H Q14: promo revenue share (two sums, one pinned division) ────
    QueryDef(
      "q119_tpch_q14_promo",
      // share of revenue from PROMO parts in one month. One broadcast dim
      // join, one global aggregate computing BOTH sums in a single pass;
      // the percentage is one pinned double expression over exact decimals.
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-03-01 00:00:00") &&
            col("l_shipdate") < ts("1996-04-01 00:00:00"))
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg((sum(when(col("p_type") === "PROMO", rev)).cast("double") *
            lit(100.0) / sum(rev).cast("double")).as("promo_revenue")),
      Some(s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $SQL_REV END) AS DOUBLE)
                 * 100.0 / CAST(sum($SQL_REV) AS DOUBLE) AS promo_revenue
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""")
    ),

    // ── TPC-H Q15: revenue view + scalar max, view reused twice ───────────
    QueryDef(
      "q120_tpch_q15_topsupp",
      // top supplier(s) by quarterly revenue: the per-supplier revenue
      // aggregate is computed once and consumed twice (scalar max + the
      // equality probe). Decimal revenue keeps the max-equality exact.
      // The max is a GLOBAL window over the aggregate: the view's two
      // consumers collapse into one pass over the (order-of-|supplier|,
      // i.e. already fact-reduced) aggregate, so the lineitem scan runs
      // ONCE with ordinary recomputable lineage. This replaces a
      // localCheckpoint (executor-pinned, lineage-severed — one lost
      // executor failed the query at scale); a reuse-exchange split was
      // tried and does NOT work here: self-join attribute dedup re-aliases
      // one subtree, breaking Exchange canonical equality. The
      // single-partition window input is the aggregate, not the fact —
      // the same data volume the old 1-row max broadcast already forced
      // through one node.
      (s, d) => {
        val revenue = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1996-04-01 00:00:00"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(rev).as("total_rev"))
        revenue
          .withColumn("m", max(col("total_rev")).over(Window.partitionBy()))
          .filter(col("total_rev") === col("m"))
          .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
            col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
      },
      Some(s"""WITH revenue AS (
                 SELECT l_suppkey AS supplier_no, sum($SQL_REV) AS total_rev
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY 1)
               SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
               FROM supplier JOIN revenue ON s_suppkey = supplier_no
               WHERE total_rev = (SELECT max(total_rev) FROM revenue)""")
    ),

    // ── TPC-H Q17: correlated per-group threshold (avg restated exactly) ──
    QueryDef(
      "q121_tpch_q17_smallqty",
      // revenue impact of small-quantity lines: l_quantity < 0.2 × the
      // part's average quantity. The correlated average is restated as
      // 5·qty·n < Σqty — exact decimal/integer math, no division anywhere
      // near the comparison. Filtered parts broadcast; the per-part stats
      // come from whole-partition WINDOW aggregates, so the probe rows and
      // their group totals share ONE shuffle on l_partkey — no stats
      // self-join, and the filtered fact is scanned exactly once (a
      // groupBy + re-join form scans it twice: self-join re-aliasing
      // defeats ReuseExchange, see q120).
      (s, d) => {
        val pp = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23" && col("p_size") <= 5)
          .select("p_partkey")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_partkey")
        Tables.lineitem(s, d)
          .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .withColumn("sq", sum(dec(col("l_quantity"))).over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          .filter(dec(col("l_quantity")) * lit(5) * col("cnt") < col("sq"))
          .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
            .as("avg_yearly"))
      },
      Some("""WITH pp AS (SELECT p_partkey FROM part
                          WHERE p_brand = 'Brand#23' AND p_size <= 5),
              lp AS (SELECT l_partkey, l_quantity, l_extendedprice
                     FROM lineitem JOIN pp ON l_partkey = p_partkey),
              st AS (SELECT l_partkey AS k,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                       count(*) AS cnt
                     FROM lp GROUP BY 1)
              SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
              FROM lp JOIN st ON l_partkey = k
              WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq""")
    ),

    // ── TPC-H Q19: disjunctive OR-of-ANDs join predicate ──────────────────
    QueryDef(
      "q122_tpch_q19_disjunct",
      // three brand/size/quantity bands OR'd together on top of the equi
      // key. Catalyst keeps the equi conjunct as the hash-join key and
      // evaluates the disjunction as a residual — never a nested-loop —
      // and infers a combined quantity range filter pushable to the scan.
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey") && (
              (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
                col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
                col("l_quantity").between(20, 30))))
          .agg(sum(rev).cast("double").as("revenue")),
      Some(s"""SELECT CAST(sum($SQL_REV) AS DOUBLE) AS revenue
               FROM lineitem JOIN part ON l_partkey = p_partkey
                AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
                  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
                  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""")
    ),

    // ── TPC-H Q8: market share (two-level agg, conditional numerator) ─────
    QueryDef(
      "q123_tpch_q8_mktshare",
      // NATION_3's share of ECONOMY-part revenue sold into AMERICA, by
      // order year. Five dims broadcast (part, supplier, nation×2, region
      // via customer); the only shuffles are the two fact joins
      // (lineitem ⋈ orders ⋈ customer-keys) and the final 2-row aggregate.
      // Share = one pinned double division over two exact decimal sums.
      (s, d) => {
        val amNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("am_nk"))
        val amCust = Tables.customer(s, d)
          .join(broadcast(amNations), col("c_nationkey") === col("am_nk"))
          .select("c_custkey")
        val suppNation = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "ECONOMY").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00")),
            col("l_orderkey") === col("o_orderkey"))
          .join(amCust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_3", rev)
              .otherwise(lit(0).cast(DecimalType(16, 4)))).cast("double") /
            sum(rev).cast("double")).as("mkt_share"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN $SQL_REV ELSE 0 END) AS DOUBLE)
                   / CAST(sum($SQL_REV) AS DOUBLE) AS mkt_share
               FROM lineitem
               JOIN part ON l_partkey = p_partkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
                 AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
               GROUP BY 1""")
    ),

    // ── TPC-H Q21 shape: EXISTS + NOT EXISTS, both on the probe fact ──────
    QueryDef(
      "q124_tpch_q21_soleblame",
      // suppliers solely to blame for a returned multi-supplier order:
      // an R-flagged line on an 'F' order where ANOTHER supplier shipped a
      // line (EXISTS) but NO other supplier's line was returned
      // (NOT EXISTS). Both subqueries decorrelate onto the same fact —
      // a left-semi and a left-anti join sharing the orderkey shuffle.
      // (The reference schema has no commit/receipt dates; returnflag
      // stands in for "kept waiting" with the identical plan shape.)
      (s, d) => {
        Tables.supplier(s, d).createOrReplaceTempView("graft_q124_supplier")
        Tables.lineitem(s, d).createOrReplaceTempView("graft_q124_lineitem")
        Tables.orders(s, d).createOrReplaceTempView("graft_q124_orders")
        Tables.nation(s, d).createOrReplaceTempView("graft_q124_nation")
        s.sql("""SELECT s_name, count(*) AS numwait
                 FROM graft_q124_supplier
                 JOIN graft_q124_lineitem l1 ON s_suppkey = l1.l_suppkey
                 JOIN graft_q124_orders ON o_orderkey = l1.l_orderkey
                 JOIN graft_q124_nation ON s_nationkey = n_nationkey
                 WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                   AND n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
                   AND EXISTS (SELECT /*+ SHUFFLE_HASH(l2) */ 1
                               FROM graft_q124_lineitem l2
                               WHERE l2.l_orderkey = l1.l_orderkey
                                 AND l2.l_suppkey <> l1.l_suppkey)
                   AND NOT EXISTS (SELECT /*+ SHUFFLE_HASH(l3) */ 1
                               FROM graft_q124_lineitem l3
                               WHERE l3.l_orderkey = l1.l_orderkey
                                 AND l3.l_suppkey <> l1.l_suppkey
                                 AND l3.l_returnflag = 'R')
                 GROUP BY s_name""")
      },
      Some("""SELECT s_name, count(*) AS numwait
              FROM supplier
              JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
              JOIN orders ON o_orderkey = l1.l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                AND n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_returnflag = 'R')
              GROUP BY s_name""")
    ),

    // ── TPC-H Q22 shape: anti join + global scalar threshold ──────────────
    QueryDef(
      "q125_tpch_q22_idlerich",
      // customers above the positive-balance average with no RECENT orders
      // (none since 2000), rolled up by nation. The global average is restated as
      // bal·n > Σ (exact decimal — engine-native AVG never appears in a
      // comparison); the 1-row global aggregate broadcasts under every
      // customer row, the no-orders test decorrelates to a left-anti join.
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_q125_customer")
        Tables.orders(s, d).createOrReplaceTempView("graft_q125_orders")
        s.sql("""WITH pos AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                        count(*) AS n
                      FROM graft_q125_customer WHERE c_acctbal > 0)
                 SELECT c_nationkey AS cntrycode,
                   count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
                 FROM graft_q125_customer, pos
                 WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
                   AND NOT EXISTS (SELECT 1 FROM graft_q125_orders
                                   WHERE o_custkey = c_custkey
                                     AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
                 GROUP BY 1""")
      },
      Some("""WITH pos AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                     count(*) AS n
                   FROM customer WHERE c_acctbal > 0)
              SELECT c_nationkey AS cntrycode,
                count(*) AS numcust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
              FROM customer, pos
              WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
              GROUP BY 1""")
    ),

    // ── null-safe equi join (<=> / IS NOT DISTINCT FROM) ──────────────────
    QueryDef(
      "q131_nullsafe_join",
      // NULL join keys: plain `=` drops null-keyed rows on both sides;
      // `<=>` matches null with null (one hash-join key, null as a real
      // key value). Keys are NULLIF-derived so both behaviors are
      // exercised on real data: segment is null for BUILDING customers,
      // priority-bucket null for 5-LOW orders. The output contrasts the
      // two predicates' match counts per segment.
      (s, d) => {
        val a = Tables.customer(s, d)
          .filter(col("c_custkey") % 50 === 0)
          .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
            col("c_custkey"))
        val b = Tables.customer(s, d)
          .filter(col("c_custkey") % 3 === 0)
          .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg2"),
            col("c_custkey").as("ck2"))
        val nullSafe = a.join(b, col("seg") <=> col("seg2"))
          .groupBy(coalesce(col("seg"), lit("<null>")).as("k"))
          .agg(count(lit(1)).as("n_nullsafe"))
        val strict = a.join(b, col("seg") === col("seg2"))
          .groupBy(coalesce(col("seg"), lit("<null>")).as("k"))
          .agg(count(lit(1)).as("n_strict"))
        nullSafe.join(strict, Seq("k"), "left_outer")
          .select(col("k"), col("n_nullsafe"),
            coalesce(col("n_strict"), lit(0L)).as("n_strict"))
      },
      Some("""WITH a AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_custkey
                         FROM customer WHERE c_custkey % 50 = 0),
              b AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg2,
                           c_custkey AS ck2
                    FROM customer WHERE c_custkey % 3 = 0),
              ns AS (SELECT coalesce(seg, '<null>') AS k, count(*) AS n_nullsafe
                     FROM a JOIN b ON seg IS NOT DISTINCT FROM seg2
                     GROUP BY 1),
              st AS (SELECT coalesce(seg, '<null>') AS k, count(*) AS n_strict
                     FROM a JOIN b ON seg = seg2
                     GROUP BY 1)
              SELECT k, n_nullsafe, coalesce(n_strict, 0) AS n_strict
              FROM ns LEFT JOIN st USING (k)""")
    ),

    // ── TPC-H Q13 shape: customer order-count distribution ────────────────
    QueryDef(
      "q235_tpch_q13",
      // The custdist histogram — the one TPC-H shape the suite was
      // missing: a LEFT OUTER join whose PREDICATE LIVES IN THE ON
      // CLAUSE (customers whose only orders are excluded must still
      // appear with count 0 — a WHERE would drop them, the classic Q13
      // trap), followed by two stacked aggregations (orders per
      // customer, then customers per order-count). The exclusion
      // predicate stands in for Q13's comment filter (this orders table
      // has no o_comment): drop '3-LOW' priority orders.
      //
      // Shape, and why it scales: one shuffled outer join on custkey
      // (both sides key-partitioned; no broadcast — customer is a fact
      // here), one custkey-grain aggregation that rides the SAME
      // partitioning (no second shuffle until the tiny histogram agg),
      // then a distribution-grain hash agg of ≤ max-orders-per-customer
      // rows.
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
        val perCust = Tables.customer(s, d).select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "3-LOW", "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c LEFT OUTER JOIN orders o
                  ON c.c_custkey = o.o_custkey
                  AND o.o_orderpriority <> '3-LOW'
                GROUP BY 1)
              GROUP BY 1""")
    )
  )
}
