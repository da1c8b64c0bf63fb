package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The four canonical TPC-H join shapes blocked on `partsupp` — a table the
  * driver test data does not ship. A deterministic partsupp is synthesized
  * from part × supplier with the TPC-H generator's own supplier-assignment
  * formula (4 suppliers per part, shifted to this corpus's 0-based keys),
  * so BOTH engines derive the identical relation from the same two parquet
  * tables: the Spark side as a DataFrame, the oracle as a SQL CTE — the
  * same fixture trick as [[graft.multimodal.Multimodal.mediaFromDocuments]].
  *
  * Costs are integer cents (BIGINT), the library's exact-money convention —
  * every aggregate below stays in integer space, so cross-engine hashes
  * can't drift (see [[Shared]]).
  *
  * Scale posture: partsupp is |part|×4 rows — the *fact* side of these
  * shapes. Dim reductions (supplier/nation/region/part filters) broadcast;
  * the one intentional fact-grain shuffle per query is the aggregation or
  * window its TPC-H original requires.
  */
object PartsuppQueries {

  import Shared._

  /** TPC-H supplier-assignment: part p's i-th supplier (i in 0..3) is
    * `(p + i·(S/4 + p/S)) mod S` — S = |supplier|, integer division,
    * 0-based keys. availqty and supplycost are cheap affine mixes, unique
    * per (part, i), value-bounded (qty ≤ 9999, cost ≤ 999.99 + 1.00).
    */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    val sCnt = Tables.supplier(s, d).agg(count(lit(1)).as("s_cnt"))
    Tables.part(s, d).select("p_partkey")
      .crossJoin(broadcast(sCnt))
      .select(col("p_partkey"), col("s_cnt"),
        explode(typedlit(Seq(0L, 1L, 2L, 3L))).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        expr("(p_partkey + i * (s_cnt div 4 + p_partkey div s_cnt)) % s_cnt")
          .as("ps_suppkey"),
        expr("(p_partkey * 7 + i * 11) % 9998 + 1").as("ps_availqty"),
        expr("(p_partkey * 31 + i * 13) % 99900 + 100")
          .as("ps_supplycost_cents"))
  }

  /** the oracle-side identical derivation (prepend to each query's SQL) */
  private val SQL_PARTSUPP =
    """WITH sc AS (SELECT count(*) AS s_cnt FROM supplier),
      partsupp AS (
        SELECT p_partkey AS ps_partkey,
          (p_partkey + i * (s_cnt // 4 + p_partkey // s_cnt)) % s_cnt AS ps_suppkey,
          (p_partkey * 7 + i * 11) % 9998 + 1 AS ps_availqty,
          (p_partkey * 31 + i * 13) % 99900 + 100 AS ps_supplycost_cents
        FROM part, sc, unnest([0, 1, 2, 3]) AS u(i))"""

  val all: Seq[QueryDef] = Seq(

    // ── TPC-H Q2 shape: min-cost supplier per part in a region ────────────
    QueryDef(
      "q132_tpch_q2_mincost",
      // The correlated "cost = (SELECT min(cost) … same part, same region)"
      // subquery becomes a window-min over the region-restricted partsupp:
      // dims (supplier→nation→region, part filter) broadcast onto the
      // partsupp fact, ONE shuffle on ps_partkey computes the per-part min
      // alongside the rows it qualifies — no join-back, no second pass.
      (s, d) => {
        val supEu = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val p = Tables.part(s, d)
          .filter(col("p_type") === "STANDARD")
          .select("p_partkey", "p_brand")
        val w = Window.partitionBy("ps_partkey")
        partsupp(s, d)
          .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
          .join(broadcast(supEu), col("ps_suppkey") === col("s_suppkey"))
          .withColumn("min_cost", min(col("ps_supplycost_cents")).over(w))
          .filter(col("ps_supplycost_cents") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"),
            col("ps_supplycost_cents").as("cost_cents"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some(s"""$SQL_PARTSUPP,
              eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
              SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                ps_supplycost_cents AS cost_cents
              FROM (
                SELECT *, min(ps_supplycost_cents)
                    OVER (PARTITION BY ps_partkey) AS min_cost
                FROM partsupp
                JOIN part ON ps_partkey = p_partkey
                JOIN eu ON ps_suppkey = s_suppkey
                WHERE p_type = 'STANDARD')
              WHERE ps_supplycost_cents = min_cost
              ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
              LIMIT 100""")
    ),

    // ── TPC-H Q11 shape: high-value partkeys in one nation ────────────────
    QueryDef(
      "q133_tpch_q11_value",
      // Groupwise sum vs a global-total threshold: the nation-filtered
      // partsupp aggregates once by partkey; the global total re-aggregates
      // the (already tiny) per-part sums and broadcasts as a 1-row scalar —
      // the fact is scanned ONCE (no second pass for the total), integer
      // cents throughout.
      (s, d) => {
        val supN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val perPart = partsupp(s, d)
          .join(broadcast(supN), col("ps_suppkey") === col("s_suppkey"))
          .groupBy("ps_partkey")
          .agg(sum(col("ps_supplycost_cents") * col("ps_availqty"))
            .as("value_cents"))
        val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
        perPart.crossJoin(broadcast(total))
          .filter(col("value_cents") > expr("total_cents div 2000"))
          .select("ps_partkey", "value_cents")
          .orderBy(col("value_cents").desc, col("ps_partkey"))
      },
      Some(s"""$SQL_PARTSUPP,
              nsup AS (SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_7'),
              per_part AS (
                SELECT ps_partkey,
                  CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
                    AS value_cents
                FROM partsupp JOIN nsup ON ps_suppkey = s_suppkey
                GROUP BY ps_partkey)
              SELECT ps_partkey, value_cents
              FROM per_part
              WHERE value_cents >
                (SELECT CAST(sum(value_cents) AS BIGINT) // 2000 FROM per_part)
              ORDER BY value_cents DESC, ps_partkey""")
    ),

    // ── TPC-H Q16 shape: supplier count by brand/type/size ────────────────
    QueryDef(
      "q134_tpch_q16_suppcnt",
      // COUNT(DISTINCT) over an anti-joined fact: "complaint" suppliers
      // (negative balance — the corpus has no comment text) are excluded
      // via a broadcast anti-join; part attribute filters broadcast; one
      // shuffle for the distinct-count aggregate.
      (s, d) => {
        val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select("s_suppkey")
        val p = Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        partsupp(s, d)
          .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
            "left_anti")
          .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"),
            col("p_size").cast("long").as("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some(s"""$SQL_PARTSUPP
              SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                count(DISTINCT ps_suppkey) AS supplier_cnt
              FROM partsupp
              JOIN part ON ps_partkey = p_partkey
              WHERE ps_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
                AND p_brand <> 'Brand#2' AND p_type <> 'PROMO'
                AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
              GROUP BY 1, 2, 3
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    ),

    // ── TPC-H Q20 shape: suppliers with excess stock of red parts ─────────
    QueryDef(
      "q135_tpch_q20_excess",
      // Nested-EXISTS chain flattened to its join-shape: the 1996 shipped
      // quantity aggregates lineitem once at (part, supplier) grain; the
      // red-part restriction left-semi-joins BEFORE that shuffle (prune
      // early); partsupp joins the aggregate on its natural key and the
      // excess-stock predicate (availqty > half shipped qty, exact decimal)
      // selects suppliers, deduped and named via broadcast supplier.
      (s, d) => {
        val red = Tables.part(s, d).filter(col("p_name").contains("red"))
          .select("p_partkey")
        val shipped = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .join(broadcast(red), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
        partsupp(s, d)
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").contains("red")).select("p_partkey")),
            col("ps_partkey") === col("p_partkey"), "left_semi")
          .join(shipped, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
          .filter(col("ps_availqty") * 2 > col("sum_qty"))
          .select("ps_suppkey").distinct()
          .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      Some(s"""$SQL_PARTSUPP,
              red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
              shipped AS (
                SELECT l_partkey, l_suppkey,
                  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                  AND l_partkey IN (SELECT p_partkey FROM red)
                GROUP BY 1, 2)
              SELECT DISTINCT s_suppkey, s_name
              FROM partsupp
              JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
              JOIN supplier ON ps_suppkey = s_suppkey
              WHERE ps_partkey IN (SELECT p_partkey FROM red)
                AND ps_availqty * 2 > sum_qty
              ORDER BY s_suppkey""")
    )
  )
}
