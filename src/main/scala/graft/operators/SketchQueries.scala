package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import graft.sources.rtcdb.RtcdbFormat
import scala.jdk.CollectionConverters._

/** Sketch aggregates promoted to driver-visible oracle rows.
  *
  * Sketches (HLL, frequent-items) are approximate and their estimates are
  * NOT hash-stable across engines in general — the accuracy-bound checks
  * live in the spec suite. These two queries pin the *exact-recovery*
  * regime instead: every sketched domain here is far below the sketch's
  * capacity (≤7 distinct values vs 2^12 HLL registers / 10⁴ tracked
  * items), where both Spark sketch families return EXACT answers by
  * construction — so a plain `count(DISTINCT)`/`GROUP BY count` oracle is
  * a legitimate equality check, and any estimator regression (register
  * width, seed, merge bug) breaks the hash match loudly.
  *
  * Scale posture: sketches are the 100 TB answer to distinct-count and
  * top-k — constant-size state, partial+final merge, no exact-distinct
  * expand-shuffle. Both queries aggregate in one pass with map-side
  * partials.
  */
object SketchQueries {

  val all: Seq[QueryDef] = Seq(

    // ── distinct-count sketches in the exact-recovery regime ──────────────
    QueryDef(
      "q136_sketch_distinct",
      // Both families side by side per group: approx_count_distinct
      // (HyperLogLog++) and the Apache DataSketches HLL pair
      // (hll_sketch_agg → hll_sketch_estimate). Domains: 3 return flags,
      // 7 ship years.
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(
            approx_count_distinct(col("l_returnflag")).as("nd_flag"),
            approx_count_distinct(year(col("l_shipdate"))).as("nd_year"),
            hll_sketch_estimate(hll_sketch_agg(col("l_returnflag")))
              .as("nd_flag_ds"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_linestatus,
                count(DISTINCT l_returnflag) AS nd_flag,
                count(DISTINCT year(l_shipdate)) AS nd_year,
                count(DISTINCT l_returnflag) AS nd_flag_ds,
                count(*) AS n_rows
              FROM lineitem GROUP BY 1""")
    ),

    // ── frequent-items sketch in the exact-recovery regime ────────────────
    QueryDef(
      "q137_sketch_topk",
      // approx_top_k tracks 10⁴ items by default; over a 3-value domain
      // every count is exact, so exploding the sketch result reproduces
      // the full GROUP BY — counts AND items.
      (s, d) =>
        Tables.lineitem(s, d)
          .agg(expr("approx_top_k(l_returnflag, 3)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("item"), col("e.count").as("cnt")),
      Some("""SELECT l_returnflag AS item, count(*) AS cnt
              FROM lineitem GROUP BY 1""")
    ),

    // ── deliberately skewed shuffle join (AQE skew-split coverage) ────────
    QueryDef(
      "q138_skew_join",
      // Hot-key join: collapsing most order keys onto one value makes a
      // single shuffle partition hold >90% of the fact. Correctness here is
      // oracle-checked like any join; the AQE skew handling (runtime split
      // of the oversized partition, spark.sql.adaptive.skewJoin) is
      // asserted plan-level in SaltingSpec with lowered thresholds, and
      // [[Salting.saltedJoin]] is the static fallback when AQE can't fire
      // (broadcast-side or non-sort-merge plans).
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("hot_key",
            when(col("l_orderkey") % 100 =!= 0, lit(0L))
              .otherwise(col("l_orderkey")))
        val o = Tables.orders(s, d)
          .withColumn("hot_key",
            when(col("o_orderkey") % 100 =!= 0, lit(0L))
              .otherwise(col("o_orderkey")))
          .groupBy("hot_key")
          .agg(count(lit(1)).as("n_orders"))
        li.join(o, "hot_key")
          .groupBy("hot_key", "n_orders")
          .agg(count(lit(1)).cast("long").as("n_li"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
      },
      Some("""WITH lk AS (SELECT *, CASE WHEN l_orderkey % 100 <> 0 THEN 0
                  ELSE l_orderkey END AS hot_key FROM lineitem),
              ok AS (SELECT CASE WHEN o_orderkey % 100 <> 0 THEN 0
                  ELSE o_orderkey END AS hot_key, count(*) AS n_orders
                FROM orders GROUP BY 1)
              SELECT hot_key, n_orders, count(*) AS n_li,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM lk JOIN ok USING (hot_key)
              GROUP BY 1, 2""")
    ),

    // ── the rtcdb byte-format source, driver-visible end to end ───────────
    QueryDef(
      "q139_rtcdb_roundtrip",
      // orders flows through the reference's OWN on-disk format: the
      // distributed DSv2 writer (sort contract → staged parts → zero-copy
      // commit) produces a golden-byte store, the DSv2 reader scans it
      // back with a leading-column range filter (binary-searched planning
      // + zone-map skips live in this very plan), and the aggregate must
      // hash-match DuckDB computing the same thing straight off parquet —
      // any corruption in encode, compress, index, prune, or decode breaks
      // the row hashes.
      (s, d) => {
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType, nullable = false),
          StructField("o_custkey", LongType, nullable = false),
          StructField("o_orderpriority", StringType, nullable = false)))
        // process-scoped store, keyed by the sf dir so scales don't collide
        val dir = Shared.scratchRoot("rtcdb-rt", d)
        java.nio.file.Files.createDirectories(dir)
        RtcdbFormat.writeMetadata(dir, Seq("orders" -> schema))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.format("rtcdb")
          .option("path", dir.toString).option("table", "orders")
          .mode("overwrite").save()
        s.read.format("rtcdb")
          .option("path", dir.toString).option("table", "orders")
          .load()
          .filter(col("o_orderkey") >= 1000L && col("o_orderkey") < 100000L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("sum_key"),
            countDistinct(col("o_custkey")).as("n_cust"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
                CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
                count(DISTINCT o_custkey) AS n_cust
              FROM orders
              WHERE o_orderkey >= 1000 AND o_orderkey < 100000
              GROUP BY 1""")
    ),

    QueryDef(
      "q233_rtcdb_bloom_point",
      // The bloom-sidecar read path, driver-visible end to end: orders is
      // written to the rtcdb format sorted by o_orderkey (the leading
      // column), so o_custkey values SCATTER across blocks — every block's
      // zone map spans the custkey domain and the 40-byte index can prune
      // nothing for the point predicate below. The per-block bloom sidecar
      // (RtcdbFormat, our format extension) is what serves it: the reader
      // verifies the size equation, probes each zone-admitted block's
      // filter for the literal, and decodes only may-contain blocks
      // (~1% FP) — RtcdbSourceSpec asserts the pruned-block counts and the
      // stale-sidecar degradation; this query makes the same path
      // oracle-checked. At 10⁹ blocks this is the difference between a
      // point lookup decoding everything and decoding ~nothing.
      (s, d) => {
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType, nullable = false),
          StructField("o_custkey", LongType, nullable = false),
          StructField("o_orderpriority", StringType, nullable = false)))
        val dir = Shared.scratchRoot("rtcdb-bloom", d)
        java.nio.file.Files.createDirectories(dir)
        RtcdbFormat.writeMetadata(dir, Seq("orders" -> schema))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
          .write.format("rtcdb")
          .option("path", dir.toString).option("table", "orders")
          .mode("overwrite").save()
        s.read.format("rtcdb")
          .option("path", dir.toString).option("table", "orders")
          .load()
          .filter(col("o_custkey") === 7L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
                CAST(sum(o_orderkey) AS BIGINT) AS sum_key
              FROM orders
              WHERE o_custkey = 7
              GROUP BY 1""")
    ),

    QueryDef(
      "q239_csv_roundtrip",
      // CSV — the interchange format every real pipeline ingests from —
      // driver-visible end to end (the q139 pattern for the text-format
      // family; DBSpec covers CSV/JSON/ORC as unit round-trips): orders
      // flows through a quoted, headered CSV written by the engine
      // (money pinned to exact BIGINT cents BEFORE the text hop — float
      // → text → float is the classic CSV corruption; priorities carry
      // commas' worth of quoting risk in general), is read back under an
      // EXPLICIT schema (never inference — inference is a second scan
      // and a type lottery at 100 TB), and the aggregate must hash-match
      // DuckDB reading the original parquet. Any quoting, escaping,
      // header, or type-mapping defect breaks the row hashes.
      (s, d) => {
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val dir = Shared.scratchRoot("csv-rt", d).toString + "/orders_csv"
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
              .as("total_c"))
          .write.mode("overwrite").option("header", "true").csv(dir)
        s.read
          .schema(StructType(Seq(
            StructField("o_orderkey", LongType),
            StructField("o_custkey", LongType),
            StructField("o_orderstatus", StringType),
            StructField("o_orderpriority", StringType),
            StructField("total_c", LongType))))
          .option("header", "true").csv(dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("total_c")).as("sum_total_c"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS sum_total_c,
                CAST(min(o_orderkey) AS BIGINT) AS min_key,
                CAST(max(o_orderkey) AS BIGINT) AS max_key
              FROM orders
              GROUP BY 1, 2""")
    ),

    // ── Z-ordered catalog layout, driver-visible end to end ───────────────
    QueryDef(
      "q147_zorder_roundtrip",
      // lineitem's (orderkey, partkey) projection flows through the
      // catalog's Z-ordered writer (Morton interleave → range sort) and
      // back; the filter lands on the SECOND clustering dimension — the
      // one a linear sort could never skip on — and the aggregate must
      // hash-match DuckDB reading the raw parquet. Proves the interleave
      // and the layout round-trip lose nothing.
      (s, d) => {
        import graft.catalog.DB
        import org.apache.spark.sql.types.{LongType, StructField, StructType}
        val schema = StructType(Seq(
          StructField("okey", LongType, nullable = false),
          StructField("pkey", LongType, nullable = false),
          StructField("qty_c", LongType, nullable = false)))
        val dir = Shared.scratchRoot("zorder-rt", d).toString
        implicit val spark = s
        val db = DB.init(dir, Seq("zli" -> schema))
        // overwrite-by-recreate: delete any prior run's table dir
        val t = java.nio.file.Paths.get(dir, "zli")
        if (java.nio.file.Files.exists(t))
          java.nio.file.Files.walk(t).iterator().asScala.toSeq
            .reverse.foreach(java.nio.file.Files.delete)
        db.writeZOrdered("zli",
          Tables.lineitem(s, d).select(
            col("l_orderkey").as("okey"), col("l_partkey").as("pkey"),
            round(col("l_quantity") * 100).cast("long").as("qty_c")),
          "okey", "pkey")
        db.table("zli")
          .filter(col("pkey") < 200L)
          .groupBy((col("pkey") % 10).as("pbucket"))
          .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("sum_qty_c"),
            sum(col("okey")).as("sum_okey"))
      },
      Some("""SELECT l_partkey % 10 AS pbucket, count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                CAST(sum(l_orderkey) AS BIGINT) AS sum_okey
              FROM lineitem
              WHERE l_partkey < 200
              GROUP BY 1""")
    ),

    // ── CSV QUARANTINE (malformed-record ingestion robustness) ────────────
    QueryDef(
      "q281_csv_quarantine",
      // q239 proves the clean CSV path; this proves the DIRTY one — the
      // path real crawl/vendor feeds actually exercise. A CSV with a
      // deterministic corruption pattern (every 37th record drops its
      // numeric columns) is read under an explicit schema in PERMISSIVE
      // mode with a `_corrupt` capture column: bad records must land in
      // quarantine (not abort the job, not silently zero-fill), and the
      // clean aggregate must be untouched by their presence. The oracle
      // computes the expected split arithmetically from the source
      // facts — the quarantine counts are predictions the parser must
      // hit exactly.
      //
      // Shape, and why it scales: the dirty file is written once to
      // scratch (distributed text write); the read is one pass in the
      // CSV reader's per-record error path — no driver involvement,
      // no second inference scan; output is 1 row.
      (s, d) => {
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val dir = Shared.scratchRoot("csv-q", d).toString + "/events_dirty"
        Tables.events(s, d)
          .select(when(col("event_id") % 37 === 0,
              concat(lit("CORRUPT-"), col("event_type")))
            .otherwise(concat_ws(",", col("event_id"), col("event_type"),
              expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")))
            .as("value"))
          .write.mode("overwrite").text(dir)
        val parsed = s.read
          .schema(StructType(Seq(
            StructField("event_id", LongType),
            StructField("event_type", StringType),
            StructField("cents", LongType),
            StructField("_corrupt", StringType))))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir)
        // NOTE the max(event_id) below is load-bearing: the CSV parser
        // prunes unreferenced columns, and a pruned-away leading column
        // would never hit the type-conversion failure that flags the
        // short rows as corrupt — quarantine detection is only as wide
        // as the columns the query actually parses
        parsed.agg(
          sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_clean"),
          sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("_corrupt").isNull, col("cents")).otherwise(0L))
            .as("sum_cents_clean"),
          max(col("event_id")).as("max_clean_id"),
          min(when(col("_corrupt").isNotNull, col("_corrupt")))
            .as("sample_corrupt"))
      },
      Some("""SELECT
                CAST(sum(CASE WHEN event_id % 37 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clean,
                CAST(sum(CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_quarantined,
                CAST(sum(CASE WHEN event_id % 37 <> 0 THEN
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS sum_cents_clean,
                max(CASE WHEN event_id % 37 <> 0 THEN event_id END)
                  AS max_clean_id,
                min(CASE WHEN event_id % 37 = 0 THEN
                  'CORRUPT-' || event_type END) AS sample_corrupt
              FROM events""")
    ),

    // ── SCHEMA EVOLUTION READ (mergeSchema across file generations) ───────
    QueryDef(
      "q288_schema_evolution",
      // The data-lake reality every long-lived table hits: files written
      // before a column existed sit next to files written after.
      // Generation 1 (even event_ids) has (event_id, cents); generation
      // 2 (odd) added event_type. The union read uses Spark's
      // mergeSchema — the evolved column must surface on every row, as
      // NULL for pre-evolution files, with no rewrite of old data — and
      // the audit proves exactly that: null/typed splits and per-
      // generation sums the oracle predicts arithmetically from the
      // source facts (the q281 prediction pattern).
      //
      // Shape, and why it scales: schema merge is driver-side footer
      // reconciliation (per-file, no data read); the audit is one scan
      // of both generations with normal pruning; old files are never
      // rewritten — that's the point of evolution-on-read; output is
      // 1 row.
      (s, d) => {
        val root = Shared.scratchRoot("schevo", d).toString
        val facts = Tables.events(s, d).select(col("event_id"),
          col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        facts.filter(col("event_id") % 2 === 0)
          .select("event_id", "cents")
          .write.mode("overwrite").parquet(s"$root/gen1")
        facts.filter(col("event_id") % 2 === 1)
          .select("event_id", "cents", "event_type")
          .write.mode("overwrite").parquet(s"$root/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$root/gen1", s"$root/gen2")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("event_type").isNull, 1L).otherwise(0L))
              .as("n_pre_evolution"),
            sum(when(col("event_type").isNotNull, 1L).otherwise(0L))
              .as("n_post_evolution"),
            sum(when(col("event_type").isNull, col("cents")).otherwise(0L))
              .as("cents_pre"),
            sum(when(col("event_type").isNotNull, col("cents"))
              .otherwise(0L)).as("cents_post"),
            countDistinct(col("event_type")).as("n_types_post"))
      },
      Some("""SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pre_evolution,
                CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_post_evolution,
                CAST(sum(CASE WHEN event_id % 2 = 0 THEN
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents_pre,
                CAST(sum(CASE WHEN event_id % 2 = 1 THEN
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS cents_post,
                count(DISTINCT CASE WHEN event_id % 2 = 1 THEN event_type
                  END) AS n_types_post
              FROM events""")
    )
  )
}
