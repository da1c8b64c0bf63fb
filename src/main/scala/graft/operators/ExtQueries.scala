package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-2 extension surface: operator families beyond the round-1
  * inventory — time-RANGE window frames, text ranking (BM25), deterministic
  * mode, array set algebra, regexp/math function breadth, time-series
  * gap-fill with linear interpolation, training-shard shuffling, embedding
  * truncation (MRL-style), exact two-variable statistics, the map-type
  * function surface, and nested array-of-struct round-trips.
  *
  * Determinism rules are the library-wide ones (see [[graft.QueryDef]]):
  * exact DECIMAL sums before any double math, one pinned double expression
  * written token-identically in both engines, unique tie-breaks on every
  * ranking, and sequential left-to-right folds for array reductions.
  */
object ExtQueries {

  // all cross-engine determinism helpers live in [[Shared]]
  import Shared._

  val all: Seq[QueryDef] = Seq(

    // ── time-based RANGE window frame (rolling 7-day revenue) ─────────────
    QueryDef(
      "q94_time_range_window",
      // RANGE frame over epoch seconds: every order row sees the exact
      // trailing-7-day revenue of its customer — the frame is value-based,
      // so same-timestamp peers are always included together (deterministic
      // without a tie-break, unlike ROWS frames). One shuffle on the
      // partition key; per-partition sort feeds the running frame.
      (s, d) =>
        Tables.orders(s, d)
          // o_orderdate reads as TIMESTAMP_NTZ, which has no direct long
          // cast; the NTZ→LTZ hop is instant-preserving in the UTC session
          .withColumn("ep", col("o_orderdate").cast("timestamp").cast("long"))
          .withColumn("roll7",
            sum(dec(col("o_totalprice")))
              .over(Window.partitionBy("o_custkey").orderBy("ep")
                .rangeBetween(-7L * 86400L, 0L))
              .cast("double"))
          .select("o_orderkey", "o_custkey", "roll7"),
      Some("""SELECT o_orderkey, o_custkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS roll7
              FROM orders""")
    ),

    // ── BM25 relevance scoring (log-free exact form) ──────────────────────
    QueryDef(
      "q95_bm25",
      // Full BM25 shape (tf saturation × idf) for a fixed query-term set,
      // k1=1.2, b=0.75. The idf factor is kept as its rational argument
      // (N-df+0.5)/(df+0.5) instead of its log — monotone-equivalent for
      // ranking and bit-identical across engines (ln is not guaranteed
      // correctly rounded in either engine's libm). Corpus stats (N, Σdl)
      // and per-term df are tiny aggregates, broadcast to the scoring join.
      (s, d) => {
        val toks = Tables.documents(s, d)
          .withColumn("toks", tokens(col("text")))
          .withColumn("dl", size(col("toks")).cast("long"))
          .select("doc_id", "toks", "dl")
        val totals = toks.agg(
          sum(col("dl")).as("sdl"), count(lit(1)).as("n"))
        val terms = Seq("join", "scan", "filter", "window")
        val tf = toks
          .select(col("doc_id"), col("dl"), col("toks"),
            explode(array(terms.map(lit): _*)).as("term"))
          .withColumn("tf",
            size(filter(col("toks"), t => t === col("term"))).cast("long"))
          .drop("toks")
          .filter(col("tf") > 0)
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val tfD  = col("tf").cast("double");  val dlD = col("dl").cast("double")
        val dfD  = col("df").cast("double");  val nD  = col("n").cast("double")
        val sdlD = col("sdl").cast("double")
        tf.join(broadcast(dfc), "term")
          .crossJoin(broadcast(totals))
          .withColumn("score",
            (tfD * lit(2.2) /
              (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * dlD / (sdlD / nD))))
              * ((nD - dfD + lit(0.5)) / (dfD + lit(0.5))))
          .select("doc_id", "term", "tf", "df", "score")
      },
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS toks,
                CAST(len($SQL_TOKENS) AS BIGINT) AS dl FROM documents),
              tot AS (SELECT CAST(sum(dl) AS BIGINT) AS sdl, count(*) AS n FROM tok),
              tf AS (SELECT doc_id, dl, term,
                  CAST(len(list_filter(toks, t -> t = term)) AS BIGINT) AS tf
                FROM tok, unnest(['join','scan','filter','window']) AS u(term)),
              tfp AS (SELECT * FROM tf WHERE tf > 0),
              dfc AS (SELECT term, count(*) AS df FROM tfp GROUP BY term)
              SELECT doc_id, tfp.term, tf, df,
                (CAST(tf AS DOUBLE) * 2.2 /
                  (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                    / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
                * ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5)) AS score
              FROM tfp JOIN dfc ON tfp.term = dfc.term, tot""")
    ),

    // ── deterministic mode (most frequent value per group) ────────────────
    QueryDef(
      "q96_mode_per_group",
      // engine-native mode() tie-breaking is unspecified in both engines;
      // the deterministic form is counts → ranking window with an explicit
      // (count DESC, value ASC) order → first row per group
      (s, d) => {
        val counts = Tables.orders(s, d)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("cnt").desc, col("o_orderpriority").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_orderstatus", "o_orderpriority", "cnt")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, cnt FROM (
                SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
                FROM orders GROUP BY o_orderstatus, o_orderpriority)
              WHERE rn = 1""")
    ),

    // ── array set algebra (intersect / union / except) ────────────────────
    QueryDef(
      "q97_array_setops",
      // set ops between each document's first-half and second-half token
      // sets. Both inputs are pre-distincted and every output sorted, so
      // Spark's set semantics (distinct, left-order) and the oracle's
      // filter-based construction agree exactly. Pure per-row array math,
      // zero shuffle.
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("toks", tokens(col("text")))
          .filter(size(col("toks")) >= 2)
          .withColumn("half", floor(size(col("toks")) / lit(2)).cast("int"))
          .withColumn("a", array_distinct(slice(col("toks"), lit(1), col("half"))))
          .withColumn("b", array_distinct(
            slice(col("toks"), col("half") + lit(1),
              size(col("toks")) - col("half"))))
          .select(
            col("doc_id"),
            size(col("a")).cast("long").as("n_a"),
            size(col("b")).cast("long").as("n_b"),
            array_join(array_sort(array_intersect(col("a"), col("b"))), " ").as("inter"),
            array_join(array_sort(array_union(col("a"), col("b"))), " ").as("uni"),
            array_join(array_sort(array_except(col("a"), col("b"))), " ").as("exc")),
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS t FROM documents),
              h AS (SELECT doc_id, t, len(t) // 2 AS half FROM tok WHERE len(t) >= 2),
              ab AS (SELECT doc_id,
                  list_distinct(t[1:half]) AS a,
                  list_distinct(t[half+1:len(t)]) AS b FROM h)
              SELECT doc_id,
                CAST(len(a) AS BIGINT) AS n_a, CAST(len(b) AS BIGINT) AS n_b,
                coalesce(array_to_string(list_sort(list_filter(a, x -> list_contains(b, x))), ' '), '') AS inter,
                coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ' '), '') AS uni,
                coalesce(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ' '), '') AS exc
              FROM ab""")
    ),

    // ── regexp function breadth ───────────────────────────────────────────
    QueryDef(
      "q98_regexp_suite",
      // extract (group capture), match flag, global replace, char-class
      // strip — restricted to patterns with identical semantics in Java
      // regex (Spark) and RE2 (DuckDB)
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("long").as("cnum"),
            col("c_mktsegment").rlike("^[A-Z]+$").cast("int").as("is_caps"),
            regexp_replace(col("c_name"), "0+", "0").as("name_norm"),
            length(regexp_replace(col("c_name"), "[^0-9]", "")).as("n_digits")),
      Some("""SELECT c_custkey,
                CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS cnum,
                CAST(regexp_matches(c_mktsegment, '^[A-Z]+$') AS INT) AS is_caps,
                regexp_replace(c_name, '0+', '0', 'g') AS name_norm,
                CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT) AS n_digits
              FROM customer""")
    ),

    // ── math function breadth ─────────────────────────────────────────────
    QueryDef(
      "q99_math_suite",
      // abs/sign/floor/ceil/mod/power/sqrt on exact inputs. sqrt is IEEE
      // correctly-rounded in both engines; power is pinned to base-2 with
      // integral exponents (exact in any implementation); ln/exp are
      // excluded — libm results are only ~1-ulp bounded, not reproducible
      // across engines (approx forms belong in a sketch, not an oracle row).
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 2000)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_extendedprice") - lit(30000.0)).as("absx"),
            signum(col("l_extendedprice") - lit(30000.0)).cast("double").as("sgn"),
            floor(col("l_extendedprice") / lit(7.0)).cast("long").as("fl"),
            ceil(col("l_extendedprice") / lit(7.0)).cast("long").as("ce"),
            (col("l_orderkey") % 7).as("md"),
            pow(lit(2.0), col("l_linenumber").cast("double")).as("pw"),
            sqrt(col("l_extendedprice")).as("sq")),
      Some("""SELECT l_orderkey, l_linenumber,
                abs(l_extendedprice - 30000.0) AS absx,
                CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS sgn,
                CAST(floor(l_extendedprice / 7.0) AS BIGINT) AS fl,
                CAST(ceil(l_extendedprice / 7.0) AS BIGINT) AS ce,
                l_orderkey % 7 AS md,
                power(2.0, CAST(l_linenumber AS DOUBLE)) AS pw,
                sqrt(l_extendedprice) AS sq
              FROM lineitem WHERE l_orderkey < 2000""")
    ),

    // ── time-series gap-fill with linear interpolation ────────────────────
    QueryDef(
      "q100_interp_gapfill",
      // per-user daily value series → full day spine (sequence between each
      // user's min/max day) → missing days linearly interpolated between
      // the nearest observed neighbors. The neighbor search is two window
      // passes (last-non-null preceding, first-non-null following) — no
      // self-join, one shuffle on the user key shared by every window.
      // Spine edges always hold observations (bounds come from the data).
      (s, d) => {
        val daily = Tables.events(s, d)
          .withColumn("day", to_date(expr("timestamp_micros(ts div 1000)")))
          .groupBy("user_id", "day")
          .agg(sum(dec(col("value"))).cast("double").as("v"))
        val spine = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
        val j = spine.join(daily, Seq("user_id", "day"), "left")
          .withColumn("idx", datediff(col("day"), lit("1970-01-01").cast("date")))
        val wp = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wn = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(0, Window.unboundedFollowing)
        j.withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
          .withColumn("pd", last(when(col("v").isNotNull, col("idx")), ignoreNulls = true).over(wp))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
          .withColumn("nd", first(when(col("v").isNotNull, col("idx")), ignoreNulls = true).over(wn))
          .withColumn("v_filled",
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("idx") - col("pd")).cast("double") /
                  (col("nd") - col("pd")).cast("double"))))
          .withColumn("is_gap", when(col("v").isNull, 1L).otherwise(0L))
          .select(col("user_id"), col("day").cast("timestamp").as("day"),
            col("v_filled"), col("is_gap"))
      },
      Some("""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                FROM events GROUP BY 1, 2),
              b AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
              spine AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
              j AS (SELECT s.user_id, s.day, daily.v,
                  date_diff('day', TIMESTAMP '1970-01-01', s.day) AS idx
                FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.day = s.day),
              w AS (SELECT user_id, day, v, idx,
                  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                  last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                FROM j)
              SELECT user_id, day,
                CASE WHEN v IS NOT NULL THEN v
                     WHEN pv IS NULL THEN nv
                     WHEN nv IS NULL THEN pv
                     ELSE pv + (nv - pv) * (CAST(idx - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                END AS v_filled,
                CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
              FROM w""")
    ),

    // ── deterministic training-shard shuffle ──────────────────────────────
    QueryDef(
      "q101_shard_shuffle",
      // global pseudo-random corpus order for training, without a global
      // sort: shard = hash(id) mod k routes docs to k shards, and each
      // shard orders by an independent salted hash. All windows are
      // per-shard (parallel) — the classic anti-pattern of one global
      // row_number over an unpartitioned window never appears. Reader
      // consumes shards in (shard, pos) order.
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("shard", h32(col("doc_id").cast("string")) % 8)
          .withColumn("hkey", md5(concat(col("doc_id").cast("string"), lit(":shuf42"))))
          .withColumn("pos", row_number().over(
            Window.partitionBy("shard").orderBy(col("hkey"), col("doc_id"))).cast("long"))
          .select("doc_id", "shard", "pos"),
      Some(s"""SELECT doc_id, ${SQL_H32("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
                CAST(row_number() OVER (
                  PARTITION BY ${SQL_H32("CAST(doc_id AS VARCHAR)")} % 8
                  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuf42'), doc_id)
                  AS BIGINT) AS pos
              FROM documents""")
    ),

    // ── MRL-style embedding truncation ────────────────────────────────────
    QueryDef(
      "q102_embed_truncate",
      // matryoshka truncation: keep the first 8 dims, measure how much norm
      // survives, and renormalize within the truncated subspace. Per-row
      // sequential double folds (identical IEEE order in both engines);
      // zero shuffle.
      (s, d) => {
        val full = col("embedding").cast("array<double>")
        val e8 = slice(full, 1, 8)
        Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
            col("vec_id"),
            sqrt(fsum(transform(full, x => x * x))).as("norm_full"),
            sqrt(fsum(transform(e8, x => x * x))).as("norm_8"),
            (sqrt(fsum(transform(e8, x => x * x))) /
              sqrt(fsum(transform(full, x => x * x)))).as("kept_ratio"),
            (element_at(full, 1) / sqrt(fsum(transform(e8, x => x * x))))
              .as("first_renorm"))
      },
      Some("""SELECT vec_id,
                sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS norm_full,
                sqrt(list_aggregate(list_transform(range(1, 9),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS norm_8,
                sqrt(list_aggregate(list_transform(range(1, 9),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
                / sqrt(list_aggregate(list_transform(range(1, 65),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS kept_ratio,
                CAST(embedding[1] AS DOUBLE)
                / sqrt(list_aggregate(list_transform(range(1, 9),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS first_renorm
              FROM embeddings""")
    ),

    // ── exact Pearson correlation (two-variable moment statistics) ────────
    QueryDef(
      "q103_corr_exact",
      // engine-native corr() differs across engines (co-moment updates);
      // the reproducible form is exact DECIMAL sums of x, y, x², y², xy,
      // then one pinned double expression (same family as q59_variance)
      (s, d) => {
        val x = col("l_quantity").cast(DecimalType(12, 2))
        val y = col("l_extendedprice").cast(DecimalType(18, 2))
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
          .withColumn("corr_xy",
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .select("l_returnflag", "n", "sx", "sy", "corr_xy")
      },
      Some("""WITH agg AS (SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, n, sx, sy,
                (n * sxy - sx * sy) /
                  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
              FROM agg""")
    ),

    // ── map-type function surface ─────────────────────────────────────────
    QueryDef(
      "q104_map_funcs",
      // build a source→count map per language from sorted entries, then
      // exercise the map function family: map_keys/map_values/size,
      // transform_values, map_filter, and a fold over values. The oracle
      // computes the same outputs from ordered list aggregates — maps have
      // no cross-engine wire format, so the contract is the extracted
      // values, not the map rendering.
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("cnt"))
        counts.groupBy("lang")
          .agg(map_from_entries(
            array_sort(collect_list(struct(col("source"), col("cnt"))))).as("m"))
          .select(
            col("lang"),
            size(col("m")).cast("long").as("n_entries"),
            array_join(map_keys(col("m")), " ").as("keys"),
            array_join(transform(map_values(col("m")), v => v.cast("string")), " ").as("vals"),
            aggregate(map_values(transform_values(col("m"), (_, v) => v * 2)),
              lit(0L), (acc, v) => acc + v).as("doubled_total"),
            array_join(map_keys(map_filter(col("m"), (_, v) => v > 5)), " ").as("big_keys"))
      },
      Some("""WITH c AS (SELECT lang, source, count(*) AS cnt
                FROM documents GROUP BY 1, 2)
              SELECT lang,
                CAST(count(*) AS BIGINT) AS n_entries,
                array_to_string(list(source ORDER BY source), ' ') AS keys,
                array_to_string(list(CAST(cnt AS VARCHAR) ORDER BY source), ' ') AS vals,
                CAST(sum(cnt * 2) AS BIGINT) AS doubled_total,
                coalesce(array_to_string(list(source ORDER BY source) FILTER (WHERE cnt > 5), ' '), '') AS big_keys
              FROM c GROUP BY lang""")
    ),

    // ── nested array-of-struct round-trip ─────────────────────────────────
    QueryDef(
      "q105_nested_struct",
      // collect each order's items as a sorted array<struct>, then consume
      // the nested column with struct-field HOFs; min_by/max_by cover the
      // argmin family. The test data duplicates l_linenumber within an
      // order, so the argmin ordering key folds the 2-decimal quantity in
      // as a tie-break (one exact BIGINT — DuckDB's min_by has no composite
      // key form). The HOF sum folds in (linenumber, quantity) order —
      // mirrored by the oracle's ordered list aggregate.
      (s, d) => {
        // explicit round before the long cast: Spark's double→long cast
        // truncates while DuckDB's rounds, and qty*100 is not exactly
        // integral in binary floating point
        val ordKey = col("l_linenumber").cast("long") * 10000000L +
          round(col("l_quantity") * 100).cast("long")
        Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("n_items"),
            min_by(col("l_quantity"), ordKey).as("first_qty"),
            max_by(col("l_quantity"), ordKey).as("last_qty"),
            array_sort(collect_list(
              struct(col("l_linenumber").as("ln"), col("l_quantity").as("qty"))))
              .as("items"))
          .select(
            col("l_orderkey"), col("n_items"), col("first_qty"), col("last_qty"),
            aggregate(transform(col("items"), it => it.getField("qty")),
              lit(0.0), (acc, q) => acc + q).as("hof_sum_qty"))
      },
      Some("""SELECT l_orderkey, count(*) AS n_items,
                min_by(l_quantity, CAST(l_linenumber AS BIGINT) * 10000000
                  + CAST(round(l_quantity * 100, 0) AS BIGINT)) AS first_qty,
                max_by(l_quantity, CAST(l_linenumber AS BIGINT) * 10000000
                  + CAST(round(l_quantity * 100, 0) AS BIGINT)) AS last_qty,
                list_aggregate(list(l_quantity ORDER BY l_linenumber, l_quantity), 'sum') AS hof_sum_qty
              FROM lineitem GROUP BY l_orderkey""")
    ),

    // ── typed JSON parsing (from_json → struct) ───────────────────────────
    QueryDef(
      "q106_from_json",
      // schema-declared parse of the props payload into a typed struct
      // column (vs q20's path-extraction): downstream reads are columnar
      // field accesses, not repeated string parsing
      (s, d) =>
        Tables.events(s, d)
          .withColumn("p", from_json(col("props"), lit("k BIGINT")))
          .select(
            col("event_id"),
            col("p.k").as("k"),
            (col("p.k") % 10).as("k_mod"),
            col("p.k").isNull.cast("int").as("k_missing")),
      Some("""SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
                CAST(json_extract_string(props, '$.k') IS NULL AS INT) AS k_missing
              FROM events""")
    ),

    // ── VARIANT semi-structured type (Spark 4) ────────────────────────────
    QueryDef(
      "q107_variant",
      // open-schema ingestion: parse_json → VARIANT binary form once,
      // typed variant_get extraction at query time. The at-scale point:
      // VARIANT keeps the parsed tree in a compact binary encoding, so N
      // extractions don't re-parse the JSON text N times (q20's
      // get_json_object does).
      (s, d) =>
        Tables.events(s, d)
          .withColumn("v", parse_json(col("props")))
          .select(
            col("event_id"),
            try_variant_get(col("v"), "$.k", "bigint").as("vk"),
            try_variant_get(col("v"), "$.k", "string").as("vk_str"),
            try_variant_get(col("v"), "$.missing", "bigint").as("vmissing")),
      Some("""SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
                json_extract_string(props, '$.k') AS vk_str,
                CAST(NULL AS BIGINT) AS vmissing
              FROM events""")
    ),

    // ── TPC-H Q9 shape: profit by nation × year ───────────────────────────
    QueryDef(
      "q108_tpch_q9_profit",
      // 4-table join graph (fact + part filter + supplier + nation):
      // part/supplier/nation broadcast (selective dim reductions), the
      // lineitem fact streams through one pipeline with zero fact-side
      // shuffles before the final group-by. (The reference schema has no
      // partsupp, so profit reduces to discounted revenue.)
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d).filter(col("p_name").contains("red"))
          .select("p_partkey")
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).cast("long").as("o_year"))
          .agg(sum(rev).cast("double").as("profit"))
      },
      Some(s"""SELECT n_name AS nation,
                CAST(year(l_shipdate) AS BIGINT) AS o_year,
                CAST(sum($SQL_REV) AS DOUBLE) AS profit
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%'
              GROUP BY 1, 2""")
    ),

    // ── TPC-H Q10 shape: top returned-revenue customers ───────────────────
    QueryDef(
      "q109_tpch_q10_returns",
      // returned-item revenue per customer: fact filter (R flag) first,
      // then one fact-fact shuffle join to orders, broadcast customer/
      // nation enrichment, top-20 with explicit key tie-break
      (s, d) => {
        val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .select("o_orderkey", "o_custkey")
        val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        val n = Tables.nation(s, d).select("n_nationkey", "n_name")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
                CAST(sum($SQL_REV) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2, 3
              ORDER BY revenue DESC, c_custkey ASC
              LIMIT 20""")
    ),

    // ── TPC-H Q18 shape: large-volume orders ──────────────────────────────
    QueryDef(
      "q110_tpch_q18_bigorders",
      // HAVING-filtered aggregate (big orders) drives the join: the
      // aggregation shrinks lineitem to order grain FIRST, then the small
      // survivor set joins orders and broadcast customers
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
          .filter(col("total_qty") > 150.0)
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
        val c = Tables.customer(s, d).select("c_custkey", "c_name")
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate").cast("timestamp").as("o_orderdate"),
            col("total_qty"))
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                ${SUMD("l_quantity")} AS total_qty
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2, 3, 4
              HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0""")
    ),

    // ── generator functions (posexplode: explode with ordinality) ─────────
    QueryDef(
      "q111_posexplode",
      // position-preserving explode of each document's leading tokens — the
      // generator (UDTF-family) surface. Output grows 5× the input rows but
      // stays a pure per-row map stage: no shuffle, generator inside the
      // scan's codegen stage.
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(slice(tokens(col("text")), 1, 5)))
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            col("col").as("tok")),
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS t FROM documents),
              e AS (SELECT doc_id, unnest(list_transform(
                  range(1, least(len(t), 5) + 1),
                  i -> struct_pack(pos := CAST(i - 1 AS BIGINT), tok := t[i]))) AS u
                FROM tok)
              SELECT doc_id, u.pos AS pos, u.tok AS tok FROM e""")
    ),

    // ── error-safe arithmetic (try_* family) ──────────────────────────────
    QueryDef(
      "q112_try_arithmetic",
      // ANSI-mode-safe arithmetic: division by zero and bigint overflow
      // yield NULL instead of failing the job — the behavior a 100 TB batch
      // needs (one poisoned row must not kill a 6-hour run). The oracle
      // states the same semantics with explicit guards.
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 2000)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            try_divide(col("l_extendedprice"), col("l_quantity") - lit(1.0))
              .as("unit_price_m1"),
            try_add(lit(Long.MaxValue), col("l_orderkey")).as("ovf"),
            try_divide(col("l_orderkey"), lit(0)).as("div0")),
      Some("""SELECT l_orderkey, l_linenumber,
                CASE WHEN l_quantity - 1.0 = 0.0 THEN NULL
                     ELSE l_extendedprice / (l_quantity - 1.0) END AS unit_price_m1,
                CASE WHEN l_orderkey = 0 THEN 9223372036854775807
                     ELSE CAST(NULL AS BIGINT) END AS ovf,
                CAST(NULL AS DOUBLE) AS div0
              FROM lineitem WHERE l_orderkey < 2000""")
    ),

    // ── global sort (range partitioning) ──────────────────────────────────
    QueryDef(
      "q113_global_sort",
      // total ordering without a single-node bottleneck: Spark samples the
      // sort key, range-partitions, and sorts per partition — the only
      // correct global-sort shape at 100 TB (asserted in PlanSpec). The
      // explicit (price, orderkey, linenumber) key is a total order, so the
      // output permutation is deterministic.
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 3000)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem WHERE l_orderkey < 3000
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""")
    ),

    // ── ordered string aggregation (listagg / string_agg) ─────────────────
    QueryDef(
      "q114_listagg",
      // SQL:2023 LISTAGG ... WITHIN GROUP: deterministic only with an
      // explicit ORDER BY (here over the distinct value set, so the result
      // is order- and duplicate-stable on both engines)
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderstatus", "o_orderpriority").distinct()
          .groupBy("o_orderstatus")
          .agg(expr(
            "listagg(o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority)")
            .as("prios")),
      Some("""SELECT o_orderstatus,
                string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
              FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
              GROUP BY o_orderstatus""")
    ),

    // ── cross-document repeated-span detection (chunk-level dedup) ────────
    QueryDef(
      "q115_repeated_chunks",
      // boilerplate detection at sub-document grain: chunk each doc into
      // disjoint 10-token spans, hash each span, and surface spans occurring
      // in more than one document — the exact-substring complement to
      // document-level near-dup (q36-q39). One shuffle on the span hash;
      // span text never shuffles (hash + one exemplar doc id only).
      (s, d) => {
        val t = tokens(col("text"))
        val nChunks = floor(size(t) / lit(10)).cast("int")
        Tables.documents(s, d)
          .filter(size(tokens(col("text"))) >= 10)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), nChunks - 1), i =>
              md5(concat_ws(" ", slice(t, i * 10 + 1, lit(10)))))).as("chunk_hash"))
          .groupBy("chunk_hash")
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("exemplar_doc"))
          .filter(col("n_docs") >= 2)
      },
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS t FROM documents),
              ch AS (SELECT doc_id, unnest(list_transform(
                  range(0, CAST(len(t) // 10 AS INT)),
                  i -> md5(array_to_string(t[i*10+1:i*10+10], ' ')))) AS chunk_hash
                FROM tok WHERE len(t) >= 10)
              SELECT chunk_hash, count(*) AS n_occurrences,
                count(DISTINCT doc_id) AS n_docs,
                min(doc_id) AS exemplar_doc
              FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2""")
    ),

    // ── overlapping token chunking (RAG / embedding windows) ──────────────
    QueryDef(
      "q116_overlap_chunks",
      // sliding 64-token windows with stride 32 per document — the chunking
      // stage in front of any embedding pipeline. Chunk count per doc is
      // ⌈max(n-64,0)/32⌉+1 (every doc yields ≥1 chunk; the last one may be
      // short). Pure per-row array math → explode; zero shuffle.
      (s, d) => {
        val t = tokens(col("text"))
        val n = size(t)
        val nChunks = floor((greatest(n - lit(64), lit(0)) + lit(31)) / lit(32))
          .cast("int") + lit(1)
        Tables.documents(s, d)
          .select(col("doc_id"), t.as("t"), nChunks.as("nc"))
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), col("nc") - 1), i =>
              struct(i.cast("long").as("chunk_id"),
                size(slice(col("t"), i * 32 + 1, lit(64))).cast("long").as("n_tokens"),
                element_at(col("t"), i * 32 + 1).as("first_tok")))).as("c"))
          .select(col("doc_id"), col("c.chunk_id"), col("c.n_tokens"),
            col("c.first_tok"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, $SQL_TOKENS AS t,
                CAST(CEIL(greatest(len($SQL_TOKENS) - 64, 0) / 32.0) AS INT) + 1 AS nc
                FROM documents)
              SELECT doc_id, u.chunk_id, u.n_tokens, u.first_tok
              FROM (SELECT doc_id, unnest(list_transform(range(0, nc),
                  i -> struct_pack(chunk_id := CAST(i AS BIGINT),
                    n_tokens := CAST(len(t[i*32+1:i*32+64]) AS BIGINT),
                    first_tok := t[i*32+1]))) AS u
                FROM tok)""")
    ),

    // ── string codec functions (base64 / hex / ascii / translate / parts) ─
    QueryDef(
      "q129_string_codec",
      // the binary-adjacent string family q91 doesn't cover: base64 and
      // hex encodings (Spark hex is uppercase, DuckDB lowercase — pinned
      // via lower()), character codecs (ascii/chr), character-map
      // translate, delimited-field extraction (split_part), substring
      // search (instr). ASCII-only corpus ⇒ byte/char semantics agree.
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          base64(substring(col("text"), 1, 12).cast("binary")).as("b64"),
          lower(hex(substring(col("text"), 1, 8))).as("hx"),
          ascii(substring(col("text"), 1, 1)).cast("long").as("first_code"),
          concat(chr(lit(65) + col("doc_id") % 26), col("lang")).as("tag"),
          translate(substring(col("text"), 1, 40), "aeiou", "01234").as("tr"),
          expr("split_part(text, ' ', 3)").as("third_field"),
          instr(col("text"), "table").cast("long").as("pos_table")),
      Some("""SELECT doc_id,
                to_base64(encode(substring(text, 1, 12))) AS b64,
                lower(hex(substring(text, 1, 8))) AS hx,
                CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_code,
                chr(65 + CAST(doc_id % 26 AS INT)) || lang AS tag,
                translate(substring(text, 1, 40), 'aeiou', '01234') AS tr,
                split_part(text, ' ', 3) AS third_field,
                CAST(instr(text, 'table') AS BIGINT) AS pos_table
              FROM documents""")
    ),

    // ── DATA-QUALITY EXPECTATIONS gate (the Deequ shape) ──────────────────
    QueryDef(
      "q201_dq_expectations",
      // Declarative ingest-time data validation — the production gate in
      // front of every warehouse table: seven expectations (row count,
      // key uniqueness, two range checks, a domain check, completeness,
      // referential integrity) evaluated as ONE aggregation pass over
      // lineitem plus ONE anti-join count against orders, reported as
      // (check_name, observed violation count, passed). Observations are
      // exact BIGINTs, so the report is engine-identical. The fixture's
      // (l_orderkey, l_linenumber) is deliberately NOT unique, so the
      // pk check demonstrably FAILS — a gate that can only pass proves
      // nothing. Scale shape: metrics fold map-side into one row; the
      // RI probe is a broadcast/shuffle anti-join, the q13 shape.
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val m = li.agg(
          count(lit(1)).as("n"),
          (count(lit(1)) -
            countDistinct(col("l_orderkey"), col("l_linenumber"))).as("pkdup"),
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("qty"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
            .otherwise(0L)).as("disc"),
          sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
            .otherwise(0L)).as("flag"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("nullship"))
        val ri = li.join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        m.crossJoin(ri).selectExpr(
          """stack(7,
             'row_count_min', n, CAST(n >= 1000 AS BIGINT),
             'pk_dup_rows', pkdup, CAST(pkdup = 0 AS BIGINT),
             'quantity_range', qty, CAST(qty = 0 AS BIGINT),
             'discount_range', disc, CAST(disc = 0 AS BIGINT),
             'returnflag_domain', flag, CAST(flag = 0 AS BIGINT),
             'shipdate_complete', nullship, CAST(nullship = 0 AS BIGINT),
             'orderkey_ri', orphans, CAST(orphans = 0 AS BIGINT)
             ) AS (check_name, observed, passed)""")
      },
      Some("""WITH m AS (SELECT count(*) AS n,
                  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS pkdup,
                  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS qty,
                  sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                      THEN 1 ELSE 0 END) AS disc,
                  sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 ELSE 0 END) AS flag,
                  sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS nullship
                FROM lineitem),
              ri AS (SELECT count(*) AS orphans FROM lineitem l
                LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderkey IS NULL)
              SELECT 'row_count_min' AS check_name,
                CAST(n AS BIGINT) AS observed,
                CAST(n >= 1000 AS BIGINT) AS passed FROM m
              UNION ALL SELECT 'pk_dup_rows', CAST(pkdup AS BIGINT),
                CAST(pkdup = 0 AS BIGINT) FROM m
              UNION ALL SELECT 'quantity_range', CAST(qty AS BIGINT),
                CAST(qty = 0 AS BIGINT) FROM m
              UNION ALL SELECT 'discount_range', CAST(disc AS BIGINT),
                CAST(disc = 0 AS BIGINT) FROM m
              UNION ALL SELECT 'returnflag_domain', CAST(flag AS BIGINT),
                CAST(flag = 0 AS BIGINT) FROM m
              UNION ALL SELECT 'shipdate_complete', CAST(nullship AS BIGINT),
                CAST(nullship = 0 AS BIGINT) FROM m
              UNION ALL SELECT 'orderkey_ri', CAST(orphans AS BIGINT),
                CAST(orphans = 0 AS BIGINT) FROM ri""")
    ),

    // ── SOURCE ABLATION (leave-one-out corpus metric deltas) ──────────────
    QueryDef(
      "q215_source_ablation",
      // The data-valuation question curation asks before dropping a
      // source: how does the corpus-level metric move if source s is
      // removed? Metric here is mean tokens per document. Leave-one-out
      // needs NO per-source rescan: the full-corpus totals (T, N) and
      // each source's partials (t_s, n_s) come from ONE grouped pass,
      // and mean-without-s = (T − t_s)/(N − n_s) is plain arithmetic on
      // the 20-row per-source table. All inputs are exact BIGINTs; the
      // division is the one pinned double expression (q205 discipline).
      //
      // Shape, and why it scales: one corpus scan → groupBy(source);
      // the totals window runs over the source-bounded model table.
      (s, d) => {
        val per = Tables.documents(s, d)
          .select(col("source"), size(tokens(col("text"))).cast("long")
            .as("ntok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_toks"))
        val w = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        per
          .withColumn("tot_docs", sum(col("n_docs")).over(w))
          .withColumn("tot_toks", sum(col("n_toks")).over(w))
          .select(col("source"), col("n_docs"), col("n_toks"),
            (col("tot_toks").cast("double") / col("tot_docs").cast("double"))
              .as("mean_full"),
            ((col("tot_toks") - col("n_toks")).cast("double") /
              (col("tot_docs") - col("n_docs")).cast("double"))
              .as("mean_without"))
          .withColumn("delta", col("mean_without") - col("mean_full"))
      },
      Some(s"""WITH per AS (SELECT source, count(*) AS n_docs,
                  sum(len($SQL_TOKENS)) AS n_toks
                FROM documents GROUP BY 1),
              t AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                  CAST(n_toks AS BIGINT) AS n_toks,
                  CAST(sum(n_docs) OVER () AS BIGINT) AS tot_docs,
                  CAST(sum(n_toks) OVER () AS BIGINT) AS tot_toks
                FROM per)
              SELECT source, n_docs, n_toks,
                CAST(tot_toks AS DOUBLE) / CAST(tot_docs AS DOUBLE)
                  AS mean_full,
                CAST(tot_toks - n_toks AS DOUBLE)
                  / CAST(tot_docs - n_docs AS DOUBLE) AS mean_without,
                CAST(tot_toks - n_toks AS DOUBLE)
                  / CAST(tot_docs - n_docs AS DOUBLE)
                  - CAST(tot_toks AS DOUBLE) / CAST(tot_docs AS DOUBLE)
                  AS delta
              FROM t""")
    ),

    // ── QUANTILE NORMALIZATION ACROSS SOURCES ─────────────────────────────
    QueryDef(
      "q216_quantile_normalize",
      // Score calibration before cross-source mixing: a raw per-doc
      // score (n_chars) is comparable WITHIN a source but not across
      // sources with different length profiles. Quantile-normalize:
      // each doc gets its within-source decile (ntile(10) over the
      // unique (n_chars, doc_id) order — both engines define ntile by
      // the same earlier-buckets-larger rule), and the normalized score
      // is the GLOBAL mean of that decile across all sources, written
      // as exact-BIGINT sum/count division. After this, decile k means
      // the same number from every source — the rank-preserving map
      // real feature pipelines use.
      //
      // Shape, and why it scales: the ranking window partitions by
      // source (parallel across sources, never a global sort); the
      // decile profile is a 10-row model table broadcast back.
      (s, d) => {
        val wSrc = Window.partitionBy("source")
          .orderBy(col("n_chars"), col("doc_id"))
        val ranked = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("decile", ntile(10).over(wSrc).cast("long"))
        val prof = ranked.groupBy("decile")
          .agg(sum(col("n_chars")).as("sc"), count(lit(1)).as("nc"))
          .select(col("decile"),
            (col("sc").cast("double") / col("nc").cast("double"))
              .as("norm_score"))
        ranked.join(broadcast(prof), "decile")
          .select("doc_id", "source", "n_chars", "decile", "norm_score")
      },
      Some("""WITH ranked AS (SELECT doc_id, source, n_chars,
                  CAST(ntile(10) OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS BIGINT) AS decile
                FROM documents),
              prof AS (SELECT decile,
                  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    AS norm_score
                FROM ranked GROUP BY 1)
              SELECT doc_id, source, n_chars, decile, norm_score
              FROM ranked JOIN prof USING (decile)""")
    ),

    // ── K-ANONYMITY AUDIT (privacy screen for released grains) ────────────
    QueryDef(
      "q237_k_anonymity",
      // The privacy counterpart to q127's PII redaction: before a table
      // leaves the pipeline, audit whether its quasi-identifier
      // combinations isolate individuals — a release is k-anonymous iff
      // every QI group holds ≥ k rows. Two grains of the customer
      // table, k = 5: the coarse QI (nation, market segment) and the
      // fine QI adding a $2000 account-balance bucket (exact cents div,
      // never float) — showing how one added column collapses anonymity.
      // Per grain: group count, the smallest group (the worst-case k),
      // violating-group count, and rows that would need suppression.
      //
      // Shape, and why it scales: two hash aggregations to QI grain
      // (group cardinality is QI-domain-bounded, ≪ rows), each folded
      // to a 1-row summary; output is 2 rows.
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val c = Tables.customer(s, d).select(
          col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 200000L").as("balbkt"))
        def audit(grain: String, keys: Seq[String]) =
          c.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
            .agg(lit(grain).as("grain"),
              count(lit(1)).as("n_groups"),
              min(col("n")).as("min_k"),
              sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating"),
              sum(when(col("n") < 5, col("n")).otherwise(0L))
                .as("rows_suppressed"))
        audit("nation_segment", Seq("nat", "seg"))
          .unionAll(audit("nation_segment_bal", Seq("nat", "seg", "balbkt")))
      },
      Some("""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
                  c_mktsegment AS seg,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    // 200000 AS balbkt
                FROM customer),
              g1 AS (SELECT nat, seg, count(*) AS n FROM c GROUP BY 1, 2),
              g2 AS (SELECT nat, seg, balbkt, count(*) AS n FROM c
                GROUP BY 1, 2, 3)
              SELECT 'nation_segment' AS grain,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(min(n) AS BIGINT) AS min_k,
                CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_violating,
                CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                  AS rows_suppressed
              FROM g1
              UNION ALL
              SELECT 'nation_segment_bal', CAST(count(*) AS BIGINT),
                CAST(min(n) AS BIGINT),
                CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
              FROM g2""")
    ),

    // ── URL CANONICALIZATION + PRE-FETCH DEDUP (crawl frontier op) ────────
    QueryDef(
      "q238_url_canonical",
      // The crawl-frontier stage BEFORE q234's extraction: the same page
      // is discovered under many URLs (tracking params, host case, ref
      // variants), and fetching duplicates wastes the crawl budget. Each
      // doc gets a deterministic messy URL (mixed-case host, utm/ref
      // query params, article id = doc_id mod 50 so ~10 discovered URLs
      // alias each article); canonicalization = lowercase the HOST only
      // (paths are case-sensitive per RFC 3986, hosts are not), strip
      // the query string, strip the trailing slash — all Java∩RE2
      // regexes (q98 contract). Dedup groups by canonical URL elect the
      // min-doc_id representative (q165's election discipline): the
      // fetch list. Output is canonical-URL grain: host, path depth,
      // alias count, representative.
      //
      // Shape, and why it scales: one documents scan, per-row regex
      // projection, ONE hash aggregation on the canonical key — the
      // exact-dedup shape (q30) applied to the frontier.
      (s, d) => {
        val url = concat(lit("https://WWW."), col("source"),
          lit(".Example.COM/"), col("lang"), lit("/article/"),
          (col("doc_id") % 50).cast("string"),
          lit("/?utm_source=feed&ref=r"), (col("doc_id") % 7).cast("string"),
          lit("&utm_campaign=x"))
        val host = lower(regexp_extract(url, "^https?://([^/]+)", 1))
        val path = regexp_replace(
          regexp_extract(url, "^https?://[^/]+([^?#]*)", 1), "/$", "")
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("https://"), host, path).as("canon"),
            host.as("host"),
            (length(path) - length(regexp_replace(path, "/", "")))
              .cast("long").as("depth"))
          .groupBy("canon", "host", "depth")
          .agg(count(lit(1)).as("n_aliases"),
            min(col("doc_id")).as("fetch_doc"))
      },
      Some("""WITH u AS (SELECT doc_id,
                  'https://WWW.' || source || '.Example.COM/' || lang
                  || '/article/' || (doc_id % 50)
                  || '/?utm_source=feed&ref=r' || (doc_id % 7)
                  || '&utm_campaign=x' AS url
                FROM documents),
              p AS (SELECT doc_id,
                  lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host,
                  regexp_replace(
                    regexp_extract(url, '^https?://[^/]+([^?#]*)', 1),
                    '/$', '') AS path
                FROM u)
              SELECT 'https://' || host || path AS canon, host,
                CAST(length(path) - length(replace(path, '/', ''))
                  AS BIGINT) AS depth,
                count(*) AS n_aliases,
                CAST(min(doc_id) AS BIGINT) AS fetch_doc
              FROM p GROUP BY 1, 2, 3""")
    ),

    // ── CROSS-LINGUAL ARTICLE ALIGNMENT (parallel-corpus mining) ──────────
    QueryDef(
      "q260_crosslingual_align",
      // The bookkeeping stage of bitext mining: the same article
      // published in several languages (here q238's URL fixture —
      // article id = doc_id mod 50) yields translation-pair candidates.
      // Per ordered language pair: how many articles have BOTH
      // languages, and how many candidate document pairs that implies —
      // the table that sizes an alignment run before any expensive
      // embedding comparison happens.
      //
      // Shape, and why it scales: one aggregation to (article, lang)
      // grain, a self-join ON THAT GRAIN (fan-out bounded by languages
      // per article, never by docs), one langs²-bounded aggregation.
      (s, d) => {
        val g = Tables.documents(s, d)
          .select((col("doc_id") % 50).as("article"), col("lang"))
          .groupBy("article", "lang").agg(count(lit(1)).as("n"))
        g.select(col("article"), col("lang").as("lang_a"),
            col("n").as("na"))
          .join(g.select(col("article"), col("lang").as("lang_b"),
            col("n").as("nb")), "article")
          .filter(col("lang_a") < col("lang_b"))
          .groupBy("lang_a", "lang_b")
          .agg(countDistinct(col("article")).as("n_articles"),
            sum(col("na") * col("nb")).as("n_candidate_pairs"))
      },
      Some("""WITH g AS (SELECT doc_id % 50 AS article, lang,
                  count(*) AS n
                FROM documents GROUP BY 1, 2)
              SELECT a.lang AS lang_a, b.lang AS lang_b,
                count(DISTINCT a.article) AS n_articles,
                CAST(sum(a.n * b.n) AS BIGINT) AS n_candidate_pairs
              FROM g a JOIN g b
                ON a.article = b.article AND a.lang < b.lang
              GROUP BY 1, 2""")
    ),

    // ── HYBRID RETRIEVAL (BM25 recall stage → dense rerank stage) ─────────
    QueryDef(
      "q305_hybrid_retrieval",
      // The two-stage architecture every production search/RAG stack
      // converged on: a cheap lexical recall stage (q95's BM25, log-free
      // rational idf) proposes top-50 candidates, then a dense rerank
      // scores ONLY those 50 by embedding cosine (q41's pinned
      // dot/norm folds) — full-corpus lexical, candidate-only dense.
      // Per-doc BM25 totals avoid double-sum reordering by pivoting the
      // 4 query terms to conditional single-element sums added in one
      // FIXED written order. Query = terms ('join','scan','filter',
      // 'window') + the vec_id-0 embedding; docs align to vectors by
      // doc_id = vec_id.
      //
      // Shape, and why it scales: stage 1 touches the corpus once
      // (tf explode over 4 terms, tiny df/total broadcasts, TakeOrdered
      // 50); stage 2 is a 50-row broadcast join against the vector
      // table + a 1-row query-vector broadcast; output is 10 rows.
      (s, d) => {
        val cand = bm25Top50(s, d)
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        broadcast(cand)
          .join(Tables.embeddings(s, d).select(col("vec_id").as("doc_id"),
            col("embedding").as("dv")), "doc_id")
          .crossJoin(broadcast(qv))
          .withColumn("cosine", graft.functions.vec.dot(col("qv"), col("dv")) /
            (graft.functions.vec.norm(col("qv")) *
              graft.functions.vec.norm(col("dv"))))
          .orderBy(col("cosine").desc, col("doc_id").asc)
          .limit(10)
          .select("doc_id", "bm25", "cosine")
      },
      Some(s"""WITH $SQL_BM25_CAND,
              emb AS (SELECT vec_id AS doc_id, embedding AS dv
                FROM embeddings),
              qv AS (SELECT embedding AS qv FROM embeddings
                WHERE vec_id = 0)
              SELECT doc_id, bm25,
                ${SQL_DOT_EXT("qv", "dv")} /
                  (${SQL_NORM_EXT("qv")} * ${SQL_NORM_EXT("dv")}) AS cosine
              FROM cand JOIN emb USING (doc_id) CROSS JOIN qv
              ORDER BY cosine DESC, doc_id LIMIT 10""")
    ),

    // ── RECIPROCAL RANK FUSION (lexical ⊕ dense without score scales) ─────
    QueryDef(
      "q306_rrf_fusion",
      // The other standard way to combine q305's two stages: fuse at
      // RANK level with RRF = Σ 1/(60+rank) — immune to the incomparable
      // score scales that break naive score averaging (the q258 Borda
      // argument, retrieval-shaped). Ranks over the 50-candidate set
      // come from a candidates²-bounded count-of-better self-join (no
      // window); the fused score is a TWO-term pinned double sum in
      // fixed written order. Top-10 by (rrf desc, doc_id).
      //
      // Shape, and why it scales: both rankings live on the bounded
      // candidate set — the self-joins are 50×50 regardless of corpus
      // size; everything upstream is q305's machinery.
      (s, d) => {
        val cand = bm25Top50(s, d)
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        val scored = broadcast(cand)
          .join(Tables.embeddings(s, d).select(col("vec_id").as("doc_id"),
            col("embedding").as("dv")), "doc_id")
          .crossJoin(broadcast(qv))
          .withColumn("cosine", graft.functions.vec.dot(col("qv"), col("dv")) /
            (graft.functions.vec.norm(col("qv")) *
              graft.functions.vec.norm(col("dv"))))
          .select("doc_id", "bm25", "cosine")
          .checkpoint()
        val o = scored.select(col("doc_id").as("d2"),
          col("bm25").as("b2"), col("cosine").as("c2"))
        val o2 = scored.select(col("doc_id").as("d3"),
          col("cosine").as("c3"))
        val ranked = scored.join(broadcast(o),
            col("b2") > col("bm25") ||
              (col("b2") === col("bm25") && col("d2") < col("doc_id")),
            "left")
          .groupBy("doc_id", "bm25", "cosine")
          .agg((count(col("d2")) + 1L).as("r_bm25"))
          .join(broadcast(o2), col("c3") > col("cosine") ||
              (col("c3") === col("cosine") && col("d3") < col("doc_id")),
            "left")
          .groupBy("doc_id", "bm25", "cosine", "r_bm25")
          .agg((count(col("d3")) + 1L).as("r_dense"))
        ranked
          .withColumn("rrf", expr("""1.0 / (60.0 + CAST(r_bm25 AS DOUBLE))
            + 1.0 / (60.0 + CAST(r_dense AS DOUBLE))"""))
          .orderBy(col("rrf").desc, col("doc_id").asc)
          .limit(10)
          .select("doc_id", "r_bm25", "r_dense", "rrf")
      },
      Some(s"""WITH $SQL_BM25_CAND,
              emb AS (SELECT vec_id AS doc_id, embedding AS dv
                FROM embeddings),
              qv AS (SELECT embedding AS qv FROM embeddings
                WHERE vec_id = 0),
              scored AS (SELECT doc_id, bm25,
                  ${SQL_DOT_EXT("qv", "dv")} /
                    (${SQL_NORM_EXT("qv")} * ${SQL_NORM_EXT("dv")})
                    AS cosine
                FROM cand JOIN emb USING (doc_id) CROSS JOIN qv),
              rb AS (SELECT a.doc_id, a.bm25, a.cosine,
                  1 + count(b.doc_id) AS r_bm25
                FROM scored a LEFT JOIN scored b
                  ON b.bm25 > a.bm25
                    OR (b.bm25 = a.bm25 AND b.doc_id < a.doc_id)
                GROUP BY 1, 2, 3),
              rd AS (SELECT a.doc_id, a.r_bm25,
                  1 + count(b.doc_id) AS r_dense
                FROM rb a LEFT JOIN scored b
                  ON b.cosine > a.cosine
                    OR (b.cosine = a.cosine AND b.doc_id < a.doc_id)
                GROUP BY 1, 2)
              SELECT doc_id, CAST(r_bm25 AS BIGINT) AS r_bm25,
                CAST(r_dense AS BIGINT) AS r_dense,
                1.0 / (60.0 + CAST(r_bm25 AS DOUBLE))
                  + 1.0 / (60.0 + CAST(r_dense AS DOUBLE)) AS rrf
              FROM rd
              ORDER BY rrf DESC, doc_id LIMIT 10""")
    ),

    // ── NDCG@10 (graded ranking quality of the hybrid retriever) ──────────
    QueryDef(
      "q307_ndcg_eval",
      // The graded ranking metric that closes the retrieval-eval family
      // (q276 recall, q305/q306 rankers): NDCG@10 of the hybrid
      // ranking against deterministic graded relevance (2 = shares the
      // query doc's source, 1 = shares its language, 0 otherwise). The
      // log2 discounts are TEN SHARED LITERALS (1/log₂(r+1) — never a
      // runtime log, the q95 rational-idf argument); positions and
      // ideal positions come from count-of-better self-joins on the
      // 10-row set; DCG/IDCG accumulate via per-position conditional
      // sums added in ONE fixed written order (the q305 pivot trick) —
      // every double op identical across engines.
      //
      // Shape, and why it scales: everything after stage 1 lives on the
      // 10-row result set; output is 1 row.
      (s, d) => {
        val qdoc = Tables.documents(s, d).filter(col("doc_id") === 0)
          .select("source", "lang").head
        val (s0, l0) = (qdoc.getString(0), qdoc.getString(1))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        val top = broadcast(bm25Top50(s, d))
          .join(Tables.embeddings(s, d).select(col("vec_id").as("doc_id"),
            col("embedding").as("dv")), "doc_id")
          .crossJoin(broadcast(qv))
          .withColumn("cosine", graft.functions.vec.dot(col("qv"), col("dv")) /
            (graft.functions.vec.norm(col("qv")) *
              graft.functions.vec.norm(col("dv"))))
          .orderBy(col("cosine").desc, col("doc_id").asc).limit(10)
          .select("doc_id", "cosine")
        val t = top.join(Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("lang")), "doc_id")
          .select(col("doc_id"), col("cosine"),
            when(col("source") === s0, 2L)
              .when(col("lang") === l0, 1L).otherwise(0L).as("rel"))
          .checkpoint()
        val o = t.select(col("doc_id").as("d2"), col("cosine").as("c2"),
          col("rel").as("r2"))
        val pos = t.join(broadcast(o),
            col("c2") > col("cosine") ||
              (col("c2") === col("cosine") && col("d2") < col("doc_id")),
            "left")
          .groupBy("doc_id", "rel").agg((count(col("d2")) + 1L).as("pos"))
        val o2 = t.select(col("doc_id").as("d3"), col("rel").as("r3"))
        val ipos = t.join(broadcast(o2),
            col("r3") > col("rel") ||
              (col("r3") === col("rel") && col("d3") < col("doc_id")),
            "left")
          .groupBy(col("doc_id").as("doc_id_i"))
          .agg((count(col("d3")) + 1L).as("ipos"))
        val both = pos.join(ipos, pos("doc_id") === ipos("doc_id_i"))
        val aggs = NdcgSql.discs.zipWithIndex.flatMap { case (disc, i) =>
          Seq(
            sum(when(col("pos") === i + 1,
              col("rel").cast("double") * disc)).as(s"dc${i + 1}"),
            sum(when(col("ipos") === i + 1,
              col("rel").cast("double") * disc)).as(s"ic${i + 1}"))
        }
        both.agg(aggs.head, (aggs.tail :+
            sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel")): _*)
          .select(col("n_rel"),
            expr(NdcgSql.sumCols("dc")).as("dcg"),
            expr(NdcgSql.sumCols("ic")).as("idcg"),
            expr(s"(${NdcgSql.sumCols("dc")}) / " +
              s"nullif((${NdcgSql.sumCols("ic")}), 0.0)").as("ndcg"))
      },
      Some(s"""WITH $SQL_BM25_CAND,
              emb AS (SELECT vec_id AS doc_id, embedding AS dv
                FROM embeddings),
              qv AS (SELECT embedding AS qv FROM embeddings
                WHERE vec_id = 0),
              q0 AS (SELECT source AS s0, lang AS l0 FROM documents
                WHERE doc_id = 0),
              top AS (SELECT doc_id,
                  ${SQL_DOT_EXT("qv", "dv")} /
                    (${SQL_NORM_EXT("qv")} * ${SQL_NORM_EXT("dv")})
                    AS cosine
                FROM cand JOIN emb USING (doc_id) CROSS JOIN qv
                ORDER BY cosine DESC, doc_id LIMIT 10),
              t AS (SELECT top.doc_id, cosine,
                  CASE WHEN source = s0 THEN 2
                    WHEN lang = l0 THEN 1 ELSE 0 END AS rel
                FROM top JOIN documents d2 ON top.doc_id = d2.doc_id
                  CROSS JOIN q0),
              pos AS (SELECT a.doc_id, a.rel, 1 + count(b.doc_id) AS pos
                FROM t a LEFT JOIN t b
                  ON b.cosine > a.cosine
                    OR (b.cosine = a.cosine AND b.doc_id < a.doc_id)
                GROUP BY 1, 2),
              ipos AS (SELECT a.doc_id, 1 + count(b.doc_id) AS ipos
                FROM t a LEFT JOIN t b
                  ON b.rel > a.rel
                    OR (b.rel = a.rel AND b.doc_id < a.doc_id)
                GROUP BY 1),
              jm AS (SELECT pos.doc_id, rel, pos, ipos
                FROM pos JOIN ipos ON pos.doc_id = ipos.doc_id),
              f AS (SELECT
                  CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_rel,
                  ${NdcgSql.sqlConds("pos", "dc")},
                  ${NdcgSql.sqlConds("ipos", "ic")}
                FROM jm)
              SELECT n_rel,
                ${NdcgSql.sumCols("dc")} AS dcg,
                ${NdcgSql.sumCols("ic")} AS idcg,
                (${NdcgSql.sumCols("dc")}) /
                  nullif((${NdcgSql.sumCols("ic")}), 0.0) AS ndcg
              FROM f""")
    )
  )

  /** NDCG@10 shared pieces: the ten 1/log₂(r+1) discount LITERALS and
    * the fixed-order accumulation text (q299 WilsonSql pattern — the
    * arithmetic text is shared, so the IEEE sequence is identical).
    */
  private object NdcgSql {
    val discs: Seq[Double] = Seq(1.0, 0.6309297535714575, 0.5,
      0.43067655807339306, 0.38685280723454163, 0.3562071871080222,
      0.3333333333333333, 0.31546487678572877, 0.3010299956639812,
      0.2890648263178879)
    /** the per-position conditional sums, SQL side */
    def sqlConds(posCol: String, pfx: String): String =
      discs.zipWithIndex.map { case (v, i) =>
        s"sum(CASE WHEN $posCol = ${i + 1} THEN CAST(rel AS DOUBLE) * " +
          s"CAST($v AS DOUBLE) END) AS $pfx${i + 1}"
      }.mkString(",\n                  ")
    /** fixed-order left-to-right addition of the ten position terms */
    def sumCols(pfx: String): String =
      (1 to 10).map(i => s"coalesce($pfx$i, 0.0)").mkString(" + ")
  }

  /** Stage-1 lexical candidates shared by q305/q306: per-doc BM25 totals
    * (q95's per-term scores pivoted to conditional single-element sums,
    * added in ONE fixed written order so no double-sum reordering
    * exists), exact top-50 by (bm25 desc, doc_id).
    */
  private[graft] def bm25Top50(s: SparkSession, d: String): DataFrame =
    Shared.withCheckpointDir(s) {
    val toks = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select("doc_id", "toks", "dl")
    val totals = toks.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("n"))
    val terms = Seq("join", "scan", "filter", "window")
    val tf = toks
      .select(col("doc_id"), col("dl"), col("toks"),
        explode(array(terms.map(lit): _*)).as("term"))
      .withColumn("tf",
        size(filter(col("toks"), t => t === col("term"))).cast("long"))
      .drop("toks")
      .filter(col("tf") > 0)
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
    val dfD = col("df").cast("double"); val nD = col("n").cast("double")
    val sdlD = col("sdl").cast("double")
    val perTerm = tf.join(broadcast(dfc), "term")
      .crossJoin(broadcast(totals))
      .withColumn("score",
        (tfD * lit(2.2) /
          (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * dlD / (sdlD / nD))))
          * ((nD - dfD + lit(0.5)) / (dfD + lit(0.5))))
    perTerm.groupBy("doc_id")
      .agg(
        sum(when(col("term") === "join", col("score"))).as("s1"),
        sum(when(col("term") === "scan", col("score"))).as("s2"),
        sum(when(col("term") === "filter", col("score"))).as("s3"),
        sum(when(col("term") === "window", col("score"))).as("s4"))
      .withColumn("bm25", expr("""coalesce(s1, 0.0) + coalesce(s2, 0.0)
        + coalesce(s3, 0.0) + coalesce(s4, 0.0)"""))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(50)
      .select("doc_id", "bm25")
      // 50-row candidate set, consumed repeatedly by q305/q306/q307's
      // rank self-joins — checkpoint so stage 1 runs once per query
      .checkpoint()
  }

  /** q305/q306's oracle stage-1 CTEs (ends with `cand(doc_id, bm25)`). */
  private[graft] def SQL_BM25_CAND: String =
    s"""tok AS (SELECT doc_id, $SQL_TOKENS AS toks,
          CAST(len($SQL_TOKENS) AS BIGINT) AS dl FROM documents),
        tot AS (SELECT CAST(sum(dl) AS BIGINT) AS sdl, count(*) AS n
          FROM tok),
        tf AS (SELECT doc_id, dl, term,
            CAST(len(list_filter(toks, t -> t = term)) AS BIGINT) AS tf
          FROM tok, unnest(['join','scan','filter','window']) AS u(term)),
        tfp AS (SELECT * FROM tf WHERE tf > 0),
        dfc AS (SELECT term, count(*) AS df FROM tfp GROUP BY term),
        pt AS (SELECT doc_id, tfp.term,
            (CAST(tf AS DOUBLE) * 2.2 /
              (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))
            * ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5)) AS score
          FROM tfp JOIN dfc ON tfp.term = dfc.term, tot),
        pv AS (SELECT doc_id,
            sum(CASE WHEN term = 'join' THEN score END) AS s1,
            sum(CASE WHEN term = 'scan' THEN score END) AS s2,
            sum(CASE WHEN term = 'filter' THEN score END) AS s3,
            sum(CASE WHEN term = 'window' THEN score END) AS s4
          FROM pt GROUP BY 1),
        cand AS (SELECT doc_id,
            coalesce(s1, 0.0) + coalesce(s2, 0.0)
              + coalesce(s3, 0.0) + coalesce(s4, 0.0) AS bm25
          FROM pv
          ORDER BY bm25 DESC, doc_id LIMIT 50)"""

  /** pinned float-array folds for the q305/q306 oracles (the
    * SimilarityQueries SQL_DOT/SQL_NORM shapes, local to this module). */
  private[graft] def SQL_DOT_EXT(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')"
  private[graft] def SQL_NORM_EXT(a: String): String =
    s"sqrt(${SQL_DOT_EXT(a, a)})"
}
