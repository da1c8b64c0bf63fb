package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-13 batch 4: two composition capstones over the new split/
  * soft-dedup primitives — budget allocation on DEDUP-DISCOUNTED masses
  * (q473 ∘ q446) and the near-dup tier of the cross-split leakage audit
  * (q471's exact tier lifted onto the memoized winnow components).
  *
  * Determinism: exact integer micro-token masses and ppm divisions
  * everywhere; the water-filling construction is q446's sorted-prefix
  * integer algorithm verbatim, just fed the effective panel.
  */
object R13dQueries {

  import Shared.{h32, SQL_H32}

  val all: Seq[QueryDef] = Seq(

    // ── EFFECTIVE-MASS TOKEN-BUDGET ALLOCATION (q473 ∘ q446) ─────────────
    QueryDef(
      "q478_effective_budget_allocation",
      // q446 allocates a token budget across RAW source masses; this is
      // the version a dedup-aware mix designer actually runs: each
      // doc's tokens are first discounted by its exact-duplicate
      // cluster size (the q473 soft-dedup weight, 10⁶ div csize — a doc
      // duplicated 4× carries quarter weight), THEN the exact
      // water-filling construction allocates B = total/4 of the
      // EFFECTIVE micro-token mass: every source gets
      // min(its mass, level L), survivors split the integer remainder
      // one unit at a time smallest-first — Σ alloc = B exactly.
      // Duplication-heavy sources stop crowding out clean ones at the
      // allocation step, not after it.
      //
      // Shape, and why it scales: one documents pass to the
      // (hash × source) grain, cluster sizes keyed on the hash (never
      // all-pairs), source rollup bounded; the sort/window grain is the
      // source panel (model-sized — the one place a single-partition
      // window is the honest plan, per q446).
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(
            md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
              .as("h"),
            col("source"),
            size(Shared.tokens(col("text"))).cast("long").as("ntok"))
          .groupBy("h", "source")
          .agg(count(lit(1)).as("cnt"), sum(col("ntok")).as("toks"))
        val cs = g.groupBy("h").agg(sum(col("cnt")).as("csize"))
        val p = g.join(cs, "h")
          .groupBy("source")
          .agg(sum(expr("toks * (1000000L div csize)")).as("eff"))
        val tot = p.agg(sum(col("eff")).as("tt"), count(lit(1)).as("ns"))
        val wOrd = Window.orderBy(col("eff").asc, col("source").asc)
        val ranked = p.crossJoin(broadcast(tot))
          .withColumn("b", expr("tt div 4L"))
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("pfx", coalesce(sum(col("eff")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("isfull",
            col("pfx") + col("eff") * (col("ns") - col("rn") + 1L) <=
              col("b"))
        val k = ranked.agg(
          sum(when(col("isfull"), 1L).otherwise(0L)).as("k"),
          sum(when(col("isfull"), col("eff")).otherwise(0L)).as("pk"))
        ranked.crossJoin(broadcast(k))
          .withColumn("alloc", expr(
            """CASE WHEN isfull THEN eff
              ELSE (b - pk) div (ns - k)
                + (CASE WHEN rn - k <= (b - pk) % (ns - k)
                   THEN 1L ELSE 0L END) END"""))
          .select(col("source"), col("eff").as("eff_micro"),
            col("alloc").as("alloc_micro"),
            expr("alloc * 1000L div eff").as("rate_milli"))
      },
      Some(s"""WITH g AS (SELECT
                md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                  AS h,
                source, CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(len(${Shared.SQL_TOKENS})) AS BIGINT) AS toks
              FROM documents GROUP BY 1, 2),
              cs AS (SELECT h, CAST(sum(cnt) AS BIGINT) AS csize
                FROM g GROUP BY 1),
              panel AS (SELECT source,
                CAST(sum(toks * (1000000 // csize)) AS BIGINT) AS eff
              FROM g JOIN cs USING (h) GROUP BY 1),
              tot AS (SELECT CAST(sum(eff) AS BIGINT) AS tt,
                  CAST(count(*) AS BIGINT) AS ns FROM panel),
              rk AS (SELECT source, eff, tt // 4 AS b, ns,
                  CAST(row_number() OVER (ORDER BY eff, source)
                    AS BIGINT) AS rn,
                  CAST(coalesce(sum(eff) OVER (
                    ORDER BY eff, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS pfx
                FROM panel, tot),
              fl AS (SELECT *,
                  pfx + eff * (ns - rn + 1) <= b AS isfull FROM rk),
              kk AS (SELECT CAST(sum(CASE WHEN isfull THEN 1 ELSE 0 END)
                    AS BIGINT) AS k,
                  CAST(sum(CASE WHEN isfull THEN eff ELSE 0 END)
                    AS BIGINT) AS pk
                FROM fl),
              al AS (SELECT source, eff,
                  CASE WHEN isfull THEN eff
                    ELSE (b - pk) // (ns - k)
                      + (CASE WHEN rn - k <= (b - pk) % (ns - k)
                         THEN 1 ELSE 0 END) END AS alloc
                FROM fl, kk)
              SELECT source, eff AS eff_micro,
                CAST(alloc AS BIGINT) AS alloc_micro,
                CAST(alloc * 1000 // eff AS BIGINT) AS rate_milli
              FROM al""")
    ),

    // ── NEAR-DUP CROSS-SPLIT LEAKAGE (the tier above q471) ────────────────
    QueryDef(
      "q479_neardup_split_leakage",
      // q471 catches byte-identical leakage; the leak that actually
      // inflates eval numbers is the NEAR duplicate (reflowed, lightly
      // edited). Lift the audit onto the winnow near-dup components
      // (the memoized q158 labels): a test document leaks when its
      // component also contains a train document. One row: test docs,
      // test docs inside any near-dup component, leaked test docs, and
      // the leakage ppm — the number compared against q471's exact
      // tier to size how much the hash split must move to a
      // cluster-aware split (q402, leakage zero by construction).
      //
      // Shape, and why it scales: split flags are row-local on one
      // documents pass; the component table is pair-graph-bounded
      // (memoized scratch parquet); the leak test is a keyed aggregate
      // on the component grain — never a train×test join.
      (s, d) => {
        val sp = Tables.documents(s, d)
          .select(col("doc_id"),
            (h32(concat(lit("split"), col("doc_id").cast("string")))
              % 100L).as("b"))
          .select(col("doc_id"),
            (col("b") >= 90L).as("is_test"), (col("b") < 80L).as("is_train"))
        val cg = sp
          .join(TextQueries.winnowComponents(s, d)
            .withColumnRenamed("id", "doc_id"), Seq("doc_id"))
          .groupBy("comp")
          .agg(sum(when(col("is_test"), 1L).otherwise(0L)).as("nt"),
            sum(when(col("is_train"), 1L).otherwise(0L)).as("ntr"))
        val lk = cg.agg(
          coalesce(sum(col("nt")), lit(0L)).as("n_test_in_cluster"),
          coalesce(sum(when(col("ntr") > 0L, col("nt")).otherwise(0L)),
            lit(0L)).as("n_leaked"))
        sp.agg(sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"))
          .crossJoin(broadcast(lk))
          .select(col("n_test"), col("n_test_in_cluster"), col("n_leaked"),
            expr("n_leaked * 1000000L div n_test").as("leaked_ppm"))
      },
      Some("WITH RECURSIVE " +
        TextQueries.SQL_WINNOW_PAIR_CTES.stripPrefix("WITH ") + s""",
           wedges AS (SELECT a, b FROM wpairs
                      UNION ALL SELECT b AS a, a AS b FROM wpairs),
           wnodes AS (SELECT DISTINCT a AS id FROM wedges),
           reach AS (SELECT id, id AS r FROM wnodes
                     UNION
                     SELECT e.b, reach.r FROM reach
                     JOIN wedges e ON e.a = reach.id),
           comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
           sp AS (SELECT doc_id,
               ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")} % 100 >= 90
                 AS is_test,
               ${SQL_H32("'split' || CAST(doc_id AS VARCHAR)")} % 100 < 80
                 AS is_train
             FROM documents),
           cg AS (SELECT c.comp,
               CAST(sum(CASE WHEN s.is_test THEN 1 ELSE 0 END) AS BIGINT)
                 AS nt,
               CAST(sum(CASE WHEN s.is_train THEN 1 ELSE 0 END) AS BIGINT)
                 AS ntr
             FROM comp c JOIN sp s ON c.id = s.doc_id GROUP BY 1),
           lk AS (SELECT
               CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_test_in_cluster,
               CAST(coalesce(sum(CASE WHEN ntr > 0 THEN nt ELSE 0 END), 0)
                 AS BIGINT) AS n_leaked
             FROM cg),
           tt AS (SELECT CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_test
             FROM sp)
           SELECT n_test, n_test_in_cluster, n_leaked,
             CAST(n_leaked * 1000000 // n_test AS BIGINT) AS leaked_ppm
           FROM tt, lk""")
    )
  )
}
