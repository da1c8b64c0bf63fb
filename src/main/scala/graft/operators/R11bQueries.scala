package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-11 batch 4: the correlation trio's completion (Kendall's τ-b),
  * multiple-testing control (Benjamini-Hochberg), corpus-mixing
  * divergence maps (pairwise Jensen-Shannon), per-source information
  * profiles (Shannon entropy, Chao1 unseen-vocabulary, Zipf fit),
  * blocked fuzzy entity resolution (Levenshtein within bands),
  * leakage-safe target encoding, the Mann-Kendall trend test, and
  * sequential A/B stopping (SPRT).
  *
  * Determinism rules are the library-wide ones (see [[graft.QueryDef]]):
  * exact integer/decimal accumulation, floats only inside ONE pinned
  * expression whose text is shared verbatim with the oracle (IEEE
  * +,−,×,÷,sqrt on identical exact operands are correctly rounded, so
  * both engines produce bit-identical doubles; ln/exp carry the
  * documented 1-ulp cross-libm risk, mitigated by quantizing their
  * inputs and flooring their outputs — the q328/q335 discipline).
  */
object R11bQueries {

  import Shared._

  /** Kendall τ-b from exact pair counts — text shared verbatim with the
    * oracle. Operands are exact integers (conc/disc/tx/ty fit BIGINT to
    * n ≈ 10⁹ rows: n0 = n(n−1)/2 ≈ 5·10¹⁷).
    */
  private val TauSql =
    """((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
       / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
            * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))))"""

  /** OLS slope from exact integer moments (q341) — shared text. */
  private val SlopeSql =
    """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"""

  /** Per-token Jensen-Shannon contribution in pico-nats (q338), side 1;
    * side 2 swaps the roles. All operands are exact integers cast to
    * double INSIDE the text, so both engines run the identical IEEE
    * sequence; the one ln is floored to pico-units per token.
    */
  private def jsTermSql(cA: String, nA: String, cB: String, nB: String) =
    s"""CAST(floor(1000000000000.0 * (CAST($cA AS DOUBLE) / CAST($nA AS DOUBLE))
        * ln(2.0 * CAST($cA AS DOUBLE) * CAST($nB AS DOUBLE)
            / (CAST($cA AS DOUBLE) * CAST($nB AS DOUBLE)
              + CAST($cB AS DOUBLE) * CAST($nA AS DOUBLE)))) AS BIGINT)"""

  /** JS divergence in micro-nats from the pair-grain exact sums (q338):
    * shared-token term sums (pico-nats) + the closed-form ln2 mass of
    * tokens absent on the other side. ln(2) is the PINNED correctly-
    * rounded double literal — never a runtime log.
    */
  private val JsSql =
    """CAST(floor(500000.0 * ((CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE))
          / 1000000000000.0
        + 0.6931471805599453
          * ((CAST(n1 AS DOUBLE) - CAST(sc1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
           + (CAST(n2 AS DOUBLE) - CAST(sc2 AS DOUBLE)) / CAST(n2 AS DOUBLE))))
       AS BIGINT)"""

  /** Shannon entropy in micro-nats from exact operands (q339). */
  private val EntropySql =
    """CAST(floor(1000000.0 * ln(CAST(n_tok AS DOUBLE))
        - CAST(sclc_micro AS DOUBLE) / CAST(n_tok AS DOUBLE)) AS BIGINT)"""

  /** Two-proportion pooled z² in micro-units (q337): Δ = c_a·n_b − c_b·n_a
    * is exact DECIMAL; the square and the four-factor denominator run in
    * doubles (each factor exact → correctly-rounded products), shared
    * text. NULL when any denominator factor is zero (empty arm, all/none
    * converted) — no significance is claimable there.
    */
  private[operators] val Z2Sql =
    """CASE WHEN na = 0 OR nb = 0 OR ca + cb = 0 OR na + nb - ca - cb = 0
       THEN NULL ELSE
       CAST(floor(1000000.0
         * (CAST(na + nb AS DOUBLE)
            * CAST(dlt AS DOUBLE) * CAST(dlt AS DOUBLE))
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
            * CAST(ca + cb AS DOUBLE)
            * CAST(na + nb - ca - cb AS DOUBLE))) AS BIGINT) END"""

  /** Mann-Kendall normalized statistic (q344): var18 = 18·Var(S) exact;
    * continuity-corrected z, NULL for a flat series (var18 = 0).
    */
  private val MkzSql =
    """CASE WHEN var18 = 0 THEN NULL ELSE
       (CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))
         / sqrt(CAST(var18 AS DOUBLE) / 18.0) END"""

  /** m-estimate smoothed target encoding in ppm (q343), m = 20: the
    * category mean shrunk toward the global prior; exact operands, one
    * pinned double block.
    */
  private val EncSql =
    """CAST(floor(1000000.0
        * ((CAST(sy AS DOUBLE) + 20.0 * CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))
           / (CAST(n AS DOUBLE) + 20.0))) AS BIGINT)"""

  val all: Seq[QueryDef] = Seq(

    // ── KENDALL'S τ-b (concordance on a bounded discretized grid) ────────
    QueryDef(
      "q336_kendall_tau",
      // Completes the correlation trio (Pearson q103, Spearman q317)
      // with the concordance-based τ-b, tie-corrected. Exact pairwise
      // concordance over raw value grain is a 2-D dominance count — not
      // a prefix sum — so the production form discretizes: x = $50k
      // total-price band, y = item count. The resulting CELL GRID is
      // value-bounded (≈ 60 × 8 cells at any corpus size), and the
      // grid² concordance join plus the tie sums are all exact
      // integers; τ-b surfaces through one pinned sqrt expression.
      //
      // Shape, and why it scales: one fact pass to the cell grid (hash
      // agg), a broadcast grid×grid non-equi join bounded by cells²
      // (≈ 230k products max — model-sized), 1-row folds. conc/disc
      // accumulate as DECIMAL(38,0) (cell-count products reach n²/4).
      (s, d) => Shared.withCheckpointDir(s) {
        val ly = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("y"))
        val cells = Tables.orders(s, d)
          .select(expr(
            """CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               div 5000000""").as("x"), col("o_orderkey"))
          .join(ly, col("o_orderkey") === ly("l_orderkey"), "left")
          .select(col("x"), coalesce(col("y"), lit(0L)).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("cnt"))
          .checkpoint()
        val j = cells.select(col("x").as("xj"), col("y").as("yj"),
          col("cnt").as("cntj"))
        val pair = cells.join(broadcast(j), col("x") < col("xj"))
          .agg(
            sum(when(col("y") < col("yj"),
              (col("cnt") * col("cntj")).cast(DecimalType(38, 0)))
              .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("conc_d"),
            sum(when(col("y") > col("yj"),
              (col("cnt") * col("cntj")).cast(DecimalType(38, 0)))
              .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("disc_d"))
        val tx = cells.groupBy("x").agg(sum(col("cnt")).as("nx"))
          .agg(sum(expr("(nx * (nx - 1)) div 2")
            .cast(DecimalType(38, 0))).as("tx_d"))
        val ty = cells.groupBy("y").agg(sum(col("cnt")).as("ny"))
          .agg(sum(expr("(ny * (ny - 1)) div 2")
            .cast(DecimalType(38, 0))).as("ty_d"))
        val nn = cells.agg(sum(col("cnt")).as("n"))
        pair.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
          .crossJoin(broadcast(nn))
          .select(col("n"),
            expr("CAST(conc_d AS BIGINT)").as("conc"),
            expr("CAST(disc_d AS BIGINT)").as("disc"),
            expr("CAST(tx_d AS BIGINT)").as("tx"),
            expr("CAST(ty_d AS BIGINT)").as("ty"),
            expr("(n * (n - 1)) div 2").as("n0"))
          .select(col("n"), col("conc"), col("disc"), col("tx"), col("ty"),
            col("n0"), expr(TauSql).as("tau_b"))
      },
      Some(s"""WITH ly AS (SELECT l_orderkey, count(*) AS y
                FROM lineitem GROUP BY 1),
              base AS (SELECT
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    // 5000000 AS x,
                  coalesce(y, 0) AS y
                FROM orders LEFT JOIN ly ON o_orderkey = l_orderkey),
              cells AS (SELECT x, y, count(*) AS cnt FROM base GROUP BY 1, 2),
              pair AS (SELECT
                  sum(CASE WHEN i.y < j.y THEN i.cnt * j.cnt ELSE 0 END)
                    AS conc,
                  sum(CASE WHEN i.y > j.y THEN i.cnt * j.cnt ELSE 0 END)
                    AS disc
                FROM cells i JOIN cells j ON i.x < j.x),
              gx AS (SELECT sum((nx * (nx - 1)) // 2) AS tx
                FROM (SELECT sum(cnt) AS nx FROM cells GROUP BY x)),
              gy AS (SELECT sum((ny * (ny - 1)) // 2) AS ty
                FROM (SELECT sum(cnt) AS ny FROM cells GROUP BY y)),
              nn AS (SELECT sum(cnt) AS n FROM cells),
              m AS (SELECT CAST(n AS BIGINT) AS n,
                  CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
                  CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
                  CAST((n * (n - 1)) // 2 AS BIGINT) AS n0
                FROM pair, gx, gy, nn)
              SELECT n, conc, disc, tx, ty, n0, $TauSql AS tau_b FROM m"""),
      headline = true
    ),

    // ── BENJAMINI-HOCHBERG FDR CONTROL (multiple testing) ─────────────────
    QueryDef(
      "q337_bh_fdr",
      // The multiple-testing step every metrics platform needs once it
      // tests MANY cells at once (here: per-event-type A/B conversion
      // tests under the deterministic user_id-parity split). Per type:
      // the pooled two-proportion z² — Δ = c_a·n_b − c_b·n_a exact in
      // DECIMAL, the rest one pinned double block quantized to micro —
      // then p = exp(−z²/2) (the sub-Gaussian bound: a valid, monotone
      // p-surrogate whose BH mechanics are identical), floored to micro.
      // BH at α = 0.05: sort p ascending, reject ranks ≤ k* where
      // k* = max{i : p_(i)·m ≤ 50000·i} — ALL integer comparisons.
      //
      // Shape, and why it scales: one fact pass to (type, arm) sums;
      // everything after runs on the model-sized type grain (the two
      // tiny unpartitioned windows span ~10 rows at any corpus size).
      (s, d) => {
        val arm = (col("user_id") % 2 === 0).cast("long")
        val conv = (col("value") >= 50.0).cast("long")
        val g = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(sum(arm).as("na"), sum(arm * conv).as("ca"),
            sum(lit(1L) - arm).as("nb"),
            sum((lit(1L) - arm) * conv).as("cb"))
          .withColumn("dlt", expr(
            """CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na"""))
          .withColumn("z2_micro", expr(Z2Sql))
          .withColumn("p_micro", expr(
            """CAST(floor(1000000.0
                 * exp(-CAST(z2_micro AS DOUBLE) / 2000000.0)) AS BIGINT)"""))
        val wAll = Window.orderBy(col("p_micro"), col("event_type"))
        val wSpan = wAll.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        g.withColumn("rk", row_number().over(wAll).cast("long"))
          .withColumn("m", count(lit(1)).over(wSpan))
          .withColumn("kmax", max(when(
            col("p_micro") * col("m") <= lit(50000L) * col("rk"),
            col("rk"))).over(wSpan))
          .select(col("event_type"), col("na"), col("ca"), col("nb"),
            col("cb"), col("z2_micro"), col("p_micro"), col("rk"),
            coalesce((col("rk") <= col("kmax")).cast("long"), lit(0L))
              .as("rejected"))
          .orderBy("rk")
      },
      Some(s"""WITH g AS (SELECT event_type,
                  sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN user_id % 2 = 0 AND value >= 50.0
                      THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb,
                  sum(CASE WHEN user_id % 2 = 1 AND value >= 50.0
                      THEN 1 ELSE 0 END) AS cb
                FROM events GROUP BY 1),
              z AS (SELECT event_type,
                  CAST(na AS BIGINT) AS na, CAST(ca AS BIGINT) AS ca,
                  CAST(nb AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb,
                  CAST(ca AS DECIMAL(38,0)) * nb
                    - CAST(cb AS DECIMAL(38,0)) * na AS dlt
                FROM g),
              z2 AS (SELECT *, $Z2Sql AS z2_micro FROM z),
              p AS (SELECT *,
                  CAST(floor(1000000.0
                    * exp(-CAST(z2_micro AS DOUBLE) / 2000000.0)) AS BIGINT)
                    AS p_micro
                FROM z2),
              r AS (SELECT *,
                  CAST(row_number() OVER (ORDER BY p_micro, event_type)
                    AS BIGINT) AS rk,
                  count(*) OVER () AS m
                FROM p),
              k AS (SELECT *,
                  max(CASE WHEN p_micro * m <= 50000 * rk THEN rk END)
                    OVER () AS kmax
                FROM r)
              SELECT event_type, na, ca, nb, cb, z2_micro, p_micro, rk,
                CAST(coalesce(rk <= kmax, false) AS BIGINT) AS rejected
              FROM k ORDER BY rk""")
    ),

    // ── PAIRWISE JENSEN-SHANNON SOURCE DIVERGENCE (mixing map) ────────────
    QueryDef(
      "q338_js_source_matrix",
      // The corpus-mixing designer's map: JS divergence between every
      // pair of per-source unigram distributions (symmetric, bounded by
      // ln 2 — the right distance for "how different are these sources",
      // vs q335's PSI which is per-category drift of ONE stream).
      // Decomposition that avoids the full outer join: over SHARED
      // tokens, p·ln(2p/(p+q)) + q·ln(2q/(p+q)); tokens private to one
      // side contribute their whole mass at exactly ln 2, recovered in
      // closed form from the shared-mass sums. Per-token terms floor to
      // pico-nats (total error < vocab·10⁻¹²); masses stay exact BIGINT;
      // ln 2 is the pinned correctly-rounded literal.
      //
      // Shape, and why it scales: one corpus pass to the (source, token)
      // grain (checkpointed — 4 consumers), totals broadcast, and a
      // keyed equi-join ON TOKEN whose fan-out is bounded by sources²
      // per token — never an all-pairs document stage.
      (s, d) => Shared.withCheckpointDir(s) {
        val st = Tables.documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .checkpoint()
        val tot = st.groupBy("source").agg(sum(col("c")).as("n"))
        val a = st.select(col("source").as("s1"), col("tok"),
            col("c").as("c1"))
          .join(broadcast(tot.select(col("source").as("s1"),
            col("n").as("n1"))), "s1")
        val b = st.select(col("source").as("s2"), col("tok"),
            col("c").as("c2"))
          .join(broadcast(tot.select(col("source").as("s2"),
            col("n").as("n2"))), "s2")
        a.join(b, "tok").filter(col("s1") < col("s2"))
          .withColumn("t1p", expr(jsTermSql("c1", "n1", "c2", "n2")))
          .withColumn("t2p", expr(jsTermSql("c2", "n2", "c1", "n1")))
          .groupBy("s1", "s2", "n1", "n2")
          .agg(count(lit(1)).as("shared_toks"),
            sum(col("c1")).as("sc1"), sum(col("c2")).as("sc2"),
            sum(col("t1p")).as("t1"), sum(col("t2p")).as("t2"))
          .select(col("s1"), col("s2"), col("shared_toks"),
            expr(JsSql).as("js_micro"))
          .orderBy("s1", "s2")
      },
      Some(s"""WITH st AS (SELECT source, tok, count(*) AS c FROM (
                  SELECT source, unnest($SQL_TOKENS) AS tok FROM documents)
                GROUP BY 1, 2),
              tot AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
              a AS (SELECT st.source AS s1, tok, c AS c1, n AS n1
                FROM st JOIN tot ON st.source = tot.source),
              b AS (SELECT st.source AS s2, tok, c AS c2, n AS n2
                FROM st JOIN tot ON st.source = tot.source),
              t AS (SELECT s1, s2, n1, n2,
                  ${jsTermSql("c1", "n1", "c2", "n2")} AS t1p,
                  ${jsTermSql("c2", "n2", "c1", "n1")} AS t2p,
                  c1, c2
                FROM a JOIN b USING (tok) WHERE s1 < s2),
              m AS (SELECT s1, s2, n1, n2,
                  CAST(count(*) AS BIGINT) AS shared_toks,
                  sum(c1) AS sc1, sum(c2) AS sc2,
                  sum(t1p) AS t1, sum(t2p) AS t2
                FROM t GROUP BY 1, 2, 3, 4)
              SELECT s1, s2, shared_toks, $JsSql AS js_micro
              FROM m ORDER BY s1, s2"""),
      headline = true
    ),

    // ── PER-SOURCE INFORMATION PROFILE (Shannon entropy + TTR) ────────────
    QueryDef(
      "q339_entropy_profile",
      // The information-density quality signal q33's rule pack doesn't
      // carry: unigram Shannon entropy per source, H = ln N − (Σc·ln c)/N
      // (micro-nats; low H = repetitive/templated text, high H = diverse
      // vocabulary), plus the type-token ratio in exact ppm. Per-token
      // c·ln c floors to micro BEFORE the sum (the q335 quantization
      // discipline), accumulating as DECIMAL(38,0) for headroom; the
      // final H is one pinned expression over exact operands.
      //
      // Shape, and why it scales: one corpus pass to the (source, token)
      // grain, one hash re-agg to sources — no joins, no windows.
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n_tok"),
            count(lit(1)).as("vocab"),
            sum(expr("""CAST(floor(1000000.0 * CAST(c AS DOUBLE)
                * ln(CAST(c AS DOUBLE))) AS BIGINT)""")
              .cast(DecimalType(38, 0))).as("sclc_d"))
          .select(col("source"), col("n_tok"), col("vocab"),
            expr("CAST(sclc_d AS BIGINT)").as("sclc_micro"))
          .select(col("source"), col("n_tok"), col("vocab"),
            expr(EntropySql).as("h_micro"),
            expr("(1000000 * vocab) div n_tok").as("ttr_ppm"))
          .orderBy("source")
      },
      Some(s"""WITH st AS (SELECT source, tok, count(*) AS c FROM (
                  SELECT source, unnest($SQL_TOKENS) AS tok FROM documents)
                GROUP BY 1, 2),
              g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
                  CAST(count(*) AS BIGINT) AS vocab,
                  CAST(sum(CAST(floor(1000000.0 * CAST(c AS DOUBLE)
                    * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT)
                    AS sclc_micro
                FROM st GROUP BY 1)
              SELECT source, n_tok, vocab, $EntropySql AS h_micro,
                CAST((1000000 * vocab) // n_tok AS BIGINT) AS ttr_ppm
              FROM g ORDER BY source""")
    ),

    // ── CHAO1 UNSEEN-VOCABULARY ESTIMATE (corpus coverage) ────────────────
    QueryDef(
      "q340_chao1_vocab",
      // "How much vocabulary have we NOT crawled yet?" — the species-
      // richness question, answered per source with the bias-corrected
      // Chao1 estimator V + f1(f1−1)/(2(f2+1)) (f1/f2 = singleton/
      // doubleton type counts; the +1 form stays defined at f2 = 0) and
      // the Good-Turing unseen-probability mass f1/N in exact ppm. All
      // integer arithmetic — no doubles anywhere.
      //
      // Shape, and why it scales: corpus pass → (source, token) grain →
      // count-of-counts grain (tiny) → per-source row. No joins.
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(count(lit(1)).as("vocab"),
            sum(col("c")).as("n_tok"),
            sum((col("c") === 1).cast("long")).as("f1"),
            sum((col("c") === 2).cast("long")).as("f2"))
          .select(col("source"), col("vocab"), col("n_tok"), col("f1"),
            col("f2"),
            expr("vocab + (f1 * (f1 - 1)) div (2 * (f2 + 1))").as("chao1"),
            expr("(1000000 * f1) div n_tok").as("unseen_ppm"))
          .orderBy("source")
      },
      Some(s"""WITH st AS (SELECT source, tok, count(*) AS c FROM (
                  SELECT source, unnest($SQL_TOKENS) AS tok FROM documents)
                GROUP BY 1, 2),
              g AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                  CAST(sum(c) AS BIGINT) AS n_tok,
                  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS f1,
                  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS f2
                FROM st GROUP BY 1)
              SELECT source, vocab, n_tok, f1, f2,
                CAST(vocab + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
                  AS chao1,
                CAST((1000000 * f1) // n_tok AS BIGINT) AS unseen_ppm
              FROM g ORDER BY source""")
    ),

    // ── ZIPF RANK-FREQUENCY FIT (corpus health) ───────────────────────────
    QueryDef(
      "q341_zipf_fit",
      // Natural corpora obey Zipf (log-log rank-frequency slope ≈ −1);
      // machine-generated or templated corpora visibly don't — making
      // the fitted slope a one-number corpus-health check. OLS over the
      // top-100 tokens (rank ties broken by token — deterministic):
      // x = ln rank, y = ln count, both floored to micro BEFORE the
      // moment sums, so the moments are exact integers and the slope is
      // one pinned division.
      //
      // Shape, and why it scales: corpus pass → token counts →
      // TakeOrdered-100 (no global sort); the regression runs on a
      // 100-row broadcast-sized frame.
      (s, d) => {
        val top = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok").asc)
          .limit(100)
        val w = Window.orderBy(col("c").desc, col("tok").asc)
        top.withColumn("rk", row_number().over(w).cast("long"))
          .select(
            expr("CAST(floor(1000000.0 * ln(CAST(rk AS DOUBLE))) AS BIGINT)")
              .as("x"),
            expr("CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT)")
              .as("y"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n"), expr(SlopeSql).as("zipf_slope"))
      },
      Some(s"""WITH tc AS (SELECT tok, count(*) AS c FROM (
                  SELECT unnest($SQL_TOKENS) AS tok FROM documents)
                GROUP BY 1),
              top AS (SELECT tok, c,
                  CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
                    AS rk
                FROM tc ORDER BY c DESC, tok LIMIT 100),
              xy AS (SELECT
                  CAST(floor(1000000.0 * ln(CAST(rk AS DOUBLE))) AS BIGINT)
                    AS x,
                  CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT)
                    AS y
                FROM top),
              m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * y) AS BIGINT) AS sxy,
                  CAST(sum(x * x) AS BIGINT) AS sxx
                FROM xy)
              SELECT n, $SlopeSql AS zipf_slope FROM m"""),
      headline = true
    ),

    // ── BLOCKED FUZZY JOIN (Levenshtein entity resolution) ────────────────
    QueryDef(
      "q342_levenshtein_join",
      // Fuzzy entity resolution done the scalable way: NEVER compare raw
      // rows — collapse to the DISTINCT-NAME grain first (value-bounded:
      // the name vocabulary, not the row count), block by (length, first
      // word), and run Levenshtein only within blocks. Near-miss pairs
      // (1 ≤ dist ≤ 4 — dist 0 is q30's exact-dup business) carry their
      // row multiplicity cnt1·cnt2, so the output still quantifies the
      // ROW-level duplication a merge would collapse. Both engines'
      // levenshtein is the classic unit-cost Wagner-Fischer — integer,
      // no float anywhere.
      //
      // Shape, and why it scales: fact → distinct-name grain (one hash
      // agg); the pair join is keyed ON THE BLOCK (equi), quadratic only
      // within a block of a value-bounded grain. Top-20 via TakeOrdered.
      (s, d) => Shared.withCheckpointDir(s) {
        // name grain checkpoints (value-bounded): consumed by both join
        // sides — without it the part scan runs twice
        val names = Tables.part(s, d)
          .groupBy(col("p_name").as("n1"))
          .agg(count(lit(1)).as("cnt1"))
          .withColumn("l", length(col("n1")))
          .withColumn("f", expr("split_part(n1, ' ', 1)"))
          .checkpoint()
        val right = names.select(col("n1").as("n2"), col("cnt1").as("cnt2"),
          col("l"), col("f"))
        names.join(right, Seq("l", "f"))
          .filter(col("n1") < col("n2"))
          .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
          .filter(col("dist").between(1, 4))
          .select(col("n1"), col("n2"), col("dist"),
            (col("cnt1") * col("cnt2")).as("row_pairs"))
          .orderBy(col("dist"), col("n1"), col("n2"))
          .limit(20)
      },
      Some("""WITH names AS (SELECT p_name AS n, count(*) AS cnt,
                  length(p_name) AS l, split_part(p_name, ' ', 1) AS f
                FROM part GROUP BY 1),
              pairs AS (SELECT a.n AS n1, b.n AS n2,
                  CAST(levenshtein(a.n, b.n) AS BIGINT) AS dist,
                  CAST(a.cnt * b.cnt AS BIGINT) AS row_pairs
                FROM names a JOIN names b
                ON a.l = b.l AND a.f = b.f AND a.n < b.n)
              SELECT n1, n2, dist, row_pairs FROM pairs
              WHERE dist BETWEEN 1 AND 4
              ORDER BY dist, n1, n2 LIMIT 20"""),
      headline = true
    ),

    // ── SMOOTHED TARGET ENCODING (m-estimate) ─────────────────────────────
    QueryDef(
      "q343_target_encoding",
      // The feature-prep step between one-hot (cardinality-bound) and
      // embeddings (training-bound): each category's outcome rate shrunk
      // toward the global prior with pseudo-count m = 20 — rare
      // categories get the prior, frequent ones their own mean. Category
      // = (order priority × order year); outcome = order fully shipped.
      // Counts stay exact; the encoding is one pinned double block to
      // ppm.
      //
      // Shape, and why it scales: one fact pass to the category grain,
      // 1-row prior broadcast — no windows, no fact joins.
      (s, d) => Shared.withCheckpointDir(s) {
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            year(col("o_orderdate")).cast("long").as("yr"),
            (col("o_orderstatus") === "F").cast("long").as("y"))
        val g = base.groupBy("pri", "yr")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
          .checkpoint()
        // the prior folds from the CATEGORY grain (sums are associative),
        // so the fact scans exactly once
        val prior = g.agg(sum(col("n")).as("gn"), sum(col("sy")).as("gs"))
        g.crossJoin(broadcast(prior))
          .select(col("pri"), col("yr"), col("n"), col("sy"),
            expr(EncSql).as("enc_ppm"),
            expr("(1000000 * gs) div gn").as("prior_ppm"))
          .orderBy("pri", "yr")
      },
      Some(s"""WITH base AS (SELECT o_orderpriority AS pri,
                  CAST(year(o_orderdate) AS BIGINT) AS yr,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                FROM orders),
              g AS (SELECT pri, yr, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy
                FROM base GROUP BY 1, 2),
              prior AS (SELECT CAST(count(*) AS BIGINT) AS gn,
                  CAST(sum(y) AS BIGINT) AS gs FROM base)
              SELECT pri, yr, n, sy, $EncSql AS enc_ppm,
                CAST((1000000 * gs) // gn AS BIGINT) AS prior_ppm
              FROM g, prior ORDER BY pri, yr""")
    ),

    // ── MANN-KENDALL TREND TEST ───────────────────────────────────────────
    QueryDef(
      "q344_mann_kendall",
      // The nonparametric "is this series trending?" significance test —
      // the inferential complement to q269's Theil-Sen slope ESTIMATE:
      // S = Σ_{i<j} sign(x_j − x_i) over daily event counts, with the
      // tie-corrected variance 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5)
      // kept as the exact integer var18, and the continuity-corrected
      // z = (S − sgn S)/√(var18/18) as the one pinned expression.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain; the i<j comparison is a broadcast day² join on a
      // model-sized frame (≈365 rows/year at ANY corpus size).
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        // day grain checkpoints (calendar-bounded): 4 consumers — the
        // fact would otherwise scan once per subtree
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("x"))
          .checkpoint()
        val j = daily.select(col("day").as("dayj"), col("x").as("xj"))
        val sS = daily.join(broadcast(j), col("day") < col("dayj"))
          .agg((sum((col("xj") > col("x")).cast("long"))
            - sum((col("xj") < col("x")).cast("long"))).as("s"))
        val nD = daily.agg(count(lit(1)).as("n"))
        val ties = daily.groupBy("x").agg(count(lit(1)).as("t"))
          .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tsum"))
        sS.crossJoin(broadcast(nD)).crossJoin(broadcast(ties))
          .select(col("n"), col("s"),
            expr("n * (n - 1) * (2 * n + 5) - tsum").as("var18"))
          .select(col("n"), col("s"), col("var18"),
            expr(MkzSql).as("z_mk"))
      },
      Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  count(*) AS x FROM events GROUP BY 1),
              ss AS (SELECT CAST(
                  sum(CASE WHEN j.x > i.x THEN 1 ELSE 0 END)
                  - sum(CASE WHEN j.x < i.x THEN 1 ELSE 0 END) AS BIGINT)
                    AS s
                FROM daily i JOIN daily j ON i.day < j.day),
              nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
              ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                    AS tsum
                FROM (SELECT count(*) AS t FROM daily GROUP BY x)),
              m AS (SELECT n, s,
                  n * (n - 1) * (2 * n + 5) - tsum AS var18
                FROM ss, nd, ties)
              SELECT n, s, var18, $MkzSql AS z_mk FROM m""")
    ),

    // ── SPRT SEQUENTIAL TEST (early stopping) ─────────────────────────────
    QueryDef(
      "q345_sprt",
      // Wald's sequential probability ratio test — the "stop the
      // experiment as soon as the evidence is in" primitive the fixed-
      // horizon A/B suite (q244/q285/q303) lacks. H0: conversion
      // p₀ = 0.35 vs H1: p₁ = 0.40 (conversion = value ≥ 50), α = β =
      // 0.05. The per-trial log-likelihood increments are PINNED integer
      // micro-nat literals (floor(10⁶·ln(p₁/p₀)) = 133531,
      // floor(10⁶·ln((1−p₁)/(1−p₀))) = −80043 — never a runtime log),
      // so the day-cumulative LLR is an exact BIGINT in both engines;
      // boundaries ±ln 19 are the micro literals 2944439 / −2944440.
      // Output: the first boundary-crossing day and its decision, or the
      // final day marked 'continue'.
      //
      // Shape, and why it scales: one fact pass to the calendar-bounded
      // day grain, cumulative LLR via the distributedPrefixSum backbone
      // (never a single-partition fact window), one TakeOrdered(1).
      (s, d) => Shared.withCheckpointDir(s) {
        val dayNs = 86400L * 1000L * 1000L * 1000L
        // day grain checkpoints: distributedPrefixSum reads it twice
        // (local cumsums + bucket offsets)
        val daily = Tables.events(s, d)
          .groupBy(expr(s"ts div ${dayNs}L").as("day"))
          .agg(count(lit(1)).as("nt"),
            sum((col("value") >= 50.0).cast("long")).as("ct"))
          .withColumn("term",
            col("ct") * 133531L + (col("nt") - col("ct")) * lit(-80043L))
          .checkpoint()
        val cum = distributedPrefixSum(daily, "day", "term", 256L)
          .withColumn("llr_micro", col("cum") + col("term"))
          .withColumn("decision",
            when(col("llr_micro") >= 2944439L, "accept_h1")
              .when(col("llr_micro") <= -2944440L, "accept_h0")
              .otherwise("continue"))
        cum
          .withColumn("pri", when(col("decision") =!= "continue", 0L)
            .otherwise(1L))
          .withColumn("ord", when(col("decision") =!= "continue", col("day"))
            .otherwise(-col("day")))
          .orderBy(col("pri"), col("ord"))
          .select(col("day"), col("nt"), col("ct"), col("llr_micro"),
            col("decision"))
          .limit(1)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS nt,
                  CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct
                FROM events GROUP BY 1),
              c AS (SELECT day, nt, ct,
                  CAST(sum(ct * 133531 + (nt - ct) * (-80043))
                    OVER (ORDER BY day) AS BIGINT) AS llr_micro
                FROM daily),
              dcd AS (SELECT *,
                  CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
                       WHEN llr_micro <= -2944440 THEN 'accept_h0'
                       ELSE 'continue' END AS decision
                FROM c)
              SELECT day, nt, ct, llr_micro, decision FROM dcd
              ORDER BY CASE WHEN decision <> 'continue' THEN 0 ELSE 1 END,
                CASE WHEN decision <> 'continue' THEN day ELSE -day END
              LIMIT 1"""),
      headline = true
    )
  )
}
