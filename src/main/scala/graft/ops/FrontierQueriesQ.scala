package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-9 frontier wave (wave 21): three statistics every
  * experimentation / data-quality platform eventually needs and none of
  * the 379 existing registry entries covers (novelty grep-checked,
  * ROUND_NOTES item 23):
  *
  *  - Mantel–Haenszel pooled odds ratio — the confounder-adjusted
  *    2×2 effect estimate ([[FrontierQueriesM]]'s `stat_odds_ratio` is
  *    the UNstratified form; MH pools per-stratum tables so a stratum-
  *    mix confound cannot manufacture or mask an association —
  *    Simpson's-paradox insurance).
  *  - Theil inequality index with between/within decomposition — the
  *    entropy-based inequality measure whose DECOMPOSABILITY is the
  *    point (`agg_gini_index` / `agg_palma_ratio` rank distributions
  *    but cannot attribute inequality to between-group vs within-group
  *    structure; Theil's T = T_between + Σ s_g·T_g does exactly that —
  *    the "is my token budget concentrated by source or within source"
  *    question of a data-mix owner).
  *  - Benjamini–Hochberg FDR — the step-up multiple-testing control
  *    run over a FAMILY of per-cell tests (the registry's z/χ²/t tests
  *    all answer one hypothesis; any per-segment scan asks hundreds,
  *    and BH is the standard way to report discoveries without the
  *    false-positive flood).
  *
  * Determinism conventions as the prior waves: exact integer/decimal
  * aggregation for everything order-insensitive, ordered left-folds
  * (sort_array+aggregate ↔ list(ORDER BY)+list_reduce) for every
  * double sum, one fixed double tree per scalar, ROUND(…, 9) at the
  * output.
  */
object FrontierQueriesQ {

  /** Normal CDF upper tail via Abramowitz–Stegun 7.1.26 (|ε| < 7.5e−8)
    * — neither engine ships erf, so the SAME five-term polynomial tree
    * is spelled out on both sides and agrees bit-for-bit; the 1e-7
    * approximation error is identical in both engines and orders of
    * magnitude above the round-9 output granularity only when p itself
    * is, which is fine for a RANKING procedure like BH (both engines
    * rank the same p vector). Two-sided p = 2·(1−Φ(|z|)). */
  private def pTwoSided(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) +
      t * (lit(-0.356563782) +
        t * (lit(1.781477937) +
          t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val pdf = lit(0.3989422804014327) * exp(lit(-0.5) * az * az)
    lit(2.0) * pdf * poly
  }

  /** SQL twin of [[pTwoSided]] — textually the same tree. */
  private def pTwoSidedSql(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.2316419 * ABS($z)))"
    s"""(2.0 * (0.3989422804014327 * EXP(-0.5 * ABS($z) * ABS($z))) *
       |  ($t * (0.319381530 + $t * (-0.356563782 + $t * (1.781477937 +
       |    $t * (-1.821255978 + $t * 1.330274429))))))""".stripMargin
  }

  /** Ordered left-fold of a double term over rows of a group — the
    * suite's order-insensitive double-sum recipe (sort key k must be
    * unique within the group). */
  private def foldSum(k: Column, v: Column): Column =
    aggregate(
      sort_array(collect_list(struct(k.as("k"), v.as("v")))),
      lit(0.0), (acc, x) => acc + x("v"))

  // ---------------------------------------------------------- MH odds ratio

  /** MANTEL–HAENSZEL pooled odds ratio across nation strata — does
    * high-value ordering (totalprice > 150k) associate with fulfilled
    * status once the customer's nation is held fixed? Reports the crude
    * (pooled-table) OR next to OR_MH: their gap IS the confounding
    * signal (Simpson's paradox in one row).
    *
    * OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ) over the 25 per-nation 2×2
    * tables — the weights need no iteration and no variance model,
    * which is why MH survives sparse strata where logistic regression
    * won't fit.
    *
    * Scale posture: one orders⋈customer join (dimension broadcast), one
    * (nation, E, Y) rollup — the 2×2 cells are four conditional counts;
    * the two double sums fold over 25 nation-ordered terms.
    * Determinism: cells are exact BIGINTs; ad/n and bc/n are one double
    * division each; folds ordered; round 9. */
  def statMantelHaenszel(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) > 150000.0).as("e"),
      (col("o_orderstatus") === "F").as("y"))
    val cells = o
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .groupBy("c_nationkey")
      .agg(
        sum(when(col("e") && col("y"), 1L).otherwise(0L)).as("a"),
        sum(when(col("e") && !col("y"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("e") && col("y"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("e") && !col("y"), 1L).otherwise(0L)).as("dd"))
      .withColumn("n", col("a") + col("b") + col("c") + col("dd"))
    cells
      .agg(
        count(lit(1)).as("n_strata"),
        sum("a").as("sa"), sum("b").as("sb"),
        sum("c").as("sc"), sum("dd").as("sd"),
        foldSum(col("c_nationkey"),
          col("a").cast(DoubleType) * col("dd").cast(DoubleType) /
            col("n").cast(DoubleType)).as("num"),
        foldSum(col("c_nationkey"),
          col("b").cast(DoubleType) * col("c").cast(DoubleType) /
            col("n").cast(DoubleType)).as("den"))
      .select(col("n_strata"),
        round((col("sa").cast(DoubleType) * col("sd").cast(DoubleType)) /
          (col("sb").cast(DoubleType) * col("sc").cast(DoubleType)), 9)
          .as("or_crude"),
        round(col("num") / col("den"), 9).as("or_mh"))
  }

  // ---------------------------------------------------------- Theil index

  /** THEIL T INEQUALITY INDEX of per-customer revenue, DECOMPOSED by
    * nation: T_total = T_between + Σ s_g·T_g (s_g = nation revenue
    * share). The decomposability is what Gini/Palma/HHI cannot do —
    * it answers WHERE the concentration lives: rows −2 (total) and
    * −1 (between) head the per-nation within rows, and the spec pins
    * the identity to 1e-9.
    *
    * T = Σ x·ln(x) / (n·μ) − ln(μ) over positive values x — the
    * algebraic form with exactly ONE order-sensitive sum (Σ x·ln x),
    * folded in customer order per nation; the 25 per-nation folds then
    * fold once more in nation order for the global sum. Everything
    * else (n, Σx, shares) is exact integer/decimal.
    *
    * Scale posture: one per-customer revenue rollup (the fact shuffle),
    * one dimension join, one 25-group rollup; the per-nation
    * collect+fold holds one nation's customer terms at a time — the
    * same budget as the suite's other ordered folds, swapped for a
    * two-level mergeable tree when a single group outgrows a task. */
  def aggTheilDecomp(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast(LongType).as("cents"))
    val byCust = rev
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .select(col("c_nationkey"), col("o_custkey"),
        col("cents"), (col("cents").cast(DoubleType) / 100.0).as("x"))
    val g = byCust.groupBy("c_nationkey").agg(
      count(lit(1)).as("n_g"),
      sum("cents").as("cents_g"),
      foldSum(col("o_custkey"), col("x") * log(col("x"))).as("sxlx_g"))
    // the between fold needs the global mean/total INSIDE the fold's
    // term — compute totals first, broadcast the 1-row frame back
    val totals = g.agg(sum("n_g").as("n"), sum("cents_g").as("cents_t"))
      .select(col("n"), col("cents_t"),
        (col("cents_t").cast(DoubleType) / 100.0 / col("n").cast(DoubleType))
          .as("mu_t"))
    val gw = g.crossJoin(broadcast(totals))
    val muG = col("cents_g").cast(DoubleType) / 100.0 / col("n_g").cast(DoubleType)
    val within = gw.select(
      col("c_nationkey"),
      col("n_g").as("n_customers"),
      round(col("cents_g").cast(DoubleType) / col("cents_t").cast(DoubleType), 9)
        .as("revenue_share"),
      round(col("sxlx_g") / (col("n_g").cast(DoubleType) * muG) - log(muG), 9)
        .as("theil"))
    val globalRows = gw.groupBy(lit(1))
      .agg(
        max("n").as("n"), max("cents_t").as("cents_t"), max("mu_t").as("mu_t"),
        foldSum(col("c_nationkey"), col("sxlx_g")).as("sxlx"))
      .select(
        lit(-2L).as("c_nationkey"), col("n").as("n_customers"),
        lit(1.0).as("revenue_share"),
        round(col("sxlx") / (col("n").cast(DoubleType) * col("mu_t")) -
          log(col("mu_t")), 9).as("theil"))
      .unionAll(gw.groupBy(lit(1))
        .agg(max("n").as("n"),
          foldSum(col("c_nationkey"),
            (col("cents_g").cast(DoubleType) / col("cents_t").cast(DoubleType)) *
              log(muG / col("mu_t"))).as("t_between"))
        .select(lit(-1L).as("c_nationkey"), col("n").as("n_customers"),
          lit(1.0).as("revenue_share"),
          round(col("t_between"), 9).as("theil")))
    globalRows.select("c_nationkey", "n_customers", "revenue_share", "theil")
      .unionAll(within)
      .orderBy("c_nationkey")
  }

  // ---------------------------------------------------------- BH FDR

  /** BENJAMINI–HOCHBERG FDR over the family of per-nation return-rate
    * tests — for each nation, a two-proportion z of its lineitem return
    * rate against all other nations pooled, then the step-up procedure
    * at α = 0.05: rank p ascending, find the largest k with
    * p(k) ≤ k·α/m, declare ranks ≤ k discoveries, and report the
    * standard adjusted p (suffix-min of m·p/rank, capped at 1). The
    * family size m is COUNT(*) over the hypothesis frame on both
    * engines (r9 advice) — a corpus where fewer nations survive the
    * joins tests the family it actually has, not a literal 25.
    *
    * Determinism: counts exact; z one fixed tree; p via the A&S
    * polynomial [[pTwoSided]] rounded to 9 BEFORE the procedure on both
    * engines, so ranks and threshold comparisons see identical values;
    * rank ties break on the nation key.
    *
    * Scale posture: one (nation) rollup of the fact join (broadcast
    * dims), then windows over the m = 25 hypothesis rows — the window
    * partition is the HYPOTHESIS FAMILY, constant-size by construction
    * (a million-segment scan makes m the segment count: still sketch-
    * size next to the fact table the rollup reduced). */
  def statBhFdr(s: SparkSession, d: String): DataFrame = {
    val alpha = 0.05
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      (col("l_returnflag") === "R").as("r"))
    val byNation = li
      .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey")), Seq("l_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_i"),
        sum(when(col("r"), 1L).otherwise(0L)).as("k_i"))
    val tot = byNation.agg(sum("n_i").as("nn"), sum("k_i").as("kk"))
    val withP = byNation.crossJoin(broadcast(tot)).select(
      col("c_nationkey"), col("n_i"), {
        val n1 = col("n_i").cast(DoubleType)
        val n2 = (col("nn") - col("n_i")).cast(DoubleType)
        val p1 = col("k_i").cast(DoubleType) / n1
        val p2 = (col("kk") - col("k_i")).cast(DoubleType) / n2
        val pbar = col("kk").cast(DoubleType) / col("nn").cast(DoubleType)
        val se = sqrt(pbar * (lit(1.0) - pbar) * (lit(1.0) / n1 + lit(1.0) / n2))
        round((p1 - p2) / se, 9).as("z")
      })
      .withColumn("p_value", round(pTwoSided(col("z")), 9))
    val wRank = Window.orderBy(col("p_value"), col("c_nationkey"))
    val wSuffix = Window.orderBy(col("p_value").desc, col("c_nationkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    withP
      .withColumn("rk", row_number().over(wRank))
      // m derived from the family actually tested (r9 advice): count(*)
      // over the unbounded window, not a literal 25 — a corpus where
      // fewer nations survive the joins gets the right step-up slope
      .withColumn("mm", count(lit(1)).over(wAll))
      .withColumn("p_adj", round(least(lit(1.0),
        min(col("mm").cast(DoubleType) * col("p_value") / col("rk"))
          .over(wSuffix)), 9))
      .withColumn("kstar", max(when(
        col("p_value") <= col("rk").cast(DoubleType) * lit(alpha) /
          col("mm").cast(DoubleType), col("rk"))).over(wAll))
      .select(col("c_nationkey"), col("n_i").as("n_items"), col("z"),
        col("p_value"), col("p_adj"),
        (col("rk") <= coalesce(col("kstar"), lit(0))).as("discovered"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_mantel_haenszel" -> statMantelHaenszel _,
    "agg_theil_decomp"     -> aggTheilDecomp _,
    "stat_bh_fdr"          -> statBhFdr _,
  )

  val oracle: Map[String, String] = Map(
    "stat_mantel_haenszel" ->
      """WITH cells AS (
        |  SELECT c_nationkey,
        |    CAST(SUM(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT e AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS dd
        |  FROM (
        |    SELECT c.c_nationkey,
        |      CAST(o.o_totalprice AS DECIMAL(18,2)) > 150000.0 AS e,
        |      o.o_orderstatus = 'F' AS y
        |    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |  GROUP BY 1),
        |t AS (SELECT c_nationkey, a, b, c, dd, a + b + c + dd AS n FROM cells)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |  ROUND((CAST(SUM(a) AS DOUBLE) * CAST(SUM(dd) AS DOUBLE)) /
        |        (CAST(SUM(b) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)), 9)
        |    AS or_crude,
        |  ROUND(
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE) / CAST(n AS DOUBLE)
        |        ORDER BY c_nationkey)), (s, x) -> s + x) /
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |        ORDER BY c_nationkey)), (s, x) -> s + x), 9) AS or_mh
        |FROM t""".stripMargin,
    "agg_theil_decomp" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |bycust AS (
        |  SELECT c.c_nationkey, r.o_custkey, r.cents,
        |    CAST(r.cents AS DOUBLE) / 100.0 AS x
        |  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey),
        |g AS (
        |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(cents) AS BIGINT) AS cents_g,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(x * LN(x) ORDER BY o_custkey)), (s, v) -> s + v) AS sxlx_g
        |  FROM bycust GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(cents_g) AS BIGINT) AS cents_t,
        |    CAST(SUM(cents_g) AS DOUBLE) / 100.0 / CAST(SUM(n_g) AS DOUBLE)
        |      AS mu_t,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sxlx_g ORDER BY c_nationkey)), (s, v) -> s + v) AS sxlx
        |  FROM g),
        |btw AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((CAST(g.cents_g AS DOUBLE) / CAST(t.cents_t AS DOUBLE)) *
        |      LN((CAST(g.cents_g AS DOUBLE) / 100.0 / CAST(g.n_g AS DOUBLE))
        |        / t.mu_t) ORDER BY g.c_nationkey)), (s, v) -> s + v)
        |    AS t_between
        |  FROM g, tot t)
        |SELECT CAST(-2 AS BIGINT) AS c_nationkey, t.n AS n_customers,
        |  1.0 AS revenue_share,
        |  ROUND(t.sxlx / (CAST(t.n AS DOUBLE) * t.mu_t) - LN(t.mu_t), 9)
        |    AS theil
        |FROM tot t
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), t.n, 1.0, ROUND(b.t_between, 9)
        |FROM tot t, btw b
        |UNION ALL
        |SELECT g.c_nationkey, g.n_g,
        |  ROUND(CAST(g.cents_g AS DOUBLE) / CAST(t.cents_t AS DOUBLE), 9),
        |  ROUND(g.sxlx_g / (CAST(g.n_g AS DOUBLE) *
        |      (CAST(g.cents_g AS DOUBLE) / 100.0 / CAST(g.n_g AS DOUBLE)))
        |    - LN(CAST(g.cents_g AS DOUBLE) / 100.0 / CAST(g.n_g AS DOUBLE)), 9)
        |FROM g, tot t
        |ORDER BY c_nationkey""".stripMargin,
    "stat_bh_fdr" -> {
      val pSql = pTwoSidedSql("z")
      s"""WITH byn AS (
         |  SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_i,
         |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k_i
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
         |  CAST(SUM(k_i) AS BIGINT) AS kk FROM byn),
         |withz AS (
         |  SELECT b.c_nationkey, b.n_i,
         |    ROUND(
         |      (CAST(b.k_i AS DOUBLE) / CAST(b.n_i AS DOUBLE) -
         |       CAST(t.kk - b.k_i AS DOUBLE) / CAST(t.nn - b.n_i AS DOUBLE)) /
         |      SQRT((CAST(t.kk AS DOUBLE) / CAST(t.nn AS DOUBLE)) *
         |        (1.0 - CAST(t.kk AS DOUBLE) / CAST(t.nn AS DOUBLE)) *
         |        (1.0 / CAST(b.n_i AS DOUBLE) +
         |         1.0 / CAST(t.nn - b.n_i AS DOUBLE))), 9) AS z
         |  FROM byn b, tot t),
         |withp AS (
         |  SELECT c_nationkey, n_i, z, ROUND($pSql, 9) AS p_value
         |  FROM withz),
         |ranked AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (ORDER BY p_value, c_nationkey) AS rk,
         |    COUNT(*) OVER () AS mm
         |  FROM withp),
         |adj AS (
         |  SELECT *,
         |    ROUND(LEAST(1.0,
         |      MIN(CAST(mm AS DOUBLE) * p_value / CAST(rk AS DOUBLE)) OVER (
         |      ORDER BY p_value DESC, c_nationkey DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 9)
         |      AS p_adj,
         |    MAX(CASE WHEN p_value <= CAST(rk AS DOUBLE) * 0.05 /
         |      CAST(mm AS DOUBLE) THEN rk END)
         |      OVER () AS kstar
         |  FROM ranked)
         |SELECT c_nationkey, n_i AS n_items, z, p_value, p_adj,
         |  rk <= COALESCE(kstar, 0) AS discovered
         |FROM adj ORDER BY c_nationkey""".stripMargin
    },
  )
}
