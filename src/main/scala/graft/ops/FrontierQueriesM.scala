package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.text.TextAnalysis.tokenCount

/** Round-8 sixteenth frontier wave: the 2×2 association readout with
  * its confidence interval (odds ratio + relative risk — completing
  * the 2×2 family next to χ²/V/κ/MCC/McNemar), the finance-analytics
  * price-volume bridge (period-over-period revenue decomposition at
  * the bounded brand grain), Durbin–Watson serial-correlation (all
  * moments exact DECIMAL — the residual-autocorrelation gate under
  * [[FrontierQueriesK.statDickeyFuller]]'s regression), and cohort
  * LTV (the money sibling of [[FrontierQueriesJ.aggRetentionCohorts]],
  * integer cents end to end). Registry novelty grep-checked first
  * (ROUND_NOTES item 23). Module conventions as the earlier waves.
  */
object FrontierQueriesM {

  /** Bridge period split (ship date). */
  private val BridgeSplit = "1998-01-01"

  // ----------------------------------------------------------- association

  /** ODDS RATIO + RELATIVE RISK with a 95% CI — does passing the
    * length gate make a document MORE LIKELY to pass the token gate?
    * OR = ad/bc over the same 2×2 as [[FrontierQueriesJ.statMcnemar]]
    * (McNemar asks if the raters disagree systematically; this asks
    * how strongly they ASSOCIATE), with the Woolf interval
    * exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)).
    *
    * Determinism — Haldane–Anscombe +½ on every cell (this corpus has
    * a genuinely empty discordant cell, and the correction is the
    * standard fix, not a workaround): in (2a+1)-form the corrected
    * OR = (2a+1)(2d+1)/((2b+1)(2c+1)) and RR keep every product an
    * exact BIGINT (≤ 10¹⁰ at sf1 — audited), ln OR stays integer-ln
    * with O(1) weights, 1/(a+½) = 2/(2a+1) keeps the Woolf se a fixed
    * tree of integer-argument divisions; round 9.
    *
    * Scale posture: one constant-width conditional rollup. */
  def statOddsRatio(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d).select(
      (col("n_chars") >= 300L).as("ga"),
      (tokenCount(col("text")) >= 50).as("gb"))
    g.agg(
      sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("a"),
      sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd").as("d"), {
        val (a2, b2, c2, d2) = (col("a") * 2L + 1L, col("b") * 2L + 1L,
          col("c") * 2L + 1L, col("dd") * 2L + 1L)
        val lnOr = log((a2 * d2).cast(DoubleType)) -
          log((b2 * c2).cast(DoubleType))
        val se = sqrt(lit(2.0) / a2.cast(DoubleType) +
          lit(2.0) / b2.cast(DoubleType) +
          lit(2.0) / c2.cast(DoubleType) +
          lit(2.0) / d2.cast(DoubleType))
        val rr = ((a2 * (c2 + d2)).cast(DoubleType) /
          (c2 * (a2 + b2)).cast(DoubleType))
        struct(
          round((a2 * d2).cast(DoubleType) / (b2 * c2).cast(DoubleType), 9)
            .as("odds_ratio"),
          round(rr, 9).as("relative_risk"),
          round(exp(lnOr - lit(1.96) * se), 9).as("ci_low"),
          round(exp(lnOr + lit(1.96) * se), 9).as("ci_high")).as("r")
      })
      .select(col("a"), col("b"), col("c"), col("d"),
        col("r.odds_ratio").as("odds_ratio"),
        col("r.relative_risk").as("relative_risk"),
        col("r.ci_low").as("ci_low"), col("r.ci_high").as("ci_high"))
  }

  // ---------------------------------------------------------------- bridge

  /** PRICE–VOLUME REVENUE BRIDGE by brand — decompose each brand's
    * revenue change across the 1998 ship-date split into a price
    * effect (R₂/Q₂ − R₁/Q₁)·Q₂ and a volume effect (Q₂ − Q₁)·R₁/Q₁,
    * which sum to ΔR exactly. THE finance-review explanation of "why
    * did revenue move" — and the same bridge explains token-volume
    * shifts between crawl snapshots.
    *
    * Determinism: the brand grain is BOUNDED (25 brands — effects are
    * per-row fixed trees, never a cross-row double sum; the part grain
    * would scale with the corpus and was rejected for exactly that
    * reason); R in exact cents, Q in exact integer units; ΔR is
    * reported as exact BIGINT cents; the effects are reported as
    * RATIOS of period-1 revenue — price = R₂/R₁ − Q₂/Q₁ and
    * volume = (Q₂−Q₁)/Q₁, each a fixed tree of exact-integer ratios
    * at O(1) magnitude (absolute dollar effects at ~10⁷ magnitude
    * failed round-9's 16-significant-digit demand — the
    * time_seasonal_index lesson, measured again here); round 9. The
    * decomposition identity price + volume = ΔR/R₁ is spec-pinned.
    *
    * Scale posture: one lineitem→part equi-join (broadcastable part
    * dim at test SFs), one (brand, period) rollup, a 25-row pivot. */
  def aggRevenueBridge(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).join(
      Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
      col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        (to_date(col("l_shipdate")) < lit(BridgeSplit)).as("p1"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"),
        col("l_quantity").cast(LongType).as("q"))
    val byPeriod = li.groupBy("p_brand")
      .agg(sum(when(col("p1"), col("cents")).otherwise(0L)).as("r1"),
        sum(when(col("p1"), col("q")).otherwise(0L)).as("q1"),
        sum(when(!col("p1"), col("cents")).otherwise(0L)).as("r2"),
        sum(when(!col("p1"), col("q")).otherwise(0L)).as("q2"))
      .filter(col("q1") > 0L && col("q2") > 0L)
    byPeriod.select(col("p_brand"), col("r1").as("r1_cents"),
      col("r2").as("r2_cents"), (col("r2") - col("r1")).as("delta_cents"), {
        val (r1d, q1d) = (col("r1").cast(DoubleType), col("q1").cast(DoubleType))
        val (r2d, q2d) = (col("r2").cast(DoubleType), col("q2").cast(DoubleType))
        struct(
          round(r2d / r1d - q2d / q1d, 9).as("price_effect_ratio"),
          round((q2d - q1d) / q1d, 9).as("volume_effect_ratio")).as("e")
      })
      .select(col("p_brand"), col("r1_cents"), col("r2_cents"),
        col("delta_cents"),
        col("e.price_effect_ratio").as("price_effect_ratio"),
        col("e.volume_effect_ratio").as("volume_effect_ratio"))
      .orderBy("p_brand")
  }

  // ------------------------------------------------------------ serial corr

  /** DURBIN–WATSON on the mean-centered daily revenue series —
    * DW = Σ(e_t − e_{t−1})²/Σe_t², read against 2 (no serial
    * correlation), <2 positive, >2 negative. The serial-correlation
    * gate under every OLS-on-time-series readout
    * ([[FrontierQueriesK.statDickeyFuller]], the trend fits): serially
    * correlated residuals make OLS standard errors lies.
    *
    * Determinism: e_t = n·x_t − S are exact integers (the
    * [[FrontierQueriesI.timeAcf]] scaling); both quadratic sums
    * accumulate in exact DECIMAL(38,0) (diff² ≤ 4×10²⁷ at sf1 —
    * audited) and VARCHAR-hop; DW is ONE division; round 9.
    *
    * Scale posture: one keyed rollup to daily cents + one bounded lag
    * window + one constant-width rollup. */
  def statDurbinWatson(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("x"))
      .groupBy("day").agg(sum(col("x")).as("x"))
    val g = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val e = daily.crossJoin(broadcast(g))
      .select(col("day"), col("n"),
        (col("x").cast(DecimalType(18, 0)) * col("n") -
          col("s").cast(DecimalType(18, 0))).as("e"))
    val lagged = e.select(col("n"), col("e"),
      lag(col("e"), 1).over(Window.orderBy("day")).as("ep"))
    lagged.agg(max(col("n")).as("n_days"),
      sum(col("e") * col("e")).as("den"),
      sum(when(col("ep").isNotNull,
        (col("e") - col("ep")) * (col("e") - col("ep")))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("num"))
      .select(col("n_days"),
        round(col("num").cast(StringType).cast(DoubleType) /
          col("den").cast(StringType).cast(DoubleType), 9).as("dw"))
  }

  // ------------------------------------------------------------------- LTV

  /** COHORT LTV — cumulative purchase revenue per signup-week cohort
    * at each week offset, absolute and per cohort member. The MONEY
    * sibling of [[FrontierQueriesJ.aggRetentionCohorts]] (which counts
    * heads): together they answer "do later cohorts monetize faster".
    *
    * Determinism: everything is integer cents and integer counts; the
    * cumulative is an integer window sum over the bounded
    * cohort×offset grid; per-member LTV is exact DIV cents.
    *
    * Scale posture: one min-aggregate and one revenue rollup keyed on
    * user_id (co-partitioned), then windowing only on the calendar
    * grid. */
  def aggCohortLtv(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"),
        col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
          .as("cents"))
    val first = e.groupBy("user_id").agg(min(col("w")).as("cw"))
    val sizes = first.groupBy("cw").agg(count(lit(1)).as("n_users"))
    val rev = e.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("cw"),
        (datediff(col("w"), col("cw")) / 7).cast(LongType).as("week_offset"),
        col("cents"))
      .groupBy("cohort_week", "cw", "week_offset")
      .agg(sum(col("cents")).as("revenue_cents"))
    val wCum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(sizes), Seq("cw"))
      .select(col("cohort_week"), col("week_offset"), col("revenue_cents"),
        sum(col("revenue_cents")).over(wCum).as("cum_cents"),
        col("n_users"))
      .select(col("cohort_week"), col("week_offset"), col("revenue_cents"),
        col("cum_cents"), col("n_users"),
        expr("cum_cents DIV n_users").as("ltv_cents"))
      .orderBy("cohort_week", "week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_odds_ratio"     -> statOddsRatio _,
    "agg_revenue_bridge"  -> aggRevenueBridge _,
    "stat_durbin_watson"  -> statDurbinWatson _,
    "agg_cohort_ltv"      -> aggCohortLtv _,
  )

  private val toks = TextQueries.tokensSql

  val oracle: Map[String, String] = Map(
    "stat_odds_ratio" ->
      s"""WITH g AS (
         |  SELECT (n_chars >= 300) AS ga, (len($toks) >= 50) AS gb
         |  FROM documents),
         |m AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b,
         |    CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c,
         |    CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM g),
         |h AS (
         |  SELECT a, b, c, d,
         |    a * 2 + 1 AS a2, b * 2 + 1 AS b2, c * 2 + 1 AS c2,
         |    d * 2 + 1 AS d2
         |  FROM m)
         |SELECT a, b, c, d,
         |  ROUND(CAST(a2 * d2 AS DOUBLE) / CAST(b2 * c2 AS DOUBLE), 9)
         |    AS odds_ratio,
         |  ROUND(CAST(a2 * (c2 + d2) AS DOUBLE) /
         |    CAST(c2 * (a2 + b2) AS DOUBLE), 9) AS relative_risk,
         |  ROUND(EXP((LN(CAST(a2 * d2 AS DOUBLE)) -
         |      LN(CAST(b2 * c2 AS DOUBLE)))
         |    - 1.96 * SQRT(2.0 / CAST(a2 AS DOUBLE) + 2.0 /
         |      CAST(b2 AS DOUBLE)
         |      + 2.0 / CAST(c2 AS DOUBLE) + 2.0 / CAST(d2 AS DOUBLE))), 9)
         |    AS ci_low,
         |  ROUND(EXP((LN(CAST(a2 * d2 AS DOUBLE)) -
         |      LN(CAST(b2 * c2 AS DOUBLE)))
         |    + 1.96 * SQRT(2.0 / CAST(a2 AS DOUBLE) + 2.0 /
         |      CAST(b2 AS DOUBLE)
         |      + 2.0 / CAST(c2 AS DOUBLE) + 2.0 / CAST(d2 AS DOUBLE))), 9)
         |    AS ci_high
         |FROM h""".stripMargin,
    "agg_revenue_bridge" ->
      s"""WITH li AS (
         |  SELECT p.p_brand,
         |    CAST(l_shipdate AS DATE) < DATE '$BridgeSplit' AS p1,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents,
         |    CAST(l_quantity AS BIGINT) AS q
         |  FROM lineitem JOIN part p ON l_partkey = p.p_partkey),
         |bp AS (
         |  SELECT p_brand,
         |    CAST(SUM(CASE WHEN p1 THEN cents ELSE 0 END) AS BIGINT) AS r1,
         |    CAST(SUM(CASE WHEN p1 THEN q ELSE 0 END) AS BIGINT) AS q1,
         |    CAST(SUM(CASE WHEN NOT p1 THEN cents ELSE 0 END) AS BIGINT)
         |      AS r2,
         |    CAST(SUM(CASE WHEN NOT p1 THEN q ELSE 0 END) AS BIGINT) AS q2
         |  FROM li GROUP BY 1)
         |SELECT p_brand, r1 AS r1_cents, r2 AS r2_cents,
         |  r2 - r1 AS delta_cents,
         |  ROUND(CAST(r2 AS DOUBLE) / CAST(r1 AS DOUBLE) -
         |    CAST(q2 AS DOUBLE) / CAST(q1 AS DOUBLE), 9)
         |    AS price_effect_ratio,
         |  ROUND((CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE)) /
         |    CAST(q1 AS DOUBLE), 9) AS volume_effect_ratio
         |FROM bp WHERE q1 > 0 AND q2 > 0 ORDER BY p_brand""".stripMargin,
    "stat_durbin_watson" ->
      """WITH daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS s FROM daily),
        |e AS (
        |  SELECT day, g.n,
        |    CAST(x AS DECIMAL(18,0)) * g.n - CAST(s AS DECIMAL(18,0)) AS e
        |  FROM daily CROSS JOIN g),
        |lagged AS (
        |  SELECT n, e, LAG(e) OVER (ORDER BY day) AS ep FROM e)
        |SELECT MAX(n) AS n_days,
        |  ROUND(CAST(CAST(SUM(CASE WHEN ep IS NOT NULL
        |      THEN (e - ep) * (e - ep)
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(SUM(e * e) AS VARCHAR) AS DOUBLE), 9) AS dw
        |FROM lagged""".stripMargin,
    "agg_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w,
        |    event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |f AS (SELECT user_id, MIN(w) AS cw FROM e GROUP BY 1),
        |sizes AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM f GROUP BY 1),
        |rev AS (
        |  SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week, f.cw,
        |    CAST(date_diff('day', f.cw, e.w) // 7 AS BIGINT)
        |      AS week_offset,
        |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |  FROM e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT cohort_week, week_offset, revenue_cents,
        |  CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents,
        |  n_users,
        |  CAST(CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    // n_users AS BIGINT) AS ltv_cents
        |FROM rev JOIN sizes ON rev.cw = sizes.cw
        |ORDER BY cohort_week, week_offset""".stripMargin,
  )
}
