package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType, LongType}

/** Round-9 frontier wave 26 (novelty grep-checked against all 391
  * registry names):
  *
  *  - Deming regression — errors-in-BOTH-variables line fit (every OLS
  *    in the registry assumes the regressor is exact; when both axes
  *    are measurements — two instruments, two pipelines scoring the
  *    same documents — OLS attenuates the slope and Deming's
  *    closed-form eigenvector fit is the standard method-comparison
  *    estimator).
  *  - Historical VaR / CVaR — the nearest-rank 95% value-at-risk and
  *    the expected shortfall BEYOND it (the tail MEAN is what the
  *    percentile family cannot report: `agg_percentile_interp` and
  *    friends stop at the quantile; CVaR is the coherent risk measure
  *    regulators actually ask for).
  */
object FrontierQueriesV {

  /** DEMING REGRESSION (δ = 1, i.e. orthogonal regression) of daily
    * purchase value on daily view value — both sides are measured
    * aggregates of the same underlying traffic, the textbook
    * errors-in-both-variables setting. Closed form from the five
    * centered moments: β = (s_yy − δ·s_xx + √((s_yy − δ·s_xx)² +
    * 4δ·s_xy²)) / (2·s_xy); reported next to the OLS slope s_xy/s_xx —
    * the gap IS the attenuation bias OLS pays when x carries noise.
    *
    * Determinism: daily cents are exact integers, the five moments
    * exact BIGINT/DECIMAL sums, both slopes one fixed double tree,
    * round 9. Scale posture: one (day) rollup of the fact table; the
    * moment rollup and the solve are constant-size. */
  def statDemingRegression(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(datediff(date_trunc("day", col("ts")).cast(DateType),
        lit("2024-01-01").cast(DateType)).cast(LongType).as("di"),
        col("event_type"))
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast(LongType).as("cents"))
    val x = daily.filter(col("event_type") === "view")
      .select(col("di"), col("cents").as("xv"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("di"), col("cents").as("yv"))
    // squares accumulate in DECIMAL(38,0), mirroring the oracle's
    // HUGEINT (r9 advice): daily cents² in BIGINT would overflow around
    // sf100 — an engine asymmetry where ANSI Spark fails while the
    // oracle stays exact; both sides now carry ~1e38 headroom
    def big(c: Column) = c.cast(DecimalType(38, 0))
    val m = x.join(y, Seq("di")).agg(
      count(lit(1)).as("n"),
      sum("xv").as("sx"), sum("yv").as("sy"),
      sum(big(col("xv")) * big(col("xv"))).as("sxx"),
      sum(big(col("yv")) * big(col("yv"))).as("syy"),
      sum(big(col("xv")) * big(col("yv"))).as("sxy"))
    def dc(c: String) = col(c).cast(DoubleType)
    val nD = dc("n")
    val cxx = dc("sxx") - dc("sx") * dc("sx") / nD
    val cyy = dc("syy") - dc("sy") * dc("sy") / nD
    val cxy = dc("sxy") - dc("sx") * dc("sy") / nD
    val deming = (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) +
      lit(4.0) * cxy * cxy)) / (lit(2.0) * cxy)
    val ols = cxy / cxx
    m.select(col("n").as("n_days"),
      round(ols, 9).as("slope_ols"),
      round(deming, 9).as("slope_deming"),
      // intercept through the centroid, in DOLLARS; at ~4e6 dollars a
      // 9-dp round exceeds double precision (the wave-23 RSS lesson,
      // re-measured here at sf1) — 3 dp keeps ≤ 13 significant digits
      round((dc("sy") / nD - deming * (dc("sx") / nD)) / 100.0, 3)
        .as("intercept_deming"))
  }

  /** HISTORICAL VaR(95%) AND CVaR (expected shortfall) of the daily
    * revenue CHANGE per event type — VaR is the nearest-rank 5th-
    * percentile daily move (an exact order statistic: rank
    * ⌈0.05·n⌉ from the worst, integer arithmetic, no interpolation),
    * CVaR the exact-decimal MEAN of the moves at or beyond it. The
    * tail mean is what makes CVaR coherent (sub-additive) where VaR is
    * not — and what no percentile query in the registry reports.
    *
    * Determinism: daily diffs are exact integer cents; the rank is
    * integer; the tail mean is an exact integer sum over a rank-
    * selected set with ONE final division; round 9. Scale posture: one
    * (type, day) rollup; the per-type rank/tail windows run over the
    * calendar-bounded day spine. */
  def windowVarCvar(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        datediff(date_trunc("day", col("ts")).cast(DateType),
          lit("2024-01-01").cast(DateType)).cast(LongType).as("di"))
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast(LongType).as("cents"))
    val wLag = Window.partitionBy("event_type").orderBy("di")
    val moves = daily
      .withColumn("chg", col("cents") - lag("cents", 1).over(wLag))
      .filter(col("chg").isNotNull)
    val wRank = Window.partitionBy("event_type")
      .orderBy(col("chg"), col("di"))
    val wN = Window.partitionBy("event_type")
    val ranked = moves
      .withColumn("rk", row_number().over(wRank).cast(LongType))
      .withColumn("n", count(lit(1)).over(wN))
      // nearest-rank 5th percentile from the WORST move:
      // k = ceil(0.05 * n) = (n + 19) DIV 20
      .withColumn("k", expr("(n + 19) DIV 20"))
    ranked
      .groupBy("event_type")
      .agg(max("n").as("n_days"), max("k").as("k"),
        max(when(col("rk") === col("k"), col("chg"))).as("var_cents"),
        sum(when(col("rk") <= col("k"), col("chg"))).as("tail_sum"))
      .select(col("event_type"), col("n_days"),
        round(col("var_cents").cast(DoubleType) / 100.0, 9).as("var_95"),
        round(col("tail_sum").cast(DoubleType) /
          col("k").cast(DoubleType) / 100.0, 9).as("cvar_95"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_deming_regression" -> statDemingRegression _,
    "window_var_cvar"        -> windowVarCvar _,
  )

  val oracle: Map[String, String] = Map(
    "stat_deming_regression" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '2024-01-01',
        |      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS di,
        |    event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1, 2),
        |x AS (SELECT di, cents AS xv FROM daily WHERE event_type = 'view'),
        |y AS (SELECT di, cents AS yv FROM daily
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(xv AS HUGEINT) * xv) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(yv AS HUGEINT) * yv) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(xv AS HUGEINT) * yv) AS HUGEINT) AS sxy
        |  FROM x JOIN y USING (di)),
        |t AS (
        |  SELECT n,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cxx,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cyy,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
        |      CAST(n AS DOUBLE) AS cxy
        |  FROM m)
        |SELECT n AS n_days,
        |  ROUND(cxy / cxx, 9) AS slope_ols,
        |  ROUND((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) +
        |    4.0 * cxy * cxy)) / (2.0 * cxy), 9) AS slope_deming,
        |  ROUND((syd / CAST(n AS DOUBLE) -
        |    ((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) +
        |      4.0 * cxy * cxy)) / (2.0 * cxy)) *
        |    (sxd / CAST(n AS DOUBLE))) / 100.0, 3) AS intercept_deming
        |FROM t""".stripMargin,
    "window_var_cvar" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01',
        |      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS di,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |mv AS (
        |  SELECT event_type, di,
        |    cents - lag(cents) OVER (PARTITION BY event_type ORDER BY di)
        |      AS chg
        |  FROM daily),
        |r AS (
        |  SELECT event_type, di, chg,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY chg, di) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM mv WHERE chg IS NOT NULL)
        |SELECT event_type, MAX(n) AS n_days,
        |  ROUND(CAST(MAX(CASE WHEN rk = (n + 19) // 20 THEN chg END)
        |    AS DOUBLE) / 100.0, 9) AS var_95,
        |  ROUND(CAST(SUM(CASE WHEN rk <= (n + 19) // 20 THEN chg END)
        |      AS DOUBLE) /
        |    CAST(MAX((n + 19) // 20) AS DOUBLE) / 100.0, 9) AS cvar_95
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
