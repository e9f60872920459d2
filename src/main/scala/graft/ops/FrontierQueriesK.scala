package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Round-8 fourteenth frontier wave: the two time-series TESTS that sit
  * on the ACF/daily-bar machinery (Ljung–Box portmanteau whiteness,
  * Dickey–Fuller unit root), the seasonal completion of the
  * exponential-smoothing family (additive Holt–Winters with a weekly
  * cycle), the parametric outlier test (Grubbs), the normality screen
  * from exact third/fourth moments (Jarque–Bera), and RFM customer
  * segmentation (the warehouse-analytics staple). Registry novelty was
  * grep-checked first (ROUND_NOTES item 23). Module conventions as the
  * earlier frontier waves.
  */
object FrontierQueriesK {

  /** Ljung–Box lag depth. */
  private val LbLags = 10

  /** Holt–Winters smoothing constants (stated as plain literals so both
    * engines carry bit-identical α/β/γ). */
  private val HwAlpha = 0.3
  private val HwBeta = 0.1
  private val HwGamma = 0.2

  /** Weekly season length for Holt–Winters. */
  private val HwPeriod = 7

  // ------------------------------------------------------------ whiteness

  /** LJUNG–BOX PORTMANTEAU TEST — is the daily purchase-revenue series
    * white noise? Q = m(m+2)·Σ_{k≤10} ρ_k²/(m−k) against χ²(10). The
    * gate a forecasting pipeline runs on model RESIDUALS — and, run on
    * the raw series, the "is there anything here to model" screen that
    * decides whether [[timeHoltWintersWeekly]]-class machinery is
    * worth fitting. Consumes [[FrontierQueriesI.acfMoments]] — the
    * exact n²-scaled autocovariance sums shared with `time_acf`.
    *
    * Determinism: each ρ_k is one division of two VARCHAR-hopped exact
    * decimals (bit-identical), the 10 weighted terms fold in lag order,
    * and m(m+2) scales once at the end; round 9.
    *
    * Scale posture: identical to `time_acf` — one keyed rollup to
    * daily cents, then day-granular lag joins through a broadcast. */
  def statLjungBox(s: SparkSession, d: String): DataFrame = {
    val rho = FrontierQueriesI.acfMoments(s, d, (1L to LbLags).toSeq)
      .select(col("lag"), col("n"),
        (col("num").cast("string").cast(DoubleType) /
          col("den").cast("string").cast(DoubleType)).as("rho"))
    rho.agg(max(col("n")).as("m"), count(lit(1)).as("n_lags"),
      aggregate(
        transform(sort_array(collect_list(struct(col("lag"),
          (col("rho") * col("rho") /
            (col("n") - col("lag")).cast(DoubleType)).as("term")))),
          p => p("term")),
        lit(0.0), (a, x) => a + x).as("tsum"))
      .select(col("m"), col("n_lags"), lit(LbLags.toLong).as("dof"),
        round(col("m").cast(DoubleType) * (col("m") + 2L).cast(DoubleType) *
          col("tsum"), 9).as("q_stat"))
  }

  // ------------------------------------------------------------- unit root

  /** DICKEY–FULLER UNIT-ROOT TEST (constant, no trend) — regress
    * Δx_t on x_{t−1} over the daily purchase-revenue series and report
    * β̂ and the DF t-statistic β̂/se(β̂). THE stationarity gate: a
    * series with a unit root (DF ≈ 0) must be differenced before any
    * ACF/ARIMA reasoning ([[statLjungBox]]'s upstream assumption);
    * deeply negative DF means shocks decay and levels are modelable.
    *
    * Determinism: with daily cents x (BIGINT), the OLS normal-equation
    * numerators m·Σzy − Σz·Σy, m·Σz² − (Σz)², m·Σy² − (Σy)² are
    * composed in DECIMAL(38,0) from BIGINT sums (Spark) / HUGEINT
    * (DuckDB) — both exact, both VARCHAR-hopped to correctly-rounded
    * doubles — then β̂, SSE and the t-statistic are one fixed tree.
    *
    * Scale posture: one keyed rollup to daily cents; one bounded lag
    * window; one constant-width moment rollup. */
  def statDickeyFuller(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .groupBy("day").agg(sum(col("c")).as("x"))
    val w = Window.orderBy("day")
    val zy = daily
      .select(col("x"), lag(col("x"), 1).over(w).as("z"))
      .filter(col("z").isNotNull)
      .select((col("x") - col("z")).as("y"), col("z"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val m = zy.agg(count(lit(1)).as("m"),
      sum(col("z")).as("sz"), sum(col("y")).as("sy"),
      sum(col("z") * col("z")).as("szz"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("y")).as("szy"))
    val a = dec(col("m")) * dec(col("szz")) - dec(col("sz")) * dec(col("sz"))
    val b = dec(col("m")) * dec(col("szy")) - dec(col("sz")) * dec(col("sy"))
    val cq = dec(col("m")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
    def hop(x: Column): Column = x.cast(StringType).cast(DoubleType)
    m.select(col("m"), {
        val (ad, bd, cd) = (hop(a), hop(b), hop(cq))
        val beta = bd / ad
        val se2 = (cd - bd * bd / ad) /
          ((col("m") - 2L).cast(DoubleType) * ad)
        struct(round(beta, 9).as("beta_hat"),
          round(beta / sqrt(se2), 9).as("df_stat")).as("r")
      })
      .select(col("m"), col("r.beta_hat").as("beta_hat"),
        col("r.df_stat").as("df_stat"))
  }

  // ------------------------------------------------------------- smoothing

  /** ADDITIVE HOLT–WINTERS (weekly season, α=.3 β=.1 γ=.2) — level +
    * trend + 7 seasonal states per event type, the seasonal completion
    * of [[FrontierQueriesB.timeHoltLinear]] (level+trend only): the
    * forecasting workhorse for any daily operational series with a
    * weekly rhythm. Reports the final state and the one-step-ahead
    * forecast a monitor would alarm against.
    *
    * Determinism — the vector-state fold recipe with a ROTATING
    * 9-double state [ℓ, b, s₊₁..s₊₇] (s₊₁ = the factor the NEXT bar
    * consumes): ℓ's update expression is restated inline in the b and
    * s slots (the Holt/MACD discipline — no cross-engine CSE
    * assumption); seeds are ℓ₀ = (Σ first-week closes)/7, b₀ = 0,
    * sᵢ = yᵢ − ℓ₀; closes VARCHAR-hop from exact DECIMAL; round 9.
    *
    * Scale posture: one keyed rollup to daily bars + one bounded
    * per-type collect (the day-granular series), 5 independent folds. */
  def timeHoltWintersWeekly(s: SparkSession, d: String): DataFrame = {
    val ys = transform(
      sort_array(collect_list(struct(col("day"), col("close")))),
      p => p("close").cast(StringType).cast(DoubleType))
    // seed: level = mean of week 1, seasonals = week-1 deviations
    val l0 = aggregate(slice(col("ys"), 1, HwPeriod), lit(0.0),
      (a, y) => a + y) / lit(HwPeriod.toDouble)
    val seed = concat(
      array(col("l0"), lit(0.0)),
      transform(slice(col("ys"), 1, HwPeriod), y => y - col("l0")))
    def lNew(acc: Column, y: Column): Column =
      lit(HwAlpha) * (y - element_at(acc, 3)) +
        lit(1.0 - HwAlpha) * (element_at(acc, 1) + element_at(acc, 2))
    val folded = FrontierQueriesD.dailyClose(s, d)
      .groupBy("event_type").agg(ys.as("ys"))
      .filter(size(col("ys")) >= HwPeriod + 1)
      .withColumn("l0", l0)
      .select(col("event_type"), size(col("ys")).cast(LongType).as("n_days"),
        aggregate(expr(s"slice(ys, ${HwPeriod + 1}, size(ys) - $HwPeriod)"),
          seed,
          (acc, y) => concat(
            array(
              lNew(acc, y),
              lit(HwBeta) * (lNew(acc, y) - element_at(acc, 1)) +
                lit(1.0 - HwBeta) * element_at(acc, 2)),
            slice(acc, 4, HwPeriod - 1),
            array(lit(HwGamma) * (y - lNew(acc, y)) +
              lit(1.0 - HwGamma) * element_at(acc, 3)))).as("st"))
    folded.select(col("event_type"), col("n_days"),
      round(element_at(col("st"), 1), 9).as("level"),
      round(element_at(col("st"), 2), 9).as("trend"),
      round(element_at(col("st"), 1) + element_at(col("st"), 2) +
        element_at(col("st"), 3), 9).as("forecast_1"))
      .orderBy("event_type")
  }

  // --------------------------------------------------------------- outliers

  /** GRUBBS' TEST per event type — the parametric max-studentized
    * outlier statistic G = max|x − x̄|/s, with the suspect value named.
    * The formal single-outlier test next to
    * [[AggWindowQueries.aggMadOutliers]]'s robust MAD fence (MAD flags
    * a set; Grubbs TESTS the most extreme point against a normality
    * null).
    *
    * Determinism: max|x − x̄| = max over values of |n·c − S| — an
    * integer max (n·c ≤ 10¹¹ at sf1 — audited); the suspect rides the
    * SAME max by encoding (deviation, cents) as the single BIGINT
    * dev·2²⁰ + c (cents < 2²⁰ — audited; the lexicographic order is
    * preserved, symmetric ties break on the larger value, and plain
    * MAX needs no engine-specific struct ordering); n·Σc² − S²
    * composes in DECIMAL(38,0)/HUGEINT and hops; G is one fixed tree;
    * round 9.
    *
    * Scale posture: two constant-width rollups per type (moments, then
    * the deviation max against the broadcast moment row). */
  def statGrubbs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d).select(col("event_type"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
    val mom = base.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("c")).as("sc"), sum(col("c") * col("c")).as("scc"))
    val dev = base.join(broadcast(mom), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(abs(col("n") * col("c") - col("sc")) * lit(1048576L) +
        col("c")).as("mx"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    def hop(x: Column): Column = x.cast(StringType).cast(DoubleType)
    mom.join(dev, Seq("event_type"))
      .select(col("event_type"), col("n"),
        round((col("mx") % 1048576L).cast(DoubleType) / lit(100.0), 9)
          .as("suspect_value"), {
          val varN = hop(dec(col("n")) * dec(col("scc")) -
            dec(col("sc")) * dec(col("sc")))
          val maxdev = expr("mx DIV 1048576")
          // G = (maxdev/n) / s with s² = varN/(n(n−1)) — the spec pins
          // G ≤ (n−1)/√n, which caught an extra n in this denominator
          round((maxdev.cast(DoubleType) / col("n").cast(DoubleType)) /
            sqrt(varN / (col("n").cast(DoubleType) *
              (col("n") - 1L).cast(DoubleType))), 9).as("g_stat")
        })
      .orderBy("event_type")
  }

  // -------------------------------------------------------------- normality

  /** JARQUE–BERA NORMALITY TEST per event type — skewness, excess
    * kurtosis, and JB = n/6·(S² + K²/4) from exact raw moments. The
    * cheap screen before any normality-assuming machinery
    * ([[statGrubbs]], control charts, z-intervals) is trusted.
    *
    * Determinism: Σc, Σc², Σc³, Σc⁴ are exact (cents ≤ 49,002 so c⁴
    * ≤ 5.8×10¹⁸; sums in DECIMAL(38,0) on Spark, HUGEINT on DuckDB),
    * each VARCHAR-hops to its correctly-rounded double, and skew/kurt/
    * JB are ONE fixed tree of those doubles — cancellation costs
    * accuracy digits, never cross-engine agreement, because both
    * engines start from bit-identical operands. Round 9.
    *
    * Scale posture: one constant-width moment rollup per type. */
  def statJarqueBera(s: SparkSession, d: String): DataFrame = {
    val c = (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
    val cd = c.cast(DecimalType(38, 0))
    val mom = Tables.events(s, d).select(col("event_type"), cd.as("c"))
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
        sum(col("c") * col("c") * col("c")).as("s3"),
        sum(col("c") * col("c") * col("c") * col("c")).as("s4"))
    def hop(x: Column): Column = x.cast(StringType).cast(DoubleType)
    mom.select(col("event_type"), col("n"), {
        val nd = col("n").cast(DoubleType)
        val (m1, r2, r3, r4) =
          (hop(col("s1")) / nd, hop(col("s2")) / nd,
            hop(col("s3")) / nd, hop(col("s4")) / nd)
        val m2 = r2 - m1 * m1
        val m3 = r3 - lit(3.0) * m1 * r2 + lit(2.0) * m1 * m1 * m1
        val m4 = r4 - lit(4.0) * m1 * r3 + lit(6.0) * m1 * m1 * r2 -
          lit(3.0) * m1 * m1 * m1 * m1
        val skew = m3 / sqrt(m2 * m2 * m2)
        val exKurt = m4 / (m2 * m2) - lit(3.0)
        struct(round(skew, 9).as("skewness"),
          round(exKurt, 9).as("ex_kurtosis"),
          round(nd / lit(6.0) *
            (skew * skew + exKurt * exKurt / lit(4.0)), 9).as("jb_stat"))
          .as("r")
      })
      .select(col("event_type"), col("n"), col("r.skewness").as("skewness"),
        col("r.ex_kurtosis").as("ex_kurtosis"), col("r.jb_stat").as("jb_stat"))
      .orderBy("event_type")
  }

  // ----------------------------------------------------------- segmentation

  /** RFM SEGMENTATION — each customer scored 1–5 on Recency (days from
    * last order to corpus end), Frequency (order count), and Monetary
    * (lifetime cents) via quintiles, 5 = best; segments reported with
    * size and average spend. The warehouse staple for "who do we mail"
    * — and the same quantile-composite pattern scores document sources
    * by freshness/volume/quality in a curation review.
    *
    * Determinism: all three metrics are exact integers; NTILE(5) over
    * the (metric, custkey) TOTAL order is engine-identical (both
    * implement SQL ntile's floor-based bucket sizing — [[DistRank.ntile]]
    * reproduces it arithmetically from the two-phase row number);
    * segment labels are integers; avg spend is one division of exact
    * sums.
    *
    * Scale posture (r9 verdict #1, branch layout r10 verdict #5): one
    * customer-keyed rollup PINNED once, then three DISTRIBUTED quintile
    * rankings via [[DistRank]] as PARALLEL slim branches — each ranks
    * only (o_custkey, metric) and is joined back on o_custkey, so the
    * plan is 1 pinned scan + 3 narrow range shuffles instead of the
    * r10 chain's 3 serial widening ones (each chained call re-shuffled
    * the full row with the prior rank columns riding along, and the
    * three sample+shuffle rounds serialized; these branches are
    * independent stages the DAG scheduler overlaps). No
    * single-partition sort anywhere over the customer dimension; the
    * only unpartitioned windows left run over the ≤numPartitions
    * per-range-partition count rollups. Final segment rollup ≤125 rows.
    * Accepted small-scale cost (r10 verdict #5 disposition): ~1.4 s
    * noise-normalized at sf0.1 vs the 0.4 s single-window r9 form —
    * three RangePartitioner sample rounds + the rank joins are the
    * price of zero single-partition sorts over the customer dimension,
    * which at 100 TB is the difference between a plan and an OOM. */
  def aggRfmSegments(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("dt"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("cents"))
    val endD = o.agg(max(col("dt")).as("end"))
    // lazy pin: the rollup is small and deterministic; an eager count
    // here would serialize a job ahead of the three rank branches
    val cust = PipelineCache.getOrPersistLazy(s"rfm:cust:$d")(
      o.groupBy("o_custkey").agg(max(col("dt")).as("last"),
        count(lit(1)).as("freq"), sum(col("cents")).as("monetary"))
        .crossJoin(broadcast(endD))
        .select(col("o_custkey"),
          datediff(col("end"), col("last")).cast(LongType).as("recency"),
          col("freq"), col("monetary")))
    def quint(metric: String, out: String, ord: Column): DataFrame =
      DistRank.ntile(cust.select(col("o_custkey"), col(metric)), 5,
        s"rfm:$out:$d", out, ord, col("o_custkey"))
        .select(col("o_custkey"), col(out))
    val scored = cust.select(col("o_custkey"), col("monetary"))
      .join(quint("recency", "r", col("recency").desc), "o_custkey")
      .join(quint("freq", "f", col("freq")), "o_custkey")
      .join(quint("monetary", "m", col("monetary")), "o_custkey")
    scored.groupBy((col("r") * 100L + col("f") * 10L + col("m"))
        .as("segment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("monetary")).as("tot"))
      // exact integer cents via DIV — round(·,9) on a ~1e6-dollar
      // magnitude needs 16 significant digits, past double precision
      // (the time_seasonal_index lesson)
      .select(col("segment"), col("n_customers"),
        expr("tot DIV n_customers").as("avg_spend_cents"))
      .orderBy("segment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ljung_box"       -> statLjungBox _,
    "stat_dickey_fuller"   -> statDickeyFuller _,
    "time_holt_winters"    -> timeHoltWintersWeekly _,
    "stat_grubbs_outlier"  -> statGrubbs _,
    "stat_jarque_bera"     -> statJarqueBera _,
    "agg_rfm_segments"     -> aggRfmSegments _,
  )

  /** Daily purchase-revenue cents — the shared oracle CTE. */
  private val dailySql =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "stat_ljung_box" ->
      s"""WITH daily AS ($dailySql),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(x) AS BIGINT) AS s FROM daily),
         |idx AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
         |    g.n, CAST(x AS DECIMAL(18,0)) * g.n - CAST(s AS DECIMAL(18,0))
         |      AS dx
         |  FROM daily CROSS JOIN g),
         |den AS (SELECT SUM(dx * dx) AS den FROM idx),
         |lags AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS lag),
         |rho AS (
         |  SELECT lag, MAX(a.n) AS n,
         |    CAST(CAST(SUM(a.dx * b.dx) AS VARCHAR) AS DOUBLE) /
         |    CAST(CAST((SELECT den FROM den) AS VARCHAR) AS DOUBLE) AS rho
         |  FROM idx a CROSS JOIN lags JOIN idx b ON b.rn = a.rn + lags.lag
         |  GROUP BY lag)
         |SELECT MAX(n) AS m, CAST(COUNT(*) AS BIGINT) AS n_lags,
         |  CAST(10 AS BIGINT) AS dof,
         |  ROUND(CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) + 2 AS DOUBLE) *
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(rho * rho / CAST(n - lag AS DOUBLE) ORDER BY lag)),
         |      (s, t) -> s + t), 9) AS q_stat
         |FROM rho""".stripMargin,
    "stat_dickey_fuller" ->
      s"""WITH daily AS ($dailySql),
         |zy AS (
         |  SELECT x - z AS y, z FROM (
         |    SELECT x, LAG(x) OVER (ORDER BY day) AS z FROM daily)
         |  WHERE z IS NOT NULL),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(z) AS HUGEINT) AS sz, CAST(SUM(y) AS HUGEINT) AS sy,
         |    CAST(SUM(z * z) AS HUGEINT) AS szz,
         |    CAST(SUM(y * y) AS HUGEINT) AS syy,
         |    CAST(SUM(z * y) AS HUGEINT) AS szy
         |  FROM zy),
         |h AS (
         |  SELECT m,
         |    CAST(CAST(m * szz - sz * sz AS VARCHAR) AS DOUBLE) AS a,
         |    CAST(CAST(m * szy - sz * sy AS VARCHAR) AS DOUBLE) AS b,
         |    CAST(CAST(m * syy - sy * sy AS VARCHAR) AS DOUBLE) AS c
         |  FROM m)
         |SELECT m, ROUND(b / a, 9) AS beta_hat,
         |  ROUND((b / a) / SQRT((c - b * b / a) /
         |    (CAST(m - 2 AS DOUBLE) * a)), 9) AS df_stat
         |FROM h""".stripMargin,
    "time_holt_winters" ->
      """WITH bars AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        |      AS day,
        |    max_by(CAST(value AS DECIMAL(18,2)), event_id) AS close
        |  FROM events GROUP BY 1, 2),
        |arr AS (
        |  SELECT event_type,
        |    list_transform(list(close ORDER BY day),
        |      v -> CAST(CAST(v AS VARCHAR) AS DOUBLE)) AS ys
        |  FROM bars GROUP BY 1),
        |seeded AS (
        |  SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days, ys,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:7]),
        |      (a, y) -> a + y) / 7.0 AS l0
        |  FROM arr WHERE len(ys) >= 8),
        |folded AS (
        |  SELECT event_type, n_days,
        |    list_reduce(list_prepend(
        |      list_concat([l0, CAST(0.0 AS DOUBLE)],
        |        list_transform(ys[1:7], y -> y - l0)),
        |      list_transform(ys[8:], y -> [y])),
        |      (acc, o) -> list_concat(list_concat(
        |        [0.3 * (o[1] - acc[3]) + 0.7 * (acc[1] + acc[2]),
        |         0.1 * ((0.3 * (o[1] - acc[3]) + 0.7 * (acc[1] + acc[2]))
        |           - acc[1]) + 0.9 * acc[2]],
        |        acc[4:9]),
        |        [0.2 * (o[1] - (0.3 * (o[1] - acc[3]) +
        |           0.7 * (acc[1] + acc[2]))) + 0.8 * acc[3]])) AS st
        |  FROM seeded)
        |SELECT event_type, n_days,
        |  ROUND(st[1], 9) AS level, ROUND(st[2], 9) AS trend,
        |  ROUND(st[1] + st[2] + st[3], 9) AS forecast_1
        |FROM folded ORDER BY event_type""".stripMargin,
    "stat_grubbs_outlier" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |mom AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) AS HUGEINT) AS scc
        |  FROM base GROUP BY 1),
        |dev AS (
        |  SELECT base.event_type,
        |    CAST(MAX(ABS(n * c - sc) * 1048576 + c) AS BIGINT) AS mx
        |  FROM base JOIN mom ON base.event_type = mom.event_type
        |  GROUP BY 1)
        |SELECT mom.event_type AS event_type, n,
        |  ROUND(CAST(mx % 1048576 AS DOUBLE) / 100.0, 9) AS suspect_value,
        |  ROUND((CAST(mx // 1048576 AS DOUBLE) / CAST(n AS DOUBLE)) /
        |    SQRT(CAST(CAST(CAST(n AS HUGEINT) * scc -
        |        CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS VARCHAR)
        |      AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 9) AS g_stat
        |FROM mom JOIN dev ON mom.event_type = dev.event_type
        |ORDER BY event_type""".stripMargin,
    "stat_jarque_bera" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS HUGEINT) AS c
        |  FROM events),
        |mom AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(c) AS s1, SUM(c * c) AS s2, SUM(c * c * c) AS s3,
        |    SUM(c * c * c * c) AS s4
        |  FROM base GROUP BY 1),
        |h AS (
        |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM mom),
        |cm AS (
        |  SELECT event_type, n, nd,
        |    r2 - m1 * m1 AS m2,
        |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
        |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
        |      - 3.0 * m1 * m1 * m1 * m1 AS m4
        |  FROM h)
        |SELECT event_type, n,
        |  ROUND(m3 / SQRT(m2 * m2 * m2), 9) AS skewness,
        |  ROUND(m4 / (m2 * m2) - 3.0, 9) AS ex_kurtosis,
        |  ROUND(nd / 6.0 * ((m3 / SQRT(m2 * m2 * m2)) *
        |    (m3 / SQRT(m2 * m2 * m2)) +
        |    (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 9)
        |    AS jb_stat
        |FROM cm ORDER BY event_type""".stripMargin,
    "agg_rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |e AS (SELECT MAX(dt) AS endd FROM o),
        |cust AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', MAX(dt), (SELECT endd FROM e))
        |      AS BIGINT) AS recency,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(cents) AS BIGINT) AS monetary
        |  FROM o GROUP BY 1),
        |scored AS (
        |  SELECT CAST(NTILE(5) OVER (ORDER BY recency DESC, o_custkey)
        |      AS BIGINT) AS r,
        |    CAST(NTILE(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f,
        |    CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT)
        |      AS m,
        |    monetary
        |  FROM cust)
        |SELECT r * 100 + f * 10 + m AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(SUM(monetary) AS BIGINT) // COUNT(*) AS BIGINT)
        |    AS avg_spend_cents
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
