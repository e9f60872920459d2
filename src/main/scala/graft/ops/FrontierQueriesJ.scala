package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.text.TextAnalysis.{markerCount, tokenCount}

/** Round-8 thirteenth frontier wave: the product-analytics pair every
  * growth review opens with (weekly retention cohorts and the
  * Kaplan–Meier survival curve with honest censoring), the sequential
  * drift detector behind quality-regression alarms (CUSUM peak
  * excursion, an all-integer fold), and the two paired-binary
  * experiment tests (McNemar for two raters, Cochran's Q for k — both
  * exact integer ratios). Module conventions as the earlier frontier
  * waves.
  */
object FrontierQueriesJ {

  /** Kaplan–Meier survival horizons (days). */
  private val KmHorizons = Seq(30L, 90L, 180L, 365L, 730L)

  /** A customer whose last order predates corpus end by this many days
    * is an observed churn; later last orders are right-censored. */
  private val KmCensorDays = 90

  /** Paired binary gates for McNemar / Cochran's Q — three cheap
    * quality raters that genuinely disagree on this corpus. */
  private def gateLen(c: Column): Column = c >= 300L
  private def gateTok(t: Column): Column = tokenCount(t) >= 50
  private def gateStop(t: Column): Column =
    markerCount(t, TextQueries.stopwords) >= 6

  // ------------------------------------------------------------- retention

  /** WEEKLY RETENTION COHORTS — users grouped by the week of their
    * first event; each cell counts how many were still active k weeks
    * later. THE activation/retention readout of product analytics, and
    * (read over crawl sources) the "does a source keep producing"
    * freshness matrix. The WEEK-grain sibling of
    * [[AggWindowQueries.windowRetentionCohort]]'s day matrix — the
    * grain a real growth review reads (day cells are too sparse to
    * quote), with the cohort label carried as the week-start date.
    *
    * Determinism: week buckets are date_trunc('week') on both engines
    * (ISO Monday start); the cohort assignment floor(min ts) commutes
    * with the monotone trunc; offsets are exact day differences over a
    * multiple of 7; every output is an integer count.
    *
    * Scale posture: one min-aggregate and one distinct-count, both
    * keyed on user_id (co-partitioned), then a cohort×offset rollup
    * bounded by the calendar grid. */
  def aggRetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
    val first = e.groupBy("user_id").agg(min(col("w")).as("cw"))
    e.join(first, Seq("user_id"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("w"), col("cw")) / 7).cast(LongType).as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  // -------------------------------------------------------------- survival

  /** KAPLAN–MEIER SURVIVAL — customer lifetime (first → last order)
    * with right-censoring: lifetimes still running at corpus end minus
    * 90d are censored, not churned. Survival read at 5 fixed horizons.
    * The honest-denominator retention curve (naive retention
    * undercounts because censored users never had time to churn), and
    * the same estimator prices "how long does a crawl source keep
    * yielding".
    *
    * Determinism: the product Π(1−dᵤ/nᵤ) is exp of an ascending-
    * duration fold of ln(nᵤ−dᵤ) − ln(nᵤ) — every ln argument an exact
    * integer, every term O(d/n) ≤ ln n in magnitude with NO large-count
    * multiplier (the G² lesson, [[FrontierQueriesI.textKeywordChi2]]),
    * so a 1-ulp ln disagreement stays ~10⁻¹³ below the round-9 grid;
    * the filter-transform-fold shape is stated identically in both
    * engines; an exhausted risk set (d = n) pins survival to exactly 0.
    *
    * Scale posture: one customer-keyed min/max rollup; everything
    * after lives on the ≤ day-range distinct-duration grid (one
    * bounded descending-cumulative window + 5 horizon folds). */
  def statKaplanMeier(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("dt"))
    val corpusEnd = o.agg(max(col("dt")).as("end"))
    val cust = o.groupBy("o_custkey")
      .agg(min(col("dt")).as("first"), max(col("dt")).as("last"))
      .crossJoin(broadcast(corpusEnd))
      .select(datediff(col("last"), col("first")).cast(LongType).as("dur"),
        when(col("last") < date_sub(col("end"), KmCensorDays), 1L)
          .otherwise(0L).as("ev"))
    val byDur = cust.groupBy("dur")
      .agg(count(lit(1)).as("cnt"), sum(col("ev")).as("d"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byDur.select(col("dur"), col("cnt"), col("d"),
      sum(col("cnt")).over(wDesc).as("n"))
    val arrs = risk.agg(
      sort_array(collect_list(struct(col("dur"), col("n"), col("d"))))
        .as("ev_arr"),
      sort_array(collect_list(struct(col("dur"), col("cnt")))).as("all_arr"))
    import s.implicits._
    val horizons = broadcast(KmHorizons.toDF("horizon"))
    horizons.crossJoin(broadcast(arrs)).select(
      col("horizon"),
      aggregate(filter(col("all_arr"), x => x("dur") >= col("horizon")),
        lit(0L), (a, x) => a + x("cnt")).as("n_risk"),
      aggregate(filter(col("ev_arr"),
        x => x("d") > 0L && x("dur") <= col("horizon")),
        lit(0L), (a, x) => a + x("d")).as("n_events"), {
        val zeroHit = size(filter(col("ev_arr"),
          x => x("dur") <= col("horizon") && x("d") === x("n"))) > 0
        val logsum = aggregate(
          transform(filter(col("ev_arr"),
            x => x("d") > 0L && x("d") < x("n") &&
              x("dur") <= col("horizon")),
            x => log((x("n") - x("d")).cast(DoubleType)) -
              log(x("n").cast(DoubleType))),
          lit(0.0), (a, t) => a + t)
        when(zeroHit, lit(0.0)).otherwise(round(exp(logsum), 9))
          .as("survival")
      })
      .orderBy("horizon")
  }

  // ----------------------------------------------------------------- drift

  /** CUSUM PEAK EXCURSION — the one-sided cumulative-sum drift
    * detector over the daily purchase-revenue series: s_t =
    * max(0, s_{t-1} + (x_t − x̄)), reporting the peak and the day it
    * first peaks. THE sequential changepoint alarm (Page 1954) a
    * pipeline-health monitor runs on ingest volume — a sustained
    * upward shift accumulates where one spike resets. The global
    * daily-series sibling of [[StatQueries.windowCusumDrift]]'s
    * per-user stream form (that one parallelizes across users via the
    * prefix-min window identity; this one names WHICH DAY the corpus
    * itself drifted, with an all-integer mean-centered fold).
    *
    * Determinism: deviations are the n-scaled exact integers of
    * [[FrontierQueriesI.timeAcf]] (n·x_t − S, BIGINT; cumulative state
    * ≤ n²·max|x| ≈ 10¹⁷ at sf1 — audited), the fold state [s, smax,
    * arg_rn] is all-BIGINT with a strict-> first-peak rule, and only
    * the final excess-per-day readout divides (one fixed tree).
    *
    * Scale posture: one keyed rollup to daily cents; the fold runs
    * over the day-granular array. */
  def statCusumPeak(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .groupBy("day").agg(sum(col("c")).as("x"))
    val g = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val idx = daily.crossJoin(broadcast(g))
      .select(col("day"), col("n"),
        row_number().over(Window.orderBy("day")).cast(LongType).as("rn"),
        (col("x") * col("n") - col("s")).as("dev"))
    val folded = idx
      .agg(max(col("n")).as("n_days"),
        aggregate(
          transform(sort_array(collect_list(struct(col("rn"), col("dev")))),
            x => array(x("rn"), x("dev"))),
          array(lit(0L), lit(0L), lit(0L)),
          (acc, x) => {
            val sNew = greatest(lit(0L),
              element_at(acc, 1) + element_at(x, 2))
            array(sNew,
              greatest(sNew, element_at(acc, 2)),
              when(sNew > element_at(acc, 2), element_at(x, 1))
                .otherwise(element_at(acc, 3)))
          }).as("st"))
      .select(col("n_days"), element_at(col("st"), 2).as("peak"),
        element_at(col("st"), 3).as("peak_rn"))
    folded.join(idx.select(col("rn"), col("day")),
        folded("peak_rn") === col("rn"))
      .select(col("n_days"), col("day").as("peak_day"),
        round(col("peak").cast(DoubleType) /
          col("n_days").cast(DoubleType) / lit(100.0), 9)
          .as("peak_excess_dollars"))
  }

  // ------------------------------------------------------- paired binaries

  /** McNEMAR'S TEST — do two binary raters (length gate vs token-count
    * gate) disagree SYSTEMATICALLY on the same documents? Only the
    * discordant cells carry signal: χ² = (b−c)²/(b+c). The correct
    * test for "is classifier B better than A on the same eval set" —
    * accuracy deltas without the pairing are noise.
    *
    * Determinism: four integer cells from one rollup; the statistic is
    * one integer-ratio division (nullif guard on b+c = 0); round 9.
    *
    * Scale posture: a single constant-width conditional rollup. */
  def statMcnemar(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d).select(
      gateLen(col("n_chars")).as("ga"), gateTok(col("text")).as("gb"))
    g.agg(
      sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("both_pass"),
      sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("both_fail"))
      .select(col("both_pass"), col("b"), col("c"), col("both_fail"),
        round(((col("b") - col("c")) * (col("b") - col("c")))
          .cast(DoubleType) /
          nullif((col("b") + col("c")).cast(DoubleType), lit(0.0)), 9)
          .as("chi2"))
  }

  /** COCHRAN'S Q — the k-rater generalization of [[statMcnemar]]:
    * do THREE binary quality gates (length, token count, stopword
    * mass) pass documents at the same rate? The pre-test before
    * trusting any one gate as "the" quality filter; rejects → the
    * gates measure different things and a curation funnel should
    * compose them, not pick one.
    *
    * Determinism: Q = (k−1)·[k·ΣCⱼ² − (ΣCⱼ)²] / [k·ΣRᵢ − ΣRᵢ²] with
    * column totals Cⱼ and per-document row sums Rᵢ ∈ {0..3} — every
    * term BIGINT (ΣCⱼ² ≤ 3·N² — DECIMAL at 100 TB), ONE division.
    *
    * Scale posture: one constant-width rollup (row sums fold inside
    * the same pass — no per-document state leaves the aggregate). */
  def statCochranQ(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d).select(
      when(gateLen(col("n_chars")), 1L).otherwise(0L).as("x1"),
      when(gateTok(col("text")), 1L).otherwise(0L).as("x2"),
      when(gateStop(col("text")), 1L).otherwise(0L).as("x3"))
    val r = col("x1") + col("x2") + col("x3")
    g.agg(count(lit(1)).as("n_docs"),
      sum(col("x1")).as("c1"), sum(col("x2")).as("c2"),
      sum(col("x3")).as("c3"),
      sum(r).as("sr"), sum(r * r).as("sr2"))
      .select(col("n_docs"), col("c1"), col("c2"), col("c3"),
        lit(2L).as("dof"),
        round((lit(2.0) * (lit(3L) * (col("c1") * col("c1") +
          col("c2") * col("c2") + col("c3") * col("c3")) -
          col("sr") * col("sr")).cast(DoubleType)) /
          nullif((lit(3L) * col("sr") - col("sr2")).cast(DoubleType),
            lit(0.0)), 9).as("q_stat"))
  }

  // A market-basket lift ranker was built here and REMOVED the same
  // round: the registry already ships the identical statistic as
  // dsq_basket_lift (DecisionQueriesB — same support/confidence/lift
  // over part pairs, with the better basket-local i<j pair expansion).
  // Same lesson as FrontierQueriesI's removed PMI ranker.

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_retention_cohorts" -> aggRetentionCohorts _,
    "stat_kaplan_meier"     -> statKaplanMeier _,
    "stat_cusum_peak"       -> statCusumPeak _,
    "stat_mcnemar"          -> statMcnemar _,
    "stat_cochran_q"        -> statCochranQ _,
  )

  private val toks = TextQueries.tokensSql

  /** Oracle fragments for the three binary gates. */
  private val gaSql = "n_chars >= 300"
  private val gbSql = s"len($toks) >= 50"
  private val gcSql =
    s"len(list_filter($toks, t -> t IN ('the','a'))) >= 6"

  val oracle: Map[String, String] = Map(
    "agg_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        |  FROM events),
        |f AS (SELECT user_id, MIN(w) AS cw FROM e GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cw, w) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stat_kaplan_meier" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt FROM orders),
        |ce AS (SELECT MAX(dt) AS corpus_end FROM o),
        |cust AS (
        |  SELECT CAST(date_diff('day', MIN(dt), MAX(dt)) AS BIGINT) AS dur,
        |    CASE WHEN MAX(dt) < (SELECT corpus_end FROM ce)
        |      - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev
        |  FROM o GROUP BY o_custkey),
        |bydur AS (
        |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(ev) AS BIGINT) AS d
        |  FROM cust GROUP BY dur),
        |risk AS (
        |  SELECT dur, cnt, d,
        |    CAST(SUM(cnt) OVER (ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n
        |  FROM bydur),
        |arrs AS (
        |  SELECT list(struct_pack(dur := dur, n := n, d := d)
        |      ORDER BY dur) AS ev_arr,
        |    list(struct_pack(dur := dur, cnt := cnt) ORDER BY dur)
        |      AS all_arr
        |  FROM risk),
        |h AS (SELECT CAST(unnest([30, 90, 180, 365, 730]) AS BIGINT)
        |  AS horizon)
        |SELECT horizon,
        |  CAST(coalesce(list_sum(list_transform(list_filter(all_arr,
        |    x -> x.dur >= horizon), x -> x.cnt)), 0) AS BIGINT) AS n_risk,
        |  CAST(coalesce(list_sum(list_transform(list_filter(ev_arr,
        |    x -> x.d > 0 AND x.dur <= horizon), x -> x.d)), 0)
        |    AS BIGINT) AS n_events,
        |  CASE WHEN len(list_filter(ev_arr,
        |      x -> x.dur <= horizon AND x.d = x.n)) > 0 THEN 0.0
        |    ELSE ROUND(EXP(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_filter(ev_arr,
        |        x -> x.d > 0 AND x.d < x.n AND x.dur <= horizon),
        |        x -> LN(CAST(x.n - x.d AS DOUBLE)) -
        |          LN(CAST(x.n AS DOUBLE)))),
        |      (s, t) -> s + t)), 9) END AS survival
        |FROM h CROSS JOIN arrs ORDER BY horizon""".stripMargin,
    "stat_cusum_peak" ->
      """WITH daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS s FROM daily),
        |idx AS (
        |  SELECT day, g.n,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
        |    x * g.n - g.s AS dev
        |  FROM daily CROSS JOIN g),
        |folded AS (
        |  SELECT MAX(n) AS n_days,
        |    list_reduce(list_prepend([CAST(0 AS BIGINT), 0, 0],
        |      list([rn, dev] ORDER BY rn)),
        |      (acc, x) -> [
        |        GREATEST(0, acc[1] + x[2]),
        |        GREATEST(GREATEST(0, acc[1] + x[2]), acc[2]),
        |        CASE WHEN GREATEST(0, acc[1] + x[2]) > acc[2]
        |          THEN x[1] ELSE acc[3] END]) AS st
        |  FROM idx)
        |SELECT f.n_days, i.day AS peak_day,
        |  ROUND(CAST(f.st[2] AS DOUBLE) / CAST(f.n_days AS DOUBLE)
        |    / 100.0, 9) AS peak_excess_dollars
        |FROM folded f JOIN idx i ON i.rn = f.st[3]""".stripMargin,
    "stat_mcnemar" ->
      s"""WITH g AS (
         |  SELECT ($gaSql) AS ga, ($gbSql) AS gb FROM documents)
         |SELECT
         |  CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
         |    AS both_pass,
         |  CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT)
         |    AS b,
         |  CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
         |    AS c,
         |  CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
         |    AS BIGINT) AS both_fail,
         |  ROUND(CAST((SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) -
         |      SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)) *
         |      (SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) -
         |      SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)) AS DOUBLE) /
         |    NULLIF(CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) +
         |      SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS DOUBLE),
         |      0.0), 9) AS chi2
         |FROM g""".stripMargin,
    "stat_cochran_q" ->
      s"""WITH g AS (
         |  SELECT CASE WHEN $gaSql THEN 1 ELSE 0 END AS x1,
         |    CASE WHEN $gbSql THEN 1 ELSE 0 END AS x2,
         |    CASE WHEN $gcSql THEN 1 ELSE 0 END AS x3
         |  FROM documents),
         |a AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(x1) AS BIGINT) AS c1, CAST(SUM(x2) AS BIGINT) AS c2,
         |    CAST(SUM(x3) AS BIGINT) AS c3,
         |    CAST(SUM(x1 + x2 + x3) AS BIGINT) AS sr,
         |    CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
         |  FROM g)
         |SELECT n_docs, c1, c2, c3, CAST(2 AS BIGINT) AS dof,
         |  ROUND((2.0 * CAST(3 * (c1 * c1 + c2 * c2 + c3 * c3) -
         |    sr * sr AS DOUBLE)) /
         |    NULLIF(CAST(3 * sr - sr2 AS DOUBLE), 0.0), 9) AS q_stat
         |FROM a""".stripMargin,
  )
}
