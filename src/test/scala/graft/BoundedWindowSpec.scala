package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.functions._

/** Every unpartitioned window in the registry, ENUMERATED and BOUNDED
  * (r9 verdict #2).
  *
  * An unpartitioned `Window.orderBy` plans as a single-task sort — fatal
  * over anything that grows with the corpus, fine over a rollup whose
  * cardinality a fixed DOMAIN bounds (calendar days, value-grid cells,
  * config constants). The builder's policy lives as prose in
  * [[graft.ops.AggWindowQueries]]; this suite turns it into enforcement:
  *
  *  1. THE NET: walk the physical plan of every registry query and
  *     collect those containing an unpartitioned WindowExec /
  *     WindowGroupLimitExec (descending through AQE wrappers, finalized
  *     query stages, and cached subplans, so the pinned DistRank frames
  *     are inside the net too). The hit set must equal the allow-list
  *     below EXACTLY — a new query that sneaks in a global window fails
  *     this test and has to either repartition, go two-phase
  *     ([[graft.ops.DistRank]]), or document its bound here.
  *
  *  2. THE BOUNDS: for each allow-listed family, execute the query and
  *     COUNT THE ROWS ENTERING each unpartitioned window (the window
  *     child subplan re-executed after the main run — stages are
  *     materialized, so this reads shuffle/cache, not the raw scans),
  *     then assert them against an independently-computed domain bound
  *     from the corpus itself (day span, type×weekday grid, value-range
  *     cells, shuffle-partition count, …) — never against the rollup's
  *     own cardinality, which would be tautological.
  *
  * Measured shape these pins encode (WindowScan audit, r10): at
  * sf0.001 → sf0.01 (10× corpus) the day-grid/enums/pid/decile inputs
  * are CONSTANT (30 / 35 / 25 / ≤4 / 10 / 42 / 435 rows), and the three
  * value-grid families grow only toward domain saturation
  * (KS cents 405→3,305 ≤ range cells; Kruskal values 952→6,583 ≤ range
  * cells; survival durations 135→808 ≤ day span) — sub-linear
  * everywhere, saturating at a corpus-invariant ceiling.
  */
class BoundedWindowSpec extends SparkTestBase {

  /** query → documented bound of every unpartitioned window input. */
  private val allowList: Map[String, String] = Map(
    // DistRank two-phase rankings: the only unpartitioned window is the
    // per-range-partition prefix rollup — ≤ spark.sql.shuffle.partitions
    // rows, a config constant at any corpus size
    "agg_rfm_segments" -> "DistRank __pid prefix (≤ shuffle partitions)",
    "agg_abc_analysis" -> "DistRank __pid prefix (≤ shuffle partitions)",
    "agg_lorenz_points" -> "DistRank __pid prefix + constant 10-row decile table",
    "stat_conformal_interval" -> "DistRank __pid prefix (≤ shuffle partitions)",
    // calendar grids: the events corpus spans a fixed number of DAYS —
    // the time axis does not grow with corpus size (TESTDATA.md), so a
    // per-day rollup is constant-width at any scale
    "stat_cusum_peak" -> "events day grid (calendar-bounded)",
    "stat_dickey_fuller" -> "events day grid (calendar-bounded)",
    "stat_durbin_watson" -> "events day grid (calendar-bounded)",
    "stat_hurst_rs" -> "events day grid (calendar-bounded)",
    "stat_ljung_box" -> "events day grid (calendar-bounded)",
    "stat_sprt_sequential" -> "events day grid (calendar-bounded)",
    "time_acf" -> "events day grid (calendar-bounded)",
    "window_rolling_corr" -> "events day grid (calendar-bounded)",
    "window_rolling_median" -> "events day grid (calendar-bounded)",
    "trend_theilsen_daily" -> "events day-PAIR grid (≤ days²/2, calendar-bounded)",
    // small enumerations
    "stat_bh_fdr" -> "nation hypothesis family (≤ 25 rows)",
    "agg_chisq_independence" -> "event_type × iso-weekday grid (enum × 7)",
    "stat_cramers_v" -> "event_type × iso-weekday grid (enum × 7)",
    "stat_isotonic_calibration" -> "12k-wide totalprice bins (price-domain-bounded)",
    // value grids: distinct-value rollups bounded by the RANGE of the
    // value domain (integer cents / integer day durations) — saturate
    // at range cells, never scale with row count
    "stat_ks_two_sample" -> "cents value grid (≤ range cells)",
    "stat_kruskal_wallis" -> "events value grid (≤ range cells)",
    "stat_kaplan_meier" -> "duration-days grid (≤ order-date span)",
    "stat_logrank_test" -> "duration-days grid (≤ order-date span)")

  private def deepOps(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => im.children :+ im.relation.cachedPlan
      case other => other.children
    }
    p +: kids.flatMap(deepOps(_))
  }

  private def unpartWindows(p: SparkPlan): Seq[SparkPlan] =
    deepOps(p).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
    }

  test("THE NET: queries with unpartitioned windows == the documented allow-list") {
    val hits = scala.collection.mutable.SortedSet.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
      if (unpartWindows(p).nonEmpty) hits += n
      ops.PipelineCache.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    val undocumented = hits.toSet -- allowList.keySet
    val stale = allowList.keySet -- hits.toSet
    assert(undocumented.isEmpty,
      s"queries with an UNDOCUMENTED unpartitioned window (single-task " +
        s"sort at scale — repartition, use DistRank, or document the " +
        s"bound in BoundedWindowSpec): $undocumented")
    assert(stale.isEmpty,
      s"allow-list entries whose window no longer exists (delete them): $stale")
  }

  /** Rows entering each unpartitioned window of the query, measured by
    * executing the query and then counting each window child's output
    * (stages already materialized). */
  private def windowInputs(name: String): Seq[Long] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    unpartWindows(df.queryExecution.executedPlan)
      .map(_.children.head.execute().count())
  }

  private def allInputsAtMost(name: String, bound: Long): Unit = {
    val ins = windowInputs(name)
    assert(ins.nonEmpty, s"$name: expected unpartitioned windows")
    ins.foreach(r => assert(r <= bound,
      s"$name: $r rows entered an unpartitioned window, bound $bound"))
    ops.PipelineCache.releaseAll()
    spark.sharedState.cacheManager.clearCache()
  }

  private def events: DataFrame = ops.Tables.events(spark, sfDir)
  private def orders: DataFrame = ops.Tables.orders(spark, sfDir)

  test("DistRank family: prefix windows see ≤ shuffle-partition rows") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    allInputsAtMost("agg_rfm_segments", parts)
    allInputsAtMost("agg_abc_analysis", parts)
    allInputsAtMost("stat_conformal_interval", parts)
    // lorenz: pid prefix AND the constant decile table
    allInputsAtMost("agg_lorenz_points", math.max(parts, 10L))
  }

  test("calendar family: day-grid windows see ≤ the events day span") {
    val span = events.agg(
      (datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
        .cast("long")).head.getLong(0)
    for (q <- Seq("stat_cusum_peak", "stat_dickey_fuller",
        "stat_durbin_watson", "stat_hurst_rs", "stat_ljung_box",
        "stat_sprt_sequential", "time_acf", "window_rolling_corr",
        "window_rolling_median"))
      allInputsAtMost(q, span)
    // Theil–Sen ranks the day-PAIR slopes: ≤ span·(span−1)/2
    allInputsAtMost("trend_theilsen_daily", span * (span - 1) / 2)
  }

  test("enum families: nation / type×weekday grids") {
    allInputsAtMost("stat_bh_fdr", 25L)
    val nTypes = events.select("event_type").distinct().count()
    allInputsAtMost("agg_chisq_independence", nTypes * 7)
    allInputsAtMost("stat_cramers_v", nTypes * 7)
  }

  test("value-grid families: windows see ≤ domain-range cells, a corpus-invariant ceiling") {
    // KS / Kruskal roll events.value up to its distinct (cent) values:
    // bounded by the RANGE of the value domain in cents — a property of
    // the value generator, not of the row count
    val centRange = events.agg(
      ((max(col("value")) - min(col("value"))) * 100 + 1).cast("long"))
      .head.getLong(0)
    allInputsAtMost("stat_ks_two_sample", centRange)
    allInputsAtMost("stat_kruskal_wallis", centRange)
    // survival durations are datediff DAYS between two order dates:
    // bounded by the order-date calendar span
    val daySpan = orders.agg(
      (datediff(max(to_date(col("o_orderdate"))),
        min(to_date(col("o_orderdate")))) + 1).cast("long")).head.getLong(0)
    allInputsAtMost("stat_kaplan_meier", daySpan)
    allInputsAtMost("stat_logrank_test", daySpan)
    // isotonic calibration bins totalprice into 12k-wide buckets:
    // ≤ ceil(max/12000)+1 bins, a price-domain property
    val binCap = orders.agg(
      (floor(max(col("o_totalprice")) / 12000.0) -
        floor(min(col("o_totalprice")) / 12000.0) + 1).cast("long"))
      .head.getLong(0)
    allInputsAtMost("stat_isotonic_calibration", binCap)
  }
}
