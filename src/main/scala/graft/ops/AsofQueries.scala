package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (temporal lookup) join — an operator Spark has no primitive
  * for, composed from built-ins per the preference ladder (SURVEY §2.3
  * option (a)): tag both sides, union, and take the last non-null
  * right-side value per key in event-time order. One shuffle on the
  * join key, sort within partitions — the same cost profile as a
  * sort-merge join, and the standard scalable formulation (a range
  * join would cross-product within key groups; a per-row subquery
  * would not distribute at all).
  *
  * Semantics (inclusive): each event picks the most recent daily
  * summary of the same user with day ≤ the event's day. Events before
  * a user's first summary get null. Verified against DuckDB's native
  * ASOF JOIN — two completely different algorithms, same rows.
  */
object AsofQueries {

  def joinAsofDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      datediff(col("ts").cast(DateType), lit("2024-01-01").cast(DateType)).as("day"))

    val daily = ev.groupBy("user_id", "day")
      .agg(count(lit(1)).cast(LongType).as("day_total"))

    // union trick: daily rows (kind 0) sort before same-day events
    // (kind 1), so last_value(ignoreNulls) at an event row is the
    // latest daily with day <= event day
    val tagged = daily.select(col("user_id"), col("day"), lit(0).as("kind"),
        lit(null).cast(LongType).as("event_id"), col("day_total"))
      .unionByName(ev.select(col("user_id"), col("day"), lit(1).as("kind"),
        col("event_id"), lit(null).cast(LongType).as("day_total")))

    val w = Window.partitionBy("user_id")
      .orderBy("day", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("asof_total", last("day_total", ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("day"),
        coalesce(col("asof_total"), lit(-1L)).as("asof_total"))
      .orderBy("event_id")
  }

  /** The same as-of lookup through the engine's NATIVE operator
    * ([[graft.plans.AsofJoin]]: custom LogicalPlan + SparkStrategy +
    * SparkPlan) instead of the union+last_value composition — each side
    * shuffles on its own key and a linear per-partition merge replaces
    * the window over the unioned rows. Same rows by construction
    * (differential-tested in AsofNativeSpec; same DuckDB oracle). */
  def joinAsofNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      datediff(col("ts").cast(DateType), lit("2024-01-01").cast(DateType)).as("day"))
    // repartition by user_id BEFORE the (user_id, day) agg: hash(user_id)
    // satisfies ClusteredDistribution(user_id, day) (subset rule), so the
    // agg reuses this exchange AND its output partitioning already
    // satisfies the as-of join's requirement — the build side reaches the
    // merge with ONE exchange instead of two
    val daily = ev.repartition(col("user_id")).groupBy("user_id", "day")
      .agg(count(lit(1)).cast(LongType).as("day_total"))
      .select(col("user_id").as("r_user_id"), col("day").as("r_day"), col("day_total"))
    graft.plans.AsofJoin(ev, daily, "user_id", "r_user_id", "day", "r_day")
      .select(col("event_id"), col("user_id"), col("day"),
        coalesce(col("day_total"), lit(-1L)).as("asof_total"))
      .orderBy("event_id")
  }

  /** INDEPENDENT-sides as-of: probe = events, build = an aggregate of a
    * DIFFERENT table (orders) — the case the native operator exists for.
    * `join_asof_daily`/`join_asof_native` derive both sides from the one
    * events scan, which lets the union+window form share a single
    * shuffle; with genuinely independent sides each formulation pays one
    * shuffle per side, and the comparison isolates merge cost: linear
    * typed forward merge (native) vs window over the unioned rows
    * (composed). Shared time axis: day-of-month (events are 2024-01,
    * orders 1995–2001 — calendar days overlap 1..30, so matches
    * genuinely interleave instead of degenerating to "last build row").
    * Key axis: o_custkey % 150 folds the 1500 customers onto the 150
    * event users. */
  private def asofOrdersSides(s: SparkSession, d: String,
      repartitionBuild: Boolean = false): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      dayofmonth(col("ts")).cast(LongType).as("day"))
    val ordBase = Tables.orders(s, d)
      .select((col("o_custkey") % 150).as("r_cust"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("r_day"),
        col("o_totalprice"))
    // native form: repartition by r_cust BEFORE the (r_cust, r_day) agg —
    // hash(r_cust) satisfies ClusteredDistribution(r_cust, r_day) by the
    // subset rule, so the agg reuses this exchange AND its layout already
    // satisfies the as-of merge's ClusteredDistribution(r_cust). Without
    // it the agg exchanges on (r_cust, r_day), which does NOT satisfy the
    // merge, and EnsureRequirements inserts a third shuffle.
    val ord = (if (repartitionBuild) ordBase.repartition(col("r_cust")) else ordBase)
      .groupBy("r_cust", "r_day")
      .agg(count(lit(1)).as("n_orders"),
        // max of doubles is order-insensitive and exact (unlike sum) —
        // keeps the oracle hash bit-stable across engines
        max("o_totalprice").as("best_price"))
    (ev, ord)
  }

  def joinAsofOrdersNative(s: SparkSession, d: String): DataFrame = {
    val (ev, ord) = asofOrdersSides(s, d, repartitionBuild = true)
    graft.plans.AsofJoin(ev, ord, "user_id", "r_cust", "day", "r_day")
      .select(col("event_id"), col("user_id"), col("day"),
        coalesce(col("n_orders"), lit(-1L)).as("n_orders"),
        coalesce(col("best_price"), lit(-1.0)).as("best_price"))
      .orderBy("event_id")
  }

  def joinAsofOrdersComposed(s: SparkSession, d: String): DataFrame = {
    val (ev, ord) = asofOrdersSides(s, d)
    val tagged = ord.select(col("r_cust").as("user_id"), col("r_day").as("day"),
        lit(0).as("kind"), lit(null).cast(LongType).as("event_id"),
        col("n_orders"), col("best_price"))
      .unionByName(ev.select(col("user_id"), col("day"), lit(1).as("kind"),
        col("event_id"), lit(null).cast(LongType).as("n_orders"),
        lit(null).cast(DoubleType).as("best_price")))
    val w = Window.partitionBy("user_id")
      .orderBy("day", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_n", last("n_orders", ignoreNulls = true).over(w))
      .withColumn("asof_p", last("best_price", ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("day"),
        coalesce(col("asof_n"), lit(-1L)).as("n_orders"),
        coalesce(col("asof_p"), lit(-1.0)).as("best_price"))
      .orderBy("event_id")
  }

  /** Tolerance-bounded as-of over the independent sides: a lookup row
    * staler than [[AsofToleranceDays]] days is treated as absent (nulls
    * → the -1 sentinels), the standard "don't join stale quotes"
    * guard in market-data and feature-store lookups. Exercises the
    * native operator's tolerance gate — DuckDB's ASOF has no tolerance
    * clause, so the oracle post-filters the gap with a CASE, which is
    * equivalent precisely because the as-of candidate is gap-minimal
    * (if IT is out of tolerance, every other candidate is too). */
  val AsofToleranceDays = 3L

  def joinAsofToleranceNative(s: SparkSession, d: String): DataFrame = {
    val (ev, ord) = asofOrdersSides(s, d, repartitionBuild = true)
    graft.plans.AsofJoin(ev, ord, "user_id", "r_cust", "day", "r_day",
        Some(AsofToleranceDays))
      .select(col("event_id"), col("user_id"), col("day"),
        coalesce(col("n_orders"), lit(-1L)).as("n_orders"),
        coalesce(col("best_price"), lit(-1.0)).as("best_price"))
      .orderBy("event_id")
  }

  /** NEAREST-direction as-of: each event matches the daily-orders row
    * with the smallest |day gap| in EITHER direction, ties preferring
    * the backward (non-peeking) candidate — the pandas
    * `merge_asof(direction='nearest')` semantics. Composed from TWO
    * native [[graft.plans.AsofJoin]] passes: the backward pass as-is,
    * the forward pass as the same operator on the NEGATED time axis
    * (largest −r_day ≤ −day ⇔ smallest r_day ≥ day — direction is a
    * coordinate flip, not new machinery). One CASE picks per row.
    *
    * Scale posture: both passes are the linear keyed merge with the
    * same one-exchange-per-side layout ([[asofOrdersSides]] subset-rule
    * repartition); the final pick joins two already-keyed single-row-
    * per-event frames on event_id. Nothing quadratic anywhere. */
  def joinAsofNearestComposed(s: SparkSession, d: String): DataFrame = {
    val (ev, ord) = asofOrdersSides(s, d, repartitionBuild = true)
    val back = graft.plans.AsofJoin(ev, ord, "user_id", "r_cust", "day", "r_day")
      .select(col("event_id"), col("user_id"), col("day"),
        col("r_day").as("b_day"), col("n_orders").as("b_n"),
        col("best_price").as("b_p"))
    val evN = ev.withColumn("nday", -col("day"))
    val ordN = ord.withColumn("r_nday", -col("r_day"))
    val fwd = graft.plans.AsofJoin(evN, ordN, "user_id", "r_cust", "nday", "r_nday")
      .select(col("event_id").as("f_event_id"), col("r_day").as("f_day"),
        col("n_orders").as("f_n"), col("best_price").as("f_p"))
    val bGap = col("day") - col("b_day")
    val fGap = col("f_day") - col("day")
    val useBack = col("b_day").isNotNull &&
      (col("f_day").isNull || bGap <= fGap)
    back.join(fwd, col("event_id") === col("f_event_id"))
      .select(col("event_id"), col("user_id"), col("day"),
        when(useBack, lit("backward"))
          .when(col("f_day").isNotNull, lit("forward"))
          .otherwise(lit("none")).as("direction"),
        coalesce(when(useBack, bGap).otherwise(fGap), lit(-1L)).as("gap_days"),
        coalesce(when(useBack, col("b_n")).otherwise(col("f_n")), lit(-1L))
          .as("n_orders"),
        coalesce(when(useBack, col("b_p")).otherwise(col("f_p")), lit(-1.0))
          .as("best_price"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_nearest_composed" -> joinAsofNearestComposed _,
    "join_asof_tolerance_native" -> joinAsofToleranceNative _,
    "join_asof_daily"           -> joinAsofDaily _,
    "join_asof_native"          -> joinAsofNative _,
    "join_asof_orders_native"   -> joinAsofOrdersNative _,
    "join_asof_orders_composed" -> joinAsofOrdersComposed _,
  )

  /** Both formulations answer the same question — one oracle text. */
  private val asofOracleSql =
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, COUNT(*) AS day_total FROM ev GROUP BY user_id, day)
        |SELECT e.event_id, e.user_id, e.day,
        |  COALESCE(d.day_total, -1) AS asof_total
        |FROM ev e ASOF LEFT JOIN daily d
        |  ON e.user_id = d.user_id AND e.day >= d.day
        |ORDER BY event_id""".stripMargin

  /** Both formulations of the independent-sides variant share one oracle
    * (DuckDB native ASOF LEFT JOIN — a third, unrelated algorithm). */
  private val asofOrdersOracleSql =
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(day(ts) AS BIGINT) AS day FROM events),
        |ord AS (
        |  SELECT o_custkey % 150 AS r_cust, CAST(day(o_orderdate) AS BIGINT) AS r_day,
        |         COUNT(*) AS n_orders, MAX(o_totalprice) AS best_price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.day,
        |  COALESCE(o.n_orders, -1) AS n_orders,
        |  COALESCE(o.best_price, -1.0) AS best_price
        |FROM ev e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.r_cust AND e.day >= o.r_day
        |ORDER BY event_id""".stripMargin

  private val asofToleranceOracleSql =
      s"""WITH ev AS (
        |  SELECT event_id, user_id, CAST(day(ts) AS BIGINT) AS day FROM events),
        |ord AS (
        |  SELECT o_custkey % 150 AS r_cust, CAST(day(o_orderdate) AS BIGINT) AS r_day,
        |         COUNT(*) AS n_orders, MAX(o_totalprice) AS best_price
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.day,
        |  COALESCE(CASE WHEN e.day - o.r_day <= $AsofToleranceDays
        |    THEN o.n_orders END, -1) AS n_orders,
        |  COALESCE(CASE WHEN e.day - o.r_day <= $AsofToleranceDays
        |    THEN o.best_price END, -1.0) AS best_price
        |FROM ev e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.r_cust AND e.day >= o.r_day
        |ORDER BY event_id""".stripMargin

  /** Nearest oracle: generic ranked-candidate form (DuckDB's ASOF has
    * no 'nearest' direction) — per event every same-user daily row is
    * ranked by (|gap|, backward-first, r_day); rk=1 is the match. A
    * different algorithm that must agree with the two-pass composition. */
  private val asofNearestOracleSql =
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(day(ts) AS BIGINT) AS day FROM events),
        |ord AS (
        |  SELECT o_custkey % 150 AS r_cust, CAST(day(o_orderdate) AS BIGINT) AS r_day,
        |         COUNT(*) AS n_orders, MAX(o_totalprice) AS best_price
        |  FROM orders GROUP BY 1, 2),
        |cand AS (
        |  SELECT e.event_id, e.user_id, e.day, o.r_day, o.n_orders,
        |    o.best_price, abs(o.r_day - e.day) AS gap,
        |    CASE WHEN o.r_day <= e.day THEN 0 ELSE 1 END AS fwd,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY
        |      abs(o.r_day - e.day),
        |      CASE WHEN o.r_day <= e.day THEN 0 ELSE 1 END, o.r_day) AS rk
        |  FROM ev e JOIN ord o ON e.user_id = o.r_cust),
        |best AS (SELECT * FROM cand WHERE rk = 1)
        |SELECT e.event_id, e.user_id, e.day,
        |  CASE WHEN b.event_id IS NULL THEN 'none'
        |       WHEN b.fwd = 0 THEN 'backward' ELSE 'forward' END AS direction,
        |  COALESCE(b.gap, -1) AS gap_days,
        |  COALESCE(b.n_orders, -1) AS n_orders,
        |  COALESCE(b.best_price, -1.0) AS best_price
        |FROM ev e LEFT JOIN best b ON e.event_id = b.event_id
        |ORDER BY e.event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "join_asof_nearest_composed" -> asofNearestOracleSql,
    "join_asof_tolerance_native" -> asofToleranceOracleSql,
    "join_asof_daily"           -> asofOracleSql,
    "join_asof_native"          -> asofOracleSql,
    "join_asof_orders_native"   -> asofOrdersOracleSql,
    "join_asof_orders_composed" -> asofOrdersOracleSql,
  )
}
