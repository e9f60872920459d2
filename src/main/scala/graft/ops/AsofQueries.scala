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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_daily"  -> joinAsofDaily _,
    "join_asof_native" -> joinAsofNative _,
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

  val oracle: Map[String, String] = Map(
    "join_asof_daily"  -> asofOracleSql,
    "join_asof_native" -> asofOracleSql,
  )
}
