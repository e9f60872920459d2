package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared relational query inventory (SURVEY.md §2.2).
  *
  * Every query here is paired with ANSI SQL in [[RelationalQueries.oracle]]
  * that DuckDB executes over the same parquet files; the driver hash-compares
  * the two result sets. Determinism rules (SURVEY §2.2): total ORDER BY with
  * tiebreak keys on both sides, money math in DECIMAL(18,2) *before*
  * aggregation (FP sum order differs between engines), `date_trunc` before
  * comparing the ns-precision `events.ts`, no arbitrary-survivor dedup.
  *
  * Scale posture: filters/projections sit directly on the parquet scan so
  * Catalyst pushes them down; dimension joins (region/nation/part at TPC-H
  * proportions) are explicitly `broadcast`; fact-fact joins shuffle on their
  * natural key and rely on AQE for skew/plan fixups at 100 TB.
  */
object RelationalQueries {

  /** DECIMAL(18,2) money cast — exact aggregation, identical in DuckDB. */
  private def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final-result cast: exact decimal → double is correctly rounded in both
    * Spark (BigDecimal.doubleValue) and DuckDB, and gives both engines the
    * same physical output type (float64) for the driver's hash compare. */
  private def moneyOut(c: Column): Column = c.cast(DoubleType)

  // --- S1: scan + filter + project -----------------------------------------
  /** Mirrors reference S1 (`importador.py:47` scan) + predicate/projection.
    * Filter and 4-column projection push into the parquet scan. */
  def scanProjectFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  // --- hash aggregate (TPC-H Q1 shape) -------------------------------------
  /** Partial (map-side) aggregation then one shuffle on the 6-ish distinct
    * group keys; decimal sums keep the oracle hash-stable. */
  def aggHashGroupby(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneyOut(sum(money(col("l_quantity")))).as("sum_qty"),
        moneyOut(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        moneyOut(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // --- star join (flagship) -------------------------------------------------
  /** L5 chain: revenue by region. lineitem⋈orders shuffles on orderkey
    * (both huge at scale); customer⋈nation⋈region are broadcast dims. */
  def joinStarMultiway(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        moneyOut(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_project_filter" -> scanProjectFilter _,
    "agg_hash_groupby"    -> aggHashGroupby _,
    "join_star_multiway"  -> joinStarMultiway _,
  )

  val oracle: Map[String, String] = Map(
    "scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "agg_hash_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_star_multiway" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
  )
}
