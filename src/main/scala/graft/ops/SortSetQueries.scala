package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / top-k / set-op / unpivot inventory (SURVEY §2.2).
  *
  * The reference's only ordering is a `head(5)` preview
  * (`/root/reference/importador.py:39`); its unpivot is the contacts melt
  * (`etl_process.py:153–174`, op L10). Scale posture: global top-k plans
  * as TakeOrderedAndProject (per-partition top-k, then a k-row merge on
  * the driver — never a full sort); set ops shuffle once on the full row.
  */
object SortSetQueries {

  /** Global top-k. Spark's TakeOrderedAndProject does partial top-k per
    * partition — the full 100 TB never sorts. Full tiebreak for
    * determinism (prices repeat). */
  def sortLimitTopk(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** UNION ALL: bag-union of two key streams, then aggregated so the
    * result is order-insensitive. */
  def setUnionAll(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    c.unionAll(su).groupBy("nk").agg(count(lit(1)).as("n")).orderBy("nk")
  }

  /** INTERSECT (set semantics): order keys present in both orders and
    * lineitem. One shuffle on the key; distinct built in. */
  def setIntersect(s: SparkSession, d: String): DataFrame = {
    val o  = Tables.orders(s, d).select(col("o_orderkey").as("okey"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey").as("okey"))
    o.intersect(li).orderBy("okey")
  }

  /** EXCEPT (set semantics): orders that never shipped a line — non-empty
    * in this corpus at every SF. */
  def setExcept(s: SparkSession, d: String): DataFrame = {
    val o  = Tables.orders(s, d).select(col("o_orderkey").as("okey"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey").as("okey"))
    o.except(li).orderBy("okey")
  }

  /** L10 unpivot (contacts melt) on corpus columns: (l_tax, l_discount) →
    * (metric, value) rows via the `stack` generator — row-count identity
    * 2×|lineitem|, no shuffle (generator is pipelined in the scan stage). */
  def unpivotStack(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(2, 'discount', l_discount, 'tax', l_tax) AS (metric, value)"))
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** UNION (distinct semantics): the dedup-on-union shape — one
    * shuffle on the full row, vs unionAll's none. */
  def setUnionDistinct(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    c.union(su).distinct().orderBy("nk")
  }

  /** Schema-evolution union: `unionByName(allowMissingColumns = true)`
    * — the shape every multi-source ingest hits (sources drift columns
    * over time); missing columns null-fill instead of failing or, worse,
    * silently mismatching by position. Zero shuffle (union is a
    * partition concat); the final sort is presentation only. */
  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val c = Tables.customer(s, d).select(col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      lit("customer").as("src"))
    // supplier side deliberately LACKS acctbal → null-filled by name
    val sup = Tables.supplier(s, d).select(
      (col("s_suppkey") + 1000000L).as("id"), col("s_name").as("name"),
      lit("supplier").as("src"))
    c.unionByName(sup, allowMissingColumns = true)
      .select(col("id"), col("name"), col("acctbal").cast(DoubleType), col("src"))
      .orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_by_name"  -> setUnionByName _,
    "set_union_distinct" -> setUnionDistinct _,
    "sort_limit_topk" -> sortLimitTopk _,
    "set_union_all"   -> setUnionAll _,
    "set_intersect"   -> setIntersect _,
    "set_except"      -> setExcept _,
    "unpivot_stack"   -> unpivotStack _,
  )

  val oracle: Map[String, String] = Map(
    "set_union_by_name" ->
      """SELECT id, name, acctbal, src FROM (
        |  SELECT c_custkey AS id, c_name AS name,
        |    CAST(c_acctbal AS DOUBLE) AS acctbal, 'customer' AS src
        |  FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_suppkey + 1000000 AS id, s_name AS name, 'supplier' AS src
        |  FROM supplier)
        |ORDER BY id""".stripMargin,
    "set_union_distinct" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,
    "sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,
    "set_union_all" ->
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "set_intersect" ->
      """SELECT o_orderkey AS okey FROM orders
        |INTERSECT
        |SELECT l_orderkey AS okey FROM lineitem
        |ORDER BY okey""".stripMargin,
    "set_except" ->
      """SELECT o_orderkey AS okey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS okey FROM lineitem
        |ORDER BY okey""".stripMargin,
    "unpivot_stack" ->
      """SELECT l_orderkey, l_linenumber, 'discount' AS metric,
        |  l_discount AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax' AS metric,
        |  l_tax AS value FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
  )
}
