package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decision-support suite: the four classic TPC-H plan shapes the v1
  * registry did not yet exercise — distribution-of-counts over an outer
  * join (Q13), a multi-dimension market-share ratio over a 7-table star
  * (Q8), a correlated per-group threshold (Q17), and the exists /
  * not-exists "sole blame" pattern (Q21). The reference's query surface
  * is CRUD-ish ETL; these are the analytic shapes a warehouse user runs
  * on the loaded star schema afterwards (SURVEY §2.3 joins/aggregation
  * categories), so they are part of "same query capabilities".
  *
  * All follow the determinism recipe (SURVEY §2.2 preamble): DECIMAL
  * money, integer counts, stable ORDER BY with full tiebreaks; the one
  * ratio (market share) divides two doubles that both engines obtain by
  * casting the SAME exact decimals, so the IEEE quotient is bit-equal.
  *
  * Scale posture notes are per-query; the common theme is that every
  * correlated subquery is rewritten as ONE aggregation + ONE equi-join
  * on the correlation key (the textbook decorrelation Spark's planner
  * would also pick) while the DuckDB oracles keep the literal
  * EXISTS/NOT-EXISTS form — different algorithm, same rows.
  */
object DecisionQueries {

  private def money(c: Column): Column = c.cast(DecimalType(18, 2))
  private def moneyOut(c: Column): Column = c.cast(DoubleType)
  private def rev: Column =
    money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))

  private val ShareRegion = "ASIA"
  private val ShareType   = "PROMO"
  private val ShareNation = "NATION_9" // largest supplier nation in the corpus
  private val LateDays    = 60

  /** Q13 shape — customer order-count distribution INCLUDING the
    * zero-order customers an inner join would drop: left outer join with
    * a pushed-into-the-join filter on the right side, count per customer,
    * then count-of-counts.
    *
    * Scale posture: both the join and the per-customer count key on
    * c_custkey, so the first aggregation reuses the join's exchange
    * (one shuffle does both); the count-of-counts input is |customers|
    * rows collapsed to a handful of distinct counts — partial aggregation
    * makes the second exchange bytes-trivial. No window, no distinct. */
  def dsqCustdist(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "F")
      .select("o_custkey", "o_orderkey")
    val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q8 shape — market share: of all PROMO-part revenue sold to ASIA
    * customers, the fraction supplied from one nation, per order year.
    *
    * Scale posture: the single large⋈large join is lineitem⋈orders on
    * orderkey; every other input (customer at 1.5 % of lineitem, part,
    * supplier, nation, region) broadcasts, so the star resolves in ONE
    * shuffle + map-side hash probes. The share is a conditional decimal
    * sum over the same pass as the total — no second scan, no self-join.
    * Both sums partial-aggregate map-side; the final divide is per-year
    * scalar arithmetic on exact operands. */
  def dsqMarketShare(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val p  = Tables.part(s, d).filter(col("p_type") === ShareType)
    val cn = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey"))
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val r  = Tables.region(s, d).filter(col("r_name") === ShareRegion)

    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("cn_rkey") === r("r_regionkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(sn), su("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === ShareNation, rev)
          .otherwise(lit(BigDecimal("0.00")))).as("nat_rev_dec"),
        sum(rev).as("tot_rev_dec"),
        count(lit(1)).as("n_items"))
      .select(col("o_year"),
        (moneyOut(col("nat_rev_dec")) / moneyOut(col("tot_rev_dec")))
          .as("mkt_share"),
        moneyOut(col("tot_rev_dec")).as("total_rev"),
        col("n_items"))
      .orderBy("o_year")
  }

  /** Q17 shape — small-quantity-order revenue: lines whose quantity is
    * below HALF their part's average quantity, revenue rolled up by
    * brand. The correlated scalar subquery (per-part average) becomes a
    * per-part aggregation joined back on partkey; the average itself is
    * never divided — the predicate `qty < sum/(2n)` is cross-multiplied
    * to `2·qty·n < sum`, keeping the whole chain in exact DECIMAL×INT
    * arithmetic (a double average would round differently per engine).
    *
    * Scale posture: the per-part aggregate and the join back both key on
    * l_partkey — one exchange feeds both (Spark reuses the partitioning);
    * part broadcasts for the brand rollup, which partial-aggregates to
    * |brands| rows. */
  def dsqSmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(money(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n_lines"))
    val p = Tables.part(s, d).select("p_partkey", "p_brand")
    li.join(perPart, li("l_partkey") === col("pk"))
      .filter(money(col("l_quantity")) * lit(2) * col("n_lines") < col("sum_qty"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(moneyOut(sum(rev)).as("small_qty_rev"), count(lit(1)).as("n_small"))
      .orderBy("p_brand")
  }

  /** Q21 shape — "sole late supplier": for finished orders with lines
    * from MORE than one supplier where EXACTLY one supplier shipped late
    * (> 60 days after the order date), count the blame per supplier.
    * The reference pattern is EXISTS(other supplier) AND NOT EXISTS
    * (other LATE supplier); the registered plan is the classic rewrite —
    * per-order supplier counts (total and late, both countDistinct) +
    * one equi-join — which replaces two correlated self-joins of the
    * fact table with aggregations on the SAME orderkey the late-line
    * frame already shuffles on.
    *
    * Scale posture: lineitem⋈orders on orderkey (orders' status filter
    * pushed to its scan), then every aggregation and join keys on
    * orderkey — AQE/exchange-reuse runs the whole qualification in that
    * one partitioning; supplier broadcasts for naming. A hub order (one
    * key with millions of lines) bounds at the order's line count, not
    * the corpus. The oracle keeps the EXISTS / NOT EXISTS formulation:
    * different algorithm, same rows. */
  def dsqWaitingSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val nSupp = li.groupBy(col("l_orderkey").as("ok2"))
      .agg(countDistinct(col("l_suppkey")).as("ns"))
    val nLate = late.groupBy(col("ok").as("ok3"))
      .agg(countDistinct(col("sk")).as("nls"))
    val su = Tables.supplier(s, d).select("s_suppkey", "s_name")
    late
      .join(nSupp, col("ok") === col("ok2")).filter(col("ns") > 1)
      .join(nLate, col("ok") === col("ok3")).filter(col("nls") === 1)
      .join(broadcast(su), col("sk") === su("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** Q11 shape — important nations: supplier nations whose revenue share
    * exceeds 2 % of the global total. The HAVING-against-a-global-scalar
    * pattern: the per-nation aggregate is compared to a 1-row global
    * aggregate. The predicate is cross-multiplied (`rev·50 > total`) so
    * the qualification happens in exact DECIMAL×INT arithmetic; only the
    * reported share divides (both engines from the same exact operands).
    *
    * Scale posture: one lineitem aggregation keyed on s_nationkey after a
    * broadcast supplier probe (map-side partial agg reduces to ≤ |nations|
    * rows per task); the global total re-aggregates those few rows — not a
    * second scan — and joins back as a broadcast single row. */
  def dsqImportantNations(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n  = Tables.nation(s, d).select("n_nationkey", "n_name")
    val perNation = li
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .groupBy("s_nationkey").agg(sum(rev).as("rev_dec"))
    val total = perNation.agg(sum(col("rev_dec")).as("tot_dec"))
    perNation.crossJoin(broadcast(total))
      .filter(col("rev_dec") * lit(50) > col("tot_dec"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (moneyOut(col("rev_dec")) / moneyOut(col("tot_dec"))).as("share"),
        moneyOut(col("rev_dec")).as("nation_rev"))
      .orderBy("n_name")
  }

  /** Q15 shape — top supplier(s): the supplier(s) with the global maximum
    * revenue, ties preserved. The scalar-subquery-on-an-aggregate pattern:
    * max over a derived aggregate, equality back against it. The equality
    * is on exact DECIMAL sums, so "tie" is well-defined identically in
    * both engines (a double max would make tie-ness platform-dependent).
    *
    * Scale posture: one per-supplier aggregation (map-side partial), the
    * 1-row max re-aggregates its output and broadcasts back; supplier
    * names broadcast. No window, no sort of the full aggregate. */
  def dsqTopSupplier(s: SparkSession, d: String): DataFrame = {
    val perSupp = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(sum(rev).as("rev_dec"))
    val maxRev = perSupp.agg(max(col("rev_dec")).as("max_dec"))
    val su = Tables.supplier(s, d).select("s_suppkey", "s_name")
    perSupp.crossJoin(broadcast(maxRev))
      .filter(col("rev_dec") === col("max_dec"))
      .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        moneyOut(col("rev_dec")).as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Q22 shape — sales opportunity: customers with above-average (positive)
    * account balance who have never placed an URGENT-priority order,
    * rolled up by market segment. Combines the scalar-average subquery
    * and NOT EXISTS anti-join. The average is never computed: `bal >
    * sum/n` is cross-multiplied to `bal·n > sum` (DECIMAL×BIGINT, exact);
    * the anti-join replaces the correlated NOT EXISTS. (The fixture has
    * no order-less customers at any SF, so the "never ordered" literal of
    * Q22 would be vacuously empty — the priority restriction keeps the
    * same plan shape with a non-trivial answer.)
    *
    * Scale posture: the positive-balance aggregate is a 1-row broadcast;
    * the anti-join keys on custkey against orders' filtered custkey
    * projection (filter + 1-column pruning reach the scan); segment
    * rollup partial-aggregates to |segments| rows. */
  def dsqSalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        money(col("c_acctbal")).as("bal"))
    val pos = c.filter(col("bal") > lit(0))
      .agg(sum(col("bal")).as("pos_sum"), count(lit(1)).as("pos_n"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.crossJoin(broadcast(pos))
      .filter(col("bal") * col("pos_n") > col("pos_sum"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), moneyOut(sum(col("bal"))).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  private val Q3Cut = "1998-06-01"

  /** Q3 shape — shipping priority: revenue of the not-yet-shipped part
    * of BUILDING-segment orders placed before the cutoff, top 10 by
    * revenue. The classic "3-table join, group on the fact key, global
    * top-k" plan.
    *
    * Scale posture: both filters push into the parquet scans before the
    * joins; the group keys on l_orderkey so the aggregation reuses the
    * lineitem⋈orders exchange; the top-10 is TakeOrderedAndProject
    * (per-partition heaps + driver merge of 10·partitions rows), never
    * a global sort. Ordering ties break on exact DECIMAL revenue then
    * the key, so the top-10 SET is deterministic. */
  def dsqShippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, d)
      .filter(expr(s"o_orderdate < TIMESTAMP '$Q3Cut'"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, d)
      .filter(expr(s"l_shipdate > TIMESTAMP '$Q3Cut'"))
      .select(col("l_orderkey"), rev.as("r"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"), "left_semi")
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("r")).as("rev_x"))
      .orderBy(col("rev_x").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), moneyOut(col("rev_x")).as("revenue"),
        col("o_orderdate"))
  }

  /** Q10 shape — returned-item reporting: revenue lost to 'R'-flag
    * returns per customer in one quarter, top 20 customers with their
    * nation. Join pyramid fact→orders→customer→nation with the
    * aggregation keyed on the customer attributes.
    *
    * Scale posture: quarter + returnflag filters reach the scans;
    * nation broadcasts; the per-customer aggregate keys on c_custkey
    * (the other group columns are functionally dependent, riding the
    * same exchange); top-20 is TakeOrdered on the exact DECIMAL with a
    * key tiebreak. */
  def dsqReturnedCustomers(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(expr("o_orderdate >= TIMESTAMP '1997-10-01'") &&
        expr("o_orderdate < TIMESTAMP '1998-01-01'"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev.as("r"))
    val c = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(col("r")).as("rev_x"))
      .orderBy(col("rev_x").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        moneyOut(col("rev_x")).as("revenue"), col("c_acctbal"),
        col("n_name"))
  }

  /** Q5 shape — local supplier volume: revenue per nation in one region
    * and year where the supplier is in the CUSTOMER's nation — the
    * join-graph cycle (lineitem→orders→customer→nation plus
    * lineitem→supplier with s_nationkey = c_nationkey) that makes Q5
    * the classic join-order benchmark.
    *
    * Scale posture: the cycle closes with an equi-FILTER
    * (s_nationkey = c_nationkey) after the supplier equi-join rather
    * than a second join pass; nation/region broadcast; year filter
    * pushes to the orders scan; final rollup is ≤ |nations| rows. */
  def dsqLocalVolume(s: SparkSession, d: String): DataFrame = {
    val rg = Tables.region(s, d).filter(col("r_name") === ShareRegion)
    val n = Tables.nation(s, d)
      .join(broadcast(rg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val o = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1997)
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("r"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, col("l_suppkey") === su("s_suppkey"))
      .filter(su("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(moneyOut(sum(col("r"))).as("revenue"))
      .orderBy("n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsq_shipping_priority"  -> dsqShippingPriority _,
    "dsq_returned_customers" -> dsqReturnedCustomers _,
    "dsq_local_volume"       -> dsqLocalVolume _,
    "dsq_custdist"          -> dsqCustdist _,
    "dsq_market_share"      -> dsqMarketShare _,
    "dsq_small_qty_revenue" -> dsqSmallQtyRevenue _,
    "dsq_waiting_supplier"  -> dsqWaitingSupplier _,
    "dsq_important_nations" -> dsqImportantNations _,
    "dsq_top_supplier"      -> dsqTopSupplier _,
    "dsq_sales_opportunity" -> dsqSalesOpportunity _,
  )

  val oracle: Map[String, String] = Map(
    "dsq_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         |  o_orderdate
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_custkey IN (SELECT c_custkey FROM customer
         |    WHERE c_mktsegment = 'BUILDING')
         |  AND o_orderdate < TIMESTAMP '$Q3Cut'
         |  AND l_shipdate > TIMESTAMP '$Q3Cut'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |    (1 - CAST(l_discount AS DECIMAL(18,2)))) DESC,
         |  o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
    "dsq_returned_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "dsq_local_volume" ->
      s"""SELECT n_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE s_nationkey = c_nationkey AND r_name = '$ShareRegion'
         |  AND year(o_orderdate) = 1997
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "dsq_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "dsq_market_share" ->
      s"""WITH flat AS (
         |  SELECT year(o_orderdate) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(18,2)) *
         |      (1 - CAST(l_discount AS DECIMAL(18,2))) AS r,
         |    sn.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN orders    ON l_orderkey = o_orderkey
         |  JOIN customer  ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region    ON cn.n_regionkey = r_regionkey
         |  JOIN part      ON l_partkey = p_partkey
         |  JOIN supplier  ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE r_name = '$ShareRegion' AND p_type = '$ShareType')
         |SELECT o_year,
         |  CAST(SUM(CASE WHEN supp_nation = '$ShareNation'
         |      THEN r ELSE CAST('0.00' AS DECIMAL(18,2)) END) AS DOUBLE)
         |    / CAST(SUM(r) AS DOUBLE) AS mkt_share,
         |  CAST(SUM(r) AS DOUBLE) AS total_rev,
         |  COUNT(*) AS n_items
         |FROM flat GROUP BY o_year ORDER BY o_year""".stripMargin,
    "dsq_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    COUNT(*) AS n_lines
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS small_qty_rev,
        |  COUNT(*) AS n_small
        |FROM lineitem JOIN pa ON l_partkey = pk
        |JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * n_lines < sum_qty
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "dsq_waiting_supplier" ->
      // the literal EXISTS / NOT-EXISTS formulation — independent
      // construction of the same qualification the engine computes via
      // per-order countDistinct aggregates
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND o3.o_orderkey = l3.l_orderkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "dsq_important_nations" ->
      """WITH per AS (
        |  SELECT s_nationkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey),
        |tot AS (SELECT SUM(rev_dec) AS tot_dec FROM per)
        |SELECT n_name,
        |  CAST(rev_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) AS share,
        |  CAST(rev_dec AS DOUBLE) AS nation_rev
        |FROM per, tot
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE rev_dec * 50 > tot_dec
        |ORDER BY n_name""".stripMargin,
    "dsq_top_supplier" ->
      """WITH per AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_rev
        |FROM per JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM per)
        |ORDER BY s_suppkey""".stripMargin,
    "dsq_sales_opportunity" ->
      """WITH pos AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
        |    COUNT(*) AS pos_n
        |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
        |SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos_n > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
  )
}
