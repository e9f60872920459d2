package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second-wave relational operators: full outer join, cube, analytic
  * windows (ntile/percent_rank/cume_dist), range frames, pivot, array
  * ops over real float vectors, exact percentiles, typed JSON
  * extraction. Everything oracle-checked; determinism rules follow
  * SURVEY §2.2 (total orders, decimal money, doubles only where the
  * formula — not accumulation order — defines the value). */
object AdvancedQueries {

  /** Full outer join orders ⟗ customer: match + both dangling sides.
    * Sort keys built non-null via coalesce (Spark ASC=NULLS FIRST vs
    * DuckDB NULLS LAST would diverge otherwise). */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("o_orderkey"), lit(-1L)).as("orderkey"),
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "customer_only")
          .otherwise("both").as("side"))
      .orderBy("custkey", "orderkey")
  }

  /** CUBE over two order dimensions with grouping id (sibling of the
    * declared rollup). */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"))
      .orderBy("gid", "status", "priority")

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * per-status totals, per-priority totals, and the grand total in ONE
    * pass (Spark expands the sets map-side and partial-aggregates
    * before the single shuffle, same as rollup). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"))
      .orderBy("gid", "status", "priority")

  /** Analytic ranking battery: ntile quartiles, percent_rank, cume_dist
    * per nation (rank arithmetic — no FP accumulation, bit-stable). */
  /** Batch sessionization — the lag-gap-flag + running-sum idiom (the
    * batch twin of `Streams.sessionize`): a new session starts when the
    * gap to the previous event of the same user exceeds 30 minutes;
    * the session index is the running count of starts. Two windows over
    * ONE partitioning (user_id) → a single shuffle serves both, then
    * the summary groupBy reuses the same keys. Timestamps truncated to
    * seconds on both engines (events.ts is ns-precision parquet; Spark
    * reads µs — the second grain is the shared safe grain). */
  def windowSessionizeBatch(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts"))
    e.withColumn("new_s",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          col("ts").cast(LongType) - lag(col("ts"), 1).over(byUser).cast(LongType) > 1800L,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .orderBy("user_id", "session_idx")
  }

  /** NATIVE `session_window` sessionization in batch — the built-in
    * operator next to the manual lag-gap idiom ([[windowSessionizeBatch]]).
    * Boundary semantics, MEASURED not assumed (round 9): the engine
    * MERGES an event whose gap to the session's last event is exactly
    * the 30-minute gapDuration — i.e. a new session starts only at
    * gap > 1800 s, the same inclusive boundary as the manual idiom.
    * The oracle's manual reconstruction matches (`> 1800`); the r8
    * oracle said `>= 1800`, which agreed on every fixture until the
    * sf1 corpus produced two second-truncated events exactly 1800 s
    * apart and the engine kept them in one session. Output carries the
    * native window's [start, end) — end = last event + gap. */
  def timeSessionWindowNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")

  /** SQL-text PIVOT → UNPIVOT round trip — the statement-level surface
    * of the pivot/unpivot operators (the DataFrame forms are
    * `pivot_status_counts` / `unpivot_stack`): statuses pivot to
    * columns, UNPIVOT INCLUDE NULLS brings them back, absent cells
    * coalesce to 0 — so the composition must equal the dense
    * priority×status count grid the oracle states directly. */
  def sqlPivotUnpivot(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_pv")
    s.sql(
      """SELECT priority, status, coalesce(n, 0) AS n FROM (
        |  SELECT * FROM
        |    (SELECT o_orderpriority AS priority, o_orderstatus
        |     FROM graft_orders_pv)
        |  PIVOT (COUNT(*) FOR o_orderstatus IN
        |    ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |) UNPIVOT INCLUDE NULLS
        |  (n FOR status IN (st_o AS `O`, st_f AS `F`, st_p AS `P`))
        |ORDER BY priority, status""".stripMargin)
  }

  /** Recursive CTE through `spark.sql` — Spark 4's `WITH RECURSIVE`
    * (`UnionLoopExec`), exercised on the same synthetic part hierarchy
    * as [[GraphQueries.graphHierarchyFlatten]]: each part climbs
    * parent = p_partkey DIV 4 (roots: p_partkey < 4) one hop per
    * recursion step, emitting (root, depth) at the fixpoint. THREE
    * independent constructions must now agree on this relation: the
    * doubling loop (O(log depth) joins), this linear recursion
    * (statement-level, engine-managed), and DuckDB's recursive CTE
    * oracle — the differential spec pins engine-vs-engine, the oracle
    * engine-vs-DuckDB.
    *
    * Scale posture: each recursion step is one codegen'd projection +
    * filter over the frontier (rows strictly shrink as parts reach
    * their root); the engine's loop framework handles the iteration —
    * but depth is O(log₄ maxkey) STEPS vs the doubling loop's
    * O(log log) joins, which is why the DataFrame operator remains the
    * production form and this is the SQL-surface parity check. */
  def sqlRecursiveCte(s: SparkSession, d: String): DataFrame = {
    // The engine's runaway-recursion guard defaults to 1M rows TOTAL
    // across the loop — the sf1 part table alone (2M anchors × ~10
    // climb steps) legitimately exceeds it (measured:
    // RECURSION_ROW_LIMIT_EXCEEDED at sf1). The walk is provably
    // terminating (cur strictly shrinks by ÷4 until < 4), so size the
    // guard to data like any production recursive job would — but
    // SCOPED. Round 9 (r8 verdict #3): r8 scoped it by set/finally-
    // restore around an EAGER materialization (the conf is read at
    // execution time, so the execution had to land inside the raised
    // window) — that doubled the warm time (0.54 → 1.18 s), because a
    // lazy plan lets the consumer optimize across the boundary (an
    // aggregate consumer drops the global sort via EliminateSorts; the
    // eager form paid sort + cache write + re-read unconditionally).
    // The fix is a CLONED SESSION: newSession() shares the
    // SparkContext, catalog of nothing we use, and cached data, but
    // owns an independent SQLConf — the raise lives permanently in the
    // clone that executes only this recursion (lazily, whenever the
    // consumer acts), and the caller's session keeps the 1M runaway
    // backstop without any restore choreography. 50M ≈ 2× sf1's
    // legitimate need: a diverging recursion still dies ~50× sooner
    // than memory pressure would notice.
    val s2 = s.newSession()
    s2.conf.set("spark.sql.cteRecursionRowLimit", (50L * 1000 * 1000).toString)
    // the engine-managed loop is the same driver-bound tiny-statement
    // regime as the hand-rolled fixpoints, so it gets the same exec
    // discipline as [[GraphQueries.withLoopExec]] — AQE off (per-
    // iteration query-stage materialization dominates ~10 row-trivial
    // statements) and state-sized shuffle width (the formula's floor:
    // max(4, stateRows/2M) = 4 for the ≤2M-anchor walk at every tested
    // sf) — measured 1.22 → 0.88 s at sf0.1. On the clone these are
    // permanent-by-construction, no restore choreography.
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    // temp view registers in the CLONE's catalog — invisible to, and
    // un-clobberable by, the caller's session
    Tables.part(s2, d).createOrReplaceTempView("graft_part_rc")
    s2.sql(
      """WITH RECURSIVE walk(k, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM graft_part_rc
        |  UNION ALL
        |  SELECT k, cur DIV 4, depth + 1 FROM walk WHERE cur >= 4
        |)
        |SELECT k AS p_partkey, cur AS root, depth
        |FROM walk WHERE cur < 4
        |ORDER BY p_partkey""".stripMargin)
  }

  def windowNtilePercent(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** RANGE frame: rolling 30-day order count/sum per customer over an
    * integer day offset (range frames need a numeric order key in both
    * engines). */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate"), lit("1992-01-01").cast(DateType)).as("day"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    base
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        count(lit(1)).over(w).as("n_30d"),
        sum("price").over(w).cast(DoubleType).as("sum_30d"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** Pivot order status → columns of counts per priority. */
  def pivotStatusCounts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority")

  /** Array-function battery over the real float vectors: size, min/max,
    * smallest-3 elements, negative-element existence. Floats widened to
    * double BEFORE any comparison output (float32 repr drift otherwise).
    * The smallest-3 emit as three scalar columns — verify outputs must
    * not contain list columns (the driver's pandas row-sort cannot
    * handle array cells; round-1 driver gate crashed on them). */
  def arrayOpsPack(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        // sort ONCE into an intermediate column; indexing it three times
        // would otherwise re-sort per reference (no CSE across aliases)
        array_sort(col("embedding")).as("sorted_emb"))
      .select(
        col("vec_id"),
        size(col("embedding")).as("n"),
        array_min(col("embedding")).cast(DoubleType).as("mn"),
        array_max(col("embedding")).cast(DoubleType).as("mx"),
        get(col("sorted_emb"), lit(0)).cast(DoubleType).as("sm1"),
        get(col("sorted_emb"), lit(1)).cast(DoubleType).as("sm2"),
        get(col("sorted_emb"), lit(2)).cast(DoubleType).as("sm3"),
        exists(col("embedding"), _ < 0f).as("has_neg"))
      .orderBy("vec_id")

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `percentile_cont`: same linear-interpolation formula over
    * the sorted set — deterministic, unlike approx sketches). */
  def percentileMedian(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .orderBy("l_returnflag")

  /** Typed JSON extraction from the events props column. */
  def jsonExtractTyped(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(floor(col("k") / 10).cast(IntegerType).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("k_bucket")

  /** MALFORMED-INPUT TOLERANT JSON ingest — PERMISSIVE `from_json`: a
    * corrupt document yields NULL instead of killing the task (the
    * default mode a 100 TB ingest must run in — one bad crawl record
    * cannot cost a stage). Corruption is deterministic (every 7th
    * event's props gets trailing garbage) so both engines face the
    * same bytes; the rollup is the ingest-health report. The oracle
    * states the semantics independently via `json_valid`, which agrees
    * with PERMISSIVE parsing exactly on this shape (whole-document
    * validity; every valid props carries k).
    *
    * Scale posture: pure projection + tiny rollup; tolerant parsing is
    * a per-row property with no plan cost. */
  def jsonCorruptTolerant(s: SparkSession, d: String): DataFrame = {
    // corruption must break the JSON PREFIX: Jackson (Spark) stops at
    // the first complete value and IGNORES trailing bytes, so appended
    // garbage still parses — prepended garbage fails in both engines
    val dirty = when(col("event_id") % 7 === 0,
      concat(lit("garbage"), col("props"))).otherwise(col("props"))
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(dirty, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).as("j"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("j.k")).as("n_valid"))
      .orderBy("event_type")
  }

  /** Salted two-phase aggregation — the skew pattern, verifiable: phase
    * 1 groups by (key, salt) so a hot key spreads over 8 reducers;
    * phase 2 merges the 8 partials per key. Same result as a direct
    * groupBy (the oracle), different shuffle shape. Salt is
    * deterministic (hash of a row-identifying column, not rand()) so
    * the query stays replayable. */
  def aggSaltedTwophase(s: SparkSession, d: String): DataFrame = {
    val salted = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)).as("q"),
        pmod(col("l_orderkey"), lit(8)).as("salt"))
      .groupBy("l_returnflag", "salt")
      .agg(sum("q").as("partial_sum"), count(lit(1)).as("partial_n"))
    salted.groupBy("l_returnflag")
      .agg(sum("partial_sum").cast(DoubleType).as("sum_qty"),
        sum("partial_n").as("n"))
      .orderBy("l_returnflag")
  }

  /** Regex scalar battery: extract, match flag, split count, replace. */
  def scalarRegexPack(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").rlike("[0-9]{3}").as("has3digits"),
        size(split(col("c_name"), "#")).as("n_parts"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("devoweled"))
      .orderBy("c_custkey")

  /** SQL text front end with the engine's registered native function
    * (`cpf_clean` callable from spark.sql — GraftFunctions SQL surface). */
  def sqlCustomFunction(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_v")
    s.sql("""SELECT c_custkey, cpf_clean(c_name) AS digits_only
            |FROM graft_customer_v ORDER BY c_custkey""".stripMargin)
  }

  /** SQL surface #3 — the NATIVE VECTOR expressions called from SQL
    * text: `vec_dot`/`vec_norm_sq` are codegen'd Catalyst expressions
    * ([[graft.functions.VectorExprs]]) registered by
    * [[graft.functions.GraftFunctions]]; a SQL-only user gets the same
    * fused float32-widening dot product the DataFrame API uses. The
    * query ALSO pins the library identity vec_dot(x,x) = vec_norm_sq(x)
    * bit-for-bit (same fold, same widening — a regression in either
    * expression breaks the equality before it breaks an oracle).
    *
    * Scale posture: pure codegen'd projection over the embedding scan —
    * no shuffle before the presentation sort. */
  def sqlVectorFunctions(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d).createOrReplaceTempView("graft_emb_v")
    s.sql("""SELECT vec_id,
            |  CAST(vec_dot(embedding, embedding) AS DOUBLE) AS nsq_dot,
            |  CAST(vec_norm_sq(embedding) AS DOUBLE) AS nsq_norm,
            |  vec_dot(embedding, embedding) = vec_norm_sq(embedding)
            |    AS identity_holds
            |FROM graft_emb_v ORDER BY vec_id""".stripMargin)
  }

  /** SQL surface #2 — correlated and uncorrelated subqueries, the
    * query shapes a SQL-only reference user writes instead of joins:
    * a scalar subquery (global benchmark value) and a correlated
    * EXISTS. Catalyst decorrelates both into joins (the scalar one
    * broadcasts a single-row aggregate; EXISTS becomes a semi-join) —
    * no per-row re-execution at any scale. */
  def sqlSubqueries(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_v2")
    // the mean as exact-sum / count with an explicit double division:
    // avg(DECIMAL) result types differ across engines (Spark keeps a
    // widened decimal, DuckDB goes to double) — identical-operand IEEE
    // division is the portable form
    s.sql("""SELECT c_custkey, c_acctbal,
            |  c_acctbal - (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) /
            |                      CAST(COUNT(*) AS DOUBLE) FROM graft_customer_v2) AS dev_from_avg
            |FROM graft_customer_v2 c
            |WHERE EXISTS (SELECT 1 FROM graft_orders_v o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
            |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated LATERAL top-k through `spark.sql` — the SQL-surface
    * form of "top-N per group" (Catalyst decorrelates the correlated
    * LIMIT subquery into a ranked join; DuckDB runs the same text
    * natively). The per-group LIMIT keeps the intermediate bounded at
    * k·|nation| rows regardless of customer cardinality. */
  def sqlLateralTopk(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("graft_nation_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_v3")
    s.sql("""SELECT n.n_nationkey, c.c_custkey, c.c_acctbal
            |FROM graft_nation_v n, LATERAL (
            |  SELECT c_custkey, c_acctbal FROM graft_customer_v3
            |  WHERE c_nationkey = n.n_nationkey
            |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
            |ORDER BY n_nationkey, c_acctbal DESC, c_custkey""".stripMargin)
  }

  /** Interval arithmetic: day/month offsets and a next-month-start
    * derived date, emitted as strings (cross-engine date repr). */
  def scalarIntervalPack(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_format(date_add(col("o_orderdate").cast(DateType), 30), "yyyy-MM-dd")
          .as("plus_30d"),
        date_format(add_months(col("o_orderdate").cast(DateType), 3), "yyyy-MM-dd")
          .as("plus_3mo"),
        date_format(trunc(add_months(col("o_orderdate").cast(DateType), 1), "month"),
          "yyyy-MM-dd").as("next_month_start"),
        last_day(col("o_orderdate").cast(DateType)).cast(StringType).as("month_end"))
      .orderBy("o_orderkey")

  /** first/last/nth window values over a running frame per customer. */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("latest_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Centered 7-row moving average per customer (sliding rows frame),
    * decimal-exact then widened for output. */
  def windowMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey").rowsBetween(-3, 3)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        // exact decimal sum widened to double BEFORE the division:
        // decimal/long division semantics differ across engines in the
        // last ulp; double/long is one IEEE op, identical everywhere
        (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DoubleType) /
          count(lit(1)).over(w)).as("mavg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Fixed-width histogram — the profiling aggregate behind data-quality
    * dashboards: equi-width buckets from pure arithmetic (floor of an
    * IEEE division, identical in any engine — no width_bucket builtin
    * dependency), counts + per-bucket decimal-exact min/max. One
    * partial-aggregated shuffle on the bucket id at any scale. */
  def aggHistogramBuckets(s: SparkSession, d: String): DataFrame = {
    val bucket = floor(col("o_totalprice") / lit(60000.0)).cast(LongType)
    Tables.orders(s, d)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        // min/max in exact decimal, FINAL cast to double (pandas-compare rule)
        min(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("lo"),
        max(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("hi"))
      .orderBy("bucket")
  }

  /** Statistical moments (mean/variance/covariance/correlation) from
    * EXACT decimal sums. Built-in corr/covar/stddev are streaming
    * (Welford-style) and NOT bit-stable across engines or partition
    * orders — the portable form accumulates Σx, Σy, Σxx, Σyy, Σxy as
    * exact decimals (order-insensitive), then computes the moments in
    * double from identical operands. Same single-shuffle partial-agg
    * plan as any groupBy at 100 TB. */
  def aggStatsMoments(s: SparkSession, d: String): DataFrame = {
    val xd = col("l_quantity").cast(DecimalType(18, 2))
    val yd = col("l_extendedprice").cast(DecimalType(18, 2))
    val n = count(lit(1)).cast(DoubleType)
    val sx = sum(xd).cast(DoubleType)
    val sy = sum(yd).cast(DoubleType)
    val sxx = sum(xd * xd).cast(DoubleType)
    val syy = sum(yd * yd).cast(DoubleType)
    val sxy = sum(xd * yd).cast(DoubleType)
    val varX = (sxx - sx * sx / n) / (n - lit(1.0))
    val varY = (syy - sy * sy / n) / (n - lit(1.0))
    val covar = (sxy - sx * sy / n) / (n - lit(1.0))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        // final doubles ROUNDED to 9 (round 9): the operands are exact
        // decimal sums, but the divide/sqrt tails drifted 1 ulp vs
        // DuckDB at sf1 (corr_qp, 17th significant digit) — the suite's
        // standard rounding granularity absorbs engine fp-contraction
        // differences the exact-sum recipe can't reach
        round(sx / n, 9).as("mean_qty"),
        round(varX, 9).as("var_qty"),
        round(covar, 9).as("covar_qp"),
        round(covar / sqrt(varX * varY), 9).as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** Time-series GAP FILL + forward fill — the densification step every
    * metrics/feature pipeline runs before resampling: per user, generate
    * the full day spine between that user's first and last active day
    * (`sequence` + explode), left-join the observed daily counts, and
    * carry the last observation forward through the gaps
    * (`last(ignoreNulls)` over a running frame).
    *
    * Scale posture: the spine explode fans out only (hi − lo) rows per
    * key — no cross join against a global calendar dimension; the
    * forward fill shares the ONE hash shuffle on user_id with the
    * spine aggregation (subset rule), and the left join is on the same
    * key prefix. First spine day is always observed, so n_filled is
    * total (no leading nulls to backfill). */
  def windowGapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      dayofmonth(col("ts")).cast(LongType).as("day"))
    val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("n").isNotNull.as("observed"),
        last(col("n"), ignoreNulls = true).over(w).as("n_filled"))
      .orderBy("user_id", "day")
  }

  /** Staged conversion FUNNEL — ordered event-sequence analytics: per
    * user, the first view, the first click strictly AFTER that view,
    * and the first purchase strictly after that click; depth = how far
    * the user got. The stage dependency is inherently sequential (a
    * click before the first view must not count), so each stage is a
    * min-aggregate over events gated by the previous stage's time.
    *
    * Posture: all three stage aggregations and both assembly joins key
    * on user_id, so the ONE hash exchange is reused end-to-end (subset
    * rule) — stage count does not multiply shuffles. Timestamps are
    * second-truncated on both engines before comparison: events.ts is
    * ns-precision parquet that Spark reads µs-truncated, and a raw
    * `t > t1` at the ns margin would diverge from DuckDB. */
  def windowFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      date_trunc("second", col("ts")).as("t"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("t")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("t") > col("t1"))
      .groupBy("user_id").agg(min(col("t")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("t") > col("t2"))
      .groupBy("user_id").agg(min(col("t")).as("t3"))
    v.join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + coalesce(col("s2"), lit(0)) + coalesce(col("s3"), lit(0)))
          .as("depth"),
        date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("first_view"))
      .orderBy("user_id")
  }

  /** MAP-typed column pack — the one standard DataFrame column kind the
    * registry didn't touch until round 6: builds per-row maps with
    * `create_map`, merges them with `map_concat`, drops a key with
    * `map_filter` (higher-order lambda), reads with `map_keys`/
    * `map_values`/`element_at`, and flattens with `explode` — ending on
    * all-scalar columns so the result stays hashable by the driver's
    * row-sort compare (maps/dicts are not pandas-sortable). The DuckDB
    * oracle states the same semantics constructively (the static-key
    * maps flatten to a UNION ALL) rather than via DuckDB's own MAP
    * runtime, so it is an independent statement of the expected rows.
    *
    * Scale posture: per-row map construction is pure projection work on
    * the scan (no shuffle); the explode doubles row count (bounded by
    * the fixed key set, not data); the only exchanges are the broadcast
    * nation join and the final sort. map_filter is an interpreted
    * higher-order function — fine here because its operands are cheap
    * literals/attributes, per the round-1 lambda lesson. */
  def mapOpsPack(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val base = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    val m1 = map(
      lit("segment"), col("c_mktsegment"),
      lit("acct"), when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg")))
    val m2 = map(lit("nation"), col("n_name"))
    val mm = map_concat(m1, m2)
    val keep = map_filter(mm, (k, _) => k =!= "acct")
    base
      .select(
        col("c_custkey"),
        keep.as("m"),
        array_join(sort_array(map_keys(mm)), ",").as("all_keys"),
        size(map_values(mm)).as("n_vals"),
        element_at(mm, "nation").as("nation_direct"))
      .select(col("c_custkey"), explode(col("m")), col("all_keys"),
        col("n_vals"), col("nation_direct"))
      .orderBy("c_custkey", "key")
  }

  /** JSON → MAP ingestion — `from_json` to `MapType` over the events
    * `props` column (the reference's attribute-bag shape): where
    * [[jsonExtractTyped]] pins a STATIC struct schema, this parses the
    * DYNAMIC key set every map-typed user surface needs (feature bags,
    * labels, experiment flags), explodes the entries, and rolls up per
    * (event_type, key). The DuckDB oracle discovers keys the same
    * dynamic way via `unnest(json_keys(props))` + per-key extract.
    *
    * Scale posture: parse + explode are per-row scan work; fan-out is
    * bounded by keys-per-document (a schema property, not corpus size);
    * the rollup partial-aggregates to |event_type|×|keys| rows. */
  def jsonToMap(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
      .select(col("event_type"), explode(col("m")))
      .groupBy("event_type", "key")
      .agg(count(lit(1)).as("n"),
        sum("value").cast(LongType).as("sum_v"),
        countDistinct("value").as("n_vals"))
      .orderBy("event_type", "key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_recursive_cte"     -> sqlRecursiveCte _,
    "map_ops_pack"          -> mapOpsPack _,
    "json_to_map"           -> jsonToMap _,
    "window_funnel"         -> windowFunnel _,
    "window_gap_fill"       -> windowGapFill _,
    "sql_lateral_topk"      -> sqlLateralTopk _,
    "sql_subqueries"        -> sqlSubqueries _,
    "agg_stats_moments"     -> aggStatsMoments _,
    "agg_histogram_buckets" -> aggHistogramBuckets _,
    "window_moving_avg"    -> windowMovingAvg _,
    "scalar_interval_pack" -> scalarIntervalPack _,
    "window_first_last"    -> windowFirstLast _,
    "sql_custom_function"  -> sqlCustomFunction _,
    "sql_vector_functions" -> sqlVectorFunctions _,
    "agg_salted_twophase"  -> aggSaltedTwophase _,
    "scalar_regex_pack"    -> scalarRegexPack _,
    "join_full_outer"      -> joinFullOuter _,
    "agg_cube"             -> aggCube _,
    "agg_grouping_sets"    -> aggGroupingSets _,
    "window_ntile_percent" -> windowNtilePercent _,
    "window_sessionize_batch" -> windowSessionizeBatch _,
    "time_session_window_native" -> timeSessionWindowNative _,
    "sql_pivot_unpivot" -> sqlPivotUnpivot _,
    "window_range_frame"   -> windowRangeFrame _,
    "pivot_status_counts"  -> pivotStatusCounts _,
    "array_ops_pack"       -> arrayOpsPack _,
    "percentile_median"    -> percentileMedian _,
    "json_extract_typed"   -> jsonExtractTyped _,
    "json_corrupt_tolerant" -> jsonCorruptTolerant _,
  )

  val oracle: Map[String, String] = Map(
    // statement-level parity: DuckDB's recursive CTE walks the same
    // parent chain one hop per step (// is DuckDB integer division)
    "sql_recursive_cte" ->
      """WITH RECURSIVE walk(k, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part
        |  UNION ALL
        |  SELECT k, cur // 4, depth + 1 FROM walk WHERE cur >= 4
        |)
        |SELECT k AS p_partkey, cur AS root, depth
        |FROM walk WHERE cur < 4
        |ORDER BY p_partkey""".stripMargin,
    "map_ops_pack" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment, n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |e AS (
        |  SELECT c_custkey, 'nation' AS key, n_name AS value, n_name
        |  FROM base
        |  UNION ALL
        |  SELECT c_custkey, 'segment', c_mktsegment, n_name FROM base)
        |SELECT c_custkey, key, value,
        |  'acct,nation,segment' AS all_keys, 3 AS n_vals,
        |  n_name AS nation_direct
        |FROM e ORDER BY c_custkey, key""".stripMargin,
    "json_to_map" ->
      """WITH kv AS (SELECT event_type, props,
        |    unnest(json_keys(props)) AS key
        |  FROM events)
        |SELECT event_type, key, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.' || key) AS INTEGER))
        |    AS BIGINT) AS sum_v,
        |  COUNT(DISTINCT CAST(json_extract(props, '$.' || key)
        |    AS INTEGER)) AS n_vals
        |FROM kv GROUP BY event_type, key
        |ORDER BY event_type, key""".stripMargin,
    "window_funnel" ->
      """WITH ev AS (SELECT user_id, date_trunc('second', ts) AS t, event_type
        |  FROM events),
        |v AS (SELECT user_id, MIN(t) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.t) AS t2 FROM ev e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.t > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.t) AS t3 FROM ev e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.t > c.t2 GROUP BY 1)
        |SELECT v.user_id,
        |  1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS depth,
        |  strftime(v.t1, '%Y-%m-%d %H:%M:%S') AS first_view
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "sql_lateral_topk" ->
      """SELECT n.n_nationkey, c.c_custkey, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_nationkey, c_acctbal DESC, c_custkey""".stripMargin,
    "window_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(day(ts) AS BIGINT) AS day FROM events),
        |daily AS (SELECT user_id, day, COUNT(*) AS n FROM ev GROUP BY 1, 2),
        |spine AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM (
        |  SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1)),
        |j AS (SELECT s.user_id, s.day, d.n FROM spine s
        |      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
        |SELECT user_id, day, n IS NOT NULL AS observed,
        |  last_value(n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
        |FROM j ORDER BY user_id, day""".stripMargin,
    "sql_subqueries" ->
      """SELECT c_custkey, c_acctbal,
        |  c_acctbal - (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) /
        |                      CAST(COUNT(*) AS DOUBLE) FROM customer) AS dev_from_avg
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "agg_stats_moments" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, cnt AS n,
        |  ROUND(sx / CAST(cnt AS DOUBLE), 9) AS mean_qty,
        |  ROUND((sxx - sx * sx / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0), 9) AS var_qty,
        |  ROUND((sxy - sx * sy / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0), 9) AS covar_qp,
        |  ROUND(((sxy - sx * sy / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)) /
        |    sqrt(((sxx - sx * sx / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)) *
        |         ((syy - sy * sy / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0))), 9) AS corr_qp
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "agg_histogram_buckets" ->
      """SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "window_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) /
        |       COUNT(*) OVER w AS mavg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "scalar_interval_pack" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
        |  strftime(date_trunc('month', CAST(o_orderdate AS DATE)) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS latest_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "sql_vector_functions" ->
      s"""SELECT vec_id,
         |  FOLD AS nsq_dot,
         |  FOLD AS nsq_norm,
         |  TRUE AS identity_holds
         |FROM embeddings ORDER BY vec_id""".stripMargin
        .replace("FOLD", "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), (s, x) -> s + x)"),
    "sql_custom_function" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits_only
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "agg_salted_twophase" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scalar_regex_pack" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_matches(c_name, '[0-9]{3}') AS has3digits,
        |  CAST(len(string_split_regex(c_name, '#')) AS INTEGER) AS n_parts,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  COALESCE(o_orderkey, -1) AS orderkey,
        |  CASE WHEN c_custkey IS NULL THEN 'order_only'
        |       WHEN o_orderkey IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        |ORDER BY custkey, orderkey""".stripMargin,
    "agg_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "time_session_window_native" ->
      """WITH e AS (SELECT user_id, event_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "sql_pivot_unpivot" ->
      """WITH pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
        |st AS (SELECT unnest(['F', 'O', 'P']) AS status),
        |cnt AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT pr.priority, st.status,
        |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
        |FROM pr CROSS JOIN st
        |LEFT JOIN cnt ON cnt.priority = pr.priority AND cnt.status = st.status
        |ORDER BY pr.priority, st.status""".stripMargin,
    "window_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
        |  COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_idx""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin,
    "window_ntile_percent" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, day,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_30d,
        |  CAST(SUM(price) OVER w AS DOUBLE) AS sum_30d
        |FROM (SELECT o_custkey, o_orderkey,
        |        datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "pivot_status_counts" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "array_ops_pack" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n,
        |  CAST(list_min(embedding) AS DOUBLE) AS mn,
        |  CAST(list_max(embedding) AS DOUBLE) AS mx,
        |  CAST(sorted_emb[1] AS DOUBLE) AS sm1,
        |  CAST(sorted_emb[2] AS DOUBLE) AS sm2,
        |  CAST(sorted_emb[3] AS DOUBLE) AS sm3,
        |  len(list_filter(embedding, x -> x < 0)) > 0 AS has_neg
        |FROM (SELECT *, list_sort(embedding) AS sorted_emb FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "percentile_median" ->
      """SELECT l_returnflag,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "json_corrupt_tolerant" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN 'garbage' || props
        |      ELSE props END AS p
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  COUNT(CASE WHEN json_valid(p) THEN 1 END) AS n_valid
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_extract_typed" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket,
        |  COUNT(*) AS n,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_min,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
        |FROM events
        |GROUP BY 1 ORDER BY k_bucket""".stripMargin,
  )
}
