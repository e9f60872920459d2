package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-phase DISTRIBUTED replacements for unpartitioned analytic windows
  * (global NTILE / ROW_NUMBER / running SUM over a corpus-scaling input).
  *
  * A `Window.orderBy(...)` with no `partitionBy` plans as a SINGLE-TASK
  * sort — fine over a calendar/value-bounded rollup (the policy in
  * [[AggWindowQueries]]), fatal over anything that grows with the corpus
  * (all customers, all parts, the whole vocabulary). This helper is the
  * scale path the r9 verdict prescribed for those sites: the classic
  * two-phase global ranking every distributed engine uses —
  *
  *  1. `repartitionByRange` on the total order (so partition i holds
  *     exactly the rows ranked before partition i+1's),
  *  2. a PARTITIONED window per range-partition for the local
  *     rank / running sum (parallel across all partitions),
  *  3. a per-partition COUNT/SUM rollup — at most
  *     `spark.sql.shuffle.partitions` rows, a config constant, not a
  *     corpus dimension — cumulated into exclusive prefix offsets and
  *     broadcast-joined back on the partition index.
  *
  * The only unpartitioned window left is step 3's prefix scan over
  * ≤ numPartitions rows — bounded by configuration at any corpus size.
  *
  * Correctness subtlety: steps 2 and 3 both read the range-shuffled
  * frame, and `spark_partition_id()` is only meaningful if both branches
  * see the SAME partitioning. We therefore pin the parted frame through
  * [[PipelineCache]] (computed once, both branches read the cache) —
  * which also keeps chained calls (RFM's three rankings) from
  * re-evaluating the whole upstream plan once per branch. Callers supply
  * a cache key unique to the call site; Verify/Bench release the pool at
  * each query boundary.
  *
  * Results are exact and partitioning-independent: ranks depend only on
  * the total order (callers always pass a unique tie-breaker key), so
  * output hashes are identical to the single-partition window form —
  * verified by the unchanged sf0.01 + sf1 oracle hashes of every
  * rewritten query.
  */
object DistRank {

  private def numParts(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Range-partition on the total order and pin (partition-id tagged).
    *
    * The pin is LAZY (round 11): the eager count() variant cost one
    * whole serial job per ranking — a query chaining or branching
    * several rankings paid them back-to-back. Lazy is safe HERE
    * because (a) the offsets() side is consumed through broadcast(),
    * and a broadcast subtree materializes before its probe stage, so
    * the first consumer populates the cache for the rest; and (b) a
    * worst-case race recomputes a DETERMINISTIC frame — range
    * boundaries come from seeded sampling of the same input, so
    * __pid values are identical on every compute (correctness never
    * depended on which scan won). See getOrPersistLazy's contract. */
  private def ranged(df: DataFrame, key: String, order: Seq[Column]): DataFrame =
    PipelineCache.getOrPersistLazy(s"distrank:$key") {
      df.repartitionByRange(numParts(df), order: _*)
        .withColumn("__pid", spark_partition_id().cast(LongType))
    }

  /** Exclusive prefix offsets per range partition: `__off` = rows (or
    * `sumCol` mass) in all earlier partitions, `__tot` = grand total.
    * ≤ numPartitions input rows — the one place an unpartitioned window
    * is legitimate. */
  private def offsets(parted: DataFrame, mass: Column): DataFrame = {
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    parted.groupBy(col("__pid")).agg(sum(mass).as("__mass"))
      .select(col("__pid"),
        (sum(col("__mass")).over(wCum) - col("__mass")).as("__off"),
        sum(col("__mass")).over(wAll).as("__tot"))
  }

  /** Exact global ROW_NUMBER over `order` (must be a total order — pass a
    * unique tie-breaker) plus the grand total, as columns `rnOut`/`totOut`
    * (both LONG). */
  private def withRowNumber(df: DataFrame, key: String, rnOut: String,
      totOut: String, order: Seq[Column]): DataFrame = {
    val parted = ranged(df, key, order)
    val local = parted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*))
        .cast(LongType))
    local.join(broadcast(offsets(parted, lit(1L))), Seq("__pid"))
      .withColumn(rnOut, col("__off") + col("__lrn"))
      .withColumnRenamed("__tot", totOut)
      .drop("__pid", "__lrn", "__off")
  }

  /** Exact global ROW_NUMBER (LONG, 1-based) as column `out`. */
  def rowNumber(df: DataFrame, key: String, out: String, order: Column*): DataFrame =
    withRowNumber(df, key, out, "__tot_drop", order).drop("__tot_drop")

  /** Exact SQL NTILE(k) over the total order `order`, as LONG column
    * `out`. Standard NTILE semantics (both Spark and DuckDB): with n rows,
    * base = n DIV k and rem = n % k, the first rem buckets take base+1
    * rows. Derived arithmetically from the two-phase row number — no
    * global sort. */
  def ntile(df: DataFrame, k: Int, key: String, out: String, order: Column*): DataFrame = {
    val rn = withRowNumber(df, key, "__rn", "__n", order)
    // CASE arms guard the DIV-by-zero when n < k (base = 0): every row
    // then satisfies __rn <= rem*(base+1) = n, so the ELSE never runs.
    rn.withColumn(out,
        expr(s"""CASE WHEN __rn <= (__n % $k) * (__n DIV $k + 1)
                 THEN (__rn - 1) DIV (__n DIV $k + 1) + 1
                 ELSE (__n % $k) + (__rn - (__n % $k) * (__n DIV $k + 1) - 1)
                      DIV (__n DIV $k) + 1 END""").cast(LongType))
      .drop("__rn", "__n")
  }

  /** Exact global RUNNING SUM of column `value` over the total order
    * `order` (rows unbounded-preceding .. current), as column `out` —
    * the two-phase cumulative sum: local running sum within each range
    * partition plus the broadcast exclusive prefix of earlier
    * partitions' totals. Output type = SUM(value)'s type. */
  def runningSum(df: DataFrame, value: String, key: String, out: String,
      order: Column*): DataFrame = {
    val parted = ranged(df, key, order)
    val local = parted.withColumn("__lcum",
      sum(col(value)).over(Window.partitionBy(col("__pid")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    local.join(broadcast(offsets(parted, col(value))), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lcum"))
      .drop("__pid", "__lcum", "__off", "__tot")
  }
}
