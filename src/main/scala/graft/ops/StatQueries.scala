package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical / CDC operators round 4: snapshot diffing, per-group
  * linear regression, robust (MAD) outlier detection, and linear
  * time-series interpolation. All follow the determinism recipe: exact
  * DECIMAL accumulation (order-insensitive) with doubles only in final
  * per-row arithmetic that both engines evaluate with the identical
  * IEEE expression tree.
  */
object StatQueries {

  /** Snapshot DIFF — the change-data-capture primitive the reference's
    * nightly full-reload pattern (`etl_process.py` truncate-and-insert)
    * is a degenerate case of: given yesterday's and today's snapshot of
    * a keyed table, classify every key as added / deleted / changed.
    * The two snapshots are deterministic derivations of `orders` (drop
    * keys ≡0 mod 10 from "old", ≡0 mod 7 from "new", bump price on keys
    * ≡0 mod 3) so the oracle sees the same inputs.
    *
    * Scale posture: ONE full-outer shuffle join on the snapshot key —
    * the minimal plan for a diff; the unchanged majority is filtered
    * post-join by an exact DECIMAL compare (no row hashing needed when
    * the payload is narrow; a wide table would xxhash the payload into
    * one compare column first, same join shape). */
  def etlSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice").cast(DecimalType(18, 2))
    val base = Tables.orders(s, d)
    val old = base.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("k_old"), col("o_orderstatus").as("st_old"),
        price.as("pr_old"))
    val nw = base.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k_new"), col("o_orderstatus").as("st_new"),
        (price + when(col("o_orderkey") % 3 === 0, lit(BigDecimal("1.00")))
          .otherwise(lit(BigDecimal("0.00")))).as("pr_new"))
    old.join(nw, col("k_old") === col("k_new"), "full_outer")
      .withColumn("change",
        when(col("k_old").isNull, lit("added"))
          .when(col("k_new").isNull, lit("deleted"))
          .when(col("pr_old") =!= col("pr_new") ||
            col("st_old") =!= col("st_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(coalesce(col("k_old"), col("k_new")).as("o_orderkey"), col("change"))
      .orderBy("o_orderkey")
  }

  /** Per-group LINEAR REGRESSION (the `regr_slope`/`regr_intercept`/
    * `regr_r2` surface) of extendedprice on discount, per
    * (returnflag, linestatus). The built-ins stream Welford-style and
    * are NOT bit-stable across engines/partition orders, so the
    * portable form accumulates Σx, Σy, Σxx, Σyy, Σxy as exact decimals
    * (one partial-aggregated shuffle, same plan the built-ins compile
    * to) and derives the closed-form coefficients in double from
    * identical operands — same recipe as `agg_stats_moments`. */
  def aggRegressionPack(s: SparkSession, d: String): DataFrame = {
    val xd = col("l_discount").cast(DecimalType(18, 2))
    val yd = col("l_extendedprice").cast(DecimalType(18, 2))
    val n = count(lit(1)).cast(DoubleType)
    val sx = sum(xd).cast(DoubleType)
    val sy = sum(yd).cast(DoubleType)
    val sxx = sum(xd * xd).cast(DoubleType)
    val syy = sum(yd * yd).cast(DoubleType)
    val sxy = sum(xd * yd).cast(DoubleType)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), slope.as("slope"), icept.as("intercept"),
        r2.as("r2"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Robust outlier detection per group — MEDIAN + MAD (median absolute
    * deviation), the quality-filter form that survives the heavy-tailed
    * distributions mean±3σ chokes on. Both medians are the LOWER
    * median (element at rank ⌈n/2⌉ of the sorted group) — an actual
    * member of the multiset, so no interpolation arithmetic exists to
    * drift between engines; values are exact DECIMAL(18,2) throughout.
    * An outlier is |x − med| > 3·mad (exact decimal compare).
    *
    * Scale posture: two ranking windows + the final rollup all key on
    * the same group column, so the ONE hash exchange is reused end to
    * end (subset rule); rank-within-group is a sort within partitions,
    * not a global sort. */
  def aggMadOutliers(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val base = Tables.orders(s, d)
      .select(col("o_orderstatus").as("g"), col("o_orderkey").as("k"), x.as("x"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy(col(v), col("k"))
      val wc = Window.partitionBy("g")
      df.select(col("g"), col(v),
          row_number().over(w).as("r"), count(lit(1)).over(wc).as("n"))
        .filter(col("r") * 2 <= col("n") + 1)
        .groupBy("g").agg(max(col(v)).as(out))
    }
    val med = lowerMedian(base, "x", "med")
    val dev = base.join(med, "g")
      .select(col("g"), col("k"), col("x"), col("med"),
        abs(col("x") - col("med")).as("ad"))
    val mad = lowerMedian(dev.select(col("g"), col("k"), col("ad")), "ad", "mad")
    dev.join(mad, "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        max(col("med")).cast(DoubleType).as("med"),
        max(col("mad")).cast(DoubleType).as("mad"),
        count(when(col("ad") > col("mad") * 3, 1)).as("n_outliers"))
      .select(col("g").as("o_orderstatus"), col("n"), col("med"), col("mad"),
        col("n_outliers"))
      .orderBy("o_orderstatus")
  }

  /** Linear INTERPOLATION over time-series gaps — the numeric upgrade
    * of `window_gap_fill`'s forward fill: per user, the daily value sum
    * on the observed-day spine, with missing days filled by linear
    * interpolation between the surrounding observations
    * (v = v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀), evaluated with the identical
    * IEEE double tree in both engines; the daily sums themselves are
    * exact decimals). First/last spine days are observed by
    * construction, so both neighbors always exist.
    *
    * Scale posture: same single-exchange shape as gap_fill — the spine
    * explode, the observation join, and all four neighbor windows key
    * on user_id, so one hash shuffle serves the whole query. */
  def windowInterpolateLinear(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      dayofmonth(col("ts")).cast(LongType).as("day"),
      col("value").cast(DecimalType(18, 6)).as("v"))
    val daily = ev.groupBy("user_id", "day")
      .agg(sum(col("v")).cast(DoubleType).as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val back = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("v").isNotNull, col("day"))
    val joined = spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(back).as("pv"),
        last(obsDay, ignoreNulls = true).over(back).as("pd"),
        first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
    joined.select(col("user_id"), col("day"), col("v").isNotNull.as("observed"),
        when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + (col("nv") - col("pv")) *
            ((col("day") - col("pd")).cast(DoubleType) /
             (col("nd") - col("pd")).cast(DoubleType))).as("v_interp"))
      .orderBy("user_id", "day")
  }

  /** Generic DATA-QUALITY PROFILE — the "profile before load" audit the
    * reference's manual sheet-preview (`importador.py`) approximates by
    * eyeball: per column, row count, null count, exact distinct count,
    * and min/max. The table is melted to (column, value-as-string)
    * rows with `stack`, so ONE generic aggregation profiles any width —
    * the shape a profiler needs when schemas drift. Doubles go through
    * DECIMAL(18,2) before stringification (raw double→string formatting
    * is engine-specific); min/max are therefore lexicographic on the
    * string form — documented profiler semantics, identical everywhere.
    *
    * Scale posture: the melt fans W columns per row, then partial
    * aggregation collapses to (column, value) before the one shuffle;
    * count_distinct adds Spark's standard two-phase expand. A 100 TB
    * profile would swap exact distinct for HLL partials — same melt. */
  def etlDqProfile(s: SparkSession, d: String): DataFrame = {
    val melted = Tables.orders(s, d).select(
      expr("""stack(5,
        'o_orderkey',      cast(o_orderkey as string),
        'o_custkey',       cast(o_custkey as string),
        'o_orderstatus',   o_orderstatus,
        'o_orderpriority', o_orderpriority,
        'o_totalprice',    cast(cast(o_totalprice as decimal(18,2)) as string)
      ) as (col_name, val)"""))
    melted.groupBy("col_name")
      .agg(count(lit(1)).as("n"),
        count(when(col("val").isNull, 1)).as("n_null"),
        count_distinct(col("val")).as("n_distinct"),
        min(col("val")).as("vmin"), max(col("val")).as("vmax"))
      .orderBy("col_name")
  }

  /** Referential-integrity ORPHAN audit — the join-validate step the
    * reference runs row-by-row (`etl_process.py`'s per-row FK lookups),
    * as three set-level anti-joins: orders→customer, lineitem→orders,
    * lineitem→part. Anti-join against a broadcast key projection reads
    * each fact table once; output is one row per relation with total
    * and orphan counts (0 orphans = the fixture's integrity holds —
    * the query's value is the plan, exercised by the reject-channel
    * tests with synthetic orphans). */
  def etlFkOrphanCheck(s: SparkSession, d: String): DataFrame = {
    def audit(rel: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String): DataFrame = {
      val orphans = fact.select(col(fk))
        .join(broadcast(dim.select(col(pk))), col(fk) === col(pk), "left_anti")
      fact.select(count(lit(1)).as("n_rows")).crossJoin(
        orphans.select(count(lit(1)).as("n_orphans")))
        .select(lit(rel).as("relation"), col("n_rows"), col("n_orphans"))
    }
    audit("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
      .unionAll(audit("lineitem->part", Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .unionAll(audit("orders->customer", Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .orderBy("relation")
  }

  /** Rolling z-score ANOMALY detection — per user, each event's value
    * against the mean/stddev of its previous-5-event window (the
    * trailing frame excludes the current row: self-inclusion dampens
    * the very outliers being hunted). Moments come from exact DECIMAL
    * frame sums — window aggregation order differs across engines
    * (Spark folds the frame, DuckDB uses segment trees), which makes
    * double frame-sums diverge; decimal is order-free. Events are
    * sequenced per user by event_id (unique, so no tie ambiguity and
    * no ns-vs-µs timestamp hazard in the ORDER BY).
    *
    * Scale posture: one hash exchange on user_id + an in-partition
    * sort; the frame is O(1) per row. */
  def windowRollingAnomaly(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(-5, -1)
    val vd = col("value").cast(DecimalType(18, 6))
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value").as("v"), vd.as("vd"))
      .select(col("user_id"), col("event_id"), col("v"),
        count(col("vd")).over(w).as("n_w"),
        sum(col("vd")).over(w).cast(DoubleType).as("s_w"),
        sum(col("vd") * col("vd")).over(w).cast(DoubleType).as("ss_w"))
      .filter(col("n_w") === 5)
    val nD = col("n_w").cast(DoubleType)
    val mu = col("s_w") / nD
    val variance = (col("ss_w") - col("s_w") * col("s_w") / nD) / (nD - lit(1.0))
    base.select(col("user_id"), col("event_id"), col("v"),
        mu.as("mu"), sqrt(variance).as("sd"),
        (abs(col("v") - mu) > sqrt(variance) * 2).as("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** EWMA smoothing with half-life 1 over the trailing 8-event window —
    * the exponential counterpart of [[AdvancedQueries]]' flat moving
    * average (trend extraction that weights recency). Decay α = 1/2 is
    * chosen deliberately: the weights 2^{7−k} for lag k are INTEGERS,
    * so numerator (Σ 2^{7−k}·x_{i−k} in DECIMAL) and denominator
    * (Σ 2^{7−k} over present lags — truncation-normalized, so early
    * rows are a proper weighted mean of what exists) are both EXACT;
    * the only float op is one final division of identical operands —
    * bit-stable across engines with zero rounding slop. An arbitrary-α
    * EWMA needs pow(1−α, k), whose libm is not cross-engine stable —
    * the engineering reason half-life decay is the portable default.
    *
    * Scale posture: all 8 lags share ONE user_id exchange + sort (a
    * single Window physical operator); per-row work is O(window). The
    * unbounded-history EWMA (y_i = αx + (1−α)y_{i−1}) is inherently
    * sequential per key — the 8-term truncation (weight tail < 1/128)
    * is what makes it a frame computation a cluster can parallelize. */
  def windowEwmaHalflife(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val base = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("value").cast(DecimalType(18, 6)).as("vd"))
    val lags = (0 to 7).map(k => lag(col("vd"), k).over(w).as(s"l$k"))
    val zero = lit(BigDecimal(0)).cast(DecimalType(18, 6))
    val num = (0 to 7).map(k => coalesce(col(s"l$k") * lit(1 << (7 - k)), zero))
      .reduce(_ + _)
    val den = (0 to 7).map(k =>
        when(col(s"l$k").isNotNull, lit(1 << (7 - k))).otherwise(lit(0)))
      .reduce(_ + _)
    base.select(Seq(col("user_id"), col("event_id"), col("vd")) ++ lags: _*)
      .filter(col("vd").isNotNull) // den ≥ 128 whenever the current value exists
      .select(col("user_id"), col("event_id"),
        (num.cast(DoubleType) / den.cast(DoubleType)).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  private val CusumRef = "50.000000"   // reference level k (≈ global mean)
  private val CusumThreshold = "400.000000" // drift alarm h

  /** One-sided CUSUM drift detection per user — the sequential
    * change-point statistic (Page 1954): s_i = max(0, s_{i−1} + x_i − k)
    * alarms when a stream's level shifts above reference k faster than
    * single-point outlier rules notice. The recursion looks inherently
    * sequential, but the classic prefix transformation makes it a
    * WINDOW computation: with C_i = Σ_{j≤i}(x_j − k),
    * s_i = C_i − min(0, min_{j≤i} C_j) — one running sum + one running
    * min over the same (user, event order) window, so Spark evaluates
    * it with a single exchange + sort and the cluster parallelizes
    * across users while each user's math stays exact.
    *
    * All accumulation in DECIMAL(18,6): sums/mins of decimals are
    * order-insensitive and engine-exact; the only double is the final
    * display cast. Output: per user, peak CUSUM + where it peaked +
    * the drift flag (peak > h). */
  def windowCusumDrift(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val zero = lit(BigDecimal(0)).cast(DecimalType(18, 6))
    val cum = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (col("value").cast(DecimalType(18, 6)) -
          lit(BigDecimal(CusumRef)).cast(DecimalType(18, 6))).as("y"))
      .withColumn("c", sum("y").over(w))
    val wu = Window.partitionBy("user_id")
    cum
      .withColumn("s", col("c") - least(zero, min("c").over(w)))
      // peak row = highest s, earliest event on ties — a rank, not an
      // argmax aggregate, so the oracle states the identical rule
      .withColumn("rk", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("s").desc, col("event_id"))))
      .withColumn("n_events", count(lit(1)).over(wu))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n_events"),
        col("s").cast(DoubleType).as("peak_cusum"),
        col("event_id").as("peak_event_id"),
        (col("s") > lit(BigDecimal(CusumThreshold)).cast(DecimalType(18, 6)))
          .as("drifted"))
      .orderBy("user_id")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per event type —
    * the distribution-shift gate a pipeline runs between a reference
    * slice and a fresh slice before trusting new data. The two samples
    * here are the deterministic md5 halves of each event type (salt
    * "ks:", parity of fold32), so under no drift D_n should be small —
    * and being hash-halves of one population, it is: the column doubles
    * as a split-quality audit.
    *
    * D = max over the merged support of |F_a(x) − F_b(x)|: group by
    * (type, value) with per-half counts — ties collapse BEFORE the CDF
    * so both CDFs step at whole tie groups — then running sums over
    * the value order. The max is taken over the INTEGER cross-products
    * |ca·nb − cb·na| (max is invariant under the positive scaling
    * 1/(na·nb)), so every comparison is exact integer arithmetic and
    * the statistic itself is ONE final division — zero FP drift
    * anywhere, no rounding needed.
    *
    * Scale posture: one shuffle to (type, value) granularity, one
    * window over value within type (types are few — the same
    * skew-defense notes as `curation_domain_quota` apply if one type
    * dominates), one partial-aggregated max. No sort of raw rows, no
    * pair joins — the textbook KS-at-scale plan. */
  def aggKsDrift(s: SparkSession, d: String): DataFrame = {
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("ks:"), col("event_id").cast(StringType)))), lit(2L))
    val perValue = Tables.events(s, d)
      .select(col("event_type"), col("value"), grp.as("g"))
      .groupBy("event_type", "value")
      .agg(count(when(col("g") === 0, 1)).as("a_at"),
        count(when(col("g") === 1, 1)).as("b_at"))
    val w = Window.partitionBy("event_type").orderBy("value")
    val tot = Window.partitionBy("event_type")
    perValue
      .withColumn("ca", sum("a_at").over(w))
      .withColumn("cb", sum("b_at").over(w))
      .withColumn("na", sum("a_at").over(tot))
      .withColumn("nb", sum("b_at").over(tot))
      .groupBy("event_type")
      .agg(min("na").as("n_a"), min("nb").as("n_b"),
        max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("dmax"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        (col("dmax").cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).as("ks_stat"))
      .orderBy("event_type")
  }

  /** Two-sample Mann–Whitney U drift test per event type — the RANK
    * companion to [[aggKsDrift]]: where KS compares CDF shapes, U asks
    * whether one sample stochastically dominates the other (location
    * shift), the robust alternative to a t-test a drift monitor runs on
    * heavy-tailed value columns. Samples are the same deterministic md5
    * halves (salt "mw:"), so the answer doubles as a split-quality
    * audit.
    *
    * Exactness: ties collapse to (type, value) groups FIRST; a tie
    * group of size t after c_prev earlier rows occupies average rank
    * c_prev + (t+1)/2, so 2·R_a = Σ a_at·(2·c_prev + t + 1) — every
    * term an exact BIGINT (halves deferred: the single ÷2 happens once,
    * in double, and division by 2 is exact in binary). U_a derives from
    * R_a, the tie-corrected normal approximation z from the integer
    * aggregates (ΣT = Σ t³−t) through one fixed double expression —
    * casts of exact BIGINTs, one division chain, one IEEE sqrt
    * (correctly rounded per IEEE-754, so cross-engine bit-stable).
    * Intermediates stay under 2^63 while n³ does (n per type ≤ ~2M);
    * a production build widens to DECIMAL(38,0) beyond that.
    *
    * Scale posture: identical to KS — one shuffle to (type, value)
    * granularity, one window over value within type, one
    * partial-aggregated rollup; no sort of raw rows, no pair joins. */
  def statMannWhitney(s: SparkSession, d: String): DataFrame = {
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("mw:"), col("event_id").cast(StringType)))), lit(2L))
    val perValue = Tables.events(s, d)
      .select(col("event_type"), col("value"), grp.as("g"))
      .groupBy("event_type", "value")
      .agg(count(when(col("g") === 0, 1)).as("a_at"),
        count(when(col("g") === 1, 1)).as("b_at"))
      .withColumn("t", col("a_at") + col("b_at"))
    val w = Window.partitionBy("event_type").orderBy("value")
    val cum = perValue.withColumn("c_prev", sum("t").over(w) - col("t"))
    val agg = cum.groupBy("event_type")
      .agg(sum("a_at").as("n_a"), sum("b_at").as("n_b"),
        sum(col("a_at") * (lit(2) * col("c_prev") + col("t") + lit(1)))
          .as("r2a"),
        sum(col("t") * col("t") * col("t") - col("t")).as("sum_t3"))
    val nA = col("n_a").cast(DoubleType)
    val nB = col("n_b").cast(DoubleType)
    val n = col("n_a") + col("n_b")
    val nn1 = (n * (n - lit(1L))).cast(DoubleType)
    val uA = (col("r2a") - col("n_a") * (col("n_a") + lit(1L)))
      .cast(DoubleType) / lit(2.0)
    val sigma = sqrt(nA * nB *
      ((n + lit(1L)).cast(DoubleType) - col("sum_t3").cast(DoubleType) / nn1) /
      lit(12.0))
    agg
      .select(col("event_type"), col("n_a"), col("n_b"),
        uA.as("u_a"),
        when(sigma > 0.0, (uA - nA * nB / lit(2.0)) / sigma).as("z"))
      .orderBy("event_type")
  }

  /** Inter-arrival GAP distribution per event type — the traffic-shape
    * profile (bursty vs steady) a capacity planner reads before sizing
    * stream parallelism: gaps between consecutive same-type events of
    * the same user, pooled per type, summarized as min/p50/p90/max/mean.
    * Percentiles are PERCENTILE_DISC by explicit RANK SELECTION
    * (rn == ⌈q·n⌉ in pure integer arithmetic: (n+1)/2 and (9n+9)/10
    * integer divisions) — never an engine percentile builtin
    * (cross-engine interpolation conventions differ; gaps stay exact
    * BIGINT seconds). The only double is the mean's single division.
    *
    * Scale posture: one shuffle to (type, user) for the lag window, one
    * to type for the rank window (types are few — the domain-quota skew
    * caveat applies), partial-aggregated rollup; value-at-rank is
    * insensitive to tie order, so row_number's tie arbitrariness cannot
    * leak into the output. */
  def timeGapStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val wu = Window.partitionBy("event_type", "user_id")
      .orderBy("sec", "event_id")
    val wt = Window.partitionBy("event_type")
    val wr = Window.partitionBy("event_type").orderBy("gap")
    val gaps = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).cast(LongType).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(wu))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("sec") - col("prev")).as("gap"))
    gaps
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wt))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_gaps"),
        min(col("gap")).as("min_gap_s"),
        // DIV, not `/`: Spark's Column./ is double division even on
        // integer operands — the rank equation would compare int vs .5
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("gap")))
          .as("p50_gap_s"),
        max(when(col("rn") === expr("(n * 9 + 9) DIV 10"), col("gap")))
          .as("p90_gap_s"),
        max(col("gap")).as("max_gap_s"),
        (sum(col("gap")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_gap_s"))
      .orderBy("event_type")
  }

  /** FLAGSHIP experiment READOUT — the whole A/B analysis the
    * experimentation suite's pieces exist for, composed in ONE
    * oracle-checked plan the way a metrics platform materializes it:
    *
    *   user-level ARM ASSIGNMENT (md5 half of user_id, salt "exp:" —
    *   the unit of randomization is the user, never the event) →
    *   per-user PRE/POST metric sums + post-period conversion flag →
    *   per-arm moments → Welch t on the post mean, two-proportion z on
    *   user conversion, POOLED-θ CUPED adjustment of the arm means
    *   (θ = pooled cov(x,y)/var(x) across arms — the standard practice
    *   so the adjustment cannot absorb the treatment effect).
    *
    * One row out: sizes, raw and CUPED-adjusted effect, t, z, θ — the
    * readout a decision meeting consumes. Exactness: user sums are
    * exact DECIMAL/integers; every statistic is a fixed double chain
    * over cast-exact operands (the stats-moments discipline), so both
    * engines agree bit-for-bit.
    *
    * Scale posture: one shuffle to per-user rows (map-side combined),
    * ONE global partial-aggregated moment rollup serving all three
    * statistics (arm margins via conditional aggregates, no second
    * pass, no window, no join). */
  def pipelineExperimentReadout(s: SparkSession, d: String): DataFrame = {
    val split = java.sql.Date.valueOf(MvSplitDay)
    val zero = lit(0).cast(DecimalType(18, 2))
    val arm = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("exp:"), col("user_id").cast(StringType)))), lit(2L))
    val perUser = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value").cast(DecimalType(18, 2)).as("v"),
        (col("event_type") === "purchase").as("isp"))
      .groupBy("user_id")
      .agg(sum(when(col("day") < lit(split), col("v")).otherwise(zero)).as("x"),
        sum(when(col("day") >= lit(split), col("v")).otherwise(zero)).as("y"),
        max(when(col("day") >= lit(split) && col("isp"), 1L).otherwise(0L))
          .as("conv"))
      .withColumn("g", arm)
    def armAgg(g: Int, c: org.apache.spark.sql.Column) = sum(when(col("g") === g, c))
    val agg = perUser.agg(
      count(when(col("g") === 0, 1)).as("n_a"),
      count(when(col("g") === 1, 1)).as("n_b"),
      armAgg(0, col("y")).as("sya"), armAgg(1, col("y")).as("syb"),
      armAgg(0, col("y") * col("y")).as("syya"),
      armAgg(1, col("y") * col("y")).as("syyb"),
      armAgg(0, col("x")).as("sxa"), armAgg(1, col("x")).as("sxb"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      armAgg(0, col("conv")).as("ca"), armAgg(1, col("conv")).as("cb"))
    val na = col("n_a").cast(DoubleType); val nb = col("n_b").cast(DoubleType)
    val n = na + nb
    val sya = col("sya").cast(DoubleType); val syb = col("syb").cast(DoubleType)
    val va = (col("syya").cast(DoubleType) - sya * sya / na) / (na - lit(1.0))
    val vb = (col("syyb").cast(DoubleType) - syb * syb / nb) / (nb - lit(1.0))
    val rawDiff = sya / na - syb / nb
    val tWelch = rawDiff / sqrt(va / na + vb / nb)
    // pooled theta over BOTH arms (population-moment form)
    val sx = col("sx").cast(DoubleType); val sy = col("sy").cast(DoubleType)
    val theta = (col("sxy").cast(DoubleType) - sx * sy / n) /
      (col("sxx").cast(DoubleType) - sx * sx / n)
    val adjDiff = (sya / na - theta * (col("sxa").cast(DoubleType) / na)) -
      (syb / nb - theta * (col("sxb").cast(DoubleType) / nb))
    val pa = col("ca").cast(DoubleType) / na
    val pb = col("cb").cast(DoubleType) / nb
    val pp = (col("ca") + col("cb")).cast(DoubleType) / n
    val zConv = (pa - pb) /
      sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(col("n_a"), col("n_b"),
      rawDiff.as("raw_diff"), tWelch.as("t_welch"),
      theta.as("theta"), adjDiff.as("cuped_adj_diff"),
      pa.as("conv_a"), pb.as("conv_b"), zConv.as("z_conversion"))
  }

  /** Two-proportion z-test on the purchase conversion rate between the
    * md5 halves (salt "pz:") — the categorical-outcome member of the
    * experimentation suite (Welch tests means; this tests RATES, the
    * primary metric of most product experiments). Pooled-variance form:
    * z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) from four exact
    * counts through one fixed double chain (divisions + one IEEE sqrt,
    * bit-stable cross-engine).
    *
    * Scale posture: one partial-aggregated global rollup — count-only,
    * the cheapest query shape there is. */
  def aggProportionsZtest(s: SparkSession, d: String): DataFrame = {
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("pz:"), col("event_id").cast(StringType)))), lit(2L))
    val isConv = (col("event_type") === "purchase")
    val agg = Tables.events(s, d)
      .select(grp.as("g"), isConv.as("c"))
      .agg(count(when(col("g") === 0, 1)).as("n_a"),
        count(when(col("g") === 1, 1)).as("n_b"),
        count(when(col("g") === 0 && col("c"), 1)).as("x_a"),
        count(when(col("g") === 1 && col("c"), 1)).as("x_b"))
    val na = col("n_a").cast(DoubleType); val nb = col("n_b").cast(DoubleType)
    val xa = col("x_a").cast(DoubleType); val xb = col("x_b").cast(DoubleType)
    val pa = xa / na
    val pb = xb / nb
    val pp = (xa + xb) / (na + nb)
    agg.select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
      pa.as("p_a"), pb.as("p_b"),
      ((pa - pb) / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb)))
        .as("z"))
  }

  /** Welch two-sample t-test per event type — the unequal-variance
    * mean-difference test completing the drift/experimentation suite
    * (KS = shape, Mann–Whitney = rank dominance, χ² = categorical mix,
    * CUPED = variance reduction; this is the parametric mean test).
    * Samples are the md5 halves (salt "tt:"); t and the
    * Welch–Satterthwaite df come from six exact-decimal sums through
    * one fixed double chain (the stats-moments recipe) — each division
    * and the final IEEE sqrt are correctly rounded single ops, so both
    * engines agree bit-for-bit.
    *
    * Scale posture: one partial-aggregated shuffle to per-type rows;
    * no window, no sort beyond the presentation order. */
  def aggTtestWelch(s: SparkSession, d: String): DataFrame = {
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("tt:"), col("event_id").cast(StringType)))), lit(2L))
    val v = col("value").cast(DecimalType(18, 2))
    val agg = Tables.events(s, d)
      .select(col("event_type"), v.as("v"), grp.as("g"))
      .groupBy("event_type")
      .agg(count(when(col("g") === 0, 1)).as("n_a"),
        count(when(col("g") === 1, 1)).as("n_b"),
        sum(when(col("g") === 0, col("v"))).as("sa"),
        sum(when(col("g") === 1, col("v"))).as("sb"),
        sum(when(col("g") === 0, col("v") * col("v"))).as("ssa"),
        sum(when(col("g") === 1, col("v") * col("v"))).as("ssb"))
    val na = col("n_a").cast(DoubleType); val nb = col("n_b").cast(DoubleType)
    val sa = col("sa").cast(DoubleType);  val sb = col("sb").cast(DoubleType)
    val ssa = col("ssa").cast(DoubleType); val ssb = col("ssb").cast(DoubleType)
    val va = (ssa - sa * sa / na) / (na - lit(1.0))
    val vb = (ssb - sb * sb / nb) / (nb - lit(1.0))
    val ta = va / na
    val tb = vb / nb
    val se2 = ta + tb
    agg.select(col("event_type"), col("n_a"), col("n_b"),
        (sa / na - sb / nb).as("mean_diff"),
        ((sa / na - sb / nb) / sqrt(se2)).as("t_welch"),
        (se2 * se2 / (ta * ta / (na - lit(1.0)) + tb * tb / (nb - lit(1.0))))
          .as("df_welch"))
      .orderBy("event_type")
  }

  /** CUPED variance reduction (Deng 2013) — the experimentation-
    * platform preprocessing every A/B pipeline runs: per user, the
    * PRE-period metric (exact-decimal value sum before [[MvSplitDay]])
    * is the covariate x, the POST-period sum the metric y;
    * θ = cov(x,y)/var(x), and the adjusted metric y − θx has variance
    * var(y) − cov²/var(x) — the reduction this query REPORTS (as
    * 100·corr², the fraction of metric variance the covariate
    * explains), which directly shrinks required experiment sample
    * sizes. All moments come from six exact-decimal sums through one
    * fixed double expression — the [[AdvancedQueries.aggStatsMoments]]
    * recipe (built-in covar/corr are Welford-streaming, not
    * cross-engine bit-stable).
    *
    * Scale posture: one shuffle to per-user rows (map-side combined),
    * one global partial-aggregated moment rollup; no window, no sort. */
  def statCupedAdjustment(s: SparkSession, d: String): DataFrame = {
    val split = java.sql.Date.valueOf(MvSplitDay)
    val zero = lit(0).cast(DecimalType(18, 2))
    val perUser = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy("user_id")
      .agg(sum(when(col("day") < lit(split), col("v")).otherwise(zero)).as("x"),
        sum(when(col("day") >= lit(split), col("v")).otherwise(zero)).as("y"))
    val n = count(lit(1)).cast(DoubleType)
    val sx = sum(col("x")).cast(DoubleType)
    val sy = sum(col("y")).cast(DoubleType)
    val sxx = sum(col("x") * col("x")).cast(DoubleType)
    val syy = sum(col("y") * col("y")).cast(DoubleType)
    val sxy = sum(col("x") * col("y")).cast(DoubleType)
    val varX = (sxx - sx * sx / n) / (n - lit(1.0))
    val varY = (syy - sy * sy / n) / (n - lit(1.0))
    val covar = (sxy - sx * sy / n) / (n - lit(1.0))
    perUser.agg(
      count(lit(1)).as("n_users"),
      (covar / varX).as("theta"),
      varY.as("var_post"),
      (varY - covar * covar / varX).as("var_adjusted"),
      (lit(100.0) * (covar * covar) / (varX * varY)).as("reduction_pct"))
  }

  /** Incremental materialized-view maintenance — the merge step a nightly
    * pipeline runs instead of the reference's truncate-and-reload
    * (`etl_process.py`'s full reload is the degenerate "recompute
    * everything" case): the history partition exists only as
    * already-aggregated per-(type, day) STATE rows, the delta days arrive
    * as raw rows, and the final answer merges the two state sets —
    * counts add, sums add (exact DECIMAL — order-insensitive), mins/maxs
    * re-min/re-max, day counts come off the state rows. The oracle
    * recomputes from all raw rows in one pass: state-merge and
    * full-recompute must be indistinguishable, which is precisely the
    * mergeability contract that lets a 100 TB MV update by touching only
    * the delta partition.
    *
    * Scale posture: the base aggregation shuffles each partition once on
    * (type, day) — in production those state rows are READ, not computed,
    * so the only work proportional to data size is the delta scan; the
    * final merge aggregates |types|·|days| state rows — bytes-trivial. */
  def etlIncrementalMv(s: SparkSession, d: String): DataFrame = {
    val split = java.sql.Date.valueOf(MvSplitDay)
    val ev = Tables.events(s, d).select(col("event_type"),
      to_date(col("ts")).as("day"),
      col("value").cast(DecimalType(18, 2)).as("v"))
    def state(df: DataFrame): DataFrame = df.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("mn"), max("v").as("mx"))
    val base  = state(ev.filter(col("day") <  lit(split)))
    val delta = state(ev.filter(col("day") >= lit(split)))
    base.unionByName(delta).groupBy("event_type")
      .agg(sum("n").as("n_events"),
        sum("sv").cast(DoubleType).as("total_value"),
        min("mn").cast(DoubleType).as("min_value"),
        max("mx").cast(DoubleType).as("max_value"),
        countDistinct("day").as("n_days"))
      .orderBy("event_type")
  }
  private val MvSplitDay = "2024-01-25"

  /** Last-touch marketing attribution: every purchase is credited to the
    * user's most recent click/view within a 7-day lookback, else "none".
    * The carry-forward is ONE window pass (`last(..., ignoreNulls)` over
    * UNBOUNDED PRECEDING‥1 PRECEDING) — no self-join of conversions
    * against touches. Ordering is (whole second, event_id): the parquet
    * timestamps are nanos that the two engines truncate to different
    * precisions, so sub-second order must never decide a tie.
    *
    * Scale posture: one hash exchange on user_id serves the whole query;
    * the rollup input is |purchases| rows partial-aggregated to ≤
    * |touch types|+1 groups. State per row is one small struct —
    * no per-user history materializes anywhere. */
  def windowAttributionLasttouch(s: SparkSession, d: String): DataFrame = {
    val lookbackSec = 7L * 86400
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value").cast(DecimalType(18, 2)).as("v"),
      unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"),
      struct(col("sec").as("tsec"), col("event_type").as("ttype")))
    ev.withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(
        when(col("lt.tsec") >= col("sec") - lit(lookbackSec), col("lt.ttype")),
        lit("none")).as("touch_type"), col("v"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conv"),
        sum("v").cast(DoubleType).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** Weighted percentile (weighted lower median): the per-group value at
    * which the running quantity-weight crosses half the total — the
    * distributed form of "median price weighted by units sold". One
    * pass: cumulative-weight window + total-weight window share the
    * same per-group exchange, then `min(v | 2·cum ≥ tot)` picks the
    * crossing value. All comparisons happen on exact DECIMAL, so the
    * crossing row is engine-independent; ordering ties on `v` are
    * harmless because every row of a tie carries the same `v` — the
    * selected VALUE is order-invariant even though `cum` is not.
    *
    * Scale posture: one hash exchange on the group key; the window is a
    * running sum (O(1) state per row, no buffering); the final
    * aggregation rides the same partitioning. A group too large for one
    * partition's sort would switch to the two-pass histogram form
    * (`agg_histogram_buckets` + in-bucket scan) — same answer. */
  def aggWeightedPercentile(s: SparkSession, d: String): DataFrame = {
    val t = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_extendedprice").cast(DecimalType(18, 2)).as("v"),
      col("l_quantity").cast(DecimalType(18, 2)).as("w"))
    val grp = Window.partitionBy("l_returnflag")
    val cum = grp.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("w").over(cum))
      .withColumn("tot", sum("w").over(grp))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min("v").cast(DoubleType).as("weighted_median"),
        min("tot").cast(DoubleType).as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** Gini concentration index per group over order value — the
    * inequality rollup a marketplace runs on revenue distribution. Uses
    * the rank identity G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ
    * ascending: ranks come from one row_number window (ties on x break
    * by key, and swapping ranks within an x-tie leaves Σi·xᵢ unchanged,
    * so the statistic is deterministic), and both Σ terms accumulate in
    * DECIMAL — order-insensitive — with ONE final double division. The
    * oracle hops DECIMAL→VARCHAR→DOUBLE (DuckDB's direct decimal cast
    * double-rounds; recipe from round 4).
    *
    * Scale posture: one hash exchange on the group key for the window,
    * and the heavy sums are partial-aggregated on the same partitioning;
    * nothing global. The rank window is the only per-group sort — the
    * same cost class as any percentile. */
  def aggGiniIndex(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderpriority"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("x"), col("o_orderkey"))
    val rn = row_number().over(Window.partitionBy("o_orderpriority")
      .orderBy(col("x"), col("o_orderkey")))
    o.withColumn("i", rn.cast(DecimalType(18, 0)))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum("x").as("s0"), sum(col("x") * col("i")).as("s1"))
      .select(col("o_orderpriority"), col("n_orders"),
        ((col("s1") * 2 - col("s0") * (col("n_orders") + 1)).cast(DoubleType) /
          (col("s0") * col("n_orders")).cast(DoubleType)).as("gini"))
      .orderBy("o_orderpriority")
  }

  /** MAX DRAWDOWN per customer — the peak-to-trough metric risk
    * pipelines run over any monitored series (here each customer's
    * order-price history in date order): running max minus current
    * value, maximized. All arithmetic is exact DECIMAL(18,2); the
    * trough row is picked by the same rank-not-argmax rule as
    * [[windowCusumDrift]] (highest drawdown, earliest order on ties)
    * so both engines state one deterministic rule.
    *
    * Scale posture: the running-max window, the trough rank, and the
    * per-customer count all partition on o_custkey, so the plan is ONE
    * hash exchange reused end to end (subset rule); within-partition
    * sorts only. Per-key history length is bounded by orders-per-
    * customer (tens) — no skew hazard. */
  def windowDrawdown(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val wRun = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCust = Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), x.as("x"))
      .withColumn("dd", max("x").over(wRun) - col("x"))
      .withColumn("rk", row_number().over(Window.partitionBy("o_custkey")
        .orderBy(col("dd").desc, col("o_orderkey"))))
      .withColumn("n_orders", count(lit(1)).over(wCust))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("n_orders"),
        col("dd").cast(DoubleType).as("max_drawdown"),
        col("o_orderkey").as("trough_orderkey"))
      .orderBy("o_custkey")
  }

  /** BOLLINGER-BAND breaches — each order tested against the mean ± 2σ
    * band of the customer's 5 PRECEDING orders, emitting the orders
    * that land outside it. The band deliberately EXCLUDES the current
    * row: including it makes a 2σ breach impossible by Samuelson's
    * inequality (|x−x̄| ≤ σ·(n−1)/√n < 2σ for n=5), and the
    * prior-window form is the predictive band an anomaly monitor
    * actually wants. The breach decision is EXACT: with prior-window
    * sums s1=Σx, s2=Σx² and n kept in DECIMAL, "|x − s1/n| > 2σ"
    * cross-multiplies to "(n·x − s1)² > 4·(n·s2 − s1²)" — pure decimal
    * integer arithmetic, no FP anywhere in the predicate. The
    * displayed mean/σ are doubles
    * both engines derive from the SAME exact decimals (one division /
    * one sqrt — both IEEE-correctly-rounded ops), with the VARCHAR hop
    * on the oracle's DECIMAL→DOUBLE casts (round-4 recipe). Operand
    * decimals are re-cast to DECIMAL(18,x) before squaring so neither
    * engine's multiply exceeds width 38 (values are bounded by
    * 5·max(o_totalprice), far inside 18 digits).
    *
    * Scale posture: both windows partition on o_custkey — one hash
    * exchange total; the 5-row frame is O(1) state per row. At 100 TB
    * the same plan holds (frame state is constant; no per-key
    * materialization beyond the frame). */
  def windowBollingerBands(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-5, -1)
    val base = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), x.as("x"))
      .withColumn("s1", sum("x").over(w).cast(DecimalType(18, 2)))
      .withColumn("s2", sum(col("x") * col("x")).over(w).cast(DecimalType(18, 4)))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") === 5)
    val diff = (col("n") * col("x") - col("s1")).cast(DecimalType(18, 2))
    // DECIMAL(38,4) and a DECIMAL(2,0) literal for the 4x factor on
    // BOTH sides (oracle matches) — values are bounded well inside
    // either width, but identical declared widths keep the exactness
    // argument auditable instead of relying on each engine's widening.
    val varNum = (col("n") * col("s2") - col("s1") * col("s1"))
      .cast(DecimalType(38, 4))
    val nD = col("n").cast(DoubleType)
    base
      .withColumn("diff", diff)
      .withColumn("var_num", varNum)
      .filter(col("diff") * col("diff") > varNum * lit(4).cast(DecimalType(2, 0)))
      .select(col("o_custkey"), col("o_orderkey"),
        col("x").cast(DoubleType).as("price"),
        (col("s1").cast(DoubleType) / nD).as("mean5"),
        (sqrt(col("var_num").cast(DoubleType)) / nD).as("sigma5"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** SIMPSON DIVERSITY index per source — 1 − Σ(n_lang²)/n², the
    * collision-probability diversity measure a corpus-mix report uses
    * where Shannon entropy would drag in libm logs: every term is
    * exact integer arithmetic and the single final division happens in
    * double on operands both engines compute identically. (Counts are
    * DECIMAL(18,0), not BIGINT: n > 3·10⁹ rows per source would
    * overflow a BIGINT square, while (18,0)² is a width-37 decimal —
    * legal in both engines up to n ≈ 10¹⁸.)
    *
    * Scale posture: a two-level rollup — (source, lang) counts in one
    * partial-aggregated exchange, then a per-source re-aggregate of
    * that tiny frame. Nothing else moves. */
  def aggSimpsonDiversity(s: SparkSession, d: String): DataFrame = {
    val nl = count(lit(1)).cast(DecimalType(18, 0))
    Tables.documents(s, d)
      .groupBy("source", "lang").agg(nl.as("nl"))
      .groupBy("source")
      .agg(sum(col("nl")).cast(DecimalType(18, 0)).as("n"),
        sum(col("nl") * col("nl")).as("sumsq"),
        count(lit(1)).as("n_langs"))
      .select(col("source"), col("n").cast(LongType).as("n_docs"), col("n_langs"),
        ((col("n") * col("n") - col("sumsq")).cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("simpson"))
      .orderBy("source")
  }

  /** U-SHAPED (position-based) ATTRIBUTION — the multi-touch sibling of
    * [[windowAttributionLasttouch]]: each purchase's value splits 40%
    * to the first touch, 40% to the last, 20% shared by the middles
    * (degenerate cases: one touch takes 100%, two touches split the
    * cents evenly). ALL credit arithmetic is integer cents — the 40%
    * legs are `(cents*2) DIV 5`, the middle pool is the exact
    * complement, the per-middle share is `pool DIV (n−2)` with the
    * remainder cents assigned to the EARLIEST middle — so every
    * purchase's credits sum to its cents EXACTLY (spec-asserted) and
    * nothing depends on FP division order. A purchase with no touch in
    * the 7-day lookback credits `none` in full, so the report total
    * reconciles against raw purchase revenue. Touch order is total:
    * (second, event_id).
    *
    * Scale posture: the touch↔purchase pairing is an equi-join on
    * user_id with the lookback as a residual range predicate — one hash
    * exchange per side, fan-out bounded by per-user touches within 7
    * days (a retention-style bound, not corpus-size). The position
    * windows re-key by purchase id — higher cardinality than user_id,
    * so SMALLER groups (≤ touches-per-purchase) — and the final rollup
    * partial-aggregates to ≤3 rows. No per-user history materializes
    * beyond the joined window. */
  def windowAttributionUshaped(s: SparkSession, d: String): DataFrame = {
    val lookbackSec = 7L * 86400
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value").cast(DecimalType(18, 2)).as("v"),
      unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("sec").as("tsec"),
        col("event_id").as("tid"), col("event_type").as("ttype"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec").as("psec"), col("event_id").as("pid"),
        (col("v") * 100).cast(LongType).as("cents"))
    val j = purchases.join(touches,
        col("user_id") === col("t_user") &&
          col("tsec") >= col("psec") - lookbackSec && col("tsec") < col("psec"),
        "left")
    // partition the position windows by (user_id, pid), not pid alone:
    // pid is unique so the frames are identical, but user_id in the
    // clustering keys lets a shuffle-join plan's user_id exchange
    // SATISFY the window's ClusteredDistribution — zero extra exchanges
    // at scale (the subset rule; with a broadcast join the window pays
    // its one exchange either way)
    val wP = Window.partitionBy("user_id", "pid")
    val pos = j
      .withColumn("rk", row_number().over(wP.orderBy(col("tsec"), col("tid"))))
      .withColumn("n_t", count(lit(1)).over(wP))
    // integer-cent credit: branches ordered identically in the oracle
    val fortyPct = expr("(cents * 2) DIV 5")
    val credit = when(col("ttype").isNull, col("cents"))
      .when(col("n_t") === 1, col("cents"))
      .when(col("n_t") === 2,
        when(col("rk") === 1, expr("cents DIV 2 + cents % 2"))
          .otherwise(expr("cents DIV 2")))
      .when(col("rk") === 1, fortyPct)
      .when(col("rk") === col("n_t"), fortyPct)
      .when(col("rk") === 2,
        expr("(cents - 2 * ((cents * 2) DIV 5)) DIV (n_t - 2) + " +
          "(cents - 2 * ((cents * 2) DIV 5)) % (n_t - 2)"))
      .otherwise(expr("(cents - 2 * ((cents * 2) DIV 5)) DIV (n_t - 2)"))
    pos.withColumn("credit", credit)
      .groupBy(coalesce(col("ttype"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        (sum(col("credit")).cast(DoubleType) / 100.0).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** BENFORD FIRST-DIGIT profile — the fraud/DQ screen: the observed
    * share of each leading significant digit of o_totalprice against
    * Benford's log-law expectation. Counts are exact; each share is ONE
    * double division of the same two longs in both engines, and the
    * expected values are 17-significant-digit literals that parse to
    * the identical double on both sides — no libm log anywhere at run
    * time. `dev` (observed − expected) is the per-digit test statistic;
    * a chi-square or max-|dev| rollup is one more tiny aggregate over
    * these 9 rows.
    *
    * Scale posture: the digit projection is pure codegen string/int
    * work on the scan; the groupBy partial-aggregates to ≤9 groups and
    * the corpus total rides in as a broadcast single row. Cheapest
    * possible shape — identical to [[Tables.documents]] rollups. */
  def aggBenfordFirstDigit(s: SparkSession, d: String): DataFrame = {
    // log10(1 + 1/d) to full double precision (shortest round-trip repr)
    val benford = Seq(
      1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
      3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
      5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
      7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
      9 -> "0.04575749056067514")
    val expected = benford.tail.foldLeft(
      when(col("digit") === 1, lit(benford.head._2.toDouble))) {
      case (acc, (dgt, p)) => acc.when(col("digit") === dgt, lit(p.toDouble))
    }
    val t = Tables.orders(s, d)
      .select(substring(floor(col("o_totalprice")).cast(LongType)
        .cast(StringType), 1, 1).cast(IntegerType).as("digit"))
    val total = t.agg(count(lit(1)).as("total"))
    t.groupBy("digit").agg(count(lit(1)).as("n"))
      // pin the digit domain to 1-9 so both engines state the same
      // output set: the oracle's INNER JOIN to the 9-row Benford table
      // drops a (theoretical) digit-0 row, and without this filter the
      // engine's CASE chain would instead emit it with NULL benford_p —
      // unreachable on TPC-H totalprice (> 1) but a latent shape
      // divergence. The corpus total stays UNfiltered on both sides.
      .filter(col("digit").between(1, 9))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast(DoubleType) / col("total").cast(DoubleType))
          .as("share"),
        expected.as("benford_p"),
        (col("n").cast(DoubleType) / col("total").cast(DoubleType) -
          expected).as("dev"))
      .orderBy("digit")
  }

  /** TIME-WEIGHTED AVERAGE (TWAP) per user — the metric that makes an
    * irregular event series comparable: each observed value is weighted
    * by how long it HELD (seconds until the next event; the final
    * observation holds nothing and contributes no weight). Numerator
    * Σ v·Δt accumulates in exact DECIMAL (value DECIMAL(18,2) × BIGINT
    * seconds — order-insensitive), denominator Σ Δt in BIGINT; ONE
    * final double division via the shared-literal recipe. Users with a
    * single event have no held interval and are excluded (their TWAP is
    * undefined, not zero).
    *
    * Scale posture: the lead window and the aggregation both key on
    * user_id — one hash exchange total (the subset rule); O(1) window
    * state (a 1-row lead). At 100 TB this is the cheapest per-key
    * window shape there is. */
  /** Unsorted core shared with [[CurationQueries]]' feature-store
    * flagship (a join consumer must not pay the presentation sort). */
  private[ops] def twapCore(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        col("value").cast(DecimalType(18, 2)).as("v"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .withColumn("dt", lead(col("sec"), 1).over(w) - col("sec"))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("held_sec"),
        sum(col("v") * col("dt")).as("num"))
      .filter(col("held_sec") > 0)
      .select(col("user_id"), col("n_intervals"), col("held_sec"),
        (col("num").cast(DoubleType) / col("held_sec").cast(DoubleType))
          .as("twap"))
  }

  def windowTwap(s: SparkSession, d: String): DataFrame =
    twapCore(s, d).orderBy("user_id")

  /** MONTH-OVER-MONTH change — the BI report staple: revenue per
    * (priority, month) with the relative change vs the previous month.
    * Monthly sums accumulate in exact DECIMAL; the change ratio is
    * (rev − prev)/prev where numerator and denominator are each ONE
    * decimal→double cast of exact values and the division is the same
    * IEEE op in both engines. The first month of each group reports
    * NULL (no prior month — not 0, which would read as "flat").
    *
    * Scale posture: the rollup partial-aggregates to |priorities|×
    * |months| rows BEFORE its one exchange; the lag window runs on that
    * tiny frame. The fact table never touches a window. */
  def windowMomChange(s: SparkSession, d: String): DataFrame = {
    val m = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("month"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("rev"))
    val w = Window.partitionBy("pri").orderBy("month")
    m.withColumn("prev", lag(col("rev"), 1).over(w))
      .select(col("pri"), col("month"),
        col("rev").cast(DoubleType).as("revenue"),
        ((col("rev") - col("prev")).cast(DoubleType) /
          col("prev").cast(DoubleType)).as("mom_change"))
      .orderBy("pri", "month")
  }

  /** EXACT INTERPOLATED PERCENTILES (p25/p50/p75 per group) — the
    * PERCENTILE_CONT semantics done in pure integer arithmetic: with
    * 0-based position (n−1)·p and p ∈ {¼,½,¾}, the position lands on
    * the QUARTER grid, so value = v_lo·(4−f) + v_hi·f over integer
    * cents (f = quarter remainder) is exact — one final double division
    * by 400. No FP interpolation, no engine PERCENTILE_CONT semantics
    * drift (the notorious cross-engine mismatch this construction
    * sidesteps by never calling either engine's builtin). Ties in the
    * rank order are harmless: equal values sort adjacent, so any rank
    * inside a tie run carries the same cents.
    *
    * Scale posture: one rank window per group + a broadcast 15-row
    * positions frame that SEMI-selects exactly ≤6 rows per group before
    * a trivial aggregate. The two-pass histogram form replaces the rank
    * window when a single group outgrows a partition — same answer.
    * Complements [[aggWeightedPercentile]] (weighted, lower-median) and
    * the t-digest-style `approx_quantile_sketch` (approximate). */
  def aggPercentileInterp(s: SparkSession, d: String): DataFrame = {
    val t = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("cents"))
    val ranked = t.withColumn("rk", row_number().over(
      Window.partitionBy("flag").orderBy(col("cents"))))
    val quarters = t.groupBy("flag").agg(count(lit(1)).as("n"))
      .select(col("flag").as("qflag"), col("n"),
        explode(typedLit(Seq(1, 2, 3))).as("q"))
      .withColumn("pos4", (col("n") - 1) * col("q"))
      .select(col("qflag"), col("q"),
        expr("pos4 DIV 4 + 1").as("lo_rk"),
        expr("pos4 DIV 4 + 1 + CASE WHEN pos4 % 4 > 0 THEN 1 ELSE 0 END")
          .as("hi_rk"),
        expr("pos4 % 4").as("frac4"))
    ranked.join(broadcast(quarters),
        col("flag") === col("qflag") &&
          (col("rk") === col("lo_rk") || col("rk") === col("hi_rk")))
      .groupBy("flag", "q", "frac4")
      .agg(min(when(col("rk") === col("lo_rk"), col("cents"))).as("vlo"),
        min(when(col("rk") === col("hi_rk"), col("cents"))).as("vhi"))
      .select(col("flag"), (col("q") * 25).as("pct"),
        ((col("vlo") * (lit(4L) - col("frac4")) + col("vhi") * col("frac4"))
          .cast(DoubleType) / 400.0).as("value"))
      .orderBy("flag", "pct")
  }

  /** ONE-PASS Poisson bootstrap confidence interval for the mean order
    * price (Chamandy et al.'s "Estimating Uncertainty for Massive Data
    * Streams" construction): every row fans out to B = 64 resamples
    * with a DETERMINISTIC Poisson(1)-distributed weight — the inverse
    * CDF (thousandth thresholds 368/736/920/981/996) applied to
    * md5-derived hash buckets, the suite's no-RNG sampling recipe — so
    * each resample mean is Σw·x / Σw on exact decimal/integer sums.
    * The p5/p50/p95 of the 64 means use the explicit nearest-rank
    * (⌈q·B⌉-th sorted element), stated identically on both engines.
    * At 100 TB this is THE bootstrap: one pass, B partial sums, no
    * resample materialization, executor-count-independent weights.
    *
    * Scale posture: the fan-out is a constant B multiplier collapsed by
    * partial aggregation before the single B-keyed shuffle (64 groups);
    * the quantile step sorts a 64-element list on one row. */
  def statBootstrapCi(s: SparkSession, d: String): DataFrame = {
    // ONE digest per row, BEFORE the 64-way fan-out: the per-resample
    // bucket derives from the base by the count–min affine family
    // ((2b+3)·h + b·2654435761 mod P — pairwise independent), so the
    // fan-out costs three integer ops per (row, b) instead of a digest.
    // Computing md5 under the explode re-evaluates it per resample AND
    // per fold32 nibble after CollapseProject inlining (the
    // sketch_countmin_error lesson: 64×8 digests/row — measured 57 s at
    // sf0.1 vs ~2 s for this form).
    //
    // Round-14 disposition (measured, kept as-is): a "wide aggregate"
    // variant — 128 agg columns (Σw_b·x, Σw_b per b) over the
    // un-exploded scan, zero row fan-out, zero keyed exchange — was
    // built and REVERTED: 2.9 s → 4.2 s at sf0.1. 128 aggregate fields
    // blow past codegen's buffer-width sweet spot, so the whole
    // aggregate drops out of whole-stage codegen and the interpreted
    // per-row update costs more than the explode it saved. The explode
    // + hash-partial-agg below stays inside codegen end to end.
    import graft.dedup.Dedup.MinhashP
    val b = col("b")
    val h = pmod(
      (lit(2L) * b + 3L) * col("base") + b * lit(2654435761L), lit(MinhashP))
    val bucket = pmod(h, lit(1000L))
    val w = when(bucket < 368, 0L).when(bucket < 736, 1L).when(bucket < 920, 2L)
      .when(bucket < 981, 3L).when(bucket < 996, 4L).otherwise(5L)
    val means = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
      .select(graft.dedup.Dedup.hexFold32(
        md5(concat(lit("boot:"), col("o_orderkey").cast(StringType))))
        .as("base"), col("x"))
      .withColumn("b", explode(sequence(lit(0L), lit(63L))))
      .select(b, w.as("w"), col("x"))
      .groupBy("b")
      .agg((sum(col("w") * col("x")).cast(DoubleType) /
        sum(col("w")).cast(DoubleType)).as("m"))
    means.agg(
        count(lit(1)).as("n_resamples"),
        sort_array(collect_list(col("m"))).as("ms"))
      .select(col("n_resamples"),
        element_at(col("ms"), 4).as("p5"),
        element_at(col("ms"), 32).as("p50"),
        element_at(col("ms"), 61).as("p95"))
  }

  /** Winsorized and trimmed means per group — the outlier-robust
    * aggregations a feature pipeline applies before scaling (clip to
    * the [p5, p95] band vs drop outside it), beside the suite's MAD/
    * median/Theil–Sen robust estimators. Percentile cut ranks are the
    * explicit nearest-rank form (⌈0.05·n⌉ / ⌈0.95·n⌉ over a TOTAL
    * order — price, orderkey, linenumber), the cut VALUES are
    * conditional window aggregates over the same single exchange, and
    * every mean is an exact DECIMAL sum divided once in double.
    *
    * Scale posture: one group-keyed window exchange serves ranks, n,
    * and both cut values; the rollup partial-aggregates on the same
    * key. */
  def aggWinsorizedMean(s: SparkSession, d: String): DataFrame = {
    val byFlag = Window.partitionBy("l_returnflag")
    val rankW = byFlag.orderBy("price", "l_orderkey", "l_linenumber")
    val k05 = expr("(n + 19) div 20")       // ceil(0.05 n), exact integer
    val k95 = expr("(n * 95 + 99) div 100") // ceil(0.95 n), exact integer
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
      .withColumn("rk", row_number().over(rankW))
      .withColumn("n", count(lit(1)).over(byFlag))
      .withColumn("p05", max(when(col("rk") <= k05, col("price"))).over(byFlag))
      .withColumn("p95", max(when(col("rk") <= k95, col("price"))).over(byFlag))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        min(col("p05")).cast(DoubleType).as("p05"),
        min(col("p95")).cast(DoubleType).as("p95"),
        (sum(col("price")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_plain"),
        (sum(greatest(least(col("price"), col("p95")), col("p05")))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("mean_winsorized"),
        (sum(when(col("rk") >= k05 && col("rk") <= k95, col("price")))
          .cast(DoubleType) /
          sum(when(col("rk") >= k05 && col("rk") <= k95, 1L).otherwise(0L))
            .cast(DoubleType)).as("mean_trimmed"))
      .orderBy("l_returnflag")
  }

  /** PAIRWISE Pearson CORRELATION MATRIX over the lineitem numeric
    * columns (quantity, extendedprice, discount, tax), unpivoted to one
    * row per pair — the feature-correlation screen a feature-store
    * owner runs before shipping redundant columns.
    *
    * Determinism (the cross-engine moment recipe): every moment
    * (Σx, Σx², Σxy) accumulates in EXACT decimal — values cast to
    * DECIMAL(18,2), products to (37,4), sums to (38,4) in BOTH engines
    * — then hops to double THROUGH VARCHAR (decimal→double direct
    * casts double-round at high precision, round-4 recipe), and the
    * final r formula is the same IEEE expression tree on identical
    * operands, rounded to 9. One aggregation pass computes all 14
    * moments; the 6 pair rows explode from one array of structs (no
    * re-scan per pair).
    *
    * Scale posture: a single partial-aggregated global aggregate (14
    * partial sums, no shuffle wider than one row) — the cheapest shape
    * statistics can take at 100 TB. */
  def statPairwiseCorr(s: SparkSession, d: String): DataFrame = {
    val names = Seq("q" -> "l_quantity", "p" -> "l_extendedprice",
      "dc" -> "l_discount", "tx" -> "l_tax")
    val li = Tables.lineitem(s, d).select(names.map { case (a, c) =>
      col(c).cast(DecimalType(18, 2)).as(a) }: _*)
    val keys = names.map(_._1)
    val momentCols =
      keys.map(v => sum(col(v)).as(s"s_$v")) ++
        (for { i <- keys.indices; j <- i until keys.length }
          yield sum(col(keys(i)) * col(keys(j))).as(s"s_${keys(i)}_${keys(j)}"))
    val sums = li.agg(count(lit(1)).as("n"), momentCols: _*)
    // decimal → double through VARCHAR: correctly-rounded in both engines
    def dd(c: String) = col(c).cast(StringType).cast(DoubleType)
    val nD = col("n").cast(DoubleType)
    def rFor(a: String, b: String) =
      round((nD * dd(s"s_${a}_$b") - dd(s"s_$a") * dd(s"s_$b")) /
        (sqrt(nD * dd(s"s_${a}_$a") - dd(s"s_$a") * dd(s"s_$a")) *
          sqrt(nD * dd(s"s_${b}_$b") - dd(s"s_$b") * dd(s"s_$b"))), 9)
    val pairs = Seq(("quantity_price", "q", "p"), ("quantity_discount", "q", "dc"),
      ("quantity_tax", "q", "tx"), ("price_discount", "p", "dc"),
      ("price_tax", "p", "tx"), ("discount_tax", "dc", "tx"))
    sums.select(array(pairs.map { case (lbl, a, b) =>
        struct(lit(lbl).as("pair"), rFor(a, b).as("r")) }: _*).as("rs"))
      .select(explode(col("rs")).as("e"))
      .select(col("e.pair").as("pair"), col("e.r").as("r"))
      .orderBy("pair")
  }

  /** BURSTINESS COEFFICIENT per event type — Goh-Barabási
    * B = (σ−μ)/(σ+μ) over the inter-arrival gaps (−1 ⇒ periodic,
    * 0 ⇒ Poisson, →1 ⇒ bursty): the one-number traffic-shape summary
    * on top of [[timeGapStats]]'s distribution.
    *
    * Determinism: gaps are exact BIGINT seconds; Σg stays BIGINT and
    * Σg² accumulates in DECIMAL (a BIGINT square overflows at the
    * 10×-scale corpus), both hopping to double through VARCHAR; σ/μ/B
    * are then the same IEEE tree on identical operands, rounded 9.
    * The degenerate all-equal-gap case (σ+μ could be 0 only if every
    * gap is 0) reports NULL under the same CASE on both sides. */
  def timeBurstiness(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy("event_type", "user_id")
      .orderBy("sec", "event_id")
    val gaps = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).cast(LongType).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(wu))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("sec") - col("prev")).as("gap"))
    val agg = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("s1"),
        sum(col("gap").cast(DecimalType(18, 0)) *
          col("gap").cast(DecimalType(18, 0))).as("s2"))
    val nD = col("n_gaps").cast(DoubleType)
    val s1d = col("s1").cast(StringType).cast(DoubleType)
    val s2d = col("s2").cast(StringType).cast(DoubleType)
    agg
      .withColumn("mu", s1d / nD)
      .withColumn("sigma", sqrt(nD * s2d - s1d * s1d) / nD)
      .select(col("event_type"), col("n_gaps"),
        round(col("mu"), 9).as("mean_gap_s"),
        round(col("sigma"), 9).as("sd_gap_s"),
        when(col("sigma") + col("mu") > 0.0,
          round((col("sigma") - col("mu")) / (col("sigma") + col("mu")), 9))
          .as("burstiness"))
      .orderBy("event_type")
  }

  /** WEEKDAY SEASONAL INDEX of order revenue — the multiplicative
    * seasonality profile (index 1.0 = an average day) a forecaster
    * divides out before trend-fitting, and the capacity planner's
    * staffing curve. Day numbering is weekday()+1 ↔ DuckDB isodow —
    * the one numbering both engines share (round-3 recipe).
    *
    * Determinism: daily revenue aggregates in exact DECIMAL; per-dow
    * and global sums stay decimal; the index is one fixed double tree
    * over VARCHAR-hopped operands, round 9. Scale posture: one keyed
    * date rollup, a 7-group rollup, and a broadcast 1-row globals
    * cross — the globals pattern. */
  def timeSeasonalIndex(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val byDow = daily
      .withColumn("dow", (weekday(col("o_orderdate")) + 1).cast(LongType))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("srev"))
    val globals = daily.agg(count(lit(1)).as("tot_days"),
      sum(col("rev")).as("tot_rev"))
    def dd(c: org.apache.spark.sql.Column) = c.cast(StringType).cast(DoubleType)
    byDow.crossJoin(broadcast(globals))
      .select(col("dow"), col("n_days"),
        // cents precision: at ~1e6 magnitude a 9-decimal round needs 16
        // significant digits — past double precision, so the engines'
        // decimal expansions differ sub-ulp; 2 decimals is magnitude-safe
        round(dd(col("srev")) / col("n_days").cast(DoubleType), 2)
          .as("avg_daily_rev"),
        round((dd(col("srev")) / col("n_days").cast(DoubleType)) /
          (dd(col("tot_rev")) / col("tot_days").cast(DoubleType)), 9)
          .as("seasonal_index"))
      .orderBy("dow")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_seasonal_index"       -> timeSeasonalIndex _,
    "stat_pairwise_corr"        -> statPairwiseCorr _,
    "time_burstiness"           -> timeBurstiness _,
    "agg_winsorized_mean" -> aggWinsorizedMean _,
    "stat_bootstrap_ci" -> statBootstrapCi _,
    "agg_percentile_interp"     -> aggPercentileInterp _,
    "window_mom_change"         -> windowMomChange _,
    "window_twap"               -> windowTwap _,
    "agg_weighted_percentile"   -> aggWeightedPercentile _,
    "agg_gini_index"            -> aggGiniIndex _,
    "etl_incremental_mv"        -> etlIncrementalMv _,
    "window_attribution_lasttouch" -> windowAttributionLasttouch _,
    "window_cusum_drift"        -> windowCusumDrift _,
    "agg_ks_drift"              -> aggKsDrift _,
    "stat_mann_whitney"         -> statMannWhitney _,
    "time_gap_stats"            -> timeGapStats _,
    "stat_cuped_adjustment"     -> statCupedAdjustment _,
    "agg_ttest_welch"           -> aggTtestWelch _,
    "agg_proportions_ztest"     -> aggProportionsZtest _,
    "pipeline_experiment_readout" -> pipelineExperimentReadout _,
    "etl_dq_profile"            -> etlDqProfile _,
    "etl_fk_orphan_check"       -> etlFkOrphanCheck _,
    "window_rolling_anomaly"    -> windowRollingAnomaly _,
    "window_ewma_halflife"      -> windowEwmaHalflife _,
    "etl_snapshot_diff"         -> etlSnapshotDiff _,
    "agg_regression_pack"       -> aggRegressionPack _,
    "agg_mad_outliers"          -> aggMadOutliers _,
    "window_interpolate_linear" -> windowInterpolateLinear _,
    "window_drawdown"           -> windowDrawdown _,
    "window_bollinger_bands"    -> windowBollingerBands _,
    "agg_simpson_diversity"     -> aggSimpsonDiversity _,
    "window_attribution_ushaped" -> windowAttributionUshaped _,
    "agg_benford_firstdigit"    -> aggBenfordFirstDigit _,
  )

  val oracle: Map[String, String] = Map(
    "time_seasonal_index" ->
      """WITH daily AS (
        |  SELECT o_orderdate,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY o_orderdate),
        |dw AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
        |    COUNT(*) AS n_days, SUM(rev) AS srev
        |  FROM daily GROUP BY 1),
        |g AS (SELECT COUNT(*) AS tot_days, SUM(rev) AS tot_rev FROM daily)
        |SELECT dow, n_days,
        |  ROUND(CAST(CAST(srev AS VARCHAR) AS DOUBLE) /
        |        CAST(n_days AS DOUBLE), 2) AS avg_daily_rev,
        |  ROUND((CAST(CAST(srev AS VARCHAR) AS DOUBLE) /
        |         CAST(n_days AS DOUBLE)) /
        |        (CAST(CAST(tot_rev AS VARCHAR) AS DOUBLE) /
        |         CAST(tot_days AS DOUBLE)), 9) AS seasonal_index
        |FROM dw CROSS JOIN g ORDER BY dow""".stripMargin,
    "stat_pairwise_corr" -> {
      val keys = Seq("q" -> "l_quantity", "p" -> "l_extendedprice",
        "dc" -> "l_discount", "tx" -> "l_tax")
      val ks = keys.map(_._1)
      val castCols = keys.map { case (a, c) =>
        s"CAST($c AS DECIMAL(18,2)) AS $a" }.mkString(", ")
      val moments = (ks.map(v => s"SUM($v) AS s_$v") ++
        (for { i <- ks.indices; j <- i until ks.length }
          yield s"SUM(${ks(i)} * ${ks(j)}) AS s_${ks(i)}_${ks(j)}")).mkString(", ")
      val dbls = (ks.map(v => s"CAST(CAST(s_$v AS VARCHAR) AS DOUBLE) AS s_$v") ++
        (for { i <- ks.indices; j <- i until ks.length }
          yield s"CAST(CAST(s_${ks(i)}_${ks(j)} AS VARCHAR) AS DOUBLE) AS s_${ks(i)}_${ks(j)}"))
        .mkString(", ")
      def rSel(lbl: String, a: String, b: String) =
        s"SELECT '$lbl' AS pair, ROUND((nd * s_${a}_$b - s_$a * s_$b) / " +
          s"(sqrt(nd * s_${a}_$a - s_$a * s_$a) * " +
          s"sqrt(nd * s_${b}_$b - s_$b * s_$b)), 9) AS r FROM d"
      s"""WITH li AS (SELECT $castCols FROM lineitem),
         |m AS (SELECT COUNT(*) AS n, $moments FROM li),
         |d AS (SELECT CAST(n AS DOUBLE) AS nd, $dbls FROM m)
         |${rSel("quantity_price", "q", "p")}
         |UNION ALL ${rSel("quantity_discount", "q", "dc")}
         |UNION ALL ${rSel("quantity_tax", "q", "tx")}
         |UNION ALL ${rSel("price_discount", "p", "dc")}
         |UNION ALL ${rSel("price_tax", "p", "tx")}
         |UNION ALL ${rSel("discount_tax", "dc", "tx")}
         |ORDER BY pair""".stripMargin
    },
    "time_burstiness" ->
      """WITH e AS (SELECT event_type, user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |g AS (SELECT event_type,
        |    sec - LAG(sec, 1) OVER (PARTITION BY event_type, user_id
        |      ORDER BY sec, event_id) AS gap
        |  FROM e),
        |a AS (SELECT event_type, COUNT(*) AS n_gaps,
        |    CAST(SUM(gap) AS BIGINT) AS s1,
        |    SUM(CAST(gap AS DECIMAL(18,0)) * CAST(gap AS DECIMAL(18,0))) AS s2
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type),
        |d AS (SELECT event_type, n_gaps,
        |    CAST(n_gaps AS DOUBLE) AS nd,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
        |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d
        |  FROM a),
        |f AS (SELECT event_type, n_gaps, s1d / nd AS mu,
        |    sqrt(nd * s2d - s1d * s1d) / nd AS sigma
        |  FROM d)
        |SELECT event_type, n_gaps, ROUND(mu, 9) AS mean_gap_s,
        |  ROUND(sigma, 9) AS sd_gap_s,
        |  CASE WHEN sigma + mu > 0.0
        |       THEN ROUND((sigma - mu) / (sigma + mu), 9) END AS burstiness
        |FROM f ORDER BY event_type""".stripMargin,
    "agg_winsorized_mean" ->
      """WITH r AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
        |               l_orderkey, l_linenumber) AS rk,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, price, rk, n,
        |    (n + 19) // 20 AS k05, (n * 95 + 99) // 100 AS k95
        |  FROM r),
        |v AS (
        |  SELECT l_returnflag, price, rk, n, k05, k95,
        |    MAX(CASE WHEN rk <= k05 THEN price END)
        |      OVER (PARTITION BY l_returnflag) AS p05,
        |    MAX(CASE WHEN rk <= k95 THEN price END)
        |      OVER (PARTITION BY l_returnflag) AS p95
        |  FROM c)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(MIN(p05) AS DOUBLE) AS p05,
        |  CAST(MIN(p95) AS DOUBLE) AS p95,
        |  CAST(SUM(price) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_plain,
        |  CAST(SUM(CASE WHEN price > p95 THEN p95
        |                WHEN price < p05 THEN p05 ELSE price END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS mean_winsorized,
        |  CAST(SUM(CASE WHEN rk >= k05 AND rk <= k95 THEN price END)
        |    AS DOUBLE) /
        |  CAST(CAST(SUM(CASE WHEN rk >= k05 AND rk <= k95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) AS mean_trimmed
        |FROM v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "stat_bootstrap_ci" ->
      s"""WITH base AS (
         |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         |    (${OracleSql.fold32("'boot:' || CAST(o_orderkey AS VARCHAR)")}) AS h0
         |  FROM orders),
         |fan AS (
         |  SELECT b.b AS b, base.h0 AS h0, base.x AS x
         |  FROM base CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b),
         |wts AS (
         |  SELECT b, x,
         |    CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1 WHEN h < 920 THEN 2
         |         WHEN h < 981 THEN 3 WHEN h < 996 THEN 4 ELSE 5 END AS w
         |  FROM (SELECT b, x,
         |    (((2*b + 3)*h0 + b*2654435761) % 4294967311) % 1000 AS h
         |    FROM fan)),
         |means AS (
         |  SELECT b, CAST(SUM(w * x) AS DOUBLE) /
         |    CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS m
         |  FROM wts GROUP BY b)
         |SELECT COUNT(*) AS n_resamples,
         |  list_sort(list(m))[4] AS p5,
         |  list_sort(list(m))[32] AS p50,
         |  list_sort(list(m))[61] AS p95
         |FROM means""".stripMargin,
    "agg_weighted_percentile" ->
      """WITH t AS (SELECT l_returnflag,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS w
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, v, w,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM t)
        |SELECT l_returnflag,
        |  CAST(MIN(v) AS DOUBLE) AS weighted_median,
        |  CAST(CAST(MIN(tot) AS VARCHAR) AS DOUBLE) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_gini_index" ->
      // VARCHAR hop on both casts: DuckDB's direct DECIMAL→DOUBLE
      // double-rounds (round-4 recipe)
      """WITH r AS (SELECT o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
        |      AS DECIMAL(18,0)) AS i
        |  FROM orders),
        |a AS (SELECT o_orderpriority, COUNT(*) AS n_orders,
        |    SUM(x) AS s0, SUM(x * i) AS s1
        |  FROM r GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n_orders,
        |  CAST(CAST(s1 * 2 - s0 * (n_orders + 1) AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(s0 * n_orders AS VARCHAR) AS DOUBLE) AS gini
        |FROM a ORDER BY o_orderpriority""".stripMargin,
    "etl_incremental_mv" ->
      // full recompute in one pass — the state-merge must be
      // indistinguishable from it (the mergeability contract)
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
        |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
        |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "window_attribution_lasttouch" ->
      // two LAST_VALUE IGNORE NULLS columns instead of the engine's one
      // struct: both expressions are null on exactly the same rows, so
      // the same touch row feeds both
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |tagged AS (
        |  SELECT *,
        |    LAST_VALUE(CASE WHEN event_type IN ('click','view') THEN sec END
        |      IGNORE NULLS) OVER lw AS tsec,
        |    LAST_VALUE(CASE WHEN event_type IN ('click','view') THEN event_type END
        |      IGNORE NULLS) OVER lw AS ttype
        |  FROM ev
        |  WINDOW lw AS (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT COALESCE(CASE WHEN tsec >= sec - 604800 THEN ttype END, 'none')
        |    AS touch_type,
        |  COUNT(*) AS n_conv,
        |  CAST(SUM(v) AS DOUBLE) AS attributed_value
        |FROM tagged WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_cusum_drift" ->
      // identical prefix transformation; DECIMAL throughout, one final
      // display cast; event_id is unique per user so the default RANGE
      // frame equals ROWS on both engines
      s"""WITH y AS (
         |  SELECT user_id, event_id,
         |    CAST(value AS DECIMAL(18,6)) -
         |      CAST('$CusumRef' AS DECIMAL(18,6)) AS y
         |  FROM events),
         |c AS (SELECT user_id, event_id, y,
         |    SUM(y) OVER (PARTITION BY user_id ORDER BY event_id) AS c
         |  FROM y),
         |m0 AS (SELECT user_id, event_id, c,
         |    MIN(c) OVER (PARTITION BY user_id ORDER BY event_id) AS m
         |  FROM c),
         |-- NOT least(): DuckDB's LEAST on DECIMAL(38,6) operands
         |-- promotes to DOUBLE, silently breaking the exact-decimal
         |-- chain; CASE keeps the decimal type
         |sdf AS (SELECT user_id, event_id,
         |    c - (CASE WHEN m < 0 THEN m ELSE CAST(0 AS DECIMAL(38,6)) END)
         |      AS s
         |  FROM m0),
         |r AS (SELECT user_id, event_id, s,
         |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s DESC, event_id)
         |      AS rk,
         |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
         |  FROM sdf)
         |SELECT user_id, n_events,
         |  CAST(CAST(s AS VARCHAR) AS DOUBLE) AS peak_cusum,
         |  event_id AS peak_event_id,
         |  s > CAST('$CusumThreshold' AS DECIMAL(18,6)) AS drifted
         |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "agg_ks_drift" ->
      // same integer cross-product form; SUM(BIGINT) is HUGEINT in
      // DuckDB -> cast back before the products
      s"""WITH g AS (
         |  SELECT event_type, value,
         |    (${OracleSql.fold32("'ks:' || CAST(event_id AS VARCHAR)")}) % 2
         |      AS g
         |  FROM events),
         |pv AS (SELECT event_type, value,
         |    COUNT(CASE WHEN g = 0 THEN 1 END) AS a_at,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) AS b_at
         |  FROM g GROUP BY 1, 2),
         |cum AS (SELECT event_type,
         |    CAST(SUM(a_at) OVER w AS BIGINT) AS ca,
         |    CAST(SUM(b_at) OVER w AS BIGINT) AS cb,
         |    CAST(SUM(a_at) OVER t AS BIGINT) AS na,
         |    CAST(SUM(b_at) OVER t AS BIGINT) AS nb
         |  FROM pv
         |  WINDOW w AS (PARTITION BY event_type ORDER BY value),
         |         t AS (PARTITION BY event_type))
         |SELECT event_type, MIN(na) AS n_a, MIN(nb) AS n_b,
         |  CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE) /
         |    CAST(MIN(na) * MIN(nb) AS DOUBLE) AS ks_stat
         |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin,
    "pipeline_experiment_readout" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-25'
         |      THEN CAST(value AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
         |    SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-25'
         |      THEN CAST(value AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y,
         |    MAX(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-25'
         |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         |    (${OracleSql.fold32("'exp:' || CAST(user_id AS VARCHAR)")}) % 2
         |      AS g
         |  FROM events GROUP BY user_id),
         |a AS (SELECT
         |    COUNT(CASE WHEN g = 0 THEN 1 END) AS n_a,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) AS n_b,
         |    CAST(SUM(CASE WHEN g = 0 THEN y END) AS DOUBLE) AS sya,
         |    CAST(SUM(CASE WHEN g = 1 THEN y END) AS DOUBLE) AS syb,
         |    CAST(SUM(CASE WHEN g = 0 THEN y * y END) AS DOUBLE) AS syya,
         |    CAST(SUM(CASE WHEN g = 1 THEN y * y END) AS DOUBLE) AS syyb,
         |    CAST(SUM(CASE WHEN g = 0 THEN x END) AS DOUBLE) AS sxa,
         |    CAST(SUM(CASE WHEN g = 1 THEN x END) AS DOUBLE) AS sxb,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
         |    CAST(SUM(CASE WHEN g = 0 THEN conv END) AS BIGINT) AS ca,
         |    CAST(SUM(CASE WHEN g = 1 THEN conv END) AS BIGINT) AS cb
         |  FROM pu),
         |m AS (SELECT n_a, n_b, sya, syb, sxa, sxb, sx, sy, sxx, sxy, ca, cb,
         |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
         |    (syya - sya * sya / CAST(n_a AS DOUBLE)) /
         |      (CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (syyb - syb * syb / CAST(n_b AS DOUBLE)) /
         |      (CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM a),
         |t AS (SELECT *,
         |    sya / na - syb / nb AS raw_diff,
         |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
         |    CAST(ca AS DOUBLE) / na AS conv_a,
         |    CAST(cb AS DOUBLE) / nb AS conv_b,
         |    CAST(ca + cb AS DOUBLE) / n AS pp
         |  FROM m)
         |SELECT n_a, n_b, raw_diff,
         |  raw_diff / sqrt(va / na + vb / nb) AS t_welch,
         |  theta,
         |  (sya / na - theta * (sxa / na)) - (syb / nb - theta * (sxb / nb))
         |    AS cuped_adj_diff,
         |  conv_a, conv_b,
         |  (conv_a - conv_b) / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
         |    AS z_conversion
         |FROM t""".stripMargin,
    "agg_proportions_ztest" ->
      s"""WITH g AS (
         |  SELECT (${OracleSql.fold32("'pz:' || CAST(event_id AS VARCHAR)")})
         |      % 2 AS g,
         |    event_type = 'purchase' AS c
         |  FROM events),
         |a AS (SELECT
         |    COUNT(CASE WHEN g = 0 THEN 1 END) AS n_a,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) AS n_b,
         |    COUNT(CASE WHEN g = 0 AND c THEN 1 END) AS x_a,
         |    COUNT(CASE WHEN g = 1 AND c THEN 1 END) AS x_b
         |  FROM g),
         |m AS (SELECT n_a, n_b, x_a, x_b,
         |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         |    CAST(x_a AS DOUBLE) AS xa, CAST(x_b AS DOUBLE) AS xb
         |  FROM a)
         |SELECT n_a, n_b, x_a, x_b,
         |  xa / na AS p_a, xb / nb AS p_b,
         |  (xa / na - xb / nb) / sqrt(
         |    ((xa + xb) / (na + nb)) * (1.0 - (xa + xb) / (na + nb)) *
         |    (1.0 / na + 1.0 / nb)) AS z
         |FROM m""".stripMargin,
    "agg_ttest_welch" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         |    (${OracleSql.fold32("'tt:' || CAST(event_id AS VARCHAR)")}) % 2
         |      AS g
         |  FROM events),
         |a AS (SELECT event_type,
         |    COUNT(CASE WHEN g = 0 THEN 1 END) AS n_a,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) AS n_b,
         |    CAST(SUM(CASE WHEN g = 0 THEN v END) AS DOUBLE) AS sa,
         |    CAST(SUM(CASE WHEN g = 1 THEN v END) AS DOUBLE) AS sb,
         |    CAST(SUM(CASE WHEN g = 0 THEN v * v END) AS DOUBLE) AS ssa,
         |    CAST(SUM(CASE WHEN g = 1 THEN v * v END) AS DOUBLE) AS ssb
         |  FROM g GROUP BY event_type),
         |m AS (SELECT event_type, n_a, n_b,
         |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         |    sa, sb, ssa, ssb,
         |    (ssa - sa * sa / CAST(n_a AS DOUBLE)) /
         |      (CAST(n_a AS DOUBLE) - 1.0) AS va,
         |    (ssb - sb * sb / CAST(n_b AS DOUBLE)) /
         |      (CAST(n_b AS DOUBLE) - 1.0) AS vb
         |  FROM a),
         |t AS (SELECT event_type, n_a, n_b, na, nb, sa, sb,
         |    va / na AS ta, vb / nb AS tb
         |  FROM m)
         |SELECT event_type, n_a, n_b,
         |  sa / na - sb / nb AS mean_diff,
         |  (sa / na - sb / nb) / sqrt(ta + tb) AS t_welch,
         |  (ta + tb) * (ta + tb) /
         |    (ta * ta / (na - 1.0) + tb * tb / (nb - 1.0)) AS df_welch
         |FROM t ORDER BY event_type""".stripMargin,
    "stat_cuped_adjustment" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-25'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
        |    SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-25'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        |  FROM events GROUP BY user_id),
        |s AS (SELECT COUNT(*) AS cnt,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy
        |  FROM pu),
        |m AS (SELECT cnt,
        |    (sxx - sx * sx / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)
        |      AS vx,
        |    (syy - sy * sy / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)
        |      AS vy,
        |    (sxy - sx * sy / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)
        |      AS c
        |  FROM s)
        |SELECT cnt AS n_users, c / vx AS theta, vy AS var_post,
        |  vy - c * c / vx AS var_adjusted,
        |  100.0 * (c * c) / (vx * vy) AS reduction_pct
        |FROM m""".stripMargin,
    "time_gap_stats" ->
      """WITH e AS (SELECT event_type, user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |g AS (SELECT event_type,
        |    sec - LAG(sec, 1) OVER (PARTITION BY event_type, user_id
        |      ORDER BY sec, event_id) AS gap
        |  FROM e),
        |gg AS (SELECT event_type, gap,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT event_type, MAX(n) AS n_gaps,
        |  MIN(gap) AS min_gap_s,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS p50_gap_s,
        |  MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN gap END) AS p90_gap_s,
        |  MAX(gap) AS max_gap_s,
        |  CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_s
        |FROM gg GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stat_mann_whitney" ->
      // doubled rank sums keep every pre-division term BIGINT-exact;
      // the z expression mirrors the engine's association exactly
      // (casts of exact ints, one division chain, one IEEE sqrt)
      s"""WITH g AS (
         |  SELECT event_type, value,
         |    (${OracleSql.fold32("'mw:' || CAST(event_id AS VARCHAR)")}) % 2
         |      AS g
         |  FROM events),
         |pv AS (SELECT event_type, value,
         |    COUNT(CASE WHEN g = 0 THEN 1 END) AS a_at,
         |    COUNT(CASE WHEN g = 1 THEN 1 END) AS b_at
         |  FROM g GROUP BY 1, 2),
         |tg AS (SELECT event_type, a_at, b_at, a_at + b_at AS t,
         |    CAST(SUM(a_at + b_at) OVER w AS BIGINT) - (a_at + b_at)
         |      AS c_prev
         |  FROM pv
         |  WINDOW w AS (PARTITION BY event_type ORDER BY value)),
         |agg AS (SELECT event_type,
         |    CAST(SUM(a_at) AS BIGINT) AS n_a,
         |    CAST(SUM(b_at) AS BIGINT) AS n_b,
         |    CAST(SUM(a_at * (2 * c_prev + t + 1)) AS BIGINT) AS r2a,
         |    CAST(SUM(t * t * t - t) AS BIGINT) AS sum_t3
         |  FROM tg GROUP BY event_type),
         |z AS (SELECT event_type, n_a, n_b,
         |    CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
         |    SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) *
         |      (CAST(n_a + n_b + 1 AS DOUBLE) -
         |        CAST(sum_t3 AS DOUBLE) /
         |        CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)) / 12.0)
         |      AS sigma
         |  FROM agg)
         |SELECT event_type, n_a, n_b, u_a,
         |  CASE WHEN sigma > 0.0 THEN
         |    (u_a - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) / sigma
         |  END AS z
         |FROM z ORDER BY event_type""".stripMargin,
    "etl_dq_profile" ->
      """WITH m AS (
        |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val
        |    FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_totalprice',
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders)
        |SELECT col_name, COUNT(*) AS n,
        |  COUNT(CASE WHEN val IS NULL THEN 1 END) AS n_null,
        |  COUNT(DISTINCT val) AS n_distinct,
        |  MIN(val) AS vmin, MAX(val) AS vmax
        |FROM m GROUP BY col_name ORDER BY col_name""".stripMargin,
    "etl_fk_orphan_check" ->
      """SELECT 'lineitem->orders' AS relation,
        |  (SELECT COUNT(*) FROM lineitem) AS n_rows,
        |  (SELECT COUNT(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        |UNION ALL
        |SELECT 'lineitem->part',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM part p
        |                     WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey))
        |ORDER BY relation""".stripMargin,
    "window_rolling_anomaly" ->
      // identical moment arithmetic from the same exact decimal frame
      // sums; VARCHAR-hop casts (sum-of-squares exceeds 2^53 scaled
      // units, where DuckDB's direct decimal→double cast double-rounds)
      """WITH b AS (
        |  SELECT user_id, event_id, value AS v,
        |    COUNT(vd) OVER w AS n_w,
        |    CAST(CAST(SUM(vd) OVER w AS VARCHAR) AS DOUBLE) AS s_w,
        |    CAST(CAST(SUM(vd * vd) OVER w AS VARCHAR) AS DOUBLE) AS ss_w
        |  FROM (SELECT user_id, event_id, value,
        |          CAST(value AS DECIMAL(18,6)) AS vd FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
        |c AS (
        |  SELECT user_id, event_id, v,
        |    s_w / CAST(n_w AS DOUBLE) AS mu,
        |    sqrt((ss_w - s_w * s_w / CAST(n_w AS DOUBLE)) /
        |         (CAST(n_w AS DOUBLE) - 1.0)) AS sd
        |  FROM b WHERE n_w = 5)
        |SELECT user_id, event_id, v, mu, sd,
        |  ABS(v - mu) > sd * 2 AS is_anomaly
        |FROM c ORDER BY user_id, event_id""".stripMargin,
    "window_ewma_halflife" ->
      // identical integer-weighted exact-decimal numerator/denominator;
      // VARCHAR-hop on the decimal→double cast (DuckDB's direct cast
      // double-rounds), then ONE IEEE division of identical operands
      {
        val num = (0 to 7)
          .map(k => s"COALESCE(l$k * ${1 << (7 - k)}, 0)").mkString(" + ")
        val den = (0 to 7)
          .map(k => s"CASE WHEN l$k IS NOT NULL THEN ${1 << (7 - k)} ELSE 0 END")
          .mkString(" + ")
        val lags = (0 to 7).map(k => s"LAG(vd, $k) OVER w AS l$k").mkString(", ")
        s"""WITH b AS (
           |  SELECT user_id, event_id, CAST(value AS DECIMAL(18,6)) AS vd
           |  FROM events),
           |l AS (
           |  SELECT user_id, event_id, vd, $lags
           |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |SELECT user_id, event_id,
           |  CAST(CAST($num AS VARCHAR) AS DOUBLE) /
           |    CAST($den AS DOUBLE) AS ewma
           |FROM l WHERE vd IS NOT NULL ORDER BY user_id, event_id""".stripMargin
      },
    "etl_snapshot_diff" ->
      """WITH snap_a AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS pr
        |  FROM orders WHERE o_orderkey % 10 <> 0),
        |snap_b AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DECIMAL(18,2)) +
        |      CASE WHEN o_orderkey % 3 = 0 THEN CAST('1.00' AS DECIMAL(18,2))
        |           ELSE CAST('0.00' AS DECIMAL(18,2)) END AS pr
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT COALESCE(snap_a.k, snap_b.k) AS o_orderkey,
        |  CASE WHEN snap_a.k IS NULL THEN 'added'
        |       WHEN snap_b.k IS NULL THEN 'deleted'
        |       ELSE 'changed' END AS change
        |FROM snap_a FULL JOIN snap_b ON snap_a.k = snap_b.k
        |WHERE snap_a.k IS NULL OR snap_b.k IS NULL
        |   OR snap_a.pr <> snap_b.pr OR snap_a.st <> snap_b.st
        |ORDER BY o_orderkey""".stripMargin,
    // NOTE the VARCHAR hop on every decimal→double: DuckDB's direct
    // DECIMAL→DOUBLE divides the int128 payload by 10^scale in double
    // arithmetic (double-rounds — measured off by 1 ulp on Σy² here),
    // while its string→double parse and Spark's BigDecimal.doubleValue
    // are both correctly rounded.
    "agg_regression_pack" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS cnt,
        |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(x*x) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(y*y) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(x*y) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM (SELECT l_returnflag, l_linestatus,
        |          CAST(l_discount AS DECIMAL(18,2)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem)
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, cnt AS n,
        |  (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
        |  (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n AS intercept,
        |  ((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
        |    ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS r2
        |FROM s ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_mad_outliers" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS g, o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders),
        |med AS (
        |  SELECT g, MAX(x) AS med FROM (
        |    SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x, k) AS r,
        |      COUNT(*) OVER (PARTITION BY g) AS n
        |    FROM base)
        |  WHERE r * 2 <= n + 1 GROUP BY g),
        |dev AS (
        |  SELECT base.g, base.k, base.x, med.med, ABS(base.x - med.med) AS ad
        |  FROM base JOIN med ON base.g = med.g),
        |mad AS (
        |  SELECT g, MAX(ad) AS mad FROM (
        |    SELECT g, ad, row_number() OVER (PARTITION BY g ORDER BY ad, k) AS r,
        |      COUNT(*) OVER (PARTITION BY g) AS n
        |    FROM dev)
        |  WHERE r * 2 <= n + 1 GROUP BY g)
        |SELECT dev.g AS o_orderstatus, COUNT(*) AS n,
        |  CAST(CAST(MAX(dev.med) AS VARCHAR) AS DOUBLE) AS med,
        |  CAST(CAST(MAX(mad.mad) AS VARCHAR) AS DOUBLE) AS mad,
        |  COUNT(CASE WHEN dev.ad > mad.mad * 3 THEN 1 END) AS n_outliers
        |FROM dev JOIN mad ON dev.g = mad.g
        |GROUP BY dev.g ORDER BY o_orderstatus""".stripMargin,
    "window_interpolate_linear" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(day(ts) AS BIGINT) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM (
        |    SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
        |    FROM daily GROUP BY user_id)),
        |j AS (
        |  SELECT spine.user_id, spine.day, daily.v,
        |    LAST_VALUE(daily.v IGNORE NULLS) OVER
        |      (PARTITION BY spine.user_id ORDER BY spine.day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    LAST_VALUE(CASE WHEN daily.v IS NOT NULL THEN spine.day END
        |      IGNORE NULLS) OVER
        |      (PARTITION BY spine.user_id ORDER BY spine.day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    FIRST_VALUE(daily.v IGNORE NULLS) OVER
        |      (PARTITION BY spine.user_id ORDER BY spine.day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN daily.v IS NOT NULL THEN spine.day END
        |      IGNORE NULLS) OVER
        |      (PARTITION BY spine.user_id ORDER BY spine.day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM spine LEFT JOIN daily
        |    ON spine.user_id = daily.user_id AND spine.day = daily.day)
        |SELECT user_id, day, v IS NOT NULL AS observed,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE) /
        |                              CAST(nd - pd AS DOUBLE)) END AS v_interp
        |FROM j ORDER BY user_id, day""".stripMargin,
    "window_drawdown" ->
      """WITH s AS (SELECT o_custkey, o_orderkey,
        |    MAX(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - CAST(o_totalprice AS DECIMAL(18,2)) AS dd
        |  FROM orders),
        |r AS (SELECT o_custkey, o_orderkey, dd,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY dd DESC, o_orderkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
        |  FROM s)
        |SELECT o_custkey, n_orders, CAST(dd AS DOUBLE) AS max_drawdown,
        |  o_orderkey AS trough_orderkey
        |FROM r WHERE rk = 1 ORDER BY o_custkey""".stripMargin,
    "window_bollinger_bands" ->
      // exact cross-multiplied breach predicate; VARCHAR hop on the
      // wide-decimal→double cast (round-4 recipe)
      """WITH w AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER win
        |      AS DECIMAL(18,2)) AS s1,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) *
        |             CAST(o_totalprice AS DECIMAL(18,2))) OVER win
        |      AS DECIMAL(18,4)) AS s2,
        |    COUNT(*) OVER win AS n
        |  FROM orders
        |  WINDOW win AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
        |b AS (SELECT o_custkey, o_orderkey, x, s1, n,
        |    CAST(n * x - s1 AS DECIMAL(18,2)) AS diff,
        |    CAST(n * s2 - s1 * s1 AS DECIMAL(38,4)) AS var_num
        |  FROM w WHERE n = 5)
        |SELECT o_custkey, o_orderkey, CAST(x AS DOUBLE) AS price,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean5,
        |  SQRT(CAST(CAST(var_num AS VARCHAR) AS DOUBLE)) /
        |    CAST(n AS DOUBLE) AS sigma5
        |FROM b WHERE diff * diff > var_num * CAST(4 AS DECIMAL(2,0))
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "agg_percentile_interp" ->
      """WITH t AS (SELECT l_returnflag AS flag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem),
        |r AS (SELECT flag, cents, ROW_NUMBER() OVER (PARTITION BY flag
        |    ORDER BY cents) AS rk FROM t),
        |c AS (SELECT flag, COUNT(*) AS n FROM t GROUP BY flag),
        |qs AS (SELECT flag, n, q
        |  FROM c CROSS JOIN (SELECT unnest([1, 2, 3]) AS q)),
        |p AS (SELECT flag, q,
        |    ((n - 1) * q) // 4 + 1 AS lo_rk,
        |    ((n - 1) * q) // 4 + 1 +
        |      CASE WHEN ((n - 1) * q) % 4 > 0 THEN 1 ELSE 0 END AS hi_rk,
        |    ((n - 1) * q) % 4 AS frac4
        |  FROM qs),
        |j AS (SELECT p.flag, p.q, p.frac4,
        |    MIN(CASE WHEN r.rk = p.lo_rk THEN r.cents END) AS vlo,
        |    MIN(CASE WHEN r.rk = p.hi_rk THEN r.cents END) AS vhi
        |  FROM r JOIN p ON r.flag = p.flag
        |    AND (r.rk = p.lo_rk OR r.rk = p.hi_rk)
        |  GROUP BY 1, 2, 3)
        |SELECT flag, q * 25 AS pct,
        |  CAST(vlo * (4 - frac4) + vhi * frac4 AS DOUBLE) / 400.0 AS value
        |FROM j ORDER BY flag, pct""".stripMargin,
    "window_mom_change" ->
      // VARCHAR hop on both decimal→double casts (the r4 recipe)
      """WITH m AS (SELECT o_orderpriority AS pri,
        |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT pri, month, rev,
        |    LAG(rev, 1) OVER (PARTITION BY pri ORDER BY month) AS prev
        |  FROM m)
        |SELECT pri, month,
        |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(CAST(rev - prev AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(prev AS VARCHAR) AS DOUBLE) AS mom_change
        |FROM l ORDER BY pri, month""".stripMargin,
    "window_twap" ->
      // VARCHAR hop on the wide-decimal numerator (DuckDB DECIMAL→DOUBLE
      // double-rounds; both engines then divide the same doubles)
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |l AS (SELECT user_id, v,
        |    LEAD(sec, 1) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) - sec AS dt
        |  FROM e),
        |a AS (SELECT user_id, COUNT(*) AS n_intervals,
        |    CAST(SUM(dt) AS BIGINT) AS held_sec, SUM(v * dt) AS num
        |  FROM l WHERE dt IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_intervals, held_sec,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(held_sec AS DOUBLE)
        |    AS twap
        |FROM a WHERE held_sec > 0 ORDER BY user_id""".stripMargin,
    "window_attribution_ushaped" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |t AS (SELECT user_id AS t_user, sec AS tsec, event_id AS tid,
        |    event_type AS ttype
        |  FROM ev WHERE event_type IN ('click', 'view')),
        |p AS (SELECT user_id, sec AS psec, event_id AS pid,
        |    CAST(v * 100 AS BIGINT) AS cents
        |  FROM ev WHERE event_type = 'purchase'),
        |j AS (SELECT p.pid, p.cents, t.tid, t.ttype, t.tsec
        |  FROM p LEFT JOIN t ON p.user_id = t.t_user
        |    AND t.tsec >= p.psec - 604800 AND t.tsec < p.psec),
        |r AS (SELECT pid, cents, ttype,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tsec, tid) AS rk,
        |    COUNT(*) OVER (PARTITION BY pid) AS n_t
        |  FROM j),
        |c AS (SELECT ttype, CASE
        |    WHEN ttype IS NULL THEN cents
        |    WHEN n_t = 1 THEN cents
        |    WHEN n_t = 2 THEN CASE WHEN rk = 1 THEN cents // 2 + cents % 2
        |      ELSE cents // 2 END
        |    WHEN rk = 1 THEN (cents * 2) // 5
        |    WHEN rk = n_t THEN (cents * 2) // 5
        |    WHEN rk = 2 THEN (cents - 2 * ((cents * 2) // 5)) // (n_t - 2)
        |      + (cents - 2 * ((cents * 2) // 5)) % (n_t - 2)
        |    ELSE (cents - 2 * ((cents * 2) // 5)) // (n_t - 2) END AS credit
        |  FROM r)
        |SELECT COALESCE(ttype, 'none') AS touch_type,
        |  COUNT(*) AS n_credits,
        |  CAST(SUM(credit) AS DOUBLE) / 100.0 AS attributed_value
        |FROM c GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "agg_benford_firstdigit" ->
      """WITH t AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |tot AS (SELECT COUNT(*) AS total FROM t),
        |b(digit, benford_p) AS (VALUES
        |  (1, 0.3010299956639812),  (2, 0.17609125905568124),
        |  (3, 0.12493873660829992), (4, 0.09691001300805642),
        |  (5, 0.07918124604762482), (6, 0.06694678963061322),
        |  (7, 0.05799194697768673), (8, 0.05115252244738129),
        |  (9, 0.04575749056067514))
        |SELECT g.digit, g.n,
        |  CAST(g.n AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share,
        |  b.benford_p,
        |  CAST(g.n AS DOUBLE) / CAST(tot.total AS DOUBLE) - b.benford_p
        |    AS dev
        |FROM (SELECT t.digit, COUNT(*) AS n FROM t GROUP BY t.digit) g
        |JOIN b ON g.digit = b.digit CROSS JOIN tot
        |ORDER BY g.digit""".stripMargin,
    "agg_simpson_diversity" ->
      """WITH c AS (SELECT source, lang,
        |    CAST(COUNT(*) AS DECIMAL(18,0)) AS nl
        |  FROM documents GROUP BY source, lang),
        |a AS (SELECT source,
        |    CAST(SUM(nl) AS DECIMAL(18,0)) AS n,
        |    SUM(nl * nl) AS sumsq, COUNT(*) AS n_langs
        |  FROM c GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_docs, n_langs,
        |  CAST(CAST(n * n - sumsq AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(n * n AS VARCHAR) AS DOUBLE) AS simpson
        |FROM a ORDER BY source""".stripMargin,
  )
}
