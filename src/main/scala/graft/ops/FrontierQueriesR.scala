package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Round-9 frontier wave 22 (novelty grep-checked against all 382
  * registry names):
  *
  *  - Isotonic calibration (pool-adjacent-violators as a minimax over
  *    bounded bins) — `text_quality_calibrate` bins a score; isotonic
  *    regression FITS the monotone rate curve, the standard way a
  *    classifier/quality score becomes a usable probability.
  *  - k-anonymity audit — the privacy-risk profile over
  *    quasi-identifier groups (pairs with `etl_erasure_audit`: that
  *    one forgets users, this one measures re-identifiability before
  *    data leaves the house).
  *  - Lead-lag cross-correlation — `time_acf` correlates a series with
  *    ITSELF and `window_rolling_corr` correlates two series at the
  *    same time; the lead-lag scan correlates x(t) with y(t+ℓ) across
  *    a lag window to answer "which metric MOVES FIRST".
  */
object FrontierQueriesR {

  /** ISOTONIC CALIBRATION of order fulfillment rate on price (PAV) —
    * bucket totalprice into fixed 12k-wide bins, then fit the
    * monotone-nondecreasing rate curve via the minimax identity
    * fit(b) = max_{j≤b} min_{k≥b} mean(y over bins j..k), which equals
    * the pool-adjacent-violators solution (Robertson–Wright–Dykstra).
    * Reported next to the raw per-bin rate: where they differ is where
    * the raw curve violated monotonicity (noise a consumer of "price
    * predicts fulfillment" would overfit to).
    *
    * Scale posture: the DATA-sized work is one bin rollup of the fact
    * table (partial-aggregated); everything after runs on the ~42-bin
    * frame — the pair grid and the (b, j, k) minimax join are O(B³/6)
    * ≈ 12k CONSTANT rows regardless of corpus size (the reason the
    * textbook O(n) stack PAV is not needed relationally: bins, not
    * rows, enter the fit). Determinism: prefix sums are exact BIGINTs;
    * each pair mean is ONE double division of identical integers; ties
    * under min/max are exact-equal doubles in both engines; round 9 at
    * the output only. */
  def statIsotonicCalibration(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.orders(s, d)
      .select(floor(col("o_totalprice") / 12000.0).cast(LongType).as("bucket"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("y").as("ys"))
    val wIdx = Window.orderBy("bucket")
    val wCum = wIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = bins
      .withColumn("idx", row_number().over(wIdx).cast(LongType))
      .withColumn("cn", sum("n").over(wCum))
      .withColumn("cy", sum("ys").over(wCum))
    val kSide = p.select(col("idx").as("kidx"), col("cn").as("cnk"),
      col("cy").as("cyk"))
    val jSide = p.select(col("idx").as("jidx"),
      (col("cn") - col("n")).as("cnj0"), (col("cy") - col("ys")).as("cyj0"))
    val pairs = kSide.join(jSide, col("jidx") <= col("kidx"))
      .select(col("jidx"), col("kidx"),
        ((col("cyk") - col("cyj0")).cast(DoubleType) /
          (col("cnk") - col("cnj0")).cast(DoubleType)).as("avg"))
    p.select(col("idx").as("bidx"), col("bucket"), col("n"), col("ys"))
      .join(pairs, col("jidx") <= col("bidx") && col("bidx") <= col("kidx"))
      .groupBy("bidx", "bucket", "n", "ys", "jidx")
      .agg(min("avg").as("mn"))
      .groupBy("bidx", "bucket", "n", "ys")
      .agg(max("mn").as("iso"))
      .select(col("bucket"), col("n"),
        round(col("ys").cast(DoubleType) / col("n").cast(DoubleType), 9)
          .as("rate_raw"),
        round(col("iso"), 9).as("rate_iso"))
      .orderBy("bucket")
  }

  /** k-ANONYMITY AUDIT over customer quasi-identifiers (nation,
    * market segment, 1k-wide balance bucket) — for k ∈ {2, 5, 10}:
    * how many QI groups fall below k, how many ROWS are at risk
    * (re-identifiable among fewer than k peers), and the risk share.
    * The pre-release check a curation pipeline runs before any
    * per-user table leaves the house; min group size 1 means unique
    * individuals exist in the published combination.
    *
    * Scale posture: one QI rollup (the group count is bounded by the
    * QI domain — ~25·5·11 combos — not the row count), then a 3-way
    * broadcast fan-out over the k thresholds. Pure integer counts; the
    * one division rounds at 9. */
  def etlKAnonymity(s: SparkSession, d: String): DataFrame = {
    val g = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast(LongType).as("bal_bucket"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
      .agg(count(lit(1)).as("sz"))
    val ks = s.range(1).select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"))
    g.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_groups"),
        sum("sz").as("n_rows"),
        min("sz").as("min_group_size"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("n_groups_below"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L)).as("rows_at_risk"))
      .select(col("k"), col("n_groups"), col("min_group_size"),
        col("n_groups_below"), col("rows_at_risk"),
        round(col("rows_at_risk").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 9).as("risk_pct"))
      .orderBy("k")
  }

  /** LEAD-LAG CROSS-CORRELATION between daily view and purchase
    * volumes, lags −7 … +7 — Pearson r of (views on day t, purchases
    * on day t+ℓ) over the overlapping day spine per lag. Positive-lag
    * peaks mean views LEAD purchases by ℓ days — the causality-
    * direction screen run before any funnel attribution model.
    * The autocorrelation (`time_acf`) is this with x = y; the rolling
    * correlation is ℓ = 0 localized.
    *
    * Determinism: day keys become INTEGER offsets from a fixed epoch
    * (no date arithmetic at the join — both engines join on exact
    * ints); daily counts are exact BIGINTs, the five moments exact
    * integer sums, r one fixed double tree, round 9.
    *
    * Scale posture: one (day, type) rollup of the fact table; the lag
    * scan joins the ~30-row daily spine to itself 15 times — constant
    * work after the rollup at any corpus size. */
  def timeCrosscorrLeadlag(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(datediff(date_trunc("day", col("ts")).cast(DateType),
        lit("2024-01-01").cast(DateType)).cast(LongType).as("di"),
        col("event_type"))
      .groupBy("di", "event_type").agg(count(lit(1)).as("n"))
    val x = daily.filter(col("event_type") === "view")
      .select(col("di"), col("n").as("xv"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("di").as("dj"), col("n").as("yv"))
    val lags = s.range(-7, 8).select(col("id").as("lag"))
    val joined = x.crossJoin(broadcast(lags))
      .join(y, col("dj") === col("di") + col("lag"))
    val m = joined.groupBy("lag").agg(
      count(lit(1)).as("n_days"),
      sum("xv").as("sx"), sum("yv").as("sy"),
      sum(col("xv") * col("yv")).as("sxy"),
      sum(col("xv") * col("xv")).as("sxx"),
      sum(col("yv") * col("yv")).as("syy"))
    val nD = col("n_days").cast(DoubleType)
    def dc(c: String) = col(c).cast(DoubleType)
    m.select(col("lag"), col("n_days"),
      round((nD * dc("sxy") - dc("sx") * dc("sy")) /
        (sqrt(nD * dc("sxx") - dc("sx") * dc("sx")) *
          sqrt(nD * dc("syy") - dc("sy") * dc("sy"))), 9).as("r"))
      .orderBy("lag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_isotonic_calibration" -> statIsotonicCalibration _,
    "etl_k_anonymity"           -> etlKAnonymity _,
    "time_crosscorr_leadlag"    -> timeCrosscorrLeadlag _,
  )

  val oracle: Map[String, String] = Map(
    "stat_isotonic_calibration" ->
      """WITH bins AS (
        |  SELECT CAST(floor(o_totalprice / 12000.0) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ys
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT bucket, n, ys,
        |    CAST(ROW_NUMBER() OVER (ORDER BY bucket) AS BIGINT) AS idx,
        |    SUM(n) OVER (ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS cn,
        |    SUM(ys) OVER (ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS cy
        |  FROM bins),
        |pairs AS (
        |  SELECT j.idx AS jidx, k.idx AS kidx,
        |    CAST(k.cy - (j.cy - j.ys) AS DOUBLE) /
        |    CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg
        |  FROM p j JOIN p k ON j.idx <= k.idx),
        |mm AS (
        |  SELECT b.idx AS bidx, b.bucket, b.n, b.ys, pr.jidx,
        |    MIN(pr.avg) AS mn
        |  FROM p b JOIN pairs pr ON pr.jidx <= b.idx AND b.idx <= pr.kidx
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT bucket, n,
        |  ROUND(CAST(ys AS DOUBLE) / CAST(n AS DOUBLE), 9) AS rate_raw,
        |  ROUND(MAX(mn), 9) AS rate_iso
        |FROM mm GROUP BY bucket, n, ys
        |ORDER BY bucket""".stripMargin,
    "etl_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM customer GROUP BY 1, 2, 3),
        |ks AS (SELECT unnest([CAST(2 AS BIGINT), 5, 10]) AS k)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(MIN(sz) AS BIGINT) AS min_group_size,
        |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below,
        |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  ROUND(CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(sz) AS DOUBLE), 9) AS risk_pct
        |FROM g CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin,
    "time_crosscorr_leadlag" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '2024-01-01',
        |      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS di,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1, 2),
        |x AS (SELECT di, n AS xv FROM daily WHERE event_type = 'view'),
        |y AS (SELECT di AS dj, n AS yv FROM daily
        |  WHERE event_type = 'purchase'),
        |lags AS (SELECT unnest(range(-7, 8)) AS lag),
        |j AS (
        |  SELECT l.lag, x.xv, y.yv
        |  FROM x CROSS JOIN lags l JOIN y ON y.dj = x.di + l.lag),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
        |    CAST(SUM(xv * yv) AS BIGINT) AS sxy,
        |    CAST(SUM(xv * xv) AS BIGINT) AS sxx,
        |    CAST(SUM(yv * yv) AS BIGINT) AS syy
        |  FROM j GROUP BY 1)
        |SELECT lag, n_days,
        |  ROUND((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) -
        |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS r
        |FROM m ORDER BY lag""".stripMargin,
  )
}
