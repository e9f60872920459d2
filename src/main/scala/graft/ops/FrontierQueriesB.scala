package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.dedup.Dedup.hexFold32
import graft.text.TextAnalysis.isQuality

/** Round-8 third frontier wave: model-evaluation, smoothing and
  * weighted-selection operators (north-star extensions — the reference's
  * analytics stop at counts, `/root/reference/etl_process.py:130-150`).
  * Shared determinism rules are the module conventions of
  * [[FrontierQueries]]: integer/DECIMAL arithmetic until one final
  * fixed double tree, VARCHAR-hop for DECIMAL→DOUBLE, m-ordered folds
  * for any double accumulation, md5+fold32 for hash-derived choices.
  */
object FrontierQueriesB {

  /** Empirical-Bayes pseudo-count (in "global-rate units"). */
  private val ShrinkAlpha = 20

  /** Importance-sampling length scale: p(keep) = min(1, n_chars/400). */
  private val ImpScale = 400L

  /** Length rater threshold for the kappa agreement study. */
  private val KappaLenChars = 300L

  private def hop(c: Column): Column = c.cast(StringType).cast(DoubleType)

  // ------------------------------------------------------------ inequality

  /** PALMA RATIO of customer revenue per nation — top-decile revenue
    * share over bottom-four-decile share, the inequality scalar
    * economists prefer to Gini when the middle is stable (the
    * [[FrontierQueries.aggLorenzPoints]] curve collapsed to the number
    * a data-mix review can threshold; the same operator run over
    * per-domain token counts answers "how head-heavy is this source").
    * Purchasing customers only — a customer with no orders has no
    * revenue row.
    *
    * Determinism: revenue is exact DECIMAL(18,2); ntile(10) over the
    * totally-ordered (rev, custkey) ranking splits identically in both
    * engines; the three shares are VARCHAR-hopped divisions of exact
    * conditional sums, round 9.
    *
    * Scale posture: one keyed rollup, one broadcast dim join, one
    * per-nation ranking window, then a 25-row aggregate — nothing
    * data-sized after the window. */
  def aggPalmaRatio(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .select(col("o_custkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      .groupBy("o_custkey").agg(sum(col("v")).as("rev"))
    val nat = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val w = Window.partitionBy("n_name").orderBy(col("rev"), col("o_custkey"))
    val deciled = rev
      .join(nat, col("o_custkey") === col("c_custkey"))
      .withColumn("decile", ntile(10).over(w).cast(LongType))
    val g = deciled.groupBy("n_name").agg(
      count(lit(1)).as("n_customers"),
      sum(col("rev")).as("tot"),
      sum(when(col("decile") === 10, col("rev"))
        .otherwise(lit(0).cast(DecimalType(18, 2)))).as("top"),
      sum(when(col("decile") <= 4, col("rev"))
        .otherwise(lit(0).cast(DecimalType(18, 2)))).as("bottom"))
    g.select(col("n_name"), col("n_customers"),
      round(hop(col("top")) / hop(col("tot")), 9).as("top10_share"),
      round(hop(col("bottom")) / hop(col("tot")), 9).as("bottom40_share"),
      round(hop(col("top")) / hop(col("bottom")), 9).as("palma_ratio"))
      .orderBy("n_name")
  }

  /** EMPIRICAL-BAYES SHRUNK RETURN RATES per supplier — the smoothed
    * rate ranking every small-sample quality table needs: raw
    * returns/n for a 20-item supplier is noise, so the rate is shrunk
    * toward the global rate with α=20 pseudo-observations
    * ((returns + α·g)/(n + α), the Beta(α·g, α·(1−g)) posterior mean).
    * The identical operator ranks domains by defect rate or sources by
    * refusal rate in a curation QA pass, where the head of a RAW-rate
    * ranking is always the smallest-n stratum.
    *
    * Determinism: returns/n are integers; g is one division; the
    * shrunk rate is one fixed double tree over hopped integers,
    * round 9. The global 1-row aggregate rides a broadcast
    * nested-loop cross join (the module's established globals
    * pattern) — never a shuffle.
    *
    * Scale posture: one partial-aggregated keyed rollup + a broadcast
    * 1-row join + a 20-row TakeOrdered. */
  def aggBayesShrinkage(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_suppkey"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val per = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("returns"))
    val glob = li.agg((sum(col("ret")).cast(DoubleType) /
      count(lit(1)).cast(DoubleType)).as("g"))
    val a = lit(ShrinkAlpha.toDouble)
    per.crossJoin(broadcast(glob))
      .select(col("l_suppkey"), col("n"), col("returns"),
        round(col("returns").cast(DoubleType) / col("n").cast(DoubleType), 9)
          .as("raw_rate"),
        round((col("returns").cast(DoubleType) + a * col("g")) /
          (col("n").cast(DoubleType) + a), 9).as("shrunk_rate"))
      .orderBy(col("shrunk_rate").desc, col("l_suppkey"))
      .limit(20)
  }

  // ------------------------------------------------------------- agreement

  /** COHEN'S KAPPA between two document raters per source — the
    * chance-corrected agreement score every labeling pipeline reports
    * before trusting a cheap classifier (here: the corpus quality gate
    * vs a bare length threshold; in production the same operator
    * scores a distilled filter against the teacher model's labels).
    *
    * Determinism: the confusion cells are pure integer counts;
    * p_o/p_e/κ is one fixed double tree, round 9; a degenerate
    * p_e = 1 marginal yields NULL identically via nullif.
    *
    * Scale posture: one embarrassingly-parallel projection + one
    * partial-aggregated rollup per source — no shuffle wider than the
    * 4-source group-by. */
  def statCohensKappa(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"),
      isQuality(col("text"), TextQueries.stopwords).as("ra"),
      (col("n_chars") >= KappaLenChars).as("rb"))
    val g = docs.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"))
    val nd = col("n").cast(DoubleType)
    val po = (col("n11") + col("n00")).cast(DoubleType) / nd
    val pa = (col("n11") + col("n10")).cast(DoubleType) / nd
    val pb = (col("n11") + col("n01")).cast(DoubleType) / nd
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    g.select(col("source"), col("n"), col("n11"), col("n10"), col("n01"),
      col("n00"), round(po, 9).as("p_observed"),
      round((po - pe) / nullif(lit(1.0) - pe, lit(0.0)), 9).as("kappa"))
      .orderBy("source")
  }

  // ------------------------------------------------------------ regression

  /** TWO-FEATURE OLS VIA NORMAL EQUATIONS per return flag — extended
    * price regressed on quantity and discount, solved in closed form
    * (Cramer's rule on the 3×3 Gram matrix). The one-pass shape is the
    * point: a linear probe / calibration model trains in a SINGLE
    * aggregation over exact moments — no gradient loop, no driver
    * iteration — which is how a 100 TB feature audit fits one scan
    * ([[StatQueries]]' regression pack is the 1-feature sibling).
    *
    * Determinism: all nine moments accumulate in exact DECIMAL
    * (operands are 2-decimal; products are exact scale-4), VARCHAR-hop,
    * then ONE fixed double expression tree shared verbatim with the
    * oracle — β₀/β₁/β₂ and R² round 9.
    *
    * Scale posture: one partial-aggregated rollup to 3 rows; the
    * solve is per-group constant work. */
  def statOlsMulti(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val li = Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast(dec).as("x1"),
      col("l_discount").cast(dec).as("x2"),
      col("l_extendedprice").cast(dec).as("y"))
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast(DoubleType)
    val (sx1, sx2, sy) = (hop(col("sx1")), hop(col("sx2")), hop(col("sy")))
    val (s11, s12, s22) = (hop(col("s11")), hop(col("s12")), hop(col("s22")))
    val (s1y, s2y, syy) = (hop(col("s1y")), hop(col("s2y")), hop(col("syy")))
    // Cramer's rule; every product/difference below is stated in the
    // same order in the DuckDB oracle — the tree IS the contract.
    val det = n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2) +
      sx2 * (sx1 * s12 - s11 * sx2)
    val d0 = sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y) +
      sx2 * (s1y * s12 - s11 * s2y)
    val d1 = n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2) +
      sx2 * (sx1 * s2y - s1y * sx2)
    val d2 = n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2) +
      sy * (sx1 * s12 - s11 * sx2)
    val b1 = d1 / det
    val b2 = d2 / det
    val sst = syy - sy * sy / n
    val ssr = b1 * (s1y - sx1 * sy / n) + b2 * (s2y - sx2 * sy / n)
    m.select(col("l_returnflag"), col("n"),
      round(d0 / det, 9).as("beta0"),
      round(b1, 9).as("beta1"),
      round(b2, 9).as("beta2"),
      round(ssr / sst, 9).as("r2"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------------ time series

  /** AVERAGE TRUE RANGE (14-day) over daily value bars per event type —
    * Wilder's volatility gauge stated with a SIMPLE 14-bar mean (the
    * textbook first-ATR definition; the recursive smoothing variant is
    * [[timeHoltLinear]]'s fold shape applied to TR). True range =
    * max(high−low, |high−prevClose|, |low−prevClose|) — the gap-aware
    * range an anomaly monitor wants when a feed jumps between days.
    *
    * Determinism: bars are exact DECIMAL(18,2) (the OHLC money
    * convention — values are 2-decimal doubles, cast is exact); TR is
    * a greatest() of exact decimal differences; the 14-bar window SUM
    * of decimals is order-insensitive and exact; one VARCHAR-hopped
    * division, round 9. Close is max_by(event_id) — unique key, no
    * tie.
    *
    * Scale posture: one keyed rollup to daily bars, then a per-type
    * window over ~constant-size bar series; the window input is
    * day-granular, not event-granular. */
  def windowAtr(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value").cast(dec).as("v"))
      .groupBy("event_type", "day")
      .agg(max(col("v")).as("high"), min(col("v")).as("low"),
        max_by(col("v"), col("event_id")).as("close"))
    val wo = Window.partitionBy("event_type").orderBy("day")
    val tr = daily
      .withColumn("prev_close", lag(col("close"), 1).over(wo))
      .withColumn("tr", when(col("prev_close").isNull,
        col("high") - col("low"))
        .otherwise(greatest(col("high") - col("low"),
          abs(col("high") - col("prev_close")),
          abs(col("low") - col("prev_close")))))
      .withColumn("rn", row_number().over(wo))
    tr.withColumn("atr_sum", sum(col("tr")).over(
        wo.rowsBetween(-13, Window.currentRow)))
      .filter(col("rn") >= 14)
      .select(col("event_type"), col("day"),
        hop(col("tr")).as("true_range"),
        round(hop(col("atr_sum")) / lit(14.0), 9).as("atr_14"))
      .orderBy("event_type", "day")
  }

  /** HOLT LINEAR-TREND SMOOTHING of daily event counts per type —
    * double exponential smoothing (level + trend, α=0.5, β=0.3) run to
    * the end of the series, emitting the final state and the one-step
    * forecast. This is the simplest forecaster that tracks drift, the
    * natural next step after [[AggWindowQueries]]' seasonal-naive
    * metrics; the same fold monitors ingest volume in a pipeline
    * health dashboard.
    *
    * Determinism — the VECTOR-STATE FOLD recipe (new in this wave):
    * the recursion l_t = αy + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b
    * carries TWO doubles of state, so the established scalar
    * list-fold recipe generalizes to an ARRAY accumulator: Spark
    * `aggregate(..., array(y₁, 0.0), (acc, y) → array(l', b'))` ≡
    * DuckDB `list_reduce(list_prepend([y₁, 0.0], [[y], …]))` (DuckDB's
    * reduce needs acc/element type equality — wrap each observation as
    * a 1-element list). Day order pins the fold order; every step is
    * the same fixed IEEE mult/add sequence in both engines; l' is
    * written out twice inside b' (no cross-engine CSE assumption);
    * round 9 at the end.
    *
    * Scale posture: one keyed rollup to daily counts + one bounded
    * per-type collect (the series is day-granular — ~100 elements per
    * group whatever the corpus size; an unbounded-key variant would
    * window instead). */
  def timeHoltLinear(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val ys = transform(
      sort_array(collect_list(struct(col("day"), col("cnt")))),
      p => p("cnt").cast(DoubleType))
    def lNew(acc: Column, y: Column): Column =
      lit(0.5) * y + lit(0.5) * (element_at(acc, 1) + element_at(acc, 2))
    val folded = daily.groupBy("event_type").agg(ys.as("ys"))
      .select(col("event_type"), size(col("ys")).cast(LongType).as("n_days"),
        aggregate(expr("slice(ys, 2, size(ys) - 1)"),
          array(element_at(col("ys"), 1), lit(0.0)),
          (acc, y) => array(
            lNew(acc, y),
            lit(0.3) * (lNew(acc, y) - element_at(acc, 1)) +
              lit(0.7) * element_at(acc, 2))).as("st"))
    folded.select(col("event_type"), col("n_days"),
      round(element_at(col("st"), 1), 9).as("level"),
      round(element_at(col("st"), 2), 9).as("trend"),
      round(element_at(col("st"), 1) + element_at(col("st"), 2), 9)
        .as("forecast_1"))
      .orderBy("event_type")
  }

  // -------------------------------------------------------------- sampling

  /** IMPORTANCE-WEIGHTED SAMPLE — per-row keep probability
    * proportional to a quality proxy (p = min(1, n_chars/400)): the
    * DSIR-style reweighting actually EXECUTED as a sample, vs
    * [[CurationQueries]]' weight computation. Longer documents keep
    * with certainty, short ones proportionally — the corpus shrinks
    * while its token mass barely moves.
    *
    * Determinism: the coin is fold32(md5(key)) as everywhere in this
    * engine, and the acceptance test is stated ENTIRELY in BIGINT —
    * u·400 < min(400, n_chars)·2³² — so not even the threshold touches
    * a double (u < 2³², u·400 < 2⁴¹: no overflow). The expected-kept
    * accounting is one division of an exact integer sum, round 9 —
    * Horvitz–Thompson bookkeeping with zero FP accumulation.
    *
    * Scale posture: embarrassingly parallel filter + one
    * partial-aggregated rollup. */
  def sampleImportanceWeighted(s: SparkSession, d: String): DataFrame = {
    val scaled = least(lit(ImpScale), col("n_chars"))
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"), scaled.as("w"),
        md5(concat(lit("imp42:"), col("doc_id").cast(StringType))).as("h"))
      .withColumn("keep", hexFold32(col("h")) * lit(ImpScale) <
        col("w") * lit(1L << 32))
    docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      round(sum(col("w")).cast(DoubleType) / lit(ImpScale.toDouble), 9)
        .as("expected_kept"),
      sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"),
      sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_palma_ratio"           -> aggPalmaRatio _,
    "agg_bayes_shrinkage"       -> aggBayesShrinkage _,
    "stat_cohens_kappa"         -> statCohensKappa _,
    "stat_ols_multi"            -> statOlsMulti _,
    "window_atr"                -> windowAtr _,
    "time_holt_linear"          -> timeHoltLinear _,
    "sample_importance_weighted" -> sampleImportanceWeighted _,
  )

  import OracleSql.fold32

  val oracle: Map[String, String] = Map(
    "agg_palma_ratio" ->
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |nat AS (
        |  SELECT c_custkey, n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |dc AS (
        |  SELECT n_name, rev,
        |    CAST(ntile(10) OVER (PARTITION BY n_name
        |      ORDER BY rev, o_custkey) AS BIGINT) AS decile
        |  FROM rev JOIN nat ON o_custkey = c_custkey),
        |g AS (
        |  SELECT n_name, COUNT(*) AS n_customers, SUM(rev) AS tot,
        |    SUM(CASE WHEN decile = 10 THEN rev
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS top,
        |    SUM(CASE WHEN decile <= 4 THEN rev
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS bottom
        |  FROM dc GROUP BY 1)
        |SELECT n_name, n_customers,
        |  ROUND(CAST(CAST(top AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(tot AS VARCHAR) AS DOUBLE), 9) AS top10_share,
        |  ROUND(CAST(CAST(bottom AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(tot AS VARCHAR) AS DOUBLE), 9) AS bottom40_share,
        |  ROUND(CAST(CAST(top AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(bottom AS VARCHAR) AS DOUBLE), 9) AS palma_ratio
        |FROM g ORDER BY n_name""".stripMargin,
    "agg_bayes_shrinkage" ->
      """WITH li AS (
        |  SELECT l_suppkey,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        |  FROM lineitem),
        |per AS (
        |  SELECT l_suppkey, COUNT(*) AS n, CAST(SUM(ret) AS BIGINT)
        |    AS returns
        |  FROM li GROUP BY 1),
        |gl AS (
        |  SELECT CAST(SUM(ret) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS g
        |  FROM li)
        |SELECT l_suppkey, n, returns,
        |  ROUND(CAST(returns AS DOUBLE) / CAST(n AS DOUBLE), 9) AS raw_rate,
        |  ROUND((CAST(returns AS DOUBLE) + 20.0 * g) /
        |    (CAST(n AS DOUBLE) + 20.0), 9) AS shrunk_rate
        |FROM per CROSS JOIN gl
        |ORDER BY shrunk_rate DESC, l_suppkey LIMIT 20""".stripMargin,
    "stat_cohens_kappa" ->
      s"""WITH r AS (
         |  SELECT source,
         |    ${TextQueries.qualityGateSql} AS ra,
         |    n_chars >= $KappaLenChars AS rb
         |  FROM documents),
         |g AS (
         |  SELECT source, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM r GROUP BY 1)
         |SELECT source, n, n11, n10, n01, n00,
         |  ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 9)
         |    AS p_observed,
         |  ROUND((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) -
         |      (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE) *
         |        (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
         |       (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
         |        (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)))) /
         |    NULLIF(1.0 -
         |      (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE) *
         |        (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
         |       (1.0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
         |        (1.0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))),
         |      0.0), 9) AS kappa
         |FROM g ORDER BY source""".stripMargin,
    "stat_ols_multi" -> {
      def hopS(c: String) = s"CAST(CAST($c AS VARCHAR) AS DOUBLE)"
      val n = "CAST(n AS DOUBLE)"
      val (sx1, sx2, sy) = (hopS("sx1"), hopS("sx2"), hopS("sy"))
      val (s11, s12, s22) = (hopS("s11"), hopS("s12"), hopS("s22"))
      val (s1y, s2y, syy) = (hopS("s1y"), hopS("s2y"), hopS("syy"))
      val det = s"($n * ($s11 * $s22 - $s12 * $s12) - " +
        s"$sx1 * ($sx1 * $s22 - $s12 * $sx2) + " +
        s"$sx2 * ($sx1 * $s12 - $s11 * $sx2))"
      val d0 = s"($sy * ($s11 * $s22 - $s12 * $s12) - " +
        s"$sx1 * ($s1y * $s22 - $s12 * $s2y) + " +
        s"$sx2 * ($s1y * $s12 - $s11 * $s2y))"
      val d1 = s"($n * ($s1y * $s22 - $s12 * $s2y) - " +
        s"$sy * ($sx1 * $s22 - $s12 * $sx2) + " +
        s"$sx2 * ($sx1 * $s2y - $s1y * $sx2))"
      val d2 = s"($n * ($s11 * $s2y - $s1y * $s12) - " +
        s"$sx1 * ($sx1 * $s2y - $s1y * $sx2) + " +
        s"$sy * ($sx1 * $s12 - $s11 * $sx2))"
      val b1 = s"($d1 / $det)"
      val b2 = s"($d2 / $det)"
      val sst = s"($syy - $sy * $sy / $n)"
      val ssr = s"($b1 * ($s1y - $sx1 * $sy / $n) + " +
        s"$b2 * ($s2y - $sx2 * $sy / $n))"
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |    CAST(l_quantity AS DECIMAL(18,2)) AS x1,
         |    CAST(l_discount AS DECIMAL(18,2)) AS x2,
         |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
         |    SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
         |    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
         |  FROM b GROUP BY 1)
         |SELECT l_returnflag, n,
         |  ROUND($d0 / $det, 9) AS beta0,
         |  ROUND($b1, 9) AS beta1,
         |  ROUND($b2, 9) AS beta2,
         |  ROUND($ssr / $sst, 9) AS r2
         |FROM m ORDER BY l_returnflag""".stripMargin
    },
    "window_atr" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    MAX(CAST(value AS DECIMAL(18,2))) AS high,
        |    MIN(CAST(value AS DECIMAL(18,2))) AS low,
        |    arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS close
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT event_type, day, high, low,
        |    lag(close) OVER (PARTITION BY event_type ORDER BY day)
        |      AS prev_close,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily),
        |t2 AS (
        |  SELECT event_type, day, rn,
        |    CASE WHEN prev_close IS NULL THEN high - low
        |      ELSE GREATEST(high - low, ABS(high - prev_close),
        |        ABS(low - prev_close)) END AS tr
        |  FROM tr)
        |SELECT event_type, day,
        |  CAST(CAST(tr AS VARCHAR) AS DOUBLE) AS true_range,
        |  ROUND(CAST(CAST(SUM(tr) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS VARCHAR)
        |      AS DOUBLE) / 14.0, 9) AS atr_14
        |FROM t2 QUALIFY rn >= 14
        |ORDER BY event_type, day""".stripMargin,
    "time_holt_linear" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        |      AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT event_type,
        |    list(CAST(cnt AS DOUBLE) ORDER BY day) AS ys
        |  FROM daily GROUP BY 1),
        |folded AS (
        |  SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
        |    list_reduce(
        |      list_prepend([ys[1], 0.0],
        |        list_transform(ys[2:], y -> [y])),
        |      (acc, x) -> [
        |        0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
        |        0.3 * (0.5 * x[1] + 0.5 * (acc[1] + acc[2]) - acc[1])
        |          + 0.7 * acc[2]]) AS st
        |  FROM series)
        |SELECT event_type, n_days,
        |  ROUND(st[1], 9) AS level,
        |  ROUND(st[2], 9) AS trend,
        |  ROUND(st[1] + st[2], 9) AS forecast_1
        |FROM folded ORDER BY event_type""".stripMargin,
    "sample_importance_weighted" ->
      s"""WITH d AS (
         |  SELECT lang, doc_id, n_chars,
         |    LEAST($ImpScale, n_chars) AS w,
         |    (${fold32("'imp42:' || CAST(doc_id AS VARCHAR)")}) * $ImpScale
         |      < LEAST($ImpScale, n_chars) * ${1L << 32} AS keep
         |  FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  ROUND(CAST(SUM(w) AS DOUBLE) / $ImpScale.0, 9) AS expected_kept,
         |  CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS chars_kept,
         |  CAST(SUM(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
         |    AS id_checksum
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
