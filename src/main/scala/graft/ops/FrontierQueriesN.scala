package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Round-8 seventeenth frontier wave: the experimentation-design pair
  * every A/B platform ships next to its readouts (TOST equivalence —
  * "provably no worse", and power/MDE sizing — "how long must this
  * run"), the strength scalars that summarize
  * [[FrontierQueriesD.timeClassicalDecompose]]'s component table
  * (Hyndman's seasonal/trend strength), and process-capability Cpk
  * against stated spec limits (the manufacturing twin of the control
  * chart's empirical bands). Registry novelty grep-checked first
  * (ROUND_NOTES item 23). Module conventions as the earlier waves.
  */
object FrontierQueriesN {

  /** TOST equivalence margin: ±5% of the pooled mean. */
  private val TostMarginFrac = 0.05

  /** Power sizing: z_α + z_β for α=.05 two-sided and power .8, as ONE
    * stated literal — computing 1.96 + 0.8416 in Scala and parsing
    * "2.8016" in SQL can differ in the last ulp (neither addend is
    * binary-exact), so the SUM is the shared constant. */
  private val ZSum = 2.8016

  /** Cpk spec limits for event values, in cents. */
  private val CpkLsl = 0L
  private val CpkUsl = 50000L

  // ----------------------------------------------------------- equivalence

  /** TOST EQUIVALENCE TEST — is the hash-B arm provably WITHIN ±5% of
    * the hash-A arm's mean? Two one-sided Welch t-tests against the
    * margin: equivalence is declared only if BOTH reject (t_lower ≥
    * 1.645 and t_upper ≤ −1.645, the z-approximation stated in-column).
    * The follow-up to [[StatQueries.aggTtestWelch]]'s difference test —
    * a non-significant difference is NOT evidence of equivalence; TOST
    * is. Being hash halves of one population, every type SHOULD pass:
    * the column doubles as a split-quality audit.
    *
    * Determinism: the same six exact-decimal moment sums as the Welch
    * test (salt "tost:"), margin δ = 0.05·pooled mean (an exact-ratio
    * double), and the three t-statistics are one fixed tree each — no
    * rounding needed, the trees are bit-identical by construction.
    *
    * Scale posture: one partial-aggregated rollup to per-type rows. */
  def statTostEquivalence(s: SparkSession, d: String): DataFrame = {
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("tost:"), col("event_id").cast(StringType)))), lit(2L))
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
    val se = sqrt((ssa - sa * sa / na) / (na - lit(1.0)) / na +
      (ssb - sb * sb / nb) / (nb - lit(1.0)) / nb)
    val diff = sa / na - sb / nb
    val delta = lit(TostMarginFrac) * ((sa + sb) / (na + nb))
    agg.select(col("event_type"), col("n_a"), col("n_b"),
        diff.as("mean_diff"), delta.as("margin"),
        ((diff + delta) / se).as("t_lower"),
        ((diff - delta) / se).as("t_upper"),
        ((diff + delta) / se >= 1.645 && (diff - delta) / se <= -1.645)
          .as("equivalent"))
      .orderBy("event_type")
  }

  // ----------------------------------------------------------- power / MDE

  /** POWER / MDE SIZING for the purchase-conversion metric — with the
    * observed per-user conversion rate p and the available n per arm
    * (half the user population), report the minimum detectable
    * absolute and relative effect at α=.05 / power .8, and the n per
    * arm a 10%-relative-lift test would need. The "how long must this
    * experiment run" calculator that decides whether an A/B test is
    * even worth starting — the design-time sibling of
    * [[FrontierQueriesH.statSrmCheck]]'s run-time health check.
    *
    * Determinism: p = converters/users is one exact-integer division;
    * z-constants are stated literals; MDE = (z_α+z_β)·√(2p(1−p)/n)
    * and n_req = 2p(1−p)·((z_α+z_β)/(0.1p))² are fixed trees; the
    * required-n readout CEILs to an integer on both engines; round 9.
    *
    * Scale posture: one distinct-user rollup — no joins, no windows. */
  def statPowerMde(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
    val g = users.agg(count(lit(1)).as("n_users"),
      sum(col("converted")).as("n_converters"))
    g.select(col("n_users"), col("n_converters"), {
        val p = col("n_converters").cast(DoubleType) /
          col("n_users").cast(DoubleType)
        val nArm = expr("n_users DIV 2").cast(DoubleType)
        val zsum = lit(ZSum)
        val mdeAbs = zsum * sqrt(lit(2.0) * p * (lit(1.0) - p) / nArm)
        val nReq = ceil(lit(2.0) * p * (lit(1.0) - p) *
          (zsum / (lit(0.1) * p)) * (zsum / (lit(0.1) * p))).cast(LongType)
        struct(round(p, 9).as("conv_rate"),
          round(mdeAbs, 9).as("mde_abs"),
          round(mdeAbs / p, 9).as("mde_rel"),
          nReq.as("n_per_arm_for_10pct")).as("r")
      })
      .select(col("n_users"), col("n_converters"),
        col("r.conv_rate").as("conv_rate"), col("r.mde_abs").as("mde_abs"),
        col("r.mde_rel").as("mde_rel"),
        col("r.n_per_arm_for_10pct").as("n_per_arm_for_10pct"))
  }

  // -------------------------------------------------------------- strength

  /** SEASONAL / TREND STRENGTH (Hyndman) — per event type,
    * F_s = max(0, 1 − Var(R)/Var(S+R)) and
    * F_t = max(0, 1 − Var(R)/Var(T+R)) over the SAME decomposition
    * table as [[FrontierQueriesD.timeClassicalDecompose]] (shared via
    * PipelineCache): the two scalars that rank hundreds of series by
    * "does this have a weekly rhythm / a trend worth modeling" without
    * reading the component plots.
    *
    * Determinism: components are the decomposition's bit-identical
    * doubles; all five variance moments fold in day order over the
    * bounded daily frame; the strengths are fixed trees; round 9.
    *
    * Scale posture: reuses the persisted trended base; one per-type
    * fold over the day-granular series. */
  def timeSeasonalStrength(s: SparkSession, d: String): DataFrame = {
    // rebuild the decomposition's component columns (shared persist)
    val decomposed = FrontierQueriesD.timeClassicalDecompose(s, d)
      .select(col("event_type"), col("day"),
        col("seasonal") + col("remainder"), col("trend") + col("remainder"),
        col("remainder"))
      .toDF("event_type", "day", "sr", "tr", "r")
    def foldVar(value: String, prefix: String) = {
      val arr = transform(
        sort_array(collect_list(struct(col("day"), col(value).as("v")))),
        p => p("v"))
      Seq(
        aggregate(arr, lit(0.0), (a, x) => a + x).as(s"${prefix}_s"),
        aggregate(transform(arr, x => x * x), lit(0.0), (a, x) => a + x)
          .as(s"${prefix}_ss"))
    }
    val moments = decomposed.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        (foldVar("sr", "sr") ++ foldVar("tr", "tr") ++ foldVar("r", "r")): _*)
    def variance(pfx: String) = {
      val nd = col("n_days").cast(DoubleType)
      col(s"${pfx}_ss") / nd - (col(s"${pfx}_s") / nd) * (col(s"${pfx}_s") / nd)
    }
    moments.select(col("event_type"), col("n_days"),
        round(greatest(lit(0.0),
          lit(1.0) - variance("r") / variance("sr")), 9)
          .as("seasonal_strength"),
        round(greatest(lit(0.0),
          lit(1.0) - variance("r") / variance("tr")), 9)
          .as("trend_strength"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------ capability

  /** PROCESS CAPABILITY Cpk per event type — min((USL−μ)/3σ,
    * (μ−LSL)/3σ) against the stated $0–$500 value spec: can the
    * process fit its tolerance band, counting how off-center it runs?
    * The SPEC-limit twin of [[AggWindowQueries.windowControlChart]]'s
    * empirical 3σ bands (control asks "is it stable"; capability asks
    * "is stable good enough"), and the same number gates a pipeline
    * SLA ("can p99 latency fit the budget").
    *
    * Determinism: μ and σ come from the exact integer-cents moments
    * (n·Σc² − S² in DECIMAL(38,0)/HUGEINT, VARCHAR-hopped); both
    * capability ratios and their min are one fixed tree; round 9.
    *
    * Scale posture: one constant-width moment rollup per type. */
  def statCpkCapability(s: SparkSession, d: String): DataFrame = {
    val c = (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
    val mom = Tables.events(s, d).select(col("event_type"), c.as("c"))
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("c")).as("sc"),
        sum(col("c").cast(DecimalType(38, 0)) *
          col("c").cast(DecimalType(38, 0))).as("scc"))
    def hop(x: org.apache.spark.sql.Column) =
      x.cast(StringType).cast(DoubleType)
    mom.select(col("event_type"), col("n"), {
        val nd = col("n").cast(DoubleType)
        val mu = col("sc").cast(DoubleType) / nd
        val varN = hop(col("n").cast(DecimalType(38, 0)) * col("scc") -
          col("sc").cast(DecimalType(38, 0)) *
            col("sc").cast(DecimalType(38, 0)))
        val sigma = sqrt(varN / (nd * (col("n") - 1L).cast(DoubleType)))
        val cpu = (lit(CpkUsl.toDouble) - mu) / (lit(3.0) * sigma)
        val cpl = (mu - lit(CpkLsl.toDouble)) / (lit(3.0) * sigma)
        struct(round(mu / 100.0, 9).as("mean_dollars"),
          round(sigma / 100.0, 9).as("sigma_dollars"),
          round(least(cpu, cpl), 9).as("cpk"),
          round((lit(CpkUsl.toDouble) - lit(CpkLsl.toDouble)) /
            (lit(6.0) * sigma), 9).as("cp")).as("r")
      })
      .select(col("event_type"), col("n"),
        col("r.mean_dollars").as("mean_dollars"),
        col("r.sigma_dollars").as("sigma_dollars"),
        col("r.cp").as("cp"), col("r.cpk").as("cpk"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_tost_equivalence"  -> statTostEquivalence _,
    "stat_power_mde"         -> statPowerMde _,
    "time_seasonal_strength" -> timeSeasonalStrength _,
    "stat_cpk_capability"    -> statCpkCapability _,
  )

  import OracleSql.fold32

  val oracle: Map[String, String] = Map(
    "stat_tost_equivalence" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
         |    (${fold32("'tost:' || CAST(event_id AS VARCHAR)")}) % 2 AS g
         |  FROM events),
         |agg AS (
         |  SELECT event_type,
         |    CAST(COUNT(CASE WHEN g = 0 THEN 1 END) AS BIGINT) AS n_a,
         |    CAST(COUNT(CASE WHEN g = 1 THEN 1 END) AS BIGINT) AS n_b,
         |    CAST(CAST(SUM(CASE WHEN g = 0 THEN v END) AS VARCHAR)
         |      AS DOUBLE) AS sa,
         |    CAST(CAST(SUM(CASE WHEN g = 1 THEN v END) AS VARCHAR)
         |      AS DOUBLE) AS sb,
         |    CAST(CAST(SUM(CASE WHEN g = 0 THEN v * v END) AS VARCHAR)
         |      AS DOUBLE) AS ssa,
         |    CAST(CAST(SUM(CASE WHEN g = 1 THEN v * v END) AS VARCHAR)
         |      AS DOUBLE) AS ssb
         |  FROM g GROUP BY 1),
         |t AS (
         |  SELECT event_type, n_a, n_b,
         |    sa / n_a - sb / n_b AS mean_diff,
         |    0.05 * ((sa + sb) / (n_a + n_b)) AS margin,
         |    SQRT((ssa - sa * sa / n_a) / (n_a - 1.0) / n_a +
         |         (ssb - sb * sb / n_b) / (n_b - 1.0) / n_b) AS se
         |  FROM agg)
         |SELECT event_type, n_a, n_b, mean_diff, margin,
         |  (mean_diff + margin) / se AS t_lower,
         |  (mean_diff - margin) / se AS t_upper,
         |  ((mean_diff + margin) / se >= 1.645 AND
         |   (mean_diff - margin) / se <= -1.645) AS equivalent
         |FROM t ORDER BY event_type""".stripMargin,
    "stat_power_mde" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |             CAST(SUM(c) AS BIGINT) AS n_converters FROM u),
        |h AS (
        |  SELECT n_users, n_converters,
        |    CAST(n_converters AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
        |    CAST(n_users // 2 AS DOUBLE) AS n_arm
        |  FROM g)
        |SELECT n_users, n_converters,
        |  ROUND(p, 9) AS conv_rate,
        |  ROUND(2.8016 * SQRT(2.0 * p * (1.0 - p) / n_arm), 9) AS mde_abs,
        |  ROUND(2.8016 * SQRT(2.0 * p * (1.0 - p) / n_arm) / p, 9)
        |    AS mde_rel,
        |  CAST(CEIL(2.0 * p * (1.0 - p) * (2.8016 / (0.1 * p)) *
        |    (2.8016 / (0.1 * p))) AS BIGINT) AS n_per_arm_for_10pct
        |FROM h""".stripMargin,
    "time_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        |      AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt,
        |    MIN(CAST(isodow(date_trunc('day', ts)) AS BIGINT)) AS wd
        |  FROM events GROUP BY 1, 2),
        |trended AS (
        |  SELECT event_type, day, cnt, wd,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn,
        |    CAST(SUM(cnt) OVER (w ROWS BETWEEN 3 PRECEDING AND 3
        |      FOLLOWING) AS BIGINT) AS tsum
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |detrended AS (
        |  SELECT event_type, day, wd,
        |    CAST(cnt AS DOUBLE) - CAST(tsum AS DOUBLE) / 7.0 AS detr
        |  FROM trended WHERE rn > 3 AND rn <= nn - 3),
        |seasonal AS (
        |  SELECT event_type, wd,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(detr ORDER BY day)), (a, x) -> a + x) /
        |      CAST(COUNT(*) AS DOUBLE) AS seasonal
        |  FROM detrended GROUP BY 1, 2),
        |comp AS (
        |  SELECT d.event_type, d.day,
        |    ROUND(s.seasonal, 9) +
        |      ROUND(d.detr - s.seasonal, 9) AS sr,
        |    ROUND(CAST(t.tsum AS DOUBLE) / 7.0, 9) +
        |      ROUND(d.detr - s.seasonal, 9) AS tr,
        |    ROUND(d.detr - s.seasonal, 9) AS r
        |  FROM detrended d
        |  JOIN seasonal s ON d.event_type = s.event_type AND d.wd = s.wd
        |  JOIN trended t ON d.event_type = t.event_type AND d.day = t.day),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sr ORDER BY day)), (a, x) -> a + x) AS sr_s,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(sr * sr ORDER BY day)), (a, x) -> a + x) AS sr_ss,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(tr ORDER BY day)), (a, x) -> a + x) AS tr_s,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(tr * tr ORDER BY day)), (a, x) -> a + x) AS tr_ss,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r ORDER BY day)), (a, x) -> a + x) AS r_s,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * r ORDER BY day)), (a, x) -> a + x) AS r_ss
        |  FROM comp GROUP BY 1)
        |SELECT event_type, n_days,
        |  ROUND(GREATEST(0.0, 1.0 -
        |    (r_ss / n_days - (r_s / n_days) * (r_s / n_days)) /
        |    (sr_ss / n_days - (sr_s / n_days) * (sr_s / n_days))), 9)
        |    AS seasonal_strength,
        |  ROUND(GREATEST(0.0, 1.0 -
        |    (r_ss / n_days - (r_s / n_days) * (r_s / n_days)) /
        |    (tr_ss / n_days - (tr_s / n_days) * (tr_s / n_days))), 9)
        |    AS trend_strength
        |FROM m ORDER BY event_type""".stripMargin,
    "stat_cpk_capability" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |mom AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
        |      AS scc
        |  FROM base GROUP BY 1),
        |h AS (
        |  SELECT event_type, n,
        |    CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    SQRT(CAST(CAST(CAST(n AS HUGEINT) * scc -
        |        CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS VARCHAR)
        |      AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sigma
        |  FROM mom)
        |SELECT event_type, n,
        |  ROUND(mu / 100.0, 9) AS mean_dollars,
        |  ROUND(sigma / 100.0, 9) AS sigma_dollars,
        |  ROUND((50000.0 - 0.0) / (6.0 * sigma), 9) AS cp,
        |  ROUND(LEAST((50000.0 - mu) / (3.0 * sigma),
        |    (mu - 0.0) / (3.0 * sigma)), 9) AS cpk
        |FROM h ORDER BY event_type""".stripMargin,
  )
}
