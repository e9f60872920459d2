package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Round-8 fifteenth frontier wave: the overdispersion screen behind
  * every count-model choice (Poisson dispersion index), long-range-
  * dependence measurement (Hurst rescaled-range over day blocks), the
  * information rate of the user event process (Markov entropy rate —
  * how predictable is the next action), the industry-standard
  * population-stability drift index (PSI per source, the third drift
  * screen next to χ² and JSD), and ABC inventory classification (the
  * cumulative-share cousin of the Lorenz/Palma family stated in exact
  * integer compares). Registry novelty grep-checked first (ROUND_NOTES
  * item 23). Module conventions as the earlier frontier waves.
  */
object FrontierQueriesL {

  /** Hurst block sizes (days). */
  private val HurstBlocks = Seq(7L, 14L, 28L)

  /** PSI length-bucket width (chars) and cap. */
  private val PsiBucketWidth = 100L
  private val PsiBucketCap = 10L

  /** ABC cumulative-revenue thresholds (percent). */
  private val AbcA = 80L
  private val AbcB = 95L

  // --------------------------------------------------------- overdispersion

  /** POISSON DISPERSION INDEX — are per-user event counts Poisson
    * (D ≈ 1), or overdispersed (D ≫ 1 — bursty users, a mixture)?
    * D = s²/x̄ with (n−1)·D read against χ²(n−1); the screen that
    * decides between Poisson and negative-binomial assumptions before
    * any rate model, capacity plan, or anomaly threshold is trusted.
    *
    * Determinism: per-user counts k are integers; n·Σk² − (Σk)² and
    * the rest compose exactly in BIGINT (Σk² ≤ 10¹² at sf1 — audited),
    * D and z = (D−1)·√((n−1)/2) are one fixed tree; round 9.
    *
    * Scale posture: one user-keyed count rollup + one constant-width
    * moment rollup. */
  def statPoissonDispersion(s: SparkSession, d: String): DataFrame = {
    val k = Tables.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("k"))
    val m = k.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
      sum(col("k") * col("k")).as("skk"))
    m.select(col("n"), col("sk").as("n_events"), {
        val nd = col("n").cast(DoubleType)
        val varN = (col("n") * col("skk") - col("sk") * col("sk"))
          .cast(DoubleType)
        val mean = col("sk").cast(DoubleType) / nd
        val dIdx = (varN / (nd * (col("n") - 1L).cast(DoubleType))) / mean
        struct(round(dIdx, 9).as("dispersion"),
          round((dIdx - lit(1.0)) *
            sqrt((col("n") - 1L).cast(DoubleType) / lit(2.0)), 9).as("z"))
          .as("r")
      })
      .select(col("n"), col("n_events"), col("r.dispersion").as("dispersion"),
        col("r.z").as("z"))
  }

  // ------------------------------------------------------------ long memory

  /** HURST RESCALED-RANGE — mean R/S over disjoint blocks of 7/14/28
    * days of the daily purchase-revenue series, plus the ln-ln slope
    * (the Hurst exponent: ~0.5 = no memory, >0.5 = persistent trends,
    * <0.5 = mean-reverting). The long-range-dependence readout behind
    * capacity planning and anomaly baselines — bursty-with-memory
    * series need wider guard bands than their variance suggests.
    *
    * Determinism: within a block of m days, the centered prefix sums
    * m·Σ_{i≤j}x_i − j·S_b are exact BIGINT (≤ 10¹⁶ at sf1 — audited),
    * so R (max − min prefix) is an integer max and each block's R/S is
    * one fixed tree from exact operands; the per-size mean folds in
    * block order; the 3-point ln-ln OLS slope consumes lns of
    * bit-identical doubles with O(1) weights (no large-count
    * amplification — the G² lesson's safe side). Round 9.
    *
    * Scale posture: one keyed rollup to daily cents; blocks live on
    * the bounded day grid (3 sizes × ≤ n/7 blocks). */
  def statHurstRs(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("x"))
      .groupBy("day").agg(sum(col("x")).as("x"))
      .select(col("x"), (row_number().over(Window.orderBy("day")) - 1)
        .cast(LongType).as("i"))
    import s.implicits._
    val sizes = broadcast(HurstBlocks.toDF("m"))
    // assign each day to its (m, block) cell; drop ragged tail blocks
    val cells = daily.crossJoin(sizes)
      .select(col("m"), expr("i DIV m").as("blk"),
        (col("i") % col("m")).as("j"), col("x"))
    val blockStats = cells.groupBy("m", "blk")
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sb"),
        sum(col("x") * col("x")).as("sxx"),
        // centered prefix sums: m·prefix_j − (j+1)·S_b, exact BIGINT;
        // fold in day order over the in-block sequence
        max(col("j")).as("maxj"),
        sort_array(collect_list(struct(col("j"), col("x")))).as("xs"))
      .filter(col("cnt") === col("m"))
    val prefixed = blockStats.select(col("m"), col("blk"), col("sb"),
      col("sxx"), {
        // state [prefix, maxdev, mindev] over m·x cumulative minus
        // (j+1)·S_b — all BIGINT
        val st = aggregate(
          transform(col("xs"), p => p("x")),
          array(lit(0L), lit(Long.MinValue), lit(Long.MaxValue), lit(0L)),
          (acc, x) => {
            val pref = element_at(acc, 1) + col("m") * x
            val dev = pref - (element_at(acc, 4) + 1L) * col("sb")
            array(pref,
              greatest(dev, element_at(acc, 2)),
              least(dev, element_at(acc, 3)),
              element_at(acc, 4) + 1L)
          })
        (element_at(st, 2) - element_at(st, 3)).as("r_scaled")
      })
    val perBlock = prefixed.select(col("m"), col("blk"), {
      // R = r_scaled/m; s = sqrt((m·Σx² − S²)/(m(m−1))); R/S fixed tree
      val varN = (col("m") * col("sxx") - col("sb") * col("sb"))
        .cast(StringType).cast(DoubleType)
      val md = col("m").cast(DoubleType)
      ((col("r_scaled").cast(DoubleType) / md) /
        sqrt(varN / (md * (col("m") - 1L).cast(DoubleType)))).as("rs")
    })
    val perSize = perBlock.groupBy("m")
      .agg(count(lit(1)).as("n_blocks"),
        aggregate(
          transform(sort_array(collect_list(struct(col("blk"),
            col("rs").as("v")))), p => p("v")),
          lit(0.0), (a, x) => a + x).as("rs_sum"))
      .select(col("m"), col("n_blocks"),
        (col("rs_sum") / col("n_blocks").cast(DoubleType)).as("mean_rs"))
    // 3-point ln-ln OLS slope = Hurst exponent
    val slope = perSize.agg(
      count(lit(1)).as("np"),
      aggregate(transform(sort_array(collect_list(struct(col("m"),
        log(col("m").cast(DoubleType)).as("lx")))), p => p("lx")),
        lit(0.0), (a, x) => a + x).as("sx"),
      aggregate(transform(sort_array(collect_list(struct(col("m"),
        log(col("mean_rs")).as("ly")))), p => p("ly")),
        lit(0.0), (a, x) => a + x).as("sy"),
      aggregate(transform(sort_array(collect_list(struct(col("m"),
        (log(col("m").cast(DoubleType)) * log(col("m").cast(DoubleType)))
          .as("lxx")))), p => p("lxx")),
        lit(0.0), (a, x) => a + x).as("sxx"),
      aggregate(transform(sort_array(collect_list(struct(col("m"),
        (log(col("m").cast(DoubleType)) * log(col("mean_rs"))).as("lxy")))),
        p => p("lxy")),
        lit(0.0), (a, x) => a + x).as("sxy"))
      .select(((col("np").cast(DoubleType) * col("sxy") -
        col("sx") * col("sy")) /
        (col("np").cast(DoubleType) * col("sxx") -
          col("sx") * col("sx"))).as("hurst"))
    perSize.crossJoin(broadcast(slope))
      .select(col("m").as("block_days"), col("n_blocks"),
        round(col("mean_rs"), 9).as("mean_rs"),
        round(col("hurst"), 9).as("hurst"))
      .orderBy("block_days")
  }

  // ---------------------------------------------------------- entropy rate

  /** MARKOV ENTROPY RATE of the per-user event-type process — how many
    * nats of surprise the NEXT event carries given the current one:
    * Ĥ = −Σᵢⱼ (cᵢⱼ/N)·(ln cᵢⱼ − ln cᵢ·). Read against ln(k) (the
    * uniform ceiling): the gap is how much the process is predictable —
    * the modeling-value readout over the same transition table as
    * [[FrontierQueriesE.timeMarkovTransitions]].
    *
    * Determinism: every ln argument is an exact integer count, every
    * weight ≤ 1 (no amplification — the G² lesson's safe side), terms
    * fold in (from, to) order; round 9.
    *
    * Scale posture: one per-user lag window + one ≤ k² rollup. */
  def statMarkovEntropyRate(s: SparkSession, d: String): DataFrame = {
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy("event_id")))
      .filter(col("from_type").isNotNull)
    val cij = steps.groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("cij"))
    val ci = cij.groupBy("from_type").agg(sum(col("cij")).as("ci"))
    val g = broadcast(cij.agg(sum(col("cij")).as("nt"),
      countDistinct(col("to_type")).as("k")))
    cij.join(broadcast(ci), Seq("from_type")).crossJoin(g)
      .select(col("from_type"), col("to_type"), col("cij"), col("ci"),
        col("nt"), col("k"),
        (col("cij").cast(DoubleType) / col("nt").cast(DoubleType) *
          (log(col("cij").cast(DoubleType)) -
            log(col("ci").cast(DoubleType)))).as("term"))
      .agg(max(col("nt")).as("n_transitions"), max(col("k")).as("n_states"),
        round(-aggregate(
          transform(sort_array(collect_list(struct(col("from_type"),
            col("to_type"), col("term")))), p => p("term")),
          lit(0.0), (a, x) => a + x), 9).as("entropy_rate_nats"),
        round(log(max(col("k")).cast(DoubleType)), 9).as("uniform_ceiling"))
  }

  // ----------------------------------------------------------------- drift

  /** POPULATION STABILITY INDEX per source — the industry-standard
    * drift number (credit-scoring lineage): PSI = Σ_b (p_b − q_b)·
    * ln(p_b/q_b) between each source's length-bucket profile and the
    * rest of the corpus. The third drift screen next to
    * [[FrontierQueriesD.textSourceDivergenceChi2]] (log-free) and
    * [[FrontierQueriesH.textJsDivergence]] (bounded) — PSI is the one
    * with production alarm conventions (0.1 watch / 0.25 act).
    *
    * Determinism: buckets are integer char-width cells; counts carry
    * +1 smoothing so no cell is empty; ln(p/q) = ln((cp+1)·(Nq+B)) −
    * ln((cq+1)·(Np+B)) — both arguments exact integer products
    * (≤ 10¹² at sf1 — audited), weights ≤ 1, bucket-ordered fold;
    * round 9.
    *
    * Scale posture: one (source, bucket) rollup; the densified grid is
    * sources × 11 cells via a broadcast spine. */
  def curationPsiDrift(s: SparkSession, d: String): DataFrame = {
    val b = least(expr(s"n_chars DIV $PsiBucketWidth"), lit(PsiBucketCap))
      .cast(LongType)
    val sb = Tables.documents(s, d).select(col("source"), b.as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
    import s.implicits._
    val spine = broadcast((0L to PsiBucketCap).toDF("bucket"))
    val sources = sb.select("source").distinct()
    val dense = sources.crossJoin(spine)
      .join(sb, Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        coalesce(col("c"), lit(0L)).as("cp"))
    val tot = dense.groupBy("source").agg(sum(col("cp")).as("np"))
    val colTot = dense.groupBy("bucket").agg(sum(col("cp")).as("call"))
    val g = broadcast(tot.agg(sum(col("np")).as("nall")))
    val cells = dense
      .join(broadcast(tot), Seq("source"))
      .join(broadcast(colTot), Seq("bucket"))
      .crossJoin(g)
      .select(col("source"), col("bucket"), {
        val bCnt = lit(PsiBucketCap + 1)
        val cp1 = col("cp") + 1L
        val cq1 = col("call") - col("cp") + 1L
        val npB = col("np") + bCnt
        val nqB = col("nall") - col("np") + bCnt
        val p = cp1.cast(DoubleType) / npB.cast(DoubleType)
        val q = cq1.cast(DoubleType) / nqB.cast(DoubleType)
        ((p - q) * (log((cp1 * nqB).cast(DoubleType)) -
          log((cq1 * npB).cast(DoubleType)))).as("term")
      })
    cells.groupBy("source")
      .agg(count(lit(1)).as("n_buckets"),
        round(aggregate(
          transform(sort_array(collect_list(struct(col("bucket"),
            col("term")))), p => p("term")),
          lit(0.0), (a, x) => a + x), 9).as("psi"))
      .orderBy("source")
  }

  // ------------------------------------------------------------------- ABC

  /** ABC ANALYSIS — parts classified by cumulative revenue share:
    * A ≤ 80%, B ≤ 95%, C the tail. The inventory-management cousin of
    * [[AggWindowQueries.aggLorenzPoints]]' curve and
    * [[StatQueries.aggGiniIndex]]'s scalar — this one yields the
    * actionable class sizes ("20% of parts carry 80% of revenue").
    *
    * Determinism: parts rank by (revenue cents desc, partkey); class
    * membership is the exact integer compare cum·100 ≤ threshold·total
    * (cum ≤ 10¹³ at sf1, ×100 stays BIGINT — audited); class revenue
    * shares are one division each; round 9.
    *
    * Scale posture (r9 verdict #1): one part-keyed rollup, then a
    * DISTRIBUTED cumulative revenue via [[DistRank.runningSum]] — the
    * two-phase cumulative sum (partition-local running sums + broadcast
    * prefix offsets); no single-partition sort over the part dimension.
    * Final class rollup is 3 rows. */
  def aggAbcAnalysis(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))
      .groupBy("l_partkey").agg(sum(col("cents")).as("rev"))
    val tot = broadcast(rev.agg(sum(col("rev")).as("total")))
    val classed = DistRank.runningSum(rev, "rev", s"abc:$d", "cum",
        col("rev").desc, col("l_partkey"))
      .crossJoin(tot)
      .select(col("rev"),
        when(col("cum") * 100L <= lit(AbcA) * col("total"), "A")
          .when(col("cum") * 100L <= lit(AbcB) * col("total"), "B")
          .otherwise("C").as("abc_class"),
        col("total"))
    classed.groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("class_cents"),
        round(sum(col("rev")).cast(DoubleType) /
          max(col("total")).cast(DoubleType), 9).as("revenue_share"))
      .orderBy("abc_class")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_poisson_dispersion" -> statPoissonDispersion _,
    "stat_hurst_rs"           -> statHurstRs _,
    "stat_markov_entropy"     -> statMarkovEntropyRate _,
    "curation_psi_drift"      -> curationPsiDrift _,
    "agg_abc_analysis"        -> aggAbcAnalysis _,
  )

  /** Daily purchase-revenue cents — shared oracle CTE. */
  private val dailySql =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "stat_poisson_dispersion" ->
      """WITH k AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(k) AS BIGINT) AS sk,
        |    CAST(SUM(k * k) AS BIGINT) AS skk
        |  FROM k)
        |SELECT n, sk AS n_events,
        |  ROUND((CAST(n * skk - sk * sk AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) /
        |    (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS dispersion,
        |  ROUND(((CAST(n * skk - sk * sk AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) /
        |    (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0) *
        |    SQRT(CAST(n - 1 AS DOUBLE) / 2.0), 9) AS z
        |FROM m""".stripMargin,
    "stat_hurst_rs" ->
      s"""WITH daily AS ($dailySql),
         |idx AS (
         |  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
         |    AS i
         |  FROM daily),
         |sizes AS (SELECT CAST(unnest([7, 14, 28]) AS BIGINT) AS m),
         |cells AS (
         |  SELECT m, i // m AS blk, i % m AS j, x
         |  FROM idx CROSS JOIN sizes),
         |bs AS (
         |  SELECT m, blk, COUNT(*) AS cnt,
         |    CAST(SUM(x) AS BIGINT) AS sb,
         |    CAST(SUM(x * x) AS HUGEINT) AS sxx,
         |    list(x ORDER BY j) AS xs
         |  FROM cells GROUP BY 1, 2),
         |pref AS (
         |  SELECT m, blk, sb, sxx,
         |    list_reduce(list_prepend(
         |      [CAST(0 AS BIGINT), -9223372036854775807,
         |       9223372036854775807, 0],
         |      list_transform(xs, v -> [v])),
         |      (acc, o) -> [
         |        acc[1] + m * o[1],
         |        GREATEST(acc[1] + m * o[1] - (acc[4] + 1) * sb, acc[2]),
         |        LEAST(acc[1] + m * o[1] - (acc[4] + 1) * sb, acc[3]),
         |        acc[4] + 1]) AS st
         |  FROM bs WHERE cnt = m),
         |perblock AS (
         |  SELECT m, blk,
         |    (CAST(st[2] - st[3] AS DOUBLE) / CAST(m AS DOUBLE)) /
         |    SQRT(CAST(CAST(CAST(m AS HUGEINT) * sxx -
         |        CAST(sb AS HUGEINT) * CAST(sb AS HUGEINT) AS VARCHAR)
         |      AS DOUBLE) /
         |      (CAST(m AS DOUBLE) * CAST(m - 1 AS DOUBLE))) AS rs
         |  FROM pref),
         |persize AS (
         |  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(rs ORDER BY blk)), (a, x) -> a + x) /
         |      CAST(COUNT(*) AS DOUBLE) AS mean_rs
         |  FROM perblock GROUP BY m),
         |slope AS (
         |  SELECT
         |    (CAST(COUNT(*) AS DOUBLE) *
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(CAST(m AS DOUBLE)) * LN(mean_rs) ORDER BY m)),
         |        (a, x) -> a + x) -
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(CAST(m AS DOUBLE)) ORDER BY m)), (a, x) -> a + x) *
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(mean_rs) ORDER BY m)), (a, x) -> a + x)) /
         |    (CAST(COUNT(*) AS DOUBLE) *
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(CAST(m AS DOUBLE)) * LN(CAST(m AS DOUBLE))
         |          ORDER BY m)), (a, x) -> a + x) -
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(CAST(m AS DOUBLE)) ORDER BY m)), (a, x) -> a + x) *
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(LN(CAST(m AS DOUBLE)) ORDER BY m)), (a, x) -> a + x))
         |    AS hurst
         |  FROM persize)
         |SELECT m AS block_days, n_blocks, ROUND(mean_rs, 9) AS mean_rs,
         |  ROUND((SELECT hurst FROM slope), 9) AS hurst
         |FROM persize ORDER BY block_days""".stripMargin,
    "stat_markov_entropy" ->
      """WITH steps AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS from_type
        |  FROM events),
        |cij AS (
        |  SELECT from_type, event_type AS to_type,
        |    CAST(COUNT(*) AS BIGINT) AS cij
        |  FROM steps WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |ci AS (SELECT from_type, CAST(SUM(cij) AS BIGINT) AS ci
        |  FROM cij GROUP BY 1),
        |g AS (SELECT CAST(SUM(cij) AS BIGINT) AS nt,
        |  CAST(COUNT(DISTINCT to_type) AS BIGINT) AS k FROM cij)
        |SELECT MAX(nt) AS n_transitions, MAX(k) AS n_states,
        |  ROUND(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(cij AS DOUBLE) / CAST(nt AS DOUBLE) *
        |      (LN(CAST(cij AS DOUBLE)) - LN(CAST(ci.ci AS DOUBLE)))
        |      ORDER BY cij.from_type, to_type)),
        |    (a, x) -> a + x), 9) AS entropy_rate_nats,
        |  ROUND(LN(CAST(MAX(k) AS DOUBLE)), 9) AS uniform_ceiling
        |FROM cij JOIN ci ON cij.from_type = ci.from_type CROSS JOIN g"""
        .stripMargin,
    "curation_psi_drift" ->
      """WITH sb AS (
        |  SELECT source,
        |    LEAST(n_chars // 100, 10) AS bucket, CAST(COUNT(*) AS BIGINT)
        |      AS c
        |  FROM documents GROUP BY 1, 2),
        |spine AS (SELECT CAST(unnest(range(0, 11)) AS BIGINT) AS bucket),
        |srcs AS (SELECT DISTINCT source FROM sb),
        |dense AS (
        |  SELECT srcs.source, spine.bucket,
        |    COALESCE(sb.c, 0) AS cp
        |  FROM srcs CROSS JOIN spine
        |  LEFT JOIN sb ON sb.source = srcs.source
        |    AND sb.bucket = spine.bucket),
        |tot AS (SELECT source, CAST(SUM(cp) AS BIGINT) AS np
        |  FROM dense GROUP BY 1),
        |coltot AS (SELECT bucket, CAST(SUM(cp) AS BIGINT) AS call
        |  FROM dense GROUP BY 1),
        |g AS (SELECT CAST(SUM(np) AS BIGINT) AS nall FROM tot),
        |cells AS (
        |  SELECT dense.source, dense.bucket,
        |    (CAST(cp + 1 AS DOUBLE) / CAST(np + 11 AS DOUBLE) -
        |     CAST(call - cp + 1 AS DOUBLE) /
        |       CAST(nall - np + 11 AS DOUBLE)) *
        |    (LN(CAST((cp + 1) * (nall - np + 11) AS DOUBLE)) -
        |     LN(CAST((call - cp + 1) * (np + 11) AS DOUBLE))) AS term
        |  FROM dense JOIN tot ON dense.source = tot.source
        |  JOIN coltot ON dense.bucket = coltot.bucket CROSS JOIN g)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY bucket)), (a, x) -> a + x), 9) AS psi
        |FROM cells GROUP BY source ORDER BY source""".stripMargin,
    "agg_abc_analysis" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM rev),
        |classed AS (
        |  SELECT rev,
        |    CASE WHEN CAST(SUM(rev) OVER w AS BIGINT) * 100 <=
        |        80 * (SELECT total FROM tot) THEN 'A'
        |      WHEN CAST(SUM(rev) OVER w AS BIGINT) * 100 <=
        |        95 * (SELECT total FROM tot) THEN 'B'
        |      ELSE 'C' END AS abc_class
        |  FROM rev
        |  WINDOW w AS (ORDER BY rev DESC, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(rev) AS BIGINT) AS class_cents,
        |  ROUND(CAST(SUM(rev) AS DOUBLE) /
        |    CAST((SELECT total FROM tot) AS DOUBLE), 9) AS revenue_share
        |FROM classed GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
