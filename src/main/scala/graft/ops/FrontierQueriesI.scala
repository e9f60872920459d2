package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.text.TextAnalysis.tokens

/** Round-8 twelfth frontier wave: the distribution-free two-sample
  * test every drift monitor runs (Kolmogorov–Smirnov, stated so the
  * statistic's numerator is an exact integer), per-source keyword
  * extraction stated as the exact-rational 2×2 χ² score (the Dunning
  * G² form measurably failed cross-engine at sf1, see
  * [[textKeywordChi2]]), the unseen-vocabulary estimators a
  * crawl-coverage review
  * reports (Chao1 + Good–Turing missing mass, over the bigram space
  * where hapaxes exist), the autocorrelation function behind every
  * seasonality readout (exact DECIMAL moments via the n²-scaled
  * mean-centering identity), and the time-budgeted conversion funnel
  * (view → click → purchase, all-integer counts). Module conventions
  * as the earlier frontier waves.
  */
object FrontierQueriesI {

  /** Funnel step budget: each step must land within 24h of the prior. */
  private val FunnelBudgetUs = 86400000000L

  /** Keywords reported per source by the χ² ranker. */
  private val KeywordTopK = 3

  /** ACF lags reported (short, weekly, biweekly). */
  private val AcfLags = Seq(1, 2, 3, 7, 14)

  // -------------------------------------------------------------- KS test

  /** KOLMOGOROV–SMIRNOV TWO-SAMPLE TEST — purchase vs click value
    * distributions: D = sup |F̂_a − F̂_b| plus the asymptotic
    * √(n·m/(n+m))·D everyone reads against 1.36. THE distribution-free
    * drift check: no binning choices, no moment assumptions — exactly
    * what a feature-drift monitor wants before trusting a comparison.
    * The REAL-groups, reported-λ sibling of [[StatQueries.aggKsDrift]]
    * (which runs the same sup over hash-halves per type as a
    * null-calibration/split audit — there D should be SMALL; here the
    * two groups genuinely differ).
    *
    * Determinism — the exact-integer numerator: at each distinct cent
    * value, |F̂_a − F̂_b| = |cumA·n_b − cumB·n_a| / (n_a·n_b), so the
    * sup is a MAX OVER BIGINTs (≤ 4×10¹⁰ at sf1 — audited; a 100 TB
    * run lifts the two products to DECIMAL, same shape) and only the
    * final D and λ are doubles through one fixed division/sqrt tree.
    *
    * Scale posture: one groupBy on the cent grid, then a single-
    * partition cumulative window over DISTINCT CENTS — bounded by the
    * value range (~50k cells), not the row count, the same bounded-
    * support argument as the decile/histogram family. */
  def statKsTwoSample(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
    val perVal = base.groupBy("c").agg(
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("a"),
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("b"))
    val wCum = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perVal.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
    val cum = perVal.select(
      sum(col("a")).over(wCum).as("ca"), sum(col("b")).over(wCum).as("cb"))
    cum.crossJoin(broadcast(totals))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))).as("d_num"))
      .select(col("n_a"), col("n_b"),
        round(col("d_num").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)), 9)
          .as("d_stat"),
        round(col("d_num").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)) *
          sqrt(col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType) /
            (col("n_a") + col("n_b")).cast(DoubleType)), 9).as("ks_lambda"))
  }

  // --------------------------------------------------------- corpus miners

  /** Positional (w1, w2) bigram pairs per document — zip_with over two
    * shifted slices (the evaluate-once discipline documented at
    * [[TextQueries.textBigramFreq]]). */
  private def bigramPairs(tok: Column): Column = {
    val n = size(tok)
    when(n >= 2,
      zip_with(slice(tok, lit(1), n - 1), slice(tok, lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  // A PMI-collocation ranker was built here and REMOVED the same
  // round: PMI = ln(lift), a monotone transform of the registry's
  // existing text_collocation_lift (identical pairs, support floor,
  // and marginals — TextQueries.textCollocationLift), so it ranked
  // nothing new. Lesson recorded in ROUND_NOTES: grep the registry
  // for the statistic's monotone siblings BEFORE building.

  /** χ² KEYWORDS — for each source, the top-3 over-represented tokens
    * by the 2×2 chi-square score against the rest of the corpus: the
    * "what is this slice about" ranker a curation review runs per
    * domain/shard. The signed, token-naming sibling of
    * [[FrontierQueriesD.textSourceDivergenceChi2]]'s corpus-level
    * drift number.
    *
    * Determinism — why χ² and not Dunning's G²: the G² form multiplies
    * ln(count) by counts of ~10⁶ and then CANCELS nine ~10⁷-magnitude
    * terms down to ~1 — a single-ulp cross-engine difference in one ln
    * (Java Math.log vs libm, both allowed ≠ correctly-rounded)
    * surfaces as ~10⁻⁸ in the result, measured as a real sf1 hash
    * mismatch. χ² has NO transcendentals: with cells a,b,c,d,
    * χ² = N·(ad−bc)² / [(a+b)(c+d)·(a+c)(b+d)] — t = ad−bc and the
    * two margin products stay BIGINT (≤ 7×10¹² at sf1 — audited;
    * DECIMAL at 100 TB), t² is exact DECIMAL(37,0) VARCHAR-hopped to
    * its correctly-rounded double, and the statistic is one fixed
    * ((N·t²)/m1)/m2 tree. The over-representation gate a·N >
    * cnt_all·tot_s is an integer compare. Rank ties break on the token.
    *
    * Scale posture: one (source, tok) rollup is the data-sized work;
    * marginals are vocabulary- and source-keyed; the top-k window
    * partitions by source. */
  def textKeywordChi2(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("a"))
    val perSource = st.groupBy("source").agg(sum(col("a")).as("tot_s"))
    val perTok = st.groupBy("tok").agg(sum(col("a")).as("cnt_all"))
    val globals = broadcast(perSource.agg(sum(col("tot_s")).as("n")))
    val cells = st
      .join(broadcast(perSource), Seq("source"))
      .join(perTok, Seq("tok"))
      .crossJoin(globals)
      .filter(col("a") * col("n") > col("cnt_all") * col("tot_s"))
      .select(col("source"), col("tok"), col("a"), {
        // b = cnt_all−a, c = tot_s−a, d = n−tot_s−cnt_all+a
        val t = col("a") * (col("n") - col("tot_s") - col("cnt_all") +
          col("a")) - (col("cnt_all") - col("a")) * (col("tot_s") - col("a"))
        val t2 = t.cast(DecimalType(18, 0)) * t.cast(DecimalType(18, 0))
        val m1 = (col("tot_s") * (col("n") - col("tot_s"))).cast(DoubleType)
        val m2 = (col("cnt_all") * (col("n") - col("cnt_all")))
          .cast(DoubleType)
        round(col("n").cast(DoubleType) *
          t2.cast("string").cast(DoubleType) / m1 / m2, 9).as("chi2")
      })
    val w = Window.partitionBy("source")
      .orderBy(col("chi2").desc, col("tok"))
    cells.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= KeywordTopK)
      .select(col("source"), col("rk"), col("tok"), col("a").as("n_in_source"),
        col("chi2"))
      .orderBy("source", "rk")
  }

  /** CHAO1 + GOOD–TURING UNSEEN-VOCABULARY ESTIMATE — over the BIGRAM
    * space (the unigram vocabulary of this corpus is closed — zero
    * hapaxes — which would make the estimator degenerate-but-useless;
    * bigrams carry real singletons). Chao1 answers "how many distinct
    * types exist that the crawl never saw", Good–Turing's f₁/N answers
    * "what probability mass will the next batch spend on novel types"
    * — the two numbers a coverage review runs BEFORE deciding more
    * crawling is worth it. The type-level sibling of
    * [[FrontierQueriesH.statCaptureRecapture]]'s entity-level estimate.
    *
    * Determinism: S_obs, f₁, f₂, N are exact counts; the bias-corrected
    * Chao1 S + f₁(f₁−1)/(2(f₂+1)) and the missing mass f₁/N are two
    * fixed division trees; round 9.
    *
    * Scale posture: one bigram rollup + one constant-width rollup of
    * its counts — no joins, no windows. */
  def statChao1Unseen(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.documents(s, d)
      .select(explode(bigramPairs(tokens(col("text")))).as("p"))
      .groupBy(col("p.w1"), col("p.w2")).agg(count(lit(1)).as("n"))
    cnts.agg(count(lit(1)).as("s_obs"),
      sum(when(col("n") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("n") === 2L, 1L).otherwise(0L)).as("f2"),
      sum(col("n")).as("n_bigrams"))
      .select(col("s_obs"), col("f1"), col("f2"), col("n_bigrams"),
        round(col("s_obs").cast(DoubleType) +
          (col("f1") * (col("f1") - 1L)).cast(DoubleType) /
            (lit(2.0) * (col("f2") + 1L).cast(DoubleType)), 9).as("chao1"),
        round(col("f1").cast(DoubleType) / col("n_bigrams").cast(DoubleType),
          9).as("gt_missing_mass"))
  }

  // ------------------------------------------------------------------- ACF

  /** AUTOCORRELATION FUNCTION of daily total revenue at lags
    * 1/2/3/7/14 — the seasonality readout behind
    * [[FrontierQueriesB.timeWeekdayIndex]]'s calendar decomposition:
    * a weekly cycle shows as a ρ₇ spike, trend as slow decay. Run over
    * ingest volume, the same curve tells a pipeline monitor which lag
    * its anomaly baseline should difference at. The CLASSICAL-ACF
    * sibling of [[AggWindowQueries.timeAutocorr]]: that one reports
    * per-lag Pearson r over calendar-paired daily counts (each lag its
    * own mean), this one the textbook γ_ℓ/γ₀ with the FULL-series mean
    * — the quantity Ljung–Box and ARIMA identification actually
    * consume.
    *
    * Determinism — the n²-scaled mean-centering identity: with daily
    * cents x_t (BIGINT) and S = Σx, n²·γ_ℓ = Σ_{t≤n−ℓ}(n·x_t − S)
    * (n·x_{t+ℓ} − S) — every factor an exact DECIMAL(18,0) (≤ 3×10¹³
    * at sf1 — audited), products exact DECIMAL(37,0), so ρ_ℓ =
    * num_ℓ/den is ONE division of two VARCHAR-hopped exact decimals.
    * No double ever sums across rows.
    *
    * Scale posture: one keyed rollup to daily cents; everything after
    * is day-granular (the series is ~30–3000 rows at any corpus size),
    * joined to itself on the row-number axis through a broadcast. */
  def timeAcf(s: SparkSession, d: String): DataFrame =
    acfMoments(s, d, AcfLags.map(_.toLong))
      .select(col("lag"), col("n_terms"),
        round(col("num").cast("string").cast(DoubleType) /
          col("den").cast("string").cast(DoubleType), 9).as("acf"))
      .orderBy("lag")

  /** Shared exact ACF moments over the daily purchase-revenue series —
    * (lag, n_terms, num, den, n) with num/den the n²-scaled exact
    * DECIMAL autocovariance sums and n the series length. The base of
    * [[timeAcf]] and [[FrontierQueriesK.statLjungBox]]; pure builder
    * (no cache), so each caller's plan is what it was inline. */
  private[ops] def acfMoments(s: SparkSession, d: String,
      lags: Seq[Long]): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .groupBy("day").agg(sum(col("c")).as("x"))
    val g = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val idx = daily
      .select(col("x"), row_number().over(Window.orderBy("day"))
        .cast(LongType).as("rn"))
      .crossJoin(broadcast(g))
      .select(col("rn"), col("n"),
        (col("x").cast(DecimalType(18, 0)) * col("n") -
          col("s").cast(DecimalType(18, 0))).as("dx"))
    import s.implicits._
    val lagsDf = broadcast(lags.toDF("lag"))
    val pairs = idx.as("a").crossJoin(lagsDf)
      .join(idx.as("b"), col("b.rn") === col("a.rn") + col("lag"))
    val den = idx.agg(sum(col("dx") * col("dx")).as("den"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_terms"), max(col("a.n")).as("n"),
        sum(col("a.dx") * col("b.dx")).as("num"))
      .crossJoin(broadcast(den))
  }

  // ---------------------------------------------------------------- funnel

  /** TIME-BUDGETED CONVERSION FUNNEL — view → click → purchase, each
    * step within 24h of the one before: the product-analytics staple
    * (and, read over pipeline stages, the ingest-latency funnel).
    * The corpus-level RATES sibling of [[AdvancedQueries.windowFunnel]]
    * (per-user stage times and depth, unbudgeted): without the budget
    * this corpus converts 100% everywhere — the budget makes the
    * drop-off real (150 → 60 → 25 at sf0.01) and turns the readout
    * into the two conversion rates a growth review quotes.
    *
    * Determinism: step times compare as exact epoch MICROSECONDS —
    * both engines floor the parquet ns timestamps to µs identically,
    * so the ≥/[t, t+24h) gates agree; counts are integers and the two
    * conversion rates are fixed division trees.
    *
    * Scale posture: per-step min-aggregates and joins all keyed on
    * user_id — three shuffles on ONE key, each step's frame no wider
    * than the user dimension, no windows, no driver state. */
  def aggFunnelConversion(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("t1"))
      .filter(col("t1").isNotNull)
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("t1") && col("us") < col("t1") + FunnelBudgetUs)
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") >= col("t2") && col("us") < col("t2") + FunnelBudgetUs)
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_view"), count(col("t2")).as("n_click"),
        count(col("t3")).as("n_purchase"))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast(DoubleType) /
          col("n_view").cast(DoubleType), 9).as("view_to_click"),
        round(col("n_purchase").cast(DoubleType) /
          nullif(col("n_click").cast(DoubleType), lit(0.0)), 9)
          .as("click_to_purchase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_ks_two_sample"     -> statKsTwoSample _,
    "text_keyword_chi2"      -> textKeywordChi2 _,
    "stat_chao1_unseen"      -> statChao1Unseen _,
    "time_acf"               -> timeAcf _,
    "agg_funnel_conversion"  -> aggFunnelConversion _,
  )

  private val toks = TextQueries.tokensSql

  /** Shared oracle fragment: positional bigram pairs per document. */
  private val bigramSql =
    s"""SELECT unnest(list_transform(range(1, len(tok)),
       |    i -> struct_pack(w1 := tok[i], w2 := tok[i+1]))) AS p
       |  FROM (SELECT $toks AS tok FROM documents) WHERE len(tok) >= 2"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "stat_ks_two_sample" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |pv AS (
        |  SELECT c,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS a,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS b
        |  FROM base GROUP BY c),
        |cum AS (
        |  SELECT CAST(SUM(a) OVER w AS BIGINT) AS ca,
        |    CAST(SUM(b) OVER w AS BIGINT) AS cb
        |  FROM pv WINDOW w AS (ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT MAX(ca) AS n_a, MAX(cb) AS n_b,
        |    MAX(ABS(ca * (SELECT MAX(cb) FROM cum) -
        |            cb * (SELECT MAX(ca) FROM cum))) AS d_num
        |  FROM cum)
        |SELECT n_a, n_b,
        |  ROUND(CAST(d_num AS DOUBLE) /
        |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 9) AS d_stat,
        |  ROUND(CAST(d_num AS DOUBLE) /
        |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
        |    SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
        |      CAST(n_a + n_b AS DOUBLE)), 9) AS ks_lambda
        |FROM tot""".stripMargin,
    "text_keyword_chi2" ->
      s"""WITH st AS (
         |  SELECT source, t AS tok, COUNT(*) AS a FROM
         |    (SELECT source, unnest($toks) AS t FROM documents)
         |  GROUP BY 1, 2),
         |ps AS (SELECT source, CAST(SUM(a) AS BIGINT) AS tot_s
         |  FROM st GROUP BY 1),
         |pt AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS cnt_all
         |  FROM st GROUP BY 1),
         |g AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
         |cells AS (
         |  SELECT source, tok, a,
         |    ROUND(CAST(n AS DOUBLE) *
         |      CAST(CAST(CAST(t AS DECIMAL(18,0)) * CAST(t AS DECIMAL(18,0))
         |        AS VARCHAR) AS DOUBLE) /
         |      CAST(tot_s * (n - tot_s) AS DOUBLE) /
         |      CAST(cnt_all * (n - cnt_all) AS DOUBLE), 9) AS chi2
         |  FROM (
         |    SELECT st.source, st.tok, st.a, ps.tot_s, pt.cnt_all, g.n,
         |      st.a * (g.n - ps.tot_s - pt.cnt_all + st.a) -
         |        (pt.cnt_all - st.a) * (ps.tot_s - st.a) AS t
         |    FROM st JOIN ps USING (source) JOIN pt USING (tok) CROSS JOIN g
         |    WHERE st.a * g.n > pt.cnt_all * ps.tot_s)),
         |ranked AS (
         |  SELECT source, tok, a, chi2,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY chi2 DESC, tok) AS BIGINT) AS rk
         |  FROM cells)
         |SELECT source, rk, tok, a AS n_in_source, chi2
         |FROM ranked WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    "stat_chao1_unseen" ->
      s"""WITH cnts AS (
         |  SELECT p.w1, p.w2, COUNT(*) AS n FROM ($bigramSql)
         |  GROUP BY 1, 2),
         |agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
         |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         |    CAST(SUM(n) AS BIGINT) AS n_bigrams
         |  FROM cnts)
         |SELECT s_obs, f1, f2, n_bigrams,
         |  ROUND(CAST(s_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE) /
         |    (2.0 * CAST(f2 + 1 AS DOUBLE)), 9) AS chao1,
         |  ROUND(CAST(f1 AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 9)
         |    AS gt_missing_mass
         |FROM agg""".stripMargin,
    "time_acf" ->
      """WITH daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS s FROM daily),
        |idx AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
        |    g.n,
        |    CAST(x AS DECIMAL(18,0)) * g.n - CAST(s AS DECIMAL(18,0)) AS dx
        |  FROM daily CROSS JOIN g),
        |den AS (SELECT SUM(dx * dx) AS den FROM idx),
        |lags AS (SELECT unnest([1, 2, 3, 7, 14]) AS lag),
        |pairs AS (
        |  SELECT CAST(lags.lag AS BIGINT) AS lag, a.dx AS adx, b.dx AS bdx
        |  FROM idx a CROSS JOIN lags
        |  JOIN idx b ON b.rn = a.rn + lags.lag)
        |SELECT lag, COUNT(*) AS n_terms,
        |  ROUND(CAST(CAST(SUM(adx * bdx) AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST((SELECT den FROM den) AS VARCHAR) AS DOUBLE), 9)
        |    AS acf
        |FROM pairs GROUP BY lag ORDER BY lag""".stripMargin,
    "agg_funnel_conversion" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN us END) AS t1
        |  FROM e GROUP BY 1 HAVING t1 IS NOT NULL),
        |c AS (
        |  SELECT e.user_id, MIN(us) AS t2
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND us >= t1
        |    AND us < t1 + 86400000000 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(us) AS t3
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND us >= t2
        |    AND us < t2 + 86400000000 GROUP BY 1),
        |j AS (
        |  SELECT v.user_id, c.t2, p.t3
        |  FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_view,
        |  CAST(COUNT(t2) AS BIGINT) AS n_click,
        |  CAST(COUNT(t3) AS BIGINT) AS n_purchase,
        |  ROUND(CAST(COUNT(t2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |    AS view_to_click,
        |  ROUND(CAST(COUNT(t3) AS DOUBLE) /
        |    NULLIF(CAST(COUNT(t2) AS DOUBLE), 0.0), 9) AS click_to_purchase
        |FROM j""".stripMargin,
  )
}
