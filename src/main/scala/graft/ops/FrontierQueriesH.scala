package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.dedup.Dedup.hexFold32

/** Round-8 eleventh frontier wave: the variance-test completion of the
  * experimentation table (Brown–Forsythe next to wave 10's ANOVA F and
  * Kruskal–Wallis), the experiment-plumbing health checks every A/B
  * platform runs before reading a metric (sample-ratio-mismatch χ²,
  * capture–recapture coverage estimation), the MACD momentum fold that
  * completes the EMA family, and a Jensen–Shannon source divergence
  * stated so every ln argument is an exact integer (the lm_bigram /
  * Zipf precedent — ln of integer-valued doubles agrees cross-engine;
  * ln of arbitrary ratios does not, which is why
  * [[FrontierQueriesD.textSourceDivergenceChi2]] stayed log-free).
  * Module conventions as the earlier frontier waves. */
object FrontierQueriesH {

  /** SRM check: number of hash-assigned variants. */
  private val SrmVariants = 4L

  /** Capture–recapture: 1-in-3 inclusion per independent sample. */
  private val CaptureMod = 3L

  /** Exact integer cents from the double value column. */
  private def cents(v: Column): Column =
    (v.cast(DecimalType(18, 2)) * 100).cast(LongType)

  // --------------------------------------------------------------- variance

  /** BROWN–FORSYTHE (median-centered Levene) TEST — are the k
    * event-type value distributions equally SPREAD? The variance
    * sibling of [[FrontierQueriesG.statAnovaF]] (means) and
    * [[FrontierQueriesG.statKruskalWallis]] (locations on ranks):
    * one-way ANOVA F computed on |x − median| deviations, the robust
    * form that survives the skewed distributions real metrics have.
    * Equal-variance is the assumption ANOVA itself rests on — this is
    * the gate you run FIRST.
    *
    * Determinism — the exact-integer median trick: with values as
    * exact cents, 2·median = c@⌈n/2⌉ + c@(⌊n/2⌋+1) in sort order
    * (both parities), every deviation d = |2c − 2·med| stays BIGINT
    * (≤ 2.3×10⁵ at the corpus value range), and the whole F machinery
    * runs on BIGINT moments (Σd ≤ 10¹¹, Σd² ≤ 10¹⁶ at sf1 — audited)
    * down to the single fixed double tree. The rank positions select
    * VALUES, not rows, so row_number tie order is unobservable.
    *
    * Scale posture: one per-type sort window + a broadcast of the
    * k-row median frame back onto the data; the F fold is the
    * constant-width rollup shape. */
  def statLeveneBf(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("event_type"), cents(col("value")).as("c"))
    val wo = Window.partitionBy("event_type").orderBy("c")
    val ranked = base
      .withColumn("rn", row_number().over(wo).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    // 2·median as one BIGINT: the row at the lower-middle position
    // plus the row at the upper-middle (the same row counted twice
    // when n is odd — w is 2 there)
    val med2 = ranked
      .select(col("event_type"), col("c"),
        (when(col("rn") === expr("(n + 1) DIV 2"), 1L).otherwise(0L) +
          when(col("rn") === expr("n DIV 2 + 1"), 1L).otherwise(0L)).as("w"))
      .filter(col("w") > 0L)
      .groupBy("event_type").agg(sum(col("c") * col("w")).as("med2"))
    val dev = base.join(broadcast(med2), Seq("event_type"))
      .select(col("event_type"), abs(lit(2L) * col("c") - col("med2")).as("dd"))
    val perType = dev.groupBy("event_type")
      .agg(count(lit(1)).as("nj"), sum(col("dd")).as("sj"),
        sum(col("dd") * col("dd")).as("qj"))
    val g = perType.agg(
      sum(col("nj")).as("n"), count(lit(1)).as("k"),
      sum(col("qj")).as("qt"),
      aggregate(
        transform(sort_array(collect_list(struct(col("event_type"),
          (col("sj").cast(DoubleType) * col("sj").cast(DoubleType) /
            col("nj").cast(DoubleType)).as("term")))),
          p => p("term")),
        lit(0.0), (a, x) => a + x).as("ssum"),
      aggregate(
        transform(sort_array(collect_list(struct(col("event_type"),
          col("sj").cast(DoubleType).as("term2")))),
          p => p("term2")),
        lit(0.0), (a, x) => a + x).as("stot"))
    val grand = col("stot") * col("stot") / col("n").cast(DoubleType)
    val ssb = col("ssum") - grand
    val ssw = col("qt").cast(DoubleType) - col("ssum")
    g.select(col("n"), col("k"),
      (col("k") - 1L).as("dof_between"), (col("n") - col("k")).as("dof_within"),
      round((ssb / (col("k") - 1L).cast(DoubleType)) /
        nullif(ssw / (col("n") - col("k")).cast(DoubleType), lit(0.0)), 9)
        .as("w_stat"))
  }

  // --------------------------------------------------------------- momentum

  /** MACD (12/26/9) over the daily close bars per event type — the
    * moving-average-convergence-divergence momentum readout that
    * completes the EMA family next to [[FrontierQueriesB.timeHoltLinear]]
    * (level+trend) and Wilder's RSI/ATR/ADX (seed-then-smooth): final
    * fast−slow spread, its 9-bar signal EMA, and the histogram a
    * crossover rule actually triggers on. Run over ingest volume the
    * same fold flags momentum shifts in a pipeline health review.
    *
    * Determinism — the vector-state fold recipe with THREE state
    * doubles [ema12, ema26, signal]: the signal update needs this
    * round's ema12/ema26, so their update expressions are written out
    * AGAIN inside the signal slot (no cross-engine CSE assumption, the
    * Holt discipline); α constants are stated as the same division
    * trees on both engines (2.0/13.0 etc. — IEEE division is
    * correctly rounded, so the literals agree to the bit); closes
    * VARCHAR-hop from exact DECIMAL; seed = [y₁, y₁, 0]; round 9.
    *
    * Scale posture: one keyed rollup to daily bars + one bounded
    * per-type collect (day-granular series — ~100 elements regardless
    * of corpus size). */
  def windowMacd(s: SparkSession, d: String): DataFrame = {
    val ys = transform(
      sort_array(collect_list(struct(col("day"), col("close")))),
      p => p("close").cast(StringType).cast(DoubleType))
    def e12n(acc: Column, y: Column): Column =
      lit(2.0 / 13.0) * y + lit(1.0 - 2.0 / 13.0) * element_at(acc, 1)
    def e26n(acc: Column, y: Column): Column =
      lit(2.0 / 27.0) * y + lit(1.0 - 2.0 / 27.0) * element_at(acc, 2)
    val folded = FrontierQueriesD.dailyClose(s, d)
      .groupBy("event_type").agg(ys.as("ys"))
      .select(col("event_type"), size(col("ys")).cast(LongType).as("n_days"),
        aggregate(expr("slice(ys, 2, size(ys) - 1)"),
          array(element_at(col("ys"), 1), element_at(col("ys"), 1), lit(0.0)),
          (acc, y) => array(
            e12n(acc, y),
            e26n(acc, y),
            lit(0.2) * (e12n(acc, y) - e26n(acc, y)) +
              lit(0.8) * element_at(acc, 3))).as("st"))
    folded.select(col("event_type"), col("n_days"),
      round(element_at(col("st"), 1) - element_at(col("st"), 2), 9).as("macd"),
      round(element_at(col("st"), 3), 9).as("signal"),
      round(element_at(col("st"), 1) - element_at(col("st"), 2) -
        element_at(col("st"), 3), 9).as("histogram"))
      .orderBy("event_type")
  }

  // ----------------------------------------------------------- experiment ops

  /** SAMPLE-RATIO-MISMATCH χ² — hash-assign every experiment UNIT
    * (distinct user, not event — SRM is a property of the assignment,
    * so the unit grain is the contract) to 4 variants and test the
    * counts against the uniform expectation. The first health check an
    * A/B readout runs: a significant SRM invalidates the experiment
    * before any metric is read. Reported with the extreme counts so a
    * failing check names the imbalance.
    *
    * Determinism: the assignment is the engine-wide fold32(md5) coin;
    * with Σoᵢ = N the statistic collapses to χ² = (v·Σoᵢ² − N²)/N —
    * integer numerator, ONE division.
    *
    * Scale posture: one distinct + one v-row rollup. */
  def statSrmCheck(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d).select(col("user_id")).distinct()
      .select(pmod(hexFold32(
        md5(concat(lit("srm:"), col("user_id").cast(StringType)))),
        lit(SrmVariants)).as("variant"))
      .groupBy("variant").agg(count(lit(1)).as("o"))
    counts.agg(sum(col("o")).as("n_units"), count(lit(1)).as("k"),
      min(col("o")).as("min_units"), max(col("o")).as("max_units"),
      sum(col("o") * col("o")).as("so2"))
      .select(col("n_units"), col("k"), (col("k") - 1L).as("dof"),
        col("min_units"), col("max_units"),
        round((lit(SrmVariants) * col("so2") -
          col("n_units") * col("n_units")).cast(DoubleType) /
          col("n_units").cast(DoubleType), 9).as("chi2"))
  }

  /** CAPTURE–RECAPTURE (Chapman) population estimate — two independent
    * 1-in-3 hash samples of the distinct user population; the overlap
    * estimates the total via the Chapman-corrected Lincoln–Petersen
    * Nhat = (n₁+1)(n₂+1)/(m+1) − 1. The coverage-estimation primitive
    * for "how many entities exist that neither crawl saw" — dedup
    * completeness, crawl frontier sizing, log-join coverage — here
    * validated against the KNOWN population so the relative error is
    * part of the readout.
    *
    * Determinism: both inclusion coins are fold32(md5) with distinct
    * salts; n₁, n₂, m are exact counts; (n₁+1)(n₂+1) stays BIGINT
    * (audited: ≤ 2.5×10⁷ at sf1); Chapman and the relative error are
    * the same two fixed division trees on both engines.
    *
    * Scale posture: one distinct + one all-row rollup — no joins. */
  def statCaptureRecapture(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .select(
        (pmod(hexFold32(md5(concat(lit("cap1:"),
          col("user_id").cast(StringType)))), lit(CaptureMod)) === 0L).as("s1"),
        (pmod(hexFold32(md5(concat(lit("cap2:"),
          col("user_id").cast(StringType)))), lit(CaptureMod)) === 0L).as("s2"))
    val g = users.agg(count(lit(1)).as("n_true"),
      sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("s1") && col("s2"), 1L).otherwise(0L)).as("m"))
    val nhat = ((col("n1") + 1L) * (col("n2") + 1L)).cast(DoubleType) /
      (col("m") + 1L).cast(DoubleType) - lit(1.0)
    g.select(col("n_true"), col("n1"), col("n2"), col("m"),
      round(nhat, 9).as("n_hat"),
      round(nhat / col("n_true").cast(DoubleType) - lit(1.0), 9)
        .as("rel_error"))
  }

  // ------------------------------------------------------------------ drift

  /** JENSEN–SHANNON DIVERGENCE between source unigram profiles — the
    * information-theoretic drift number next to
    * [[FrontierQueriesD.textSourceDivergenceChi2]]'s log-free screen:
    * bounded (≤ ln 2), symmetric, and the quantity mixture-weight
    * papers actually report. Same top-100-vocabulary pair grid.
    *
    * Determinism — every ln argument is an EXACT INTEGER (the
    * lm_bigram/Zipf precedent; ln of arbitrary ratios is NOT
    * cross-engine stable, which is why the χ² variant exists): with
    * A = cnt_a·tot_b and B = cnt_b·tot_a (BIGINT, ≤ 10¹¹ at sf1 —
    * exact in double), ln(2p/(p+q)) = ln(2A) − ln(A+B), so each term
    * is p·(ln 2A − ln(A+B)) with p the one-division probability;
    * zero-count halves contribute exactly 0 via their guards; the
    * per-pair sum folds in token order; the ½ multiplies once at the
    * end; round 9.
    *
    * Scale posture: identical to the χ² screen — the only data-sized
    * work is the shared (source, tok) rollup; the pair grid is
    * #sources² × 100 by construction. */
  def textJsDivergence(s: SparkSession, d: String): DataFrame = {
    val dense = FrontierQueriesD.sourceDenseProfiles(s, d)
    val pairs = dense.as("a").join(dense.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        col("a.tok").as("tok"),
        (col("a.cnt") * col("b.tot")).as("aa"),
        (col("b.cnt") * col("a.tot")).as("bb"),
        col("a.p").as("pa"), col("b.p").as("pb"))
    val terms = pairs.select(col("sa"), col("sb"), col("tok"),
      (when(col("aa") > 0L, col("pa") *
        (log((lit(2L) * col("aa")).cast(DoubleType)) -
          log((col("aa") + col("bb")).cast(DoubleType)))).otherwise(lit(0.0)) +
        when(col("bb") > 0L, col("pb") *
          (log((lit(2L) * col("bb")).cast(DoubleType)) -
            log((col("aa") + col("bb")).cast(DoubleType)))).otherwise(lit(0.0)))
        .as("term"))
    terms.groupBy("sa", "sb").agg(
      count(lit(1)).as("n_tokens"),
      round(lit(0.5) * aggregate(
        transform(sort_array(collect_list(struct(col("tok"), col("term")))),
          p => p("term")),
        lit(0.0), (a, x) => a + x), 9).as("jsd_nats"))
      .orderBy("sa", "sb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_levene_bf"         -> statLeveneBf _,
    "window_macd"            -> windowMacd _,
    "stat_srm_check"         -> statSrmCheck _,
    "stat_capture_recapture" -> statCaptureRecapture _,
    "text_js_divergence"     -> textJsDivergence _,
  )

  import OracleSql.fold32

  private val toks = TextQueries.tokensSql

  val oracle: Map[String, String] = Map(
    "stat_levene_bf" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c)
        |      AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM base),
        |med AS (
        |  SELECT event_type, CAST(SUM(c * w) AS BIGINT) AS med2 FROM (
        |    SELECT event_type, c,
        |      (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END +
        |       CASE WHEN rn = n // 2 + 1 THEN 1 ELSE 0 END) AS w
        |    FROM ranked)
        |  WHERE w > 0 GROUP BY 1),
        |dev AS (
        |  SELECT base.event_type, ABS(2 * base.c - med.med2) AS dd
        |  FROM base JOIN med ON base.event_type = med.event_type),
        |per_type AS (
        |  SELECT event_type, COUNT(*) AS nj,
        |    CAST(SUM(dd) AS BIGINT) AS sj,
        |    CAST(SUM(dd * dd) AS BIGINT) AS qj
        |  FROM dev GROUP BY 1),
        |g AS (
        |  SELECT CAST(SUM(nj) AS BIGINT) AS n, COUNT(*) AS k,
        |    CAST(SUM(qj) AS BIGINT) AS qt,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) /
        |        CAST(nj AS DOUBLE) ORDER BY event_type)),
        |      (a, x) -> a + x) AS ssum,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(sj AS DOUBLE) ORDER BY event_type)),
        |      (a, x) -> a + x) AS stot
        |  FROM per_type)
        |SELECT n, k, k - 1 AS dof_between, n - k AS dof_within,
        |  ROUND(((ssum - stot * stot / CAST(n AS DOUBLE)) /
        |      CAST(k - 1 AS DOUBLE)) /
        |    NULLIF((CAST(qt AS DOUBLE) - ssum) / CAST(n - k AS DOUBLE),
        |      0.0), 9) AS w_stat
        |FROM g""".stripMargin,
    "window_macd" ->
      s"""WITH ${FrontierQueriesD.dailyCloseCte},
         |series AS (
         |  SELECT event_type,
         |    list(CAST(CAST(close AS VARCHAR) AS DOUBLE) ORDER BY day) AS ys
         |  FROM daily GROUP BY 1),
         |folded AS (
         |  SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
         |    list_reduce(
         |      list_prepend([ys[1], ys[1], 0.0],
         |        list_transform(ys[2:], y -> [y])),
         |      (acc, x) -> [
         |        (2.0/13.0) * x[1] + (1.0 - 2.0/13.0) * acc[1],
         |        (2.0/27.0) * x[1] + (1.0 - 2.0/27.0) * acc[2],
         |        0.2 * ((2.0/13.0) * x[1] + (1.0 - 2.0/13.0) * acc[1] -
         |            ((2.0/27.0) * x[1] + (1.0 - 2.0/27.0) * acc[2])) +
         |          0.8 * acc[3]]) AS st
         |  FROM series)
         |SELECT event_type, n_days,
         |  ROUND(st[1] - st[2], 9) AS macd,
         |  ROUND(st[3], 9) AS signal,
         |  ROUND(st[1] - st[2] - st[3], 9) AS histogram
         |FROM folded ORDER BY event_type""".stripMargin,
    "stat_srm_check" -> {
      val h = fold32("'srm:' || CAST(user_id AS VARCHAR)")
      s"""WITH counts AS (
         |  SELECT variant, COUNT(*) AS o FROM (
         |    SELECT ($h) % $SrmVariants AS variant
         |    FROM (SELECT DISTINCT user_id FROM events))
         |  GROUP BY 1),
         |g AS (
         |  SELECT CAST(SUM(o) AS BIGINT) AS n_units, COUNT(*) AS k,
         |    MIN(o) AS min_units, MAX(o) AS max_units,
         |    CAST(SUM(o * o) AS BIGINT) AS so2
         |  FROM counts)
         |SELECT n_units, k, k - 1 AS dof, min_units, max_units,
         |  ROUND(CAST($SrmVariants * so2 - n_units * n_units AS DOUBLE) /
         |    CAST(n_units AS DOUBLE), 9) AS chi2
         |FROM g""".stripMargin
    },
    "stat_capture_recapture" -> {
      val h1 = fold32("'cap1:' || CAST(user_id AS VARCHAR)")
      val h2 = fold32("'cap2:' || CAST(user_id AS VARCHAR)")
      s"""WITH users AS (
         |  SELECT ($h1) % $CaptureMod = 0 AS s1,
         |    ($h2) % $CaptureMod = 0 AS s2
         |  FROM (SELECT DISTINCT user_id FROM events)),
         |g AS (
         |  SELECT COUNT(*) AS n_true,
         |    CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT) AS m
         |  FROM users)
         |SELECT n_true, n1, n2, m,
         |  ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) /
         |    CAST(m + 1 AS DOUBLE) - 1.0, 9) AS n_hat,
         |  ROUND((CAST((n1 + 1) * (n2 + 1) AS DOUBLE) /
         |    CAST(m + 1 AS DOUBLE) - 1.0) / CAST(n_true AS DOUBLE) - 1.0, 9)
         |    AS rel_error
         |FROM g""".stripMargin
    },
    "text_js_divergence" ->
      s"""WITH st AS (
         |  SELECT source, tok, COUNT(*) AS cnt FROM (
         |    SELECT source, unnest($toks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |topv AS (
         |  SELECT tok FROM (
         |    SELECT tok, ROW_NUMBER() OVER (
         |      ORDER BY SUM(cnt) DESC, tok) AS rank
         |    FROM st GROUP BY tok)
         |  WHERE rank <= 100),
         |tots AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
         |  FROM st GROUP BY 1),
         |dense AS (
         |  SELECT tots.source, topv.tok,
         |    CAST(COALESCE(st.cnt, 0) AS BIGINT) AS cnt, tots.tot,
         |    CAST(COALESCE(st.cnt, 0) AS DOUBLE) / CAST(tots.tot AS DOUBLE)
         |      AS p
         |  FROM tots CROSS JOIN topv
         |  LEFT JOIN st ON st.source = tots.source AND st.tok = topv.tok),
         |pairs AS (
         |  SELECT a.source AS sa, b.source AS sb, a.tok,
         |    a.cnt * b.tot AS aa, b.cnt * a.tot AS bb,
         |    a.p AS pa, b.p AS pb
         |  FROM dense a JOIN dense b
         |    ON a.tok = b.tok AND a.source < b.source),
         |terms AS (
         |  SELECT sa, sb, tok,
         |    (CASE WHEN aa > 0 THEN pa *
         |        (ln(CAST(2 * aa AS DOUBLE)) - ln(CAST(aa + bb AS DOUBLE)))
         |      ELSE 0.0 END +
         |     CASE WHEN bb > 0 THEN pb *
         |        (ln(CAST(2 * bb AS DOUBLE)) - ln(CAST(aa + bb AS DOUBLE)))
         |      ELSE 0.0 END) AS term
         |  FROM pairs)
         |SELECT sa, sb, COUNT(*) AS n_tokens,
         |  ROUND(0.5 * list_reduce(list_prepend(0.0, list(term ORDER BY tok)),
         |    (a, x) -> a + x), 9) AS jsd_nats
         |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
