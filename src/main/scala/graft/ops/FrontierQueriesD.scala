package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.text.TextAnalysis.tokens

/** Round-8 fifth frontier wave: trend-quality, decomposition,
  * distribution-drift, diversity-selection and randomness-test
  * operators. Module conventions as the earlier frontier waves:
  * integer/DECIMAL arithmetic to one final fixed double tree,
  * m-ordered folds for double sums, VARCHAR-hop for DECIMAL→DOUBLE.
  */
object FrontierQueriesD {

  /** Kaufman efficiency-ratio window length (trading-day bars). */
  private val KaufmanN = 10

  /** Top-vocabulary size for the χ² source-divergence profile. */
  private val DivergenceTopK = 100

  /** k-center greedy: number of selected exemplars. */
  private val KCenterK = 4

  private def hop(c: Column): Column = c.cast(StringType).cast(DoubleType)

  /** Daily DECIMAL close bars per event type — the shared base of the
    * bar-series operators in this module (same construction as
    * [[FrontierQueriesB.windowAtr]]'s bars). */
  private[ops] def dailyClose(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy("event_type", "day")
      .agg(max_by(col("v"), col("event_id")).as("close"))

  // ------------------------------------------------------------ efficiency

  /** KAUFMAN EFFICIENCY RATIO (10-bar) — |net change| over the sum of
    * |bar-to-bar changes|: 1 means the series moved in a straight line
    * (all signal), near 0 means it churned (all noise). The
    * trend-quality gauge that decides whether a trend-following rule
    * ([[FrontierQueriesB.windowAtr]]'s volatility sibling) should be
    * trusted; the same ratio run over ingest volumes distinguishes
    * drift from flapping in a pipeline health review.
    *
    * Determinism: closes are exact DECIMAL; both numerator and
    * denominator are exact decimal window sums of absolute decimal
    * differences; ONE final hopped division, NULL on a flat window via
    * nullif, round 9.
    *
    * Scale posture: one keyed rollup to daily bars + one per-type
    * window pass — day-granular from the window on. */
  def windowKaufmanEr(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("day")
    val bars = dailyClose(s, d)
      .withColumn("prev", lag(col("close"), 1).over(wo))
      .withColumn("step", abs(col("close") - col("prev")))
      .withColumn("base", lag(col("close"), KaufmanN).over(wo))
      .withColumn("rn", row_number().over(wo))
    bars
      .withColumn("vol", sum(col("step")).over(
        wo.rowsBetween(-(KaufmanN - 1), Window.currentRow)))
      .filter(col("rn") > KaufmanN)
      .select(col("event_type"), col("day"),
        round(hop(abs(col("close") - col("base"))) /
          nullif(hop(col("vol")), lit(0.0)), 9).as("efficiency_ratio"))
      .orderBy("event_type", "day")
  }

  // --------------------------------------------------------- decomposition

  /** CLASSICAL ADDITIVE DECOMPOSITION of daily event counts — trend
    * (centered 7-day moving average), weekday seasonal (mean of the
    * detrended series per ISO weekday), and remainder. The additive
    * complement to [[DecisionQueriesB]]'s multiplicative seasonal
    * index: this one emits the full per-day decomposition a forecast
    * review plots, not just the weekday profile.
    *
    * Determinism: the trend is ONE division of an exact integer
    * 7-day window sum; detrended = count − trend is one subtraction
    * of identically-computed doubles; the per-(type, weekday) seasonal
    * mean is a DAY-ORDERED fold (never a bare double SUM across rows);
    * remainder is one more subtraction; round 9 on output.
    *
    * Scale posture: day-granular after one keyed rollup; the seasonal
    * join broadcasts a ≤ 7-rows-per-type frame. */
  def timeClassicalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (weekday(to_date(col("ts"))) + 1).as("wd"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"), min(col("wd")).as("wd"))
    val wo = Window.partitionBy("event_type").orderBy("day")
    // persisted: the seasonal rollup AND the output join both read it
    val trended = PipelineCache.getOrPersist(s"cdecomp_trended:$d") {
      daily
        .withColumn("rn", row_number().over(wo))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy("event_type")))
        .withColumn("tsum", sum(col("cnt")).over(wo.rowsBetween(-3, 3)))
        .filter(col("rn") > 3 && col("rn") <= col("nn") - 3)
        .withColumn("trend", col("tsum").cast(DoubleType) / lit(7.0))
        .withColumn("detr", col("cnt").cast(DoubleType) - col("trend"))
    }
    val seasonal = trended.groupBy("event_type", "wd").agg(
      (aggregate(
        transform(sort_array(collect_list(struct(col("day"), col("detr")))),
          p => p("detr")),
        lit(0.0), (a, x) => a + x) /
        count(lit(1)).cast(DoubleType)).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("event_type", "wd"))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("trend"), 9).as("trend"),
        round(col("seasonal"), 9).as("seasonal"),
        round(col("detr") - col("seasonal"), 9).as("remainder"))
      .orderBy("event_type", "day")
  }

  // ----------------------------------------------------------------- drift

  /** χ² DIVERGENCE BETWEEN SOURCE UNIGRAM PROFILES — for every source
    * pair, Σ (p−q)²/(p+q) over the corpus-wide top-100 vocabulary: the
    * log-free symmetric distribution distance (KL/JS need ln — not
    * cross-engine bit-stable; χ² is the standard drift screen that
    * isn't). This is "which sources speak a different language"
    * stated as numbers — the input to a mixing-weight review.
    *
    * Determinism: token probabilities are one division each of exact
    * integer counts; the per-pair sum folds in TOKEN order (the
    * m-ordered recipe); the head vocabulary is integer-ranked
    * (freq DESC, tok ASC). Missing (source, token) cells densify to
    * zero on both engines via the source × vocab spine.
    *
    * Scale posture: the vocabulary head is capped at 100 BY
    * CONSTRUCTION, so the pair grid is #sources² × 100 however large
    * the corpus; the only data-sized work is the (source, tok)
    * rollup. */
  def textSourceDivergenceChi2(s: SparkSession, d: String): DataFrame = {
    val dense = sourceDenseProfiles(s, d)
    val pairs = dense.as("a").join(dense.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        col("a.tok").as("tok"),
        when(col("a.p") + col("b.p") > 0.0,
          (col("a.p") - col("b.p")) * (col("a.p") - col("b.p")) /
            (col("a.p") + col("b.p"))).otherwise(lit(0.0)).as("term"))
    pairs.groupBy("sa", "sb").agg(
      count(lit(1)).as("n_tokens"),
      round(aggregate(
        transform(sort_array(collect_list(struct(col("tok"), col("term")))),
          p => p("term")),
        lit(0.0), (a, x) => a + x), 9).as("chi2_divergence"))
      .orderBy("sa", "sb")
  }

  /** Densified per-source top-100-vocabulary profiles — the shared
    * base of the drift screens ([[textSourceDivergenceChi2]] and
    * [[FrontierQueriesH.textJsDivergence]]): (source, tok, cnt, tot,
    * p) with missing cells densified to zero via the source × vocab
    * spine. Pure builder (no cache) so each caller's plan is exactly
    * what it was inline; unused columns prune away. */
  private[ops] def sourceDenseProfiles(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    // head-vocab selection plans as distributed TakeOrdered (top-K per
    // partition, K-row merge on the driver) — never a global sort of the
    // Heaps-law-unbounded vocabulary (r9 verdict #1)
    val topVocab = st.groupBy("tok").agg(sum(col("cnt")).as("gfreq"))
      .orderBy(col("gfreq").desc, col("tok"))
      .limit(DivergenceTopK)
      .select("tok")
    val totals = st.groupBy("source").agg(sum(col("cnt")).as("tot"))
    // prune to the head vocabulary BEFORE densifying: the spine join
    // then only ever sees sources x 100 rows on either side
    val stTop = st.join(broadcast(topVocab), Seq("tok"))
    totals.crossJoin(broadcast(topVocab))
      .join(stTop, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), col("tot"),
        (coalesce(col("cnt"), lit(0L)).cast(DoubleType) /
          col("tot").cast(DoubleType)).as("p"))
  }

  // ------------------------------------------------------------- diversity

  /** k-CENTER GREEDY EXEMPLAR SELECTION (Gonzalez '85) over the
    * embedding corpus — pick 4 maximally-spread vectors: seed with
    * vec 0, then repeatedly take the point FARTHEST from everything
    * chosen so far. The deterministic 2-approximation to the k-center
    * problem, and the "diverse exemplars" primitive of coreset /
    * eval-set construction (k-means++ is its randomized sibling —
    * determinism is the contract here). The final row reports the
    * COVERAGE RADIUS (max remaining distance²) — the quality number
    * the selection exists to minimize.
    *
    * Determinism: squared distances are index-ordered zip folds of
    * float→double casts (identical trees both engines); each argmax is
    * an ORDER BY (d² DESC, vec_id) LIMIT 1; the running min-distance
    * is a least() chain. All k stages live in ONE declarative plan —
    * no driver loop, no collect.
    *
    * Scale posture: k scans of the embedding table, each one
    * crossJoin-broadcast of a 1-row center frame + a TakeOrdered —
    * O(k·N) work, the textbook bound; at 100 TB the same plan runs
    * with the candidate argmax as a 2-stage top-1. */
  def simKcenterGreedy(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    def sqdist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b,
          (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) *
            (x.cast(DoubleType) - y.cast(DoubleType))),
        lit(0.0), (acc, v) => acc + v)
    // hint applied at the join sites; the bare frame also feeds the
    // seed output row (a standalone broadcast hint logs a warning)
    val seed = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    // stage 1: distances to the seed. Each stage frame is persisted:
    // it feeds BOTH the next argmax and the next distance update, and
    // unshared DataFrame references re-evaluate the whole prefix
    // (2^k subtree blow-up without the persist)
    var f = PipelineCache.getOrPersist(s"kcenter_f1:$d") {
      e.crossJoin(broadcast(seed))
        .select(col("vec_id"), col("embedding"),
          sqdist(col("embedding"), col("cemb")).as("dmin"))
    }
    var picks = Seq.empty[(Int, DataFrame)]
    for (k <- 2 to KCenterK) {
      val pick = f.orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
          col("dmin").as("seld"))
      picks = picks :+ (k -> pick)
      val prev = f
      f = PipelineCache.getOrPersist(s"kcenter_f$k:$d") {
        prev.crossJoin(broadcast(pick))
          .select(col("vec_id"), col("embedding"),
            least(col("dmin"), sqdist(col("embedding"), col("cemb")))
              .as("dmin"))
      }
    }
    val seedRow = seed.select(lit(1L).as("k"), col("cid").as("vec_id"),
      lit(0.0).as("sel_d2"))
    val pickRows = picks.map { case (k, p) =>
      p.select(lit(k.toLong).as("k"), col("cid").as("vec_id"),
        round(col("seld"), 9).as("sel_d2"))
    }
    val radius = f.agg(max(col("dmin")).as("r"))
      .select(lit(KCenterK + 1L).as("k"), lit(-1L).as("vec_id"),
        round(col("r"), 9).as("sel_d2"))
    (Seq(seedRow) ++ pickRows ++ Seq(radius)).reduce(_.unionAll(_))
      .orderBy("k")
  }

  // ------------------------------------------------------------ randomness

  /** WALD–WOLFOWITZ RUNS TEST on daily close direction per event
    * type — is the up/down sequence random, or does it trend/mean-
    * revert? R runs among n₁ ups and n₀ downs has
    * E[R] = 1 + 2n₁n₀/n and Var[R] = 2n₁n₀(2n₁n₀−n)/(n²(n−1)); a z
    * far from 0 means the direction sequence carries structure worth
    * a forecaster's attention (negative: trending; positive:
    * flapping). Flat days drop (standard treatment of ties).
    *
    * Determinism: direction is an exact DECIMAL comparison; the runs
    * count is an integer lag-mismatch sum; E, Var and z are one fixed
    * tree over BIGINTs with a single sqrt; NULL via nullif when the
    * variance degenerates (n₁ or n₀ = 0).
    *
    * Scale posture: day-granular after one keyed rollup; one window
    * pass for lag + one rollup for the test. */
  def statRunsTest(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("day")
    val dirs = dailyClose(s, d)
      .withColumn("prev", lag(col("close"), 1).over(wo))
      .filter(col("prev").isNotNull && col("close") =!= col("prev"))
      .withColumn("up", when(col("close") > col("prev"), 1L).otherwise(0L))
      .withColumn("pup", lag(col("up"), 1).over(wo))
    val g = dirs.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("up")).as("n_up"),
      sum(lit(1L) - col("up")).as("n_down"),
      (sum(when(col("pup").isNull || col("pup") =!= col("up"), 1L)
        .otherwise(0L))).as("runs"))
    val (n, n1, n0) = (col("n"), col("n_up"), col("n_down"))
    val twoN1N0 = lit(2L) * n1 * n0
    val eR = lit(1.0) + twoN1N0.cast(DoubleType) / n.cast(DoubleType)
    val varR = (twoN1N0 * (twoN1N0 - n)).cast(DoubleType) /
      (n * n * (n - 1L)).cast(DoubleType)
    g.select(col("event_type"), col("n"), col("n_up"), col("n_down"),
      col("runs"),
      round((col("runs").cast(DoubleType) - eR) /
        nullif(sqrt(varR), lit(0.0)), 9).as("z"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------ readability

  /** FLESCH–KINCAID GRADE LEVEL per language — the classic readability
    * screen (0.39·words/sentences + 11.8·syllables/word − 15.59) from
    * a vowel-run syllable proxy, computed CORPUS-LEVEL from aggregate
    * ratios (per-doc grades averaged would need an unbounded double
    * fold; the ratio-of-sums form is the scale-correct statement and
    * the standard corpus readability convention). On this synthetic
    * corpus sentences degenerate to 1 per doc (no terminal
    * punctuation) — the GRADE is then dominated by words/sentences,
    * which the oracle reproduces exactly; on punctuated text the same
    * query reads normally.
    *
    * Determinism: words, sentences (greatest(1, non-empty [.!?]
    * splits)) and vowel-run syllables are pure integer counts; the
    * grade is one fixed double tree, round 9.
    *
    * Scale posture: embarrassingly-parallel projection + one
    * partial-aggregated rollup. */
  def textReadabilityFk(s: SparkSession, d: String): DataFrame = {
    val sylls = expr(
      """aggregate(transform(tks,
        |  t -> greatest(CAST(1 AS BIGINT),
        |    CAST(size(regexp_extract_all(t, '[aeiou]+', 0)) AS BIGINT))),
        |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
    val sents = greatest(lit(1L),
      size(filter(split(col("text"), "[.!?]+"), p => trim(p) =!= ""))
        .cast(LongType))
    val base = Tables.documents(s, d)
      .select(col("lang"), col("text"), tokens(col("text")).as("tks"))
      .select(col("lang"),
        size(col("tks")).cast(LongType).as("w"), sents.as("sn"),
        sylls.as("y"))
    val g = base.groupBy("lang").agg(count(lit(1)).as("n_docs"),
      sum(col("w")).as("tw"), sum(col("sn")).as("ts"), sum(col("y")).as("ty"))
    g.select(col("lang"), col("n_docs"),
      round(col("ty").cast(DoubleType) / col("tw").cast(DoubleType), 9)
        .as("syllables_per_word"),
      round(lit(0.39) * (col("tw").cast(DoubleType) /
        col("ts").cast(DoubleType)) +
        lit(11.8) * (col("ty").cast(DoubleType) /
          col("tw").cast(DoubleType)) - lit(15.59), 9).as("fk_grade"))
      .orderBy("lang")
  }

  // ----------------------------------------------------- directional index

  /** WILDER DIRECTIONAL INDEX (+DI/−DI/DX, 14-bar) per event type —
    * the trend-direction composite behind ADX: directional movements
    * (+DM = up-move when it beats the down-move, −DM mirrored) and
    * true range, Wilder-smoothed (first 14 summed, then
    * s ← s − s/14 + x) to the end of the series. DX near 100 means
    * one direction dominates; near 0 means chop — the directional
    * complement to [[windowKaufmanEr]]'s efficiency.
    *
    * Determinism — the VECTOR-STATE FOLD recipe at full stretch: the
    * recursion carries FOUR doubles ([bar index, smTR, +DM sum,
    * −DM sum]) with a CASE per component (accumulate ≤ 14, Wilder
    * update after); elements are the hopped exact-decimal
    * [tr, +dm, −dm] triples in day order; the DI/DX output tree is
    * fixed, round 9. Bars before the second day drop (no previous
    * close), matching the oracle's lag-not-null filter.
    *
    * Scale posture: day-granular after one keyed rollup; one bounded
    * per-type fold. */
  def windowAdxDi(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value").cast(dec).as("v"))
      .groupBy("event_type", "day")
      .agg(max(col("v")).as("high"), min(col("v")).as("low"),
        max_by(col("v"), col("event_id")).as("close"))
    val wo = Window.partitionBy("event_type").orderBy("day")
    val moves = daily
      .withColumn("ph", lag(col("high"), 1).over(wo))
      .withColumn("pl", lag(col("low"), 1).over(wo))
      .withColumn("pc", lag(col("close"), 1).over(wo))
      .filter(col("pc").isNotNull)
      .select(col("event_type"), col("day"),
        hop(greatest(col("high") - col("low"),
          abs(col("high") - col("pc")),
          abs(col("low") - col("pc")))).as("tr"),
        when(col("high") - col("ph") > col("pl") - col("low") &&
          col("high") - col("ph") > lit(0).cast(dec),
          hop(col("high") - col("ph"))).otherwise(lit(0.0)).as("pdm"),
        when(col("pl") - col("low") > col("high") - col("ph") &&
          col("pl") - col("low") > lit(0).cast(dec),
          hop(col("pl") - col("low"))).otherwise(lit(0.0)).as("mdm"))
    def wilder(acc: Column, idx: Int, x: Column): Column =
      when(element_at(acc, 1) < 14.0,
        element_at(acc, idx + 1) + element_at(x, idx))
        .otherwise(element_at(acc, idx + 1) -
          element_at(acc, idx + 1) / lit(14.0) + element_at(x, idx))
    val folded = moves.groupBy("event_type").agg(
      count(lit(1)).as("n_bars"),
      aggregate(
        transform(
          sort_array(collect_list(struct(col("day"), col("tr"),
            col("pdm"), col("mdm")))),
          p => array(p("tr"), p("pdm"), p("mdm"))),
        array(lit(0.0), lit(0.0), lit(0.0), lit(0.0)),
        (acc, x) => array(element_at(acc, 1) + lit(1.0),
          wilder(acc, 1, x), wilder(acc, 2, x), wilder(acc, 3, x)))
        .as("st"))
    val pdi = lit(100.0) * element_at(col("st"), 3) / element_at(col("st"), 2)
    val mdi = lit(100.0) * element_at(col("st"), 4) / element_at(col("st"), 2)
    folded
      .filter(col("n_bars") >= 14)
      .select(col("event_type"), col("n_bars"),
        round(pdi, 9).as("plus_di"),
        round(mdi, 9).as("minus_di"),
        round(lit(100.0) * abs(pdi - mdi) / (pdi + mdi), 9).as("dx"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_readability_fk"        -> textReadabilityFk _,
    "window_adx_di"              -> windowAdxDi _,
    "window_kaufman_er"          -> windowKaufmanEr _,
    "time_classical_decompose"   -> timeClassicalDecompose _,
    "text_source_divergence_chi2" -> textSourceDivergenceChi2 _,
    "sim_kcenter_greedy"         -> simKcenterGreedy _,
    "stat_runs_test"             -> statRunsTest _,
  )

  private val toks = TextQueries.tokensSql

  /** Shared oracle prelude: daily close bars (arg_max on the unique
    * event_id matches the engine's max_by exactly). */
  private[ops] val dailyCloseCte =
    """daily AS (
      |  SELECT event_type,
      |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS close
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_readability_fk" ->
      s"""WITH base AS (
         |  SELECT lang,
         |    CAST(len($toks) AS BIGINT) AS w,
         |    GREATEST(1, CAST(len(list_filter(
         |      string_split_regex(text, '[.!?]+'), p -> trim(p) <> ''))
         |      AS BIGINT)) AS sn,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform($toks, t -> GREATEST(CAST(1 AS BIGINT),
         |        CAST(len(regexp_extract_all(t, '[aeiou]+')) AS BIGINT)))),
         |      (a, x) -> a + x) AS y
         |  FROM documents),
         |g AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(sn) AS BIGINT) AS ts,
         |    CAST(SUM(y) AS BIGINT) AS ty
         |  FROM base GROUP BY 1)
         |SELECT lang, n_docs,
         |  ROUND(CAST(ty AS DOUBLE) / CAST(tw AS DOUBLE), 9)
         |    AS syllables_per_word,
         |  ROUND(0.39 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE)) +
         |    11.8 * (CAST(ty AS DOUBLE) / CAST(tw AS DOUBLE)) - 15.59, 9)
         |    AS fk_grade
         |FROM g ORDER BY lang""".stripMargin,
    "window_adx_di" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    MAX(CAST(value AS DECIMAL(18,2))) AS high,
        |    MIN(CAST(value AS DECIMAL(18,2))) AS low,
        |    arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS close
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, day, high, low,
        |    lag(high) OVER w AS ph, lag(low) OVER w AS pl,
        |    lag(close) OVER w AS pc
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |moves AS (
        |  SELECT event_type, day,
        |    CAST(CAST(GREATEST(high - low, ABS(high - pc), ABS(low - pc))
        |      AS VARCHAR) AS DOUBLE) AS tr,
        |    CASE WHEN high - ph > pl - low AND
        |        high - ph > CAST(0 AS DECIMAL(18,2))
        |      THEN CAST(CAST(high - ph AS VARCHAR) AS DOUBLE)
        |      ELSE 0.0 END AS pdm,
        |    CASE WHEN pl - low > high - ph AND
        |        pl - low > CAST(0 AS DECIMAL(18,2))
        |      THEN CAST(CAST(pl - low AS VARCHAR) AS DOUBLE)
        |      ELSE 0.0 END AS mdm
        |  FROM lagged WHERE pc IS NOT NULL),
        |folded AS (
        |  SELECT event_type, COUNT(*) AS n_bars,
        |    list_reduce(
        |      list_prepend([0.0, 0.0, 0.0, 0.0],
        |        list([tr, pdm, mdm] ORDER BY day)),
        |      (acc, x) -> [acc[1] + 1.0,
        |        CASE WHEN acc[1] < 14.0 THEN acc[2] + x[1]
        |          ELSE acc[2] - acc[2] / 14.0 + x[1] END,
        |        CASE WHEN acc[1] < 14.0 THEN acc[3] + x[2]
        |          ELSE acc[3] - acc[3] / 14.0 + x[2] END,
        |        CASE WHEN acc[1] < 14.0 THEN acc[4] + x[3]
        |          ELSE acc[4] - acc[4] / 14.0 + x[3] END]) AS st
        |  FROM moves GROUP BY 1)
        |SELECT event_type, n_bars,
        |  ROUND(100.0 * st[3] / st[2], 9) AS plus_di,
        |  ROUND(100.0 * st[4] / st[2], 9) AS minus_di,
        |  ROUND(100.0 * ABS(100.0 * st[3] / st[2] - 100.0 * st[4] / st[2]) /
        |    (100.0 * st[3] / st[2] + 100.0 * st[4] / st[2]), 9) AS dx
        |FROM folded WHERE n_bars >= 14
        |ORDER BY event_type""".stripMargin,
    "window_kaufman_er" ->
      s"""WITH $dailyCloseCte,
         |bars AS (
         |  SELECT event_type, day, close,
         |    ABS(close - lag(close) OVER w) AS step,
         |    lag(close, $KaufmanN) OVER w AS base,
         |    ROW_NUMBER() OVER w AS rn
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |v AS (
         |  SELECT event_type, day, close, base, rn,
         |    SUM(step) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${KaufmanN - 1} PRECEDING AND CURRENT ROW) AS vol
         |  FROM bars)
         |SELECT event_type, day,
         |  ROUND(CAST(CAST(ABS(close - base) AS VARCHAR) AS DOUBLE) /
         |    NULLIF(CAST(CAST(vol AS VARCHAR) AS DOUBLE), 0.0), 9)
         |    AS efficiency_ratio
         |FROM v WHERE rn > $KaufmanN
         |ORDER BY event_type, day""".stripMargin,
    "time_classical_decompose" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    COUNT(*) AS cnt, MIN(isodow(ts)) AS wd
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, cnt, wd,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nn,
        |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS tsum
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |tr AS (
        |  SELECT event_type, day, cnt, wd,
        |    CAST(tsum AS DOUBLE) / 7.0 AS trend,
        |    CAST(cnt AS DOUBLE) - CAST(tsum AS DOUBLE) / 7.0 AS detr
        |  FROM t WHERE rn > 3 AND rn <= nn - 3),
        |se AS (
        |  SELECT event_type, wd,
        |    list_reduce(list_prepend(0.0, list(detr ORDER BY day)),
        |      (a, x) -> a + x) / CAST(COUNT(*) AS DOUBLE) AS seasonal
        |  FROM tr GROUP BY 1, 2)
        |SELECT tr.event_type, tr.day, tr.cnt,
        |  ROUND(tr.trend, 9) AS trend,
        |  ROUND(se.seasonal, 9) AS seasonal,
        |  ROUND(tr.detr - se.seasonal, 9) AS remainder
        |FROM tr JOIN se ON tr.event_type = se.event_type AND tr.wd = se.wd
        |ORDER BY tr.event_type, tr.day""".stripMargin,
    "text_source_divergence_chi2" ->
      s"""WITH st AS (
         |  SELECT source, tok, COUNT(*) AS cnt FROM (
         |    SELECT source, unnest($toks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |topv AS (
         |  SELECT tok FROM (
         |    SELECT tok, ROW_NUMBER() OVER (
         |      ORDER BY SUM(cnt) DESC, tok) AS rank
         |    FROM st GROUP BY tok)
         |  WHERE rank <= $DivergenceTopK),
         |tots AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
         |  FROM st GROUP BY 1),
         |dense AS (
         |  SELECT tots.source, topv.tok,
         |    CAST(COALESCE(st.cnt, 0) AS DOUBLE) / CAST(tots.tot AS DOUBLE)
         |      AS p
         |  FROM tots CROSS JOIN topv
         |  LEFT JOIN st ON st.source = tots.source AND st.tok = topv.tok),
         |pairs AS (
         |  SELECT a.source AS sa, b.source AS sb, a.tok,
         |    CASE WHEN a.p + b.p > 0.0
         |      THEN (a.p - b.p) * (a.p - b.p) / (a.p + b.p)
         |      ELSE 0.0 END AS term
         |  FROM dense a JOIN dense b
         |    ON a.tok = b.tok AND a.source < b.source)
         |SELECT sa, sb, COUNT(*) AS n_tokens,
         |  ROUND(list_reduce(list_prepend(0.0, list(term ORDER BY tok)),
         |    (a, x) -> a + x), 9) AS chi2_divergence
         |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_kcenter_greedy" -> {
      def sq(a: String, b: String): String =
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(range(1, len($a)+1), " +
          s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
          s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), (s, x) -> s + x)"
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c1 AS (SELECT vec_id AS cid, embedding AS cemb FROM e
         |  WHERE vec_id = 0),
         |f1 AS (
         |  SELECT e.vec_id, e.embedding,
         |    ${sq("e.embedding", "c1.cemb")} AS dmin
         |  FROM e CROSS JOIN c1),
         |c2 AS (SELECT vec_id AS cid, embedding AS cemb, dmin AS seld
         |  FROM f1 ORDER BY dmin DESC, vec_id LIMIT 1),
         |f2 AS (
         |  SELECT f1.vec_id, f1.embedding,
         |    LEAST(f1.dmin, ${sq("f1.embedding", "c2.cemb")}) AS dmin
         |  FROM f1 CROSS JOIN c2),
         |c3 AS (SELECT vec_id AS cid, embedding AS cemb, dmin AS seld
         |  FROM f2 ORDER BY dmin DESC, vec_id LIMIT 1),
         |f3 AS (
         |  SELECT f2.vec_id, f2.embedding,
         |    LEAST(f2.dmin, ${sq("f2.embedding", "c3.cemb")}) AS dmin
         |  FROM f2 CROSS JOIN c3),
         |c4 AS (SELECT vec_id AS cid, embedding AS cemb, dmin AS seld
         |  FROM f3 ORDER BY dmin DESC, vec_id LIMIT 1),
         |f4 AS (
         |  SELECT f3.vec_id,
         |    LEAST(f3.dmin, ${sq("f3.embedding", "c4.cemb")}) AS dmin
         |  FROM f3 CROSS JOIN c4)
         |SELECT CAST(1 AS BIGINT) AS k, cid AS vec_id, 0.0 AS sel_d2
         |  FROM c1
         |UNION ALL SELECT 2, cid, ROUND(seld, 9) FROM c2
         |UNION ALL SELECT 3, cid, ROUND(seld, 9) FROM c3
         |UNION ALL SELECT 4, cid, ROUND(seld, 9) FROM c4
         |UNION ALL SELECT 5, -1, ROUND(MAX(dmin), 9) FROM f4
         |ORDER BY k""".stripMargin
    },
    "stat_runs_test" ->
      s"""WITH $dailyCloseCte,
         |dirs AS (
         |  SELECT event_type, day, close,
         |    lag(close) OVER w AS prev
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |ups AS (
         |  SELECT event_type, day,
         |    CASE WHEN close > prev THEN 1 ELSE 0 END AS up
         |  FROM dirs WHERE prev IS NOT NULL AND close <> prev),
         |lagged AS (
         |  SELECT event_type, up,
         |    lag(up) OVER (PARTITION BY event_type ORDER BY day) AS pup
         |  FROM ups),
         |g AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(up) AS BIGINT) AS n_up,
         |    CAST(SUM(1 - up) AS BIGINT) AS n_down,
         |    CAST(SUM(CASE WHEN pup IS NULL OR pup <> up THEN 1 ELSE 0 END)
         |      AS BIGINT) AS runs
         |  FROM lagged GROUP BY 1)
         |SELECT event_type, n, n_up, n_down, runs,
         |  ROUND((CAST(runs AS DOUBLE) -
         |      (1.0 + CAST(2 * n_up * n_down AS DOUBLE) / CAST(n AS DOUBLE))) /
         |    NULLIF(SQRT(CAST(2 * n_up * n_down * (2 * n_up * n_down - n)
         |        AS DOUBLE) /
         |      CAST(n * n * (n - 1) AS DOUBLE)), 0.0), 9) AS z
         |FROM g ORDER BY event_type""".stripMargin,
  )
}
