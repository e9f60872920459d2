package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.similarity.Vectors.normSq
import graft.text.TextAnalysis.{isQuality, tokens}

/** Round-8 sixth/seventh frontier wave: lexical-diversity, survey-
  * sampling and classifier-evaluation operators. Module conventions as
  * the earlier frontier waves. */
object FrontierQueriesE {

  /** MATTR sliding-window length (tokens). */
  private val MattrW = 50

  /** PPS systematic sampling: picks per stratum. */
  private val PpsK = 20L

  /** Length rater threshold shared with the kappa study. */
  private val McLenChars = 300L

  /** Wilder RSI smoothing length (trading-day bars). */
  private val RsiN = 14

  /** Stochastic oscillator lookback (bars). */
  private val StochN = 14

  /** MMR: picks, relevance weight, query vector (the module-standard
    * probe, [[SimilarityQueries]]' vec 1). */
  private val MmrK = 4
  private val MmrLambda = 0.5
  private val MmrProbe = 1L

  private def hop(c: Column): Column = c.cast(StringType).cast(DoubleType)

  /** Daily DECIMAL OHLC-style bars (high/low/close) per event type —
    * shared by the stochastic oscillator here and
    * [[FrontierQueriesF.windowDonchianChannel]] (same construction as
    * [[FrontierQueriesD.windowAdxDi]]'s). */
  private[ops] def dailyHlc(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value").cast(dec).as("v"))
      .groupBy("event_type", "day")
      .agg(max(col("v")).as("high"), min(col("v")).as("low"),
        max_by(col("v"), col("event_id")).as("close"))
  }

  /** Oracle prelude matching [[dailyHlc]]. */
  private[ops] val dailyHlcCte =
    """daily AS (
      |  SELECT event_type,
      |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    MAX(CAST(value AS DECIMAL(18,2))) AS high,
      |    MIN(CAST(value AS DECIMAL(18,2))) AS low,
      |    arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS close
      |  FROM events GROUP BY 1, 2)""".stripMargin

  // ------------------------------------------------------------- diversity

  /** POOLED MATTR (moving-average type-token ratio, window 50) per
    * language — the length-independent lexical-diversity standard
    * (Covington & McFall '10): mean type-token ratio over every
    * 50-token sliding window (Σ distinct-type counts / (windows·W)). The naive form enumerates L·W pairs;
    * this is the CLOSED FORM — a token occurrence at position p is
    * "the first of its type inside window i" for exactly the starts
    * i ∈ [max(0, p−W+1, prev+1), min(p, L−W)], so each row
    * contributes an interval LENGTH and the window loop disappears:
    * Σ_p contribution = Σ_i distinct(i) with one lag and four
    * integer ops per token. Docs shorter than the window drop.
    *
    * Determinism: pure integer arithmetic until one pooled division
    * (Σ contributions / Σ windows), round 9.
    *
    * Scale posture: one (doc, tok)-keyed lag window + one rollup —
    * the quadratic window enumeration never materializes. */
  def textMattr(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), tokens(col("text")).as("tks"))
      .select(col("lang"), col("doc_id"),
        size(col("tks")).cast(LongType).as("len"), col("tks"))
      .filter(col("len") >= MattrW)
    val tokpos = base
      .select(col("lang"), col("doc_id"), col("len"),
        posexplode(col("tks")).as(Seq("pos", "tok")))
      .withColumn("p", col("pos").cast(LongType))
      .withColumn("prev", lag(col("p"), 1).over(
        Window.partitionBy("doc_id", "tok").orderBy("p")))
    val lo = greatest(lit(0L), col("p") - (MattrW - 1),
      coalesce(col("prev") + 1L, lit(0L)))
    val hi = least(col("p"), col("len") - MattrW)
    val contrib = tokpos
      .select(col("lang"),
        greatest(lit(0L), hi - lo + 1L).as("c"))
      .groupBy("lang").agg(sum(col("c")).as("sc"))
    val wins = base.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("len") - MattrW + 1L).as("n_windows"))
    wins.join(contrib, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_windows"),
        round(col("sc").cast(DoubleType) /
          (col("n_windows") * MattrW).cast(DoubleType), 9)
          .as("pooled_mattr"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------- sampling

  /** PPS SYSTEMATIC SAMPLE — probability-proportional-to-size
    * selection with a fixed step through the cumulative n_chars axis
    * (20 sample points per language, offset step/2): big documents
    * are proportionally more likely to carry a sample point, the
    * token-mass-faithful way to subsample a corpus for inspection
    * (the survey-statistics sibling of [[FrontierQueriesB]]'s
    * importance sampling — PPS guarantees the SAMPLE SIZE, importance
    * sampling guarantees the inclusion probability).
    *
    * Determinism: selection counts the step-grid points inside each
    * doc's cumulative interval via INTEGER floor divisions — operands
    * are shifted by 2·step so they stay positive (Spark `DIV`
    * truncates toward zero, DuckDB `//` floors: they agree ONLY on
    * nonnegative operands — the round-8 negative-DIV trap).
    *
    * Scale posture: one per-stratum cumulative window + a rollup;
    * membership is an integer predicate, no ranking join. */
  def samplePpsSystematic(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy("lang").orderBy("doc_id")
    val wt = Window.partitionBy("lang")
    val cum = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(wo))
      .withColumn("tot", sum(col("n_chars")).over(wt))
      .withColumn("step", expr(s"tot DIV $PpsK"))
      .withColumn("off", expr("step DIV 2"))
      .withColumn("hits", expr(
        """(cum - 1 - off + 2 * step) DIV step -
          |(cum - n_chars - 1 - off + 2 * step) DIV step""".stripMargin))
    cum.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("hits") >= 1L, 1L).otherwise(0L)).as("n_selected"),
      sum(col("hits")).as("total_hits"),
      sum(when(col("hits") >= 1L, col("n_chars")).otherwise(0L))
        .as("chars_selected"),
      sum(when(col("hits") >= 1L, col("doc_id")).otherwise(0L))
        .as("id_checksum"))
      .orderBy("lang")
  }

  // ------------------------------------------------------------ evaluation

  /** MATTHEWS CORRELATION COEFFICIENT between the quality gate and the
    * length rater per source — the class-imbalance-robust single
    * number for a binary classifier ([[FrontierQueriesB]]'s kappa is
    * the chance-corrected AGREEMENT view; MCC is the correlation view
    * that stays honest when one class dominates, which is exactly the
    * skewed-quality-rate regime of a real corpus).
    *
    * Determinism: the confusion cells are integer counts; the
    * numerator n11·n00 − n10·n01 stays BIGINT; the four marginal
    * factors cast to double BEFORE multiplying (their product
    * overflows BIGINT at sf1 row counts — the explicit-cast-order
    * contract); NULL via nullif when a marginal is empty.
    *
    * Scale posture: one projection + one partial-aggregated rollup. */
  def statMccConfusion(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"),
      isQuality(col("text"), TextQueries.stopwords).as("ra"),
      (col("n_chars") >= McLenChars).as("rb"))
    val g = docs.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"))
    def f(c: Column): Column = c.cast(DoubleType)
    val den = sqrt(f(col("n11") + col("n10")) * f(col("n11") + col("n01")) *
      f(col("n00") + col("n10")) * f(col("n00") + col("n01")))
    g.select(col("source"), col("n"), col("n11"), col("n10"), col("n01"),
      col("n00"),
      round((col("n11") * col("n00") - col("n10") * col("n01"))
        .cast(DoubleType) / nullif(den, lit(0.0)), 9).as("mcc"))
      .orderBy("source")
  }

  // ------------------------------------------------------------ bar series

  /** WILDER RSI (14-bar, end-of-series) per event type — the classic
    * overbought/oversold momentum gauge: smoothed gains over smoothed
    * gains+losses, in [0, 100]. Completes the Wilder family next to
    * [[FrontierQueriesB.windowAtr]] (volatility) and
    * [[FrontierQueriesD.windowAdxDi]] (direction) — the three share
    * the seed-then-smooth recursion, stated once per engine as the
    * vector-state fold.
    *
    * Determinism: gains/losses are exact DECIMAL differences hopped to
    * double; the fold carries [bar index, smoothed gain, smoothed
    * loss] with a CASE per component (sum the first 14, Wilder update
    * s ← s − s/14 + x after); RSI = 100·G/(G+L) — the /14 of the
    * textbook averages cancels in the ratio; ONE division, round 9.
    *
    * Scale posture: day-granular after one keyed rollup; one bounded
    * per-type fold. */
  def windowRsi(s: SparkSession, d: String): DataFrame = {
    val wo = Window.partitionBy("event_type").orderBy("day")
    val moves = FrontierQueriesD.dailyClose(s, d)
      .withColumn("prev", lag(col("close"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("day"),
        when(col("close") > col("prev"), hop(col("close") - col("prev")))
          .otherwise(lit(0.0)).as("gain"),
        when(col("close") < col("prev"), hop(col("prev") - col("close")))
          .otherwise(lit(0.0)).as("loss"))
    def wilder(acc: Column, idx: Int, x: Column): Column =
      when(element_at(acc, 1) < lit(RsiN.toDouble),
        element_at(acc, idx + 1) + element_at(x, idx))
        .otherwise(element_at(acc, idx + 1) -
          element_at(acc, idx + 1) / lit(RsiN.toDouble) + element_at(x, idx))
    val folded = moves.groupBy("event_type").agg(
      count(lit(1)).as("n_bars"),
      aggregate(
        transform(
          sort_array(collect_list(struct(col("day"), col("gain"),
            col("loss")))),
          p => array(p("gain"), p("loss"))),
        array(lit(0.0), lit(0.0), lit(0.0)),
        (acc, x) => array(element_at(acc, 1) + lit(1.0),
          wilder(acc, 1, x), wilder(acc, 2, x))).as("st"))
    folded
      .filter(col("n_bars") >= RsiN)
      .select(col("event_type"), col("n_bars"),
        round(lit(100.0) * element_at(col("st"), 2) /
          nullif(element_at(col("st"), 2) + element_at(col("st"), 3),
            lit(0.0)), 9).as("rsi"))
      .orderBy("event_type")
  }

  /** STOCHASTIC OSCILLATOR (%K/%D, 14-bar) per event type — where
    * today's close sits inside the trailing 14-bar high-low range
    * (%K ∈ [0, 100]) and its 3-bar smoothing (%D): the RANGE-relative
    * momentum view next to [[windowRsi]]'s change-relative one.
    *
    * Determinism: the trailing extremes are exact DECIMAL window
    * min/max; %K is ONE division of hopped exact differences (NULL on
    * a flat range via nullif); %D is the fixed tree ((k₋₂+k₋₁)+k)/3
    * over identically-computed doubles — never a bare window SUM of
    * doubles; round 9 on output only (%D folds UNrounded %K).
    *
    * Scale posture: day-granular after one keyed rollup; both window
    * passes share the one (event_type, day) sort. */
  def windowStochasticOsc(s: SparkSession, d: String): DataFrame = {
    val daily = dailyHlc(s, d)
    val wo = Window.partitionBy("event_type").orderBy("day")
    val frame = wo.rowsBetween(-(StochN - 1), Window.currentRow)
    val k = daily
      .withColumn("rn", row_number().over(wo))
      .withColumn("hh", max(col("high")).over(frame))
      .withColumn("ll", min(col("low")).over(frame))
      .filter(col("rn") >= StochN)
      .select(col("event_type"), col("day"),
        (lit(100.0) * hop(col("close") - col("ll")) /
          nullif(hop(col("hh") - col("ll")), lit(0.0))).as("k"))
    k.withColumn("k1", lag(col("k"), 1).over(wo))
      .withColumn("k2", lag(col("k"), 2).over(wo))
      .filter(col("k2").isNotNull)
      .select(col("event_type"), col("day"),
        round(col("k"), 9).as("pct_k"),
        round(((col("k2") + col("k1")) + col("k")) / lit(3.0), 9)
          .as("pct_d"))
      .orderBy("event_type", "day")
  }

  // ----------------------------------------------------------- association

  /** CRAMÉR'S V over the event-type × ISO-weekday contingency — the
    * [0, 1] EFFECT SIZE behind the χ² independence test (χ² says
    * "dependent"; V says "how much", comparable across table sizes):
    * V = √(χ²/(N·min(r−1, c−1))). The number a reviewer quotes when
    * deciding whether a statistically-significant association is
    * practically relevant.
    *
    * Determinism: the grid densifies on both engines (empty cell
    * contributes E — the χ² lesson); each dev stays exact BIGINT and
    * squares in double; the χ² sum folds in (type, weekday) order;
    * V is one division + one sqrt on top, round 9.
    *
    * Scale posture: everything after the keyed rollup is
    * dim×dim-sized (≤ types × 7 cells). */
  def statCramersV(s: SparkSession, d: String): DataFrame = {
    val byRow = Window.partitionBy("event_type")
    val byCol = Window.partitionBy("isodow")
    val all = Window.partitionBy()
    val observed = Tables.events(s, d)
      .select(col("event_type"),
        (weekday(col("ts")) + 1).cast(LongType).as("isodow"))
      .groupBy("event_type", "isodow").agg(count(lit(1)).as("o_obs"))
    val cells = observed.select("event_type").distinct()
      .crossJoin(observed.select("isodow").distinct())
      .join(observed, Seq("event_type", "isodow"), "left")
      .select(col("event_type"), col("isodow"),
        coalesce(col("o_obs"), lit(0L)).as("o"))
      .withColumn("rt", sum(col("o")).over(byRow))
      .withColumn("ct", sum(col("o")).over(byCol))
      .withColumn("n", sum(col("o")).over(all))
    val dev = (col("o") * col("n") - col("rt") * col("ct")).cast(DoubleType)
    val g = cells
      .select(col("event_type"), col("isodow"), col("n"),
        (dev * dev /
          (col("n").cast(DoubleType) * col("rt").cast(DoubleType) *
            col("ct").cast(DoubleType))).as("term"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("event_type")).as("r"),
        countDistinct(col("isodow")).as("c"),
        aggregate(
          sort_array(collect_list(struct(col("event_type"), col("isodow"),
            col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("chi2"))
    g.select(col("n"), col("r"), col("c"), round(col("chi2"), 9).as("chi2"),
      round(sqrt(col("chi2") /
        (col("n").cast(DoubleType) *
          least(col("r") - 1L, col("c") - 1L).cast(DoubleType))), 9)
        .as("cramers_v"))
  }

  // ------------------------------------------------------------ tree split

  /** BEST DECISION-TREE SPLIT BY GINI per language — one node of CART
    * training stated relationally: over candidate thresholds t on
    * n_chars (label = the quality gate), pick the t minimizing the
    * size-weighted Gini impurity of the {≤ t, > t} partition. This IS
    * the inner loop of tree/GBDT training — the histogram-and-scan
    * shape distributed frameworks implement (one pass, no per-split
    * rescan).
    *
    * Determinism: per-threshold class counts are integer prefix sums
    * over the (lang, n_chars)-aggregated frame (ties collapse BEFORE
    * the scan, so a threshold never splits equal feature values);
    * impurities are fixed double trees over BIGINT casts (counts²
    * stay under 2⁶³ to ~3B rows/group; a production build widens to
    * DECIMAL); the argmin is rank 1 by (impurity ASC, threshold ASC) —
    * both engines compare identically-computed doubles.
    *
    * Scale posture: one keyed rollup + prefix-sum windows on the
    * distinct-value frame + a rank-1 filter; the full corpus is
    * scanned once. */
  def statBestSplitGini(s: SparkSession, d: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val scan = byLang.orderBy("n_chars")
    val vals = Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        when(isQuality(col("text"), TextQueries.stopwords), 1L)
          .otherwise(0L).as("y"))
      .groupBy("lang", "n_chars")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    def gini(p: Column, n: Column): Column =
      lit(1.0) - ((p * p + (n - p) * (n - p)).cast(DoubleType) /
        (n * n).cast(DoubleType))
    val cand = vals
      .withColumn("nl", sum(col("cnt")).over(scan))
      .withColumn("pl", sum(col("pos")).over(scan))
      .withColumn("nn", sum(col("cnt")).over(byLang))
      .withColumn("pp", sum(col("pos")).over(byLang))
      .filter(col("nl") < col("nn"))
      .withColumn("wg",
        (col("nl").cast(DoubleType) * gini(col("pl"), col("nl")) +
          (col("nn") - col("nl")).cast(DoubleType) *
            gini(col("pp") - col("pl"), col("nn") - col("nl"))) /
          col("nn").cast(DoubleType))
      .withColumn("rk", row_number().over(
        byLang.orderBy(col("wg").asc, col("n_chars").asc)))
    cand.filter(col("rk") === 1)
      .select(col("lang"), col("nn").as("n"), col("pp").as("n_pos"),
        col("n_chars").as("best_threshold"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        round(gini(col("pp"), col("nn")), 9).as("parent_gini"),
        round(col("wg"), 9).as("weighted_gini"),
        round(gini(col("pp"), col("nn")) - col("wg"), 9).as("gain"))
      .orderBy("lang")
  }

  // ----------------------------------------------------------- transitions

  /** MARKOV TRANSITION MATRIX of event types per user journey — counts
    * and row-normalized probabilities of consecutive (from → to) event
    * pairs within a user's stream: the first-order behavioral model
    * behind funnel diagnostics and session simulation (the matrix a
    * product review reads to see where users go after an error).
    *
    * Determinism: ordering inside a user is the unique event_id;
    * transition counts are integers; prob is ONE division per cell,
    * round 9.
    *
    * Scale posture: one user-keyed window pass + one pair rollup —
    * the matrix is #types², constant-sized however large the log. */
  def timeMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy("event_id")))
      .filter(col("from_type").isNotNull)
    steps.groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("prob",
        round(col("n_pairs").cast(DoubleType) /
          sum(col("n_pairs")).over(Window.partitionBy("from_type"))
            .cast(DoubleType), 9))
      .orderBy("from_type", "to_type")
  }

  // ------------------------------------------------------------- retrieval

  /** MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein '98) — the
    * diversity-aware top-4 for query vector 1: greedily pick the
    * vector maximizing λ·cos(q, v) − (1−λ)·max cos(v, selected), so
    * each pick is relevant AND far from what's already shown. The
    * standard rerank between vector search and a RAG prompt
    * ([[FrontierQueriesD.simKcenterGreedy]] is its pure-diversity
    * limit λ→0 with distances).
    *
    * Determinism: cosines divide the shared dot fold by
    * √(nsq·cnsq) — identical trees both engines; the running max-sim
    * is a greatest() chain on identically-computed doubles; each
    * argmax is ORDER BY (score DESC, vec_id) LIMIT 1; scores round 9
    * at output only. k=1's score is the plain relevance (nothing
    * selected yet).
    *
    * Scale posture: k scans, each a broadcast of ONE picked row +
    * a 2-stage top-1 — O(k·N) like k-center; stage frames persist
    * (each feeds the argmax AND the next stage — the 2^k unshared-
    * reference lesson). */
  def simMmrDiversify(s: SparkSession, d: String): DataFrame = {
    def cos(emb: Column, nsq: Column, cemb: Column, cnsq: Column): Column =
      graft.similarity.Vectors.dot(emb, cemb) / sqrt(nsq * cnsq)
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nsq"))
    val q = e.filter(col("vec_id") === MmrProbe)
      .select(col("embedding").as("qemb"), col("nsq").as("qnsq"))
    val f1 = PipelineCache.getOrPersist(s"mmr_f1:$d") {
      e.filter(col("vec_id") =!= MmrProbe).crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"), col("nsq"),
          cos(col("embedding"), col("nsq"), col("qemb"), col("qnsq"))
            .as("rel"))
    }
    val mmr = (c: Column, m: Column) =>
      lit(MmrLambda) * c - lit(1.0 - MmrLambda) * m
    var pick = f1.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nsq").as("cnsq"), col("rel").as("score"))
    var out = Seq(pick.select(lit(1L).as("k"), col("cid").as("vec_id"),
      round(col("score"), 9).as("score")))
    var f = f1
    for (k <- 2 to MmrK) {
      val prev = f
      val p = pick
      f = PipelineCache.getOrPersist(s"mmr_f$k:$d") {
        val nm = cos(col("embedding"), col("nsq"), col("cemb"), col("cnsq"))
        prev.crossJoin(broadcast(p))
          .filter(col("vec_id") =!= col("cid"))
          .select(col("vec_id"), col("embedding"), col("nsq"), col("rel"),
            (if (k == 2) nm else greatest(col("msim"), nm)).as("msim"))
      }
      pick = f.orderBy(mmr(col("rel"), col("msim")).desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
          col("nsq").as("cnsq"), mmr(col("rel"), col("msim")).as("score"))
      out = out :+ pick.select(lit(k.toLong).as("k"), col("cid").as("vec_id"),
        round(col("score"), 9).as("score"))
    }
    out.reduce(_.unionAll(_)).orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_mattr"             -> textMattr _,
    "sample_pps_systematic"  -> samplePpsSystematic _,
    "stat_mcc_confusion"     -> statMccConfusion _,
    "window_rsi"             -> windowRsi _,
    "window_stochastic_osc"  -> windowStochasticOsc _,
    "stat_cramers_v"         -> statCramersV _,
    "stat_best_split_gini"   -> statBestSplitGini _,
    "time_markov_transitions" -> timeMarkovTransitions _,
    "sim_mmr_diversify"      -> simMmrDiversify _,
  )

  private val toks = TextQueries.tokensSql

  val oracle: Map[String, String] = Map(
    "text_mattr" ->
      s"""WITH base AS (
         |  SELECT lang, doc_id, $toks AS tks,
         |    CAST(len($toks) AS BIGINT) AS len
         |  FROM documents
         |  WHERE len($toks) >= $MattrW),
         |tokpos AS (
         |  SELECT lang, doc_id, len,
         |    CAST(p.pos - 1 AS BIGINT) AS p, p.w AS tok
         |  FROM (
         |    SELECT lang, doc_id, len, unnest(list_transform(
         |      range(1, len(tks) + 1),
         |      i -> struct_pack(pos := i, w := tks[i]))) AS p
         |    FROM base)),
         |lagged AS (
         |  SELECT lang, len, p,
         |    lag(p) OVER (PARTITION BY doc_id, tok ORDER BY p) AS prev
         |  FROM tokpos),
         |contrib AS (
         |  SELECT lang,
         |    CAST(SUM(GREATEST(0,
         |      LEAST(p, len - $MattrW) -
         |      GREATEST(0, p - ${MattrW - 1}, COALESCE(prev + 1, 0)) + 1))
         |      AS BIGINT) AS sc
         |  FROM lagged GROUP BY 1),
         |wins AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(len - $MattrW + 1) AS BIGINT) AS n_windows
         |  FROM base GROUP BY 1)
         |SELECT w.lang, w.n_docs, w.n_windows,
         |  ROUND(CAST(c.sc AS DOUBLE) /
         |    CAST(w.n_windows * $MattrW AS DOUBLE), 9) AS pooled_mattr
         |FROM wins w JOIN contrib c ON w.lang = c.lang
         |ORDER BY w.lang""".stripMargin,
    "sample_pps_systematic" ->
      s"""WITH c AS (
         |  SELECT lang, doc_id, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cum,
         |    SUM(n_chars) OVER (PARTITION BY lang) AS tot
         |  FROM documents),
         |h AS (
         |  SELECT lang, doc_id, n_chars,
         |    (cum - 1 - (tot // $PpsK) // 2 + 2 * (tot // $PpsK))
         |      // (tot // $PpsK) -
         |    (cum - n_chars - 1 - (tot // $PpsK) // 2 + 2 * (tot // $PpsK))
         |      // (tot // $PpsK) AS hits
         |  FROM c)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN hits >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_selected,
         |  CAST(SUM(hits) AS BIGINT) AS total_hits,
         |  CAST(SUM(CASE WHEN hits >= 1 THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS chars_selected,
         |  CAST(SUM(CASE WHEN hits >= 1 THEN doc_id ELSE 0 END) AS BIGINT)
         |    AS id_checksum
         |FROM h GROUP BY lang ORDER BY lang""".stripMargin,
    "window_rsi" ->
      s"""WITH ${FrontierQueriesD.dailyCloseCte},
         |moves AS (
         |  SELECT event_type, day,
         |    CASE WHEN close > prev
         |      THEN CAST(CAST(close - prev AS VARCHAR) AS DOUBLE)
         |      ELSE 0.0 END AS gain,
         |    CASE WHEN close < prev
         |      THEN CAST(CAST(prev - close AS VARCHAR) AS DOUBLE)
         |      ELSE 0.0 END AS loss
         |  FROM (
         |    SELECT event_type, day, close,
         |      lag(close) OVER (PARTITION BY event_type ORDER BY day) AS prev
         |    FROM daily)
         |  WHERE prev IS NOT NULL),
         |folded AS (
         |  SELECT event_type, COUNT(*) AS n_bars,
         |    list_reduce(
         |      list_prepend([0.0, 0.0, 0.0],
         |        list([gain, loss] ORDER BY day)),
         |      (acc, x) -> [acc[1] + 1.0,
         |        CASE WHEN acc[1] < ${RsiN.toDouble} THEN acc[2] + x[1]
         |          ELSE acc[2] - acc[2] / ${RsiN.toDouble} + x[1] END,
         |        CASE WHEN acc[1] < ${RsiN.toDouble} THEN acc[3] + x[2]
         |          ELSE acc[3] - acc[3] / ${RsiN.toDouble} + x[2] END]) AS st
         |  FROM moves GROUP BY 1)
         |SELECT event_type, n_bars,
         |  ROUND(100.0 * st[2] / NULLIF(st[2] + st[3], 0.0), 9) AS rsi
         |FROM folded WHERE n_bars >= $RsiN
         |ORDER BY event_type""".stripMargin,
    "window_stochastic_osc" ->
      s"""WITH $dailyHlcCte,
         |ext AS (
         |  SELECT event_type, day, close,
         |    ROW_NUMBER() OVER w AS rn,
         |    MAX(high) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${StochN - 1} PRECEDING AND CURRENT ROW) AS hh,
         |    MIN(low) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${StochN - 1} PRECEDING AND CURRENT ROW) AS ll
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |k AS (
         |  SELECT event_type, day,
         |    100.0 * CAST(CAST(close - ll AS VARCHAR) AS DOUBLE) /
         |      NULLIF(CAST(CAST(hh - ll AS VARCHAR) AS DOUBLE), 0.0) AS k
         |  FROM ext WHERE rn >= $StochN),
         |lagged AS (
         |  SELECT event_type, day, k,
         |    lag(k, 1) OVER w AS k1, lag(k, 2) OVER w AS k2
         |  FROM k
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, day,
         |  ROUND(k, 9) AS pct_k,
         |  ROUND(((k2 + k1) + k) / 3.0, 9) AS pct_d
         |FROM lagged WHERE k2 IS NOT NULL
         |ORDER BY event_type, day""".stripMargin,
    "stat_cramers_v" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
        |    COUNT(*) AS o_obs
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT t.event_type, w.isodow, COALESCE(o.o_obs, 0) AS o
        |  FROM (SELECT DISTINCT event_type FROM obs) t
        |  CROSS JOIN (SELECT DISTINCT isodow FROM obs) w
        |  LEFT JOIN obs o ON o.event_type = t.event_type
        |    AND o.isodow = w.isodow),
        |m AS (
        |  SELECT event_type, isodow, o,
        |    CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        |    CAST(SUM(o) OVER (PARTITION BY isodow) AS BIGINT) AS ct,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells),
        |g AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    COUNT(DISTINCT event_type) AS r,
        |    COUNT(DISTINCT isodow) AS c,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(o * n - rt * ct AS DOUBLE) *
        |        CAST(o * n - rt * ct AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |        ORDER BY event_type, isodow)),
        |      (a, x) -> a + x) AS chi2
        |  FROM m)
        |SELECT n, r, c, ROUND(chi2, 9) AS chi2,
        |  ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) *
        |    CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 9) AS cramers_v
        |FROM g""".stripMargin,
    "stat_best_split_gini" ->
      s"""WITH vals AS (
         |  SELECT lang, n_chars, COUNT(*) AS cnt,
         |    CAST(SUM(CASE WHEN ${TextQueries.qualityGateSql}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS pos
         |  FROM documents GROUP BY 1, 2),
         |cand AS (
         |  SELECT lang, n_chars,
         |    CAST(SUM(cnt) OVER sc AS BIGINT) AS nl,
         |    CAST(SUM(pos) OVER sc AS BIGINT) AS pl,
         |    CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS nn,
         |    CAST(SUM(pos) OVER (PARTITION BY lang) AS BIGINT) AS pp
         |  FROM vals
         |  WINDOW sc AS (PARTITION BY lang ORDER BY n_chars)),
         |scored AS (
         |  SELECT lang, n_chars, nl, pl, nn, pp,
         |    (CAST(nl AS DOUBLE) *
         |      (1.0 - CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) /
         |        CAST(nl * nl AS DOUBLE)) +
         |     CAST(nn - nl AS DOUBLE) *
         |      (1.0 - CAST((pp - pl) * (pp - pl) +
         |          ((nn - nl) - (pp - pl)) * ((nn - nl) - (pp - pl))
         |          AS DOUBLE) /
         |        CAST((nn - nl) * (nn - nl) AS DOUBLE))) /
         |      CAST(nn AS DOUBLE) AS wg
         |  FROM cand WHERE nl < nn),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY wg ASC, n_chars ASC) AS rk
         |  FROM scored)
         |SELECT lang, nn AS n, pp AS n_pos, n_chars AS best_threshold,
         |  nl AS n_left, pl AS pos_left,
         |  ROUND(1.0 - CAST(pp * pp + (nn - pp) * (nn - pp) AS DOUBLE) /
         |    CAST(nn * nn AS DOUBLE), 9) AS parent_gini,
         |  ROUND(wg, 9) AS weighted_gini,
         |  ROUND((1.0 - CAST(pp * pp + (nn - pp) * (nn - pp) AS DOUBLE) /
         |    CAST(nn * nn AS DOUBLE)) - wg, 9) AS gain
         |FROM ranked WHERE rk = 1
         |ORDER BY lang""".stripMargin,
    "time_markov_transitions" ->
      """WITH steps AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |g AS (
        |  SELECT from_type, to_type, COUNT(*) AS n_pairs
        |  FROM steps WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_pairs,
        |  ROUND(CAST(n_pairs AS DOUBLE) /
        |    CAST(SUM(n_pairs) OVER (PARTITION BY from_type) AS DOUBLE), 9)
        |    AS prob
        |FROM g ORDER BY from_type, to_type""".stripMargin,
    "sim_mmr_diversify" -> {
      def dotF(a: String, b: String): String = OracleSql.dotFold(a, b)
      def cosF(f: String, c: String): String =
        s"${dotF(s"$f.embedding", s"$c.cemb")} / sqrt($f.nsq * $c.cnsq)"
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${dotF("embedding", "embedding")} AS nsq
         |  FROM embeddings),
         |q AS (SELECT embedding AS cemb, nsq AS cnsq FROM e
         |  WHERE vec_id = $MmrProbe),
         |f1 AS (
         |  SELECT e.vec_id, e.embedding, e.nsq, ${cosF("e", "q")} AS rel
         |  FROM e CROSS JOIN q WHERE e.vec_id <> $MmrProbe),
         |c1 AS (SELECT vec_id AS cid, embedding AS cemb, nsq AS cnsq,
         |    rel AS score
         |  FROM f1 ORDER BY rel DESC, vec_id LIMIT 1),
         |f2 AS (
         |  SELECT f.vec_id, f.embedding, f.nsq, f.rel,
         |    ${cosF("f", "c")} AS msim
         |  FROM f1 f CROSS JOIN c1 c WHERE f.vec_id <> c.cid),
         |c2 AS (SELECT vec_id AS cid, embedding AS cemb, nsq AS cnsq,
         |    $MmrLambda * rel - ${1.0 - MmrLambda} * msim AS score
         |  FROM f2 ORDER BY score DESC, vec_id LIMIT 1),
         |f3 AS (
         |  SELECT f.vec_id, f.embedding, f.nsq, f.rel,
         |    GREATEST(f.msim, ${cosF("f", "c")}) AS msim
         |  FROM f2 f CROSS JOIN c2 c WHERE f.vec_id <> c.cid),
         |c3 AS (SELECT vec_id AS cid, embedding AS cemb, nsq AS cnsq,
         |    $MmrLambda * rel - ${1.0 - MmrLambda} * msim AS score
         |  FROM f3 ORDER BY score DESC, vec_id LIMIT 1),
         |f4 AS (
         |  SELECT f.vec_id, f.rel,
         |    GREATEST(f.msim, ${cosF("f", "c")}) AS msim
         |  FROM f3 f CROSS JOIN c3 c WHERE f.vec_id <> c.cid),
         |c4 AS (SELECT vec_id AS cid,
         |    $MmrLambda * rel - ${1.0 - MmrLambda} * msim AS score
         |  FROM f4 ORDER BY score DESC, vec_id LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS k, cid AS vec_id,
         |  ROUND(score, 9) AS score FROM c1
         |UNION ALL SELECT 2, cid, ROUND(score, 9) FROM c2
         |UNION ALL SELECT 3, cid, ROUND(score, 9) FROM c3
         |UNION ALL SELECT 4, cid, ROUND(score, 9) FROM c4
         |ORDER BY k""".stripMargin
    },
    "stat_mcc_confusion" ->
      s"""WITH r AS (
         |  SELECT source,
         |    ${TextQueries.qualityGateSql} AS ra,
         |    n_chars >= $McLenChars AS rb
         |  FROM documents),
         |g AS (
         |  SELECT source, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM r GROUP BY 1)
         |SELECT source, n, n11, n10, n01, n00,
         |  ROUND(CAST(n11 * n00 - n10 * n01 AS DOUBLE) /
         |    NULLIF(SQRT(CAST(n11 + n10 AS DOUBLE) *
         |      CAST(n11 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE) *
         |      CAST(n00 + n01 AS DOUBLE)), 0.0), 9) AS mcc
         |FROM g ORDER BY source""".stripMargin,
  )
}
