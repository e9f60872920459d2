package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.text.TextAnalysis.tokens

/** Round-8 fourth frontier wave: corpus-growth, nonparametric-test,
  * graph-topology and survey-design operators. Module conventions as
  * [[FrontierQueries]]/[[FrontierQueriesB]]: integer/DECIMAL arithmetic
  * to one final fixed double tree, m-ordered folds for double sums,
  * VARCHAR-hop for DECIMAL→DOUBLE, md5+fold32 for hash-derived picks.
  */
object FrontierQueriesC {

  /** Wilcoxon pairing pivot: spend before vs from this date (the
    * midpoint month of the 1995–2001 order span). */
  private val WilcoxonPivot = "1998-01-01"

  /** Neyman total sample budget across strata. */
  private val NeymanBudget = 100L

  /** Rich-club degree thresholds. */
  private val RichClubKs = Seq(2, 4, 8, 16)

  private def hop(c: Column): Column = c.cast(StringType).cast(DoubleType)

  // --------------------------------------------------------- corpus growth

  /** HEAPS' LAW VOCABULARY-GROWTH FIT per language — V(N) ≈ K·N^β from
    * the (cumulative tokens, cumulative vocabulary) curve sampled at
    * document-decile checkpoints. β near 0.5–0.8 is natural text;
    * β ≈ 1 means the vocabulary never saturates (OCR noise, random
    * ids), β ≈ 0 means template spam — the corpus-level growth
    * complement to [[FrontierQueries.textTtrCurve]]'s per-document
    * richness and [[FrontierQueries.textZipfSlope]]'s head fit.
    *
    * Determinism: checkpoint = integer decile arithmetic on the
    * per-lang doc row_number ((rn−1)·10 DIV n + 1 — sparse deciles for
    * tiny strata are kept as-is on both engines); a type's first
    * checkpoint is min over its docs; cumulative counts are integer
    * window sums; the OLS fold over (ln N, ln V) runs in decile order
    * (ln of INTEGER args — the Zipf-slope precedent); slope and ln-K
    * intercept round 9.
    *
    * Scale posture: the doc-granular ranking window and the two tiny
    * decile histograms are the only per-lang serial parts; the token
    * explode aggregates (lang, tok) with partial aggregation and never
    * joins anything data-sized. */
  def textVocabGrowthHeaps(s: SparkSession, d: String): DataFrame = {
    val wRank = Window.partitionBy("lang").orderBy("doc_id")
    val docs = PipelineCache.getOrPersist(s"heaps_docs:$d") {
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("rn", row_number().over(wRank).cast(LongType))
        .withColumn("nh", count(lit(1)).over(
          Window.partitionBy("lang")).cast(LongType))
        .withColumn("ckpt", expr("(rn - 1) * 10 DIV nh + 1"))
    }
    val docDec = docs
      .select(col("lang"), col("ckpt"), size(col("toks")).cast(LongType).as("len"))
      .groupBy("lang", "ckpt").agg(sum(col("len")).as("tokens_d"))
    val typeDec = docs
      .select(col("lang"), col("ckpt"), explode(col("toks")).as("tok"))
      .groupBy("lang", "tok").agg(min(col("ckpt")).as("first_ckpt"))
      .groupBy(col("lang"), col("first_ckpt").as("ckpt"))
      .agg(count(lit(1)).as("newtypes_d"))
    val wCum = Window.partitionBy("lang").orderBy("ckpt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val points = docDec.join(typeDec, Seq("lang", "ckpt"), "left")
      .withColumn("cum_tokens", sum(col("tokens_d")).over(wCum))
      .withColumn("cum_vocab",
        sum(coalesce(col("newtypes_d"), lit(0L))).over(wCum))
      .select(col("lang"), col("ckpt"),
        log(col("cum_tokens").cast(DoubleType)).as("x"),
        log(col("cum_vocab").cast(DoubleType)).as("y"))
    val pts = sort_array(collect_list(struct(col("ckpt"), col("x"), col("y"))))
    def fold(f: Column => Column): Column =
      aggregate(transform(col("pts"), p => f(p)), lit(0.0), (a, v) => a + v)
    val agged = points.groupBy("lang").agg(pts.as("pts"))
      .select(col("lang"), size(col("pts")).cast(LongType).as("n_points"),
        fold(p => p("x")).as("sx"), fold(p => p("y")).as("sy"),
        fold(p => p("x") * p("y")).as("sxy"),
        fold(p => p("x") * p("x")).as("sxx"))
    val n = col("n_points").cast(DoubleType)
    val beta = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    agged.select(col("lang"), col("n_points"),
      round(beta, 9).as("heaps_beta"),
      round((col("sy") - beta * col("sx")) / n, 9).as("heaps_ln_k"))
      .orderBy("lang")
  }

  // --------------------------------------------------- nonparametric tests

  /** WILCOXON SIGNED-RANK TEST per market segment — did per-customer
    * spend SHIFT between the first and second half of the order
    * history? The paired complement to [[AdvancedQueries]]'
    * Mann–Whitney (independent samples): each customer is their own
    * control, which is how a pipeline owner tests "did the new
    * curation change per-source token mass" without cross-source
    * variance drowning the signal. Zero diffs drop (standard
    * Wilcoxon); a missing half counts as zero spend.
    *
    * Determinism — the doubled-mid-rank recipe: diffs are exact
    * integer CENTS, |diff| mid-ranks stay integer via 2r+t−1, the
    * statistic W2 = Σ₊(2r+t−1) = 2W⁺, and the tie-corrected normal
    * approximation z = (W2 − n(n+1)/2) / √((2n(n+1)(2n+1) − Σ(t³−t))/12)
    * is one fixed tree over BIGINTs with a single division and sqrt.
    *
    * Scale posture: one keyed rollup per customer, a broadcast dim
    * join, per-segment rank windows, one rollup — no data-sized join
    * beyond the broadcast. */
  def statWilcoxonSignedRank(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val half = Tables.orders(s, d).select(col("o_custkey"),
      col("o_totalprice").cast(dec).as("v"),
      (col("o_orderdate") < lit(WilcoxonPivot)).as("h1"))
      .groupBy("o_custkey")
      .agg(sum(when(col("h1"), col("v")).otherwise(lit(0).cast(dec))).as("a"),
        sum(when(!col("h1"), col("v")).otherwise(lit(0).cast(dec))).as("b"))
    val seg = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val diffs = half.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        ((col("b") - col("a")) * 100).cast(LongType).as("dc"))
      .filter(col("dc") =!= 0L)
      .withColumn("absd", abs(col("dc")))
    val wr = Window.partitionBy("seg").orderBy("absd")
    val wt = Window.partitionBy("seg", "absd")
    val ranked = diffs
      .withColumn("r2", lit(2L) * rank().over(wr).cast(LongType) +
        count(lit(1)).over(wt) - 1L)
      .withColumn("t", count(lit(1)).over(wt))
    val g = ranked.groupBy("seg").agg(
      count(lit(1)).as("n"),
      sum(when(col("dc") > 0, col("r2")).otherwise(0L)).as("w2_plus"),
      // each of the t members of a tie group contributes t^2 - 1, so the
      // group total is t^3 - t without a distinct-group pass
      sum(col("t") * col("t") - 1L).as("tie3"))
    val nL = col("n")
    val varNum = lit(2L) * nL * (nL + 1L) * (lit(2L) * nL + 1L) - col("tie3")
    g.select(col("seg"), col("n"), col("w2_plus"),
      round((col("w2_plus") - nL * (nL + 1L) / 2L).cast(DoubleType) /
        sqrt(varNum.cast(DoubleType) / lit(12.0)), 9).as("z"))
      .orderBy("seg")
  }

  /** KENDALL'S TAU-B between daily view and purchase counts — the
    * rank-concordance answer to "do these two series move together"
    * that is robust to any monotone rescaling (Spearman is its
    * rank-Pearson sibling at row scale; Kendall's pair-counting
    * definition is exact on the DAY-GRANULAR series where the O(days²)
    * pair enumeration is trivially bounded). Days missing a count pair
    * dense-fill with zero from the event day spine.
    *
    * Determinism: concordant/discordant/tie counts are pure integer
    * comparisons over the pair grid; τ_b = (nc−nd)/√((n0−n1)(n0−n2))
    * is one fixed tree with a single sqrt of a BIGINT product.
    *
    * Scale posture: the theta self-join runs AFTER the rollup to one
    * row per day — the pair grid is days², not events², whatever the
    * corpus size (the documented bounded-frame brute-force shape; at
    * a century of days it is still 1.3M pairs). */
  def statKendallTauDaily(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("event_type"))
      .groupBy("day").agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val a = daily.select(col("day").as("d1"), col("v").as("v1"),
      col("p").as("p1"))
    val b = daily.select(col("day").as("d2"), col("v").as("v2"),
      col("p").as("p2"))
    val pairs = a.join(b, col("d1") < col("d2"))
    val g = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when((col("v1") < col("v2") && col("p1") < col("p2")) ||
        (col("v1") > col("v2") && col("p1") > col("p2")), 1L)
        .otherwise(0L)).as("nc"),
      sum(when((col("v1") < col("v2") && col("p1") > col("p2")) ||
        (col("v1") > col("v2") && col("p1") < col("p2")), 1L)
        .otherwise(0L)).as("nd"),
      sum(when(col("v1") === col("v2"), 1L).otherwise(0L)).as("tx"),
      sum(when(col("p1") === col("p2"), 1L).otherwise(0L)).as("ty"),
      sum(when(col("v1") === col("v2") && col("p1") === col("p2"), 1L)
        .otherwise(0L)).as("txy"))
    g.select(col("n_pairs"), col("nc"), col("nd"),
      round((col("nc") - col("nd")).cast(DoubleType) /
        sqrt(((col("n_pairs") - col("tx")) *
          (col("n_pairs") - col("ty"))).cast(DoubleType)), 9).as("tau_b"))
  }

  // ------------------------------------------------------- graph topology

  /** RICH-CLUB COEFFICIENT of the co-purchase graph at degree
    * thresholds k ∈ {2,4,8,16} — φ(k) = 2·E_k / (N_k·(N_k−1)), the
    * edge density among vertices of degree > k. A rising φ(k) says
    * hubs preferentially interconnect (the "rich club" of catalog
    * anchors); flat φ says the hubs are independent hits. One pass:
    * the edge list annotated with both endpoint degrees feeds all four
    * thresholds as conditional sums — no per-k subgraph is ever built.
    *
    * Determinism: pure integer counts; one division per threshold,
    * NULL when N_k < 2 via nullif, round 9.
    *
    * Scale posture: degrees and the 2-join edge annotation are the
    * [[GraphQueries]] adjacency shapes; the threshold fan-out is a
    * 4-row literal crossJoin of two 1-row aggregates. */
  def graphRichClub(s: SparkSession, d: String): DataFrame = {
    val dir = GraphQueries.sharedAdjacency(s, d)
    val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = dir.filter(col("src") < col("dst"))
    val annotated = edges
      .join(deg.select(col("src"), col("deg").as("du")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dv")),
        Seq("dst"))
    val eSums = RichClubKs.map(k =>
      sum(when(col("du") > k && col("dv") > k, 1L).otherwise(0L)).as(s"e_$k"))
    val eAgg = annotated.agg(eSums.head, eSums.tail: _*)
    val nSums = RichClubKs.map(k =>
      sum(when(col("deg") > k, 1L).otherwise(0L)).as(s"n_$k"))
    val nAgg = deg.agg(nSums.head, nSums.tail: _*)
    val wide = eAgg.crossJoin(broadcast(nAgg))
    val rows = RichClubKs.map(k =>
      s"struct(CAST($k AS BIGINT) AS k, n_$k AS n_nodes, e_$k AS n_edges)")
    wide.select(explode(expr(s"array(${rows.mkString(",")})")).as("r"))
      .select(col("r.k"), col("r.n_nodes"), col("r.n_edges"),
        round(lit(2.0) * col("r.n_edges").cast(DoubleType) /
          nullif((col("r.n_nodes") * (col("r.n_nodes") - 1L))
            .cast(DoubleType), lit(0.0)), 9).as("phi"))
      .orderBy("k")
  }

  // --------------------------------------------------------- survey design

  /** NEYMAN-ALLOCATED STRATIFIED SAMPLE — the optimal survey design:
    * a 100-doc budget split across languages proportional to
    * N_h·S_h (stratum size × stratum std of n_chars), so
    * high-variance strata get more of the budget than proportional
    * allocation would give (the way an eval-set builder spends a
    * labeling budget). Allocation floor-rounded, capped at the stratum
    * size; membership is the md5-ranked prefix per stratum.
    *
    * Determinism: S_h = √((nΣx² − (Σx)²)/(n(n−1))) over BIGINT sums
    * (n_chars ≤ 10³, Σx² fits comfortably); the cross-stratum Σ(N·S)
    * is a LANG-ORDERED fold over the collected 1-row-per-stratum
    * structs (the m-ordered recipe at group scope — never a bare
    * double SUM across groups); allocation = ⌊budget·w/Σw⌋ in one
    * fixed tree; membership rank orders by (md5, doc_id).
    *
    * Scale posture: stratum moments are one partial-aggregated
    * rollup; the fold state is one struct per stratum (bounded by
    * #languages); membership is one per-stratum rank window. */
  def sampleStratifiedNeyman(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .groupBy("lang").agg(count(lit(1)).as("nh"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("sh", sqrt(
        (col("nh") * col("sxx") - col("sx") * col("sx")).cast(DoubleType) /
          (col("nh") * (col("nh") - 1L)).cast(DoubleType)))
      .withColumn("w", col("nh").cast(DoubleType) * col("sh"))
    val sumW = stats.agg(
      aggregate(
        transform(sort_array(collect_list(struct(col("lang"), col("w")))),
          p => p("w")),
        lit(0.0), (a, x) => a + x).as("sw"))
    val alloc = stats.crossJoin(broadcast(sumW))
      .withColumn("alloc", least(col("nh"),
        floor(lit(NeymanBudget.toDouble) * col("w") / col("sw"))
          .cast(LongType)))
      .select(col("lang").as("al"), col("nh"), col("alloc"),
        round(col("w") / col("sw"), 9).as("weight_share"))
    val wPick = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val ranked = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        md5(concat(lit("ney:"), col("doc_id").cast(StringType))).as("h"))
      .withColumn("rn", row_number().over(wPick).cast(LongType))
    ranked.join(broadcast(alloc), col("lang") === col("al"))
      .filter(col("rn") <= col("alloc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_checksum"))
      .join(broadcast(alloc), col("lang") === col("al"))
      .select(col("lang"), col("nh").as("n_docs"), col("weight_share"),
        col("alloc").as("allocated"), col("n_kept"), col("id_checksum"))
      .orderBy("lang")
  }

  // ------------------------------------------------------------ volatility

  /** ULCER INDEX per event type — √(mean drawdown²) over the daily
    * close series: the drawdown-depth-AND-duration volatility number
    * ([[AggWindowQueries]]' drawdown query reports the worst single
    * excursion; the ulcer index charges for how LONG the series sits
    * below its peak, which is what an SLO review actually cares
    * about). Reported with the max drawdown for scale.
    *
    * Determinism: closes and running peaks are exact DECIMAL; each
    * drawdown is ONE division of hopped exact operands; the Σdd²
    * accumulation is a DAY-ORDERED fold (the m-ordered double-sum
    * recipe — day series are bounded, so the collect state is too);
    * √(Σ/n) and round 9 close it out.
    *
    * Scale posture: one keyed rollup to daily bars + one per-type
    * window and bounded fold — event-granular data never reaches the
    * window. */
  def windowUlcerIndex(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_id"), col("value").cast(dec).as("v"))
      .groupBy("event_type", "day")
      .agg(max_by(col("v"), col("event_id")).as("close"))
    val wo = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("peak", max(col("close")).over(wo))
      .withColumn("dd",
        (hop(col("close")) - hop(col("peak"))) / hop(col("peak")))
    val folded = dd.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      min(col("dd")).as("max_drawdown"),
      aggregate(
        transform(sort_array(collect_list(struct(col("day"), col("dd")))),
          p => p("dd") * p("dd")),
        lit(0.0), (a, x) => a + x).as("sdd2"))
    folded.select(col("event_type"), col("n_days"),
      round(col("max_drawdown"), 9).as("max_drawdown"),
      round(sqrt(col("sdd2") / col("n_days").cast(DoubleType)), 9)
        .as("ulcer_index"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_vocab_growth_heaps"   -> textVocabGrowthHeaps _,
    "stat_wilcoxon_signed_rank" -> statWilcoxonSignedRank _,
    "stat_kendall_tau_daily"    -> statKendallTauDaily _,
    "graph_rich_club"           -> graphRichClub _,
    "sample_stratified_neyman"  -> sampleStratifiedNeyman _,
    "window_ulcer_index"        -> windowUlcerIndex _,
  )

  private val toks = TextQueries.tokensSql

  val oracle: Map[String, String] = Map(
    "text_vocab_growth_heaps" ->
      s"""WITH docs AS (
         |  SELECT lang, doc_id, $toks AS toks,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang) AS nh
         |  FROM documents),
         |docs2 AS (
         |  SELECT lang, doc_id, toks,
         |    CAST((rn - 1) * 10 // nh + 1 AS BIGINT) AS ckpt
         |  FROM docs),
         |dd AS (
         |  SELECT lang, ckpt, CAST(SUM(len(toks)) AS BIGINT) AS tokens_d
         |  FROM docs2 GROUP BY 1, 2),
         |td AS (
         |  SELECT lang, ckpt, COUNT(*) AS newtypes_d FROM (
         |    SELECT lang, tok, MIN(ckpt) AS ckpt
         |    FROM (SELECT lang, ckpt, unnest(toks) AS tok FROM docs2)
         |    GROUP BY 1, 2)
         |  GROUP BY 1, 2),
         |pts AS (
         |  SELECT dd.lang, dd.ckpt,
         |    ln(CAST(SUM(dd.tokens_d) OVER w AS DOUBLE)) AS x,
         |    ln(CAST(SUM(COALESCE(td.newtypes_d, 0)) OVER w AS DOUBLE)) AS y
         |  FROM dd LEFT JOIN td ON dd.lang = td.lang AND dd.ckpt = td.ckpt
         |  WINDOW w AS (PARTITION BY dd.lang ORDER BY dd.ckpt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |m AS (
         |  SELECT lang, COUNT(*) AS n_points,
         |    list_reduce(list_prepend(0.0, list(x ORDER BY ckpt)),
         |      (a, v) -> a + v) AS sx,
         |    list_reduce(list_prepend(0.0, list(y ORDER BY ckpt)),
         |      (a, v) -> a + v) AS sy,
         |    list_reduce(list_prepend(0.0, list(x * y ORDER BY ckpt)),
         |      (a, v) -> a + v) AS sxy,
         |    list_reduce(list_prepend(0.0, list(x * x ORDER BY ckpt)),
         |      (a, v) -> a + v) AS sxx
         |  FROM pts GROUP BY 1)
         |SELECT lang, n_points,
         |  ROUND((CAST(n_points AS DOUBLE) * sxy - sx * sy) /
         |    (CAST(n_points AS DOUBLE) * sxx - sx * sx), 9) AS heaps_beta,
         |  ROUND((sy - (CAST(n_points AS DOUBLE) * sxy - sx * sy) /
         |    (CAST(n_points AS DOUBLE) * sxx - sx * sx) * sx) /
         |    CAST(n_points AS DOUBLE), 9) AS heaps_ln_k
         |FROM m ORDER BY lang""".stripMargin,
    "stat_wilcoxon_signed_rank" ->
      s"""WITH half AS (
         |  SELECT o_custkey,
         |    SUM(CASE WHEN o_orderdate < TIMESTAMP '$WilcoxonPivot'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS a,
         |    SUM(CASE WHEN o_orderdate >= TIMESTAMP '$WilcoxonPivot'
         |      THEN CAST(o_totalprice AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS b
         |  FROM orders GROUP BY 1),
         |diffs AS (
         |  SELECT c_mktsegment AS seg, CAST((b - a) * 100 AS BIGINT) AS dc,
         |    ABS(CAST((b - a) * 100 AS BIGINT)) AS absd
         |  FROM half JOIN customer ON o_custkey = c_custkey
         |  WHERE CAST((b - a) * 100 AS BIGINT) <> 0),
         |ranked AS (
         |  SELECT seg, dc,
         |    2 * CAST(rank() OVER (PARTITION BY seg ORDER BY absd) AS BIGINT)
         |      + CAST(COUNT(*) OVER (PARTITION BY seg, absd) AS BIGINT) - 1
         |      AS r2,
         |    CAST(COUNT(*) OVER (PARTITION BY seg, absd) AS BIGINT) AS t
         |  FROM diffs),
         |g AS (
         |  SELECT seg, COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN dc > 0 THEN r2 ELSE 0 END) AS BIGINT)
         |      AS w2_plus,
         |    CAST(SUM(t * t - 1) AS BIGINT) AS tie3
         |  FROM ranked GROUP BY 1)
         |SELECT seg, n, w2_plus,
         |  ROUND(CAST(w2_plus - n * (n + 1) // 2 AS DOUBLE) /
         |    SQRT(CAST(2 * n * (n + 1) * (2 * n + 1) - tie3 AS DOUBLE)
         |      / 12.0), 9) AS z
         |FROM g ORDER BY seg""".stripMargin,
    "stat_kendall_tau_daily" ->
      """WITH daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT a.v AS v1, a.p AS p1, b.v AS v2, b.p AS p2
        |  FROM daily a JOIN daily b ON a.day < b.day)
        |SELECT COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN (v1 < v2 AND p1 < p2) OR (v1 > v2 AND p1 > p2)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |  CAST(SUM(CASE WHEN (v1 < v2 AND p1 > p2) OR (v1 > v2 AND p1 < p2)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |  ROUND(CAST(SUM(CASE WHEN (v1 < v2 AND p1 < p2) OR
        |        (v1 > v2 AND p1 > p2) THEN 1 ELSE 0 END) -
        |      SUM(CASE WHEN (v1 < v2 AND p1 > p2) OR (v1 > v2 AND p1 < p2)
        |        THEN 1 ELSE 0 END) AS DOUBLE) /
        |    SQRT(CAST((COUNT(*) - SUM(CASE WHEN v1 = v2 THEN 1 ELSE 0 END)) *
        |      (COUNT(*) - SUM(CASE WHEN p1 = p2 THEN 1 ELSE 0 END))
        |      AS DOUBLE)), 9) AS tau_b
        |FROM pairs""".stripMargin,
    "graph_rich_club" -> {
      val edgesCte = GraphQueries.sharedEdgesCte
      val eCols = RichClubKs.map(k =>
        s"CAST(SUM(CASE WHEN du > $k AND dv > $k THEN 1 ELSE 0 END) AS BIGINT) AS e_$k").mkString(", ")
      val nCols = RichClubKs.map(k =>
        s"CAST(SUM(CASE WHEN deg > $k THEN 1 ELSE 0 END) AS BIGINT) AS n_$k").mkString(", ")
      val unions = RichClubKs.map(k =>
        s"SELECT CAST($k AS BIGINT) AS k, n_$k AS n_nodes, e_$k AS n_edges FROM wide").mkString("\n  UNION ALL ")
      s"""WITH $edgesCte,
         |degs AS (SELECT src, COUNT(*) AS deg FROM dir GROUP BY src),
         |ann AS (
         |  SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
         |  FROM edges e JOIN degs du ON e.u = du.src
         |  JOIN degs dv ON e.v = dv.src),
         |ea AS (SELECT $eCols FROM ann),
         |na AS (SELECT $nCols FROM degs),
         |wide AS (SELECT * FROM ea CROSS JOIN na),
         |rows_k AS (
         |  $unions)
         |SELECT k, n_nodes, n_edges,
         |  ROUND(2.0 * CAST(n_edges AS DOUBLE) /
         |    NULLIF(CAST(n_nodes * (n_nodes - 1) AS DOUBLE), 0.0), 9) AS phi
         |FROM rows_k ORDER BY k""".stripMargin
    },
    "sample_stratified_neyman" -> {
      s"""WITH stats AS (
         |  SELECT lang, COUNT(*) AS nh,
         |    CAST(SUM(n_chars) AS BIGINT) AS sx,
         |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
         |  FROM documents GROUP BY 1),
         |ws AS (
         |  SELECT lang, nh,
         |    CAST(nh AS DOUBLE) * SQRT(CAST(nh * sxx - sx * sx AS DOUBLE) /
         |      CAST(nh * (nh - 1) AS DOUBLE)) AS w
         |  FROM stats),
         |sw AS (
         |  SELECT list_reduce(list_prepend(0.0, list(w ORDER BY lang)),
         |    (a, x) -> a + x) AS sw
         |  FROM ws),
         |alloc AS (
         |  SELECT lang, nh,
         |    LEAST(nh, CAST(FLOOR(${NeymanBudget}.0 * w / sw) AS BIGINT))
         |      AS allocated,
         |    ROUND(w / sw, 9) AS weight_share
         |  FROM ws CROSS JOIN sw),
         |ranked AS (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY md5('ney:' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS rn
         |  FROM documents),
         |kept AS (
         |  SELECT r.lang, COUNT(*) AS n_kept,
         |    CAST(SUM(r.doc_id) AS BIGINT) AS id_checksum
         |  FROM ranked r JOIN alloc a ON r.lang = a.lang
         |  WHERE r.rn <= a.allocated
         |  GROUP BY 1)
         |SELECT a.lang, a.nh AS n_docs, a.weight_share,
         |  a.allocated, k.n_kept, k.id_checksum
         |FROM alloc a JOIN kept k ON a.lang = k.lang
         |ORDER BY a.lang""".stripMargin
    },
    "window_ulcer_index" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS close
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type, day,
        |    (CAST(CAST(close AS VARCHAR) AS DOUBLE) -
        |      CAST(CAST(MAX(close) OVER w AS VARCHAR) AS DOUBLE)) /
        |      CAST(CAST(MAX(close) OVER w AS VARCHAR) AS DOUBLE) AS dd
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (
        |  SELECT event_type, COUNT(*) AS n_days, MIN(dd) AS mdd,
        |    list_reduce(list_prepend(0.0, list(dd * dd ORDER BY day)),
        |      (a, x) -> a + x) AS sdd2
        |  FROM dd GROUP BY 1)
        |SELECT event_type, n_days,
        |  ROUND(mdd, 9) AS max_drawdown,
        |  ROUND(SQRT(sdd2 / CAST(n_days AS DOUBLE)), 9) AS ulcer_index
        |FROM g ORDER BY event_type""".stripMargin,
  )
}
