package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.dedup.Dedup.hexFold32
import graft.text.TextAnalysis.{isQuality, tokenCount, tokens}

/** Round-8 frontier batch: corpus-statistics, sampling, ETL-resolution
  * and evaluation operators a training-data pipeline runs between the
  * dedup and curation stages (north-star extensions; the reference's
  * only sampling/resolution analogue is the FK-resolve step of
  * /root/reference/etl_process.py:84-127).
  *
  * Shared determinism rules (ROUND_NOTES recipes): integer arithmetic
  * until one final division, m-ordered folds for any double sum,
  * md5+fold32 for anything hash-derived, DECIMAL(18,2) casts before
  * summing the double price/value columns.
  */
object FrontierQueries {

  /** Zipf fit window: ranks past the head carry no fit signal and an
    * unbounded vocabulary would make the per-group collect unbounded. */
  private val ZipfTopN = 1000

  /** Systematic sampling interval (keep the 1st of every k by doc_id). */
  private val SystematicK = 10

  /** Simulated late-arriving dimension: customers divisible by this are
    * "not yet loaded" when the fact batch lands. */
  private val LateMod = 97

  /** Johnson–Lindenstrauss projection width (embedding dim is 64). */
  private val JlK = 16
  private val JlD = 64

  // ---------------------------------------------------------------- text

  /** ZIPF RANK–FREQUENCY SLOPE per language — the log-log OLS slope of
    * frequency on rank over the top-1000 vocabulary head. Natural text
    * sits near −1 (Zipf's law); template spam or boilerplate-heavy
    * corpora flatten or steepen it, making the slope a one-number
    * corpus-health check next to [[TextQueries.textHapaxRatio]]'s tail
    * view.
    *
    * Determinism: rank is integer (row_number over freq DESC, tok ASC);
    * ln of integer args agrees cross-engine (lm_bigram precedent); the
    * four OLS sums fold in explicit rank order (the m-ordered recipe);
    * slope/intercept are divisions over identical operand trees,
    * round 9.
    *
    * Scale posture: one token explode + one (lang, tok) keyed rollup;
    * the per-lang collect is capped at 1000 structs BY CONSTRUCTION
    * (the rank filter), so the fold state is bounded by the window, not
    * the vocabulary. */
  def textZipfSlope(s: SparkSession, d: String): DataFrame = {
    val f = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("lang").orderBy(col("freq").desc, col("tok"))
    val ranked = f.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= ZipfTopN)
      .select(col("lang"), col("rank"),
        log(col("rank").cast(DoubleType)).as("x"),
        log(col("freq").cast(DoubleType)).as("y"))
    val pts = sort_array(collect_list(struct(
      col("rank").as("k"), col("x"), col("y"))))
    def fold(f: Column => Column): Column =
      aggregate(transform(col("pts"), p => f(p)), lit(0.0), (a, x) => a + x)
    val agged = ranked.groupBy("lang").agg(pts.as("pts"))
      .select(col("lang"), size(col("pts")).cast(LongType).as("n_ranks"),
        fold(p => p("x")).as("sx"), fold(p => p("y")).as("sy"),
        fold(p => p("x") * p("y")).as("sxy"),
        fold(p => p("x") * p("x")).as("sxx"))
    val n = col("n_ranks").cast(DoubleType)
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    agged.select(col("lang"), col("n_ranks"),
      round(slope, 9).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / n, 9).as("zipf_intercept"))
      .orderBy("lang")
  }

  /** ONE BPE MERGE STEP per language — the frequency table a byte-pair-
    * encoding trainer reads to pick its next merge: counts of adjacent
    * character pairs inside tokens, weighted by token occurrences, top
    * 20 per language with deterministic (cnt DESC, pair ASC) ranking.
    * Running this to fixpoint IS BPE training; one step as a declared
    * query keeps the oracle exact while exposing the trainer's hot loop
    * as an engine primitive.
    *
    * Determinism: pure integer counts, lexicographic tiebreak.
    * Scale posture: two explodes (token, then in-token pair positions)
    * + one (lang, pair) keyed rollup with partial aggregation; the pair
    * domain is bounded by charset², so the final top-k window is over a
    * small grid. */
  def textBpeMergeStep(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("pair"))
    pairs.groupBy("lang", "pair").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 20)
      .select("lang", "rank", "pair", "cnt")
      .orderBy("lang", "rank")
  }

  // ------------------------------------------------------------- sampling

  /** SYSTEMATIC SAMPLE — every k-th document per language in doc_id
    * order (k=10). The equal-interval complement to the Bernoulli and
    * reservoir samplers: zero variance in the per-stratum sample SIZE
    * (exactly ⌈n/k⌉) and deterministic membership, the properties an
    * eval-holdout builder wants when reruns must pick identical rows.
    *
    * Determinism: pure integer row_number arithmetic.
    * Scale posture: one window over the lang partition — same shape as
    * every ranked query here; at 100 TB the partition key would widen
    * to (lang, shard) to bound per-partition sort size, same plan. */
  def sampleSystematic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter((col("rn") - 1) % SystematicK === 0)
      .select(col("lang"), col("doc_id"),
        ((col("rn") - 1) / SystematicK).cast(LongType).as("sample_idx"))
      .orderBy("lang", "doc_id")
  }

  // ----------------------------------------------------------------- etl

  /** LATE-ARRIVING DIMENSION resolution — the production FK-resolve
    * pattern the reference's synchronous lookup
    * (/root/reference/etl_process.py:84-127) cannot express: when a
    * fact batch references dimension keys that have not landed yet, the
    * load must NOT drop or block; it books the fact against a
    * placeholder key (-1) and emits a backfill queue. Simulated here by
    * hiding every 97th customer from the dimension; the report is the
    * per-month reconciliation a warehouse owner watches (late counts
    * trending up = upstream dim feed lagging).
    *
    * Determinism: integer counts only.
    * Scale posture: one left equi-join facts⋈dim on the key (AQE
    * broadcasts the dim when it fits, shuffles otherwise — no hint, so
    * the 100 TB plan stays a shuffle join) + one month rollup. */
  def etlLateArrivingDim(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .filter(col("c_custkey") % LateMod =!= 0)
      .select(col("c_custkey"), col("c_nationkey"))
    Tables.orders(s, d)
      .join(dim, col("o_custkey") === col("c_custkey"), "left")
      .select(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("month"),
        col("o_custkey"), col("c_nationkey"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("c_nationkey").isNotNull, 1L).otherwise(0L))
          .as("n_resolved"),
        sum(when(col("c_nationkey").isNull, 1L).otherwise(0L)).as("n_late"),
        countDistinct(when(col("c_nationkey").isNull, col("o_custkey")))
          .as("n_late_custkeys"))
      .orderBy("month")
  }

  // ---------------------------------------------------------------- stat

  /** AUC BY RANK STATISTIC — does document length predict the quality
    * gate? The mid-rank Mann–Whitney formulation of ROC-AUC, the
    * standard one-number eval for any scalar quality signal before it
    * gates a corpus (an AUC near 0.5 means the signal is noise; near 1
    * means the gate is just a length filter in disguise — both worth
    * knowing before 100 TB flows through it).
    *
    * Determinism: mid-ranks are kept as INTEGERS via 2·midrank =
    * 2·rank + ties − 1, so U is exact and only the final AUC division
    * is floating point (round 9).
    *
    * Scale posture: one window over (lang) ordered by score + one
    * rollup; the rank window is the only sort, same cost class as any
    * ranked query at this size. */
  def statAucRank(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("lang"),
      tokenCount(col("text")).cast(LongType).as("score"),
      isQuality(col("text"), TextQueries.stopwords).as("pos"))
    val wr = Window.partitionBy("lang").orderBy("score")
    val wt = Window.partitionBy("lang", "score")
    val ranked = base
      .withColumn("r", rank().over(wr).cast(LongType))
      .withColumn("c", count(lit(1)).over(wt))
      .withColumn("midrank2", lit(2L) * col("r") + col("c") - 1L)
    ranked.groupBy("lang")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"),
        sum(when(col("pos"), col("midrank2")).otherwise(0L)).as("s2"))
      .select(col("lang"), col("n_pos"), col("n_neg"),
        round((col("s2") - col("n_pos") * (col("n_pos") + 1L))
          .cast(DoubleType) /
          nullif(lit(2L) * col("n_pos") * col("n_neg"), lit(0L))
            .cast(DoubleType), 9).as("auc"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- time

  /** BINARY-SEGMENTATION CHANGEPOINT per event type — the split day
    * maximizing the CUSUM-style statistic |meanL − meanR|·√(nL·nR/n)
    * over the daily-total series (one step of binary segmentation; a
    * full segmentation recurses on the halves with the same plan). The
    * drift question every pipeline owner asks of a source feed: WHEN
    * did the distribution move, not just whether (the KS drift query's
    * complement).
    *
    * Determinism: daily totals and their prefix sums accumulate in
    * exact DECIMAL(18,2) (the house recipe for the double value
    * column); means hop decimal→VARCHAR→double (exactly-rounded parse
    * on both engines); the statistic is the identical |·|·√ tree, and
    * the argmax tiebreaks on day ASC. Round 9 on the reported doubles.
    *
    * Scale posture: one day rollup + one window pass over the per-type
    * day series (bounded by the calendar, not the data) — candidate
    * evaluation is O(days), not O(rows). */
  def timeChangepointBinseg(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .groupBy("event_type", "day").agg(sum(col("v")).as("sd"))
    val wc = Window.partitionBy("event_type").orderBy("day")
    val wa = Window.partitionBy("event_type")
    def dbl(c: Column): Column = c.cast("string").cast(DoubleType)
    val cum = daily
      .withColumn("cums", sum(col("sd")).over(wc))
      .withColumn("idx", row_number().over(wc).cast(LongType))
      .withColumn("tot", sum(col("sd")).over(wa))
      .withColumn("m", count(lit(1)).over(wa))
      .filter(col("idx") < col("m"))
    val nL = col("idx").cast(DoubleType)
    val nR = (col("m") - col("idx")).cast(DoubleType)
    val meanL = dbl(col("cums")) / nL
    val meanR = dbl(col("tot") - col("cums")) / nR
    val stat = abs(meanL - meanR) *
      sqrt(nL * nR / col("m").cast(DoubleType))
    val wbest = Window.partitionBy("event_type")
      .orderBy(col("stat").desc, col("day"))
    cum.select(col("event_type"), col("day"), col("idx").as("n_left"),
      (col("m") - col("idx")).as("n_right"),
      meanL.as("mean_left"), meanR.as("mean_right"), stat.as("stat"))
      .withColumn("pick", row_number().over(wbest))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("n_left"), col("n_right"),
        round(col("mean_left"), 9).as("mean_left"),
        round(col("mean_right"), 9).as("mean_right"),
        round(col("stat"), 9).as("cusum_stat"))
      .orderBy("event_type")
  }

  // ----------------------------------------------------------------- sim

  /** JOHNSON–LINDENSTRAUSS DISTORTION AUDIT — project every embedding
    * through a fixed Rademacher ±1 matrix (k=16 of d=64, signs from the
    * suite's md5 fold — data-independent and engine-reproducible) and
    * histogram the norm-preservation ratio ‖Px‖²/k ÷ ‖x‖². The
    * measurement that justifies every "project first, search reduced"
    * ANN shortcut: if mass sits near ratio 1.0 the reduced index is
    * trustworthy; heavy tails say k is too small for this corpus.
    *
    * Determinism: signs are exactly ±1.0; per-vector dot products fold
    * in index order (the Vectors contract), the 16 squared projections
    * fold in j order, and the only outputs are integer bucket counts —
    * no double ever crosses the engine boundary.
    *
    * Scale posture: the sign matrix is ONE broadcast row (16×64
    * doubles); the scan side never shuffles and each row does 16
    * fused dot products — embarrassingly parallel, the same per-row
    * cost at any corpus size. */
  def simJlDistortion(s: SparkSession, d: String): DataFrame = {
    val signRow = s.range(1).select(
      transform(sequence(lit(0), lit(JlK - 1)), j =>
        transform(sequence(lit(0), lit(JlD - 1)), i =>
          lit(1.0) - lit(2.0) * pmod(hexFold32(md5(concat(
            lit("jl:"), i.cast("string"), lit(":"), j.cast("string")))),
            lit(2L)).cast(DoubleType))).as("sgnmat"))
    val projected = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        graft.similarity.Vectors.normSq(col("embedding")).as("nsq"))
      .filter(col("nsq") > 0.0)
      .crossJoin(broadcast(signRow))
      .withColumn("projs", transform(col("sgnmat"), sv =>
        aggregate(zip_with(col("embedding"), sv,
          (x, y) => x.cast(DoubleType) * y), lit(0.0), (a, x) => a + x)))
      .withColumn("pn", aggregate(transform(col("projs"), p => p * p),
        lit(0.0), (a, x) => a + x))
    projected
      .select(floor((col("pn") / lit(JlK.toDouble)) / col("nsq") *
        lit(10.0)).cast(LongType).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")
  }

  /** SPEARMAN RANK CORRELATION of quantity vs line price per return
    * flag — the monotone-association screen that survives outliers and
    * nonlinearity (the robust sibling of [[StatQueries]]' Pearson
    * matrix; in a curation stack the same operator screens "does
    * quality score rise with length" without trusting either scale).
    *
    * Determinism: mid-ranks stay INTEGER (2·midrank = 2·rank+ties−1);
    * the five moments accumulate in DECIMAL(38,0) — Σ(2r)² reaches
    * ~3·10¹⁹ at sf1, past BIGINT — then VARCHAR-hop to double for one
    * fixed Pearson tree, round 9.
    *
    * Scale posture: two rank windows over the same partition key + one
    * moment rollup; no joins. */
  def statSpearmanCorr(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val wq = Window.partitionBy("l_returnflag").orderBy("q")
    val wqt = Window.partitionBy("l_returnflag", "q")
    val wp = Window.partitionBy("l_returnflag").orderBy("p")
    val wpt = Window.partitionBy("l_returnflag", "p")
    val ranked = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").as("q"),
        col("l_extendedprice").as("p"))
      .withColumn("rx", lit(2L) * rank().over(wq).cast(LongType) +
        count(lit(1)).over(wqt) - 1L)
      .withColumn("ry", lit(2L) * rank().over(wp).cast(LongType) +
        count(lit(1)).over(wpt) - 1L)
    def hop(c: Column): Column = c.cast("string").cast(DoubleType)
    val m = ranked.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
      sum((col("rx") * col("ry")).cast(dec)).as("sxy"),
      sum((col("rx") * col("rx")).cast(dec)).as("sxx"),
      sum((col("ry") * col("ry")).cast(dec)).as("syy"))
    val nd = col("n").cast(DoubleType)
    val num = nd * hop(col("sxy")) - hop(col("sx")) * hop(col("sy"))
    val den = sqrt((nd * hop(col("sxx")) - hop(col("sx")) * hop(col("sx"))) *
      (nd * hop(col("syy")) - hop(col("sy")) * hop(col("sy"))))
    m.select(col("l_returnflag"), col("n"),
      round(num / den, 9).as("spearman_rho"))
      .orderBy("l_returnflag")
  }

  /** TYPE-TOKEN-RATIO CURVE per language — vocabulary richness at
    * fixed prefix depths (50/100/200 tokens), the length-controlled
    * lexical-diversity readout (raw TTR is confounded by document
    * length; fixing the prefix makes languages and sources comparable —
    * the standard complement to [[TextQueries.textHapaxRatio]]).
    *
    * Determinism: a type "appears in the first k tokens" iff its MIN
    * position < k — pure integer counts, one division per depth,
    * round 9.
    *
    * Scale posture: one posexplode + a (doc, tok) rollup (partial-
    * aggregated min/count) + a per-doc rollup + a per-lang rollup —
    * all keyed shuffles, no windows, no joins. */
  def textTtrCurve(s: SparkSession, d: String): DataFrame = {
    val depths = Seq(50, 100, 200)
    val perTok = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .groupBy("lang", "doc_id", "tok")
      .agg(min(col("pos")).cast(LongType).as("mp"), count(lit(1)).as("c"))
    val docAggs = Seq(sum(col("c")).as("len")) ++ depths.map(k =>
      sum(when(col("mp") < k, 1L).otherwise(0L)).as(s"types_$k"))
    val perDoc = perTok.groupBy("lang", "doc_id")
      .agg(docAggs.head, docAggs.tail: _*)
    val langAggs = Seq(count(lit(1)).as("n_docs")) ++ depths.flatMap(k => Seq(
      sum(col(s"types_$k")).as(s"st_$k"),
      sum(least(lit(k.toLong), col("len"))).as(s"sl_$k")))
    perDoc.groupBy("lang")
      .agg(langAggs.head, langAggs.tail: _*)
      .select((Seq(col("lang"), col("n_docs")) ++ depths.map(k =>
        round(col(s"st_$k").cast(DoubleType) /
          col(s"sl_$k").cast(DoubleType), 9).as(s"ttr_$k"))): _*)
      .orderBy("lang")
  }

  /** LORENZ CURVE DECILES of customer revenue — the cumulative-share
    * points behind the Gini number ([[AggWindowQueries]] has the
    * scalar; an inequality REPORT needs the curve): customers ranked
    * by revenue, cut into ntile(10), cumulative revenue share per
    * decile. The same operator profiles "what share of the corpus do
    * the heaviest domains contribute" in a data-mix review.
    *
    * Determinism: revenue sums are exact DECIMAL(18,2); ntile over a
    * totally-ordered ranking (revenue, custkey) is the standard
    * first-buckets-get-the-remainder split in both engines; cumulative
    * decimal sums are exact, VARCHAR-hop + one division, round 9.
    *
    * Scale posture (r9 verdict #1): one keyed rollup, a DISTRIBUTED
    * decile ranking via [[DistRank.ntile]] (range shuffle +
    * partition-local rank + broadcast prefix offsets — no
    * single-partition sort over the customer dimension), then a
    * constant 10-row decile window. */
  def aggLorenzPoints(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .select(col("o_custkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      .groupBy("o_custkey").agg(sum(col("v")).as("rev"))
    val wd = Window.orderBy(col("decile"))
    def hop(c: Column): Column = c.cast("string").cast(DoubleType)
    val deciles = DistRank.ntile(rev, 10, s"lorenz:$d", "decile",
        col("rev"), col("o_custkey"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("drev"))
    deciles
      .withColumn("cum", sum(col("drev")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("drev")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("decile"), col("n_customers"),
        round(hop(col("cum")) / hop(col("tot")), 9).as("cum_share"))
      .orderBy("decile")
  }

  /** 2-D PARETO FRONT of vocabulary richness vs length per language —
    * the documents no strictly-longer document beats on distinct-token
    * count ("richest for their length"). The skyline query a curation
    * owner uses to pick exemplar documents per stratum; the naive form
    * is O(n²) ALL-PAIRS — the operator's point is the one-pass window
    * formulation that scales: sort by length descending, a document
    * survives iff its vocabulary exceeds the running max over STRICTLY
    * longer documents (RANGE frame to 1 PRECEDING). Convention:
    * equal-length documents never dominate each other.
    *
    * Determinism: pure integer comparisons.
    * Scale posture: one (doc, tok) rollup + one range-frame window per
    * language partition; no self-join anywhere. */
  def curationParetoFront(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        explode(tokens(col("text"))).as("tok"))
      .groupBy("lang", "doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        countDistinct(col("tok")).as("n_types"))
    val w = Window.partitionBy("lang").orderBy(col("n_tokens").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("best_longer", max(col("n_types")).over(w))
      .filter(col("n_types") > coalesce(col("best_longer"), lit(-1L)))
      .select("lang", "doc_id", "n_tokens", "n_types")
      .orderBy(col("lang"), col("n_tokens").desc, col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_zipf_slope"         -> textZipfSlope _,
    "text_bpe_merge_step"     -> textBpeMergeStep _,
    "sample_systematic"       -> sampleSystematic _,
    "etl_late_arriving_dim"   -> etlLateArrivingDim _,
    "stat_auc_rank"           -> statAucRank _,
    "time_changepoint_binseg" -> timeChangepointBinseg _,
    "sim_jl_distortion"       -> simJlDistortion _,
    "stat_spearman_corr"      -> statSpearmanCorr _,
    "text_ttr_curve"          -> textTtrCurve _,
    "agg_lorenz_points"       -> aggLorenzPoints _,
    "curation_pareto_front"   -> curationParetoFront _,
  )

  private val toks = TextQueries.tokensSql

  val oracle: Map[String, String] = Map(
    "text_zipf_slope" ->
      s"""WITH f AS (
         |  SELECT lang, tok, COUNT(*) AS freq FROM (
         |    SELECT lang, unnest($toks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT * FROM (
         |    SELECT lang, freq, CAST(row_number() OVER (
         |        PARTITION BY lang ORDER BY freq DESC, tok) AS BIGINT) AS rank
         |    FROM f) WHERE rank <= $ZipfTopN),
         |l AS (
         |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_ranks,
         |    list_reduce(list_prepend(0.0,
         |      list(ln(CAST(rank AS DOUBLE)) ORDER BY rank)),
         |      (a, x) -> a + x) AS sx,
         |    list_reduce(list_prepend(0.0,
         |      list(ln(CAST(freq AS DOUBLE)) ORDER BY rank)),
         |      (a, x) -> a + x) AS sy,
         |    list_reduce(list_prepend(0.0,
         |      list(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE))
         |        ORDER BY rank)), (a, x) -> a + x) AS sxy,
         |    list_reduce(list_prepend(0.0,
         |      list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
         |        ORDER BY rank)), (a, x) -> a + x) AS sxx
         |  FROM r GROUP BY lang)
         |SELECT lang, n_ranks,
         |  ROUND((CAST(n_ranks AS DOUBLE) * sxy - sx * sy) /
         |    (CAST(n_ranks AS DOUBLE) * sxx - sx * sx), 9) AS zipf_slope,
         |  ROUND((sy - (CAST(n_ranks AS DOUBLE) * sxy - sx * sy) /
         |    (CAST(n_ranks AS DOUBLE) * sxx - sx * sx) * sx) /
         |    CAST(n_ranks AS DOUBLE), 9) AS zipf_intercept
         |FROM l ORDER BY lang""".stripMargin,
    "text_bpe_merge_step" ->
      s"""WITH p AS (
         |  SELECT lang, unnest(list_transform(range(1, length(tok)),
         |    i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair
         |  FROM (SELECT lang, unnest($toks) AS tok FROM documents)
         |  WHERE length(tok) >= 2),
         |c AS (SELECT lang, pair, COUNT(*) AS cnt FROM p GROUP BY 1, 2)
         |SELECT lang, rank, pair, cnt FROM (
         |  SELECT lang, pair, cnt, CAST(row_number() OVER (
         |      PARTITION BY lang ORDER BY cnt DESC, pair) AS BIGINT) AS rank
         |  FROM c) WHERE rank <= 20
         |ORDER BY lang, rank""".stripMargin,
    "sample_systematic" ->
      s"""SELECT lang, doc_id, CAST((rn - 1) // $SystematicK AS BIGINT)
         |  AS sample_idx
         |FROM (
         |  SELECT lang, doc_id, CAST(row_number() OVER (
         |      PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn
         |  FROM documents)
         |WHERE (rn - 1) % $SystematicK = 0
         |ORDER BY lang, doc_id""".stripMargin,
    "etl_late_arriving_dim" ->
      s"""WITH dim AS (
         |  SELECT c_custkey, c_nationkey FROM customer
         |  WHERE c_custkey % $LateMod <> 0)
         |SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(CASE WHEN c_nationkey IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_resolved,
         |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_late,
         |  COUNT(DISTINCT CASE WHEN c_nationkey IS NULL THEN o_custkey END)
         |    AS n_late_custkeys
         |FROM orders LEFT JOIN dim ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stat_auc_rank" ->
      s"""WITH b AS (
         |  SELECT lang, CAST(len($toks) AS BIGINT) AS score,
         |    ${TextQueries.qualityGateSql} AS pos
         |  FROM documents),
         |r AS (
         |  SELECT lang, pos,
         |    CAST(rank() OVER (PARTITION BY lang ORDER BY score) AS BIGINT)
         |      AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY lang, score) AS BIGINT) AS c
         |  FROM b),
         |a AS (
         |  SELECT lang,
         |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
         |    CAST(SUM(CASE WHEN pos THEN 2 * r + c - 1 ELSE 0 END) AS BIGINT)
         |      AS s2
         |  FROM r GROUP BY lang)
         |SELECT lang, n_pos, n_neg,
         |  ROUND(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |    CAST(NULLIF(2 * n_pos * n_neg, 0) AS DOUBLE), 9) AS auc
         |FROM a ORDER BY lang""".stripMargin,
    "time_changepoint_binseg" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        |      AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sd
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, day,
        |    SUM(sd) OVER (PARTITION BY event_type ORDER BY day) AS cums,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS idx,
        |    SUM(sd) OVER (PARTITION BY event_type) AS tot,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        |  FROM daily),
        |cand AS (
        |  SELECT event_type, day, idx AS n_left, m - idx AS n_right,
        |    CAST(CAST(cums AS VARCHAR) AS DOUBLE) / CAST(idx AS DOUBLE)
        |      AS mean_left,
        |    CAST(CAST(tot - cums AS VARCHAR) AS DOUBLE) /
        |      CAST(m - idx AS DOUBLE) AS mean_right,
        |    ABS(CAST(CAST(cums AS VARCHAR) AS DOUBLE) / CAST(idx AS DOUBLE)
        |        - CAST(CAST(tot - cums AS VARCHAR) AS DOUBLE) /
        |          CAST(m - idx AS DOUBLE)) *
        |      SQRT(CAST(idx AS DOUBLE) * CAST(m - idx AS DOUBLE) /
        |        CAST(m AS DOUBLE)) AS stat
        |  FROM cum WHERE idx < m)
        |SELECT event_type, day AS split_day, n_left, n_right,
        |  ROUND(mean_left, 9) AS mean_left,
        |  ROUND(mean_right, 9) AS mean_right,
        |  ROUND(stat, 9) AS cusum_stat
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY stat DESC, day) AS pick FROM cand)
        |WHERE pick = 1 ORDER BY event_type""".stripMargin,
    "sim_jl_distortion" -> {
      val sgnArg = "'jl:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
      s"""WITH sg AS (
         |  SELECT j, list(1.0 - 2.0 * ((${OracleSql.fold32(sgnArg)}) % 2)
         |    ORDER BY i) AS sv
         |  FROM range(0, $JlK) t(j) CROSS JOIN range(0, $JlD) u(i)
         |  GROUP BY j),
         |pr AS (
         |  SELECT e.vec_id, s.j,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, ${JlD + 1}),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * s.sv[i])),
         |      (a, x) -> a + x) AS proj,
         |    ${OracleSql.dotFold("e.embedding", "e.embedding")} AS nsq
         |  FROM embeddings e CROSS JOIN sg s),
         |pv AS (
         |  SELECT vec_id, MAX(nsq) AS nsq,
         |    list_reduce(list_prepend(0.0, list(proj * proj ORDER BY j)),
         |      (a, x) -> a + x) AS pn
         |  FROM pr GROUP BY vec_id)
         |SELECT CAST(FLOOR(pn / ${JlK.toDouble} / nsq * 10.0) AS BIGINT)
         |    AS bucket,
         |  COUNT(*) AS n_vecs
         |FROM pv WHERE nsq > 0 GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "stat_spearman_corr" -> {
      def hop(c: String) = s"CAST(CAST($c AS VARCHAR) AS DOUBLE)"
      s"""WITH r AS (
         |  SELECT l_returnflag,
         |    2 * CAST(rank() OVER (PARTITION BY l_returnflag
         |      ORDER BY l_quantity) AS BIGINT)
         |      + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
         |        AS BIGINT) - 1 AS rx,
         |    2 * CAST(rank() OVER (PARTITION BY l_returnflag
         |      ORDER BY l_extendedprice) AS BIGINT)
         |      + CAST(COUNT(*) OVER (PARTITION BY l_returnflag,
         |        l_extendedprice) AS BIGINT) - 1 AS ry
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
         |    SUM(CAST(ry * ry AS DECIMAL(38,0))) AS syy
         |  FROM r GROUP BY 1)
         |SELECT l_returnflag, n,
         |  ROUND((CAST(n AS DOUBLE) * ${hop("sxy")} -
         |      ${hop("sx")} * ${hop("sy")}) /
         |    SQRT((CAST(n AS DOUBLE) * ${hop("sxx")} -
         |        ${hop("sx")} * ${hop("sx")}) *
         |      (CAST(n AS DOUBLE) * ${hop("syy")} -
         |        ${hop("sy")} * ${hop("sy")})), 9) AS spearman_rho
         |FROM m ORDER BY l_returnflag""".stripMargin
    },
    "text_ttr_curve" ->
      s"""WITH pt AS (
         |  SELECT lang, doc_id, p.w AS tok,
         |    CAST(MIN(p.pos) - 1 AS BIGINT) AS mp, COUNT(*) AS c
         |  FROM (
         |    SELECT lang, doc_id, unnest(list_transform(
         |      range(1, len(toks) + 1),
         |      i -> struct_pack(pos := i, w := toks[i]))) AS p
         |    FROM (SELECT lang, doc_id, $toks AS toks FROM documents))
         |  GROUP BY 1, 2, 3),
         |pd AS (
         |  SELECT lang, doc_id, CAST(SUM(c) AS BIGINT) AS len,
         |    CAST(SUM(CASE WHEN mp < 50 THEN 1 ELSE 0 END) AS BIGINT) AS t50,
         |    CAST(SUM(CASE WHEN mp < 100 THEN 1 ELSE 0 END) AS BIGINT) AS t100,
         |    CAST(SUM(CASE WHEN mp < 200 THEN 1 ELSE 0 END) AS BIGINT) AS t200
         |  FROM pt GROUP BY 1, 2)
         |SELECT lang, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(t50) AS DOUBLE) /
         |    CAST(SUM(LEAST(50, len)) AS DOUBLE), 9) AS ttr_50,
         |  ROUND(CAST(SUM(t100) AS DOUBLE) /
         |    CAST(SUM(LEAST(100, len)) AS DOUBLE), 9) AS ttr_100,
         |  ROUND(CAST(SUM(t200) AS DOUBLE) /
         |    CAST(SUM(LEAST(200, len)) AS DOUBLE), 9) AS ttr_200
         |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,
    "agg_lorenz_points" ->
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT CAST(ntile(10) OVER (ORDER BY rev, o_custkey) AS BIGINT)
        |    AS decile, rev
        |  FROM rev),
        |g AS (
        |  SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS drev
        |  FROM d GROUP BY 1)
        |SELECT decile, n_customers,
        |  ROUND(CAST(CAST(SUM(drev) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
        |      AS DOUBLE) /
        |    CAST(CAST(SUM(drev) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS VARCHAR) AS DOUBLE), 9) AS cum_share
        |FROM g ORDER BY decile""".stripMargin,
    "curation_pareto_front" ->
      s"""WITH pd AS (
         |  SELECT lang, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
         |  FROM (SELECT lang, doc_id, unnest($toks) AS tok FROM documents)
         |  GROUP BY 1, 2),
         |f AS (
         |  SELECT lang, doc_id, n_tokens, n_types,
         |    MAX(n_types) OVER (PARTITION BY lang ORDER BY n_tokens DESC
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS best_longer
         |  FROM pd)
         |SELECT lang, doc_id, n_tokens, n_types
         |FROM f WHERE n_types > COALESCE(best_longer, -1)
         |ORDER BY lang, n_tokens DESC, doc_id""".stripMargin,
  )
}
