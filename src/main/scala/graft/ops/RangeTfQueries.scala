package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range join (bucketed) + TF term-ranking — two more operators the
  * reference lacks but a complete engine needs.
  */
object RangeTfQueries {

  /** Non-uniform value bands: [lo, hi) → band_id. */
  private val bands: Seq[(Int, Long, Long)] = Seq(
    (0, 0L, 50000L), (1, 50000L, 100000L), (2, 100000L, 200000L),
    (3, 200000L, 400000L), (4, 400000L, 1000000L))
  private val W = 50000L // coarse bucket width

  /** Scalable range join: each band explodes to the coarse buckets it
    * covers, the fact side computes its bucket arithmetically, the join
    * is an EQUI-join on bucket + residual [lo,hi) filter. A naive
    * non-equi join is a broadcast nested loop (fine for 5 bands, fatal
    * for 5M intervals); the bucket expansion keeps it a hash join at
    * any interval count. Verified against the naive formulation in
    * DuckDB — different algorithm, same rows. */
  def joinRangeBucketed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bandBuckets = bands.toDF("band_id", "lo", "hi")
      .select(col("band_id"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / W).cast(LongType),
          floor((col("hi") - 1) / W).cast(LongType))).as("bucket"))
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        floor(col("o_totalprice") / W).cast(LongType).as("bucket"))
    orders.join(broadcast(bandBuckets), Seq("bucket"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy("band_id")
  }

  /** Audit windows for [[joinIntervalOverlap]]: 40 overlapping 30-hour
    * windows starting every 18 hours from 2024-01-01 (seconds offsets),
    * [lo, hi) half-open. Deliberately overlapping so activities match
    * several windows. */
  private val auditWindows: Seq[(Int, Long, Long)] =
    Seq.tabulate(40)(w => (w, w * 64800L, w * 64800L + 108000L))
  private val IW = 86400L // interval-join bucket width: 1 day
  private val Epoch2024 = 1704067200L // 2024-01-01 00:00:00 UTC

  /** INTERVAL × INTERVAL overlap join — the two-sided generalization of
    * the point-in-range join above: per-user daily activity intervals
    * [first event, last event] against overlapping audit windows;
    * output = per-window activity count + distinct users.
    *
    * Scale recipe: both interval sets replicate to the fixed-width
    * buckets they span, the join is an EQUI-join on bucket + residual
    * overlap test, and the FIRST-SHARED-BUCKET OWNERSHIP guard
    * (`bucket == max(⌊a_lo/W⌋, ⌊w_lo/W⌋)`) emits each overlapping pair
    * exactly once — no distinct pass to dedup multi-bucket matches.
    * (The shared bucket range of an overlapping pair starts at that
    * max, so the owner bucket always exists; a naive theta join is a
    * nested loop that dies at interval counts a bucket join shrugs at.)
    * Times are second-truncated integer offsets on both engines
    * (ns-vs-µs truncation hazard, as in window_funnel). */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val win = auditWindows.toDF("win_id", "w_lo", "w_hi")
      .select(col("win_id"), col("w_lo"), col("w_hi"),
        explode(sequence(floor(col("w_lo") / IW).cast(LongType),
          floor((col("w_hi") - 1) / IW).cast(LongType))).as("bucket"))
    val act = Tables.events(s, d)
      .select(col("user_id"),
        (unix_timestamp(date_trunc("second", col("ts"))) - Epoch2024).as("sec"))
      .groupBy(col("user_id"), (col("sec") / IW).cast(LongType).as("day"))
      .agg(min(col("sec")).as("a_lo"), max(col("sec")).as("a_hi"))
    val actB = act.select(col("user_id"), col("a_lo"), col("a_hi"),
      explode(sequence((col("a_lo") / IW).cast(LongType),
        (col("a_hi") / IW).cast(LongType))).as("bucket"))
    actB.join(broadcast(win), Seq("bucket"))
      .filter(col("a_lo") < col("w_hi") && col("a_hi") >= col("w_lo"))
      .filter(col("bucket") === greatest(
        (col("a_lo") / IW).cast(LongType), (col("w_lo") / IW).cast(LongType)))
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_overlap"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("win_id")
  }

  /** Top-3 characteristic terms per document by tf/(df+1) — the tf-idf
    * shape with a rational weight instead of ln() (libm log differs in
    * the last ulp across engines; integer-ratio scores are bit-exact).
    * Two shuffles: (doc, term) counts, then term document-frequencies
    * broadcast back. */
  def textTfRank(s: SparkSession, d: String): DataFrame = {
    // tf feeds BOTH the df aggregation and the join probe; persist it so
    // the explode+count runs once (exchange reuse alone still re-runs
    // the final aggregation in each branch, and AQE stage boundaries can
    // break even that) — same lifecycle pattern as the dedup bases
    val tf = PipelineCache.getOrPersist(s"tfrank:tf:$d")(
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast(DoubleType) / (col("df") + lit(1)).cast(DoubleType)).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rk")
  }

  /** LEFT-OUTER interval ATTRIBUTION join — the batch anchor for the
    * streaming view→buy join (`Streams.viewToBuyJoin("left_outer")`):
    * every purchase matched to the same user's views in the PRECEDING
    * hour, unmatched purchases kept null-padded (−1 sentinels so the
    * output stays sortable/hashable). Timestamps are compared at
    * MICROsecond precision — exactly what the engine's parquet read
    * yields and what the streaming join compares — with the DuckDB side
    * explicitly `date_trunc('microseconds', …)` so both engines state
    * the same total order (the etl_cdc_compaction lesson). The
    * StreamingSpec batch-equivalence bridge replays the same corpus
    * through the watermarky stream-stream join and must reproduce THIS
    * oracle-checked row set.
    *
    * Scale posture: an equi-join on user_id with the hour bound as a
    * residual range predicate — one hash exchange per side; fan-out
    * bounded by per-user views within an hour (retention-style bound,
    * not corpus size). The streaming form holds the same window as
    * keyed state instead of shuffling history. */
  def joinAttributionInterval(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value").cast(DecimalType(18, 2)).as("v"),
      unix_micros(col("ts")).as("us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("us").as("view_us"),
        col("event_id").as("view_id"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("buy_us"),
        col("event_id").as("buy_id"), col("v"))
    buys.join(views,
        col("vu") === col("user_id") &&
          col("view_us") <= col("buy_us") &&
          col("view_us") >= col("buy_us") - hourUs,
        "left")
      .select(col("user_id"), col("buy_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        col("buy_us"), coalesce(col("view_us"), lit(-1L)).as("view_us"),
        col("v").cast(DoubleType).as("buy_value"))
      .orderBy("user_id", "buy_id", "view_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_range_bucketed"   -> joinRangeBucketed _,
    "join_interval_overlap" -> joinIntervalOverlap _,
    "join_attribution_interval" -> joinAttributionInterval _,
    "text_tf_rank"          -> textTfRank _,
  )

  private val bandsSql = bands
    .map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

  private val winSql = auditWindows
    .map { case (w, lo, hi) => s"($w, $lo, $hi)" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "join_attribution_interval" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |vw AS (SELECT user_id AS vu, us AS view_us, event_id AS view_id
        |  FROM ev WHERE event_type = 'view'),
        |py AS (SELECT user_id, us AS buy_us, event_id AS buy_id, v
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT p.user_id, p.buy_id,
        |  COALESCE(w.view_id, -1) AS view_id, p.buy_us,
        |  COALESCE(w.view_us, -1) AS view_us,
        |  CAST(p.v AS DOUBLE) AS buy_value
        |FROM py p LEFT JOIN vw w ON w.vu = p.user_id
        |  AND w.view_us <= p.buy_us
        |  AND w.view_us >= p.buy_us - 3600000000
        |ORDER BY p.user_id, p.buy_id, view_id""".stripMargin,
    "join_interval_overlap" ->
      // naive theta join — different algorithm (no buckets), same rows
      s"""WITH win(win_id, w_lo, w_hi) AS (VALUES $winSql),
         |ev AS (SELECT user_id,
         |    datediff('second', TIMESTAMP '2024-01-01 00:00:00',
         |      date_trunc('second', ts)) AS sec
         |  FROM events),
         |act AS (SELECT user_id, sec // $IW AS day,
         |    MIN(sec) AS a_lo, MAX(sec) AS a_hi
         |  FROM ev GROUP BY 1, 2)
         |SELECT win_id, COUNT(*) AS n_overlap,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM act JOIN win ON a_lo < w_hi AND a_hi >= w_lo
         |GROUP BY win_id ORDER BY win_id""".stripMargin,
    "join_range_bucketed" ->
      s"""WITH bands(band_id, lo, hi) AS (VALUES $bandsSql)
         |SELECT band_id, COUNT(*) AS n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders JOIN bands
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "text_tf_rank" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($toksSql) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
         |SELECT doc_id, rk, term, tf, df, score FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         |    CAST(tf.tf AS DOUBLE) / CAST(dfc.df + 1 AS DOUBLE) AS score,
         |    CAST(row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfc.df + 1 AS DOUBLE) DESC,
         |               tf.term) AS INTEGER) AS rk
         |  FROM tf JOIN dfc ON tf.term = dfc.term)
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
  )
}
