package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_mattr"            -> textMattr _,
    "sample_pps_systematic" -> samplePpsSystematic _,
    "stat_mcc_confusion"    -> statMccConfusion _,
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
