package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Round-9 frontier wave 24 (novelty grep-checked against all 388
  * registry names):
  *
  *  - Interpolated Kneser–Ney bigram probabilities — THE language-model
    * smoothing (`text_lm_bigram_score` is add-one/Laplace; KN's
    * continuation counts — "how many contexts does this word FOLLOW" —
    * are a different statistic entirely, and the one that made n-gram
    * LMs usable).
  *  - Iterative proportional fitting (raking) — the dataset-reweighting
    * primitive: scale (lang × length) cell weights until both marginals
    * match their targets; what a data-mix owner runs to hit a
    * prescribed language × document-length recipe without per-cell
    * quotas ([[CurationQueries]]' temperature/epoch mixes set
    * marginals directly; IPF reconciles TWO at once).
  */
object FrontierQueriesT {

  private def tokens(c: Column): Column =
    split(lower(c), "[^a-z0-9]+").cast("array<string>")

  /** INTERPOLATED KNESER–NEY bigram model (D = 0.75) over the corpus,
    * top-10 bigrams by smoothed probability per language:
    * P_KN(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·) +
    * (D·N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/|bigram types|.
    * The continuation count N₁₊(·w₂) — distinct LEFT contexts — is
    * what distinguishes KN from every count-ratio smoother: a word
    * frequent in one context only ("Francisco") gets a LOW continuation
    * probability even with a high unigram count.
    *
    * Determinism: all five statistics are exact integers (counts and
    * COUNT(DISTINCT) over the bigram table); P_KN is one fixed double
    * tree; rank by (p_kn DESC, bigram ASC) — equal trees produce equal
    * doubles in both engines, so the ordering agrees; round 9.
    *
    * Scale posture: one bigram rollup (vocabulary-sized keys, partial-
    * aggregated), two word-keyed rollups for the follower/continuation
    * counts, one broadcast global. No per-document state anywhere. */
  def textKneserNey(s: SparkSession, d: String): DataFrame = {
    val discount = 0.75
    val toks = Tables.documents(s, d)
      .select(col("lang"), tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 2)
    val bigrams = toks.select(col("lang"), explode(transform(
        sequence(lit(1), (size(col("tok")) - 1).cast(IntegerType)),
        i => struct(element_at(col("tok"), i).as("w1"),
          element_at(col("tok"), i + 1).as("w2")))).as("p"))
      .select(col("lang"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c_bg"))
    val left = bigrams.groupBy("lang", "w1")
      .agg(sum("c_bg").as("c_left"), count(lit(1)).as("n_follow"))
    val cont = bigrams.groupBy("lang", "w2")
      .agg(count(lit(1)).as("n_precede"))
    val types = bigrams.groupBy("lang").agg(count(lit(1)).as("n_types"))
    val pKn = {
      val disc = greatest(col("c_bg").cast(DoubleType) - lit(discount), lit(0.0)) /
        col("c_left").cast(DoubleType)
      val lambda = lit(discount) * col("n_follow").cast(DoubleType) /
        col("c_left").cast(DoubleType)
      val pCont = col("n_precede").cast(DoubleType) /
        col("n_types").cast(DoubleType)
      disc + lambda * pCont
    }
    val scored = bigrams
      .join(left, Seq("lang", "w1"))
      .join(cont, Seq("lang", "w2"))
      .join(types, Seq("lang"))
      .select(col("lang"), concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c_bg"), col("c_left"), col("n_follow"), col("n_precede"),
        round(pKn, 9).as("p_kn"))
    val wr = Window.partitionBy("lang")
      .orderBy(col("p_kn").desc, col("bigram"))
    scored.withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk").cast(LongType).as("rk"), col("bigram"),
        col("c_bg"), col("c_left"), col("n_follow"), col("n_precede"),
        col("p_kn"))
      .orderBy("lang", "rk")
  }

  /** Ordered left-fold of a double over group rows (house double-sum
    * recipe; k unique within group). */
  private def foldSum(k: Column, v: Column): Column =
    aggregate(
      sort_array(collect_list(struct(k.as("k"), v.as("v")))),
      lit(0.0), (acc, x) => acc + x("v"))

  /** ITERATIVE PROPORTIONAL FITTING (raking) of the (lang ×
    * length-bucket) document-count table to UNIFORM target marginals —
    * 3 unrolled row/column scaling iterations (enough for ~1e-3
    * marginal error on this grid; the unroll keeps the oracle a plain
    * CTE chain, the `dedup_cluster_labels` fixed-round pattern).
    * The output weight is the per-document sampling multiplier that
    * makes every language an equal share AND every length bucket an
    * equal share simultaneously — two marginal recipes reconciled
    * without per-cell quotas.
    *
    * Determinism: cell counts are exact integers; each scaling divides
    * by a MARGINAL SUM computed as an ordered fold (never a bare
    * double group-sum — 5-term sums still differ across engines in the
    * last ulp); weights stay un-rounded through the 6 scalings (every
    * operand chain is an identical tree) and round at 9 on output.
    *
    * Scale posture: the data-sized work is ONE (lang, bucket) rollup;
    * the IPF iterations run on the ≤5×4-cell grid — constant. At a
    * million-cell grid the folds swap for two-level mergeable sums;
    * the iteration count stays the knob. */
  def aggIpfRaking(s0: SparkSession, d: String): DataFrame = {
    // the 6 unrolled scalings are tiny statements on a ≤20-row grid —
    // the same driver-bound regime as the engine-managed recursion
    // ([[AdvancedQueries.sqlRecursiveCte]]), and it gets the same
    // lazily-scoped treatment: a cloned session pins AQE off + narrow
    // shuffle width for THIS plan only (measured 2.46 → sub-second at
    // sf0.1; AQE was materializing each scaling's exchanges as
    // sequential query stages)
    val s = s0.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val cells0 = Tables.documents(s, d)
      .select(col("lang"),
        least(floor(col("n_chars") / 200.0).cast(LongType), lit(3L)).as("lb"))
      .groupBy("lang", "lb").agg(count(lit(1)).as("n_docs"))
    // uniform targets ride as ONE broadcast row — no driver-side scalar
    // read (the pagerank discipline)
    val tgt = cells0.agg(
      (sum("n_docs").cast(DoubleType) /
        countDistinct("lang").cast(DoubleType)).as("t_lang"),
      (sum("n_docs").cast(DoubleType) /
        countDistinct("lb").cast(DoubleType)).as("t_buck"))
    var w = cells0.crossJoin(broadcast(tgt))
      .withColumn("w", col("n_docs").cast(DoubleType))
    for (_ <- 1 to 3) {
      val ls = w.groupBy("lang").agg(foldSum(col("lb"), col("w")).as("lsum"))
      w = w.join(ls, Seq("lang"))
        .withColumn("w", col("w") * col("t_lang") / col("lsum")).drop("lsum")
      val bs = w.groupBy("lb").agg(foldSum(col("lang"), col("w")).as("bsum"))
      w = w.join(bs, Seq("lb"))
        .withColumn("w", col("w") * col("t_buck") / col("bsum")).drop("bsum")
    }
    w.select(col("lang"), col("lb").as("len_bucket"), col("n_docs"),
        round(col("w") / col("n_docs").cast(DoubleType), 9).as("doc_weight"),
        round(col("w"), 9).as("cell_weight"))
      .orderBy("lang", "len_bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kneser_ney" -> textKneserNey _,
    "agg_ipf_raking"  -> aggIpfRaking _,
  )

  val oracle: Map[String, String] = Map(
    "text_kneser_ney" ->
      """WITH toks AS (
        |  SELECT lang,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS tok
        |  FROM documents),
        |bg AS (
        |  SELECT lang, tok[CAST(i AS INT)] AS w1,
        |    tok[CAST(i AS INT) + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_bg
        |  FROM (SELECT lang, tok, unnest(range(1, len(tok))) AS i FROM toks
        |        WHERE len(tok) >= 2)
        |  GROUP BY 1, 2, 3),
        |lft AS (
        |  SELECT lang, w1, CAST(SUM(c_bg) AS BIGINT) AS c_left,
        |    CAST(COUNT(*) AS BIGINT) AS n_follow
        |  FROM bg GROUP BY 1, 2),
        |cont AS (
        |  SELECT lang, w2, CAST(COUNT(*) AS BIGINT) AS n_precede
        |  FROM bg GROUP BY 1, 2),
        |ty AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM bg GROUP BY 1),
        |scored AS (
        |  SELECT bg.lang, bg.w1 || ' ' || bg.w2 AS bigram,
        |    bg.c_bg, l.c_left, l.n_follow, c.n_precede,
        |    ROUND(
        |      GREATEST(CAST(bg.c_bg AS DOUBLE) - 0.75, 0.0) /
        |        CAST(l.c_left AS DOUBLE) +
        |      (0.75 * CAST(l.n_follow AS DOUBLE) / CAST(l.c_left AS DOUBLE)) *
        |        (CAST(c.n_precede AS DOUBLE) / CAST(t.n_types AS DOUBLE)),
        |      9) AS p_kn
        |  FROM bg
        |  JOIN lft l ON bg.lang = l.lang AND bg.w1 = l.w1
        |  JOIN cont c ON bg.lang = c.lang AND bg.w2 = c.w2
        |  JOIN ty t ON bg.lang = t.lang)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, bigram, c_bg, c_left,
        |  n_follow, n_precede, p_kn
        |FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY p_kn DESC, bigram) AS rk
        |  FROM scored)
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    "agg_ipf_raking" -> {
      // one IPF iteration as two scalings; unrolled 3 times. Marginal
      // sums via the ordered-fold recipe.
      def lsum(src: String): String =
        s"""SELECT lang, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list(w ORDER BY lb)), (a, x) -> a + x) AS lsum
           |FROM $src GROUP BY lang""".stripMargin
      def bsum(src: String): String =
        s"""SELECT lb, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list(w ORDER BY lang)), (a, x) -> a + x) AS bsum
           |FROM $src GROUP BY lb""".stripMargin
      def rowScale(src: String, ls: String, out: String): String =
        s"""$out AS (SELECT c.lang, c.lb, c.n_docs,
           |  c.w * t.t_lang / m.lsum AS w
           |FROM $src c JOIN ($ls) m ON c.lang = m.lang, tgt t)""".stripMargin
      def colScale(src: String, bs: String, out: String): String =
        s"""$out AS (SELECT c.lang, c.lb, c.n_docs,
           |  c.w * t.t_buck / m.bsum AS w
           |FROM $src c JOIN ($bs) m ON c.lb = m.lb, tgt t)""".stripMargin
      s"""WITH cells AS (
         |  SELECT lang,
         |    LEAST(CAST(floor(n_chars / 200.0) AS BIGINT), 3) AS lb,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1, 2),
         |tgt AS (
         |  SELECT CAST(SUM(n_docs) AS DOUBLE) /
         |      CAST(COUNT(DISTINCT lang) AS DOUBLE) AS t_lang,
         |    CAST(SUM(n_docs) AS DOUBLE) /
         |      CAST(COUNT(DISTINCT lb) AS DOUBLE) AS t_buck
         |  FROM cells),
         |w0 AS (SELECT lang, lb, n_docs, CAST(n_docs AS DOUBLE) AS w
         |  FROM cells),
         |${rowScale("w0", lsum("w0"), "w1")},
         |${colScale("w1", bsum("w1"), "w2")},
         |${rowScale("w2", lsum("w2"), "w3")},
         |${colScale("w3", bsum("w3"), "w4")},
         |${rowScale("w4", lsum("w4"), "w5")},
         |${colScale("w5", bsum("w5"), "w6")}
         |SELECT lang, lb AS len_bucket, n_docs,
         |  ROUND(w / CAST(n_docs AS DOUBLE), 9) AS doc_weight,
         |  ROUND(w, 9) AS cell_weight
         |FROM w6 ORDER BY lang, len_bucket""".stripMargin
    },
  )
}
