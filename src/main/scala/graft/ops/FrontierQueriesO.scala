package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.text.TextAnalysis.{markerCount, tokenCount, tokens}

/** Round-8 eighteenth frontier wave: Yule's K (the classic
  * repeat-rate lexical constant over the frequency spectrum — an
  * all-integer statistic where the TTR family needs curves), Fleiss'
  * κ (multi-rater agreement across the three quality gates — the
  * k-rater completion of Cohen's κ, and the AGREEMENT reading of the
  * same gate table [[FrontierQueriesJ.statCochranQ]] reads for rate
  * equality), and the log-rank test (do two customer populations
  * churn at the same rate — the inferential companion of
  * [[FrontierQueriesJ.statKaplanMeier]]'s curve). Registry novelty
  * grep-checked first (ROUND_NOTES item 23). Module conventions as
  * the earlier waves.
  */
object FrontierQueriesO {

  /** Same censoring convention as the KM curve. */
  private val LrCensorDays = 90

  // ---------------------------------------------------------------- lexical

  /** YULE'S K — the repeat-rate constant K = 10⁴·(Σ c² − N)/N² over
    * the corpus unigram counts: text with heavy type reuse scores
    * high, lexically rich text low, and unlike raw TTR the statistic
    * is (asymptotically) length-invariant — the one-number lexical
    * fingerprint next to [[TextQueries.textHapaxRatio]] (tail mass),
    * `text_ttr_curve` (growth), and `text_mattr` (windowed).
    *
    * Determinism: Σc² and N are exact BIGINT (Σc² ≤ 10¹³ at sf1 —
    * audited; DECIMAL at 100 TB); K is one fixed tree; round 9.
    *
    * Scale posture: one token rollup + one constant-width rollup. */
  def textYulesK(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    cnts.agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
      sum(col("c") * col("c")).as("sc2"))
      .select(col("vocab"), col("n_tokens"),
        round(lit(10000.0) * (col("sc2") - col("n_tokens")).cast(DoubleType) /
          (col("n_tokens").cast(DoubleType) *
            col("n_tokens").cast(DoubleType)), 9).as("yules_k"))
  }

  // -------------------------------------------------------------- agreement

  /** FLEISS' κ — chance-corrected agreement of the THREE binary
    * quality raters (length, token-count, stopword gates) across all
    * documents: κ = (P̄ − P̄ₑ)/(1 − P̄ₑ). The k-rater generalization of
    * [[StatQueries.statCohensKappa]], and the complement of
    * [[FrontierQueriesJ.statCochranQ]] on the same gate table — Q asks
    * whether the gates pass at the same RATE, κ whether they agree on
    * the same DOCUMENTS.
    *
    * Determinism: with x = per-doc pass count (0..3), the agreement
    * numerator Σ[x(x−1) + (3−x)(2−x)] is an exact BIGINT (per-doc
    * pair counts over a fixed denominator n·r(r−1) = 6n), the chance
    * term uses the exact marginal Σx, and κ is one fixed tree; round 9.
    *
    * Scale posture: one constant-width conditional rollup. */
  def statFleissKappa(s: SparkSession, d: String): DataFrame = {
    val x = when(col("n_chars") >= 300L, 1L).otherwise(0L) +
      when(tokenCount(col("text")) >= 50, 1L).otherwise(0L) +
      when(markerCount(col("text"), TextQueries.stopwords) >= 6, 1L)
        .otherwise(0L)
    val m = Tables.documents(s, d).select(x.as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * (col("x") - 1L) +
          (lit(3L) - col("x")) * (lit(2L) - col("x"))).as("agree"))
    m.select(col("n").as("n_docs"), {
        val nd = col("n").cast(DoubleType)
        val p = col("sx").cast(DoubleType) / (lit(3.0) * nd)
        val pBar = col("agree").cast(DoubleType) / (lit(6.0) * nd)
        val pe = p * p + (lit(1.0) - p) * (lit(1.0) - p)
        struct(round(p, 9).as("p_pass"), round(pBar, 9).as("p_bar"),
          round((pBar - pe) / (lit(1.0) - pe), 9).as("kappa")).as("r")
      })
      .select(col("n_docs"), col("r.p_pass").as("p_pass"),
        col("r.p_bar").as("p_bar"), col("r.kappa").as("kappa"))
  }

  // ---------------------------------------------------------------- logrank

  /** LOG-RANK TEST — do two hash-half customer populations churn at
    * the same rate? O₁ − E₁ over the pooled event times with the
    * hypergeometric variance, z = (O₁−E₁)/√V. The inferential
    * companion of [[FrontierQueriesJ.statKaplanMeier]] (the curve
    * describes; this tests) — run on REAL cohorts it is the "did the
    * retention intervention work" readout; on hash halves it should
    * accept, doubling as the split audit.
    *
    * Determinism: the at-risk and event counts per distinct duration
    * are exact integers from descending-cumulative windows; each event
    * time's E and V terms are fixed trees of those integers (every
    * factor ≤ 1 — no amplification) folded in duration order over the
    * bounded event-time grid; O₁, n₁, n₂ are exact; round 9.
    *
    * Scale posture: one customer-keyed rollup; everything after lives
    * on the ≤ day-range duration grid. */
  def statLogRank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("dt"))
    val corpusEnd = o.agg(max(col("dt")).as("end"))
    val grp = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("lr:"), col("o_custkey").cast(StringType)))), lit(2L))
    val cust = o.groupBy("o_custkey")
      .agg(min(col("dt")).as("first"), max(col("dt")).as("last"))
      .crossJoin(broadcast(corpusEnd))
      .select(grp.as("g"),
        datediff(col("last"), col("first")).cast(LongType).as("dur"),
        when(col("last") < date_sub(col("end"), LrCensorDays), 1L)
          .otherwise(0L).as("ev"))
    val byDur = cust.groupBy("dur")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("g") === 0L, 1L).otherwise(0L)).as("cnt1"),
        sum(col("ev")).as("d"),
        sum(when(col("g") === 0L, col("ev")).otherwise(0L)).as("d1"))
    val wDesc = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byDur.select(col("dur"), col("d"), col("d1"),
      sum(col("cnt")).over(wDesc).as("n"),
      sum(col("cnt1")).over(wDesc).as("n1"))
      .filter(col("d") > 0L)
    val folded = risk.agg(
      sum(col("d1")).as("o1"),
      aggregate(
        transform(sort_array(collect_list(struct(col("dur"),
          (col("d").cast(DoubleType) * col("n1").cast(DoubleType) /
            col("n").cast(DoubleType)).as("e")))), p => p("e")),
        lit(0.0), (a, x) => a + x).as("e1"),
      aggregate(
        transform(sort_array(collect_list(struct(col("dur"),
          when(col("n") > 1L,
            col("d").cast(DoubleType) *
              (col("n1").cast(DoubleType) / col("n").cast(DoubleType)) *
              (lit(1.0) - col("n1").cast(DoubleType) /
                col("n").cast(DoubleType)) *
              (col("n") - col("d")).cast(DoubleType) /
              (col("n") - 1L).cast(DoubleType)).otherwise(lit(0.0))
            .as("v")))), p => p("v")),
        lit(0.0), (a, x) => a + x).as("v"))
    val tot = cust.agg(
      sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n1_total"),
      sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n2_total"))
    folded.crossJoin(broadcast(tot))
      .select(col("n1_total"), col("n2_total"), col("o1"),
        round(col("e1"), 9).as("e1"),
        round((col("o1").cast(DoubleType) - col("e1")) / sqrt(col("v")), 9)
          .as("z"))
  }

  // ------------------------------------------------------------- retrieval

  /** nDCG@10 + MRR OF INT8-QUANTIZED RETRIEVAL — score the quantized
    * index's top-10 (integer int8·int8 dot products) against the exact
    * float cosine top-10 as graded truth (rel = 11 − exact rank): the
    * RANK-AWARE retrieval eval next to
    * [[SimilarityQueries.simAnnRecallEval]]'s set-overlap recall —
    * recall says the right items came back, nDCG says they came back
    * in the right ORDER, MRR says how deep the best item hides. The
    * measurement that decides whether the 4×-smaller int8 store
    * ([[SimilarityQueries.simQuantizeInt8]]) is shippable for ranking.
    *
    * Determinism: quantized scores are exact BIGINT dot products
    * (|q| ≤ 127, 64 dims → |score| ≤ 10⁶), so the approx ranking is
    * integer-ordered with vec_id tie-break; relevance grades are
    * integers; each DCG term is rel/(ln(pos+1)/ln 2) — ln of integers,
    * O(1) weights; per-probe folds run in position order, the probe
    * mean in pid order; round 9.
    *
    * Scale posture: ONE pass over the table fanned ×10 by the
    * broadcast probe panel (the recall-eval plan), two windowed
    * top-10s, a (pid, vec_id) equi-join of two 100-row frames. */
  def simNdcgQuantized(s: SparkSession, d: String): DataFrame = {
    val toInt8 = (x: org.apache.spark.sql.Column) =>
      transform(x, v => round(greatest(lit(-1.0),
        least(lit(1.0), v.cast(DoubleType))) * lit(127.0)).cast("int"))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      graft.similarity.Vectors.normSq(col("embedding")).as("nsq"),
      toInt8(col("embedding")).as("qv"))
    val probes = broadcast(e.filter(col("vec_id").between(11, 20))
      .select(col("vec_id").as("pid"), col("embedding").as("q"),
        col("nsq").as("qnsq"), col("qv").as("pqv")))
    val scored = PipelineCache.getOrPersist(s"sim:ndcgScored:$d")(
      e.crossJoin(probes).filter(col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id"),
          (graft.similarity.Vectors.dot(col("embedding"), col("q")) /
            sqrt(col("nsq") * col("qnsq"))).as("cos"),
          aggregate(zip_with(col("qv"), col("pqv"),
            (a, b) => (a * b).cast(LongType)), lit(0L), (acc, v) => acc + v)
            .as("iscore")))
    val we = Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))
    val wa = Window.partitionBy("pid")
      .orderBy(col("iscore").desc, col("vec_id"))
    val exact = scored.withColumn("rk", row_number().over(we))
      .filter(col("rk") <= 10)
      .select(col("pid"), col("vec_id"), (lit(11L) - col("rk")).as("rel"))
    val approx = scored.withColumn("pos", row_number().over(wa).cast(LongType))
      .filter(col("pos") <= 10).select(col("pid"), col("vec_id"), col("pos"))
    val graded = approx.join(exact, Seq("pid", "vec_id"), "left")
      .select(col("pid"), col("pos"), coalesce(col("rel"), lit(0L)).as("rel"))
    val ln2Term = (rel: org.apache.spark.sql.Column,
        pos: org.apache.spark.sql.Column) =>
      rel.cast(DoubleType) /
        (log((pos + 1L).cast(DoubleType)) / log(lit(2.0)))
    val perProbe = graded.groupBy("pid").agg(
      aggregate(transform(sort_array(collect_list(struct(col("pos"),
        ln2Term(col("rel"), col("pos")).as("t")))), p => p("t")),
        lit(0.0), (a, x) => a + x).as("dcg"),
      sum(when(col("rel") === 10L, 1L).otherwise(0L)).as("hit1"),
      max(when(col("rel") === 10L,
        lit(1.0) / col("pos").cast(DoubleType)).otherwise(lit(0.0)))
        .as("rr"),
      sum(when(col("rel") > 0L, 1L).otherwise(0L)).as("overlap"))
    val idcg = exact.groupBy("pid").agg(
      aggregate(transform(sort_array(collect_list(struct(
        (lit(11L) - col("rel")).as("rk"),
        ln2Term(col("rel"), lit(11L) - col("rel")).as("t")))), p => p("t")),
        lit(0.0), (a, x) => a + x).as("idcg"))
    perProbe.join(idcg, Seq("pid"))
      .select(col("pid"), (col("dcg") / col("idcg")).as("ndcg"), col("rr"),
        col("overlap"))
      .agg(count(lit(1)).as("n_probes"),
        round(aggregate(transform(sort_array(collect_list(struct(col("pid"),
          col("ndcg").as("v")))), p => p("v")),
          lit(0.0), (a, x) => a + x) / count(lit(1)).cast(DoubleType), 9)
          .as("mean_ndcg_at10"),
        round(aggregate(transform(sort_array(collect_list(struct(col("pid"),
          col("rr").as("v")))), p => p("v")),
          lit(0.0), (a, x) => a + x) / count(lit(1)).cast(DoubleType), 9)
          .as("mrr"),
        sum(col("overlap")).as("total_overlap"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_yules_k"        -> textYulesK _,
    "stat_fleiss_kappa"   -> statFleissKappa _,
    "stat_logrank_test"   -> statLogRank _,
    "sim_ndcg_quantized"  -> simNdcgQuantized _,
  )

  private val toks = TextQueries.tokensSql
  import OracleSql.fold32

  val oracle: Map[String, String] = Map(
    "text_yules_k" ->
      s"""WITH c AS (
         |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM
         |    (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(c * c) AS BIGINT) AS sc2
         |  FROM c)
         |SELECT vocab, n_tokens,
         |  ROUND(10000.0 * CAST(sc2 - n_tokens AS DOUBLE) /
         |    (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 9)
         |    AS yules_k
         |FROM m""".stripMargin,
    "stat_fleiss_kappa" ->
      s"""WITH x AS (
         |  SELECT (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) +
         |    (CASE WHEN len($toks) >= 50 THEN 1 ELSE 0 END) +
         |    (CASE WHEN len(list_filter($toks, t -> t IN ('the','a')))
         |      >= 6 THEN 1 ELSE 0 END) AS x
         |  FROM documents),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(x * (x - 1) + (3 - x) * (2 - x)) AS BIGINT) AS agree
         |  FROM x),
         |h AS (
         |  SELECT n, CAST(sx AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) AS p,
         |    CAST(agree AS DOUBLE) / (6.0 * CAST(n AS DOUBLE)) AS pbar
         |  FROM m)
         |SELECT n AS n_docs, ROUND(p, 9) AS p_pass, ROUND(pbar, 9) AS p_bar,
         |  ROUND((pbar - (p * p + (1.0 - p) * (1.0 - p))) /
         |    (1.0 - (p * p + (1.0 - p) * (1.0 - p))), 9) AS kappa
         |FROM h""".stripMargin,
    "sim_ndcg_quantized" -> {
      def dotF(a: String, b: String) = OracleSql.dotFold(a, b)
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    ${dotF("embedding", "embedding")} AS nsq,
         |    list_transform(embedding, v -> CAST(round(GREATEST(-1.0,
         |      LEAST(1.0, CAST(v AS DOUBLE))) * 127.0) AS INTEGER)) AS qv
         |  FROM embeddings),
         |p AS (SELECT vec_id AS pid, embedding AS q, nsq AS qnsq,
         |    qv AS pqv
         |  FROM e WHERE vec_id BETWEEN 11 AND 20),
         |scored AS (
         |  SELECT pid, e.vec_id,
         |    ${dotF("e.embedding", "q")} / SQRT(nsq * qnsq) AS cos,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(qv) + 1),
         |        i -> CAST(qv[i] AS BIGINT) * CAST(pqv[i] AS BIGINT))),
         |      (s, x) -> s + x) AS BIGINT) AS iscore
         |  FROM e CROSS JOIN p WHERE e.vec_id <> pid),
         |exact AS (
         |  SELECT pid, vec_id, 11 - rk AS rel FROM (
         |    SELECT pid, vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rk FROM scored)
         |  WHERE rk <= 10),
         |approx AS (
         |  SELECT pid, vec_id, pos FROM (
         |    SELECT pid, vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY iscore DESC, vec_id) AS BIGINT) AS pos FROM scored)
         |  WHERE pos <= 10),
         |graded AS (
         |  SELECT a.pid, a.pos, COALESCE(x.rel, 0) AS rel
         |  FROM approx a LEFT JOIN exact x
         |    ON a.pid = x.pid AND a.vec_id = x.vec_id),
         |perprobe AS (
         |  SELECT pid,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CAST(rel AS DOUBLE) /
         |        (LN(CAST(pos + 1 AS DOUBLE)) / LN(2.0)) ORDER BY pos)),
         |      (a, x) -> a + x) AS dcg,
         |    MAX(CASE WHEN rel = 10 THEN 1.0 / CAST(pos AS DOUBLE)
         |      ELSE 0.0 END) AS rr,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS overlap
         |  FROM graded GROUP BY pid),
         |idcg AS (
         |  SELECT pid,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CAST(rel AS DOUBLE) /
         |        (LN(CAST(11 - rel + 1 AS DOUBLE)) / LN(2.0))
         |        ORDER BY (11 - rel))),
         |      (a, x) -> a + x) AS idcg
         |  FROM exact GROUP BY pid),
         |j AS (
         |  SELECT pp.pid, pp.dcg / i.idcg AS ndcg, pp.rr, pp.overlap
         |  FROM perprobe pp JOIN idcg i ON pp.pid = i.pid)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(ndcg ORDER BY pid)), (a, x) -> a + x) /
         |    CAST(COUNT(*) AS DOUBLE), 9) AS mean_ndcg_at10,
         |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(rr ORDER BY pid)), (a, x) -> a + x) /
         |    CAST(COUNT(*) AS DOUBLE), 9) AS mrr,
         |  CAST(SUM(overlap) AS BIGINT) AS total_overlap
         |FROM j""".stripMargin
    },
    "stat_logrank_test" ->
      s"""WITH o AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS dt FROM orders),
         |ce AS (SELECT MAX(dt) AS corpus_end FROM o),
         |cust AS (
         |  SELECT (${fold32("'lr:' || CAST(o_custkey AS VARCHAR)")}) % 2
         |      AS g,
         |    CAST(date_diff('day', MIN(dt), MAX(dt)) AS BIGINT) AS dur,
         |    CASE WHEN MAX(dt) < (SELECT corpus_end FROM ce)
         |      - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev
         |  FROM o GROUP BY o_custkey),
         |bydur AS (
         |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt1,
         |    CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(SUM(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT) AS d1
         |  FROM cust GROUP BY dur),
         |risk AS (
         |  SELECT dur, d, d1,
         |    CAST(SUM(cnt) OVER w AS BIGINT) AS n,
         |    CAST(SUM(cnt1) OVER w AS BIGINT) AS n1
         |  FROM bydur
         |  WINDOW w AS (ORDER BY dur DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |evrows AS (SELECT * FROM risk WHERE d > 0),
         |folded AS (
         |  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) /
         |        CAST(n AS DOUBLE) ORDER BY dur)), (a, x) -> a + x) AS e1,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CASE WHEN n > 1 THEN CAST(d AS DOUBLE) *
         |        (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) *
         |        (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) *
         |        CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)
         |        ELSE 0.0 END ORDER BY dur)), (a, x) -> a + x) AS v
         |  FROM evrows),
         |tot AS (
         |  SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1_total,
         |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2_total
         |  FROM cust)
         |SELECT n1_total, n2_total, o1, ROUND(e1, 9) AS e1,
         |  ROUND((CAST(o1 AS DOUBLE) - e1) / SQRT(v), 9) AS z
         |FROM folded CROSS JOIN tot""".stripMargin,
  )
}
