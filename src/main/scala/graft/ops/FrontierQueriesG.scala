package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

import graft.dedup.Dedup.hexFold32
import graft.text.TextAnalysis.isQuality

/** Round-8 tenth frontier wave: the hypothesis-testing completion —
  * k-sample rank and variance tests, an exact-arithmetic permutation
  * test, an ordered-trend test, and two-stage cluster sampling.
  * Together with Mann–Whitney / Wilcoxon / Welch / KS / χ² / CUPED /
  * Friedman these cover the standard experimentation decision table
  * (2 vs k samples × paired vs independent × parametric vs rank).
  * Module conventions as the earlier frontier waves. */
object FrontierQueriesG {

  /** Permutation test: number of hash-derived sign assignments. */
  private val PermCount = 32

  /** Cochran–Armitage: length-bucket width (chars) and cap. */
  private val CaBucketChars = 200L
  private val CaMaxBucket = 3L

  /** Two-stage cluster sample: 1-in-5 users, then 1-in-3 events. */
  private val ClusterMod = 5L
  private val WithinMod = 3L

  /** Exact integer cents from the double value column (DECIMAL hop —
    * a double·100 cast truncates on Spark and rounds on DuckDB). */
  private def cents(v: Column): Column =
    (v.cast(DecimalType(18, 2)) * 100).cast(LongType)

  // --------------------------------------------------------------- k-sample

  /** KRUSKAL–WALLIS H over event-type value distributions — the
    * k-sample rank ANOVA ([[StatQueries.statMannWhitney]] is its
    * 2-sample special case; [[FrontierQueriesF.statFriedmanTest]] its
    * blocked sibling): do the k types draw from the same value
    * distribution, judged on ranks (outlier-proof where
    * [[statAnovaF]] is not)?
    *
    * Determinism — the doubled-mid-rank machinery pooled globally:
    * per distinct value, 2·midrank = 2·c_prev + t + 1 from integer
    * prefix sums; the group rank sums S_j stay BIGINT; each
    * S_j²/n_j term is IEEE arithmetic on exactly-cast BIGINTs folded
    * in type order; H = 3·Σ/(N(N+1)) − 3(N+1), tie-corrected by
    * 1 − ΣT/(N³−N) (N³ holds in BIGINT to N ≈ 2×10⁶; a larger corpus
    * widens to DECIMAL); NULL via nullif when every value ties.
    *
    * Scale posture: one (value, type) rollup + one value-keyed window
    * + constant-width rollups — the pooled ranking never materializes
    * per-row ranks. */
  def statKruskalWallis(s: SparkSession, d: String): DataFrame = {
    val pv = Tables.events(s, d)
      .groupBy("value", "event_type").agg(count(lit(1)).as("cnt"))
    val tv = pv.groupBy("value").agg(sum(col("cnt")).as("t"))
      .withColumn("c_prev",
        sum(col("t")).over(Window.orderBy("value")) - col("t"))
    val perType = pv.join(tv, Seq("value"))
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("nj"),
        sum(col("cnt") * (lit(2L) * col("c_prev") + col("t") + 1L)).as("sj"))
    val ties = tv.agg(sum(col("t") * col("t") * col("t") - col("t"))
      .as("sum_t3"))
    val g = perType.crossJoin(broadcast(ties))
      .groupBy("sum_t3")
      .agg(sum(col("nj")).as("n"), count(lit(1)).as("k"),
        aggregate(
          transform(sort_array(collect_list(struct(col("event_type"),
            (col("sj").cast(DoubleType) * col("sj").cast(DoubleType) /
              col("nj").cast(DoubleType)).as("term")))),
            p => p("term")),
          lit(0.0), (a, x) => a + x).as("ssum"))
    val n = col("n")
    val hRaw = lit(3.0) * col("ssum") /
      (n * (n + 1L)).cast(DoubleType) - lit(3.0) * (n + 1L).cast(DoubleType)
    val corr = lit(1.0) - col("sum_t3").cast(DoubleType) /
      (n * n * n - n).cast(DoubleType)
    g.select(col("n"), col("k"), (col("k") - 1L).as("dof"),
      round(hRaw / nullif(corr, lit(0.0)), 9).as("h"))
  }

  /** ONE-WAY ANOVA F over event-type value distributions — the
    * parametric mean-comparison next to [[statKruskalWallis]]'s rank
    * form: between-group over within-group variance on exact integer
    * cents. The classic "did the k variants move the metric" gate.
    *
    * Determinism: Σx and Σx² per group are BIGINT on exact cents
    * (audited: N·max² ≈ 4×10¹⁴ at sf1); each S_j²/n_j is IEEE math on
    * exactly-cast BIGINTs folded in type order; SSB/SSW/F is one
    * fixed tree, two divisions for the mean squares, one for F; only
    * F is emitted (SSB/SSW at cents² magnitude would fight the
    * round-9 precision gotcha).
    *
    * Scale posture: one partial-aggregated rollup per group +
    * constant-width folds. */
  def statAnovaF(s: SparkSession, d: String): DataFrame = {
    val perType = Tables.events(s, d)
      .select(col("event_type"), cents(col("value")).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nj"), sum(col("c")).as("sj"),
        sum(col("c") * col("c")).as("qj"))
    val g = perType.agg(
      sum(col("nj")).as("n"), count(lit(1)).as("k"),
      sum(col("sj")).as("st"), sum(col("qj")).as("qt"),
      aggregate(
        transform(sort_array(collect_list(struct(col("event_type"),
          (col("sj").cast(DoubleType) * col("sj").cast(DoubleType) /
            col("nj").cast(DoubleType)).as("term")))),
          p => p("term")),
        lit(0.0), (a, x) => a + x).as("ssum"))
    val grand = col("st").cast(DoubleType) * col("st").cast(DoubleType) /
      col("n").cast(DoubleType)
    val ssb = col("ssum") - grand
    val ssw = col("qt").cast(DoubleType) - col("ssum")
    g.select(col("n"), col("k"),
      (col("k") - 1L).as("dof_between"), (col("n") - col("k")).as("dof_within"),
      round((ssb / (col("k") - 1L).cast(DoubleType)) /
        nullif(ssw / (col("n") - col("k")).cast(DoubleType), lit(0.0)), 9)
        .as("f"))
  }

  // ------------------------------------------------------------ permutation

  /** HASH-PERMUTATION TEST of the A/B cents-mean difference — the
    * assumption-free significance check: 32 deterministic md5-derived
    * group assignments (bit p of one per-row digest), the observed
    * split being bit 0, p-value = the fraction of assignments at
    * least as extreme. The nonparametric twin of
    * [[StatQueries.statBootstrapCi]]'s resampling (same one-digest +
    * derived-family discipline — the digest sits BELOW the Generate,
    * never inside the generated projection).
    *
    * Determinism: group sums/counts are BIGINT per assignment; each
    * mean difference is two divisions of exact casts; the ≥
    * comparisons are between identically-computed doubles; p-value is
    * ONE division of small integers — exact.
    *
    * Scale posture: one digest per row, a 32× arithmetic fan-out
    * absorbed by map-side combine into 32 groups (the bucket-hopping
    * shape); the 32-row per-permutation frame is persisted so the
    * observed-split branch reuses it instead of re-scanning events —
    * ONE pass over the data total. */
  def statPermutationTest(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(cents(col("value")).as("c"),
        hexFold32(md5(concat(lit("pt:"), col("event_id").cast(StringType))))
          .as("h"))
    val fanned = base
      .select(col("c"), col("h"),
        explode(sequence(lit(0L), lit(PermCount - 1L))).as("p"))
      .select(col("p"),
        expr("(h DIV CAST(power(2, p) AS BIGINT)) % 2").as("side"),
        col("c"))
    val perPerm = PipelineCache.getOrPersist(s"permtest:$d") {
      fanned.groupBy("p").agg(
        sum(when(col("side") === 1L, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("side") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("side") === 0L, col("c")).otherwise(0L)).as("s0"),
        sum(when(col("side") === 0L, 1L).otherwise(0L)).as("n0"))
        .withColumn("diff",
          col("s1").cast(DoubleType) / col("n1").cast(DoubleType) -
            col("s0").cast(DoubleType) / col("n0").cast(DoubleType))
    }
    val obs = perPerm.filter(col("p") === 0L)
      .select(col("diff").as("obs_diff"), (col("n1") + col("n0")).as("n"))
    perPerm.crossJoin(broadcast(obs))
      .groupBy("n", "obs_diff")
      .agg(count(lit(1)).as("n_perms"),
        sum(when(abs(col("diff")) >= abs(col("obs_diff")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n"), round(col("obs_diff"), 9).as("obs_diff"),
        col("n_perms"), col("n_extreme"),
        round(col("n_extreme").cast(DoubleType) /
          col("n_perms").cast(DoubleType), 9).as("p_value"))
  }

  // ------------------------------------------------------------------ trend

  /** COCHRAN–ARMITAGE TREND TEST — does the quality-gate pass rate
    * rise (or fall) MONOTONICALLY with document length bucket? The
    * ordered-groups refinement of the χ² independence test (which
    * ignores order): scores w = 0..3 over 200-char buckets capped at
    * 3, binary outcome = the quality gate. This is the "is the
    * signal a trend or just heterogeneity" question a curation
    * threshold review asks.
    *
    * Determinism: every moment (Σwr, Σwn, Σw²n, R, N) is BIGINT; the
    * z statistic multiplies the exactly-cast factors in one fixed
    * tree with a single sqrt (the factor PRODUCT would pass 2⁶³ at
    * sf1 — cast each factor before multiplying, the MCC contract);
    * NULL via nullif when degenerate.
    *
    * Scale posture: one projection + one 4-row rollup. */
  def statCochranArmitage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      least(expr(s"n_chars DIV $CaBucketChars"), lit(CaMaxBucket)).as("w"),
      when(isQuality(col("text"), TextQueries.stopwords), 1L).otherwise(0L)
        .as("y"))
    val perBucket = docs.groupBy("w")
      .agg(count(lit(1)).as("nw"), sum(col("y")).as("rw"))
    val g = perBucket.agg(
      sum(col("nw")).as("n"), count(lit(1)).as("k"),
      sum(col("rw")).as("r"),
      sum(col("w") * col("rw")).as("swr"),
      sum(col("w") * col("nw")).as("swn"),
      sum(col("w") * col("w") * col("nw")).as("sw2n"))
    def f(c: Column): Column = c.cast(DoubleType)
    val num = f(col("n") * col("swr") - col("r") * col("swn"))
    val varN2 = f(col("r")) * f(col("n") - col("r")) *
      f(col("n") * col("sw2n") - col("swn") * col("swn")) / f(col("n"))
    g.select(col("n"), col("k"), col("r"),
      round(num / nullif(sqrt(varN2), lit(0.0)), 9).as("z"))
  }

  // --------------------------------------------------------------- sampling

  /** TWO-STAGE CLUSTER SAMPLE — stage 1 picks 1 user in 5 by hash
    * (clusters), stage 2 keeps 1 event in 3 within each picked user
    * by systematic rank: the survey design for when you can only
    * afford to instrument some users but want within-user coverage
    * too ([[FrontierQueriesE.samplePpsSystematic]] sizes by mass;
    * this one respects the cluster structure — users, not events, are
    * the sampling unit, which is what makes the variance math of a
    * user-level metric honest).
    *
    * Determinism: stage 1 is an md5-fold modulus on the user id;
    * stage 2 is a row_number over the unique event_id; the summary is
    * integer counts plus an exact cents checksum.
    *
    * Scale posture: one hash filter (no shuffle) + one user-keyed
    * window + a rollup. */
  def sampleTwoStageCluster(s: SparkSession, d: String): DataFrame = {
    val picked = Tables.events(s, d)
      .filter(pmod(hexFold32(
        md5(concat(lit("cl:"), col("user_id").cast(StringType)))),
        lit(ClusterMod)) === 0L)
    val kept = picked
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")))
      .filter(pmod(col("rk").cast(LongType), lit(WithinMod)) === 1L)
    kept.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("cents_checksum"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_kruskal_wallis"      -> statKruskalWallis _,
    "stat_anova_f"             -> statAnovaF _,
    "stat_permutation_test"    -> statPermutationTest _,
    "stat_cochran_armitage"    -> statCochranArmitage _,
    "sample_two_stage_cluster" -> sampleTwoStageCluster _,
  )

  val oracle: Map[String, String] = Map(
    "stat_kruskal_wallis" ->
      """WITH pv AS (
        |  SELECT value, event_type, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |tv AS (
        |  SELECT value, t,
        |    CAST(SUM(t) OVER (ORDER BY value) AS BIGINT) - t AS c_prev
        |  FROM (SELECT value, CAST(SUM(cnt) AS BIGINT) AS t
        |    FROM pv GROUP BY 1)),
        |per_type AS (
        |  SELECT pv.event_type, CAST(SUM(pv.cnt) AS BIGINT) AS nj,
        |    CAST(SUM(pv.cnt * (2 * tv.c_prev + tv.t + 1)) AS BIGINT) AS sj
        |  FROM pv JOIN tv ON pv.value = tv.value
        |  GROUP BY 1),
        |ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS sum_t3 FROM tv),
        |g AS (
        |  SELECT ties.sum_t3, CAST(SUM(nj) AS BIGINT) AS n,
        |    COUNT(*) AS k,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) /
        |        CAST(nj AS DOUBLE) ORDER BY event_type)),
        |      (a, x) -> a + x) AS ssum
        |  FROM per_type CROSS JOIN ties GROUP BY 1)
        |SELECT n, k, k - 1 AS dof,
        |  ROUND((3.0 * ssum / CAST(n * (n + 1) AS DOUBLE) -
        |      3.0 * CAST(n + 1 AS DOUBLE)) /
        |    NULLIF(1.0 - CAST(sum_t3 AS DOUBLE) /
        |      CAST(n * n * n - n AS DOUBLE), 0.0), 9) AS h
        |FROM g""".stripMargin,
    "stat_anova_f" ->
      """WITH per_type AS (
        |  SELECT event_type, COUNT(*) AS nj,
        |    CAST(SUM(c) AS BIGINT) AS sj, CAST(SUM(c * c) AS BIGINT) AS qj
        |  FROM (SELECT event_type,
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |    FROM events)
        |  GROUP BY 1),
        |g AS (
        |  SELECT CAST(SUM(nj) AS BIGINT) AS n, COUNT(*) AS k,
        |    CAST(SUM(sj) AS BIGINT) AS st, CAST(SUM(qj) AS BIGINT) AS qt,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) /
        |        CAST(nj AS DOUBLE) ORDER BY event_type)),
        |      (a, x) -> a + x) AS ssum
        |  FROM per_type)
        |SELECT n, k, k - 1 AS dof_between, n - k AS dof_within,
        |  ROUND(((ssum - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) /
        |      CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
        |    NULLIF((CAST(qt AS DOUBLE) - ssum) / CAST(n - k AS DOUBLE),
        |      0.0), 9) AS f
        |FROM g""".stripMargin,
    "stat_permutation_test" -> {
      val h = OracleSql.fold32("'pt:' || CAST(event_id AS VARCHAR)")
      s"""WITH base AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    ($h) AS h
         |  FROM events),
         |fanned AS (
         |  SELECT p, (h // CAST(power(2, p) AS BIGINT)) % 2 AS side, c
         |  FROM base, (SELECT unnest(range(0, $PermCount)) AS p) ps),
         |per_perm AS (
         |  SELECT p,
         |    CAST(SUM(CASE WHEN side = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN side = 0 THEN c ELSE 0 END) AS BIGINT) AS s0,
         |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
         |  FROM fanned GROUP BY 1),
         |diffs AS (
         |  SELECT p, n1 + n0 AS n,
         |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |      CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff
         |  FROM per_perm),
         |obs AS (SELECT diff AS obs_diff, n FROM diffs WHERE p = 0)
         |SELECT obs.n, ROUND(obs.obs_diff, 9) AS obs_diff,
         |  COUNT(*) AS n_perms,
         |  CAST(SUM(CASE WHEN ABS(d.diff) >= ABS(obs.obs_diff)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
         |  ROUND(CAST(SUM(CASE WHEN ABS(d.diff) >= ABS(obs.obs_diff)
         |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         |    AS p_value
         |FROM diffs d CROSS JOIN obs
         |GROUP BY obs.n, obs.obs_diff""".stripMargin
    },
    "stat_cochran_armitage" ->
      s"""WITH docs AS (
         |  SELECT LEAST(n_chars // $CaBucketChars, $CaMaxBucket) AS w,
         |    CASE WHEN ${TextQueries.qualityGateSql} THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |pb AS (
         |  SELECT w, COUNT(*) AS nw, CAST(SUM(y) AS BIGINT) AS rw
         |  FROM docs GROUP BY 1),
         |g AS (
         |  SELECT CAST(SUM(nw) AS BIGINT) AS n, COUNT(*) AS k,
         |    CAST(SUM(rw) AS BIGINT) AS r,
         |    CAST(SUM(w * rw) AS BIGINT) AS swr,
         |    CAST(SUM(w * nw) AS BIGINT) AS swn,
         |    CAST(SUM(w * w * nw) AS BIGINT) AS sw2n
         |  FROM pb)
         |SELECT n, k, r,
         |  ROUND(CAST(n * swr - r * swn AS DOUBLE) /
         |    NULLIF(SQRT(CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE) *
         |      CAST(n * sw2n - swn * swn AS DOUBLE) / CAST(n AS DOUBLE)),
         |      0.0), 9) AS z
         |FROM g""".stripMargin,
    "sample_two_stage_cluster" -> {
      val h = OracleSql.fold32("'cl:' || CAST(user_id AS VARCHAR)")
      s"""WITH picked AS (
         |  SELECT * FROM events WHERE ($h) % $ClusterMod = 0),
         |kept AS (
         |  SELECT event_type, user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY event_id) AS rk
         |    FROM picked)
         |  WHERE rk % $WithinMod = 1)
         |SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(c) AS BIGINT) AS cents_checksum
         |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
