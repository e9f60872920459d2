package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Round-8 twentieth frontier wave: the generalized ESD multi-outlier
  * test (Rosner — [[FrontierQueriesK.statGrubbs]] iterated with EXACT
  * integer moment downdates, because real data has more than one
  * anomaly and Grubbs masks under a second outlier), and
  * content-defined chunking (FastCDC-style rolling-hash boundaries —
  * the shift-resistant dedup primitive: inserting one character into a
  * document moves every fixed-width chunk boundary after it, but CDC
  * boundaries are functions of LOCAL content and re-align, which is
  * why production dedup pipelines chunk this way). Registry novelty
  * grep-checked first (ROUND_NOTES item 23). Module conventions as
  * the earlier waves.
  */
object FrontierQueriesP {

  /** ESD rounds (outliers tested per type). */
  private val EsdRounds = 3

  /** CDC parameters: rolling window and boundary mask modulus (plain
    * LBFS mask rule — expected chunk ≈ 64 chars). */
  private val CdcW = 8
  private val CdcMask = 64L
  /** Rolling-hash modulus — keeps the fold state bounded (≤ 2²⁵ before
    * each reduction) so ANSI overflow checking never trips. */
  private val CdcMod = 1048576L

  /** ESD argmax encode/decode multiplier (2²⁰) — matches
    * [[FrontierQueriesK.statGrubbs]]'s literal so both integer-encoded
    * argmaxes decode identically. A SEPARATE constant from [[CdcMod]]
    * (r8 advice): the two are numerically equal by coincidence only,
    * and retuning the CDC chunking modulus must not silently corrupt
    * the ESD suspect decode. The encode `dev·EsdEncode + cents`
    * requires 0 ≤ cents < EsdEncode — events.value sits in
    * [0, ~560] dollars (56,100 cents « 2²⁰), and the grid build below
    * asserts the bound at the encode site rather than trusting the
    * fixture. */
  private val EsdEncode = 1048576L

  // ------------------------------------------------------------------- ESD

  /** GENERALIZED ESD (Rosner) — the top-3 outliers per event type,
    * each tested with the moments of the SAMPLE THAT REMAINS after
    * removing the previous suspects. Grubbs tests ONE point and masks
    * when two extremes prop up each other's σ; ESD's sequential
    * removal is the standard fix. Each round reports its suspect and
    * its studentized G on the reduced sample.
    *
    * Determinism: round 1 is exactly [[FrontierQueriesK.statGrubbs]]'s
    * integer-encoded max (dev·2²⁰ + cents under plain MAX); the
    * removal is an EXACT INTEGER moment downdate (n−1, S−c*, SS−c*²)
    * — no recomputation, no doubles in the state; each later round's
    * eligibility (one INSTANCE of the suspect value leaves, ties keep
    * their remaining instances) rides the per-value count grid; G is
    * one fixed tree per round; round 9.
    *
    * Scale posture: ONE (type, cents) rollup is the data-sized work;
    * the three rounds are joins over the bounded per-type value grid
    * (value range, not row count) with 5-row moment frames. */
  def statEsdOutliers(s: SparkSession, d: String): DataFrame = {
    val grid = PipelineCache.getOrPersist(s"esd:grid:$d")(
      Tables.events(s, d)
        .select(col("event_type"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
            .as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
        // encode-site domain guard (r8 advice): the argmax packs
        // dev·EsdEncode + c, so c outside [0, EsdEncode) would decode
        // to a WRONG suspect silently — fail loudly instead. Runs on
        // the bounded value grid, not the raw rows.
        .filter(when(col("c").between(0L, EsdEncode - 1L), lit(true))
          .otherwise(raise_error(concat(
            lit("ESD encode domain violated: cents="),
            col("c").cast(StringType))).cast("boolean"))))
    // Round-14 shape (guide §2.4 — remove exchanges the algebra says
    // are unnecessary): the former per-round grid⋈moments joins made a
    // 300-node plan with ~12 exchanges of tiny frames, serialized by
    // AQE stage barriers — barrier count, not data, was the measured
    // cost (~2.6 s at sf0.1 for KB-scale stages). Each round's argmax
    // |n·c − sc| is LINEAR in c on either side of the mean, so over
    // any eligible value set it is attained at the eligible MIN or MAX
    // value; a round removes ONE instance of its suspect (an extreme),
    // so after k < 3 removals every eligible extreme lies in the
    // per-type top-3 ∪ bottom-3 VALUES of the full grid. The rounds
    // therefore run as pure column expressions over one collapsed row
    // per type: (moments, ≤6-element extremes array) — two grid
    // rollups and a window on the value grid, zero per-round joins.
    // Same argmax encode, same integer downdates, same G tree —
    // EsdExtremesSpec pins the rewrite against a full-grid brute-force
    // recomputation, and the DuckDB oracle (which still states the
    // full-grid per-round form) is unchanged. Measured 2.6 s → ~0.9 s
    // at sf0.1; at 100 TB the rounds now touch 6 rows per type instead
    // of re-scanning the value grid three times.
    val m0 = grid.groupBy("event_type").agg(
      sum(col("cnt")).as("n"), sum(col("c") * col("cnt")).as("sc"),
      sum(col("c") * col("c") * col("cnt")).as("scc"))
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val ext = grid
      .withColumn("rhi", row_number().over(byType.orderBy(col("c").desc)))
      .withColumn("rlo", row_number().over(byType.orderBy(col("c").asc)))
      .filter(col("rhi") <= EsdRounds || col("rlo") <= EsdRounds)
      .groupBy("event_type")
      .agg(collect_list(struct(col("c"), col("cnt"))).as("vals"))
    def hop(x: Column): Column = x.cast(StringType).cast(DoubleType)
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    // argmax over the eligible extremes: same encode (dev·2²⁰ + c,
    // plain MAX) as the full-grid form, eligibility = cnt minus the
    // instances already removed at this value
    def mx(n: Column, sc: Column, removed: Seq[Column]): Column =
      array_max(transform(
        filter(col("vals"), v => v.getField("cnt") >
          removed.foldLeft(lit(0L)) { (acc, r) =>
            acc + when(v.getField("c") === r, 1L).otherwise(0L)
          }),
        v => abs(n * v.getField("c") - sc) * lit(EsdEncode) +
          v.getField("c")))
    def gOf(n: Column, sc: Column, scc: Column, maxdev: Column): Column = {
      val varN = hop(dec(n) * dec(scc) - dec(sc) * dec(sc))
      round((maxdev.cast(DoubleType) / n.cast(DoubleType)) /
        sqrt(varN / (n.cast(DoubleType) * (n - 1L).cast(DoubleType))), 9)
    }
    val rounds = ext.join(m0, Seq("event_type"))
      .withColumn("mx1", mx(col("n"), col("sc"), Seq.empty))
      .withColumn("s1", pmod(col("mx1"), lit(EsdEncode)))
      .withColumn("g1", gOf(col("n"), col("sc"), col("scc"),
        expr(s"mx1 DIV $EsdEncode")))
      .withColumn("n1", col("n") - 1L)
      .withColumn("sc1", col("sc") - col("s1"))
      .withColumn("scc1", col("scc") - col("s1") * col("s1"))
      .withColumn("mx2", mx(col("n1"), col("sc1"), Seq(col("s1"))))
      .withColumn("s2", pmod(col("mx2"), lit(EsdEncode)))
      .withColumn("g2", gOf(col("n1"), col("sc1"), col("scc1"),
        expr(s"mx2 DIV $EsdEncode")))
      .withColumn("n2", col("n1") - 1L)
      .withColumn("sc2", col("sc1") - col("s2"))
      .withColumn("scc2", col("scc1") - col("s2") * col("s2"))
      .withColumn("mx3", mx(col("n2"), col("sc2"), Seq(col("s1"), col("s2"))))
      .withColumn("s3", pmod(col("mx3"), lit(EsdEncode)))
      .withColumn("g3", gOf(col("n2"), col("sc2"), col("scc2"),
        expr(s"mx3 DIV $EsdEncode")))
    rounds
      .select(col("event_type"), explode(array(
        struct(lit(1L).as("esd_round"), col("s1").as("suspect"), col("g1").as("g")),
        struct(lit(2L).as("esd_round"), col("s2").as("suspect"), col("g2").as("g")),
        struct(lit(3L).as("esd_round"), col("s3").as("suspect"), col("g3").as("g"))))
        .as("r"))
      .select(col("event_type"), col("r.esd_round").as("esd_round"),
        round(col("r.suspect").cast(DoubleType) / lit(100.0), 9)
          .as("suspect_value"),
        col("r.g").as("g_stat"))
      .orderBy("event_type", "esd_round")
  }

  // ------------------------------------------------------------------- CDC

  /** CONTENT-DEFINED CHUNKING — FastCDC-style variable boundaries from
    * a rolling hash of the last 8 chars (cut when hash % 64 = 0,
    * min 16 / max 128 chars), then corpus-wide duplicate-chunk
    * accounting. THE shift-resistant dedup primitive: one inserted
    * character moves every fixed-width boundary after it
    * ([[TextQueries.textChunkDedup]]'s failure mode, cross-referenced
    * there), but CDC boundaries depend only on LOCAL content and
    * re-align — which is why storage and training-data dedup chunk
    * this way.
    *
    * Determinism: char codes are exact integers (ASCII corpus —
    * asserted by the editdist precedent), the rolling hash is integer
    * arithmetic mod 2²⁰, and the boundary rule is the ORIGINAL
    * LBFS/Rabin mask — cut wherever windowHash % 64 = 0 — which is a
    * pure position FILTER. FastCDC's min/max clamps were built and
    * REVERTED: they make the cut sequence sequential (each cut depends
    * on the last), and DuckDB 1.0's list_reduce corrupts a growing
    * list accumulator beyond toy sizes (appended garbage, measured) —
    * the clamp-free rule is the one both engines state identically,
    * and it is already the shift-resistant property under test. Chunk
    * identity is md5 of the exact substring; every output is an
    * integer count or one division; round 9.
    *
    * Scale posture: per-document O(len·8) char work with NO
    * cross-document state; chunks shuffle once keyed by md5 (fixed
    * 32-byte key — the chunk-dedup argument); constant-width final
    * rollup. */
  def dedupCdcChunks(s: SparkSession, d: String): DataFrame = {
    // cut positions via the native [[graft.functions.CdcCuts]]
    // expression (round 14): one compiled char loop per row instead of
    // the interpreted split→transform(ascii)→per-position
    // aggregate(slice(…)) chain — O(len·w) lambda walks and O(len)
    // single-char string allocations per document gone; same fold,
    // same cut set (differential-pinned against [[cdcCutsHof]] below
    // and the unchanged DuckDB oracle).
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .withColumn("cuts",
        graft.functions.CdcCuts.cdcCuts(col("text"), CdcW, CdcMask, CdcMod))
    val chunks = docs.select(col("doc_id"), col("text"),
      explode(zip_with(slice(col("cuts"), lit(1), size(col("cuts")) - 1),
        slice(col("cuts"), lit(2), size(col("cuts")) - 1),
        (a, b) => struct(a.as("s"), b.as("e")))).as("p"))
      .filter(col("p.e") > col("p.s"))
      .select(col("doc_id"),
        md5(expr("substring(text, CAST(p.s + 1 AS INT), " +
          "CAST(p.e - p.s AS INT))")).as("h"),
        (col("p.e") - col("p.s")).as("clen"))
    val occ = chunks.groupBy("h").agg(count(lit(1)).as("occ"),
      max(col("clen")).as("clen"))
    occ.agg(
      sum(col("occ")).as("n_chunks"),
      count(lit(1)).as("n_distinct_chunks"),
      sum(col("occ") * col("clen")).as("total_chars"),
      sum(when(col("occ") > 1L, col("occ")).otherwise(0L))
        .as("n_dup_instances"))
      .select(col("n_chunks"), col("n_distinct_chunks"),
        expr("total_chars DIV n_chunks").as("avg_chunk_chars"),
        col("n_dup_instances"),
        round(col("n_dup_instances").cast(DoubleType) /
          col("n_chunks").cast(DoubleType), 9).as("dup_chunk_rate"))
  }

  /** The original built-ins-only cut computation, retained as the
    * differential-test double for [[graft.functions.CdcCuts]] (the
    * DedupExprs pattern): given a `text` column, returns the cut-
    * positions array the interpreted HOF chain produces. Test-only
    * consumer (`CdcCutsSpec`); the shipped query uses the compiled
    * expression. */
  private[graft] def cdcCutsHof(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch))
    val n = size(codes).cast(LongType)
    val winHash = (i: Column) =>
      aggregate(slice(codes, (i - (CdcW - 1)).cast("int"), lit(CdcW)),
        lit(0L), (a, c) => (a * 31L + c.cast(LongType)) % CdcMod)
    val positions = when(n >= CdcW,
      sequence(lit(CdcW.toLong), n)).otherwise(array().cast("array<bigint>"))
    concat(array(lit(0L)),
      filter(positions, i => winHash(i) % CdcMask === 0L && i < n),
      array(n))
  }

  // -------------------------------------------------------------- volatility

  /** PARKINSON RANGE VOLATILITY per event type — the high–low
    * estimator σ²_P = Σ ln(H/L)² / (4·ln2·n) over daily bars: ~5×
    * more statistically efficient per bar than close-to-close
    * variance because the intraday RANGE sees the whole day. The
    * log-range member of the volatility family next to
    * [[FrontierQueriesB.windowAtr]] (absolute range) and
    * [[AggWindowQueries.windowUlcerIndex]] (drawdown-weighted).
    *
    * Determinism: H and L are exact integer cents (≥ 1), so each
    * ln(H) − ln(L) is integer-ln with O(1) weights (the G²-safe
    * side); the per-type sum folds in day order; 4·ln 2 is the same
    * ln(2.0) both engines agree on; one sqrt; round 9.
    *
    * Scale posture: one keyed rollup to daily (type, H, L) bars +
    * one per-type fold over the day-granular series. */
  def statParkinsonVol(s: SparkSession, d: String): DataFrame = {
    val bars = Tables.events(s, d)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("c"))
      .groupBy("event_type", "day")
      .agg(max(col("c")).as("h"), min(col("c")).as("l"))
      .filter(col("l") >= 1L)
    val term = {
      val lr = log(col("h").cast(DoubleType)) - log(col("l").cast(DoubleType))
      (lr * lr).as("t")
    }
    bars.select(col("event_type"), col("day"), term)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        aggregate(transform(sort_array(collect_list(struct(col("day"),
          col("t")))), p => p("t")), lit(0.0), (a, x) => a + x).as("ssum"))
      .select(col("event_type"), col("n_days"),
        round(sqrt(col("ssum") / (lit(4.0) * log(lit(2.0)) *
          col("n_days").cast(DoubleType))), 9).as("parkinson_sigma"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stat_esd_outliers"  -> statEsdOutliers _,
    "dedup_cdc_chunks"   -> dedupCdcChunks _,
    "stat_parkinson_vol" -> statParkinsonVol _,
  )

  val oracle: Map[String, String] = Map(
    "stat_esd_outliers" -> {
      // one ESD round as a SQL fragment over the shared value grid
      def roundSql(mom: String, removedCond: String, out: String) =
        s"""$out AS (
           |  SELECT g.event_type, m.n, m.sc, m.scc,
           |    CAST(MAX(ABS(m.n * g.c - m.sc) * 1048576 + g.c) % 1048576
           |      AS BIGINT) AS suspect,
           |    CAST(MAX(ABS(m.n * g.c - m.sc) * 1048576 + g.c) // 1048576
           |      AS BIGINT) AS maxdev
           |  FROM grid g JOIN $mom m ON g.event_type = m.event_type
           |  WHERE g.cnt > ($removedCond)
           |  GROUP BY 1, 2, 3, 4)""".stripMargin
      val gSql =
        """ROUND((CAST(maxdev AS DOUBLE) / CAST(n AS DOUBLE)) /
          |    SQRT(CAST(CAST(CAST(n AS HUGEINT) * scc -
          |        CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS VARCHAR)
          |      AS DOUBLE) /
          |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 9)"""
          .stripMargin
      s"""WITH grid AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2),
         |m0 AS (
         |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
         |    CAST(SUM(c * cnt) AS BIGINT) AS sc,
         |    CAST(SUM(c * c * cnt) AS HUGEINT) AS scc
         |  FROM grid GROUP BY 1),
         |${roundSql("m0", "0", "r1")},
         |m1 AS (
         |  SELECT event_type, n - 1 AS n, sc - suspect AS sc,
         |    scc - CAST(suspect AS HUGEINT) * CAST(suspect AS HUGEINT)
         |      AS scc,
         |    suspect AS x1
         |  FROM r1),
         |${roundSql("m1", "CASE WHEN g.c = m.x1 THEN 1 ELSE 0 END", "r2")},
         |m2 AS (
         |  SELECT r2.event_type, r2.n - 1 AS n, r2.sc - r2.suspect AS sc,
         |    r2.scc - CAST(r2.suspect AS HUGEINT) *
         |      CAST(r2.suspect AS HUGEINT) AS scc,
         |    m1.x1 AS x1, r2.suspect AS x2
         |  FROM r2 JOIN m1 ON r2.event_type = m1.event_type),
         |${roundSql("m2",
            "(CASE WHEN g.c = m.x1 THEN 1 ELSE 0 END) + " +
              "(CASE WHEN g.c = m.x2 THEN 1 ELSE 0 END)", "r3")}
         |SELECT event_type, CAST(1 AS BIGINT) AS esd_round,
         |  ROUND(CAST(suspect AS DOUBLE) / 100.0, 9) AS suspect_value,
         |  $gSql AS g_stat FROM r1
         |UNION ALL
         |SELECT event_type, 2, ROUND(CAST(suspect AS DOUBLE) / 100.0, 9),
         |  $gSql FROM r2
         |UNION ALL
         |SELECT event_type, 3, ROUND(CAST(suspect AS DOUBLE) / 100.0, 9),
         |  $gSql FROM r3
         |ORDER BY event_type, esd_round""".stripMargin
    },
    "stat_parkinson_vol" ->
      """WITH bars AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
        |      AS day,
        |    CAST(MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS h,
        |    CAST(MIN(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS l
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day,
        |    (LN(CAST(h AS DOUBLE)) - LN(CAST(l AS DOUBLE))) *
        |    (LN(CAST(h AS DOUBLE)) - LN(CAST(l AS DOUBLE))) AS t
        |  FROM bars WHERE l >= 1)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  ROUND(SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(t ORDER BY day)), (a, x) -> a + x) /
        |    (4.0 * LN(2.0) * CAST(COUNT(*) AS DOUBLE))), 9)
        |    AS parkinson_sigma
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dedup_cdc_chunks" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text,
         |    list_transform(range(1, strlen(text) + 1),
         |      i -> ascii(substr(text, CAST(i AS INT), 1))) AS codes,
         |    CAST(strlen(text) AS BIGINT) AS n
         |  FROM documents),
         |cutsd AS (
         |  SELECT doc_id, text, n,
         |    list_concat(list_prepend(CAST(0 AS BIGINT),
         |      list_filter(
         |        CASE WHEN n >= $CdcW THEN range($CdcW, n + 1)
         |          ELSE CAST([] AS BIGINT[]) END,
         |        i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            codes[CAST(i AS INT) - ${CdcW - 1} : CAST(i AS INT)]),
         |            (a, c) -> (a * 31 + c) % $CdcMod) % $CdcMask = 0
         |          AND i < n)),
         |      [n]) AS cuts
         |  FROM docs),
         |chunks AS (
         |  SELECT doc_id,
         |    md5(substr(text, CAST(p.s + 1 AS INT),
         |      CAST(p.e - p.s AS INT))) AS h,
         |    p.e - p.s AS clen
         |  FROM (
         |    SELECT doc_id, text,
         |      unnest(list_transform(range(1, len(cuts)),
         |        k -> struct_pack(s := cuts[CAST(k AS INT)],
         |                         e := cuts[CAST(k AS INT) + 1]))) AS p
         |    FROM cutsd)
         |  WHERE p.e > p.s),
         |occ AS (
         |  SELECT h, CAST(COUNT(*) AS BIGINT) AS occ,
         |    CAST(MAX(clen) AS BIGINT) AS clen
         |  FROM chunks GROUP BY 1)
         |SELECT CAST(SUM(occ) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
         |  CAST(CAST(SUM(occ * clen) AS BIGINT) // CAST(SUM(occ) AS BIGINT)
         |    AS BIGINT) AS avg_chunk_chars,
         |  CAST(SUM(CASE WHEN occ > 1 THEN occ ELSE 0 END) AS BIGINT)
         |    AS n_dup_instances,
         |  ROUND(CAST(SUM(CASE WHEN occ > 1 THEN occ ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(occ) AS DOUBLE), 9) AS dup_chunk_rate
         |FROM occ""".stripMargin,
  )
}
