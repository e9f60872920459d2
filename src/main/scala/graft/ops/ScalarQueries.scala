package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function packs + array/JSON/time-bucket extensions
  * (SURVEY §2.2, §2.3).
  *
  * Determinism rules applied throughout: FP-sensitive math stays in
  * decimal (or uses IEEE-correctly-rounded ops like sqrt on exactly
  * representable inputs); timestamps are `date_trunc`ed then formatted to
  * strings (events.ts is ns-precision parquet, Spark truncates to µs);
  * dates formatted as strings (pandas representation gap, see
  * EtlQueries.castToDate).
  *
  * All of these are single-pass projections — they pipeline inside one
  * WholeStageCodegen span over the scan with columns pruned to exactly
  * what the expressions read.
  */
object ScalarQueries {

  private def money(c: Column): Column = c.cast(DecimalType(18, 2))
  private def moneyOut(c: Column): Column = c.cast(DoubleType)

  /** T1–T3/L9 string battery: upper/lower/length/substr/concat. */
  def scalarStringPack(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 5).as("name5"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("tagged"))
      .orderBy("c_custkey")

  /** T4 date battery: year/month/day, month-truncate, day diff from a
    * fixed epoch. Truncated month emitted as a string. */
  def scalarDatePack(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
          .as("days_since"))
      .orderBy("o_orderkey")

  /** Math battery in exact decimal (round/abs/floor/ceil) plus IEEE sqrt
    * of an exactly-representable integer key (correctly rounded on every
    * engine, so bit-identical). */
  def scalarMathPack(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        moneyOut(round(money(col("o_totalprice")), 1)).as("rounded"),
        moneyOut(abs(money(col("o_totalprice")) - lit(200000))).as("absdev"),
        moneyOut(floor(money(col("o_totalprice")))).as("flr"),
        moneyOut(ceil(money(col("o_totalprice")))).as("cl"),
        sqrt(col("o_orderkey").cast(DoubleType)).as("sqrt_key"))
      .orderBy("o_orderkey")

  /** Bitwise function family — mask/flag manipulation every engine
    * user expects (and the dedup suite uses internally via simhash):
    * and/or/xor, shifts, bit_count. Pure integer arithmetic —
    * engine-identical by construction. */
  def scalarBitwisePack(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, d)
      .select(
        k,
        k.bitwiseAND(lit(0xFFL)).as("low_byte"),
        k.bitwiseOR(lit(0x100L)).as("with_flag"),
        k.bitwiseXOR(shiftright(k, 4)).as("mixed"),
        shiftleft(k.bitwiseAND(lit(0xFL)), 2).as("shifted"),
        bit_count(k).as("popcount"))
      .orderBy("o_orderkey")
  }

  /** §2.3 array ops over embeddings (list<float>): size + element access.
    * (Vector math lives in SimilarityQueries.) */
  def arrayBasics(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"))
      .orderBy("vec_id")

  /** §2.3 JSON-in-string extraction via regexp (regex on both sides keeps
    * the oracle independent of DuckDB's JSON extension); the engine also
    * ships schema-full from_json — see JsonOps. props shape: {"k": 87}. */
  def jsonFieldRegex(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast(IntegerType)
          .as("k_val"))
      .orderBy("event_id")

  /** ERROR-TOLERANT CAST battery — the ANSI-safe ingest surface
    * (`try_cast`/`try_divide`): malformed input yields NULL instead of
    * a task-killing exception. Inputs are made deterministically dirty
    * (every 7th event's k-string gets a trailing "x"; every 11th
    * divisor is zero) so both engines face identical garbage. The
    * rollup counts parsed vs nulled per event type — the DQ monitor's
    * view of ingest health.
    *
    * Scale posture: pure codegen'd projection + a tiny rollup; the
    * point is SEMANTIC (a 100 TB ingest cannot afford one bad row
    * killing a stage — try_* makes bad rows data, not failures). */
  def scalarTryCastPack(s: SparkSession, d: String): DataFrame = {
    val kStr = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
    val dirty = when(col("event_id") % 7 === 0, concat(kStr, lit("x")))
      .otherwise(kStr)
    val denom = when(col("event_id") % 11 === 0, lit(0L))
      .otherwise((col("value").cast(DecimalType(18, 2)) * 100)
        .cast(LongType))
    Tables.events(s, d)
      .select(col("event_type"),
        dirty.as("k_str"), denom.as("denom"))
      .select(col("event_type"),
        expr("try_cast(k_str AS INT)").as("k_try"),
        try_divide(lit(10000L), col("denom")).as("per_unit"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("k_try")).as("n_k_parsed"),
        count(col("per_unit")).as("n_div_ok"))
      .orderBy("event_type")
  }

  /** Streaming batch-equivalent: tumbling 1-hour buckets over events.ts
    * with count + decimal sum. The same groupBy works under Structured
    * Streaming with a watermark (see streaming package). */
  def timeBucketTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour_bucket"))
      .agg(count(lit(1)).as("n"),
        moneyOut(sum(money(col("value")))).as("sum_value"))
      .orderBy("hour_bucket")

  /** HOPPING (sliding) window batch aggregation — 1-hour windows every
    * 15 minutes, the batch twin of [[graft.streaming.Streams.slidingCounts]]:
    * each event replicates into the size/hop = 4 windows that cover it,
    * generated arithmetically (`sec DIV 900` re-bases to the 15-min
    * grid, minus i·900 for i ∈ 0..3) so membership needs no range join
    * and no window-table build. Window starts are integer epoch seconds
    * — exact in both engines; sums aggregate in DECIMAL.
    *
    * Scale posture: the explode is a constant ×4 fan-out BEFORE the
    * partial aggregate, so the shuffle carries ≤ 4·|grid| pre-combined
    * rows, not 4·|events| — map-side combine absorbs the replication
    * (same plan at 100 TB; the fan-out factor is size/hop, a config
    * constant, never data-dependent). */
  def timeBucketHopping(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("value"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .select(col("value"), col("sec"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .select((expr("(sec DIV 900) * 900") - col("i") * 900).as("ws_sec"),
        col("value"))
      .groupBy("ws_sec")
      .agg(count(lit(1)).as("n"),
        moneyOut(sum(money(col("value")))).as("sum_value"))
      .orderBy("ws_sec")

  /** Z-ORDER (Morton) layout keys — the data-layout primitive behind
    * multi-dimensional data skipping (Delta/Iceberg OPTIMIZE ZORDER):
    * interleave the bits of two 16-bit coordinates so that sorting by
    * the single zkey co-locates rows that are close in BOTH dimensions,
    * letting min/max file stats prune either predicate. The
    * interleave is the classic 4-step magic-mask bit spread — pure
    * integer projection, zero shuffle; the layout rewrite itself is
    * `repartitionByRange(zkey)` + sortWithinPartitions at write time.
    *
    * Output is the per-coarse-bucket locality evidence: each zkey
    * bucket covers a BOUNDED rectangle in (custkey, price) space —
    * exactly the property file-level min/max stats exploit. Coords:
    * x = custkey low 16 bits, y = floor(price)/32 (≤16 bits by data
    * contract; floor() keeps the double→int step identical across
    * engines — a raw CAST truncates in Spark but rounds in DuckDB). */
  def scalarZorderPack(s: SparkSession, d: String): DataFrame = {
    def spread(v: Column): Column = {
      val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
      c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
    }
    val x = col("o_custkey").bitwiseAND(lit(0xFFFFL))
    val y = shiftright(floor(col("o_totalprice")).cast(LongType), 5)
      .bitwiseAND(lit(0xFFFFL))
    Tables.orders(s, d)
      .select(col("o_orderkey"), x.as("x"), y.as("y"))
      .select(col("x"), col("y"),
        spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)).as("zkey"))
      .groupBy(shiftright(col("zkey"), 20).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zkey")).as("z_lo"), max(col("zkey")).as("z_hi"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      .orderBy("zbucket")
  }

  /** URL parsing pack over deterministically synthesized URLs (the
    * corpus carries no URL column; the synthesis is the same
    * render-then-parse pattern as the HTML-strip query): host / path /
    * query / fragment / one query parameter via Spark's `parse_url`,
    * mirrored in DuckDB by anchored RE2 regexes — two INDEPENDENT
    * statements of RFC-3986 component extraction that must agree.
    * Pure codegen'd projections; the only shuffle is the presentation
    * sort. */
  def scalarUrlPack(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/docs/"), col("doc_id").cast(StringType),
      lit("?ref=corpus&page="), pmod(col("doc_id"), lit(7L)).cast(StringType),
      lit("#s"), pmod(col("doc_id"), lit(3L)).cast(StringType))
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("url_host"),
        parse_url(col("url"), lit("PATH")).as("url_path"),
        parse_url(col("url"), lit("QUERY")).as("url_query"),
        parse_url(col("url"), lit("QUERY"), lit("page")).as("page_param"),
        parse_url(col("url"), lit("REF")).as("url_ref"))
      .orderBy("doc_id")
  }

  /** Calendar-dimension GENERATION + conformed rollup — the date-dim
    * build every warehouse performs: `sequence(min_date, max_date)`
    * explodes the full day span (days with no facts included — the
    * point of a generated dim), attributes derive per day (ISO weekday
    * via the [[AggWindowQueries.timeWeekdayProfile]] convention,
    * quarter, weekend flag), and orders LEFT-join the dim so the rollup
    * counts calendar days and facts independently.
    *
    * Scale posture: facts pre-aggregate to ONE row per day (partial
    * map-side combine on the scan) BEFORE touching the dim, so the join
    * is dim-sized × dim-sized and the day key — highly skewed on the
    * raw fact table — never becomes a shuffle key. The broadcast hint
    * sits on the day-level fact frame, the BUILD (right) side of the
    * left-outer join, where Spark can actually honor it: the round-6
    * form hinted the LEFT (row-preserving) side of a LeftOuter join,
    * which Spark cannot build, so the hint was silently ignored and the
    * plan degraded to a full-fact shuffle keyed by day. */
  def timeCalendarDim(s: SparkSession, d: String): DataFrame = {
    val span = Tables.orders(s, d)
      .agg(min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
    val cal = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("day"), year(col("day")).as("yr"),
        quarter(col("day")).as("qtr"),
        (weekday(col("day")) >= 5).as("is_weekend"))
    val factsByDay = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      .groupBy("day")
      .agg(count(col("price")).as("n_orders_day"), sum(col("price")).as("rev_day"))
    cal.join(broadcast(factsByDay), Seq("day"), "left")
      .groupBy("yr", "qtr", "is_weekend")
      .agg(count(lit(1)).as("n_days"),
        sum(coalesce(col("n_orders_day"), lit(0L))).as("n_orders"),
        coalesce(sum(col("rev_day")), lit(0).cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"))
      .orderBy("yr", "qtr", "is_weekend")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_calendar_dim"    -> timeCalendarDim _,
    "scalar_url_pack"      -> scalarUrlPack _,
    "scalar_zorder_pack"   -> scalarZorderPack _,
    "scalar_string_pack"   -> scalarStringPack _,
    "scalar_date_pack"     -> scalarDatePack _,
    "scalar_math_pack"     -> scalarMathPack _,
    "scalar_bitwise_pack"  -> scalarBitwisePack _,
    "array_basics"         -> arrayBasics _,
    "json_field_regex"     -> jsonFieldRegex _,
    "time_bucket_tumbling" -> timeBucketTumbling _,
    "time_bucket_hopping"  -> timeBucketHopping _,
    "scalar_try_cast_pack" -> scalarTryCastPack _,
  )

  val oracle: Map[String, String] = Map(
    "time_calendar_dim" ->
      """WITH span AS (
        |  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
        |    MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
        |cal AS (
        |  SELECT CAST(g.day AS DATE) AS day FROM span,
        |    LATERAL (SELECT unnest(generate_series(span.d0, span.d1,
        |      INTERVAL 1 DAY)) AS day) g),
        |dim AS (
        |  SELECT day, CAST(year(day) AS INTEGER) AS yr,
        |    CAST(quarter(day) AS INTEGER) AS qtr,
        |    isodow(day) >= 6 AS is_weekend
        |  FROM cal),
        |f AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders)
        |SELECT yr, qtr, is_weekend,
        |  COUNT(DISTINCT dim.day) AS n_days,
        |  COUNT(price) AS n_orders,
        |  CAST(COALESCE(SUM(price), CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM dim LEFT JOIN f ON f.day = dim.day
        |GROUP BY yr, qtr, is_weekend
        |ORDER BY yr, qtr, is_weekend""".stripMargin,
    "scalar_url_pack" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/docs/' ||
        |    CAST(doc_id AS VARCHAR) || '?ref=corpus&page=' ||
        |    CAST(doc_id % 7 AS VARCHAR) || '#s' || CAST(doc_id % 3 AS VARCHAR)
        |      AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https://([^/?#]+)', 1) AS url_host,
        |  regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1) AS url_path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS url_query,
        |  regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param,
        |  regexp_extract(url, '#(.*)$', 1) AS url_ref
        |FROM u ORDER BY doc_id""".stripMargin,
    "scalar_zorder_pack" ->
      // same 4-step magic-mask spread, staged through CTEs like the
      // Spark withColumn chain; floor() before the int cast on BOTH
      // sides (CAST alone truncates in Spark but rounds in DuckDB)
      """WITH c0 AS (
        |  SELECT o_custkey & 65535 AS x,
        |    (CAST(floor(o_totalprice) AS BIGINT) >> 5) & 65535 AS y
        |  FROM orders),
        |l1 AS (SELECT x, y,
        |  (x | (x << 8)) & 16711935 AS sx, (y | (y << 8)) & 16711935 AS sy
        |  FROM c0),
        |l2 AS (SELECT x, y,
        |  (sx | (sx << 4)) & 252645135 AS sx, (sy | (sy << 4)) & 252645135 AS sy
        |  FROM l1),
        |l3 AS (SELECT x, y,
        |  (sx | (sx << 2)) & 858993459 AS sx, (sy | (sy << 2)) & 858993459 AS sy
        |  FROM l2),
        |l4 AS (SELECT x, y,
        |  (sx | (sx << 1)) & 1431655765 AS sx, (sy | (sy << 1)) & 1431655765 AS sy
        |  FROM l3),
        |z AS (SELECT x, y, sx | (sy << 1) AS zkey FROM l4)
        |SELECT zkey >> 20 AS zbucket, COUNT(*) AS n,
        |  MIN(zkey) AS z_lo, MAX(zkey) AS z_hi,
        |  MIN(x) AS x_lo, MAX(x) AS x_hi,
        |  MIN(y) AS y_lo, MAX(y) AS y_hi
        |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin,
    "scalar_bitwise_pack" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 256 AS with_flag,
        |  xor(o_orderkey, o_orderkey >> 4) AS mixed,
        |  (o_orderkey & 15) << 2 AS shifted,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_string_pack" ->
      """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        |  length(c_name) AS name_len, substr(c_name, 1, 5) AS name5,
        |  concat_ws('-', c_name, c_mktsegment) AS tagged
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_date_pack" ->
      """SELECT o_orderkey,
        |  EXTRACT(year FROM o_orderdate) AS yr,
        |  EXTRACT(month FROM o_orderdate) AS mo,
        |  EXTRACT(day FROM o_orderdate) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math_pack" ->
      """SELECT o_orderkey,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS rounded,
        |  CAST(abs(CAST(o_totalprice AS DECIMAL(18,2)) - 200000) AS DOUBLE) AS absdev,
        |  CAST(floor(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS flr,
        |  CAST(ceil(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cl,
        |  sqrt(CAST(o_orderkey AS DOUBLE)) AS sqrt_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "array_basics" ->
      """SELECT vec_id, len(embedding) AS dim, embedding[1] AS first_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "json_field_regex" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "time_bucket_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin,
    "scalar_try_cast_pack" ->
      // the oracle states try_*'s null-on-error SEMANTICS explicitly
      // (TRY_CAST for parses, CASE for the zero divisor) — the engine
      // must implement them, not merely avoid crashing
      """WITH e AS (SELECT event_type,
        |    CASE WHEN event_id % 7 = 0
        |      THEN regexp_extract(props, '"k":\s*(\d+)', 1) || 'x'
        |      ELSE regexp_extract(props, '"k":\s*(\d+)', 1) END AS k_str,
        |    CASE WHEN event_id % 11 = 0 THEN 0
        |      ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      END AS denom
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  COUNT(TRY_CAST(k_str AS INTEGER)) AS n_k_parsed,
        |  COUNT(CASE WHEN denom = 0 THEN NULL ELSE 10000 // denom END)
        |    AS n_div_ok
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "time_bucket_hopping" ->
      """SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900)
        |    * 900 - i.i * 900 AS ws_sec,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
        |GROUP BY 1 ORDER BY ws_sec""".stripMargin,
  )
}
