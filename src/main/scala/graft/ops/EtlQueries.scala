package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Queries mirroring the reference's ETL transform operators (SURVEY §2.1
  * T1–T8, L1, L7–L9) on the driver corpus. All are single-pass, pushdown-
  * friendly projections/filters or one-shuffle aggregations.
  */
object EtlQueries {

  /** T2 (`etl_process.py:10–11` digit-strip) as a built-in expression — the
    * reference used a per-row Python `.apply`; this is codegen'd. */
  def cleanRegexpDigits(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "[^0-9]", "").as("digits"))
      .orderBy("c_custkey")

  /** T3 (`etl_process.py:14–15` phone clean) canonicalized: translate+trim,
    * null stays null (quirk Q3 fixed at the engine level). */
  def cleanTranslateTrim(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        trim(translate(col("c_name"), "#", " ")).as("cleaned"))
      .orderBy("c_custkey")

  /** T4 (`etl_process.py:207–208` to_date). Output formatted as string —
    * DuckDB DATE arrives in pandas as midnight timestamps while Spark's
    * DateType stays a date, so the compare needs a common representation. */
  def castToDate(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(date_format(col("l_shipdate").cast(DateType), "yyyy-MM-dd")
        .as("ship_date"))
      .groupBy("ship_date").agg(count(lit(1)).as("n"))
      .orderBy("ship_date")

  /** T6/L8 (`etl_process.py:210–211` null-default fill). */
  def nullDefaultCoalesce(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(coalesce(nullif(col("o_orderstatus"), lit("O")), lit("UNKNOWN"))
        .as("status_c"))
      .groupBy("status_c").agg(count(lit(1)).as("n"))
      .orderBy("status_c")

  /** T5/L7 (`etl_process.py:209,120` conditional cast / falsy default). */
  def conditionalWhen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** L9 (`etl_process.py:123` UF[:2] truncation). */
  def substringTruncate(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(substring(col("n_name"), 1, 2).as("prefix"))
      .distinct()
      .orderBy("prefix")

  /** T7 with quirk Q8 fixed: deterministic survivor via row_number over a
    * total order — first order per customer. Partition-local window after
    * one hash shuffle on the key; no global window (scales to 100 TB). */
  def dedupDeterministic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  /** L1 (`etl_process.py:34` unique plan pairs). */
  def distinctProjection(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** T2 again, but through the engine's native Catalyst expression
    * (graft.functions.CpfClean) instead of regexp_replace — covers the
    * custom-Expression surface with the same oracle as the regex form. */
  def customExprCpfClean(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        graft.functions.CpfClean.cpfClean(col("c_name")).as("digits"))
      .orderBy("c_custkey")

  /** SCD type-2 merge (CDC upsert with history) — the dimension-table
    * maintenance pattern the reference's insert-if-absent loads
    * (`etl_process.py:101–141`) are the degenerate no-history case of.
    * Current state: even order keys; incoming batch: keys divisible by
    * 3, with every 5th key's status changed (so the batch carries real
    * inserts, real updates, and no-op matches). Merge semantics:
    *  - unmatched current row  → kept open (is_current)
    *  - matched, same value    → kept open, no new version
    *  - matched, changed value → old version CLOSED + new version opened
    *  - unmatched incoming row → inserted open at the new version
    *
    * Posture: ONE full-outer shuffle join on the business key, then a
    * generator (explode of a 1–2 element struct array) emits closed and
    * opened versions in the same pass — no per-branch rescan of either
    * side, no window. `valid_to` uses a 9999 open-sentinel instead of
    * NULL so every output column stays total-orderable. */
  def etlScd2Merge(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cur = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("cur_status"))
    val inc = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("inc_status"))
    def version(st: org.apache.spark.sql.Column, from: Int, current: Boolean) =
      struct(st.as("status"), lit(from).as("valid_from"),
        lit(9999).as("valid_to"), lit(current).as("is_current"))
    cur.join(inc, Seq("k"), "full_outer")
      .select(col("k"), explode(
        when(col("inc_status").isNull ||
             col("cur_status") === col("inc_status"),
          array(version(col("cur_status"), 0, current = true)))
        .when(col("cur_status").isNull,
          array(version(col("inc_status"), 1, current = true)))
        .otherwise(array(
          version(col("cur_status"), 0, current = false),
          version(col("inc_status"), 1, current = true)))).as("r"))
      .select(col("k"), col("r.status").as("status"),
        col("r.valid_from").as("valid_from"), col("r.valid_to").as("valid_to"),
        col("r.is_current").as("is_current"))
      .orderBy("k", "valid_from")
  }

  /** CDC CHANGELOG COMPACTION — collapse a keyed change stream to its
    * final state: latest change per key wins (ordered by ts with
    * event_id as the total-order tiebreak), and a key whose latest
    * change is a delete disappears. The events table plays the
    * changelog (`error` = delete marker, anything else = upsert
    * carrying `value`). This is the log-structured ingest primitive —
    * the reference's truncate-and-reload (`etl_process.py` full
    * rewrite) is its degenerate "every row is an upsert, no history"
    * case, and [[etlScd2Merge]] is its history-KEEPING sibling.
    *
    * Scale posture: both windows partition on the key, so the plan is
    * ONE hash exchange + one within-partition sort (the subset rule);
    * per-key change counts are bounded by changelog depth between
    * compactions, which a production pipeline bounds by compacting on
    * a schedule. `last_value` passes through untouched (parquet bits →
    * output bits) — no arithmetic to drift. */
  def etlCdcCompaction(s: SparkSession, d: String): DataFrame = {
    val byKey = Window.partitionBy("user_id")
    // ts here is MICROsecond precision (the engine truncates the
    // parquet TIMESTAMP(NANOS) at read — Tables.events), so the oracle
    // orders on date_trunc('microseconds', ts) to state the same total
    // order; two changes in the same microsecond fall to the event_id
    // tiebreak in BOTH engines instead of only one of them seeing the
    // nanosecond difference.
    val latest = byKey.orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rk", row_number().over(latest))
      .withColumn("n_changes", count(lit(1)).over(byKey))
      .filter(col("rk") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_op"),
        col("value").as("last_value"), col("n_changes"))
      .orderBy("user_id")
  }

  /** SURVIVORSHIP MERGE — the MDM golden-record build the reference's
    * customer consolidation gestures at (its dedup keeps one arbitrary
    * row; survivorship keeps the BEST value per FIELD, each under its
    * own rule): per user, the most recent purchase amount (recency rule
    * on a sparse attribute — `last(…, ignoreNulls)` carries it across
    * non-purchase events), the most recent click's props.k (same rule,
    * different source field), first/last seen, and the modal event type
    * (frequency rule, ties → smallest type string). One row per user =
    * the golden record.
    *
    * Scale posture: three derivations (carry windows, span aggregate,
    * mode fold) each pay one user_id exchange, and the final joins are
    * exchange-FREE — both sides arrive hash-partitioned on user_id.
    * Every exchange in the plan keys on user_id alone (spec-pinned);
    * the mode is the count→`min(struct(-cnt, type))` fold
    * (constant-width rows, no per-user lists). */
  private[ops] def survivorshipCore(s: SparkSession, d: String): DataFrame = {
    // repartition by user_id up front: hash(user_id) satisfies every
    // downstream requirement — the carry windows, the span aggregate,
    // and the (user_id, event_type) mode rollup (subset rule) — so each
    // branch pays exactly one user_id exchange and nothing else
    val ev = Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value").cast(DecimalType(18, 2)).as("v"), col("props"),
      unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
      .repartition(col("user_id"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = ev
      .withColumn("purch_v",
        last(when(col("event_type") === "purchase", col("v")),
          ignoreNulls = true).over(ord))
      .withColumn("click_k",
        last(when(col("event_type") === "click",
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
            .cast(IntegerType)), ignoreNulls = true).over(ord))
      .withColumn("rk", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("sec").desc, col("event_id").desc)))
    val golden = base.filter(col("rk") === 1)
      .select(col("user_id"), col("purch_v"), col("click_k"))
    val spans = ev.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      min(col("sec")).as("first_seen_sec"),
      max(col("sec")).as("last_seen_sec"))
    val mode = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(min(struct((-col("cnt")).as("nc"), col("event_type").as("t")))
        .as("m"))
      .select(col("user_id"), col("m.t").as("preferred_type"))
    golden.join(spans, "user_id").join(mode, "user_id")
      .select(col("user_id"), col("n_events"),
        col("first_seen_sec"), col("last_seen_sec"),
        col("purch_v").cast(DoubleType).as("last_purchase_value"),
        col("click_k").as("last_click_k"), col("preferred_type"))
  }

  def etlSurvivorshipMerge(s: SparkSession, d: String): DataFrame =
    survivorshipCore(s, d).orderBy("user_id")

  /** SYNC CHECKSUMS — the cross-system reconciliation primitive behind
    * "did the nightly load drift from the source?": rows bucket by key,
    * and each bucket folds to an order-insensitive checksum (SUM of a
    * 32-bit md5 fold over the row's canonical string — addition
    * commutes, so partitioning/arrival order can't change it; a
    * vanished, extra, or altered row almost surely changes its
    * bucket's sum). Comparing 32 (bucket, checksum) pairs from two
    * systems localizes a mismatch to 1/32 of the table without moving
    * any rows. Canonical string uses ONLY engine-stable pieces: BIGINT
    * keys, integer cents, raw status strings — no float or decimal
    * formatting anywhere.
    *
    * Scale posture: one codegen'd projection + a partial-aggregated
    * 32-group rollup — the cheapest full-table pass there is; at
    * 100 TB per-system cost is a scan, and the comparison ships 32
    * rows. */
  def etlSyncChecksums(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast(LongType)
    val rowStr = concat_ws("|", col("o_orderkey").cast(StringType),
      col("o_orderstatus"), cents.cast(StringType))
    Tables.orders(s, d)
      .select((col("o_orderkey") % 32).as("bucket"),
        graft.dedup.Dedup.hexFold32(md5(rowStr)).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
      .orderBy("bucket")
  }

  /** Data Vault 2.0 key generation — the hash-key projections a DV
    * warehouse load derives before hub/link/satellite inserts: hub key
    * from the business key, link key from the relationship's key pair,
    * satellite HASHDIFF over the descriptive attributes (change
    * detection: a new hashdiff versions the satellite row). All keys
    * are md5 over delimiter-joined canonical strings — numerics
    * rendered as integer cents and ISO dates so both engines format
    * identically (the sync-checksums canonicalization rule). Pure
    * codegen'd projections; the only shuffle is the presentation
    * sort. */
  def etlDatavaultKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        md5(concat_ws("|", lit("cust"), col("o_custkey").cast(StringType)))
          .as("hk_customer"),
        md5(concat_ws("|", lit("ord"), col("o_orderkey").cast(StringType)))
          .as("hk_order"),
        md5(concat_ws("|", lit("ordcust"), col("o_orderkey").cast(StringType),
          col("o_custkey").cast(StringType))).as("hk_link_order_customer"),
        md5(concat_ws("|",
          col("o_orderstatus"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).cast(StringType),
          date_format(col("o_orderdate"), "yyyy-MM-dd"),
          col("o_orderpriority"))).as("hashdiff"))
      .orderBy("o_orderkey")

  /** Small-files COMPACTION PLAN — the lakehouse maintenance step that
    * turns N small files into ⌈Σbytes/target⌉ right-sized ones (the
    * operational twin of `spark.sql.files.maxPartitionBytes` binning,
    * planned relationally): per source, documents (standing in for the
    * file listing; size = octet_length) are assigned in id order to
    * output bins by `cumulative-bytes-before DIV target` — the greedy
    * streaming pack, where a file straddling a boundary belongs to the
    * bin it started in, exactly how Spark's FilePartition packer
    * groups splits. Output: per (source, bin) the planned group's file
    * count and bytes — what a compaction job feeds its writer.
    *
    * Pure integer arithmetic (prefix sums, integer division).
    * Scale posture: one window exchange keyed by source over FILE
    * METADATA (never file contents — at 100 TB the listing is ~10⁶
    * rows, not bytes), partial-aggregated rollup. */
  def etlCompactionPlan(s: SparkSession, d: String): DataFrame = {
    val target = 65536L // 64 KiB bins at fixture scale; a knob in production
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast(LongType).as("bytes"))
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before DIV $target"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy("source", "bin")
  }

  /** GDPR/CCPA ERASURE AUDIT — the compliance pass every user-data
    * pipeline must run: an erasure list (here a deterministic md5 2%
    * slice of user ids, standing in for the request queue) is applied
    * to the event store by broadcast anti-join, and the audit reports
    * per event type what was held, what was erased, and what remains —
    * the evidence record a data-protection officer files. The
    * reference's per-row DELETEs are the degenerate one-key case.
    *
    * Scale posture: the erasure list is request-queue-sized (tiny) →
    * broadcast semi/anti probes; the 100 TB event store is consumed
    * map-side and never shuffles; one partial-aggregated rollup. */
  def etlErasureAudit(s: SparkSession, d: String): DataFrame = {
    val erase = pmod(graft.dedup.Dedup.hexFold32(
      md5(concat(lit("gdpr:"), col("user_id").cast(StringType)))), lit(50L)) === 0
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"), erase.as("erased"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_held"),
        count(when(col("erased"), 1)).as("n_erased"),
        count(when(!col("erased"), 1)).as("n_remaining"),
        count_distinct(when(col("erased"), col("user_id"))).as("n_subjects"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_erasure_audit"   -> etlErasureAudit _,
    "etl_compaction_plan" -> etlCompactionPlan _,
    "etl_datavault_keys" -> etlDatavaultKeys _,
    "etl_sync_checksums"     -> etlSyncChecksums _,
    "etl_survivorship_merge" -> etlSurvivorshipMerge _,
    "etl_cdc_compaction"    -> etlCdcCompaction _,
    "etl_scd2_merge"        -> etlScd2Merge _,
    "custom_expr_cpfclean"  -> customExprCpfClean _,
    "clean_regexp_digits"   -> cleanRegexpDigits _,
    "clean_translate_trim"  -> cleanTranslateTrim _,
    "cast_to_date"          -> castToDate _,
    "null_default_coalesce" -> nullDefaultCoalesce _,
    "conditional_when"      -> conditionalWhen _,
    "substring_truncate"    -> substringTruncate _,
    "dedup_deterministic"   -> dedupDeterministic _,
    "distinct_projection"   -> distinctProjection _,
  )

  val oracle: Map[String, String] = Map(
    "etl_erasure_audit" ->
      s"""WITH e AS (
         |  SELECT event_type, user_id,
         |    (${OracleSql.fold32("'gdpr:' || CAST(user_id AS VARCHAR)")})
         |      % 50 = 0 AS erased
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_held,
         |  COUNT(CASE WHEN erased THEN 1 END) AS n_erased,
         |  COUNT(CASE WHEN NOT erased THEN 1 END) AS n_remaining,
         |  COUNT(DISTINCT CASE WHEN erased THEN user_id END) AS n_subjects
         |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "etl_datavault_keys" ->
      """SELECT o_orderkey, o_custkey,
        |  md5('cust' || '|' || CAST(o_custkey AS VARCHAR)) AS hk_customer,
        |  md5('ord' || '|' || CAST(o_orderkey AS VARCHAR)) AS hk_order,
        |  md5('ordcust' || '|' || CAST(o_orderkey AS VARCHAR) || '|' ||
        |      CAST(o_custkey AS VARCHAR)) AS hk_link_order_customer,
        |  md5(o_orderstatus || '|' ||
        |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |        AS VARCHAR) || '|' ||
        |      strftime(o_orderdate, '%Y-%m-%d') || '|' ||
        |      o_orderpriority) AS hashdiff
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "etl_compaction_plan" ->
      """WITH f AS (SELECT source, doc_id,
        |    CAST(strlen(text) AS BIGINT) AS bytes
        |  FROM documents),
        |c AS (SELECT source, doc_id, bytes,
        |    COALESCE(CAST(SUM(bytes) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        |  FROM f)
        |SELECT source, cum_before // 65536 AS bin,
        |  COUNT(*) AS n_files, CAST(SUM(bytes) AS BIGINT) AS bytes,
        |  MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    "etl_sync_checksums" ->
      s"""SELECT o_orderkey % 32 AS bucket,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(${OracleSql.fold32(
             "CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' || " +
             "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)")})
         |    AS BIGINT) AS checksum
         |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "etl_survivorship_merge" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(value AS DECIMAL(18,2)) AS v, props,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |c AS (SELECT user_id, event_id, sec,
        |    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN v END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |        ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS purch_v,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN
        |        CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)
        |      END IGNORE NULLS) OVER (PARTITION BY user_id
        |        ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS click_k,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY sec DESC, event_id DESC) AS rk
        |  FROM ev),
        |g AS (SELECT user_id, purch_v, click_k FROM c WHERE rk = 1),
        |sp AS (SELECT user_id, COUNT(*) AS n_events,
        |    MIN(sec) AS first_seen_sec, MAX(sec) AS last_seen_sec
        |  FROM ev GROUP BY user_id),
        |mc AS (SELECT user_id, event_type, COUNT(*) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |m AS (SELECT user_id, event_type AS preferred_type FROM (
        |    SELECT user_id, event_type, ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rk
        |    FROM mc) WHERE rk = 1)
        |SELECT g.user_id, n_events, first_seen_sec, last_seen_sec,
        |  CAST(CAST(purch_v AS VARCHAR) AS DOUBLE) AS last_purchase_value,
        |  click_k AS last_click_k, preferred_type
        |FROM g JOIN sp ON g.user_id = sp.user_id
        |JOIN m ON g.user_id = m.user_id
        |ORDER BY g.user_id""".stripMargin,
    "etl_cdc_compaction" ->
      """SELECT user_id, event_type AS last_op, value AS last_value,
        |  n_changes
        |FROM (SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |WHERE rk = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "etl_scd2_merge" ->
      """WITH current AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |incoming AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS status
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT c.k AS k, c.status AS status, 0 AS valid_from,
        |  9999 AS valid_to, FALSE AS is_current
        |  FROM current c JOIN incoming i ON c.k = i.k AND c.status <> i.status
        |UNION ALL
        |SELECT c.k, c.status, 0, 9999, TRUE
        |  FROM current c LEFT JOIN incoming i ON c.k = i.k
        |  WHERE i.k IS NULL OR c.status = i.status
        |UNION ALL
        |SELECT i.k, i.status, 1, 9999, TRUE
        |  FROM incoming i LEFT JOIN current c ON i.k = c.k
        |  WHERE c.k IS NULL OR c.status <> i.status
        |ORDER BY k, valid_from""".stripMargin,
    "custom_expr_cpfclean" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "clean_regexp_digits" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "clean_translate_trim" ->
      """SELECT c_custkey, trim(translate(c_name, '#', ' ')) AS cleaned
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "cast_to_date" ->
      """SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY ship_date""".stripMargin,
    "null_default_coalesce" ->
      """SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'UNKNOWN') AS status_c,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY status_c""".stripMargin,
    "conditional_when" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'low' END AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "substring_truncate" ->
      """SELECT DISTINCT substr(n_name, 1, 2) AS prefix
        |FROM nation ORDER BY prefix""".stripMargin,
    "dedup_deterministic" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin,
    "distinct_projection" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
  )
}
