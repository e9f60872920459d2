package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props — FIXTURES.md §3).
  * The reference is pure batch (SURVEY §2.3); these are the north-star
  * streaming ops, built so every transform is a plain DataFrame
  * function usable on BOTH a batch frame and a `readStream` source —
  * the Structured Streaming contract (one API, incremental execution).
  *
  * Scale posture: every aggregation is keyed (window and/or user), so
  * state partitions by key across executors; watermarks bound state
  * size; `dropDuplicatesWithinWatermark` keeps the dedup state window
  * finite (the unbounded variant would OOM on an infinite stream).
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionOut(user_id: Long, n_events: Long,
      total_value: Double, start: java.sql.Timestamp, end: java.sql.Timestamp)

  final case class SessionState(nEvents: Long, totalValue: Double,
      startMs: Long, lastMs: Long)

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour
    * watermark (late data beyond that is dropped, state is reclaimed). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"), col("n"))

  /** Built-in session windows: events within a 30-minute gap merge. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total_value"))

  /** Streaming analog of the ETL's dedup (SURVEY T7): exactly-once by
    * event_id with bounded state — duplicates arriving within the
    * watermark horizon are dropped, state older than it is reclaimed. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STATIC enrichment join: each streaming event decorated from
    * a static dimension frame. No streaming state at all — the static
    * side is (re)planned per micro-batch and broadcast, so at 100 TB/day
    * the stream never shuffles; only the dim moves, once per batch.
    * Left join keeps events with no dim row (null-enriched), mirroring
    * the ETL's reject-channel posture. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stateful stream-stream INNER join: every `buy` event matched to
    * the same user's `view` events in the PRECEDING hour (conversion
    * attribution). Both sides carry watermarks and the join condition
    * is time-range-bounded, so Spark derives a state-eviction horizon
    * for each side — the state store holds at most ~3 h of events per
    * user key instead of growing forever (the unbounded-state
    * stream-stream join would OOM on an infinite stream). Works
    * unchanged on batch frames (watermarks are a no-op there). */
  def viewToBuyJoin(events: DataFrame): DataFrame =
    viewToBuyJoin(events, "inner")

  /** As [[viewToBuyJoin]], with a join-type knob. `left_outer` keeps
    * unattributed buys: Spark holds each buy in state until BOTH sides'
    * watermarks pass its join window, then emits it once with nulled
    * view columns — the streaming analogue of a batch left join, with
    * the null row delayed (never early) by exactly the state-eviction
    * horizon the time bounds already established. Without the time
    * bounds + watermarks Spark rejects the outer join outright
    * (no horizon → unmatched rows could never be finalized). */
  def viewToBuyJoin(events: DataFrame, joinType: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "2 hours")
    val buys = events.filter(col("event_type") === "buy")
      .select(col("user_id"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"), col("value").as("buy_value"))
      .withWatermark("buy_ts", "2 hours")
    buys.join(views,
      col("v_user") === col("user_id") &&
        col("view_ts") <= col("buy_ts") &&
        col("view_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("user_id"), col("buy_id"), col("view_id"),
        col("buy_ts"), col("view_ts"), col("buy_value"))
  }

  final case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String)

  final case class BandHit(doc_id: Long, ts: java.sql.Timestamp,
      sig: Seq[Long], band_key: String)

  /** Per-band verdict: `first_id == doc_id` means this doc is the first
    * writer of the band; otherwise `sig_agree` of 8 signature slots
    * match the band's first doc (agreement/8 estimates Jaccard). */
  final case class BandVerdict(doc_id: Long, band_key: String,
      first_id: Long, sig_agree: Int)

  final case class BandState(firstId: Long, sig: Seq[Long], lastMs: Long)

  /** STREAMING near-duplicate detection — minhash-LSH dedup over an
    * incremental crawl, the streaming counterpart of
    * `dedup_minhash_lsh`: each arriving doc computes its 8-slot minhash
    * signature (the same native codegen'd expressions as the batch
    * pipeline), fans out to 4 LSH band keys, and a per-band
    * first-writer-wins state emits a [[BandVerdict]] per (doc, band).
    * A doc is a near-dup if ANY band verdict points at an earlier
    * first-writer (signature agreement estimates the Jaccard; the
    * exact-verify step of the batch pipeline would join content back
    * on the flagged pairs downstream).
    *
    * Scale posture: state is keyed by BAND KEY → partitions across
    * executors; one entry (first doc id + 8 longs) per live band;
    * event-time timeout reclaims bands idle past the horizon, so an
    * infinite crawl holds state only for the dedup window — the same
    * boundedness contract as `dropDuplicatesWithinWatermark`, with
    * NEAR-dup (not exact) semantics. */
  def nearDupBandVerdicts(docs: Dataset[DocEvent],
      horizonMinutes: Long = 120): Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    // ONE horizon drives both the watermark and the state timeout —
    // separate knobs would desynchronize eviction from the late-data
    // contract (state outliving the watermark bloats; state evicted
    // early re-admits dups as first writers)
    val horizon = s"$horizonMinutes minutes"
    val horizonMs = horizonMinutes * 60 * 1000
    val sig = graft.dedup.Dedup.minhashSignature(
      graft.dedup.Dedup.shingleHashes(
        graft.dedup.Dedup.tokenHashes(graft.text.TextAnalysis.tokens(col("text")))), 8)
    docs.toDF()
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(array(graft.dedup.Dedup.bandKeys(col("sig"), 4, 2): _*))
          .as(Seq("band", "bkey")))
      .select(col("doc_id"), col("ts"), col("sig"),
        concat_ws("#", col("band"), col("bkey")).as("band_key"))
      .as[BandHit]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BandState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[BandHit], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic within-batch order: event time, then doc id
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var st = state.getOption
            val out = sorted.map { r =>
              st match {
                case None =>
                  st = Some(BandState(r.doc_id, r.sig, r.ts.getTime))
                  BandVerdict(r.doc_id, key, r.doc_id, 8)
                case Some(s) =>
                  val agree = s.sig.zip(r.sig).count { case (a, b) => a == b }
                  st = Some(s.copy(lastMs = math.max(s.lastMs, r.ts.getTime)))
                  BandVerdict(r.doc_id, key, s.firstId, agree)
              }
            }
            st.foreach { s =>
              state.update(s)
              // same clamp as sessionize: never set a timeout at/behind
              // the current watermark
              state.setTimeoutTimestamp(
                math.max(s.lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  final case class ChunkHit(doc_id: Long, ts: java.sql.Timestamp,
      chunk_hash: String)

  final case class ChunkVerdict(doc_id: Long, chunk_hash: String,
      first_id: Long, novel: Boolean)

  final case class ChunkState(firstId: Long, lastMs: Long)

  /** STREAMING chunk-level dedup — the incremental-crawl counterpart of
    * `text_chunk_dedup`: each arriving doc is cut into the SAME
    * non-overlapping 10-token chunks (md5-keyed, the batch query's
    * fixed-width exchange key), and a per-chunk first-writer-wins state
    * emits a verdict per (doc, chunk): novel iff this doc is the
    * chunk's first writer. Per-doc boilerplate ratios are one rollup
    * downstream, exactly like the band-verdict consumer.
    *
    * Scale posture: state is one (first id, last-seen) entry per LIVE
    * chunk key, partitioned by the hash across executors; the
    * event-time timeout bounds it to the dedup horizon — an infinite
    * crawl holds only the window's chunk set (the
    * [[nearDupBandVerdicts]] contract, at chunk rather than band
    * granularity). */
  def chunkNovelty(docs: Dataset[DocEvent],
      horizonMinutes: Long = 120): Dataset[ChunkVerdict] = {
    import docs.sparkSession.implicits._
    val horizon = s"$horizonMinutes minutes"
    val horizonMs = horizonMinutes * 60 * 1000
    val cw = 10
    val tok = graft.text.TextAnalysis.tokens(col("text"))
    docs.toDF()
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), tok.as("tok"))
      .withColumn("n_chunks", floor(size(col("tok")) / cw))
      .filter(col("n_chunks") >= 1)
      .select(col("doc_id"), col("ts"),
        explode(transform(
          sequence(lit(0), (col("n_chunks") - 1).cast("int")),
          i => md5(array_join(slice(col("tok"), i * cw + 1, lit(cw)), " "))))
          .as("chunk_hash"))
      .as[ChunkHit]
      .groupByKey(_.chunk_hash)
      .flatMapGroupsWithState[ChunkState, ChunkVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[ChunkHit], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var st = state.getOption
            val out = sorted.map { r =>
              st match {
                case None =>
                  st = Some(ChunkState(r.doc_id, r.ts.getTime))
                  ChunkVerdict(r.doc_id, key, r.doc_id, novel = true)
                case Some(s) =>
                  st = Some(s.copy(lastMs = math.max(s.lastMs, r.ts.getTime)))
                  ChunkVerdict(r.doc_id, key, s.firstId,
                    novel = s.firstId == r.doc_id)
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  final case class AnomalyOut(user_id: Long, event_id: Long, v: Double,
      mu: Double, sd: Double, is_anomaly: Boolean)

  final case class RollBuf(vals: List[Double])

  /** Streaming count–min sketch maintenance: the D·W counter grid of
    * `sketch_countmin_error` kept incrementally over an event stream.
    * The grid build is a plain hash aggregation, so this is PURE
    * Structured Streaming — no custom state, Spark's aggregation state
    * IS the sketch (constant D·W rows per the CMS property), queried in
    * Complete mode. The batch-equivalence spec asserts the streamed
    * grid equals the batch grid cell-for-cell — integer counts and the
    * same digest arithmetic, so equality is exact, not approximate. */
  def countminGrid(events: DataFrame): DataFrame =
    graft.ops.AggWindowQueries.cmGrid(events)

  final case class CusumAlarm(user_id: Long, event_id: Long, s: Double)

  final case class CusumState(s: Double, alarmed: Boolean)

  /** Streaming CUSUM drift alarm — the ONLINE counterpart of the batch
    * `window_cusum_drift` query, and the shape the statistic was
    * invented for (Page 1954 monitors a live process): per user, run
    * s = max(0, s + (x − k)) as O(1) state and emit ONE alarm row the
    * first time s crosses the threshold. The batch query reports the
    * retrospective peak; this reports the moment a drift became
    * detectable — first crossing precedes (≤) the batch peak position
    * by construction, which the batch-equivalence spec asserts.
    *
    * Same state/ordering contract as [[rollingAnomaly]]: O(1) per-user
    * state, no watermark needed to bound it, per-user event_id order
    * across micro-batches. Arithmetic note: state accumulates in
    * DOUBLE (streaming state wants fixed-width primitives); the batch
    * side is exact DECIMAL — the differential allows ulp slack only
    * within a hair of the threshold, like the anomaly differential. */
  def cusumDrift(events: Dataset[Event], k: Double = 50.0,
      threshold: Double = 400.0): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0.0, alarmed = false))
          val out = scala.collection.mutable.ListBuffer[CusumAlarm]()
          rows.toSeq.sortBy(_.event_id).foreach { e =>
            // mirror the batch side's DECIMAL(18,6) input rounding
            val x = BigDecimal(e.value)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            val s = math.max(0.0, st.s + (x - k))
            if (s > threshold && !st.alarmed)
              out += CusumAlarm(uid, e.event_id, s)
            st = CusumState(s, st.alarmed || s > threshold)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class CdcState(tsMs: Long, tsNanos: Int, eventId: Long,
      op: String, value: Double, nChanges: Long)
  final case class CdcOut(user_id: Long, last_op: String,
      last_value: Double, n_changes: Long, deleted: Boolean)

  /** Streaming CHANGELOG COMPACTION — the online counterpart of the
    * batch `etl_cdc_compaction` query: per key, keep only the LATEST
    * change ((ts, event_id) total order, full timestamp resolution via
    * the Timestamp nanos field), flagging keys whose latest change is a
    * delete marker (`error`). Emits the compacted row per key on every
    * update (Update semantics — a downstream upsert sink applies rows
    * keyed by user_id; `n_changes` is monotone, so the freshest row is
    * always identifiable).
    *
    * State is O(1) per key — one (ts, id, op, value, count) tuple, the
    * materialized-view row itself — with NO watermark needed: unlike
    * windowed aggs the state doesn't grow with time, only with key
    * cardinality, exactly like the table it maintains. Late/out-of-order
    * arrivals are handled by the comparison, not by ordering guarantees:
    * an older change that arrives after a newer one only bumps the
    * count. */
  def latestStateCompaction(events: Dataset[Event]): Dataset[CdcOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          rows.foreach { e =>
            val ms = e.ts.getTime; val ns = e.ts.getNanos
            val newer = st == null ||
              ms > st.tsMs || (ms == st.tsMs && (ns > st.tsNanos ||
                (ns == st.tsNanos && e.event_id > st.eventId)))
            val n = if (st == null) 1L else st.nChanges + 1
            st = if (newer) CdcState(ms, ns, e.event_id, e.event_type, e.value, n)
                 else st.copy(nChanges = n)
          }
          state.update(st)
          CdcOut(uid, st.op, st.value, st.nChanges, st.op == "error")
      }
  }

  final case class TwapState(lastSec: Long, lastId: Long, lastV: Double,
      sumVdt: Double, sumDt: Long, nIntervals: Long)
  final case class TwapOut(user_id: Long, n_intervals: Long,
      held_sec: Long, twap: Double)

  /** Streaming TWAP — the online counterpart of the batch `window_twap`
    * query: per user, each arriving event CLOSES the interval the
    * previous value held, folding value·Δt into running sums; the
    * emitted row is the time-weighted average over all closed
    * intervals. O(1) state per user (last observation + two sums) with
    * no watermark needed — the feature-store shape for "current TWAP
    * per entity". Ordering contract as [[rollingAnomaly]]: per-user
    * (sec, event_id) order across batches; within a batch the iterator
    * is sorted here. The batch differential replays the corpus in one
    * batch, where the contract holds trivially, and must agree on every
    * user's final row (the double fold vs the batch's exact decimal sum
    * gets ulp slack).
    *
    * Output mode is UPDATE, not Append: every closed interval re-emits
    * the same user's row with a larger n_intervals — upsert semantics
    * (latest per key wins), exactly [[latestStateCompaction]]'s
    * contract. Under Append a sink would treat each emission as a new
    * immutable row and receive non-final rows per key it must dedup
    * itself — Update states the mutation honestly and lets an upsert
    * sink (foreachBatch MERGE, memory table) keep only the latest. */
  def twap(events: Dataset[Event]): Dataset[TwapOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TwapState, TwapOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[TwapState]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer[TwapOut]()
          rows.toSeq
            // mirror the batch side: second-truncated ts, DECIMAL(18,2)
            // value rounding
            .map(e => (e.ts.getTime / 1000, e.event_id,
              BigDecimal(e.value)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
            .sorted
            .foreach { case (sec, id, v) =>
              st = if (st == null) TwapState(sec, id, v, 0.0, 0L, 0L)
              else {
                val dt = sec - st.lastSec
                val ns = TwapState(sec, id, v,
                  st.sumVdt + st.lastV * dt, st.sumDt + dt,
                  st.nIntervals + 1)
                if (ns.sumDt > 0)
                  out += TwapOut(uid, ns.nIntervals, ns.sumDt,
                    ns.sumVdt / ns.sumDt.toDouble)
                ns
              }
            }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming rolling z-score anomaly detection — the online
    * counterpart of the batch `window_rolling_anomaly` query: per user,
    * each event is scored against the mean/stddev of its previous 5
    * values (self-exclusive trailing window), held as per-user state.
    *
    * State is O(1) per user (exactly 5 doubles) with NO watermark
    * needed to bound it — the buffer never grows, which is the property
    * that lets this run on an infinite stream where windowed aggs need
    * watermark-driven eviction. Ordering contract: events must arrive
    * per-user in event_id order ACROSS micro-batches (a
    * partition-per-key source guarantee); within a batch the group
    * iterator is sorted here. The batch differential replays the corpus
    * as one batch, where the contract holds trivially. */
  def rollingAnomaly(events: Dataset[Event]): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RollBuf, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[RollBuf]) =>
          var buf = state.getOption.map(_.vals).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[AnomalyOut]()
          rows.toSeq.sortBy(_.event_id).foreach { e =>
            if (buf.length == 5) {
              val s = buf.sum
              val ss = buf.iterator.map(x => x * x).sum
              val mu = s / 5.0
              val sd = math.sqrt((ss - s * s / 5.0) / 4.0)
              out += AnomalyOut(uid, e.event_id, e.value, mu, sd,
                math.abs(e.value - mu) > sd * 2)
            }
            buf = (buf :+ e.value).takeRight(5)
          }
          state.update(RollBuf(buf))
          out.iterator
      }
  }

  /** Custom stateful sessionization via flatMapGroupsWithState: a
    * session closes after 30 minutes of inactivity (event-time timeout
    * keyed per user). Emits one row per closed session — the
    * hand-rolled variant of `sessionCounts` for when session logic
    * outgrows the built-in (e.g. value-dependent gaps). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.nEvents, s.totalValue,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value, lastMs = math.max(s.lastMs, t)))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.nEvents, s.totalValue,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs))
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT drop late rows, so a
              // very late event could compute a timeout earlier than
              // the current watermark — setTimeoutTimestamp throws and
              // kills the query. Clamp to just past the watermark.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
  final case class SprtState(day: Long, k: Long, n: Long,
      cumK: Long, cumN: Long)
  final case class SprtOut(day: Long, cum_succ: Long, cum_trials: Long,
      llr: Double, decision: String)

  /** Streaming WALD SPRT — the online counterpart of the batch
    * `stat_sprt_sequential` ([[graft.ops.FrontierQueriesS]], which
    * carries the design constants): per experiment (one key — an SPRT
    * is ONE decision stream; a multi-experiment platform keys by
    * experiment id), accumulate the day's (trials, successes), and when
    * the day rolls over emit that day's cumulative log-likelihood-ratio
    * row with the accept/continue decision — exactly the batch query's
    * per-day rows, which the batch-equivalence differential asserts.
    *
    * State is O(1) per experiment: (current day, day counts, cumulative
    * counts) — no watermark needed to bound it. Ordering contract as
    * [[cusumDrift]]: per-experiment (ts, event_id) order across
    * micro-batches, sorted within each batch. The LLR is computed from
    * CUMULATIVE EXACT LONGS in one double tree per emitted row —
    * identical arithmetic to the batch side, so the differential is
    * exact equality, not ulp-tolerant. The still-open day's row emits
    * only when a later day's first event closes it (an infinite stream
    * never finalizes "today"; the batch query sees the full horizon). */
  def sprtSequential(events: Dataset[Event]): Dataset[SprtOut] = {
    import events.sparkSession.implicits._
    val epochDay = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val c1 = math.log(graft.ops.FrontierQueriesS.SprtP1 /
      graft.ops.FrontierQueriesS.SprtP0)
    val c0 = math.log((1 - graft.ops.FrontierQueriesS.SprtP1) /
      (1 - graft.ops.FrontierQueriesS.SprtP0))
    val lnA = math.log(0.05 / 0.95)
    val lnB = math.log(0.95 / 0.05)
    def emitRow(st: SprtState): SprtOut = {
      val k = st.cumK + st.k
      val n = st.cumN + st.n
      val llr = k.toDouble * c1 + (n - k).toDouble * c0
      val dec = if (llr >= lnB) "accept_h1"
        else if (llr <= lnA) "accept_h0" else "continue"
      SprtOut(st.day, k, n,
        BigDecimal(llr).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        dec)
    }
    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var st = state.getOption.getOrElse(SprtState(-1L, 0L, 0L, 0L, 0L))
          val out = scala.collection.mutable.ListBuffer[SprtOut]()
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            // UTC day offset — the batch side's datediff(date_trunc(day))
            // under the suite's pinned UTC session
            val day = e.ts.toInstant.atZone(java.time.ZoneOffset.UTC)
              .toLocalDate.toEpochDay - epochDay
            if (st.day >= 0L && day != st.day) {
              out += emitRow(st)
              st = SprtState(day, 0L, 0L, st.cumK + st.k, st.cumN + st.n)
            } else if (st.day < 0L) st = st.copy(day = day)
            st = st.copy(n = st.n + 1L,
              k = st.k + (if (e.event_type == "purchase") 1L else 0L))
          }
          state.update(st)
          out.iterator
      }
  }
}
