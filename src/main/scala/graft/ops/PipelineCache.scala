package graft.ops

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for the persisted base frames shared by the
  * dedup/similarity pipelines.
  *
  * Why it exists (round-2 verdict defect #2): each query invocation used
  * to call `.persist().count()` on a freshly-built DataFrame; Spark's
  * CacheManager keys on the canonicalized plan, so repeated invocations
  * logged `WARN CacheManager: Asked to cache already cached data`, and
  * nothing ever unpersisted — across a 74-query bench session the cache
  * pool grew monotonically and drove run-to-run variance on the dedup
  * queries (measured 2.5× spread). This registry fixes both:
  *
  *  - `getOrPersist(key)` returns the SAME DataFrame object for a key,
  *    so persist() is called exactly once per key per lifecycle — no
  *    re-cache warnings;
  *  - `releaseAll()` unpersists and clears — callers that own an action
  *    boundary ([[graft.Bench]] after each timed query, [[graft.Verify]]
  *    after each dump) bound the pool to one query's working set.
  *
  * The eager `.count()` after persist is load-bearing: without it the
  * two branches of a downstream self-join race to materialize the cache
  * and each computes every partition (Spark caches per-partition with no
  * cross-task compute lock) — measured ~2× the cold cost.
  */
object PipelineCache {

  // PER-KEY locking (round 8): the bench's parallel compile pass runs
  // queries concurrently, and a single global monitor serialized every
  // worker behind whichever shared-base build happened to be running
  // (the SCC labeling holds its build for seconds). Memoization is a
  // concurrent map; each key builds under its own lock, so only
  // same-key callers wait. NOT ConcurrentHashMap.computeIfAbsent for
  // the build itself: builds NEST (sccLabels → brandSeqEdges), and
  // recursive computeIfAbsent on one map is prohibited. Nested builds
  // can't deadlock across key locks because the cache dependency graph
  // is a DAG (bases build before the frames derived from them).
  // releaseAll is only called from single-threaded contexts (sweep
  // boundaries; after compile-pass workers join), per the callers'
  // contract.
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def getOrPersist(key: String)(build: => DataFrame): DataFrame = {
    val cached = frames.get(key)
    if (cached != null) return cached
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = frames.get(key)
      if (again != null) again
      else {
        val df = build
        df.persist()
        df.count()
        frames.put(key, df)
        df
      }
    }
  }

  /** [[getOrPersist]] WITHOUT the eager count — the pin is lazy and
    * materializes inside the consumer's own action.
    *
    * When this is the right variant (round 11, the RFM latency case):
    * the eager count() is one whole extra JOB per key, and a query that
    * pins several INDEPENDENT small frames pays them strictly serially
    * (driver-blocking count after count) even though the frames could
    * materialize concurrently inside the final action — AQE
    * materializes independent exchange stages in parallel. Dropping the
    * count collapsed agg_rfm_segments from 5 serial jobs to 1.
    *
    * When it is WRONG (the measured ~2× in the object doc): a frame
    * whose first consumers are the two sides of a self-JOIN in the same
    * stage — both scans race and each computes every partition. Use
    * lazy pins only where (a) recompute is deterministic (so a race
    * costs time, not correctness — range shuffles with seeded sampling
    * qualify; anything reading spark_partition_id of a ROUND-ROBIN
    * shuffle does not), and (b) the first consumer materializes before
    * the others need it (a broadcast subtree builds before its probe
    * stage) or the frame is small enough that a duplicated compute is
    * cheaper than a serial job. */
  def getOrPersistLazy(key: String)(build: => DataFrame): DataFrame = {
    val cached = frames.get(key)
    if (cached != null) return cached
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = frames.get(key)
      if (again != null) again
      else {
        val df = build
        df.persist()
        frames.put(key, df)
        df
      }
    }
  }

  /** Adopt an ALREADY-persisted frame into the lifecycle (used by
    * iterative pipelines that persist per round themselves and need the
    * surviving final frame released at the query boundary). */
  def register(key: String, df: DataFrame): Unit = frames.put(key, df)

  /** Unpersist every registered frame (non-blocking) and clear. */
  def releaseAll(): Unit = {
    frames.values().forEach(df => df.unpersist(blocking = false))
    frames.clear()
    locks.clear()
  }
}
