package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Round-15 state-gated MULTI-ROUND UNROLL for the convergence loops
  * (r14 verdict, next-round item 1).
  *
  * WHY (measured, round 15): at fixture scale every convergence loop is
  * driver-bound, not data-bound — a DataFrame round costs ~150-250 ms of
  * which the DATA is microseconds: one scheduler job for the convergence
  * probe, one more when the round's join rebuilds its broadcast, and a
  * fresh Catalyst analyze/optimize/codegen pass for every round's plan.
  * The 8-core scaling run (BENCH_r14_c8) proved the graph family runs at
  * ratio ≤ 1 vs 32 cores — pure scheduler/driver floor. Three unroll
  * strategies were measured before this one (tools/unroll_probe*.scala):
  *   - chaining k DataFrame rounds lazily (no cuts): exponential driver
  *     planning — each round references its predecessor twice, so the
  *     logical tree doubles per round (k=12 → 50 s);
  *   - per-round LAZY localCheckpoint + one boundary probe: plan growth
  *     fixed, but each checkpoint still pays a materialization job
  *     (k+1 jobs per segment) — ≈ break-even;
  *   - rounds as RDD transformations (this module): no Catalyst work
  *     per round, segments of [[SegmentRounds]] rounds chained lazily
  *     and materialized by ONE probe job (tagged per-round metrics ride
  *     the same job through shared shuffle dependencies) — measured
  *     ~64 ms/round vs ~150-250 ms serial DataFrame rounds, with jobs
  *     per query dropping ~10×.
  *
  * WHY IT IS SAFE AT SCALE (the gate): the RDD lane only engages when
  * the loop's TRACKED state size (every loop already counts its edge/
  * vertex frames exactly for its broadcast guards) is at most
  * [[FastPathRowsPerCore]] rows per core — a regime where one round's
  * data fits in a handful of partitions and per-round scheduling, not
  * data movement, is the cost. At 100 TB the state is billions of rows,
  * the gate never passes, and the DataFrame loops (AQE-scoped,
  * size-guarded broadcasts, reliable-checkpoint lineage cuts) run
  * unchanged — so the scale posture of every loop is untouched. The
  * `spark.graft.loopFastPathMaxRows` conf overrides the gate ("0"
  * disables, large forces) so the equivalence specs drive BOTH lanes
  * over the same inputs.
  *
  * WHY THE ANSWERS ARE IDENTICAL: each kernel executes the SAME round
  * algebra as its DataFrame twin — min-depth folds, min-label folds,
  * degree peels, (−count, label) argmin votes — over integer state,
  * where every fold is order-insensitive and therefore bit-exact on
  * either lane. The one floating-point loop (PageRank) folds each
  * vertex's contributions in ascending neighbor order (the
  * [[GraphQueries.graphPagerankIterFold]] recipe), and its outputs are
  * rounded at 9 decimals exactly like the DataFrame lane — the ~1e−15
  * fold-order drift is six orders below the rounding granularity (the
  * adjudicated r8-r14 tolerance argument). LoopUnrollSpec pins lane
  * equality per query at two fixtures plus the synthetic spec graphs.
  *
  * Fault tolerance: the RDD lane keeps FULL lineage (no checkpoint
  * truncation) — a lost task recomputes its segment from the cached
  * boundary, which is bounded by construction (the gate).
  */
object LoopKernels {

  /** Rows of tracked loop state per core under which the RDD lane
    * engages. 64 Ki rows/core ≈ 2 M rows (≈ 50 MB of long-pair state)
    * on the 32-core contract box — two orders above every fixture and
    * at least three below any 100 TB loop state. */
  val FastPathRowsPerCore = 65536L

  /** Rounds chained per boundary probe. Segments are lazily-built RDD
    * chains, so the only per-round driver cost inside a segment is
    * closure construction; 8 keeps the recompute-on-task-retry window
    * small while amortizing the probe job well past the measured
    * job floor. */
  val SegmentRounds = 8

  /** Conf override for the gate: unset → cores × [[FastPathRowsPerCore]];
    * "0" → RDD lane never engages (the specs' serial-lane control);
    * a large value forces the lane on bigger synthetic states. */
  val ConfKey = "spark.graft.loopFastPathMaxRows"

  def maxRows(s: SparkSession): Long = {
    val v = s.conf.get(ConfKey, "")
    if (v.nonEmpty) v.toLong
    else s.sparkContext.defaultParallelism.toLong * FastPathRowsPerCore
  }

  /** Gate: `stateRows` is the loop's exactly-tracked state row count
    * (the same number its broadcast guards read). */
  def enabled(s: SparkSession, stateRows: Long): Boolean =
    stateRows >= 0 && stateRows <= maxRows(s)

  /** Loop-state partitioner, mirroring [[GraphQueries.withLoopExec]]'s
    * state-sized width: 1 partition per ~2M state rows, floor 4, capped
    * at the session shuffle width. */
  def statePartitioner(s: SparkSession, stateRows: Long): HashPartitioner = {
    val sized = math.max(4L, stateRows / (2L * 1000 * 1000))
    val cap = s.conf.get("spark.sql.shuffle.partitions", "32").toLong
    new HashPartitioner(math.min(math.max(sized, 4L), math.max(cap, 4L)).toInt)
  }

  // ---------- DataFrame <-> RDD shims ----------

  def longPairs(df: DataFrame): RDD[(Long, Long)] =
    df.rdd.map(r => (r.getLong(0), r.getLong(1)))

  def longs(df: DataFrame): RDD[Long] = df.rdd.map(_.getLong(0))

  def toDf(s: SparkSession, rdd: RDD[Row], fields: (String, DataType)*): DataFrame =
    s.createDataFrame(rdd,
      StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) }))

  /** Pivot selection order — top = max out-degree, MIN id tiebreak
    * (the serial lane's `orderBy(odeg.desc, src)` under `top`). Keys
    * are (odeg, src) pairs. */
  val PivotOrdering: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  // ---------- kernels ----------

  /** Min-depth BFS to frontier exhaustion — the [[GraphQueries.graphBfsConverged]]
    * round ((depth ∪ frontier⋈adj) → min per vertex), unrolled. Rounds
    * past exhaustion are no-ops on the min-fold depth map, so the
    * boundary probe only needs max(depth): a segment whose max stayed
    * short of its last round proves exhaustion.
    * @return (depth map, frontier still live at the cap?) */
  def minDepthLoop(s: SparkSession, seeds: RDD[(Long, Int)],
      adj: RDD[(Long, Long)], maxDepth: Int, stateRows: Long): (RDD[(Long, Int)], Boolean) = {
    val part = statePartitioner(s, stateRows)
    val adjP = adj.partitionBy(part).cache()
    var depth = seeds.partitionBy(part).cache()
    var base = 0
    var live = true
    while (live && base < maxDepth) {
      val seg = math.min(SegmentRounds, maxDepth - base)
      var cur = depth
      for (i <- 1 to seg) {
        val r = base + i
        val frontier = cur.filter(_._2 == r - 1)
        val cand = frontier.join(adjP).map { case (_, (_, y)) => (y, r) }
        cur = cur.union(cand).reduceByKey(part, (a: Int, b: Int) => math.min(a, b))
      }
      cur = cur.cache()
      val maxR = cur.map(_._2).fold(0)(math.max) // the ONE probe job
      live = maxR == base + seg
      base += seg
      depth = cur
    }
    (depth, live)
  }

  /** Min-label propagation to the label-sum fixpoint — the
    * [[DedupQueries.ccConvergedWithStats]] round, unrolled with exact
    * per-round label sums (integer, order-insensitive) tagged through
    * one probe job per segment, so the reported round count is
    * identical to the serial loop's.
    * @return (labels, rounds, converged?) */
  def minLabelLoop(s: SparkSession, edges: RDD[(Long, Long)],
      labels0: RDD[(Long, Long)], maxRounds: Int, stateRows: Long)
      : (RDD[(Long, Long)], Int, Boolean) = {
    val part = statePartitioner(s, stateRows)
    // propagate joins on the edge DST (neighbor labels flow dst -> src)
    val byDst = edges.map { case (a, b) => (b, a) }.partitionBy(part).cache()
    var labels = labels0.partitionBy(part).cache()
    var prevSum = labels.values.fold(0L)(_ + _)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - rounds)
      val frames = Vector.newBuilder[RDD[(Long, Long)]]
      var cur = labels
      for (_ <- 1 to seg) {
        val prop = cur.join(byDst).map { case (_, (lbl, aId)) => (aId, lbl) }
        cur = cur.union(prop).reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        frames += cur
      }
      val fs = frames.result()
      val sums = s.sparkContext
        .union(fs.zipWithIndex.map { case (f, i) => f.map(kv => (i, kv._2)) })
        .reduceByKey((a: Long, b: Long) => a + b)
        .collectAsMap() // the ONE probe job; empty frames sum to 0 below
      val seq = (0 until seg).map(i => sums.getOrElse(i, 0L))
      val chain = prevSum +: seq
      val j = (1 to seg).find(i => chain(i) == chain(i - 1))
      j match {
        case Some(i) =>
          converged = true
          rounds += i
          labels = fs(i - 1)
          prevSum = chain(i)
        case None =>
          rounds += seg
          labels = fs.last.cache()
          prevSum = seq.last
      }
    }
    (labels, rounds, converged)
  }

  /** K-core peel — the [[GraphQueries.graphKcore]] round (degree within
    * the survivor set, keep deg ≥ k), unrolled with exact per-round
    * survivor counts tagged through one probe job per segment (survivor
    * sets shrink, so count equality IS set equality — the serial loop's
    * own argument).
    * @return (survivors, rounds, converged?) */
  def kcoreLoop(s: SparkSession, dir: RDD[(Long, Long)], verts: RDD[Long],
      k: Int, maxRounds: Int, stateRows: Long, nVerts: Long)
      : (RDD[Long], Int, Boolean, Long) = {
    val part = statePartitioner(s, stateRows)
    val bySrc = dir.partitionBy(part).cache()
    var active = verts.map((_, ())).partitionBy(part).cache()
    var nActive = nVerts
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - rounds)
      val frames = Vector.newBuilder[RDD[(Long, Unit)]]
      var cur = active
      for (_ <- 1 to seg) {
        val e = bySrc.join(cur).map { case (src, (dst, _)) => (dst, src) }
          .join(cur).map { case (dst, (src, _)) => (src, dst) }
        cur = e.mapValues(_ => 1L).reduceByKey(part, (a: Long, b: Long) => a + b)
          .filter(_._2 >= k).mapValues(_ => ())
        frames += cur
      }
      val fs = frames.result()
      val counts = s.sparkContext
        .union(fs.zipWithIndex.map { case (f, i) => f.map(_ => (i, 1L)) })
        .reduceByKey((a: Long, b: Long) => a + b)
        .collectAsMap()
      val seq = (0 until seg).map(i => counts.getOrElse(i, 0L))
      val chain = nActive +: seq
      val j = (1 to seg).find(i => chain(i) == chain(i - 1))
      j match {
        case Some(i) =>
          converged = true
          rounds += i
          active = fs(i - 1)
          nActive = chain(i)
        case None =>
          rounds += seg
          active = fs.last.cache()
          nActive = seq.last
      }
    }
    (active.keys, rounds, converged, nActive)
  }

  /** Self-vote synchronous LPA — the [[GraphQueries.lpaConvergedOnAdjacency]]
    * round (neighbor votes + own label once; argmin of (−count, label)),
    * unrolled with exact per-round changed-label counts tagged through
    * one probe job per segment. Integer votes and label comparisons —
    * bit-exact on any lane.
    * @return (labels, rounds, converged?) */
  def lpaLoop(s: SparkSession, dir: RDD[(Long, Long)],
      labels0: RDD[(Long, Long)], maxRounds: Int, stateRows: Long)
      : (RDD[(Long, Long)], Int, Boolean, Long) = {
    val part = statePartitioner(s, stateRows)
    val byDst = dir.map { case (src, dst) => (dst, src) }.partitionBy(part).cache()
    // the (-cnt, lbl) struct-min of the DataFrame lane: larger count
    // wins, ties break to the SMALLER label
    def vote(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      if (a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)) a else b
    var cur = labels0.partitionBy(part).cache()
    var rounds = 0
    var converged = false
    var lastChanged = Long.MaxValue
    while (!converged && rounds < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - rounds)
      val frames = Vector.newBuilder[RDD[(Long, Long)]]
      val changedRdds = Vector.newBuilder[RDD[(Int, Long)]]
      var prev = cur
      for (i <- 1 to seg) {
        val nbr = prev.join(byDst).map { case (_, (lbl, src)) => (src, lbl) }
        val next = nbr.union(prev)
          .map { case (x, lbl) => ((x, lbl), 1L) }
          .reduceByKey((a: Long, b: Long) => a + b)
          .map { case ((x, lbl), cnt) => (x, (cnt, lbl)) }
          .reduceByKey(part, vote _)
          .mapValues(_._2)
        frames += next
        changedRdds += next.join(prev)
          .filter { case (_, (n, p)) => n != p }
          .map(_ => (i - 1, 1L))
        prev = next
      }
      val fs = frames.result()
      val changed = s.sparkContext.union(changedRdds.result())
        .reduceByKey((a: Long, b: Long) => a + b)
        .collectAsMap()
      val seq = (0 until seg).map(i => changed.getOrElse(i, 0L))
      val j = (1 to seg).find(i => seq(i - 1) == 0L)
      j match {
        case Some(i) =>
          converged = true
          rounds += i
          cur = fs(i - 1)
          lastChanged = 0L
        case None =>
          rounds += seg
          cur = fs.last.cache()
          lastChanged = seq.last
      }
    }
    (cur, rounds, converged, lastChanged)
  }

  /** Longest-path layering — the [[GraphQueries.graphTopologicalLayers]]
    * Bellman relaxation (max-fold), unrolled with the serial loop's own
    * convergence test (Σ layer is monotone non-decreasing and stationary
    * exactly at the fixpoint) probed once per segment: a boundary sum
    * equal to the previous boundary proves every intermediate round was
    * a no-op. Integer folds — bit-exact.
    * @return (layers, converged?) */
  def topoLoop(s: SparkSession, edges: RDD[(Long, Long)], verts: RDD[Long],
      maxRounds: Int, stateRows: Long): (RDD[(Long, Long)], Boolean) = {
    val part = statePartitioner(s, stateRows)
    val byU = edges.partitionBy(part).cache()
    var layers = verts.map((_, 0L)).partitionBy(part).cache()
    var prevSum = -1L
    var r = 0
    var converged = false
    while (!converged && r < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - r)
      var cur = layers
      for (_ <- 1 to seg) {
        val cand = cur.join(byU).map { case (_, (l, v)) => (v, l + 1L) }
        cur = cur.union(cand).reduceByKey(part, (a: Long, b: Long) => math.max(a, b))
      }
      cur = cur.cache()
      val sumL = cur.values.fold(0L)(_ + _) // the ONE probe job
      r += seg
      if (sumL == prevSum) converged = true else prevSum = sumL
      layers = cur
    }
    (layers, converged)
  }

  /** Damped PageRank to the max|Δ| tolerance — the
    * [[GraphQueries.pagerankConvergedOnAdjacency]] round, unrolled with
    * per-round deltas tagged through one probe job per segment so the
    * convergence round (and the declared n_rounds output) is found
    * EXACTLY as the serial loop finds it. Each vertex's contribution
    * sum folds in ascending source-id order (the bit-stable
    * [[GraphQueries.graphPagerankIterFold]] recipe — deterministic
    * run-to-run, and within the adjudicated 1e−15-vs-round-9 tolerance
    * of the DataFrame lane's partial-aggregated sum).
    * @param adj (src, (dst, outdeg(src))) rows
    * @return (ranks, rounds, final max|Δ|) */
  def pagerankLoop(s: SparkSession, adj: RDD[(Long, (Long, Long))],
      verts: RDD[Long], n: Long, relTol: Double, maxRounds: Int,
      stateRows: Long): (RDD[(Long, Double)], Int, Double) = {
    val part = statePartitioner(s, stateRows)
    val adjP = adj.partitionBy(part).cache()
    val tol = relTol / n
    val degs = adjP.map { case (src, (_, deg)) => (src, deg) }
      .reduceByKey(part, (a: Long, b: Long) => a) // deg constant per src
    val degSum = degs.values.fold(0L)(_ + _).toDouble
    val base0 = 0.15 / n
    var ranks = verts.map((_, ()))
      .partitionBy(part)
      .leftOuterJoin(degs)
      .mapValues { case (_, d) => d.map(_.toDouble / degSum).getOrElse(base0) }
      .cache()
    var rounds = 0
    var delta = Double.MaxValue
    while (delta >= tol && rounds < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - rounds)
      val frames = Vector.newBuilder[RDD[(Long, (Double, Double))]]
      val deltaRdds = Vector.newBuilder[RDD[(Int, Double)]]
      var cur = ranks
      for (i <- 1 to seg) {
        val sums = cur.join(adjP)
          .map { case (src, (pr, (dst, deg))) => (dst, (src, pr / deg)) }
          .groupByKey(part)
          .mapValues(it => it.toArray.sortBy(_._1).foldLeft(0.0)(_ + _._2))
        val next = cur.leftOuterJoin(sums)
          .mapValues { case (prev, sc) =>
            (base0 + 0.85 * sc.getOrElse(0.0), prev)
          }
        frames += next
        deltaRdds += next.map { case (_, (pr, prev)) => (i - 1, math.abs(pr - prev)) }
        cur = next.mapValues(_._1)
      }
      val fs = frames.result()
      val ds = s.sparkContext.union(deltaRdds.result())
        .reduceByKey((a: Double, b: Double) => math.max(a, b))
        .collectAsMap()
      val seq = (0 until seg).map(i => ds.getOrElse(i, 0.0))
      val j = (1 to seg).find(i => seq(i - 1) < tol)
      j match {
        case Some(i) =>
          rounds += i
          delta = seq(i - 1)
          ranks = fs(i - 1).mapValues(_._1)
        case None =>
          rounds += seg
          delta = seq.last
          ranks = fs.last.mapValues(_._1).cache()
      }
    }
    (ranks, rounds, delta)
  }

  /** Direction-tagged forward+backward reachability closure — the
    * [[GraphQueries]] `fwbwDepth` round (min-round depth map over the
    * dir-tagged adjacency), unrolled with the min-depth boundary probe.
    * @param pivots (x, pid) seed rows (bounded by SccPivotsPerRound)
    * @return ((x, pid, dir) -> first round, closure live at the cap?) */
  def fwbwLoop(s: SparkSession, edges: RDD[(Long, Long)],
      pivots: Seq[(Long, Long)], maxRounds: Int, stateRows: Long)
      : (RDD[((Long, Long, Int), Int)], Boolean) = {
    val part = statePartitioner(s, stateRows)
    val adj2 = edges.flatMap { case (a, b) => Seq(((a, 0), b), ((b, 1), a)) }
      .partitionBy(part).cache()
    var depth = s.sparkContext
      .parallelize(pivots.flatMap { case (x, pid) =>
        Seq(((x, pid, 0), 0), ((x, pid, 1), 0)) }, part.numPartitions)
      .cache()
    var base = 0
    var live = true
    while (live && base < maxRounds) {
      val seg = math.min(SegmentRounds, maxRounds - base)
      var cur = depth
      for (i <- 1 to seg) {
        val r = base + i
        val frontier = cur.filter(_._2 == r - 1)
          .map { case ((x, pid, dir), _) => ((x, dir), pid) }
        val cand = frontier.join(adj2)
          .map { case ((_, dir), (pid, y)) => ((y, pid, dir), r) }
        cur = cur.union(cand)
          .reduceByKey((a: Int, b: Int) => math.min(a, b))
      }
      cur = cur.cache()
      val maxR = cur.map(_._2).fold(0)(math.max) // the ONE probe job
      live = maxR == base + seg
      base += seg
      depth = cur
    }
    (depth, live)
  }

  /** Full trim + multi-pivot FW-BW SCC decomposition — the
    * [[GraphQueries]] `sccLabels` orchestration on the RDD lane. The
    * trim loop is unrolled with exact per-round survivor counts (the
    * k-core pattern; only productive rounds consume the trim budget,
    * exactly like the serial loop), and the per-round singleton labels
    * collapse to residual_before ∖ residual_after (each trimmed vertex
    * is its own SCC — the union of the per-round diffs IS the segment
    * diff). Pivot selection (top out-degree, min-id tiebreak) and the
    * both-directions intersection mirror the serial operators 1:1.
    * @return (member, scc_id = min member) labeling of every vertex */
  def sccDecompose(s: SparkSession, edges: RDD[(Long, Long)],
      maxComponents: Int, trimMaxRounds: Int, pivotsPerRound: Int,
      fwbwMaxRounds: Int, stateRows: Long,
      warn: String => Unit): RDD[(Long, Long)] = {
    val part = statePartitioner(s, stateRows)
    val eAll = edges.partitionBy(part).cache()
    val verts = eAll.flatMap { case (a, b) => Seq(a, b) }.distinct(part.numPartitions)
    var residual = verts.map((_, ())).partitionBy(part).cache()
    var nResidual = residual.count()
    val labeled = scala.collection.mutable.ArrayBuffer.empty[RDD[(Long, Long)]]
    var trims = 0
    var trimCapWarned = false

    def resEdges(res: RDD[(Long, Unit)]): RDD[(Long, Long)] =
      eAll.join(res).map { case (src, (dst, _)) => (dst, src) }
        .join(res).map { case (dst, (src, _)) => (src, dst) }

    def trimToFixpoint(): Unit = {
      var again = nResidual > 0
      while (again && trims < trimMaxRounds) {
        val seg = math.min(SegmentRounds, trimMaxRounds - trims)
        val frames = Vector.newBuilder[RDD[(Long, Unit)]]
        var cur = residual
        for (_ <- 1 to seg) {
          val e = resEdges(cur)
          cur = e.flatMap { case (src, dst) => Seq((src, (1, 0)), (dst, (0, 1))) }
            .reduceByKey(part, (a: (Int, Int), b: (Int, Int)) =>
              (math.max(a._1, b._1), math.max(a._2, b._2)))
            .filter { case (_, (o, i)) => o == 1 && i == 1 }
            .mapValues(_ => ())
          frames += cur
        }
        val fs = frames.result()
        val counts = s.sparkContext
          .union(fs.zipWithIndex.map { case (f, i) => f.map(_ => (i, 1L)) })
          .reduceByKey((a: Long, b: Long) => a + b)
          .collectAsMap()
        val seq = (0 until seg).map(i => counts.getOrElse(i, 0L))
        val chain = nResidual +: seq
        val j = (1 to seg).find(i => chain(i) == chain(i - 1))
        // only productive rounds consume the budget (serial semantics);
        // stop at the fixpoint round, or at the budget boundary
        val productive = j.map(_ - 1).getOrElse(seg)
        val take = math.min(productive, trimMaxRounds - trims)
        if (take > 0) {
          val out = fs(take - 1).cache()
          labeled += residual.subtract(out, part).keys.map(x => (x, x))
          residual = out
          nResidual = chain(take)
          trims += take
        }
        again = j.isEmpty && nResidual > 0 && trims < trimMaxRounds
        if (j.isEmpty && trims >= trimMaxRounds && nResidual > 0 && !trimCapWarned) {
          trimCapWarned = true
          warn(s"[graft] scc_full: trim cap $trimMaxRounds reached — " +
            "decomposition may be incomplete")
        }
      }
    }

    trimToFixpoint()
    var rounds = 0
    val pivotOrd = PivotOrdering
    while (nResidual > 0 && rounds < maxComponents) {
      rounds += 1
      val e = resEdges(residual).cache()
      val pivots = e.mapValues(_ => 1L)
        .reduceByKey((a: Long, b: Long) => a + b)
        .map { case (src, odeg) => (odeg, src) }
        .top(pivotsPerRound)(pivotOrd)
        .map { case (_, src) => (src, src) }
        .toSeq
      val (depth, live) = fwbwLoop(s, e, pivots, fwbwMaxRounds, stateRows)
      if (live) warn(s"[graft] scc_full: round cap $fwbwMaxRounds " +
        "reached — closure may be incomplete")
      val both = depth
        .map { case ((x, pid, dir), _) => ((x, pid), 1 << dir) }
        .reduceByKey((a: Int, b: Int) => a | b)
        .filter(_._2 == 3)
        .keys // (x, pid)
      val minPerPid = both.map { case (x, pid) => (pid, x) }
        .reduceByKey((a: Long, b: Long) => math.min(a, b))
      val extracted = both.map { case (x, pid) => (pid, x) }
        .join(minPerPid)
        .map { case (_, (x, sccId)) => (x, sccId) }
        .distinct(part.numPartitions)
        .cache()
      labeled += extracted
      residual = residual.subtract(
        extracted.keys.distinct(part.numPartitions).map((_, ())), part).cache()
      nResidual = residual.count()
      trimToFixpoint()
    }
    if (nResidual > 0)
      warn(s"[graft] scc_full: extraction-round cap $maxComponents " +
        s"reached with $nResidual vertices unlabeled")
    labeled.reduceOption(_ union _)
      .getOrElse(verts.map(x => (x, x)))
  }
}
