package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Min, Partial, Sum}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}

/** Plan-shape assertions (SURVEY §5.5): the physical plans that make
  * these queries scale must not silently regress. Each assertion names
  * the property that matters at 100 TB, not the incidental operator.
  *
  * Assertions walk the executedPlan TREE (collect over operator
  * classes), not the formatted plan string — string-fragment counting
  * broke on every Spark/AQE formatting change rather than on real
  * regressions (advice r4). The walk unwraps AQE wrappers and descends
  * into cached (InMemoryRelation) subplans, mirroring what the old
  * string dump printed. */
class PlanShapeSpec extends SparkTestBase {

  private def plan(q: String): SparkPlan =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan

  /** Every operator in the plan tree, through AQE wrappers and into
    * cached subplans (subquery plans excluded, matching the main-tree
    * scope of the former string dump). */
  private def ops(p: SparkPlan, intoCache: Boolean = true): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case im: InMemoryTableScanExec =>
        if (intoCache) im.children :+ im.relation.cachedPlan else im.children
      case other => other.children
    }
    p +: kids.flatMap(ops(_, intoCache))
  }

  private def hashExchanges(p: SparkPlan): Seq[ShuffleExchangeExec] =
    ops(p).collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
  private def rangeExchanges(p: SparkPlan): Seq[ShuffleExchangeExec] =
    ops(p).collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    ops(p).collect { case f: FileSourceScanExec => f }
  private def noCartesian(p: SparkPlan, q: String = ""): Unit = {
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
      s"$q: cartesian product in:\n$p")
    assert(ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"$q: nested-loop join in:\n$p")
  }
  private def partialAggs(p: SparkPlan): Seq[BaseAggregateExec] =
    ops(p).collect {
      case a: BaseAggregateExec
          if a.aggregateExpressions.exists(_.mode == Partial) => a
    }

  test("scan_project_filter pushes the predicate and prunes columns at the scan") {
    val ss = scans(plan("scan_project_filter"))
    assert(ss.nonEmpty)
    val md = ss.head.metadata
    assert(md("PushedFilters") ==
      "[IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]", md)
    // projection pruned to the 4 referenced columns, not the full table
    assert(md("ReadSchema") == "struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>", md)
  }

  test("agg_hash_groupby partial-aggregates map-side before its single shuffle") {
    val p = plan("agg_hash_groupby")
    assert(partialAggs(p).exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[Sum])), p)
    // exactly one hash-partition exchange (plus the output range sort)
    assert(hashExchanges(p).size == 1, p)
  }

  test("sort_limit_topk plans as two-stage top-k, never a global sort") {
    val p = plan("sort_limit_topk")
    assert(ops(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]), p)
    assert(rangeExchanges(p).isEmpty, p)
  }

  test("broadcast joins for dims, shuffle join for fact-fact") {
    assert(ops(plan("join_inner_broadcast"))
      .exists(_.isInstanceOf[BroadcastHashJoinExec]))
    val large = plan("join_shuffle_large")
    assert(ops(large).exists(o => o.isInstanceOf[SortMergeJoinExec] ||
      o.isInstanceOf[ShuffledHashJoinExec]), large)
  }

  test("similarity scans never shuffle the embedding side") {
    val p = plan("sim_cosine_topk")
    assert(ops(p).exists(o => o.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      o.isInstanceOf[BroadcastExchangeExec]), p)
    assert(hashExchanges(p).isEmpty, p)
  }

  test("nDCG eval fans the corpus by broadcast probes, never corpus x corpus") {
    // one scan fanned x10 by the broadcast probe panel (the recall-eval
    // plan); the two top-10 frames join equi on (pid, vec_id)
    val p = plan("sim_ndcg_quantized")
    graft.ops.PipelineCache.releaseAll()
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[BroadcastExchangeExec]), p)
  }

  test("dedup candidate joins are equi-joins on derived keys, no cartesian") {
    Seq("dedup_minhash_lsh", "dedup_prefix_jaccard", "dedup_simhash",
        "dedup_embedding_cosine", "dedup_cluster_labels",
        "dedup_shared_passage").foreach { q =>
      noCartesian(plan(q), q)
    }
  }

  test("per-label cell counts attach by broadcast hash join, never a shuffle") {
    // the (label, m) frame is tiny (one row per label) — if it ever
    // grew a shuffle on the corpus side, every embedding row would pay
    // an exchange just to learn its replication factor
    graft.ops.PipelineCache.releaseAll()
    val p = plan("dedup_embedding_cosine")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("per-cell sub-cell counts attach by broadcast hash join in the IVF pair joins") {
    // r13 verdict #2: the (cell, m) frame is one row per coarse cell
    // (≈√N rows — broadcast-sized at any corpus scale); the replication
    // step must learn m through a broadcast, never by shuffling the
    // embedding side against the count frame
    Seq("dedup_semantic_cells", "sim_knn_batch_ivf").foreach { q =>
      graft.ops.PipelineCache.releaseAll()
      val p = plan(q)
      assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), s"$q:\n$p")
    }
    graft.ops.PipelineCache.releaseAll()
  }

  test("bucketed co-located join reads buckets with no exchange or sort on either side") {
    val df = graft.ops.JoinQueries.joinBucketedColocated(spark, sfDir)
    val p = df.queryExecution.executedPlan
    val smj = ops(p).collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, p)
    // bucket pruning surface active on at least one join-side scan
    assert(scans(p).exists(_.metadata.contains("SelectedBucketsCount")), p)
    // the ONLY hash exchange allowed is the aggregation's, above the join:
    // the join inputs are bucket-partitioned and sorted on disk
    assert(smj.forall(j => hashExchanges(j).isEmpty), p)
  }

  test("batch sessionization shuffles once on user_id for both windows and the agg") {
    // lag + running-sum windows share PARTITION BY user_id, and the
    // session groupBy's (user_id, session_idx) keys are a superset of
    // user_id — at 100 TB the whole pipeline must ride ONE exchange
    // (plus the presentation range sort), never re-shuffle per window.
    val p = plan("window_sessionize_batch")
    assert(hashExchanges(p).size == 1, p)
  }

  test("curation funnel's survivor filter plans as a window group-limit") {
    // rank()=1 must push a per-group limit BELOW the shuffle
    // (WindowGroupLimit), not materialize the full window
    val p = plan("text_curation_funnel")
    assert(ops(p).exists(_.isInstanceOf[WindowGroupLimitExec]), p)
  }

  test("contamination streams the corpus against a broadcast benchmark set") {
    // the benchmark side must broadcast (it stays small at any corpus
    // scale) so the 100 TB training side never shuffles for the probe
    val p = plan("dedup_contamination_ngram")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("embedding decontamination broadcasts only limit-bounded sides") {
    // round 14 (r13 verdict #1): the holdout stand-in is a FIXED-k
    // md5-least slice, so every broadcast in this plan must sit above a
    // limit operator (TakeOrderedAndProject / GlobalLimit) — a broadcast
    // with no limit below it would be corpus-proportional, the exact
    // driver-OOM-at-100× this pin exists to prevent
    val p = plan("curation_contamination_embedding")
    val bcasts = ops(p).collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.nonEmpty, s"holdout not broadcast:\n$p")
    bcasts.foreach { b =>
      assert(ops(b).exists {
        case _: TakeOrderedAndProjectExec => true
        case _: org.apache.spark.sql.execution.GlobalLimitExec => true
        case _ => false
      }, s"corpus-proportional broadcast (no limit below it):\n$b")
    }
    // the holdout ids drop via a broadcast anti-join — the corpus side
    // never shuffles for either probe
    assert(ops(p).collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
    }.nonEmpty, s"holdout exclusion is not a broadcast anti-join:\n$p")
    // the only hash exchanges are the two aggregation stages (per-vector
    // max, then the label rollup) — no JOIN ever shuffles the corpus
    assert(hashExchanges(p).size <= 2, s"extra corpus shuffle:\n$p")
  }

  test("weighted mix budget cut is two-stage top-k, never a global sort") {
    val p = plan("mix_weighted_sources")
    assert(ops(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]), p)
    assert(rangeExchanges(p).isEmpty, p)
  }

  test("pretrain pipeline: group-limit survivor filter + broadcast anti-join, no cartesian") {
    val p = plan("pipeline_pretrain_corpus")
    assert(ops(p).exists(_.isInstanceOf[WindowGroupLimitExec]), p)
    // the decontamination flag set broadcasts; the corpus side never
    // shuffles for the anti-join probe
    assert(ops(p).collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
    }.nonEmpty, p)
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("fuzzy blocked join is a hash equi-join on the block key, no cartesian") {
    val p = plan("join_fuzzy_blocked")
    // the levenshtein verify must ride INSIDE an equi-join on the block
    // key — an unblocked fuzzy match would plan as BNLJ/cartesian
    noCartesian(p, "join_fuzzy_blocked")
    assert(ops(p).exists(o => o.isInstanceOf[BroadcastHashJoinExec] ||
      o.isInstanceOf[SortMergeJoinExec] || o.isInstanceOf[ShuffledHashJoinExec]), p)
  }

  test("near-dup prune probes the loser set as a broadcast, corpus side unshuffled") {
    val p = plan("dedup_neardup_prune")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("sequence packing windows once per source: one hash exchange, no global sort") {
    val p = plan("curation_pack_sequences")
    assert(ops(p).exists(_.isInstanceOf[WindowExec]), p)
    // source-partitioned window + reused partitioning for the rollup →
    // a single hash exchange; output order is the only range exchange
    assert(hashExchanges(p).size == 1, p)
  }

  test("rank stats share one window traversal: a single window node, one exchange") {
    val p = plan("window_rank_stats")
    assert(ops(p).count(_.isInstanceOf[WindowExec]) == 1, p)
    assert(hashExchanges(p).size == 1, p)
  }

  test("incremental batch consumes the corpus through broadcast semi-probes only") {
    val p = plan("dedup_incremental_batch")
    // every corpus-touching join must probe a broadcast batch-side set —
    // a sort-merge/shuffled-hash join here would shuffle the 100 TB side
    assert(ops(p).forall(o => !o.isInstanceOf[SortMergeJoinExec] &&
      !o.isInstanceOf[ShuffledHashJoinExec]), p)
    assert(ops(p).count(_.isInstanceOf[BroadcastHashJoinExec]) >= 3, p)
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("incremental batch broadcast guard: hint under the cap, AQE fallback above it") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def broadcastHintedJoins(capBytes: Long): Int = {
      val lp = graft.ops.DedupQueries
        .dedupIncrementalBatchGuarded(spark, sfDir, capBytes)
        .queryExecution.optimizedPlan
      lp.collect {
        case j: Join if Seq(j.hint.leftHint, j.hint.rightHint)
          .flatten.flatMap(_.strategy).nonEmpty => j
      }.size
    }
    // small-batch regime (the production default): the batch-side sets
    // carry the broadcast hint into the join
    assert(broadcastHintedJoins(Long.MaxValue) >= 3)
    // corpus-sized-batch regime: every hint is dropped — the plan falls
    // through to AQE's runtime join choice instead of forcing a
    // driver-fatal broadcast of a corpus-scale gram set
    assert(broadcastHintedJoins(0L) == 0)
    graft.ops.PipelineCache.releaseAll()
  }

  test("calendar dim joins day-level aggregates with a real broadcast, never a day-keyed fact shuffle") {
    val p = plan("time_calendar_dim")
    // the round-6 form hinted the LEFT side of a LeftOuter join — Spark
    // ignored it and shuffled the full fact table keyed by day; the fix
    // pre-aggregates facts per day and broadcasts THAT (buildable) side
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    assert(ops(p).collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }.isEmpty, p)
  }

  test("binary-hamming scan: codes fold into the projection, no hash exchange, top-k never sorts globally") {
    val p = plan("sim_binary_hamming_topk")
    // one broadcast probe + TakeOrdered: the 8-byte-code scan regime —
    // a hash exchange here would mean the embeddings themselves shuffle
    assert(hashExchanges(p).isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]), p)
    assert(rangeExchanges(p).isEmpty, p)
  }

  test("PQ/ADC: distance-table lookup joins on (m, code), codes never cartesian with data") {
    Seq("sim_product_quantization", "sim_ivf_pq_adc").foreach { q =>
      val p = plan(q)
      assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q:\n$p")
      graft.ops.PipelineCache.releaseAll()
    }
  }

  test("batch knn pairs join equi on the cell id, never cross-cell") {
    val p = plan("sim_knn_batch_ivf")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    // the pair join hashes on the cell id — the N²/nCells bound lives here
    assert(ops(p).collect {
      case j: BaseJoinExec if j.leftKeys.exists(
        _.references.exists(_.name == "cell")) => j
    }.nonEmpty, p)
    // nested-loop only inside the persisted centroid assignment (its
    // cached plan echoes per reference); never OUTSIDE the cache, where
    // the pairs form
    assert(ops(p, intoCache = false)
      .forall(!_.isInstanceOf[BroadcastNestedLoopJoinExec]), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("graph family: frontier/wedge joins are equi-joins, no cartesian") {
    Seq("graph_bfs_reach", "graph_jaccard_neighbors", "graph_degree_hist")
      .foreach { q =>
        noCartesian(plan(q), q)
        graft.ops.PipelineCache.releaseAll()
      }
  }

  test("jaccard wedge join filters middles through the degree cap path") {
    // the hub defense must be part of the REGISTERED plan (a no-op
    // filter on hub-free data, but present): the wedge base joins the
    // degree frame and carries the deg <= cap predicate
    val p = plan("graph_jaccard_neighbors")
    def filters(sp: SparkPlan): Seq[String] = ops(sp).collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.toString
    }
    assert(filters(p).exists(c => c.contains("deg") && c.contains("1024")),
      s"degree-cap filter missing from:\n$p")
    graft.ops.PipelineCache.releaseAll()
  }

  test("rolling distinct partial-aggregates the constant fan-out, no window") {
    val p = plan("window_rolling_distinct")
    assert(!ops(p).exists(_.isInstanceOf[WindowExec]), p) // explode, not a frame
    assert(partialAggs(p).exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[Count])), p)
  }

  test("partitioned layout prunes at the directory level, not the row level") {
    val p = plan("parquet_partitioned_prune")
    val pf = scans(p).flatMap(_.metadata.get("PartitionFilters"))
    assert(pf.exists(_.contains("lang")),
      s"lang predicate must be a PartitionFilter (directory prune):\n$p")
  }

  test("mode argmax folds map-side with no window") {
    val p = plan("agg_mode_per_group")
    assert(!ops(p).exists(_.isInstanceOf[WindowExec]), p) // min(struct) beats row_number
    assert(partialAggs(p).exists(_.aggregateExpressions.exists(ae =>
      ae.aggregateFunction.isInstanceOf[Min] ||
        ae.aggregateFunction.isInstanceOf[Count])), p)
  }

  test("repetition score and doc frequency partial-aggregate before each shuffle") {
    Seq("text_repetition_score", "text_doc_frequency").foreach { q =>
      val p = plan(q)
      assert(partialAggs(p).exists(_.aggregateExpressions.exists(
        _.aggregateFunction.isInstanceOf[Count])), s"$q:\n$p")
      assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q:\n$p")
    }
  }

  test("k-means assignment broadcasts the centroids, never shuffles the table for them") {
    val p = plan("sim_kmeans_step")
    assert(ops(p).exists(o => o.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      o.isInstanceOf[BroadcastExchangeExec]), p)
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("int8 quantization is a pure projection: no join, no aggregate exchange") {
    val p = plan("sim_quantize_int8")
    assert(!ops(p).exists(_.isInstanceOf[BaseJoinExec]), p)
    // only the final orderBy may exchange; no hash shuffle at all
    assert(hashExchanges(p).isEmpty, p)
  }

  test("independent-sides native as-of reuses the build aggregation's exchange") {
    val p = SparkEntry.queries("join_asof_orders_native")(spark, sfDir)
      .queryExecution.executedPlan
    assert(ops(p).exists(_.getClass.getSimpleName == "AsofJoinExec"), p)
    assert(!ops(p).exists(_.isInstanceOf[WindowExec]), p)
    // one exchange per side + the output range sort; the (r_cust, r_day)
    // agg must NOT add a third hash exchange (repartition reuse)
    assert(hashExchanges(p).size == 2, p)
  }

  test("tf-idf cosine: only equi pair joins, partial-aggregated dot products") {
    val p = plan("text_tfidf_cosine")
    noCartesian(p, "text_tfidf_cosine")
    // the pair dot-product aggregation combines map-side
    assert(partialAggs(p).nonEmpty, p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("count-min probes join the sketch grid as a broadcast, never a shuffle") {
    val p = plan("sketch_countmin_error")
    noCartesian(p, "sketch_countmin_error")
    assert(ops(p).exists(_.isInstanceOf[BroadcastExchangeExec]), p)
  }

  test("CUSUM runs on a single per-user exchange (both windows share it)") {
    val p = plan("window_cusum_drift")
    // prefix sum + running min + peak rank + count: ONE hash exchange
    assert(hashExchanges(p).size == 1, p)
  }

  test("TWAP and streaks each ride one user_id exchange") {
    for (q <- Seq("window_twap", "window_streaks")) {
      val p = plan(q)
      // distinct/windows/aggregations all cluster on user_id → the
      // subset rule collapses them onto a single hash exchange
      assert(hashExchanges(p).size == 1, s"$q:\n$p")
      noCartesian(p, q)
    }
  }

  test("survivorship: every exchange keys on user_id alone; joins are exchange-free") {
    val p = plan("etl_survivorship_merge")
    noCartesian(p, "etl_survivorship_merge")
    val hx = hashExchanges(p)
    // one exchange per derivation branch (windows, spans, mode) — and
    // none for the joins, whose sides arrive co-partitioned
    assert(hx.size <= 3, s"join added an exchange:\n$p")
    hx.foreach { e =>
      val keys = e.outputPartitioning.asInstanceOf[HashPartitioning]
        .expressions.map(_.sql.toLowerCase)
      assert(keys.forall(_.contains("user_id")), s"non-user key: $keys\n$p")
    }
  }

  test("hybrid RRF towers broadcast the probes; no tower shuffles its corpus scan") {
    val p = plan("sim_hybrid_rrf")
    // the per-tower probe joins ARE broadcast nested-loop crosses — the
    // sanctioned shape for a ≤3-row broadcast side (same as the cosine
    // probes); what must NOT appear is an unbroadcast cartesian
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    val bcasts = ops(p).collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.size >= 2, s"probes not broadcast:\n$p")
  }

  test("chunk dedup shuffles chunks on the fixed-width hash key only") {
    // the occurrence window must partition on md5(chunk) — a 32-byte key —
    // not on the raw chunk text (exchange width would grow with chunk
    // length at scale)
    val p = plan("text_chunk_dedup")
    noCartesian(p, "text_chunk_dedup")
    // the window partitions on a projected alias (_w0) whose defining
    // projection is the md5 of the chunk — assert both halves
    val winParts = ops(p).collect {
      case w: WindowExec => w.partitionSpec.map(_.toString).mkString(",")
    }.filter(_.nonEmpty)
    assert(winParts.nonEmpty, s"no window in:\n$p")
    assert(winParts.forall(k => !k.contains("chunk")),
      s"occurrence window keyed by raw chunk text:\n$p")
    val defsMd5 = ops(p).exists {
      case pr: org.apache.spark.sql.execution.ProjectExec =>
        pr.projectList.exists(e =>
          e.toString.contains("md5") && e.toString.contains("_w"))
      case _ => false
    }
    assert(defsMd5, s"window key projection is not md5(chunk):\n$p")
  }

  test("SCC reachability joins are equi-joins; LM/DSIR cross joins are 1-row broadcast globals only") {
    noCartesian(plan("graph_scc_pivot"), "graph_scc_pivot")
    graft.ops.PipelineCache.releaseAll()
    Seq("text_lm_bigram_score", "curation_dsir_weights").foreach { q =>
      val p = plan(q)
      assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q: cartesian product in:\n$p")
      // the only non-equi join allowed is the broadcast of the 1-row
      // corpus-globals aggregate (the established globals pattern)
      ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          case _ => b.left
        }
        val buildAggs = ops(build).collect {
          case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
        }
        assert(buildAggs.nonEmpty,
          s"$q: nested-loop join whose build side is not a global agg:\n$p")
      }
      graft.ops.PipelineCache.releaseAll()
    }
  }

  test("matryoshka coarse and rerank stages both plan as TakeOrdered, not sorts") {
    val p = plan("sim_matryoshka_topk")
    val takeOrdered = ops(p).collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takeOrdered.size == 2, s"expected 2 TakeOrdered stages:\n$p")
    assert(ops(p).collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      s"global sort crept in:\n$p")
  }

  test("AQE splits a skewed join partition (the non-manual skew defense engages)") {
    // r7 verdict #7: the engine ships manual salting (join_skew_salted,
    // agg_salted_twophase); this pins the OTHER half of the 100 TB skew
    // story — Spark's own OptimizeSkewedJoin must actually engage at
    // bench settings (AQE on, as in Bench/Verify sessions) when a join
    // key is hot. Thresholds are scaled to fixture bytes (the defaults
    // trigger at a 256 MB partition; the MECHANISM, a skew-split
    // sort-merge join, is byte-scale-invariant): a synthetic 90%-hot
    // key must come out the other side as an isSkewJoin SMJ, i.e. AQE
    // replaced the hot partition with parallel partial-reads.
    import org.apache.spark.sql.functions.{col, lit, when}
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4096")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "suite session must run AQE like the bench session does")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      val left = spark.range(400000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(40000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("w"))
      // keep both payload columns live through the join (a bare count
      // would prune them and the hot partition would compress away)
      val joined = left.join(right, "k")
        .groupBy().agg(org.apache.spark.sql.functions.sum(col("v") + col("w")))
      joined.collect() // AQE finalizes (and skew-optimizes) during execution
      val p = joined.queryExecution.executedPlan
      // post-execution AQE plans wrap operators in query stages, which
      // report no children — this walker (local to this test: the shared
      // ops() keeps the pre-execution main-tree scope every other pin
      // was written against) descends into materialized stage plans
      def deep(x: SparkPlan): Seq[SparkPlan] = {
        val kids = x match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        x +: kids.flatMap(deep)
      }
      val skewJoins = deep(p).collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
        case j: ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"OptimizeSkewedJoin did not engage on a 90%-hot key:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("JL distortion broadcasts the sign matrix; one exchange for the bucket rollup") {
    // the 16x64 Rademacher matrix is ONE row: it must reach the scan
    // side as a broadcast (BNLJ over a single build row is the right
    // plan), and the only hash exchange is the ~30-bucket histogram
    // rollup - the embedding table itself never shuffles
    val p = plan("sim_jl_distortion")
    assert(ops(p).exists(o => o.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      o.isInstanceOf[BroadcastExchangeExec]), p)
    assert(hashExchanges(p).size <= 1, p)
  }

  test("late-arriving dim resolves through an equi-join, no cartesian") {
    val p = plan("etl_late_arriving_dim")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[BaseJoinExec]), p)
  }

  test("clustering coefficient's wedge enumeration stays equi-join only") {
    noCartesian(plan("graph_clustering_coeff"), "graph_clustering_coeff")
  }

  test("Zipf head cap pushes a window group-limit below the rank shuffle") {
    // rank <= 1000 must prune per-group BEFORE materializing the full
    // vocabulary window - the cap is what bounds the per-lang fold state
    val p = plan("text_zipf_slope")
    assert(ops(p).exists(_.isInstanceOf[WindowGroupLimitExec]), p)
  }

  test("BPE merge step partial-aggregates the pair counts before the shuffle") {
    val p = plan("text_bpe_merge_step")
    assert(partialAggs(p).exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[Count])), p.toString)
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("Spearman's two rank windows and the moment rollup share ONE exchange") {
    // both rank windows cluster by l_returnflag and the (flag, q)/(flag, p)
    // tie windows + the final groupBy are satisfied by the same hash(flag)
    // partitioning (subset rule) - the plan must not reshuffle per window
    val p = plan("stat_spearman_corr")
    assert(hashExchanges(p).size <= 1, p)
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
  }

  test("TTR curve is a pure aggregation cascade: no joins, no windows") {
    // the (lang, doc, tok) -> (lang, doc) -> lang rollup chain reshuffles
    // on progressively coarser keys as the data shrinks - what it must
    // NOT do is join or single-partition anything
    val p = plan("text_ttr_curve")
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
    assert(ops(p).collect { case w: WindowExec => w }.isEmpty, p)
    assert(partialAggs(p).nonEmpty, p)
  }

  test("Pareto front needs no self-join: one range-frame window per language") {
    // the whole point of the operator: the skyline comes from a window,
    // never the O(n^2) all-pairs join
    val p = plan("curation_pareto_front")
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[WindowExec]), p)
  }

  test("Lorenz deciles: DistRank offset join is broadcast; no cartesian") {
    // shape re-pinned for the r10 two-phase rewrite: the one join is
    // DistRank's ≤numPartitions offsets table riding a broadcast
    val p = plan("agg_lorenz_points")
    val joins = ops(p).collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty && joins.forall(_.isInstanceOf[BroadcastHashJoinExec]), p)
    noCartesian(p, "agg_lorenz_points")
  }

  test("Palma joins the nation dim by broadcast, never cartesian") {
    val p = plan("agg_palma_ratio")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    noCartesian(p, "agg_palma_ratio")
  }

  test("Bayes shrinkage's global rate rides the broadcast 1-row pattern") {
    // the cross join against the 1-row global aggregate is the module's
    // allowed BNLJ shape; the supplier rollup is the only hash exchange
    // and the top-20 must be a TakeOrdered, not a global sort
    val p = plan("agg_bayes_shrinkage")
    assert(ops(p).collect {
      case b: BroadcastNestedLoopJoinExec => b }.size <= 1, p)
    assert(ops(p).exists(_.isInstanceOf[BroadcastExchangeExec]), p)
    assert(hashExchanges(p).size == 1, p)
    assert(ops(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]), p)
  }

  test("OLS normal equations collapse in one partial-aggregated rollup") {
    val p = plan("stat_ols_multi")
    assert(hashExchanges(p).size == 1, p)
    assert(partialAggs(p).exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[Sum])), p.toString)
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
  }

  test("ATR and Holt reshuffle only the day-granular bar frame") {
    // rollup to daily bars on (type, day) keeps event-level parallelism;
    // only the shrunken bar/series frame reshuffles to hash(type) for
    // the window/collect - two exchanges, no joins, and the second one
    // moves day-granular rows, not events
    Seq("window_atr", "time_holt_linear").foreach { q =>
      val p = plan(q)
      assert(hashExchanges(p).size <= 2, s"$q:\n$p")
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
    }
  }

  test("importance sample is one filter pass plus one rollup") {
    val p = plan("sample_importance_weighted")
    assert(hashExchanges(p).size <= 1, p)
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
    assert(ops(p).collect { case w: WindowExec => w }.isEmpty, p)
  }

  test("RA link prediction anti-joins the edge set with equi-joins only") {
    val p = plan("graph_link_prediction_ra")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, p)
    assert(ops(p).collect {
      case j: BaseJoinExec if j.joinType == LeftAnti => j }.nonEmpty, p)
  }

  test("Heaps fit joins only the two tiny checkpoint histograms") {
    // the (lang, tok) explode rollup and the doc-length rollup each
    // shuffle; the only JOIN is decile-histogram x decile-histogram
    // (<= 10 rows per lang per side) - never token-granular frames
    val p = plan("text_vocab_growth_heaps")
    noCartesian(p, "text_vocab_growth_heaps")
    assert(ops(p).collect { case j: BaseJoinExec => j }.size <= 1, p)
  }

  test("Wilcoxon joins the customer dim by broadcast before its rank windows") {
    val p = plan("stat_wilcoxon_signed_rank")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    noCartesian(p, "stat_wilcoxon_signed_rank")
  }

  test("Kendall's pair grid is built AFTER the day rollup, never on events") {
    // the theta join is a BNLJ by nature; what must hold is that both
    // of its inputs are the day-granular aggregate, i.e. every BNLJ
    // input subtree contains an aggregation below it
    val p = plan("stat_kendall_tau_daily")
    val bnljs = ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnljs.nonEmpty, p)
    bnljs.foreach { j =>
      j.children.foreach { side =>
        assert(ops(side).exists(_.isInstanceOf[BaseAggregateExec]),
          s"BNLJ side without a day rollup below it:\n$side")
      }
    }
  }

  test("rich club annotates edges once and fans out thresholds from 1-row aggs") {
    val p = plan("graph_rich_club")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    // the threshold fan-out rides the broadcast of a 1-row aggregate;
    // data-sized joins stay equi (edge-degree annotation)
    assert(ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.size <= 1, p)
  }

  test("Neyman allocation broadcasts the per-stratum table both times") {
    val p = plan("sample_stratified_neyman")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    // the cross-stratum weight total rides the allowed 1-row-global
    // BNLJ shape; the per-doc membership joins must be broadcast hash
    assert(ops(p).collect { case j: BroadcastHashJoinExec => j }.size >= 2, p)
  }

  test("ulcer index windows only the day-granular close series") {
    val p = plan("window_ulcer_index")
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
    assert(hashExchanges(p).size <= 2, p)
  }

  test("Kaufman ER and runs test stay join-free on the shared bar base") {
    Seq("window_kaufman_er", "stat_runs_test").foreach { q =>
      val p = plan(q)
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
      assert(hashExchanges(p).size <= 2, s"$q:\n$p")
    }
  }

  test("decomposition broadcasts the 7-row seasonal profile back") {
    val p = plan("time_classical_decompose")
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
    noCartesian(p, "time_classical_decompose")
  }

  test("source divergence keeps the pair grid vocabulary-capped") {
    // the data-sized side is only the (source, tok) rollup; the pair
    // self-join runs over the 100-token densified profiles
    val p = plan("text_source_divergence_chi2")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[BroadcastExchangeExec]), p)
  }

  test("modularity collapses to integer sums: no per-community collect") {
    // the label joins stay equi; the only BNLJ is the 1-row global
    // pattern joining the two collapsed aggregates
    val p = plan("graph_modularity")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.size <= 1, p)
  }

  test("readability and ADX stay join-free single-rollup plans") {
    Seq("text_readability_fk", "window_adx_di").foreach { q =>
      val p = plan(q)
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
      assert(hashExchanges(p).size <= 2, s"$q:\n$p")
    }
  }

  test("MATTR's closed form needs one lag window, no window enumeration join") {
    val p = plan("text_mattr")
    noCartesian(p, "text_mattr")
    // one equi-join: the per-lang contribution x window-count rollups
    assert(ops(p).collect { case j: BaseJoinExec => j }.size <= 1, p)
    assert(ops(p).exists(_.isInstanceOf[WindowExec]), p)
  }

  test("PPS sampling is windows plus one rollup, join-free") {
    val p = plan("sample_pps_systematic")
    assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, p)
  }

  test("degree curve joins stay on the constant-width degree frame") {
    noCartesian(plan("graph_knn_degree_curve"), "graph_knn_degree_curve")
  }

  test("RSI / stochastic / markov / best-split are join-free window plans") {
    for (q <- Seq("window_rsi", "window_stochastic_osc",
        "time_markov_transitions", "stat_best_split_gini")) {
      val p = plan(q)
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
    }
  }

  test("Croston and Donchian are join-free keyed-rollup window plans") {
    for (q <- Seq("time_croston_forecast", "window_donchian_channel")) {
      val p = plan(q)
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
    }
  }

  test("Friedman's grid joins stay on the day/type rollups, never events") {
    val p = plan("stat_friedman_test")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { j =>
      j.children.foreach { side =>
        assert(ops(side).exists(_.isInstanceOf[BaseAggregateExec]),
          s"BNLJ side without a rollup below it:\n$side")
      }
    }
  }

  test("nearest-centroid broadcasts the constant centroid table") {
    val p = plan("sim_nearest_centroid")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case j: SortMergeJoinExec => j }.isEmpty, p)
    assert(ops(p).exists(_.isInstanceOf[BroadcastHashJoinExec]), p)
  }

  test("Burrows' Delta never widens past sources x the head vocabulary") {
    val p = plan("text_burrows_delta")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    // the spine fan-out rides broadcasts of the 30-word head; the only
    // BNLJs allowed are those with an aggregate below both sides
    ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { j =>
      j.children.foreach { side =>
        assert(ops(side).exists(_.isInstanceOf[BaseAggregateExec]),
          s"BNLJ side without a rollup below it:\n$side")
      }
    }
  }

  test("local-clustering top-k rides the shared oriented-edge base") {
    noCartesian(plan("graph_local_clustering_topk"),
      "graph_local_clustering_topk")
  }

  test("the permutation test scans events once and reuses the 32-row frame") {
    val p = plan("stat_permutation_test")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    // the only BNLJ is the broadcast of the 1-row observed aggregate
    ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { j =>
      j.children.foreach { side =>
        assert(ops(side).exists(o => o.isInstanceOf[BaseAggregateExec] ||
          o.isInstanceOf[InMemoryTableScanExec]),
          s"BNLJ side without a rollup/cache below it:\n$side")
      }
    }
    // the per-permutation frame is persisted: both the main branch and
    // the broadcast observed-split branch read the SAME cached 32-row
    // frame, so events is scanned once (digest below the Generate in
    // the cached subplan — the bootstrap lesson)
    assert(ops(p, intoCache = false)
      .count(_.isInstanceOf[InMemoryTableScanExec]) == 2,
      s"expected two cache reads of the per-permutation frame:\n$p")
    assert(scans(p).map(_.relation.location.rootPaths.mkString).distinct
      .size <= 1, s"more than one distinct file relation scanned:\n$p")
  }

  test("ANOVA / Kruskal-Wallis / Cochran-Armitage collapse to rollup folds") {
    for (q <- Seq("stat_anova_f", "stat_cochran_armitage")) {
      val p = plan(q)
      assert(ops(p).collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"$q:\n$p")
      assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q:\n$p")
    }
    val kw = plan("stat_kruskal_wallis")
    assert(ops(kw).collect { case c: CartesianProductExec => c }.isEmpty, kw)
    ops(kw).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { j =>
      j.children.foreach { side =>
        assert(ops(side).exists(_.isInstanceOf[BaseAggregateExec]),
          s"BNLJ side without a rollup below it:\n$side")
      }
    }
  }

  test("Levene broadcasts the k-row median frame; SRM/capture are join-free") {
    val lv = plan("stat_levene_bf")
    noCartesian(lv, "stat_levene_bf")
    assert(ops(lv).exists(_.isInstanceOf[BroadcastHashJoinExec]), lv)
    for (q <- Seq("stat_srm_check", "stat_capture_recapture")) {
      val p = plan(q)
      assert(ops(p).collect { case j: BaseJoinExec => j }.isEmpty, s"$q:\n$p")
    }
  }

  test("MACD is a join-free rollup fold; JSD keeps the vocab-capped grid") {
    val m = plan("window_macd")
    assert(ops(m).collect { case j: BaseJoinExec => j }.isEmpty, m)
    // same discipline as the chi2 screen: the data-sized side is only
    // the (source, tok) rollup, the pair join runs over 100-token
    // densified profiles
    val j = plan("text_js_divergence")
    assert(ops(j).collect { case c: CartesianProductExec => c }.isEmpty, j)
    assert(ops(j).exists(_.isInstanceOf[BroadcastExchangeExec]), j)
  }

  test("MMR is k broadcast stages, never a pairwise similarity join") {
    val p = plan("sim_mmr_diversify")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case j: SortMergeJoinExec => j }.isEmpty, p)
    assert(ops(p).collect { case j: ShuffledHashJoinExec => j }.isEmpty, p)
  }

  test("edit-distance DP only ever joins the verified-pair frame") {
    noCartesian(plan("dedup_editdist_verify"), "dedup_editdist_verify")
  }

  test("k-center greedy is k broadcast stages, never a pairwise join") {
    // each stage crossJoins ONE broadcast center row; the pairwise
    // NxN distance matrix must never materialize
    val p = plan("sim_kcenter_greedy")
    assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty, p)
    assert(ops(p).collect { case j: SortMergeJoinExec => j }.isEmpty, p)
    assert(ops(p).collect { case j: ShuffledHashJoinExec => j }.isEmpty, p)
  }

  test("funnel joins stay keyed on user_id; KS totals ride one broadcast") {
    noCartesian(plan("agg_funnel_conversion"), "agg_funnel_conversion")
    val ks = plan("stat_ks_two_sample")
    assert(ops(ks).collect { case c: CartesianProductExec => c }.isEmpty, ks)
    // the n_a/n_b totals frame is the allowed 1-row broadcast
    assert(ops(ks).collect { case b: BroadcastNestedLoopJoinExec => b }
      .size <= 1, ks)
  }

  test("retention cohorts reuse the user_id exchange with no cartesians") {
    noCartesian(plan("agg_retention_cohorts"), "agg_retention_cohorts")
  }

  test("corpus miners keep data-sized joins equi; globals are 1-row BNLJs") {
    for (q <- Seq("text_keyword_chi2", "time_acf",
        "stat_kaplan_meier", "stat_cusum_peak", "stat_ljung_box",
        "stat_dickey_fuller", "time_holt_winters", "stat_grubbs_outlier",
        "stat_jarque_bera", "agg_rfm_segments", "stat_poisson_dispersion",
        "stat_hurst_rs", "stat_markov_entropy", "curation_psi_drift",
        "agg_abc_analysis", "stat_odds_ratio", "agg_revenue_bridge",
        "stat_durbin_watson", "agg_cohort_ltv", "stat_tost_equivalence",
        "stat_power_mde", "time_seasonal_strength",
        "stat_cpk_capability", "text_yules_k", "stat_fleiss_kappa",
        "stat_logrank_test", "stat_esd_outliers", "dedup_cdc_chunks",
        "stat_parkinson_vol")) {
      val p = plan(q)
      assert(ops(p).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q: cartesian product in:\n$p")
      ops(p).collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          case _ => b.left
        }
        // globals (1-row aggregates) or the bounded lag/day frames only
        val buildAggs = ops(build).collect {
          case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
        }
        val isBoundedLocal = ops(build).exists {
          case _: org.apache.spark.sql.execution.LocalTableScanExec => true
          case _: org.apache.spark.sql.execution.RDDScanExec => true
          case _ => false
        }
        assert(buildAggs.nonEmpty || isBoundedLocal,
          s"$q: BNLJ build side is neither a global agg nor a bounded " +
            s"local frame:\n$p")
      }
    }
  }

  // ------------------------------------------------------- r9 verdict #1:
  // no unpartitioned WindowExec over a corpus-scaling input. The rank
  // queries below used to ntile/cumsum the whole customer/part dimension
  // in ONE task; they now rank via DistRank's two-phase shape. The pin:
  // every remaining unpartitioned window must sit on a bounded rollup —
  // either the per-range-partition count table (≤ shuffle-partitions
  // rows, grouped on __pid) or the constant 10-row decile table.

  private def unpartWindows(p: SparkPlan): Seq[WindowExec] =
    ops(p).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  /** ops() plus descent into MATERIALIZED AQE query stages — the pinned
    * DistRank cache is built eagerly, so its range exchange lives inside
    * a ShuffleQueryStage of the cached plan's finalized AQE tree, which
    * the main-tree walk (calibrated before stage descent) never enters. */
  private def deepOps(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case im: InMemoryTableScanExec => im.children :+ im.relation.cachedPlan
      case other => other.children
    }
    p +: kids.flatMap(deepOps)
  }

  /** The window's input subtree reduces through an aggregate grouped
    * ONLY on the named bounded keys before the window sees it. */
  private def boundedRollupBelow(w: WindowExec, keys: Set[String]): Boolean =
    ops(w.child).exists {
      case a: BaseAggregateExec =>
        a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(g => keys.contains(g.name))
      case _ => false
    }

  for (q <- Seq("agg_rfm_segments", "agg_lorenz_points", "agg_abc_analysis")) {
    test(s"$q ranks two-phase: range shuffle + bounded prefix windows only") {
      val p = plan(q)
      // phase 1: the total-order range shuffle exists (inside the pinned
      // cache subplan's finalized stages — deepOps descends into them)
      assert(deepOps(p).exists {
        case e: ShuffleExchangeExec =>
          e.outputPartitioning.isInstanceOf[RangePartitioning]
        case _ => false
      }, s"$q: no range exchange in:\n$p")
      // phase 3: every unpartitioned window sits on the ≤numPartitions
      // __pid rollup (or lorenz's constant decile table) — never the raw
      // customer/part dimension
      val uw = unpartWindows(p)
      assert(uw.nonEmpty, s"$q: expected the bounded prefix windows in:\n$p")
      uw.foreach { w =>
        assert(boundedRollupBelow(w, Set("__pid", "decile")),
          s"$q: unpartitioned window over a non-bounded input:\n$w")
      }
    }
  }

  test("divergence-profile top-K vocab is TakeOrdered, never a global sort") {
    for (q <- Seq("text_burrows_delta", "text_source_divergence_chi2",
        "text_js_divergence")) {
      val p = plan(q)
      assert(ops(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
        s"$q: no TakeOrderedAndProject in:\n$p")
      assert(unpartWindows(p).isEmpty,
        s"$q: unpartitioned window survived the top-K rewrite:\n$p")
    }
  }
}
