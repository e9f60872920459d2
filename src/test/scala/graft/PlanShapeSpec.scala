package graft

/** Plan-shape assertions (SURVEY §5.5): the physical plans that make
  * these queries scale must not silently regress. Each assertion names
  * the property that matters at 100 TB, not the incidental operator. */
class PlanShapeSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("scan_project_filter pushes the predicate and prunes columns at the scan") {
    val p = plan("scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    // projection pruned to the 4 referenced columns, not the full table
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double>"), p)
  }

  test("agg_hash_groupby partial-aggregates map-side before its single shuffle") {
    val p = plan("agg_hash_groupby")
    assert(p.contains("partial_sum"), p)
    // exactly one hash-partition exchange (plus the output range sort)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("sort_limit_topk plans as two-stage top-k, never a global sort") {
    val p = plan("sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("broadcast joins for dims, shuffle join for fact-fact") {
    assert(plan("join_inner_broadcast").contains("BroadcastHashJoin"))
    val large = plan("join_shuffle_large")
    assert(large.contains("SortMergeJoin") || large.contains("ShuffledHashJoin"), large)
  }

  test("similarity scans never shuffle the embedding side") {
    val p = plan("sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("dedup candidate joins are equi-joins on derived keys, no cartesian") {
    Seq("dedup_minhash_lsh", "dedup_prefix_jaccard", "dedup_simhash",
        "dedup_embedding_cosine", "dedup_cluster_labels",
        "dedup_shared_passage").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("bucketed co-located join reads buckets with no exchange or sort on either side") {
    val df = graft.ops.JoinQueries.joinBucketedColocated(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("SelectedBucketsCount"), p) // bucket pruning surface active
    // the ONLY hash exchange allowed is the aggregation's, above the join:
    // the join inputs are bucket-partitioned and sorted on disk
    val joinSection = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"), p)
  }

  test("batch sessionization shuffles once on user_id for both windows and the agg") {
    // lag + running-sum windows share PARTITION BY user_id, and the
    // session groupBy's (user_id, session_idx) keys are a superset of
    // user_id — at 100 TB the whole pipeline must ride ONE exchange
    // (plus the presentation range sort), never re-shuffle per window.
    val p = plan("window_sessionize_batch")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("curation funnel's survivor filter plans as a window group-limit") {
    // rank()=1 must push a per-group limit BELOW the shuffle
    // (WindowGroupLimit), not materialize the full window
    val p = plan("text_curation_funnel")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("contamination streams the corpus against a broadcast benchmark set") {
    // the benchmark side must broadcast (it stays small at any corpus
    // scale) so the 100 TB training side never shuffles for the probe
    val p = plan("dedup_contamination_ngram")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("weighted mix budget cut is two-stage top-k, never a global sort") {
    val p = plan("mix_weighted_sources")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("pretrain pipeline: group-limit survivor filter + broadcast anti-join, no cartesian") {
    val p = plan("pipeline_pretrain_corpus")
    assert(p.contains("WindowGroupLimit"), p) // dedup survivor stays a group limit
    // the decontamination flag set broadcasts; the corpus side never
    // shuffles for the anti-join probe
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("fuzzy blocked join is a hash equi-join on the block key, no cartesian") {
    val p = plan("join_fuzzy_blocked")
    // the levenshtein verify must ride INSIDE an equi-join on the block
    // key — an unblocked fuzzy match would plan as BNLJ/cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("near-dup prune probes the loser set as a broadcast, corpus side unshuffled") {
    val p = plan("dedup_neardup_prune")
    assert(p.contains("BroadcastHashJoin"), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("sequence packing windows once per source: one hash exchange, no global sort") {
    val p = plan("curation_pack_sequences")
    assert(p.contains("Window"), p)
    // source-partitioned window + reused partitioning for the rollup →
    // a single hash exchange; output order is the only range exchange
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("rank stats share one window traversal: a single window node, one exchange") {
    val p = plan("window_rank_stats")
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("incremental batch consumes the corpus through broadcast semi-probes only") {
    val p = plan("dedup_incremental_batch")
    // every corpus-touching join must probe a broadcast batch-side set —
    // a sort-merge/shuffled-hash join here would shuffle the 100 TB side
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("batch knn pairs join equi on the cell id, never cross-cell") {
    val p = plan("sim_knn_batch_ivf")
    assert(!p.contains("CartesianProduct"), p)
    // the pair join hashes on the cell id — the N²/nCells bound lives here
    assert("""(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[cell""".r
      .findFirstIn(p).isDefined, p)
    // nested-loop only inside the persisted centroid assignment (its cached
    // plan echoes per reference); never ABOVE the cache, where the pairs form
    val abovecache = p.linesIterator.takeWhile(!_.contains("InMemoryRelation"))
    assert(!abovecache.exists(_.contains("BroadcastNestedLoopJoin")), p)
    graft.ops.PipelineCache.releaseAll()
  }

  test("graph family: frontier/wedge joins are equi-joins, no cartesian") {
    Seq("graph_bfs_reach", "graph_jaccard_neighbors", "graph_degree_hist")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
        graft.ops.PipelineCache.releaseAll()
      }
  }

  test("rolling distinct partial-aggregates the constant fan-out, no window") {
    val p = plan("window_rolling_distinct")
    assert(!p.contains("Window"), p) // contribution explode, not a frame
    assert(p.contains("partial_count") || p.contains("count(distinct"), p)
  }

  test("partitioned layout prunes at the directory level, not the row level") {
    val p = plan("parquet_partitioned_prune")
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(pf.exists(_.group(1).contains("lang")),
      s"lang predicate must be a PartitionFilter (directory prune):\n$p")
  }

  test("mode argmax folds map-side with no window") {
    val p = plan("agg_mode_per_group")
    assert(!p.contains("Window"), p) // min(struct) beats row_number here
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("repetition score and doc frequency partial-aggregate before each shuffle") {
    Seq("text_repetition_score", "text_doc_frequency").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_count"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("k-means assignment broadcasts the centroids, never shuffles the table for them") {
    val p = plan("sim_kmeans_step")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("int8 quantization is a pure projection: no join, no aggregate exchange") {
    val p = plan("sim_quantize_int8")
    assert(!p.contains("Join"), p)
    // only the final orderBy may exchange; no hash shuffle at all
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("independent-sides native as-of reuses the build aggregation's exchange") {
    val p = SparkEntry.queries("join_asof_orders_native")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin "), p)
    assert(!p.contains("Window"), p)
    // one exchange per side + the output range sort; the (r_cust, r_day)
    // agg must NOT add a third hash exchange (repartition reuse)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, p)
  }
}
