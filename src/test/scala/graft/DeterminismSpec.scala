package graft

import graft.ops.PipelineCache

/** Determinism under parallelism: the engine's core claim — every
  * registered query is a pure function of its input, NOT of the
  * partition count, shuffle layout, or task schedule — checked by
  * executing representative queries at two very different
  * `spark.sql.shuffle.partitions` settings and requiring bit-identical
  * collected results. The sample deliberately spans the risk classes:
  * hash-random salting (salted two-phase agg), sketchy integer hashing
  * (minhash LSH), FP aggregation (kmeans sum form), iterative fixpoints
  * (converged PageRank), window+integer-split arithmetic (U-shaped
  * attribution), and order-insensitive checksums. */
class DeterminismSpec extends SparkTestBase {

  private val sample = Seq(
    "agg_salted_twophase",
    "dedup_minhash_lsh",
    "sim_kmeans_step",
    "graph_pagerank_converged",
    "window_attribution_ushaped",
    "etl_sync_checksums",
    // round-7 risk classes: tie-ordered rank arithmetic (U/z), serial
    // residual recursion (SCC), subspace-argmin + ordered folds (ADC),
    // engine-managed SQL recursion (UnionLoop)
    "stat_mann_whitney",
    "graph_scc_full",
    "sim_ivf_pq_adc",
    "sql_recursive_cte",
    // late round-7: one-rollup multi-statistic FP chains (readout),
    // window-moment band filters (control chart), md5-order windows +
    // broadcast min-count (balanced classes)
    "pipeline_experiment_readout",
    "window_control_chart",
    "sample_balanced_classes",
    // round-8 risk classes: key-ordered FP folds of ln terms (entropy),
    // 14-moment decimal→varchar→double chains (pairwise corr), 2-hop
    // set expansion through distinct (neighborhood cardinality)
    "agg_entropy_by_group",
    "stat_pairwise_corr",
    "graph_2hop_card")

  test("results are bit-identical at 2 vs 9 shuffle partitions") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] =
      sample.map { q =>
        // release shared persisted bases so the second pass genuinely
        // re-executes under the new partitioning instead of reusing
        // cached layouts
        PipelineCache.releaseAll()
        val rows = SparkEntry.queries(q)(spark, sfDir).collect()
          .map(_.toString).toSeq
        q -> rows
      }.toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "2")
      val at2 = runAll()
      conf.set("spark.sql.shuffle.partitions", "9")
      val at9 = runAll()
      sample.foreach { q =>
        assert(at2(q) == at9(q),
          s"$q differs across partition counts: ${at2(q).length} vs " +
            s"${at9(q).length} rows, first diff: ${
              at2(q).zip(at9(q)).find { case (a, b) => a != b }}")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", orig)
      PipelineCache.releaseAll()
    }
  }
}
