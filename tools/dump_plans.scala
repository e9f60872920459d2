val d = "/root/testdata/sf0.001"
spark.conf.set("spark.sql.shuffle.partitions", "8")
val qs = Seq(
  "join_star_multiway", "agg_hash_groupby", "dedup_minhash_lsh",
  "sim_hybrid_rrf", "sim_matryoshka_topk", "window_attribution_ushaped",
  "pipeline_feature_store", "pipeline_rag_index",
  "graph_hierarchy_flatten", "join_asof_orders_native",
  "text_chunk_dedup", "curation_dsir_weights", "time_autocorr",
  "sim_ivf_pq_adc", "text_feature_hashing", "sql_recursive_cte",
  "stat_mann_whitney", "curation_contamination_embedding",
  "etl_compaction_plan",
  // round 8
  "stat_pairwise_corr", "sim_silhouette", "dedup_minhash_band_stats",
  "time_seasonal_index", "agg_entropy_by_group", "graph_2hop_card",
  // round-8 final-session waves
  "dedup_cdc_chunks", "sim_ndcg_quantized", "stat_esd_outliers",
  "agg_funnel_conversion", "stat_kaplan_meier", "agg_rfm_segments",
  // round 9
  "graph_2hop_card_sketch", "stat_mantel_haenszel", "agg_theil_decomp",
  "stat_bh_fdr", "avro_roundtrip_agg")
val sb = new StringBuilder
sb.append("# Flagship physical plans (sf0.001, shuffle.partitions=8)\n\n")
sb.append("Regenerate: `spark-shell --driver-class-path target/scala-2.13/classes -i tools/dump_plans.scala`.\n")
sb.append("AQE shown pre-finalization (`isFinalPlan=false`); the shapes below are\nwhat EnsureRequirements produced -- exchanges, join strategies, pushed\nfilters, and codegen spans are the review surface.\n")
for (q <- qs) {
  sb.append(s"\n## $q\n\n```\n")
  val df = graft.SparkEntry.queries(q)(spark, d)
  sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
  sb.append("```\n")
  graft.ops.PipelineCache.releaseAll()
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
System.exit(0)
