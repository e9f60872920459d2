#!/bin/bash
# r9 verdict #5 (+ r11 extension): sf10 spot-check of the scale-sensitive
# families at the deterministic sf10 corpus (ScaleUp x100 of sf0.1,
# /root/repo/tmp/sf10). Two query lists:
#   QL_CORE — candidate-generating dedup (minhash/PPJoin/simhash/cosine),
#             iterative graph (CC/SCC/pagerank/LPA/BFS), ANN, session
#             windows (the r9/r10 list).
#   QL_EXT  — the round-11 heavy-tail extension: the DistRank family,
#             end-to-end pipelines, curation, fuzzy/star joins, tf-idf,
#             dq-profile, heavy dsq/stat/time queries.
# Timings via Bench (2 sweeps, compile-warmed against the sf0.001
# fixture — SPARK_GRAFT_COMPILE_DIR — so sweep-1 numbers are steady, not
# compile-cold) and answers via Verify + sf1check.py with a per-oracle
# budget. Usage: tools/sf10check.sh [budget_s=1800] [core|ext|all]
set -e
cd /root/repo
mkdir -p tmp
BUDGET=${1:-1800}
SCOPE=${2:-all}
SF10=/root/repo/tmp/sf10
OUT=/root/repo/tmp/vout_sf10
QL_CORE="dedup_minhash_lsh,dedup_prefix_jaccard,dedup_simhash,dedup_embedding_cosine,dedup_semantic_cells,dedup_shingle_containment,dedup_shared_passage,dedup_exact_text,dedup_cdc_chunks,dedup_incremental_batch,dedup_cluster_converged,graph_scc_full,graph_scc_pivot,graph_condensation_dag,graph_pagerank_converged,graph_bfs_converged,graph_lpa_converged,graph_label_propagation,sim_cosine_topk,sim_ivf_coarse_topk,sim_knn_batch_ivf,sim_lsh_bucket_topk,time_session_window_native,time_bucket_tumbling"
QL_EXT="agg_rfm_segments,agg_abc_analysis,agg_lorenz_points,stat_conformal_interval,pipeline_curation_v2,pipeline_pretrain_corpus,curation_dsir_weights,curation_contamination_embedding,join_fuzzy_blocked,join_star_multiway,text_tfidf_cosine,text_lm_bigram_score,etl_dq_profile,dsq_basket_lift,dsq_dominant_supplier,stat_bootstrap_ci,stat_esd_outliers,agg_ipf_raking,sample_two_stage_cluster,time_croston_forecast,window_vwap"
case $SCOPE in
  core) QL=$QL_CORE ;;
  ext)  QL=$QL_EXT ;;
  all)  QL="$QL_CORE,$QL_EXT" ;;
  *) echo "unknown scope $SCOPE (core|ext|all)" >&2; exit 2 ;;
esac

echo "== sf10 bench (timings, scope=$SCOPE) =="
# Compile-warm fixture: overridable, and fail LOUDLY when absent — a
# silent skip would publish compile-cold sweep-1 numbers as steady
# (r11 advice: the old hardcoded path's skip note was stripped by the
# '"total"' grep below, so nobody would have seen it happen).
COMPILE_DIR=${SPARK_GRAFT_COMPILE_DIR:-/root/testdata/sf0.001}
test -d "$COMPILE_DIR" || {
  echo "compile fixture $COMPILE_DIR missing — refusing a compile-cold sfN bench" >&2
  exit 1
}
# Local dir ON DISK for sfN runs (r10 post-mortem: the tmpfs default
# filled under heavy shuffle accumulation and failed 12 passing queries)
mkdir -p tmp/bench-local
SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY=$QL \
  SPARK_GRAFT_LOCAL_DIR=/root/repo/tmp/bench-local \
  SPARK_GRAFT_COMPILE_DIR=$COMPILE_DIR \
  SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_BUDGET_SEC=2400 \
  tools/runjava.sh graft.Bench 2>/dev/null | grep '"total"' | tail -1 \
  | tee tmp/sf10_bench.json
# fail loudly if the bench emitted no total line (an empty artifact
# otherwise reads as a clean run)
test -s tmp/sf10_bench.json || { echo "sf10 bench produced no total line" >&2; exit 1; }

echo "== sf10 verify (answers) =="
rm -rf $OUT
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_VERIFY_ONLY=$QL \
  tools/runjava.sh graft.Verify $SF10 $OUT 2>&1 | grep -i "failed" || true
python3 tools/sf1check.py $OUT $SF10 $BUDGET 2>&1 | grep -E "PASS|FAIL|SKIP|==" \
  | tee tmp/sf10_answers.txt
