#!/bin/bash
# r9 verdict #5: sf10 spot-check of the scale-sensitive families —
# candidate-generating dedup (minhash/PPJoin/simhash/cosine), iterative
# graph (CC/SCC/pagerank/LPA/BFS), ANN, and session windows — at the
# deterministic sf10 corpus (ScaleUp x100 of sf0.1, /root/repo/tmp/sf10).
# Timings via Bench (2 sweeps) and answers via Verify + sf1check.py with
# a per-oracle budget. Usage: tools/sf10check.sh [budget_s=1800]
set -e
cd /root/repo
mkdir -p tmp
BUDGET=${1:-1800}
SF10=/root/repo/tmp/sf10
OUT=/root/repo/tmp/vout_sf10
QL="dedup_minhash_lsh,dedup_prefix_jaccard,dedup_simhash,dedup_embedding_cosine,dedup_semantic_cells,dedup_shingle_containment,dedup_shared_passage,dedup_exact_text,dedup_cdc_chunks,dedup_incremental_batch,dedup_cluster_converged,graph_scc_full,graph_scc_pivot,graph_condensation_dag,graph_pagerank_converged,graph_bfs_converged,graph_lpa_converged,graph_label_propagation,sim_cosine_topk,sim_ivf_coarse_topk,sim_knn_batch_ivf,sim_lsh_bucket_topk,time_session_window_native,time_bucket_tumbling"

echo "== sf10 bench (timings) =="
# Local dir ON DISK for sfN runs (r10 post-mortem: the tmpfs default
# filled under heavy shuffle accumulation and failed 12 passing queries)
mkdir -p tmp/bench-local
SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY=$QL \
  SPARK_GRAFT_LOCAL_DIR=/root/repo/tmp/bench-local \
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
