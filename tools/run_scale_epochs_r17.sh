#!/bin/bash
# r17 scale epochs (r16 verdict item 1 + the optimization round's
# re-measure): same-session full-registry sf1 and sf10 epochs (ITERS=2,
# no slow-tail re-runs — the protocol every bench_rN_sf{1,10} baseline
# uses) plus the sf100 top rung over the gate subset at ITERS=1
# (full-registry ITERS=2 at sf100 is ~8+ h — wall-clock forbids it; the
# omission and the subset rule are logged in SCALE.md). Subset = every
# query above ~7x in tools/scale_ratio_r16.md + the ML and stream
# families + the CC/pipeline borderliners + q_source_overlap_sketch +
# q_knn_eval as the fixed-panel regression canary.
set -u
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SUBSET="q_source_overlap,q_source_overlap_sketch,q_stream_hopping,q_split_leakage,q_window_analytic,q_repetition,q_dedup_clusters,q_fingerprint_dedup,q_rolling_fp,q_stream_join,q_incremental_dedup,q_decontaminate,q_video_features,q_wordpiece,q_neardup_survivor,q_rf_congestion,q_rf_delay,q_gbt_congestion,q_model_select,q_quality_classifier,q_stream_sessionize,q_stream_join_outer,q_stream_dedup,q_stream_enrich,q_stream_fbsink,q_stream_windowed,q_llm_pipeline,q_minhash_det_transitive,q_knn_eval"

run_epoch() {
  local sfdir=$1 out=$2 xmx=$3 iters=$4 queries=$5
  local qenv=()
  if [ -n "$queries" ]; then qenv=(SPARK_GRAFT_BENCH_QUERIES="$queries"); fi
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_ITERS="$iters" \
    SPARK_GRAFT_BENCH_SLOW_ITERS=0 SPARK_GRAFT_CPUS=32 "${qenv[@]}" \
    java -Xmx100g $OPENS \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "$out.stdout" 2> "$out.stderr"
  # pinned baseline = the FULL record (per-query medians + load traces),
  # same as every bench_rN_* baseline; the compact line stays in .stdout
  cp target/bench_full.json "$out"
}

echo "[epochs] sf1 start $(date +%T)"
run_epoch target/sf1 tools/bench_baselines/bench_r17_sf1.json 64g 2 ""
echo "[epochs] sf1 done; sf10 start $(date +%T)"
run_epoch target/sf10 tools/bench_baselines/bench_r17_sf10.json 100g 2 ""
echo "[epochs] sf10 done; sf100 subset start $(date +%T)"
run_epoch target/sf100 tools/bench_baselines/bench_r17_sf100_subset.json 100g 1 "$SUBSET"
echo "[epochs] sf100 done $(date +%T)"
