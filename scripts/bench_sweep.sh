#!/bin/bash
# Sequential bench.py sweep on the real chip (each config is a fresh
# process; remote compiles make each run take minutes).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/bench_sweep}
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout 1500 python bench.py >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? $(cat "$OUT/$name.json")"
  tail -3 "$OUT/$name.err"
}
run t48_f32        FITGNN_BENCH_THRESHOLD=48
run t48_bf16       FITGNN_BENCH_THRESHOLD=48 FITGNN_BENCH_DTYPE=bfloat16
run t48_bf16_nodrop FITGNN_BENCH_THRESHOLD=48 FITGNN_BENCH_DTYPE=bfloat16 FITGNN_BENCH_DROPOUT=0.0
run t48_bf16_rbg   FITGNN_BENCH_THRESHOLD=48 FITGNN_BENCH_DTYPE=bfloat16 FITGNN_BENCH_PRNG=rbg
echo "sweep done"
