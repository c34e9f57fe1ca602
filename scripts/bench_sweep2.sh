#!/bin/bash
# Round-2 component ablations at the current best config (t=48, bf16, rbg).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export FITGNN_BENCH_THRESHOLD=48 FITGNN_BENCH_DTYPE=bfloat16 FITGNN_BENCH_PRNG=rbg
OUT=${1:-/tmp/bench_sweep2}
mkdir -p "$OUT"
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout 1500 python bench.py >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? $(cat "$OUT/$name.json")"
  tail -3 "$OUT/$name.err"
}
run control
run no_coo  FITGNN_BENCH_ABLATE=no_coo
run no_spmm FITGNN_BENCH_ABLATE=no_spmm
echo "sweep2 done"
