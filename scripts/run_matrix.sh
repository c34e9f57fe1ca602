#!/bin/bash
# Experiment-matrix driver: paired baseline + FIT-GNN runs over the sweep
# axes, then the inference / memory / stats tools on the same configs.
# Analog of the reference's nested-loop shell drivers (run_main.sh,
# run_inference*.sh, memory.sh, dataset_info.sh, save_graphs.sh) in one
# parameterized script.
#
# Usage:  scripts/run_matrix.sh [datasets...]     (default: a small demo set)
# Env:    METHODS, SETUPS, RATIOS, LRS, BATCHES, RUNS, EPOCHS override axes;
#         DRY=1 prints the commands without running them.
set -euo pipefail
# runs from the CALLER's directory (dataset/ and results/ are cwd-relative,
# as in the reference drivers); only the import path points at the repo
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"

CLI="python -m fitgnn_tpu.cli.main"
DATASETS=("${@:-cora}")
METHODS=(${METHODS:-variation_neighborhoods})
SETUPS=(${SETUPS:-Gs_train_2_Gs_infer})
RATIOS=(${RATIOS:-0.3})
LRS=(${LRS:-0.01})
BATCHES=(${BATCHES:-128})
RUNS=${RUNS:-20}
EPOCHS=${EPOCHS:-300}

run() {
  echo "+ $*"
  [ "${DRY:-0}" = "1" ] || $CLI "$@"
}

for ds in "${DATASETS[@]}"; do
  for method in "${METHODS[@]}"; do
    for setup in "${SETUPS[@]}"; do
      for ratio in "${RATIOS[@]}"; do
        for lr in "${LRS[@]}"; do
          for bs in "${BATCHES[@]}"; do
            tag="${ds}_${setup}_${ratio}_${method}_${lr}_${bs}"
            # paired acceptance protocol (SURVEY §4.1): baseline first,
            # then FIT-GNN with the halo, identical metric columns
            run train --dataset "$ds" --experiment random --runs "$RUNS" \
                --lr "$lr" --batch_size "$bs" --epochs1 "$EPOCHS" \
                --normalize_features --output_dir "${tag}_baseline" \
                --baseline
            run train --dataset "$ds" --experiment random --runs "$RUNS" \
                --lr "$lr" --batch_size "$bs" --epochs1 "$EPOCHS" \
                --epochs2 "$EPOCHS" --exp_setup "$setup" --extra_node \
                --coarsening_method "$method" --coarsening_ratio "$ratio" \
                --normalize_features --output_dir "$tag" --train_fitgnn
            # latency benchmarks reuse the checkpoints train just wrote
            run infer --dataset "$ds" --experiment random \
                --exp_setup "$setup" --coarsening_method "$method" \
                --coarsening_ratio "$ratio" --output_dir "$tag"
            run infer-baseline --dataset "$ds" --experiment random \
                --output_dir "${tag}_baseline"
          done
        done
      done
      run memory --dataset "$ds" --coarsening_method "$method" --extra_node
    done
  done
  run stats --dataset "$ds"
  run save-graphs --dataset "$ds"
done
