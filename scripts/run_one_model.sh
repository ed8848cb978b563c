#!/usr/bin/env bash
# One (dataset, method) experiment — the run_one_model.sh equivalent
# (reference src/run_one_model.sh, invoked per README.md:45-48 as
#   source run_one_model.sh [dataset] [method] [MLP_hidden] [Cls_hidden] [noise])
set -euo pipefail

dname=${1:-cora}
method=${2:-AllSetTransformer}
mlp_hidden=${3:-64}
cls_hidden=${4:-64}
noise=${5:-1}

python -m allset_tpu.cli \
  --dname "$dname" \
  --method "$method" \
  --MLP_hidden "$mlp_hidden" \
  --Classifier_hidden "$cls_hidden" \
  --feature_noise "$noise" \
  "${@:6}"
