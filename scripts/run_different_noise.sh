#!/usr/bin/env bash
# Feature-noise sweep on the synthetic-feature datasets
# (reference src/run_different_noise.sh:13-27; grid {0,0.2,0.4,0.6,0.8,1}).
set -euo pipefail

dname=${1:-walmart-trips-100}
method=${2:-AllSetTransformer}

for noise in 0 0.2 0.4 0.6 0.8 1; do
  python -m allset_tpu.cli --dname "$dname" --method "$method" \
    --feature_noise "$noise" "${@:3}"
done
