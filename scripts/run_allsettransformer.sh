#!/usr/bin/env bash
# Tuned AllSetTransformer reproduction over all Table-2 datasets
# (reference src/run_AllSetTransformer.sh; tuned values live in
# allset_tpu/train/presets.py and are applied via --preset).
set -euo pipefail

DATASETS=(cora citeseer pubmed coauthor_cora coauthor_dblp zoo 20newsW100
          Mushroom NTU2012 ModelNet40 yelp)

for d in "${DATASETS[@]}"; do
  python -m allset_tpu.cli --dname "$d" --method AllSetTransformer --preset "$@"
done

for noise in 1 0.6; do
  for d in house-committees-100 walmart-trips-100; do
    python -m allset_tpu.cli --dname "$d" --method AllSetTransformer \
      --preset --feature_noise "$noise" "$@"
  done
done
