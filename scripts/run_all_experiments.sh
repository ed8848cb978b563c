#!/usr/bin/env bash
# Full Table-2 hyperparameter sweep (reference src/run_all_experiments.sh:20-39):
# MLP_hidden in {64,128,256,512} x Classifier_hidden in {64,128,256}
# over all datasets x methods.
set -euo pipefail

DATASETS=(${DATASETS:-cora citeseer pubmed coauthor_cora coauthor_dblp zoo
          20newsW100 Mushroom NTU2012 ModelNet40 yelp
          house-committees-100 walmart-trips-100})
METHODS=(${METHODS:-AllSetTransformer AllDeepSets CEGCN CEGAT HGNN HCHA HNHN
         HyperGCN UniGCNII MLP})

for d in "${DATASETS[@]}"; do
  for m in "${METHODS[@]}"; do
    for mlp in 64 128 256 512; do
      for cls in 64 128 256; do
        python -m allset_tpu.cli --dname "$d" --method "$m" \
          --MLP_hidden "$mlp" --Classifier_hidden "$cls" "$@"
      done
    done
  done
done
