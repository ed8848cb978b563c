#!/usr/bin/env python
"""Real-data readiness harness: point it at the AllSet raw archive and it
verifies every loader and (optionally) every tuned preset end to end, so
accuracy parity vs the reference (BASELINE.md's Table-2 contract,
``src/run_AllSetTransformer.sh:21-306``) can be claimed the moment the
data is available.

Stages:
  files   — per dataset, check the raw files the loaders open exist
            (layout rules of ``src/train.py:308-326``).
  load    — run the registry loader (+ cache round-trip), validate the
            format invariants, and compare node/edge counts against the
            AllSet paper's dataset table (soft check: mismatches print
            as WARN — archive revisions shift counts slightly).
  train   — (--train) run the tuned AllSetTransformer preset through the
            real Trainer. Default --epochs 2 --runs 1 is a wiring smoke;
            --epochs 500 --runs 20 reproduces the Table-2 protocol and
            appends the reference-format CSV for band comparison.

Usage:
  python scripts/verify_real_data.py --data_root /path/AllSet_all_raw_data
  python scripts/verify_real_data.py --data_root ... --train --epochs 500 --runs 20
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import traceback

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# expected raw files per dataset, relative to data_root
#   (loader path joins: data/loaders.py:34-164, registry p2raw rules)
RAW_FILES = {
    "cora": ["cocitation/cora/features.pickle", "cocitation/cora/labels.pickle",
             "cocitation/cora/hypergraph.pickle"],
    "citeseer": ["cocitation/citeseer/features.pickle",
                 "cocitation/citeseer/labels.pickle",
                 "cocitation/citeseer/hypergraph.pickle"],
    "pubmed": ["cocitation/pubmed/features.pickle",
               "cocitation/pubmed/labels.pickle",
               "cocitation/pubmed/hypergraph.pickle"],
    "coauthor_cora": ["coauthorship/cora/features.pickle",
                      "coauthorship/cora/labels.pickle",
                      "coauthorship/cora/hypergraph.pickle"],
    "coauthor_dblp": ["coauthorship/dblp/features.pickle",
                      "coauthorship/dblp/labels.pickle",
                      "coauthorship/dblp/hypergraph.pickle"],
    "zoo": ["zoo/zoo.content", "zoo/zoo.edges"],
    "20newsW100": ["20newsW100/20newsW100.content", "20newsW100/20newsW100.edges"],
    "Mushroom": ["Mushroom/Mushroom.content", "Mushroom/Mushroom.edges"],
    "NTU2012": ["NTU2012/NTU2012.content", "NTU2012/NTU2012.edges"],
    "ModelNet40": ["ModelNet40/ModelNet40.content", "ModelNet40/ModelNet40.edges"],
    "yelp": ["yelp/yelp_restaurant_latlong.csv",
             "yelp/yelp_restaurant_locations.csv",
             "yelp/yelp_restaurant_name.csv",
             "yelp/yelp_restaurant_business_stars.csv",
             "yelp/yelp_restaurant_incidence_H.csv"],
    "walmart-trips-100": ["walmart-trips/node-labels-walmart-trips.txt",
                          "walmart-trips/hyperedges-walmart-trips.txt"],
    "house-committees-100": ["house-committees/node-labels-house-committees.txt",
                             "house-committees/hyperedges-house-committees.txt"],
    "walmart-trips": ["walmart-trips/node-labels-walmart-trips.txt",
                      "walmart-trips/hyperedges-walmart-trips.txt"],
    "house-committees": ["house-committees/node-labels-house-committees.txt",
                         "house-committees/hyperedges-house-committees.txt"],
    "amazon-reviews": ["amazon-reviews/node-labels-amazon-reviews.txt",
                       "amazon-reviews/hyperedges-amazon-reviews.txt"],
}

# (num_nodes, num_hyperedges) from the AllSet paper's dataset table —
# soft expectations (WARN on mismatch)
EXPECTED_STATS = {
    "cora": (2708, 1579), "citeseer": (3312, 1079), "pubmed": (19717, 7963),
    "coauthor_cora": (2708, 1072), "coauthor_dblp": (41302, 22363),
    "zoo": (101, 43), "20newsW100": (16242, 100), "Mushroom": (8124, 298),
    "NTU2012": (2012, 2012), "ModelNet40": (12311, 12311),
    "yelp": (50758, 679302),
    "walmart-trips": (88860, 69906), "walmart-trips-100": (88860, 69906),
    "house-committees": (1290, 341), "house-committees-100": (1290, 341),
}

NOISE_DATASETS = {"walmart-trips", "walmart-trips-100", "house-committees",
                  "house-committees-100", "amazon-reviews"}


def check_files(root: str, names):
    ok = []
    for name in names:
        missing = [f for f in RAW_FILES.get(name, [])
                   if not osp.exists(osp.join(root, f))]
        if missing:
            print(f"[files] {name:24s} MISSING: {missing[0]}"
                  + (f" (+{len(missing)-1} more)" if len(missing) > 1 else ""))
        else:
            print(f"[files] {name:24s} ok")
            ok.append(name)
    return ok


def check_load(root: str, cache: str, names, noise: float):
    from allset_tpu.data.registry import load_dataset

    ok = []
    for name in names:
        fn = noise if name in NOISE_DATASETS else None
        try:
            d = load_dataset(name, root=root, cache_dir=cache, feature_noise=fn)
        except Exception:
            print(f"[load ] {name:24s} FAILED:")
            traceback.print_exc(limit=3)
            continue
        # format invariants (loaders assert the V2E layout; re-check here)
        import numpy as np

        assert d.node.min() >= 0 and d.node.max() < d.num_nodes, name
        assert d.edge.min() >= 0 and d.edge.max() < d.num_hyperedges, name
        assert d.x.shape[0] == d.num_nodes == len(d.y), name
        assert d.y.min() >= 0, f"{name}: labels not rebased"
        exp = EXPECTED_STATS.get(name)
        stats = (d.num_nodes, d.num_hyperedges)
        flag = ""
        if exp is not None and exp != stats:
            flag = f"  WARN expected N,M={exp} (paper table)"
        print(f"[load ] {name:24s} N={d.num_nodes} M={d.num_hyperedges} "
              f"F={d.x.shape[1]} C={len(np.unique(d.y))} nnz={len(d.node)}{flag}")
        ok.append(name)
    return ok


def run_presets(root: str, cache: str, names, epochs: int, runs: int,
                res_root: str = "hyperparameter_tunning"):
    from allset_tpu.cli import main as cli_main
    from allset_tpu.train.presets import ALLSET_TRANSFORMER_PRESETS

    for name in names:
        preset = ALLSET_TRANSFORMER_PRESETS.get(name)
        if preset is None:
            continue
        argv = [
            "--dname", name, "--method", "AllSetTransformer",
            "--data_root", root, "--cache_dir", cache,
            "--epochs", str(epochs), "--runs", str(runs),
            "--res_root", res_root,
        ]
        if name in NOISE_DATASETS:
            argv += ["--feature_noise", str(preset.get("feature_noise", 1.0))]
        print(f"[train] {name}: cli {' '.join(argv)}")
        try:
            cli_main(argv)
        except SystemExit:
            pass
        except Exception:
            print(f"[train] {name} FAILED:")
            traceback.print_exc(limit=3)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True,
                    help="path to AllSet_all_raw_data")
    ap.add_argument("--cache_dir", default="data/cache")
    ap.add_argument("--dnames", nargs="*", default=sorted(RAW_FILES),
                    help="subset of datasets to verify")
    ap.add_argument("--feature_noise", type=float, default=1.0)
    ap.add_argument("--train", action="store_true",
                    help="also run the tuned preset through the Trainer")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--res_root", default="hyperparameter_tunning",
                    help="where --train appends result CSVs")
    args = ap.parse_args(argv)

    present = check_files(args.data_root, args.dnames)
    loaded = check_load(args.data_root, args.cache_dir, present,
                        args.feature_noise)
    if args.train:
        run_presets(args.data_root, args.cache_dir, loaded,
                    args.epochs, args.runs, args.res_root)
    n_missing = len(args.dnames) - len(present)
    n_broken = len(present) - len(loaded)
    print(f"\nreadiness: {len(loaded)}/{len(args.dnames)} datasets load "
          f"({n_missing} missing raws, {n_broken} loader failures)")
    return 1 if n_broken else 0


if __name__ == "__main__":
    sys.exit(main())
