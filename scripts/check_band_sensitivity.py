"""Validate the accuracy bands actually catch numerics bugs (r4 VERDICT #4).

Injects a deliberate wrong-norm bug into each banded config (the class of
silent numerics regressions the bands exist to catch: a wrong norm
option / degree exponent) and replays the FAST 5-run protocol of
tests/test_bands.py. The net works iff at least two rows land OUTSIDE
their recorded tolerance.

Run (TPU): python scripts/check_band_sensitivity.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from record_bands import run_config

FAST_RUNS = 5

# method -> the injected "bug" (a wrong norm flavor, reference-plausible)
BUGS = {
    "AllSetTransformer": dict(normtype="deg_half_sym"),
    "AllDeepSets": dict(normtype="deg_half_sym"),
    "HCHA": dict(hcha_symdegnorm=True),
    "HNHN": dict(hnhn_alpha=0.0, hnhn_beta=0.0),
}


def main():
    bands = json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BANDS.json")))
    tripped = 0
    for method, bug in BUGS.items():
        band = bands[f"synthetic-mid/{method}"]
        overrides = dict(band["overrides"], **bug)
        rec = run_config(band["dataset"], band["method"], overrides,
                         FAST_RUNS, band["epochs"], seed=band["seed"])
        std = band["final_test_std"]
        tol = max(2.0 * std * np.sqrt(1 / FAST_RUNS + 1 / band["runs"]) + std,
                  1.0)
        delta = rec["final_test_mean"] - band["final_test_mean"]
        out = abs(delta) > tol
        tripped += out
        print(f"{method:18s} bug={bug}  mean {rec['final_test_mean']:.2f} "
              f"vs band {band['final_test_mean']:.2f} ± {tol:.2f}  "
              f"delta {delta:+.2f}  -> {'TRIPPED' if out else 'inside'}",
              flush=True)
    print(f"{tripped}/4 bands tripped (need >= 2)")
    sys.exit(0 if tripped >= 2 else 1)


if __name__ == "__main__":
    main()
