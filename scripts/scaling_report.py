"""Analytic multi-chip scaling report (VERDICT r4 #5; r5: honest
replicated-compute term + the fused sharded-epilogue comm model).

Hardware here is ONE v5e chip, so the >=80% scaling contract
(BASELINE.md north star) cannot be measured; this report evaluates it
ON PAPER from quantities that ARE measured or structurally proven:

  * comm bytes/step per model from ``sharded_comm_stats`` on the actual
    bench-scale exchange — the same accounting the compiled-HLO
    collective census enforces structurally (tests/test_parallel.py +
    tests/test_sharded_epilogue.py). Flagship rows use the r5 fused
    sharded-epilogue path: fwd all-gathers move the NARROW [*, HC]
    epilogue output (self-loop blocks included), bwd adds the param-grad
    psums and E2V's d_sl all-gather;
  * measured single-chip step times (BENCH_r05 / BENCH_ZOO r4 /
    BENCH_MODES_r05);
  * a measured SHARDED/REPLICATED split of each step. Under the
    edge-partitioned design the sparse exchange (gathers + reduces) and
    — since r5 — the PMA epilogue divide by D; the packed-score GEMM
    chain, softmax narrows, classifier, and optimizer run REPLICATED
    (pinned: GSPMD resharding them measured/modeled as a wash at ICI
    bandwidth — see "doors" below). Earlier revisions of this report
    assumed ALL compute divides by D, which overstated efficiency ~3x
    at bench scale; the split below is taken from the per-phase
    roofline (BENCH_ROOFLINE.json) and the UniGCNII trace
    (BENCH_UNIGCNII_r05.json), or is flagged "estimate" where only
    bound arithmetic exists (HCHA).
  * the public v5e ICI spec: 1600 Gbit/s per chip (~200 GB/s aggregate,
    2D torus). Ring costs per chip for payload B over D chips:
    all-gather B*(D-1)/D, all-reduce 2*B*(D-1)/D.

Model:  eff(D) = t1 / (D * (t_shard/D + t_repl + t_comm(D))),
non-overlapped comm (pessimistic). Writes SCALING.json.

Run (CPU, no TPU needed):  python scripts/scaling_report.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

ICI_GBPS = 200.0e9  # bytes/s aggregate per chip (v5e: 1600 Gbit/s)
D = 8  # chips evaluated (one v5e host / ICI domain)


def t_allreduce(nbytes: float, d: int) -> float:
    return 2.0 * nbytes * (d - 1) / d / ICI_GBPS


def t_allgather(nbytes: float, d: int) -> float:
    return nbytes * (d - 1) / d / ICI_GBPS


def main():
    from allset_tpu.data.synthetic import scale_free_hypergraph
    from allset_tpu.graph import add_self_loops, norm_construction
    from allset_tpu.graph.batch import Batch
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange, sharded_comm_stats

    mesh = make_mesh(D)

    # ---- flagship graph (bench.py shapes) -------------------------------
    hd = scale_free_hypergraph(
        num_nodes=1 << 17, num_hyperedges=1 << 16, avg_edge_size=12,
        feature_dim=256, seed=0,
    )
    hd_sl = norm_construction(add_self_loops(hd), "all_one")
    b_fl = Batch.from_hyperdata(hd_sl, bucket=1024)
    shex_fl = ShardedExchange.build(b_fl.inc, mesh)
    shex_fl_unsplit = ShardedExchange.build(b_fl.inc, mesh, split=False)

    # ---- zoo graph (zoo_bench shapes; UniGCNII has no self-loops) -------
    hd_z = norm_construction(hd, "all_one")
    b_z = Batch.from_hyperdata(hd_z, bucket=1024)
    shex_z = ShardedExchange.build(b_z.inc, mesh)

    nnz_fl = b_fl.inc.nnz
    nnz_z = b_z.inc.nnz

    # measured single-chip rates (incidence edges/s, fwd+bwd+update) and
    # sharded-fraction evidence:
    #   AllSetTransformer: BENCH_ROOFLINE.json phase table — sharded =
    #     pallas reduces 6.94 + nnz gathers 5.57 + (r5) fused epilogue
    #     3.06 of the 25.14 ms step; the rest (wide-stream GEMM chain,
    #     narrow softmax chain, classifier/Adam, launch) is replicated.
    #   LearnMask: BENCH_MODES_r05.json 19.19M e/s; unsplit exchange —
    #     same phase structure plus the SDDMM dnorm passes (sharded).
    #   UniGCNII: BENCH_UNIGCNII_r05.json trace — 23.04/26.45 ms is the
    #     sparse exchange (sharded), dense_rest 3.41 ms replicated.
    #   HCHA: BENCH_HCHA_TRACE_r05.json (measured r5) — sharded =
    #     reduces 10.14 + gathers 5.78 = 15.91 ms; replicated = narrow
    #     chain + wide stream + misc = 7.43 ms (conservative: narrow
    #     ops on nnz-shaped arrays would shard too).
    # ``widths``: exchange table width of each V2E+E2V pass. ``epi``:
    # fused sharded-epilogue output width (flagship PMA only).
    measured = {
        "AllSetTransformer": dict(
            rate=23.16e6, nnz=nnz_fl, widths=[384], shex=shex_fl,
            lm=False, epi=256, shard_ms=15.57, repl_ms=9.57,
            split_src="BENCH_ROOFLINE.json (measured phases)"),
        "AllSetTransformer+LearnMask": dict(
            rate=19.19e6, nnz=nnz_fl, widths=[384], shex=shex_fl_unsplit,
            lm=True, epi=256, shard_ms=18.9, repl_ms=11.4,
            split_src="BENCH_ROOFLINE phases + SDDMM passes scaled to "
                      "the 30.3 ms LearnMask step (estimate)"),
        "HCHA": dict(
            rate=25.65e6, nnz=nnz_fl, widths=[256, 128], shex=shex_fl,
            lm=False, epi=None, shard_ms=15.91, repl_ms=7.43,
            split_src="BENCH_HCHA_TRACE_r05.json (measured trace)"),
        "UniGCNII": dict(
            rate=17.05e6, nnz=nnz_z, widths=[256, 256], shex=shex_z,
            lm=False, epi=None, shard_ms=23.04, repl_ms=3.41,
            split_src="BENCH_UNIGCNII_r05.json (measured trace)"),
    }

    out = {"ici_bytes_per_s": ICI_GBPS, "chips": D,
           "model": "eff(D) = t1 / (D * (t_shard/D + t_repl + t_comm)); "
                    "non-overlapped ring collectives (pessimistic)",
           "models": {}}
    print(f"analytic scaling at D={D} chips, ICI {ICI_GBPS/1e9:.0f} GB/s "
          f"(ring collectives, non-overlapped, replicated-compute term "
          f"included — r5 honest model)\n")
    for name, m in measured.items():
        fwd_bytes, bwd_bytes, bwd_ag_bytes, n_re, n_ps = 0, 0, 0, 0, 0
        for i, w in enumerate(m["widths"]):
            # the fused epilogue applies to every PMA pass (flagship);
            # zoo convs pass epi=None
            stats = sharded_comm_stats(
                m["shex"], w, itemsize=2, learn_mask=m["lm"],
                epilogue_hc=m["epi"],
            )
            fwd_bytes += stats["fwd_bytes"]
            bwd_bytes += stats["bwd_bytes"]
            bwd_ag_bytes += stats["bwd_ag_bytes"]
            n_re += stats["reassembly_fwd"]
            n_ps += stats["psums_bwd"]
        comm_bytes = fwd_bytes + bwd_bytes + bwd_ag_bytes
        t1 = m["nnz"] / m["rate"]
        t_shard = m["shard_ms"] * 1e-3
        t_repl = m["repl_ms"] * 1e-3
        # normalize the split to the implied step time so the fractions,
        # not the absolute phase sums, carry the information
        scale = t1 / (t_shard + t_repl)
        t_shard, t_repl = t_shard * scale, t_repl * scale

        def eff_at(d):
            tc = (t_allgather(fwd_bytes + bwd_ag_bytes, d)
                  + t_allreduce(bwd_bytes, d))
            return t1 / (d * (t_shard / d + t_repl + tc)), tc

        eff, tc = eff_at(D)
        row = {
            "single_chip_step_s": round(t1, 6),
            "sharded_fraction": round(t_shard / t1, 4),
            "sharded_split_source": m["split_src"],
            "comm_bytes_per_step": int(comm_bytes),
            "collectives_per_step": {
                "allgather_fwd": n_re,
                "psum_bwd": n_ps,
                "dsl_allgather_bwd": int(bwd_ag_bytes > 0) * 2,
            },
            "t_comm_s": round(tc, 6),
            "step_s_at_8": round(t_shard / D + t_repl + tc, 6),
            "efficiency_at": {
                str(d): round(eff_at(d)[0], 4) for d in (2, 4, 8)
            },
            "efficiency_at_8": round(eff, 4),
            "meets_80pct": bool(eff >= 0.80),
        }
        out["models"][name] = row
        e2, e4 = row["efficiency_at"]["2"], row["efficiency_at"]["4"]
        print(f"{name:28s} t1={t1*1e3:6.2f} ms  sharded="
              f"{t_shard/t1*100:3.0f}%  comm={comm_bytes/1e6:6.1f} MB -> "
              f"t_comm={tc*1e3:5.2f} ms  "
              f"eff@2/4/8={e2*100:.0f}/{e4*100:.0f}/{eff*100:.0f}%")

    out["notes"] = {
        "honesty": "Earlier revisions assumed ALL compute divides by D "
            "(eff@8 ~61% flagship); the replicated dense phase makes the "
            "honest figure lower. The r5 fused sharded epilogue moved "
            "3.06 ms/step (epilogue fwd+bwd) from the replicated to the "
            "sharded side AND narrowed the fwd all-gathers 384->256 "
            "cols, the largest single lever available without sharding "
            "the GEMM chain.",
        "doors": "Sharding the packed-score GEMM chain (the remaining "
            "~5 ms replicated) costs one [rows, 384] all-gather per "
            "direction fwd + one [rows, 256] cotangent all-gather bwd: "
            "at bench nnz the added wire time (~4.4 ms/step at D=8) "
            "cancels the saved compute (~4.3 ms) — a WASH at 200 GB/s "
            "ICI, so it is pinned replicated (nn/modules.py). It wins "
            "when per-row compute grows (wider hidden, deeper rFF) or "
            "on faster interconnects; revisit there.",
        "epilogue_gain": "Flagship predicted step at D=8 under the same "
            "honest model: 16.2 ms with the replicated epilogue "
            "(t_shard 12.51, t_repl 12.63 incl. the 3.06 ms epilogue, "
            "comm 1.97) vs 14.0 ms with the fused sharded epilogue — "
            "a predicted 15% multi-chip speedup (eff@8 19.4% -> 22.4%) "
            "for one extra ~0.5 MB psum per direction.",
        "contract": "The >=80% contract at D=8 is met by NO model at "
            "bench-scale density under the honest model — the binding "
            "constraint is the replicated dense fraction (Amdahl), not "
            "comm. At eff@2 the flagship reaches ~67%: the design "
            "scales usefully to small meshes today; large-mesh "
            "efficiency requires sharding the dense chain, which this "
            "ICI generation does not reward (see doors).",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
