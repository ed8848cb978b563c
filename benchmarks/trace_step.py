"""Trace the bench training step and print per-op time, grouped."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import jax
import jax.numpy as jnp
import numpy as np


def _build_zoo(which: str):
    """TRACE_MODEL=HCHA|HNHN|UniGCNII traces a zoo model instead of the
    flagship (same graph as benchmarks/zoo_bench.py)."""
    from allset_tpu.data.synthetic import scale_free_hypergraph
    from allset_tpu.graph import add_self_loops, norm_construction
    from allset_tpu.graph.batch import Batch
    from allset_tpu.graph.transforms import generate_norm_hnhn, unignn_degrees

    hd = scale_free_hypergraph(
        num_nodes=1 << 17, num_hyperedges=1 << 16, avg_edge_size=12,
        feature_dim=256, seed=0,
    )
    kw = dict(num_features=256, num_classes=8, all_num_layers=2,
              mlp_hidden=256, dtype="bfloat16")
    if which == "HCHA":
        from allset_tpu.models.hcha import HCHA, HCHAConfig

        hd = norm_construction(add_self_loops(hd), "all_one")
        return HCHA(HCHAConfig(**kw)), Batch.from_hyperdata(hd, bucket=1024)
    if which == "HNHN":
        from allset_tpu.models.hnhn import HNHN, HNHNConfig

        hd = norm_construction(add_self_loops(hd), "all_one")
        hd = generate_norm_hnhn(hd, alpha=-1.5, beta=-0.5)
        return HNHN(HNHNConfig(**kw)), Batch.from_hyperdata(hd, bucket=1024)
    from allset_tpu.models.unignn import UniGCNII, UniGCNIIConfig

    hd = norm_construction(hd, "all_one")
    degV, degE = unignn_degrees(hd)
    hd.extras = dict(hd.extras, degV=degV, degE=degE)
    return UniGCNII(UniGCNIIConfig(**kw)), Batch.from_hyperdata(hd, bucket=1024)


def main():
    import bench
    import optax
    from allset_tpu.train.trainer import masked_nll, torch_adam

    which = os.environ.get("TRACE_MODEL", "")
    if which:
        model, batch = _build_zoo(which)
    else:
        model, batch = bench.build(
            int(os.environ.get("BENCH_NODES", 1 << 17)),
            int(os.environ.get("BENCH_EDGES", 1 << 16)),
            12, 256, 8,
        )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    params = variables["params"]
    tx = torch_adam(1e-3, 0.0)
    opt_state = tx.init(params)
    train_mask = jnp.arange(batch.num_nodes) % 2 == 0

    def one_step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            logits = model.apply({"params": p}, batch, False)
            return masked_nll(logits, batch.y, train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=8
        )
        return params, opt_state, losses[-1]

    p, o, loss = run_chunk(params, opt_state)
    float(np.asarray(jax.device_get(loss)))

    tmpdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tmpdir}")
    jax.profiler.start_trace(tmpdir)
    p, o, loss = run_chunk(params, opt_state)
    float(np.asarray(jax.device_get(loss)))
    jax.profiler.stop_trace()

    files = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)
    if not files:
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read()
    )
    import re

    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = [(ev.name, ev.duration_ns) for ev in line.events]
            agg = {}
            for name, dur in evs:
                if name.startswith("%while"):
                    continue
                agg[name] = agg.get(name, 0) + dur
            total = sum(agg.values())
            print(f"XLA Ops exclusive-ish total: {total/1e6/8:.2f} ms/step")
            items = sorted(agg.items(), key=lambda kv: -kv[1])
            top = items[:40]
            for name, dur in top:
                print(f"   {dur/1e6/8:8.3f}  {name[:120]}")
            tail = sum(d for _, d in items[40:])
            print(f"   {tail/1e6/8:8.3f}  == tail ({len(items)-40} distinct ops)")
            # bucket by shape-category
            buckets = {}
            for name, dur in items:
                m = re.search(r"= \(?([a-z0-9]+)\[([0-9,]*)\]", name)
                key = f"{m.group(1)}[{m.group(2)}]" if m else "other"
                buckets[key] = buckets.get(key, 0) + dur
            print("-- by result shape:")
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:25]:
                print(f"   {v/1e6/8:8.3f}  {k}")
            # roofline phases (BENCH_ROOFLINE.json classification; see
            # that file for the per-phase bound arithmetic)
            phases = {}
            for name, dur in items:
                lhs = name.split(" = ")[0]  # op's own name, not operands
                m = re.search(r"= \(?([a-z0-9]+)\[([0-9,]*)\]", name)
                shape = m.group(2).split(",") if m and m.group(2) else []
                rows = int(shape[0]) if shape and shape[0] else 0
                minor = int(shape[-1]) if len(shape) > 1 and shape[-1] else 0
                if "_sorted_segment_sum" in lhs:
                    ph = "pallas_reduce"
                elif name.startswith("%prop"):
                    ph = "fused_epilogue"
                elif rows > 400000 and minor >= 256:
                    ph = "nnz_gather"
                elif minor >= 128 and rows >= 32768:
                    ph = "wide_stream"
                elif 0 < minor <= 8 or (len(shape) == 1 and rows > 1000):
                    ph = "narrow_chain"
                else:
                    ph = "small_misc"
                phases[ph] = phases.get(ph, 0) + dur
            print("-- roofline phases (ms/step):")
            for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
                print(f"   {v/1e6/8:8.3f}  {k}")


if __name__ == "__main__":
    main()
