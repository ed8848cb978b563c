"""Benchmark: incidence edges/s/chip, fwd+bwd, AllSetTransformer.

North-star metric from BASELINE.json: throughput of the two-stage multiset
aggregation (gather -> segment-softmax -> segment-reduce over the incidence
COO, plus the dense GEMMs) measured as incidence edges processed per second
per chip for a full training step (forward + backward + Adam update).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the first recorded run on this hardware
(BENCH_BASELINE.json, created on first run): the reference repo publishes
no numbers (SURVEY.md §6), so rounds are compared against round 1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _parent_retry() -> int:
    """The axon TPU tunnel intermittently wedges a PROCESS (device ops
    hang; recovery needs a fresh process — CLAUDE.md env facts). The
    parent stays jax-free and re-runs itself as a child until a result
    line appears, so one wedge can't cost the round's bench record."""
    env = dict(os.environ, BENCH_CHILD="1")
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if lines:
                print(lines[-1])
                return 0
            sys.stderr.write(r.stderr[-2000:] + "\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench attempt {attempt + 1} timed out "
                             f"(wedged tunnel?); retrying fresh\n")
    return 1

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(num_nodes, num_hyperedges, avg_edge_size, hidden, heads, seed=0):
    from allset_tpu.data.synthetic import scale_free_hypergraph
    from allset_tpu.graph import add_self_loops, norm_construction
    from allset_tpu.graph.batch import Batch
    from allset_tpu.models import SetGNN, SetGNNConfig

    hd = scale_free_hypergraph(
        num_nodes=num_nodes,
        num_hyperedges=num_hyperedges,
        avg_edge_size=avg_edge_size,
        feature_dim=hidden,
        seed=seed,
    )
    hd = norm_construction(add_self_loops(hd), "all_one")
    batch = Batch.from_hyperdata(
        hd, bucket=1024,
        bucket_rows=int(os.environ.get("BENCH_BUCKET_ROWS", 131072)),
    )
    cfg = SetGNNConfig(
        num_features=hd.num_features,
        num_classes=8,
        all_num_layers=1,
        mlp_hidden=hidden,
        classifier_hidden=hidden,
        classifier_num_layers=1,
        heads=heads,
        dropout=0.0,
        dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
        # flagship mode variants (VERDICT r4 #10): GPR stacks per-layer
        # outputs; LearnMask adds the SDDMM norm backward
        gpr=os.environ.get("BENCH_GPR", "0") == "1",
        learn_mask=os.environ.get("BENCH_LEARNMASK", "0") == "1",
    )
    model = SetGNN(cfg)
    return model, batch


def main():
    num_nodes = int(os.environ.get("BENCH_NODES", 1 << 17))
    num_hyperedges = int(os.environ.get("BENCH_EDGES", 1 << 16))
    avg_edge_size = int(os.environ.get("BENCH_EDGE_SIZE", 12))
    hidden = int(os.environ.get("BENCH_HIDDEN", 256))
    heads = int(os.environ.get("BENCH_HEADS", 8))
    steps_per_call = int(os.environ.get("BENCH_SCAN", 16))
    timed_calls = int(os.environ.get("BENCH_CALLS", 4))

    model, batch = build(num_nodes, num_hyperedges, avg_edge_size, hidden, heads)
    nnz = batch.inc.nnz

    from allset_tpu.train.trainer import masked_nll, torch_adam

    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    params = variables["params"]
    tx = torch_adam(1e-3, 0.0)
    opt_state = tx.init(params)
    def one_step(batch, carry, _):
        params, opt_state = carry

        def loss_fn(p):
            logits = model.apply({"params": p}, batch, False)
            # mask built in-graph from an iota: no closure constant
            train_mask = jnp.arange(batch.num_nodes) % 2 == 0
            return masked_nll(logits, batch.y, train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    # batch is an ARGUMENT, not a closure: closed-over device arrays get
    # baked into the HLO as constants, and at large graph sizes the
    # program blows past the axon tunnel's remote-compile request limit
    @jax.jit
    def run_chunk(params, opt_state, batch):
        (params, opt_state), losses = jax.lax.scan(
            lambda c, x: one_step(batch, c, x),
            (params, opt_state), None, length=steps_per_call
        )
        return params, opt_state, losses[-1]

    # compile + warmup. block_until_ready is not a reliable fence through
    # the axon tunnel; force a device->host transfer of the loss instead.
    params, opt_state, loss = run_chunk(params, opt_state, batch)
    float(np.asarray(jax.device_get(loss)))

    times = []
    for _ in range(timed_calls):
        t0 = time.perf_counter()
        params, opt_state, loss = run_chunk(params, opt_state, batch)
        float(np.asarray(jax.device_get(loss)))
        times.append(time.perf_counter() - t0)

    best = min(times)
    step_time = best / steps_per_call
    edges_per_s = nnz / step_time

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    detail = {
        "nnz": nnz,
        "num_nodes": num_nodes,
        "num_hyperedges": num_hyperedges,
        "hidden": hidden,
        "heads": heads,
        "step_time_s": step_time,
        "device": str(jax.devices()[0]),
        "loss": float(loss),
    }
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = edges_per_s / base["value"]
    else:
        with open(baseline_path, "w") as f:
            json.dump({"value": edges_per_s, **detail}, f, indent=1)
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "incidence_edges_per_s_per_chip_fwd_bwd",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        raise SystemExit(_parent_retry())
