"""Fused sharded spmm+epilogue (parallel/sharded.sharded_pma_epilogue):
the per-shard epilogue + narrow all-gather must match the replicated
composition (dir_spmm -> flax epilogue) exactly — values and ALL grads —
on the 8-device CPU mesh, in every self-loop mode and with balanced cuts.

Runs the kernels in Pallas interpret mode (ALLSET_PMA_EPILOGUE=interpret,
same CI convention as tests/test_pallas_pma.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("ALLSET_PMA_EPILOGUE", "interpret")


def _batch(rng, n=48, m=20, nnz=220, skew=False):
    from allset_tpu.graph.batch import Batch
    from allset_tpu.graph.transforms import (
        HyperData, add_self_loops, coalesce, norm_construction,
    )

    if skew:
        # power-law dst degrees: one giant hyperedge forces the
        # segment-aware balanced cuts (reasm/dist_idx path)
        edge = np.concatenate(
            [np.zeros(nnz // 2, np.int64),
             rng.integers(0, m, size=nnz - nnz // 2)]
        )
    else:
        edge = rng.integers(0, m, size=nnz)
    node = rng.integers(0, n, size=nnz)
    node, edge = coalesce(node, edge)
    hd = HyperData(
        x=rng.normal(size=(n, 16)).astype(np.float32),
        y=rng.integers(0, 4, size=n), node=node, edge=edge,
        num_nodes=n, num_hyperedges=m,
    )
    hd = norm_construction(add_self_loops(hd), "all_one")
    return Batch.from_hyperdata(hd, bucket=128)


def _model(dtype="float32"):
    from allset_tpu.models import SetGNN, SetGNNConfig

    cfg = SetGNNConfig(
        num_features=16, num_classes=4, all_num_layers=1,
        mlp_hidden=128, classifier_hidden=32, classifier_num_layers=1,
        heads=4, dropout=0.0, dtype=dtype,
    )
    return SetGNN(cfg)


def _compare(model, batch, batch_sh, rtol=1e-4, atol=1e-5, frac=0.0):
    """``frac``: tolerated fraction of out-of-tolerance elements per leaf
    (bf16: the per-shard and replicated reduce orders round agg rows
    differently by 1 ulp, which flips relu masks / LN stats on a handful
    of rows — grad noise, not a wiring bug; f32 compares exactly)."""
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, False)

    def loss(v, b):
        return jnp.sum(model.apply(v, b, False).astype(jnp.float32) ** 2)

    l_sh, g_sh = jax.value_and_grad(loss)(v, batch_sh)
    l_pl, g_pl = jax.value_and_grad(loss)(v, batch)
    np.testing.assert_allclose(float(l_sh), float(l_pl), rtol=max(rtol, 1e-4))
    flat_sh = jax.tree_util.tree_leaves_with_path(g_sh)
    flat_pl = jax.tree_util.tree_leaves(g_pl)
    for (path, a), b in zip(flat_sh, flat_pl):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        bad = np.abs(a - b) > (atol + rtol * np.abs(b))
        # small leaves (LN/bias vectors): a handful of flipped-ulp
        # elements is within the tolerated count even at 100% "fraction"
        assert bad.sum() <= max(frac * bad.size, 4 * (frac > 0)) and np.abs(
            a - b
        ).max() < max(10 * atol, 1e-3), (
            jax.tree_util.keystr(path), bad.mean(), np.abs(a - b).max()
        )


@pytest.mark.parametrize("split", [True, False])
def test_sharded_epilogue_matches_plain(rng, split):
    """Split build exercises sl 'append' (V2E) and 'add' (E2V); unsplit
    exercises 'none' — the epilogue must be numerically identical to the
    replicated flax composition in all three."""
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange

    batch = _batch(rng)
    mesh = make_mesh(8)
    shex = ShardedExchange.build(batch.inc, mesh, split=split).shard()
    if split:
        assert shex.v2e.sl_mode == "append" and shex.e2v.sl_mode == "add"
    else:
        assert shex.v2e.sl_mode == "none"
    _compare(_model(), batch, dataclasses.replace(batch, shex=shex))


def test_sharded_epilogue_balanced_cuts(rng):
    """Power-law graph triggers the segment-aware balanced split: the
    fused op's dist/reasm handling (sentinel-padded dist_idx) must keep
    values and grads exact."""
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange

    batch = _batch(rng, skew=True)
    mesh = make_mesh(8)
    shex = ShardedExchange.build(
        batch.inc, mesh, balance_threshold=1.05
    ).shard()
    assert shex.v2e.reasm is not None  # the balanced path actually fires
    _compare(_model(), batch, dataclasses.replace(batch, shex=shex))


def test_sharded_epilogue_bf16(rng):
    """Mixed-precision flagship config through the fused sharded path."""
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange

    batch = _batch(rng)
    mesh = make_mesh(8)
    shex = ShardedExchange.build(batch.inc, mesh).shard()
    _compare(_model(dtype="bfloat16"), batch,
             dataclasses.replace(batch, shex=shex), rtol=5e-2, atol=3e-2,
             frac=5e-3)


def test_sharded_epilogue_vmapped_runs(rng):
    """The 20-run statistical protocol vmaps over parameter replicas;
    vmap pushes the runs axis inside the shard bodies, where the
    epilogue primitives' runs-folding batching rules apply
    (ops/pallas_pma.py). Vmapped == sequential, values and grads."""
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange

    batch = _batch(rng)
    mesh = make_mesh(8)
    shex = ShardedExchange.build(batch.inc, mesh).shard()
    batch_sh = dataclasses.replace(batch, shex=shex)
    model = _model()
    v1 = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    v2 = model.init({"params": jax.random.PRNGKey(1)}, batch, False)
    vr = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), v1, v2)

    def loss(v, b):
        return jnp.sum(model.apply(v, b, False).astype(jnp.float32) ** 2)

    lv, gv = jax.jit(
        jax.vmap(jax.value_and_grad(loss), in_axes=(0, None))
    )(vr, batch_sh)
    l1, g1 = jax.value_and_grad(loss)(v1, batch_sh)
    l2, g2 = jax.value_and_grad(loss)(v2, batch_sh)
    np.testing.assert_allclose(
        np.asarray(lv), np.asarray([l1, l2]), rtol=1e-5
    )
    for (p, a), b1, b2 in zip(
        jax.tree_util.tree_leaves_with_path(gv),
        jax.tree_util.tree_leaves(g1),
        jax.tree_util.tree_leaves(g2),
    ):
        np.testing.assert_allclose(
            np.asarray(a),
            np.stack([np.asarray(b1), np.asarray(b2)]),
            rtol=2e-4, atol=1e-5, err_msg=jax.tree_util.keystr(p),
        )


def test_sharded_epilogue_census(rng):
    """Collective census of the fused path on compiled HLO: the fwd
    all-gather narrows to the [*, HC] epilogue output (it was [*, WP]),
    and the bwd adds exactly one fused param-grad psum per direction —
    no other new collectives."""
    from collections import Counter

    from allset_tpu.parallel.mesh import make_mesh, replicate
    from allset_tpu.parallel.sharded import ShardedExchange
    from tests.test_parallel import _collective_census

    batch = _batch(rng)
    mesh = make_mesh(8)
    shex = ShardedExchange.build(batch.inc, mesh).shard()
    # pin all non-exchange inputs replicated: with unspecified input
    # shardings GSPMD is free to shard the dense GEMMs around the fused
    # op and the census fills with partitioner-chosen reshards
    batch_sh = dataclasses.replace(replicate(batch, mesh), shex=shex)
    model = _model()
    v = replicate(
        model.init({"params": jax.random.PRNGKey(0)}, batch, False), mesh
    )

    def loss(v, b):
        return jnp.sum(model.apply(v, b, False) ** 2)

    step_txt = (
        jax.jit(jax.value_and_grad(loss))
        .lower(v, batch_sh).compile().as_text()
    )
    census = _collective_census(step_txt)
    HC, H, L = 128, 4, 2
    WP = HC + H  # packed width, no lane pad on the CPU mesh
    dv, de = shex.v2e, shex.e2v
    rows_sl = -(-dv.num_src // 8)
    g_v = 8 * (dv.rows_per_shard + rows_sl)  # V2E: core + sl slot blocks
    g_e = 8 * de.rows_per_shard
    want = Counter()
    # forward: exactly ONE all-gather per direction, now moving the
    # NARROW [*, HC] epilogue output (the unfused path moved [*, WP])
    want[("all-gather", f"f32[{g_v},{HC}]")] = 1
    want[("all-gather", f"f32[{g_e},{HC}]")] = 1
    # backward per direction: the dw psum [num_src, WP] (unchanged) plus
    # ONE fused param-grad psum — XLA's combiner keeps the tuple's two
    # components (dW [L,HC,HC], dsmall [8,HC]) as separate entries here
    want[("all-reduce", f"f32[{dv.num_src},{WP}]")] = 1
    want[("all-reduce", f"f32[{de.num_src},{WP}]")] = 1
    want[("all-reduce", f"f32[{L},{HC},{HC}]")] = 2
    want[("all-reduce", f"f32[8,{HC}]")] = 2
    # E2V 'add' mode: the pre-epilogue self-loop contribution's dw slices
    # come back as one all-gather of the per-shard dagg*scale blocks
    want[("all-gather", f"f32[{g_e},{WP}]")] = 1
    assert census == want, (census, want)

    # the accounting helper (what scripts/scaling_report.py consumes)
    # agrees with the compiled program
    from allset_tpu.parallel.sharded import sharded_comm_stats

    stats = sharded_comm_stats(shex, WP, itemsize=4, epilogue_hc=HC,
                               epilogue_layers=L)
    assert stats["reassembly_fwd"] == 2
    assert stats["psums_bwd"] == 4  # dw + fused param psum per direction
    assert stats["fwd_bytes"] == (g_v + g_e) * HC * 4
    assert stats["bwd_bytes"] == (
        (dv.num_src + de.num_src) * WP * 4
        + 2 * (L * HC * HC + 8 * HC) * 4
    )
    assert stats["bwd_ag_bytes"] == g_e * WP * 4
