"""Parity tests for the fused PMA epilogue kernel (ops/pallas_pma.py) in
interpret mode against the unfused flax/XLA composition it replaces
(PMA tail in nn/modules.py; reference math src/layers.py:128-157)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allset_tpu.ops.pallas_pma import pma_epilogue


def _unfused(agg, seed, g0, b0, Wrff, brff, g1, b1, H, HC, cdt):
    """The exact flax composition from PMA.__call__."""
    from flax import linen as nn

    C = HC // H
    P = (
        jax.lax.broadcasted_iota(jnp.int32, (H, HC), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (H, HC), 1) // C
    ).astype(agg.dtype)
    denom_h = jnp.maximum(agg[:, HC : HC + H], 1e-16)
    out = agg[:, :HC] / (denom_h @ P)
    out = out + seed[None, :].astype(out.dtype)

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        return y.astype(x.dtype)

    z = ln(out, g0, b0)
    h = z
    L = Wrff.shape[0]
    for l in range(L):
        h = (h.astype(cdt) @ Wrff[l].astype(cdt)) + brff[l].astype(cdt)
        if l < L - 1:
            h = nn.relu(h)
    out2 = z + nn.relu(h).astype(z.dtype)
    return ln(out2, g1, b1)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("L", [1, 2])
def test_epilogue_matches_unfused(dtype, L):
    H, HC, M, WP = 4, 256, 520, 384  # M not a block multiple: masking path
    cdt = jnp.dtype(dtype)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 9)
    agg_v = jax.random.normal(ks[0], (M, HC), jnp.float32)
    den = jax.random.uniform(ks[1], (M, H), jnp.float32, 0.3, 3.0)
    agg = jnp.concatenate(
        [agg_v, den, jnp.zeros((M, WP - HC - H))], axis=1
    ).astype(cdt)
    seed = jax.random.normal(ks[2], (HC,), jnp.float32) * 0.1
    g0 = 1.0 + 0.1 * jax.random.normal(ks[3], (HC,), jnp.float32)
    b0 = 0.1 * jax.random.normal(ks[4], (HC,), jnp.float32)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[5], (HC,), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[6], (HC,), jnp.float32)
    Wrff = jax.random.normal(ks[7], (L, HC, HC), jnp.float32) * 0.05
    brff = 0.1 * jax.random.normal(ks[8], (L, HC), jnp.float32)

    y_ref = _unfused(agg, seed, g0, b0, Wrff, brff, g1, b1, H, HC, cdt)
    y = pma_epilogue(H, 256, True, False, agg, seed, g0, b0, Wrff, brff, g1, b1)
    tol = 5e-2 if dtype == "bfloat16" else 2e-5
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=tol, rtol=tol,
    )

    # grads: scalar loss, every input
    tgt = jax.random.normal(jax.random.PRNGKey(9), (M, HC), jnp.float32)

    def loss_f(fn):
        def f(agg, seed, g0, b0, Wrff, brff, g1, b1):
            y = fn(agg, seed, g0, b0, Wrff, brff, g1, b1)
            return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

        return f

    gref = jax.grad(
        loss_f(lambda *a: _unfused(*a, H, HC, cdt)), argnums=tuple(range(8))
    )(agg, seed, g0, b0, Wrff, brff, g1, b1)
    gfus = jax.grad(
        loss_f(lambda *a: pma_epilogue(H, 256, True, False, *a)),
        argnums=tuple(range(8)),
    )(agg, seed, g0, b0, Wrff, brff, g1, b1)

    names = ["dagg", "dseed", "dg0", "db0", "dW", "dbrff", "dg1", "db1"]
    gtol = 6e-2 if dtype == "bfloat16" else 1e-4
    for name, a, b in zip(names, gfus, gref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        # dW: the unfused path accumulates z^T g on a bf16 GEMM while the
        # kernel accumulates f32 — a sparse tail of elements differs by a
        # few bf16 ulps; bound the fraction instead of every element
        tol = 2 * gtol if name == "dW" else gtol
        bad = np.abs(a / scale - b / scale) > tol
        assert bad.mean() < 1e-3, (name, bad.mean())


@pytest.mark.slow
def test_epilogue_vmap_batches():
    """vmapped runs (batched agg AND params) must match per-run results —
    pallas_call's batching rule + the revisited accumulators per run."""
    H, HC, M, WP, R = 2, 256, 512, 384, 3
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 9)
    agg = jnp.concatenate(
        [
            jax.random.normal(ks[0], (R, M, HC), jnp.float32),
            jax.random.uniform(ks[1], (R, M, H), jnp.float32, 0.5, 2.0),
            jnp.zeros((R, M, WP - HC - H)),
        ],
        axis=2,
    )
    seed = 0.1 * jax.random.normal(ks[2], (R, HC), jnp.float32)
    g0 = 1.0 + 0.1 * jax.random.normal(ks[3], (R, HC), jnp.float32)
    b0 = 0.1 * jax.random.normal(ks[4], (R, HC), jnp.float32)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[5], (R, HC), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[6], (R, HC), jnp.float32)
    Wrff = 0.05 * jax.random.normal(ks[7], (R, 1, HC, HC), jnp.float32)
    brff = 0.1 * jax.random.normal(ks[8], (R, 1, HC), jnp.float32)

    fn = lambda *a: pma_epilogue(H, 128, True, False, *a)

    def loss(*a):
        return jnp.mean(fn(*a) ** 2)

    yb = jax.vmap(fn)(agg, seed, g0, b0, Wrff, brff, g1, b1)
    gb = jax.vmap(jax.grad(loss, argnums=(0, 4)))(
        agg, seed, g0, b0, Wrff, brff, g1, b1
    )
    for r in range(R):
        y1 = fn(agg[r], seed[r], g0[r], b0[r], Wrff[r], brff[r], g1[r], b1[r])
        np.testing.assert_allclose(
            np.asarray(yb[r]), np.asarray(y1), atol=1e-5, rtol=1e-5
        )
        g1r = jax.grad(loss, argnums=(0, 4))(
            agg[r], seed[r], g0[r], b0[r], Wrff[r], brff[r], g1[r], b1[r]
        )
        np.testing.assert_allclose(
            np.asarray(gb[0][r]), np.asarray(g1r[0]), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gb[1][r]), np.asarray(g1r[1]), atol=1e-5, rtol=1e-4
        )


@pytest.mark.slow
def test_setgnn_fused_epilogue_integration(monkeypatch):
    """The INTEGRATED PMA fused path (interpret mode) must match the
    module composition: same params (skeletons), close outputs/grads."""
    import numpy as np

    from allset_tpu.data.synthetic import synthetic_hypergraph
    from allset_tpu.graph import add_self_loops, norm_construction
    from allset_tpu.graph.batch import Batch
    from allset_tpu.models import SetGNN, SetGNNConfig

    hd = synthetic_hypergraph(num_nodes=260, num_hyperedges=150, seed=1)
    hd = norm_construction(add_self_loops(hd), "all_one")
    batch = Batch.from_hyperdata(hd, bucket=64)
    cfg = SetGNNConfig(
        num_features=hd.num_features, num_classes=4, all_num_layers=1,
        mlp_hidden=256, classifier_hidden=64, classifier_num_layers=1,
        heads=4, dropout=0.0,
    )
    model = SetGNN(cfg)

    def logits_and_grads(p):
        def loss(p):
            return jnp.mean(model.apply({"params": p}, batch, False) ** 2)

        return model.apply({"params": p}, batch, False), jax.grad(loss)(p)

    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)["params"]
    y_ref, g_ref = logits_and_grads(params)

    monkeypatch.setenv("ALLSET_PMA_EPILOGUE", "interpret")
    params2 = model.init({"params": jax.random.PRNGKey(0)}, batch, False)["params"]
    # identical parameter trees (the skeleton modules must not drift)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_fus, g_fus = logits_and_grads(params)
    np.testing.assert_allclose(
        np.asarray(y_fus), np.asarray(y_ref), atol=2e-4, rtol=2e-4
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fus),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        assert str(ka) == str(kb)
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=5e-4, err_msg=str(ka),
        )


def test_epilogue_relu_fold_matches():
    """relu=True folds SetGNN's inter-stage activation into the kernel:
    fwd == relu(unfused) and grads == grads of relu-composed reference."""
    from flax import linen as nn
    H, HC, M, WP, L = 4, 256, 520, 384, 2
    cdt = jnp.float32
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 9)
    agg_v = jax.random.normal(ks[0], (M, HC), jnp.float32)
    den = jax.random.uniform(ks[1], (M, H), jnp.float32, 0.3, 3.0)
    agg = jnp.concatenate(
        [agg_v, den, jnp.zeros((M, WP - HC - H))], axis=1
    ).astype(cdt)
    seed = jax.random.normal(ks[2], (HC,), jnp.float32) * 0.1
    g0 = 1.0 + 0.1 * jax.random.normal(ks[3], (HC,), jnp.float32)
    b0 = 0.1 * jax.random.normal(ks[4], (HC,), jnp.float32)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[5], (HC,), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[6], (HC,), jnp.float32)
    Wrff = jax.random.normal(ks[7], (L, HC, HC), jnp.float32) * 0.05
    brff = 0.1 * jax.random.normal(ks[8], (L, HC), jnp.float32)
    args = (agg, seed, g0, b0, Wrff, brff, g1, b1)

    y_ref = nn.relu(_unfused(*args, H, HC, cdt))
    y = pma_epilogue(H, 256, True, True, *args)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=2e-5, rtol=2e-5,
    )

    def loss_fused(*a):
        return jnp.sum(pma_epilogue(H, 256, True, True, *a) ** 2)

    def loss_ref(*a):
        return jnp.sum(nn.relu(_unfused(*a, H, HC, cdt)) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-4, rtol=3e-4,
        )
