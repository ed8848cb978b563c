"""Parity tests for the fused PMA score+pack kernels (ops/pallas_pack.py)
in interpret mode against the exact composition they replace (the PMA
score chain in nn/modules.py; reference math src/layers.py:128-148)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allset_tpu.ops.pallas_pack import _pack_ref, packed_width, pma_pack

SLOPE = 0.2


def _args(dtype, H=8, HC=256, M=520, seed=0):
    """yf as the padded GEMM would emit it: HC value cols, H score cols,
    zero pad to WP."""
    WP = packed_width(HC, H)
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    cdt = jnp.dtype(dtype)
    vals = jax.random.normal(k[0], (M, HC), jnp.float32)
    scores = 2.0 * jax.random.normal(k[1], (M, H), jnp.float32)
    yf = jnp.concatenate(
        [vals, scores, jnp.zeros((M, WP - HC - H))], axis=1
    ).astype(cdt)
    bV = 0.1 * jax.random.normal(k[2], (HC,), jnp.float32)
    ba = 0.1 * jax.random.normal(k[3], (H,), jnp.float32)
    return yf, bV, ba, WP


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("H", [1, 4, 8])
def test_pack_matches_composition(dtype, H):
    HC, M = 256, 520  # M not a block multiple: exercises OOB masking
    yf, bV, ba, WP = _args(dtype, H=H, HC=HC, M=M)

    w_ref = _pack_ref(yf, bV, ba, H=H, HC=HC, WP=WP, slope=SLOPE)
    w = pma_pack(H, HC, WP, SLOPE, 256, True, yf, bV, ba)
    assert w.shape == (M, WP) and w.dtype == yf.dtype
    if dtype == "float32":
        # f32 has no intermediate-rounding freedom: bit-exact
        np.testing.assert_array_equal(
            np.asarray(w, np.float32), np.asarray(w_ref, np.float32)
        )
    else:
        # the kernel math replicates the composition's cast points exactly
        # (verified bit-equal as plain jnp), but Pallas INTERPRET mode does
        # not round bf16 intermediates identically to compiled code — allow
        # 1 bf16 ulp (same reason test_pallas_pma uses tolerances)
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(w_ref, np.float32),
            rtol=2 ** -7, atol=1e-6,
        )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pack_grads_match_composition(dtype):
    """The custom_vjp backward IS the composition's vjp — with the SAME
    fixed cotangent it must be bit-identical (the interpret-mode forward
    wiggles bf16 ulps, so a loss-derived cotangent would differ; a fixed
    gw isolates the backward wiring, which is the thing under test)."""
    H, HC, M = 8, 256, 512
    yf, bV, ba, WP = _args(dtype, H=H, HC=HC, M=M, seed=1)
    gw = jax.random.normal(jax.random.PRNGKey(9), (M, WP)).astype(yf.dtype)

    _, vjp_ref = jax.vjp(
        lambda *a: _pack_ref(*a, H=H, HC=HC, WP=WP, slope=SLOPE),
        yf, bV, ba,
    )
    _, vjp_fus = jax.vjp(
        lambda *a: pma_pack(H, HC, WP, SLOPE, 256, True, *a), yf, bV, ba
    )
    for a, b in zip(vjp_fus(gw), vjp_ref(gw)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_pack_vmap_falls_back():
    """vmapped runs route through the batched composition (batching rule),
    matching per-run fused results."""
    H, HC, M, R = 4, 256, 256, 3
    WP = packed_width(HC, H)
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    yf = jax.random.normal(k[0], (R, M, WP), jnp.float32)
    yf = yf.at[:, :, HC + H :].set(0.0)
    bV = 0.1 * jax.random.normal(k[1], (R, HC), jnp.float32)
    ba = 0.1 * jax.random.normal(k[2], (R, H), jnp.float32)

    fn = lambda yf, bV, ba: pma_pack(H, HC, WP, SLOPE, 128, True, yf, bV, ba)
    wb = jax.vmap(fn)(yf, bV, ba)
    for r in range(R):
        np.testing.assert_allclose(
            np.asarray(wb[r]), np.asarray(fn(yf[r], bV[r], ba[r])),
            atol=1e-6, rtol=1e-6,
        )


@pytest.mark.slow
def test_pma_pack_integration(monkeypatch):
    """The INTEGRATED PMA with the fused score+pack (interpret mode) must
    match the module composition: same param tree, close outputs/grads.
    (ALLSET_PMA_EPILOGUE=interpret turns on the fused epilogue and
    ALLSET_PMA_PACK=interpret the pack kernels — both fused paths
    together, the hardware configuration. The two gates are independent
    since r5: the epilogue env no longer implies the pack path.)"""
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
    monkeypatch.setenv("ALLSET_PMA_PACK", "interpret")
    params2 = model.init({"params": jax.random.PRNGKey(0)}, batch, False)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
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
