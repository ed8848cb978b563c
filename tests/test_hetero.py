"""Hetero-HAN vertical (graph/hetero.py) — the analog of the reference's
cached-metapath variant (src/DGL_HAN/model_hetero.py:40-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allset_tpu.graph.hetero import (
    HeteroGraph,
    HeteroHAN,
    HeteroHANConfig,
    metapath_reachable,
)


def _acm_like(rng, n_p=40, n_a=12, n_s=5):
    """Tiny ACM-shaped heterograph: paper-author and paper-subject."""
    pa_p = rng.integers(0, n_p, 80)
    pa_a = rng.integers(0, n_a, 80)
    ps_p = np.arange(n_p)
    ps_s = rng.integers(0, n_s, n_p)
    return HeteroGraph(
        num_nodes={"paper": n_p, "author": n_a, "subject": n_s},
        edges={
            ("paper", "pa", "author"): (pa_p, pa_a),
            ("author", "ap", "paper"): (pa_a, pa_p),
            ("paper", "ps", "subject"): (ps_p, ps_s),
            ("subject", "sp", "paper"): (ps_s, ps_p),
        },
    )


def test_metapath_reachable_matches_dense():
    rng = np.random.default_rng(0)
    g = _acm_like(rng)
    inc = metapath_reachable(g, ["pa", "ap"])

    # dense oracle: boolean reachability through PA @ AP
    n_p, n_a = g.num_nodes["paper"], g.num_nodes["author"]
    PA = np.zeros((n_p, n_a))
    for s, d in zip(*g.edges[("paper", "pa", "author")]):
        PA[s, d] = 1
    reach = (PA @ PA.T) > 0

    got = np.zeros_like(reach)
    node, edge, mask = (
        np.asarray(inc.node), np.asarray(inc.edge), np.asarray(inc.mask),
    )
    for s, d, m in zip(node, edge, mask):
        if m:
            got[s, d] = True
    np.testing.assert_array_equal(got, reach)


def test_metapath_validation():
    g = _acm_like(np.random.default_rng(1))
    with pytest.raises(ValueError):
        metapath_reachable(g, ["pa", "sp"])  # type break author!=subject
    with pytest.raises(ValueError):
        metapath_reachable(g, ["pa"])  # endpoint type != start type


def test_hetero_han_trains_and_caches():
    rng = np.random.default_rng(2)
    g = _acm_like(rng)
    n_p = g.num_nodes["paper"]
    x = jnp.asarray(rng.normal(size=(n_p, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n_p))

    cfg = HeteroHANConfig(num_features=16, num_classes=3, hidden_units=8,
                          num_heads=(2,), dropout=0.0)
    model = HeteroHAN(cfg, meta_paths=[["pa", "ap"], ["ps", "sp"]])

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, g, x, False
    )
    params = variables["params"]

    # caching: same graph object -> same Incidence objects (no rebuild)
    g1 = model.coalesced(g)
    g2 = model.coalesced(g)
    assert all(a is b for a, b in zip(g1, g2))
    g3 = model.coalesced(_acm_like(np.random.default_rng(3)))
    assert g1[0] is not g3[0]
    model.coalesced(g)  # swap back for training below

    import optax

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, graphs):
        def loss(p):
            logits = model.module.apply({"params": p}, graphs, x, True,
                                        rngs={"dropout": jax.random.PRNGKey(1)})
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, y[:, None], 1))

        l, grad = jax.value_and_grad(loss)(p)
        up, o = tx.update(grad, o, p)
        return optax.apply_updates(p, up), o, l

    graphs = model.coalesced(g)
    l0 = None
    for i in range(60):
        params, opt, l = step(params, opt, graphs)
        if l0 is None:
            l0 = l
    assert float(l) < float(l0) * 0.7, (float(l0), float(l))
