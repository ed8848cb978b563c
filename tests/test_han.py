"""HAN vertical tests: metapath construction + model + early-stopped
training (the DGL_HAN pipeline, SURVEY.md §2.2 last row)."""

import pytest
import numpy as np

import jax.numpy as jnp

from allset_tpu.data.synthetic import synthetic_hypergraph
from allset_tpu.graph.batch import Batch
from allset_tpu.graph.metapath import build_metapath_graphs
from allset_tpu.models.han import HAN, HANConfig, han_extras
from allset_tpu.train.han_trainer import HANTrainConfig, train_han
from allset_tpu.utils.checkpoint import EarlyStopping


def test_metapath_blocks():
    hd = synthetic_hypergraph(num_nodes=50, num_hyperedges=20, seed=0)
    feats, labels, vev, eve = build_metapath_graphs(hd, bucket=64)
    T = hd.num_nodes + hd.num_hyperedges
    assert feats.shape == (T, hd.num_features)
    assert labels.shape == (T,)
    assert np.all(labels[hd.num_nodes:] == -1)
    # VEV entries live in the V block, EVE in the E block
    vn, ve = np.asarray(vev.node)[np.asarray(vev.mask)], np.asarray(vev.edge)[np.asarray(vev.mask)]
    assert vn.max() < hd.num_nodes and ve.max() < hd.num_nodes
    en, ee = np.asarray(eve.node)[np.asarray(eve.mask)], np.asarray(eve.edge)[np.asarray(eve.mask)]
    assert en.min() >= hd.num_nodes and ee.min() >= hd.num_nodes
    # VEV connectivity matches dense two-step reachability
    H = np.zeros((hd.num_nodes, hd.num_hyperedges))
    H[hd.node, hd.edge] = 1
    vev_dense = (H @ H.T) > 0
    got = np.zeros_like(vev_dense)
    got[vn, ve] = True
    np.testing.assert_array_equal(got, vev_dense)


def test_gatconv_packed_path_matches_reference():
    """DGLGATConv's sorted packed path (folded score GEMM + global-shift
    softmax + one packed reduce, r5) must match the unsorted reference
    composition (per-segment softmax) on values AND grads."""
    import dataclasses

    import jax

    from allset_tpu.models.han import DGLGATConv

    hd = synthetic_hypergraph(num_nodes=60, num_hyperedges=25, seed=2)
    feats, labels, vev, eve = build_metapath_graphs(hd, bucket=64)
    conv = DGLGATConv(out_channels=8, heads=4, feat_drop=0.0, attn_drop=0.0)
    x = jnp.asarray(feats, jnp.float32)
    v = conv.init({"params": jax.random.PRNGKey(0)}, vev, x, False)
    assert vev.node_perm is not None  # fast path active

    def loss(v, g):
        return jnp.sum(conv.apply(v, g, x, False).astype(jnp.float32) ** 2)

    g_slow = dataclasses.replace(vev, node_perm=None)  # reference path
    y_fast = conv.apply(v, vev, x, False)
    y_slow = conv.apply(v, g_slow, x, False)
    np.testing.assert_allclose(
        np.asarray(y_fast), np.asarray(y_slow), rtol=1e-5, atol=1e-5
    )
    gf = jax.grad(loss)(v, vev)
    gs = jax.grad(loss)(v, g_slow)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gs),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=str(ka),
        )


@pytest.mark.slow
def test_han_trains_and_learns():
    hd = synthetic_hypergraph(
        num_nodes=100, num_hyperedges=40, num_classes=3,
        homophily=0.9, feature_noise=0.4, seed=1,
    )
    feats, labels, vev, eve = build_metapath_graphs(hd, bucket=64)
    batch = Batch(
        x=jnp.asarray(feats), y=jnp.asarray(labels, jnp.int32),
        inc=None, extras=han_extras(vev, eve),
    )
    cfg = HANConfig(
        num_features=hd.num_features, num_classes=3,
        hidden_units=8, num_heads=(4,), dropout=0.3,
    )
    res = train_han(
        HAN(cfg), batch, hd.num_nodes,
        HANTrainConfig(num_epochs=60, runs=2, patience=30, seed=0),
    )
    assert res["test_acc_mean"] > 55.0, res
    assert 0 <= res["macro_f1_mean"] <= 100


def test_early_stopping_rules():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0, 0.5, {"w": 1})
    # loss up AND acc down -> strike
    assert not es.step(1.1, 0.4, {"w": 2})
    # improvement resets counter and snapshots
    assert not es.step(0.9, 0.6, {"w": 3})
    assert es.best_params == {"w": 3}
    assert not es.step(1.2, 0.5, {"w": 4})
    assert es.step(1.3, 0.4, {"w": 5})  # second strike -> stop
    assert es.restore() == {"w": 3}


def test_sampler_unmasked_ids_unique():
    """DGL's frontier dedup keeps ONE occurrence per neighbor id — in
    particular the seed must not appear twice when a walk lands back on it
    (``src/DGL_HAN/train_sampling.py:106-116``). Regression for the r3
    double-counted-seed bug (sampler.py dedup vs forced self-loop column)."""
    from allset_tpu.data.sampler import HANNeighborSampler

    # dense tiny graph: walks frequently return to the seed
    hd = synthetic_hypergraph(
        num_nodes=12, num_hyperedges=6, num_classes=2,
        homophily=0.9, feature_noise=0.3, seed=0,
    )
    sampler = HANNeighborSampler(hd, num_neighbors=16, seed=1)
    hit_seed_walk = False
    for trial in range(5):
        blocks = sampler.sample(np.arange(12))
        for name, blk in blocks.items():
            for b in range(blk.src.shape[0]):
                ids = blk.src[b][blk.mask[b]]
                assert len(ids) == len(np.unique(ids)), (name, b, ids)
                assert np.sum(ids == b) == 1, (name, b, ids)  # seed once
            hit_seed_walk |= bool(np.any(blocks["vev"].src[:, :-1]
                                         == np.arange(12)[:, None]))
    assert hit_seed_walk  # the tricky case actually occurred


@pytest.mark.slow
def test_sampled_han_minibatch():
    """Mini-batch HAN with the random-walk sampler (train_sampling.py)."""
    from allset_tpu.data.sampler import HANNeighborSampler
    from allset_tpu.models.han import SampledHAN
    from allset_tpu.train.han_trainer import HANSampleConfig, train_han_minibatch

    hd = synthetic_hypergraph(
        num_nodes=80, num_hyperedges=40, num_classes=3,
        homophily=0.9, feature_noise=0.3, seed=2,
    )
    sampler = HANNeighborSampler(hd, num_neighbors=8, seed=0)
    blocks = sampler.sample(np.arange(16))
    assert blocks["vev"].src.shape == (16, 9)
    assert np.all(blocks["vev"].src[:, -1] == np.arange(16))  # self loops
    assert np.all(blocks["eve"].mask[:, :-1] == False)  # noqa: E712 ref behavior

    cfg = HANConfig(num_features=hd.num_features, num_classes=3,
                    hidden_units=8, num_heads=(2,), dropout=0.2)
    res = train_han_minibatch(
        SampledHAN(cfg), jnp.asarray(hd.x), jnp.asarray(hd.y, jnp.int32),
        sampler,
        HANSampleConfig(batch_size=16, num_neighbors=8, num_epochs=20,
                        runs=1, patience=8, seed=0),
    )
    assert res["test_acc_mean"] > 45.0, res
