"""Segment-aware balanced partitioning of the sharded exchange
(SURVEY.md §7 "edge partitioning with power-law degrees"): on a
scale-free hypergraph the equal-row-block cut concentrates hot segments
on few shards; the balanced cut must bound the per-shard entry skew at
~1.25x AND stay numerically identical to the single-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allset_tpu.data.synthetic import scale_free_hypergraph
from allset_tpu.graph import add_self_loops, norm_construction
from allset_tpu.ops.exchange import dir_spmm
from allset_tpu.parallel.mesh import make_mesh
from allset_tpu.parallel.sharded import ShardedExchange, sharded_spmm

pytestmark = pytest.mark.slow  # e2e / multi-device: see pytest.ini


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _inc():
    # skewed enough that equal row blocks concentrate entries (>1.5x), but
    # with max node degree below a shard's fair share (a segment can never
    # be split, so that bounds any contiguous partitioner)
    hd = scale_free_hypergraph(
        num_nodes=2048, num_hyperedges=512, avg_edge_size=14,
        exponent=1.2, feature_dim=8, seed=1,
    )
    hd = norm_construction(add_self_loops(hd), "all_one")
    return hd.to_incidence(bucket=256)


def _valid_counts(sd):
    return np.asarray((sd.src < sd.num_src).sum(axis=1))


def test_balanced_cuts_bound_skew():
    inc = _inc()
    mesh = make_mesh(8)
    shex = ShardedExchange.build(inc, mesh)
    eq = ShardedExchange.build(inc, mesh, balance_threshold=float("inf"))

    # E2V dst = nodes: Zipf node degrees concentrate entries in the first
    # row blocks — the case the balanced cut exists for
    cnt_eq = _valid_counts(eq.e2v)
    cnt_bal = _valid_counts(shex.e2v)
    avg = cnt_eq.sum() / 8
    assert cnt_eq.max() / avg > 1.5, "fixture not skewed enough to test"
    assert shex.e2v.reasm is not None
    assert cnt_bal.max() / avg <= 1.5
    assert cnt_bal.max() / max(cnt_bal.min(), 1) <= 1.5
    # every direction conserves entries
    assert cnt_bal.sum() == cnt_eq.sum()
    assert eq.e2v.reasm is None


@pytest.mark.parametrize("reduce", ["add", "mean", "max"])
def test_balanced_numerics_match_single_device(rng, reduce):
    inc = _inc()
    mesh = make_mesh(8)
    shex = ShardedExchange.build(inc, mesh).shard()

    f = 8
    for sd, ref_d in [(shex.v2e, inc.v2e_split()), (shex.e2v, inc.e2v_split())]:
        rows = sd.num_src + (inc.num_nodes if sd.sl_mode == "add" else 0)
        w = jnp.asarray(rng.normal(size=(rows, f)).astype(np.float32))
        tgt = sd.num_dst_total if sd.sl_mode != "none" else sd.num_dst
        t = jnp.asarray(rng.normal(size=(tgt, f)).astype(np.float32))

        # dir_spmm dispatches ShardedDirections to sharded_spmm and
        # composes 'mean' (divide by full dst counts) for both paths
        def loss_sh(w):
            return jnp.sum((dir_spmm(w, sd, norm=sd.norm, reduce=reduce) - t) ** 2)

        def loss_ref(w):
            return jnp.sum(
                (dir_spmm(w, ref_d, norm=ref_d.norm, reduce=reduce) - t) ** 2
            )

        gs = jax.grad(loss_sh)(w)
        gf = jax.grad(loss_ref)(w)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                   rtol=1e-4, atol=1e-5)


def test_statistics_report_shard_skew():
    from allset_tpu.data.statistics import dataset_statistics

    hd = scale_free_hypergraph(
        num_nodes=512, num_hyperedges=128, avg_edge_size=8,
        exponent=1.8, feature_dim=4, seed=2,
    )
    st = dataset_statistics(hd)
    assert "shard8_e2v_skew_rowblock" in st
    for side in ("v2e", "e2v"):
        assert st[f"shard8_{side}_skew_balanced"] <= max(
            st[f"shard8_{side}_skew_rowblock"], 1.3
        )
    # the Zipf node side must actually have been rebalanced
    assert st["shard8_e2v_skew_rowblock"] > 1.5
    assert st["shard8_e2v_skew_balanced"] < st["shard8_e2v_skew_rowblock"]
