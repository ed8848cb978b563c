"""Distributed layer tests on the 8-device CPU mesh (SURVEY.md §4 item 4):
edge-partitioned execution must be numerically identical to single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allset_tpu.data.synthetic import synthetic_hypergraph
from allset_tpu.graph import add_self_loops, norm_construction
from allset_tpu.graph.batch import Batch
from allset_tpu.models import SetGNN, SetGNNConfig
from allset_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def make_batch(bucket):
    hd = synthetic_hypergraph(num_nodes=96, num_hyperedges=48, seed=3)
    hd = norm_construction(add_self_loops(hd), "all_one")
    return Batch.from_hyperdata(hd, bucket=bucket), hd


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_forward_matches_single_device(n_dev):
    batch, hd = make_batch(bucket=64 * n_dev)
    cfg = SetGNNConfig(
        num_features=hd.num_features, num_classes=4, heads=2,
        mlp_hidden=32, classifier_num_layers=1,
    )
    model = SetGNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = np.asarray(model.apply(variables, batch, False))

    mesh = make_mesh(n_dev)
    sbatch = shard_batch(batch, mesh)
    sparams = replicate(variables, mesh)
    with mesh:
        got = np.asarray(jax.jit(lambda v, b: model.apply(v, b, False))(sparams, sbatch))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_gradients_match():
    n_dev = 8
    batch, hd = make_batch(bucket=64 * n_dev)
    cfg = SetGNNConfig.all_deep_sets(
        num_features=hd.num_features, num_classes=4,
        mlp_hidden=32, classifier_num_layers=1,
    )
    model = SetGNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    y = batch.y

    def loss(v, b):
        out = model.apply(v, b, False)
        logp = jax.nn.log_softmax(out)
        return -jnp.take_along_axis(logp, y[:, None], 1).mean()

    g_want = jax.grad(loss)(variables, batch)

    mesh = make_mesh(n_dev)
    sbatch = shard_batch(batch, mesh)
    sparams = replicate(variables, mesh)
    with mesh:
        g_got = jax.jit(jax.grad(loss))(sparams, sbatch)
    for a, b in zip(jax.tree_util.tree_leaves(g_want), jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_incidence_shards_land_on_distinct_devices():
    n_dev = 4
    batch, _ = make_batch(bucket=64 * n_dev)
    mesh = make_mesh(n_dev)
    sbatch = shard_batch(batch, mesh)
    shard_devs = {s.device.id for s in sbatch.inc.node.addressable_shards}
    assert len(shard_devs) == n_dev
    # features replicated everywhere
    assert len({s.device.id for s in sbatch.x.addressable_shards}) == n_dev
    for s in sbatch.x.addressable_shards:
        assert s.data.shape == batch.x.shape


def test_hybrid_mesh_single_process():
    from allset_tpu.parallel.distributed import hybrid_mesh, initialize_multihost, mesh_summary

    initialize_multihost(num_processes=1)  # no-op path
    mesh = hybrid_mesh()
    assert mesh.devices.shape == (1, 8)
    assert "edge" in mesh.axis_names
    assert "processes=1" in mesh_summary(mesh)

    batch, hd = make_batch(bucket=64 * 8)
    sbatch = shard_batch(batch, mesh)
    cfg = SetGNNConfig(
        num_features=hd.num_features, num_classes=4, heads=2,
        mlp_hidden=32, classifier_num_layers=1,
    )
    model = SetGNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = np.asarray(model.apply(variables, batch, False))
    with mesh:
        got = np.asarray(
            jax.jit(lambda v, b: model.apply(v, b, False))(replicate(variables, mesh), sbatch)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
