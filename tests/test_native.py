"""Native hypercore kernels vs. the pure-numpy fallbacks.

The C++ library (native/hypercore.cpp) is the first-party replacement for
the reference's third-party native preprocessing (torch_sparse.coalesce,
the python clique expansion at src/preprocessing.py:343-391). These tests
assert exact agreement with the numpy implementations on random hypergraphs.
"""

import numpy as np
import pytest

from allset_tpu.graph import native
from allset_tpu.graph.transforms import HyperData


def _random_incidence(rng, num_nodes=40, num_edges=25, nnz=200):
    node = rng.integers(0, num_nodes, size=nnz).astype(np.int64)
    edge = rng.integers(0, num_edges, size=nnz).astype(np.int64)
    return node, edge


needs_native = pytest.mark.skipif(not native.available(), reason="no toolchain")


@needs_native
def test_coalesce_matches_numpy():
    rng = np.random.default_rng(0)
    node, edge = _random_incidence(rng)
    got_node, got_edge = native.coalesce(node, edge)
    pairs = np.stack([edge, node], axis=1)
    uniq = np.unique(pairs, axis=0)
    np.testing.assert_array_equal(got_node, uniq[:, 1])
    np.testing.assert_array_equal(got_edge, uniq[:, 0])


@needs_native
def test_clique_expand_matches_numpy():
    rng = np.random.default_rng(1)
    node, edge = _random_incidence(rng, num_nodes=30, num_edges=12, nnz=120)
    # dedup first so weights count distinct co-memberships like the reference
    pairs = np.unique(np.stack([edge, node], axis=1), axis=0)
    node, edge = pairs[:, 1], pairs[:, 0]
    num_edges = 12

    got = native.clique_expand(node, edge, num_edges)
    assert got is not None
    got_pairs, got_w = got

    # numpy oracle (mirror of transforms.construct_v2v python path)
    from collections import defaultdict

    want = defaultdict(float)
    for e in range(num_edges):
        members = np.sort(node[edge == e])
        if len(members) <= 1:
            continue
        ii, jj = np.triu_indices(len(members), k=1)
        for a, b in zip(members[ii], members[jj]):
            want[(int(a), int(b))] += 1.0

    got_dict = {
        (int(i), int(j)): float(w)
        for i, j, w in zip(got_pairs[0], got_pairs[1], got_w)
    }
    assert got_dict == dict(want)


@needs_native
def test_indptr_matches_searchsorted():
    rng = np.random.default_rng(2)
    ids = np.sort(rng.integers(0, 10, size=57)).astype(np.int64)
    got = native.indptr(ids, 10)
    want = np.searchsorted(ids, np.arange(11))
    np.testing.assert_array_equal(got, want)


@needs_native
def test_construct_v2v_uses_native_and_agrees():
    rng = np.random.default_rng(3)
    node, edge = _random_incidence(rng, num_nodes=20, num_edges=8, nnz=60)
    pairs = np.unique(np.stack([edge, node], axis=1), axis=0)
    data = HyperData(
        x=np.zeros((20, 3), np.float32),
        y=np.zeros(20, np.int64),
        node=pairs[:, 1],
        edge=pairs[:, 0],
        num_nodes=20,
        num_hyperedges=8,
    )
    from allset_tpu.graph import transforms

    got_pairs, got_w = transforms.construct_v2v(data)
    # order-insensitive comparison against the python path
    old = native._lib
    try:
        native._lib = None
        native._tried = True
        ref_pairs, ref_w = transforms.construct_v2v(data)
    finally:
        native._lib = old
    got = {(int(i), int(j)): float(w) for i, j, w in zip(*got_pairs, got_w)}
    ref = {(int(i), int(j)): float(w) for i, j, w in zip(*ref_pairs, ref_w)}
    assert got == ref


def test_counting_argsort_matches_numpy():
    from allset_tpu.graph import native

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, size=500)
    got = native.stable_argsort(keys, 50)
    want = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got, want)
    # keys at the boundary value (padding ids == num_keys-1) sort last
    keys = np.array([3, 1, 3, 0, 2, 3])
    np.testing.assert_array_equal(
        native.stable_argsort(keys, 4), np.argsort(keys, kind="stable")
    )
