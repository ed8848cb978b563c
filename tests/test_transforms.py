"""Tests for host-side hypergraph transforms — the loader assertions of the
reference promoted into real tests (SURVEY.md §4 implication (3))."""

import numpy as np
import pytest

from allset_tpu.graph import (
    HyperData,
    add_self_loops,
    coalesce,
    construct_h_dense,
    construct_v2v,
    expand_edge_index,
    gcn_norm,
    generate_g_from_h,
    generate_norm_hnhn,
    hypergcn_edge_dict,
    norm_construction,
    rand_train_test_idx,
    unignn_degrees,
)


def tiny_data():
    # hyperedges: e0={0,1,2}, e1={2,3}, e2={3} (a singleton)
    node = np.array([0, 1, 2, 2, 3, 3])
    edge = np.array([0, 0, 0, 1, 1, 2])
    x = np.eye(5, dtype=np.float32)
    y = np.array([0, 1, 0, 1, 0])
    return HyperData(x=x, y=y, node=node, edge=edge, num_nodes=5, num_hyperedges=3)


def test_coalesce_dedups_and_sorts():
    node = np.array([3, 1, 1, 2])
    edge = np.array([0, 1, 1, 0])
    n, e = coalesce(node, edge)
    assert list(e) == [0, 0, 1]
    assert list(n) == [2, 3, 1]


def test_add_self_loops_skips_singleton_members():
    data = tiny_data()
    out = add_self_loops(data)
    # node 3 sits in singleton e2 -> skipped; nodes 0,1,2,4 get new edges
    # (4 is isolated and still gets one, matching preprocessing.py:436-441)
    assert out.num_hyperedges == 3 + 4
    new_mask = out.edge >= 3
    assert sorted(out.node[new_mask].tolist()) == [0, 1, 2, 4]
    # each new edge is a singleton
    sizes = np.bincount(out.edge, minlength=out.num_hyperedges)
    assert np.all(sizes[3:] == 1)


def test_norm_all_one_and_deg_half_sym():
    data = add_self_loops(tiny_data())
    out = norm_construction(data, "all_one")
    assert np.all(out.norm == 1.0)

    out = norm_construction(data, "deg_half_sym")
    vdeg = np.bincount(out.node, minlength=5)
    edeg = np.bincount(out.edge, minlength=out.num_hyperedges)
    for i, (v, e) in enumerate(zip(out.node, out.edge)):
        np.testing.assert_allclose(
            out.norm[i], vdeg[v] ** -0.5 * edeg[e] ** -0.5, rtol=1e-6
        )


def test_expand_edge_index_excludes_self():
    data = tiny_data()
    out = expand_edge_index(data)
    # e0 (size 3) -> 3 sub-edges of size 2; e1 (size 2) -> 2 of size 1;
    # e2 (size 1) -> 1 singleton. total sub-edges = 6, entries = 6+2+1
    assert out.num_hyperedges == 6
    assert out.nnz == 3 * 2 + 2 * 1 + 1
    sizes = np.bincount(out.edge, minlength=out.num_hyperedges)
    assert sorted(sizes.tolist()) == [1, 1, 1, 2, 2, 2]
    # no sub-edge of e0 contains all three of {0,1,2}
    dense = construct_h_dense(out)
    assert not np.any(dense.sum(axis=0) >= 3)


def test_construct_v2v_weights_are_cooccurrence():
    data = tiny_data()
    pairs, w = construct_v2v(data)
    got = {tuple(p): float(ww) for p, ww in zip(pairs.T, w)}
    assert got == {(0, 1): 1.0, (0, 2): 1.0, (1, 2): 1.0, (2, 3): 1.0}


def test_gcn_norm_degrees():
    ei = np.array([[0, 1], [1, 2]])
    out_ei, norm = gcn_norm(ei, None, 3, add_self_loops=True)
    assert out_ei.shape[1] == 2 + 3
    # in-degrees with self loops: d = [1, 2, 2]
    d = np.array([1.0, 2.0, 2.0])
    np.testing.assert_allclose(norm[0], d[0] ** -0.5 * d[1] ** -0.5)
    np.testing.assert_allclose(norm[1], d[1] ** -0.5 * d[2] ** -0.5)


def test_generate_g_from_h_symmetric():
    data = tiny_data()
    H = construct_h_dense(data)
    G = generate_g_from_h(H)
    assert G.shape == (5, 5)
    np.testing.assert_allclose(G, G.T, atol=1e-6)
    assert np.all(np.isfinite(G))


def test_hnhn_norms_match_dense_formula():
    data = add_self_loops(tiny_data())
    out = generate_norm_hnhn(data, alpha=-1.5, beta=-0.5)
    H = construct_h_dense(data)
    DV, DE = H.sum(1), H.sum(0)
    np.testing.assert_allclose(out.extras["D_e_alpha"], DE ** -1.5, rtol=1e-5)
    np.testing.assert_allclose(out.extras["D_v_beta"], DV ** -0.5, rtol=1e-5)
    want_dv_alpha = np.array([(DE[H[i] == 1] ** -1.5).sum() for i in range(5)])
    np.testing.assert_allclose(out.extras["D_v_alpha_inv"], 1 / want_dv_alpha, rtol=1e-5)
    want_de_beta = np.array(
        [(DV[H[:, e] == 1] ** -0.5).sum() for e in range(data.num_hyperedges)]
    )
    np.testing.assert_allclose(out.extras["D_e_beta_inv"], 1 / want_de_beta, rtol=1e-5)


def test_unignn_degrees_shapes():
    data = add_self_loops(tiny_data())
    degV, degE = unignn_degrees(data)
    assert degV.shape == (5, 1)
    assert degE.shape == (data.num_hyperedges, 1)
    assert np.all(np.isfinite(degV)) and np.all(np.isfinite(degE))
    # isolated-node rule: inf -> 1 (train.py:410)
    iso = HyperData(
        x=np.zeros((3, 2), np.float32),
        y=np.zeros(3, np.int64),
        node=np.array([0, 1]),
        edge=np.array([0, 0]),
        num_nodes=3,
        num_hyperedges=1,
    )
    degV, _ = unignn_degrees(iso)
    assert degV[2, 0] == 1.0


def test_hypergcn_edge_dict():
    d = hypergcn_edge_dict(tiny_data())
    assert d == {0: [0, 1, 2], 1: [2, 3], 2: [3]}


def test_rand_split_proportions():
    rng = np.random.default_rng(0)
    y = np.concatenate([np.zeros(100), np.ones(100)]).astype(np.int64)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=rng)
    assert len(split["train"]) == 100
    assert len(split["valid"]) == 50
    assert len(split["test"]) == 50
    allidx = np.concatenate([split["train"], split["valid"], split["test"]])
    assert len(np.unique(allidx)) == 200


def test_rand_split_ignores_negative_labels():
    rng = np.random.default_rng(0)
    y = np.array([0, 1, -1, 1, 0, -1])
    split = rand_train_test_idx(y, 0.5, 0.25, rng=rng)
    allidx = np.concatenate([split["train"], split["valid"], split["test"]])
    assert 2 not in allidx and 5 not in allidx


def test_to_incidence_padding_discipline(hyperdata):
    inc = hyperdata.to_incidence(bucket=256)
    assert inc.nnz_padded % 256 == 0
    assert inc.nnz == hyperdata.nnz
    pad = ~np.asarray(inc.mask)
    assert np.all(np.asarray(inc.node)[pad] == inc.num_nodes)
    assert np.all(np.asarray(inc.edge)[pad] == inc.num_edges)
    assert np.all(np.asarray(inc.norm)[pad] == 0.0)
    # canonical order: sorted by hyperedge id
    e = np.asarray(inc.edge)[~pad]
    assert np.all(np.diff(e) >= 0)
    # degree helpers match numpy
    vdeg = np.bincount(hyperdata.node, minlength=inc.num_nodes)
    np.testing.assert_allclose(np.asarray(inc.node_degree()), vdeg)
    edeg = np.bincount(hyperdata.edge, minlength=inc.num_edges)
    np.testing.assert_allclose(np.asarray(inc.edge_degree()), edeg)
