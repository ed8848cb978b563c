"""Raw-format loader tests against synthesized fixture files.

The reference had only `__main__` smoke blocks and inline asserts
(SURVEY.md §4); these promote the four raw formats' structural
invariants into real tests without needing the (absent) raw archive.
"""

import os
import os.path as osp
import pickle

import numpy as np
import pytest


def test_load_LE_dataset(tmp_path):
    from allset_tpu.data.loaders import load_LE_dataset

    n, m, f = 5, 3, 4
    d = tmp_path / "toy"
    d.mkdir()
    rng = np.random.default_rng(0)
    # ids cover nodes then hyperedges, arbitrary raw labels; row order
    # defines the id mapping (reference load_other_datasets.py:46-70)
    raw_ids = np.arange(100, 100 + n + m)
    rows = []
    for i, rid in enumerate(raw_ids):
        feats = rng.integers(0, 2, size=f)
        label = i % 2
        rows.append(" ".join([str(rid), *map(str, feats), str(label)]))
    (d / "toy.content").write_text("\n".join(rows) + "\n")
    # each hyperedge gets two member nodes (raw ids); membership chosen so
    # every node id appears (the loader asserts contiguous coverage)
    members = [(0, 1), (2, 3), (4, 0)]
    pairs = []
    for j, mem in enumerate(members):
        for v in mem:
            pairs.append(f"{raw_ids[v]} {raw_ids[n + j]}")
    (d / "toy.edges").write_text("\n".join(pairs) + "\n")

    hd = load_LE_dataset(str(tmp_path), "toy")
    assert hd.num_nodes == n
    assert hd.num_hyperedges == m
    assert hd.x.shape == (n, f)
    assert hd.y.shape == (n,)
    assert hd.node.max() < n and hd.edge.max() < m
    # coalesced: entries sorted by (edge, node), unique
    order = np.lexsort((hd.node, hd.edge))
    assert np.array_equal(order, np.arange(len(order)))


def test_load_citation_dataset(tmp_path):
    import scipy.sparse as sp

    from allset_tpu.data.loaders import load_citation_dataset

    n = 6
    d = tmp_path / "cora"
    d.mkdir()
    rng = np.random.default_rng(0)
    feats = sp.csr_matrix(rng.integers(0, 2, size=(n, 5)).astype(np.float32))
    with open(d / "features.pickle", "wb") as f:
        pickle.dump(feats, f)
    with open(d / "labels.pickle", "wb") as f:
        pickle.dump(list(rng.integers(0, 3, size=n)), f)
    hypergraph = {"a": [0, 1, 2], "b": [2, 3], "c": [4, 5, 0]}
    with open(d / "hypergraph.pickle", "wb") as f:
        pickle.dump(hypergraph, f)

    hd = load_citation_dataset(str(tmp_path), "cora")
    assert hd.num_nodes == n
    assert hd.num_hyperedges == 3
    assert hd.nnz == 8
    assert hd.x.shape == (n, 5)


def test_load_yelp_dataset(tmp_path):
    from allset_tpu.data.loaders import load_yelp_dataset

    n = 4
    lat = "lat,long\n" + "\n".join(f"{i}.5,{-i}.25" for i in range(n))
    (tmp_path / "yelp_restaurant_latlong.csv").write_text(lat + "\n")
    loc = "state_int,city_int\n1,1\n1,2\n2,1\n2,3\n"
    (tmp_path / "yelp_restaurant_locations.csv").write_text(loc)
    names = "name\nGolden Dragon Palace\nBurger Haven\nNoodle House\nPizza Palace\n"
    (tmp_path / "yelp_restaurant_name.csv").write_text(names)
    stars = "stars\n0\n1\n2\n1\n"
    (tmp_path / "yelp_restaurant_business_stars.csv").write_text(stars)
    inc = "node,he\n1,1\n2,1\n3,2\n4,2\n1,3\n4,3\n"
    (tmp_path / "yelp_restaurant_incidence_H.csv").write_text(inc)

    hd = load_yelp_dataset(str(tmp_path))
    assert hd.num_nodes == n
    assert hd.num_hyperedges == 3
    # latlong(2) + states(2) + cities(3) + bag-of-words
    assert hd.x.shape[1] >= 7
    assert hd.nnz == 6


@pytest.mark.parametrize("feature_dim", [None, 100])
def test_load_cornell_dataset(tmp_path, feature_dim):
    from allset_tpu.data.loaders import load_cornell_dataset

    n = 8
    d = tmp_path / "walmart-trips"
    d.mkdir()
    labels = (np.arange(n) % 3) + 1  # 1-based labels
    (d / "node-labels-walmart-trips.txt").write_text(
        "\n".join(map(str, labels)) + "\n"
    )
    hes = ["1,2,3", "4,5", "6,7,8", "1,8"]
    (d / "hyperedges-walmart-trips.txt").write_text("\n".join(hes) + "\n")

    hd = load_cornell_dataset(
        str(tmp_path), "walmart-trips", feature_noise=0.5,
        feature_dim=feature_dim, seed=0,
    )
    assert hd.num_nodes == n
    assert hd.num_hyperedges == 4
    want_dim = feature_dim if feature_dim else 3
    assert hd.x.shape == (n, want_dim)
    assert hd.node.min() == 0  # ids shifted to 0-based
    # noise is seeded: same seed reproduces
    hd2 = load_cornell_dataset(
        str(tmp_path), "walmart-trips", feature_noise=0.5,
        feature_dim=feature_dim, seed=0,
    )
    np.testing.assert_array_equal(hd.x, hd2.x)


def test_registry_cache_roundtrip(tmp_path):
    from allset_tpu.data.registry import load_hyperdata, save_hyperdata
    from allset_tpu.data.synthetic import synthetic_hypergraph

    hd = synthetic_hypergraph(
        num_nodes=20, num_hyperedges=10, num_classes=3, feature_dim=8, seed=1
    )
    p = str(tmp_path / "cache.npz")
    save_hyperdata(p, hd)
    hd2 = load_hyperdata(p)
    np.testing.assert_array_equal(hd.x, hd2.x)
    np.testing.assert_array_equal(hd.y, hd2.y)
    np.testing.assert_array_equal(hd.node, hd2.node)
    np.testing.assert_array_equal(hd.edge, hd2.edge)
    assert hd.num_nodes == hd2.num_nodes
    assert hd.num_hyperedges == hd2.num_hyperedges


def test_cornell_like_hypergraph():
    """Walmart-shaped synthetic (power-law + planted classes + cornell
    features) — the Table-2 protocol stand-in (registry 'synthetic-walmart')."""
    from allset_tpu.data.synthetic import cornell_like_hypergraph

    hd = cornell_like_hypergraph(
        num_nodes=800, num_hyperedges=600, num_classes=5, feature_dim=50,
        feature_noise=0.5, seed=3,
    )
    assert hd.x.shape == (800, 50)
    assert hd.num_hyperedges == 600
    deg = np.bincount(hd.node, minlength=800)
    assert deg.max() > 10 * max(1, np.median(deg[deg > 0]))  # power-law skew
    # planted structure: a hyperedge's members should over-represent one
    # class vs the global rate
    import collections

    hits = 0
    for e in range(50):
        mem = hd.node[hd.edge == e]
        if len(mem) < 3:
            continue
        top = collections.Counter(hd.y[mem]).most_common(1)[0][1]
        hits += top / len(mem) > 1.5 / 5
    assert hits > 25
