"""Random-walk neighbor sampler for mini-batch HAN training.

Reference ``src/DGL_HAN/train_sampling.py:93-116``: per metapath
([V-E-V] and [E-V-E]), each seed draws ``num_neighbors`` one-step
metapath random walks; duplicate routes collapse; a self-loop is added;
the frontier becomes a bipartite block (neighbors -> seeds).

TPU re-design: the sampler emits **static-shape** blocks — [B, K+1]
neighbor ids + mask per metapath (K walks + the self-loop), with
duplicates masked out instead of removed, so every batch compiles to the
same program. This is the framework's only dynamic workload, and the
dynamism is confined to host-side numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from allset_tpu.graph.transforms import HyperData


def _adjacency_lists(data: HyperData) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """CSR-style member lists: v2e[v] = incident hyperedges, e2v[e] = members."""
    order = np.argsort(data.node, kind="stable")
    nodes, edges = data.node[order], data.edge[order]
    bounds = np.searchsorted(nodes, np.arange(data.num_nodes + 1))
    v2e = [edges[bounds[v]: bounds[v + 1]] for v in range(data.num_nodes)]

    order = np.argsort(data.edge, kind="stable")
    nodes, edges = data.node[order], data.edge[order]
    bounds = np.searchsorted(edges, np.arange(data.num_hyperedges + 1))
    e2v = [nodes[bounds[e]: bounds[e + 1]] for e in range(data.num_hyperedges)]
    return v2e, e2v


@dataclasses.dataclass
class Block:
    """One metapath block: neighbors[b, k] feed seed b. Static shape."""

    src: np.ndarray  # [B, K+1] global ids in the combined V+E space
    mask: np.ndarray  # [B, K+1] bool; duplicates / failed walks masked off


class HANNeighborSampler:
    """Metapath random-walk sampler over the combined V+E id space
    (hyperedge global id = num_nodes + e, matching
    ``allset_tpu.graph.metapath``)."""

    def __init__(self, data: HyperData, num_neighbors: int = 20, seed: int = 0):
        self.num_nodes = data.num_nodes
        self.num_neighbors = num_neighbors
        self.v2e, self.e2v = _adjacency_lists(data)
        self.rng = np.random.default_rng(seed)

    def _walk_vev(self, v: int) -> int:
        es = self.v2e[v]
        if len(es) == 0:
            return v
        e = es[self.rng.integers(len(es))]
        vs = self.e2v[e]
        return int(vs[self.rng.integers(len(vs))])

    def _walk_eve(self, e: int) -> int:
        vs = self.e2v[e]
        if len(vs) == 0:
            return e
        v = vs[self.rng.integers(len(vs))]
        es = self.v2e[v]
        return int(es[self.rng.integers(len(es))])

    def sample(self, seeds: np.ndarray, num_neighbors: Optional[int] = None) -> Dict[str, Block]:
        """seeds are node ids (< num_nodes).

        Faithful to the reference's behavior: the VEV block holds K
        metapath random walks + a self-loop per seed (duplicate routes
        masked, mirroring DGL's frontier dedup). The second metapath
        ['Es_V','V_Es'] starts in the appended-hyperedge id space where
        node-id seeds have NO out-edges (``DGL_HAN/utils.py:205-222``:
        the top num_v rows of the stacked EvsV are empty), so for node
        classification the reference's second block degenerates to
        self-loops only — reproduced here exactly.
        """
        K = num_neighbors or self.num_neighbors
        B = len(seeds)
        blocks = {}

        src = np.zeros((B, K + 1), dtype=np.int64)
        mask = np.ones((B, K + 1), dtype=bool)
        for b, s in enumerate(seeds):
            walks = [self._walk_vev(int(s)) for _ in range(K)]
            src[b, :K] = walks
            src[b, K] = s  # self loop (train_sampling.py:111-112)
            seen = set()
            for k in range(K + 1):
                if src[b, k] in seen and k < K:
                    mask[b, k] = False
                seen.add(int(src[b, k]))
        blocks["vev"] = Block(src=src, mask=mask)

        src_e = np.repeat(np.asarray(seeds, np.int64)[:, None], K + 1, axis=1)
        mask_e = np.zeros((B, K + 1), dtype=bool)
        mask_e[:, K] = True  # self-loop only
        blocks["eve"] = Block(src=src_e, mask=mask_e)
        return blocks

    def batches(self, nids: np.ndarray, batch_size: int, shuffle: bool = True):
        """Static-size batches; the last partial batch is padded by
        repeating its first seed (padded seeds masked in the loss)."""
        if shuffle:
            nids = self.rng.permutation(nids)
        for i in range(0, len(nids), batch_size):
            chunk = nids[i: i + batch_size]
            pad = batch_size - len(chunk)
            valid = np.concatenate([np.ones(len(chunk), bool), np.zeros(pad, bool)])
            if pad:
                chunk = np.concatenate([chunk, np.full(pad, chunk[0])])
            yield chunk, valid
