"""Explicit edge-partitioned sharded exchange: shard_map + collectives.

The GSPMD path (``parallel/mesh.py``) lets XLA infer the partitioning.
This module is the hand-laid-out version SURVEY.md §7.7 calls for — the
distributed analog of sequence parallelism, built so every per-chip
reduce stays SORTED and routes through the Pallas kernel:

  * the destination id space is cut into ``D`` equal row blocks; each
    shard owns the incidence entries whose dst falls in its block
    (entries are dst-sorted, so a shard's entries are one contiguous
    slice — segments NEVER straddle shards and the forward needs **no
    communication at all**: each chip gathers from the replicated source
    table and sorted-segment-reduces into its own output rows);
  * the backward computes per-shard partial ``dw`` (sorted reduce over
    the shard's entries grouped by src) and combines with ONE
    ``psum`` over the edge axis — the only collective, riding ICI;
  * self-loop slots (N-slot layout, see graph/incidence.py) stay dense
    and replicated, outside the shard_map.

Row-block partitioning is simple and correct; entry counts per shard can
skew under power-law degree distributions (SURVEY.md §7 "hard parts").
The segment-aware alternative (balance entries, cut at segment
boundaries, variable row blocks) trades that skew for a ragged
reassembly of the output table; revisit if profiles show imbalance.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from allset_tpu.graph import native
from allset_tpu.graph.incidence import Incidence
from allset_tpu.ops.exchange import _sorted_sum
from allset_tpu.ops.pallas_segment import pad_for_kernel

Array = jax.Array


def _shard_view(s_blk, chunk, mesh):
    """Static view for ops.exchange._kernel_ok inside shard_map:
    in_shard=True lifts the single-device gate (each shard runs its own
    Pallas call on its own chip); the platform comes from the MESH's
    devices, not the process default (a CPU mesh can be traced while the
    default backend is a TPU — dryrun_multichip under axon)."""
    from allset_tpu.ops.exchange import _KernelView

    platform = mesh.devices.flat[0].platform
    return _KernelView(s_blk, chunk, in_shard=True, platform=platform)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDirection:
    """One direction of the bipartite exchange, pre-partitioned into D
    shards (leading axis D on every array; sharded over the mesh's edge
    axis at dispatch). Mirrors graph.incidence.Direction's sl fields."""

    src: Array  # i32[D, nnz_pad] global gather row ids (dst-sorted order)
    dst_local: Array  # i32[D, nnz_pad] dst - d*rows_per_shard (OOB at pad)
    norm: Array  # f32[D, nnz_pad]
    block_indptr: Array  # i32[D, rows_per_shard // s_blk + 1]
    src_sorted: Array  # i32[D, nnz_pad] src ids sorted within shard
    dst_srcsort_local: Array  # i32[D, nnz_pad] dst_local in src-sorted order
    norm_srcsort: Array  # f32[D, nnz_pad]
    src_block_indptr: Array  # i32[D, num_src_padded // s_blk + 1]
    sl_mask: Optional[Array]  # f32[num_nodes] (replicated)
    sl_norm: Optional[Array]  # f32[num_nodes]
    dst_count: Optional[Array]  # f32[num_dst_total] full degrees ('mean')
    num_src: int = dataclasses.field(metadata=dict(static=True))
    num_src_padded: int = dataclasses.field(metadata=dict(static=True))
    num_dst: int = dataclasses.field(metadata=dict(static=True))
    num_dst_padded: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    s_blk: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    sl_mode: str = dataclasses.field(metadata=dict(static=True))
    num_dst_total: int = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def num_shards(self) -> int:
        return self.src.shape[0]


def _build_one(dst, src, norm, num_src, num_dst, D, s_blk, chunk):
    """Host-side partition of one direction (entries dst-sorted)."""
    nnz = len(dst)
    rows = -(-num_dst // (D * s_blk)) * s_blk  # rows per shard, s_blk-aligned
    num_dst_padded = rows * D
    cuts = np.searchsorted(dst, np.arange(D + 1) * rows).astype(np.int64)
    max_e = int((cuts[1:] - cuts[:-1]).max()) if nnz else 0
    nnz_pad = pad_for_kernel(max(max_e, 1), chunk)

    num_src_padded = -(-num_src // s_blk) * s_blk

    S = dict(
        src=np.full((D, nnz_pad), num_src, np.int32),
        dst_local=np.full((D, nnz_pad), rows, np.int32),
        norm=np.zeros((D, nnz_pad), np.float32),
        block_indptr=np.zeros((D, rows // s_blk + 1), np.int32),
        src_sorted=np.full((D, nnz_pad), num_src, np.int32),
        dst_srcsort_local=np.full((D, nnz_pad), rows, np.int32),
        norm_srcsort=np.zeros((D, nnz_pad), np.float32),
        src_block_indptr=np.zeros((D, num_src_padded // s_blk + 1), np.int32),
    )
    for d in range(D):
        lo, hi = int(cuts[d]), int(cuts[d + 1])
        k = hi - lo
        sdst = dst[lo:hi] - d * rows
        ssrc = src[lo:hi]
        snorm = norm[lo:hi]
        S["src"][d, :k] = ssrc
        S["dst_local"][d, :k] = sdst
        S["norm"][d, :k] = snorm
        S["block_indptr"][d] = np.searchsorted(
            sdst, np.arange(0, rows + s_blk, s_blk)
        )
        order = native.stable_argsort(ssrc, num_src + 1)
        S["src_sorted"][d, :k] = ssrc[order]
        S["dst_srcsort_local"][d, :k] = sdst[order]
        S["norm_srcsort"][d, :k] = snorm[order]
        S["src_block_indptr"][d] = np.searchsorted(
            ssrc[order], np.arange(0, num_src_padded + s_blk, s_blk)
        )
    return S, rows, num_dst_padded, num_src_padded


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedExchange:
    """Both directions of the exchange, ready for dir_spmm dispatch."""

    v2e: ShardedDirection
    e2v: ShardedDirection

    @classmethod
    def build(cls, inc: Incidence, mesh: Mesh, axis: str = "edge") -> "ShardedExchange":
        """Partition ``inc`` (its real sub-incidence when the self-loop
        split is available) over the mesh's ``axis``."""
        D = int(mesh.shape[axis])
        core = inc.real if inc.real is not None else inc
        split = inc.real is not None
        s_blk = core.kernel_s_blk or 256
        chunk = core.kernel_chunk or 512

        n = np.asarray(core.node[: core.nnz])
        e = np.asarray(core.edge[: core.nnz])
        w = np.asarray(core.norm[: core.nnz])

        # V2E: entries already edge-sorted
        Sv, rows_v, mpad, npad_src = _build_one(
            e, n, w, core.num_nodes, core.num_edges, D, s_blk, chunk
        )
        ecount = np.bincount(e, minlength=core.num_edges).astype(np.float32)
        ncount = np.bincount(n, minlength=core.num_nodes).astype(np.float32)
        if split:
            ecount_total = np.concatenate([ecount, np.asarray(inc.sl_mask)])
            ncount_total = np.asarray(inc.node_count)
        else:
            ecount_total, ncount_total = ecount, ncount

        dv = ShardedDirection(
            **{k: jnp.asarray(v) for k, v in Sv.items()},
            sl_mask=inc.sl_mask if split else None,
            sl_norm=inc.sl_norm_full if split else None,
            dst_count=jnp.asarray(ecount_total),
            num_src=core.num_nodes,
            num_src_padded=npad_src,
            num_dst=core.num_edges,
            num_dst_padded=mpad,
            rows_per_shard=rows_v,
            s_blk=s_blk,
            chunk=chunk,
            sl_mode="append" if split else "none",
            num_dst_total=(core.num_edges + inc.num_nodes) if split else core.num_edges,
            mesh=mesh,
            axis=axis,
        )

        # E2V: node-sorted entry order
        order = native.stable_argsort(n, core.num_nodes + 1)
        Se, rows_e, npad_dst, mpad_src = _build_one(
            n[order], e[order], w[order],
            core.num_edges, core.num_nodes, D, s_blk, chunk,
        )
        de = ShardedDirection(
            **{k: jnp.asarray(v) for k, v in Se.items()},
            sl_mask=inc.sl_mask if split else None,
            sl_norm=inc.sl_norm_full if split else None,
            dst_count=jnp.asarray(ncount_total),
            num_src=core.num_edges,
            num_src_padded=mpad_src,
            num_dst=core.num_nodes,
            num_dst_padded=npad_dst,
            rows_per_shard=rows_e,
            s_blk=s_blk,
            chunk=chunk,
            sl_mode="add" if split else "none",
            num_dst_total=core.num_nodes,
            mesh=mesh,
            axis=axis,
        )
        return cls(v2e=dv, e2v=de)

    def shard(self) -> "ShardedExchange":
        """Place the per-shard arrays on the mesh (axis 0 sharded)."""
        from jax.sharding import NamedSharding

        def place(d: ShardedDirection) -> ShardedDirection:
            sh = NamedSharding(d.mesh, P(d.axis))
            rep = NamedSharding(d.mesh, P())
            kw = {}
            for f in (
                "src", "dst_local", "norm", "block_indptr", "src_sorted",
                "dst_srcsort_local", "norm_srcsort", "src_block_indptr",
            ):
                kw[f] = jax.device_put(getattr(d, f), sh)
            for f in ("sl_mask", "sl_norm", "dst_count"):
                v = getattr(d, f)
                kw[f] = jax.device_put(v, rep) if v is not None else None
            return dataclasses.replace(d, **kw)

        return ShardedExchange(v2e=place(self.v2e), e2v=place(self.e2v))


# --- the sharded spmm ------------------------------------------------------


def _local_fwd(meta, w, src, dst_local, norm, indptr):
    rows_per_shard, _, s_blk, chunk, has_norm, (_, _, mesh), _ = meta
    msgs = jnp.take(w, src[0], axis=0, mode="clip")
    if has_norm:
        msgs = msgs * norm[0][:, None].astype(msgs.dtype)
    return _sorted_sum(
        msgs, dst_local[0], indptr[0], rows_per_shard, rows_per_shard,
        _shard_view(s_blk, chunk, mesh),
    )


def _local_bwd(meta, g_shard, dst_srcsort_local, src_sorted, norm_ss, src_indptr):
    _, (num_src, num_src_padded), s_blk, chunk, has_norm, (_, _, mesh), axis = meta
    rows = jnp.take(g_shard, dst_srcsort_local[0], axis=0, mode="clip")
    if has_norm:
        rows = rows * norm_ss[0][:, None].astype(rows.dtype)
    part = _sorted_sum(
        rows, src_sorted[0], src_indptr[0], num_src, num_src_padded,
        _shard_view(s_blk, chunk, mesh),
    )
    return jax.lax.psum(part, axis)


# meta = (rows_per_shard, (num_src, num_src_padded), s_blk, chunk,
#         has_norm, (num_dst, num_dst_padded, mesh, axis)... flattened below)


def _sharded_core_impl(meta, w, src, dst_local, norm, indptr, *_):
    rows_per_shard, _, s_blk, chunk, has_norm, (num_dst, num_dst_padded, mesh), axis = meta
    fwd = jax.shard_map(
        functools.partial(_local_fwd, meta),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    out = fwd(w, src, dst_local, norm, indptr)
    return out[:num_dst]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sharded_core(meta, w, src, dst_local, norm, indptr,
                  dst_srcsort_local, src_sorted, norm_ss, src_indptr):
    return _sharded_core_impl(meta, w, src, dst_local, norm, indptr)


def _sharded_core_fwd(meta, w, src, dst_local, norm, indptr,
                      dst_srcsort_local, src_sorted, norm_ss, src_indptr):
    out = _sharded_core_impl(meta, w, src, dst_local, norm, indptr)
    res = (dst_srcsort_local, src_sorted, norm_ss, src_indptr,
           jnp.zeros((0,), w.dtype))
    return out, res


def _sharded_core_bwd(meta, res, g):
    dst_srcsort_local, src_sorted, norm_ss, src_indptr, dtok = res
    _, _, _, _, _, (num_dst, num_dst_padded, mesh), axis = meta
    gb = g.astype(dtok.dtype)
    pad = num_dst_padded - num_dst
    if pad:
        gb = jnp.concatenate(
            [gb, jnp.zeros((pad, gb.shape[1]), gb.dtype)], axis=0
        )
    bwd = jax.shard_map(
        functools.partial(_local_bwd, meta),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    dw = bwd(gb, dst_srcsort_local, src_sorted, norm_ss, src_indptr)
    return (dw.astype(dtok.dtype), None, None, None, None,
            None, None, None, None)


_sharded_core.defvjp(_sharded_core_fwd, _sharded_core_bwd)


def sharded_spmm(
    w: Array, sd: ShardedDirection, use_norm: bool = True, reduce: str = "add"
) -> Array:
    """out[m] = sum_{i: dst_i = m} norm_i * w[src_i], edge-partitioned.

    ``use_norm=False`` is the PMA path (unweighted aggregation, matching
    ops.exchange.dir_spmm's norm=None). Norms are static data baked into
    the shard arrays; LearnMask requires the single-chip path. 'mean'
    is composed by the caller (divide by full counts)."""
    meta = (
        sd.rows_per_shard,
        (sd.num_src, sd.num_src_padded),
        sd.s_blk,
        sd.chunk,
        use_norm,
        (sd.num_dst, sd.num_dst_padded, sd.mesh),
        sd.axis,
    )
    w_core = w[: sd.num_src] if sd.sl_mode == "add" else w
    core = _sharded_core(
        meta, w_core, sd.src, sd.dst_local, sd.norm, sd.block_indptr,
        sd.dst_srcsort_local, sd.src_sorted, sd.norm_srcsort,
        sd.src_block_indptr,
    )
    if sd.sl_mode == "append":
        rows = w.astype(core.dtype)
        if use_norm:
            rows = rows * sd.sl_norm[:, None].astype(core.dtype)
        return jnp.concatenate([core, rows], axis=0)
    if sd.sl_mode == "add":
        rows = w[sd.num_src :].astype(core.dtype)
        scale = sd.sl_norm if use_norm else sd.sl_mask
        return core + rows * scale[:, None].astype(core.dtype)
    return core
