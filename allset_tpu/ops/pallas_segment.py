"""Pallas TPU kernel: sorted segment-sum (the SpMM reduce).

XLA lowers scatter-add conservatively on TPU; for the segment-sorted
incidence this kernel measures ~2x faster (benchmarks/pallas_segsum_proto
on v5e: 3.5ms vs 7.4ms at nnz=524K, F=256).

Design (SURVEY.md §7.2's "CSR-row-block SpMM"):
  * grid over output blocks of ``S_BLK`` segments, executed sequentially;
  * per-block CSR entry offsets are scalar-prefetched (SMEM);
  * each block streams its entry range from HBM in ``CHUNK``-row pieces
    with double-buffered async DMA (contiguous reads — the gather stays
    upstream in XLA, which owns the hardware gather path);
  * accumulation is one MXU matmul per chunk:
    ``acc[S_BLK, F] += onehot[CHUNK, S_BLK]^T-contracted msgs[CHUNK, F]``
    with the one-hot built from the chunk's segment ids;
  * DMA alignment: chunk starts are rounded down to 128 entries; stray
    leading/trailing entries self-exclude because their relative segment
    id falls outside [0, S_BLK) (and padded entries carry ids >= M).

Backward of segment-sum is a row gather of the cotangent — XLA-native.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128


def _kernel(S_BLK, CHUNK, F, in_dtype):
    def kernel(indptr_ref, msgs_hbm, dst_hbm, out_ref, acc, msc, dsc, sems, dsem):
        b = pl.program_id(0)
        start = indptr_ref[b]
        end = indptr_ref[b + 1]
        start_al = pl.multiple_of((start // LANE) * LANE, LANE)
        nchunks = pl.cdiv(end - start_al, CHUNK)

        acc[...] = jnp.zeros_like(acc)

        def get_dma(slot, c):
            off = pl.multiple_of(start_al + c * CHUNK, LANE)
            return (
                pltpu.make_async_copy(
                    msgs_hbm.at[pl.ds(off, CHUNK), :], msc.at[slot], sems.at[slot]
                ),
                pltpu.make_async_copy(
                    dst_hbm.at[pl.ds(off // LANE, CHUNK // LANE), :],
                    dsc.at[slot],
                    dsem.at[slot],
                ),
            )

        @pl.when(nchunks > 0)
        def _():
            m0, d0 = get_dma(0, 0)
            m0.start()
            d0.start()

            def body(c, _):
                slot = c % 2
                nxt = (c + 1) % 2

                @pl.when(c + 1 < nchunks)
                def _():
                    m1, d1 = get_dma(nxt, c + 1)
                    m1.start()
                    d1.start()

                mc, dc = get_dma(slot, c)
                mc.wait()
                dc.wait()

                R = CHUNK // LANE
                rel = dsc[slot][:, :, None] - b * S_BLK  # [R, LANE, 1]
                cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                onehot_t = (
                    jnp.where(cols == rel, 1.0, 0.0)
                    .astype(in_dtype)
                    .reshape(CHUNK, S_BLK)
                )
                # bf16 x bf16 -> f32 is the MXU-native path; HIGHEST (3-pass)
                # only applies to f32 inputs (Mosaic rejects it for bf16)
                prec = (
                    jax.lax.Precision.HIGHEST
                    if in_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                )
                acc[...] += jax.lax.dot_general(
                    onehot_t,
                    msc[slot],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_segments", "s_blk", "chunk", "interpret")
)
def _sorted_segment_sum_fwd(
    msgs: Array,
    dst2d: Array,
    block_indptr: Array,
    num_segments: int,
    s_blk: int,
    chunk: int,
    interpret: bool,
) -> Array:
    nnz_pad, F = msgs.shape
    m_pad = num_segments  # already padded to s_blk multiple by caller
    num_blocks = m_pad // s_blk
    # accumulate in f32 VMEM; store in the input dtype (bf16 in -> bf16
    # out halves the HBM write and the downstream elementwise traffic)
    out_dtype = msgs.dtype
    kern = _kernel(s_blk, chunk, F, msgs.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (s_blk, F), lambda b, ip: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((s_blk, F), jnp.float32),
            pltpu.VMEM((2, chunk, F), msgs.dtype),
            pltpu.VMEM((2, chunk // LANE, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # scratch demand: f32 accumulator + double-buffered chunks + out block.
    # The default scoped-vmem limit is 16 MiB; wide folded widths (vmapped
    # runs, ops/fold.py) legitimately need more — v5e carries 128 MiB.
    # Mosaic's actual stack allocation measures ~2.2x the raw buffer sum
    # (tile padding + pipelined output double-buffering): budget 2.5x.
    per = 2 if msgs.dtype == jnp.bfloat16 else 4
    need = (
        s_blk * F * 4 + 2 * chunk * F * per + s_blk * F * per + 2 * chunk * 4
    )
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(need * 5 // 2, 16 * 2**20), 110 * 2**20)
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m_pad, F), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=params,
    )(block_indptr, msgs, dst2d)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def sorted_segment_sum_pallas(
    msgs: Array,
    dst2d: Array,
    block_indptr: Array,
    num_segments: int,
    s_blk: int = 64,
    chunk: int = 512,
    interpret: bool = False,
) -> Array:
    """segment-sum of ``msgs`` grouped by segment-sorted ids.

    msgs: [nnz_pad, F] (nnz_pad % chunk == 0, plus one spare chunk of
    padding so aligned reads stay in bounds); dst2d: the sorted segment
    ids reshaped [nnz_pad // 128, 128]; block_indptr: [num_blocks + 1]
    entry offsets of each S_BLK-segment block; num_segments must be a
    multiple of s_blk. Returns float32 [num_segments, F].
    """
    return _sorted_segment_sum_fwd(
        msgs, dst2d, block_indptr, num_segments, s_blk, chunk, interpret
    )


def _fwd(msgs, dst2d, block_indptr, num_segments, s_blk, chunk, interpret):
    out = _sorted_segment_sum_fwd(
        msgs, dst2d, block_indptr, num_segments, s_blk, chunk, interpret
    )
    return out, (dst2d, jnp.zeros((0,), msgs.dtype))


def _bwd(num_segments, s_blk, chunk, interpret, res, g):
    dst2d, dtype_token = res
    dst_flat = dst2d.reshape(-1)
    dmsgs = jnp.take(g, dst_flat, axis=0, mode="clip").astype(dtype_token.dtype)
    return dmsgs, None, None


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)


# --- host-side helpers -----------------------------------------------------


def build_block_indptr(
    dst_sorted: np.ndarray, num_segments_padded: int, s_blk: int = 64
) -> np.ndarray:
    """Entry offsets of each S_BLK-segment output block (host, once)."""
    boundaries = np.arange(0, num_segments_padded + s_blk, s_blk)
    return np.searchsorted(dst_sorted, boundaries).astype(np.int32)


def pad_for_kernel(n: int, chunk: int = 512) -> int:
    """nnz padding rule: multiple of chunk plus one spare chunk."""
    return ((n + chunk - 1) // chunk + 1) * chunk


def _tpu_backend() -> bool:
    plat = jax.devices()[0].platform
    return plat in ("tpu", "axon")


def segment_sum_csr(msgs: Array, inc, interpret: Optional[bool] = None) -> Array:
    """Segment-sum over the incidence's edge-sorted direction, through the
    Pallas kernel when the incidence carries CSR aux and we're on TPU;
    XLA scatter otherwise. Output [num_edges, F] float32."""
    usable = (
        inc.edge_block_indptr is not None
        and msgs.shape[0] == inc.nnz_padded
        and inc.nnz_padded % LANE == 0
        and inc.kernel_chunk % LANE == 0
        # Mosaic HBM->VMEM DMA slices must be lane-aligned on the minor dim
        and msgs.shape[1] % LANE == 0
        and msgs.dtype in (jnp.float32, jnp.bfloat16)
    )
    if interpret is None:
        interpret = False
        # single-chip only for now: pallas_call doesn't GSPMD-partition, so
        # under a multi-device mesh the XLA scatter (partitionable) wins;
        # a shard_map wrapper is the multi-chip path.
        usable = usable and _tpu_backend() and jax.device_count() == 1
    if not usable:
        return jax.ops.segment_sum(
            msgs, inc.edge, num_segments=inc.num_edges, indices_are_sorted=True
        ).astype(jnp.float32)
    dst2d = inc.edge.reshape(-1, LANE)
    out = sorted_segment_sum_pallas(
        msgs,
        dst2d,
        inc.edge_block_indptr,
        inc.num_edges_padded,
        inc.kernel_s_blk,
        inc.kernel_chunk,
        interpret,
    )
    return out[: inc.num_edges]
