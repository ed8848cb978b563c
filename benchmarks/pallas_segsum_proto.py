"""Prototype: Pallas sorted-segment-sum vs XLA scatter on TPU.

Design: grid over output blocks of S_BLK segments; CSR offsets scalar-
prefetched; each block loops over its entry range in CHUNK-row pieces
(contiguous HBM DMA, double-buffered), accumulating via a one-hot MXU
matmul acc += onehot[S_BLK, CHUNK] @ msgs[CHUNK, F].
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(S_BLK, CHUNK, F, nnz_pad, num_blocks):
    def kernel(indptr_ref, msgs_hbm, dst_hbm, out_ref, acc, msc, dsc, sems, dsem):
        b = pl.program_id(0)
        start = indptr_ref[b]
        end = indptr_ref[b + 1]
        # DMA offsets must be 8-row aligned: round down; entries before
        # `start` (previous blocks' segments) self-exclude through the
        # rel-range one-hot comparison.
        start_al = pl.multiple_of((start // 128) * 128, 128)
        nchunks = pl.cdiv(end - start_al, CHUNK)

        acc[...] = jnp.zeros_like(acc)

        def get_dma(slot, c):
            off = pl.multiple_of(start_al + c * CHUNK, 128)
            return (
                pltpu.make_async_copy(
                    msgs_hbm.at[pl.ds(off, CHUNK), :], msc.at[slot], sems.at[slot]
                ),
                pltpu.make_async_copy(
                    dst_hbm.at[pl.ds(off // 128, CHUNK // 128), :], dsc.at[slot], dsem.at[slot]
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

                off = start_al + c * CHUNK
                # entry ids in (CHUNK//128, 128) blocked layout matching dsc
                R = CHUNK // 128
                eids = off + (
                    128 * jax.lax.broadcasted_iota(jnp.int32, (R, 128, 1), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (R, 128, 1), 1)
                )
                valid = (eids >= start) & (eids < end)
                rel = dsc[slot][:, :, None] - b * S_BLK  # [R, 128, 1]
                cols = jax.lax.broadcasted_iota(jnp.int32, (R, 128, S_BLK), 2)
                onehot_t = jnp.where((cols == rel) & valid, 1.0, 0.0).astype(
                    jnp.float32
                ).reshape(CHUNK, S_BLK)
                acc[...] += jax.lax.dot_general(
                    onehot_t, msc[slot],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        out_ref[...] = acc[...]

    return kernel


def pallas_segment_sum(msgs, dst, indptr, num_segments, S_BLK=64, CHUNK=512):
    nnz_pad, F = msgs.shape
    num_blocks = num_segments // S_BLK
    kernel = make_kernel(S_BLK, CHUNK, F, nnz_pad, num_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # msgs stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # dst in HBM, [nnz/8, 8]
        ],
        out_specs=pl.BlockSpec(
            (S_BLK, F), lambda b, ip: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((S_BLK, F), jnp.float32),
            pltpu.VMEM((2, CHUNK, F), jnp.float32),
            pltpu.VMEM((2, CHUNK // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_segments, F), jnp.float32),
        grid_spec=grid_spec,
    )(indptr, msgs, dst)


def main():
    rng = np.random.default_rng(0)
    NNZ, M, F = 1 << 19, 1 << 15, 256
    dst = np.sort(rng.integers(0, M, NNZ)).astype(np.int32)
    # pad msgs/dst to bucket; padded dst -> M (dropped by CSR since indptr stops)
    pad = 1024
    dstp = np.concatenate([dst, np.full(pad, M, np.int32)])
    msgs = rng.normal(size=(NNZ + pad, F)).astype(np.float32)
    msgs[NNZ:] = 0
    indptr = np.searchsorted(dstp, np.arange(0, M + 1, 64) * 1).astype(np.int32)
    # indptr per S_BLK block boundaries: block b covers segments [b*S, (b+1)*S)
    S_BLK = 64
    indptr = np.searchsorted(dstp, np.arange(0, M + S_BLK, S_BLK)).astype(np.int32)

    msgs_j = jnp.asarray(msgs)
    dst_flat = jnp.asarray(dstp)
    dst_j = dst_flat.reshape(-1, 128)
    ip_j = jnp.asarray(indptr)

    f_pallas = jax.jit(
        functools.partial(pallas_segment_sum, num_segments=M, S_BLK=S_BLK, CHUNK=512)
    )
    out_p = f_pallas(msgs_j, dst_j, ip_j)
    jax.block_until_ready(out_p)

    f_xla = jax.jit(
        lambda m: jax.ops.segment_sum(m, dst_flat, num_segments=M, indices_are_sorted=True)
    )
    out_x = f_xla(msgs_j)
    jax.block_until_ready(out_x)
    err = float(jnp.abs(out_p - out_x).max())
    print("max abs err:", err)

    # time with loop-carried dependency to defeat hoisting
    def timed(f, steps=16):
        @jax.jit
        def loop(m):
            def body(c, _):
                o = f(c)
                return c.at[: M].add(o * 1e-9), None
            out, _ = jax.lax.scan(body, m, None, length=steps)
            return out
        o = loop(msgs_j); jax.block_until_ready(o)
        t0 = time.perf_counter(); o = loop(msgs_j); jax.block_until_ready(o)
        return (time.perf_counter() - t0) / steps

    tp = timed(lambda m: f_pallas(m, dst_j, ip_j) if False else pallas_segment_sum(m, dst_j, ip_j, M, S_BLK, 512))
    tx = timed(lambda m: jax.ops.segment_sum(m, dst_flat, num_segments=M, indices_are_sorted=True))
    bytes_useful = (NNZ * F + M * F) * 4
    print(f"pallas: {tp*1e3:8.3f} ms  {bytes_useful/tp/1e9:7.1f} GB/s")
    print(f"xla:    {tx*1e3:8.3f} ms  {bytes_useful/tx/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
