"""Test NBUF-deep double buffering for the sorted segment-sum kernel."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(S_BLK, CHUNK, F, in_dtype, NBUF):
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
            for s in range(NBUF - 1):
                @pl.when(s < nchunks)
                def _():
                    m0, d0 = get_dma(s, s)
                    m0.start()
                    d0.start()

            def body(c, _):
                slot = c % NBUF

                @pl.when(c + NBUF - 1 < nchunks)
                def _():
                    m1, d1 = get_dma((c + NBUF - 1) % NBUF, c + NBUF - 1)
                    m1.start()
                    d1.start()

                mc, dc = get_dma(slot, c)
                mc.wait()
                dc.wait()

                R = CHUNK // LANE
                rel = dsc[slot][:, :, None] - b * S_BLK
                cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                onehot_t = (
                    jnp.where(cols == rel, 1.0, 0.0)
                    .astype(in_dtype)
                    .reshape(CHUNK, S_BLK)
                )
                acc[...] += jax.lax.dot_general(
                    onehot_t,
                    msc[slot],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        out_ref[...] = acc[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "s_blk", "chunk", "nbuf"))
def run(msgs, dst2d, block_indptr, num_segments, s_blk, chunk, nbuf):
    nnz_pad, F = msgs.shape
    num_blocks = num_segments // s_blk
    kern = _kernel(s_blk, chunk, F, msgs.dtype, nbuf)
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
            pltpu.VMEM((nbuf, chunk, F), msgs.dtype),
            pltpu.VMEM((nbuf, chunk // LANE, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_segments, F), jnp.float32),
        grid_spec=grid_spec,
    )(block_indptr, msgs, dst2d)


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    # node-side shape from the bench: 452608 entries over 131072 segments
    nnz = 452608
    M = int(os.environ.get("SEGS", 131072))
    F = 384
    ids = np.sort(rng.integers(0, M, size=nnz)).astype(np.int32)
    chunk = int(os.environ.get("CHUNK", 512))
    s_blk = int(os.environ.get("S_BLK", 256))
    nnz_pad = ((nnz + chunk - 1) // chunk + 1) * chunk
    m_pad = (M + s_blk - 1) // s_blk * s_blk
    ids_pad = np.full(nnz_pad, m_pad + 7, np.int32)
    ids_pad[:nnz] = ids
    boundaries = np.arange(0, m_pad + s_blk, s_blk)
    indptr = jnp.asarray(np.searchsorted(ids, boundaries).astype(np.int32))
    dst2d = jnp.asarray(ids_pad).reshape(-1, 128)
    msgs = jax.random.normal(jax.random.PRNGKey(0), (nnz_pad, F), jnp.bfloat16)
    for nbuf in (2, 3, 4, 6):
        f = lambda m, ip: run(m, dst2d, ip, m_pad, s_blk, chunk, nbuf)
        try:
            t = timeit(jax.jit(f), msgs, indptr)
            print(f"s_blk={s_blk} chunk={chunk} nbuf={nbuf}: {t*1e3:6.2f} ms")
        except Exception as e:
            print(f"nbuf={nbuf}: FAIL {type(e).__name__} {str(e)[:80]}")


if __name__ == "__main__":
    main()
