"""Segment-sum kernel: is the [R,LANE,S_BLK] -> [CHUNK,S_BLK] one-hot
reshape (a Mosaic relayout, paid per chunk) the gap to the MXU floor?

Variants at bench shapes (452K entries -> 131K segments, W=384 bf16):
  A. production: reshape + one [CHUNK,S_BLK]^T x [CHUNK,F] dot
  B. no reshape: R small dots on free [LANE,S_BLK] / [LANE,F] slices
  C. B with the compare built per-slice

MXU floor: nnz * S_BLK * F * 2 = 89 GFLOP ~= 0.6 ms at 155 TF/s.
"""

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


def _kernel(S_BLK, CHUNK, F, in_dtype, variant):
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
            if variant != "NOIDS":
                d0.start()

            def body(c, _):
                slot = c % 2

                if variant == "NOIDS":
                    @pl.when(c + 1 < nchunks)
                    def _():
                        m1, _ = get_dma((c + 1) % 2, c + 1)
                        m1.start()

                    mc, _ = get_dma(slot, c)
                    mc.wait()
                elif variant != "NODMA":
                    @pl.when(c + 1 < nchunks)
                    def _():
                        m1, d1 = get_dma((c + 1) % 2, c + 1)
                        m1.start()
                        d1.start()

                    mc, dc = get_dma(slot, c)
                    mc.wait()
                    dc.wait()

                R = CHUNK // LANE
                prec = jax.lax.Precision.DEFAULT

                if variant == "NOIDS":
                    acc[...] += msc[slot, :S_BLK, :].astype(jnp.float32)
                elif variant == "NOMXU":
                    acc[...] += msc[slot, :S_BLK, :].astype(jnp.float32)
                    acc[0:4, 0:128] += dsc[slot].astype(jnp.float32)
                elif variant == "NODMA":
                    rel = dsc[slot][:, :, None] - b * S_BLK
                    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                    onehot_t = (
                        jnp.where(cols == rel, 1.0, 0.0)
                        .astype(in_dtype)
                        .reshape(CHUNK, S_BLK)
                    )
                    acc[...] += jax.lax.dot_general(
                        onehot_t, msc[slot],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                elif variant == "A":
                    rel = dsc[slot][:, :, None] - b * S_BLK
                    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                    onehot_t = (
                        jnp.where(cols == rel, 1.0, 0.0)
                        .astype(in_dtype)
                        .reshape(CHUNK, S_BLK)
                    )
                    acc[...] += jax.lax.dot_general(
                        onehot_t, msc[slot],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                elif variant == "B":
                    rel = dsc[slot][:, :, None] - b * S_BLK
                    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                    oh3 = jnp.where(cols == rel, 1.0, 0.0).astype(in_dtype)
                    total = jnp.zeros((S_BLK, F), jnp.float32)
                    for r in range(R):
                        total += jax.lax.dot_general(
                            oh3[r], msc[slot, r * LANE:(r + 1) * LANE, :],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec,
                        )
                    acc[...] += total
                else:  # C
                    cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, S_BLK), 1)
                    total = jnp.zeros((S_BLK, F), jnp.float32)
                    for r in range(R):
                        rel = dsc[slot][r][:, None] - b * S_BLK
                        oh = jnp.where(cols == rel, 1.0, 0.0).astype(in_dtype)
                        total += jax.lax.dot_general(
                            oh, msc[slot, r * LANE:(r + 1) * LANE, :],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=prec,
                        )
                    acc[...] += total
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_segments", "s_blk", "chunk", "variant")
)
def run(msgs, dst2d, block_indptr, num_segments, s_blk, chunk, variant):
    nnz_pad, F = msgs.shape
    num_blocks = num_segments // s_blk
    kern = _kernel(s_blk, chunk, F, msgs.dtype, variant)
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
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_segments, F), msgs.dtype),
        grid_spec=grid_spec,
    )(block_indptr, msgs, dst2d)


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def scan_time(fn, msgs, n=3, K=16):
    @jax.jit
    def loop(m):
        def body(c, _):
            out = fn(c)
            c = c.at[: out.shape[0], :].add(out * 1e-6)
            return c, None
        return jax.lax.scan(body, m, None, length=K)[0]

    _sync(loop(msgs))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = loop(msgs)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    rng = np.random.default_rng(0)
    nnz = 452608
    M = int(os.environ.get("SEGS", 131072))
    F = int(os.environ.get("WIDTH", 384))
    chunk = int(os.environ.get("CHUNK", 512))
    s_blk = int(os.environ.get("S_BLK", 256))
    ids = np.sort(rng.integers(0, M, size=nnz)).astype(np.int32)
    nnz_pad = ((nnz + chunk - 1) // chunk + 1) * chunk
    m_pad = (M + s_blk - 1) // s_blk * s_blk
    ids_pad = np.full(nnz_pad, m_pad + 7, np.int32)
    ids_pad[:nnz] = ids
    boundaries = np.arange(0, m_pad + s_blk, s_blk)
    indptr = jnp.asarray(np.searchsorted(ids, boundaries).astype(np.int32))
    dst2d = jnp.asarray(ids_pad).reshape(-1, 128)
    msgs = jax.random.normal(jax.random.PRNGKey(0), (nnz_pad, F), jnp.bfloat16)

    want = None
    import sys
    variants = sys.argv[1:] or ["A", "B", "C"]
    for variant in variants:
        f = lambda m: run(m, dst2d, indptr, m_pad, s_blk, chunk, variant)
        out = np.asarray(f(msgs), np.float32)
        if want is None:
            want = out
            ok = True
        else:
            ok = np.allclose(out, want, atol=1e-2, rtol=1e-2) if variant in ("A","B","C") else "n/a"
        t = scan_time(f, msgs)
        print(f"variant {variant} s_blk={s_blk} chunk={chunk}: {t*1e3:6.2f} ms  ok={ok}")


if __name__ == "__main__":
    main()
