"""Ablate the sorted-segment-sum kernel to locate its cost (r4, VERDICT #5).

The bench-step profile (benchmarks/trace_step.py) shows the four segsum
calls cost ~6.9 ms of the 23.45 ms step — ~2.26 us per 512-entry chunk,
~3.5x the chunk's MXU matmul time — so something besides the matmul
dominates. Variants isolate the three per-chunk phases:

  full     : DMA + one-hot build + MXU matmul (the production kernel)
  noonehot : DMA + matmul against a PRECOMPUTED VMEM one-hot (no VPU build)
  nomatmul : DMA + one-hot build, accumulate a cheap VPU surrogate
  dmaonly  : DMA, accumulate a cheap VPU surrogate

full - noonehot ~= one-hot build cost; noonehot - dmaonly ~= matmul cost;
dmaonly = the HBM streaming floor.

Run (TPU): python benchmarks/exp_segsum_ablate.py
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


def _flat_kernel(CHUNK, F, in_dtype):
    """DMA-rate probe: stream the SAME bytes as the chunked 2-D row-slice
    DMAs, but as flat 1-D transfers (one descriptor per chunk if Mosaic
    honors contiguity). Accumulates a surrogate so nothing is DCE'd."""

    def kernel(msgs_hbm, seed_ref, out_ref, acc, msc, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                msgs_hbm.at[pl.ds((i * 8 + c) * CHUNK, CHUNK), :],
                msc.at[slot], sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            # seed makes each scan iteration's kernel data-dependent on the
            # previous one — XLA can't hoist the call out of the loop
            acc[...] = seed_ref[...]

        get_dma(0, 0).start()

        def body(c, _):
            slot = c % 2

            @pl.when(c + 1 < 8)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            # static slot 0 read (the probe measures DMA rate only)
            acc[...] += msc[0, :16].astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

        @pl.when(i == n - 1)
        def _():
            out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def run_flat(msgs_flat, seed, chunk):
    F = msgs_flat.shape[1]
    total = msgs_flat.shape[0]
    nblocks = total // (chunk * 8)
    kern = _flat_kernel(chunk, F, msgs_flat.dtype)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, F), jnp.float32),
            pltpu.VMEM((2, chunk, F), msgs_flat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(msgs_flat, seed)


def _kernel(S_BLK, CHUNK, F, in_dtype, mode):
    def kernel(indptr_ref, msgs_hbm, dst_hbm, out_ref, acc, msc, dsc, sems,
               dsem, const_oh):
        b = pl.program_id(0)
        start = indptr_ref[b]
        end = indptr_ref[b + 1]
        start_al = pl.multiple_of((start // LANE) * LANE, LANE)
        nchunks = pl.cdiv(end - start_al, CHUNK)

        acc[...] = jnp.zeros_like(acc)
        if mode == "noonehot":
            # data-independent one-hot stand-in, built once per block
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, S_BLK), 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, S_BLK), 0)
            const_oh[...] = jnp.where(cols == rows % S_BLK, 1.0, 0.0).astype(
                in_dtype
            )

        DEPTH = 4 if mode in ("depth4", "nodst4") else 2
        no_dst = mode in ("nodst", "nodst4")

        def get_dma(slot, c):
            off = pl.multiple_of(start_al + c * CHUNK, LANE)
            dmas = [
                pltpu.make_async_copy(
                    msgs_hbm.at[pl.ds(off, CHUNK), :], msc.at[slot], sems.at[slot]
                )
            ]
            if not no_dst:
                dmas.append(
                    pltpu.make_async_copy(
                        dst_hbm.at[pl.ds(off // LANE, CHUNK // LANE), :],
                        dsc.at[slot],
                        dsem.at[slot],
                    )
                )
            return dmas

        @pl.when(nchunks > 0)
        def _():
            for c0 in range(DEPTH - 1):
                @pl.when(c0 < nchunks)
                def _():
                    for d in get_dma(c0, c0):
                        d.start()

            def body(c, _):
                slot = c % DEPTH
                nxt = (c + DEPTH - 1) % DEPTH

                @pl.when(c + DEPTH - 1 < nchunks)
                def _():
                    for d in get_dma(nxt, c + DEPTH - 1):
                        d.start()

                for d in get_dma(slot, c):
                    d.wait()

                R = CHUNK // LANE
                if mode in ("full", "nomatmul"):
                    rel = dsc[slot][:, :, None] - b * S_BLK
                    cols = jax.lax.broadcasted_iota(
                        jnp.int32, (R, LANE, S_BLK), 2
                    )
                    onehot_t = (
                        jnp.where(cols == rel, 1.0, 0.0)
                        .astype(in_dtype)
                        .reshape(CHUNK, S_BLK)
                    )
                elif mode == "noonehot":
                    onehot_t = const_oh[...]
                else:
                    onehot_t = None

                if mode in ("full", "noonehot"):
                    acc[...] += jax.lax.dot_general(
                        onehot_t,
                        msc[slot],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    # cheap surrogate keeping the DMA'd data (and the
                    # one-hot, for nomatmul) alive
                    surro = msc[slot][:S_BLK].astype(jnp.float32)
                    if mode == "nomatmul":
                        surro = surro + onehot_t[:S_BLK, :1].astype(jnp.float32)
                    acc[...] += surro
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_segments", "s_blk", "chunk", "mode")
)
def run_variant(msgs, dst2d, block_indptr, num_segments, s_blk, chunk, mode):
    nnz_pad, F = msgs.shape
    num_blocks = num_segments // s_blk
    kern = _kernel(s_blk, chunk, F, msgs.dtype, mode)
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
            pltpu.VMEM((4, chunk, F), msgs.dtype),
            pltpu.VMEM((4, chunk // LANE, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((chunk, s_blk), msgs.dtype),
        ],
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_segments, F), msgs.dtype),
        grid_spec=grid_spec,
        compiler_params=params,
    )(block_indptr, msgs, dst2d)


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def scan_time(fn, args, K=16, n=3):
    @jax.jit
    def run(msgs, *rest):
        def body(c, _):
            out = fn(c, *rest)
            half = out.shape[0] // 2
            idx = (slice(None, half),) + (slice(None),) * (out.ndim - 1)
            c = c.at[idx].add(out[idx] * 1e-6)
            return c, None

        return jax.lax.scan(body, msgs, None, length=K)[0]

    _sync(run(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    import bench
    from allset_tpu.ops.pallas_segment import build_block_indptr, pad_for_kernel

    F = int(os.environ.get("F", 384))
    s_blk, chunk = 256, 512
    _, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    inc = batch.inc
    node_ids = np.sort(np.asarray(inc.node)[: inc.nnz])
    nnz = len(node_ids)
    m_pad = (inc.num_nodes + s_blk - 1) // s_blk * s_blk
    nnz_pad = pad_for_kernel(nnz, chunk)
    ids_pad = np.full(nnz_pad, m_pad + 7, np.int32)
    ids_pad[:nnz] = node_ids
    indptr = jnp.asarray(build_block_indptr(node_ids, m_pad, s_blk))
    dst2d = jnp.asarray(ids_pad).reshape(-1, 128)
    msgs = jax.random.normal(jax.random.PRNGKey(0), (nnz_pad, F), jnp.bfloat16)
    print(f"node-side nnz={nnz} segs={inc.num_nodes} F={F} "
          f"s_blk={s_blk} chunk={chunk}")
    only = os.environ.get("ABLATE_ONLY")
    modes = only.split(",") if only else [
        "full", "noonehot", "nomatmul", "dmaonly", "depth4", "nodst",
        "nodst4",
    ]
    for mode in modes:
        if mode == "flat":
            chunk = int(os.environ.get("ABLATE_CHUNK", chunk))
            nrows = nnz_pad // (chunk * 8) * (chunk * 8)
            mflat = msgs[:nrows]
            nflat = nrows * F
            import time as _t

            @jax.jit
            def runK(m, seed):
                def body(c, _):
                    return run_flat(m, c, chunk) * (1 + 1e-7), None

                return jax.lax.scan(body, seed, None, length=16)[0]

            seed = jnp.zeros((16, F), jnp.float32)
            _sync(runK(mflat, seed))
            best = 1e9
            for _ in range(3):
                t0 = _t.perf_counter()
                _sync(runK(mflat, seed))
                best = min(best, _t.perf_counter() - t0)
            t = best / 16
            gbs = nflat * 2 / t / 1e9
            print(f"  {mode:9s}: {t*1e3:7.3f} ms  ({gbs:6.1f} GB/s flat-DMA)")
            continue
        t = scan_time(
            lambda m: run_variant(m, dst2d, indptr, m_pad, s_blk, chunk, mode),
            (msgs,),
        )
        print(f"  {mode:9s}: {t*1e3:7.3f} ms  ({t/ (nnz_pad/chunk) * 1e6:5.2f} us/chunk-equiv)")


if __name__ == "__main__" and os.environ.get("ABLATE_ONLY") != "dual":
    main()


# --- dual-source probe: do two HBM arrays get two DMA queues? --------------


def _dual_kernel(CHUNK, F, in_dtype):
    def kernel(a_hbm, b_hbm, seed_ref, out_ref, acc, sa, sb, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma_a(slot, c):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds((i * 4 + c) * CHUNK, CHUNK), :],
                sa.at[slot], sems.at[0, slot],
            )

        def dma_b(slot, c):
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds((i * 4 + c) * CHUNK, CHUNK), :],
                sb.at[slot], sems.at[1, slot],
            )

        @pl.when(i == 0)
        def _():
            acc[...] = seed_ref[...]

        dma_a(0, 0).start()
        dma_b(0, 0).start()

        def body(c, _):
            slot = c % 2

            @pl.when(c + 1 < 4)
            def _():
                dma_a((c + 1) % 2, c + 1).start()
                dma_b((c + 1) % 2, c + 1).start()

            dma_a(slot, c).wait()
            dma_b(slot, c).wait()
            acc[...] += sa[0, :16].astype(jnp.float32)
            acc[...] += sb[0, :16].astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, 4, body, 0)

        @pl.when(i == n - 1)
        def _():
            out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def run_dual(a, b, seed, chunk):
    F = a.shape[1]
    nblocks = a.shape[0] // (chunk * 4)
    kern = _dual_kernel(chunk, F, a.dtype)
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, F), jnp.float32),
            pltpu.VMEM((2, chunk, F), a.dtype),
            pltpu.VMEM((2, chunk, F), a.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(a, b, seed)


def dual_main():
    import time as _t

    F, chunk = 384, 512
    rows = 512 * chunk  # per source
    a = jax.random.normal(jax.random.PRNGKey(0), (rows, F), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (rows, F), jnp.bfloat16)
    seed = jnp.zeros((16, F), jnp.float32)

    @jax.jit
    def runK(a, b, seed):
        def body(c, _):
            return run_dual(a, b, c, chunk) * (1 + 1e-7), None

        return jax.lax.scan(body, seed, None, length=16)[0]

    _sync(runK(a, b, seed))
    best = 1e9
    for _ in range(3):
        t0 = _t.perf_counter()
        _sync(runK(a, b, seed))
        best = min(best, _t.perf_counter() - t0)
    t = best / 16
    gbs = 2 * rows * F * 2 / t / 1e9
    print(f"  dual-src : {t*1e3:7.3f} ms  ({gbs:6.1f} GB/s combined)")


if __name__ == "__main__" and os.environ.get("ABLATE_ONLY") == "dual":
    dual_main()
    sys.exit(0)
