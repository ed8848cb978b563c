"""Experiment: in-kernel row gather rates (the fused exchange question).

The exchange currently pays a [nnz, W] HBM round trip between the XLA
gather and the Pallas reduce (~1.1 ms/pass at bench shapes). Fusing them
requires the kernel to gather rows itself; this measures the candidate
mechanisms against the XLA gather baseline (~3.1 ns/row):

  A. dynamic VMEM row reads from a resident table (scalar loop over SMEM
     ids, one [1, F] dynamic-sublane read per entry)
  B. A with 4-way manual unroll
  C. per-row DMA from an HBM table (issue-rate bound)
  D. jnp.take(table, ids) inside the kernel (lowering probe)

Usage: python benchmarks/exp_fused_gather.py [N [NNZ [F]]]

RESULT (v5e, 2026-08, round 3): the fused exchange is INFEASIBLE with
current Mosaic — every in-kernel arbitrary-row gather mechanism is closed:

  * A/B (dynamic VMEM row read): Mosaic rejects the lowering — a
    ``vector.load`` at a dynamic sublane offset needs the index provably
    a multiple of 8 ("cannot statically prove that index in dimension 0
    is a multiple of 8"). Arbitrary entry ids can't satisfy that, and
    8x-replicating the table to align rows would blow VMEM/HBM.
  * C (per-row DMA): compiles shape-wise but is issue-rate-bound — (1, F)
    descriptors of ~768 B can't approach the XLA gather's ~3-7 ns/row
    at 582K rows/pass even with 16 outstanding copies.
  * D (in-kernel jnp.take/take_along_axis): Mosaic's only gather lowering
    is ``tpu.dynamic_gather`` with take_along_axis semantics — indices
    and output must have the TABLE's shape (lowering.py: "Only 2D gather
    is supported", indices == input shape), so a [CHUNK] -> [CHUNK, F]
    row gather from an [N, F] table cannot be expressed unless N == CHUNK.

Conclusion: the [nnz, W] HBM round trip between XLA's gather (which owns
the hardware gather path) and the Pallas reduce (~1.1 ms/pass at bench
shapes) is structural until Mosaic grows a ref-level gather. The kernel
keeps its contiguous-DMA design (ops/pallas_segment.py); exchange-level
wins must come from fewer/narrower passes instead.
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


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def scan_time(body, init, K=16, n=3):
    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (body(c), None), x, None, length=K)[0]

    _sync(run(init))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(init)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


# --- A/B: dynamic VMEM row reads ------------------------------------------


def _vmem_gather_kernel(CHUNK, F, unroll):
    def kernel(table_ref, ids_hbm, out_ref, ids_smem, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(b * CHUNK, CHUNK)], ids_smem, sem
        )
        cp.start()
        cp.wait()

        if unroll == 1:
            def body(i, _):
                idx = ids_smem[i]
                out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx, 1), :]
                return 0
            jax.lax.fori_loop(0, CHUNK, body, 0)
        else:
            def body(i, _):
                base = i * unroll
                for k in range(unroll):
                    idx = ids_smem[base + k]
                    out_ref[pl.ds(base + k, 1), :] = table_ref[pl.ds(idx, 1), :]
                return 0
            jax.lax.fori_loop(0, CHUNK // unroll, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "unroll"))
def vmem_gather(table, ids, chunk=512, unroll=1):
    nnz = ids.shape[0]
    N, F = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nnz // chunk,),
        in_specs=[
            pl.BlockSpec((N, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (chunk, F), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    need = N * F * 2 + 4 * chunk * F * 2
    params = pltpu.CompilerParams(vmem_limit_bytes=min(need + (8 << 20), 127 << 20))
    return pl.pallas_call(
        _vmem_gather_kernel(chunk, F, unroll),
        out_shape=jax.ShapeDtypeStruct((nnz, F), table.dtype),
        grid_spec=grid_spec,
        compiler_params=params,
    )(table, ids)


# --- C: per-row DMA from HBM -----------------------------------------------


def _dma_gather_kernel(CHUNK, F):
    def kernel(table_hbm, ids_hbm, out_ref, ids_smem, buf, isem, sems):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(b * CHUNK, CHUNK)], ids_smem, isem
        )
        cp.start()
        cp.wait()

        NSEM = 16

        def start(i):
            idx = ids_smem[i]
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx, 1), :],
                buf.at[pl.ds(i, 1), :],
                sems.at[i % NSEM],
            ).start()

        def wait(i):
            idx = ids_smem[i]
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx, 1), :],
                buf.at[pl.ds(i, 1), :],
                sems.at[i % NSEM],
            ).wait()

        def body(i, _):
            start(i)

            @pl.when(i >= NSEM)
            def _():
                wait(i - NSEM)
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

        def tail(i, _):
            wait(CHUNK - NSEM + i)
            return 0

        jax.lax.fori_loop(0, NSEM, tail, 0)
        out_ref[...] = buf[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def dma_gather(table, ids, chunk=512):
    nnz = ids.shape[0]
    N, F = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nnz // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (chunk, F), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, F), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        _dma_gather_kernel(chunk, F),
        out_shape=jax.ShapeDtypeStruct((nnz, F), table.dtype),
        grid_spec=grid_spec,
    )(table, ids)


# --- D: jnp.take probe ------------------------------------------------------


def _take_kernel(CHUNK, F):
    def kernel(table_ref, ids_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], ids_ref[...], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk",))
def take_gather(table, ids, chunk=512):
    nnz = ids.shape[0]
    N, F = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nnz // chunk,),
        in_specs=[
            pl.BlockSpec((N, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, F), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
    )
    need = N * F * 2
    params = pltpu.CompilerParams(vmem_limit_bytes=min(need + (8 << 20), 127 << 20))
    return pl.pallas_call(
        _take_kernel(chunk, F),
        out_shape=jax.ShapeDtypeStruct((nnz, F), table.dtype),
        grid_spec=grid_spec,
        compiler_params=params,
    )(table, ids)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    NNZ = int(sys.argv[2]) if len(sys.argv) > 2 else 524288
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 384

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, F), jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (NNZ,), 0, N, jnp.int32)

    print(f"N={N} NNZ={NNZ} F={F} table={N*F*2/2**20:.0f}MB")

    # correctness reference
    want = np.asarray(jnp.take(table, ids[:2048], axis=0), np.float32)

    t = scan_time(
        lambda x: jnp.take(table, ids, axis=0)[:1, :1] * 0 + x,
        table[:1, :1],
    )
    print(f"XLA take          : {t*1e3:7.2f} ms  {t/NNZ*1e9:6.2f} ns/row")

    for name, fn, kw in [
        ("vmem loop u1", vmem_gather, dict(chunk=512, unroll=1)),
        ("vmem loop u4", vmem_gather, dict(chunk=512, unroll=4)),
        ("vmem loop u8", vmem_gather, dict(chunk=1024, unroll=8)),
        ("row DMA", dma_gather, dict(chunk=512)),
        ("jnp.take in-kern", take_gather, dict(chunk=512)),
    ]:
        try:
            got = np.asarray(fn(table, ids, **kw)[:2048], np.float32)
            ok = np.array_equal(got, want)
            t = scan_time(lambda x, fn=fn, kw=kw: fn(x, ids, **kw)[: x.shape[0]] * 0 + x, table)
            print(f"{name:18s}: {t*1e3:7.2f} ms  {t/NNZ*1e9:6.2f} ns/row  ok={ok}")
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{name:18s}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
