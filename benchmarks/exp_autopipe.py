"""Probe: Mosaic AUTO-pipelined BlockSpec streaming rate vs manual DMA.

exp_segsum_ablate.py measured manual make_async_copy HBM->VMEM at a hard
~200 GB/s (any chunk size, depth, source count). This kernel streams the
same array through the pallas_call pipeline machinery (BlockSpec index
maps, double-buffered by Mosaic itself) and just folds each block into a
[16, F] accumulator. If this sustains >>200 GB/s, the sorted-segment-sum
should be restructured around the auto-pipeline (chunk-aligned block
boundaries + revisited output blocks) instead of manual DMA.

Run (TPU): python benchmarks/exp_autopipe.py
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


def _kernel(seed_ref, x_ref, out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = seed_ref[...]

    if os.environ.get("AUTOPIPE_BODY", "fold") == "fold":
        # touch every element once: 16-row strided fold into the accumulator
        C = x_ref.shape[0]
        s = x_ref[...].reshape(C // 16, 16, x_ref.shape[1]).sum(axis=0)
        acc[...] += s.astype(jnp.float32)
    else:
        # minimal body: only the first 16 rows are read by compute; the
        # pipeline still streams the whole block into VMEM
        acc[...] += x_ref[:16].astype(jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("chunk",))
def run(x, seed, chunk):
    F = x.shape[1]
    n = x.shape[0] // chunk
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((16, F), lambda i: (0, 0)),
            pl.BlockSpec((chunk, F), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((16, F), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, F), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(seed, x)


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def main():
    F = 384
    rows = 512 * 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, F), jnp.bfloat16)
    for chunk in (512, 1024, 2048):
        seed = jnp.zeros((16, F), jnp.float32)

        @jax.jit
        def runK(x, seed):
            def body(c, _):
                return run(x, c, chunk) * (1 + 1e-7), None

            return jax.lax.scan(body, seed, None, length=16)[0]

        _sync(runK(x, seed))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(runK(x, seed))
            best = min(best, time.perf_counter() - t0)
        t = best / 16
        gbs = rows * F * 2 / t / 1e9
        print(f"chunk={chunk:5d}: {t*1e3:7.3f} ms  ({gbs:6.1f} GB/s auto-pipelined)")


if __name__ == "__main__":
    main()
