"""Microbenchmarks for the segment-op building blocks on the current device.

Run on TPU to find the bottleneck:  python benchmarks/micro.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    NNZ, N, M, F = 1 << 19, 1 << 16, 1 << 15, 256
    src = jnp.asarray(rng.integers(0, N, NNZ), jnp.int32)
    dst = jnp.asarray(np.sort(rng.integers(0, M, NNZ)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    msgs = jnp.asarray(rng.normal(size=(NNZ, F)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(F, F)), jnp.float32)

    def report(name, secs, bytes_moved=None):
        line = f"{name:34s} {secs * 1e3:9.3f} ms"
        if bytes_moved:
            line += f"  {bytes_moved / secs / 1e9:8.1f} GB/s"
        print(line)

    t = timeit(jax.jit(lambda: x @ w))
    report("gemm NxFxF", t, (N * F + F * F + N * F) * 4)

    t = timeit(jax.jit(lambda: jnp.take(x, src, axis=0, mode="clip")))
    report("gather [nnz,F]", t, (NNZ * F * 2) * 4)

    seg_sorted = jax.jit(
        lambda m: jax.ops.segment_sum(m, dst, num_segments=M, indices_are_sorted=True)
    )
    t = timeit(seg_sorted, msgs)
    report("segment_sum sorted", t, (NNZ * F + M * F) * 4)

    seg_unsorted = jax.jit(
        lambda m: jax.ops.segment_sum(m, src, num_segments=N, indices_are_sorted=False)
    )
    t = timeit(seg_unsorted, msgs)
    report("segment_sum unsorted", t, (NNZ * F + N * F) * 4)

    t = timeit(jax.jit(lambda m: jnp.zeros((M, F)).at[dst].add(m)), msgs)
    report("at[].add sorted", t, (NNZ * F + M * F) * 4)

    # segment softmax components
    alpha = jnp.asarray(rng.normal(size=(NNZ, 8)), jnp.float32)
    segmax = jax.jit(
        lambda a: jax.ops.segment_max(a, dst, num_segments=M, indices_are_sorted=True)
    )
    t = timeit(segmax, alpha)
    report("segment_max [nnz,8]", t, NNZ * 8 * 4 * 2)

    t = timeit(jax.jit(lambda a: jnp.take(a, dst, axis=0)), jnp.zeros((M, 8)))
    report("gather [nnz,8]", t, NNZ * 8 * 4 * 2)

    # fused fwd step pieces: gather+scale+scatter
    @jax.jit
    def spmm(x):
        m = jnp.take(x, src, axis=0, mode="clip")
        return jax.ops.segment_sum(m, dst, num_segments=M, indices_are_sorted=True)

    t = timeit(spmm, x)
    report("gather+segsum (SpMM)", t, (NNZ * F * 2 + M * F) * 4)

    print(f"device={jax.devices()[0]}, NNZ={NNZ}, N={N}, M={M}, F={F}")


if __name__ == "__main__":
    main()
