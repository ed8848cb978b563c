"""Row-gather throughput vs table size (looking for an XLA emitter cliff)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    nnz = 583680
    f = jax.jit(lambda x, i: jnp.take(x, i, axis=0, mode="clip"))
    for F in (256, 384, 512):
        for rows_k in (64, 96, 128, 160, 192, 256, 320, 448, 584):
            rows = rows_k * 1024
            x = jax.random.normal(key, (rows, F), jnp.bfloat16)
            idx = jax.random.randint(key, (nnz,), 0, rows, jnp.int32)
            t = timeit(f, x, idx)
            mb = rows * F * 2 / 1e6
            out_gb = nnz * F * 2 / 1e9
            print(
                f"F={F} rows={rows:>7} table={mb:6.0f}MB: {t*1e3:7.2f} ms "
                f"({2*out_gb/t:5.0f} GB/s est)"
            )
        print()


if __name__ == "__main__":
    main()
