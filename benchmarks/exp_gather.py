"""Experiments: why is the E2V gather slow, and what S_BLK/CHUNK are best."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import bench

    model, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    inc = batch.inc
    nnz_pad = inc.nnz_padded
    N, M = inc.num_nodes, inc.num_edges
    print(f"nnz_pad={nnz_pad} N={N} M={M}")

    key = jax.random.PRNGKey(0)
    for F in (256, 384):
        xN = jax.random.normal(key, (N, F), jnp.bfloat16)
        xM = jax.random.normal(key, (M, F), jnp.bfloat16)
        Mpad = (M + 127) // 128 * 128
        xMp = jax.random.normal(key, (Mpad, F), jnp.bfloat16)

        node = inc.node  # unsorted src (V2E direction)
        edge = inc.edge  # sorted src (E2V direction)

        for name, x, idx in [
            ("take xN[node] (unsorted)", xN, node),
            ("take xM[edge] (sorted)  ", xM, edge),
            ("take xMp[edge] (padded) ", xMp, edge),
        ]:
            f = jax.jit(lambda x, i: jnp.take(x, i, axis=0, mode="clip"))
            t = timeit(f, x, idx)
            gb = (nnz_pad * F * 2 * 2) / 1e9
            print(f"F={F} {name}: {t*1e3:7.2f} ms  ({gb/t:5.0f} GB/s wr+rd-est)")

        # mode variants on the sorted gather
        f2 = jax.jit(lambda x, i: x[i])
        t = timeit(f2, xM, jnp.minimum(edge, M - 1))
        print(f"F={F} x[i] fill-mode sorted   : {t*1e3:7.2f} ms")

    # S_BLK / CHUNK sweep for the sorted reduce (edge-sorted direction)
    from allset_tpu.ops.pallas_segment import (
        build_block_indptr,
        sorted_segment_sum_pallas,
    )

    edge_np = np.asarray(inc.edge)
    F = 384
    msgs = jax.random.normal(key, (nnz_pad, F), jnp.bfloat16)
    for s_blk in (64, 128, 256, 512):
        m_pad = (M + s_blk - 1) // s_blk * s_blk
        indptr = jnp.asarray(build_block_indptr(edge_np, m_pad, s_blk))
        for chunk in (512, 1024, 2048):
            try:
                f = jax.jit(
                    lambda m, ip: sorted_segment_sum_pallas(
                        m, inc.edge.reshape(-1, 128), ip, m_pad, s_blk, chunk, False
                    ),
                    static_argnames=(),
                )
                t = timeit(f, msgs, indptr)
                print(f"pallas reduce s_blk={s_blk:4d} chunk={chunk:5d}: {t*1e3:7.2f} ms")
            except Exception as e:
                print(f"pallas reduce s_blk={s_blk:4d} chunk={chunk:5d}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
