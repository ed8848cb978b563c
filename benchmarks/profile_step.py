"""Ablation profile of the bench training step: time each hot op at bench
shapes on the current accelerator. Not part of the test suite."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("BENCH_DTYPE", "bfloat16")


def _sync(out):
    # block_until_ready is unreliable through the axon tunnel; force a
    # device->host transfer of one element of every output leaf.
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
    print(
        f"nnz={inc.nnz} nnz_pad={inc.nnz_padded} N={inc.num_nodes} "
        f"M={inc.num_edges} F=256"
    )

    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, False)

    # full forward
    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    t = timeit(fwd, variables, batch)
    print(f"full fwd:            {t*1e3:8.2f} ms")

    # full fwd+bwd
    def loss_fn(v, b):
        out = model.apply(v, b, False)
        return jnp.sum(out)

    grad = jax.jit(jax.value_and_grad(loss_fn))
    t = timeit(grad, variables, batch)
    print(f"full fwd+bwd:        {t*1e3:8.2f} ms")

    # isolated ops at bench shapes
    from allset_tpu.ops.exchange import dir_gather, dir_reduce

    d_v2e = inc.v2e(inc.norm)
    d_e2v = inc.e2v(inc.norm)
    F = 384  # the packed+padded PMA width (HC + H -> lane aligned)
    key = jax.random.PRNGKey(0)
    xN = jax.random.normal(key, (inc.num_nodes, F), jnp.bfloat16)
    xM = jax.random.normal(key, (inc.num_edges, F), jnp.bfloat16)

    g_v2e = jax.jit(lambda x: dir_gather(x, d_v2e))
    g_e2v = jax.jit(lambda x: dir_gather(x, d_e2v))
    t = timeit(g_v2e, xN)
    print(f"gather V2E [nnz,{F}]: {t*1e3:8.2f} ms")
    t = timeit(g_e2v, xM)
    print(f"gather E2V [nnz,{F}]: {t*1e3:8.2f} ms")

    msgs = jax.random.normal(key, (inc.nnz_padded, F), jnp.bfloat16)
    r_v2e = jax.jit(lambda m: dir_reduce(m, d_v2e))
    r_e2v = jax.jit(lambda m: dir_reduce(m, d_e2v))
    t = timeit(r_v2e, msgs)
    print(f"reduce V2E (pallas): {t*1e3:8.2f} ms")
    t = timeit(r_e2v, msgs)
    print(f"reduce E2V (pallas): {t*1e3:8.2f} ms")

    # gather bwd (= permute + sorted reduce)
    gb_v2e = jax.jit(jax.grad(lambda x: jnp.sum(dir_gather(x, d_v2e))))
    t = timeit(gb_v2e, xN.astype(jnp.float32))
    print(f"gather-bwd V2E:      {t*1e3:8.2f} ms")
    gb_e2v = jax.jit(jax.grad(lambda x: jnp.sum(dir_gather(x, d_e2v))))
    t = timeit(gb_e2v, xM.astype(jnp.float32))
    print(f"gather-bwd E2V:      {t*1e3:8.2f} ms")

    # dense GEMM floor: the 8 [rows,256]x[256,256] GEMMs of the step
    w = jax.random.normal(key, (256, 256), jnp.bfloat16)
    x256 = xN[:, :256]
    gemm = jax.jit(lambda x, w: x @ w)
    t = timeit(gemm, x256, w)
    print(f"GEMM [N,256]x[256²]: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
