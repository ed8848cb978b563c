"""Honest in-graph op costs: scan each op K times inside ONE program so the
~1.2 ms tunnel launch latency amortizes away. Carry-chained to defeat DCE."""

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


def scan_time(body, init, K=32, n=3):
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


def main():
    import bench

    model, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    inc = batch.inc
    print(
        f"nnz={inc.nnz} real_nnz={inc.real.nnz if inc.real else None} "
        f"N={inc.num_nodes} M={inc.num_edges} sl={inc.num_sl_edges}"
    )
    key = jax.random.PRNGKey(0)

    # per-op costs
    from allset_tpu.ops.exchange import dir_spmm

    dv, de = inc.v2e_split(), inc.e2v_split()
    F = 384

    xN = jax.random.normal(key, (inc.num_nodes, F), jnp.bfloat16)
    t = scan_time(lambda x: dir_spmm(x, dv).astype(jnp.bfloat16)[: x.shape[0]] , xN)
    print(f"v2e_split spmm fwd    : {t*1e3:7.2f} ms")

    xM = jax.random.normal(key, (inc.num_edges, F), jnp.bfloat16)
    M, N = inc.num_edges, inc.num_nodes

    def e2v_fwd(x):
        y = dir_spmm(x, de).astype(jnp.bfloat16)  # [N, F]
        return jnp.concatenate([y, y[: M - N]], axis=0)

    t = scan_time(e2v_fwd, xM)
    print(f"e2v_split spmm fwd    : {t*1e3:7.2f} ms")

    def vjp_step(x):
        y, vjp = jax.vjp(lambda x: dir_spmm(x, dv), x)
        (dx,) = vjp(y[: dv.num_dst_total if dv.num_dst_total else dv.num_dst])
        return dx.astype(jnp.bfloat16)

    t = scan_time(vjp_step, xN)
    print(f"v2e_split spmm fwd+bwd: {t*1e3:7.2f} ms")

    def vjp_step_e(x):
        y, vjp = jax.vjp(lambda x: dir_spmm(x, de), x)
        (dx,) = vjp(y)
        return dx.astype(jnp.bfloat16)

    t = scan_time(vjp_step_e, xM)
    print(f"e2v_split spmm fwd+bwd: {t*1e3:7.2f} ms")

    # raw gather at real nnz
    r = inc.real
    t = scan_time(
        lambda x: jnp.take(x, r.node, axis=0, mode="clip")[: inc.num_nodes]
        + x * 0,
        xN,
    )
    print(f"gather [real_nnz,384] : {t*1e3:7.2f} ms (plus slice-add noise)")

    # GEMM
    w0 = jax.random.normal(key, (256, 256), jnp.bfloat16)
    x0 = jax.random.normal(key, (inc.num_nodes, 256), jnp.bfloat16)
    t = scan_time(lambda x: (x @ w0), x0)
    print(f"GEMM [N,256]x[256,256]: {t*1e3:7.2f} ms")

    # model fwd / fwd+bwd
    variables = model.init({"params": key}, batch, False)
    params = variables["params"]

    def fwd_body(p):
        out = model.apply({"params": p}, batch, False)
        # fold output back into a param leaf to chain the scan
        leaf = jax.tree_util.tree_leaves(p)[0]
        return jax.tree_util.tree_map(
            lambda q: q + jnp.sum(out).astype(q.dtype) * 0, p
        )

    t = scan_time(fwd_body, params, K=8)
    print(f"model fwd             : {t*1e3:7.2f} ms")

    def fb_body(p):
        g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, batch, False)))(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)

    t = scan_time(fb_body, params, K=8)
    print(f"model fwd+bwd         : {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
