"""Experiment: fused Pallas LayerNorm vs flax nn.LayerNorm, fwd+bwd, at
bench shapes ([196608, 256] bf16). Also: column-sum (bias grad) via
jnp.sum vs an MXU ones-matmul.

Hypothesis (from benchmarks/trace_step.py): XLA computes the LN backward's
dgamma/dbeta column reduces by re-reading the big activation arrays through
f32[32,2,8,128] staging fusions — several extra full HBM passes. A Pallas
kernel doing dx + per-block dgamma/dbeta partials in ONE pass should cut
LN bwd to ~bandwidth.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl

EPS = 1e-5


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


# ---------------- Pallas fused LN ----------------

def _fwd_kernel(x_ref, g_ref, b_ref, y_ref):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    y = xc * rstd * g_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(nrows, g_ref, x_ref, gamma_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = xc * rstd
    gg = g * gamma_ref[...]
    m1 = jnp.mean(gg, axis=1, keepdims=True)
    m2 = jnp.mean(gg * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (gg - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-block dgamma/dbeta partials; mask rows past nrows (last block)
    blk = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + i * blk
    valid = (row < nrows).astype(jnp.float32)
    gv = g * valid
    # partials as [8, F] blocks (TPU block sublane granularity); row 0 real
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0).astype(jnp.float32)
    dg_ref[...] = row0 * jnp.sum(gv * xhat, axis=0, keepdims=True)
    db_ref[...] = row0 * jnp.sum(gv, axis=0, keepdims=True)


def pallas_ln_fwd(x, gamma, beta, blk=2048):
    R, F = x.shape
    grid = (R + blk - 1) // blk
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, F), lambda i: (i, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, F), x.dtype),
    )(x, gamma.reshape(1, F), beta.reshape(1, F))


def pallas_ln_bwd(g, x, gamma, blk=2048):
    R, F = x.shape
    grid = (R + blk - 1) // blk
    dx, dgp, dbp = pl.pallas_call(
        partial(_bwd_kernel, R),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, F), lambda i: (i, 0)),
            pl.BlockSpec((blk, F), lambda i: (i, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, F), lambda i: (i, 0)),
            pl.BlockSpec((8, F), lambda i: (i, 0)),
            pl.BlockSpec((8, F), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, F), x.dtype),
            jax.ShapeDtypeStruct((grid * 8, F), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, F), jnp.float32),
        ],
    )(g, x, gamma.reshape(1, F))
    return dx, jnp.sum(dgp, axis=0), jnp.sum(dbp, axis=0)


def main():
    R, F = 196608, 256
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, F), jnp.bfloat16) * 2 + 1
    gamma = jnp.full((F,), 1.3, jnp.float32)
    beta = jnp.full((F,), 0.2, jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (R, F), jnp.bfloat16)

    ln = nn.LayerNorm(epsilon=EPS, dtype=jnp.bfloat16)
    params = {"scale": gamma, "bias": beta}

    # correctness
    y_ref = ln.apply({"params": params}, x)
    y_pl = pallas_ln_fwd(x, gamma, beta)
    print("fwd maxerr:", float(jnp.abs(y_ref.astype(jnp.float32) - y_pl.astype(jnp.float32)).max()))

    def loss_ref(p, x):
        return jnp.sum(ln.apply({"params": p}, x).astype(jnp.float32) * g.astype(jnp.float32))

    (dp_ref, dx_ref) = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    dx_pl, dg_pl, db_pl = pallas_ln_bwd(g, x, gamma)
    print("bwd dx maxerr:", float(jnp.abs(dx_ref.astype(jnp.float32) - dx_pl.astype(jnp.float32)).max()))
    print("bwd dgamma relerr:", float(jnp.abs(dp_ref["scale"] - dg_pl).max() / jnp.abs(dp_ref["scale"]).max()))
    print("bwd dbeta  relerr:", float(jnp.abs(dp_ref["bias"] - db_pl).max() / jnp.abs(dp_ref["bias"]).max()))

    # timing: fwd only
    t = scan_time(lambda c: ln.apply({"params": params}, c) + jnp.bfloat16(0.001) * c, x)
    print(f"flax  LN fwd:  {t*1e3:7.3f} ms")
    t = scan_time(lambda c: pallas_ln_fwd(c, gamma, beta) + jnp.bfloat16(0.001) * c, x)
    print(f"pallas LN fwd: {t*1e3:7.3f} ms")

    # timing: fwd+bwd (carry-chain dx)
    def flax_step(c):
        def f(xx):
            return jnp.sum(ln.apply({"params": params}, xx).astype(jnp.float32) * g.astype(jnp.float32))

        dxx = jax.grad(f)(c)
        return c + dxx.astype(c.dtype) * jnp.bfloat16(0.001)

    t = scan_time(flax_step, x)
    print(f"flax  LN fwd+bwd:  {t*1e3:7.3f} ms")

    def pl_step(c):
        y = pallas_ln_fwd(c, gamma, beta)
        dxx, dgm, dbt = pallas_ln_bwd(g, c, gamma)
        return c + dxx * jnp.bfloat16(0.001) + (y[0, 0] + dgm[0] + dbt[0]).astype(c.dtype) * jnp.bfloat16(1e-6)

    t = scan_time(pl_step, x)
    print(f"pallas LN fwd+bwd: {t*1e3:7.3f} ms")

    # bias grad: column sum of [R, F] bf16 -> f32[F]
    t = scan_time(lambda c: c + jnp.sum(c.astype(jnp.float32), axis=0)[None, :].astype(c.dtype) * jnp.bfloat16(1e-6), g)
    print(f"colsum jnp.sum:    {t*1e3:7.3f} ms")
    ones = jnp.ones((1, R), jnp.bfloat16)
    t = scan_time(
        lambda c: c
        + jax.lax.dot_general(ones, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        .astype(c.dtype) * jnp.bfloat16(1e-6),
        g,
    )
    print(f"colsum ones@g MXU: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
