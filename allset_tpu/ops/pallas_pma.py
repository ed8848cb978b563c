"""Fused PMA epilogue Pallas kernel: denominator-divide + seed residual +
LayerNorm + rFF (1- or 2-layer MLP) + ReLU residual + LayerNorm, forward
and backward each as ONE pass over the aggregate table.

Motivation (benchmarks/trace_step.py on v5e): the XLA lowering of the PMA
epilogue (reference math ``src/layers.py:128-157``: ``out = ln1(z +
relu(rFF(z))), z = ln0(agg/denom + seed)``) spends ~3.3 ms/step at bench
shapes — the LayerNorm backward's dgamma/dbeta column reduces re-read the
[rows, 256] activations through f32[32,2,8,128] staging fusions, and the
divide / residual / GEMM passes each round-trip HBM. Every op here is
row-local (LN normalizes the lane axis; the rFF GEMM is per-row), so one
kernel computes the whole chain per row block with the activations resident
in VMEM:

  * forward: read agg [M, WP] once, write out [M, HC] once;
  * backward: read (agg, gout) once, recompute the forward in VMEM
    (rematerialization — no residuals stored), write dagg [M, WP] once;
    dW / dseed / dgamma / dbeta accumulate in revisited f32 output blocks
    across the sequential grid (no HBM traffic until the final flush).

The [M, WP] aggregate is dir_spmm's packed layout: columns [0, HC) carry
the attention-weighted value sums, [HC, HC+H) the per-head softmax
denominators, and [HC+H, WP) lane padding (see PMA in nn/modules.py).

vmapped statistical runs (r5): the fused kernels sit behind JAX
primitives whose batching rule re-binds them with a runs count R — the
kernel grows an OUTER runs grid axis over the width-folded [M, R*WP]
layout that the runs-folding segment reduce already produces
(ops/fold.py's bdim-1 convention), so no transpose of the aggregate
table is needed and per-step VMEM is unchanged. Per-run parameters ride
8-sublane-padded [R*8, W] tables with per-r blocks; r is the outer grid
axis so each run's revisited dW/dsmall accumulator blocks see
consecutive iterations. Measured on v5e (BENCH_VMAP_r05.json): the r4
reference-composition fallback cost 10.1% of the 8-run protocol's
throughput; the batched kernel recovers it (+15%, efficiency 102%).
The generic pallas_call batching would instead transpose the run axis
into row-major per-run blocks — a full copy of the aggregate table per
step.

Numerics match the unfused flax path: LN statistics in f32 (fast-variance
form, flax default), GEMMs in the activation dtype with their outputs
rounded like TorchDense, all other math f32. Parity is tested in
tests/test_pallas_pma.py (interpret mode on CPU; real kernel on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _compiler_params(blk: int, WP: int, HC: int, L: int, itemsize: int):
    """Raise the scoped-VMEM limit: the backward keeps ~6 f32 [blk, HC]
    intermediates + the [blk, WP] in/out blocks + [L, HC, HC] weight and
    accumulator blocks live (f32 at blk=1024 needs ~19 MB vs the 16 MB
    default — the walmart-scale CLI runs f32)."""
    need = (
        6 * blk * HC * 4
        + 3 * blk * WP * itemsize
        + 3 * L * HC * HC * 4
    )
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(need * 2, 24 * 2**20), 110 * 2**20)
    )

LANE = 128
EPS = 1e-5  # torch/flax LayerNorm default (nn.modules.LN_EPS)
DEN_FLOOR = 1e-16  # softmax denominator clamp (nn/modules.py PMA)


def interpret_mode() -> bool:
    """ALLSET_PMA_EPILOGUE=interpret forces the fused path in Pallas
    interpret mode on any backend — CI coverage of the INTEGRATED PMA
    fused path (tests/test_pallas_pma.py) on the CPU mesh."""
    import os

    return os.environ.get("ALLSET_PMA_EPILOGUE") == "interpret"


def epilogue_active(hid_dim: int, heads: int, num_layers: int,
                    out_dim: int) -> bool:
    """Will PMA route its epilogue through the fused kernel? True on a
    single TPU chip for lane-aligned widths and rFF depths 1 or 2 (the
    reference's MLP_num_layers space that keeps out_dim == hid_dim)."""
    plat = jax.devices()[0].platform
    shapes_ok = (
        hid_dim % LANE == 0
        and out_dim == hid_dim
        and num_layers in (1, 2)
        and heads >= 1
    )
    if interpret_mode():
        return shapes_ok
    return (
        plat in ("tpu", "axon")
        and jax.device_count() == 1
        and shapes_ok
    )


def _expand_mat(H: int, HC: int) -> Array:
    """One-hot per-head column expansion P[h, j] = 1 iff j // C == h."""
    C = HC // H
    return (
        jax.lax.broadcasted_iota(jnp.int32, (H, HC), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (H, HC), 1) // C
    ).astype(jnp.float32)


def _ln_f(x, g, b):
    """flax LayerNorm in f32 (fast variance); returns (y, xhat, rstd)."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (x - mu) * rstd
    return xhat * g + b, xhat, rstd


def _fwd_recompute(a, seed, g0, b0, Ws, brffs, g1, b1, H, HC, L, cdt):
    """Forward chain on one f32 block; returns every intermediate the
    backward needs. ``cdt`` = activation compute dtype (GEMM rounding)."""
    P = _expand_mat(H, HC)
    v = a[:, :HC]
    den_raw = a[:, HC : HC + H]
    den = jnp.maximum(den_raw, DEN_FLOOR)
    deninv = 1.0 / den
    denE = deninv @ P  # [blk, HC]
    out0 = v * denE + seed
    z, xhat0, rstd0 = _ln_f(out0, g0, b0)
    zb = z.astype(cdt)  # rounded like the unfused bf16 activation
    h = zb
    pres = []
    for l in range(L):
        # TorchDense rounding: GEMM accumulates f32 (Mosaic requires a
        # 32-bit acc; XLA's bf16 GEMM does the same), output rounds to the
        # activation dtype, bias adds in-dtype
        p32 = jax.lax.dot_general(
            h, Ws[l].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = (p32.astype(cdt).astype(jnp.float32)
             + brffs[l]).astype(cdt).astype(jnp.float32)
        pres.append(p)
        if l < L - 1:
            h = jnp.maximum(p, 0.0).astype(cdt)  # inner relu (MLP hidden)
    out2 = zb.astype(jnp.float32) + jnp.maximum(pres[-1], 0.0)
    y, xhat1, rstd1 = _ln_f(out2, g1, b1)
    return dict(v=v, den_raw=den_raw, deninv=deninv, denE=denE, P=P,
                zb=zb, pres=pres, xhat0=xhat0, rstd0=rstd0,
                xhat1=xhat1, rstd1=rstd1, y=y)


def _ln_bwd(gy, xhat, rstd, g):
    gg = gy * g
    m1 = jnp.mean(gg, axis=1, keepdims=True)
    m2 = jnp.mean(gg * xhat, axis=1, keepdims=True)
    dx = rstd * (gg - m1 - xhat * m2)
    dgamma = jnp.sum(gy * xhat, axis=0)
    dbeta = jnp.sum(gy, axis=0)
    return dx, dgamma, dbeta


def _fwd_kernel(H, HC, L, cdt, relu, a_ref, seed_ref, g0_ref, b0_ref, W_ref,
                br_ref, g1_ref, b1_ref, y_ref):
    a = a_ref[...].astype(jnp.float32)
    Ws = [W_ref[l] for l in range(L)]
    brffs = [br_ref[0, l * HC : (l + 1) * HC] for l in range(L)]
    # small-vector refs are 8-sublane padded (Mosaic block constraint for
    # the per-run blocks of the R > 1 grid); row 0 is the parameter
    r = _fwd_recompute(a, seed_ref[0:1], g0_ref[0:1], b0_ref[0:1], Ws,
                       brffs, g1_ref[0:1], b1_ref[0:1], H, HC, L, cdt)
    y = r["y"].astype(y_ref.dtype)
    # folded activation (SetGNN's inter-stage relu): one fused pass
    # instead of a separate [M, HC] read+write and its backward mask
    y_ref[...] = jnp.maximum(y, 0) if relu else y


def _bwd_kernel(H, HC, L, nrows, cdt, relu, row_axis, a_ref, gy_ref,
                seed_ref, g0_ref, b0_ref, W_ref, br_ref, g1_ref, b1_ref,
                da_ref, dW_ref, ds_ref):
    i = pl.program_id(row_axis)
    blk = a_ref.shape[0]
    WP = a_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        dW_ref[...] = jnp.zeros(dW_ref.shape, dW_ref.dtype)
        ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + i * blk
    valid = row < nrows
    # where, not multiply: out-of-bounds rows of the last block may read
    # uninitialized/NaN data and NaN * 0 == NaN would poison accumulators
    a = jnp.where(valid, a_ref[...].astype(jnp.float32), 0.0)
    gy = jnp.where(valid, gy_ref[...].astype(jnp.float32), 0.0)

    Ws = [W_ref[l] for l in range(L)]
    brffs = [br_ref[0, l * HC : (l + 1) * HC] for l in range(L)]
    r = _fwd_recompute(a, seed_ref[0:1], g0_ref[0:1], b0_ref[0:1], Ws,
                       brffs, g1_ref[0:1], b1_ref[0:1], H, HC, L, cdt)

    if relu:
        # mask against the ROUNDED output, matching the unfused
        # composition (relu applied to the dtype-cast activations).
        # Round-trip to f32 BEFORE comparing: bf16->f32 is exact, so
        # semantics are identical, but a bf16 cmpf would fail Mosaic
        # compile on v5e (vector<...xbf16> predicate unsupported —
        # the BENCH_r03 regression).
        gy = gy * (r["y"].astype(cdt).astype(jnp.float32) > 0)
    dout2, dg1, db1 = _ln_bwd(gy, r["xhat1"], r["rstd1"], g1_ref[0:1])
    dz = dout2
    # outer relu on the rFF output
    dp = dout2 * (r["pres"][-1] > 0.0)
    dbr = [None] * L
    for l in range(L - 1, -1, -1):
        dbr[l] = jnp.sum(dp, axis=0)
        hin = r["zb"] if l == 0 else jnp.maximum(r["pres"][l - 1], 0.0).astype(cdt)
        dW_ref[l] += jax.lax.dot_general(
            hin.astype(jnp.float32), dp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = jax.lax.dot_general(
            dp, Ws[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l > 0:
            dp = dh * (r["pres"][l - 1] > 0.0)  # inner relu bwd
        else:
            dz = dz + dh

    dout0, dg0, db0 = _ln_bwd(dz, r["xhat0"], r["rstd0"], g0_ref[0:1])
    dseed = jnp.sum(dout0, axis=0)
    dv = dout0 * r["denE"]
    dden = -jax.lax.dot_general(
        dout0 * r["v"], r["P"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (r["deninv"] * r["deninv"])
    dden = jnp.where(r["den_raw"] > DEN_FLOOR, dden, 0.0)

    pad = WP - HC - H
    dden_pad = jnp.concatenate(
        [dden, jnp.zeros((blk, pad), jnp.float32)], axis=1
    )
    da_ref[...] = jnp.concatenate([dv, dden_pad], axis=1).astype(da_ref.dtype)

    # small-vector grads: one revisited [8, HC] f32 accumulator
    rows = [dseed, dg0, db0, dg1, db1]
    rows += dbr + [jnp.zeros((HC,), jnp.float32)] * (3 - L)
    ds_ref[...] += jnp.stack(rows, axis=0)


# --- reference composition (batching fallback + parity oracle) -------------

def _reference_fwd(agg, seed, g0, b0, Wrff, brff, g1, b1, *, H, relu=False):
    """The unfused XLA epilogue — the exact math PMA computed before the
    kernel existed (and still computes under vmapped runs)."""
    HC = seed.shape[-1]
    C = HC // H
    P = _expand_mat(H, HC).astype(agg.dtype)
    denom_h = jnp.maximum(agg[:, HC : HC + H], DEN_FLOOR)
    out = agg[:, :HC] / (denom_h @ P)
    out = out + seed[None, :].astype(out.dtype)

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        y = (xf - mu) * jax.lax.rsqrt(var + EPS) * g + b
        return y.astype(x.dtype)

    z = ln(out, g0, b0)
    h = z
    L = Wrff.shape[0]
    for l in range(L):
        h = (h @ Wrff[l].astype(h.dtype)) + brff[l].astype(h.dtype)
        if l < L - 1:
            h = jnp.maximum(h, 0)
    out2 = z + jnp.maximum(h, 0).astype(z.dtype)
    y = ln(out2, g1, b1)
    return jnp.maximum(y, 0) if relu else y


def _reference_bwd(agg, gy, seed, g0, b0, Wrff, brff, g1, b1, *, H,
                   relu=False):
    _, vjp = jax.vjp(
        functools.partial(_reference_fwd, H=H, relu=relu),
        agg, seed, g0, b0, Wrff, brff, g1, b1,
    )
    dagg, dseed, dg0, db0, dW, dbr, dg1, db1 = vjp(gy.astype(agg.dtype))
    L = Wrff.shape[0]
    HC = seed.shape[-1]
    rows = [dseed, dg0, db0, dg1, db1]
    rows += [dbr[l] for l in range(L)]
    rows += [jnp.zeros((HC,), jnp.float32)] * (3 - L)
    dsmall = jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)
    return dagg, dW.astype(jnp.float32), dsmall


# --- primitives: pallas impl, reference-composition batching ---------------

from jax.core import ShapedArray
from jax.extend.core import Primitive
from jax.interpreters import batching, mlir

_epi_fwd_p = Primitive("allset_pma_epilogue_fwd")
_epi_bwd_p = Primitive("allset_pma_epilogue_bwd")
_epi_bwd_p.multiple_results = True


def _pad8(v, R, W):
    """[R, W] param rows -> [R*8, W]: each row padded to a full 8-sublane
    tile so per-run BlockSpecs (8, W) satisfy Mosaic's block constraint
    (last two dims divisible by (8, 128) or equal to the array's)."""
    return jnp.pad(
        v.reshape(R, 1, W), ((0, 0), (0, 7), (0, 0))
    ).reshape(R * 8, W)


def _pallas_fwd(agg, seed, g0, b0, Wrff, brff, g1, b1, *, H, blk, interpret,
                relu=False, R=1):
    """R == 1: the single-run kernel (1-D row grid, unchanged layout).
    R > 1 (vmapped statistical runs, set by the batching rule): the runs
    ride a SECOND outer grid axis over the width-folded [M, R*WP] layout
    the runs-folding segment reduce already produces (ops/fold.py's
    bdim-1 convention) — per-(r, i) blocks are identical to the
    single-run kernel's, so the kernel body is reused verbatim and VMEM
    per step is unchanged."""
    M = agg.shape[0]
    WP = agg.shape[1] // R
    HC = seed.shape[-1]
    L = Wrff.shape[-3]
    cdt = agg.dtype
    grid_rows = (M + blk - 1) // blk
    kern = functools.partial(_fwd_kernel, H, HC, L, cdt, relu)
    cp = None if interpret else _compiler_params(
        blk, WP, HC, L, jnp.dtype(cdt).itemsize
    )
    if R == 1:
        vec = lambda: pl.BlockSpec((8, HC), lambda i: (0, 0))
        return pl.pallas_call(
            kern,
            grid=(grid_rows,),
            in_specs=[
                pl.BlockSpec((blk, WP), lambda i: (i, 0)),
                vec(), vec(), vec(),
                pl.BlockSpec((L, HC, HC), lambda i: (0, 0, 0)),
                pl.BlockSpec((8, L * HC), lambda i: (0, 0)),
                vec(), vec(),
            ],
            out_specs=pl.BlockSpec((blk, HC), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, HC), cdt),
            interpret=interpret,
            compiler_params=cp,
        )(agg, _pad8(seed, 1, HC), _pad8(g0, 1, HC), _pad8(b0, 1, HC),
          Wrff, _pad8(brff, 1, L * HC), _pad8(g1, 1, HC),
          _pad8(b1, 1, HC))
    vec = lambda: pl.BlockSpec((8, HC), lambda r, i: (r, 0))
    return pl.pallas_call(
        kern,
        grid=(R, grid_rows),  # r OUTER so param blocks stay resident
        in_specs=[
            pl.BlockSpec((blk, WP), lambda r, i: (i, r)),
            vec(), vec(), vec(),
            pl.BlockSpec((L, HC, HC), lambda r, i: (r, 0, 0)),
            pl.BlockSpec((8, L * HC), lambda r, i: (r, 0)),
            vec(), vec(),
        ],
        out_specs=pl.BlockSpec((blk, HC), lambda r, i: (i, r)),
        out_shape=jax.ShapeDtypeStruct((M, R * HC), cdt),
        interpret=interpret,
        compiler_params=cp,
    )(agg, _pad8(seed, R, HC), _pad8(g0, R, HC), _pad8(b0, R, HC),
      Wrff.reshape(R * L, HC, HC), _pad8(brff.reshape(R, L * HC), R, L * HC),
      _pad8(g1, R, HC), _pad8(b1, R, HC))


def _pallas_bwd(agg, gy, seed, g0, b0, Wrff, brff, g1, b1, *, H, blk,
                interpret, relu=False, R=1):
    M = agg.shape[0]
    WP = agg.shape[1] // R
    HC = seed.shape[-1]
    L = Wrff.shape[-3]
    cdt = agg.dtype
    grid_rows = (M + blk - 1) // blk
    cp = None if interpret else _compiler_params(
        blk, WP, HC, L, jnp.dtype(cdt).itemsize
    )
    if R == 1:
        vec = lambda: pl.BlockSpec((8, HC), lambda i: (0, 0))
        return pl.pallas_call(
            functools.partial(_bwd_kernel, H, HC, L, M, cdt, relu, 0),
            grid=(grid_rows,),
            in_specs=[
                pl.BlockSpec((blk, WP), lambda i: (i, 0)),
                pl.BlockSpec((blk, HC), lambda i: (i, 0)),
                vec(), vec(), vec(),
                pl.BlockSpec((L, HC, HC), lambda i: (0, 0, 0)),
                pl.BlockSpec((8, L * HC), lambda i: (0, 0)),
                vec(), vec(),
            ],
            out_specs=[
                pl.BlockSpec((blk, WP), lambda i: (i, 0)),
                pl.BlockSpec((L, HC, HC), lambda i: (0, 0, 0)),
                pl.BlockSpec((8, HC), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, WP), cdt),
                jax.ShapeDtypeStruct((L, HC, HC), jnp.float32),
                jax.ShapeDtypeStruct((8, HC), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=cp,
        )(agg, gy, _pad8(seed, 1, HC), _pad8(g0, 1, HC),
          _pad8(b0, 1, HC), Wrff, _pad8(brff, 1, L * HC),
          _pad8(g1, 1, HC), _pad8(b1, 1, HC))
    vec = lambda: pl.BlockSpec((8, HC), lambda r, i: (r, 0))
    return pl.pallas_call(
        # row program id is grid axis 1 (r outer, i inner: each run's
        # revisited dW/ds accumulator blocks see consecutive iterations)
        functools.partial(_bwd_kernel, H, HC, L, M, cdt, relu, 1),
        grid=(R, grid_rows),
        in_specs=[
            pl.BlockSpec((blk, WP), lambda r, i: (i, r)),
            pl.BlockSpec((blk, HC), lambda r, i: (i, r)),
            vec(), vec(), vec(),
            pl.BlockSpec((L, HC, HC), lambda r, i: (r, 0, 0)),
            pl.BlockSpec((8, L * HC), lambda r, i: (r, 0)),
            vec(), vec(),
        ],
        out_specs=[
            pl.BlockSpec((blk, WP), lambda r, i: (i, r)),
            pl.BlockSpec((L, HC, HC), lambda r, i: (r, 0, 0)),
            pl.BlockSpec((8, HC), lambda r, i: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, R * WP), cdt),
            jax.ShapeDtypeStruct((R * L, HC, HC), jnp.float32),
            jax.ShapeDtypeStruct((R * 8, HC), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=cp,
    )(agg, gy, _pad8(seed, R, HC), _pad8(g0, R, HC), _pad8(b0, R, HC),
      Wrff.reshape(R * L, HC, HC), _pad8(brff.reshape(R, L * HC), R, L * HC),
      _pad8(g1, R, HC), _pad8(b1, R, HC))


def _fwd_abstract(agg, seed, *rest, **kw):
    R = kw.get("R", 1)
    return ShapedArray((agg.shape[0], R * seed.shape[-1]), agg.dtype)


def _bwd_abstract(agg, gy, seed, g0, b0, Wrff, brff, g1, b1, **kw):
    HC = seed.shape[-1]
    R = kw.get("R", 1)
    L = Wrff.shape[-3]
    return (
        ShapedArray(agg.shape, agg.dtype),
        ShapedArray((R * L, HC, HC) if R > 1 else Wrff.shape, jnp.float32),
        ShapedArray((R * 8, HC), jnp.float32),
    )


def _fold_args(args, dims):
    """Normalize batched operands to the runs-folded bind convention:
    agg/gy -> [M, Rb * cols] (runs into the width, ops/fold.py's bdim-1
    layout, so a fold-produced agg reshapes for FREE), params -> leading
    runs axis. Unbatched operands broadcast."""
    Rb = next(a.shape[d] for a, d in zip(args, dims)
              if d is not batching.not_mapped)

    def lead(a, d):
        if d is batching.not_mapped:
            return jnp.broadcast_to(a[None], (Rb,) + a.shape)
        return jnp.moveaxis(a, d, 0)

    def widthfold(a, d):
        if d is batching.not_mapped:
            a = jnp.broadcast_to(a[:, None], (a.shape[0], Rb) + a.shape[1:])
        else:
            a = jnp.moveaxis(a, d, 1)
        return a.reshape(a.shape[0], Rb * a.shape[2])

    return Rb, lead, widthfold


def _fwd_batch(args, dims, **kw):
    """Runs-folded kernel batching (r5; was: reference-composition
    fallback): bind the SAME primitive with R multiplied — the kernel
    grows an outer runs grid axis over the width-folded layout. The
    vmapped 20-run protocol (the reference's actual workload,
    ``src/train.py:458-499``) then rides the fused kernel; the r4
    fallback cost 10.1% of protocol throughput (BENCH_VMAP_r05)."""
    agg, seed, g0, b0, Wrff, brff, g1, b1 = args
    da, ds, dg0, db0, dW, dbr, dg1, db1 = dims
    Rb, lead, widthfold = _fold_args(args, dims)
    R0 = kw.pop("R", 1)
    HC = seed.shape[-1]
    y = _epi_fwd_p.bind(
        widthfold(agg, da), lead(seed, ds).reshape(Rb * R0, HC),
        lead(g0, dg0).reshape(Rb * R0, HC), lead(b0, db0).reshape(Rb * R0, HC),
        lead(Wrff, dW).reshape(Rb * R0, -1, HC, HC),
        lead(brff, dbr).reshape(Rb * R0, -1, HC),
        lead(g1, dg1).reshape(Rb * R0, HC), lead(b1, db1).reshape(Rb * R0, HC),
        R=Rb * R0, **kw,
    )
    rows = y.shape[0]
    if R0 == 1:
        return y.reshape(rows, Rb, HC), 1
    return y.reshape(rows, Rb, R0 * HC), 1


def _bwd_batch(args, dims, **kw):
    agg, gy, seed, g0, b0, Wrff, brff, g1, b1 = args
    da, dgy, ds, dg0, db0, dW, dbr, dg1, db1 = dims
    Rb, lead, widthfold = _fold_args(args, dims)
    R0 = kw.pop("R", 1)
    HC = seed.shape[-1]
    L = Wrff.shape[-3]
    dagg, dWout, dsmall = _epi_bwd_p.bind(
        widthfold(agg, da), widthfold(gy, dgy),
        lead(seed, ds).reshape(Rb * R0, HC),
        lead(g0, dg0).reshape(Rb * R0, HC), lead(b0, db0).reshape(Rb * R0, HC),
        lead(Wrff, dW).reshape(Rb * R0, -1, HC, HC),
        lead(brff, dbr).reshape(Rb * R0, -1, HC),
        lead(g1, dg1).reshape(Rb * R0, HC), lead(b1, db1).reshape(Rb * R0, HC),
        R=Rb * R0, **kw,
    )
    rows = dagg.shape[0]
    WPall = dagg.shape[1] // Rb
    dagg = dagg.reshape(rows, Rb, WPall)
    if R0 == 1:
        dWout = dWout.reshape(Rb, L, HC, HC)
        dsmall = dsmall.reshape(Rb, 8, HC)
    else:
        dWout = dWout.reshape(Rb, R0 * L, HC, HC)
        dsmall = dsmall.reshape(Rb, R0 * 8, HC)
    return (dagg, dWout, dsmall), (1, 0, 0)


_epi_fwd_p.def_impl(functools.partial(_pallas_fwd))
_epi_fwd_p.def_abstract_eval(_fwd_abstract)
batching.primitive_batchers[_epi_fwd_p] = _fwd_batch
mlir.register_lowering(
    _epi_fwd_p, mlir.lower_fun(_pallas_fwd, multiple_results=False)
)

_epi_bwd_p.def_impl(functools.partial(_pallas_bwd))
_epi_bwd_p.def_abstract_eval(_bwd_abstract)
batching.primitive_batchers[_epi_bwd_p] = _bwd_batch
mlir.register_lowering(
    _epi_bwd_p, mlir.lower_fun(_pallas_bwd, multiple_results=True)
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def pma_epilogue(H, blk, interpret, relu, agg, seed, g0, b0, Wrff, brff, g1,
                 b1):
    """out = LN1(z + relu(rFF(z))), z = LN0(agg_vals / denom + seed) — the
    PMA epilogue (reference ``src/layers.py:128-157``) as one fused Pallas
    pass. ``agg`` is dir_spmm's packed [M, WP] aggregate; ``Wrff`` is
    [L, HC, HC] stacked rFF kernels, ``brff`` [L, HC] stacked biases.
    ``relu=True`` folds the caller's post-PMA activation (SetGNN's
    inter-stage relu, ``src/models.py:475-479``) into the same pass."""
    return _epi_fwd_p.bind(agg, seed, g0, b0, Wrff, brff, g1, b1,
                           H=H, blk=blk, interpret=interpret, relu=relu)


def _epilogue_fwd(H, blk, interpret, relu, agg, seed, g0, b0, Wrff, brff, g1,
                  b1):
    y = _epi_fwd_p.bind(agg, seed, g0, b0, Wrff, brff, g1, b1,
                        H=H, blk=blk, interpret=interpret, relu=relu)
    return y, (agg, seed, g0, b0, Wrff, brff, g1, b1)


def _epilogue_bwd(H, blk, interpret, relu, res, gy):
    agg, seed, g0, b0, Wrff, brff, g1, b1 = res
    L = Wrff.shape[0]
    dagg, dW, dsmall = _epi_bwd_p.bind(
        agg, gy, seed, g0, b0, Wrff, brff, g1, b1,
        H=H, blk=blk, interpret=interpret, relu=relu,
    )
    dseed, dg0, db0, dg1, db1 = (dsmall[k] for k in range(5))
    dbrff = dsmall[5 : 5 + L]
    return (dagg, dseed.astype(seed.dtype), dg0, db0, dW, dbrff, dg1, db1)


pma_epilogue.defvjp(_epilogue_fwd, _epilogue_bwd)
