"""Fused PMA score+pack Pallas kernels: bias + leaky_relu + global-max
softmax numerator + head-expand multiply + packed-table build, one pass.

Motivation (benchmarks/trace_step.py after the r4 epilogue fix): between
the fused lin_V GEMM and dir_spmm's gather, the XLA lowering spends
~2 ms/step building the packed exchange source table ``w = [x_V *
head_expand(e) | e | 0]`` — the bias-add fusions re-read yf, the f32
[N, 8] alpha chain (bias, leaky, exp) runs on an 8-wide minor dim
(~10-100x lane waste), the global col-max needs a relayout
(nn.modules._colmax's reshape trick, ~0.2 ms/direction), and the final
concat writes [N, WP] again. Every op is row-local once the global max
is known, so two kernels replace the chain:

  * ``_gmax_kernel``: streams ONLY the 128-lane tile holding the alpha
    columns (HC..HC+H), accumulates the per-head column max of
    leaky(alpha) over valid rows into a revisited f32 block
    (~N x 256 B traffic instead of a full [N, 8] chain + relayout);
  * ``_pack_kernel``: one read of yf [N, WP], one write of w [N, WP]:
    x_V = yf[:, :HC] + bV;  a = leaky(f32(yf[:, HC:HC+H]) + ba);
    e = exp(a - gmax) in the activation dtype;  w = [x_V * (e @ P) | e | 0].

Numerics are EXACTLY the unfused composition in nn/modules.py PMA
(same cast points: bf16 bias add, f32 alpha math, bf16 e, the exact
one-hot MXU head-expand). The backward is the XLA vjp of that same
composition (``custom_vjp`` residual = (yf, bV, ba)) — the kernels only
accelerate the forward, so gradients are bit-identical to the previous
path. Under vmap (statistical runs) the primitive's batching rule falls
back to the vmapped composition, like ops/pallas_pma.py.

Requires the caller to emit yf LANE-PADDED to WP = HC + pad(H) columns
(zero-padded Wf GEMM columns) so both kernels see a 128-aligned width.
Reference math: ``src/layers.py:128-148`` (scores + softmax numerator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allset_tpu.ops.pallas_pma import _expand_mat, interpret_mode

Array = jax.Array
LANE = 128


def pack_active(d, hid_dim: int, heads: int) -> bool:
    """Route PMA's score+pack through the fused kernels?

    MEASURED NEGATIVE on v5e (r4, BENCH: 23.15M -> 19.34M edges/s): the
    kernels replace an XLA elementwise chain that streams at the chip's
    combined read+write rate (~440 GB/s) and partially fuses into the
    downstream gather, while Pallas/Mosaic DMA is hard-capped at ~200
    GB/s per stream (CLAUDE.md env facts; benchmarks/exp_autopipe.py).
    A fused pass cannot win when the work is pure streaming. Kept
    env-gated (ALLSET_PMA_PACK=1) because the math and the custom-VJP
    wiring are correct and tested (tests/test_pallas_pack.py) — on a TPU
    generation or runtime where kernel DMA reaches memory speed, flip it
    on and re-measure before adopting.
    """
    import os

    from allset_tpu.ops.exchange import kernel_active

    shapes_ok = hid_dim % LANE == 0 and 1 <= heads <= LANE
    gate = os.environ.get("ALLSET_PMA_PACK")
    if interpret_mode():
        # CI coverage path: needs its OWN opt-in so ALLSET_PMA_EPILOGUE=
        # interpret alone doesn't silently activate the pack kernels too
        # (advisor r4). Either value works; "interpret" reads clearest.
        return shapes_ok and gate in ("1", "interpret")
    if gate != "1":
        return False
    plat = jax.devices()[0].platform
    return (
        plat in ("tpu", "axon")
        and jax.device_count() == 1
        and shapes_ok
        and kernel_active(d, hid_dim + heads)
    )


def packed_width(hid_dim: int, heads: int) -> int:
    """Lane-padded exchange width WP = HC + H rounded up to 128."""
    return hid_dim + heads + ((-(hid_dim + heads)) % LANE)


# --- kernels ---------------------------------------------------------------


def _gmax_kernel(H, nrows, slope, blk, a_ref, ba_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.full(out_ref.shape, -jnp.inf, out_ref.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + b * blk
    a = a_ref[...].astype(jnp.float32) + ba_ref[...]
    a = jnp.where(a >= 0, a, slope * a)  # leaky_relu (flax semantics)
    a = jnp.where(row < nrows, a, -jnp.inf)
    m = jnp.max(a, axis=0, keepdims=True)  # [1, 128]
    out_ref[...] = jnp.maximum(out_ref[...], jnp.broadcast_to(m, out_ref.shape))


def _pack_kernel(H, HC, slope, cdt, yf_ref, bv_ref, ba_ref, gmax_ref, w_ref):
    WP = yf_ref.shape[1]
    blk = yf_ref.shape[0]
    yf = yf_ref[...]
    x_V = yf[:, :HC] + bv_ref[...].astype(yf.dtype)  # bf16/f32 bias add
    a = yf[:, HC : HC + H].astype(jnp.float32) + ba_ref[0, :H]
    a = jnp.where(a >= 0, a, slope * a)
    e = jnp.exp(a - gmax_ref[0, :H]).astype(cdt)
    # head-expand as the exact one-hot MXU matmul (nn.modules._head_expand)
    P = _expand_mat(H, HC).astype(cdt)
    ee = jax.lax.dot_general(
        e, P, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    pad = WP - HC - H
    parts = [x_V.astype(jnp.float32) * ee.astype(jnp.float32), e.astype(jnp.float32)]
    if pad:
        parts.append(jnp.zeros((blk, pad), jnp.float32))
    w = jnp.concatenate(parts, axis=1)
    w_ref[...] = w.astype(w_ref.dtype)


# --- reference composition (exact; batching fallback + backward) ------------


def _pack_ref(yf, bV, ba, *, H, HC, WP, slope):
    """The unfused chain PMA computed before these kernels existed —
    bit-identical math, used for vjp and for vmapped runs."""
    from allset_tpu.nn.modules import _colmax, _head_expand

    x_V = yf[:, :HC] + bV.astype(yf.dtype)
    alpha = yf[:, HC : HC + H].astype(jnp.float32) + ba[None, :]
    alpha = jnp.where(alpha >= 0, alpha, slope * alpha)
    gmax = jax.lax.stop_gradient(_colmax(alpha))
    gmax = jnp.maximum(gmax, 0.0)
    e = jnp.exp(alpha - gmax[None, :]).astype(x_V.dtype)
    C = HC // H
    parts = [x_V * _head_expand(e, C), e]
    pad = WP - HC - H
    if pad:
        parts.append(jnp.zeros((yf.shape[0], pad), x_V.dtype))
    return jnp.concatenate(parts, axis=1)


# --- primitive -------------------------------------------------------------

from jax.core import ShapedArray
from jax.extend.core import Primitive
from jax.interpreters import batching, mlir

_pack_p = Primitive("allset_pma_pack_fwd")


def _pallas_pack(yf, bV, ba, *, H, HC, WP, slope, blk, interpret):
    M = yf.shape[0]
    cdt = yf.dtype
    grid = (M + blk - 1) // blk
    tile = HC // LANE  # the 128-lane tile holding the alpha columns

    gmax_blk = pl.pallas_call(
        functools.partial(_gmax_kernel, H, M, slope, blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, LANE), lambda b: (b, tile)),
            pl.BlockSpec((1, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        interpret=interpret,
    )(yf, _ba_tile(ba, H))
    gmax = jnp.maximum(gmax_blk[0, :H], 0.0)
    gmax_t = jnp.zeros((1, LANE), jnp.float32).at[0, :H].set(gmax)

    w = pl.pallas_call(
        functools.partial(_pack_kernel, H, HC, slope, cdt),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((blk, WP), lambda b: (b, 0)),
            pl.BlockSpec((1, HC), lambda b: (0, 0)),
            pl.BlockSpec((1, LANE), lambda b: (0, 0)),
            pl.BlockSpec((1, LANE), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, WP), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((M, WP), cdt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20
        ),
    )(yf, bV.reshape(1, HC), _ba_tile(ba, H), gmax_t)
    return w


def _ba_tile(ba, H):
    """ba padded into one [1, 128] lane tile (zeros beyond H — the junk
    lanes of yf's alpha tile are zero-padded Wf columns, so bias 0 keeps
    them at leaky(0) = 0; only lanes [:H] are ever consumed)."""
    return jnp.zeros((1, LANE), jnp.float32).at[0, :H].set(ba)


def _pack_abstract(yf, bV, ba, *, H, HC, WP, slope, blk, interpret):
    return ShapedArray((yf.shape[0], WP), yf.dtype)


def _pack_batch(args, dims, **kw):
    in_axes = [None if d is batching.not_mapped else d for d in dims]
    f = jax.vmap(
        functools.partial(_pack_ref, H=kw["H"], HC=kw["HC"], WP=kw["WP"],
                          slope=kw["slope"]),
        in_axes=in_axes,
    )
    return f(*args[:3]), 0


_pack_p.def_impl(_pallas_pack)
_pack_p.def_abstract_eval(_pack_abstract)
batching.primitive_batchers[_pack_p] = _pack_batch
mlir.register_lowering(
    _pack_p, mlir.lower_fun(_pallas_pack, multiple_results=False)
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def pma_pack(H, HC, WP, slope, blk, interpret, yf, bV, ba):
    """w = [x_V * head_expand(e) | e | 0] from the padded GEMM output —
    the PMA score+pack chain as two fused Pallas passes (forward only;
    the backward is the exact XLA composition vjp)."""
    return _pack_p.bind(yf, bV, ba, H=H, HC=HC, WP=WP, slope=slope,
                        blk=blk, interpret=interpret)


def _pma_pack_fwd(H, HC, WP, slope, blk, interpret, yf, bV, ba):
    w = _pack_p.bind(yf, bV, ba, H=H, HC=HC, WP=WP, slope=slope,
                     blk=blk, interpret=interpret)
    return w, (yf, bV, ba)


def _pma_pack_bwd(H, HC, WP, slope, blk, interpret, res, gw):
    yf, bV, ba = res
    _, vjp = jax.vjp(
        functools.partial(_pack_ref, H=H, HC=HC, WP=WP, slope=slope),
        yf, bV, ba,
    )
    return vjp(gw)


pma_pack.defvjp(_pma_pack_fwd, _pma_pack_bwd)
