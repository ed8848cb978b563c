"""Attack probe: lane-dense rewrites of the two narrow chains (r5 roofline).

[N, 8]-minor arrays physically occupy 128 lanes on TPU (T(8,128) tiling),
so every materialization of the alpha/e score chain and the NLL loss
chain costs 16x its logical bytes. Probe two rewrites that keep the
narrow math in a bit-reshaped [N*8/128, 128] lane-DENSE layout:

  A. PMA score chain: slice yf -> +ba -> leaky -> colmax -> exp -> pack
     (current, nn/modules.py:355-366) vs dense-lane variant with one
     from_dense relayout for the packed e.
  B. masked NLL fwd+bwd: current log_softmax onehot NLL
     (train/trainer.py:93-105) vs dense variant with a GLOBAL max shift
     (the PMA 'global' softmax argument: trained logits sit well inside
     f32 exp range of the global max) and block-diagonal-ones GEMM for
     per-row sums.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exp_dw8 import timed  # noqa: E402


def _head_expand(a, C):
    from allset_tpu.ops.pallas_pma import _expand_mat

    H = a.shape[1]
    return a @ _expand_mat(H, H * C).astype(a.dtype)


def _colmax(a):
    rows, H = a.shape
    g = 128 // H
    m = jnp.max(a.reshape(rows // g, g * H), axis=0)
    return jnp.max(m.reshape(g, H), axis=0)


# ---------------- A: PMA score+pack chain ----------------

def chain_current(yf, bV, ba):
    HC, H, C = 256, 8, 32
    x_V = yf[:, :HC] + bV.astype(yf.dtype)
    alpha = yf[:, HC : HC + H].astype(jnp.float32) + ba[None, :]
    alpha = jax.nn.leaky_relu(alpha, 0.2)
    gmax = jax.lax.stop_gradient(_colmax(alpha))
    gmax = jnp.maximum(gmax, 0.0)
    e = jnp.exp(alpha - gmax[None, :]).astype(x_V.dtype)
    pad = jnp.zeros((x_V.shape[0], 120), x_V.dtype)
    return jnp.concatenate([x_V * _head_expand(e, C), e, pad], axis=1)


def chain_dense(yf, bV, ba):
    HC, H, C = 256, 8, 32
    g = 128 // H  # 16 logical rows per dense row
    rows = yf.shape[0]
    x_V = yf[:, :HC] + bV.astype(yf.dtype)
    a8 = yf[:, HC : HC + H]
    ad = a8.reshape(rows // g, g * H).astype(jnp.float32)  # lane-dense
    ad = ad + jnp.tile(ba, g)[None, :]
    ad = jax.nn.leaky_relu(ad, 0.2)
    gm = jnp.max(jax.lax.stop_gradient(ad), axis=0)  # [128]
    gmax = jnp.maximum(jnp.max(gm.reshape(g, H), axis=0), 0.0)  # [H]
    ed = jnp.exp(ad - jnp.tile(gmax, g)[None, :])
    e = ed.astype(x_V.dtype).reshape(rows, H)  # ONE dense->narrow relayout
    pad = jnp.zeros((rows, 120), x_V.dtype)
    return jnp.concatenate([x_V * _head_expand(e, C), e, pad], axis=1)


# ---------------- B: masked NLL ----------------

def nll_current(logits, y, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, logp.shape, 1) == y[:, None]
    )
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    m = mask.astype(logp.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def nll_dense(logits, y, mask):
    N, Cc = logits.shape
    g = 128 // Cc
    ld = logits.reshape(N // g, g * Cc)  # lane-dense, one relayout
    s = jax.lax.stop_gradient(jnp.max(ld))  # GLOBAL max shift (scalar)
    ed = jnp.exp(ld - s)
    # per-row (8-class) sums in dense layout: GEMM with the [128,128]
    # block-diagonal ones (group g of 8 lanes sums within itself)
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (g * Cc, g * Cc), 0) // Cc
        == jax.lax.broadcasted_iota(jnp.int32, (g * Cc, g * Cc), 1) // Cc
    ).astype(ld.dtype)
    sums = ed @ blk  # [N//g, 128] each lane = its group's sum
    logp = ld - s - jnp.log(sums)
    # one-hot pick in dense layout
    lane_cls = jax.lax.broadcasted_iota(jnp.int32, ld.shape, 1) % Cc
    yd = y.reshape(N // g, g)
    yd = jnp.repeat(yd, Cc, axis=1)  # [N//g, 128] label per lane-group
    md = mask.reshape(N // g, g)
    md = jnp.repeat(md, Cc, axis=1)
    pick = (lane_cls == yd) & md
    nll_sum = -jnp.sum(jnp.where(pick, logp, 0.0))
    m = mask.astype(logp.dtype)
    return nll_sum / jnp.maximum(m.sum(), 1.0)


def main():
    S, N = 196608, 131072
    key = jax.random.PRNGKey(0)
    yf = jax.random.normal(key, (S, 264), jnp.bfloat16)
    bV = jax.random.normal(jax.random.PRNGKey(1), (256,), jnp.float32)
    ba = jax.random.normal(jax.random.PRNGKey(2), (8,), jnp.float32)

    ra = np.asarray(chain_current(yf, bV, ba), np.float32)
    for name, f in [("A_current", chain_current), ("A_dense", chain_dense)]:
        fb = lambda yf, bV, ba: jax.grad(
            lambda yf: (f(yf, bV, ba).astype(jnp.float32) ** 2).sum()
        )(yf)
        t_f = timed(f, (yf, bV, ba))
        t_b = timed(fb, (yf, bV, ba))
        r = np.asarray(f(yf, bV, ba), np.float32)
        err = np.abs(r - ra).max() / max(np.abs(ra).max(), 1e-9)
        print(f"{name:10s} fwd {t_f*1e3:7.3f} ms  fwd+bwd-extra "
              f"{t_b*1e3:7.3f} ms  rel-err {err:.2e}")

    h = jax.random.normal(key, (N, 256), jnp.bfloat16)
    W = jax.random.normal(jax.random.PRNGKey(3), (256, 8), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(4), (N,), 0, 8)
    mask = jnp.arange(N) % 2 == 0

    def loss_cur(h, W):
        return nll_current((h @ W.astype(h.dtype)).astype(jnp.float32), y, mask)

    def loss_den(h, W):
        return nll_dense((h @ W.astype(h.dtype)).astype(jnp.float32), y, mask)

    va = float(loss_cur(h, W))
    for name, f in [("B_current", loss_cur), ("B_dense", loss_den)]:
        g = lambda h, W: jax.grad(f, argnums=(0, 1))(h, W)[1]
        t_f = timed(f, (h, W))
        t_b = timed(g, (h, W))
        v = float(f(h, W))
        print(f"{name:10s} fwd {t_f*1e3:7.3f} ms  fwd+bwd "
              f"{t_b*1e3:7.3f} ms  val {v:.6f} (ref {va:.6f})")


if __name__ == "__main__":
    main()
