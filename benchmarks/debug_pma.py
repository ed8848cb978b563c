"""Bisect the PMA.apply jit crash: early-return at CUT stages."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

import bench
from allset_tpu.graph.incidence import Direction
from allset_tpu.nn.modules import MLP, LN_EPS, TorchDense
from allset_tpu.nn.init import glorot_uniform, xavier_uniform_torch_fans
from allset_tpu.ops.exchange import dir_spmm, kernel_active

CUT = int(os.environ.get("CUT", 9))


class PMA2(nn.Module):
    hid_dim: int = 256
    out_dim: int = 256
    num_layers: int = 2
    heads: int = 8
    negative_slope: float = 0.2
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, d: Direction, train: bool = False):
        H = self.heads
        C = self.hid_dim // H
        HC = H * C

        x_K = TorchDense(HC, kernel_init=glorot_uniform(), dtype=self.dtype, name="lin_K")(x)
        x_V = TorchDense(HC, kernel_init=glorot_uniform(), dtype=self.dtype, name="lin_V")(x)
        if CUT == 0:
            return x_K + x_V

        att_r = self.param("att_r", xavier_uniform_torch_fans((1, H, C)), (1, H, C))
        att_flat = att_r.reshape(HC)
        blk = (
            jax.lax.broadcasted_iota(jnp.int32, (HC, H), 0) // C
            == jax.lax.broadcasted_iota(jnp.int32, (HC, H), 1)
        )
        proj = jnp.where(blk, att_flat[:, None], 0.0)
        alpha = (x_K @ proj.astype(x_K.dtype)).astype(jnp.float32)
        alpha = nn.leaky_relu(alpha, self.negative_slope)
        if CUT == 1:
            return alpha

        gmax = jax.lax.stop_gradient(jnp.max(alpha, axis=0))
        gmax = jnp.maximum(gmax, 0.0)
        e = jnp.exp(alpha - gmax[None, :]).astype(x_V.dtype)
        parts = [x_V * jnp.repeat(e, C, axis=1), e]
        if kernel_active(d, HC + H) and (HC + H) % 128 != 0:
            pad = (-(HC + H)) % 128
            parts.append(jnp.zeros((x_V.shape[0], pad), x_V.dtype))
        w = jnp.concatenate(parts, axis=1)
        if CUT == 2:
            return w
        agg = dir_spmm(w, d)
        if CUT == 3:
            return agg
        denom = jnp.maximum(jnp.repeat(agg[:, HC : HC + H], C, axis=1), 1e-16)
        out = agg[:, :HC] / denom
        if CUT == 4:
            return out

        out = out + att_flat[None, :]
        out = nn.LayerNorm(epsilon=LN_EPS, name="ln0")(out)
        if CUT == 5:
            return out
        rff = MLP(
            hidden_channels=H * C,
            out_channels=self.out_dim,
            num_layers=self.num_layers,
            dropout=0.0,
            normalization="None",
            dtype=self.dtype,
            name="rFF",
        )
        out = nn.LayerNorm(epsilon=LN_EPS, name="ln1")(
            out + nn.relu(rff(out, train)).astype(out.dtype)
        )
        return out


def main():
    model, batch = bench.build(1 << 14, 1 << 13, 12, 256, 8)
    inc = batch.inc
    d = inc.v2e(inc.norm)
    pma = PMA2()
    x = jnp.ones((inc.num_nodes, 256), jnp.bfloat16)
    v = pma.init({"params": jax.random.PRNGKey(0)}, x, d)
    out = jax.jit(lambda v, x: pma.apply(v, x, d))(v, x)
    print(f"CUT={CUT} ok", float(out.astype(jnp.float32).sum()))


if __name__ == "__main__":
    main()
