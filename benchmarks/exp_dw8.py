"""Attack probe: the classifier dW GEMM (r5 roofline).

The trace shows ``convolution_convert_fusion.2 = f32[256,8]`` — the
classifier's dW = x^T @ dlogits with x bf16[131072,256] and dlogits
[131072,8] — at 0.479 ms/step. Physical traffic is ~100 MB (the narrow
operand pads to 128 lanes), so the measured effective rate is ~210 GB/s
vs the 438 GB/s XLA combined envelope: 2.3x above bound. Candidates:

  a. baseline          dot(x.T, dy8) -> f32[256,8]
  b. lane-padded dy    dy zero-padded to [N,128] -> dW[256,128] -> slice
                       (physical layout of dy is 128 lanes either way;
                       the MXU then sees a full-width output tile)
  c. bf16 dy           cast dy to bf16 before the GEMM (halves the
                       narrow operand's padded bytes)
  d. b+c combined
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def timed(body, args, K=(8, 40), n=3):
    def run_k(k):
        @jax.jit
        def run(args):
            def step(c, _):
                out = body(*c)
                # fold the result back so the loop carries a dependency
                return (c[0] + 0.0 * out.sum().astype(c[0].dtype),) + c[1:], None

            return jax.lax.scan(step, args, None, length=k)[0][0]

        _sync(run(args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            out = run(args)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    k0, k1 = K
    return (run_k(k1) - run_k(k0)) / (k1 - k0)


def main():
    N, C, O = 131072, 256, 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, C), jnp.bfloat16)
    dy = jax.random.normal(jax.random.PRNGKey(1), (N, O), jnp.float32)

    def a(x, dy):
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, O]

    def b(x, dy):
        dyp = jnp.pad(dy, ((0, 0), (0, 128 - O)))
        return jax.lax.dot_general(
            x, dyp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :O]

    def c(x, dy):
        return jax.lax.dot_general(
            x, dy.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def d(x, dy):
        dyp = jnp.pad(dy.astype(jnp.bfloat16), ((0, 0), (0, 128 - O)))
        return jax.lax.dot_general(
            x, dyp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :O]

    ra = np.asarray(a(x, dy))
    for name, f in [("a_base", a), ("b_pad128", b), ("c_bf16", c),
                    ("d_pad_bf16", d)]:
        t = timed(lambda x, dy: f(x, dy), (x, dy))
        r = np.asarray(f(x, dy))
        err = np.abs(r - ra).max() / max(np.abs(ra).max(), 1e-9)
        print(f"{name:12s} {t*1e3:7.3f} ms   rel-err vs a: {err:.2e}")


if __name__ == "__main__":
    main()
