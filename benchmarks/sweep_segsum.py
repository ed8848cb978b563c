"""Sweep the Pallas sorted-segment-sum (s_blk, chunk) at the BENCH step's
real shapes: the four segsum calls of the fwd+bwd step are

  edge-side (fwd V2E reduce / bwd E2V dw): nnz~452K ids into M=65536 segs
  node-side (fwd E2V reduce / bwd V2E dw): same nnz into N=131072 segs

all at width 384 bf16 (HC + H lane-padded).  s_blk trades one-hot MXU
flops (2*s_blk*W per entry) against per-block DMA boundary waste
(~chunk/2 + 64 rows per block); the r1 tuning (256/512) predates the
width-384 packing and the runs-folding widths.

Run: python benchmarks/sweep_segsum.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def scan_time(fn, args, K=16, n=3):
    @jax.jit
    def run(msgs, *rest):
        def body(c, _):
            out = fn(c, *rest)
            # feed a slice of the output back so scan can't hoist the op
            c = c.at[: out.shape[0] // 2, :].add(out[: out.shape[0] // 2] * 1e-6)
            return c, None

        return jax.lax.scan(body, msgs, None, length=K)[0]

    _sync(run(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    from allset_tpu.ops.pallas_segment import (
        build_block_indptr,
        pad_for_kernel,
        sorted_segment_sum_pallas,
    )
    import bench

    F = int(os.environ.get("F", 384))
    _, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    inc = batch.inc
    # real sorted id streams of the bench graph (valid entries only)
    edge_ids = np.asarray(inc.edge)[: inc.nnz]
    node_ids = np.sort(np.asarray(inc.node)[: inc.nnz])
    key = jax.random.PRNGKey(0)

    for name, ids, nseg in (
        ("edge", edge_ids, inc.num_edges),
        ("node", node_ids, inc.num_nodes),
    ):
        nnz = len(ids)
        print(f"== {name}-side: nnz={nnz} segs={nseg} F={F} bf16")
        for s_blk in (64, 128, 256, 512):
            for chunk in (256, 512, 1024):
                nnz_pad = pad_for_kernel(nnz, chunk)
                m_pad = (nseg + s_blk - 1) // s_blk * s_blk
                ids_pad = np.full(nnz_pad, m_pad + 7, np.int32)
                ids_pad[:nnz] = ids
                indptr = jnp.asarray(build_block_indptr(ids, m_pad, s_blk))
                dst2d = jnp.asarray(ids_pad).reshape(-1, 128)
                msgs = jax.random.normal(key, (nnz_pad, F), jnp.bfloat16)

                def f(m, ip, dst2d=dst2d, m_pad=m_pad, s_blk=s_blk, chunk=chunk):
                    return sorted_segment_sum_pallas(
                        m, dst2d, ip, m_pad, s_blk, chunk, False
                    )

                try:
                    t = scan_time(f, (msgs, indptr))
                except Exception as e:  # noqa: BLE001
                    print(f"  s_blk={s_blk:4d} chunk={chunk:5d}: FAIL {type(e).__name__}")
                    continue
                rd = nnz_pad * F * 2
                wr = m_pad * F * 2
                print(
                    f"  s_blk={s_blk:4d} chunk={chunk:5d}: {t*1e3:7.3f} ms "
                    f"(useful {(rd+wr)/t/1e9:5.0f} GB/s)"
                )


if __name__ == "__main__":
    main()
