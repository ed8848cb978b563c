"""Static run-folding for the sorted segment reduce (r4 exploration).

Motivation: benchmarks/exp_segsum_ablate.py shows Mosaic's manual
HBM->VMEM DMA is hard-capped near 200 GB/s on this v5e (flat streaming,
chunk sizes 512-4096, dual sources, 4-deep rings: all ~195-205 GB/s), so
the sorted-segment-sum kernel is stream-bound at ~2 ms per bench pass
and cannot be tuned past it. The incidence is STATIC, so adjacent
same-segment entries can be pre-paired on the host: a FOLD=4 plan turns
the [nnz, W] reduce input into [K, W], K = sum_e ceil(seg_e / 4), built
by ONE fused XLA pass of 4 gathers x static slot-masks + add (the gather
path sustains ~250 GB/s and fuses arithmetic). The Pallas kernel then
streams 2.7-3.1x fewer bytes.

This experiment measures, on the real bench streams (both sides):
  unfolded : gather [nnz,W] -> pallas reduce            (production)
  folded   : 4-slot gather+mask+add [K,W] -> pallas reduce
and checks exactness against the XLA segment-sum oracle.

Run (TPU): python benchmarks/exp_fold_reduce.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FOLD = 4


def build_fold_plan(seg_sorted: np.ndarray, src: np.ndarray,
                    norm: np.ndarray, num_src: int, fold: int = FOLD):
    """Host-side folding plan over a segment-sorted entry stream.

    Returns (slot_src [K, fold] i32, slot_norm [K, fold] f32,
    folded_seg [K] i32): row k sums fold entries of one segment (clipped
    groups; missing slots get norm 0 and a clip-safe src id).
    """
    nnz = len(seg_sorted)
    if nnz == 0:
        z = np.zeros((0, fold), np.int32)
        return z, np.zeros((0, fold), np.float32), np.zeros((0,), np.int32)
    # position of each entry within its segment run
    starts = np.flatnonzero(np.diff(seg_sorted)) + 1
    run_start = np.zeros(nnz, np.int64)
    run_start[starts] = starts
    run_start = np.maximum.accumulate(run_start)
    pos = np.arange(nnz) - run_start  # 0-based within-run position
    # row id: each run contributes ceil(len/fold) rows
    is_row_head = pos % fold == 0
    row_of_entry = np.cumsum(is_row_head) - 1
    K = int(row_of_entry[-1]) + 1
    slot = (pos % fold).astype(np.int64)
    slot_src = np.zeros((K, fold), np.int32)  # clip-safe default id 0
    slot_norm = np.zeros((K, fold), np.float32)
    slot_src[row_of_entry, slot] = src
    slot_norm[row_of_entry, slot] = norm
    folded_seg = np.zeros(K, np.int32)
    folded_seg[row_of_entry] = seg_sorted  # same value each slot
    return slot_src, slot_norm, folded_seg


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[0]))


def scan_time(fn, args, K=16, n=3):
    @jax.jit
    def run(msgs, *rest):
        def body(c, _):
            out = fn(c, *rest)
            half = out.shape[0] // 2
            c = c.at[:half, :].add(out[:half].astype(c.dtype) * 1e-6)
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
    import bench
    from allset_tpu.ops.pallas_segment import (
        build_block_indptr, pad_for_kernel, sorted_segment_sum_pallas,
    )

    W = int(os.environ.get("F", 384))
    s_blk, chunk = 256, 512
    _, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    inc = batch.inc
    core = inc.real if inc.real is not None else inc
    nnz = core.nnz
    key = jax.random.PRNGKey(0)

    for name, seg, src, nseg, nsrc in (
        ("edge", np.asarray(core.edge)[:nnz], np.asarray(core.node)[:nnz],
         core.num_edges, core.num_nodes),
        ("node", None, None, core.num_nodes, core.num_edges),
    ):
        if seg is None:
            order = np.argsort(np.asarray(core.node)[:nnz], kind="stable")
            seg = np.asarray(core.node)[:nnz][order]
            src = np.asarray(core.edge)[:nnz][order]
        norm = np.ones(nnz, np.float32)
        w = jax.random.normal(key, (nsrc, W), jnp.bfloat16)

        m_pad = (nseg + s_blk - 1) // s_blk * s_blk

        # --- unfolded (production shape) ---
        nnz_pad = pad_for_kernel(nnz, chunk)
        ids_pad = np.full(nnz_pad, m_pad + 7, np.int32)
        ids_pad[:nnz] = seg
        src_pad = np.full(nnz_pad, 0, np.int32)
        src_pad[:nnz] = src
        indptr_u = jnp.asarray(build_block_indptr(seg, m_pad, s_blk))
        dst2d_u = jnp.asarray(ids_pad).reshape(-1, 128)
        srcj_u = jnp.asarray(src_pad)
        mask_u = jnp.asarray((np.arange(nnz_pad) < nnz).astype(np.float32))

        def unfolded(w):
            msgs = jnp.take(w, srcj_u, axis=0, mode="clip")
            msgs = msgs * mask_u[:, None].astype(msgs.dtype)
            return sorted_segment_sum_pallas(
                msgs, dst2d_u, indptr_u, m_pad, s_blk, chunk, False
            )

        # --- folded ---
        ss, sn, fseg = build_fold_plan(seg, src, norm, nsrc)
        K = len(fseg)
        K_pad = pad_for_kernel(K, chunk)
        fseg_pad = np.full(K_pad, m_pad + 7, np.int32)
        fseg_pad[:K] = fseg
        ss_pad = np.zeros((K_pad, FOLD), np.int32)
        ss_pad[:K] = ss
        sn_pad = np.zeros((K_pad, FOLD), np.float32)
        sn_pad[:K] = sn
        indptr_f = jnp.asarray(build_block_indptr(fseg, m_pad, s_blk))
        dst2d_f = jnp.asarray(fseg_pad).reshape(-1, 128)
        ssj = jnp.asarray(ss_pad)
        snj = jnp.asarray(sn_pad.astype(np.float32))

        def folded(w):
            acc = None
            for j in range(FOLD):
                part = jnp.take(w, ssj[:, j], axis=0, mode="clip")
                part = part * snj[:, j][:, None].astype(part.dtype)
                acc = part if acc is None else acc + part
            return sorted_segment_sum_pallas(
                acc, dst2d_f, indptr_f, m_pad, s_blk, chunk, False
            )

        # correctness vs XLA oracle
        oracle = jax.ops.segment_sum(
            jnp.take(w, jnp.asarray(src), axis=0).astype(jnp.float32),
            jnp.asarray(seg), num_segments=m_pad, indices_are_sorted=True,
        )
        ou = jax.jit(unfolded)(w).astype(jnp.float32)
        of = jax.jit(folded)(w).astype(jnp.float32)
        eu = float(jnp.max(jnp.abs(ou - oracle)))
        ef = float(jnp.max(jnp.abs(of - oracle)))

        tu = scan_time(lambda w: unfolded(w), (w,))
        tf = scan_time(lambda w: folded(w), (w,))
        print(f"{name}-side nnz={nnz} K={K} ({nnz/K:.2f}x fold) segs={nseg}")
        print(f"  unfolded: {tu*1e3:7.3f} ms  maxerr={eu:.4f}")
        print(f"  folded  : {tf*1e3:7.3f} ms  maxerr={ef:.4f}  "
              f"speedup={tu/tf:.2f}x")


if __name__ == "__main__":
    main()
