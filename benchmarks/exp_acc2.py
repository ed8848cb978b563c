"""Experiment: does a second accumulator (breaking the serial acc += dot
dependency between chunk matmuls) raise the segment kernel's MXU
utilization? Prototype copy of ops/pallas_segment's kernel with NACC
accumulators, measured at bench shapes on the node-side reduce."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(S_BLK, CHUNK, F, in_dtype, NACC):
    def kernel(indptr_ref, msgs_hbm, dst_hbm, out_ref, *scratch):
        accs = scratch[:NACC]
        msc, dsc, sems, dsem = scratch[NACC:]
        b = pl.program_id(0)
        start = indptr_ref[b]
        end = indptr_ref[b + 1]
        start_al = pl.multiple_of((start // LANE) * LANE, LANE)
        nchunks = pl.cdiv(end - start_al, CHUNK)
        for a in accs:
            a[...] = jnp.zeros_like(a)

        def get_dma(slot, c):
            off = pl.multiple_of(start_al + c * CHUNK, LANE)
            return (
                pltpu.make_async_copy(
                    msgs_hbm.at[pl.ds(off, CHUNK), :], msc.at[slot],
                    sems.at[slot],
                ),
                pltpu.make_async_copy(
                    dst_hbm.at[pl.ds(off // LANE, CHUNK // LANE), :],
                    dsc.at[slot], dsem.at[slot],
                ),
            )

        @pl.when(nchunks > 0)
        def _():
            m0, d0 = get_dma(0, 0)
            m0.start()
            d0.start()

            def body(c, _):
                slot = c % 2
                nxt = (c + 1) % 2

                @pl.when(c + 1 < nchunks)
                def _():
                    m1, d1 = get_dma(nxt, c + 1)
                    m1.start()
                    d1.start()

                mc, dc = get_dma(slot, c)
                mc.wait()
                dc.wait()
                R = CHUNK // LANE
                rel = dsc[slot][:, :, None] - b * S_BLK
                cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANE, S_BLK), 2)
                onehot_t = (
                    jnp.where(cols == rel, 1.0, 0.0)
                    .astype(in_dtype)
                    .reshape(CHUNK, S_BLK)
                )
                contrib = jax.lax.dot_general(
                    onehot_t, msc[slot],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for a in range(NACC):
                    @pl.when(c % NACC == a)
                    def _(a=a):
                        accs[a][...] += contrib

                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)

        total = accs[0][...]
        for a in accs[1:]:
            total = total + a[...]
        out_ref[...] = total.astype(out_ref.dtype)

    return kernel


def run(msgs, dst2d, indptr, num_seg, s_blk, chunk, nacc):
    _, F = msgs.shape
    num_blocks = num_seg // s_blk
    kern = _kernel(s_blk, chunk, F, msgs.dtype, nacc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((s_blk, F), lambda b, ip: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_blk, F), jnp.float32)] * nacc + [
            pltpu.VMEM((2, chunk, F), msgs.dtype),
            pltpu.VMEM((2, chunk // LANE, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((num_seg, F), msgs.dtype),
        grid_spec=grid_spec, compiler_params=params,
    )(indptr, msgs, dst2d)


def main():
    import bench
    from benchmarks.profile_scan import scan_time

    model, batch = bench.build(1 << 17, 1 << 16, 12, 256, 8)
    d = batch.inc.e2v_split()  # node-side: the expensive reduce
    F = 384
    msgs = jax.random.normal(
        jax.random.PRNGKey(0), (d.src.shape[0], F), jnp.bfloat16
    )
    dst2d = d.dst.reshape(-1, LANE)
    num_seg = d.num_dst_padded
    print(f"nnz={msgs.shape[0]} segs={num_seg} s_blk={d.s_blk} chunk={d.chunk}")
    for nacc in (1, 2, 4):
        f = functools.partial(
            run, dst2d=dst2d, indptr=d.block_indptr, num_seg=num_seg,
            s_blk=d.s_blk, chunk=d.chunk, nacc=nacc,
        )

        def body(m, f=f):
            out = f(m)
            return m * jnp.bfloat16(1.0) + out[0, 0] * jnp.bfloat16(1e-6)

        t = scan_time(body, msgs)
        print(f"nacc={nacc}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
