"""TPU hardware smoke: run after any kernel/exchange change.

Covers the paths CPU tests can't: the Pallas sorted-segment-sum on real
hardware (single-chip AND inside shard_map), the fused spmm backward,
and a full SetGNN training step. ~1 min.

    python scripts/tpu_smoke.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from allset_tpu.graph.transforms import (
        HyperData, add_self_loops, coalesce, norm_construction,
    )
    from allset_tpu.graph.batch import Batch
    from allset_tpu.models import SetGNN, SetGNNConfig
    from allset_tpu.ops.exchange import dir_spmm
    from allset_tpu.parallel.mesh import make_mesh
    from allset_tpu.parallel.sharded import ShardedExchange, sharded_spmm

    assert jax.devices()[0].platform in ("tpu", "axon"), "needs a TPU"

    rng = np.random.default_rng(0)
    n, m, nnz = 5000, 2000, 30000
    node = rng.integers(0, n, size=nnz)
    edge = rng.integers(0, m, size=nnz)
    node, edge = coalesce(node, edge)
    hd = HyperData(
        x=rng.normal(size=(n, 64)).astype(np.float32),
        y=rng.integers(0, 4, size=n),
        node=node, edge=edge, num_nodes=n, num_hyperedges=m,
    )
    hd = norm_construction(add_self_loops(hd), "all_one")
    inc = hd.to_incidence(bucket=512)

    # 1) fused spmm vs XLA oracle (values + grads), both directions
    for name, d in [("v2e", inc.v2e_split()), ("e2v", inc.e2v_split())]:
        w = jax.random.normal(jax.random.PRNGKey(1), (d.num_src if d.sl_mode != "add"
                              else d.num_src + inc.num_nodes, 256), jnp.bfloat16)
        out = jax.jit(lambda w: dir_spmm(w, d, norm=d.norm))(w)
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), name
        g = jax.jit(jax.grad(lambda w: (dir_spmm(w, d, norm=d.norm).astype(jnp.float32) ** 2).sum()))(w)
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all()), name
        print(f"[ok] dir_spmm {name} finite fwd+bwd")

    # 2) Pallas under shard_map (D=1 mesh) == single-chip path, exactly
    mesh = make_mesh(1)
    shex = ShardedExchange.build(inc, mesh).shard()
    dref = inc.v2e_split()
    w = jax.random.normal(jax.random.PRNGKey(0), (inc.real.num_nodes, 256), jnp.bfloat16)
    out_sh = jax.jit(lambda w: sharded_spmm(w, shex.v2e, use_norm=True))(w)
    out_1c = dir_spmm(w, dref, norm=dref.norm)
    diff = float(jnp.max(jnp.abs(out_sh.astype(jnp.float32) - out_1c.astype(jnp.float32))))
    assert diff == 0.0, f"shard_map path diverged: {diff}"
    print("[ok] pallas-under-shard_map == single-chip (exact)")

    # 3) one SetGNN training step end to end
    batch = Batch.from_hyperdata(hd, bucket=512)
    cfg = SetGNNConfig(num_features=64, num_classes=4, all_num_layers=1,
                       mlp_hidden=64, classifier_hidden=64,
                       classifier_num_layers=1, heads=4, dropout=0.0,
                       dtype="bfloat16")
    model = SetGNN(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    loss, g = jax.jit(jax.value_and_grad(
        lambda p: (model.apply(p, batch, False) ** 2).sum()
    ))(v)
    assert bool(jnp.isfinite(loss)), "non-finite loss"
    print(f"[ok] SetGNN bf16 step, loss={float(loss):.3f}")

    # 3b) lane-aligned FLAGSHIP leg: mlp_hidden=256 so the fused PMA
    # epilogue kernel (ops/pallas_pma.py, incl. the fold_relu backward)
    # actually COMPILES on the chip — the width-64 leg above never routes
    # through it (the r3 bf16-cmpf regression shipped through that hole).
    # Both dtypes: bf16 (bench config) and f32 (walmart-scale CLI config).
    from allset_tpu.ops.pallas_pma import epilogue_active

    assert epilogue_active(256, 8, 2, 256), (
        "fused PMA epilogue inactive at flagship shapes — smoke would "
        "not cover the kernel"
    )
    # sharded-epilogue setup for leg 3b2 (r5 second half): a D=1
    # ShardedExchange routes the flagship through the fused sharded
    # spmm+epilogue (parallel/sharded.sharded_pma_epilogue)
    import dataclasses as _dc
    from allset_tpu.parallel.sharded import sharded_epilogue_active

    shexS = ShardedExchange.build(batch.inc, mesh).shard()
    assert sharded_epilogue_active(shexS.v2e, 256, 8, 2, 256), (
        "fused SHARDED epilogue inactive at flagship shapes"
    )
    batch_sh = _dc.replace(batch, shex=shexS)
    for dt in ("bfloat16", "float32"):
        cfgF = SetGNNConfig(num_features=64, num_classes=4,
                            all_num_layers=2, mlp_hidden=256,
                            classifier_hidden=256, classifier_num_layers=2,
                            heads=8, dropout=0.0, dtype=dt)
        modelF = SetGNN(cfgF)
        vF = modelF.init({"params": jax.random.PRNGKey(0)}, batch, False)
        lossF, gF = jax.jit(jax.value_and_grad(
            lambda p: (modelF.apply(p, batch, False).astype(jnp.float32) ** 2).sum()
        ))(vF)
        leaves = jax.tree_util.tree_leaves(gF)
        assert bool(jnp.isfinite(lossF)), f"non-finite loss ({dt})"
        assert all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
                   for l in leaves), f"non-finite grads ({dt})"
        print(f"[ok] flagship fused-epilogue step ({dt}), "
              f"loss={float(lossF):.3f}")

        # 3b2) fused SHARDED spmm+epilogue: the same step through the
        # D=1 ShardedExchange compiles the per-shard epilogue kernels
        # INSIDE shard_map on the chip; must match the single-chip path
        lossS, gS = jax.jit(jax.value_and_grad(
            lambda p: (modelF.apply(p, batch_sh, False).astype(jnp.float32) ** 2).sum()
        ))(vF)
        relS = abs(float(lossS) - float(lossF)) / max(abs(float(lossF)), 1e-9)
        assert relS < 2e-2, f"sharded epilogue diverged ({dt}): {relS:.2e}"
        assert all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
                   for l in jax.tree_util.tree_leaves(gS)), (
            f"non-finite sharded-epilogue grads ({dt})"
        )
        print(f"[ok] fused sharded epilogue ({dt}), rel-diff {relS:.1e}")

    # 3c) bucketed-exchange leg (VERDICT r4 #6): force bucket_rows below
    # this graph's table sizes so ops/bucketed.py COMPILES on the chip —
    # the default 131072 threshold means no smoke/test graph ever routed
    # through it on hardware (a bucketed regression shipped green before
    # this leg). Parity vs the unbucketed step closes the loop.
    batch_b = Batch.from_hyperdata(hd, bucket=512, bucket_rows=2048)
    assert batch_b.inc.bucket_by_node is not None, (
        "bucket_rows=2048 did not attach the bucketed aux — the smoke "
        "leg no longer covers ops/bucketed.py"
    )
    cfgB = SetGNNConfig(num_features=64, num_classes=4, all_num_layers=2,
                        mlp_hidden=256, classifier_hidden=256,
                        classifier_num_layers=2, heads=8, dropout=0.0,
                        dtype="bfloat16")
    modelB = SetGNN(cfgB)
    vB = modelB.init({"params": jax.random.PRNGKey(0)}, batch_b, False)

    def lossB(p, b):
        return (modelB.apply(p, b, False).astype(jnp.float32) ** 2).sum()

    batch_u = Batch.from_hyperdata(hd, bucket=512)  # unbucketed oracle
    lB, gB = jax.jit(jax.value_and_grad(lossB))(vB, batch_b)
    lU, gU = jax.jit(jax.value_and_grad(lossB))(vB, batch_u)
    assert bool(jnp.isfinite(lB)), "non-finite bucketed loss"
    rel = abs(float(lB) - float(lU)) / max(abs(float(lU)), 1e-9)
    assert rel < 2e-2, f"bucketed != unbucketed: {float(lB)} vs {float(lU)}"
    assert all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
               for l in jax.tree_util.tree_leaves(gB)), "bucketed grads"
    print(f"[ok] bucketed exchange (K>1) fwd+bwd, loss rel-diff {rel:.1e}")

    # 4) vmapped statistical runs at a 128-multiple width (the runs axis
    # folds into the kernel width via ops/fold.py batching rules)
    from allset_tpu.train import TrainConfig, Trainer
    from allset_tpu.train.factory import ExperimentConfig, prepare

    cfg4 = ExperimentConfig(method="HCHA", epochs=3, runs=2,
                            all_num_layers=2, mlp_hidden=256)
    model4, batch4, tx4 = prepare(cfg4, hd)
    Trainer(model4, batch4,
            TrainConfig(epochs=3, runs=2, lr=0.01, wd=0.0, seed=0),
            tx=tx4).fit()
    print("[ok] vmapped zoo run at width 256 (runs folded into the kernel)")

    # 4b) vmapped FLAGSHIP runs: compiles the R>1 batched epilogue kernel
    # (ops/pallas_pma.py runs-grid-axis path, r5) on the chip — the
    # width-64 and HCHA legs never route through it
    cfg5 = ExperimentConfig(method="AllSetTransformer", epochs=3, runs=2,
                            all_num_layers=1, mlp_hidden=256, heads=8)
    model5, batch5, tx5 = prepare(cfg5, hd)
    r5 = Trainer(model5, batch5,
                 TrainConfig(epochs=3, runs=2, lr=0.01, wd=0.0, seed=0),
                 tx=tx5).fit()
    assert np.all(np.isfinite(r5.metrics)), "vmapped flagship non-finite"
    print("[ok] vmapped flagship runs (R>1 batched epilogue kernel)")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
