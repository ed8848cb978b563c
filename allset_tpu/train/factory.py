"""Experiment config + model factory + per-method preprocessing.

Mirrors the reference's flag surface (``src/train.py:221-287``), its
``parse_method`` factory (``src/train.py:28-103``) and the per-method
preprocessing dispatch (``src/train.py:344-416``) — but as a typed config
and pure functions instead of a mutable argparse namespace.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import optax

from allset_tpu.graph.batch import Batch
from allset_tpu.graph.transforms import (
    HyperData,
    add_self_loops,
    construct_h_dense,
    construct_v2v,
    expand_edge_index,
    gcn_norm,
    generate_g_from_h,
    generate_norm_hnhn,
    hypergcn_edge_dict,
    norm_construction,
    unignn_degrees,
)
from allset_tpu.graph.incidence import Incidence
from allset_tpu.models.cegnn import CEGAT, CEGCN, CEConfig
from allset_tpu.models.hcha import HCHA, HCHAConfig
from allset_tpu.models.hnhn import HNHN, HNHNConfig
from allset_tpu.models.hypergcn import (
    HyperGCN,
    HyperGCNConfig,
    build_hypergcn_laplacian,
)
from allset_tpu.models.legacy_hgnn import MLPConfig, MLPModel
from allset_tpu.models.setgnn import SetGNN, SetGNNConfig
from allset_tpu.models.unignn import UniGCNII, UniGCNIIConfig, UniGNN, UniGNNConfig

METHODS = (
    "AllSetTransformer",
    "AllDeepSets",
    "CEGCN",
    "CEGAT",
    "HyperGCN",
    "HGNN",
    "HNHN",
    "HCHA",
    "MLP",
    "UniGCNII",
    "UniGNN",
)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """The ~35-flag surface of ``src/train.py:221-287``, typed."""

    method: str = "AllSetTransformer"
    dname: str = "synthetic"
    # training
    epochs: int = 500
    runs: int = 20
    lr: float = 1e-3
    wd: float = 0.0
    train_prop: float = 0.5
    valid_prop: float = 0.25
    # model
    all_num_layers: int = 2
    mlp_num_layers: int = 2
    mlp_hidden: int = 64
    classifier_num_layers: int = 2
    classifier_hidden: int = 64
    heads: int = 1
    output_heads: int = 1
    dropout: float = 0.5
    aggregate: str = "mean"
    normtype: str = "all_one"  # 'all_one' | 'deg_half_sym'
    add_self_loop: bool = True
    normalization: str = "ln"
    deepset_input_norm: bool = True
    gpr: bool = False
    learn_mask: bool = False
    pma: bool = True
    exclude_self: bool = False
    feature_noise: float = 1.0
    # HyperGCN
    hypergcn_mediators: bool = True
    hypergcn_fast: bool = True
    # HNHN
    hnhn_alpha: float = -1.5
    hnhn_beta: float = -0.5
    hnhn_nonlinear_inbetween: bool = True
    # HCHA
    hcha_symdegnorm: bool = False
    # UniGNN
    unignn_model_name: str = "UniGCN"
    unignn_use_norm: bool = False
    # misc
    seed: int = 0
    bucket: int = 256
    # 'float32' (reference parity) | 'bfloat16' (mixed precision: bf16
    # activations/GEMMs/sparse traffic, f32 params + stats)
    dtype: str = "float32"


def prepare(
    cfg: ExperimentConfig, data: HyperData
) -> Tuple[object, Batch, Optional[optax.GradientTransformation]]:
    """(method, raw HyperData) -> (model, device Batch, optional optimizer).

    Returns a non-None optimizer only for UniGCNII, whose two-group Adam
    (wd 0.01 on conv params, 5e-4 on in/out linears, lr 0.01 —
    ``src/train.py:463-467``) differs from the generic one.
    """
    num_features, num_classes = data.num_features, data.num_classes
    method = cfg.method
    tx = None

    if method in ("AllSetTransformer", "AllDeepSets"):
        d = data
        if cfg.add_self_loop:
            d = add_self_loops(d)
        if cfg.exclude_self:
            d = expand_edge_index(d)
        d = norm_construction(d, option=cfg.normtype)
        batch = Batch.from_hyperdata(d, bucket=cfg.bucket)
        kw = dict(
            num_features=num_features,
            num_classes=num_classes,
            all_num_layers=cfg.all_num_layers,
            mlp_num_layers=cfg.mlp_num_layers,
            mlp_hidden=cfg.mlp_hidden,
            classifier_num_layers=cfg.classifier_num_layers,
            classifier_hidden=cfg.classifier_hidden,
            heads=cfg.heads,
            dropout=cfg.dropout,
            normalization=cfg.normalization,
            deepset_input_norm=cfg.deepset_input_norm,
            gpr=cfg.gpr,
            learn_mask=cfg.learn_mask,
            dtype=cfg.dtype,
        )
        if method == "AllDeepSets":
            mcfg = SetGNNConfig.all_deep_sets(**kw)
        else:
            mcfg = SetGNNConfig(pma=True, aggregate=cfg.aggregate, **kw)
        model = SetGNN(mcfg)

    elif method in ("CEGCN", "CEGAT"):
        pairs, weights = construct_v2v(data)
        if method == "CEGCN":
            ei, norm = gcn_norm(pairs, weights, data.num_nodes, add_self_loops=True)
        else:
            # PyG GATConv adds self-loops at call time; we add them host-side
            loop = np.arange(data.num_nodes, dtype=np.int64)
            ei = np.concatenate([pairs, np.stack([loop, loop])], axis=1)
            norm = np.ones(ei.shape[1], dtype=np.float32)
        v2v = Incidence.from_arrays(
            ei[0], ei[1], norm=norm, num_nodes=data.num_nodes,
            num_edges=data.num_nodes, bucket=cfg.bucket,
        )
        batch = Batch(
            x=jnp.asarray(data.x), y=jnp.asarray(data.y, jnp.int32), inc=v2v, extras={}
        )
        ce = CEConfig(
            num_features=num_features, num_classes=num_classes,
            all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
            dropout=cfg.dropout, normalization=cfg.normalization,
            heads=cfg.heads, output_heads=cfg.output_heads,
            dtype=cfg.dtype,
        )
        model = CEGCN(ce) if method == "CEGCN" else CEGAT(ce)

    elif method == "HyperGCN":
        he_dict = hypergcn_edge_dict(data)
        mcfg = HyperGCNConfig(
            num_features=num_features, num_classes=num_classes,
            all_num_layers=cfg.all_num_layers, dropout=cfg.dropout,
            mediators=cfg.hypergcn_mediators, fast=cfg.hypergcn_fast,
            dname=cfg.dname, dtype=cfg.dtype,
        )
        if cfg.hypergcn_fast:
            struct = build_hypergcn_laplacian(
                data.num_nodes, he_dict, data.x,
                mediators=cfg.hypergcn_mediators, seed=cfg.seed, bucket=cfg.bucket,
            )
            batch = Batch(
                x=jnp.asarray(data.x), y=jnp.asarray(data.y, jnp.int32),
                inc=struct, extras={},
            )
            model = HyperGCN(mcfg)
        else:
            from allset_tpu.models.hypergcn import HyperGCNReapprox

            batch = Batch(
                x=jnp.asarray(data.x), y=jnp.asarray(data.y, jnp.int32),
                inc=None, extras={},
            )
            model = HyperGCNReapprox(mcfg, edge_dict=he_dict, seed=cfg.seed)

    elif method in ("HCHA", "HGNN"):
        d = add_self_loops(data) if cfg.add_self_loop else data
        batch = Batch.from_hyperdata(d, bucket=cfg.bucket)
        model = HCHA(HCHAConfig(
            num_features=num_features, num_classes=num_classes,
            all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
            dropout=cfg.dropout,
            # --method HGNN routes to HCHA with the symmetric degree norm
            # (src/train.py:77-82)
            symdegnorm=(method == "HGNN") or cfg.hcha_symdegnorm,
            dtype=cfg.dtype,
        ))

    elif method == "HNHN":
        d = add_self_loops(data) if cfg.add_self_loop else data
        d = generate_norm_hnhn(d, alpha=cfg.hnhn_alpha, beta=cfg.hnhn_beta)
        batch = Batch.from_hyperdata(d, bucket=cfg.bucket)
        model = HNHN(HNHNConfig(
            num_features=num_features, num_classes=num_classes,
            all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
            dropout=cfg.dropout,
            nonlinear_inbetween=cfg.hnhn_nonlinear_inbetween,
            dtype=cfg.dtype,
        ))

    elif method == "MLP":
        batch = Batch(
            x=jnp.asarray(data.x), y=jnp.asarray(data.y, jnp.int32), inc=None, extras={}
        )
        model = MLPModel(MLPConfig(
            num_features=num_features, num_classes=num_classes,
            all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
            dropout=cfg.dropout, normalization=cfg.normalization,
            dtype=cfg.dtype,
        ))

    elif method in ("UniGCNII", "UniGNN"):
        d = add_self_loops(data) if cfg.add_self_loop else data
        degV, degE = unignn_degrees(d)
        d.extras = dict(d.extras, degV=degV, degE=degE)
        batch = Batch.from_hyperdata(d, bucket=cfg.bucket)
        if method == "UniGCNII":
            model = UniGCNII(UniGCNIIConfig(
                num_features=num_features, num_classes=num_classes,
                all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
                heads=cfg.heads, use_norm=cfg.unignn_use_norm,
                dtype=cfg.dtype,
            ))
            tx = unigcnii_optimizer()
        else:
            model = UniGNN(UniGNNConfig(
                num_features=num_features, num_classes=num_classes,
                model_name=cfg.unignn_model_name,
                all_num_layers=cfg.all_num_layers, mlp_hidden=cfg.mlp_hidden,
                heads=cfg.heads, dropout=cfg.dropout,
                use_norm=cfg.unignn_use_norm, dtype=cfg.dtype,
            ))

    else:
        raise ValueError(f"unknown method {method!r}; choose from {METHODS}")

    return model, batch, tx


def unigcnii_optimizer() -> optax.GradientTransformation:
    """Two param groups (``src/train.py:463-467``): conv ('reg') params get
    weight_decay 0.01, the in/out linears 5e-4; lr 0.01 for both; L2 added
    before the Adam moments (torch semantics)."""

    def label_fn(params):
        def label(path):
            top = path[0] if path else ""
            return "nonreg" if top in ("lin_in", "lin_out") else "reg"

        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: label(tuple(p.key for p in path)), params
        )

    def group(wd):
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-0.01),
        )

    return optax.multi_transform(
        {"reg": group(0.01), "nonreg": group(5e-4)}, label_fn
    )
