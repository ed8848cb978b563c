"""Every method in the factory trains end-to-end on a learnable synthetic
hypergraph and beats chance — the capability-surface test (SURVEY.md §2.2)."""

import numpy as np
import pytest

from allset_tpu.data.synthetic import synthetic_hypergraph
from allset_tpu.train import TrainConfig, Trainer
from allset_tpu.train.factory import METHODS, ExperimentConfig, prepare


def make_data(seed=0):
    return synthetic_hypergraph(
        num_nodes=100, num_hyperedges=60, num_classes=3,
        homophily=0.9, feature_noise=0.6, seed=seed,
    )


# structure-free MLP can still learn: features are noisy one-hot labels
LEARN_THRESHOLD = {m: 55.0 for m in METHODS}
LEARN_THRESHOLD["CEGAT"] = 50.0  # GAT on tiny graphs is noisier


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.slow
def test_method_trains_and_learns(method):
    data = make_data()
    cfg = ExperimentConfig(
        method=method,
        all_num_layers=2 if method not in ("AllSetTransformer", "AllDeepSets") else 1,
        mlp_hidden=32,
        classifier_hidden=32,
        classifier_num_layers=1,
        mlp_num_layers=2,
        heads=2,
        dropout=0.2,
        lr=0.01,
        bucket=64,
    )
    model, batch, tx = prepare(cfg, data)
    trainer = Trainer(
        model, batch,
        TrainConfig(epochs=80, runs=2, lr=cfg.lr, wd=cfg.wd, seed=0),
        tx=tx,
    )
    res = trainer.fit()
    assert np.all(np.isfinite(res.metrics)), f"{method}: non-finite metrics"
    mean_test, _ = res.best_by_valid()["final_test"]
    assert mean_test > LEARN_THRESHOLD[method], (
        f"{method} failed to learn: {mean_test:.1f}"
    )


def test_hgnn_is_symdegnorm_hcha():
    data = make_data()
    cfg = ExperimentConfig(method="HGNN", mlp_hidden=16, bucket=64)
    model, _, _ = prepare(cfg, data)
    assert model.cfg.symdegnorm is True
    cfg = ExperimentConfig(method="HCHA", mlp_hidden=16, bucket=64)
    model, _, _ = prepare(cfg, data)
    assert model.cfg.symdegnorm is False


def test_alldeepsets_forces_add_aggregation():
    data = make_data()
    model, _, _ = prepare(ExperimentConfig(method="AllDeepSets", bucket=64), data)
    assert model.cfg.aggregate == "add" and model.cfg.pma is False


@pytest.mark.parametrize("name", ["UniGAT", "UniGCN", "UniGCN2", "UniGIN", "UniSAGE"])
def test_unignn_all_convs_forward(name):
    data = make_data()
    cfg = ExperimentConfig(
        method="UniGNN", unignn_model_name=name, mlp_hidden=8, heads=2,
        all_num_layers=2, bucket=64,
    )
    model, batch, tx = prepare(cfg, data)
    res = Trainer(model, batch, TrainConfig(epochs=5, runs=1, lr=0.01), tx=tx).fit()
    assert np.all(np.isfinite(res.metrics))


def test_hypergcn_reapprox_slow_path():
    """HyperGCN_fast=False: Laplacian rebuilt from activations each forward
    via host callback (reference src/utils.py:39-41)."""
    data = make_data()
    cfg = ExperimentConfig(
        method="HyperGCN", hypergcn_fast=False, all_num_layers=2, bucket=64,
    )
    model, batch, tx = prepare(cfg, data)
    res = Trainer(model, batch, TrainConfig(epochs=15, runs=1, lr=0.01), tx=tx).fit()
    assert np.all(np.isfinite(res.metrics))
