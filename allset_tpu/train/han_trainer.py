"""HAN full-batch trainer with early stopping + best-checkpoint restore.

Reference ``src/DGL_HAN/main.py:82-177``: per run — fresh split, HAN over
the metapath graphs, cross-entropy on the train mask, Adam, per-epoch
validation with the dual-criterion EarlyStopping, restore best checkpoint,
report test accuracy / micro-F1 / macro-F1 mean ± std over runs.

Early stopping is inherently data-dependent control flow, so (unlike the
main trainer's scan-over-epochs) the epoch loop runs on host around one
fused jitted step.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from allset_tpu.graph.batch import Batch, split_masks
from allset_tpu.graph.transforms import rand_train_test_idx
from allset_tpu.train.trainer import masked_acc, masked_nll, torch_adam
from allset_tpu.utils.checkpoint import EarlyStopping


@dataclasses.dataclass(frozen=True)
class HANTrainConfig:
    num_epochs: int = 200
    runs: int = 10
    lr: float = 0.005
    weight_decay: float = 0.001
    patience: int = 100
    train_prop: float = 0.5
    valid_prop: float = 0.25
    seed: int = 0


def f1_scores(y_true: np.ndarray, y_pred: np.ndarray):
    from sklearn.metrics import f1_score

    return (
        f1_score(y_true, y_pred, average="micro"),
        f1_score(y_true, y_pred, average="macro"),
    )


def train_han(model, batch: Batch, num_real_nodes: int, cfg: HANTrainConfig,
              verbose: bool = False) -> Dict[str, float]:
    """batch.y uses -1 for hyperedge rows; splits only cover real nodes."""
    tx = torch_adam(cfg.lr, cfg.weight_decay)
    host_rng = np.random.default_rng(cfg.seed)
    y_host = np.asarray(batch.y)

    @jax.jit
    def step(params, opt_state, masks, rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch, True, rngs={"dropout": rng})
            return masked_nll(logits, jnp.maximum(batch.y, 0), masks["train"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logits = model.apply({"params": params}, batch, False)
        y = jnp.maximum(batch.y, 0)
        val_loss = masked_nll(logits, y, masks["valid"])
        val_acc = masked_acc(logits, y, masks["valid"])
        return params, opt_state, loss, val_loss, val_acc

    @jax.jit
    def predict(params):
        return jnp.argmax(model.apply({"params": params}, batch, False), axis=-1)

    accs, micros, macros, times = [], [], [], []
    for run in range(cfg.runs):
        t0 = time.time()
        split = rand_train_test_idx(
            y_host, cfg.train_prop, cfg.valid_prop, rng=host_rng
        )
        masks = split_masks(split, batch.num_nodes)

        rng = jax.random.PRNGKey(cfg.seed + run)
        params = model.init(
            {"params": rng}, batch, False
        )["params"]
        opt_state = tx.init(params)
        stopper = EarlyStopping(patience=cfg.patience)

        for epoch in range(cfg.num_epochs):
            rng, drop = jax.random.split(rng)
            params, opt_state, loss, val_loss, val_acc = step(
                params, opt_state, masks, drop
            )
            if stopper.step(float(val_loss), float(val_acc), params):
                break

        best = stopper.restore()
        pred = np.asarray(predict(best))
        test_idx = np.asarray(split["test"])
        yt = y_host[test_idx]
        yp = pred[test_idx]
        acc = float((yt == yp).mean())
        micro, macro = f1_scores(yt, yp)
        accs.append(100 * acc)
        micros.append(100 * micro)
        macros.append(100 * macro)
        times.append(time.time() - t0)
        if verbose:
            print(f"run {run}: acc={acc:.4f} micro={micro:.4f} macro={macro:.4f}")

    return {
        "test_acc_mean": float(np.mean(accs)),
        "test_acc_std": float(np.std(accs)),
        "micro_f1_mean": float(np.mean(micros)),
        "micro_f1_std": float(np.std(micros)),
        "macro_f1_mean": float(np.mean(macros)),
        "macro_f1_std": float(np.std(macros)),
        "time_per_run": float(np.mean(times)),
    }
