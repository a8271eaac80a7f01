"""End-to-end training on tiny synthetic data: every model runs, losses
decrease, eval protocol and early stopping behave (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def _mk_trainer(tiny_dataset, model, **overrides):
    cfg = preset("tiny", model, **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "model.head_num": 4,
        "model.knn_topk": 3,
        "eval.ks": (3, 5, 10),
        "eval.user_batch_size": 32,
        "train.seed": 0,
        **overrides,
    })
    return Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))


@pytest.mark.parametrize("model", ["mf", "lightgcn", "ngcf", "lattice", "micro"])
def test_simple_models_train(tiny_dataset, model):
    tr = _mk_trainer(tiny_dataset, model)
    epoch_means = []
    for epoch in range(4):
        batch_losses = []
        for idx in range(tr.n_batch):
            batch_losses.append(float(tr.train_batch(idx)[0]))
        epoch_means.append(np.mean(batch_losses))
    assert np.isfinite(epoch_means).all()
    # Optimization makes progress (epoch means, robust to batch noise).
    assert epoch_means[-1] < epoch_means[0]
    res = tr.evaluate("val")
    assert res["recall"].shape == (3,)
    assert np.isfinite(res["recall"]).all()


def test_mmssl_trains(tiny_dataset):
    tr = _mk_trainer(tiny_dataset, "mmssl", **{"train.m_topk_rate": 0.1})
    epoch_means = []
    for epoch in range(4):
        batch_losses = []
        for idx in range(tr.n_batch):
            batch_losses.append(float(tr.train_batch(idx)[2]))  # mf_loss
        epoch_means.append(np.mean(batch_losses))
    assert np.isfinite(epoch_means).all()
    assert epoch_means[-1] < epoch_means[0]
    # Densified graphs rebuilt with T=1 cadence: after idx>=2 rebuilds see
    # empty buffers (quirk Q5) -> graph vals all zero but run stays finite.
    for m_ in tr.state.mod_ui.values():
        assert np.isfinite(np.asarray(m_.vals)).all()
    res = tr.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_mmssl_densify_t2(tiny_dataset):
    # T=2: rebuilds see one accumulated batch -> non-empty densified graphs.
    tr = _mk_trainer(tiny_dataset, "mmssl", **{"train.densify_period": 2, "train.m_topk_rate": 0.1})
    for idx in range(3):
        tr.train_batch(idx)
    nnz = sum(int((np.asarray(g.vals) != 0).sum()) for g in tr.state.mod_ui.values())
    assert nnz > 0


def test_fit_early_stopping(tiny_dataset):
    tr = _mk_trainer(tiny_dataset, "mf", **{"train.early_stopping_patience": 1})
    res = tr.fit(epochs=30)
    assert res.epochs_run <= 30
    assert res.best_epoch >= 0
    assert "recall" in res.test_metrics
    assert len(res.history) == res.epochs_run or res.stopped_early
