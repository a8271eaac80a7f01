"""Fault injection + checkpoint recovery story, and profiling utilities."""

import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.faults import FaultInjector, InjectedFault, check_finite
from mmssl_tpu.utils.logging import MetricLogger
from mmssl_tpu.utils.profiling import StepTimer


def test_fault_injector_deterministic():
    fi = FaultInjector(rate=0.5, seed=0)
    fired = 0
    for _ in range(100):
        try:
            fi.maybe_fail("x")
        except InjectedFault:
            fired += 1
    assert 30 < fired < 70
    assert FaultInjector(rate=0.0).maybe_fail("never") is None


def test_check_finite():
    check_finite("ok", 1.0)
    with pytest.raises(FloatingPointError):
        check_finite("bad", float("nan"))


def test_crash_and_resume(tiny_dataset, tmp_path):
    """A fault mid-training is survivable: resume from the checkpoint and
    continue to the same quality as an uninterrupted run."""
    cfg = preset("tiny", "lightgcn", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "eval.ks": (3, 5),
        "train.checkpoint_dir": str(tmp_path / "ck"),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    for idx in range(4):
        tr.train_batch(idx)
    tr.save_checkpoint(4, {"batches": 4})

    # Inject a guaranteed fault on the next batch.
    tr.fault_injector = FaultInjector(rate=1.0)
    with pytest.raises(InjectedFault):
        tr.train_batch(5)

    # Fresh process simulation: new trainer, resume, continue.
    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    extra = tr2.resume()
    assert extra["batches"] == 4
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["user_emb"]), np.asarray(tr.state.params["user_emb"])
    )
    m = tr2.train_batch(5)
    assert np.isfinite(float(m[0]))


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t.measure():
            sum(range(1000))
    s = t.summary()
    assert s["count"] == 5
    assert s["p50_ms"] >= 0
