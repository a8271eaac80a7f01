"""FLOP accounting (utils/flops.py): XLA cost analysis of the benchmarked
per-batch step program, for the MFU fields in the bench JSON lines."""

import numpy as np

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.flops import mfu_fields, train_step_flops
from mmssl_tpu.utils.logging import MetricLogger


def _trainer(tiny_dataset, model, **ov):
    cfg = preset("tiny", model, **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5),
        **ov,
    })
    return Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))


def test_mmssl_step_flops_scale_with_geometry(tiny_dataset):
    tr = _trainer(tiny_dataset, "mmssl")
    flops = train_step_flops(tr)
    assert flops is not None and flops > 0
    # Lower bound: the modality-stack graph propagation alone is four
    # [n_u, n_i] x [n_i, W] GEMM-class passes (docs/performance.md); the full
    # adversarial step must exceed just one of them.
    n_u, n_i, e = tiny_dataset.n_users, tiny_dataset.n_items, 16
    assert flops > 2 * n_u * n_i * e

    # A wider embedding strictly increases the count.
    tr_wide = _trainer(tiny_dataset, "mmssl", **{"model.embed_size": 32})
    flops_wide = train_step_flops(tr_wide)
    assert flops_wide is not None and flops_wide > flops


def test_simple_step_flops(tiny_dataset):
    flops = {m: train_step_flops(_trainer(tiny_dataset, m)) for m in ("mf", "lattice")}
    assert all(v is not None and v > 0 for v in flops.values())
    # LATTICE (kNN graphs + propagation + CF branch) strictly outweighs MF.
    assert flops["lattice"] > flops["mf"]


def test_mfu_fields():
    out = mfu_fields(1.97e12, 0.01)  # 1.97 TFLOP in 10 ms = 197 TFLOP/s
    assert out["tflops_per_step"] == 1.97
    assert abs(out["mfu_pct"] - 100.0) < 1e-6
    empty = mfu_fields(None, 0.01)
    assert empty["tflops_per_step"] is None and empty["mfu_pct"] is None
