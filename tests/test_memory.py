"""HBM budget estimator (utils/memory.py, VERDICT r4 Missing #3).

Component math is checked against hand-computed sizes at a Netflix-class
geometry, and the refusal path is exercised with a tiny budget."""

import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.utils.memory import (
    GIB,
    check_hbm_budget,
    estimate_mmssl_hbm,
    format_report,
)

NETFLIX = dict(n_users=70_000, n_items=40_000,
               feat_dims={"image": 4096, "text": 1024})


def _cfg(**overrides):
    return preset("netflix", "mmssl", **{"data.batch_size": 1024, **overrides})


def test_component_math_netflix_geometry():
    cfg = _cfg(**{"model.graph_impl": "dense", "model.graph_dtype": "int8",
                  "model.compute_dtype": "bfloat16",
                  "train.d_param_dtype": "bfloat16",
                  "train.d_moment_dtype": "bfloat16"})
    est = estimate_mmssl_hbm(cfg, n_batch=445, **NETFLIX)
    c = est["components"]
    # Dense int8 graphs: 2 directions x 70k x 40k x 1 byte.
    assert c["graphs_dense(ui+iu)"] == 2 * 70_000 * 40_000
    # D tower at bf16: n*h1 + h1*h2 + h2 params, 2 bytes each.
    h1, h2 = 10_000, 5_000
    d_n = 40_000 * h1 + h1 * h2 + h2
    assert c["d_tower_params"] == d_n * 2
    assert c["d_tower_moments(x2)"] == d_n * 2 * 2
    # 3 coexisting l1-shaped cotangents x 1.75 fragmentation (calibrated
    # against the measured netflix OOM dump).
    assert c["d_tower_grads(transient)"] == int(d_n * 2 * 3 * 1.75)
    # One int8 graph direction converted to the bf16 compute dtype for the
    # MXU (the component that kills dense at this scale even at batch 512).
    assert c["graphs_mxu_convert"] == 70_000 * 40_000 * 2
    # Features: stored f32 + bf16 compute copy.
    f_n = 40_000 * (4096 + 1024)
    assert c["feats_f32"] == f_n * 4
    assert c["feats_compute_copy"] == f_n * 2
    # Calibration: this config measured 19.9 GiB (OOM on the 15.75 GiB
    # chip); the estimate must land near it and above the 16 GiB budget.
    assert 16 * GIB < est["total_bytes"] < 23 * GIB


def test_coo_netflix_fits_dense_refused(monkeypatch):
    """The measured large-catalog matrix (docs/performance.md): dense-int8
    OOMs on one chip at Netflix scale while graph_impl='coo' runs — the
    estimator reproduces both verdicts at the 16 GiB default budget."""
    monkeypatch.delenv("MMSSL_TPU_HBM_GB", raising=False)
    dense = _cfg(**{"model.graph_impl": "dense", "model.graph_dtype": "int8",
                    "model.compute_dtype": "bfloat16",
                    "train.d_param_dtype": "bfloat16",
                    "train.d_moment_dtype": "bfloat16",
                    "train.shared_fwd_draw": True})
    with pytest.raises(MemoryError, match="coo"):
        check_hbm_budget(dense, n_batch=445, **NETFLIX)
    coo = _cfg(**{"model.graph_impl": "coo", "model.compute_dtype": "bfloat16",
                  "train.d_param_dtype": "bfloat16",
                  "train.d_moment_dtype": "bfloat16",
                  "train.shared_fwd_draw": True})
    est = check_hbm_budget(coo, n_batch=445, **NETFLIX)
    assert est["total_bytes"] < 16 * GIB


def test_fp32_d_tower_dominates_and_is_suggested():
    cfg = _cfg(**{"model.graph_impl": "dense", "model.graph_dtype": "int8",
                  "train.d_param_dtype": "float32",
                  "train.d_moment_dtype": "float32"})
    est = estimate_mmssl_hbm(cfg, n_batch=445, **NETFLIX)
    text = " ".join(est["suggestions"])
    assert "d_param_dtype" in text and "d_moment_dtype" in text
    report = format_report(est, 16 * GIB)
    assert "d_tower" in report and "GiB" in report


def test_budget_refusal_is_actionable(monkeypatch):
    cfg = _cfg(**{"model.graph_impl": "dense", "model.graph_dtype": "int8"})
    monkeypatch.setenv("MMSSL_TPU_HBM_GB", "1")
    with pytest.raises(MemoryError, match="cannot fit"):
        check_hbm_budget(cfg, n_batch=445, **NETFLIX)
    # 0 disables; generous budget passes.
    monkeypatch.setenv("MMSSL_TPU_HBM_GB", "0")
    check_hbm_budget(cfg, n_batch=445, **NETFLIX)
    monkeypatch.setenv("MMSSL_TPU_HBM_GB", "64")
    est = check_hbm_budget(cfg, n_batch=445, **NETFLIX)
    assert est["total_bytes"] > 0


def test_coo_mode_prices_no_dense_graphs():
    cfg = _cfg(**{"model.graph_impl": "coo"})
    est = estimate_mmssl_hbm(cfg, n_batch=445, **NETFLIX)
    assert "graphs_dense(ui+iu)" not in est["components"]
