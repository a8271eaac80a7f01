"""End-to-end training on tiny synthetic data: every model runs, losses
decrease, eval protocol and early stopping behave (SURVEY.md §4 item 4)."""

import gc

import jax
import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """Per-FUNCTION executable clearing for this module (stronger than the
    per-module conftest fixture): full-suite runs deterministically abort
    inside XLA-CPU ``backend_compile_and_load`` when this module's flagship
    fast-path program compiles with several hundred live executables from
    the preceding modules; the same test passes in shorter runs.  Each test
    here builds fresh trainers/configs anyway, so intra-module cache reuse
    is minimal and the recompile cost is small."""
    yield
    jax.clear_caches()
    gc.collect()


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


def test_mmssl_dense_graph_mode(tiny_dataset):
    """graph_impl='dense' (MXU propagation) trains to losses close to the
    exact COO path: same math, bf16 adjacency storage."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    tr_coo = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr_dense = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.graph_impl": "dense"})
    from mmssl_tpu.ops.sparse import DenseGraph

    assert isinstance(tr_dense.consts.ui, DenseGraph)
    losses_coo, losses_dense = [], []
    for idx in range(tr_coo.n_batch):
        losses_coo.append(float(tr_coo.train_batch(idx)[2]))
        losses_dense.append(float(tr_dense.train_batch(idx)[2]))
    a, b = np.mean(losses_coo), np.mean(losses_dense)
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) / abs(a) < 0.05, (a, b)
    res = tr_dense.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_mmssl_dense_graph_int8_mode(tiny_dataset):
    """graph_dtype='int8' (counts + f32 row scale) tracks the f32 dense path
    step-for-step: the factorization is exact, only the matmul compute dtype
    (bf16) differs."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0,
          "train.densify_period": 2, "model.graph_impl": "dense"}
    tr_f32 = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.graph_dtype": "float32"})
    tr_i8 = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.graph_dtype": "int8"})
    import jax.numpy as jnp

    assert tr_i8.consts.ui.mat.dtype == jnp.int8
    assert tr_i8.consts.ui.row_scale is not None
    for idx in range(4):
        m_f32 = np.asarray(tr_f32.train_batch(idx))
        m_i8 = np.asarray(tr_i8.train_batch(idx))
        np.testing.assert_allclose(m_f32, m_i8, rtol=5e-2, atol=5e-2)
    res = tr_i8.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_mmssl_dense_graph_f32_exact(tiny_dataset):
    """f32 dense mode matches the COO path almost exactly step-for-step."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0,
          "train.densify_period": 2}
    tr_coo = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr_dense = _mk_trainer(
        tiny_dataset, "mmssl",
        **{**kw, "model.graph_impl": "dense", "model.graph_dtype": "float32"},
    )
    for idx in range(4):
        m_coo = np.asarray(tr_coo.train_batch(idx))
        m_dense = np.asarray(tr_dense.train_batch(idx))
        np.testing.assert_allclose(m_coo, m_dense, rtol=2e-3, atol=2e-3)


def test_mmssl_use_init_static_specialization(tiny_dataset):
    """The trainer's post-rebuild static specialization (use_init lax.cond
    compiled out) produces the same metric traces as an all-dynamic run."""
    kw = {"train.m_topk_rate": 0.1, "train.densify_period": 2}
    # Per-batch path: trainer flips to use_init_static=False after idx=2.
    tr_a = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "train.steps_per_dispatch": 0})
    # Chunked path: first chunk dynamic, second chunk static.
    tr_b = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "train.steps_per_dispatch": 0})
    ms_a, ms_b = [], []
    for idx in range(6):
        ms_a.append(np.asarray(tr_a.train_batch(idx)))
        # drive tr_b identically but force the dynamic path throughout
        tr_b._densified = False
        ms_b.append(np.asarray(tr_b.train_batch(idx)))
    assert tr_a._densified and not tr_b._densified
    np.testing.assert_allclose(np.stack(ms_a), np.stack(ms_b), rtol=1e-5, atol=1e-6)

    tr_c = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "train.steps_per_dispatch": 4})
    m1 = np.asarray(tr_c.train_chunk(0, 4))
    assert tr_c._densified
    m2 = np.asarray(tr_c.train_chunk(4, 4))
    assert np.isfinite(m1).all() and np.isfinite(m2).all()


def test_mmssl_bf16_compute(tiny_dataset):
    """compute_dtype='bfloat16' (bf16 matmul inputs, f32 accumulation for the
    discriminator / projector / u_sim GEMMs) trains to losses close to the
    f32 parity path — the bench fast path."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    tr_f32 = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr_bf16 = _mk_trainer(
        tiny_dataset, "mmssl",
        **{**kw, "model.graph_impl": "dense", "model.compute_dtype": "bfloat16"},
    )
    losses_f32, losses_bf16 = [], []
    for idx in range(tr_f32.n_batch):
        losses_f32.append(float(tr_f32.train_batch(idx)[2]))
        losses_bf16.append(float(tr_bf16.train_batch(idx)[2]))
    a, b = np.mean(losses_f32), np.mean(losses_bf16)
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) / abs(a) < 0.05, (a, b)
    res = tr_bf16.evaluate("val")
    assert np.isfinite(res["recall"]).all()


@pytest.mark.parametrize("model", ["lightgcn", "micro"])
def test_simple_models_dense_graph_mode(tiny_dataset, model):
    """graph_impl='dense' converts the joint adjacency to MXU matmuls for
    the CF branch models too (blockwise: BipartiteJointGraph)."""
    tr = _mk_trainer(tiny_dataset, model, **{
        "model.graph_impl": "dense", "train.steps_per_dispatch": 0,
    })
    from mmssl_tpu.ops.sparse import BipartiteJointGraph

    assert isinstance(tr.consts.joint, BipartiteJointGraph)
    losses = [float(tr.train_batch(idx)[0]) for idx in range(tr.n_batch)]
    assert np.isfinite(losses).all()
    res = tr.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_use_init_phase_matches_explicit_ui_copies(tiny_dataset):
    """Until the first densification rebuild the modality-ID propagation must
    equal propagation over explicit copies of the normalized interaction
    graph (MMSSL/main.py:68-69), and the carried flag must drop after the
    first rebuild."""
    import jax.numpy as jnp
    from mmssl_tpu.models.mmssl import BipartiteGraphs, mmssl_deterministic_branch

    tr = _mk_trainer(tiny_dataset, "mmssl", **{"train.m_topk_rate": 0.1})
    mods = tuple(sorted(tr.consts.feats))
    g_flag = BipartiteGraphs(
        ui=tr.consts.ui, iu=tr.consts.iu,
        mod_ui=tr.state.mod_ui, mod_iu=tr.state.mod_iu,
        use_init=tr.state.use_init,
    )
    g_explicit = BipartiteGraphs(
        ui=tr.consts.ui, iu=tr.consts.iu,
        mod_ui={m: tr.consts.ui for m in mods},
        mod_iu={m: tr.consts.iu for m in mods},
    )
    det_a = mmssl_deterministic_branch(tr.state.params, g_flag, tr.cfg.model, tr.cfg.parity, mods)
    det_b = mmssl_deterministic_branch(tr.state.params, g_explicit, tr.cfg.model, tr.cfg.parity, mods)
    np.testing.assert_allclose(np.asarray(det_a.user_base), np.asarray(det_b.user_base), rtol=1e-6)
    for m in mods:
        np.testing.assert_allclose(
            np.asarray(det_a.mm_user_id[m]), np.asarray(det_b.mm_user_id[m]), rtol=1e-6
        )

    assert bool(tr.state.use_init)
    tr.train_batch(0)  # accumulate only (idx=0): flag stays
    assert bool(tr.state.use_init)
    tr.train_batch(1)  # first rebuild (T=1, idx>=1): flag drops
    assert not bool(tr.state.use_init)


def test_mmssl_remat(tiny_dataset):
    """train.remat wraps the fused forward in jax.checkpoint; numerics equal
    the non-remat step."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    tr_a = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr_b = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "train.remat": True})
    for idx in range(3):
        m_a = np.asarray(tr_a.train_batch(idx))
        m_b = np.asarray(tr_b.train_batch(idx))
        np.testing.assert_allclose(m_a, m_b, rtol=2e-4, atol=2e-4)


def test_mmssl_disc_lowrank_matches_direct(tiny_dataset):
    """disc_lowrank='on' (factorized discriminator layer 1 on fake rows,
    steps_mmssl.disc_z1_lowrank) reproduces the direct path's full training
    trajectory in f32 — same losses for BOTH optimizers over several steps
    (the D step exercises the W1-cotangent scatter, the G step the U/I
    cotangent paths)."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    tr_off = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.disc_lowrank": "off"})
    tr_on = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.disc_lowrank": "on"})
    assert tr_on.cfg.model.disc_lowrank == "on"
    for idx in range(4):
        m_off = np.asarray(tr_off.train_batch(idx))
        m_on = np.asarray(tr_on.train_batch(idx))
        np.testing.assert_allclose(m_on, m_off, rtol=5e-3, atol=1e-4)


def test_mmssl_disc_fused_l1_matches_separate(tiny_dataset):
    """disc_fused_l1 (one l1 GEMM for the fake + real towers, split before
    BatchNorm) reproduces the separate-tower trajectory: per-tower BN stats
    and per-tower dropout keys are unchanged, so only GEMM tiling order can
    differ."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    tr_off = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr_on = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.disc_fused_l1": True})
    for idx in range(4):
        m_off = np.asarray(tr_off.train_batch(idx))
        m_on = np.asarray(tr_on.train_batch(idx))
        np.testing.assert_allclose(m_on, m_off, rtol=5e-3, atol=1e-4)


def test_mmssl_shared_fwd_draw(tiny_dataset):
    """train.shared_fwd_draw (one modality-dropout draw for both per-batch
    forwards): with drop_rate=0 the two draws are vacuous, so the narrowed
    program must reproduce the default trajectory exactly; with real
    dropout it must still train (the distributional change is gated by the
    quality protocol, docs/performance.md)."""
    kw = {"train.m_topk_rate": 0.1, "train.steps_per_dispatch": 0}
    # drop_rate=0: shared vs unshared is pure program restructuring.
    tr_off = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "model.drop_rate": 0.0})
    tr_on = _mk_trainer(
        tiny_dataset, "mmssl",
        **{**kw, "model.drop_rate": 0.0, "train.shared_fwd_draw": True},
    )
    assert tr_off.cfg.train.shared_fwd_draw is False  # reference-parity default
    for idx in range(3):
        m_off = np.asarray(tr_off.train_batch(idx))
        m_on = np.asarray(tr_on.train_batch(idx))
        np.testing.assert_allclose(m_on, m_off, rtol=5e-3, atol=1e-4)
    # Real dropout: different distribution, must still optimize finitely.
    tr = _mk_trainer(tiny_dataset, "mmssl", **{**kw, "train.shared_fwd_draw": True})
    losses = [float(tr.train_batch(idx)[0]) for idx in range(3)]
    assert np.isfinite(losses).all()


def test_mmssl_disc_lowrank_auto_resolves_off(tiny_dataset):
    """'auto' resolves to 'off' (measured net-negative on TPU — see
    docs/performance.md); the resolved value is a static compile-time flag."""
    tr = _mk_trainer(tiny_dataset, "mmssl", **{"model.disc_lowrank": "auto"})
    assert tr.cfg.model.disc_lowrank == "off"


def test_micro_dense_mode_matches_sparse(tiny_dataset):
    """model.micro_sparse=False (dense laplacian modality graphs, the
    reference's --sparse 0 branch) trains to the same losses as the sparse
    COO default — same math, MXU-friendly layout."""
    kw = {"train.steps_per_dispatch": 0}
    tr_s = _mk_trainer(tiny_dataset, "micro", **kw)
    tr_d = _mk_trainer(tiny_dataset, "micro", **{**kw, "model.micro_sparse": False})
    for idx in range(3):
        m_s = np.asarray(tr_s.train_batch(idx))
        m_d = np.asarray(tr_d.train_batch(idx))
        np.testing.assert_allclose(m_d, m_s, rtol=2e-3, atol=2e-4)
    es = tr_s.evaluate("val")["recall"]
    ed = tr_d.evaluate("val")["recall"]
    np.testing.assert_allclose(ed, es, rtol=1e-3, atol=2e-3)


def test_micro_cl_schedule_knobs_are_exact(tiny_dataset):
    """train.cl_remat / train.cl_batched are VJP-schedule / batching choices
    only: every combination trains to the default's losses (round-5 MICRO
    attribution levers — both measured NEGATIVE on chip and default off/on
    as shipped, docs/performance.md)."""
    kw = {"train.steps_per_dispatch": 0}
    ref = _mk_trainer(tiny_dataset, "micro", **kw)
    ms = [np.asarray(ref.train_batch(i)) for i in range(2)]
    for extra in ({"train.cl_remat": False}, {"train.cl_batched": True},
                  {"train.cl_batched": True, "train.cl_remat": False}):
        tr = _mk_trainer(tiny_dataset, "micro", **{**kw, **extra})
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(tr.train_batch(i)), ms[i], rtol=2e-5, atol=2e-6,
                err_msg=str(extra))


def test_micro_loss_ratio_zero_statically_skips_cl(tiny_dataset):
    """loss_ratio=0 removes the InfoNCE compute from the program (round 5:
    the multiply-by-zero form hid 44% of MICRO's step behind a non-ablation);
    cl_loss reads exactly 0 and training still proceeds."""
    tr = _mk_trainer(tiny_dataset, "micro",
                     **{"train.steps_per_dispatch": 0, "train.loss_ratio": 0.0})
    keys = list(tr.metric_keys)
    m = np.asarray(tr.train_batch(0))
    assert np.isfinite(m).all()
    assert float(m[keys.index("cl_loss")]) == 0.0


@pytest.mark.parametrize("model", ["lightgcn", "ngcf", "lattice", "micro"])
def test_simple_models_dense_joint(tiny_dataset, model):
    """graph_impl='dense' routes the CF joint adjacency through
    BipartiteJointGraph (blockwise D^-1(A+I)); losses match the exact COO
    path and eval stays finite."""
    kw = {"train.steps_per_dispatch": 0}
    tr_coo = _mk_trainer(tiny_dataset, model, **kw)
    tr_den = _mk_trainer(tiny_dataset, model, **{**kw, "model.graph_impl": "dense",
                                                 "model.graph_dtype": "float32"})
    for idx in range(2):
        m_c = np.asarray(tr_coo.train_batch(idx))
        m_d = np.asarray(tr_den.train_batch(idx))
        np.testing.assert_allclose(m_d, m_c, rtol=2e-3, atol=2e-4)
    res = tr_den.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_mmssl_production_fast_path_stack(tiny_dataset):
    """The full production fast-path configuration benched by bench.py —
    dense int8 graphs + bf16 compute + bf16 D moments + bf16 D-tower
    weights + shared forward draw + rbg PRNG + fused dispatch — trains
    sanely: loss decreases epoch-over-epoch and eval is finite.  Guards
    the benchmark configuration against quality regressions that per-flag
    tests might miss in combination."""
    tr = _mk_trainer(tiny_dataset, "mmssl", **{
        "model.graph_impl": "dense",
        "model.graph_dtype": "int8",
        "model.compute_dtype": "bfloat16",
        "train.d_moment_dtype": "bfloat16",
        "train.d_param_dtype": "bfloat16",
        "train.shared_fwd_draw": True,
        "train.prng_impl": "rbg",
        "train.m_topk_rate": 0.1,
    })
    spd = 4
    m1 = np.asarray(tr.train_chunk(0, spd))
    m2 = np.asarray(tr.train_chunk(spd, spd))
    m3 = np.asarray(tr.train_chunk(2 * spd, spd))
    assert np.isfinite(m1).all() and np.isfinite(m3).all()
    # mf_loss (BPR) mean should drop from the first chunk to the third
    assert m3[:, 2].mean() < m1[:, 2].mean()
    res = tr.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_mmssl_single_modality(tiny_dataset):
    """The N-modality generalization holds at N=1 (the reference hardcodes
    image+text; our zoo accepts any data.modalities tuple)."""
    import dataclasses

    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16, "model.embed_size": 16,
        "train.steps_per_dispatch": 0,
    })
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, modalities=("image",)))
    ds = dataclasses.replace(tiny_dataset, feats={"image": tiny_dataset.feats["image"]})
    tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    m = np.asarray(tr.train_batch(0))
    assert np.isfinite(m).all()
    res = tr.evaluate("val")
    assert np.isfinite(res["recall"]).all()


def test_effective_spd_minimizes_epoch_tail(tiny_dataset):
    """fit()'s fused-chunk size bends to the tail-minimizing length in
    [cap/2, cap] (cap = min(spd, n_batch)): divisors win outright, primes
    pick the minimal tail, whole small-but-not-tiny epochs fuse as one
    dispatch, and tiny epochs keep the per-batch path."""
    tr = _mk_trainer(tiny_dataset, "mf", **{"train.steps_per_dispatch": 64})
    cases = {
        105: 35,   # Amazon-Baby geometry: largest divisor <= 64, zero tail
        227: 45,   # Sports geometry (prime): minimal tail (227 = 5*45 + 2)
        256: 64,   # already divides
        59: 59,    # Tiktok geometry: whole epoch as ONE dispatch
        20: 64,    # tiny epoch (cap < 32): per-batch path unchanged
    }
    for n_batch, want in cases.items():
        tr.n_batch = n_batch
        assert tr._effective_spd() == want, (n_batch, tr._effective_spd())
    # Round-4 default cap (spd=128): Baby-class epochs fuse WHOLE (105 in
    # one dispatch, measured 7.95 vs 8.12 ms/step chunked), Sports' prime
    # 227 bends to 113 with a 1-batch tail (was 45 with tail 2 at cap 64).
    tr128 = _mk_trainer(tiny_dataset, "mf", **{"train.steps_per_dispatch": 128})
    for n_batch, want in {105: 105, 227: 113, 59: 59, 256: 128}.items():
        tr128.n_batch = n_batch
        assert tr128._effective_spd() == want, (n_batch, tr128._effective_spd())


def test_effective_spd_offsets_graph_building_models(tiny_dataset):
    """LATTICE/MICRO dispatch batch 0 separately (the build-item-graph
    program) and chunk from idx=1, so the chunked stream is n_batch-1 steps;
    the tail must be minimized against THAT stream (ADVICE r3: minimizing
    n_batch % c instead produced a 34-roundtrip per-epoch tail at Baby
    scale)."""
    import types

    from mmssl_tpu.train.trainer import Trainer

    def spd_for(model, n_batch, spd=64):
        stub = types.SimpleNamespace(
            cfg=types.SimpleNamespace(
                train=types.SimpleNamespace(steps_per_dispatch=spd),
                model=types.SimpleNamespace(name=model),
            ),
            n_batch=n_batch,
        )
        return Trainer._effective_spd(stub)

    # Baby geometry: stream 104 -> 52 (zero tail; the old code returned 35
    # against n_batch=105, leaving a 104 % 35 = 34-batch tail).
    assert spd_for("lattice", 105) == 52
    assert spd_for("micro", 105) == 52
    assert (105 - 1) % spd_for("lattice", 105) == 0
    # Tiktok geometry: stream 58 fuses as one dispatch.
    assert spd_for("lattice", 59) == 58
    # MMSSL/CF models are unaffected by the offset.
    assert spd_for("mmssl", 105) == 35
    assert spd_for("lightgcn", 105) == 35


def test_mmssl_bf16_d_params_train_and_checkpoint(tiny_dataset, tmp_path):
    """train.d_param_dtype='bfloat16' (the round-4 fast-path knob): tower
    weights are stored bf16 (BatchNorm stays f32), training steps/chunks
    run finite, and the portable checkpoint roundtrips the dtype."""
    import jax.numpy as jnp

    kw = {
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.d_param_dtype": "bfloat16",
        "train.d_moment_dtype": "bfloat16",
        "train.checkpoint_dir": str(tmp_path / "ckpt_bf16d"),
    }
    tr = _mk_trainer(tiny_dataset, "mmssl", **kw)
    assert tr.state.d_params["l1"]["w"].dtype == jnp.bfloat16
    assert tr.state.d_params["bn1"]["gamma"].dtype == jnp.float32
    for i in range(3):
        m = np.asarray(tr.train_batch(i))
        assert np.isfinite(m).all()
    assert tr.state.d_params["l1"]["w"].dtype == jnp.bfloat16  # survives updates
    tr.save_checkpoint(3, {"epoch": 0})
    tr2 = _mk_trainer(tiny_dataset, "mmssl", **kw)
    tr2.resume()
    assert tr2.state.d_params["l1"]["w"].dtype == jnp.bfloat16
    m = np.asarray(tr2.train_chunk(3, 2))
    assert np.isfinite(m).all()
