"""Checkpoint/resume roundtrip (net-new subsystem, SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmssl_tpu.config import preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def test_checkpoint_roundtrip(tiny_dataset, tmp_path):
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.checkpoint_dir": str(tmp_path / "ckpt"),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    for idx in range(3):
        tr.train_batch(idx)
    tr.save_checkpoint(3, {"epoch": 0, "note": "test"})

    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    extra = tr2.resume()
    assert extra["note"] == "test"
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["user_emb"]), np.asarray(tr.state.params["user_emb"])
    )
    np.testing.assert_allclose(
        np.asarray(tr2.state.d_params["l1"]["w"]), np.asarray(tr.state.d_params["l1"]["w"])
    )
    assert int(tr2.state.step) == int(tr.state.step)
    # Densified-graph state and buffers survive.
    for m in tr.state.mod_ui:
        np.testing.assert_allclose(np.asarray(tr2.state.mod_ui[m].vals), np.asarray(tr.state.mod_ui[m].vals))
        assert int(tr2.state.buf_count[m]) == int(tr.state.buf_count[m])
    # Resumed training continues deterministically vs the original.
    rng = np.random.default_rng(0)
    u, p, n = tr.sampler.sample(rng)
    rng2 = np.random.default_rng(0)
    u2, p2, n2 = tr2.sampler.sample(rng2)
    np.testing.assert_array_equal(u, u2)
    m1 = tr.train_batch(3)
    m2 = tr2.train_batch(3)
    # Different sampler draws (internal state differs) -> just check finite.
    assert np.isfinite(float(m1[0])) and np.isfinite(float(m2[0]))


def test_checkpoint_roundtrip_rbg_prng(tiny_dataset, tmp_path):
    """rbg PRNG keys (train.prng_impl, the bench fast path) survive the
    externalize/internalize roundtrip: key data is [4]xu32 and must re-wrap
    with the template's impl, not the threefry default."""
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.prng_impl": "rbg",
        "train.checkpoint_dir": str(tmp_path / "ckpt_rbg"),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    tr.train_batch(0)
    tr.save_checkpoint(1, {"epoch": 0})
    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    tr2.resume()
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(tr2.state.rng)),
        np.asarray(jax.random.key_data(tr.state.rng)),
    )
    assert jax.random.key_impl(tr2.state.rng) == jax.random.key_impl(tr.state.rng)
    # The restored trainer keeps training with identical RNG trajectory:
    # same step on both produces identical metrics under the device sampler.
    m1 = tr.train_chunk(1, 2)
    m2 = tr2.train_chunk(1, 2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip_under_mesh(tiny_dataset, tmp_path):
    """Mesh checkpoint/resume (VERDICT r1 Missing #6): save under a (4,2)
    mesh AFTER a densification rebuild, restore into a fresh mesh Trainer,
    and continue BOTH sharded step programs on the restored buffers with
    exact metric continuity."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmssl_tpu.parallel.mesh import make_mesh

    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.checkpoint_dir": str(tmp_path / "ckpt_mesh"),
    })
    mesh = make_mesh(8, mesh_shape=(4, 2))
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    for idx in range(3):  # idx 2 triggers the rebuild (T=2)
        tr.train_batch(idx)
    assert tr._densified and not bool(jax.device_get(tr.state.use_init))
    tr.save_checkpoint(3, {"epoch": 0})

    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    tr2.resume()
    # Restored buffers carry the mesh shardings (not single-device): the
    # item table is row-sharded over the model axis per parallel/spmd.py.
    assert tr2.state.params["item_emb"].sharding == NamedSharding(mesh, P("model", None))
    assert tr2._densified  # host mirror re-derived -> noinit program selected
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["user_emb"]), np.asarray(tr.state.params["user_emb"])
    )
    for m in tr.state.mod_ui:
        np.testing.assert_allclose(
            np.asarray(tr2.state.mod_ui[m].vals), np.asarray(tr.state.mod_ui[m].vals)
        )
    # Identical restored state + rng -> the fused sharded chunk (device
    # sampler) continues bit-compatibly on both trainers...
    m1 = np.asarray(tr.train_chunk(3, 2))
    m2 = np.asarray(tr2.train_chunk(3, 2))
    np.testing.assert_allclose(m1, m2, rtol=1e-5, atol=1e-6)
    # ...and the per-batch sharded step (post-rebuild use_init_static=False
    # specialization) runs on the restored+advanced buffers.
    m3 = np.asarray(tr2.train_batch(5))
    assert np.isfinite(m3).all()


def test_mesh_geometry_mismatch_is_actionable(tiny_dataset, tmp_path):
    """Catalog tables are checkpointed at mesh-dependent geometry-padded
    shapes; restoring into a trainer with a different mesh (or none) must
    raise an error naming the padding/mesh cause, not a raw orbax shape
    mismatch (ADVICE r2)."""
    import pytest

    from mmssl_tpu.parallel.mesh import make_mesh

    cfg = preset("tiny", "mf", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.checkpoint_dir": str(tmp_path / "ckpt_geom"),
    })
    mesh = make_mesh(8, mesh_shape=(2, 4))  # 50 users / 30 items pad to 52/32
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    assert tr.n_users_pad != tiny_dataset.n_users  # padding actually engaged
    tr.train_batch(0)
    tr.save_checkpoint(1, {"epoch": 0})

    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    with pytest.raises(RuntimeError, match="mesh"):
        tr2.resume()


def test_prng_impl_mismatch_is_actionable():
    """Restoring key data written under one train.prng_impl into a template
    of another raises a clear error naming the impl, not a shape error deep
    in wrap_key_data (ADVICE r1)."""
    import jax
    import pytest

    from mmssl_tpu.train.checkpoint import _externalize, _internalize

    threefry_data = _externalize({"rng": jax.random.key(0, impl="threefry2x32")})
    rbg_template = {"rng": jax.random.key(0, impl="rbg")}
    with pytest.raises(ValueError, match="prng_impl"):
        _internalize(threefry_data, rbg_template)
