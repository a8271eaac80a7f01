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


def _make_geom_trainer(cfg, tiny_dataset, geom):
    """geom: None (no mesh) or a mesh shape tuple over the 8 CPU devices."""
    from mmssl_tpu.parallel.mesh import make_mesh

    mesh = None if geom is None else make_mesh(8, mesh_shape=geom)
    return Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)


# (2, 4) pads 50 users / 30 items to 52 / 32; (4, 2) divides evenly (no
# padding); None is the single-device layout — together the matrix covers
# pad -> unpad, unpad -> pad, and pad -> different-pad restores.
_GEOMETRIES = (None, (2, 4), (4, 2))


def test_checkpoint_cross_geometry_mmssl(tiny_dataset, tmp_path):
    """Mesh-geometry-portable checkpoints (VERDICT r3 #1): a checkpoint
    saved under each of {no-mesh, (2,4), (4,2)} restores under each of the
    others — catalog tables are saved sliced to REAL rows and re-padded to
    the restoring trainer's multiples (train/portable.py) — and continued
    training (fused chunk, device sampler => identical batch streams)
    matches the saving trainer's own continuation."""
    for gi, save_geom in enumerate(_GEOMETRIES):
        cfg = preset("tiny", "mmssl", **{
            "data.batch_size": 16,
            "model.embed_size": 16,
            "train.m_topk_rate": 0.1,
            "train.densify_period": 2,
            "train.checkpoint_dir": str(tmp_path / f"ckpt_x_{gi}"),
        })
        tr = _make_geom_trainer(cfg, tiny_dataset, save_geom)
        for idx in range(3):  # idx 2 triggers the densification rebuild (T=2)
            tr.train_batch(idx)
        assert tr._densified
        tr.save_checkpoint(3, {"epoch": 0})
        u_saved = np.asarray(tr.state.params["user_emb"])[: tiny_dataset.n_users]
        expected = np.asarray(tr.train_chunk(3, 2))  # saving trainer's own continuation
        for restore_geom in _GEOMETRIES:
            tr2 = _make_geom_trainer(cfg, tiny_dataset, restore_geom)
            tr2.resume()
            assert tr2._densified  # use_init mirror survives the geometry change
            np.testing.assert_allclose(
                np.asarray(tr2.state.params["user_emb"])[: tiny_dataset.n_users],
                u_saved, rtol=1e-6, atol=1e-7,
            )
            # Re-padded pad rows are exact zeros (the padding invariant).
            if tr2.n_users_pad > tiny_dataset.n_users:
                pad = np.asarray(tr2.state.params["user_emb"])[tiny_dataset.n_users:]
                np.testing.assert_array_equal(pad, 0.0)
            got = np.asarray(tr2.train_chunk(3, 2))
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_checkpoint_cross_geometry_simple_models(tiny_dataset, tmp_path):
    """Cross-geometry restore for the simple-model state shapes: LATTICE's
    dense [n_items, n_items] carried graph, MICRO's fixed-capacity sparse
    COO carried graphs, and MF's plain tables all cross pad -> unpad and
    unpad -> pad exactly."""
    for model in ("lattice", "micro", "mf"):
        for gi, (save_geom, restore_geom) in enumerate(
            (((2, 4), None), (None, (2, 4)))
        ):
            cfg = preset("tiny", model, **{
                "data.batch_size": 16,
                "model.embed_size": 16,
                "model.knn_topk": 5,
                "train.checkpoint_dir": str(tmp_path / f"ckpt_s_{model}_{gi}"),
            })
            tr = _make_geom_trainer(cfg, tiny_dataset, save_geom)
            for idx in range(2):  # idx 0 builds the carried item graph
                tr.train_batch(idx)
            tr.save_checkpoint(2, {"epoch": 0})
            expected = np.asarray(tr.train_chunk(2, 2))
            tr2 = _make_geom_trainer(cfg, tiny_dataset, restore_geom)
            tr2.resume()
            got = np.asarray(tr2.train_chunk(2, 2))
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_legacy_checkpoint_mismatch_is_hedged(tiny_dataset, tmp_path):
    """A pre-portable (legacy) checkpoint saved under a different geometry
    still fails with an error that names the POSSIBLE causes (mesh geometry
    OR config change) rather than asserting one confidently (ADVICE r3)."""
    import pytest

    from mmssl_tpu.parallel.mesh import make_mesh

    cfg = preset("tiny", "mf", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.checkpoint_dir": str(tmp_path / "ckpt_legacy"),
    })
    mesh = make_mesh(8, mesh_shape=(2, 4))  # pads 50/30 -> 52/32
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    assert tr.n_users_pad != tiny_dataset.n_users  # padding actually engaged
    tr.train_batch(0)
    # Legacy format: raw padded state, no ckpt_geometry marker.
    tr.ckpt.save(1, tr.state, {"epoch": 0})

    tr2 = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    with pytest.raises(RuntimeError, match="legacy.*mesh|mesh.*legacy"):
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


def test_capacity_elastic_restore(tiny_dataset, tmp_path):
    """Capacity-ELASTIC restore (round 4): a checkpoint saved under one
    batch_size/densify_period restores under another — graph_capacity
    changes resize the densification buffers exactly (live entries are
    front-packed; growth pads, shrink is overflow-checked)."""
    base = {
        "model.embed_size": 16,
        "train.m_topk_rate": 0.2,
        "train.checkpoint_dir": str(tmp_path / "ckpt_cap"),
    }
    cfg = preset("tiny", "mmssl", **{
        **base, "data.batch_size": 16, "train.densify_period": 2,
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    for idx in range(4):  # rebuild at idx 2, then one accumulating batch
        tr.train_batch(idx)
    assert tr._densified
    saved_nnz = {
        m: int((np.asarray(g.vals) != 0).sum()) for m, g in tr.state.mod_ui.items()
    }
    saved_counts = {m: int(c) for m, c in tr.state.buf_count.items()}
    assert any(v > 0 for v in saved_nnz.values())
    tr.save_checkpoint(4, {"epoch": 0})

    # Different densify_period => larger graph_capacity (growth: always
    # exact; a shrink below the live entries is the _actionable test below).
    cfg2 = preset("tiny", "mmssl", **{
        **base, "data.batch_size": 16, "train.densify_period": 4,
    })
    from mmssl_tpu.train.steps_mmssl import graph_capacity

    tr2 = Trainer(cfg2, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    assert graph_capacity(cfg2, tiny_dataset.n_items, tr2.n_batch) != graph_capacity(
        cfg, tiny_dataset.n_items, tr.n_batch
    )
    tr2.resume()
    assert tr2._densified
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["user_emb"]), np.asarray(tr.state.params["user_emb"]),
        rtol=1e-6,
    )
    # Every live densified-graph entry and buffer entry survived the resize.
    for m in saved_nnz:
        assert int((np.asarray(tr2.state.mod_ui[m].vals) != 0).sum()) == saved_nnz[m]
        assert int(tr2.state.buf_count[m]) == saved_counts[m]
    # Training continues under the new config.
    assert np.isfinite(np.asarray(tr2.train_batch(0))).all()


def test_capacity_shrink_overflow_is_actionable(tiny_dataset, tmp_path):
    """Shrinking below the LIVE entry count refuses with an actionable
    error instead of silently truncating accumulated densification data."""
    import pytest

    base = {
        "model.embed_size": 16,
        "train.m_topk_rate": 0.2,
        "train.checkpoint_dir": str(tmp_path / "ckpt_shrink"),
    }
    cfg = preset("tiny", "mmssl", **{
        **base, "data.batch_size": 16, "train.densify_period": 4,
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    for idx in range(4):  # accumulate 3 batches, no rebuild yet (T=4)
        tr.train_batch(idx)
    assert max(int(c) for c in tr.state.buf_count.values()) > 0
    tr.save_checkpoint(4, {"epoch": 0})

    cfg2 = preset("tiny", "mmssl", **{
        **base, "data.batch_size": 16, "train.densify_period": 1,
    })
    tr2 = Trainer(cfg2, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    with pytest.raises(RuntimeError, match="shrink"):
        tr2.resume()


def test_portable_config_mismatch_is_hedged(tiny_dataset, tmp_path):
    """A portable checkpoint restored under a CONFIG that changes
    non-elastic state shapes (embed_size changes every table width) fails
    with an error naming the config-change causes — not a raw orbax shape
    error, and not a bogus mesh-geometry diagnosis (code-review r4)."""
    import pytest

    base = {
        "data.batch_size": 16,
        "train.m_topk_rate": 0.1,
        "train.checkpoint_dir": str(tmp_path / "ckpt_cfg"),
    }
    cfg = preset("tiny", "mmssl", **{**base, "model.embed_size": 16})
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    tr.train_batch(0)
    tr.save_checkpoint(1, {"epoch": 0})

    cfg2 = preset("tiny", "mmssl", **{**base, "model.embed_size": 32})
    tr2 = Trainer(cfg2, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    with pytest.raises(RuntimeError, match="config"):
        tr2.resume()
