"""Sharded-vs-single-device numerical equality on an 8-CPU-device mesh
(SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.parallel.mesh import make_mesh
from mmssl_tpu.parallel.spmd import make_sharded_mmssl_step, shard_tree, tree_shardings
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.train.steps_mmssl import mmssl_train_step
from mmssl_tpu.utils.logging import MetricLogger


def _copy(tree):
    return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)


@pytest.fixture(scope="module")
def mmssl_setup(tiny_dataset):
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "model.head_num": 4,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5, 10),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    return tr


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh1 = make_mesh(1)
    assert mesh1.devices.size == 1


def test_sharded_step_matches_unsharded(mmssl_setup):
    tr = mmssl_setup
    mesh = make_mesh(8, mesh_shape=(4, 2))
    users, pos, neg = tr.sampler.sample(np.random.default_rng(0))
    users, pos, neg = jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg)
    rebuild = jnp.asarray(False)

    ref_state, ref_metrics = mmssl_train_step(
        _copy(tr.state), tr.consts, users, pos, neg, rebuild,
        tr.cfg, tr.g_opt, tr.d_opt, tr.ds.n_users, tr.ds.n_items,
    )

    step, sh_state, sh_consts = make_sharded_mmssl_step(
        mesh, tr.cfg, tr.g_opt, tr.d_opt, tr.ds.n_users, tr.ds.n_items,
        _copy(tr.state), tr.consts,
    )
    got_state, got_metrics = step(sh_state, sh_consts, users, pos, neg, rebuild)

    from mmssl_tpu.train.steps_mmssl import MMSSL_METRIC_KEYS
    for j, k in enumerate(MMSSL_METRIC_KEYS):
        assert float(got_metrics[j]) == pytest.approx(float(ref_metrics[j]), rel=2e-3, abs=1e-5), k
    np.testing.assert_allclose(
        np.asarray(got_state.params["user_emb"]),
        np.asarray(ref_state.params["user_emb"]),
        rtol=2e-3, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_state.d_params["l1"]["w"]),
        np.asarray(ref_state.d_params["l1"]["w"]),
        rtol=2e-3, atol=2e-5,
    )


def test_sharded_step_with_rebuild(mmssl_setup):
    tr = mmssl_setup
    mesh = make_mesh(8, mesh_shape=(4, 2))
    step, sh_state, sh_consts = make_sharded_mmssl_step(
        mesh, tr.cfg, tr.g_opt, tr.d_opt, tr.ds.n_users, tr.ds.n_items,
        _copy(tr.state), tr.consts,
    )
    rng = np.random.default_rng(1)
    for idx in range(3):
        users, pos, neg = tr.sampler.sample(rng)
        rebuild = jnp.asarray(idx != 0)
        sh_state, metrics = step(
            sh_state, sh_consts, jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg), rebuild
        )
        assert np.isfinite(float(metrics[0]))


def test_padded_tables_shard_and_match_unpadded(tmp_path):
    """Geometry padding (VERDICT r1 Missing #4 / Weak #1): a catalog with ODD
    user and item counts pads to mesh multiples, every table actually shards
    on the model axis, and training numerics match the unpadded single-device
    run — all 7 metrics, the densified graphs, and the eval embeddings.
    Dropout is off so the padded/unpadded PRNG streams coincide (the Gumbel
    draw is real-width by construction, see steps_mmssl.gumbel_soften_rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmssl_tpu.data import load_dataset, write_synthetic_dataset
    from mmssl_tpu.config import DataConfig

    root = str(tmp_path)
    write_synthetic_dataset(root, "odd", n_users=45, n_items=27, seed=11)
    cfg = preset("odd", "mmssl", **{
        "data.data_path": root,
        "data.batch_size": 16,
        "model.embed_size": 16,
        "model.drop_rate": 0.0,
        "model.g_drop1": 0.0,
        "model.g_drop2": 0.0,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "eval.ks": (3, 5),
    })
    ds = load_dataset(cfg.data)
    mesh = make_mesh(8, mesh_shape=(4, 2))
    tr_pad = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True), mesh=mesh)
    tr_ref = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))

    # 45 users / 27 items -> 46 / 28 rows; tables genuinely sharded.
    assert tr_pad.state.params["user_emb"].shape[0] == 46
    assert tr_pad.state.params["item_emb"].shape[0] == 28
    assert tr_pad.state.params["user_emb"].sharding == NamedSharding(mesh, P("model", None))
    assert tr_pad.state.params["item_emb"].sharding == NamedSharding(mesh, P("model", None))
    assert tr_pad.state.d_params["l1"]["w"].shape[0] == 28
    # Pad rows are exact zeros.
    np.testing.assert_array_equal(np.asarray(tr_pad.state.params["user_emb"])[45:], 0.0)
    np.testing.assert_array_equal(
        np.asarray(tr_pad.state.params["user_emb"])[:45],
        np.asarray(tr_ref.state.params["user_emb"]),
    )

    from mmssl_tpu.train.steps_mmssl import MMSSL_METRIC_KEYS

    rng = np.random.default_rng(3)
    state_p, state_r = tr_pad.state, tr_ref.state
    for idx in range(3):
        users, pos, neg = tr_ref.sampler.sample(rng)
        users, pos, neg = jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg)
        rebuild = jnp.asarray(idx == 2)  # T=2: rebuild on the third step
        state_r, m_ref = mmssl_train_step(
            state_r, tr_ref.consts, users, pos, neg, rebuild,
            tr_ref.cfg, tr_ref.g_opt, tr_ref.d_opt, ds.n_users, ds.n_items,
        )
        state_p, m_pad = tr_pad._sharded_step(
            state_p, tr_pad.consts, users, pos, neg, rebuild
        )
        for j, k in enumerate(MMSSL_METRIC_KEYS):
            assert float(m_pad[j]) == pytest.approx(float(m_ref[j]), rel=2e-3, abs=1e-5), (idx, k)
    # Densified graphs agree entry-for-entry (same capacity: k uses the REAL
    # catalog size on both sides).
    for m in state_r.mod_ui:
        np.testing.assert_array_equal(np.asarray(state_p.buf_rows[m]), np.asarray(state_r.buf_rows[m]))
        np.testing.assert_array_equal(np.asarray(state_p.mod_ui[m].cols), np.asarray(state_r.mod_ui[m].cols))
        np.testing.assert_allclose(
            np.asarray(state_p.mod_ui[m].vals), np.asarray(state_r.mod_ui[m].vals), rtol=1e-5, atol=1e-6
        )
    # Eval-mode embeddings (sliced to real rows) agree.
    tr_pad.state, tr_ref.state = state_p, state_r
    tr_pad._densified = tr_ref._densified = True
    u_p, i_p = tr_pad.eval_embeddings()
    u_r, i_r = tr_ref.eval_embeddings()
    assert u_p.shape == u_r.shape == (45, 16) and i_p.shape == i_r.shape == (27, 16)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_r), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_r), rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("model", ["mf", "lightgcn", "ngcf", "lattice", "micro"])
def test_sharded_simple_step_matches_unsharded(tiny_dataset, model):
    """SPMD for the non-MMSSL zoo (VERDICT r1 Missing #3): the sharded simple
    step (DP batch + row-sharded tables/joint blocks/item graphs) matches the
    single-device step — including the build_item_graph variant that carries
    LATTICE/MICRO's n_items^2 kNN + top-k on the catalog axis."""
    from mmssl_tpu.train.steps_simple import SIMPLE_METRIC_KEYS, simple_train_step

    cfg = preset("tiny", model, **{
        "data.batch_size": 16, "model.embed_size": 16, "eval.ks": (3, 5),
    })
    tr_ref = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    mesh = make_mesh(8, mesh_shape=(4, 2))
    tr_sh = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)

    rng = np.random.default_rng(5)
    state_r, state_s = tr_ref.state, tr_sh.state
    for idx in range(2):
        users, pos, neg = tr_ref.sampler.sample(rng)
        users, pos, neg = jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg)
        build = idx == 0 and model in ("lattice", "micro")
        state_r, m_ref = simple_train_step(
            state_r, tr_ref.consts, users, pos, neg, cfg, tr_ref.opt,
            build_item_graph=build, sparse=tr_ref.sparse_mode,
        )
        state_s, m_sh = tr_sh._sharded_simple[build](
            state_s, tr_sh.consts, users, pos, neg
        )
        for j, k in enumerate(SIMPLE_METRIC_KEYS):
            assert float(m_sh[j]) == pytest.approx(float(m_ref[j]), rel=2e-3, abs=1e-5), (idx, k)
    np.testing.assert_allclose(
        np.asarray(state_s.params["user_emb"]),
        np.asarray(state_r.params["user_emb"]),
        rtol=2e-3, atol=2e-5,
    )


@pytest.mark.parametrize("model", ["mf", "lightgcn", "ngcf", "lattice", "micro"])
def test_simple_padded_tables_shard_and_match_unpadded(tmp_path, caplog, model):
    """Geometry padding for the non-MMSSL zoo: a catalog NOT divisible by
    the model axis pads to mesh multiples, the embedding tables genuinely
    shard (no replication fallback logged), and training numerics equal the
    unpadded single-device run — including LATTICE/MICRO's in-step kNN
    rebuild (pad rows masked out of every top-k selection, see
    ops/knn.mask_sim_padding) and MICRO's full-catalog InfoNCE (pad rows
    masked out of the denominators, losses/contrastive.infonce n_real).
    NGCF runs with mess_dropout 0.2 (VERDICT r3 #6): the masks are drawn at
    the REAL node dims and scattered into the padded layout
    (models/cf._node_dropout), so padded-vs-unpadded equality holds at
    nonzero rates too — not just the former rate-0 pin."""
    import logging

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmssl_tpu.data import load_dataset, write_synthetic_dataset
    from mmssl_tpu.parallel import spmd
    from mmssl_tpu.train.steps_simple import SIMPLE_METRIC_KEYS, simple_train_step

    root = str(tmp_path)
    write_synthetic_dataset(root, "odd", n_users=45, n_items=27, seed=11)
    drop = (0.2, 0.2) if model == "ngcf" else (0.0, 0.0)
    cfg = preset("odd", model, **{
        "data.data_path": root, "data.batch_size": 16,
        "model.embed_size": 16, "model.mess_dropout": drop,
        "eval.ks": (3, 5),
    })
    ds = load_dataset(cfg.data)
    tr_ref = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    spmd._warned_replicated.clear()  # memoized per-process; observe new warnings
    with caplog.at_level(logging.WARNING, logger="mmssl_tpu.spmd"):
        mesh = make_mesh(8, mesh_shape=(4, 2))
        tr_sh = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True), mesh=mesh)
    warned = [r.getMessage() for r in caplog.records if "replicating" in r.message]
    assert not warned, warned  # every catalog table padded -> sharded
    assert tr_sh.state.params["user_emb"].shape[0] == 46  # 45 -> mesh multiple
    assert tr_sh.state.params["item_emb"].shape[0] == 28
    assert tr_sh.state.params["user_emb"].sharding == NamedSharding(mesh, P("model", None))
    np.testing.assert_array_equal(np.asarray(tr_sh.state.params["user_emb"])[45:], 0.0)

    rng = np.random.default_rng(9)
    state_r, state_s = tr_ref.state, tr_sh.state
    for idx in range(2):
        users, pos, neg = tr_ref.sampler.sample(rng)
        users, pos, neg = jnp.asarray(users), jnp.asarray(pos), jnp.asarray(neg)
        build = idx == 0 and model in ("lattice", "micro")
        state_r, m_ref = simple_train_step(
            state_r, tr_ref.consts, users, pos, neg, cfg, tr_ref.opt,
            build_item_graph=build, sparse=tr_ref.sparse_mode,
        )
        state_s, m_sh = tr_sh._sharded_simple[build](state_s, tr_sh.consts, users, pos, neg)
        for j, k in enumerate(SIMPLE_METRIC_KEYS):
            assert float(m_sh[j]) == pytest.approx(float(m_ref[j]), rel=2e-3, abs=1e-5), (idx, k)
    np.testing.assert_allclose(
        np.asarray(state_s.params["user_emb"])[:45],
        np.asarray(state_r.params["user_emb"]),
        rtol=2e-3, atol=2e-5,
    )
    np.testing.assert_array_equal(np.asarray(state_s.params["user_emb"])[45:], 0.0)
    # Eval embeddings: sliced to real rows, equal to the unpadded run.
    tr_sh.state, tr_ref.state = state_s, state_r
    u_s, i_s = tr_sh.eval_embeddings()
    u_r, i_r = tr_ref.eval_embeddings()
    assert u_s.shape == u_r.shape and (u_s.shape[0], i_s.shape[0]) == (45, 27)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r), rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(i_s), np.asarray(i_r), rtol=2e-3, atol=2e-5)


def test_lattice_mesh_fit_with_fused_chunks(tiny_dataset):
    """LATTICE trains end-to-end under a mesh through fit(): first-batch
    build dispatch + sharded fused-scan chunks + sharded eval."""
    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "lattice", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.steps_per_dispatch": 2,
        "eval.ks": (3, 5),
    })
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True), mesh=mesh)
    res = tr.fit(epochs=2)
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_recall)


def test_shard_tree_policy(mmssl_setup):
    tr = mmssl_setup
    mesh = make_mesh(8, mesh_shape=(4, 2))
    sh = tree_shardings(mesh, tr.state)
    # Embedding tables row-sharded over model axis.
    spec = sh.params["user_emb"].spec
    assert spec[0] == "model"
    # Small attention weights replicated.
    assert sh.params["w_q"].spec == ()
