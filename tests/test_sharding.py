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


def test_shard_tree_policy(mmssl_setup):
    tr = mmssl_setup
    mesh = make_mesh(8, mesh_shape=(4, 2))
    sh = tree_shardings(mesh, tr.state)
    # Embedding tables row-sharded over model axis.
    spec = sh.params["user_emb"].spec
    assert spec[0] == "model"
    # Small attention weights replicated.
    assert sh.params["w_q"].spec == ()
