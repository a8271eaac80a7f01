"""Distributed top-k over item shards == single-device top-k."""

import jax
import jax.numpy as jnp
import numpy as np

from mmssl_tpu.parallel.eval_sharded import make_sharded_topk, shard_eval_inputs
from mmssl_tpu.parallel.mesh import make_mesh


def test_sharded_topk_exact():
    mesh = make_mesh(8, mesh_shape=(1, 8))
    rng = np.random.default_rng(0)
    B, n_items, d, k = 16, 64, 8, 10
    u = (rng.integers(-8, 9, (B, d)) / 16).astype(np.float32)
    i = (rng.integers(-8, 9, (n_items, d)) / 16).astype(np.float32)
    mask = np.zeros((B, n_items), np.float32)
    mask[rng.random((B, n_items)) < 0.2] = -np.inf  # train-item exclusions

    ref_scores = u @ i.T + mask
    ref_vals, ref_ids = jax.lax.top_k(jnp.asarray(ref_scores), k)

    topk = make_sharded_topk(mesh, k)
    i_sh, m_sh = shard_eval_inputs(mesh, jnp.asarray(i), jnp.asarray(mask))
    vals, ids = topk(jnp.asarray(u), i_sh, m_sh)

    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-6)
    # ids can differ only where scores tie; verify score-equivalence.
    got_scores = np.take_along_axis(ref_scores, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got_scores, np.asarray(ref_vals), rtol=1e-6)


def test_sharded_topk_k_exceeds_shard():
    # k_max > n_items/P exercises the k_local clamp.
    mesh = make_mesh(8, mesh_shape=(1, 8))
    rng = np.random.default_rng(1)
    B, n_items, d, k = 4, 32, 8, 6  # shard size 4 < k
    u = rng.normal(size=(B, d)).astype(np.float32)
    i = rng.normal(size=(n_items, d)).astype(np.float32)
    mask = np.zeros((B, n_items), np.float32)
    topk = make_sharded_topk(mesh, k)
    i_sh, m_sh = shard_eval_inputs(mesh, jnp.asarray(i), jnp.asarray(mask))
    vals, ids = topk(jnp.asarray(u), i_sh, m_sh)
    ref_vals, _ = jax.lax.top_k(jnp.asarray(u @ i.T), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
