"""Loss golden tests vs hand-computed reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmssl_tpu.losses import bpr_loss, feat_reg_loss, infonce


def test_bpr_hand_values():
    # Reference bpr_loss (MMSSL/main.py:499-511) on tiny fixed inputs.
    u = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    pos = np.array([[1.0, 1.0], [1.0, 0.0]], dtype=np.float32)
    neg = np.array([[0.5, 0.0], [0.0, 0.5]], dtype=np.float32)
    mf, emb, reg = bpr_loss(jnp.asarray(u), jnp.asarray(pos), jnp.asarray(neg), decay=1e-2)
    pos_s = (u * pos).sum(1)
    neg_s = (u * neg).sum(1)
    want_mf = -np.mean(np.log(1.0 / (1.0 + np.exp(-(pos_s - neg_s)))))
    want_emb = 1e-2 * 0.5 * ((u**2).sum() + (pos**2).sum() + (neg**2).sum()) / 2  # /batch_size (Q11)
    assert float(mf) == pytest.approx(want_mf, rel=1e-5)
    assert float(emb) == pytest.approx(want_emb, rel=1e-5)
    assert float(reg) == 0.0


def test_feat_reg():
    a = np.ones((4, 3), dtype=np.float32)
    b = 2 * np.ones((4, 3), dtype=np.float32)
    out = feat_reg_loss([jnp.asarray(a), jnp.asarray(b)], n_items=4, feat_reg_decay=1e-5)
    want = 1e-5 * 0.5 * (12.0 + 48.0) / 4
    assert float(out) == pytest.approx(want, rel=1e-6)


def _infonce_numpy(z1, z2, tau, eps):
    # Direct transcription of the reference formula (MMSSL/main.py:218-249).
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    a, b = norm(z1), norm(z2)
    s11 = np.exp(a @ a.T / tau)
    s12 = np.exp(a @ b.T / tau)
    denom = s11.sum(1) + s12.sum(1) - np.diag(s11)
    return float(np.mean(-np.log(np.diag(s12) / denom + eps)))


@pytest.mark.parametrize("eps", [1e-8, 0.0])
def test_infonce_matches_formula(eps):
    rng = np.random.default_rng(0)
    z1 = rng.normal(size=(37, 8)).astype(np.float32)
    z2 = rng.normal(size=(37, 8)).astype(np.float32)
    got = float(infonce(jnp.asarray(z1), jnp.asarray(z2), tau=0.5, eps=eps, row_chunk=16))
    assert got == pytest.approx(_infonce_numpy(z1, z2, 0.5, eps), rel=1e-5)


def test_infonce_identical_views_low_loss():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(32, 8)).astype(np.float32)
    same = float(infonce(jnp.asarray(z), jnp.asarray(z), tau=0.5))
    diff = float(infonce(jnp.asarray(z), jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32)), tau=0.5))
    assert same < diff


def test_infonce_sharded_matches_unsharded():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from mmssl_tpu.losses.contrastive import infonce_sharded

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("x",))
    rng = np.random.default_rng(2)
    z1 = rng.normal(size=(64, 8)).astype(np.float32)
    z2 = rng.normal(size=(64, 8)).astype(np.float32)

    fn = shard_map(
        lambda a, b: infonce_sharded(a, b, tau=0.5, eps=1e-8, axis_name="x"),
        mesh=mesh,
        in_specs=(P("x", None), P("x", None)),
        out_specs=P(),
    )
    got = float(fn(jnp.asarray(z1), jnp.asarray(z2)))
    want = float(infonce(jnp.asarray(z1), jnp.asarray(z2), tau=0.5, eps=1e-8))
    assert got == pytest.approx(want, rel=1e-5)
