"""Evaluator protocol parity vs a host oracle of the reference harness."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmssl_tpu.config import EvalConfig
from mmssl_tpu.eval.evaluator import Evaluator
from mmssl_tpu.eval.metrics import (
    auc_host,
    hit_at_k_host,
    ndcg_at_k_host,
    precision_at_k_host,
    rank_binary_hits_host,
    recall_at_k_host,
)


def _host_oracle(ds, u_emb, i_emb, which, ks, full_auc=False):
    """Reference protocol (batch_test.py:112-169) in plain numpy."""
    split = ds.val_set if which == "val" else ds.test_set
    users = list(split.keys())
    k_max = max(ks)
    totals = {m: np.zeros(len(ks)) for m in ("recall", "precision", "ndcg", "hit_ratio")}
    auc_total = 0.0
    for u in users:
        scores = u_emb[u] @ i_emb.T
        train_items = set(ds.train_items.get(u, []))
        candidates = [i for i in range(ds.n_items) if i not in train_items]
        pos = split[u]
        r = rank_binary_hits_host(scores, candidates, pos, k_max)
        for j, k in enumerate(ks):
            totals["recall"][j] += recall_at_k_host(r, k, len(pos))
            totals["precision"][j] += precision_at_k_host(r, k)
            totals["ndcg"][j] += ndcg_at_k_host(r, k)
            totals["hit_ratio"][j] += hit_at_k_host(r, k)
        if full_auc:
            y = [1 if i in set(pos) else 0 for i in candidates]
            auc_total += auc_host(y, scores[candidates])
    n = len(users)
    out = {m: v / n for m, v in totals.items()}
    out["auc"] = auc_total / n
    return out


@pytest.mark.parametrize("which", ["val", "test"])
def test_evaluator_matches_reference_protocol(tiny_dataset, which):
    ds = tiny_dataset
    rng = np.random.default_rng(11)
    # Quantized embeddings -> exactly representable scores, so jax-vs-numpy
    # accumulation order cannot flip near-tied ranks.
    u_emb = (rng.integers(-8, 9, size=(ds.n_users, 8)) / 16.0).astype(np.float32)
    i_emb = (rng.integers(-8, 9, size=(ds.n_items, 8)) / 16.0).astype(np.float32)
    ks = (3, 5, 10)
    ev = Evaluator(ds, EvalConfig(ks=ks, user_batch_size=16, test_flag="part"))
    got = ev.evaluate(jnp.asarray(u_emb), jnp.asarray(i_emb), which)
    want = _host_oracle(ds, u_emb, i_emb, which, ks)
    for m in ("recall", "precision", "ndcg", "hit_ratio"):
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5)
    assert got["auc"] == 0.0  # Q12: 'part' mode


def test_evaluator_full_auc(tiny_dataset):
    ds = tiny_dataset
    rng = np.random.default_rng(12)
    u_emb = (rng.integers(-8, 9, size=(ds.n_users, 8)) / 16.0).astype(np.float32)
    i_emb = (rng.integers(-8, 9, size=(ds.n_items, 8)) / 16.0).astype(np.float32)
    ks = (3, 5)
    ev = Evaluator(ds, EvalConfig(ks=ks, user_batch_size=8, test_flag="full"))
    got = ev.evaluate(jnp.asarray(u_emb), jnp.asarray(i_emb), "test")
    want = _host_oracle(ds, u_emb, i_emb, "test", ks, full_auc=True)
    np.testing.assert_allclose(got["auc"], want["auc"], rtol=1e-4, atol=1e-5)


def test_evaluator_full_auc_production_batch(tiny_dataset):
    """'full' mode at the production user_batch_size=2048 (the reference's
    default, batch_test.py:24) — the sort+searchsorted AUC keeps peak memory
    O(B * n_items) so this no longer OOMs (VERDICT r1 Missing #5)."""
    ds = tiny_dataset
    rng = np.random.default_rng(13)
    u_emb = (rng.integers(-8, 9, size=(ds.n_users, 8)) / 16.0).astype(np.float32)
    i_emb = (rng.integers(-8, 9, size=(ds.n_items, 8)) / 16.0).astype(np.float32)
    ks = (3, 5)
    ev = Evaluator(ds, EvalConfig(ks=ks, user_batch_size=2048, test_flag="full"))
    got = ev.evaluate(jnp.asarray(u_emb), jnp.asarray(i_emb), "test")
    want = _host_oracle(ds, u_emb, i_emb, "test", ks, full_auc=True)
    np.testing.assert_allclose(got["auc"], want["auc"], rtol=1e-4, atol=1e-5)
    for m in ("recall", "precision", "ndcg", "hit_ratio"):
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-5)
