"""On-device negative sampler + fused-epoch (lax.scan) dispatch path.

The device sampler must honor the reference sampling contract
(MMSSL/utility/load_data.py:153-191): users uniform over exist_users
(without replacement when the batch fits), pos uniform over the user's
train items, neg uniform over the complement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmssl_tpu.config import preset
from mmssl_tpu.data.sampler_device import device_sample, make_device_sampler_consts
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def _train_sets(ds):
    train = {}
    pad, cnt = ds.padded_split("train")
    for u in range(ds.n_users):
        train[u] = set(int(i) for i in pad[u, : cnt[u]])
    return train


def test_device_sample_contract(tiny_dataset):
    ds = tiny_dataset
    consts = make_device_sampler_consts(ds)
    train = _train_sets(ds)
    exist = set(int(u) for u in ds.exist_users)
    B = 16
    for seed in range(4):
        users, pos, neg = device_sample(jax.random.PRNGKey(seed), consts, ds.n_items, B)
        users, pos, neg = map(np.asarray, (users, pos, neg))
        assert users.shape == pos.shape == neg.shape == (B,)
        for u, p, n in zip(users, pos, neg):
            assert int(u) in exist
            assert int(p) in train[int(u)]
            assert int(n) not in train[int(u)]
            assert 0 <= int(n) < ds.n_items


def test_device_sample_without_replacement(tiny_dataset):
    ds = tiny_dataset
    consts = make_device_sampler_consts(ds)
    B = min(16, len(ds.exist_users))
    users, _, _ = device_sample(jax.random.PRNGKey(0), consts, ds.n_items, B)
    users = np.asarray(users)
    # rd.sample semantics: batch <= n_exist draws distinct users.
    assert len(set(users.tolist())) == B


def test_device_sample_neg_covers_complement(tiny_dataset):
    """Every non-train item of a user is reachable as a negative (the argmax-
    of-iid-uniforms trick is uniform over the complement)."""
    ds = tiny_dataset
    consts = make_device_sampler_consts(ds)
    train = _train_sets(ds)
    hits = {}
    for seed in range(200):
        users, _, neg = device_sample(jax.random.PRNGKey(seed), consts, ds.n_items, 16)
        for u, n in zip(np.asarray(users), np.asarray(neg)):
            hits.setdefault(int(u), set()).add(int(n))
    # Pick the most-sampled user and check broad coverage of its complement.
    u = max(hits, key=lambda k: len(hits[k]))
    complement = set(range(ds.n_items)) - train[u]
    assert len(hits[u]) > len(complement) * 0.5


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


@pytest.mark.parametrize("model", ["mf", "micro", "mmssl"])
def test_train_chunk_advances_state(tiny_dataset, model):
    tr = _mk_trainer(tiny_dataset, model)
    if model in ("lattice", "micro"):
        tr.train_batch(0)  # build_item_graph warm-up dispatch
    step0 = int(tr.state.step)
    m = tr.train_chunk(1, 4)
    m = np.asarray(m)
    assert m.shape == (4, len(tr.metric_keys))
    assert np.isfinite(m).all()
    assert int(tr.state.step) == step0 + 4


@pytest.mark.parametrize("model", ["mf", "mmssl"])
def test_fused_fit_makes_progress(tiny_dataset, model):
    """fit() with the fused-scan path (steps_per_dispatch>0) trains and the
    epoch loss decreases, same as the per-batch path."""
    tr = _mk_trainer(tiny_dataset, model, **{
        "train.steps_per_dispatch": 2,
        "train.eval_every": 2,
    })
    res = tr.fit(epochs=4)
    assert res.epochs_run == 4
    losses = np.asarray([row["loss"] for row in res.history])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # no blow-up
