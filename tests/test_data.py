"""Data layer: loader counting semantics + negative sampler contract."""

import numpy as np

from mmssl_tpu.config import DataConfig
from mmssl_tpu.data import NegativeSampler, load_dataset, write_synthetic_dataset


def test_loader_counts(tiny_dataset):
    ds = tiny_dataset
    # Reference counting: ids maxed over splits then +1 (load_data.py:29-55).
    assert ds.n_users == 50
    assert ds.n_items == 30
    assert ds.n_train == sum(len(v) for v in ds.train_items.values())
    assert ds.n_val == sum(len(v) for v in ds.val_set.values())
    assert ds.n_test == sum(len(v) for v in ds.test_set.values())
    assert ds.R.shape == (50, 30)
    assert ds.R.nnz == ds.n_train
    assert set(ds.feats) == {"image", "text"}
    assert ds.feats["image"].shape == (30, 64)


def test_padded_split(tiny_dataset):
    items, counts = tiny_dataset.padded_split("train")
    for uid, lst in tiny_dataset.train_items.items():
        assert counts[uid] == len(lst)
        assert sorted(items[uid, : len(lst)].tolist()) == sorted(lst)
        assert (items[uid, len(lst):] == -1).all()


def test_n_items_from_feats(tmp_path):
    # LATTICE/MICRO override: n_items = feat.shape[0]
    # (MICRO/codes/utility/load_data.py:63-64).
    root = str(tmp_path)
    write_synthetic_dataset(root, "d", n_users=20, n_items=15, seed=1)
    cfg = DataConfig(data_path=root, dataset="d", n_items_from_feats=True)
    ds = load_dataset(cfg)
    assert ds.n_items == 15


def test_sampler_contract(tiny_dataset):
    sampler = NegativeSampler(tiny_dataset, batch_size=16, seed=3)
    for _ in range(20):
        users, pos, neg = sampler.sample()
        assert len(users) == len(pos) == len(neg) == 16
        # without replacement when batch <= n_users (load_data.py:154-155)
        assert len(set(users.tolist())) == 16
        for u, p, n in zip(users, pos, neg):
            assert p in tiny_dataset.train_items[int(u)]
            assert n not in tiny_dataset.train_items[int(u)]
            assert 0 <= n < tiny_dataset.n_items


def test_sampler_with_replacement(tiny_dataset):
    # batch > n_users -> choice with replacement (load_data.py:156-157)
    sampler = NegativeSampler(tiny_dataset, batch_size=128, seed=3)
    users, pos, neg = sampler.sample()
    assert len(users) == 128
