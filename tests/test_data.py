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


def test_degenerate_datasets(tmp_path):  # mmssl variant; zoo variant below
    """Loader + trainer survive malformed/degenerate data the reference would
    meet in the wild: users only in val/test, uid gaps, an empty val split,
    and a user with zero train items."""
    import json

    import numpy as np

    from mmssl_tpu.config import preset
    from mmssl_tpu.data import load_dataset
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    d = tmp_path / "weird"
    d.mkdir()
    # train: uid gap (no user 1); user 4 appears only in test
    (d / "train.json").write_text(json.dumps({"0": [0, 1], "2": [2], "3": [0, 3]}))
    (d / "val.json").write_text(json.dumps({}))  # empty split
    (d / "test.json").write_text(json.dumps({"0": [4], "4": [2]}))
    n_items = 6
    np.save(d / "image_feat.npy", np.random.default_rng(0).normal(size=(n_items, 8)).astype(np.float32))
    np.save(d / "text_feat.npy", np.random.default_rng(1).normal(size=(n_items, 4)).astype(np.float32))

    cfg = preset("weird", "mmssl", **{
        "data.data_path": str(tmp_path),
        "data.batch_size": 4,
        "model.embed_size": 8,
        "eval.ks": (2, 3),
        "train.steps_per_dispatch": 0,
    })
    ds = load_dataset(cfg.data)
    # Reference semantics (load_data.py:29-55): n_users counts TRAIN uids
    # only (max id + 1); a test-only uid beyond that is out of range (the
    # reference would crash indexing R) and users_of_split drops it.
    assert ds.n_users == 4
    # MMSSL counting: n_items = max interacted id + 1 (feats are sliced;
    # only the MICRO/LATTICE variant takes n_items from text_feat.shape[0]).
    assert ds.n_items == 5
    assert ds.n_val == 0
    assert list(ds.users_of_split("test")) == [0]  # uid 4 dropped
    tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    m = np.asarray(tr.train_batch(0))
    assert np.isfinite(m).all()
    res = tr.evaluate("test")
    assert np.isfinite(res["recall"]).all()


def test_degenerate_datasets_all_models(tmp_path):
    """Every zoo model trains + evaluates on the degenerate dataset, with a
    K beyond the catalog (the reference's heapq returns min(K, n_items)
    entries; the device evaluator clamps identically)."""
    import json

    import numpy as np

    from mmssl_tpu.config import preset
    from mmssl_tpu.data import load_dataset
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    d = tmp_path / "weird2"
    d.mkdir()
    (d / "train.json").write_text(json.dumps({"0": [0, 1], "2": [2], "3": [0, 3]}))
    (d / "val.json").write_text(json.dumps({}))
    (d / "test.json").write_text(json.dumps({"0": [4], "4": [2]}))
    # Non-negative features, as real extractors produce: LATTICE/MICRO's
    # sym laplacian takes rowsum^-1/2 of the kNN similarity graph, and a
    # NEGATIVE row-sum (possible with signed random features) is NaN in the
    # reference's own math (LATTICE/codes/Models.py:17-23) — faithful, not a
    # bug to fix.
    np.save(d / "image_feat.npy", np.abs(np.random.default_rng(0).normal(size=(6, 8))).astype(np.float32))
    np.save(d / "text_feat.npy", np.abs(np.random.default_rng(1).normal(size=(6, 4))).astype(np.float32))

    for model in ("mf", "lightgcn", "ngcf", "lattice", "micro", "mmssl"):
        cfg = preset("weird2", model, **{
            "data.data_path": str(tmp_path),
            "data.batch_size": 4,
            "model.embed_size": 8,
            "eval.ks": (2, 50),  # 50 > n_items = 5
            "train.steps_per_dispatch": 0,
        })
        ds = load_dataset(cfg.data)
        tr = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
        m = np.asarray(tr.train_batch(0))
        assert np.isfinite(m).all(), model
        res = tr.evaluate("test")
        assert np.isfinite(res["recall"]).all(), model
        # recall@50 over a 5-item catalog ranks everything except the train
        # items; the only test user (0) has item 4 ranked somewhere -> hit.
        assert res["recall"][1] == 1.0, (model, res["recall"])
