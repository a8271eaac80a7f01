"""Native C++ sampler: builds, honors the Data.sample contract, and is the
path NegativeSampler actually uses when available."""

import numpy as np
import pytest

from mmssl_tpu.data import NegativeSampler


def test_native_builds_and_contract(tiny_dataset):
    pytest.importorskip("ctypes")
    from mmssl_tpu.native import sampler_native

    train_pad, train_cnt = tiny_dataset.padded_split("train")
    ns = sampler_native.build(train_pad, train_cnt)
    rng = np.random.default_rng(0)
    users = tiny_dataset.exist_users[:20].astype(np.int32)
    pos, neg = ns.sample(users, tiny_dataset.n_items, rng)
    for u, p, n in zip(users, pos, neg):
        assert p in tiny_dataset.train_items[int(u)]
        assert n not in tiny_dataset.train_items[int(u)]
        assert 0 <= n < tiny_dataset.n_items


def test_negative_sampler_uses_native(tiny_dataset):
    s = NegativeSampler(tiny_dataset, batch_size=16, seed=1)
    assert s._native is not None, "native sampler should build in this image"
    users, pos, neg = s.sample()
    for u, p, n in zip(users, pos, neg):
        assert p in tiny_dataset.train_items[int(u)]
        assert n not in tiny_dataset.train_items[int(u)]


def test_native_rejects_bad_user(tiny_dataset):
    from mmssl_tpu.native import sampler_native

    train_pad, train_cnt = tiny_dataset.padded_split("train")
    ns = sampler_native.build(train_pad, train_cnt)
    with pytest.raises(RuntimeError):
        ns.sample(np.array([10**6], dtype=np.int32), tiny_dataset.n_items, np.random.default_rng(0))


def test_native_speed_at_scale():
    # Sanity perf check: 1M samples/s order at baby-like degrees.
    import time

    from mmssl_tpu.native import sampler_native

    rng = np.random.default_rng(0)
    n_users, max_deg, n_items = 20_000, 16, 7_000
    cnt = rng.integers(1, max_deg + 1, n_users).astype(np.int32)
    pad = np.full((n_users, max_deg), -1, np.int32)
    for u in range(n_users):
        pad[u, : cnt[u]] = rng.choice(n_items, cnt[u], replace=False)
    ns = sampler_native.build(pad, cnt)
    users = rng.integers(0, n_users, 1024).astype(np.int32)
    ns.sample(users, n_items, rng)  # warm
    t0 = time.time()
    for _ in range(50):
        ns.sample(users, n_items, rng)
    per_batch_ms = (time.time() - t0) / 50 * 1000
    assert per_batch_ms < 20.0, f"native sampler too slow: {per_batch_ms:.1f} ms/batch"
