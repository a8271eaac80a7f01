"""Negative sampler.

Semantics contract: ``Data.sample`` (``MMSSL/utility/load_data.py:153-191``):
per batch, sample ``batch_size`` users from the users that have train items
(without replacement when batch_size <= n_users, else with replacement), then
for each user one positive drawn uniformly from its train items and one
negative drawn uniformly over the catalog with rejection against train items.

The reference does this with python loops per user (the per-batch host hot
spot, SURVEY.md §3.2); here it is vectorized numpy with a bounded rejection
loop (expected ~1 round at real dataset sparsities).  A C++ native sampler
with the same contract lives in ``mmssl_tpu/native`` and is used when built.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from mmssl_tpu.data.dataset import RecDataset


class NegativeSampler:
    def __init__(self, dataset: RecDataset, batch_size: int, seed: int = 0):
        self.n_users = dataset.n_users
        self.n_items = dataset.n_items
        self.batch_size = batch_size
        self.exist_users = dataset.exist_users
        self.train_pad, self.train_cnt = dataset.padded_split("train")
        # Fast membership test: CSR bool row lookup.
        self._R = dataset.R.astype(bool).tocsr()
        self.rng = np.random.default_rng(seed)
        self._native = None
        try:  # optional C++ fast path
            from mmssl_tpu.native import sampler_native

            self._native = sampler_native.build(self.train_pad, self.train_cnt)
        except Exception:
            self._native = None

    def _is_train_item(self, users: np.ndarray, items: np.ndarray) -> np.ndarray:
        """Vectorized membership: is items[k] a train item of users[k]."""
        # CSR row slicing per unique user would be O(B log d); use the padded
        # matrix directly: compare against the user's padded row.
        rows = self.train_pad[users]  # [B, max_deg]
        return (rows == items[:, None]).any(axis=1)

    def sample(self, rng: Optional[np.random.Generator] = None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        rng = rng or self.rng
        B = self.batch_size
        # Reference rule (load_data.py:154-157): without replacement iff
        # B <= n_users — but it samples from exist_users (train uids only),
        # so with uid gaps and exist < B <= n_users the reference CRASHES in
        # rd.sample.  Gate on the actual population instead; this diverges
        # only where the reference cannot run.
        if B <= len(self.exist_users):
            users = rng.choice(self.exist_users, size=B, replace=False)
        else:
            users = rng.choice(self.exist_users, size=B, replace=True)
        users = users.astype(np.int32)

        if self._native is not None:
            pos, neg = self._native.sample(users, self.n_items, rng)
            return users, pos, neg

        cnt = self.train_cnt[users]
        pos_idx = (rng.random(B) * cnt).astype(np.int64)
        pos = self.train_pad[users, pos_idx].astype(np.int32)

        neg = rng.integers(0, self.n_items, size=B).astype(np.int32)
        bad = self._is_train_item(users, neg)
        # Bounded rejection: at real sparsities (<1%) this converges in 1-2
        # rounds; the cap only guards degenerate synthetic data.
        for _ in range(64):
            n_bad = int(bad.sum())
            if n_bad == 0:
                break
            resample = rng.integers(0, self.n_items, size=n_bad).astype(np.int32)
            neg[bad] = resample
            still = self._is_train_item(users[bad], resample)
            nxt = np.zeros_like(bad)
            nxt[np.flatnonzero(bad)[still]] = True
            bad = nxt
        return users, pos, neg
