"""Dataset loading for the reference on-disk contract.

Replicates the counting/indexing semantics of ``MMSSL/utility/load_data.py``
(``Data.__init__``, lines 11-88) and the LATTICE/MICRO variant
(``MICRO/codes/utility/load_data.py:11-97``), but produces *static-shape
padded arrays* ready for device residency instead of python dicts feeding
per-batch host loops.

On-disk contract (SURVEY.md §8.3):
  - ``train.json`` / ``val.json`` / ``test.json``: ``{str(uid): [item, ...]}``
  - ``<modality>_feat.npy``: float [n_items, d] per modality
  - ``train_mat``: pickled scipy sparse user x item binary matrix
    (only read by MMSSL's trainer, ``MMSSL/main.py:58``; we rebuild R from
    train.json which is identical by construction)
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional

import numpy as np
import scipy.sparse as sp

from mmssl_tpu.config import DataConfig


@dataclass
class RecDataset:
    """In-memory dataset with both host (dict/CSR) and padded views."""

    n_users: int
    n_items: int
    n_train: int
    n_test: int
    n_val: int
    exist_users: np.ndarray  # int32 [n_exist] uids with >=1 train item
    train_items: Dict[int, List[int]]
    val_set: Dict[int, List[int]]
    test_set: Dict[int, List[int]]
    R: sp.csr_matrix  # [n_users, n_items] float32 binary train interactions
    feats: Dict[str, np.ndarray]  # modality -> [n_items, d] float32
    _pad_cache: dict = field(default_factory=dict, repr=False)

    # ---- padded static-shape views (device-friendly) ----

    def padded_split(self, which: str) -> tuple[np.ndarray, np.ndarray]:
        """(items [n_users, max_deg] int32 padded with -1, counts [n_users]).

        ``which`` in {train, val, test}.  Padding value -1 is dropped by
        device scatters (jnp ``mode='drop'``).
        """
        if which in self._pad_cache:
            return self._pad_cache[which]
        split = {"train": self.train_items, "val": self.val_set, "test": self.test_set}[which]
        max_deg = max((len(v) for v in split.values()), default=1)
        max_deg = max(max_deg, 1)
        items = np.full((self.n_users, max_deg), -1, dtype=np.int32)
        counts = np.zeros((self.n_users,), dtype=np.int32)
        for uid, lst in split.items():
            if 0 <= uid < self.n_users and lst:
                items[uid, : len(lst)] = np.asarray(lst, dtype=np.int32)
                counts[uid] = len(lst)
        self._pad_cache[which] = (items, counts)
        return items, counts

    def users_of_split(self, which: str) -> np.ndarray:
        """Users evaluated for a split, in reference order
        (``list(data_generator.test_set.keys())``, MMSSL/main.py:451-452).

        Users whose id falls outside [0, n_users) — possible only with
        malformed data, since n_users counts train uids — are dropped (the
        reference would crash indexing the embedding table; silent jnp gather
        clamping would misattribute another user's scores).
        """
        split = {"val": self.val_set, "test": self.test_set}[which]
        users = np.fromiter(split.keys(), dtype=np.int32, count=len(split))
        return users[(users >= 0) & (users < self.n_users)]

    def stats_str(self) -> str:
        sparsity = (self.n_train + self.n_test) / max(self.n_users * self.n_items, 1)
        return (
            f"n_users={self.n_users}, n_items={self.n_items}, "
            f"n_train={self.n_train}, n_val={self.n_val}, n_test={self.n_test}, "
            f"sparsity={sparsity:.5f}"
        )


def _read_split(path: str) -> Dict[int, List[int]]:
    with open(path) as f:
        raw = json.load(f)
    return {int(uid): list(items) for uid, items in raw.items()}


def load_dataset(cfg: DataConfig) -> RecDataset:
    """Load a dataset directory per the reference contract.

    Counting follows ``load_data.py:29-55``: ids are maxed over all three
    splits for items and over *train only* for users, then +1.  Quirk Q7
    (uninitialized ``n_val``) is fixed here — val items still extend n_items
    exactly as in the reference (the exception fires after the max).  When
    ``cfg.n_items_from_feats`` is set, n_items comes from the first modality
    feature matrix instead (MICRO/codes/utility/load_data.py:63-64).
    """
    root = os.path.join(cfg.data_path, cfg.dataset)
    train = _read_split(os.path.join(root, "train.json"))
    val = _read_split(os.path.join(root, "val.json"))
    test = _read_split(os.path.join(root, "test.json"))

    n_users, n_items = 0, 0
    n_train = n_test = n_val = 0
    exist_users: List[int] = []
    train_items: Dict[int, List[int]] = {}
    for uid, items in train.items():
        if not items:
            continue
        exist_users.append(uid)
        n_users = max(n_users, uid)
        n_items = max(n_items, max(items))
        n_train += len(items)
        train_items[uid] = items
    for split, counter in ((test, "t"), (val, "v")):
        for uid, items in split.items():
            if not items:
                continue
            n_items = max(n_items, max(items))
            if counter == "t":
                n_test += len(items)
            else:
                n_val += len(items)
    n_users += 1
    n_items += 1

    feats: Dict[str, np.ndarray] = {}
    for modality in cfg.modalities:
        fpath = os.path.join(root, f"{modality}_feat.npy")
        feats[modality] = np.load(fpath).astype(np.float32)
    if cfg.n_items_from_feats and feats:
        n_items = next(iter(feats.values())).shape[0]
    # Reconcile feature rows with n_items: real datasets match exactly (the
    # val/test item-max raises n_items to the feat count, Q7), but malformed
    # data would crash the reference deep inside a matmul — slice extra rows
    # / zero-pad missing ones instead.
    for modality, f in feats.items():
        if f.shape[0] > n_items:
            feats[modality] = f[:n_items]
        elif f.shape[0] < n_items:
            pad = np.zeros((n_items - f.shape[0], f.shape[1]), dtype=np.float32)
            feats[modality] = np.concatenate([f, pad], axis=0)

    rows, cols = [], []
    for uid, items in train_items.items():
        rows.extend([uid] * len(items))
        cols.extend(items)
    data = np.ones(len(rows), dtype=np.float32)
    R = sp.csr_matrix((data, (rows, cols)), shape=(n_users, n_items))
    # Binary interactions: duplicate (u, i) pairs in train.json collapse to 1
    # (the reference dok assignment R[u, i] = 1 has the same effect).
    R.data[:] = 1.0
    R.sum_duplicates()
    R.data[:] = 1.0

    val_set = {u: v for u, v in val.items() if v}
    test_set = {u: v for u, v in test.items() if v}

    return RecDataset(
        n_users=n_users,
        n_items=n_items,
        n_train=n_train,
        n_test=n_test,
        n_val=n_val,
        exist_users=np.asarray(sorted(exist_users), dtype=np.int32),
        train_items=train_items,
        val_set=val_set,
        test_set=test_set,
        R=R,
        feats=feats,
    )


def load_train_mat(cfg: DataConfig) -> Optional[sp.csr_matrix]:
    """Load the pickled ``train_mat`` if present (MMSSL/main.py:58)."""
    path = os.path.join(cfg.data_path, cfg.dataset, "train_mat")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        mat = pickle.load(f)
    return sp.csr_matrix(mat)
