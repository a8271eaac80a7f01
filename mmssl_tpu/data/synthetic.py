"""Synthetic dataset generator in the reference's exact on-disk format.

Used by the test suite (SURVEY.md §4 item 4: tiny end-to-end datasets) and by
``bench.py`` to benchmark at Amazon-Baby scale without shipping the real
datasets.  Interactions follow a popularity power law so ranking metrics are
non-degenerate; modality features are drawn around item-cluster centroids so
contrastive/kNN components have real structure to exploit.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Mapping, Sequence

import numpy as np
import scipy.sparse as sp


def write_synthetic_dataset(
    root: str,
    name: str,
    n_users: int = 50,
    n_items: int = 30,
    n_clusters: int = 4,
    interactions_per_user: tuple[int, int] = (3, 8),
    modality_dims: Mapping[str, int] = None,
    seed: int = 0,
) -> str:
    """Write ``{root}/{name}/`` with train/val/test.json, feats, train_mat.

    Returns the dataset directory path.  Every user gets >=1 train item;
    val/test each get one held-out item when the user has >=3 interactions
    (mirrors the sparse leave-out splits of the real datasets).
    """
    if modality_dims is None:
        modality_dims = {"image": 64, "text": 32}
    rng = np.random.default_rng(seed)
    out = os.path.join(root, name)
    os.makedirs(out, exist_ok=True)

    item_cluster = rng.integers(0, n_clusters, size=n_items)
    user_pref = rng.integers(0, n_clusters, size=n_users)
    # Popularity power law over items.
    pop = (1.0 / np.arange(1, n_items + 1)) ** 0.8
    lo, hi = interactions_per_user
    train: Dict[str, list] = {}
    val: Dict[str, list] = {}
    test: Dict[str, list] = {}
    for u in range(n_users):
        k = int(rng.integers(lo, hi + 1))
        # Mix popularity with cluster affinity.
        w = pop * np.where(item_cluster == user_pref[u], 4.0, 1.0)
        w = w / w.sum()
        items = rng.choice(n_items, size=min(k, n_items), replace=False, p=w)
        items = [int(i) for i in items]
        if len(items) >= 3:
            test[str(u)] = [items.pop()]
            val[str(u)] = [items.pop()]
        train[str(u)] = items

    # Pin the id range: the loader counts n_items as max id + 1, so make sure
    # the last item id appears somewhere in train.
    seen = {i for items in train.values() for i in items}
    if (n_items - 1) not in seen:
        train[str(0)] = train.get(str(0), []) + [n_items - 1]

    for fname, split in (("train.json", train), ("val.json", val), ("test.json", test)):
        with open(os.path.join(out, fname), "w") as f:
            json.dump(split, f)

    for modality, dim in modality_dims.items():
        centroids = rng.normal(size=(n_clusters, dim)).astype(np.float32)
        feats = centroids[item_cluster] + 0.3 * rng.normal(size=(n_items, dim)).astype(np.float32)
        np.save(os.path.join(out, f"{modality}_feat.npy"), feats)

    rows, cols = [], []
    for u_str, items in train.items():
        rows.extend([int(u_str)] * len(items))
        cols.extend(items)
    R = sp.csr_matrix(
        (np.ones(len(rows), dtype=np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    with open(os.path.join(out, "train_mat"), "wb") as f:
        pickle.dump(R, f)
    return out
