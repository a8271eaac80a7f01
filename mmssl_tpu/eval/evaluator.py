"""Full-catalog ranking evaluation, entirely on device.

Replaces the reference harness (``MMSSL/utility/batch_test.py:112-169``) which
computes U @ I^T on device, ships the full [B, n_items] score matrix to host
(line 154), and ranks per-user in a fork()ed ``multiprocessing.Pool`` — the
reference's biggest eval bottleneck (SURVEY.md §3.4).  Here scoring, train-item
exclusion (additive -inf masking instead of set arithmetic), top-K, and the
metric reductions are one jit program; only the final per-K scalar sums cross
to host.

Protocol parity:
  - candidates = catalog minus the user's train items (batch_test.py:100-102)
  - metrics at Ks over the top-max(Ks) ranked list; model selection uses
    recall@Ks[1] (MMSSL/main.py:483)
  - averaged over len(users_to_test) (batch_test.py:160-165)
  - 'part' mode reports auc=0 (quirk Q12); 'full' computes tie-averaged AUC
  - top-k tie ordering: the reference's heapq is first-seen-wins over dict
    order; jax.lax.top_k is lowest-index-wins. Ties between distinct float
    scores are measure-zero; documented, not reproduced.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmssl_tpu.config import EvalConfig
from mmssl_tpu.data.dataset import RecDataset
from mmssl_tpu.eval.metrics import batch_auc, batch_metrics_from_topk


@partial(jax.jit, static_argnames=("ks", "full_auc"))
def _eval_user_batch(
    u_emb: jnp.ndarray,  # [n_users, d]
    i_emb: jnp.ndarray,  # [n_items, d]
    users: jnp.ndarray,  # int32 [B] (padded with 0 where invalid)
    valid: jnp.ndarray,  # float32 [B]
    train_pad: jnp.ndarray,  # int32 [n_users, max_train] (-1 pad)
    pos_pad: jnp.ndarray,  # int32 [n_users, max_pos] (-1 pad)
    pos_cnt: jnp.ndarray,  # int32 [n_users]
    ks: tuple[int, ...],
    full_auc: bool,
) -> Dict[str, jnp.ndarray]:
    B = users.shape[0]
    n_items = i_emb.shape[0]
    # K > catalog: rank every item (the reference's heapq.nlargest returns
    # min(K, n_items) entries and the metrics operate on that shorter list).
    k_max = min(max(ks), n_items)
    scores = u_emb[users] @ i_emb.T  # [B, n_items]
    u_train = train_pad[users]  # [B, max_train]
    # jnp normalizes negative array indices (-1 -> n_items-1) BEFORE OOB
    # handling, so remap pads to n_items, which 'drop' mode discards.
    u_train = jnp.where(u_train < 0, n_items, u_train)
    row_ix = jnp.arange(B, dtype=jnp.int32)[:, None]
    # Exclude train items: -inf scatter; pads are dropped (OOB under 'drop').
    masked = scores.at[row_ix, u_train].set(-jnp.inf, mode="drop")
    _, top_ids = jax.lax.top_k(masked, k_max)

    u_pos = pos_pad[users]
    u_cnt = pos_cnt[users]
    per_user = batch_metrics_from_topk(top_ids, u_pos, u_cnt, ks)
    out = {name: jnp.sum(v * valid[:, None], axis=0) for name, v in per_user.items()}
    if full_auc:
        cand = jnp.ones_like(scores, dtype=bool).at[row_ix, u_train].set(False, mode="drop")
        auc = batch_auc(scores, cand, u_pos, u_cnt)
        out["auc"] = jnp.sum(auc * valid)
    else:
        out["auc"] = jnp.zeros(())  # quirk Q12: 'part' mode reports auc = 0
    return out


METRIC_NAMES = ("recall", "precision", "ndcg", "hit_ratio")


@partial(jax.jit, static_argnames=("ks", "full_auc"))
def _eval_all_batches(
    u_emb: jnp.ndarray,
    i_emb: jnp.ndarray,
    users_mat: jnp.ndarray,  # int32 [n_batches, B]
    valid_mat: jnp.ndarray,  # float32 [n_batches, B]
    train_pad: jnp.ndarray,
    pos_pad: jnp.ndarray,
    pos_cnt: jnp.ndarray,
    ks: tuple[int, ...],
    full_auc: bool,
) -> jnp.ndarray:
    """The whole split's evaluation as ONE device program: lax.scan over the
    user batches, metric sums packed into a single [4*len(ks)+1] vector
    (recall/precision/ndcg/hit_ratio per K, then auc) so the host pays one
    dispatch and one fetch per eval instead of one per user batch (each
    fetch is a ~29 ms roundtrip on a relay-attached chip)."""

    def body(acc, xs):
        users, valid = xs
        part = _eval_user_batch(
            u_emb, i_emb, users, valid, train_pad, pos_pad, pos_cnt, ks, full_auc
        )
        packed = jnp.concatenate(
            [part[name] for name in METRIC_NAMES] + [part["auc"][None]]
        )
        return acc + packed, None

    init = jnp.zeros((4 * len(ks) + 1,), jnp.float32)
    totals, _ = jax.lax.scan(body, init, (users_mat, valid_mat))
    return totals


class Evaluator:
    """Holds device-resident protocol state (pads, counts) for a dataset.

    Pass a mesh to run catalog-sharded scoring + distributed top-k (+ the
    per-shard 'full'-mode AUC decomposition) as one scanned device program
    (parallel/eval_sharded.make_sharded_eval); odd catalogs are zero-padded
    to a mesh multiple on device with pad items masked to -inf.  Both
    reference test modes ('part' and 'full', batch_test.py:53-68) ride the
    mesh."""

    def __init__(self, dataset: RecDataset, cfg: EvalConfig, mesh=None):
        self.cfg = cfg
        self.ks = tuple(cfg.ks)
        train_pad, _ = dataset.padded_split("train")
        self.train_pad = jnp.asarray(train_pad)
        self._splits = {}
        for which in ("val", "test"):
            pos_pad, pos_cnt = dataset.padded_split(which)
            users = dataset.users_of_split(which)
            self._splits[which] = (
                jnp.asarray(pos_pad),
                jnp.asarray(pos_cnt),
                users,
            )
        self.mesh = mesh
        self._batched: Dict = {}
        self._sharded_eval = None
        self.n_items_pad = dataset.n_items
        if mesh is not None:
            model_p = mesh.shape.get("model", 1)
            if model_p > 1:
                from mmssl_tpu.parallel.eval_sharded import (
                    METRIC_NAMES as _SHARDED_NAMES,
                    make_sharded_eval,
                )

                assert _SHARDED_NAMES == METRIC_NAMES  # shared packed order
                # Odd catalogs shard too: pad the item axis to a mesh
                # multiple with zero rows (done on device in evaluate());
                # pad items are masked to -inf inside the kernel.
                self.n_items_pad = -(-dataset.n_items // model_p) * model_p
                real = dataset.n_items if self.n_items_pad != dataset.n_items else None
                self._sharded_eval = make_sharded_eval(
                    mesh, self.ks, dataset.n_items, n_items_real=real,
                    full_auc=cfg.test_flag == "full",
                )

    def evaluate(self, u_emb: jnp.ndarray, i_emb: jnp.ndarray, which: str = "val") -> Dict[str, np.ndarray]:
        """Returns {'recall': [len(ks)], 'precision': ..., 'ndcg': ...,
        'hit_ratio': ..., 'auc': scalar} averaged over the split's users."""
        pos_pad, pos_cnt, users = self._splits[which]
        n_users = len(users)
        full_auc = self.cfg.test_flag == "full"
        users_mat, valid_mat = self._batched_split(which)
        if self._sharded_eval is None:
            # Fused dense path: the whole split as one scanned device program
            # with one packed fetch (see _eval_all_batches).
            packed = _eval_all_batches(
                u_emb, i_emb, users_mat, valid_mat,
                self.train_pad, pos_pad, pos_cnt, self.ks, full_auc,
            )
        else:
            # Fused sharded path: same scan shape, scoring/top-k/AUC inside a
            # shard_map over the catalog axis — one dispatch + one fetch too.
            from mmssl_tpu.parallel.eval_sharded import shard_items

            if i_emb.shape[0] < self.n_items_pad:
                i_emb = jnp.pad(i_emb, ((0, self.n_items_pad - i_emb.shape[0]), (0, 0)))
            i_emb_sharded = shard_items(self.mesh, i_emb)
            packed = self._sharded_eval(
                u_emb, i_emb_sharded, users_mat, valid_mat,
                self.train_pad, pos_pad, pos_cnt,
            )
        packed = np.asarray(packed) / max(n_users, 1)
        nk = len(self.ks)
        out = {
            name: packed[i * nk : (i + 1) * nk] for i, name in enumerate(METRIC_NAMES)
        }
        out["auc"] = packed[4 * nk]
        return out

    def _batched_split(self, which: str):
        """Padded [n_batches, user_batch_size] user/valid matrices for the
        fused eval program (cached; splits are static per dataset)."""
        key = (which, self.cfg.user_batch_size)
        if key not in self._batched:
            _, _, users = self._splits[which]
            bs = self.cfg.user_batch_size
            n = max(len(users), 1)
            n_batches = (n + bs - 1) // bs
            users_mat = np.zeros((n_batches * bs,), dtype=np.int32)
            users_mat[: len(users)] = users
            valid_mat = np.zeros((n_batches * bs,), dtype=np.float32)
            valid_mat[: len(users)] = 1.0
            self._batched[key] = (
                jnp.asarray(users_mat.reshape(n_batches, bs)),
                jnp.asarray(valid_mat.reshape(n_batches, bs)),
            )
        return self._batched[key]
