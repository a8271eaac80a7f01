"""Batch inference / serving path.

The reference has no serving story at all — its only "inference" is the
in-training evaluation harness (``MMSSL/utility/batch_test.py:112-169``),
which recomputes the full forward and ships [B, n_items] score matrices to a
host process pool.  Production retrieval for this model family is two-stage:

  1. **materialize** — one eval-mode forward produces the final fused user
     and item embedding tables (the model collapses to a biencoder at
     inference: score(u, i) = <user_emb[u], item_emb[i]>).
  2. **retrieve** — top-k over the item catalog per user with the user's
     train interactions masked out, entirely on device: one MXU matmul +
     `lax.top_k` per request batch, no host round-trips until the final
     [B, k] id/score fetch.

``RecommendEngine`` owns stage-1 output as device-resident arrays and
compiles stage-2 once per (batch_size, k) shape.  Under a mesh it reuses the
catalog-sharded distributed top-k (``parallel/eval_sharded.py``) so the item
axis scales with chips.  ``export_embeddings`` writes the tables as .npy for
external ANN servers (ScaNN/Faiss-style) — at which point this engine is the
exact-scoring oracle those systems approximate.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "exclude_train", "impl"))
def _topk_batch(
    u_rows: jnp.ndarray,  # [B, d] user embeddings for the request batch
    i_emb: jnp.ndarray,  # [n_items, d]
    train_rows: jnp.ndarray,  # int32 [B, max_deg], -1 pad (ignored if not exclude_train)
    k: int,
    exclude_train: bool,
    impl: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-catalog scores -> (top-k scores, top-k item ids).

    ``impl='approx'`` uses the TPU-native ``jax.lax.approx_max_k``
    (recall_target 0.95) — the production ANN-style path for large catalogs
    where an exact sort dominates retrieval latency.  'exact' matches the
    reference ranking protocol bit-for-bit."""
    n_items = i_emb.shape[0]
    scores = u_rows @ i_emb.T  # [B, n_items]
    if exclude_train:
        rows = jnp.where(train_rows < 0, n_items, train_rows)
        bix = jnp.arange(scores.shape[0], dtype=jnp.int32)[:, None]
        scores = scores.at[bix, rows].set(-jnp.inf, mode="drop")
    if impl == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=0.95)
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_scores, top_ids


@partial(jax.jit, static_argnames=("k", "exclude_train", "impl", "ids_dtype"))
def _topk_scan(
    u_emb: jnp.ndarray,  # [n_users, d]
    i_emb: jnp.ndarray,  # [n_items, d]
    train_pad: jnp.ndarray,  # int32 [n_users, max_deg]
    users_mat: jnp.ndarray,  # int32 [n_chunks, B]
    k: int,
    exclude_train: bool,
    impl: str = "exact",
    ids_dtype=None,
) -> jnp.ndarray:
    """Offline retrieval for a whole user list as ONE scanned device
    program: every [B, n_items] score block, its train-mask, and its top-k
    stay in HBM; the output is one packed array so the host pays ONE fetch
    for the whole job.  The request-path ``recommend`` loop is fetch-bound
    on a relay-attached chip (~29 ms per batch round-trip,
    docs/performance.md); this is the throughput-job shape, mirroring the
    evaluator's fused scan.

    ``ids_dtype=None``: [n_chunks, B, 2k] f32, scores ‖ ids (item ids are
    exact in f32 up to 2^24, far above any reference catalog).  An integer
    ``ids_dtype`` returns ids ONLY at that width — the candidate-generation
    shape, where the fetch is the binding cost (int16 quarters the bytes of
    the packed form; measured in scripts/bench_serve.py)."""

    def body(carry, users):
        scores, ids = _topk_batch(
            u_emb[users], i_emb, train_pad[users], k=k,
            exclude_train=exclude_train, impl=impl,
        )
        if ids_dtype is not None:
            return carry, ids.astype(ids_dtype)
        return carry, jnp.concatenate([scores, ids.astype(jnp.float32)], axis=-1)

    _, packed = jax.lax.scan(body, jnp.zeros((), jnp.int32), users_mat)
    return packed


@jax.jit
def _score_pairs(
    u_rows: jnp.ndarray,  # [B, d]
    i_rows: jnp.ndarray,  # [B, d]
) -> jnp.ndarray:
    return jnp.sum(u_rows * i_rows, axis=1)


class RecommendEngine:
    """Top-k retrieval over materialized embeddings.

    Build from a fitted/restored :class:`~mmssl_tpu.train.trainer.Trainer`
    (``RecommendEngine.from_trainer``) or directly from embedding tables.

    ``batch_size`` fixes the compiled request shape: requests are padded up
    to it so every call hits the same compiled program.
    """

    def __init__(
        self,
        user_emb: jnp.ndarray,
        item_emb: jnp.ndarray,
        train_pad: Optional[np.ndarray] = None,  # int32 [n_users, max_deg], -1 pad
        batch_size: int = 1024,
        mesh=None,
        topk_impl: str = "exact",  # exact | approx (lax.approx_max_k; on a mesh:
        # per-shard approx candidates + exact merge, recall >= the 0.95 target)
    ):
        if topk_impl not in ("exact", "approx"):
            raise ValueError(f"topk_impl must be 'exact' or 'approx', got {topk_impl!r}")
        self.topk_impl = topk_impl
        self.user_emb = jnp.asarray(user_emb)
        self.item_emb = jnp.asarray(item_emb)
        self.n_users, self.d = self.user_emb.shape
        self.n_items = self.item_emb.shape[0]
        if train_pad is None:
            train_pad = np.full((self.n_users, 1), -1, dtype=np.int32)
        self.train_pad = jnp.asarray(train_pad, dtype=jnp.int32)
        self.batch_size = int(batch_size)
        self._sharded_topk = None
        self._i_emb_sharded = None
        self._n_items_real_sh = None
        if mesh is not None:
            model_p = mesh.shape.get("model", 1)
            if model_p > 1:
                from mmssl_tpu.parallel.eval_sharded import shard_items

                # Odd catalogs shard too (mirroring the Evaluator): pad the
                # item table to a mesh multiple with zero rows; pad items
                # are masked to -inf inside the kernels (n_items_real) so
                # they can never be recommended.
                n_pad = -(-self.n_items // model_p) * model_p
                i_emb_p = self.item_emb
                if n_pad != self.n_items:
                    i_emb_p = jnp.pad(i_emb_p, ((0, n_pad - self.n_items), (0, 0)))
                    self._n_items_real_sh = self.n_items
                self._i_emb_sharded = shard_items(mesh, i_emb_p)
                self._sharded_mesh = mesh
                self._sharded_k: Dict[int, object] = {}
                self._sharded_all: Dict = {}

    @classmethod
    def from_trainer(cls, trainer, batch_size: int = 1024, **kw) -> "RecommendEngine":
        """Materialize eval-mode embeddings from a Trainer (fresh, fitted, or
        checkpoint-restored) and wrap them for retrieval."""
        u_emb, i_emb = trainer.eval_embeddings()
        train_pad, _ = trainer.ds.padded_split("train")
        return cls(
            u_emb, i_emb, train_pad=train_pad, batch_size=batch_size, mesh=trainer.mesh, **kw
        )

    # ------------------------------------------------------------------
    def recommend(
        self,
        user_ids: Iterable[int],
        k: int = 20,
        exclude_train: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-``k`` items per user.

        Returns ``(item_ids [n, k] int32, scores [n, k] float32)`` in request
        order.  Known train interactions are excluded by default (the
        standard recommendation protocol; pass ``exclude_train=False`` for
        raw similarity search).
        """
        users = np.asarray(list(user_ids), dtype=np.int32)
        if users.ndim != 1:
            raise ValueError("user_ids must be a flat sequence of ints")
        if users.size and (users.min() < 0 or users.max() >= self.n_users):
            raise ValueError(f"user id out of range [0, {self.n_users})")
        k = int(k)
        if not 1 <= k <= self.n_items:
            raise ValueError(f"k must be in [1, {self.n_items}]")
        out_ids = np.empty((len(users), k), dtype=np.int32)
        out_scores = np.empty((len(users), k), dtype=np.float32)
        bs = self.batch_size
        for start in range(0, len(users), bs):
            batch = users[start : start + bs]
            n = len(batch)
            if n < bs:  # pad to the compiled shape
                batch = np.concatenate([batch, np.zeros(bs - n, dtype=np.int32)])
            bj = jnp.asarray(batch)
            if self._sharded_topk_for(k) is not None:
                scores, ids = self._sharded_topk_for(k)(
                    self.user_emb[bj],
                    self._i_emb_sharded,
                    self.train_pad[bj] if exclude_train
                    else jnp.full_like(self.train_pad[bj], -1),
                )
                scores, ids = scores[:, :k], ids[:, :k]
            else:
                scores, ids = _topk_batch(
                    self.user_emb[bj], self.item_emb, self.train_pad[bj],
                    k=k, exclude_train=exclude_train, impl=self.topk_impl,
                )
            out_ids[start : start + n] = np.asarray(ids)[:n]
            out_scores[start : start + n] = np.asarray(scores)[:n]
        return out_ids, out_scores

    def recommend_all(
        self,
        k: int = 20,
        exclude_train: bool = True,
        user_ids: Optional[Iterable[int]] = None,
        return_scores: bool = True,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Fused OFFLINE retrieval (VERDICT r3 #8): top-``k`` for the whole
        user base (or ``user_ids``) as one scanned dispatch + one packed
        fetch — the shape for batch jobs (nightly candidate generation,
        embedding-refresh sweeps) where ``recommend``'s per-batch fetches
        dominate on a relay-attached chip.  Same results as ``recommend``
        (exact path), same (ids, scores) return convention.

        ``return_scores=False`` fetches ids ONLY, at the narrowest integer
        width the catalog allows (int16 under 32,768 items) — the fetch is
        the binding cost of the fused job, and candidate generation rarely
        needs the scores; ``scores`` comes back None.  Under a mesh with a
        model axis the scan runs the catalog-sharded distributed-top-k
        kernel (parallel/eval_sharded.make_sharded_recommend_all), so the
        item axis scales over chips; otherwise the dense single-device
        program."""
        if user_ids is None:
            users = np.arange(self.n_users, dtype=np.int32)
        else:
            users = np.asarray(list(user_ids), dtype=np.int32)
        if users.size and (users.min() < 0 or users.max() >= self.n_users):
            raise ValueError(f"user id out of range [0, {self.n_users})")
        k = int(k)
        if not 1 <= k <= self.n_items:
            raise ValueError(f"k must be in [1, {self.n_items}]")
        bs = self.batch_size
        n = len(users)
        n_chunks = max(-(-n // bs), 1)
        padded = np.concatenate([users, np.zeros(n_chunks * bs - n, dtype=np.int32)])
        users_mat = jnp.asarray(padded.reshape(n_chunks, bs))
        ids_dtype = None
        if not return_scores:
            ids_dtype = jnp.int16 if self.n_items <= np.iinfo(np.int16).max else jnp.int32
        if self._i_emb_sharded is not None:
            fn = self._sharded_all_for(k, ids_dtype)
            train = self.train_pad if exclude_train else jnp.full_like(self.train_pad, -1)
            out = np.asarray(fn(self.user_emb, self._i_emb_sharded, train, users_mat))
        else:
            out = np.asarray(_topk_scan(
                self.user_emb, self.item_emb, self.train_pad, users_mat,
                k=k, exclude_train=exclude_train, impl=self.topk_impl,
                ids_dtype=ids_dtype,
            ))
        if not return_scores:
            ids = out.reshape(n_chunks * bs, k)[:n]
            return ids.astype(np.int32), None
        packed = out.reshape(n_chunks * bs, 2 * k)[:n]
        return packed[:, k:].astype(np.int32), packed[:, :k].astype(np.float32)

    def _sharded_topk_for(self, k: int):
        if self._i_emb_sharded is None:
            return None
        if k not in self._sharded_k:
            from mmssl_tpu.parallel.eval_sharded import make_sharded_topk

            self._sharded_k[k] = make_sharded_topk(
                self._sharded_mesh, k, n_items_real=self._n_items_real_sh,
                impl=self.topk_impl,
            )
        return self._sharded_k[k]

    def _sharded_all_for(self, k: int, ids_dtype):
        """Compiled catalog-sharded fused-retrieval program per (k, output
        form); ids_dtype None = packed scores‖ids, else ids-only at that
        width."""
        cache_key = (k, ids_dtype)
        if cache_key not in self._sharded_all:
            from mmssl_tpu.parallel.eval_sharded import make_sharded_recommend_all

            self._sharded_all[cache_key] = make_sharded_recommend_all(
                self._sharded_mesh, k, n_items_real=self._n_items_real_sh,
                ids_dtype=ids_dtype, impl=self.topk_impl,
            )
        return self._sharded_all[cache_key]

    def score(self, user_ids: Iterable[int], item_ids: Iterable[int]) -> np.ndarray:
        """Pointwise scores for aligned (user, item) pairs."""
        u = np.asarray(list(user_ids), dtype=np.int32)
        i = np.asarray(list(item_ids), dtype=np.int32)
        if u.shape != i.shape:
            raise ValueError("user_ids and item_ids must align")
        return np.asarray(_score_pairs(self.user_emb[jnp.asarray(u)], self.item_emb[jnp.asarray(i)]))

    # ------------------------------------------------------------------
    def export_embeddings(self, directory: str) -> Dict[str, str]:
        """Write user/item tables as .npy + a manifest, for external ANN
        serving stacks.  Returns the written paths."""
        os.makedirs(directory, exist_ok=True)
        paths = {
            "user_emb": os.path.join(directory, "user_emb.npy"),
            "item_emb": os.path.join(directory, "item_emb.npy"),
            "manifest": os.path.join(directory, "manifest.json"),
        }
        np.save(paths["user_emb"], np.asarray(self.user_emb))
        np.save(paths["item_emb"], np.asarray(self.item_emb))
        with open(paths["manifest"], "w") as f:
            json.dump(
                {
                    "n_users": int(self.n_users),
                    "n_items": int(self.n_items),
                    "dim": int(self.d),
                    "score": "dot_product",
                    "files": {k: os.path.basename(v) for k, v in paths.items() if k != "manifest"},
                },
                f,
            )
        return paths

    @classmethod
    def load(cls, directory: str, train_pad: Optional[np.ndarray] = None, **kw) -> "RecommendEngine":
        u = np.load(os.path.join(directory, "user_emb.npy"))
        i = np.load(os.path.join(directory, "item_emb.npy"))
        return cls(u, i, train_pad=train_pad, **kw)
