"""Catalog-sharded full-catalog evaluation (distributed top-k).

The item axis is this workload's long axis (SURVEY.md §5.7): full-catalog
scoring U @ I^T, train-item masking, and top-K.  Sharded design:

  - i_emb rows sharded over the mesh's model axis (P shards)
  - each device computes its local [B, n_items/P] score block and applies
    the train-item exclusion for the items that fall in its shard, built
    from the (replicated, tiny) padded train-item lists — the [B, n_items]
    mask is never materialized
  - local top-k per device; the only cross-device data movement is the
    [B, P*K_max] candidate set (ids globalized), all-gathered and merged by
    a second top-k.  Communication shrinks from O(n_items) to O(P * K_max)
    per user row.

Exactness: the global top-K of a row is contained in the union of per-shard
top-Ks, so the merge is exact (standard distributed top-k argument).
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


def make_sharded_topk(mesh: Mesh, k_max: int, n_items_real: "int | None" = None):
    """Returns topk(u_rows [B, d], i_emb [n_items, d], u_train [B, max_deg])
    -> (vals [B, k_max], ids [B, k_max]); i_emb sharded on rows over
    MODEL_AXIS, u_rows/u_train replicated.  u_train lists the items to
    exclude per row (pad < 0).

    ``n_items_real``: when the item axis is geometry-padded to a mesh
    multiple (zero pad rows appended so odd catalogs still shard), items with
    global index >= n_items_real are masked to -inf — one compare+select on
    the local score block — so pad items can never be recommended and the
    result equals the unpadded computation."""

    def _local(u_rows, i_shard, u_train):
        n_local = i_shard.shape[0]
        B = u_rows.shape[0]
        shard_ix = jax.lax.axis_index(MODEL_AXIS)
        offset = shard_ix * n_local
        scores = u_rows @ i_shard.T  # [B, n_local]
        if n_items_real is not None:
            global_ids = offset + jnp.arange(n_local)
            scores = jnp.where(global_ids < n_items_real, scores, -jnp.inf)
        # Exclude train items that fall in this shard: local index or OOB.
        local_cols = u_train - offset
        in_shard = (u_train >= offset) & (u_train < offset + n_local) & (u_train >= 0)
        local_cols = jnp.where(in_shard, local_cols, n_local)
        row_ix = jnp.arange(B, dtype=jnp.int32)[:, None]
        scores = scores.at[row_ix, local_cols].set(-jnp.inf, mode="drop")
        k_local = min(k_max, n_local)
        vals, ids = jax.lax.top_k(scores, k_local)
        ids = ids + offset  # globalize
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)  # [B, P*k]
        all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=1, tiled=True)
        # k_max may exceed the gathered candidate count when K > n_items
        # (every item is then a candidate; matches the single-device clamp).
        m_vals, m_pos = jax.lax.top_k(all_vals, min(k_max, all_vals.shape[1]))
        m_ids = jnp.take_along_axis(all_ids, m_pos, axis=1)
        return m_vals, m_ids

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_items(mesh: Mesh, i_emb: jnp.ndarray) -> jnp.ndarray:
    """Row-shard the item table over the model axis (n_items % P == 0)."""
    return jax.device_put(i_emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
