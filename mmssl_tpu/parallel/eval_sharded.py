"""Catalog-sharded full-catalog evaluation (distributed top-k).

The item axis is this workload's long axis (SURVEY.md §5.7): full-catalog
scoring U @ I^T, train-item masking, and top-K.  Sharded design:

  - i_emb rows sharded over the mesh's model axis (P shards)
  - each device computes its local [B, n_items/P] score block + local mask
  - local top-k (k <= K_max) per device — the only all-to-all data movement
    is the [P, B, K_max] candidate set (ids offset to global), all-gathered
    and merged by a second top-k.  Communication shrinks from O(n_items) to
    O(P * K_max) per user row.

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


def make_sharded_topk(mesh: Mesh, k_max: int):
    """Returns topk(u_rows [B, d], i_emb [n_items, d], mask_add [B, n_items])
    -> (vals [B, k_max], ids [B, k_max]) with i_emb/mask sharded on the item
    axis over MODEL_AXIS."""

    def _local(u_rows, i_shard, mask_shard):
        # u_rows replicated; i_shard [n_local, d]; mask_shard [B, n_local]
        n_local = i_shard.shape[0]
        shard_ix = jax.lax.axis_index(MODEL_AXIS)
        scores = u_rows @ i_shard.T + mask_shard  # [B, n_local]
        k_local = min(k_max, n_local)
        vals, ids = jax.lax.top_k(scores, k_local)
        ids = ids + shard_ix * n_local  # globalize
        # Gather candidates from every shard and merge.
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)  # [B, P*k]
        all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=1, tiled=True)
        m_vals, m_pos = jax.lax.top_k(all_vals, k_max)
        m_ids = jnp.take_along_axis(all_ids, m_pos, axis=1)
        return m_vals, m_ids

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_eval_inputs(mesh: Mesh, i_emb: jnp.ndarray, mask_add: jnp.ndarray):
    """Place the item-axis operands with the shardings make_sharded_topk
    expects (pads must be handled by the caller; n_items must divide P)."""
    i_sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    m_sh = NamedSharding(mesh, P(None, MODEL_AXIS))
    return jax.device_put(i_emb, i_sh), jax.device_put(mask_add, m_sh)
