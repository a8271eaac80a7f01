"""LATTICE: latent item-item structure mining.

Behavior contract: ``LATTICE/codes/Models.py:29-138``.  A learned item-item
graph is rebuilt from the projected modality features on the first batch of
each epoch (``build_item_graph``), mixed with the static graph built from raw
features: ``item_adj = (1-lambda) * norm_lap(sum_m w_m * knn(sim(proj_m)))
+ lambda * sum_m w_m * orig_m`` with w = softmax(modal_weight).  The item
embedding is propagated ``n_item_layers`` times through item_adj, then added
(L2-normalized) to the CF-branch item output.

TPU design: the n_items^2 similarity and kNN run inside the jit step (MXU
matmul + top_k) instead of the reference's host-controlled rebuild; item_adj
is carried as explicit functional state between steps (stop_gradient'd when
not rebuilt, matching ``self.item_adj.detach()``).  Dense item_adj is the
LATTICE design (its memory is the reference's own cost); MICRO provides the
sparse alternative.
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmssl_tpu.config import ModelConfig, ParityConfig
from mmssl_tpu.models.cf import CFOutput, cf_branch, resolve_node_real
from mmssl_tpu.models.common import (
    init_linear,
    l2_normalize,
    linear,
    matmul,
    resolve_dtype,
    torch_linear_default,
    xavier_uniform,
)
from mmssl_tpu.models.cf import init_ngcf
from mmssl_tpu.ops.knn import build_knn_neighbourhood, build_sim, compute_normalized_laplacian
from mmssl_tpu.ops.sparse import SparseGraph


class LatticeOutput(NamedTuple):
    user_emb: jnp.ndarray
    item_emb: jnp.ndarray
    item_adj: jnp.ndarray  # [n_items, n_items] carried state


def build_original_adjs(
    feats: Mapping[str, jnp.ndarray], topk: int, n_real: "int | None" = None
) -> Dict[str, jnp.ndarray]:
    """Static per-modality graphs from raw features, normalized
    (LATTICE/codes/Models.py:57-71; cached to .pt files in the reference —
    here they are just device arrays computed once at trainer init).

    ``n_real``: geometry-padded feats (zero pad rows) — selection restricted
    to the real catalog so the graph matches the unpadded one on the real
    block, with exact-zero pad rows/cols (ops/knn.mask_sim_padding)."""
    return {
        m: compute_normalized_laplacian(build_knn_neighbourhood(build_sim(f), topk, n_real))
        for m, f in feats.items()
    }


def init_lattice(
    key: jax.Array,
    n_users: int,
    n_items: int,
    feat_dims: Mapping[str, int],
    cfg: ModelConfig,
) -> dict:
    modalities = sorted(feat_dims)
    keys = jax.random.split(key, 3 + len(modalities))
    d = cfg.embed_size
    params = {
        "user_emb": xavier_uniform(keys[0], (n_users, d)),
        "item_emb": xavier_uniform(keys[1], (n_items, d)),
        # softmax-normalized modality mixing weights (Models.py:80).
        "modal_weight": jnp.full((len(modalities),), 0.5, dtype=jnp.float32),
        "trs": {},
    }
    # feat_embed_dim == embed_size in the published runs.
    for i, m in enumerate(modalities):
        params["trs"][m] = init_linear(keys[3 + i], feat_dims[m], d, w_init=torch_linear_default)
    if cfg.cf_model == "ngcf":
        ngcf = init_ngcf(keys[2], n_users, n_items, cfg)
        params["gc"], params["bi"] = ngcf["gc"], ngcf["bi"]
    return params


def apply_lattice(
    params: dict,
    joint: SparseGraph,
    feats: Mapping[str, jnp.ndarray],
    original_adjs: Mapping[str, jnp.ndarray],
    item_adj_state: jnp.ndarray,
    cfg: ModelConfig,
    parity: ParityConfig,
    build_item_graph: bool,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    n_items_real: Optional[int] = None,
    n_users_real: Optional[int] = None,
) -> LatticeOutput:
    """``n_items_real``: set when the item axis is geometry-padded to mesh
    multiples (parallel/spmd.py) — restricts the learned kNN selection to
    the real catalog (pad rows of trs-projected feats are bias rows, NOT
    zero, so without masking they could enter real rows' top-k) and keeps
    the carried graph's pad rows/cols exact zeros.  ``n_users_real``: real
    user count under padding — with it the ngcf CF-branch draws its
    mess_dropout masks at the real node dims (models/cf._node_dropout)."""
    modalities = sorted(feats)
    weight = jax.nn.softmax(params["modal_weight"], axis=0)
    dt = resolve_dtype(cfg.compute_dtype)

    if build_item_graph:
        learned = jnp.zeros_like(item_adj_state)
        original = jnp.zeros_like(item_adj_state)
        for i, m in enumerate(modalities):
            proj = linear(params["trs"][m], feats[m], dt)
            adj_m = build_knn_neighbourhood(build_sim(proj), cfg.knn_topk, n_items_real)
            learned = learned + weight[i] * adj_m
            original = original + weight[i] * original_adjs[m]
        learned = compute_normalized_laplacian(learned)
        item_adj = (1.0 - cfg.lambda_coeff) * learned + cfg.lambda_coeff * original
        # STORE the carried graph at the compute dtype: a per-read operand
        # cast halves nothing (XLA still streams the f32 array); halving the
        # HBM bytes of the hot n_items^2 propagation requires bf16 storage
        # (400 MB -> 200 MB per step at Baby scale incl. VJP reads).  Mixing
        # math stays f32.
        if dt is not None:
            item_adj = item_adj.astype(dt)
    else:
        item_adj = jax.lax.stop_gradient(item_adj_state)

    # The n_items^2 dense propagation is LATTICE's hot op.
    h = params["item_emb"]
    for _ in range(cfg.n_item_layers):
        h = matmul(item_adj, h, dt)

    cf = cf_branch(params, joint, cfg, train, rng,
                   n_real=resolve_node_real(params, n_users_real, n_items_real))
    item_out = cf.item_emb + l2_normalize(h, axis=1)
    return LatticeOutput(user_emb=cf.user_emb, item_emb=item_out, item_adj=item_adj)
