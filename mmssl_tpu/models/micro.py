"""MICRO: latent structure mining with contrastive modality fusion.

Behavior contract: ``MICRO/codes/Models.py:13-160``.  Differences vs LATTICE:
per-modality item-item graphs are kept separate (each mixed with its static
original: ``adj_m = (1-lambda) * knn_norm(sim(proj_m)) + lambda * orig_m``),
the item embedding is propagated through each modality graph independently,
and the modality outputs are fused by a shared ``query`` MLP attention
(Linear-Tanh-Linear(1, no bias), softmax over modalities).  The fused ``h``
and the per-modality item embeddings feed the InfoNCE contrastive heads in
the trainer (``MICRO/codes/main.py:99-104``).

Sparse mode (the reference default, ``--sparse 1``): each modality graph is a
static-capacity COO of exactly 2 * n_items * topk entries — the learned kNN
entries scaled by (1-lambda) concatenated with the original entries scaled by
lambda — so rebuilds are pure device ops with fixed shapes.  Dense mode
mirrors LATTICE's dense laplacians.
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mmssl_tpu.config import ModelConfig, ParityConfig
from mmssl_tpu.models.cf import CFOutput, cf_branch, init_ngcf, resolve_node_real
from mmssl_tpu.models.common import (
    init_linear,
    l2_normalize,
    linear,
    matmul,
    resolve_dtype,
    torch_linear_default,
    xavier_uniform,
)
from mmssl_tpu.ops.knn import (
    build_knn_neighbourhood,
    build_knn_sparse_graph,
    build_sim,
    get_dense_laplacian,
)
from mmssl_tpu.ops.sparse import SparseGraph

ModalityAdj = Union[jnp.ndarray, SparseGraph]


class MicroOutput(NamedTuple):
    user_emb: jnp.ndarray
    item_emb: jnp.ndarray
    mm_item_embeds: Dict[str, jnp.ndarray]  # per-modality propagated item emb
    fusion: jnp.ndarray  # attention-fused h (contrastive anchor)
    mod_adjs: Dict[str, ModalityAdj]  # carried state


def build_original_adjs_sparse(
    feats: Mapping[str, jnp.ndarray], topk: int, norm_type: str,
    n_real: "int | None" = None,
) -> Dict[str, SparseGraph]:
    """Static modality graphs from raw features (MICRO/codes/Models.py:41-48).
    ``n_real``: geometry-padding selection mask (see ops/knn)."""
    return {
        m: build_knn_sparse_graph(build_sim(f), topk, norm_type, n_real)
        for m, f in feats.items()
    }


def build_original_adjs_dense(
    feats: Mapping[str, jnp.ndarray], topk: int, norm_type: str,
    n_real: "int | None" = None,
) -> Dict[str, jnp.ndarray]:
    return {
        m: get_dense_laplacian(build_knn_neighbourhood(build_sim(f), topk, n_real), norm_type)
        for m, f in feats.items()
    }


def init_micro(
    key: jax.Array,
    n_users: int,
    n_items: int,
    feat_dims: Mapping[str, int],
    cfg: ModelConfig,
) -> dict:
    modalities = sorted(feat_dims)
    keys = jax.random.split(key, 5 + len(modalities))
    d = cfg.embed_size
    params = {
        "user_emb": xavier_uniform(keys[0], (n_users, d)),
        "item_emb": xavier_uniform(keys[1], (n_items, d)),
        # query MLP: Linear(d, d) -> Tanh -> Linear(d, 1, bias=False)
        # (MICRO/codes/Models.py:56-60), torch-default init.
        "query1": init_linear(keys[2], d, d, w_init=torch_linear_default),
        "query2_w": torch_linear_default(keys[3], (d, 1)),
        "trs": {},
    }
    for i, m in enumerate(modalities):
        params["trs"][m] = init_linear(keys[5 + i], feat_dims[m], d, w_init=torch_linear_default)
    if cfg.cf_model == "ngcf":
        ngcf = init_ngcf(keys[4], n_users, n_items, cfg)
        params["gc"], params["bi"] = ngcf["gc"], ngcf["bi"]
    return params


def _query(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(linear(params["query1"], x)) @ params["query2_w"]  # [N, 1]


def _mix_sparse(new: SparseGraph, orig: SparseGraph, lam: float) -> SparseGraph:
    """(1-lam) * new + lam * orig as concatenated COO (duplicates sum in
    SpMM, which is exactly sparse addition)."""
    return SparseGraph(
        rows=jnp.concatenate([new.rows, orig.rows]),
        cols=jnp.concatenate([new.cols, orig.cols]),
        vals=jnp.concatenate([(1.0 - lam) * new.vals, lam * orig.vals]),
        shape=new.shape,
    )


def apply_micro(
    params: dict,
    joint: SparseGraph,
    feats: Mapping[str, jnp.ndarray],
    original_adjs: Mapping[str, ModalityAdj],
    mod_adj_state: Mapping[str, ModalityAdj],
    cfg: ModelConfig,
    parity: ParityConfig,
    build_item_graph: bool,
    sparse: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    n_items_real: Optional[int] = None,
    n_users_real: Optional[int] = None,
) -> MicroOutput:
    """``n_items_real``: geometry-padded item axis (parallel/spmd.py) —
    masks the learned kNN selection to the real catalog (see
    models/lattice.apply_lattice) so the carried graphs, and hence every
    propagated embedding's pad rows, stay exact zeros.  ``n_users_real``:
    see models/lattice.apply_lattice (ngcf-branch dropout parity)."""
    modalities = sorted(feats)
    dt = resolve_dtype(cfg.compute_dtype)

    mod_adjs: Dict[str, ModalityAdj] = {}
    if build_item_graph:
        for m in modalities:
            proj = linear(params["trs"][m], feats[m], dt)
            sim = build_sim(proj)
            if sparse:
                new = build_knn_sparse_graph(sim, cfg.knn_topk, cfg.norm_type, n_items_real)
                mod_adjs[m] = _mix_sparse(new, original_adjs[m], cfg.lambda_coeff)
            else:
                new = get_dense_laplacian(
                    build_knn_neighbourhood(sim, cfg.knn_topk, n_items_real), cfg.norm_type
                )
                mixed = (1.0 - cfg.lambda_coeff) * new + cfg.lambda_coeff * original_adjs[m].astype(jnp.float32)
                # Stored at the compute dtype: halves the dense modality
                # propagation's HBM bytes (see models/lattice).
                mod_adjs[m] = mixed if dt is None else mixed.astype(dt)
    else:
        mod_adjs = {m: jax.lax.stop_gradient(mod_adj_state[m]) for m in modalities}

    mm_item_embeds: Dict[str, jnp.ndarray] = {}
    for m in modalities:
        h_m = params["item_emb"]
        adj = mod_adjs[m]
        for _ in range(cfg.n_item_layers):
            h_m = adj.spmm(h_m) if isinstance(adj, SparseGraph) else matmul(adj, h_m, dt)
        mm_item_embeds[m] = h_m

    # Attention fusion over modalities (Models.py:121-123).
    att = jnp.concatenate([_query(params, mm_item_embeds[m]) for m in modalities], axis=-1)
    weight = jax.nn.softmax(att, axis=-1)  # [n_items, M]
    fusion = jnp.zeros_like(params["item_emb"])
    for i, m in enumerate(modalities):
        fusion = fusion + weight[:, i : i + 1] * mm_item_embeds[m]

    cf = cf_branch(params, joint, cfg, train, rng,
                   n_real=resolve_node_real(params, n_users_real, n_items_real))
    item_out = cf.item_emb + l2_normalize(fusion, axis=1)
    return MicroOutput(
        user_emb=cf.user_emb,
        item_emb=item_out,
        mm_item_embeds=mm_item_embeds,
        fusion=fusion,
        mod_adjs=mod_adjs,
    )
