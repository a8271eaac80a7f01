"""Modality kNN item-item graph construction on device.

Contracts:
  - dense path (LATTICE): ``build_sim`` / ``build_knn_neighbourhood`` /
    ``compute_normalized_laplacian`` (``LATTICE/codes/Models.py:13-27``)
  - sparse path (MICRO): ``build_sim`` / ``build_knn_normalized_graph`` /
    ``get_sparse_laplacian`` / ``get_dense_laplacian``
    (``MICRO/codes/utility/norm.py:4-53``; torch_scatter's scatter_add
    becomes ``jax.ops.segment_sum``)

Everything is jittable: LATTICE/MICRO rebuild these graphs from *learned*
projected features during training (``LATTICE/codes/Models.py:86-100``), so
the builder sits inside the compiled train step — the n_items^2 similarity
matmul runs on the MXU instead of the reference's host-loop-triggered
rebuild.

Parity note: ``build_sim`` divides by the raw row norm with no epsilon
(torch ``div(norm(...))``) — a zero feature row yields nan exactly as the
reference does.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mmssl_tpu.ops.sparse import SparseGraph


def build_sim(context: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix of row vectors (no eps, per reference)."""
    norm = jnp.linalg.norm(context, axis=-1, keepdims=True)
    normed = context / norm
    return normed @ normed.T


def build_knn_neighbourhood(adj: jnp.ndarray, topk: int) -> jnp.ndarray:
    """Keep top-k entries per row, zero elsewhere
    (LATTICE/codes/Models.py:13-16).  topk is clamped to the catalog size
    (torch.topk would raise just like lax.top_k; k >= n keeps every entry)."""
    n = adj.shape[-1]
    knn_val, knn_ind = jax.lax.top_k(adj, min(topk, n))
    out = jnp.zeros_like(adj)
    rows = jnp.arange(adj.shape[0])[:, None]
    return out.at[rows, knn_ind].set(knn_val)


def compute_normalized_laplacian(adj: jnp.ndarray) -> jnp.ndarray:
    """Sym normalization D^{-1/2} A D^{-1/2} with inf -> 0
    (LATTICE/codes/Models.py:17-23)."""
    rowsum = jnp.sum(adj, axis=-1)
    d_inv_sqrt = jnp.power(rowsum, -0.5)
    d_inv_sqrt = jnp.where(jnp.isinf(d_inv_sqrt), 0.0, d_inv_sqrt)
    return d_inv_sqrt[:, None] * adj * d_inv_sqrt[None, :]


def get_dense_laplacian(adj: jnp.ndarray, normalization: str = "none") -> jnp.ndarray:
    """MICRO dense laplacians (MICRO/codes/utility/norm.py:39-54)."""
    if normalization == "sym":
        return compute_normalized_laplacian(adj)
    if normalization == "rw":
        rowsum = jnp.sum(adj, axis=-1)
        d_inv = jnp.power(rowsum, -1.0)
        d_inv = jnp.where(jnp.isinf(d_inv), 0.0, d_inv)
        return d_inv[:, None] * adj
    if normalization == "none":
        return adj
    raise ValueError(f"unknown normalization {normalization}")


def build_knn_sparse_graph(
    sim: jnp.ndarray, topk: int, normalization: str = "sym"
) -> SparseGraph:
    """Sparse kNN graph: per-row top-k -> COO -> degree-normalized weights
    (MICRO/codes/utility/norm.py:8-36).

    Static shapes: exactly n*topk entries, row-sorted by construction.
    Degrees are weighted sums over the *kept* entries (scatter_add semantics).
    """
    n = sim.shape[0]
    topk = min(topk, n)  # k >= n keeps every entry (see build_knn_neighbourhood)
    knn_val, knn_ind = jax.lax.top_k(sim, topk)  # [n, k]
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), topk)
    cols = knn_ind.reshape(-1).astype(jnp.int32)
    vals = knn_val.reshape(-1).astype(jnp.float32)
    deg = jax.ops.segment_sum(vals, rows, num_segments=n)
    if normalization == "sym":
        d = jnp.power(deg, -0.5)
        d = jnp.where(jnp.isinf(d), 0.0, d)
        vals = d[rows] * vals * d[cols]
    elif normalization == "rw":
        d = 1.0 / deg
        d = jnp.where(jnp.isinf(d), 0.0, d)
        vals = d[rows] * vals
    elif normalization != "none":
        raise ValueError(f"unknown normalization {normalization}")
    return SparseGraph(rows=rows, cols=cols, vals=vals, shape=(n, n))
