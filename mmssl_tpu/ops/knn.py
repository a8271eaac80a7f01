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


def mask_sim_padding(sim: jnp.ndarray, n_real: "int | None") -> jnp.ndarray:
    """Make a similarity matrix over geometry-padded rows select exactly the
    unpadded neighbors (parallel/spmd.py row padding): pad COLUMNS are pushed
    below any real cosine (-1e9 < -1) so no real row's top-k ever picks one,
    and pad ROWS are zeroed so their top-k scatters zeros (the pad rows of
    the resulting graph are exact zeros and the downstream laplacian's
    inf->0 guard handles their zero degree).  No-op when n_real is None or
    covers the whole matrix."""
    n = sim.shape[-1]
    if n_real is None or n_real >= n:
        return sim
    real = jnp.arange(n) < n_real
    sim = jnp.where(real[None, :], sim, -1e9)
    return jnp.where(real[:, None], sim, 0.0)


def build_knn_neighbourhood(adj: jnp.ndarray, topk: int, n_real: "int | None" = None) -> jnp.ndarray:
    """Keep top-k entries per row, zero elsewhere
    (LATTICE/codes/Models.py:13-16).  topk is clamped to the catalog size
    (torch.topk would raise just like lax.top_k; k >= n keeps every entry).

    ``n_real``: with geometry-padded rows, restrict selection to the real
    catalog (see mask_sim_padding) so the kept entries — and hence the whole
    graph — match the unpadded computation on the real block."""
    adj = mask_sim_padding(adj, n_real)
    n = adj.shape[-1] if n_real is None else min(n_real, adj.shape[-1])
    knn_val, knn_ind = jax.lax.top_k(adj, min(topk, n))
    out = jnp.zeros_like(adj)
    rows = jnp.arange(adj.shape[0])[:, None]
    return out.at[rows, knn_ind].set(knn_val)


def compute_normalized_laplacian(adj: jnp.ndarray) -> jnp.ndarray:
    """Sym normalization D^{-1/2} A D^{-1/2} with inf -> 0
    (LATTICE/codes/Models.py:17-23).

    The zero-degree guard feeds power() a safe base instead of masking its
    inf output: where(isinf, 0, power(0, -0.5)) fixes only the PRIMAL — the
    VJP still evaluates d/dx x^-0.5 at 0 (inf) against the zero cotangent,
    and 0*inf = NaN poisons every upstream gradient.  Identical values and
    gradients for rowsum > 0 (every real row: self-similarity is always in
    its own top-k); geometry-padded rows (guaranteed rowsum 0) get gradient
    0 instead of NaN."""
    rowsum = jnp.sum(adj, axis=-1)
    nz = rowsum != 0  # only exact zeros guarded: negative degrees still NaN (parity)
    d_inv_sqrt = jnp.where(nz, jnp.power(jnp.where(nz, rowsum, 1.0), -0.5), 0.0)
    return d_inv_sqrt[:, None] * adj * d_inv_sqrt[None, :]


def get_dense_laplacian(adj: jnp.ndarray, normalization: str = "none") -> jnp.ndarray:
    """MICRO dense laplacians (MICRO/codes/utility/norm.py:39-54)."""
    if normalization == "sym":
        return compute_normalized_laplacian(adj)
    if normalization == "rw":
        rowsum = jnp.sum(adj, axis=-1)
        nz = rowsum != 0
        # Safe-base guard: see compute_normalized_laplacian (grad at 0).
        d_inv = jnp.where(nz, 1.0 / jnp.where(nz, rowsum, 1.0), 0.0)
        return d_inv[:, None] * adj
    if normalization == "none":
        return adj
    raise ValueError(f"unknown normalization {normalization}")


def build_knn_sparse_graph(
    sim: jnp.ndarray, topk: int, normalization: str = "sym", n_real: "int | None" = None
) -> SparseGraph:
    """Sparse kNN graph: per-row top-k -> COO -> degree-normalized weights
    (MICRO/codes/utility/norm.py:8-36).

    Static shapes: exactly n*topk entries, row-sorted by construction.
    Degrees are weighted sums over the *kept* entries (scatter_add semantics).

    ``n_real``: geometry-padded selection masking (see mask_sim_padding);
    pad rows contribute value-0 entries, so degrees and SpMM action match
    the unpadded graph on the real block exactly.
    """
    sim = mask_sim_padding(sim, n_real)
    n = sim.shape[0]
    topk = min(topk, n if n_real is None else min(n_real, n))
    knn_val, knn_ind = jax.lax.top_k(sim, topk)  # [n, k]
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), topk)
    cols = knn_ind.reshape(-1).astype(jnp.int32)
    vals = knn_val.reshape(-1).astype(jnp.float32)
    deg = jax.ops.segment_sum(vals, rows, num_segments=n)
    nz = deg != 0
    # Safe-base guard: see compute_normalized_laplacian (grad at 0).
    if normalization == "sym":
        d = jnp.where(nz, jnp.power(jnp.where(nz, deg, 1.0), -0.5), 0.0)
        vals = d[rows] * vals * d[cols]
    elif normalization == "rw":
        d = jnp.where(nz, 1.0 / jnp.where(nz, deg, 1.0), 0.0)
        vals = d[rows] * vals
    elif normalization != "none":
        raise ValueError(f"unknown normalization {normalization}")
    return SparseGraph(rows=rows, cols=cols, vals=vals, shape=(n, n))
