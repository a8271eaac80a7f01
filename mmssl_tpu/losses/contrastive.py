"""Cross-view InfoNCE contrastive loss.

Contract: ``batched_contrastive_loss`` — two reference variants with the same
formula, differing only in a +1e-8 inside the log:

  - MMSSL live version (``MMSSL/main.py:218-249``): eps = 1e-8
  - MICRO / Models.py version (``MICRO/codes/Models.py:74-93``): eps = 0

For each row i over N nodes:

  loss_i = -log( exp(s12[i,i]/tau)
                 / (sum_j exp(s11[i,j]/tau) + sum_j exp(s12[i,j]/tau)
                    - exp(s11[i,i]/tau)) + eps )

with s## cosine similarities of L2-normalized inputs.  The reference chunks
rows x cols on host python loops purely to bound GPU memory; numerics are the
plain full-matrix formula.  Here rows are chunked inside one jit program (a
python-unrolled loop over static row blocks, each block a [chunk, N] MXU
matmul), keeping peak memory at chunk x N while XLA fuses exp/sums.  exp is
safe un-shifted: |sim/tau| <= 1/tau (cosine in [-1, 1]), matching reference
numerics exactly.

``axis_name`` enables the sharded form: each device holds a column shard of
z1/z2; denominators are psum'd across the axis so the result equals the
unsharded computation (the catalog axis is the "sequence" axis of this
workload, SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mmssl_tpu.models.common import l2_normalize, matmul


def _chunk_bounds(n: int, chunk: int):
    return [(s, min(s + chunk, n)) for s in range(0, n, chunk)]


def infonce(
    z1: jnp.ndarray,  # [N, d]
    z2: jnp.ndarray,  # [N, d]
    tau: float,
    eps: float = 1e-8,
    row_chunk: int = 4096,
    dtype=None,
    n_real: "int | None" = None,
) -> jnp.ndarray:
    """Mean InfoNCE loss between views z1 (anchor) and z2.

    ``dtype`` (ModelConfig.compute_dtype) runs the two [N, N] similarity
    GEMMs with low-precision inputs and f32 accumulation; exp/log/sum math
    stays f32.  For full-catalog calls (MICRO: N = n_items) wrap the call in
    ``jax.checkpoint`` — the default VJP stores both [N, N] exp matrices
    (2·N² f32, ~400 MB at Baby scale) while rematerializing costs two cheap
    [N, d] GEMMs.

    ``n_real``: with geometry-padded rows (parallel/spmd.py), compute the
    loss of the FIRST n_real rows exactly as the unpadded call would: pad
    columns are masked out of every denominator (even zero pad rows would
    contribute exp(0)=1 each) and the mean runs over n_real.  Pad-row
    losses are replaced by a smooth 0 (their raw denominator is degenerate
    and would emit NaN through the log); the replacement is constant so no
    gradient flows to or through pad rows."""
    n = z1.shape[0]
    nr = n if n_real is None else min(n_real, n)
    a = l2_normalize(z1, axis=1)
    b = l2_normalize(z2, axis=1)
    col_real = None if nr == n else (jnp.arange(n) < nr)
    losses = []
    for s, e in _chunk_bounds(n, row_chunk):
        ra = a[s:e]  # [c, d]
        s11 = jnp.exp(matmul(ra, a.T, dtype) / tau)  # [c, N]
        s12 = jnp.exp(matmul(ra, b.T, dtype) / tau)
        if col_real is not None:
            s11 = s11 * col_real[None, :]
            s12 = s12 * col_real[None, :]
        # Diagonal entries as f32 row dots, NOT a matrix gather: advanced
        # indexing into the [c, N] exp matrices lowers to flat-layout
        # gather + (in the VJP) scatter pairs that relayout the whole
        # matrix — measured ~6 ms/step on MICRO's full-catalog call.
        # Same values up to matmul-vs-rowdot accumulation rounding.
        between_diag = jnp.exp(jnp.sum(ra * b[s:e], axis=1) / tau)
        refl_diag = jnp.exp(jnp.sum(ra * ra, axis=1) / tau)
        denom = jnp.sum(s11, axis=1) + jnp.sum(s12, axis=1) - refl_diag
        if col_real is not None:
            row_real = col_real[s:e]
            between_diag = jnp.where(row_real, between_diag, 1.0)
            denom = jnp.where(row_real, denom, 1.0)
            losses.append(-jnp.log(between_diag / denom + eps) * row_real)
        else:
            losses.append(-jnp.log(between_diag / denom + eps))
    all_losses = jnp.concatenate(losses)
    return jnp.mean(all_losses) if col_real is None else jnp.sum(all_losses) / nr


def infonce_sharded(
    z1_local: jnp.ndarray,  # [N_local, d] row shard on this device
    z2_local: jnp.ndarray,
    tau: float,
    eps: float,
    axis_name: str,
) -> jnp.ndarray:
    """Sharded InfoNCE inside shard_map: rows of z1/z2 are sharded over
    ``axis_name``; each device all-gathers the column side and psums the
    final mean so every device returns the global loss.

    Equivalent to ``infonce`` on the concatenated arrays (denominators are
    global sums; the diagonal terms live on the owning device).

    STATUS: this is the shard_map REFERENCE implementation of the §5.7
    catalog-axis collective pattern (all-gather columns, psum denominators),
    pinned by tests/test_losses.py.  The production SPMD train step does NOT
    call it: the XLA partitioner over the sharding-annotated ``infonce`` call
    emits the same all-gather/psum schedule from the (data, model) operand
    shardings, and hand-placing the collectives measured no win over letting
    the partitioner fuse them with the surrounding step (docs/performance.md,
    "Multi-chip scaling" — the ring-vs-all_gather argument).  Keep it as the
    executable spec for the pattern; route through it only if a future
    profile shows the partitioner mis-scheduling these collectives.
    """
    a_local = l2_normalize(z1_local, axis=1)
    b_local = l2_normalize(z2_local, axis=1)
    # Column side: full matrices via all-gather (d is small, 64).
    a_full = jax.lax.all_gather(a_local, axis_name, axis=0, tiled=True)
    b_full = jax.lax.all_gather(b_local, axis_name, axis=0, tiled=True)
    n_local = a_local.shape[0]
    s11 = jnp.exp((a_local @ a_full.T) / tau)
    s12 = jnp.exp((a_local @ b_full.T) / tau)
    # Diagonal entries as row dots (see infonce: a matrix gather lowers to
    # flat-layout gather/scatter pairs in the VJP).
    between_diag = jnp.exp(jnp.sum(a_local * b_local, axis=1) / tau)
    refl_diag = jnp.exp(jnp.sum(a_local * a_local, axis=1) / tau)
    denom = jnp.sum(s11, axis=1) + jnp.sum(s12, axis=1) - refl_diag
    local_sum = jnp.sum(-jnp.log(between_diag / denom + eps))
    total = jax.lax.psum(local_sum, axis_name)
    n_global = n_local * jax.lax.axis_size(axis_name)
    return total / n_global
