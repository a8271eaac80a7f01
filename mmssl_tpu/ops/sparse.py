"""Sparse graph containers and SpMM for TPU.

The reference leans on cuSPARSE through ``torch.sparse.mm`` for every graph
propagation (``MMSSL/Models.py:69-73``, ``LATTICE/codes/Models.py:110,129``)
and on scipy for host-side normalization (``MMSSL/main.py:89-103``).  TPUs
have no sparse unit, so the design here is:

  - host-side: scipy-based normalizers that bit-match the reference math,
  - device-side: a static-shape padded COO container (``SparseGraph``) whose
    SpMM is an XLA gather + ``segment_sum`` (MXU-free but bandwidth-friendly
    at these graph sizes, <= ~600k nnz x 64 dims), with a Pallas blocked
    kernel as the optimized path (``mmssl_tpu/ops/spmm_pallas.py``),
  - fully jittable *device-side* renormalization for graphs that are rebuilt
    during training (the MMSSL densified adjacency, ``MMSSL/main.py:378-405``),
    so the rebuild never leaves HBM (the reference round-trips GPU -> python
    lists -> scipy -> GPU every T batches).

Padding convention: entries beyond ``nnz`` carry ``row == n_rows`` (dropped by
``segment_sum``) and ``val == 0``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


# ---------------------------------------------------------------------------
# Host-side normalizers (exact reference math)
# ---------------------------------------------------------------------------

def csr_norm(mat: sp.spmatrix, mean_flag: bool = False) -> sp.csr_matrix:
    """Bipartite normalizer, bit-matching ``MMSSL/main.py:89-103``.

    mean_flag=False: D_r^{-1/2} A D_c^{-1/2};  mean_flag=True: D_r^{-1/2} A.
    The +1e-8 sits under the -0.5 power exactly as in the reference, so
    zero-degree rows produce huge (not inf) scale factors times zero entries.
    """
    mat = sp.csr_matrix(mat)
    rowsum = np.asarray(mat.sum(1)).flatten()
    r_inv = np.power(rowsum + 1e-8, -0.5)
    r_inv[np.isinf(r_inv)] = 0.0
    out = sp.diags(r_inv) @ mat
    if not mean_flag:
        colsum = np.asarray(mat.sum(0)).flatten()
        c_inv = np.power(colsum + 1e-8, -0.5)
        c_inv[np.isinf(c_inv)] = 0.0
        out = out @ sp.diags(c_inv)
    return sp.csr_matrix(out)


def joint_adj(R: sp.spmatrix, n_users: int, n_items: int) -> Tuple[sp.csr_matrix, sp.csr_matrix, sp.csr_matrix]:
    """(adj, norm_adj, mean_adj) on the joint (n_u+n_i)^2 graph.

    Matches ``create_adj_mat`` (MICRO/codes/utility/load_data.py:105-150):
    A = [[0, R], [R^T, 0]]; norm_adj = D^{-1}(A + I); mean_adj = D^{-1}A
    with inf -> 0 on empty rows.
    """
    R = sp.csr_matrix(R)
    n = n_users + n_items
    adj = sp.bmat(
        [[None, R], [R.T, None]], format="csr", dtype=np.float32
    )
    adj.resize((n, n))

    def _row_norm(a: sp.spmatrix) -> sp.csr_matrix:
        rowsum = np.asarray(a.sum(1)).flatten()
        with np.errstate(divide="ignore"):
            d_inv = np.power(rowsum, -1.0)
        d_inv[np.isinf(d_inv)] = 0.0
        return sp.csr_matrix(sp.diags(d_inv) @ a)

    norm_adj = _row_norm(adj + sp.eye(n, dtype=np.float32, format="csr"))
    mean_adj = _row_norm(adj)
    return adj, norm_adj, mean_adj


def get_adj_mat(path: str, R: sp.spmatrix, n_users: int, n_items: int):
    """Cached joint adjacency, reference behavior (``get_adj_mat``,
    MICRO/codes/utility/load_data.py:90-103): load ``s_adj_mat.npz`` /
    ``s_norm_adj_mat.npz`` / ``s_mean_adj_mat.npz`` from the dataset
    directory if present, else build via :func:`joint_adj` and save."""
    import os

    names = ("s_adj_mat.npz", "s_norm_adj_mat.npz", "s_mean_adj_mat.npz")
    paths = [os.path.join(path, n) for n in names]
    if all(os.path.exists(p) for p in paths):
        return tuple(sp.load_npz(p) for p in paths)
    mats = joint_adj(R, n_users, n_items)
    try:
        for p, m in zip(paths, mats):
            sp.save_npz(p, sp.csr_matrix(m))
    except OSError:
        pass  # read-only dataset dir: recompute next time
    return mats


# ---------------------------------------------------------------------------
# Device-side container
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class SparseGraph:
    """Static-shape padded COO sparse matrix resident on device.

    Sorted by row (enables ``indices_are_sorted`` in segment_sum and row-block
    partitioning for the Pallas kernel).  ``shape`` is static metadata.
    """

    rows: jnp.ndarray  # int32 [capacity], padding = n_rows
    cols: jnp.ndarray  # int32 [capacity], padding = 0
    vals: jnp.ndarray  # float32 [capacity], padding = 0
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        rows, cols, vals = leaves
        return cls(rows=rows, cols=cols, vals=vals, shape=shape)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_scipy(cls, mat: sp.spmatrix, capacity: Optional[int] = None, pad_multiple: int = 128) -> "SparseGraph":
        coo = sp.coo_matrix(mat)
        order = np.argsort(coo.row, kind="stable")
        rows = coo.row[order].astype(np.int32)
        cols = coo.col[order].astype(np.int32)
        vals = coo.data[order].astype(np.float32)
        nnz = rows.shape[0]
        cap = capacity if capacity is not None else _round_up(max(nnz, 1), pad_multiple)
        if cap < nnz:
            raise ValueError(f"capacity {cap} < nnz {nnz}")
        pr = np.full(cap, mat.shape[0], dtype=np.int32)
        pc = np.zeros(cap, dtype=np.int32)
        pv = np.zeros(cap, dtype=np.float32)
        pr[:nnz], pc[:nnz], pv[:nnz] = rows, cols, vals
        return cls(rows=jnp.asarray(pr), cols=jnp.asarray(pc), vals=jnp.asarray(pv), shape=tuple(mat.shape))

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]

    # -- compute ------------------------------------------------------------

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x with A this [n_rows, n_cols] sparse matrix, x [n_cols, d]."""
        return coo_spmm(self.rows, self.cols, self.vals, x, self.n_rows)

    def transpose_graph(self) -> "SparseGraph":
        """Materialize A^T as a new row-sorted SparseGraph (host-free).

        Padding entries (row == n_rows) sort to the end because their column
        key is remapped to n_cols.
        """
        is_pad = self.rows == self.n_rows
        new_rows = jnp.where(is_pad, self.n_cols, self.cols)
        order = jnp.argsort(new_rows)
        return SparseGraph(
            rows=new_rows[order],
            cols=jnp.where(is_pad, 0, self.rows)[order],
            vals=self.vals[order],
            shape=(self.n_cols, self.n_rows),
        )


@partial(jax.jit, static_argnames=("n_rows",))
def coo_spmm(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """out[r, :] = sum_k vals[k] * x[cols[k], :] for rows[k] == r.

    Differentiable in ``vals`` and ``x`` (XLA transposes the gather/scatter
    pair for the VJP).  Padding rows == n_rows are dropped by segment_sum.
    Rows need not be sorted (device-rebuilt graphs are unsorted COO).
    """
    gathered = x[cols] * vals[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=n_rows)


def device_row_norm_inv_sqrt(
    rows: jnp.ndarray, cols: jnp.ndarray, valid: jnp.ndarray, shape: Tuple[int, int]
) -> SparseGraph:
    """Build a D_r^{-1/2} A normalized graph from raw COO indices on device.

    Jittable equivalent of ``csr_norm(mean_flag=True)`` applied to a binary
    COO with duplicates (duplicates sum, as scipy csr_matrix construction
    does): degree counts duplicates, and each duplicate entry carries the
    same normalized value.  Used for the MMSSL densified adjacency rebuild
    (``MMSSL/main.py:378-397``) without any host round-trip.

    ``valid`` masks live entries; invalid entries get row == shape[0], val 0.
    """
    n_rows = shape[0]
    ones = valid.astype(jnp.float32)
    safe_rows = jnp.where(valid, rows, n_rows)
    deg = jax.ops.segment_sum(ones, safe_rows, num_segments=n_rows)
    scale = jnp.power(deg + 1e-8, -0.5)
    vals = jnp.where(valid, scale[jnp.clip(rows, 0, n_rows - 1)], 0.0)
    return SparseGraph(
        rows=safe_rows.astype(jnp.int32),
        cols=jnp.where(valid, cols, 0).astype(jnp.int32),
        vals=vals.astype(jnp.float32),
        shape=shape,
    )


def scipy_to_dense(mat: sp.spmatrix) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sp.csr_matrix(mat).todense(), dtype=np.float32))


def dot_t_left(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a^T @ b (f32 accumulation) WITHOUT materializing a^T: dot_general
    contracting dim0 with dim0.  In ISOLATION an explicit ``transpose ->
    dot`` is not folded (0.712 vs 0.585 ms on a [7050, 7050] bf16 @
    [7050, 64] VJP product, round 4); inside the full fused train programs
    the change measured NEUTRAL (flagship 9.31 vs 9.35, zoo within noise) —
    XLA's fusion pipeline handles the transposes there.  Kept as the
    canonical form for custom-VJP transposed products: never slower, and
    robust to fusion-context changes."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def dot_t_right(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b^T without materializing b^T (see dot_t_left)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# Dense propagation mode (MXU path)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DenseGraph:
    """Materialized adjacency for MXU-matmul propagation.

    TPU profile of the MMSSL step shows the COO ``segment_sum`` scatters
    dominating device time (~1.2 ms each at Amazon-Baby scale, dozens per
    step): irregular scatters serialize on TPU, while a dense [n_rows,
    n_cols] bf16 matmul of the same graph reads ~274 MB and rides the MXU in
    ~0.35 ms.  At <=0.1% sparsity the redundant FLOPs are free relative to
    scatter latency.  bf16 storage halves HBM traffic; accumulation stays
    f32 (``preferred_element_type``).  Enabled via
    ``ModelConfig.graph_impl='dense'`` (COO stays the parity default).

    int8 mode (``ModelConfig.graph_dtype='int8'``): the live normalized
    graphs all have ROW-CONSTANT values (csr_norm(mean_flag=True) is
    D^{-1/2}A, MMSSL/main.py:66-67; the joint norm_adj is D^{-1}(A+I)) —
    so the matrix factors exactly into integer entry counts times a per-row
    scale.  ``mat`` then stores the counts in int8 (halving the graph's HBM
    read bytes, the dominant traffic of the propagation passes) and
    ``row_scale`` carries the f32 per-row factor applied AFTER the f32-
    accumulated matmul — numerically tighter than bf16 value storage (the
    scale is never rounded to bf16).
    """

    mat: jnp.ndarray  # [n_rows, n_cols]: bf16/f32 values, or int8 counts
    row_scale: Optional[jnp.ndarray] = None  # f32 [n_rows] (int8 mode)

    def tree_flatten(self):
        return (self.mat, self.row_scale), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(mat=leaves[0], row_scale=leaves[1])

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.mat.shape)

    @property
    def n_rows(self) -> int:
        return self.mat.shape[0]

    @property
    def n_cols(self) -> int:
        return self.mat.shape[1]

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.row_scale is None:
            return _dense_spmm(self.mat, x)
        return _scaled_dense_spmm(self.mat, self.row_scale, x)


@jax.custom_vjp
def _dense_spmm(mat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(mat, x.astype(mat.dtype), preferred_element_type=jnp.float32)


def _dense_spmm_fwd(mat, x):
    return _dense_spmm(mat, x), (mat, x)


def _dense_spmm_bwd(res, g):
    # Cast the incoming cotangent to the graph's storage dtype before the
    # transposed product: without this the VJP matmul promotes to f32 —
    # doubling both the MXU time and the HBM bytes of the adjacency read
    # (the graph is the largest operand in the step).  f32 accumulation as
    # in the forward; a bf16 graph therefore gives bf16-rounded input
    # gradients, the standard mixed-precision contract.  The dmat cotangent
    # is exact but DCE'd by XLA in every live path (graphs are data, never
    # differentiated).
    mat, x = res
    gc = g.astype(mat.dtype)
    # Transpose-free contraction: an explicit mat.T is NOT folded into the
    # dot by XLA and costs ~20% on the VJP product (see common.dot_t_left).
    gx = dot_t_left(mat, gc).astype(x.dtype)
    dmat = dot_t_right(gc, x.astype(mat.dtype))
    return dmat, gx


_dense_spmm.defvjp(_dense_spmm_fwd, _dense_spmm_bwd)


@jax.custom_vjp
def _scaled_dense_spmm(mat: jnp.ndarray, scale: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = diag(scale) @ (mat @ x), mat holding integer entry counts (int8).

    The int8->bf16 operand convert fuses into the dot's VMEM read, so the
    HBM bytes of the graph read halve vs bf16 value storage; accumulation is
    f32 and the f32 row scale applies after."""
    cm = mat.astype(jnp.bfloat16) if mat.dtype != jnp.float32 else mat
    y = jnp.matmul(cm, x.astype(cm.dtype), preferred_element_type=jnp.float32)
    return y * scale[:, None]


def _scaled_dense_spmm_fwd(mat, scale, x):
    return _scaled_dense_spmm(mat, scale, x), (mat, scale, x)


def _scaled_dense_spmm_bwd(res, g):
    # d/dx [diag(s) C x] = C^T (s o g), with the cotangent cast to the matmul
    # compute dtype (same mixed-precision contract as _dense_spmm_bwd).  The
    # dmat/dscale cotangents are exact but DCE'd in every live path (graphs
    # are data, never differentiated).
    mat, scale, x = res
    cm = mat.astype(jnp.bfloat16) if mat.dtype != jnp.float32 else mat
    sg = (g * scale[:, None]).astype(cm.dtype)
    # Transpose-free contraction (see common.dot_t_left).
    gx = dot_t_left(cm, sg).astype(x.dtype)
    cx = jnp.matmul(cm, x.astype(cm.dtype), preferred_element_type=jnp.float32)
    dscale = jnp.sum(cx * g, axis=1)
    dmat = dot_t_right(sg, x.astype(cm.dtype)).astype(mat.dtype)
    return dmat, dscale, gx


_scaled_dense_spmm.defvjp(_scaled_dense_spmm_fwd, _scaled_dense_spmm_bwd)


@jax.tree_util.register_pytree_node_class
@dataclass
class BipartiteJointGraph:
    """The joint normalized adjacency ``D^-1 (A + I)`` with
    ``A = [[0, R], [R^T, 0]]`` (joint_adj / MICRO create_adj_mat) kept in its
    bipartite blocks instead of materialized (n_u+n_i)^2.

    The dense joint matrix is 73% structural zeros (the two diagonal blocks):
    at Amazon-Baby scale it reads 702 MB int8 per propagation pass while the
    content is R twice (2 x 137 MB).  ``spmm`` computes the identical matrix
    action blockwise —

      u' = (R  x_i + x_u) / (deg_u + 1)
      i' = (R^T x_u + x_i) / (deg_i + 1)

    — exact because norm_adj's rows are row-constant (value 1/(deg+1) at
    every entry incl. the self-loop), so the blocks factor into integer
    interaction counts x an f32 row scale exactly like DenseGraph's int8
    mode.  R^T is stored explicitly so neither direction pays a transposed
    HBM read.  2.56x fewer adjacency bytes and no zero-block FLOPs vs the
    dense joint; same custom-VJP mixed-precision contract
    (_scaled_dense_spmm).
    """

    r: jnp.ndarray  # [n_users, n_items] interaction counts (int8/bf16/f32)
    rt: jnp.ndarray  # [n_items, n_users]
    inv_deg_u: jnp.ndarray  # f32 [n_users] = 1 / (deg_u + 1)
    inv_deg_i: jnp.ndarray  # f32 [n_items]

    def tree_flatten(self):
        return (self.r, self.rt, self.inv_deg_u, self.inv_deg_i), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def shape(self) -> Tuple[int, int]:
        n = self.r.shape[0] + self.r.shape[1]
        return (n, n)

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        n_u = self.r.shape[0]
        xu, xi = x[:n_u], x[n_u:]
        u = _scaled_dense_spmm(self.r, self.inv_deg_u, xi) + self.inv_deg_u[:, None] * xu
        i = _scaled_dense_spmm(self.rt, self.inv_deg_i, xu) + self.inv_deg_i[:, None] * xi
        return jnp.concatenate([u, i], axis=0)


@jax.tree_util.register_pytree_node_class
@dataclass
class BitBipartiteJointGraph:
    """BipartiteJointGraph with the interaction blocks stored as BITMAPS
    (``ModelConfig.graph_dtype='bit'``; VERDICT r3 #9).

    The reference's interactions are binary, so the int8 entry-count blocks
    carry 8x more HBM bytes than their information content.  Eight adjacent
    column entries pack into one uint8; the unpack inside the kernel is a
    contiguous broadcast-shift-mask ([n, m/8, 1] -> [n, m/8, 8] -> reshape,
    layout-preserving, so XLA fuses it into the dot's operand read).
    Measured at the LightGCN propagation shape ([19445, 7050] x [7050, 64]):
    0.972 ms vs 1.097 ms int8 (-11%) with 17 MB vs 137 MB of graph reads.
    Two negative variants recorded in docs/performance.md: jnp.int4 proper
    (the axon relay cannot pass S4 jit arguments at all) and strided 4-bit
    packing (the lo/hi interleave forces a relayout: 6.5 ms, 6x WORSE).

    Transposed reads never happen: the joint action needs R for the user
    block and R^T for the item block in the FORWARD, and its VJP needs them
    swapped —

      gx_u = s_u o g_u + R   (s_i o g_i)
      gx_i = s_i o g_i + R^T (s_u o g_u)

    — so storing both packed blocks (rp, rtp) serves forward AND backward
    with contiguous reads (the custom VJP below routes each product to the
    matching block).  Column axes pad to a multiple of 8 with zero bits;
    ``spmm`` pads/slices x accordingly (static shapes, sub-MB copies)."""

    rp: jnp.ndarray  # uint8 [n_users, ceil8(n_items) / 8] packed R
    rtp: jnp.ndarray  # uint8 [n_items, ceil8(n_users) / 8] packed R^T
    inv_deg_u: jnp.ndarray  # f32 [n_users] = 1 / (deg_u + 1)
    inv_deg_i: jnp.ndarray  # f32 [n_items]

    def tree_flatten(self):
        return (self.rp, self.rtp, self.inv_deg_u, self.inv_deg_i), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def shape(self) -> Tuple[int, int]:
        n = self.rp.shape[0] + self.rtp.shape[0]
        return (n, n)

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        n_u, n_i = self.rp.shape[0], self.rtp.shape[0]
        xu, xi = x[:n_u], x[n_u:]
        u, i = _bit_joint_spmm(self.rp, self.rtp, self.inv_deg_u, self.inv_deg_i, xu, xi)
        return jnp.concatenate([u, i], axis=0)


def _unpack_bits(p: jnp.ndarray, n_cols: int, dtype) -> jnp.ndarray:
    """uint8 [n, m/8] -> [n, n_cols] matrix of 0/1 in ``dtype``; adjacent-
    column grouping keeps the reshape layout-contiguous (no relayout)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = ((p[:, :, None] >> shifts) & jnp.uint8(1)).astype(dtype)
    return bits.reshape(p.shape[0], -1)[:, :n_cols]


def _pad8_rows(x: jnp.ndarray, packed_cols: int) -> jnp.ndarray:
    """Zero-pad x's row count to the unpacked width (8 * packed_cols)."""
    pad = 8 * packed_cols - x.shape[0]
    return x if pad == 0 else jnp.pad(x, ((0, pad), (0, 0)))


@jax.custom_vjp
def _bit_joint_spmm(rp, rtp, s_u, s_i, xu, xi):
    cu = _unpack_bits(rp, 8 * rp.shape[1], jnp.bfloat16)
    ci = _unpack_bits(rtp, 8 * rtp.shape[1], jnp.bfloat16)
    u = jnp.matmul(cu, _pad8_rows(xi.astype(jnp.bfloat16), rp.shape[1]),
                   preferred_element_type=jnp.float32) * s_u[:, None]
    u = u + s_u[:, None] * xu
    i = jnp.matmul(ci, _pad8_rows(xu.astype(jnp.bfloat16), rtp.shape[1]),
                   preferred_element_type=jnp.float32) * s_i[:, None]
    i = i + s_i[:, None] * xi
    return u, i


def _bit_joint_spmm_fwd(rp, rtp, s_u, s_i, xu, xi):
    return _bit_joint_spmm(rp, rtp, s_u, s_i, xu, xi), (rp, rtp, s_u, s_i, xu, xi)


def _bit_joint_spmm_bwd(res, g):
    # Same mixed-precision contract as _scaled_dense_spmm_bwd; each
    # transposed product rides the OTHER stored block, so every graph read
    # is contiguous packed uint8.  dgraph/dscale cotangents are DCE'd in
    # every live path (graphs are data, never differentiated).
    rp, rtp, s_u, s_i, xu, xi = res
    gu, gi = g
    cu = _unpack_bits(rp, 8 * rp.shape[1], jnp.bfloat16)
    ci = _unpack_bits(rtp, 8 * rtp.shape[1], jnp.bfloat16)
    sgu = (gu * s_u[:, None]).astype(jnp.bfloat16)  # [n_u, d]
    sgi = (gi * s_i[:, None]).astype(jnp.bfloat16)  # [n_i, d]
    gxu = jnp.matmul(cu, _pad8_rows(sgi, rp.shape[1]),
                     preferred_element_type=jnp.float32)[: xu.shape[0]]
    gxu = (gxu + s_u[:, None] * gu).astype(xu.dtype)
    gxi = jnp.matmul(ci, _pad8_rows(sgu, rtp.shape[1]),
                     preferred_element_type=jnp.float32)[: xi.shape[0]]
    gxi = (gxi + s_i[:, None] * gi).astype(xi.dtype)
    ds_u = jnp.sum((jnp.matmul(cu, _pad8_rows(xi.astype(jnp.bfloat16), rp.shape[1]),
                               preferred_element_type=jnp.float32) + xu) * gu, axis=1)
    ds_i = jnp.sum((jnp.matmul(ci, _pad8_rows(xu.astype(jnp.bfloat16), rtp.shape[1]),
                               preferred_element_type=jnp.float32) + xi) * gi, axis=1)
    return None, None, ds_u, ds_i, gxu, gxi


_bit_joint_spmm.defvjp(_bit_joint_spmm_fwd, _bit_joint_spmm_bwd)


def _pack_bits_host(dense01: np.ndarray) -> np.ndarray:
    """Binary f32/int [n, m] -> uint8 [n, ceil8(m)/8], adjacent-column
    grouping (bit b of byte j = column 8j + b)."""
    n, m = dense01.shape
    m8 = ((m + 7) // 8) * 8
    pad = np.zeros((n, m8), dtype=np.uint8)
    pad[:, :m] = dense01.astype(np.uint8)
    return np.packbits(pad.reshape(n, m8 // 8, 8), axis=-1, bitorder="little").reshape(n, m8 // 8)


def bit_joint_from_counts(
    r: np.ndarray, rt: np.ndarray, inv_deg_u: np.ndarray, inv_deg_i: np.ndarray
) -> BitBipartiteJointGraph:
    """Build the bitmap variant from the int entry-count blocks.  Raises for
    non-binary counts (duplicate interactions): the bitmap represents 0/1
    exactly; use graph_dtype='int8' for multigraph data."""
    if r.max(initial=0) > 1 or rt.max(initial=0) > 1:
        raise ValueError(
            "graph_dtype='bit' needs binary interaction counts; this dataset "
            "has duplicate (user, item) entries — use graph_dtype='int8'"
        )
    return BitBipartiteJointGraph(
        rp=jnp.asarray(_pack_bits_host(np.asarray(r))),
        rtp=jnp.asarray(_pack_bits_host(np.asarray(rt))),
        inv_deg_u=jnp.asarray(np.asarray(inv_deg_u, np.float32)),
        inv_deg_i=jnp.asarray(np.asarray(inv_deg_i, np.float32)),
    )


def joint_bipartite_graph(R: sp.spmatrix, dtype=jnp.int8) -> BipartiteJointGraph:
    """Build :class:`BipartiteJointGraph` from the user x item interaction
    matrix (same input as :func:`joint_adj`; entries must be integral —
    they are binary in the reference data contract)."""
    R = sp.csr_matrix(R)
    deg_u = np.asarray(R.sum(1)).ravel().astype(np.float32)
    deg_i = np.asarray(R.sum(0)).ravel().astype(np.float32)
    dense = np.asarray(R.todense(), dtype=np.float32)
    if dtype == jnp.int8:
        assert np.all(dense == np.round(dense)) and dense.max(initial=0) < 128, (
            "int8 joint blocks need integral interaction counts < 128"
        )
        dense = dense.astype(np.int8)
    else:
        dense = dense.astype(dtype)
    return BipartiteJointGraph(
        r=jnp.asarray(dense),
        rt=jnp.asarray(dense.T.copy()),
        inv_deg_u=jnp.asarray(1.0 / (deg_u + 1.0)),
        inv_deg_i=jnp.asarray(1.0 / (deg_i + 1.0)),
    )


def joint_bipartite_from_norm_adj(
    norm_adj: sp.spmatrix, n_users: int, n_items: int, dtype=jnp.int8
) -> BipartiteJointGraph:
    """Build :class:`BipartiteJointGraph` from a (possibly disk-cached) joint
    ``norm_adj = D^-1 (A + I)`` — the ``s_norm_adj_mat.npz`` the reference's
    ``get_adj_mat`` caches next to the data (MICRO/codes/utility/load_data.py:
    99-112).  Dense mode thereby honors the exact same cache the COO path
    trusts, instead of silently rebuilding from R (they could diverge if a
    dataset dir ships a foreign cache).

    Requires the reference factorization: diagonal blocks diagonal (the
    self-loop scaled by the row factor) and row-constant off-diagonal values.
    Raises ValueError for caches not of that form (use graph_impl='coo' for
    arbitrary normalized adjacencies)."""
    n = n_users + n_items
    norm_adj = sp.csr_matrix(norm_adj)
    if norm_adj.shape != (n, n):
        raise ValueError(f"norm_adj shape {norm_adj.shape} != ({n}, {n})")
    uu = sp.csr_matrix(norm_adj[:n_users, :n_users])
    ii = sp.csr_matrix(norm_adj[n_users:, n_users:])
    if (uu - sp.diags(uu.diagonal(), shape=uu.shape)).count_nonzero() or (
        ii - sp.diags(ii.diagonal(), shape=ii.shape)
    ).count_nonzero():
        raise ValueError(
            "cached norm_adj is not of the reference D^-1(A+I) form "
            "(non-diagonal self blocks); use graph_impl='coo'"
        )
    inv_deg_u = uu.diagonal().astype(np.float32)  # 1 / (deg_u + 1)
    inv_deg_i = ii.diagonal().astype(np.float32)

    def _counts(block: sp.spmatrix, inv_scale: np.ndarray, what: str) -> np.ndarray:
        # entries are count * inv_scale[row]; recover the integer counts
        scale = np.where(inv_scale > 0, 1.0 / inv_scale, 0.0)
        dense = np.asarray((sp.diags(scale) @ sp.csr_matrix(block)).todense(), np.float32)
        if not np.allclose(dense, np.round(dense), atol=1e-3):
            raise ValueError(
                f"cached norm_adj {what} block is not row-constant; use graph_impl='coo'"
            )
        return np.round(dense).astype(np.float32)

    r = _counts(norm_adj[:n_users, n_users:], inv_deg_u, "user-item")
    rt = _counts(norm_adj[n_users:, :n_users], inv_deg_i, "item-user")
    if dtype == "bit":
        return bit_joint_from_counts(r, rt, inv_deg_u, inv_deg_i)
    if dtype == jnp.int8:
        if max(r.max(initial=0), rt.max(initial=0)) >= 128:
            raise ValueError("int8 joint blocks need interaction counts < 128")
        r, rt = r.astype(np.int8), rt.astype(np.int8)
    else:
        r, rt = r.astype(dtype), rt.astype(dtype)
    return BipartiteJointGraph(
        r=jnp.asarray(r),
        rt=jnp.asarray(rt),
        inv_deg_u=jnp.asarray(inv_deg_u),
        inv_deg_i=jnp.asarray(inv_deg_i),
    )


def dense_from_coo(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    shape: Tuple[int, int],
    dtype=jnp.bfloat16,
) -> DenseGraph:
    """Scatter a padded COO into a DenseGraph (duplicates sum, padding rows
    == n_rows dropped).  The f32 scatter-add happens once per build/rebuild
    and is amortized over every subsequent matmul.

    ``dtype=jnp.int8`` requires row-constant values (val = scale[row] per
    entry, true of every live normalized graph): entry COUNTS are stored in
    int8 and the per-row scale in f32 (see DenseGraph docstring)."""
    if dtype == jnp.int8:
        live = (vals != 0.0) & (rows < shape[0])
        ones = live.astype(jnp.int32)
        counts = jnp.zeros(shape, jnp.int32).at[rows, cols].add(ones, mode="drop")
        scale = jax.ops.segment_max(
            jnp.where(live, vals, -jnp.inf), rows, num_segments=shape[0]
        )
        scale = jnp.where(jnp.isfinite(scale), scale, 0.0).astype(jnp.float32)
        return DenseGraph(mat=counts.astype(jnp.int8), row_scale=scale)
    mat = jnp.zeros(shape, jnp.float32).at[rows, cols].add(vals, mode="drop")
    return DenseGraph(mat=mat.astype(dtype))


def sparse_to_dense_graph(g: SparseGraph, dtype=jnp.bfloat16) -> DenseGraph:
    return dense_from_coo(g.rows, g.cols, g.vals, g.shape, dtype)


def device_row_norm_inv_sqrt_dense(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    valid: jnp.ndarray,
    shape: Tuple[int, int],
    dtype=jnp.bfloat16,
) -> DenseGraph:
    """Dense-mode equivalent of :func:`device_row_norm_inv_sqrt` (same
    normalization math; one scatter per rebuild instead of one per spmm)."""
    n_rows = shape[0]
    ones = valid.astype(jnp.float32)
    safe_rows = jnp.where(valid, rows, n_rows)
    deg = jax.ops.segment_sum(ones, safe_rows, num_segments=n_rows)
    scale = jnp.power(deg + 1e-8, -0.5)
    vals = jnp.where(valid, scale[jnp.clip(rows, 0, n_rows - 1)], 0.0)
    return dense_from_coo(safe_rows, jnp.where(valid, cols, 0), vals, shape, dtype)
