"""Sparse ops: normalizers vs reference math, SpMM vs dense, device renorm."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from mmssl_tpu.ops.sparse import (
    SparseGraph,
    coo_spmm,
    csr_norm,
    device_row_norm_inv_sqrt,
    joint_adj,
)


def _rand_csr(rng, n, m, density=0.2):
    mask = rng.random((n, m)) < density
    return sp.csr_matrix(mask.astype(np.float32))


def test_csr_norm_reference_math():
    # Reference formula (MMSSL/main.py:89-103): D_r^{-1/2} A D_c^{-1/2}
    # with +1e-8 under the -0.5 power.
    rng = np.random.default_rng(0)
    A = _rand_csr(rng, 7, 5)
    dense = np.asarray(A.todense())
    r = np.power(dense.sum(1) + 1e-8, -0.5)
    c = np.power(dense.sum(0) + 1e-8, -0.5)
    r[np.isinf(r)] = 0.0
    c[np.isinf(c)] = 0.0
    expect_sym = r[:, None] * dense * c[None, :]
    expect_mean = r[:, None] * dense
    np.testing.assert_allclose(csr_norm(A).todense(), expect_sym, rtol=1e-6)
    np.testing.assert_allclose(csr_norm(A, mean_flag=True).todense(), expect_mean, rtol=1e-6)


def test_csr_norm_zero_rows():
    A = sp.csr_matrix(np.array([[0, 0], [1, 1]], dtype=np.float32))
    out = np.asarray(csr_norm(A, mean_flag=True).todense())
    np.testing.assert_allclose(out[0], 0.0)  # zero-degree row stays zero
    np.testing.assert_allclose(out[1], 1 / np.sqrt(2 + 1e-8), rtol=1e-6)


def test_joint_adj():
    # create_adj_mat semantics (MICRO/codes/utility/load_data.py:105-150).
    rng = np.random.default_rng(1)
    R = _rand_csr(rng, 4, 3)
    adj, norm_adj, mean_adj = joint_adj(R, 4, 3)
    n = 7
    dense_R = np.asarray(R.todense())
    A = np.zeros((n, n), dtype=np.float32)
    A[:4, 4:] = dense_R
    A[4:, :4] = dense_R.T
    np.testing.assert_allclose(np.asarray(adj.todense()), A)
    AI = A + np.eye(n, dtype=np.float32)
    with np.errstate(divide="ignore"):
        d = 1.0 / AI.sum(1)
    d[np.isinf(d)] = 0.0
    np.testing.assert_allclose(np.asarray(norm_adj.todense()), d[:, None] * AI, rtol=1e-6)
    with np.errstate(divide="ignore"):
        d2 = 1.0 / A.sum(1)
    d2[np.isinf(d2)] = 0.0
    np.testing.assert_allclose(np.asarray(mean_adj.todense()), d2[:, None] * A, rtol=1e-6)


def test_spmm_matches_dense():
    rng = np.random.default_rng(2)
    A = _rand_csr(rng, 9, 6, density=0.3)
    A.data[:] = rng.normal(size=A.nnz).astype(np.float32)
    X = rng.normal(size=(6, 4)).astype(np.float32)
    g = SparseGraph.from_scipy(A)
    assert g.capacity % 128 == 0  # padded for TPU alignment
    out = np.asarray(g.spmm(jnp.asarray(X)))
    np.testing.assert_allclose(out, A @ X, rtol=1e-5, atol=1e-6)


def test_spmm_grad():
    import jax

    rng = np.random.default_rng(3)
    A = _rand_csr(rng, 5, 4, density=0.4)
    g = SparseGraph.from_scipy(A)
    X = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))

    def f(x):
        return jnp.sum(g.spmm(x) ** 2)

    grad = jax.grad(f)(X)
    dense = jnp.asarray(np.asarray(A.todense()))
    expect = jax.grad(lambda x: jnp.sum((dense @ x) ** 2))(X)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_transpose_graph():
    rng = np.random.default_rng(4)
    A = _rand_csr(rng, 6, 8, density=0.3)
    A.data[:] = rng.normal(size=A.nnz).astype(np.float32)
    g = SparseGraph.from_scipy(A)
    gt = g.transpose_graph()
    X = rng.normal(size=(6, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gt.spmm(jnp.asarray(X))), A.T @ X, rtol=1e-5, atol=1e-6
    )


def test_device_row_norm_matches_scipy_with_duplicates():
    # The densified-graph rebuild (MMSSL/main.py:378-397) builds csr_matrix
    # from index lists with duplicates (summed by scipy), then csr_norm(mean).
    rows = np.array([0, 0, 1, 2, 2, 2, 0], dtype=np.int32)  # duplicate (0, 1)
    cols = np.array([1, 1, 0, 3, 2, 1, 0], dtype=np.int32)
    n_rows, n_cols = 4, 5
    ref = sp.csr_matrix(
        (np.ones(len(rows), dtype=np.float32), (rows, cols)), shape=(n_rows, n_cols)
    )
    ref_norm = csr_norm(ref, mean_flag=True)

    cap = 16
    pr = np.zeros(cap, dtype=np.int32)
    pc = np.zeros(cap, dtype=np.int32)
    valid = np.zeros(cap, dtype=bool)
    pr[: len(rows)], pc[: len(rows)], valid[: len(rows)] = rows, cols, True
    g = device_row_norm_inv_sqrt(jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(valid), (n_rows, n_cols))
    X = np.random.default_rng(5).normal(size=(n_cols, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(g.spmm(jnp.asarray(X))), ref_norm @ X, rtol=1e-5, atol=1e-6
    )


def test_get_adj_mat_cache(tmp_path):
    # Reference cache behavior: compute + save on miss, load on hit.
    import os

    from mmssl_tpu.ops.sparse import get_adj_mat

    rng = np.random.default_rng(6)
    R = _rand_csr(rng, 5, 4)
    a1, n1, m1 = get_adj_mat(str(tmp_path), R, 5, 4)
    assert os.path.exists(tmp_path / "s_norm_adj_mat.npz")
    a2, n2, m2 = get_adj_mat(str(tmp_path), R, 5, 4)  # cache hit
    np.testing.assert_allclose(np.asarray(n1.todense()), np.asarray(n2.todense()))


def test_dense_graph_matches_coo_spmm():
    """DenseGraph (MXU path) reproduces the COO segment-sum SpMM; f32 exact,
    bf16 within bf16 rounding of the adjacency values."""
    from mmssl_tpu.ops.sparse import SparseGraph, sparse_to_dense_graph

    rng = np.random.default_rng(7)
    A = _rand_csr(rng, 40, 25)
    g = SparseGraph.from_scipy(csr_norm(A, mean_flag=True))
    X = rng.normal(size=(25, 8)).astype(np.float32)
    exact = np.asarray(g.spmm(jnp.asarray(X)))

    d32 = sparse_to_dense_graph(g, jnp.float32)
    np.testing.assert_allclose(np.asarray(d32.spmm(jnp.asarray(X))), exact, rtol=1e-6, atol=1e-6)

    d16 = sparse_to_dense_graph(g, jnp.bfloat16)
    out16 = np.asarray(d16.spmm(jnp.asarray(X)))
    assert out16.dtype == np.float32  # f32 accumulation
    np.testing.assert_allclose(out16, exact, rtol=2e-2, atol=2e-2)


def test_dense_rebuild_matches_coo_rebuild():
    """device_row_norm_inv_sqrt_dense == scatter of device_row_norm_inv_sqrt
    (duplicates sum in both)."""
    from mmssl_tpu.ops.sparse import (
        device_row_norm_inv_sqrt_dense,
        sparse_to_dense_graph,
    )

    rows = np.array([0, 0, 1, 2, 2, 2, 0], dtype=np.int32)
    cols = np.array([1, 1, 0, 3, 2, 1, 0], dtype=np.int32)
    n_rows, n_cols = 4, 5
    cap = 16
    pr = np.zeros(cap, dtype=np.int32)
    pc = np.zeros(cap, dtype=np.int32)
    valid = np.zeros(cap, dtype=bool)
    pr[: len(rows)], pc[: len(rows)], valid[: len(rows)] = rows, cols, True
    coo = device_row_norm_inv_sqrt(jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(valid), (n_rows, n_cols))
    dense = device_row_norm_inv_sqrt_dense(
        jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(valid), (n_rows, n_cols), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(dense.mat), np.asarray(sparse_to_dense_graph(coo, jnp.float32).mat),
        rtol=1e-6, atol=1e-6,
    )


def test_dense_graph_int8_counts_mode():
    """int8 counts + f32 row-scale mode: exact vs the COO SpMM (values are
    row-constant so the factorization is lossless), including duplicates and
    the VJP's input gradient."""
    from mmssl_tpu.ops.sparse import SparseGraph, sparse_to_dense_graph

    rng = np.random.default_rng(8)
    A = _rand_csr(rng, 40, 25)
    g = SparseGraph.from_scipy(csr_norm(A, mean_flag=True))
    X = rng.normal(size=(25, 8)).astype(np.float32)
    exact = np.asarray(g.spmm(jnp.asarray(X)))

    d8 = sparse_to_dense_graph(g, jnp.int8)
    assert d8.mat.dtype == jnp.int8 and d8.row_scale is not None
    out8 = np.asarray(d8.spmm(jnp.asarray(X)))
    assert out8.dtype == np.float32
    # bf16 compute of binary counts x f32 inputs rounded to bf16
    np.testing.assert_allclose(out8, exact, rtol=2e-2, atol=2e-2)

    # duplicates sum into counts > 1
    rows = jnp.asarray(np.array([0, 0, 1, 3], dtype=np.int32))
    cols = jnp.asarray(np.array([2, 2, 0, 0], dtype=np.int32))
    vals = jnp.asarray(np.array([0.5, 0.5, 1.0, 0.0], dtype=np.float32))
    from mmssl_tpu.ops.sparse import dense_from_coo

    d = dense_from_coo(rows, cols, vals, (3, 4), jnp.int8)
    m = np.asarray(d.mat)
    assert m[0, 2] == 2 and m[1, 0] == 1
    np.testing.assert_allclose(np.asarray(d.row_scale), [0.5, 1.0, 0.0])

    # VJP: d/dx matches the f32 dense graph's within bf16 rounding
    d32 = sparse_to_dense_graph(g, jnp.float32)
    gfn8 = jax.grad(lambda x: jnp.sum(d8.spmm(x) ** 2))
    gfn32 = jax.grad(lambda x: jnp.sum(d32.spmm(x) ** 2))
    np.testing.assert_allclose(
        np.asarray(gfn8(jnp.asarray(X))), np.asarray(gfn32(jnp.asarray(X))),
        rtol=3e-2, atol=3e-2,
    )


def test_bipartite_joint_graph_matches_joint_matrix():
    """BipartiteJointGraph.spmm == the materialized joint norm_adj @ x
    (exact blockwise factorization of D^-1 (A+I)), values and gradients."""
    import jax
    import jax.numpy as jnp

    from mmssl_tpu.ops.sparse import (
        BipartiteJointGraph,
        SparseGraph,
        joint_adj,
        joint_bipartite_graph,
    )

    rng = np.random.default_rng(7)
    n_u, n_i, d = 23, 17, 5
    R = sp.csr_matrix((rng.random((n_u, n_i)) < 0.2).astype(np.float32))
    _, norm_adj, _ = joint_adj(R, n_u, n_i)
    g_ref = SparseGraph.from_scipy(norm_adj)
    g_bip = joint_bipartite_graph(R, jnp.float32)
    x = jnp.asarray(rng.normal(size=(n_u + n_i, d)).astype(np.float32))
    y_ref = g_ref.spmm(x)
    y_bip = g_bip.spmm(x)
    np.testing.assert_allclose(np.asarray(y_bip), np.asarray(y_ref), rtol=1e-5, atol=1e-6)
    # int8 counts path identical too (binary R)
    y_i8 = joint_bipartite_graph(R, jnp.int8).spmm(x)
    np.testing.assert_allclose(np.asarray(y_i8), np.asarray(y_ref), rtol=2e-2, atol=2e-3)
    # gradient through spmm matches
    f_ref = lambda x: jnp.sum(g_ref.spmm(x) ** 2)
    f_bip = lambda x: jnp.sum(g_bip.spmm(x) ** 2)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_bip)(x)), np.asarray(jax.grad(f_ref)(x)), rtol=1e-4, atol=1e-5
    )


def test_joint_bipartite_from_norm_adj_matches_direct():
    """Dense mode derives its bipartite blocks from the (cacheable) norm_adj
    and must equal the direct-from-R build (ADVICE r1: dense vs coo cache
    divergence)."""
    from mmssl_tpu.ops.sparse import joint_bipartite_from_norm_adj, joint_bipartite_graph

    rng = np.random.default_rng(3)
    R = _rand_csr(rng, 9, 6)
    _, norm_adj, _ = joint_adj(R, 9, 6)
    a = joint_bipartite_graph(R, jnp.float32)
    b = joint_bipartite_from_norm_adj(norm_adj, 9, 6, jnp.float32)
    x = jnp.asarray(rng.standard_normal((15, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(a.spmm(x)), np.asarray(b.spmm(x)), rtol=1e-5, atol=1e-6)


def test_joint_bipartite_from_norm_adj_rejects_foreign_cache():
    """A cached norm_adj that is not of the reference D^-1(A+I) form must be
    rejected loudly, not silently replaced by a rebuild from R."""
    import pytest

    from mmssl_tpu.ops.sparse import joint_bipartite_from_norm_adj

    rng = np.random.default_rng(4)
    R = _rand_csr(rng, 5, 4)
    _, norm_adj, _ = joint_adj(R, 5, 4)
    bad = sp.lil_matrix(norm_adj)
    bad[0, 1] = 0.123  # non-diagonal entry inside the user-user block
    with pytest.raises(ValueError):
        joint_bipartite_from_norm_adj(sp.csr_matrix(bad), 5, 4, jnp.float32)


def test_bit_bipartite_joint_graph_matches_int8():
    """graph_dtype='bit' (VERDICT r3 #9): the packed-bitmap joint blocks
    compute the same action and gradients as the int8/f32 paths for binary
    interactions (incl. non-multiple-of-8 axes), and reject multigraphs."""
    import jax
    import jax.numpy as jnp
    import pytest

    from mmssl_tpu.ops.sparse import (
        SparseGraph,
        joint_adj,
        joint_bipartite_from_norm_adj,
        joint_bipartite_graph,
    )

    rng = np.random.default_rng(11)
    n_u, n_i, d = 21, 13, 5  # neither axis divides 8
    R = sp.csr_matrix((rng.random((n_u, n_i)) < 0.25).astype(np.float32))
    _, norm_adj, _ = joint_adj(R, n_u, n_i)
    g_ref = SparseGraph.from_scipy(norm_adj)
    g_bit = joint_bipartite_from_norm_adj(norm_adj, n_u, n_i, "bit")
    assert g_bit.rp.dtype == jnp.uint8 and g_bit.rp.shape == (n_u, 2)  # ceil8(13)/8
    x = jnp.asarray(rng.normal(size=(n_u + n_i, d)).astype(np.float32))
    y_ref = np.asarray(g_ref.spmm(x))
    y_bit = np.asarray(g_bit.spmm(x))
    np.testing.assert_allclose(y_bit, y_ref, rtol=2e-2, atol=2e-3)  # bf16 compute
    # gradients route through the swapped-block custom VJP
    f_ref = lambda x: jnp.sum(g_ref.spmm(x) ** 2)
    f_bit = lambda x: jnp.sum(g_bit.spmm(x) ** 2)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_bit)(x)), np.asarray(jax.grad(f_ref)(x)),
        rtol=3e-2, atol=3e-2,
    )
    # duplicate interactions are rejected loudly
    R2 = sp.csr_matrix(R * 2)
    _, norm_adj2, _ = joint_adj(R2, n_u, n_i)
    with pytest.raises(ValueError, match="binary"):
        joint_bipartite_from_norm_adj(norm_adj2, n_u, n_i, "bit")


def test_trainer_bit_graph_trains_and_matches(tmp_path):
    """A LightGCN trainer on graph_dtype='bit' produces the same training
    trajectory as int8 (binary data) through real train steps."""
    import jax.numpy as jnp

    from mmssl_tpu.config import preset
    from mmssl_tpu.data import load_dataset, write_synthetic_dataset
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    root = str(tmp_path)
    write_synthetic_dataset(root, "tiny", n_users=30, n_items=21, seed=5)

    def run(gd):
        cfg = preset("tiny", "lightgcn", **{
            "data.data_path": root, "data.batch_size": 16,
            "model.embed_size": 16, "model.graph_impl": "dense",
            "model.graph_dtype": gd, "eval.ks": (3, 5),
        })
        tr = Trainer(cfg, dataset=load_dataset(cfg.data), logger=MetricLogger(quiet=True))
        ms = [np.asarray(tr.train_batch(i)) for i in range(3)]
        return np.stack(ms)

    np.testing.assert_allclose(run("bit"), run("int8"), rtol=2e-3, atol=1e-4)
