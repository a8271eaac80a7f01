"""kNN modality graph builders: dense vs sparse vs numpy reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmssl_tpu.ops.knn import (
    build_knn_neighbourhood,
    build_knn_sparse_graph,
    build_sim,
    compute_normalized_laplacian,
    get_dense_laplacian,
)


def _np_sim(x):
    n = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return n @ n.T


def test_build_sim():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(build_sim(jnp.asarray(x))), _np_sim(x), rtol=1e-5, atol=1e-6)


def test_knn_neighbourhood():
    rng = np.random.default_rng(1)
    sim = rng.normal(size=(10, 10)).astype(np.float32)
    k = 3
    out = np.asarray(build_knn_neighbourhood(jnp.asarray(sim), k))
    for i in range(10):
        kept = np.flatnonzero(out[i])
        assert len(kept) == k
        topk = np.argsort(sim[i])[::-1][:k]
        assert set(kept) == set(topk)
        np.testing.assert_allclose(out[i, kept], sim[i, kept])


def test_normalized_laplacian():
    rng = np.random.default_rng(2)
    adj = np.abs(rng.normal(size=(8, 8))).astype(np.float32)
    adj[3] = 0.0  # zero row -> inf guard
    out = np.asarray(compute_normalized_laplacian(jnp.asarray(adj)))
    d = np.power(adj.sum(1), -0.5)
    d[np.isinf(d)] = 0.0
    np.testing.assert_allclose(out, d[:, None] * adj * d[None, :], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("norm_type", ["sym", "rw", "none"])
def test_sparse_matches_dense(norm_type):
    # Same graph through the MICRO sparse path (torch_scatter semantics) and
    # the dense laplacian path must agree (MICRO/codes/utility/norm.py).
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(15, 7)).astype(np.float32)
    sim = build_sim(jnp.asarray(feats))
    k = 4
    dense = get_dense_laplacian(build_knn_neighbourhood(sim, k), norm_type)
    sparse = build_knn_sparse_graph(sim, k, norm_type)
    X = jnp.asarray(rng.normal(size=(15, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sparse.spmm(X)), np.asarray(dense @ X), rtol=1e-4, atol=1e-5
    )


def test_knn_topk_clamped_to_catalog():
    """topk > n_items keeps every entry instead of raising (tiny catalogs;
    torch.topk would raise identically in the reference)."""
    import jax.numpy as jnp

    from mmssl_tpu.ops.knn import (
        build_knn_neighbourhood,
        build_knn_sparse_graph,
        build_sim,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32))
    sim = build_sim(x)
    dense = build_knn_neighbourhood(sim, 10)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sim), rtol=1e-6)
    g = build_knn_sparse_graph(sim, 10, "sym")
    assert g.rows.shape[0] == 5 * 5  # n * clamped_k entries
