"""Pallas CSR SpMM: correctness vs dense + gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from mmssl_tpu.ops.spmm_pallas import CSRGraph


def _rand_csr(rng, n, m, density=0.05):
    mask = rng.random((n, m)) < density
    A = sp.csr_matrix(mask.astype(np.float32))
    A.data[:] = rng.normal(size=A.nnz).astype(np.float32)
    return A


@pytest.mark.parametrize("shape", [(300, 200), (515, 130)])
def test_csr_spmm_matches_dense(shape):
    rng = np.random.default_rng(0)
    A = _rand_csr(rng, *shape)
    g = CSRGraph.from_scipy(A, interpret=True, use_pallas=True)
    X = jnp.asarray(rng.normal(size=(shape[1], 64)).astype(np.float32))
    out = np.asarray(g.spmm(X))
    np.testing.assert_allclose(out, A @ np.asarray(X), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out, np.asarray(g.spmm_xla(X)), rtol=1e-5, atol=1e-6)


def test_csr_spmm_empty_rows():
    A = sp.csr_matrix((np.ones(2, np.float32), ([0, 299], [5, 7])), shape=(300, 10))
    g = CSRGraph.from_scipy(A, interpret=True, use_pallas=True)
    X = jnp.asarray(np.random.default_rng(1).normal(size=(10, 64)).astype(np.float32))
    out = np.asarray(g.spmm(X))
    assert np.allclose(out[1:299], 0.0)
    np.testing.assert_allclose(out, A @ np.asarray(X), rtol=1e-5, atol=1e-6)


def test_csr_spmm_grads():
    rng = np.random.default_rng(2)
    A = _rand_csr(rng, 40, 30, density=0.2)
    g = CSRGraph.from_scipy(A, interpret=True, use_pallas=True)
    X = jnp.asarray(rng.normal(size=(30, 64)).astype(np.float32))
    dense = jnp.asarray(np.asarray(A.todense()))

    def f(x):
        return jnp.sum(g.spmm(x) ** 2)

    def f_ref(x):
        return jnp.sum((dense @ x) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(X)), np.asarray(jax.grad(f_ref)(X)), rtol=1e-4, atol=1e-5
    )
    # gradient w.r.t. values
    def fv(vals):
        g2 = CSRGraph(row_ptr=g.row_ptr, rows=g.rows, cols=g.cols, vals=vals,
                      shape=g.shape, interpret=True)
        return jnp.sum(g2.spmm(X) ** 2)

    dvals = jax.grad(fv)(g.vals)
    # finite-difference spot check on a single value
    eps = 1e-3
    v0 = np.asarray(g.vals).copy()
    idx = int(np.flatnonzero(v0)[0])
    vp, vm = v0.copy(), v0.copy()
    vp[idx] += eps
    vm[idx] -= eps
    num = (float(fv(jnp.asarray(vp))) - float(fv(jnp.asarray(vm)))) / (2 * eps)
    assert float(dvals[idx]) == pytest.approx(num, rel=2e-2)
