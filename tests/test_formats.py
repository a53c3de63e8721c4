"""Device sparse formats (ELL / DIA): conformance vs scipy on all dtypes."""
import numpy as np
import pytest
import scipy.sparse as sp

from mgtpu.models.mesh import get_regular_mesh
from mgtpu.models import operators as dops
from mgtpu.ops.ell import ELL, ell_from_scipy
from mgtpu.ops.dia import DIA, dia_from_scipy

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _rand_sparse(n, m, density, dtype):
    A = sp.random(n, m, density=density, format="csr", random_state=3)
    A.data = A.data.astype(dtype)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        A.data = A.data + 1j * np.random.randn(A.nnz).astype(A.data.real.dtype)
    return A


@pytest.mark.parametrize("dtype", DTYPES)
def test_ell_matvec_random(dtype):
    A = _rand_sparse(173, 151, 0.05, dtype)
    E = ell_from_scipy(A)
    x = np.random.randn(151).astype(np.dtype(dtype).char.lower() if False else dtype)
    y = np.asarray(E.matvec(x))
    rtol = 1e-5 if np.dtype(dtype).itemsize <= 8 and dtype in (np.float32, np.complex64) else 1e-12
    np.testing.assert_allclose(y, A @ x, rtol=rtol, atol=1e-5 if rtol > 1e-10 else 1e-12)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ell_matmat_multirhs(dtype):
    A = _rand_sparse(90, 120, 0.07, dtype)
    E = ell_from_scipy(A)
    X = np.random.randn(120, 3).astype(dtype)
    np.testing.assert_allclose(np.asarray(E.matvec(X)), A @ X, rtol=1e-12, atol=1e-12)


def test_ell_roundtrip():
    A = _rand_sparse(50, 50, 0.1, np.float64)
    E = ell_from_scipy(A)
    assert (abs(E.to_scipy() - A)).max() < 1e-14


def test_dia_on_laplacian():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [16, 16])
    L = dops.nodal_laplacian_matrix(M)
    D = dia_from_scipy(L)
    assert D is not None
    assert len(D.offsets) <= 9
    x = np.random.randn(L.shape[1])
    np.testing.assert_allclose(np.asarray(D.matvec(x)), L @ x, rtol=1e-13, atol=1e-13)
    X = np.random.randn(L.shape[1], 4)
    np.testing.assert_allclose(np.asarray(D.matvec(X)), L @ X, rtol=1e-13, atol=1e-13)


def test_dia_rejects_unstructured():
    A = _rand_sparse(300, 300, 0.05, np.float64)
    assert dia_from_scipy(A, max_diags=40) is None


def test_dia_roundtrip():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [8, 8])
    L = dops.nodal_laplacian_matrix(M)
    D = dia_from_scipy(L)
    assert (abs(D.to_scipy() - L)).max() < 1e-14


def test_dia_3d_27pt():
    M = get_regular_mesh([0.0, 1.0] * 3, [6, 6, 6])
    sig = np.exp(np.random.randn(216))
    A = dops.nodal_div_sig_grad_matrix(M, sig)
    D = dia_from_scipy(A)
    assert D is not None and len(D.offsets) <= 27
    x = np.random.randn(A.shape[0])
    np.testing.assert_allclose(np.asarray(D.matvec(x)), A @ x, rtol=1e-12, atol=1e-12)


def test_pytree_flatten():
    import jax
    A = _rand_sparse(20, 20, 0.2, np.float32)
    E = ell_from_scipy(A)
    leaves, treedef = jax.tree_util.tree_flatten(E)
    E2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert E2.shape == E.shape
