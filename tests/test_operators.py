"""Discretization operators: structural and spectral sanity checks."""
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from mgtpu.models.mesh import get_regular_mesh, get_cell_centered_grid
from mgtpu.models import operators as ops


def test_nodal_gradient_shape_and_nullspace():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [8, 6])
    G = ops.nodal_gradient_matrix(M)
    n_edges = 8 * 7 + 9 * 6
    assert G.shape == (n_edges, 9 * 7)
    # constants are in the nullspace
    assert np.abs(G @ np.ones(G.shape[1])).max() < 1e-14


def test_nodal_laplacian_spd_and_stencil():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [8, 8])
    L = ops.nodal_laplacian_matrix(M)
    assert (abs(L - L.T)).max() < 1e-12
    # interior row is the 5-point stencil scaled by 1/h^2
    Ld = L.toarray()
    i = 4 + 4 * 9  # interior node
    h2 = (1.0 / 8) ** 2
    assert np.isclose(Ld[i, i], 4.0 / h2)
    assert np.isclose(Ld[i, i - 1], -1.0 / h2)
    assert np.isclose(Ld[i, i + 9], -1.0 / h2)
    # PSD
    evals = np.linalg.eigvalsh(Ld)
    assert evals.min() > -1e-10


def test_div_sig_grad_reduces_to_laplacian():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [6, 6])
    L = ops.nodal_laplacian_matrix(M)
    A = ops.nodal_div_sig_grad_matrix(M, np.ones(36))
    assert (abs(A - L)).max() < 1e-12


def test_div_sig_grad_variable_sigma_spd():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [10, 10])
    sig = np.exp(np.random.randn(100))
    A = ops.nodal_div_sig_grad_matrix(M, sig)
    assert (abs(A - A.T)).max() < 1e-10
    evals = np.linalg.eigvalsh(A.toarray())
    assert evals.min() > -1e-8


def test_div_sig_grad_3d():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0, 0.0, 1.0], [4, 4, 4])
    sig = np.exp(np.random.randn(64))
    A = ops.nodal_div_sig_grad_matrix(M, sig)
    assert A.shape == (125, 125)
    assert (abs(A - A.T)).max() < 1e-10


def test_elasticity_symmetric_psd():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [8, 8])
    mu = np.ones(64)
    lam = np.ones(64)
    A = ops.linear_elasticity_operator(M, mu, lam)
    nf = 9 * 8 + 8 * 9
    assert A.shape == (nf, nf)
    assert (abs(A - A.T)).max() < 1e-12
    evals = np.linalg.eigvalsh(A.toarray())
    assert evals.min() > -1e-9
    # rigid translation of one component is in the nullspace-ish (Neumann)
    u = np.zeros(nf)
    u[: 9 * 8] = 1.0
    assert np.abs(A @ u).max() < 1e-10


def test_elasticity_mixed_symmetric():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [8, 8])
    mu = np.ones(64)
    lam = 10.0 * mu
    A = ops.linear_elasticity_operator_mixed(M, mu, lam)
    nf = 9 * 8 + 8 * 9
    assert A.shape == (nf + 64, nf + 64)
    assert (abs(A - A.T)).max() < 1e-12


def test_cell_centered_grid():
    M = get_regular_mesh([0.0, 1.0, 0.0, 2.0], [2, 2])
    xc = get_cell_centered_grid(M)
    assert xc.shape == (4, 2)
    # dim-0 fastest
    np.testing.assert_allclose(xc[:, 0], [0.25, 0.75, 0.25, 0.75])
    np.testing.assert_allclose(xc[:, 1], [0.5, 0.5, 1.5, 1.5])


def test_mass_matrices():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [4, 4])
    sig = np.exp(np.random.randn(16))
    Mf = ops.face_mass_matrix(M, sig)
    assert Mf.shape == (5 * 4 + 4 * 5,) * 2
    Mt = ops.tensor_mass_matrix(M, sig)
    np.testing.assert_allclose(Mt.diagonal(), sig * (0.25 ** 2))
