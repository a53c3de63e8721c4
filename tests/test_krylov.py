"""Krylov methods: standalone correctness + MG-preconditioned contract
(reference testGMGRAPforPoisson.jl:47-55, testSAforDivSigGrad.jl:41-50)."""
import numpy as np
import scipy.sparse as sp

from mgtpu import (get_mg_param, mg_setup, solve_cg_mg, solve_bicgstab_mg,
                   solve_gmres_mg, get_regular_mesh, pcg, fgmres, bicgstab,
                   block_fgmres)
from mgtpu.models.operators import nodal_gradient_matrix, nodal_laplacian_matrix
from mgtpu.ops.ell import ell_from_scipy


def _spd(n=200, shift=1e-1):
    A = sp.random(n, n, density=0.03, format="csr", random_state=5)
    A = A @ A.T + shift * sp.identity(n)
    return A.tocsr()


def test_pcg_unpreconditioned():
    A = _spd()
    E = ell_from_scipy(A)
    b = np.random.randn(200, 3)
    x, info = pcg(E.matvec, b, tol=1e-10, max_iter=400)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_pcg_jacobi_prec():
    A = _spd()
    E = ell_from_scipy(A)
    d = 1.0 / A.diagonal()
    b = np.random.randn(200)
    x, info = pcg(E.matvec, b, prec=lambda r: d[:, None] * r, tol=1e-10,
                  max_iter=400)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_fgmres_nonsymmetric():
    n = 150
    A = sp.random(n, n, density=0.05, format="csr", random_state=7)
    A = A + n * sp.identity(n)  # diagonally dominant
    E = ell_from_scipy(A.tocsr())
    b = np.random.randn(n)
    x, info = fgmres(E.matvec, b, restart=20, tol=1e-10, max_iter=30)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_fgmres_nonflexible_right_prec():
    n = 150
    A = sp.random(n, n, density=0.05, format="csr", random_state=7)
    A = A + n * sp.identity(n)
    E = ell_from_scipy(A.tocsr())
    d = 1.0 / A.diagonal()
    b = np.random.randn(n, 2)
    x, info = fgmres(E.matvec, b, restart=15, prec=lambda r: d[:, None] * r,
                     tol=1e-10, max_iter=30, flexible=False)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_block_fgmres():
    A = _spd(120)
    E = ell_from_scipy(A)
    B = np.random.randn(120, 3)
    x, info = block_fgmres(E.matvec, B, restart=15, tol=1e-9, max_iter=40)
    assert np.linalg.norm(A @ np.asarray(x) - B) / np.linalg.norm(B) < 1e-7


def test_bicgstab():
    n = 150
    A = sp.random(n, n, density=0.05, format="csr", random_state=9)
    A = A + n * sp.identity(n)
    E = ell_from_scipy(A.tocsr())
    b = np.random.randn(n, 2)
    x, info = bicgstab(E.matvec, b, tol=1e-10, max_iter=200)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8


def test_gmres_mg_poisson():
    """GMRES + GMG: < 0.001 (reference testGMGRAPforPoisson.jl:47-55)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [128, 128])
    G = nodal_gradient_matrix(M)
    A = (G.T @ G).tocsr()
    A = A + 1e-4 * sp.linalg.norm(A, 1) * sp.identity(A.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="jac-gmres", relax_param=0.75,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_gmres_mg(state, B, inner=10, verbose=True)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.001


def test_cg_and_bicgstab_mg_poisson():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    A = L + 1e-4 * sp.linalg.norm(L, 1) * sp.identity(L.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=10, relative_tol=1e-6,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, _ = solve_cg_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 1e-5
    X, _ = solve_bicgstab_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 1e-5


def test_mixed_precision_preconditioner():
    """f32 MG cycle inside f64 CG (reference SolveFuncs.jl:52-58)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    A = L + 1e-4 * sp.linalg.norm(L, 1) * sp.identity(L.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=20, relative_tol=1e-8,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1, dtype=np.float32)
    state = mg_setup(A, M, cfg, rp)
    b = (A @ np.random.rand(A.shape[0])).astype(np.float64)
    b /= np.linalg.norm(b)
    x, info = solve_cg_mg(state, b)
    assert np.asarray(x).dtype == np.float64
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-7
