"""Geometric multigrid convergence contract (reference test/Multigrid/testGMG.jl
and testGMGRAPforPoisson.jl semantics — SURVEY.md §4 / BASELINE.md).

The contract: normalized b, x0 = 0, at most 5 V-cycles, final residual below
the reference thresholds.
"""
import numpy as np
import pytest

from mgtpu import (get_mg_param, mg_setup, solve_mg, OperatorConstructor,
                   get_regular_mesh, get_cell_centered_grid,
                   transpose_hierarchy, replace_matrix_in_hierarchy,
                   copy_solver, clear, hierarchy_exists)
from mgtpu.models.operators import (nodal_laplacian_matrix,
                                    nodal_div_sig_grad_matrix,
                                    nodal_gradient_matrix)
from mgtpu.setup.transfers import restrict_cell_centered_variables
import scipy.sparse as sp


def _mesh_2d(n=128):
    return get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])


def test_gmg_poisson_2d_rap_jacobi():
    """GMG-2D-Jac contract: 128^2 Laplacian, 4 levels, Jac(0.8), V(1,1),
    ||Ax-b|| < 0.005 within 5 cycles (reference testGMG.jl:55)."""
    M = _mesh_2d(128)
    L = nodal_laplacian_matrix(M)
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(L, M, cfg, rp, verbose=True)
    s = np.random.rand(L.shape[0])
    b = L @ s
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b, verbose=True)
    assert np.linalg.norm(L @ np.asarray(x) - b) < 0.005
    assert info["iters"] <= 5


def test_gmg_divsiggrad_2d_rap():
    """Variable-coefficient DivSigGrad via RAP (reference testGMG.jl:63-68)."""
    M = _mesh_2d(128)
    xc = get_cell_centered_grid(M)
    sig = 3 * xc[:, 0] * (1 - xc[:, 0]) + 2 * xc[:, 1] * (1 - xc[:, 1])
    A = nodal_div_sig_grad_matrix(M, sig)
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    b = A @ np.random.rand(A.shape[0])
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.005


def test_gmg_rediscretization_ctor():
    """Hierarchy by re-discretization with coefficient coarsening
    (reference testGMG.jl:71-75)."""
    M = _mesh_2d(128)
    xc = get_cell_centered_grid(M)
    sig = 3 * xc[:, 0] * (1 - xc[:, 0]) + 2 * xc[:, 1] * (1 - xc[:, 1])
    A = nodal_div_sig_grad_matrix(M, sig)

    ctor = OperatorConstructor(
        sig,
        lambda mesh, s: nodal_div_sig_grad_matrix(mesh, s),
        lambda mf, mc, s, lvl: restrict_cell_centered_variables(s, list(mf.n)))
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(ctor, M, cfg, rp, verbose=True)
    b = A @ np.random.rand(A.shape[0])
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.005


def test_gmg_poisson_jac_gmres_multirhs():
    """Jac-GMRES relaxation, 2 RHS, shifted G'G (reference
    testGMGRAPforPoisson.jl:15-40)."""
    M = _mesh_2d(128)
    G = nodal_gradient_matrix(M)
    A = (G.T @ G).tocsr()
    A = A + 1e-4 * sp.linalg.norm(A, 1) * sp.identity(A.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="jac-gmres", relax_param=0.75,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_mg(state, B, verbose=True)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.005


def test_gmg_poisson_iterative_coarsest():
    """coarseSolveType=GMRES escape hatch (reference testGMGRAPforPoisson.jl:41-46)."""
    M = _mesh_2d(128)
    G = nodal_gradient_matrix(M)
    A = (G.T @ G).tocsr()
    A = A + 1e-4 * sp.linalg.norm(A, 1) * sp.identity(A.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="jac-gmres", relax_param=0.75,
                           nu_pre=1, nu_post=1, coarse_solve="gmres")
    state = mg_setup(A, M, cfg, rp)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.005


def test_gmg_poisson_3d():
    """3D Poisson 32x32x16 (reference testGMGRAPforPoisson.jl:57-78)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0, 0.0, 1.0], [32, 32, 16])
    G = nodal_gradient_matrix(M)
    A = (G.T @ G).tocsr()
    A = A + 1e-4 * sp.linalg.norm(A, 1) * sp.identity(A.shape[0])
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="jac-gmres", relax_param=0.75,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.01


def test_cycle_types_converge():
    """W, F and K cycles all reduce the residual at least as well as V."""
    M = _mesh_2d(64)
    L = nodal_laplacian_matrix(M)
    b = L @ np.random.rand(L.shape[0])
    b = b / np.linalg.norm(b)
    res = {}
    for ct in ["V", "W", "F", "K"]:
        cfg, rp = get_mg_param(levels=4, max_outer_iter=3, relative_tol=1e-12,
                               relax_type="jacobi", relax_param=0.8,
                               nu_pre=1, nu_post=1, cycle_type=ct)
        state = mg_setup(L, M, cfg, rp)
        x, info = solve_mg(state, b)
        res[ct] = np.linalg.norm(L @ np.asarray(x) - b)
    assert res["V"] < 0.05
    for ct in ["W", "F", "K"]:
        assert res[ct] < 2.0 * res["V"]


def test_lifecycle_copy_clear_transpose_replace():
    """copySolver/clear!/transposeHierarchy/replaceMatrixInHierarchy parity
    (reference testGMGRAPforPoisson.jl:85-88, testSAforDivSigGrad.jl:53-57)."""
    M = _mesh_2d(64)
    L = nodal_laplacian_matrix(M).astype(np.float64)
    A = L + 1e-4 * sp.linalg.norm(L, 1) * sp.identity(L.shape[0])
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    assert hierarchy_exists(state)

    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, _ = solve_mg(state, b)
    r1 = np.linalg.norm(A @ np.asarray(x) - b)

    # transpose (A symmetric -> same convergence)
    transpose_hierarchy(state)
    x, _ = solve_mg(state, b)
    assert np.linalg.norm(A.conj().T @ np.asarray(x) - b) < 2 * max(r1, 1e-3)

    # replace matrix: same pattern, scaled values
    replace_matrix_in_hierarchy(state, 2.0 * A)
    x, _ = solve_mg(state, 2.0 * np.asarray(b))
    assert np.linalg.norm(2.0 * (A @ np.asarray(x)) - 2.0 * b) < 2 * max(r1, 1e-3) * 2

    s2 = copy_solver(state)
    assert not hierarchy_exists(s2)
    clear(state)
    assert not hierarchy_exists(state)
