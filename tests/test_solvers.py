"""Direct solver tier, Schur-complement solver, AbstractSolver facades
(reference test/ParallelJuliaSolver/testParallelJuliaSolver.jl,
testLinSolveMGWrapper.jl, testLinSolveAMGWrapper.jl)."""
import numpy as np
import pytest
import scipy.sparse as sp

from mgtpu import get_mg_param, get_regular_mesh
from mgtpu.models.operators import (nodal_gradient_matrix,
                                    nodal_div_sig_grad_matrix,
                                    linear_elasticity_operator_mixed)
from mgtpu.solvers.direct import DirectSolver, batched_dense_lu
from mgtpu.solvers.schur import SchurComplementSolver
from mgtpu.solvers.wrappers import MGSolver, SAAMGSolver, ClassicalAMGSolver


def _sym_operator():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [20, 23])
    G = nodal_gradient_matrix(M)
    m = sp.diags(np.exp(np.random.randn(G.shape[0])))
    A = (G.T @ m @ G).tocsr()
    A = A + 1e-1 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])
    return A.tocsr()


DTYPES_TOL = [(np.float64, 1e-8), (np.float32, 1e-4),
              (np.complex128, 1e-8), (np.complex64, 1e-4)]


@pytest.mark.parametrize("dtype,tol", DTYPES_TOL)
@pytest.mark.parametrize("backend", ["dense", "host"])
def test_direct_solver_all_dtypes(dtype, tol, backend):
    """Direct tier accuracy across dtypes/backends, 1 and 5 RHS, A and A^H
    (reference testParallelJuliaSolver.jl:31-121)."""
    A = _sym_operator().astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        # complex non-hermitian perturbation
        P = sp.random(*A.shape, density=0.001, random_state=2)
        A = (A + 1j * 0.1 * abs(A).sum() / A.nnz * (P - P.T)).tocsr().astype(dtype)
    LU = DirectSolver(backend=backend, dtype=dtype)
    for nrhs in (1, 5):
        b = (A @ np.random.rand(A.shape[0], nrhs)).astype(dtype)
        b = b[:, 0] if nrhs == 1 else b
        x = LU.solve_linear_system(A, b)
        assert np.abs(A @ np.asarray(x) - b).max() / np.abs(b).max() < tol
        # adjoint solve
        xt = LU.solve(b, transpose=True)
        assert np.abs(A.conj().T @ np.asarray(xt) - b).max() / np.abs(b).max() < tol
    assert LU.n_fac == 1 and LU.n_solve == 4
    LU.clear()
    assert not LU.is_setup
    LU2 = LU.copy()
    assert not LU2.is_setup


def test_direct_solver_nonsymmetric():
    n = 300
    A = sp.random(n, n, density=0.05, format="csr", random_state=11)
    A = (A + n * sp.identity(n)).tocsr()
    b = np.random.randn(n)
    for backend in ("dense", "host"):
        x = DirectSolver(backend=backend).solve_linear_system(A, b)
        assert np.abs(A @ np.asarray(x) - b).max() < 1e-8


def test_batched_dense_lu():
    """Batched small factorizations: the parLU.cpp num_LUs x num_rhs analog."""
    nb, k, m = 32, 12, 3
    Ab = np.random.randn(nb, k, k) + k * np.eye(k)[None]
    B = np.random.randn(nb, k, m)
    lu = batched_dense_lu(Ab)
    X = np.asarray(lu.solve(B))
    err = np.abs(np.einsum("bij,bjm->bim", Ab, X) - B).max()
    assert err < 1e-10
    Xa = np.asarray(lu.solve_adjoint(B))
    err = np.abs(np.einsum("bji,bjm->bim", Ab.conj(), Xa) - B).max()
    assert err < 1e-10


@pytest.mark.slow
def test_schur_complement_solver():
    """Pressure-elimination solve of the mixed system (reference
    SchurCompSolver.jl:55-93)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [16, 16])
    mu = np.ones(M.num_cells)
    lam = 10.0 * mu
    A = linear_elasticity_operator_mixed(M, mu, lam)
    A = (A + 1e-3 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    b = A @ np.random.rand(A.shape[0])
    S = SchurComplementSolver(inner="dense")
    x = S.solve_linear_system(A, b, mesh=M)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-10
    assert S.n_fac == 1 and S.n_solve == 1

    # kaczmarz-S variant is approximate; use as a loose inner solve
    S2 = SchurComplementSolver(inner="kaczmarz",
                               kaczmarz_opts={"num_domains": [2, 2],
                                              "omega": 0.8, "num_it": 2,
                                              "inner": 20})
    x2 = S2.solve_linear_system(A, b, mesh=M)
    assert np.linalg.norm(A @ np.asarray(x2) - b) / np.linalg.norm(b) < 0.5


@pytest.mark.slow
def test_mg_solver_wrapper_gmres_pcg_bicgstab():
    """Wrapper contract: ||AX-B||/||B|| < 1e-2 with 4 RHS
    (reference testLinSolveMGWrapper.jl:20-45)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [50, 50])
    G = nodal_gradient_matrix(M)
    A = (G.T @ G).tocsr()
    A = A + 1e-2 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])
    A = A.tocsr()
    B = A @ np.random.rand(A.shape[0], 4)
    cfg, rp = get_mg_param(levels=5, max_outer_iter=15, relative_tol=1e-2,
                           relax_type="spai", relax_param=1.0,
                           nu_pre=2, nu_post=2)
    for krylov in ("gmres", "pcg", "bicgstab"):
        s = MGSolver(cfg, rp, mesh=M, sym=1, krylov=krylov)
        X = s.solve_linear_system(A, B)
        assert np.linalg.norm(A @ np.asarray(X) - B) / np.linalg.norm(B) < 1e-2
        # clear + reuse (reference testLinSolveMGWrapper.jl clear!/copySolver)
        s.clear()
        s2 = s.copy()
        X = s2.solve_linear_system(A, B)
        assert np.linalg.norm(A @ np.asarray(X) - B) / np.linalg.norm(B) < 1e-2
        assert s2.time_setup > 0 and s2.time_solve > 0


def test_saamg_and_classical_wrappers():
    """AMG wrapper contract (reference testLinSolveAMGWrapper.jl:34-42)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [50, 50])
    m = np.exp(np.random.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, m)
    A = (A + 1e-2 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    B = A @ np.random.rand(A.shape[0], 4)
    cfg, rp = get_mg_param(levels=3, max_outer_iter=15, relative_tol=1e-2,
                           relax_type="spai", relax_param=1.0,
                           nu_pre=2, nu_post=2)
    for cls in (SAAMGSolver, ClassicalAMGSolver):
        s = cls(cfg, rp, krylov="pcg")
        X = s.solve_linear_system(A, B)
        assert np.linalg.norm(A @ np.asarray(X) - B) / np.linalg.norm(B) < 1e-2


def test_direct_as_mg_coarse_solver():
    """Plug DirectSolver as the coarsest-grid solver of a hierarchy."""
    from mgtpu import mg_setup, solve_mg
    from mgtpu.models.operators import nodal_laplacian_matrix
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(L, M, cfg, rp, coarse_solver=DirectSolver("dense"))
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert np.linalg.norm(L @ np.asarray(x) - b) < 0.005
