"""Krylov methods: standalone correctness + MG-preconditioned contract
(reference testGMGRAPforPoisson.jl:47-55, testSAforDivSigGrad.jl:41-50)."""
import numpy as np
import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_krylov_batch_leading_layout_matches_columns():
    """Leading-batch (m, *space) operands give the same iterates as the
    legacy (n, m) column layout."""
    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mgtpu.krylov import pcg, bicgstab, fgmres
    from mgtpu.ops.ell import ell_from_scipy

    rng = np.random.RandomState(5)
    n, m = 300, 3
    A = sp.random(n, n, density=0.02, random_state=rng)
    A = (A @ A.T + 10 * sp.identity(n)).tocsr()
    E = ell_from_scipy(A, dtype=np.float64)
    B = rng.rand(n, m)
    d = 1.0 / A.diagonal()

    mv_lead = lambda v: E.matvec(v.T).T
    prec_cols = lambda r: d[:, None] * r
    prec_lead = lambda r: d[None, :] * r

    for solver, kw in ((pcg, {}), (bicgstab, {}), (fgmres, {"restart": 15})):
        xc, ic = solver(E.matvec, jnp.asarray(B), prec=prec_cols,
                        tol=1e-10, max_iter=60, **kw)
        xl, il = solver(mv_lead, jnp.asarray(B.T), prec=prec_lead,
                        tol=1e-10, max_iter=60, batch_leading=True, **kw)
        np.testing.assert_allclose(np.asarray(xl).T, np.asarray(xc),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_grid_engine_krylov_solves_native():
    """MG-preconditioned Krylov on the grid engine: no flat vectors in the
    loop, mixed-precision outer (f64 b over f32 hierarchy)."""
    import numpy as np
    import scipy.sparse as sp
    from mgtpu import (get_mg_param, mg_setup, get_regular_mesh,
                       solve_cg_mg, solve_gmres_mg, solve_bicgstab_mg)
    from mgtpu.models.operators import nodal_laplacian_matrix
    from mgtpu.cycle.grid_cycle import GridHierarchy

    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=4, relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1, max_outer_iter=30,
                           relative_tol=1e-9, dtype=np.float32)
    state = mg_setup(L, M, cfg, rp)
    assert isinstance(state.hier, GridHierarchy)
    b = np.random.rand(L.shape[0], 2)
    b /= np.linalg.norm(b, axis=0)
    for fn in (solve_cg_mg, solve_gmres_mg, solve_bicgstab_mg):
        x, info = fn(state, b)
        res = np.linalg.norm(L @ np.asarray(x, dtype=np.float64) - b)
        assert res < 1e-7, (fn.__name__, res)
    # block variant
    xb, _ = solve_gmres_mg(state, b, block=True)
    assert np.linalg.norm(L @ np.asarray(xb, dtype=np.float64) - b) < 1e-7
