"""Overlapping Schwarz DD: serial, re-discretized, sharded, and as MG coarse
solver; hybrid Kaczmarz preconditioner (reference
test/DomainDecomposition/testDDPoisson.jl, testDDParallel_Poisson.jl,
test/Multigrid/testHybridKaczmarz.jl)."""
import numpy as np
import jax
import scipy.sparse as sp

from mgtpu import get_regular_mesh, get_mg_param, mg_setup, solve_mg, fgmres
from mgtpu.models.operators import (nodal_laplacian_matrix,
                                    nodal_div_sig_grad_matrix,
                                    linear_elasticity_operator)
from mgtpu.dd.schwarz import DDSolver, DDOperatorConstructor
from mgtpu.dd import indices as ddi
from mgtpu.dd.parallel import dd_parallel_preconditioner
from mgtpu.ops.ell import ell_from_scipy


def _poisson(n):
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    A = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    return M, A


def test_dd_serial_poisson_preconditioner():
    """32^2, 8x8 domains, overlap 1, Schwarz-preconditioned FGMRES
    (reference testDDPoisson.jl)."""
    M, A = _poisson(32)
    dd = DDSolver(M, [8, 8], [1, 1], layout="nodal").setup(A)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = dd.solve_linear_system(A, b, tol=1e-8, max_iter=10, restart=5)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-6
    assert info["iters"] <= 10


def test_dd_sweep_reduces_residual():
    M, A = _poisson(32)
    dd = DDSolver(M, [4, 4], [1, 1], layout="nodal").setup(A)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x = dd.sweep(np.zeros_like(b), b, num_it=2)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.5
    # symmetric (forward+backward) sweep at least as good
    xs = dd.sweep(np.zeros_like(b), b, num_it=1, symmetric=True)
    assert np.linalg.norm(A @ np.asarray(xs) - b) < 0.6


def test_dd_rediscretization_with_dirichlet_mass():
    """Neumann problem re-discretized per subdomain + Dirichlet interface mass
    (reference testDDPoisson.jl second mode + DDPoissonFuncs.jl)."""
    M, _ = _poisson(32)
    L = nodal_laplacian_matrix(M)
    A = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    shift = 1e-4 * abs(L).sum(axis=0).max()

    def get_sub_params(pp, mesh, i, ndom, ov):
        return None

    def get_operator(params, sub_mesh):
        Ls = nodal_laplacian_matrix(sub_mesh)
        return Ls + shift * sp.identity(Ls.shape[0])

    def get_dirichlet_mass(i, ndom, ov, nc):
        # strong interface penalty on artificial cuts
        return 1e4 * ddi.dirichlet_mass_nodal(ndom, ov, i, nc)

    ctor = DDOperatorConstructor(None, get_sub_params, get_operator,
                                 get_dirichlet_mass)
    dd = DDSolver(M, [4, 4], [1, 1], layout="nodal")
    dd.setup_with_operator(ctor, A)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = dd.solve_linear_system(A, b, tol=1e-8, max_iter=15, restart=5)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-5


def test_dd_sharded_matches_serial():
    """Subdomains sharded over the 8-device CPU mesh: the sharded sweep must
    match the serial sweep (reference testDDParallel_Poisson.jl semantics:
    same algorithm, distributed execution)."""
    M, A = _poisson(32)
    dd = DDSolver(M, [4, 4], [1, 1], layout="nodal").setup(A)
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("dd",))
    prec = dd_parallel_preconditioner(dd, mesh)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x_serial = dd.sweep(np.zeros_like(b), b, 1)
    x_shard = prec(jax.numpy.asarray(b))
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_serial),
                               atol=1e-11)
    # and it works as an FGMRES preconditioner
    E = ell_from_scipy(A)
    x, info = fgmres(E.matvec, jax.numpy.asarray(b), restart=5, prec=prec,
                     tol=1e-8, max_iter=10)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-6


def test_dd_as_mg_coarse_solver():
    """DD as the coarsest-level solver (reference MGsetup.jl:324-326)."""
    M, A = _poisson(64)
    cfg, rp = get_mg_param(levels=3, max_outer_iter=10, relative_tol=1e-6,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    coarse = DDSolver(None, [2, 2], [1, 1], layout="nodal")
    state = mg_setup(A, M, cfg, rp, coarse_solver=coarse)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert info["relres"] < 1e-4


def test_hybrid_kaczmarz_preconditioner():
    """Hybrid Kaczmarz as FGMRES preconditioner on DivSigGrad and elasticity
    (reference testHybridKaczmarz.jl:29-47)."""
    from mgtpu.cycle.kaczmarz import setup_hybrid_kaczmarz, make_kaczmarz_precond
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    m = np.exp(np.random.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, m)
    A = (A + 2e-1 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    kz = setup_hybrid_kaczmarz(A, M, [4, 4], ddi.nodal_indices_of_box,
                               omega=0.8, num_it=5)
    E = ell_from_scipy(A)
    B = A @ np.random.rand(A.shape[0], 2)
    B /= np.linalg.norm(B)
    X, info = fgmres(E.matvec, B, restart=5, prec=make_kaczmarz_precond(kz),
                     tol=1e-10, max_iter=3)
    r0 = np.linalg.norm(B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.1 * r0

    # elasticity, faces layout (no pressure)
    mu = 2.0 * np.ones(M.num_cells)
    Ae = linear_elasticity_operator(M, mu, mu)
    Ae = (Ae + 2e-1 * abs(Ae).sum(axis=0).max() * sp.identity(Ae.shape[0])).tocsr()
    kz = setup_hybrid_kaczmarz(Ae, M, [4, 4],
                               ddi.faces_staggered_indices_of_box_no_pressure,
                               omega=0.8, num_it=5)
    Ee = ell_from_scipy(Ae)
    Be = Ae @ np.random.rand(Ae.shape[0], 2)
    Be /= np.linalg.norm(Be)
    Xe, _ = fgmres(Ee.matvec, Be, restart=5,
                   prec=make_kaczmarz_precond(kz), tol=1e-10, max_iter=3)
    assert np.linalg.norm(Ae @ np.asarray(Xe) - Be) < 0.1
