"""Remaining reference-suite coverage: re-discretized elasticity
(testGMGforElasticity.jl), vector Laplacian (testGMGforVectorLaplacian.jl),
Vanka variants, per-level relaxation parameters, hybrid-Kaczmarz MG smoother,
adjoint solves through the facade."""
import numpy as np
import pytest
import scipy.sparse as sp

from mgtpu import (get_mg_param, mg_setup, solve_mg, solve_cg_mg,
                   get_regular_mesh, OperatorConstructor, MGSolver)
from mgtpu.models.operators import (linear_elasticity_operator,
                                    linear_elasticity_operator_mixed,
                                    nodal_laplacian_matrix,
                                    nodal_div_sig_grad_matrix)
from mgtpu.setup.transfers import restrict_cell_centered_variables
from mgtpu.dd import indices as ddi


def _opn1(A):
    return abs(A).sum(axis=0).max()


@pytest.mark.slow
def test_elasticity_rediscretization_ctor():
    """Hierarchy by re-discretization with cell-centered coefficient
    coarsening (reference testGMGforElasticity.jl:37-64; 128^2 here for
    test-time, same structure as the reference's 512^2)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [128, 128])
    mu0 = 1.0 + np.arange(M.num_cells) % 3 * 0.5

    shift_scale = {}

    def get_op(mesh, mu):
        A = linear_elasticity_operator(mesh, mu, mu)
        if "s" not in shift_scale:
            shift_scale["s"] = 1e-3 * _opn1(A)
        return A + shift_scale["s"] * sp.identity(A.shape[0])

    ctor = OperatorConstructor(
        mu0, get_op,
        lambda mf, mc, mu, lvl: restrict_cell_centered_variables(mu, list(mf.n)))
    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="spai", relax_param=0.75,
                           nu_pre=2, nu_post=2,
                           transfer_type="systems-faces")
    state = mg_setup(ctor, M, cfg, rp, verbose=True)
    A = get_op(M, mu0).tocsr()
    B = A @ np.random.rand(A.shape[0], 2)
    B /= np.linalg.norm(B)
    X, info = solve_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.05
    X, _ = solve_cg_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.01


def test_vector_laplacian_two_level():
    """Vector Laplacian on faces, 2-level sanity (reference
    testGMGforVectorLaplacian.jl — assertions commented there; asserted here)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    mu = np.ones(M.num_cells)
    A = linear_elasticity_operator(M, mu, 0.0 * mu)  # pure vector Laplacian
    A = (A + 1e-3 * _opn1(A) * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=2, max_outer_iter=10, relative_tol=1e-8,
                           relax_type="spai", relax_param=0.75,
                           nu_pre=2, nu_post=2,
                           transfer_type="systems-faces")
    state = mg_setup(A, M, cfg, rp)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert info["relres"] < 1e-4   # factor ~0.42 over 10 V(2,2) cycles


def test_vanka_variants_converge():
    """econ-vanka / vanka-lex / vanka-add variants (reference Vanka.jl:13-17)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [32, 32])
    mu = np.ones(M.num_cells)
    lam = 10.0 * mu
    A = linear_elasticity_operator_mixed(M, mu, lam)
    A = (A + 1e-3 * _opn1(A) * sp.identity(A.shape[0])).tocsr()
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    res = {}
    for variant in ("vanka", "econ-vanka", "vanka-add"):
        cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-10,
                               relax_type=variant, relax_param=0.75,
                               nu_pre=1, nu_post=1,
                               transfer_type="systems-faces-mixed")
        state = mg_setup(A, M, cfg, rp)
        x, info = solve_mg(state, b)
        res[variant] = info["relres"]
        assert res[variant] < 0.05, (variant, res[variant])
    # tuple damping (w_u, w_p): full inverse with per-block weights
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="vanka", relax_param=(0.75, 0.9),
                           nu_pre=1, nu_post=1,
                           transfer_type="systems-faces-mixed")
    state = mg_setup(A, M, cfg, rp)
    x, info = solve_mg(state, b)
    assert info["relres"] < 0.05


def test_vanka_lex_small():
    """Lexicographic Vanka (sequential fori_loop path) on a small mesh."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [16, 16])
    mu = np.ones(M.num_cells)
    A = linear_elasticity_operator_mixed(M, mu, 10.0 * mu)
    A = (A + 1e-3 * _opn1(A) * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=2, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="vanka-lex", relax_param=0.75,
                           nu_pre=1, nu_post=1,
                           transfer_type="systems-faces-mixed")
    state = mg_setup(A, M, cfg, rp)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert info["relres"] < 0.05


def test_per_level_relax_param():
    """relaxParam as a per-level array (reference MGsetup.jl:14-22)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    cfg, _ = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-2,
                          relax_type="jacobi", nu_pre=1, nu_post=1)
    state = mg_setup(L, M, cfg, relax_param=[0.8, 0.7, 0.9])
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert np.linalg.norm(L @ np.asarray(x) - b) < 0.005


def test_per_level_nu_functions():
    """relaxPre/relaxPost as per-level functions (reference MGdef.jl:98-99)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    L = nodal_laplacian_matrix(M)
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-2,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=lambda l: 1 + l, nu_post=lambda l: 1)
    assert cfg.nu_pre == (1, 2, 3)
    state = mg_setup(L, M, cfg, rp)
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)
    x, _ = solve_mg(state, b)
    assert np.linalg.norm(L @ np.asarray(x) - b) < 0.005


def test_hybrid_kaczmarz_as_mg_smoother():
    """relaxType=hybridKaczmarzNodal analog: Kaczmarz smoothing inside the
    hierarchy (reference MGsetup.jl:150-152 — signature-broken there,
    functional here)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [32, 32])
    m = np.exp(0.3 * np.random.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, m)
    A = (A + 1e-4 * _opn1(A) * sp.identity(A.shape[0])).tocsr()
    cfg, _ = get_mg_param(levels=2, max_outer_iter=10, relative_tol=1e-6,
                          relax_type="hybrid-kaczmarz", nu_pre=1, nu_post=1)
    rp = {"num_domains": [4, 4], "omega": 0.8, "num_it": 2,
          "index_fn": ddi.nodal_indices_of_box}
    state = mg_setup(A, M, cfg, rp)
    b = A @ np.random.rand(A.shape[0])
    b /= np.linalg.norm(b)
    x, info = solve_mg(state, b)
    assert info["relres"] < 1e-3


def test_facade_adjoint_solve_nonsymmetric():
    """sym=0 facade: adjoint solves trigger hierarchy transposition
    (reference MGWrapper.jl:50-64)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [48, 48])
    L = nodal_laplacian_matrix(M)
    # mild nonsymmetric perturbation (convection-ish)
    n = L.shape[0]
    C = sp.diags([np.ones(n - 1)], [1], shape=(n, n)) * (0.05 * _opn1(L) / 8)
    A = (L + 1e-3 * _opn1(L) * sp.identity(n) + C).tocsr()
    cfg, rp = get_mg_param(levels=3, max_outer_iter=20, relative_tol=1e-8,
                           relax_type="jacobi", relax_param=0.7,
                           nu_pre=1, nu_post=1)
    s = MGSolver(cfg, rp, mesh=M, sym=0, krylov="gmres", gmres_inner=10)
    b = A @ np.random.rand(n)
    x = s.solve_linear_system(A, b)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-6
    xt = s.solve_linear_system(A, b, transpose=True)
    assert np.linalg.norm(A.conj().T @ np.asarray(xt) - b) / np.linalg.norm(b) < 1e-6
    # and back
    x = s.solve_linear_system(A, b)
    assert np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-6


def test_mixed_elasticity_rediscretization_ctor_vanka():
    """Mixed-formulation elasticity hierarchy by re-discretization with
    coefficient coarsening + cell-wise Vanka smoothing (reference
    testGMGforElasticityVanka.jl — its 512^2 workload at test size; the
    reference file is not CI-clean, assertions live here)."""
    from mgtpu.models.operators import linear_elasticity_operator_mixed
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    mu0 = 1.0 + (np.arange(M.num_cells) % 4) * 0.25

    shift_scale = {}

    def get_op(mesh, mu):
        A = linear_elasticity_operator_mixed(mesh, mu, mu)
        if "s" not in shift_scale:
            shift_scale["s"] = 1e-3 * _opn1(A)
        return A + shift_scale["s"] * sp.identity(A.shape[0])

    ctor = OperatorConstructor(
        mu0, get_op,
        lambda mf, mc, mu, lvl: restrict_cell_centered_variables(
            mu, list(mf.n)))
    cfg, rp = get_mg_param(levels=3, max_outer_iter=10, relative_tol=1e-10,
                           relax_type="VankaFaces", relax_param=0.75,
                           nu_pre=1, nu_post=1,
                           transfer_type="SystemsFacesMixedLinear")
    state = mg_setup(ctor, M, cfg, rp)
    A = get_op(M, mu0).tocsr()
    B = A @ np.random.rand(A.shape[0], 2)
    B /= np.linalg.norm(B)
    X, info = solve_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.05
