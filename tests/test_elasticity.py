"""Elasticity GMG: staggered transfers + SPAI, and mixed formulation + Vanka
(reference test/Multigrid/testGMGRAPforElasticity.jl and
testGMGRAPforElasticityVanka.jl — SURVEY.md §4 / BASELINE.md)."""
import numpy as np
import pytest
import scipy.sparse as sp

from mgtpu import (get_mg_param, mg_setup, solve_mg, solve_cg_mg,
                   get_regular_mesh)
from mgtpu.models.operators import (linear_elasticity_operator,
                                    linear_elasticity_operator_mixed)


def _opnorm1(A):
    return abs(A).sum(axis=0).max()


def test_elasticity_2d_rap_spai():
    """2D 128^2 elasticity, SystemsFacesLinear, SPAI(0.75), V(2,2), 2 RHS:
    < 0.05 standalone, < 0.01 with CG (reference testGMGRAPforElasticity.jl)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [128, 128])
    mu = np.ones(M.num_cells)
    lam = np.ones(M.num_cells)
    A = linear_elasticity_operator(M, mu, lam)
    A = (A + 1e-3 * _opnorm1(A) * sp.identity(A.shape[0])).tocsr()

    cfg, rp = get_mg_param(levels=5, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="spai", relax_param=0.75,
                           nu_pre=2, nu_post=2,
                           transfer_type="systems-faces")
    state = mg_setup(A, M, cfg, rp, verbose=True)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_mg(state, B, verbose=True)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.05
    X, _ = solve_cg_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.01


@pytest.mark.slow
def test_elasticity_3d_rap_spai():
    """3D 16x16x12 elasticity (reference testGMGRAPforElasticity.jl:42-63)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0, 0.0, 1.0], [16, 16, 12])
    mu = 2.0 * np.ones(M.num_cells)
    lam = mu.copy()
    A = linear_elasticity_operator(M, mu, lam)
    A = (A + 1e-2 * _opnorm1(A) * sp.identity(A.shape[0])).tocsr()

    cfg, rp = get_mg_param(levels=5, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="spai", relax_param=0.75,
                           nu_pre=2, nu_post=2,
                           transfer_type="systems-faces")
    state = mg_setup(A, M, cfg, rp, verbose=True)
    B = A @ np.random.rand(A.shape[0], 2)
    B = B / np.linalg.norm(B)
    X, info = solve_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.05
    X, _ = solve_cg_mg(state, B)
    assert np.linalg.norm(A @ np.asarray(X) - B) < 0.01


def test_elasticity_mixed_vanka_2d():
    """Mixed formulation + VankaFaces, 128^2: < 0.05 standalone, < 0.01 CG
    (reference testGMGRAPforElasticityVanka.jl:6-44)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [128, 128])
    mu = np.ones(M.num_cells)
    lam = 10.0 * mu
    A = linear_elasticity_operator_mixed(M, mu, lam)
    assert abs(A - A.T).max() < 1e-10
    A = (A + 1e-3 * _opnorm1(A) * sp.identity(A.shape[0])).tocsr()

    cfg, rp = get_mg_param(levels=4, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="vanka", relax_param=0.75,
                           nu_pre=1, nu_post=1,
                           transfer_type="systems-faces-mixed")
    state = mg_setup(A, M, cfg, rp, verbose=True)
    b = A @ np.random.rand(A.shape[0])
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b, verbose=True)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.05


@pytest.mark.slow
def test_elasticity_mixed_vanka_3d():
    """3D 16^3 mixed + Vanka (reference testGMGRAPforElasticityVanka.jl:87-111)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0, 0.0, 1.0], [16, 16, 16])
    mu = np.ones(M.num_cells)
    lam = 10.0 * mu
    A = linear_elasticity_operator_mixed(M, mu, lam)
    A = (A + 1e-2 * _opnorm1(A) * sp.identity(A.shape[0])).tocsr()

    cfg, rp = get_mg_param(levels=5, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="vanka", relax_param=0.75,
                           nu_pre=1, nu_post=1,
                           transfer_type="systems-faces-mixed")
    state = mg_setup(A, M, cfg, rp, verbose=True)
    b = A @ np.random.rand(A.shape[0])
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b, verbose=True)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.05


def test_vanka_kaczmarz_variant_2d():
    """hybridVankaFacesKaczmarz analog (reference
    testGMGRAPforElasticityVanka.jl:47-83; broken in the reference —
    getHybridKaczmarzParam undefined — functional here)."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    mu = np.ones(M.num_cells)
    lam = 10.0 * mu
    A = linear_elasticity_operator_mixed(M, mu, lam)
    A = (A + 1e-3 * _opnorm1(A) * sp.identity(A.shape[0])).tocsr()

    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-10,
                           relax_type="kaczmarz-vanka", relax_param=0.9,
                           nu_pre=2, nu_post=2,
                           transfer_type="systems-faces-mixed")
    state = mg_setup(A, M, cfg, rp)
    b = A @ np.random.rand(A.shape[0])
    b = b / np.linalg.norm(b)
    x, info = solve_mg(state, b, verbose=True)
    assert np.linalg.norm(A @ np.asarray(x) - b) < 0.05
