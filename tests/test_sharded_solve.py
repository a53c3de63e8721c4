"""Multi-chip END-TO-END solve conformance (8 virtual CPU devices).

The reference's distributed tier is a solve-to-completion driver
(solveDDParallel, DDParallel.jl:69-120); these tests pin the sharded
refined solve and sharded Krylov drivers to the single-device solvers:
same iterate trajectory, true (f64-certified) 1e-8 residuals.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
from jax.sharding import Mesh

from mgtpu import get_regular_mesh, get_mg_param, mg_setup
from mgtpu.models.operators import nodal_laplacian_matrix
from mgtpu.parallel.sharded_solve import make_sharded_refined_solver
from mgtpu.ops.df32 import df_dense_from_csr, df_residual_dense


def _poisson_state(n=128, levels=4, shift=1e-4):
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + shift * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])
         ).tocsr()
    cfg, rp = get_mg_param(levels=levels, relax_type="jacobi",
                           relax_param=0.8, nu_pre=1, nu_post=1,
                           dtype=np.float32, max_outer_iter=40)
    return mg_setup(L, M, cfg, rp), L


def _mesh(ndev, shape=None, axes=("x",)):
    devs = np.array(jax.devices()[:ndev])
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axes)


def test_df_residual_dense_matches_f64():
    state, L = _poisson_state(32, 3)
    nodes = [33, 33]
    dfA = df_dense_from_csr(L, nodes)
    rng = np.random.RandomState(0)
    x64 = rng.rand(L.shape[0]).astype(np.float64)
    b64 = rng.rand(L.shape[0]).astype(np.float64)
    grid = (33, 33)

    def split(v):
        hi = v.astype(np.float32)
        return (jnp.asarray(hi).reshape(grid),
                jnp.asarray((v - hi.astype(np.float64)).astype(np.float32)
                            ).reshape(grid))

    bh, bl = split(b64)
    xh, xl = split(x64)
    rh, rl = df_residual_dense(dfA, bh, bl, xh, xl)
    r = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    r_ref = (b64 - L.astype(np.float64) @ x64).reshape(grid)
    scale = max(np.abs(r_ref).max(), 1e-30)
    assert np.abs(r - r_ref).max() / scale < 1e-12


@pytest.mark.slow
def test_sharded_refined_matches_single_device_trajectory():
    """8-device trajectory == 1-device trajectory of the same sharded code
    AND matches the single-chip solve_mg_refined contract: same iteration
    count, true 1e-8 residual.

    Floor on the match: the sharded transfer matmuls contract over a SHARDED
    axis, so GSPMD reduces per-shard then psums — a different f32 summation
    order than one device.  Iterates therefore agree to f32 rounding
    (measured 8e-8 relative), not bitwise; the convergence CONTRACT (cycle
    counts, certified residual) is exact."""
    state, L = _poisson_state(128, 4)
    rng = np.random.RandomState(1)
    b = L @ rng.rand(L.shape[0])
    b /= np.linalg.norm(b)

    s1 = make_sharded_refined_solver(state, _mesh(1))
    x1, info1 = s1.solve_refined(b, tol=1e-8)
    s8 = make_sharded_refined_solver(state, _mesh(8))
    x8, info8 = s8.solve_refined(b, tol=1e-8)

    assert info8["iters"] == info1["iters"]
    rv1, rv8 = info1["resvec"], info8["resvec"]
    assert np.all(np.abs(rv8 - rv1) <= 2e-6 * np.maximum(rv1, 1e-30))
    assert np.max(np.abs(x8 - x1)) <= 1e-6 * max(np.abs(x1).max(), 1e-30)

    # true f64 certification
    tr = np.linalg.norm(b - L.astype(np.float64) @ x8) / np.linalg.norm(b)
    assert tr < 1e-8

    # single-chip driver comparison: same cycle/residual math => same count
    from mgtpu.solvers.mg_solver import solve_mg_refined
    x_ref, info_ref = solve_mg_refined(state, b, tol=1e-8)
    assert info8["iters"] == info_ref["iters"]
    assert np.allclose(info8["resvec"], info_ref["resvec"], rtol=1e-5)


@pytest.mark.slow
def test_sharded_refined_pencil_mesh_multirhs():
    state, L = _poisson_state(64, 3)
    rng = np.random.RandomState(2)
    b = rng.rand(L.shape[0], 3)
    solver = make_sharded_refined_solver(state, _mesh(8, (4, 2), ("x", "y")),
                                         axes=("x", "y"))
    x, info = solver.solve_refined(b, tol=1e-8)
    r = b - L.astype(np.float64) @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8
    assert x.shape == b.shape


@pytest.mark.slow
def test_sharded_fgmres_and_cg_match_single_device():
    state, L = _poisson_state(64, 3)
    rng = np.random.RandomState(3)
    b = rng.rand(L.shape[0]).astype(np.float64)
    b /= np.linalg.norm(b)

    s1 = make_sharded_refined_solver(state, _mesh(1))
    s8 = make_sharded_refined_solver(state, _mesh(8))
    for name in ("solve_fgmres", "solve_cg", "solve_bicgstab"):
        x1, i1 = getattr(s1, name)(b, tol=1e-8, max_iter=30)
        x8, i8 = getattr(s8, name)(b, tol=1e-8, max_iter=30)
        assert int(i8["iters"]) == int(i1["iters"]), name
        tr = (np.linalg.norm(b - L.astype(np.float64) @ np.asarray(x8, np.float64))
              / np.linalg.norm(b))
        assert tr < 5e-8, (name, tr)


def test_sharded_fgmres_f32_operands():
    """Hierarchy-precision (f32) Krylov on sharded operands also converges."""
    state, L = _poisson_state(64, 3)
    rng = np.random.RandomState(4)
    b = rng.rand(L.shape[0]).astype(np.float32)
    solver = make_sharded_refined_solver(state, _mesh(8))
    x, info = solver.solve_fgmres(b, tol=1e-6, max_iter=30)
    r = b - L @ np.asarray(x, np.float64)
    # kappa ~ 1e4 (1e-4 relative shift): f32 attainable true residual is
    # ~kappa * eps_f32 ~ 1e-3; deep tolerances go through solve_refined
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-3


def test_sharded_block_cg_multirhs():
    """Shared-Krylov-space block CG on sharded operands."""
    state, L = _poisson_state(64, 3)
    rng = np.random.RandomState(5)
    base = rng.rand(L.shape[0], 1)
    B = (base + 0.05 * rng.rand(L.shape[0], 3)).astype(np.float64)
    solver = make_sharded_refined_solver(state, _mesh(8))
    x_blk, i_blk = solver.solve_cg(B, tol=1e-8, max_iter=30, block=True)
    x_bat, i_bat = solver.solve_cg(B, tol=1e-8, max_iter=30)
    r = np.linalg.norm(B - L.astype(np.float64) @ np.asarray(x_blk), axis=0)
    assert np.all(r / np.linalg.norm(B, axis=0) < 1e-6)
    assert int(i_blk["iters"]) <= int(i_bat["iters"])


def _mixed_elasticity_state(n=32):
    from mgtpu.models.operators import linear_elasticity_operator_mixed
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    mu = np.ones(M.num_cells)
    A = linear_elasticity_operator_mixed(M, mu, mu)
    A = (A + 1e-3 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])
         ).tocsr()
    cfg, rp = get_mg_param(levels=3, relax_type="VankaFaces",
                           relax_param=0.75, nu_pre=1, nu_post=1,
                           dtype=np.float32, max_outer_iter=40,
                           transfer_type="SystemsFacesMixedLinear")
    return mg_setup(A, M, cfg, rp), A


@pytest.mark.slow
def test_sharded_systems_refined_matches_single_chip():
    """End-to-end multi-chip refined solve on the SYSTEMS engine: mixed
    elasticity to TRUE 1e-8 over the 8-device mesh, iteration parity with
    the single-chip solve_mg_refined (block df32 residual both sides)."""
    from mgtpu.parallel.sharded_solve import make_sharded_systems_solver
    from mgtpu.solvers.mg_solver import solve_mg_refined
    state, A = _mixed_elasticity_state(32)
    rng = np.random.RandomState(9)
    b = A @ rng.rand(A.shape[0])
    b /= np.linalg.norm(b)

    solver8 = make_sharded_systems_solver(state, _mesh(8))
    x8, i8 = solver8.solve_refined(b, tol=1e-8)
    tr = (np.linalg.norm(b - A.astype(np.float64) @ x8)
          / np.linalg.norm(b))
    assert tr < 1e-8, tr

    x1, i1 = solve_mg_refined(state, b, tol=1e-8)
    assert abs(int(i8["iters"]) - int(i1["iters"])) <= 1
    # multi-RHS
    B = rng.rand(A.shape[0], 2)
    XB, iB = solver8.solve_refined(B, tol=1e-8)
    rB = np.linalg.norm(B - A.astype(np.float64) @ XB)
    assert rB / np.linalg.norm(B) < 1e-8
