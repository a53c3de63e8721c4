"""Sharded multigrid vs single-chip hierarchy: numerical agreement on a
virtual 8-device CPU mesh (SURVEY.md §5 multi-host mapping; tested the way the
reference tests its Distributed tier — locally, testDDParallel_Poisson.jl)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mgtpu import get_mg_param, mg_setup, get_regular_mesh, make_cycle_fn
from mgtpu.models.operators import nodal_laplacian_matrix, nodal_div_sig_grad_matrix
from mgtpu.parallel.sharded import (build_sharded_mg, make_sharded_cycle,
                                    make_sharded_solver)


def _mesh_1d_devices():
    return jax.sharding.Mesh(np.array(jax.devices()), ("x",))


def _setup(n=64, levels=3, shift=1e-4):
    import scipy.sparse as sp
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    if shift:
        # keep the coarse LU well-conditioned so the agreement check is not
        # dominated by the singular Neumann nullspace
        L = (L + shift * abs(L).sum(axis=0).max() *
             sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, max_outer_iter=5, relative_tol=1e-12,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(L, M, cfg, rp)
    return M, L, state


@pytest.mark.slow
def test_sharded_cycle_matches_single_chip():
    M, L, state = _setup(64, 3)
    mesh = _mesh_1d_devices()
    mg, step_fn, to_grid, from_grid = make_sharded_solver(state, mesh,
                                                          dtype=np.float64)
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)

    # single-chip reference cycle
    cyc = make_cycle_fn(state.config)
    x_ref = cyc(state.hier, jnp.asarray(b)[:, None],
                jnp.zeros((L.shape[0], 1)))

    bg = to_grid(b)
    xg, rn = step_fn(mg, bg, jnp.zeros_like(bg))
    x_sh = from_grid(xg)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-10, atol=1e-12)
    # psum-reduced residual norm equals the true residual norm
    r_true = np.linalg.norm(b - L @ np.asarray(x_sh)[:, 0])
    assert abs(float(rn) - r_true) < 1e-10


def test_sharded_converges_to_contract():
    """The sharded solve meets the same convergence contract as single-chip."""
    M, L, state = _setup(128, 4, shift=0.0)
    mesh = _mesh_1d_devices()
    mg, step_fn, to_grid, from_grid = make_sharded_solver(state, mesh,
                                                          dtype=np.float64)
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)
    xg = to_grid(np.zeros_like(b))
    bg = to_grid(b)
    for _ in range(5):
        xg, rn = step_fn(mg, bg, xg)
    x = np.asarray(from_grid(xg))[:, 0]
    assert np.linalg.norm(L @ x - b) < 0.005


def test_sharded_variable_coefficients_multirhs():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [64, 64])
    import scipy.sparse as sp
    sig = np.exp(0.3 * np.random.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, sig)
    A = (A + 1e-4 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-12,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(A, M, cfg, rp)
    mesh = _mesh_1d_devices()
    mg, step_fn, to_grid, from_grid = make_sharded_solver(state, mesh,
                                                          dtype=np.float64)
    B = A @ np.random.rand(A.shape[0], 2)
    B /= np.linalg.norm(B)
    cyc = make_cycle_fn(state.config)
    X_ref = cyc(state.hier, jnp.asarray(B), jnp.zeros_like(jnp.asarray(B)))
    Xg, _ = step_fn(mg, to_grid(B), to_grid(np.zeros_like(B)))
    np.testing.assert_allclose(np.asarray(from_grid(Xg)), np.asarray(X_ref),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_sharded_3d():
    """3D sharded hierarchy (slab along the 3rd dim, 27-point stencils)."""
    import scipy.sparse as sp
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0, 0.0, 1.0], [16, 16, 16])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=3, max_outer_iter=5, relative_tol=1e-12,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=1, nu_post=1)
    state = mg_setup(L, M, cfg, rp)
    mesh = _mesh_1d_devices()
    mg, step_fn, to_grid, from_grid = make_sharded_solver(state, mesh,
                                                          dtype=np.float64)
    b = L @ np.random.rand(L.shape[0])
    b /= np.linalg.norm(b)
    cyc = make_cycle_fn(state.config)
    x_ref = cyc(state.hier, jnp.asarray(b)[:, None],
                jnp.zeros((L.shape[0], 1)))
    xg, _ = step_fn(mg, to_grid(b), to_grid(np.zeros_like(b)))
    np.testing.assert_allclose(np.asarray(from_grid(xg)), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-11)
