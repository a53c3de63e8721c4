"""GSPMD-partitioned scalar grid engine: slab (1D) and pencil (2D) meshes.

Validated against the single-device cycle on the virtual 8-device CPU mesh
(mirroring the reference's local-process Distributed tests,
test/DomainDecomposition/testDDParallel_Poisson.jl:2-6).
"""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh

from mgtpu import get_regular_mesh, get_mg_param, mg_setup
from mgtpu.models.operators import nodal_laplacian_matrix
from mgtpu.cycle.grid_cycle import GridHierarchy, grid_cycle
from mgtpu.ops.grid_stencil import flat_to_grid, grid_to_flat
from mgtpu.parallel.grid_sharded import make_grid_sharded_cycle


def _poisson_state(n, levels, relax="jacobi", **kw):
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, relax_type=relax, relax_param=0.8,
                           nu_pre=1, nu_post=1, dtype=np.float64, **kw)
    return mg_setup(L, M, cfg, rp), L


def _run_pair(state, L, mesh, axes, cycles=3):
    gh_sh, cycle, to_grid, from_grid = make_grid_sharded_cycle(
        state, mesh, axes=axes)
    rng = np.random.RandomState(3)
    b2 = rng.rand(L.shape[0], 2)
    bg = to_grid(b2)
    xg = jnp.zeros_like(bg)
    for _ in range(cycles):
        xg = cycle(gh_sh, bg, xg)
    x_sh = np.asarray(from_grid(xg))

    cfg = state.config
    bg1 = flat_to_grid(jnp.asarray(b2), state.hier.fine_grid)
    xg1 = jnp.zeros_like(bg1)
    for _ in range(cycles):
        xg1 = grid_cycle(cfg, state.hier, bg1, xg1)
    x_one = np.asarray(grid_to_flat(xg1))
    return x_sh, x_one


def test_grid_sharded_slab_matches_single_device():
    state, L = _poisson_state(32, 3)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    x_sh, x_one = _run_pair(state, L, mesh, ("x",))
    np.testing.assert_allclose(x_sh, x_one, rtol=1e-10, atol=1e-12)


def test_grid_sharded_pencil_matches_single_device():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    state, L = _poisson_state(32, 3)
    x_sh, x_one = _run_pair(state, L, mesh, ("x", "y"))
    np.testing.assert_allclose(x_sh, x_one, rtol=1e-10, atol=1e-12)


def test_grid_sharded_chebyshev_converges():
    state, L = _poisson_state(64, 4, relax="chebyshev", cheby_degree=2)
    mesh = Mesh(np.array(jax.devices()), ("x",))
    gh_sh, cycle, to_grid, from_grid = make_grid_sharded_cycle(state, mesh)
    rng = np.random.RandomState(5)
    b = rng.rand(L.shape[0], 1)
    b /= np.linalg.norm(b)
    bg = to_grid(b)
    xg = jnp.zeros_like(bg)
    for _ in range(6):
        xg = cycle(gh_sh, bg, xg)
    x = np.asarray(from_grid(xg))
    relres = np.linalg.norm(b - L @ x) / np.linalg.norm(b)
    assert relres < 1e-3
