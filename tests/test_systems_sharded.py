"""Sharded systems-grid engine (GSPMD-partitioned) vs single-device cycle.

Runs on the virtual 8-device CPU mesh (conftest), mirroring how the reference
tests its Distributed tier with local processes
(test/DomainDecomposition/testDDParallel_Poisson.jl:2-6).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.sharding import Mesh

from mgtpu import get_regular_mesh, get_mg_param, mg_setup
from mgtpu.models.operators import (linear_elasticity_operator_mixed,
                                    linear_elasticity_operator)
from mgtpu.cycle.systems_grid import (SystemsGridHierarchy,
                                      systems_grid_cycle, block_to_fields,
                                      fields_to_block)
from mgtpu.parallel.systems_sharded import make_systems_sharded_cycle


def _mixed_state(n, levels, relax="VankaFaces"):
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    mu = np.ones(M.num_cells)
    A = linear_elasticity_operator_mixed(M, mu, mu)
    A = (A + 1e-3 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, relax_type=relax, relax_param=0.75,
                           nu_pre=1, nu_post=1,
                           transfer_type="SystemsFacesMixedLinear",
                           dtype=np.float64)
    return mg_setup(A, M, cfg, rp), A


@pytest.mark.slow
def test_systems_sharded_matches_single_device():
    state, A = _mixed_state(16, 3)
    assert isinstance(state.hier, SystemsGridHierarchy)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    gh_sh, cycle, to_fields, from_fields = make_systems_sharded_cycle(
        state, mesh)

    rng = np.random.RandomState(3)
    b2 = rng.rand(A.shape[0], 2)
    bf = to_fields(b2)
    xf = tuple(jnp.zeros_like(t) for t in bf)
    for _ in range(2):
        xf = cycle(gh_sh, bf, xf)
    x_sh = np.asarray(from_fields(xf))

    cfg = state.config
    bf1 = block_to_fields(jnp.asarray(b2), state.hier.fine_grids)
    xf1 = tuple(jnp.zeros_like(t) for t in bf1)
    for _ in range(2):
        xf1 = systems_grid_cycle(cfg, state.hier, bf1, xf1)
    x_one = np.asarray(fields_to_block(xf1))
    np.testing.assert_allclose(x_sh, x_one, rtol=1e-10, atol=1e-11)


@pytest.mark.slow
def test_systems_sharded_converges():
    state, A = _mixed_state(32, 3)
    mesh = Mesh(np.array(jax.devices()), ("x",))   # all 8 virtual devices
    gh_sh, cycle, to_fields, from_fields = make_systems_sharded_cycle(
        state, mesh)
    rng = np.random.RandomState(5)
    b2 = rng.rand(A.shape[0], 1)
    b2 /= np.linalg.norm(b2)
    bf = to_fields(b2)
    xf = tuple(jnp.zeros_like(t) for t in bf)
    for _ in range(8):
        xf = cycle(gh_sh, bf, xf)
    x = np.asarray(from_fields(xf))
    relres = np.linalg.norm(b2 - A @ x) / np.linalg.norm(b2)
    assert relres < 0.05


@pytest.mark.slow
def test_systems_sharded_plain_elasticity():
    """Face-staggered (no pressure) elasticity with SPAI smoothing."""
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [16, 16])
    mu = np.ones(M.num_cells)
    A = linear_elasticity_operator(M, mu, mu)
    A = (A + 1e-3 * abs(A).sum(axis=0).max() * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=3, relax_type="SPAI", relax_param=0.75,
                           nu_pre=2, nu_post=2,
                           transfer_type="SystemsFacesLinear",
                           dtype=np.float64)
    state = mg_setup(A, M, cfg, rp)
    assert isinstance(state.hier, SystemsGridHierarchy)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    gh_sh, cycle, to_fields, from_fields = make_systems_sharded_cycle(
        state, mesh)
    rng = np.random.RandomState(7)
    b2 = rng.rand(A.shape[0], 1)
    bf = to_fields(b2)
    xf = tuple(jnp.zeros_like(t) for t in bf)
    for _ in range(6):
        xf = cycle(gh_sh, bf, xf)
    x = np.asarray(from_fields(xf))
    relres = np.linalg.norm(b2 - A @ x) / np.linalg.norm(b2)
    assert relres < 0.05
