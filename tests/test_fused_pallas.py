"""Fused const-stencil Pallas kernel conformance (interpret mode on CPU).

The fused kernels must reproduce the XLA grid-engine arithmetic: residuals,
jacobi sweeps, and the full V-cycle (forced through the fused path with
MGTPU_FUSED=interpret) against the flat reference cycle.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from mgtpu import get_mg_param, mg_setup, get_regular_mesh
from mgtpu.models.operators import nodal_laplacian_matrix
from mgtpu.ops.grid_stencil import make_grid_stencil, ConstGridStencil
from mgtpu.ops.pallas import fused_const as fk


def _const_stencil(n):
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-3 * sp.identity(L.shape[0])).tocsr()
    A = make_grid_stencil(L, [n + 1, n + 1], dtype=np.float32)
    assert isinstance(A, ConstGridStencil)
    return L, A


def test_fused_residual_and_jacobi_match_scipy():
    n = 24
    L, A = _const_stencil(n)
    N = n + 1
    rng = np.random.RandomState(3)
    x = rng.rand(N, N).astype(np.float32)
    b = rng.rand(N, N).astype(np.float32)
    d = (0.8 / L.diagonal()).astype(np.float32).reshape(N, N)

    r = np.asarray(fk.residual(A, jnp.asarray(b), jnp.asarray(x),
                               interpret=True))
    r_ref = b - (L @ x.reshape(-1)).reshape(N, N).astype(np.float32)
    np.testing.assert_allclose(r, r_ref, rtol=1e-4, atol=1e-3)

    x1 = np.asarray(fk.jacobi_step(A, jnp.asarray(d), jnp.asarray(b),
                                   jnp.asarray(x), interpret=True))
    x1_ref = x + d * r_ref
    np.testing.assert_allclose(x1, x1_ref, rtol=1e-4, atol=1e-3)

    x1b, r1 = fk.jacobi_residual(A, jnp.asarray(d), jnp.asarray(b),
                                 jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(x1b), x1_ref, rtol=1e-4, atol=1e-3)
    r1_ref = b - (L @ x1_ref.reshape(-1)).reshape(N, N)
    np.testing.assert_allclose(np.asarray(r1), r1_ref, rtol=1e-4, atol=1e-3)

    p = rng.rand(N, N).astype(np.float32)
    x2 = np.asarray(fk.correct_jacobi(A, jnp.asarray(d), jnp.asarray(b),
                                      jnp.asarray(x), jnp.asarray(p),
                                      interpret=True))
    u = x + p
    x2_ref = u + d * (b - (L @ u.reshape(-1)).reshape(N, N))
    np.testing.assert_allclose(x2, x2_ref, rtol=1e-4, atol=1e-3)


def test_fused_batched_fields():
    n = 16
    L, A = _const_stencil(n)
    N = n + 1
    rng = np.random.RandomState(5)
    x = rng.rand(3, N, N).astype(np.float32)
    b = rng.rand(3, N, N).astype(np.float32)
    r = np.asarray(fk.residual(A, jnp.asarray(b), jnp.asarray(x),
                               interpret=True))
    for i in range(3):
        ref = b[i] - (L @ x[i].reshape(-1)).reshape(N, N)
        np.testing.assert_allclose(r[i], ref, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_fused_cycle_matches_xla_cycle():
    """Full V-cycle through the fused path == the XLA grid path."""
    from mgtpu.cycle.grid_cycle import grid_cycle
    from mgtpu.ops.grid_stencil import flat_to_grid, grid_to_flat

    n = 32
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-3 * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=3, relax_type="jacobi", relax_param=0.8,
                           nu_pre=2, nu_post=1, dtype=np.float32)
    state = mg_setup(L, M, cfg, rp)
    gh = state.hier
    assert isinstance(gh.levels[0].A, ConstGridStencil)

    rng = np.random.RandomState(7)
    b = jnp.asarray(rng.rand(2, n + 1, n + 1).astype(np.float32))
    x0 = jnp.zeros_like(b)

    os.environ["MGTPU_FUSED"] = "off"
    try:
        x_ref = np.asarray(grid_cycle(cfg, gh, b, x0))
        os.environ["MGTPU_FUSED"] = "interpret"
        x_fused = np.asarray(grid_cycle(cfg, gh, b, x0))
    finally:
        os.environ.pop("MGTPU_FUSED", None)
    np.testing.assert_allclose(x_fused, x_ref, rtol=1e-4, atol=1e-3)
