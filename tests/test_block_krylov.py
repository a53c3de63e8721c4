"""Shared-Krylov-space block CG / Bl-BiCGSTAB (reference blockCG/blockBiCGSTB
dispatch, SolveFuncs.jl:91-96,109-114,126-131)."""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from mgtpu import get_regular_mesh, get_mg_param, mg_setup
from mgtpu.models.operators import nodal_div_sig_grad_matrix
from mgtpu.krylov.cg import pcg
from mgtpu.krylov.bicgstab import bicgstab
from mgtpu.krylov.block import block_pcg, block_bicgstab


def _spd(n=400, seed=0):
    rng = np.random.RandomState(seed)
    Q = sp.random(n, n, density=0.02, random_state=rng)
    A = (Q @ Q.T + n * sp.identity(n)).tocsr()
    return A


def test_block_pcg_converges_and_shares_space():
    A = _spd()
    n = A.shape[0]
    rng = np.random.RandomState(1)
    # related RHS: shared dominant component + small perturbations — the
    # regime where one shared space beats independent recurrences
    base = rng.rand(n, 1)
    B = base + 0.05 * rng.rand(n, 4)
    Ad = jnp.asarray(A.todense(), jnp.float64)
    mv = lambda X: Ad @ X
    Bj = jnp.asarray(B)
    x_b, inf_b = block_pcg(mv, Bj, tol=1e-10, max_iter=200)
    x_s, inf_s = pcg(mv, Bj, tol=1e-10, max_iter=200)
    r_b = np.linalg.norm(B - A @ np.asarray(x_b), axis=0)
    assert np.all(r_b / np.linalg.norm(B, axis=0) < 1e-8)
    assert int(inf_b["iters"]) <= int(inf_s["iters"])


def test_block_bicgstab_nonsymmetric():
    n = 300
    rng = np.random.RandomState(2)
    A = (sp.random(n, n, density=0.03, random_state=rng)
         + n * sp.identity(n)).tocsr()
    B = rng.rand(n, 3)
    Ad = jnp.asarray(A.todense(), jnp.float64)
    x, info = block_bicgstab(lambda X: Ad @ X, jnp.asarray(B), tol=1e-10,
                             max_iter=200)
    r = np.linalg.norm(B - A @ np.asarray(x), axis=0)
    assert np.all(r / np.linalg.norm(B, axis=0) < 1e-8)


@pytest.mark.slow
def test_solve_cg_mg_block_parity_divsiggrad():
    """4-RHS DivSigGrad MG-preconditioned solve (testLinSolveMGWrapper.jl:33-39
    analog): block CG reaches tol in no more iterations than batched CG."""
    from mgtpu import solve_cg_mg, solve_bicgstab_mg
    n = 64
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    rng = np.random.RandomState(3)
    sig = np.exp(rng.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, sig)
    A = (A + 1e-4 * abs(A).sum(0).max() * sp.identity(A.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=3, relax_type="jacobi", relax_param=0.8,
                           nu_pre=2, nu_post=2, relative_tol=1e-8,
                           max_outer_iter=30, dtype=np.float64)
    st = mg_setup(A, M, cfg, rp)
    B = rng.rand(A.shape[0], 4)

    x_blk, i_blk = solve_cg_mg(st, B, block=True)
    x_bat, i_bat = solve_cg_mg(st, B)
    r = np.linalg.norm(B - A @ np.asarray(x_blk), axis=0)
    assert np.all(r / np.linalg.norm(B, axis=0) < 1e-6)
    assert int(i_blk["iters"]) <= int(i_bat["iters"])

    x_bs, i_bs = solve_bicgstab_mg(st, B, block=True)
    r2 = np.linalg.norm(B - A @ np.asarray(x_bs), axis=0)
    assert np.all(r2 / np.linalg.norm(B, axis=0) < 1e-6)


def test_block_pcg_leading_batch_layout():
    A = _spd(256, seed=4)
    rng = np.random.RandomState(5)
    B = rng.rand(3, 256)                      # (m, *space)
    Ad = jnp.asarray(A.todense(), jnp.float64)
    mv = lambda X: (Ad @ X.T).T
    x, info = block_pcg(mv, jnp.asarray(B), tol=1e-10, max_iter=200,
                        batch_leading=True)
    r = np.linalg.norm(B.T - A @ np.asarray(x).T, axis=0)
    assert np.all(r / np.linalg.norm(B.T, axis=0) < 1e-8)
