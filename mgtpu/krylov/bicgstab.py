"""Preconditioned BiCGSTAB (device, jittable, batched RHS).

Replaces KrylovMethods.bicgstb/blockBiCGSTB used by the reference drivers
(reference: src/Multigrid/SolveFuncs.jl:85-99).  Per-column batched scalar
recurrences with convergence masking, left preconditioning (the reference
passes the MG cycle as M1).  Supports the leading-batch (m, *space) layout
via `batch_leading=True` (see krylov._layout).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ._layout import Layout


def _safe_div(num, den):
    return num / jnp.where(den == 0, 1, den)


def bicgstab(matvec, b, prec=None, x0=None, tol: float = 1e-6,
             max_iter: int = 100, batch_leading: bool = False):
    """Solve A x = b with preconditioned BiCGSTAB.

    b: (n,), (n, m), or (m, *space) with batch_leading."""
    squeeze = b.ndim == 1 and not batch_leading
    B = b[:, None] if squeeze else b
    X0 = (jnp.zeros_like(B) if x0 is None
          else (x0[:, None] if squeeze else x0))
    M = (lambda r: r) if prec is None else prec
    lay = Layout(B, batch_leading)

    bnorm = jnp.maximum(lay.norm(B), 1e-300)
    R0 = B - matvec(X0)
    Rhat = R0
    resvec = jnp.zeros((max_iter + 1, lay.nbatch), dtype=bnorm.dtype)
    resvec = resvec.at[0].set(lay.norm(R0))
    ones = jnp.ones((lay.nbatch,), dtype=B.dtype)
    zerosv = jnp.zeros_like(B)

    def cond(state):
        k, X, R, P, V, rho, alpha, omega, resvec, active = state
        return jnp.logical_and(k < max_iter, jnp.any(active))

    def body(state):
        k, X, R, P, V, rho, alpha, omega, resvec, active = state
        rho_new = lay.dot(Rhat, R)
        beta = _safe_div(rho_new * alpha, rho * omega)
        P = R + lay.scale(P - lay.scale(V, omega), beta)
        Ph = M(P)
        V = matvec(Ph)
        alpha = _safe_div(rho_new, lay.dot(Rhat, V))
        S = R - lay.scale(V, alpha)
        Sh = M(S)
        T = matvec(Sh)
        omega = _safe_div(lay.dot(T, S), lay.dot(T, T))
        upd = lay.scale(Ph, alpha) + lay.scale(Sh, omega)
        X = X + lay.scale(upd, active.astype(B.dtype))
        R = S - lay.scale(T, omega)
        rn = lay.norm(R)
        resvec = resvec.at[k + 1].set(jnp.where(active, rn, resvec[k]))
        active = jnp.logical_and(active, rn / bnorm >= tol)
        return (k + 1, X, R, P, V, rho_new, alpha, omega, resvec, active)

    active0 = resvec[0] / bnorm >= tol
    state0 = (0, X0, R0, zerosv, zerosv, ones, ones, ones, resvec, active0)
    k, X, *_r, resvec, _ = jax.lax.while_loop(cond, body, state0)
    info = {"iters": k, "relres": resvec[k] / bnorm, "resvec": resvec}
    return (X[:, 0] if squeeze else X), info
