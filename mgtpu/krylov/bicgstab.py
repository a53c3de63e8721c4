"""Preconditioned BiCGSTAB (device, jittable, batched RHS).

Replaces KrylovMethods.bicgstb/blockBiCGSTB used by the reference drivers
(reference: src/Multigrid/SolveFuncs.jl:85-99).  Per-column batched scalar
recurrences with convergence masking, left preconditioning (the reference
passes the MG cycle as M1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _col_dot(a, b):
    return jnp.sum(a.conj() * b, axis=0)


def _safe_div(num, den):
    return num / jnp.where(den == 0, 1, den)


def bicgstab(matvec, b, prec=None, x0=None, tol: float = 1e-6,
             max_iter: int = 100):
    """Solve A x = b with preconditioned BiCGSTAB. b: (n,) or (n, m)."""
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    X0 = (jnp.zeros_like(B) if x0 is None
          else (x0[:, None] if squeeze else x0))
    M = (lambda r: r) if prec is None else prec

    bnorm = jnp.maximum(jnp.linalg.norm(B, axis=0), 1e-300)
    R0 = B - matvec(X0)
    Rhat = R0
    resvec = jnp.zeros((max_iter + 1, B.shape[1]), dtype=bnorm.dtype)
    resvec = resvec.at[0].set(jnp.linalg.norm(R0, axis=0))
    m = B.shape[1]
    ones = jnp.ones((m,), dtype=B.dtype)
    zerosv = jnp.zeros_like(B)

    def cond(state):
        k, X, R, P, V, rho, alpha, omega, resvec, active = state
        return jnp.logical_and(k < max_iter, jnp.any(active))

    def body(state):
        k, X, R, P, V, rho, alpha, omega, resvec, active = state
        rho_new = _col_dot(Rhat, R)
        beta = _safe_div(rho_new * alpha, rho * omega)
        P = R + (P - V * omega[None, :]) * beta[None, :]
        Ph = M(P)
        V = matvec(Ph)
        alpha = _safe_div(rho_new, _col_dot(Rhat, V))
        S = R - V * alpha[None, :]
        Sh = M(S)
        T = matvec(Sh)
        omega = _safe_div(_col_dot(T, S), _col_dot(T, T))
        upd = Ph * alpha[None, :] + Sh * omega[None, :]
        X = X + jnp.where(active[None, :], upd, 0)
        R = S - T * omega[None, :]
        rn = jnp.linalg.norm(R, axis=0)
        resvec = resvec.at[k + 1].set(jnp.where(active, rn, resvec[k]))
        active = jnp.logical_and(active, rn / bnorm >= tol)
        return (k + 1, X, R, P, V, rho_new, alpha, omega, resvec, active)

    active0 = resvec[0] / bnorm >= tol
    state0 = (0, X0, R0, zerosv, zerosv, ones, ones, ones, resvec, active0)
    k, X, *_r, resvec, _ = jax.lax.while_loop(cond, body, state0)
    info = {"iters": k, "relres": resvec[k] / bnorm, "resvec": resvec}
    return (X[:, 0] if squeeze else X), info
