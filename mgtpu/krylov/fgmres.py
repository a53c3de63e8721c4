"""(Flexible) restarted GMRES (device inner cycle, jittable; batched RHS).

Replaces KrylovMethods.fgmres/blockFGMRES used by the reference drivers
(reference: src/Multigrid/SolveFuncs.jl:120-133, MGcycle.jl:152-168).

Design: the inner Arnoldi cycle of `restart` steps is statically unrolled and
compiles to one XLA program (restart is small: 2-10 for MG-preconditioned
solves); the outer restart loop runs on host with one device sync per restart,
mirroring how the reference drives its host-side Krylov package around the
device cycle.  Right preconditioning: flexible stores Z_i = M(v_i) and
corrects with Z y; non-flexible corrects with M(V y).

Multiple right-hand sides come in two flavors, like the reference:
 * batched (default): independent per-column Arnoldi recurrences, vectorised.
 * block_fgmres: the reference's block-diagonal trick (FGMRES.jl:51-53) —
   the m RHS share one Krylov space over the flattened n*m system.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _col_dot(a, b):
    return jnp.sum(a.conj() * b, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fgmres_cycle(matvec, prec, restart: int, X, B):
    """One restart cycle for all columns; returns updated X and residuals."""
    m = B.shape[1]
    R = B - matvec(X)
    beta = jnp.linalg.norm(R, axis=0)
    safe_beta = jnp.where(beta == 0, 1, beta)
    V = [R / safe_beta[None, :]]
    Z = []
    H = jnp.zeros((restart + 1, restart, m), dtype=B.dtype)
    for i in range(restart):
        z = prec(V[i])
        Z.append(z)
        w = matvec(z)
        # modified Gram-Schmidt, batched per column
        for l in range(i + 1):
            h = _col_dot(V[l], w)
            H = H.at[l, i].set(h)
            w = w - V[l] * h[None, :]
        hnorm = jnp.linalg.norm(w, axis=0)
        H = H.at[i + 1, i].set(hnorm.astype(B.dtype))
        V.append(w / jnp.where(hnorm == 0, 1, hnorm)[None, :])
    # least squares min || beta e1 - H y || per column
    Hb = jnp.transpose(H, (2, 0, 1))                      # (m, k+1, k)
    e1 = jnp.zeros((m, restart + 1), dtype=B.dtype).at[:, 0].set(beta)
    # normal equations on the small (k+1) x k system, regularised pinv
    G = jnp.einsum("mki,mkj->mij", Hb.conj(), Hb)
    c = jnp.einsum("mki,mk->mi", Hb.conj(), e1)
    # pinv tolerates happy breakdown (rank-deficient H on exact convergence)
    y = jnp.einsum("mij,mj->mi", jnp.linalg.pinv(G, rtol=1e-12), c)
    Zs = jnp.stack(Z, axis=2)                             # (n, m, k)
    X = X + jnp.einsum("nmk,mk->nm", Zs, y)
    Rn = B - matvec(X)
    return X, jnp.linalg.norm(Rn, axis=0)


def fgmres(matvec, b, restart: int = 5, prec=None, x0=None, tol: float = 1e-6,
           max_iter: int = 10, flexible: bool = True, verbose: bool = False):
    """Restarted (F)GMRES: max_iter outer restarts of `restart` inner steps."""
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    X = (jnp.zeros_like(B) if x0 is None
         else (x0[:, None] if squeeze else x0))
    M = (lambda r: r) if prec is None else prec
    if not flexible:
        # right-preconditioned standard GMRES: solve (A M) u = r, x += M u.
        # Closures built once so the jitted inner cycle is traced once.
        prec_mv = lambda v: matvec(M(v))
        identity = lambda v: v

    bnorm = float(jnp.max(jnp.linalg.norm(B, axis=0)))
    bnorm = max(bnorm, 1e-300)
    resvec = [np.asarray(jnp.linalg.norm(B - matvec(X), axis=0))]
    iters = 0
    for outer in range(max_iter):
        if flexible:
            X, rn = _fgmres_cycle(matvec, M, restart, X, B)
        else:
            Xp, rn = _fgmres_cycle(prec_mv, identity, restart,
                                   jnp.zeros_like(X), B - matvec(X))
            X = X + M(Xp)
            rn = jnp.linalg.norm(B - matvec(X), axis=0)
        iters += 1
        resvec.append(np.asarray(rn))
        rel = float(jnp.max(rn)) / bnorm
        if verbose:
            print(f"fgmres restart {outer + 1}: relres {rel:.3e}")
        if rel < tol:
            break
    info = {"iters": iters, "relres": rel, "resvec": np.array(resvec)}
    return (X[:, 0] if squeeze else X), info


def block_fgmres(matvec, b, restart: int = 5, prec=None, x0=None,
                 tol: float = 1e-6, max_iter: int = 10, flexible: bool = True,
                 verbose: bool = False):
    """Block FGMRES via the reference's flattened block-diagonal system trick
    (FGMRES.jl:51-53): all RHS share a single Krylov space of n*m vectors."""
    n, m = b.shape

    def flat_mv(v):
        return matvec(v.reshape(n, m)).reshape(n * m, -1)

    flat_prec = None
    if prec is not None:
        flat_prec = lambda v: prec(v.reshape(n, m)).reshape(n * m, -1)
    x0f = None if x0 is None else x0.reshape(n * m, 1)
    xf, info = fgmres(flat_mv, b.reshape(n * m, 1), restart, flat_prec, x0f,
                      tol, max_iter, flexible, verbose)
    return xf.reshape(n, m), info
