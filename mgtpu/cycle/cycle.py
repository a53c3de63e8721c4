"""Recursive multigrid cycle engine (device, jittable end-to-end).

Equivalent of the reference's recursiveCycle (src/Multigrid/MGcycle.jl:1-118):
pre-smooth, restrict the residual, solve/recurse on the coarse level
(V once, W twice, F as F-then-V, K via a 2-step FGMRES accelerated by the
coarser cycle — MGcycle.jl:72-84), prolongate-correct, post-smooth.

The recursion is unrolled over the (static) level count at trace time, so the
whole cycle compiles to one XLA program with no host round-trips — the
functional counterpart of the reference's preallocated CYCLEmem design
(zero allocation in the hot path, MGdef.jl:56-60).  All vectors are (n, nrhs):
multiple right-hand sides are first-class, as in the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..setup.hierarchy import MGConfig, Hierarchy, VANKA_TYPES
from .relax import (relax_diag, fgmres_relaxation, chebyshev_smooth,
                    chebyshev4_smooth)
from .vanka import vanka_sweep
from .kaczmarz import kaczmarz_sweep


def _smooth(cfg: MGConfig, level, r, x, b, nu: int, matvec):
    """Dispatch one smoothing stage (reference MGcycle.jl:46-55)."""
    if nu <= 0:
        return x
    rt = cfg.relax_type
    if rt == "jac-gmres":
        d = level.relax.d[:, None]
        return fgmres_relaxation(matvec, lambda v: d * v, r, x, nu,
                                 axis_name=cfg.axis_name)
    if rt == "chebyshev":
        return chebyshev_smooth(matvec, level.relax.d[:, None],
                                level.relax.lam_max, cfg.cheby_degree * nu,
                                cfg.cheby_frac, r, x, b)
    if rt == "chebyshev4":
        return chebyshev4_smooth(matvec, level.relax.d[:, None],
                                 level.relax.lam_max, cfg.cheby_degree * nu,
                                 r, x)
    if rt == "line-jacobi":
        raise ValueError("line-jacobi is a grid-engine smoother (regular "
                         "meshes with full-weighting transfers)")
    if rt in VANKA_TYPES:
        return vanka_sweep(x, b, level.relax, nu)
    if rt == "hybrid-kaczmarz":
        return kaczmarz_sweep(x, b, level.relax, nu * level.relax.num_it)
    return relax_diag(matvec, r, x, b, level.relax.d, nu)


def recursive_cycle(cfg: MGConfig, hier: Hierarchy, b, x, level: int = 0,
                    ctype: str | None = None, x_zero: bool = False):
    """One multigrid cycle at `level`; b, x are (n, nrhs) device arrays.

    `x_zero` (static) declares the incoming iterate exactly zero (every
    coarse-level entry, and the refined drivers' correction cycles): the
    entry residual is b itself and the r = b - A*0 matvec is skipped —
    one matvec (and, in the partitioned tier, its halo exchange) saved per
    level per cycle.  Bitwise-identical on the XLA engines; the fused 3D
    path is float32-equivalent (see grid_cycle's docstring)."""
    from .grid_cycle import GridHierarchy, grid_cycle_flat
    if isinstance(hier, GridHierarchy):
        # structured zero-gather engine; (n, m) <-> (m, *grid) at the boundary
        return grid_cycle_flat(cfg, hier, b, x, ctype, x_zero=x_zero)
    from .systems_grid import SystemsGridHierarchy, systems_grid_cycle_flat
    if isinstance(hier, SystemsGridHierarchy):
        return systems_grid_cycle_flat(cfg, hier, b, x, ctype, x_zero=x_zero)
    ctype = cfg.cycle_type if ctype is None else ctype
    nlev = len(hier.levels)
    if level == nlev - 1:
        # single-level degenerate case: exact coarse solve only
        return hier.coarse.solve(b)

    lvl = hier.levels[level]
    matvec = lvl.A.matvec
    with jax.named_scope(f"mg_level{level}"):
        r = b if x_zero else b - matvec(x)
        x = _smooth(cfg, lvl, r, x, b, cfg.nu_pre[level], matvec)

        r = b - matvec(x) if cfg.nu_pre[level] > 0 or not x_zero else b
        bc = lvl.R.matvec(r)
        xc0 = jnp.zeros((lvl.R.shape[0], b.shape[1]), dtype=b.dtype)
        if level == nlev - 2:
            with jax.named_scope("mg_coarsest"):
                xc = hier.coarse.solve(bc)
        elif ctype == "K":
            # Krylov cycle: 2-step FGMRES preconditioned by the coarser cycle
            coarse_mv = hier.levels[level + 1].A.matvec
            prec = lambda v: recursive_cycle(cfg, hier, v, jnp.zeros_like(v),
                                             level + 1, "K", x_zero=True)
            xc = fgmres_relaxation(coarse_mv, prec, bc, xc0, cfg.kcycle_inner,
                                   axis_name=cfg.axis_name)
        else:
            xc = recursive_cycle(cfg, hier, bc, xc0, level + 1, ctype,
                                 x_zero=True)
            if ctype == "W":
                xc = recursive_cycle(cfg, hier, bc, xc, level + 1, "W")
            elif ctype == "F":
                xc = recursive_cycle(cfg, hier, bc, xc, level + 1, "V")

        x = x + lvl.P.matvec(xc)

        r = b - matvec(x)
        x = _smooth(cfg, lvl, r, x, b, cfg.nu_post[level], matvec)
    return x


@functools.partial(jax.jit, static_argnums=(0, 4))
def cycle_jit(cfg: MGConfig, hier: Hierarchy, b, x, x_zero: bool = False):
    return recursive_cycle(cfg, hier, b, x, x_zero=x_zero)


def make_cycle_fn(cfg: MGConfig):
    """Jitted single-cycle application closed over the static config."""
    return functools.partial(cycle_jit, cfg)
