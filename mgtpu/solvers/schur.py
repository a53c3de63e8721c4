"""Schur-complement solver for mixed 2x2 block systems with diagonal (2,2)
block.

Equivalent of the reference's SchurCompSolver (src/Multigrid/SchurCompSolver.jl):
for A_full = [[A, B], [C^T, D]] with D diagonal (mixed-formulation elasticity /
Stokes coarse systems), eliminate the pressure block:
    S = A - B D^{-1} C^T
    u1 = S^{-1} (q1 - B D^{-1} q2)
    u2 = D^{-1} (q2 - C^T u1)
S is solved with a pluggable inner solver: dense device LU (default) or a
hybrid-Kaczmarz-preconditioned fixed-step FGMRES (the reference's
hybridKaczmarz option, SchurCompSolver.jl:37-40,77-84).  The device state is a
pytree whose `solve` is jax-traceable, so it can serve as the MG coarsest
solver inside the jitted cycle (reference MGsetup.jl:327-331).

The split point is n_cut = n_total - num_cells (pressure dofs = cells),
mirroring SchurCompSolver.jl:28.
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.ell import ELL, ell_from_scipy
from ..cycle.coarse import DenseLU, dense_lu_from_scipy


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["kz", "ell"], meta_fields=["inner"])
@dataclass(frozen=True)
class KaczmarzFGMRESSolver:
    """Fixed-step FGMRES preconditioned by hybrid Kaczmarz sweeps (traceable)."""
    kz: object          # KaczmarzRelax
    ell: ELL
    inner: int

    def solve(self, b):
        from ..cycle.relax import fgmres_relaxation
        from ..cycle.kaczmarz import kaczmarz_sweep
        squeeze = b.ndim == 1
        bb = b[:, None] if squeeze else b
        prec = lambda r: kaczmarz_sweep(jnp.zeros_like(r), r, self.kz)
        x = fgmres_relaxation(self.ell.matvec, prec, bb, jnp.zeros_like(bb),
                              self.inner)
        return x[:, 0] if squeeze else x


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["B", "CT", "Dinv", "s_solver"],
                   meta_fields=["n_cut"])
@dataclass(frozen=True)
class SchurCoarse:
    """Device pytree applying the pressure-eliminated solve (traceable)."""
    B: ELL
    CT: ELL
    Dinv: jax.Array
    s_solver: object       # DenseLU | KaczmarzFGMRESSolver
    n_cut: int

    def solve(self, b):
        squeeze = b.ndim == 1
        bb = b[:, None] if squeeze else b
        q1, q2 = bb[: self.n_cut], bb[self.n_cut:]
        dinv = self.Dinv[:, None]
        u1 = self.s_solver.solve(q1 - self.B.matvec(dinv * q2))
        u2 = dinv * (q2 - self.CT.matvec(u1))
        x = jnp.concatenate([u1, u2], axis=0)
        return x[:, 0] if squeeze else x


class SchurComplementSolver:
    """Host-side handle with lifecycle + counters (reference
    SchurCompSolver.jl:3-51 surface: setup/solve/copy/clear, fac/solve timers)."""

    def __init__(self, inner: str = "dense", dtype=None,
                 kaczmarz_opts: dict | None = None):
        self.inner = inner
        self.dtype = dtype
        self.kaczmarz_opts = kaczmarz_opts or {}
        self.mesh = None
        self.dev: SchurCoarse | None = None
        self.n_fac = 0
        self.fac_time = 0.0
        self.n_solve = 0
        self.solve_time = 0.0

    def setup(self, A_full: sp.spmatrix, mesh) -> "SchurComplementSolver":
        t0 = time.perf_counter()
        A_full = sp.csr_matrix(A_full)
        if self.dtype is not None:
            A_full = A_full.astype(self.dtype)
        n_cut = A_full.shape[0] - int(np.prod(mesh.n))
        A = A_full[:n_cut, :n_cut].tocsr()
        B = A_full[:n_cut, n_cut:].tocsr()
        CT = A_full[n_cut:, :n_cut].tocsr()
        Dinv = 1.0 / A_full[n_cut:, n_cut:].diagonal()
        S = (A - B @ sp.diags(Dinv) @ CT).tocsr()

        if self.inner == "dense":
            s_solver = dense_lu_from_scipy(S, dtype=self.dtype)
        elif self.inner == "kaczmarz":
            from ..cycle.kaczmarz import setup_hybrid_kaczmarz
            from ..dd.indices import faces_staggered_indices_of_box_no_pressure
            opts = self.kaczmarz_opts
            kz = setup_hybrid_kaczmarz(
                S, mesh, opts.get("num_domains", [2] * mesh.dim),
                opts.get("index_fn", faces_staggered_indices_of_box_no_pressure),
                opts.get("omega", 0.5), opts.get("num_it", 2),
                dtype=self.dtype)
            s_solver = KaczmarzFGMRESSolver(kz, ell_from_scipy(S, dtype=self.dtype),
                                            opts.get("inner", 10))
        else:
            raise ValueError("inner must be 'dense' or 'kaczmarz'")

        self.dev = SchurCoarse(ell_from_scipy(B, dtype=self.dtype),
                               ell_from_scipy(CT, dtype=self.dtype),
                               jnp.asarray(Dinv), s_solver, int(n_cut))
        self.mesh = mesh
        self.n_fac += 1
        self.fac_time += time.perf_counter() - t0
        return self

    @property
    def is_setup(self) -> bool:
        return self.dev is not None

    def solve(self, b):
        t0 = time.perf_counter()
        x = self.dev.solve(jnp.asarray(b))
        self.n_solve += 1
        self.solve_time += time.perf_counter() - t0
        return x

    def solve_linear_system(self, A_full, b, mesh=None, x=None):
        """Lazy-setup solve (reference solveLinearSystem!, SchurCompSolver.jl:55-93)."""
        if not self.is_setup:
            self.setup(A_full, mesh if mesh is not None else self.mesh)
        return self.solve(b)

    # coarse-solver protocol: plug as the MG coarsest solve (MGsetup.jl:327-331)
    def setup_coarse(self, A_full: sp.spmatrix, mesh):
        self.setup(A_full, mesh)
        return self.dev

    def copy(self) -> "SchurComplementSolver":
        return SchurComplementSolver(self.inner, self.dtype, self.kaczmarz_opts)

    def clear(self) -> None:
        self.dev = None
