"""Solver facades: the reference's AbstractSolver adapter layer (L4).

Equivalents of MGWrapper.jl (MGsolver) and SAAMGWrapper.jl (SA_AMGsolver):
lazy hierarchy setup on first solve, adjoint-solve synchronisation via
hierarchy transposition, a Krylov-method switch (GMRES / PCG / BiCGSTAB /
stand-alone MG), and accumulated setup/solve timing + iteration counters
(reference MGWrapper.jl:6-104, SAAMGWrapper.jl:6-95).
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..setup.hierarchy import (MGConfig, MGState, mg_setup, hierarchy_exists,
                               transpose_hierarchy, copy_solver as _copy_state,
                               clear as _clear_state)
from ..setup.sa_amg import sa_amg_setup
from ..setup.classical_amg import classical_amg_setup
from .mg_solver import (solve_mg, solve_cg_mg, solve_gmres_mg,
                        solve_bicgstab_mg)

__all__ = ["MGSolver", "SAAMGSolver", "ClassicalAMGSolver"]


class MGSolver:
    """Geometric-MG AbstractSolver adapter.

    sym: 1 = SPD (adjoint solve == solve), 0/2 = general (hierarchy is
    transposed when the requested transpose state differs — reference
    MGWrapper.jl:50-64).
    """

    setup_fn = staticmethod(mg_setup)
    needs_mesh = True

    def __init__(self, cfg: MGConfig, relax_param, mesh=None, sym: int = 1,
                 krylov: str = "gmres", out: int = -1, gmres_inner: int = 5):
        self.cfg = cfg
        self.relax_param = relax_param
        self.mesh = mesh
        self.sym = sym
        self.krylov = krylov.lower()
        self.out = out
        self.gmres_inner = gmres_inner
        self.state: MGState | None = None
        self.n_iter = 0
        self.time_setup = 0.0
        self.time_solve = 0.0
        self._do_transpose = 0

    # -- setup -------------------------------------------------------------
    def _ensure_setup(self, A, transpose: bool):
        verbose = self.out > 0
        if not hierarchy_exists(self.state):
            if self.needs_mesh:
                self.state = self.setup_fn(A, self.mesh, self.cfg,
                                           self.relax_param, verbose=verbose)
            else:
                self.state = self.setup_fn(A, self.cfg, self.relax_param,
                                           verbose=verbose)
            self._do_transpose = 0
        want = int(transpose)
        if self.sym != 1 and want != self._do_transpose:
            transpose_hierarchy(self.state)
            self._do_transpose = want
        self.time_setup = self.state.time_setup

    def setup_solver(self, A):
        self._ensure_setup(A, transpose=False)
        return self

    # -- solve (reference solveLinearSystem!, MGWrapper.jl:27-86) -----------
    def solve_linear_system(self, A, B, X=None, transpose: bool = False):
        B = np.asarray(B)
        if B.size and np.linalg.norm(B) == 0.0:
            return np.zeros_like(B)
        self._ensure_setup(A, transpose)
        verbose = self.out > 0
        if self.krylov == "bicgstab":
            X, info = solve_bicgstab_mg(self.state, B, X, verbose=verbose)
        elif self.krylov in ("gmres", "fgmres"):
            X, info = solve_gmres_mg(self.state, B, X, inner=self.gmres_inner,
                                     verbose=verbose)
        elif self.krylov in ("pcg", "cg"):
            X, info = solve_cg_mg(self.state, B, X, verbose=verbose)
        else:
            X, info = solve_mg(self.state, B, X, verbose=verbose)
        self.n_iter += int(info["iters"]) * (B.shape[1] if B.ndim == 2 else 1)
        self.time_solve = self.state.time_solve
        return X

    # -- lifecycle ----------------------------------------------------------
    def copy(self):
        c = type(self)(self.cfg, self.relax_param, self.mesh, self.sym,
                       self.krylov, self.out, self.gmres_inner)
        return c

    def clear(self):
        if self.state is not None:
            _clear_state(self.state)
        self.state = None


class SAAMGSolver(MGSolver):
    """SA-AMG AbstractSolver adapter (reference SAAMGWrapper.jl; symmetric
    systems — the reference warns and the SA setup requires symm=true)."""

    setup_fn = staticmethod(sa_amg_setup)
    needs_mesh = False


class ClassicalAMGSolver(MGSolver):
    """Classical-AMG AbstractSolver adapter (same facade over
    ClassicalAMGsetup)."""

    setup_fn = staticmethod(classical_amg_setup)
    needs_mesh = False
