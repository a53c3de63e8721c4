"""Grid-form multigrid cycle — the structured zero-gather engine.

Numerically identical to the flat cycle (mgtpu.cycle.cycle) on geometric
full-weighting hierarchies, but every operation is expressed on the node grid:

 * level operators are `GridStencil`s (shift-multiply-accumulate SpMV),
 * P/R are applied matrix-free as separable [0.5, 1, 0.5] tensor-product
   smoothing + up/down-sampling (exactly the operators fw_interp builds for
   odd node counts, reference GeometricTransferOperators.jl:22-46, including
   the boundary rows, because zero-padded smoothing truncates the same way),
 * the coarsest solve is one dense matmul with a host-precomputed inverse
   (the TPU-idiomatic form of the reference's replicated coarsest LU,
   MGsetup.jl:350 — triangular solves are sequential and slow on TPU, a
   (nc x nc) @ (nc x m) matmul is MXU work).

Fields are (m, *grid) with the fastest mesh axis last = TPU lanes; the flat
(n, m) layout with m=1 wastes 127/128 lanes on every elementwise op and —
worse — makes ELL-gather transfers the cycle bottleneck.  Measured on the
1024^2 Poisson benchmark this engine removes ~97% of the flat cycle's device
time (see BASELINE.md).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np
import scipy.sparse as sp

from ..ops.grid_stencil import (GridStencil, make_grid_stencil,
                                flat_to_grid, grid_to_flat)
from .relax import fgmres_relaxation

__all__ = [
    "GridLevel", "GridHierarchy", "DenseInverse", "GridIterativeCoarse",
    "grid_dense_inverse_from_scipy",
    "grid_restrict", "grid_prolong", "grid_cycle", "build_grid_hierarchy",
]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["A", "d", "P1"], meta_fields=["lam"])
@dataclass(frozen=True)
class GridLevel:
    A: GridStencil
    d: jax.Array | None      # pointwise relax diagonal, grid-shaped
    P1: tuple | None         # per-grid-axis dense 1D prolongation (f_a, c_a)
    lam: float | None = None  # spec(D^-1 A) bound (chebyshev smoothing)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["inv"], meta_fields=["grid"])
@dataclass(frozen=True)
class DenseInverse:
    """Replicated dense inverse of the coarsest operator (one matmul/solve)."""
    inv: jax.Array           # (nc, nc)
    grid: tuple[int, ...]

    def solve(self, bg: jax.Array) -> jax.Array:
        """bg: (m, *grid) -> (m, *grid)."""
        m = bg.shape[0]
        xf = bg.reshape(m, -1) @ self.inv.T
        return xf.reshape((m,) + self.grid)


@functools.partial(jax.jit, static_argnames=("n", "shift_rel"))
def _dense_inverse_device(rows, cols, data, n, shift_rel):
    """COO -> dense (+ optional relative diagonal shift) + LU + invert, all
    on device.  Returns (inv, err): err is the max identity residual
    |A inv - I| over a 256-column stride sample — the host uses it to decide
    whether an UNSHIFTED inverse is trustworthy (ADVICE r2: the shift must
    not perturb well-conditioned nonsingular coarsest operators).

    The inverse comes from lu_solve against the identity: the n-RHS
    triangular solves are blocked matmuls (MXU work, tens of ms at
    nc ~ 16k), whereas per-cycle single-RHS triangular solves are
    latency-bound on TPU (measured 15 ms vs 0.3 ms for the DenseInverse
    matmul on the SA-AMG 512^2 coarse level) — so the factorization is a
    setup-time device step and the cycle keeps the one-matmul solve."""
    Ad = jnp.zeros((n, n), dtype=data.dtype).at[rows, cols].add(data)
    if shift_rel:
        sh = shift_rel * jnp.max(jnp.sum(jnp.abs(Ad), axis=0))
        Ad = Ad + sh * jnp.eye(n, dtype=Ad.dtype)
    lu, piv = jsl.lu_factor(Ad)
    inv = jsl.lu_solve((lu, piv), jnp.eye(n, dtype=Ad.dtype))
    cols_s = jnp.arange(0, n, max(1, n // 256))
    eye_s = (cols_s[None, :] == jnp.arange(n)[:, None]).astype(inv.dtype)
    err = jnp.max(jnp.abs(Ad @ inv[:, cols_s] - eye_s))
    return inv, err


def grid_dense_inverse_from_scipy(A_c: sp.spmatrix, grid_c,
                                  dtype) -> DenseInverse:
    """Device-built dense inverse for large coarsest levels (reference bar:
    UMFPACK factors ANY coarsest size, MGsetup.jl:350).

    No O(nc^3) host inversion (measured 7.2 s at nc = 4913 on the bench
    host).  The plain inverse is tried first; only if its sampled identity
    residual is non-finite or large (near-singular coarsest, e.g. a Neumann
    constant nullspace) is the reference's AMG coarsest regularization
    applied (SA-AMG.jl:63), widened to 1e-6 in single precision where a
    1e-8 relative perturbation of the diagonal underflows f32 addition."""
    Ac = A_c.tocoo()
    args = (jnp.asarray(Ac.row), jnp.asarray(Ac.col),
            jnp.asarray(Ac.data.astype(dtype)))
    n = int(A_c.shape[0])
    inv, err = _dense_inverse_device(*args, n, 0.0)
    tol = 1e-2 if np.finfo(np.dtype(dtype)).eps > 1e-10 else 1e-6
    if not np.isfinite(float(err)) or float(err) > tol:
        shift_rel = 1e-6 if np.finfo(np.dtype(dtype)).eps > 1e-10 else 1e-8
        inv, _ = _dense_inverse_device(*args, n, shift_rel)
    return DenseInverse(inv, tuple(grid_c))


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=[], meta_fields=["factor", "grid"])
@dataclass(frozen=True)
class GridSparseLU:
    """Host SuperLU coarsest solve, grid form (see cycle/coarse.py:
    SparseLUCoarse — the reference's UMFPACK design point for coarsest
    levels beyond the replicated-dense budget, MGsetup.jl:350)."""
    factor: object          # scipy SuperLU (f64/c128)
    grid: tuple[int, ...]

    def solve(self, bg: jax.Array) -> jax.Array:
        m = bg.shape[0]
        bf = bg.reshape(m, -1)

        def cb(bh):
            out = self.factor.solve(
                np.asarray(bh, self.factor.U.dtype).T).T
            return out.astype(bh.dtype)
        xf = jax.pure_callback(
            cb, jax.ShapeDtypeStruct(bf.shape, bf.dtype), bf,
            vmap_method="sequential")
        return xf.reshape((m,) + self.grid)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["A", "d"], meta_fields=["inner"])
@dataclass(frozen=True)
class GridIterativeCoarse:
    """Jacobi-preconditioned one-shot FGMRES coarsest solve, grid form
    (reference MGcycle.jl:152-168 escape hatch)."""
    A: GridStencil
    d: jax.Array
    inner: int

    def solve(self, bg: jax.Array) -> jax.Array:
        return fgmres_relaxation(self.A.matvec, lambda r: self.d * r,
                                 bg, jnp.zeros_like(bg), self.inner)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["levels", "coarse"], meta_fields=[])
@dataclass(frozen=True)
class GridHierarchy:
    levels: tuple            # GridLevel per level (coarsest included, d=None ok)
    coarse: DenseInverse | GridIterativeCoarse

    @property
    def fine_grid(self) -> tuple[int, ...]:
        return self.levels[0].A.grid


# ---------------------------------------------------------------------------
# tensor-product full-weighting transfers as per-axis 1D matmuls
#
# The separable [0.5, 1, 0.5] smooth + resample along one grid axis IS a small
# dense matmul with the 1D fw_interp factor (f_a x c_a).  On TPU this is the
# fastest form by far: stride-2 resampling in the lane dimension and
# interior-padding upsampling are slow relayouts (~25x slower measured at
# 1025^2), while the MXU does the contraction at full speed.  The extra
# products are exact zeros, so the result is bitwise the sparse operator's.
# ---------------------------------------------------------------------------

def _axis_matmul(x: jax.Array, W: jax.Array, axis: int) -> jax.Array:
    """Contract `axis` of x with W (in, out)."""
    xl = jnp.moveaxis(x, axis, -1)
    y = xl @ W
    return jnp.moveaxis(y, -1, axis)


def grid_restrict(rg: jax.Array, P1) -> jax.Array:
    """R r; rg is (m, *fine_grid).

    P1 is either the per-axis dense factor tuple (geometric full weighting,
    R = 0.5^dim P^T) or a Stride2Transfer (matrix-dependent prolongator,
    R = P^H — the SA convention)."""
    from ..ops.grid_stencil import Stride2Transfer
    if isinstance(P1, Stride2Transfer):
        return P1.restrict(rg)
    y = rg
    nc = 0
    for a, W in enumerate(P1):
        if W is None:                 # semicoarsening: axis not coarsened
            continue
        nc += 1
        y = _axis_matmul(y, W, 1 + a)
    return (0.5 ** nc) * y


def grid_prolong(xc: jax.Array, P1) -> jax.Array:
    """P xc; xc is (m, *coarse_grid)."""
    from ..ops.grid_stencil import Stride2Transfer
    if isinstance(P1, Stride2Transfer):
        return P1.prolong(xc)
    y = xc
    for a, W in enumerate(P1):
        if W is None:
            continue
        y = _axis_matmul(y, W.T, 1 + a)
    return y


# ---------------------------------------------------------------------------
# cycle
# ---------------------------------------------------------------------------

def _fused3d_interpret(cfg, lvl: "GridLevel"):
    """interpret-flag for the fused 3D kernels at this level, or None.

    Rides on ConstGridStencil.faces (built only for 3D radius-1 f32 levels
    past the size floor, ops/pallas/const3d.supports_const3d) and the same
    MGTPU_PALLAS3D mode switch as the one-pass matvec kernel."""
    if cfg.relax_type not in ("jacobi", "spai") or lvl.d is None:
        return None
    from ..ops.grid_stencil import ConstGridStencil, _pallas3d_mode
    A = lvl.A
    if not isinstance(A, ConstGridStencil) or A.faces is None:
        return None
    if not hasattr(lvl.d, "shape") or tuple(lvl.d.shape) != tuple(A.grid):
        return None
    mode = _pallas3d_mode()
    if mode == "off":
        return None
    return mode == "interpret"


def _grid_smooth(cfg, lvl: GridLevel, r, x, b, nu: int):
    if nu <= 0:
        return x
    if cfg.relax_type == "jac-gmres":
        return fgmres_relaxation(lvl.A.matvec, lambda v: lvl.d * v, r, x, nu,
                                 axis_name=cfg.axis_name)
    if cfg.relax_type == "chebyshev":
        from .relax import chebyshev_smooth
        return chebyshev_smooth(lvl.A.matvec, lvl.d, lvl.lam,
                                cfg.cheby_degree * nu, cfg.cheby_frac,
                                r, x, b)
    if cfg.relax_type == "chebyshev4":
        from .relax import chebyshev4_smooth
        return chebyshev4_smooth(lvl.A.matvec, lvl.d, lvl.lam,
                                 cfg.cheby_degree * nu, r, x)
    if cfg.relax_type == "line-jacobi":
        from .relax import line_smooth
        return line_smooth(lvl.A.matvec, lvl.d, r, x, b, nu)
    # jacobi / spai: x += d .* r with the residual refreshed between sweeps
    for _ in range(nu - 1):
        x = x + lvl.d * r
        r = b - lvl.A.matvec(x)
    return x + lvl.d * r


def grid_cycle(cfg, gh: GridHierarchy, b, x, level: int = 0,
               ctype: str | None = None, x_zero: bool = False):
    """One multigrid cycle on grid fields b, x of shape (m, *grid_level).

    `x_zero` (static) declares the incoming iterate to be exactly zero —
    true for EVERY coarse-level entry inside a cycle and for the correction
    cycles of the refined drivers.  The entry residual is then b itself, so
    the r = b - A*0 matvec is skipped (XLA cannot fold A@0: the stencil
    coefficients are runtime arrays).  One matvec saved per level per
    cycle.  Results are bitwise-identical on the XLA engines (A@0 is exact
    zeros); on the fused 3D Pallas path the double-apply pre-smooth
    collapses to d*b + one residual3d apply, whose different in-kernel
    accumulation order makes results float32-equivalent rather than
    bitwise (tests/test_xzero.py pins both contracts)."""
    ctype = cfg.cycle_type if ctype is None else ctype
    nlev = len(gh.levels)
    if level == nlev - 1:
        return gh.coarse.solve(b)

    lvl = gh.levels[level]
    matvec = lvl.A.matvec
    f3 = _fused3d_interpret(cfg, lvl)
    if f3 is not None:
        from ..ops.pallas import fused3d as f3k
    with jax.named_scope(f"gmg_level{level}"):
        if f3 is not None:
            # fused 3D Pallas path: every sweep recomputes its residual
            # inside one kernel pass; the LAST pre-smooth sweep and the
            # restrict-feed residual share a single double-apply pass
            # (ops/pallas/fused3d.py)
            nu = cfg.nu_pre[level]
            if x_zero and nu >= 1:
                # first sweep off a zero iterate is elementwise (x1 = d*b);
                # the double-apply collapses to a single apply
                x = lvl.d * b
                nu -= 1
                if nu == 0:
                    r = f3k.residual3d(lvl.A, b, x, interpret=f3)
            if nu >= 1:
                for _ in range(nu - 1):
                    x = f3k.jacobi3d(lvl.A, lvl.d, b, x, interpret=f3)
                x, r = f3k.jacobi_residual3d(lvl.A, lvl.d, b, x,
                                             interpret=f3)
            elif not x_zero:
                r = f3k.residual3d(lvl.A, b, x, interpret=f3)
            elif cfg.nu_pre[level] == 0:
                r = b
        else:
            r = b if x_zero else b - matvec(x)
            x = _grid_smooth(cfg, lvl, r, x, b, cfg.nu_pre[level])
            r = b - matvec(x) if cfg.nu_pre[level] > 0 or not x_zero else b
        bc = grid_restrict(r, lvl.P1)
        if level == nlev - 2:
            with jax.named_scope("gmg_coarsest"):
                xc = gh.coarse.solve(bc)
        elif ctype == "K":
            coarse_mv = gh.levels[level + 1].A.matvec
            prec = lambda v: grid_cycle(cfg, gh, v, jnp.zeros_like(v),
                                        level + 1, "K", x_zero=True)
            xc = fgmres_relaxation(coarse_mv, prec, bc, jnp.zeros_like(bc),
                                   cfg.kcycle_inner,
                                   axis_name=cfg.axis_name)
        else:
            xc = grid_cycle(cfg, gh, bc, jnp.zeros_like(bc), level + 1,
                            ctype, x_zero=True)
            if ctype == "W":
                xc = grid_cycle(cfg, gh, bc, xc, level + 1, "W")
            elif ctype == "F":
                xc = grid_cycle(cfg, gh, bc, xc, level + 1, "V")

        p = grid_prolong(xc, lvl.P1)
        if f3 is not None:
            if cfg.nu_post[level] > 0:
                # correction add folded into the first post-smooth pass
                x = f3k.jacobi_corr3d(lvl.A, lvl.d, b, x, p, interpret=f3)
                for _ in range(cfg.nu_post[level] - 1):
                    x = f3k.jacobi3d(lvl.A, lvl.d, b, x, interpret=f3)
            else:
                x = x + p
        else:
            x = x + p
            r = b - matvec(x)
            x = _grid_smooth(cfg, lvl, r, x, b, cfg.nu_post[level])
    return x


@functools.partial(jax.jit, static_argnums=(0, 4))
def grid_cycle_jit(cfg, gh: GridHierarchy, b, x, x_zero: bool = False):
    """Jitted single cycle on grid fields (m, *grid)."""
    return grid_cycle(cfg, gh, b, x, x_zero=x_zero)


@functools.lru_cache(maxsize=None)
def _cubic_factor_np(nf: int):
    """1D cubic solution-prolongation factor (nf x nc) on an odd node grid.

    Coarse nodes inject; midpoints interpolate cubically through the four
    nearest coarse nodes ([-1, 9, 9, -1]/16 interior; one-sided
    [5, 15, -5, 1]/16 at the ends).  Classical FMG needs the SOLUTION
    transferred at higher order than the correction transfers to reach
    discretization accuracy in one pass (Brandt); full-weighting's linear
    midpoints lose two orders."""
    assert nf % 2 == 1 and nf >= 3
    nc = (nf - 1) // 2 + 1
    P = np.zeros((nf, nc), dtype=np.float64)
    P[np.arange(0, nf, 2), np.arange(nc)] = 1.0
    w_int = np.array([-1.0, 9.0, 9.0, -1.0]) / 16.0
    w_lo = np.array([5.0, 15.0, -5.0, 1.0]) / 16.0
    for m in range(nc - 1):               # midpoint between coarse m, m+1
        r = 2 * m + 1
        if nc < 4:                        # too few nodes for a cubic: linear
            P[r, m:m + 2] = 0.5
        elif m == 0:
            P[r, 0:4] = w_lo
        elif m == nc - 2:
            P[r, nc - 4:nc] = w_lo[::-1]
        else:
            P[r, m - 1:m + 3] = w_int
    return P


def _cubic_prolong(xc, fine_grid):
    """Per-axis cubic solution prolongation (m, *coarse) -> (m, *fine)."""
    y = xc
    for a, nf in enumerate(fine_grid):
        if y.shape[1 + a] == nf:          # axis not coarsened (semicoarsening)
            continue
        W = jnp.asarray(_cubic_factor_np(int(nf)), dtype=xc.dtype)
        y = _axis_matmul(y, W.T, 1 + a)
    return y


def grid_fmg(cfg, gh: GridHierarchy, b, n_cycles: int = 1):
    """Full multigrid (nested iteration): solve coarsest-first, prolongating
    each level's solution as the next finer level's initial guess, with
    `n_cycles` cycles of polishing per level.

    One FMG pass costs ~(1 + 2^-d + 4^-d + ...) cycles.  The SOLUTION moves
    between levels with cubic interpolation (classical FMG requirement —
    with the linear full-weighting prolongation the initial guess only saved
    ~1 refined iteration); corrections inside the polishing cycles keep the
    standard transfers.  The reference has no FMG driver; exposed via
    solve_mg_refined(fmg=True).
    """
    nlev = len(gh.levels)
    bs = [b]
    for l in range(nlev - 1):
        bs.append(grid_restrict(bs[-1], gh.levels[l].P1))
    x = gh.coarse.solve(bs[-1])
    for l in range(nlev - 2, -1, -1):
        fine_grid = gh.levels[l].A.grid
        from ..ops.grid_stencil import Stride2Transfer
        if isinstance(gh.levels[l].P1, Stride2Transfer):
            x = grid_prolong(x, gh.levels[l].P1)   # matrix-dependent: keep
        else:
            x = _cubic_prolong(x, fine_grid)
        for _ in range(n_cycles):
            x = grid_cycle(cfg, gh, bs[l], x, level=l)
    return x


def grid_cycle_flat(cfg, gh: GridHierarchy, b2, x2, ctype: str | None = None,
                    x_zero: bool = False):
    """Flat (n, m) boundary adapter around grid_cycle."""
    grid = gh.fine_grid
    xg = grid_cycle(cfg, gh, flat_to_grid(b2, grid), flat_to_grid(x2, grid),
                    0, ctype, x_zero=x_zero)
    return grid_to_flat(xg)


# ---------------------------------------------------------------------------
# construction from a host hierarchy
# ---------------------------------------------------------------------------

_GRID_RELAX = ("jacobi", "spai", "jac-gmres", "chebyshev", "chebyshev4",
               "line-jacobi")
_DENSE_INV_MAX = 16384
_HOST_INV_MAX = 4096      # host f64 inverse (pinv-safe) below this
# replicated-dense budget: 20480^2 f32 = 1.7 GB for the factor; the old
# 32768 cap meant a 4.3 GB inverse with ~13 GB LU transients (ADVICE r2)
_DENSE_LU_MAX = 20480


def _checked_inverse(Ad: np.ndarray) -> np.ndarray:
    """Plain inverse with a residual check, pseudo-inverse fallback.

    Neumann-type operators reach the coarsest level exactly singular
    (constant nullspace) and need the minimal-norm pinv; for the regular
    (shifted) case LU inversion is ~10x cheaper than the SVD."""
    n = Ad.shape[0]
    try:
        with np.errstate(all="ignore"):
            inv = np.linalg.inv(Ad)
        # kappa ~ |A| |A^-1| must be far from 1/eps, else the nullspace
        # (e.g. Neumann constants) leaks huge components into the inverse
        # and only the minimal-norm pinv is safe
        kappa = float(np.abs(Ad).max()) * float(np.abs(inv).max()) * n
        # residual check on a column sample (a full n^3 check would cost as
        # much as the inversion itself at SA coarse sizes)
        cols = (np.arange(n) if n <= 512
                else np.random.RandomState(0).choice(n, 256, replace=False))
        eye = np.zeros((n, len(cols)), dtype=Ad.dtype)
        eye[cols, np.arange(len(cols))] = 1.0
        err = float(np.abs(Ad @ inv[:, cols] - eye).max())
        if np.isfinite(inv).all() and kappa < 1e12 and err < 1e-6:
            return inv
    except np.linalg.LinAlgError:
        pass
    return np.linalg.pinv(Ad, rcond=1e-12)


def build_grid_hierarchy(state, relax_states) -> GridHierarchy:
    """Build the grid engine for an MGState when eligible; raises ValueError
    otherwise (callers fall back to the flat ELL/DIA hierarchy)."""
    cfg = state.config
    if cfg.transfer_type not in ("full-weighting", "semicoarsening"):
        raise ValueError("grid engine needs scalar full-weighting or "
                         "semicoarsening transfers")
    if cfg.relax_type not in _GRID_RELAX:
        raise ValueError("grid engine supports pointwise relaxations only")
    if not state.meshes or len(state.meshes) < state.num_levels:
        raise ValueError("grid engine needs per-level meshes")
    if cfg.coarse_solve not in ("lu", "gmres") or state.coarse_solver is not None:
        raise ValueError("grid engine supports lu/gmres coarsest solves")

    from ..setup import transfers as tr

    gs_cache = getattr(state, "_gs_cache", None) or {}
    levels = []
    for l in range(state.num_levels):
        mesh = state.meshes[l]
        nodes = [int(v) + 1 for v in np.asarray(mesh.n).ravel()]
        gs_host = gs_cache.get(l)
        if gs_host is not None and gs_host.grid == tuple(reversed(nodes)):
            # stencil-form coefficients already produced by the structured
            # RAP at setup — skip the CSR re-extraction
            from ..ops.grid_stencil import compress_grid_stencil, GridStencil
            gnp = GridStencil(np.asarray(gs_host.coeff, dtype=cfg.dtype),
                              gs_host.offsets, gs_host.grid)
            A = compress_grid_stencil(gnp)
            if A is None:
                A = GridStencil(jnp.asarray(gnp.coeff), gnp.offsets, gnp.grid)
        else:
            A = make_grid_stencil(state.As[l], nodes, dtype=cfg.dtype)
        d = None
        P1 = None
        if l < state.num_levels - 1:
            from ..setup.hierarchy import _resolve_relax
            rs = _resolve_relax(relax_states[l])
            from .relax import LineRelax, AltLineRelax
            if isinstance(rs, (LineRelax, AltLineRelax)):
                d = rs                       # line state rides in the d slot
            elif hasattr(rs, "d"):
                d = jnp.asarray(rs.d).reshape(A.grid)
            else:
                raise ValueError("grid engine needs a diagonal relax state")
            # dense per-axis 1D transfer factors; verify their Kronecker
            # product is exactly the hierarchy's stored prolongation so the
            # matmul transfers are bitwise-faithful to the host setup
            # (mg_setup's own full-weighting transfers are these factors BY
            # construction — the kron re-assembly is skipped for them, it is
            # the dominant 3D setup cost).  Under semicoarsening an axis
            # whose extent does not shrink carries a None factor (skipped
            # by grid_restrict/grid_prolong).
            nodes_c = [int(v) + 1
                       for v in np.asarray(state.meshes[l + 1].n).ravel()]
            p1s = [tr.fw_interp_1d(nn)[0] if nn != ncn else None
                   for nn, ncn in zip(nodes, nodes_c)]
            if not getattr(state, "_fw_separable", False):
                K = None
                for ax, pm in enumerate(p1s):
                    if pm is None:
                        pm = sp.identity(nodes[ax], format="csr")
                    K = pm if K is None else sp.kron(pm, K, format="csr")
                # shape check first: scipy's != returns a plain bool for
                # mismatched shapes, which has no .nnz — the ValueError must
                # still fire so the flat-engine fallback engages
                if (K.shape != state.Ps[l].shape
                        or (K != state.Ps[l]).nnz != 0):
                    raise ValueError("hierarchy transfers are not the "
                                     "separable full-weighting factors")
            P1 = tuple(None if p is None
                       else jnp.asarray(np.asarray(p.todense(),
                                                   dtype=cfg.dtype))
                       for p in reversed(p1s))
            lam = getattr(rs, "lam_max", None)
        else:
            lam = None
        levels.append(GridLevel(A, d, P1, lam))

    A_c = state.As[-1]
    grid_c = levels[-1].A.grid
    if cfg.coarse_solve == "gmres":
        rp = state.relax_param
        omega = rp if np.isscalar(rp) else 1.0
        d_c = jnp.asarray((omega / A_c.diagonal()).astype(cfg.dtype)
                          ).reshape(grid_c)
        coarse = GridIterativeCoarse(levels[-1].A, d_c,
                                     cfg.gmres_coarse_inner)
    elif A_c.shape[0] <= _HOST_INV_MAX:
        # Invert at float64 on host, then cast (f64 factorization error is far
        # below the f32 storage rounding).  Neumann-type operators reach the
        # coarsest level exactly singular (constant nullspace); a plain
        # inverse of those sprays rounding into all directions, so use the
        # pseudo-inverse (minimal-norm coarse solve) when affordable — in the
        # cycle the inverse is ONE matmul, the cheapest coarse application.
        Ad = np.asarray(A_c.astype(
            np.complex128 if np.iscomplexobj(A_c.data) else np.float64
        ).todense())
        inv = _checked_inverse(Ad)
        coarse = DenseInverse(jnp.asarray(inv.astype(cfg.dtype)), grid_c)
    elif A_c.shape[0] > _DENSE_LU_MAX:
        # beyond the replicated-dense budget (O(nc^2) device memory):
        # host SuperLU behind the same solve() protocol
        from scipy.sparse.linalg import splu
        fdt = np.complex128 if np.iscomplexobj(A_c.data) else np.float64
        coarse = GridSparseLU(splu(A_c.tocsc().astype(fdt)), tuple(grid_c))
    else:
        # large coarsest: device-built inverse (LU + n-RHS solve on
        # the MXU) — no O(nc^3) host inversion
        coarse = grid_dense_inverse_from_scipy(A_c, grid_c, cfg.dtype)
    return GridHierarchy(tuple(levels), coarse)
