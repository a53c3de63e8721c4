"""Smoother setup (host side): diagonal preconditioners + Vanka block factory.

Equivalents of the reference's getRelaxPrec dispatch (src/Multigrid/MGsetup.jl:142-160),
getSPAIprec (MGsetup.jl:359-362) and setupVankaFacesPreconditioner
(src/Multigrid/Vanka.jl:294-370).  Everything here runs once at setup on host
(numpy/scipy) and emits immutable device pytrees consumed by the jitted cycle.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import single_variant
from ..models.mesh import RegularMesh, cs2loc
from ..cycle.relax import DiagRelax, ChebyshevRelax
from ..cycle.vanka import VankaRelax

__all__ = [
    "jacobi_prec",
    "spai_prec",
    "vanka_cell_indices",
    "vanka_block_inverses",
    "setup_vanka",
]


def jacobi_diag(A: sp.spmatrix, omega) -> np.ndarray:
    """Host-side damped-Jacobi diagonal d = omega / diag(A)."""
    return np.asarray(omega / A.diagonal())


def spai_diag(A: sp.spmatrix, omega) -> np.ndarray:
    """Host-side SPAI(0) diagonal minimising ||I - M A||_F:
    d_i = omega * conj(a_ii) / ||A e_i||^2 (reference MGsetup.jl:359-362 under
    the transposed-storage convention)."""
    A = A.tocsr()
    s = np.asarray(A.multiply(A.conj()).sum(axis=0)).ravel().real
    return omega * np.conj(A.diagonal()) / np.maximum(s, 1e-300)


def jacobi_prec(A: sp.spmatrix, omega, dtype=None) -> DiagRelax:
    """Damped Jacobi: d = omega / diag(A) (reference MGsetup.jl:146)."""
    d = jacobi_diag(A, omega)
    return DiagRelax(jnp.asarray(d.astype(dtype if dtype is not None else d.dtype)))


def spai_prec(A: sp.spmatrix, omega, dtype=None) -> DiagRelax:
    """SPAI(0) diagonal preconditioner (see spai_diag)."""
    d = spai_diag(A, omega)
    return DiagRelax(jnp.asarray(d.astype(dtype if dtype is not None else d.dtype)))


def estimate_lam_max(A: sp.spmatrix, d: np.ndarray, iters: int = 15,
                     seed: int = 7, safety: float = 1.05) -> float:
    """Power-iteration bound on spec(D^-1 A) (host, once at setup)."""
    rng = np.random.RandomState(seed)
    x = rng.rand(A.shape[0])
    x /= np.linalg.norm(x)
    lam = 1.0
    for _ in range(iters):
        y = d * (A @ x)
        lam = np.linalg.norm(y)
        if lam == 0:
            return 1.0
        x = y / lam
    return float(lam * safety)


def chebyshev_prec(A: sp.spmatrix, omega, dtype=None) -> ChebyshevRelax:
    """Chebyshev smoother state: inverse diagonal + spectral upper bound.

    `omega` is accepted for dispatch uniformity but unused — Chebyshev damping
    comes from the polynomial, not the diagonal."""
    d = 1.0 / np.asarray(A.diagonal())
    lam = estimate_lam_max(A.tocsr(), d)
    return ChebyshevRelax(
        jnp.asarray(d.astype(dtype if dtype is not None else d.dtype)), lam)


# ---------------------------------------------------------------------------
# Vanka block setup
# ---------------------------------------------------------------------------

def vanka_cell_indices(mesh: RegularMesh, include_pressure: bool) -> tuple[np.ndarray, np.ndarray]:
    """(idx, colors): per-cell Vanka variable sets and 2^dim cell colors.

    idx[c] lists the faces of cell c (2 per dimension) followed by its pressure
    dof when include_pressure (reference Vanka.jl:45-95 geometry, 0-based here).
    colors[c] in [0, 2^dim) from per-axis parity (reference cellColor,
    Vanka.jl:105-135).
    """
    n = np.asarray(mesh.n)
    dim = mesh.dim
    ncells = int(np.prod(n))
    loc = cs2loc(np.arange(ncells), n)           # (ncells, dim)
    nf = []
    for j in range(dim):
        s = n.copy()
        s[j] += 1
        nf.append(int(np.prod(s)))
    offsets = np.concatenate([[0], np.cumsum(nf)])
    cols = []
    for j in range(dim):
        s = n.copy()
        s[j] += 1
        strides = np.concatenate([[1], np.cumprod(s[:-1])])
        base = offsets[j] + (loc * strides).sum(axis=1)
        cols.append(base)                         # low face along axis j
        cols.append(base + strides[j])            # high face along axis j
    if include_pressure:
        strides = np.concatenate([[1], np.cumprod(n[:-1])])
        cols.append(offsets[dim] + (loc * strides).sum(axis=1))
    idx = np.stack(cols, axis=1).astype(np.int64)
    colors = np.zeros(ncells, dtype=np.int64)
    for d in range(dim):
        colors |= (loc[:, d] % 2) << d
    return idx, colors


def _host_ell(A: sp.csr_matrix):
    """Padded-row (ELL) host view of a CSR matrix; padding: idx=0, val=0."""
    counts = np.diff(A.indptr)
    K = max(1, int(counts.max()))
    n = A.shape[0]
    idx = np.zeros((n, K), dtype=np.int64)
    val = np.zeros((n, K), dtype=A.dtype)
    within = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    rows = np.repeat(np.arange(n), counts)
    idx[rows, within] = A.indices
    val[rows, within] = A.data
    return idx, val


def gather_blocks(A: sp.csr_matrix, I: np.ndarray) -> np.ndarray:
    """B[c, i, j] = A[I[c,i], I[c,j]] for all cells c, vectorised."""
    idx, val = _host_ell(A)
    rows_idx = idx[I]                 # (c, bs, K)
    rows_val = val[I]
    match = rows_idx[:, :, None, :] == I[:, None, :, None]   # (c, bs, bs, K)
    return np.einsum("cbk,cbjk->cbj", rows_val, match.astype(val.dtype))


def vanka_block_inverses(A: sp.spmatrix, mesh: RegularMesh, w,
                         include_pressure: bool, variant: str = "vanka",
                         dtype=None):
    """(I, colors, dinv): per-cell Vanka index sets, 2^dim colors and the
    precomputed (weighted) block inverses — the variant-specific host math
    shared by the flat table smoother and the grid-form smoother.

    Variant semantics follow the reference (Vanka.jl:315-368):
      vanka (scalar w)   : diagonalised velocity block, inverse scaled by w
      vanka ((w_u, w_p)) : full inverse, row-weighted
      econ-vanka         : velocity diagonal divided by w before full inverse
      vanka-add          : full inverse with 1/2 interior-face weights
      kaczmarz-vanka     : inverse of the (A A^H) block, scaled by w
    """
    A = A.tocsr()
    I, colors = vanka_cell_indices(mesh, include_pressure)
    ncells, bs = I.shape
    n = np.asarray(mesh.n)
    dim = mesh.dim

    if variant == "kaczmarz-vanka":
        blocks = gather_blocks((A @ A.conj().T).tocsr(), I)
    else:
        blocks = gather_blocks(A, I)

    W = np.ones(bs)
    scalar_w = np.isscalar(w)
    if not scalar_w:
        W[:] = w[0]
        if include_pressure:
            W[-1] = w[1]

    if variant == "vanka":
        if scalar_w:
            # economy structure: keep only the diagonal of the velocity block
            diag_part = np.zeros_like(blocks)
            rng = np.arange(bs - 1)
            diag_part[:, rng, rng] = blocks[:, rng, rng]
            diag_part[:, -1, :] = blocks[:, -1, :]
            diag_part[:, :, -1] = blocks[:, :, -1]
            dinv = w * np.linalg.inv(diag_part)
        else:
            dinv = W[None, :, None] * np.linalg.inv(blocks)
    elif variant == "econ-vanka":
        mod = blocks.copy()
        rng = np.arange(bs - 1)
        off = np.zeros_like(blocks)
        off[:, rng, rng] = blocks[:, rng, rng] / w
        off[:, -1, :] = blocks[:, -1, :]
        off[:, :, -1] = blocks[:, :, -1]
        dinv = np.linalg.inv(off)
    elif variant == "vanka-add":
        # boundary-weighted additive damping (reference Vanka.jl:339-353):
        # interior faces (shared by two cells) get 1/2, boundary faces 1
        loc = cs2loc(np.arange(ncells), n)
        t = 0.5 * np.ones((ncells, bs))
        for d in range(dim):
            t[loc[:, d] == 0, 2 * d] = 1.0
            t[loc[:, d] == n[d] - 1, 2 * d + 1] = 1.0
        if include_pressure:
            t[:, -1] = 1.0
        ww = w if scalar_w else W[None, :]
        dinv = (t * ww)[:, :, None] * np.linalg.inv(blocks)
    elif variant == "vanka-lex":
        if scalar_w:
            diag_part = np.zeros_like(blocks)
            rng = np.arange(bs - 1)
            diag_part[:, rng, rng] = blocks[:, rng, rng]
            diag_part[:, -1, :] = blocks[:, -1, :]
            diag_part[:, :, -1] = blocks[:, :, -1]
            dinv = w * np.linalg.inv(diag_part)
        else:
            dinv = W[None, :, None] * np.linalg.inv(blocks)
    elif variant == "kaczmarz-vanka":
        dinv = w * np.linalg.inv(blocks)
    else:
        raise ValueError(f"unknown Vanka variant {variant}")
    return I, colors, dinv


def setup_vanka(A: sp.spmatrix, mesh: RegularMesh, w, include_pressure: bool,
                variant: str = "vanka", dtype=None) -> VankaRelax:
    """Precompute per-cell block inverses + colored row tables (flat engine).

    Block inverses are stored in single precision (reference Vanka.jl:296).
    """
    A = A.tocsr()
    dt = np.dtype(dtype if dtype is not None else A.dtype)
    prec_dt = single_variant(dt)
    dim = mesh.dim
    I, colors, dinv = vanka_block_inverses(A, mesh, w, include_pressure,
                                           variant, dtype=dt)
    ncells, bs = I.shape

    # colored, padded tables
    idx_host, val_host = _host_ell(A)
    K = idx_host.shape[1]
    if variant in ("vanka-add", "vanka-lex"):
        groups = [np.arange(ncells)]
    else:
        ncolors = 2 ** dim
        groups = [np.nonzero(colors == c)[0] for c in range(ncolors)]
    L = max(len(g) for g in groups)
    ng = len(groups)
    gi = np.zeros((ng, L, bs), dtype=np.int32)
    gd = np.zeros((ng, L, bs, bs), dtype=prec_dt)
    gri = np.zeros((ng, L, bs, K), dtype=np.int32)
    grv = np.zeros((ng, L, bs, K), dtype=dt)
    for g, cells in enumerate(groups):
        k = len(cells)
        gi[g, :k] = I[cells]
        gd[g, :k] = dinv[cells].astype(prec_dt)
        gri[g, :k] = idx_host[I[cells]]
        grv[g, :k] = val_host[I[cells]].astype(dt)
    return VankaRelax(jnp.asarray(gi), jnp.asarray(gd), jnp.asarray(gri),
                      jnp.asarray(grv), variant)


def line_prec(A: sp.spmatrix, mesh, omega, dtype=None, axis=None):
    """Line-Jacobi smoother state: tridiagonal part of A along one grid axis
    with host-precomputed Thomas pivots (see cycle.relax.LineRelax).

    axis: grid axis of the lines (slowest mesh dim first), None to pick
    the axis with the strongest mean unit-offset coupling automatically,
    or "alt" for alternating-direction lines over ALL grid axes (for
    operators whose strong axis varies over the domain — AltLineRelax).
    `omega` may be a float or a {"omega": w, "axis": a} mapping.
    """
    if isinstance(omega, dict) and omega.get("axis") == "alt":
        axis, omega = "alt", omega.get("omega", 1.0)
    if axis == "alt":
        from ..cycle.relax import AltLineRelax
        g = len(np.asarray(mesh.n).ravel())
        return AltLineRelax(tuple(
            line_prec(A, mesh, omega, dtype=dtype, axis=a)
            for a in range(g)))
    from ..ops.grid_stencil import grid_stencil_from_csr
    from ..cycle.relax import LineRelax

    if isinstance(omega, dict):
        axis = omega.get("axis", axis)
        omega = omega.get("omega", 1.0)
    if mesh is None:
        raise ValueError("line-jacobi needs a regular mesh (grid engine)")
    nodes = [int(v) + 1 for v in np.asarray(mesh.n).ravel()]
    gs = grid_stencil_from_csr(sp.csr_matrix(A), nodes, device=False)
    grid = gs.grid
    g = len(grid)
    coeff = np.asarray(gs.coeff, dtype=np.float64)

    def unit_coeff(a, sgn):
        want = tuple(sgn if k == a else 0 for k in range(g))
        for k, off in enumerate(gs.offsets):
            if tuple(off) == want:
                return coeff[k]
        return np.zeros(grid)

    if axis is None:
        strength = [abs(unit_coeff(a, -1)).mean() + abs(unit_coeff(a, 1)).mean()
                    for a in range(g)]
        axis = int(np.argmax(strength))

    diag = unit_coeff(axis, 0)       # placeholder; replaced by offset-0 below
    for k, off in enumerate(gs.offsets):
        if all(d == 0 for d in off):
            diag = coeff[k]
            break
    sub = np.moveaxis(unit_coeff(axis, -1), axis, -1)
    sup = np.moveaxis(unit_coeff(axis, 1), axis, -1)
    dia = np.moveaxis(diag, axis, -1)
    n = dia.shape[-1]
    piv = np.zeros_like(dia)
    cp = np.zeros_like(dia)
    piv[..., 0] = 1.0 / dia[..., 0]
    cp[..., 0] = sup[..., 0] * piv[..., 0]
    for i in range(1, n):
        piv[..., i] = 1.0 / (dia[..., i] - sub[..., i] * cp[..., i - 1])
        cp[..., i] = sup[..., i] * piv[..., i]
    alpha = -piv * sub               # zero at line starts (sub[...,0] == 0)
    dt = dtype if dtype is not None else coeff.dtype
    mv = lambda a: jnp.asarray(np.moveaxis(a, -1, axis).astype(dt))
    return LineRelax(mv(alpha), mv(piv), mv(cp), int(axis), float(omega))
