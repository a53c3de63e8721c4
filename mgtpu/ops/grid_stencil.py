"""Grid-form stencil operator — the zero-gather structured fast path.

Operators from tensor-product discretizations on regular meshes (and all their
full-weighting Galerkin coarsenings) are stencils whose offsets decompose
per mesh axis: off = sum_a d_a * stride_a with small |d_a|.  Stored in grid
form — ``coeff[k, ..., j, i] = A[row(j,i), row(j,i) + off_k]`` on the
multi-dimensional node grid — the SpMV becomes shift-multiply-accumulate
along the grid axes: unit-stride VPU work with zero gathers and full lane
occupancy (the flat ``(n, 1)`` vector layout wastes 127/128 TPU lanes; the
grid layout ``(m, ..., NJ, NI)`` keeps the fastest mesh axis in lanes).

This is the TPU-native replacement for the reference's row-parallel CSC-
transposed SpMV (reference src/Multigrid/SpMatMul.jl:4-26 backed by
ParSpMatVec's OpenMP C kernel): same contract (y = A x, multi-RHS batched),
hardware-shaped layout.

Grid axis order: the flat vector has mesh dim 0 fastest (x[i1 + n1*i2 + ...]),
so the grid view is ``x.reshape(*reversed(node_counts))`` — grid axis -1 is
mesh dim 0.  Batched right-hand sides lead: fields are (m, *grid).
"""
from __future__ import annotations

import functools
import itertools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["coeff"],
                   meta_fields=["offsets", "grid"])
@dataclass(frozen=True)
class GridStencil:
    """Variable-coefficient stencil on a node grid.

    coeff:   (ndiags, *grid) — coeff[k] holds A[row, row+off_k] per node
             (zero where the entry does not exist, e.g. at boundaries).
    offsets: per-diagonal tuple of per-grid-axis shifts (slowest axis first,
             matching the grid axis order).  Static metadata.
    grid:    node grid shape (slowest mesh dim first).
    """
    coeff: jax.Array
    offsets: tuple[tuple[int, ...], ...]
    grid: tuple[int, ...]

    @property
    def dtype(self):
        return self.coeff.dtype

    @property
    def shape(self) -> tuple[int, int]:
        n = int(np.prod(self.grid))
        return (n, n)

    @property
    def nnz(self) -> int:
        return int(self.coeff.size)

    def matvec(self, x: jax.Array) -> jax.Array:
        """y = A @ x.

        Accepts grid-form fields (..., *grid) — including a leading batch
        dim — or flat vectors (n,) / (n, m) which are converted at the
        boundary (flat m-column layout wastes TPU lanes; prefer grid form
        in hot loops).
        """
        g = len(self.grid)
        if x.ndim <= 2 and (g != x.ndim or x.shape != self.grid):
            # flat vector(s): (n,) or (n, m)
            squeeze = x.ndim == 1
            x2 = x[:, None] if squeeze else x
            xg = flat_to_grid(x2, self.grid)
            yg = grid_stencil_matvec(self.coeff, self.offsets, xg)
            y = grid_to_flat(yg)
            return y[:, 0] if squeeze else y
        return grid_stencil_matvec(self.coeff, self.offsets, x)

    def to_scipy(self) -> sp.csr_matrix:
        n = int(np.prod(self.grid))
        strides = np.concatenate([np.cumprod(self.grid[::-1])[-2::-1], [1]])
        coeff = np.asarray(self.coeff).reshape(len(self.offsets), n)
        rows, cols, vals = [], [], []
        idx = np.arange(n)
        coords = np.stack(np.unravel_index(idx, self.grid), axis=1)
        for k, off in enumerate(self.offsets):
            tgt = coords + np.asarray(off)
            ok = np.all((tgt >= 0) & (tgt < np.asarray(self.grid)), axis=1)
            rows.append(idx[ok])
            cols.append((tgt[ok] * strides).sum(axis=1))
            vals.append(coeff[k, ok])
        A = sp.coo_matrix((np.concatenate(vals),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=(n, n))
        A.sum_duplicates()
        return A.tocsr()

    def astype(self, dtype) -> "GridStencil":
        return GridStencil(self.coeff.astype(dtype), self.offsets, self.grid)


def flat_to_grid(x2: jax.Array, grid: tuple[int, ...]) -> jax.Array:
    """(n, m) flat columns -> (m, *grid) batched grid fields."""
    return x2.T.reshape((x2.shape[1],) + tuple(grid))


def grid_to_flat(xg: jax.Array) -> jax.Array:
    """(m, *grid) -> (n, m)."""
    return xg.reshape(xg.shape[0], -1).T


def grid_stencil_from_csr(A: sp.spmatrix, node_counts,
                          dtype=None, max_shift: int = 2) -> GridStencil:
    """Extract the grid-form stencil of A on a node grid.

    node_counts: per-mesh-dim node counts, dim 0 fastest (= jInv/mesh
    convention).  Raises ValueError when A is not a tensor-product stencil
    with per-axis shifts within ``max_shift`` — callers fall back to the
    general flat path.
    """
    node_counts = [int(v) for v in np.asarray(node_counts).ravel()]
    n = int(np.prod(node_counts))
    if A.shape != (n, n):
        raise ValueError("operator size does not match the node grid")
    dim = len(node_counts)
    strides = np.concatenate([[1], np.cumprod(node_counts[:-1])]).astype(np.int64)

    # map every representable offset to its per-axis decomposition
    shift_range = range(-max_shift, max_shift + 1)
    decomp: dict[int, tuple[int, ...]] = {}
    for combo in itertools.product(shift_range, repeat=dim):
        off = int(sum(c * s for c, s in zip(combo, strides)))
        if off in decomp:
            raise ValueError("ambiguous stencil decomposition (grid too small)")
        # grid axis order is reversed (slowest mesh dim first)
        decomp[off] = tuple(reversed(combo))

    Ac = A.tocoo()
    off_all = Ac.col.astype(np.int64) - Ac.row.astype(np.int64)
    offs = np.unique(off_all)
    offsets = []
    for off in offs:
        d = decomp.get(int(off))
        if d is None:
            raise ValueError(f"matrix offset {off} is not a grid stencil shift")
        offsets.append(d)

    dt = dtype if dtype is not None else Ac.dtype
    coeff = np.zeros((len(offs), n), dtype=dt)
    pos = np.searchsorted(offs, off_all)
    np.add.at(coeff, (pos, Ac.row), Ac.data.astype(dt))
    grid = tuple(reversed(node_counts))
    # entries that would shift across a grid boundary cannot exist in a true
    # grid stencil; verify so wrap-around never aliases silently
    coeff = coeff.reshape((len(offs),) + grid)
    for k, off in enumerate(offsets):
        for a, da in enumerate(off):
            if da == 0:
                continue
            sl = [slice(None)] * len(grid)
            sl[a] = slice(grid[a] - da, None) if da > 0 else slice(0, -da)
            if np.any(coeff[(k,) + tuple(sl)]):
                raise ValueError("stencil entry crosses the grid boundary")
    return GridStencil(jnp.asarray(coeff), tuple(offsets), grid)


def _shift(x: jax.Array, axis: int, d: int, size: int) -> jax.Array:
    """y[..., i, ...] = x[..., i + d, ...] with zero fill, along `axis`."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(0, -d), max(0, d))
    xp = jnp.pad(x, pad)
    start = [0] * x.ndim
    start[axis] = max(0, -d) + d
    return jax.lax.dynamic_slice(xp, start,
                                 [xp.shape[i] if i != axis else size
                                  for i in range(x.ndim)])


@functools.partial(jax.jit, static_argnames=("offsets",))
def grid_stencil_matvec(coeff: jax.Array,
                        offsets: tuple[tuple[int, ...], ...],
                        x: jax.Array) -> jax.Array:
    """y = A x for grid fields x of shape (..., *grid)."""
    g = coeff.ndim - 1
    grid = coeff.shape[1:]
    y = jnp.zeros(x.shape[:-g] + grid, dtype=jnp.result_type(coeff, x))
    for k, off in enumerate(offsets):
        xs = x
        for a, da in enumerate(off):
            xs = _shift(xs, xs.ndim - g + a, da, grid[a])
        y = y + coeff[k] * xs
    return y
