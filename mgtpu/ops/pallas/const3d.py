"""Pallas TPU kernels: one-pass 3D constant-interior stencil apply, exact.

XLA does not fuse the 27 shifted-add passes of the 3D stencil matvec the way
it fuses the 2D case: slope-timed at 129^3 f32 the const matvec costs
~0.8-1.4 ms (one materialised pass per tap) while the read-x + write-y
memory floor is ~0.1 ms; the XLA boundary-strip assembly adds ~0.5 ms of
small-op overhead (~160 separate slice ops at ~3 us each).

Kernel layout (grid over the X axis, blocks (BX, Y, Z)):
 * constant interior: X-halo planes come from prev/cur/next block refs with
   clamped index maps; in-plane +-1 taps are circular rolls.  Wrap/clamp
   artifacts only produce wrong values where the stencil entry would cross
   the grid boundary — exactly where the TRUE coefficient is zero or where
   a band overwrite follows.
 * y/z boundary bands are corrected IN-KERNEL from full-extent face
   coefficient arrays (fy (nd, 2w, X, Z), fz (nd, 2w, X, Y) — the band axis
   is kept OFF the minor dims so a w-wide slab does not lane-pad 64x).
   Face arrays hold the true coefficients including corners, and every tap
   value they multiply is valid wherever the coefficient is nonzero (same
   wrap argument), so overlapping overwrites agree.
 * the x band (first/last w planes) is a second tiny kernel with one grid
   step per band ROW, input_output_aliased onto the field so the fix is an
   in-place write (no XLA dynamic_update_slice full-array copy) — one op
   instead of ~54 XLA slices, with all tap shifts static.

Used by ConstGridStencil.matvec for 3D f32 radius-1 stencils on the TPU
backend; `interpret=True` runs in the interpreter for CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supports_const3d", "build_faces", "fx_narrow",
           "const3d_matvec_pallas"]

_BX = 8


def supports_const3d(offsets, grid, dtype) -> bool:
    """Kernels cover 3D radius-1 stencils, real f32, LARGE grids.

    Below ~2M nodes the XLA shifted-add path fuses with the surrounding
    smoother arithmetic and the kernel's fixed call cost plus the lost
    fusion outweigh its single-pass win (slope-timed: the full V-cycle
    REGRESSED 2.1 -> 3.3 ms with the kernel on every level; fine-level-only
    keeps the 4x matvec win where the bytes are)."""
    if len(grid) != 3:
        return False
    if any(abs(d) > 1 for off in offsets for d in off):
        return False
    if any(n < 16 for n in grid):
        return False
    if int(np.prod(grid)) < 2 * 10 ** 6:
        return False
    return np.dtype(dtype) == np.float32


def build_faces(coeff: np.ndarray, w: int):
    """Full-extent face coefficient arrays from the dense (nd, X, Y, Z)
    host coefficients: (fx (nd, 4w, Y, Z), fy (nd, 2w, X, Z),
    fz (nd, 2w, X, Y)); band axis second so it never lane-pads.

    fx carries 2w planes per side (not w): the fused double-apply kernel
    (fused3d.jacobi_residual3d) needs exact row taps on 2w planes — its
    second apply reads the x-band-corrected smoother output one plane in.
    Single-apply kernels slice the inner w planes via `fx_narrow`."""
    fx = np.concatenate([coeff[:, :2 * w], coeff[:, -2 * w:]], axis=1)
    fy = np.moveaxis(np.concatenate([coeff[:, :, :w], coeff[:, :, -w:]],
                                    axis=2), 2, 1)
    fz = np.moveaxis(np.concatenate([coeff[:, :, :, :w], coeff[:, :, :, -w:]],
                                    axis=3), 3, 1)
    return fx, fy, fz


def fx_narrow(fx, w: int):
    """First/last w rows of the (possibly 2w-per-side) fx tap grid."""
    if fx.shape[1] == 2 * w:
        return fx
    return jnp.concatenate([fx[:, :w], fx[:, -w:]], axis=1)


def _interior_kernel(offsets, w, nb, c_ref, fy_ref, fz_ref,
                     xm_ref, x0_ref, xp_ref, y_ref):
    """Const-coefficient apply + in-kernel y/z band recomputation.

    The band values overwrite the output via PARTIAL ref stores — Mosaic's
    concatenate rejects the band/interior stitch at sub-128-lane layouts."""
    i = pl.program_id(0)
    cur = x0_ref[:]                                     # (BX, Y, Z)
    Y, Z = cur.shape[1], cur.shape[2]
    # xm/xp are SINGLE-plane halo blocks (not full neighbor blocks): the
    # radius-1 x taps need one plane each side, so loading (1, Y, Z) slabs
    # cuts the kernel's x reads from 3x the field to ~1.25x.
    top = jnp.where(i > 0, xm_ref[:], jnp.zeros_like(cur[:1]))
    bot = jnp.where(i < nb - 1, xp_ref[:], jnp.zeros_like(cur[:1]))
    planes = {
        -1: jnp.concatenate([top, cur[:-1]], axis=0),   # x[i-1]
        0: cur,
        1: jnp.concatenate([cur[1:], bot], axis=0),     # x[i+1]
    }
    acc = jnp.zeros_like(cur)
    zlo = jnp.zeros(cur.shape[:2] + (w,), cur.dtype)
    zhi = jnp.zeros(cur.shape[:2] + (w,), cur.dtype)
    ylo = jnp.zeros((cur.shape[0], w, Z), cur.dtype)
    yhi = jnp.zeros((cur.shape[0], w, Z), cur.dtype)
    for k, (dx, dy, dz) in enumerate(offsets):
        p = planes[dx]
        if dy:
            p = pltpu.roll(p, np.int32(-dy % Y), axis=1)
        if dz:
            p = pltpu.roll(p, np.int32(-dz % Z), axis=2)
        acc = acc + c_ref[k] * p
        # fz block: (nd, 2w, BX, Y) -> per band col zs, coeffs (BX, Y)
        zlo = zlo + (p[:, :, :w]
                     * jnp.moveaxis(fz_ref[k, :w], 0, 2))
        zhi = zhi + (p[:, :, Z - w:]
                     * jnp.moveaxis(fz_ref[k, w:], 0, 2))
        # fy block: (nd, 2w, BX, Z) -> per band row ys, coeffs (BX, Z)
        ylo = ylo + (p[:, :w, :]
                     * jnp.moveaxis(fy_ref[k, :w], 0, 1))
        yhi = yhi + (p[:, Y - w:, :]
                     * jnp.moveaxis(fy_ref[k, w:], 0, 1))
    y_ref[:] = acc
    # band overwrites: all band arrays carry TRUE coefficients on their full
    # extent, so the z/y overlap (corners) agrees and write order is free
    y_ref[:, :, :w] = zlo
    y_ref[:, :, Z - w:] = zhi
    y_ref[:, :w, :] = ylo
    y_ref[:, Y - w:, :] = yhi


def _xband_fix_kernel(offsets, mode, xwin_ref, fx_ref, b_ref, x_ref,
                      d_ref, yin_ref, out_ref):
    """Exact x-band values, one grid step per band ROW (2w steps total).

    With the band row as the grid axis every tap shift is STATIC (no
    dynamic value slicing, which Mosaic does not lower).  The output is
    input_output_aliased onto the full field, so the band write is in-place
    — no XLA dynamic_update_slice copy of the whole array.
    mode: "matvec" (A x), "residual" (b - A x), "jacobi" (x + d (b - A x)).
    """
    win = xwin_ref[0]                                   # (3, Y, Z)
    Y, Z = win.shape[1], win.shape[2]
    ax = jnp.zeros((Y, Z), win.dtype)
    for t, (dx, dy, dz) in enumerate(offsets):
        p = win[1 + dx]
        if dy:
            p = pltpu.roll(p, np.int32(-dy % Y), axis=0)
        if dz:
            p = pltpu.roll(p, np.int32(-dz % Z), axis=1)
        ax = ax + fx_ref[t, 0] * p
    if mode == "matvec":
        out_ref[0] = ax
    elif mode == "residual":
        out_ref[0] = b_ref[0] - ax
    else:
        out_ref[0] = x_ref[0] + d_ref[0] * (b_ref[0] - ax)


def _apply_xband(y, x, b, d, fx, offsets, w, mode, interpret):
    """In-place x-band fix of `y` (first/last w planes) via the row kernel."""
    X, Y, Z = x.shape
    nd = len(offsets)
    rows = [r for r in range(w)] + [X - w + r for r in range(w)]
    zrow = jnp.zeros((1, Y, Z), x.dtype)

    def row_win(r):
        lo = x[r - 1:r] if r > 0 else zrow
        hi = x[r + 1:r + 2] if r + 1 < X else zrow
        return jnp.concatenate([lo, x[r:r + 1], hi], axis=0)

    xwin = jnp.stack([row_win(r) for r in rows])        # (2w, 3, Y, Z)
    # static row selection: grid step r -> band row (index maps cannot close
    # over traced arrays)
    row_map = lambda r: (jnp.int32(jnp.where(r < w, r, X - 2 * w + r)), 0, 0)
    rowblk = pl.BlockSpec((1, Y, Z), row_map, memory_space=pltpu.VMEM)
    kern = functools.partial(_xband_fix_kernel, offsets, mode)
    with jax.enable_x64(False):       # see _matvec_one: Mosaic x64 limitation
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((X, Y, Z), x.dtype),
            grid=(2 * w,),
            in_specs=[
                pl.BlockSpec((1, 3, Y, Z), lambda r: (jnp.int32(r), 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, 1, Y, Z), lambda r: (0, jnp.int32(r), 0, 0),
                             memory_space=pltpu.VMEM),
                rowblk, rowblk, rowblk, rowblk,
            ],
            out_specs=rowblk,
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(xwin, fx, b, x, d, y)


@functools.partial(jax.jit, static_argnames=("offsets", "w", "interpret"))
def _matvec_one(const, fx, fy, fz, x, offsets, w, interpret):
    X, Y, Z = x.shape
    nd = len(offsets)
    Xp = -(-X // _BX) * _BX
    xq = jnp.pad(x, ((0, Xp - X), (0, 0), (0, 0))) if Xp != X else x
    nb = Xp // _BX
    kern = functools.partial(_interior_kernel, offsets, w, nb)
    # NOTE: this toolchain's Mosaic cannot lower ANY pallas_call traced under
    # jax_enable_x64 (an internal i64 index function fails to legalize);
    # tracing the call in a local 32-bit scope is semantically inert here
    # (all operand dtypes are explicit) and keeps the kernels usable from
    # x64-certified drivers like solve_mg_refined.
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Z), lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Y), lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Y, Z),
                             lambda i: (jnp.int32(jnp.maximum(i * _BX - 1, 0)),
                                        0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Y, Z),
                             lambda i: (jnp.int32(jnp.minimum(i * _BX + _BX,
                                                              Xp - 1)), 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(const, jnp.pad(fy, ((0, 0), (0, 0), (0, Xp - X), (0, 0))),
          jnp.pad(fz, ((0, 0), (0, 0), (0, Xp - X), (0, 0))), xq, xq, xq)
    y = y[:X]

    zf = jnp.zeros_like(x)
    y = _apply_xband(y, x, zf, zf, fx_narrow(fx, w), offsets, w,
                     "matvec", interpret)
    return y


def const3d_matvec_pallas(const, faces, offsets, x, w: int,
                          interpret: bool = False):
    """Exact y = A x for a 3D constant-interior stencil; x (..., X, Y, Z)."""
    grid = x.shape[-3:]
    lead = x.shape[:-3]
    fx, fy, fz = faces
    xr = x.reshape((-1,) + grid)
    fn = lambda v: _matvec_one(const, fx, fy, fz, v,
                               tuple(map(tuple, offsets)), w, interpret)
    if xr.shape[0] == 1:
        out = fn(xr[0])[None]
    else:
        out = jax.vmap(fn)(xr)
    return out.reshape(lead + grid)
