"""Fused Pallas TPU kernels for 2D constant-interior stencil cycle ops.

The grid-engine V-cycle's hot loop is smoother sweeps and residuals of a
ConstGridStencil (mgtpu.ops.grid_stencil): constant 9-point interior
coefficients with true coefficients on a `w`-node boundary band.  The XLA
shift-multiply-accumulate path materialises a padded copy of x and re-reads
the overlapping shift windows (~320 GB/s effective on a v5e whose HBM does
~800); worse, consecutive cycle statements (smooth -> residual -> smooth)
each round-trip every field through HBM.

These kernels fuse the per-level op sequences into single passes over J-slab
tiles, reading each field once:

    residual            r  = b - A x
    jacobi_step         x' = x + d .* (b - A x)
    jacobi_residual     x' as above, r' = b - A x'    (pre-smooth + restrict feed)
    correct_jacobi      u  = x + p;  x' = u + d .* (b - A u)
                                                  (prolong-correct + post-smooth)

All four are instances of one kernel body:  u = x (+ p);  r0 = b - A u
[band-corrected];  x' = u + d .* r0;  r' = b - A x' [band-corrected].

Boundary-band handling: the constant-coefficient apply is valid on the
interior; the `w`-wide lane band (left/right grid edges) is overwritten from
full-extent edge coefficient columns, and the top/bottom edge rows from the
stored edge row strips — including corners, which the row strips own
(mirroring ConstGridStencil's disjoint box cover).  Edge coefficients are
zero where a matrix entry does not exist, so zero-filled halo reads
contribute exactly nothing, as in the sparse operator.  Mosaic lowers no
dynamic slicing of values, so fields are padded with a STATIC top margin
(_PT rows) that places every edge row at a static padded index; the edge-row
overwrites become `lax.cond(j == tile, static-concat)` per band row.

This is the TPU-native replacement for the fused OpenMP relaxation sweeps the
reference runs over CSR rows (reference src/Multigrid/MGcycle.jl:122-136 with
ParSpMatVec's C SpMV): one HBM pass per smoother application instead of one
per SpMV plus one per axpy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid_stencil import ConstGridStencil

__all__ = ["supports_fused", "residual", "jacobi_step", "jacobi_residual",
           "correct_jacobi"]

_H = 2     # row halo carried by every tile (enough for the double apply)
_PT = 8    # static top padding: grid row r sits at padded row r + _PT


# ---------------------------------------------------------------------------
# eligibility + operand preparation
# ---------------------------------------------------------------------------

def supports_fused(A, dtype=None) -> bool:
    """Fused kernels cover 2D ConstGridStencils with +-1 offsets, real f32."""
    if not isinstance(A, ConstGridStencil):
        return False
    if len(A.grid) != 2:
        return False
    if any(abs(d) > 1 for off in A.offsets for d in off):
        return False
    if A.boxes[0][1][0] > _H:                 # band wider than the halo
        return False
    dt = np.dtype(dtype if dtype is not None else A.dtype)
    return dt == np.float32


def _edge_arrays(A: ConstGridStencil):
    """Full-extent edge coefficient arrays from the box cover.

    Returns (T, B, L, R, w): T/B are (nd, w, NI) edge row strips (full lane
    extent, corners included); L/R are (nd, NJ, w) edge column strips at full
    row extent (corner rows filled from T/B — rows the row-strip overwrite
    recomputes anyway).
    """
    NJ, NI = A.grid
    w = A.boxes[0][1][0]
    T = A.strips[0]                                   # (nd, w, NI)
    B = A.strips[1]
    lmid = A.strips[2]                                # (nd, NJ-2w, w)
    rmid = A.strips[3]
    L = jnp.concatenate([T[:, :, :w], lmid, B[:, :, :w]], axis=1)
    R = jnp.concatenate([T[:, :, NI - w:], rmid, B[:, :, NI - w:]], axis=1)
    return T, B, L, R, w


def _rolled(x):
    """{di: lane-rolled view} with y[.., i] = x[.., i + di] on the interior.

    Mosaic lowers no unaligned lane concatenation, so shifts are circular
    rolls; the wrapped first/last column is only ever read multiplied by a
    zero edge coefficient or overwritten by the band correction.
    """
    ni = x.shape[-1]
    return {-1: pltpu.roll(x, 1, axis=x.ndim - 1),
            0: x,
            1: pltpu.roll(x, ni - 1, axis=x.ndim - 1)}


def _pick_bj(ni: int, nfields: int, vmem_budget=10 * 2 ** 20) -> int:
    for bj in (256, 128, 64, 32, 16):
        byts = 4 * ni * nfields * (bj + 2 * _H) * 2   # double-buffered tiles
        if byts <= vmem_budget:
            return bj
    return 16


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _apply_corrected(consts_ref, offs, T, B, L_ext, R_ext, El, Er,
                     w, NJ, NI, BJ, nb, j, x_ext, rows, ext_off):
    """Band-corrected stencil apply producing `rows` output rows.

    x_ext:     (BJ + 2*_H, NI) tile rows, origin at padded row j*BJ - _H
    rows:      static number of output rows
    ext_off:   static index into x_ext of the first output row
    L_ext/R_ext: (nd, BJ + 2*_H, w) edge column strips, same origin
    T/B:       (nd, w, NI) edge row strips
    El/Er:     (w, NI) selection matrices placing band columns at the
               left/right grid edge (tiny MXU matmuls — Mosaic lowers no
               unaligned lane concatenation)
    """
    NIp = x_ext.shape[-1]           # lane-padded extent; NI is the true one
    pick = _rolled(x_ext)

    # 1) constant interior apply (garbage on the bands, overwritten below)
    acc = jnp.zeros((rows, NIp), x_ext.dtype)
    for k, (dj, di) in enumerate(offs):
        acc = acc + consts_ref[k, 0] * pick[di][ext_off + dj:
                                                ext_off + dj + rows]

    # 2) lane band: left/right columns from the true edge coefficients
    #    (wrapped roll columns are killed by zero edge coefficients)
    lacc = jnp.zeros((rows, w), x_ext.dtype)
    racc = jnp.zeros((rows, w), x_ext.dtype)
    for k, (dj, di) in enumerate(offs):
        win = pick[di][ext_off + dj: ext_off + dj + rows]
        lacc = lacc + L_ext[k, ext_off: ext_off + rows] * win[:, :w]
        racc = racc + R_ext[k, ext_off: ext_off + rows] * win[:, NI - w: NI]
    band = (jnp.dot(lacc, El, preferred_element_type=x_ext.dtype,
                    precision=jax.lax.Precision.HIGHEST) +
            jnp.dot(racc, Er, preferred_element_type=x_ext.dtype,
                    precision=jax.lax.Precision.HIGHEST))
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, NIp), 1)
    on_band = jnp.logical_or(cols < w,
                             jnp.logical_and(cols >= NI - w, cols < NI))
    acc = jnp.where(on_band, band, acc)

    # 3) edge rows: every band row sits at a STATIC padded index (top margin
    #    _PT), so its tile and in-tile offset are compile-time constants
    for strips, base in ((T, _PT), (B, _PT + NJ - w)):
        for r in range(w):
            Rp = base + r                       # padded row of this band row
            lo = Rp - ext_off + _H - rows + 1   # j*BJ range containing it
            hi = Rp - ext_off + _H
            for jc in range(max(0, -(-lo // BJ)), min(nb - 1, hi // BJ) + 1):
                off = Rp - jc * BJ - ext_off + _H
                val = jnp.zeros((1, NIp), x_ext.dtype)
                for k, (dj, di) in enumerate(offs):
                    val = val + strips[k, r:r + 1] * pick[di][
                        ext_off + off + dj: ext_off + off + dj + 1]
                acc = jax.lax.cond(
                    j == jc,
                    lambda a, v=val, o=off: jnp.concatenate(
                        [a[:o], v, a[o + 1:]], axis=0),
                    lambda a: a, acc)
    return acc


def _make_kernel(offs, w, NJ, NI, BJ, nb, has_p, do_jac, out_res):
    def kernel(*refs):
        i = 0
        consts = refs[i]; i += 1
        xm, xt, xb = refs[i], refs[i + 1], refs[i + 2]; i += 3
        if has_p:
            pm, pt, pb = refs[i], refs[i + 1], refs[i + 2]; i += 3
        bm, bt_, bb = refs[i], refs[i + 1], refs[i + 2]; i += 3
        if do_jac:
            dm, dt_, db = refs[i], refs[i + 1], refs[i + 2]; i += 3
        T, B = refs[i], refs[i + 1]; i += 2
        Lm, Lt, Lb = refs[i], refs[i + 1], refs[i + 2]; i += 3
        Rm, Rt, Rb = refs[i], refs[i + 1], refs[i + 2]; i += 3
        El, Er = refs[i], refs[i + 1]; i += 2
        outs = refs[i:]

        j = pl.program_id(0)
        last = j == nb - 1

        def ext(main, top, bot, axis=0):
            # halo blocks are 8 rows (min sublane tile); use the inner _H.
            # The top margin (_PT >= _H zero rows) makes tile 0's clamped
            # top-halo read land in real zero padding; the bottom may have
            # no padding, so the last tile's bottom halo is masked to zero.
            sl_t = [slice(None)] * main.ndim
            sl_t[axis] = slice(8 - _H, None)
            sl_b = [slice(None)] * main.ndim
            sl_b[axis] = slice(None, _H)
            bpart = jnp.where(last, jnp.zeros_like(bot[:]), bot[:])
            return jnp.concatenate(
                [top[:][tuple(sl_t)], main[:], bpart[tuple(sl_b)]], axis=axis)

        x_ext = ext(xm, xt, xb)
        if has_p:
            x_ext = x_ext + ext(pm, pt, pb)
        b_ext = ext(bm, bt_, bb)
        L_ext = ext(Lm, Lt, Lb, axis=1)
        R_ext = ext(Rm, Rt, Rb, axis=1)
        Tc, Bc = T[:], B[:]

        def apply(xe, rows, ext_off):
            return _apply_corrected(consts, offs, Tc, Bc, L_ext, R_ext,
                                    El[:], Er[:], w, NJ, NI, BJ, nb, j, xe,
                                    rows, ext_off)

        if not do_jac:
            outs[0][:] = b_ext[_H:_H + BJ] - apply(x_ext, BJ, _H)
            return

        d_ext = ext(dm, dt_, db)
        # r0 and x1 on the tile + a one-row overhang: the overhang supplies
        # the halo the second apply reads (identical arithmetic to the
        # neighbor tile's own value, so tiles agree bitwise)
        r0 = b_ext[_H - 1:_H + BJ + 1] - apply(x_ext, BJ + 2, _H - 1)
        x1_mid = x_ext[_H - 1:_H + BJ + 1] + d_ext[_H - 1:_H + BJ + 1] * r0
        outs[0][:] = x1_mid[1:BJ + 1]
        if out_res:
            # same-origin ext array; the zero rows at +-_H are only read
            # through zero coefficients at the domain edge
            zrow = jnp.zeros((1, x_ext.shape[-1]), x_ext.dtype)
            x1_ext = jnp.concatenate([zrow, x1_mid, zrow], axis=0)
            outs[1][:] = b_ext[_H:_H + BJ] - apply(x1_ext, BJ, _H)

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "offs", "w", "NJ", "NI", "has_p", "do_jac", "out_res", "interpret"))
def _fused_call(consts, offs, w, NJ, NI, has_p, do_jac, out_res, interpret,
                x, p, b, d, T, B, L, R):
    nfields = 2 + (1 if has_p else 0) + (1 if do_jac else 0)
    NIp = -(-NI // 128) * 128        # lane-aligned extent
    BJ = _pick_bj(NIp, nfields)
    NJp = -(-(NJ + _PT) // BJ) * BJ
    pb_pad = NJp - NJ - _PT
    nb = NJp // BJ

    def padj(a):
        return jnp.pad(a, ((_PT, pb_pad), (0, NIp - NI)))

    xp = padj(x)
    bp = padj(b)
    pp = padj(p) if has_p else None
    dp = padj(d) if do_jac else None
    Lp = jnp.pad(L, ((0, 0), (_PT, pb_pad), (0, 0)))
    Rp = jnp.pad(R, ((0, 0), (_PT, pb_pad), (0, 0)))
    Tp = jnp.pad(T, ((0, 0), (0, 0), (0, NIp - NI)))
    Bp = jnp.pad(B, ((0, 0), (0, 0), (0, NIp - NI)))

    main = pl.BlockSpec((BJ, NIp), lambda j: (j, 0), memory_space=pltpu.VMEM)
    halo_t = pl.BlockSpec(
        (8, NIp), lambda j: (jnp.maximum(j * (BJ // 8) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    halo_b = pl.BlockSpec(
        (8, NIp), lambda j: (jnp.minimum((j + 1) * (BJ // 8),
                                         NJp // 8 - 1), 0),
        memory_space=pltpu.VMEM)
    nd = len(offs)
    emain = pl.BlockSpec((nd, BJ, w), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM)
    ehalo_t = pl.BlockSpec(
        (nd, 8, w), lambda j: (0, jnp.maximum(j * (BJ // 8) - 1, 0), 0),
        memory_space=pltpu.VMEM)
    ehalo_b = pl.BlockSpec(
        (nd, 8, w), lambda j: (0, jnp.minimum((j + 1) * (BJ // 8),
                                              NJp // 8 - 1), 0),
        memory_space=pltpu.VMEM)

    def full(a):
        n = a.ndim
        return pl.BlockSpec(a.shape, lambda j, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    ins = [consts.reshape(-1, 1)]
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for arr, used in ((xp, True), (pp, has_p), (bp, True), (dp, do_jac)):
        if used:
            ins += [arr, arr, arr]
            specs += [main, halo_t, halo_b]
    El = jnp.zeros((w, NIp), x.dtype).at[jnp.arange(w), jnp.arange(w)].set(1)
    Er = jnp.zeros((w, NIp), x.dtype).at[jnp.arange(w),
                                         NI - w + jnp.arange(w)].set(1)
    ins += [Tp, Bp, Lp, Lp, Lp, Rp, Rp, Rp, El, Er]
    specs += [full(Tp), full(Bp), emain, ehalo_t, ehalo_b,
              emain, ehalo_t, ehalo_b, full(El), full(Er)]

    n_out = (1 if do_jac else 0) + (1 if (out_res or not do_jac) else 0)
    out_shape = [jax.ShapeDtypeStruct((NJp, NIp), x.dtype)] * n_out
    out_specs = [main] * n_out

    kern = _make_kernel(offs, w, NJ, NI, BJ, nb, has_p, do_jac, out_res)
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(*ins)
    outs = [o[_PT:_PT + NJ, :NI] for o in outs]
    return tuple(outs) if len(outs) > 1 else outs[0]


def _prep(A: ConstGridStencil):
    offs = tuple((int(o[0]), int(o[1])) for o in A.offsets)
    T, B, L, R, w = _edge_arrays(A)
    NJ, NI = A.grid
    consts = jnp.asarray(A.const, dtype=A.dtype)
    return consts, offs, T, B, L, R, w, NJ, NI


def _batched(fn, *fields):
    """Apply fn over an optional leading batch axis of (m, NJ, NI) fields."""
    if fields[0].ndim == 2:
        return fn(*fields)
    outs = [fn(*[f[i] for f in fields]) for i in range(fields[0].shape[0])]
    if isinstance(outs[0], tuple):
        return tuple(jnp.stack([o[k] for o in outs])
                     for k in range(len(outs[0])))
    return jnp.stack(outs)


def residual(A: ConstGridStencil, b, x, interpret: bool = False):
    """r = b - A x; fields (.., NJ, NI)."""
    consts, offs, T, B, L, R, w, NJ, NI = _prep(A)

    def one(bb, xx):
        return _fused_call(consts, offs, w, NJ, NI, False, False, True,
                           interpret, xx, None, bb, None, T, B, L, R)
    return _batched(one, b, x)


def jacobi_step(A: ConstGridStencil, d, b, x, interpret: bool = False):
    """x' = x + d .* (b - A x)."""
    consts, offs, T, B, L, R, w, NJ, NI = _prep(A)
    d2 = d.reshape(A.grid)

    def one(bb, xx):
        return _fused_call(consts, offs, w, NJ, NI, False, True, False,
                           interpret, xx, None, bb, d2, T, B, L, R)
    return _batched(one, b, x)


def jacobi_residual(A: ConstGridStencil, d, b, x, interpret: bool = False):
    """x' = x + d .* (b - A x);  r' = b - A x'."""
    consts, offs, T, B, L, R, w, NJ, NI = _prep(A)
    d2 = d.reshape(A.grid)

    def one(bb, xx):
        return _fused_call(consts, offs, w, NJ, NI, False, True, True,
                           interpret, xx, None, bb, d2, T, B, L, R)
    return _batched(one, b, x)


def correct_jacobi(A: ConstGridStencil, d, b, x, p, interpret: bool = False):
    """u = x + p;  x' = u + d .* (b - A u)."""
    consts, offs, T, B, L, R, w, NJ, NI = _prep(A)
    d2 = d.reshape(A.grid)

    def one(bb, xx, pp):
        return _fused_call(consts, offs, w, NJ, NI, True, True, False,
                           interpret, xx, pp, bb, d2, T, B, L, R)
    return _batched(one, b, x, p)
