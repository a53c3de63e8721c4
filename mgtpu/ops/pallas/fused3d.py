"""Fused Pallas TPU kernels for the 3D constant-interior cycle ops.

Extends ops/pallas/const3d.py (one-pass exact matvec) with the smoother
fusions the 3D V-cycle spends its bytes on:

    residual3d          r  = b - A x
    jacobi3d            x' = x + d .* (b - A x)
    jacobi_residual3d   x' = x + d .* (b - A x);  r' = b - A x'

Each is ONE pass over the fields instead of a kernel matvec plus separate
XLA axpy/sub passes (slope-timed: the unfused kernel matvec cut the fine
apply 0.83 -> 0.24 ms but the full cycle only reached 1.6 ms because every
smoother step still round-tripped x/b/r through HBM).  The double-apply
`jacobi_residual3d` is the pre-smooth + restrict feed of the V-cycle in a
single pass: the kernel smooths an x-extended block (one halo plane each
side) so the second apply's taps are in VMEM already — b/d/x are read once
and only x'/r' return to HBM.

Structure: same grid/halo/band scheme as const3d._interior_kernel — the
A-apply accumulates into a VMEM scratch, y/z boundary bands are overwritten
in-scratch from full-extent face coefficients, then the op's arithmetic
(b - ., x + d .* .) reads the scratch once.  X-halo planes are loaded as
SINGLE-plane blocks (radius-1 taps need one plane, not the full neighbor
block).  The x band (first/last w planes; 2w for the double apply, whose
second apply reads the corrected plane one row in) is fixed OUTSIDE by the
shared tap-grid kernel (const3d._apply_xband) on exact row coefficients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .const3d import _apply_xband, _xband_rows, build_tz, bx_for, \
    face_specs, fx_narrow, inkernel_xband, main_ytap, main_ztap, \
    store_banded, tap_accum, use_bandv2, xband_row

__all__ = ["residual3d", "jacobi3d", "jacobi_corr3d", "jacobi_residual3d"]


def _active_band_meta(A):
    """Resolve the v2 band schedule OUTSIDE the jit boundary: band_meta is
    a static jit key, so the env opt-out (use_bandv2) must decide BEFORE
    the cached trace is looked up — resolving inside the jitted body would
    let a stale schedule survive an env toggle."""
    bmeta = getattr(A, "band_meta", None)
    compact = A.faces is not None and A.faces[1].shape[1] == 1
    return bmeta if use_bandv2(bmeta, compact) else None


def _fused_kernel(offsets, w, nb, do_jac, has_p, xb, bm, c_ref, fy_ref,
                  fz_ref, *rest):
    if bm is not None:                 # v2 additive z-band schedule
        zint_ref, tz_ref, *rest = rest
    else:
        zint_ref = tz_ref = None
    if xb is not None:                 # in-kernel x-band fold (fx_narrow)
        fxn_ref, *rest = rest          # fxn comes RIGHT AFTER fz/zint
    xm_ref, x0_ref, xp_ref, *rest = rest
    if has_p:
        pm_ref, p0_ref, pp_ref, b_ref, *rest = rest
    else:
        b_ref, *rest = rest
    if do_jac:
        d_ref, out_ref, ax_ref = rest
    else:
        out_ref, ax_ref = rest
    i = pl.program_id(0)
    cur = x0_ref[:]                                     # (BX, Y, Z)
    Y, Z = cur.shape[1], cur.shape[2]
    top = jnp.where(i > 0, xm_ref[:], jnp.zeros_like(cur[:1]))
    bot = jnp.where(i < nb - 1, xp_ref[:], jnp.zeros_like(cur[:1]))
    if has_p:
        # coarse-correction fold: the smoothed iterate is s = x + p; add p
        # to the block AND its halo planes before the taps read them
        cur = cur + p0_ref[:]
        top = top + jnp.where(i > 0, pm_ref[:], jnp.zeros_like(cur[:1]))
        bot = bot + jnp.where(i < nb - 1, pp_ref[:], jnp.zeros_like(cur[:1]))
    planes = {
        -1: jnp.concatenate([top, cur[:-1]], axis=0),
        0: cur,
        1: jnp.concatenate([cur[1:], bot], axis=0),
    }
    res = tap_accum(
        lambda dx: planes[dx], c_ref, main_ytap(fy_ref, w),
        main_ztap(fz_ref, w), offsets, w, cur.shape[0], Y, Z, cur.dtype,
        band_meta=bm, zint_ref=zint_ref, tz_ref=tz_ref)
    store_banded(ax_ref, 0, cur.shape[0], res, w, Y, Z)
    r = b_ref[:] - ax_ref[:]
    if do_jac:
        out_ref[:] = cur + d_ref[:] * r
    else:
        out_ref[:] = r
    if xb is not None:
        # exact x-band rows, written LAST (fx carries TRUE coefficients on
        # the whole row, corners included)
        def _fix(sel, slot):
            axr = xband_row(lambda dx: sel(planes[dx]), fxn_ref, slot,
                            offsets, cur.shape[1], cur.shape[2], cur.dtype)
            rr = sel(b_ref[:]) - axr
            return sel(cur) + sel(d_ref[:]) * rr if do_jac else rr

        for blk_i, off_r, slot in xb:
            @pl.when(i == blk_i)
            def _row(off_r=off_r, slot=slot):
                out_ref[off_r:off_r + 1] = _fix(
                    lambda a: a[off_r:off_r + 1], slot)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "w", "do_jac", "interpret",
                                    "band_meta"))
def _fused_one(const, fx, fyq, fzq, x, b, d, p, offsets, w, do_jac,
               interpret, band_meta=None):
    X, Y, Z = x.shape
    nd = len(offsets)
    bx = bx_for(X, Y, Z)
    Xp = -(-X // bx) * bx
    padX = ((0, Xp - X), (0, 0), (0, 0))
    xq = jnp.pad(x, padX) if Xp != X else x
    bq = jnp.pad(b, padX) if Xp != X else b
    nb = Xp // bx
    has_p = p is not None
    fold = inkernel_xband()
    xb = _xband_rows(X, w, bx) if fold else None
    bm = band_meta if use_bandv2(band_meta, fyq.shape[1] == 1) else None
    kern = functools.partial(_fused_kernel, offsets, w, nb, do_jac, has_p,
                             xb, bm)
    blk = lambda: pl.BlockSpec((bx, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                               memory_space=pltpu.VMEM)
    plane = lambda f: pl.BlockSpec((1, Y, Z),
                                   lambda i: (jnp.int32(f(i)), 0, 0),
                                   memory_space=pltpu.VMEM)
    im1 = lambda i: jnp.maximum(i * bx - 1, 0)
    ip1 = lambda i: jnp.minimum(i * bx + bx, Xp - 1)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += face_specs(fyq, fzq, w, Y, Z, bx)
    ops = [const, fyq, fzq]
    if bm is not None:
        # y-invariant z-band scalars (SMEM) + prebuilt (G, Z, Z) tz
        # matrices (constant-index VMEM block, built once per apply)
        zint = fzq[:, 0, :, w]
        tzm = build_tz(const, zint, offsets, w, Z, x.dtype)
        G = tzm.shape[0]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ops.append(zint)
        in_specs.append(pl.BlockSpec((G, Z, Z), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(tzm)
    if fold:
        # constant-index block: fetched once, stays VMEM-resident
        in_specs.append(pl.BlockSpec((nd, 2 * w, Y, Z),
                                     lambda i: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(fx_narrow(fx, w))
    in_specs += [plane(im1), blk(), plane(ip1)]
    ops += [xq, xq, xq]
    if has_p:
        pq = jnp.pad(p, padX) if Xp != X else p
        in_specs += [plane(im1), blk(), plane(ip1)]
        ops += [pq, pq, pq]
    in_specs.append(blk())
    ops.append(bq)
    if do_jac:
        in_specs.append(blk())
        ops.append(jnp.pad(d, padX) if Xp != X else d)
    with jax.enable_x64(False):       # see const3d: Mosaic x64 limitation
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=blk(),
            scratch_shapes=[pltpu.VMEM((bx, Y, Z), x.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(*ops)[:X]
    if fold:                        # x bands already exact in-kernel
        return out

    # x-band fix: exact values on the first/last w planes, written
    # in-place by the aliased row kernel (const3d._apply_xband).  With the
    # correction fold the smoothed iterate is s = x + p; XLA fuses the add
    # into the band-row slices, so only the 6 needed planes materialise.
    s = x + p if has_p else x
    out = _apply_xband(out, s, b, d if d is not None else jnp.zeros_like(x),
                       fx_narrow(fx, w), offsets, w,
                       "jacobi" if do_jac else "residual", interpret)
    return out


def _jacres_kernel(offsets, w, nb, compact, bmeta, c_ref, fy_ref,
                   fz_ref, *rest):
    """Double apply: smooth the x-extended block, then the residual of the
    smoothed iterate — all taps in VMEM.

    Stage A writes band-corrected A x for planes [iB-1, iB+B] into the
    (B+2)-plane scratch `ax_ref`, forms x' = x + d (b - Ax) in `x1s_ref`,
    and emits the block interior.  Stage B re-applies A to x' (halo
    planes now sitting in scratch) and emits r' = b - A x'.
    Out-of-domain halos are masked to zero; planes whose TRUE row taps
    differ from the const+band model (the first/last 2w planes of the
    domain) are fixed outside by const3d._apply_xband on exact row
    coefficients.

    COMPACT faces (x-invariant band coefficients, const3d.build_faces):
    the one VMEM-resident fy/fz row serves ANY row count by broadcast, so
    (a) the x-leading transposed halo slabs (fym/fyp/fzm/fzp) disappear,
    and (b) stage A is ONE (B+2)-row accumulation over the already-loaded
    xm2/xp2 planes (r4) — two fewer tap-loop instances per grid step than
    the general path's main-block + two single-plane halo accums, and
    taller (n*Y, Z) operands for the v2 tridiagonal MXU matmuls; it is
    also bitwise-consistent with the single-apply kernels (pinned in
    tests).  Stage-A values at x-band halo planes are inexact under the
    broadcast row, but every stage-B row they reach lies inside the
    first/last-2w exact-row fix — the same coverage the general path
    already requires.

    GENERAL faces: main block via the roll/halo scheme, the two halo
    planes via their own single-plane tap loops with their own face
    slabs."""
    if bmeta is not None:              # v2 additive z-band schedule
        zint_ref, tz_ref, *rest = rest
    else:
        zint_ref = tz_ref = None
    if compact:
        (xm2_ref, xm1_ref, x0_ref, xp1_ref, xp2_ref, bm_ref, b_ref, bp_ref,
         dm_ref, d_ref, dp_ref, x1_ref, r1_ref, ax_ref, x1s_ref) = rest
    else:
        (fym_ref, fyp_ref, fzm_ref, fzp_ref, xm2_ref, xm1_ref, x0_ref,
         xp1_ref, xp2_ref, bm_ref, b_ref, bp_ref, dm_ref, d_ref, dp_ref,
         x1_ref, r1_ref, ax_ref, x1s_ref) = rest
    i = pl.program_id(0)
    cur = x0_ref[:]                                     # (B, Y, Z)
    B = cur.shape[0]
    Y, Z = cur.shape[1], cur.shape[2]
    zp = jnp.zeros_like(cur[:1])
    m_ok = i > 0
    p_ok = i < nb - 1
    xm2 = jnp.where(m_ok, xm2_ref[:], zp)
    xm1 = jnp.where(m_ok, xm1_ref[:], zp)
    xp1 = jnp.where(p_ok, xp1_ref[:], zp)
    xp2 = jnp.where(p_ok, xp2_ref[:], zp)
    bm = jnp.where(m_ok, bm_ref[:], zp)
    bp = jnp.where(p_ok, bp_ref[:], zp)
    dm = jnp.where(m_ok, dm_ref[:], zp)
    dp = jnp.where(p_ok, dp_ref[:], zp)

    if not compact:
        planes = {
            -1: jnp.concatenate([xm1, cur[:-1]], axis=0),
            0: cur,
            1: jnp.concatenate([cur[1:], xp1], axis=0),
        }
        lo = {-1: xm2, 0: xm1, 1: cur[:1]}              # taps for plane iB-1
        hi = {-1: cur[B - 1:], 0: xp1, 1: xp2}          # taps for plane iB+B

    def _accum(planes_of, ytap, ztap, n):
        # ytap(k) -> (ylo_c, yhi_c) each (n, w, Z); ztap(k) -> (zlo_c,
        # zhi_c) each (n, Y, w).  Pre-shaped by the caller so halo slabs
        # (stored x-leading for Mosaic block tiling) need no in-kernel
        # transposes.  Tap schedule: const3d.tap_accum.
        return tap_accum(planes_of, c_ref, ytap, ztap, offsets, w, n,
                         Y, Z, cur.dtype, band_meta=bmeta,
                         zint_ref=zint_ref, tz_ref=tz_ref)

    def _tap_main_y(ref):
        # main fy block: ref[k] is (2w, B, Z) -> pair of (B, w, Z)
        return main_ytap(ref, w)

    def _tap_main_z(ref):
        # main fz block: ref[k] is (2w, B, Y) -> pair of (B, Y, w)
        return main_ztap(ref, w)

    def _tap_halo_y(ref):
        # x-leading slab (1, nd, 2w, Z): ref[0, k] is (2w, Z) -> (1, w, Z)
        return lambda k: (ref[0, k][:w][None], ref[0, k][w:][None])

    def _tap_halo_z(ref):
        # x-leading slab (1, nd, Y, 2w): ref[0, k] is (Y, 2w) -> (1, Y, w)
        return lambda k: (ref[0, k][:, :w][None], ref[0, k][:, w:][None])

    def _store(ref, a, b2, parts):
        # static slice bounds only — Mosaic lowers static partial stores
        store_banded(ref, a, b2, parts, w, Y, Z)

    # stage A: band-corrected A x on planes [iB-1, iB+B]
    if compact:
        # the one broadcast face row serves ANY row count, so the main
        # block and both halo planes merge into ONE (B+2)-row
        # accumulation over the already-loaded xm2/xp2 planes — two fewer
        # tap-loop instances per grid step (at bx=3 the two single-plane
        # halo accums were 2/3 of the stage-A tap work) and a taller
        # (n*Y, Z) operand for the tridiagonal MXU matmuls
        ext = {
            -1: jnp.concatenate([xm2, xm1, cur], axis=0),
            0: jnp.concatenate([xm1, cur, xp1], axis=0),
            1: jnp.concatenate([cur, xp1, xp2], axis=0),
        }
        _store(ax_ref, 0, B + 2,
               _accum(lambda dx: ext[dx],
                      _tap_main_y(fy_ref), _tap_main_z(fz_ref), B + 2))
    else:
        hy_m, hy_p = _tap_halo_y(fym_ref), _tap_halo_y(fyp_ref)
        hz_m, hz_p = _tap_halo_z(fzm_ref), _tap_halo_z(fzp_ref)
        _store(ax_ref, 1, B + 1,
               _accum(lambda dx: planes[dx],
                      _tap_main_y(fy_ref), _tap_main_z(fz_ref), B))
        _store(ax_ref, 0, 1, _accum(lambda dx: lo[dx], hy_m, hz_m, 1))
        _store(ax_ref, B + 1, B + 2,
               _accum(lambda dx: hi[dx], hy_p, hz_p, 1))
    xe = jnp.concatenate([xm1, cur, xp1], axis=0)       # (B+2, Y, Z)
    be = jnp.concatenate([bm, b_ref[:], bp], axis=0)
    de = jnp.concatenate([dm, d_ref[:], dp], axis=0)
    x1s_ref[:] = xe + de * (be - ax_ref[:])
    x1_ref[:] = x1s_ref[1:B + 1]

    # stage B: r' = b - A x' on the block interior (x' halos from scratch)
    x1e = x1s_ref[:]
    _store(ax_ref, 1, B + 1,
           _accum(lambda dx: x1e[1 + dx:1 + dx + B],
                  _tap_main_y(fy_ref), _tap_main_z(fz_ref), B))
    r1_ref[:] = b_ref[:] - ax_ref[1:B + 1]


@functools.partial(jax.jit,
                   static_argnames=("offsets", "w", "interpret",
                                    "band_meta"))
def _jacres_one(const, fx, fyq, fzq, fyq_t, fzq_t, x, b, d, offsets, w,
                interpret, band_meta=None):
    X, Y, Z = x.shape
    nd = len(offsets)
    bx = bx_for(X, Y, Z)
    Xp = -(-X // bx) * bx
    padX = ((0, Xp - X), (0, 0), (0, 0))
    xq = jnp.pad(x, padX) if Xp != X else x
    bq = jnp.pad(b, padX) if Xp != X else b
    dq = jnp.pad(d, padX) if Xp != X else d
    nb = Xp // bx
    compact = fyq.shape[1] == 1
    bmeta = band_meta if use_bandv2(band_meta, compact) else None
    kern = functools.partial(_jacres_kernel, offsets, w, nb, compact, bmeta)
    blk = lambda: pl.BlockSpec((bx, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                               memory_space=pltpu.VMEM)
    plane = lambda f: pl.BlockSpec((1, Y, Z),
                                   lambda i: (jnp.int32(f(i)), 0, 0),
                                   memory_space=pltpu.VMEM)
    # Halo face slabs are stored x-LEADING ((Xp, nd, 2w, Z) / (Xp, nd, Y,
    # 2w)) so a one-plane block's last two dims equal the array dims —
    # Mosaic rejects blocks whose second-to-last dim is 1 against a larger
    # array dim (the r2 lowering failure; VERDICT r2 item 1).
    fslab = lambda m, f: pl.BlockSpec(
        (1, nd, 2 * w, m), lambda i: (jnp.int32(f(i)), 0, 0, 0),
        memory_space=pltpu.VMEM)
    fslab_z = lambda m, f: pl.BlockSpec(
        (1, nd, m, 2 * w), lambda i: (jnp.int32(f(i)), 0, 0, 0),
        memory_space=pltpu.VMEM)
    im1 = lambda i: jnp.maximum(i * bx - 1, 0)
    im2 = lambda i: jnp.maximum(i * bx - 2, 0)
    ip1 = lambda i: jnp.minimum(i * bx + bx, Xp - 1)
    ip2 = lambda i: jnp.minimum(i * bx + bx + 1, Xp - 1)
    # fyq/fzq (padded or compact) and — general form only — fyq_t/fzq_t
    # (x-leading transposed halo slabs) are precomputed at setup
    # (const3d.build_faces); compact faces need no slabs at all
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += face_specs(fyq, fzq, w, Y, Z, bx)
    ops = [const, fyq, fzq]
    if bmeta is not None:
        # y-invariant z-band scalars (SMEM) + prebuilt (G, Z, Z) tz
        # matrices (constant-index VMEM block, built once per apply)
        zint = fzq[:, 0, :, w]
        tzm = build_tz(const, zint, offsets, w, Z, x.dtype)
        G = tzm.shape[0]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ops.append(zint)
        in_specs.append(pl.BlockSpec((G, Z, Z), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        ops.append(tzm)
    if not compact:
        in_specs += [fslab(Z, im1), fslab(Z, ip1),      # fy halo planes
                     fslab_z(Y, im1), fslab_z(Y, ip1)]  # fz halo planes
        ops += [fyq_t, fyq_t, fzq_t, fzq_t]
    in_specs += [
        plane(im2), plane(im1), blk(), plane(ip1), plane(ip2),
        plane(im1), blk(), plane(ip1),          # b
        plane(im1), blk(), plane(ip1),          # d
    ]
    ops += [xq, xq, xq, xq, xq, bq, bq, bq, dq, dq, dq]
    with jax.enable_x64(False):       # see const3d: Mosaic x64 limitation
        x1k, r1k = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
                       jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype)],
            grid=(nb,),
            in_specs=in_specs,
            out_specs=[blk(), blk()],
            scratch_shapes=[pltpu.VMEM((bx + 2, Y, Z), x.dtype),
                            pltpu.VMEM((bx + 2, Y, Z), x.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(*ops)
    x1k, r1k = x1k[:X], r1k[:X]

    # exact x-band fixes: x' on the first/last w planes (true row taps),
    # then r' on the first/last 2w planes (its taps read the fixed x')
    x1 = _apply_xband(x1k, x, b, d, fx_narrow(fx, w), offsets, w,
                      "jacobi", interpret)
    r1 = _apply_xband(r1k, x1, b, d, fx, offsets, 2 * w,
                      "residual", interpret)
    return x1, r1


def _batched(fn, *fields):
    grid = fields[0].shape[-3:]
    lead = fields[0].shape[:-3]
    flat = [f.reshape((-1,) + grid) for f in fields]
    if flat[0].shape[0] == 1:
        out = fn(*(f[0] for f in flat))
        out = tuple(o[None] for o in out) if isinstance(out, tuple) \
            else out[None]
    else:
        out = jax.vmap(fn)(*flat)
    if isinstance(out, tuple):
        return tuple(o.reshape(lead + grid) for o in out)
    return out.reshape(lead + grid)


def residual3d(A, b, x, interpret: bool = False):
    """r = b - A x (exact), one fused pass; fields (..., X, Y, Z)."""
    w = A.boxes[0][1][0]
    fx, fyq, fzq = A.faces[:3]
    bmeta = _active_band_meta(A)
    fn = lambda xx, bb: _fused_one(A.const, fx, fyq, fzq, xx, bb, None,
                                   None, tuple(map(tuple, A.offsets)), w,
                                   False, interpret, band_meta=bmeta)
    return _batched(fn, x, b)


def jacobi3d(A, d, b, x, interpret: bool = False):
    """x' = x + d .* (b - A x) (exact), one fused pass."""
    w = A.boxes[0][1][0]
    fx, fyq, fzq = A.faces[:3]

    bmeta = _active_band_meta(A)

    def fn(xx, bb):
        return _fused_one(A.const, fx, fyq, fzq, xx, bb, d, None,
                          tuple(map(tuple, A.offsets)), w, True, interpret,
                          band_meta=bmeta)
    return _batched(fn, x, b)


def jacobi_corr3d(A, d, b, x, p, interpret: bool = False):
    """x' = s + d .* (b - A s) with s = x + p (exact), one fused pass —
    the V-cycle's coarse-correction add + first post-smooth sweep without
    materialising s (saves one full-field read+write per cycle)."""
    w = A.boxes[0][1][0]
    fx, fyq, fzq = A.faces[:3]

    bmeta = _active_band_meta(A)

    def fn(xx, bb, pp):
        return _fused_one(A.const, fx, fyq, fzq, xx, bb, d, pp,
                          tuple(map(tuple, A.offsets)), w, True, interpret,
                          band_meta=bmeta)
    return _batched(fn, x, b, p)


def jacobi_residual3d(A, d, b, x, interpret: bool = False):
    """(x', r') = (x + d .* (b - A x), b - A x') — pre-smooth plus the
    restrict-feed residual of the V-cycle in ONE pass over the fields."""
    w = A.boxes[0][1][0]
    f = A.faces
    fyq_t = f[3] if len(f) > 3 else None     # general form only
    fzq_t = f[4] if len(f) > 4 else None

    bmeta = _active_band_meta(A)

    def fn(xx, bb):
        return _jacres_one(A.const, f[0], f[1], f[2], fyq_t, fzq_t, xx, bb,
                           d, tuple(map(tuple, A.offsets)), w, interpret,
                           band_meta=bmeta)
    return _batched(fn, x, b)
