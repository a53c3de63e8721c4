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

from .const3d import _BX, _apply_xband, fx_narrow

__all__ = ["residual3d", "jacobi3d", "jacobi_residual3d"]


def _roll_yz(p, dy, dz, Y, Z):
    if dy:
        p = pltpu.roll(p, np.int32(-dy % Y), axis=1)
    if dz:
        p = pltpu.roll(p, np.int32(-dz % Z), axis=2)
    return p


def _fused_kernel(offsets, w, nb, do_jac, c_ref, fy_ref, fz_ref,
                  xm_ref, x0_ref, xp_ref, b_ref, *rest):
    if do_jac:
        d_ref, out_ref, ax_ref = rest
    else:
        out_ref, ax_ref = rest
    i = pl.program_id(0)
    cur = x0_ref[:]                                     # (BX, Y, Z)
    Y, Z = cur.shape[1], cur.shape[2]
    top = jnp.where(i > 0, xm_ref[:], jnp.zeros_like(cur[:1]))
    bot = jnp.where(i < nb - 1, xp_ref[:], jnp.zeros_like(cur[:1]))
    planes = {
        -1: jnp.concatenate([top, cur[:-1]], axis=0),
        0: cur,
        1: jnp.concatenate([cur[1:], bot], axis=0),
    }
    acc = jnp.zeros_like(cur)
    zlo = jnp.zeros(cur.shape[:2] + (w,), cur.dtype)
    zhi = jnp.zeros(cur.shape[:2] + (w,), cur.dtype)
    ylo = jnp.zeros((cur.shape[0], w, Z), cur.dtype)
    yhi = jnp.zeros((cur.shape[0], w, Z), cur.dtype)
    for k, (dx, dy, dz) in enumerate(offsets):
        p = _roll_yz(planes[dx], dy, dz, Y, Z)
        acc = acc + c_ref[k] * p
        zlo = zlo + p[:, :, :w] * jnp.moveaxis(fz_ref[k, :w], 0, 2)
        zhi = zhi + p[:, :, Z - w:] * jnp.moveaxis(fz_ref[k, w:], 0, 2)
        ylo = ylo + p[:, :w, :] * jnp.moveaxis(fy_ref[k, :w], 0, 1)
        yhi = yhi + p[:, Y - w:, :] * jnp.moveaxis(fy_ref[k, w:], 0, 1)
    ax_ref[:] = acc
    ax_ref[:, :, :w] = zlo
    ax_ref[:, :, Z - w:] = zhi
    ax_ref[:, :w, :] = ylo
    ax_ref[:, Y - w:, :] = yhi
    r = b_ref[:] - ax_ref[:]
    if do_jac:
        out_ref[:] = cur + d_ref[:] * r
    else:
        out_ref[:] = r


@functools.partial(jax.jit,
                   static_argnames=("offsets", "w", "do_jac", "interpret"))
def _fused_one(const, fx, fy, fz, x, b, d, offsets, w, do_jac, interpret):
    X, Y, Z = x.shape
    nd = len(offsets)
    Xp = -(-X // _BX) * _BX
    padX = ((0, Xp - X), (0, 0), (0, 0))
    xq = jnp.pad(x, padX) if Xp != X else x
    bq = jnp.pad(b, padX) if Xp != X else b
    nb = Xp // _BX
    kern = functools.partial(_fused_kernel, offsets, w, nb, do_jac)
    blk = lambda: pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                               memory_space=pltpu.VMEM)
    plane = lambda f: pl.BlockSpec((1, Y, Z),
                                   lambda i: (jnp.int32(f(i)), 0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((nd, 2 * w, _BX, Z), lambda i: (0, 0, jnp.int32(i), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nd, 2 * w, _BX, Y), lambda i: (0, 0, jnp.int32(i), 0),
                     memory_space=pltpu.VMEM),
        plane(lambda i: jnp.maximum(i * _BX - 1, 0)),
        blk(),
        plane(lambda i: jnp.minimum(i * _BX + _BX, Xp - 1)),
        blk(),
    ]
    ops = [const,
           jnp.pad(fy, ((0, 0), (0, 0), (0, Xp - X), (0, 0))),
           jnp.pad(fz, ((0, 0), (0, 0), (0, Xp - X), (0, 0))),
           xq, xq, xq, bq]
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
            scratch_shapes=[pltpu.VMEM((_BX, Y, Z), x.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(*ops)[:X]

    # x-band fix: exact values on the first/last w planes, written
    # in-place by the aliased row kernel (const3d._apply_xband)
    out = _apply_xband(out, x, b, d if d is not None else jnp.zeros_like(x),
                       fx_narrow(fx, w), offsets, w,
                       "jacobi" if do_jac else "residual", interpret)
    return out


def _jacres_kernel(offsets, w, nb, c_ref, fy_ref, fz_ref, fym_ref, fyp_ref,
                   fzm_ref, fzp_ref, xm2_ref, xm1_ref, x0_ref, xp1_ref,
                   xp2_ref, bm_ref, b_ref, bp_ref, dm_ref, d_ref, dp_ref,
                   x1_ref, r1_ref, ax_ref, x1s_ref):
    """Double apply: smooth the x-extended block, then the residual of the
    smoothed iterate — all taps in VMEM.

    Stage A writes band-corrected A x for planes [iB-1, iB+B] into the
    (B+2)-plane scratch `ax_ref` (interior via the usual roll/halo scheme,
    the two halo planes via their own single-plane tap loops with their own
    face slabs), forms x' = x + d (b - Ax) in `x1s_ref`, and emits the
    block interior.  Stage B re-applies A to x' (halo planes now sitting in
    scratch) and emits r' = b - A x'.  Out-of-domain halos are masked to
    zero; planes whose TRUE row taps differ from the const+band model (the
    first/last 2w planes of the domain) are fixed outside by
    const3d._apply_xband on exact row coefficients."""
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

    planes = {
        -1: jnp.concatenate([xm1, cur[:-1]], axis=0),
        0: cur,
        1: jnp.concatenate([cur[1:], xp1], axis=0),
    }
    lo = {-1: xm2, 0: xm1, 1: cur[:1]}                  # taps for plane iB-1
    hi = {-1: cur[B - 1:], 0: xp1, 1: xp2}              # taps for plane iB+B

    def _accum(planes_of, ytap, ztap, n):
        # ytap(k) -> (ylo_c, yhi_c) each (n, w, Z); ztap(k) -> (zlo_c,
        # zhi_c) each (n, Y, w).  Pre-shaped by the caller so halo slabs
        # (stored x-leading for Mosaic block tiling) need no in-kernel
        # transposes.
        acc = jnp.zeros((n, Y, Z), cur.dtype)
        zlo = jnp.zeros((n, Y, w), cur.dtype)
        zhi = jnp.zeros((n, Y, w), cur.dtype)
        ylo = jnp.zeros((n, w, Z), cur.dtype)
        yhi = jnp.zeros((n, w, Z), cur.dtype)
        for k, (dx, dy, dz) in enumerate(offsets):
            p = _roll_yz(planes_of(dx, k), dy, dz, Y, Z)
            acc = acc + c_ref[k] * p
            zlo_c, zhi_c = ztap(k)
            ylo_c, yhi_c = ytap(k)
            zlo = zlo + p[:, :, :w] * zlo_c
            zhi = zhi + p[:, :, Z - w:] * zhi_c
            ylo = ylo + p[:, :w, :] * ylo_c
            yhi = yhi + p[:, Y - w:, :] * yhi_c
        return acc, zlo, zhi, ylo, yhi

    def _tap_main_y(ref):
        # main fy block: ref[k] is (2w, B, Z) -> pair of (B, w, Z)
        return lambda k: (jnp.moveaxis(ref[k][:w], 0, 1),
                          jnp.moveaxis(ref[k][w:], 0, 1))

    def _tap_main_z(ref):
        # main fz block: ref[k] is (2w, B, Y) -> pair of (B, Y, w)
        return lambda k: (jnp.moveaxis(ref[k][:w], 0, 2),
                          jnp.moveaxis(ref[k][w:], 0, 2))

    def _tap_halo_y(ref):
        # x-leading slab (1, nd, 2w, Z): ref[0, k] is (2w, Z) -> (1, w, Z)
        return lambda k: (ref[0, k][:w][None], ref[0, k][w:][None])

    def _tap_halo_z(ref):
        # x-leading slab (1, nd, Y, 2w): ref[0, k] is (Y, 2w) -> (1, Y, w)
        return lambda k: (ref[0, k][:, :w][None], ref[0, k][:, w:][None])

    def _store(ref, a, b2, parts):
        # static slice bounds only — Mosaic lowers static partial stores
        acc, zlo, zhi, ylo, yhi = parts
        ref[a:b2] = acc
        ref[a:b2, :, :w] = zlo
        ref[a:b2, :, Z - w:] = zhi
        ref[a:b2, :w, :] = ylo
        ref[a:b2, Y - w:, :] = yhi

    # stage A: band-corrected A x on planes [iB-1, iB+B]
    _store(ax_ref, 1, B + 1,
           _accum(lambda dx, k: planes[dx],
                  _tap_main_y(fy_ref), _tap_main_z(fz_ref), B))
    _store(ax_ref, 0, 1,
           _accum(lambda dx, k: lo[dx],
                  _tap_halo_y(fym_ref), _tap_halo_z(fzm_ref), 1))
    _store(ax_ref, B + 1, B + 2,
           _accum(lambda dx, k: hi[dx],
                  _tap_halo_y(fyp_ref), _tap_halo_z(fzp_ref), 1))
    xe = jnp.concatenate([xm1, cur, xp1], axis=0)       # (B+2, Y, Z)
    be = jnp.concatenate([bm, b_ref[:], bp], axis=0)
    de = jnp.concatenate([dm, d_ref[:], dp], axis=0)
    x1s_ref[:] = xe + de * (be - ax_ref[:])
    x1_ref[:] = x1s_ref[1:B + 1]

    # stage B: r' = b - A x' on the block interior (x' halos from scratch)
    x1e = x1s_ref[:]
    _store(ax_ref, 1, B + 1,
           _accum(lambda dx, k: x1e[1 + dx:1 + dx + B],
                  _tap_main_y(fy_ref), _tap_main_z(fz_ref), B))
    r1_ref[:] = b_ref[:] - ax_ref[1:B + 1]


@functools.partial(jax.jit, static_argnames=("offsets", "w", "interpret"))
def _jacres_one(const, fx, fy, fz, x, b, d, offsets, w, interpret):
    X, Y, Z = x.shape
    nd = len(offsets)
    Xp = -(-X // _BX) * _BX
    padX = ((0, Xp - X), (0, 0), (0, 0))
    xq = jnp.pad(x, padX) if Xp != X else x
    bq = jnp.pad(b, padX) if Xp != X else b
    dq = jnp.pad(d, padX) if Xp != X else d
    nb = Xp // _BX
    kern = functools.partial(_jacres_kernel, offsets, w, nb)
    blk = lambda: pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(i), 0, 0),
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
    im1 = lambda i: jnp.maximum(i * _BX - 1, 0)
    im2 = lambda i: jnp.maximum(i * _BX - 2, 0)
    ip1 = lambda i: jnp.minimum(i * _BX + _BX, Xp - 1)
    ip2 = lambda i: jnp.minimum(i * _BX + _BX + 1, Xp - 1)
    fyq = jnp.pad(fy, ((0, 0), (0, 0), (0, Xp - X), (0, 0)))
    fzq = jnp.pad(fz, ((0, 0), (0, 0), (0, Xp - X), (0, 0)))
    fyq_t = jnp.transpose(fyq, (2, 0, 1, 3))    # (Xp, nd, 2w, Z)
    fzq_t = jnp.transpose(fzq, (2, 0, 3, 1))    # (Xp, nd, Y, 2w)
    with jax.enable_x64(False):       # see const3d: Mosaic x64 limitation
        x1k, r1k = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
                       jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype)],
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Z),
                             lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Y),
                             lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                fslab(Z, im1), fslab(Z, ip1),           # fy halo planes
                fslab_z(Y, im1), fslab_z(Y, ip1),       # fz halo planes
                plane(im2), plane(im1), blk(), plane(ip1), plane(ip2),
                plane(im1), blk(), plane(ip1),          # b
                plane(im1), blk(), plane(ip1),          # d
            ],
            out_specs=[blk(), blk()],
            scratch_shapes=[pltpu.VMEM((_BX + 2, Y, Z), x.dtype),
                            pltpu.VMEM((_BX + 2, Y, Z), x.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(const, fyq, fzq, fyq_t, fyq_t, fzq_t, fzq_t,
          xq, xq, xq, xq, xq, bq, bq, bq, dq, dq, dq)
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
    fn = lambda xx, bb: _fused_one(A.const, *A.faces, xx, bb, None,
                                   tuple(map(tuple, A.offsets)), w,
                                   False, interpret)
    return _batched(fn, x, b)


def jacobi3d(A, d, b, x, interpret: bool = False):
    """x' = x + d .* (b - A x) (exact), one fused pass."""
    w = A.boxes[0][1][0]

    def fn(xx, bb):
        return _fused_one(A.const, *A.faces, xx, bb, d,
                          tuple(map(tuple, A.offsets)), w, True, interpret)
    return _batched(fn, x, b)


def jacobi_residual3d(A, d, b, x, interpret: bool = False):
    """(x', r') = (x + d .* (b - A x), b - A x') — pre-smooth plus the
    restrict-feed residual of the V-cycle in ONE pass over the fields."""
    w = A.boxes[0][1][0]

    def fn(xx, bb):
        return _jacres_one(A.const, *A.faces, xx, bb, d,
                           tuple(map(tuple, A.offsets)), w, interpret)
    return _batched(fn, x, b)
