"""Fused Pallas TPU kernels for the 3D constant-interior cycle ops.

Extends ops/pallas/const3d.py (one-pass exact matvec) with the smoother
fusions the 3D V-cycle spends its bytes on:

    residual3d      r  = b - A x
    jacobi3d        x' = x + d .* (b - A x)

Each is ONE pass over the fields instead of a kernel matvec plus separate
XLA axpy/sub passes (slope-timed: the unfused kernel matvec cut the fine
apply 0.83 -> 0.24 ms but the full cycle only reached 1.6 ms because every
smoother step still round-tripped x/b/r through HBM).

Structure: same grid/halo/band scheme as const3d._interior_kernel — the
A-apply accumulates into a VMEM scratch, y/z boundary bands are overwritten
in-scratch from full-extent face coefficients, then the op's arithmetic
(b - ., x + d .* .) reads the scratch once.  The x band (first/last w
planes) is corrected OUTSIDE by the shared tap-grid kernel + a cheap
fix-up on 2w planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .const3d import _BX, _apply_xband

__all__ = ["residual3d", "jacobi3d"]


def _fused_kernel(offsets, w, nb, do_jac, c_ref, fy_ref, fz_ref,
                  xm_ref, x0_ref, xp_ref, b_ref, d_ref, out_ref, ax_ref):
    i = pl.program_id(0)
    cur = x0_ref[:]                                     # (BX, Y, Z)
    Y, Z = cur.shape[1], cur.shape[2]
    top = jnp.where(i > 0, xm_ref[_BX - 1:_BX], jnp.zeros_like(cur[:1]))
    bot = jnp.where(i < nb - 1, xp_ref[:1], jnp.zeros_like(cur[:1]))
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
        p = planes[dx]
        if dy:
            p = pltpu.roll(p, np.int32(-dy % Y), axis=1)
        if dz:
            p = pltpu.roll(p, np.int32(-dz % Z), axis=2)
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
    dq = jnp.pad(d, padX) if Xp != X else d
    nb = Xp // _BX
    kern = functools.partial(_fused_kernel, offsets, w, nb, do_jac)
    blk = lambda: pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                               memory_space=pltpu.VMEM)
    with jax.enable_x64(False):       # see const3d: Mosaic x64 limitation
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Z), lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, 2 * w, _BX, Y), lambda i: (0, 0, jnp.int32(i), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(jnp.maximum(i - 1, 0)), 0, 0),
                             memory_space=pltpu.VMEM),
                blk(),
                pl.BlockSpec((_BX, Y, Z), lambda i: (jnp.int32(jnp.minimum(i + 1,
                                                                 nb - 1)), 0, 0),
                             memory_space=pltpu.VMEM),
                blk(), blk(),
            ],
            out_specs=blk(),
            scratch_shapes=[pltpu.VMEM((_BX, Y, Z), x.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(const, jnp.pad(fy, ((0, 0), (0, 0), (0, Xp - X), (0, 0))),
          jnp.pad(fz, ((0, 0), (0, 0), (0, Xp - X), (0, 0))),
          xq, xq, xq, bq, dq)[:X]

    # x-band fix: exact values on the first/last w planes, written
    # in-place by the aliased row kernel (const3d._apply_xband)
    out = _apply_xband(out, x, b, d, fx.reshape(nd, 2 * w, Y, Z), offsets, w,
                       "jacobi" if do_jac else "residual", interpret)
    return out


def _batched(fn, *fields):
    grid = fields[0].shape[-3:]
    lead = fields[0].shape[:-3]
    flat = [f.reshape((-1,) + grid) for f in fields]
    if flat[0].shape[0] == 1:
        out = fn(*(f[0] for f in flat))[None]
    else:
        out = jax.vmap(fn)(*flat)
    return out.reshape(lead + grid)


def residual3d(A, b, x, interpret: bool = False):
    """r = b - A x (exact), one fused pass; fields (..., X, Y, Z)."""
    w = A.boxes[0][1][0]
    dt = x.dtype
    fn = lambda xx, bb: _fused_one(A.const, *A.faces, xx, bb,
                                   jnp.zeros(A.grid, dt),
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
