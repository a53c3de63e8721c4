"""Pallas TPU kernel: fused variable-coefficient stencil apply (the hot SpMV).

The XLA shift-and-accumulate stencil matvec materialises one shifted copy of x
per diagonal; this kernel streams each (BJ, NI) slab of x into VMEM once and
applies ALL diagonals from registers — one read of x, one read of the
coefficients, one write of y, the minimal traffic for a stencil apply.

Grid-form layout matches mgtpu.parallel.stencil: G[j, i] = x[i + j*NI] with
the J axis blocked over the Pallas grid.  J-axis halo rows come from the
neighboring blocks (prev/next block reads with clamped index maps — the
pipeline double-buffers them); in-plane +-1 shifts are circular lane rolls,
safe because the variable coefficients are zero wherever a shift would cross
a grid boundary (no such matrix entry exists).

Measured on TPU v5e at 1025^2 (9-pt, f32) this kernel is at parity with the
XLA path (~130-180 GB/s effective, both fluctuating with the shared chip);
it is kept as an opt-in backend (`use_pallas=True` on the stencil ops) and as
the base for future fusion (relax + residual in one pass).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(di, dj, bj, nblocks, coeff_ref, xprev_ref, xcur_ref,
                    xnext_ref, y_ref):
    j = pl.program_id(0)
    cur = xcur_ref[:]
    top = jnp.where(j > 0, xprev_ref[bj - 1:bj], jnp.zeros_like(xprev_ref[:1]))
    bot = jnp.where(j < nblocks - 1, xnext_ref[:1],
                    jnp.zeros_like(xnext_ref[:1]))
    planes = {
        -1: jnp.concatenate([top, cur[:-1]], axis=0),   # x[j-1, :]
        0: cur,
        1: jnp.concatenate([cur[1:], bot], axis=0),     # x[j+1, :]
    }
    acc = jnp.zeros_like(y_ref)
    for k in range(len(di)):
        p = planes[dj[k]]
        if di[k] != 0:
            p = pltpu.roll(p, -di[k] % p.shape[-1], axis=1)
        acc = acc + coeff_ref[k] * p
    y_ref[:] = acc


def _pick_bj(ni: int, ndiags: int, vmem_budget=5 * 2 ** 20) -> int:
    for bj in (256, 128, 64, 32, 16, 8):
        byts = 4 * ni * (ndiags * bj + 4 * bj)
        if byts <= vmem_budget:
            return bj
    return 8


@functools.partial(jax.jit, static_argnames=("di", "dj", "interpret"))
def stencil_matvec_pallas(coeff, di, dj, x, interpret: bool = False):
    """y = A x for a grid-form stencil operator with |dj| <= 1.

    coeff: (ndiags, NJ, NI); x: (NJ, NI); returns (NJ, NI).  Rows are padded
    internally to the block size (padded coefficients are zero, so padded
    outputs are discarded safely).
    """
    nd, NJ, NI = coeff.shape
    BJ = _pick_bj(NI, nd)
    NJk = -(-NJ // BJ) * BJ
    if NJk != NJ:
        coeff = jnp.pad(coeff, ((0, 0), (0, NJk - NJ), (0, 0)))
        x = jnp.pad(x, ((0, NJk - NJ), (0, 0)))
    nb = NJk // BJ
    kern = functools.partial(_stencil_kernel, di, dj, BJ, nb)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NJk, NI), x.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd, BJ, NI), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, NI), lambda j: (jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, NI), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, NI), lambda j: (jnp.minimum(j + 1, nb - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BJ, NI), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(coeff, x, x, x)
    return out[:NJ]
