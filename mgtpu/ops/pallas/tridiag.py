"""Pallas tridiagonal line solve: Thomas recurrences in the stencil layout.

The line smoother's two first-order recurrences (cycle/relax.py::line_solve)
    forward : y_i = alpha_i * y_{i-1} + pivot_i * r_i
    backward: x_i = -cprime_i * x_{i+1} + y_i
are pure bandwidth in principle, but every XLA expression of them
(associative_scan, or the Hillis-Steele doubling in relax._scan_linear) is
O(n log n) full-field passes whose intermediates relayout against the stencil
consumers (ROADMAP item 3: composed 257^2 line-Jacobi cycle 0.59 ms vs
0.03 ms point Jacobi).  Here each recurrence is ONE pass over the field:

  * the line axis sits second-to-minor, blocked `blk` (multiple of 8) rows
    per grid step; the TPU grid is sequential, so a (1, Y) VMEM scratch row
    carries the recurrence across blocks (the standard Mosaic carry pattern);
  * within a block the scan is log2(blk) roll+fma steps over the full
    (blk, Y) tile (Hillis-Steele on the semigroup (a2,b2)o(a1,b1) =
    (a2*a1, a2*b1 + b2)) — `pltpu.roll` is a native sublane rotate, so
    reads/writes stay in the operand's standard layout end-to-end;
  * beta = pivot * r folds into the forward pass and the damped correction
    x + omega * sol into the backward pass, so one line correction costs
    exactly 8 field passes of HBM traffic.

DEFAULT for f32 lines on TPU backends since r4 (cycle/relax.py::_line_mode
'auto'): the long-chain on-chip A/B measured the composed 257^2 line-Jacobi
cycle at 0.020 ms/cycle with these kernels vs 0.029 doubling-scan and 0.048
associative_scan (point Jacobi 0.018; healthy probe 0.011) — i.e. line
smoothing is within ~10% of pointwise cost.  MGTPU_LINE_SCAN=doubling/assoc
restores the XLA forms; f32 only (Mosaic x64 limitation, see const3d.py).

The reference has no line smoothers at all (point Jacobi/SPAI, Vanka, and
Kaczmarz only — /root/reference/src/Multigrid/MGsetup.jl:142-160); pivots are
precomputed on host by setup/smoothers.py::line_prec.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["line_solve_pallas", "line_correct_pallas"]


def _scan_block(a, y, blk: int, reverse: bool):
    """In-block inclusive scan of y_i = a_i * y_{i±1} + y_i over axis 0.

    Returns (aa, y): aa_k = prod of a over the covered rows (needed to fold
    in the carry from the previous block), y_k = block-local scan value.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    d = 1
    while d < blk:
        if reverse:
            # roll(v, blk - d) == roll(v, -d) on an axis of length blk
            # (pltpu.roll requires non-negative shifts)
            yp = pltpu.roll(y, blk - d, 0)
            ap = pltpu.roll(a, blk - d, 0)
            m = rows < blk - d
        else:
            yp = pltpu.roll(y, d, 0)
            ap = pltpu.roll(a, d, 0)
            m = rows >= d
        y = a * jnp.where(m, yp, jnp.zeros_like(yp)) + y
        a = a * jnp.where(m, ap, jnp.ones_like(ap))
        d *= 2
    return a, y


def _fwd_kernel(blk, a_ref, p_ref, r_ref, y_ref, carry):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    beta = p_ref[0] * r_ref[0]
    aa, y = _scan_block(a_ref[0], beta, blk, reverse=False)
    y = y + aa * carry[...]
    y_ref[0] = y
    carry[...] = y[blk - 1:blk]


def _bwd_kernel(blk, omega, has_x, c_ref, y_ref, *rest):
    if has_x:
        x_ref, o_ref, carry = rest
    else:
        o_ref, carry = rest
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    aa, sol = _scan_block(-c_ref[0], y_ref[0], blk, reverse=True)
    sol = sol + aa * carry[...]
    o_ref[0] = x_ref[0] + omega * sol if has_x else omega * sol
    carry[...] = sol[0:1]


@functools.partial(jax.jit, static_argnames=("omega", "blk", "has_x",
                                             "interpret"))
def _tridiag_call(alpha, pivot, cprime, r, x, omega, blk, has_x, interpret):
    """(B0, Xp, Y) operands, line axis middle, Xp % blk == 0; coefficients
    (Ba, Xp, Y) with Ba dividing B0 (innermost batch dims — see wrapper)."""
    B0, Xp, Y = r.shape
    Ba = alpha.shape[0]
    nb = Xp // blk

    def spec(nbatch, rev):
        def imap(b, i):
            bi = b % nbatch if nbatch != B0 else b
            return (bi, nb - 1 - i if rev else i, 0)
        return pl.BlockSpec((1, blk, Y), imap, memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((B0, Xp, Y), r.dtype)
    scratch = [pltpu.VMEM((1, Y), r.dtype)]
    with jax.enable_x64(False):   # Mosaic cannot lower under x64 (const3d)
        y = pl.pallas_call(
            functools.partial(_fwd_kernel, blk),
            grid=(B0, nb),
            in_specs=[spec(Ba, False), spec(Ba, False), spec(B0, False)],
            out_specs=spec(B0, False),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(alpha, pivot, r)
        in_specs = [spec(Ba, True), spec(B0, True)]
        ops = [cprime, y]
        if has_x:
            in_specs.append(spec(B0, True))
            ops.append(x)
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, blk, omega, has_x),
            grid=(B0, nb),
            in_specs=in_specs,
            out_specs=spec(B0, True),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*ops)
    return out


def _pick_blk(X: int, Y: int) -> int:
    blk = 32
    while blk > 8 and blk > X:            # tiny grids
        blk //= 2
    while blk > 8 and blk * Y * 4 > 256 * 1024:   # VMEM per operand block
        blk //= 2
    return blk


def _to3(v, ax: int):
    """Move line axis `ax` to -2 and fold leading dims: (B, X, Y)."""
    nd = v.ndim
    if ax == nd - 1:
        v = jnp.swapaxes(v, -1, -2)
    elif ax != nd - 2:
        v = jnp.moveaxis(v, ax, -2)
    X, Y = v.shape[-2:]
    return v.reshape((-1, X, Y))


def _from3(o, orig_shape, ax: int):
    nd = len(orig_shape)
    if ax == nd - 1:
        moved = orig_shape[:-2] + (orig_shape[-1], orig_shape[-2])
        return jnp.swapaxes(o.reshape(moved), -1, -2)
    if ax == nd - 2:
        return o.reshape(orig_shape)
    moved = (orig_shape[:ax] + orig_shape[ax + 1:-1]
             + (orig_shape[ax],) + orig_shape[-1:])
    return jnp.moveaxis(o.reshape(moved), -2, ax)


def _apply(lr, r, x, omega, interpret):
    if r.dtype != jnp.float32:
        raise TypeError("pallas line solve is f32-only (Mosaic x64 limit); "
                        f"got {r.dtype}")
    g = lr.alpha.ndim
    ax = r.ndim - (g - lr.axis)           # absolute line axis in r
    axc = lr.axis                         # and in the grid-shaped coeffs
    rf = _to3(r, ax)
    xf = _to3(x, ax) if x is not None else None
    al = _to3(lr.alpha.astype(r.dtype), axc)
    pv = _to3(lr.pivot.astype(r.dtype), axc)
    cp = _to3(lr.cprime.astype(r.dtype), axc)
    B0, X, Y = rf.shape
    blk = _pick_blk(X, Y)
    Xp = -(-X // blk) * blk
    if Xp != X:
        # zero padding past the line ends is inert: padded alpha/beta rows
        # scan to zero (forward), and cprime == 0 at row X-1 (line ends,
        # smoothers.line_prec) cuts the backward carry out of padded rows
        pad = ((0, 0), (0, Xp - X), (0, 0))
        rf, al, pv, cp = (jnp.pad(v, pad) for v in (rf, al, pv, cp))
        if xf is not None:
            xf = jnp.pad(xf, pad)
    out = _tridiag_call(al, pv, cp, rf, xf, float(omega), blk,
                        xf is not None, interpret)
    if Xp != X:
        out = out[:, :X]
    return _from3(out, r.shape, ax)


def line_solve_pallas(lr, r, interpret: bool = False):
    """T^-1 r for grid fields r of shape (..., *grid) — exact vs the XLA
    scan forms (same pivots, same recurrences, different schedule)."""
    return _apply(lr, r, None, 1.0, interpret)


def line_correct_pallas(lr, r, x, interpret: bool = False):
    """x + lr.omega * T^-1 r with the damped add folded into the backward
    pass (saves one full-field read+write per correction)."""
    return _apply(lr, r, x, lr.omega, interpret)
