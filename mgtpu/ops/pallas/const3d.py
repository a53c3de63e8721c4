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

# X-axis block rows per grid step.  Env knob read ONCE at import so
# setup-built face padding and kernel BlockSpecs always agree within a
# process; without the knob the choice is PER-SHAPE (bx_for).
import os as _os
_BX_ENV = _os.environ.get("MGTPU_PALLAS3D_BX", "")


def bx_for(X: int, Y: int | None = None, Z: int | None = None) -> int:
    """X-axis block rows per grid step for an (X, Y, Z) field.

    Divisibility beats block size on this hardware: when BX divides X the
    per-call field pad and output slice copies disappear, measured r4 at
    129^3 as cycle 1.85 ms (BX=8, 129 = 16x8+1: pad+slice every call) ->
    1.545 ms (BX=3, 43 exact steps) — ROADMAP 2c.  So pick the LARGEST
    divisor of X in 8..3 (fewer grid steps amortise per-step overhead),
    falling back to a padded BX=8 when X is prime-ish (no divisor >= 3).

    Blocks much larger than 8 rows are a measured dead end at fine-grid
    sizes: BX=43 at 129^3 needs 137 MB of VMEM in the double-apply kernel
    (38 MB register spills + 11.4 MB double-buffered windows x7, r4) —
    but when the WHOLE tile-padded field is small (deep-coarse levels),
    a single grid step (bx = X) drops the per-step overhead.  The
    single-step ceiling is 1 MB, a COMPILE bound rather than a VMEM one:
    65^3 single-step (2.4 MB) blows Mosaic's compile time past 20 MINUTES
    on this toolchain (three r4 probe legs all timed out in compile),
    while the ~1 MB smoke shapes compile in normal time.  Callers that
    know Y/Z pass them; X-only callers (row maps) get the same answer
    via the caller's bx.  MGTPU_PALLAS3D_BX (import-time) forces one
    value for A/B runs."""
    if _BX_ENV:
        return int(_BX_ENV)
    if Y is not None and Z is not None:
        ypad = -(-Y // 8) * 8
        zpad = -(-Z // 128) * 128
        if X * ypad * zpad * 4 <= 2 ** 20:
            return X
        # mid-size divisors (9..16) when the block stays under 1 MB
        # (same compile bound): fewer grid steps on small/coarse levels
        # — 65 -> 13 (5 steps), 33 -> 11 (3) — while fine grids reject
        # them on block bytes (129^2 minor dims: 2.2 MB at d=16)
        for d in range(16, 8, -1):
            if X % d == 0 and d * ypad * zpad * 4 <= 2 ** 20:
                return d
    for d in (8, 7, 6, 5, 4, 3):
        if X % d == 0:
            return d
    return 8


def supports_const3d(offsets, grid, dtype) -> bool:
    """Kernels cover 3D radius-1 stencils, real f32, LARGE grids.

    Below ~2M nodes the XLA shifted-add path fuses with the surrounding
    smoother arithmetic and the kernel's fixed call cost plus the lost
    fusion outweigh its single-pass win (slope-timed r2: the full V-cycle
    REGRESSED 2.1 -> 3.3 ms with the kernel on every level; fine-level-only
    keeps the 4x matvec win where the bytes are).  That measurement
    predates the face-array hoist (r3) — MGTPU_PALLAS3D_MIN overrides the
    node floor (setup-time knob) for re-measuring the crossover."""
    import os
    if len(grid) != 3:
        return False
    if any(abs(d) > 1 for off in offsets for d in off):
        return False
    if any(n < 16 for n in grid):
        return False
    min_nodes = int(float(os.environ.get("MGTPU_PALLAS3D_MIN", 2 * 10 ** 6)))
    if int(np.prod(grid)) < min_nodes:
        return False
    return np.dtype(dtype) == np.float32


def build_faces(coeff: np.ndarray, w: int):
    """Face coefficient arrays from the dense (nd, X, Y, Z) host
    coefficients.  Two forms:

    COMPACT (3-tuple, the common case): (fx (nd, 4w, Y, Z),
    fyc (nd, 1, 2w, Z), fzc (nd, 1, 2w, Y)).  For a constant-interior
    operator the y/z band coefficients can vary with x only inside the x
    band — and the x-band rows are always overwritten by the exact-row fix
    (fx taps).  When that invariance holds on the consumed rows
    (w..X-w-1; checked exactly), ONE representative row suffices: the
    kernels fetch it once as a constant-index VMEM-resident block instead
    of streaming an (nd, 2w, Xp, .) array per call — at 129^3 w=2 this
    removes ~16 MB of HBM reads from every fused kernel call (the single
    biggest byte stream after the fields themselves) and makes the
    double-apply halo slabs (fyq_t/fzq_t transposes) unnecessary.

    GENERAL (5-tuple fallback, x-varying bands): (fx, fyq (nd, Xp, 2w, Z),
    fzq (nd, Xp, 2w, Y), fyq_t (Xp, nd, 2w, Z), fzq_t (Xp, nd, Y, 2w));
    fyq/fzq pre-padded to the bx_for(X)-multiple X extent and fyq_t/fzq_t
    pre-transposed to the x-leading layout the double-apply halo slabs
    need (hoisted to setup r3; ROADMAP item 2a).  The X axis sits SECOND
    (not third): a streamed (nd, bx, 2w, .) block then has its last two
    dims equal to the array dims, which Mosaic accepts for ANY bx — the
    old (nd, 2w, Xp, .) layout needed bx % 8 == 0 (blocked sublane dim)
    and broke at the auto-BX divisors (r4 smoke-gate catch).

    fx carries 2w planes per side (not w): the fused double-apply kernel
    (fused3d.jacobi_residual3d) needs exact row taps on 2w planes — its
    second apply reads the x-band-corrected smoother output one plane in.
    Single-apply kernels slice the inner w planes via `fx_narrow`."""
    X = coeff.shape[1]
    bx = bx_for(X, coeff.shape[2], coeff.shape[3])
    Xp = -(-X // bx) * bx
    fx = np.concatenate([coeff[:, :2 * w], coeff[:, -2 * w:]], axis=1)
    # x-SECOND layouts (see GENERAL above): fy (nd, X, 2w, Z),
    # fz (nd, X, 2w, Y)
    fy = np.concatenate([coeff[:, :, :w], coeff[:, :, -w:]], axis=2)
    fz = np.moveaxis(np.concatenate([coeff[:, :, :, :w],
                                     coeff[:, :, :, -w:]], axis=3), 3, 2)
    compact_ok = _os.environ.get("MGTPU_PALLAS3D_COMPACT", "1") != "0"
    if X > 2 * w and compact_ok:
        yc = fy[:, w:X - w]
        zc = fz[:, w:X - w]
        if ((yc == yc[:, :1]).all() and (zc == zc[:, :1]).all()):
            return (fx, np.ascontiguousarray(yc[:, :1]),
                    np.ascontiguousarray(zc[:, :1]))
    padX = ((0, 0), (0, Xp - X), (0, 0), (0, 0))
    fyq = np.pad(fy, padX)
    fzq = np.pad(fz, padX)
    fyq_t = np.ascontiguousarray(np.transpose(fyq, (1, 0, 2, 3)))
    fzq_t = np.ascontiguousarray(np.transpose(fzq, (1, 0, 3, 2)))
    return fx, fyq, fzq, fyq_t, fzq_t


def fx_narrow(fx, w: int):
    """First/last w rows of the (possibly 2w-per-side) fx tap grid."""
    if fx.shape[1] == 2 * w:
        return fx
    return jnp.concatenate([fx[:, :w], fx[:, -w:]], axis=1)


def _grouped() -> bool:
    """MGTPU_PALLAS3D_GROUPED=0 restores the per-tap roll schedule (an
    emergency-off knob; read at trace time — new processes only)."""
    import os
    return os.environ.get("MGTPU_PALLAS3D_GROUPED", "1") != "0"


def _mxu() -> bool:
    """MGTPU_PALLAS3D_MXU=1: fold each (dx, dy) tap group's dz taps into a
    tridiagonal (Z, Z) matmul on the MXU — eliminates the lane rolls AND
    the per-tap interior multiplies for multi-dz groups.  Matmul precision
    HIGHEST (f32-accurate; ~1 ulp vs the FMA chain — the band/row fixes
    still carry TRUE coefficients, and the cycle's df32 certification does
    not run through these kernels).  Read at trace time."""
    import os
    return os.environ.get("MGTPU_PALLAS3D_MXU", "0") == "1"


def _probe_noband() -> bool:
    """MGTPU_PALLAS3D_PROBE_NOBAND=1: SKIP the y/z boundary-band
    accumulation inside tap_accum.  TIMING PROBE ONLY — output values on
    the bands are wrong; exists to isolate the band share of the kernel
    cost on hardware (tools/ab_mxu.py)."""
    import os
    return os.environ.get("MGTPU_PALLAS3D_PROBE_NOBAND", "") == "1"


def use_bandv2(band_meta, compact: bool) -> bool:
    """True when the additive z-band schedule (tap_accum v2) applies:
    compact (x-invariant) faces, y-interior-invariant z-band coefficients
    (band_meta[2]), the grouped schedule, and no opt-out.  Callers that
    get True must pass the `zint` SMEM operand (fzq[:, 0, :, w])."""
    import os
    return (band_meta is not None and band_meta[2] and compact
            and _grouped()
            and os.environ.get("MGTPU_PALLAS3D_BANDV2", "1") != "0")


def band_meta_of(const, faces, w: int):
    """Static band flags for tap_accum v2, from HOST (numpy) face arrays:
    (zlo_skip, zhi_skip, z_inv) — per-tap "z-band coefficients equal the
    interior constant" (the delta op can be skipped) and "z-band
    coefficients are y-interior-invariant" (multi-dz-group boundary
    columns can fold into the tridiagonal matmul).  Compact (3-tuple)
    faces only; None disables v2."""
    if len(faces) != 3:
        return None
    fzc = np.asarray(faces[2])               # (nd, 1, 2w, Y)
    Y = fzc.shape[3]
    if Y <= 2 * w:
        return None
    nd = fzc.shape[0]
    zlo = tuple(bool((fzc[k, :, :w] == const[k]).all()) for k in range(nd))
    zhi = tuple(bool((fzc[k, :, w:] == const[k]).all()) for k in range(nd))
    inner = fzc[:, :, :, w:Y - w]
    z_inv = bool((inner == inner[:, :, :, :1]).all())
    return (zlo, zhi, z_inv)


def mxu_group_keys(offsets):
    """Deterministic (dx, dy) keys of the multi-dz tap groups — the groups
    tap_accum v2 applies via tridiagonal matmuls.  Order is first-tap
    order; shared by build_tz (operand layout) and the kernels (lookup)."""
    groups, order = {}, []
    for k, (dx, dy, dz) in enumerate(offsets):
        if (dx, dy) not in groups:
            groups[(dx, dy)] = []
            order.append((dx, dy))
        groups[(dx, dy)].append((k, dz))
    return tuple(key for key in order if any(dz for _, dz in groups[key]))


def build_tz(const, zint, offsets, w: int, Z: int, dtype):
    """(G, Z, Z) tridiagonal matrices for the multi-dz groups, built ONCE
    per apply in XLA and passed as a constant-index VMEM operand — at
    BX=3 the in-kernel mask construction ran 43 times per call (one per
    grid step) and showed up in the slope timings.

    Interior columns carry the constant coefficients on their dz
    diagonals; the first/last w columns carry the TRUE
    (y-interior-invariant) z-band coefficients from `zint` (nd, 2w)."""
    groups = {}
    for k, (dx, dy, dz) in enumerate(offsets):
        groups.setdefault((dx, dy), []).append((k, dz))
    keys = mxu_group_keys(offsets)
    rr = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 1)
    interior_col = (cc >= w) & (cc < Z - w)
    mats = []
    for key in keys:
        tz = jnp.zeros((Z, Z), dtype)
        for k, dz in groups[key]:
            tz = tz + jnp.where((rr - cc == dz) & interior_col,
                                const[k], jnp.zeros((), dtype))
            for c in range(w):
                r_lo, r_hi = c + dz, Z - w + c + dz
                if 0 <= r_lo < Z:       # out-of-range: true coeff 0
                    tz = tz + jnp.where((cc == c) & (rr == r_lo),
                                        zint[k, c], jnp.zeros((), dtype))
                if 0 <= r_hi < Z:
                    tz = tz + jnp.where((cc == Z - w + c) & (rr == r_hi),
                                        zint[k, w + c],
                                        jnp.zeros((), dtype))
        mats.append(tz)
    return jnp.stack(mats)


def store_banded(ref, a, b, res, w, Y, Z):
    """Write one tap_accum result into ref[a:b] (static slice bounds only —
    Mosaic lowers static partial stores).  Band semantics by mode:
    "overwrite" replaces the z-band columns with exact per-column values;
    "delta" adds the accumulated coefficient-difference corrections to the
    interior-schedule values (exact: see tap_accum).  The y-band rows are
    always overwritten LAST (full exact rows, corners included), covering
    the z/y overlap."""
    acc, zmode, z1, z2, ylo, yhi = res
    ref[a:b] = acc
    if zmode == "overwrite":
        for c in range(w):
            ref[a:b, :, c:c + 1] = z1[c]
            ref[a:b, :, Z - w + c:Z - w + c + 1] = z2[c]
    elif zmode == "delta":
        ref[a:b, :, :w] = acc[:, :, :w] + z1
        ref[a:b, :, Z - w:] = acc[:, :, Z - w:] + z2
    ref[a:b, :w, :] = ylo
    ref[a:b, Y - w:, :] = yhi


def tap_accum(planes_of, c_ref, ytap, ztap, offsets, w, n, Y, Z, dtype,
              band_meta=None, zint_ref=None, tz_ref=None):
    """Band-corrected stencil tap accumulation over one x-plane group.

    planes_of(dx) -> (n, Y, Z) tap source for x offset dx; c_ref[k] the
    constant interior coefficients; ytap(k)/ztap(k) -> the ((n, w, Z) lo,
    hi) / ((n, Y, w) lo, hi) TRUE boundary-band coefficients for tap k.
    Returns (acc, zmode, z1, z2, ylo, yhi) — apply with `store_banded`.

    These kernels are VPU-bound, not HBM-bound (129^3 matvec ~0.3 ms
    measured vs ~0.04 ms memory floor).  Two schedules:

    v1 (zint_ref None): grouped rolls — sublane (y) rolls cached per
    (dx, dy), lane (z) rolls on the dz-group sums (or, MGTPU_PALLAS3D_MXU,
    a tridiagonal matmul per multi-dz group), z-band values rebuilt per
    COLUMN as (n, Y, 1) sliver ops.  The r4 NOBAND probe measured the
    band share at ~0.1 ms per accumulation — HALF the fused-kernel cost:
    a (n, Y, 1) op pads 1 -> 128 lanes, so each sliver costs half a
    full-block VPU op.

    v2 (zint_ref set; gate `use_bandv2`): interior via per-group
    tridiagonal MXU matmuls whose BOUNDARY COLUMNS carry the true
    (y-interior-invariant) z-band coefficients — multi-dz groups get their
    z-bands for free — while single-dz (dz==0) groups add one contiguous
    (n, Y, w) delta op per side ONLY for taps whose band coefficients
    differ from the interior constant (static skip flags, band_meta).
    Wrong values remain only on y-band rows (sublane-roll wrap) and
    x-band rows — both overwritten afterwards, exactly as in v1.
    """
    if not _grouped():
        acc, zlo, zhi, ylo, yhi = _tap_accum_pertap(
            planes_of, c_ref, ytap, ztap, offsets, w, n, Y, Z, dtype)
        return acc, "overwrite", zlo, zhi, ylo, yhi
    qc = {}

    def q(dx, dy):
        if (dx, dy) not in qc:
            p = planes_of(dx)
            qc[(dx, dy)] = (pltpu.roll(p, np.int32(-dy % Y), axis=1)
                            if dy else p)
        return qc[(dx, dy)]

    groups = {}
    for k, (dx, dy, dz) in enumerate(offsets):
        groups.setdefault((dx, dy), []).append((k, dz))
    bands_on = not _probe_noband()
    v2 = zint_ref is not None and tz_ref is not None and bands_on

    # y-band rows: always exact overwrite values (cheap — (n, w, Z) ops
    # pad w -> 8 SUBLANES, a 4x waste, vs the z slivers' 64x lane waste)
    ylo = jnp.zeros((n, w, Z), dtype)
    yhi = jnp.zeros((n, w, Z), dtype)
    if bands_on:
        for k, (dx, dy, dz) in enumerate(offsets):
            qk = q(dx, dy)
            ylo_c, yhi_c = ytap(k)
            rlo, rhi = qk[:, :w, :], qk[:, Y - w:, :]
            if dz:
                rlo = pltpu.roll(rlo, np.int32(-dz % Z), axis=2)
                rhi = pltpu.roll(rhi, np.int32(-dz % Z), axis=2)
            ylo = ylo + rlo * ylo_c
            yhi = yhi + rhi * yhi_c

    acc = jnp.zeros((n, Y, Z), dtype)
    if v2:
        zlo_skip, zhi_skip, _ = band_meta
        zdlo = jnp.zeros((n, Y, w), dtype)
        zdhi = jnp.zeros((n, Y, w), dtype)
        mxu_keys = mxu_group_keys(offsets)
        for (dx, dy), taps in groups.items():
            qk = q(dx, dy)
            if any(dz for _, dz in taps):
                # tridiagonal matmul; tz built ONCE per apply outside the
                # kernel (build_tz — boundary columns carry the TRUE
                # y-invariant band coefficients) and fetched as a
                # constant-index VMEM block, not rebuilt per grid step
                g = mxu_keys.index((dx, dy))
                acc = acc + jax.lax.dot(
                    qk.reshape(n * Y, Z), tz_ref[g],
                    precision=jax.lax.Precision.HIGHEST).reshape(n, Y, Z)
            else:
                for k, _dz in taps:       # all dz == 0: no shift, no wrap
                    acc = acc + c_ref[k] * qk
                    if not zlo_skip[k]:
                        zlo_c, _ = ztap(k)
                        zdlo = zdlo + qk[:, :, :w] * (zlo_c - c_ref[k])
                    if not zhi_skip[k]:
                        _, zhi_c = ztap(k)
                        zdhi = zdhi + qk[:, :, Z - w:] * (zhi_c - c_ref[k])
        return acc, "delta", zdlo, zdhi, ylo, yhi

    # v1: grouped rolls (or MXU interior), z-band columns rebuilt per tap
    zlo = [jnp.zeros((n, Y, 1), dtype) for _ in range(w)]
    zhi = [jnp.zeros((n, Y, 1), dtype) for _ in range(w)]
    if bands_on:
        for k, (dx, dy, dz) in enumerate(offsets):
            qk = q(dx, dy)
            zlo_c, zhi_c = ztap(k)
            # roll_z(q)[:, :, j] == q[:, :, (j + dz) % Z]: band columns are
            # static keep-dim slices of the UNROLLED array; the % wrap lands
            # only where the tap reads outside the domain (true coeff 0)
            for c in range(w):
                jlo, jhi = (c + dz) % Z, (Z - w + c + dz) % Z
                zlo[c] = zlo[c] + qk[:, :, jlo:jlo + 1] * zlo_c[:, :, c:c + 1]
                zhi[c] = zhi[c] + qk[:, :, jhi:jhi + 1] * zhi_c[:, :, c:c + 1]
    use_mxu = _mxu()
    inner = {}
    for (dx, dy), taps in groups.items():
        qk = q(dx, dy)
        if use_mxu and any(dz for _, dz in taps):
            rr = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (Z, Z), 1)
            tz = jnp.zeros((Z, Z), dtype)
            for k, dz in taps:
                tz = tz + jnp.where(rr - cc == dz, c_ref[k],
                                    jnp.zeros((), dtype))
            acc = acc + jax.lax.dot(
                qk.reshape(n * Y, Z), tz,
                precision=jax.lax.Precision.HIGHEST).reshape(n, Y, Z)
        else:
            for k, dz in taps:
                term = c_ref[k] * qk
                inner[dz] = term if dz not in inner else inner[dz] + term
    for dz in sorted(inner):
        v = inner[dz]
        acc = acc + (pltpu.roll(v, np.int32(-dz % Z), axis=2) if dz else v)
    return acc, "overwrite", tuple(zlo), tuple(zhi), ylo, yhi


def inkernel_xband() -> bool:
    """MGTPU_PALLAS3D_XBAND=fold computes the exact x-band rows INSIDE the
    single-apply kernels (one pallas_call per apply instead of main +
    aliased row kernel, and no XLA-side window stack).  Default off until
    A/B'd on the chip (read at trace time)."""
    import os
    return os.environ.get("MGTPU_PALLAS3D_XBAND", "") == "fold"


def _xband_rows(X: int, w: int, bx: int):
    """Static (block, in-block row, fx_narrow slot) triples for the 2w
    x-band rows 0..w-1 and X-w..X-1 (the hi rows may straddle a block
    boundary when X % bx < w)."""
    rows = list(range(w)) + list(range(X - w, X))
    return tuple((r // bx, r % bx, s) for s, r in enumerate(rows))


def xband_row(plane_of, fxn_ref, slot, offsets, Y, Z, dtype):
    """Exact A x on ONE x-band row: plane_of(dx) -> (1, Y, Z) tap source,
    fxn_ref[t, slot] the TRUE (Y, Z) coefficients of this row (fx_narrow
    layout).  Per-tap rolls on single-plane slivers — 2 of nb grid steps
    pay this, so the grouped schedule is not worth its bookkeeping here."""
    ax = jnp.zeros((1, Y, Z), dtype)
    for t, (dx, dy, dz) in enumerate(offsets):
        p = plane_of(dx)
        if dy:
            p = pltpu.roll(p, np.int32(-dy % Y), axis=1)
        if dz:
            p = pltpu.roll(p, np.int32(-dz % Z), axis=2)
        ax = ax + fxn_ref[t, slot][None] * p
    return ax


def _tap_accum_pertap(planes_of, c_ref, ytap, ztap, offsets, w, n, Y, Z,
                      dtype):
    """Reference per-tap schedule: one (or two) full-block rolls per tap.
    Returns z bands split into per-column tuples (tap_accum contract)."""
    acc = jnp.zeros((n, Y, Z), dtype)
    zlo = jnp.zeros((n, Y, w), dtype)
    zhi = jnp.zeros((n, Y, w), dtype)
    ylo = jnp.zeros((n, w, Z), dtype)
    yhi = jnp.zeros((n, w, Z), dtype)
    for k, (dx, dy, dz) in enumerate(offsets):
        p = planes_of(dx)
        if dy:
            p = pltpu.roll(p, np.int32(-dy % Y), axis=1)
        if dz:
            p = pltpu.roll(p, np.int32(-dz % Z), axis=2)
        acc = acc + c_ref[k] * p
        zlo_c, zhi_c = ztap(k)
        ylo_c, yhi_c = ytap(k)
        zlo = zlo + p[:, :, :w] * zlo_c
        zhi = zhi + p[:, :, Z - w:] * zhi_c
        ylo = ylo + p[:, :w, :] * ylo_c
        yhi = yhi + p[:, Y - w:, :] * yhi_c
    return (acc, tuple(zlo[:, :, c:c + 1] for c in range(w)),
            tuple(zhi[:, :, c:c + 1] for c in range(w)), ylo, yhi)


def main_ytap(fy_ref, w):
    """Main-block fy taps: fy_ref[k] (B, 2w, Z) -> ((B, w, Z) lo, hi).
    Compact faces (B == 1) broadcast against the (n, w, Z) accumulators."""
    return lambda k: (fy_ref[k, :, :w], fy_ref[k, :, w:])


def main_ztap(fz_ref, w):
    """Main-block fz taps: fz_ref[k] (B, 2w, Y) -> ((B, Y, w) lo, hi).
    Compact faces (B == 1) broadcast against the (n, Y, w) accumulators."""
    return lambda k: (jnp.moveaxis(fz_ref[k, :, :w], 1, 2),
                      jnp.moveaxis(fz_ref[k, :, w:], 1, 2))


def face_specs(fyq, fzq, w, Y, Z, bx):
    """BlockSpecs for the y/z face coefficient arrays.  COMPACT faces
    (x-extent 1; build_faces) are constant-index blocks — fetched once,
    VMEM-resident across all grid steps (~14 KB instead of re-streaming an
    (nd, Xp, 2w, .) array per kernel call).  GENERAL faces stream one
    bx-row slab per grid step; the sliced X axis sits SECOND so the
    block's last two dims equal the array dims — Mosaic accepts that for
    any bx (the blocked-sublane form needed bx % 8 == 0)."""
    nd = fyq.shape[0]
    if fyq.shape[1] == 1:
        return [pl.BlockSpec((nd, 1, 2 * w, Z), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, 1, 2 * w, Y), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    return [pl.BlockSpec((nd, bx, 2 * w, Z),
                         lambda i: (0, jnp.int32(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, bx, 2 * w, Y),
                         lambda i: (0, jnp.int32(i), 0, 0),
                         memory_space=pltpu.VMEM)]


def _interior_kernel(offsets, w, nb, xb, bm, c_ref, fy_ref, fz_ref, *rest):
    """Const-coefficient apply + in-kernel y/z band recomputation.

    The band values land via PARTIAL ref stores — Mosaic's concatenate
    rejects the band/interior stitch at sub-128-lane layouts.
    xb = (i_last, off) folds the exact x-band rows in too (inkernel_xband);
    None keeps the separate aliased row kernel (_apply_xband).
    bm = band_meta when the v2 additive z-band schedule is active (the
    caller then also passes the zint SMEM row and the prebuilt tz
    matrices)."""
    if bm is not None:
        zint_ref, tz_ref, *rest = rest
    else:
        zint_ref = tz_ref = None
    if xb is not None:
        fxn_ref, xm_ref, x0_ref, xp_ref, y_ref = rest
    else:
        xm_ref, x0_ref, xp_ref, y_ref = rest
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
    res = tap_accum(
        lambda dx: planes[dx], c_ref, main_ytap(fy_ref, w),
        main_ztap(fz_ref, w), offsets, w, cur.shape[0], Y, Z, cur.dtype,
        band_meta=bm, zint_ref=zint_ref, tz_ref=tz_ref)
    store_banded(y_ref, 0, cur.shape[0], res, w, Y, Z)
    if xb is not None:
        # fx carries TRUE coefficients on the whole band row (corners
        # included), so the full-row overwrite must come LAST
        for blk_i, off_r, slot in xb:
            @pl.when(i == blk_i)
            def _row(off_r=off_r, slot=slot):
                y_ref[off_r:off_r + 1] = xband_row(
                    lambda dx: planes[dx][off_r:off_r + 1], fxn_ref, slot,
                    offsets, Y, Z, cur.dtype)


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


@functools.partial(jax.jit,
                   static_argnames=("offsets", "w", "interpret",
                                    "band_meta"))
def _matvec_one(const, fx, fyq, fzq, x, offsets, w, interpret,
                band_meta=None):
    X, Y, Z = x.shape
    nd = len(offsets)
    bx = bx_for(X, Y, Z)
    Xp = -(-X // bx) * bx
    xq = jnp.pad(x, ((0, Xp - X), (0, 0), (0, 0))) if Xp != X else x
    nb = Xp // bx
    fold = inkernel_xband()
    xb = _xband_rows(X, w, bx) if fold else None
    bm = band_meta if use_bandv2(band_meta, fyq.shape[1] == 1) else None
    kern = functools.partial(_interior_kernel, offsets, w, nb, xb, bm)
    # NOTE: this toolchain's Mosaic cannot lower ANY pallas_call traced under
    # jax_enable_x64 (an internal i64 index function fails to legalize);
    # tracing the call in a local 32-bit scope is semantically inert here
    # (all operand dtypes are explicit) and keeps the kernels usable from
    # x64-certified drivers like solve_mg_refined.
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += face_specs(fyq, fzq, w, Y, Z, bx)
    ops = [const, fyq, fzq]
    if bm is not None:
        # y-invariant z-band coefficient scalars (nd, 2w), SMEM-resident,
        # and the prebuilt (G, Z, Z) tridiagonal matrices (constant-index
        # VMEM block — fetched once, not rebuilt per grid step)
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
    in_specs += [
        pl.BlockSpec((1, Y, Z),
                     lambda i: (jnp.int32(jnp.maximum(i * bx - 1, 0)),
                                0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bx, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Y, Z),
                     lambda i: (jnp.int32(jnp.minimum(i * bx + bx,
                                                      Xp - 1)), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    ops += [xq, xq, xq]
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Xp, Y, Z), x.dtype),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bx, Y, Z), lambda i: (jnp.int32(i), 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(*ops)
    y = y[:X]
    if fold:
        return y
    zf = jnp.zeros_like(x)
    y = _apply_xband(y, x, zf, zf, fx_narrow(fx, w), offsets, w,
                     "matvec", interpret)
    return y


def const3d_matvec_pallas(const, faces, offsets, x, w: int,
                          interpret: bool = False, band_meta=None):
    """Exact y = A x for a 3D constant-interior stencil; x (..., X, Y, Z)."""
    grid = x.shape[-3:]
    lead = x.shape[:-3]
    fx, fyq, fzq = faces[:3]
    xr = x.reshape((-1,) + grid)
    fn = lambda v: _matvec_one(const, fx, fyq, fzq, v,
                               tuple(map(tuple, offsets)), w, interpret,
                               band_meta=band_meta)
    if xr.shape[0] == 1:
        out = fn(xr[0])[None]
    else:
        out = jax.vmap(fn)(xr)
    return out.reshape(lead + grid)
