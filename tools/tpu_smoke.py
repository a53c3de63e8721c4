"""TPU lowering gate: compile-and-run every Pallas kernel on the REAL chip.

Interpret-mode tests check numerics, not Mosaic lowering constraints — the
round-2 regression (fused3d `fslab` BlockSpec violating Mosaic tiling; see
BENCH_r02.json) was invisible to the whole CPU test suite and crashed the
bench.  This gate must be run on the real TPU before every end-of-round
snapshot (rule recorded in CLAUDE.md):

    python tools/tpu_smoke.py            # kernels + default 3D cycle config
    python tools/tpu_smoke.py --fast     # kernels only (skip mg_setup)
    python tools/tpu_smoke.py --json P   # also record the result at path P

Exit code 0 = every kernel lowers AND executes on the chip; nonzero = at
least one failed (each failure prints its exception).  Shapes are chosen to
exercise the padding paths (odd extents -> lane/sublane padding) and the
default-on dispatch thresholds (>= 2M nodes for const3d).  --json writes a
round artifact (ADVICE r3: an unrecorded "gate passed" claim is just prose)
— e.g. TPUSMOKE_r04.json at the repo root.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILED = []


def gate(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
                print(f"[tpu-smoke] PASS {name} ({time.time() - t0:.1f}s)",
                      flush=True)
            except Exception:                         # noqa: BLE001
                FAILED.append(name)
                print(f"[tpu-smoke] FAIL {name} ({time.time() - t0:.1f}s)",
                      flush=True)
                traceback.print_exc()
        return run
    return deco


def _mk3d(X, Y, Z, w=1, seed=0):
    from mgtpu.ops.pallas.const3d import build_faces
    rng = np.random.default_rng(seed)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    coeff = rng.standard_normal((len(offs), X, Y, Z)).astype(np.float32)
    faces = build_faces(coeff, w)       # (fx, fyq, fzq, fyq_t, fzq_t)
    const = coeff[:, X // 2, Y // 2, Z // 2].copy()
    return offs, const, faces, rng


@gate("const3d_matvec")
def smoke_const3d():
    import jax.numpy as jnp
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    X = Y = Z = 129                       # pads X to 136; odd lanes
    offs, const, faces, rng = _mk3d(X, Y, Z)
    x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    y = const3d_matvec_pallas(jnp.asarray(const),
                              tuple(map(jnp.asarray, faces)),
                              np.array(offs), x, 1, interpret=False)
    assert np.isfinite(float(jnp.sum(y)))


@gate("fused3d_residual+jacobi")
def smoke_fused3d():
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    X, Y, Z = 129, 136, 129
    offs, const, faces, rng = _mk3d(X, Y, Z, seed=1)

    class A:
        pass
    a = A()
    a.const = jnp.asarray(const)
    a.faces = tuple(map(jnp.asarray, faces))
    a.offsets = np.array(offs)
    a.boxes = [((0, 0, 0), (1, 1, 1))]
    x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    r = f3k.residual3d(a, b, x, interpret=False)
    x1 = f3k.jacobi3d(a, d, b, x, interpret=False)
    p = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    x2 = f3k.jacobi_corr3d(a, d, b, x, p, interpret=False)
    assert np.isfinite(float(jnp.sum(r) + jnp.sum(x1) + jnp.sum(x2)))


@gate("fused3d_jacobi_residual")
def smoke_jacres():
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    X, Y, Z = 129, 136, 129               # the exact r2-failing extents
    offs, const, faces, rng = _mk3d(X, Y, Z, seed=2)

    class A:
        pass
    a = A()
    a.const = jnp.asarray(const)
    a.faces = tuple(map(jnp.asarray, faces))
    a.offsets = np.array(offs)
    a.boxes = [((0, 0, 0), (1, 1, 1))]
    x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    x1, r1 = f3k.jacobi_residual3d(a, d, b, x, interpret=False)
    assert np.isfinite(float(jnp.sum(x1) + jnp.sum(r1)))


def _stencil(X, Y, Z, w, seed):
    """Bench-like grid stencil object at band width w."""
    import jax.numpy as jnp
    offs, const, faces, rng = _mk3d(X, Y, Z, w=w, seed=seed)

    class A:
        pass
    a = A()
    a.const = jnp.asarray(const)
    a.faces = tuple(map(jnp.asarray, faces))
    a.offsets = np.array(offs)
    a.boxes = [((0, 0, 0), (w, 1, 1))]
    return a, rng


def _close(u, v, tol=2e-4):
    import jax.numpy as jnp
    num = float(jnp.abs(u - v).max())
    den = max(float(jnp.abs(v).max()), 1e-30)
    assert num / den < tol, num / den


@gate("kernels_w2_exact")
def smoke_w2():
    """Band width 2 — the width of the REAL bench operator (the nodal
    Laplacian's non-constant boundary band).  Lower AND check compiled
    numerics against the interpret (XLA-op) execution of the same math."""
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    X, Y, Z = 129, 132, 131
    a, rng = _stencil(X, Y, Z, w=2, seed=3)
    x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    mv = lambda i: const3d_matvec_pallas(a.const, a.faces, a.offsets, x, 2,
                                         interpret=i)
    _close(mv(False), mv(True))
    _close(f3k.residual3d(a, b, x, interpret=False),
           f3k.residual3d(a, b, x, interpret=True))
    _close(f3k.jacobi_corr3d(a, d, b, x, p, interpret=False),
           f3k.jacobi_corr3d(a, d, b, x, p, interpret=True))
    x1, r1 = f3k.jacobi_residual3d(a, d, b, x, interpret=False)
    x1i, r1i = f3k.jacobi_residual3d(a, d, b, x, interpret=True)
    _close(x1, x1i)
    _close(r1, r1i)


@gate("compact_faces")
def smoke_compact():
    """COMPACT face form (x-invariant band coefficients -> one
    VMEM-resident (nd, 2w, 1, .) constant-index block instead of streaming
    (nd, 2w, Xp, .) per call).  Real operators (test _op) always take this
    path now; gate it on the chip: lower + compiled vs interpret at w=2,
    single- and double-apply."""
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas, build_faces
    X, Y, Z = 129, 132, 131
    w = 2
    rng = np.random.default_rng(6)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    coeff = rng.standard_normal((len(offs), 1, Y, Z)).astype(np.float32)
    coeff = np.broadcast_to(coeff, (len(offs), X, Y, Z)).copy()
    faces = build_faces(coeff, w)
    assert len(faces) == 3, "compact form did not trigger"

    class A:
        pass
    a = A()
    a.const = jnp.asarray(coeff[:, X // 2, Y // 2, Z // 2].copy())
    a.faces = tuple(map(jnp.asarray, faces))
    a.offsets = np.array(offs)
    a.boxes = [((0, 0, 0), (w, 1, 1))]
    x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    mv = lambda i: const3d_matvec_pallas(a.const, a.faces, a.offsets, x, w,
                                         interpret=i)
    _close(mv(False), mv(True))
    _close(f3k.residual3d(a, b, x, interpret=False),
           f3k.residual3d(a, b, x, interpret=True))
    _close(f3k.jacobi_corr3d(a, d, b, x, p, interpret=False),
           f3k.jacobi_corr3d(a, d, b, x, p, interpret=True))
    x1, r1 = f3k.jacobi_residual3d(a, d, b, x, interpret=False)
    x1i, r1i = f3k.jacobi_residual3d(a, d, b, x, interpret=True)
    _close(x1, x1i)
    _close(r1, r1i)


@gate("xband_fold")
def smoke_fold():
    """MGTPU_PALLAS3D_XBAND=fold (in-kernel x-band rows): lower + compiled
    vs interpret numerics at w=2 (trace-time knob; distinct shapes force a
    fresh trace in this process)."""
    import os
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    os.environ["MGTPU_PALLAS3D_XBAND"] = "fold"
    try:
        X, Y, Z = 131, 130, 129
        a, rng = _stencil(X, Y, Z, w=2, seed=4)
        x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        p = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        mv = lambda i: const3d_matvec_pallas(a.const, a.faces, a.offsets,
                                             x, 2, interpret=i)
        _close(mv(False), mv(True))
        _close(f3k.jacobi_corr3d(a, d, b, x, p, interpret=False),
               f3k.jacobi_corr3d(a, d, b, x, p, interpret=True))
    finally:
        os.environ.pop("MGTPU_PALLAS3D_XBAND", None)


def _real_op(dims, shift=1e-4):
    """REAL operator path: make_grid_stencil on a nodal Laplacian — the
    only constructor that attaches faces AND band_meta (compact form +
    static skip flags), i.e. the configuration users actually run."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mgtpu import get_regular_mesh
    from mgtpu.models.operators import nodal_laplacian_matrix
    from mgtpu.ops.grid_stencil import make_grid_stencil
    M = get_regular_mesh([0.0, 1.0] * 3, list(dims))
    L = nodal_laplacian_matrix(M)
    L = (L + shift * abs(L).sum(0).max() * sp.identity(L.shape[0])
         ).tocsr().astype(np.float32)
    return make_grid_stencil(L, [d + 1 for d in dims])


@gate("bandv2_real_operator")
def smoke_bandv2():
    """The v2 additive z-band schedule (tridiagonal MXU matmuls with true
    boundary columns + static skip flags — r4) on a REAL operator with
    band_meta attached: compiled numerics vs interpret on the chip."""
    import os
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    os.environ["MGTPU_PALLAS3D_MIN"] = "1000"
    try:
        A = _real_op((40, 36, 34))
        assert A.faces is not None and len(A.faces) == 3
        assert A.band_meta is not None and A.band_meta[2], A.band_meta
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((2,) + A.grid)
                        .astype(np.float32))
        b = jnp.asarray(rng.standard_normal((2,) + A.grid)
                        .astype(np.float32))
        d = jnp.asarray(rng.standard_normal(A.grid).astype(np.float32))
        p = jnp.asarray(rng.standard_normal((2,) + A.grid)
                        .astype(np.float32))
        w = A.boxes[0][1][0]
        mv = lambda i: const3d_matvec_pallas(A.const, A.faces, A.offsets,
                                             x, w, interpret=i,
                                             band_meta=A.band_meta)
        _close(mv(False), mv(True))
        _close(f3k.jacobi_corr3d(A, d, b, x, p, interpret=False),
               f3k.jacobi_corr3d(A, d, b, x, p, interpret=True))
        x1, r1 = f3k.jacobi_residual3d(A, d, b, x, interpret=False)
        x1i, r1i = f3k.jacobi_residual3d(A, d, b, x, interpret=True)
        _close(x1, x1i)
        _close(r1, r1i)
    finally:
        os.environ.pop("MGTPU_PALLAS3D_MIN", None)


@gate("knob_matrix")
def smoke_knobs():
    """Sweep the user-settable trace-time knob combinations (VERDICT r3
    item 9: an untested knob combination must not be able to ship broken
    the way fused3d did in r2).  Each combo uses DISTINCT extents — the
    knobs are read at trace time, so a same-shape call would silently
    reuse the cached trace of the previous combo.  MGTPU_PALLAS3D_BX is
    import-time and cannot be swept in-process; run the whole gate with it
    set to cover that knob."""
    import os
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    os.environ["MGTPU_PALLAS3D_MIN"] = "1000"
    combos = [({"MGTPU_PALLAS3D_GROUPED": "0"}, (34, 38, 40)),
              ({"MGTPU_PALLAS3D_BANDV2": "0"}, (38, 40, 34)),
              ({"MGTPU_PALLAS3D_BANDV2": "0",
                "MGTPU_PALLAS3D_MXU": "1"}, (40, 34, 38)),
              ({"MGTPU_PALLAS3D_XBAND": "fold"}, (36, 34, 42))]
    try:
        for env, dims in combos:
            old = {}
            for k, v in env.items():
                old[k] = os.environ.get(k)
                os.environ[k] = v
            try:
                A = _real_op(dims)
                rng = np.random.default_rng(sum(dims))
                x = jnp.asarray(rng.standard_normal(A.grid)
                                .astype(np.float32))
                b = jnp.asarray(rng.standard_normal(A.grid)
                                .astype(np.float32))
                d = jnp.asarray(rng.standard_normal(A.grid)
                                .astype(np.float32))
                w = A.boxes[0][1][0]
                mv = lambda i: const3d_matvec_pallas(
                    A.const, A.faces, A.offsets, x, w, interpret=i,
                    band_meta=A.band_meta)
                _close(mv(False), mv(True))
                x1, r1 = f3k.jacobi_residual3d(A, d, b, x, interpret=False)
                x1i, r1i = f3k.jacobi_residual3d(A, d, b, x, interpret=True)
                _close(x1, x1i)
                _close(r1, r1i)
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    finally:
        os.environ.pop("MGTPU_PALLAS3D_MIN", None)


@gate("autobx_singlestep_and_midsize")
def smoke_autobx():
    """The r4 late landings (VERDICT r4 weak #4 shipped them ungated):
    bx_for's whole-field single-step blocks (33^3 -> bx=33, padded field
    676 KB <= the 1 MB compile cap) and the mid-size 9..16 divisors
    (65^3 -> bx=13, block 479 KB): lower + compiled-vs-interpret numerics
    through the REAL operator path."""
    import os
    import jax.numpy as jnp
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas, bx_for
    os.environ["MGTPU_PALLAS3D_MIN"] = "1000"
    try:
        for dims, want_bx in (((32, 32, 32), 33), ((64, 64, 64), 13)):
            A = _real_op(dims)
            X, Y, Z = A.grid
            assert bx_for(X, Y, Z) == want_bx, (A.grid, bx_for(X, Y, Z))
            rng = np.random.default_rng(13 + dims[0])
            x = jnp.asarray(rng.standard_normal(A.grid).astype(np.float32))
            b = jnp.asarray(rng.standard_normal(A.grid).astype(np.float32))
            d = jnp.asarray(rng.standard_normal(A.grid).astype(np.float32))
            w = A.boxes[0][1][0]
            mv = lambda i: const3d_matvec_pallas(
                A.const, A.faces, A.offsets, x, w, interpret=i,
                band_meta=A.band_meta)
            _close(mv(False), mv(True))
            x1, r1 = f3k.jacobi_residual3d(A, d, b, x, interpret=False)
            x1i, r1i = f3k.jacobi_residual3d(A, d, b, x, interpret=True)
            _close(x1, x1i)
            _close(r1, r1i)
    finally:
        os.environ.pop("MGTPU_PALLAS3D_MIN", None)


@gate("tridiag_line_solve")
def smoke_tridiag():
    """Lower AND check exactness vs the XLA doubling scan on the chip
    (both line axes at 257^2 f32 + one 3D axis; odd extents -> padding)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mgtpu import get_regular_mesh
    from mgtpu.setup.smoothers import line_prec
    from mgtpu.cycle.relax import line_solve
    from mgtpu.ops.pallas.tridiag import line_solve_pallas, \
        line_correct_pallas
    rng = np.random.default_rng(4)

    def check(A, M, shape, axes):
        r = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        for ax in axes:
            lr = line_prec(A, M, 0.9, dtype=np.float32, axis=ax)
            ref = np.asarray(x + lr.omega * line_solve(lr, r))
            got = np.asarray(line_correct_pallas(lr, r, x, interpret=False))
            err = np.abs(got - ref).max() / np.abs(ref).max()
            assert err < 2e-4, (shape, ax, err)
            s = np.asarray(line_solve_pallas(lr, r, interpret=False))
            assert np.isfinite(s).all()

    n = 256
    N = n + 1
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(N, N)) * (n ** 2)
    I = sp.identity(N)
    A2 = sp.csr_matrix(10.0 * sp.kron(I, T) + sp.kron(T, I))
    M2 = get_regular_mesh([0.0, 1.0] * 2, [n, n])
    check(A2, M2, (N, N), (0, 1))
    n3 = 32
    N3 = n3 + 1
    T3 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(N3, N3)) * (n3 ** 2)
    I3 = sp.identity(N3)
    A3 = sp.csr_matrix(20.0 * sp.kron(sp.kron(T3, I3), I3)
                       + sp.kron(sp.kron(I3, T3), I3)
                       + sp.kron(sp.kron(I3, I3), T3))
    M3 = get_regular_mesh([0.0, 1.0] * 3, [n3, n3, n3])
    check(A3, M3, (N3, N3, N3), (0, 2))


@gate("stencil_kernel_2d")
def smoke_stencil2d():
    import jax.numpy as jnp
    from mgtpu.ops.pallas.stencil_kernel import stencil_matvec_pallas
    rng = np.random.default_rng(3)
    NJ, NI = 257, 257
    di = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
    dj = (-1, -1, -1, 0, 0, 0, 1, 1, 1)
    coeff = jnp.asarray(
        rng.standard_normal((9, NJ, NI)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((NJ, NI)).astype(np.float32))
    y = stencil_matvec_pallas(coeff, di, dj, x, interpret=False)
    assert np.isfinite(float(jnp.sum(y)))


@gate("default_3d_cycle_config")
def smoke_cycle3d():
    # the EXACT default TPU path users hit: 128^3 Poisson, grid engine,
    # Jacobi V(1,1) -> jacobi_residual3d default-on (>= 2M nodes, f32)
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mgtpu import get_mg_param, mg_setup, get_regular_mesh
    from mgtpu.cycle.grid_cycle import grid_cycle
    from mgtpu.ops.grid_stencil import flat_to_grid
    from mgtpu.models.operators import nodal_laplacian_matrix
    M3 = get_regular_mesh([0.0, 1.0] * 3, [128, 128, 128])
    L3 = nodal_laplacian_matrix(M3)
    L3 = (L3 + 1e-4 * abs(L3).sum(axis=0).max()
          * sp.identity(L3.shape[0])).tocsr()
    cfg3, rp3 = get_mg_param(levels=5, relax_type="jacobi", relax_param=0.8,
                             nu_pre=1, nu_post=1, dtype=np.float32)
    st3 = mg_setup(L3, M3, cfg3, rp3)
    rng = np.random.RandomState(0)
    bg3 = flat_to_grid(jnp.asarray(
        rng.rand(L3.shape[0], 1).astype(np.float32)), st3.hier.fine_grid)
    x = grid_cycle(cfg3, st3.hier, bg3, jnp.zeros_like(bg3))
    assert np.isfinite(float(jnp.sum(x)))


def main(argv):
    import jax
    backend = jax.default_backend()
    print(f"[tpu-smoke] backend={backend} devices={jax.devices()}",
          flush=True)
    if backend in ("cpu", "gpu"):
        print("[tpu-smoke] ERROR: not a TPU backend — this gate must run "
              "on the real chip", flush=True)
        return 2
    smokes = [smoke_const3d, smoke_fused3d, smoke_jacres, smoke_w2,
              smoke_compact, smoke_fold, smoke_bandv2, smoke_knobs,
              smoke_autobx, smoke_tridiag, smoke_stencil2d]
    if "--fast" not in argv:
        smokes.append(smoke_cycle3d)
    t0 = time.time()
    for s in smokes:
        s()
    if "--json" in argv:
        import json
        path = argv[argv.index("--json") + 1]
        rec = {"ok": not FAILED,
               "gates_run": len(smokes),
               "failed": list(FAILED),
               "backend": backend,
               "device": str(jax.devices()[0]),
               "elapsed_s": round(time.time() - t0, 1),
               "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[tpu-smoke] recorded {path}", flush=True)
    if FAILED:
        print(f"[tpu-smoke] FAILED: {FAILED}", flush=True)
        return 1
    print("[tpu-smoke] all kernels lower and run on the chip", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
