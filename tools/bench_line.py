"""Slope-timed 257^2 line-Jacobi vs point-Jacobi cycle cost (ROADMAP item 3,
VERDICT r2 item 10 target: lines within ~3x of point).

Compares the three tridiagonal-solve schedules on the real chip:
doubling-shift `_scan_linear` (default), `lax.associative_scan`
(MGTPU_LINE_SCAN=assoc), and the one-pass Pallas kernels
(MGTPU_LINE_SCAN=pallas, ops/pallas/tridiag.py).  Safe to toggle the env
var between sections here: each `_chain_timer` call jits a fresh closure,
so every mode gets its own trace.

Usage: python tools/bench_line.py [probe]
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp


def probe_ms():
    """Chip contention probe (bench._probe_ms — one implementation)."""
    from bench import _probe_ms
    return _probe_ms()


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import _chain_timer
    from mgtpu import get_mg_param, mg_setup, get_regular_mesh
    from mgtpu.cycle.grid_cycle import grid_cycle
    from mgtpu.ops.grid_stencil import flat_to_grid
    import jax.numpy as jnp

    print(f"probe: {probe_ms():.3f} ms (healthy ~0.03)")

    n = 256
    N = n + 1
    eps = 100.0
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(N, N)) * (n ** 2)
    I = sp.identity(N)
    A = sp.csr_matrix(eps * sp.kron(I, T) + sp.kron(T, I))
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    b = np.random.RandomState(0).rand(A.shape[0], 1).astype(np.float32)

    import jax
    pallas = ("pallas" if jax.default_backend() not in ("cpu", "gpu")
              else "pallas-interpret")    # CPU: code-path validation only
    runs = [("jacobi", 0.8, None),
            ("line-jacobi", 1.0, ""),          # XLA doubling (default)
            ("line-jacobi", 1.0, "assoc"),
            ("line-jacobi", 1.0, pallas)]
    for rt, rp, mode in runs:
        if mode is None:
            os.environ.pop("MGTPU_LINE_SCAN", None)
        else:
            os.environ["MGTPU_LINE_SCAN"] = mode
        cfg, rpv = get_mg_param(levels=4, relax_type=rt, relax_param=rp,
                                nu_pre=1, nu_post=1, dtype=np.float32)
        st = mg_setup(A, M, cfg, rpv)
        bg = flat_to_grid(jnp.asarray(b), st.hier.fine_grid)
        # long chains: these cycles sit near the rig's ~30 us measurement
        # floor — the default 20-iteration delta returned NEGATIVE slopes
        # (r4 run), i.e. pure contention noise
        ms = _chain_timer(lambda h, bb, xx: grid_cycle(cfg, h, bb, xx),
                          st.hier, bg, jnp.zeros_like(bg), ks=(4, 104),
                          reps=3)
        tag = f"{rt}[{mode or 'doubling'}]" if rt == "line-jacobi" else rt
        print(f"{tag:24s}: {ms:.3f} ms/cycle (257^2 V(1,1))")

    # isolated fine-level line_solve cost per schedule (no cycle around it)
    from mgtpu.setup.smoothers import line_prec
    from mgtpu.cycle.relax import line_solve
    lr = line_prec(A, M, 1.0, dtype=np.float32, axis=1)
    rg = flat_to_grid(jnp.asarray(b), (N, N))
    for mode in ("", "assoc", pallas):
        if mode:
            os.environ["MGTPU_LINE_SCAN"] = mode
        else:
            os.environ.pop("MGTPU_LINE_SCAN", None)
        ms = _chain_timer(lambda lrr, bb, xx: xx + line_solve(lrr, bb),
                          lr, rg, jnp.zeros_like(rg), ks=(4, 104), reps=3)
        print(f"line_solve[{mode or 'doubling'}]".ljust(24)
              + f": {ms:.3f} ms/apply (fine level)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        print(f"probe: {probe_ms():.3f} ms")
    else:
        main()
