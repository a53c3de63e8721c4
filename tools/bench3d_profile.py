"""Slope-timed breakdown of the 129^3 V(1,1) cycle (ROADMAP item 2).

Times each component as a dependent-iteration chain (bench.py methodology):
full cycle, fine-level fused ops (jacres / jacobi), fine matvec, restrict,
prolong+add, and the whole coarse sub-cycle (levels 1..L as a V-cycle on
the restricted residual).  Run on the real chip; MGTPU_PALLAS3D_MIN can be
set to move the kernel crossover for A/B runs.

Usage: python tools/bench3d_profile.py [n=128] [levels=5]
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, ops, ks=(2, 22), reps=3):
    """Slope-time fn(ops, x) chains — delegates to bench._chain_timer so
    the paid-for methodology (CLAUDE.md rule 1) lives in ONE place."""
    from bench import _chain_timer
    return _chain_timer(lambda o, _b, xx: fn(o, xx), ops, 0.0, ops["x0"],
                        ks=ks, reps=reps)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax.numpy as jnp
    from mgtpu import get_mg_param, mg_setup, get_regular_mesh
    from mgtpu.models.operators import nodal_laplacian_matrix
    from mgtpu.cycle.grid_cycle import grid_cycle, grid_restrict, grid_prolong
    from mgtpu.ops.grid_stencil import flat_to_grid
    from mgtpu.ops.pallas import fused3d as f3k
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_line import probe_ms  # chip contention probe
    print(f"probe: {probe_ms():.3f} ms (healthy ~0.03)")

    M3 = get_regular_mesh([0.0, 1.0] * 3, [n] * 3)
    L3 = nodal_laplacian_matrix(M3)
    L3 = (L3 + 1e-4 * abs(L3).sum(axis=0).max()
          * sp.identity(L3.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, relax_type="jacobi",
                           relax_param=0.8, nu_pre=1, nu_post=1,
                           dtype=np.float32)
    st = mg_setup(L3, M3, cfg, rp)
    hier = st.hier
    lvl = hier.levels[0]
    rng = np.random.RandomState(0)
    bg = flat_to_grid(jnp.asarray(
        rng.rand(L3.shape[0], 1).astype(np.float32)), hier.fine_grid)
    sc = np.float32(1.0 / abs(L3).sum(axis=0).max())

    base = {"x0": bg, "b": bg, "hier": hier}

    t_cycle = chain(lambda o, x: grid_cycle(cfg, o["hier"], o["b"], x),
                    base)
    print(f"full V(1,1) cycle      : {t_cycle:.3f} ms")

    dd = lvl.d if not hasattr(lvl.d, "d") else lvl.d.d
    t_jacres = chain(
        lambda o, x: f3k.jacobi_residual3d(o["hier"].levels[0].A, dd,
                                           o["b"], x)[0] * sc, base)
    print(f"fine jacres (fused)    : {t_jacres:.3f} ms")

    t_jac = chain(
        lambda o, x: f3k.jacobi3d(o["hier"].levels[0].A, dd, o["b"], x) * sc,
        base)
    print(f"fine jacobi3d (fused)  : {t_jac:.3f} ms")

    t_mv = chain(lambda o, x: sc * o["hier"].levels[0].A.matvec(x), base)
    print(f"fine matvec            : {t_mv:.3f} ms")

    # restrict + prolong round trip (keeps shapes chainable)
    t_rt = chain(lambda o, x: x + 0.5 * grid_prolong(
        grid_restrict(x, o["hier"].levels[0].P1) * sc,
        o["hier"].levels[0].P1), base)
    print(f"restrict+prolong+add   : {t_rt:.3f} ms")

    # coarse sub-cycles: V-cycle from each level on the restricted field —
    # the per-level deltas localise where the coarse milliseconds live
    bc = bg
    t_coarse = None
    for l in range(1, levels - 1):
        bc = grid_restrict(bc, hier.levels[l - 1].P1)
        ops_l = {"x0": jnp.zeros_like(bc), "b": bc, "hier": hier}
        t_l = chain(lambda o, x, l=l: grid_cycle(cfg, o["hier"], o["b"], x,
                                                 level=l), ops_l)
        if t_coarse is None:
            t_coarse = t_l
        print(f"coarse sub-cycle (L{l}+) : {t_l:.3f} ms")

    acct = t_jacres + t_jac + t_rt + (t_coarse or 0.0)
    print(f"accounted {acct:.3f} vs cycle {t_cycle:.3f} ms "
          f"(rt double-counts the +add)")

    # no-smoother cycle: transfers + coarse + plumbing only (isolates the
    # composed-cycle overhead the per-component chains cannot see)
    cfg0, rp0 = get_mg_param(levels=levels, relax_type="jacobi",
                             relax_param=0.8, nu_pre=0, nu_post=0,
                             dtype=np.float32)
    st0 = mg_setup(L3, M3, cfg0, rp0)
    t0c = chain(lambda o, x: grid_cycle(cfg0, st0.hier, o["b"], x), base)
    print(f"nu=0 cycle (no smooth) : {t0c:.3f} ms")


if __name__ == "__main__":
    main()
