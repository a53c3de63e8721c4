"""Benchmark: 2D Poisson GMG V-cycle on the real TPU chip.

Headline metric (BASELINE.md protocol): wall-clock per V-cycle on a 1024^2
Poisson problem (1025^2 nodes, ~9.4M nnz on the fine level), float32, 6-level
Galerkin hierarchy, Jacobi V(1,1), dense-LU coarsest.  The reference publishes
no numbers (BASELINE.md: "None"), so vs_baseline reports the speedup against
the same V-cycle executed with scipy CSR matvecs on this machine's CPU — the
reference's own platform class (an OpenMP CPU solver).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np


def _host_vcycle(state, b, x):
    """scipy-CSR V-cycle numerically identical to the device cycle (Jacobi)."""
    import scipy.sparse.linalg as spla
    cfg = state.config
    As, Ps, Rs = state.As, state.Ps, state.Rs
    if not hasattr(state, "_host_lu"):
        state._host_lu = spla.splu(As[-1].astype(np.float64).tocsc())

    def cycle(level, bb, xx):
        A = As[level]
        if level == len(As) - 1:
            return state._host_lu.solve(bb.astype(np.float64)).astype(bb.dtype)
        d = (state.relax_param / A.diagonal())[:, None]
        for _ in range(cfg.nu_pre[level]):
            xx = xx + d * (bb - A @ xx)
        r = bb - A @ xx
        bc = Rs[level] @ r
        xc = cycle(level + 1, bc, np.zeros((Rs[level].shape[0], bb.shape[1]),
                                           dtype=bb.dtype))
        xx = xx + Ps[level] @ xc
        for _ in range(cfg.nu_post[level]):
            xx = xx + d * (bb - A @ xx)
        return xx

    return cycle(0, b, x)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from mgtpu import get_mg_param, mg_setup, get_regular_mesh, make_cycle_fn
    from mgtpu.models.operators import nodal_laplacian_matrix

    n = 1024
    levels = 6
    dtype = np.float32
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(axis=0).max() * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, max_outer_iter=20,
                           relative_tol=1e-6, relax_type="jacobi",
                           relax_param=0.8, nu_pre=1, nu_post=1, dtype=dtype)
    state = mg_setup(L, M, cfg, rp)
    nnz_total = sum(a.nnz for a in state.As)

    rng = np.random.RandomState(0)
    b64 = L @ rng.rand(L.shape[0])
    b64 /= np.linalg.norm(b64)
    b = jnp.asarray(b64.astype(dtype))[:, None]
    x = jnp.zeros_like(b)
    cycle = make_cycle_fn(cfg)
    hier = state.hier

    # warm up / compile
    x = cycle(hier, b, x)
    jax.block_until_ready(x)
    x = jnp.zeros_like(b)

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        x = cycle(hier, b, x)
    jax.block_until_ready(x)
    dev_ms = (time.perf_counter() - t0) / n_rep * 1e3

    relres = float(jnp.linalg.norm(b[:, 0] - jnp.asarray(
        L.astype(dtype) @ np.asarray(x[:, 0]))))

    # host (CPU, scipy CSR) baseline: same cycle, float32
    bh = b64.astype(dtype)[:, None]
    xh = np.zeros_like(bh)
    xh = _host_vcycle(state, bh, xh)   # warm (splu factor)
    xh = np.zeros_like(bh)
    t0 = time.perf_counter()
    n_host = 3
    for _ in range(n_host):
        xh = _host_vcycle(state, bh, xh)
    host_ms = (time.perf_counter() - t0) / n_host * 1e3

    result = {
        "metric": "poisson2d_1024_gmg_vcycle_time",
        "value": round(dev_ms, 3),
        "unit": "ms",
        "vs_baseline": round(host_ms / dev_ms, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "fine_nnz": int(state.As[0].nnz),
            "hierarchy_nnz": int(nnz_total),
            "host_cpu_vcycle_ms": round(host_ms, 3),
            "relres_after_20_cycles": relres,
            "nnz_per_s_per_cycle": round(nnz_total * 2 * 1e3 / dev_ms / 1e9, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
