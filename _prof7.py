import time, numpy as np, jax, jax.numpy as jnp, scipy.sparse as sp
from jax import lax
from mgtpu import get_mg_param, mg_setup, get_regular_mesh
from mgtpu.cycle.cycle import recursive_cycle
from mgtpu.cycle.grid_cycle import grid_cycle, grid_restrict, grid_prolong
from mgtpu.ops.grid_stencil import flat_to_grid
from mgtpu.models.operators import nodal_laplacian_matrix

n = 1024
M = get_regular_mesh([0.,1.,0.,1.],[n,n])
L = nodal_laplacian_matrix(M)
L = (L + 1e-4*abs(L).sum(axis=0).max()*sp.identity(L.shape[0])).tocsr()
cfg, rp = get_mg_param(levels=6, relax_type="jacobi", relax_param=0.8,
                       nu_pre=1, nu_post=1, dtype=np.float32)
state = mg_setup(L, M, cfg, rp)
gh = state.hier

def devtime(body, x0, label, reps):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, reps, lambda i, x: body(x), x)
    r = run(x0); _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run(x0); _ = float(jnp.sum(r))
    tot = (time.perf_counter()-t0)*1e3
    print(f"{label}: {(tot-31)/reps:.5f} ms/iter (tot {tot:.1f})", flush=True)

G = jnp.ones((1, 1025, 1025), np.float32)
b = G
# full cycle grid form
devtime(lambda x: grid_cycle(cfg, gh, b, x), jnp.zeros_like(G), "grid cycle (grid io)", 200)
# fine const-stencil matvec
A0 = gh.levels[0].A
devtime(lambda x: A0.matvec(x)*0.25, G, "fine const matvec", 1000)
A1 = gh.levels[1].A
G1 = jnp.ones((1,513,513), np.float32)
devtime(lambda x: A1.matvec(x)*0.25, G1, "lvl1 const matvec (9pt)", 1000)
# transfers
devtime(lambda x: grid_prolong(grid_restrict(x, 2), 2)*0.25, G, "fine R+P roundtrip", 1000)
# smoother step x + d*r
d0 = gh.levels[0].d
devtime(lambda x: x + d0*(b - x), G, "jacobi update x+d*(b-x)", 1000)
# coarse solve
bc = jnp.ones((1,33,33), np.float32)
devtime(lambda x: gh.coarse.solve(x)*1e-3, bc, "coarse inv matmul 1089", 1000)
# 2-level-only cycle cost: emulate fine level work: 3 matvecs + 2 smoothes + R + P
def fine_work(x):
    r = b - A0.matvec(x)
    x = x + d0*r
    r = b - A0.matvec(x)
    bc2 = grid_restrict(r, 2)
    x = x + grid_prolong(bc2, 2)
    r = b - A0.matvec(x)
    return x + d0*r
devtime(fine_work, jnp.zeros_like(G), "fine-level-only work", 500)
