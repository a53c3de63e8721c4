import time, numpy as np, jax, jax.numpy as jnp
from jax import lax

def devtime(body, x0, label, reps=1000):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, reps, lambda i, x: body(x), x)
    r = run(x0); _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run(x0); _ = float(jnp.sum(r))
    tot = (time.perf_counter()-t0)*1e3
    print(f"{label}: {(tot-31)/reps:.5f} ms/iter (tot {tot:.1f})", flush=True)

G = jnp.ones((1025,1025), np.float32)
# strided slice along lanes (axis -1) with carried shape: pad back
devtime(lambda x: jnp.pad(x[:, ::2], ((0,0),(0,512))), G, "stride-2 lanes + padback")
devtime(lambda x: jnp.pad(x[::2, :], ((0,512),(0,0))), G, "stride-2 sublanes + padback")
devtime(lambda x: x.T.reshape(1025,1025), G, "transpose 1025^2")
W = jnp.ones((1025, 513), np.float32)
devtime(lambda x: jnp.pad(x @ W, ((0,0),(0,512)))*1e-3, G, "matmul restrict lanes (1025x1025)@(1025,513)")
# matmul on both axes: y = R x R^T  (513,1025)@(1025,1025)@(1025,513)
R1 = jnp.ones((513,1025), np.float32)
def both(x):
    y = R1 @ x @ R1.T
    return jnp.pad(y, ((0,512),(0,512)))*1e-3
devtime(both, G, "matmul restrict both axes")
# interior-pad upsample along lanes
Gc = jnp.ones((513,513), np.float32)
devtime(lambda x: lax.pad(x, jnp.float32(0), ((0,0,0),(0,0,1)))[:, :513]*0.5, Gc, "interior-pad lanes 513->1025->slice")
# even-extract via reshape trick
def evens(x):
    a = x[:, :1024].reshape(1025, 512, 2)[:, :, 0]
    return jnp.pad(a, ((0,0),(0,513)))
devtime(evens, G, "even lanes via reshape (1025,512,2)[:,:,0]")
