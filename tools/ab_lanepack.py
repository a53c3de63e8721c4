"""A/B probe: how much of the 3D kernel cost is the 129->256 lane padding?

ROADMAP item 2a's open question: a 129-extent minor dim occupies two
128-lane tiles, so every VPU op on the (Y, Z) plane pays ~2x.  Packing the
fields to an exact-128 main block plus a one-column sliver (seam-corrected
in-kernel) is a major redesign — this probe decides whether it can pay
before any of it is built.

Method: slope-time (bench._chain_timer — CLAUDE.md rule 1) the const3d
matvec and the fused jacobi_residual3d on shapes that differ ONLY in the
minor-dim extent:

    (129, 129, 129)   two lane tiles, 17 sublane rows   (the bench shape)
    (129, 129, 128)   ONE lane tile, same node count -0.8%
    (129, 128, 128)   one lane tile, 16 sublane rows
    (128, 128, 128)   fully tile-aligned (16 x-blocks too)

If t(..129)/t(..128) ~ 2 the packed layout is worth building; ~1 means the
cost is elsewhere (rolls/call overhead) and the redesign is a dead end.
Run on the real chip: `python tools/ab_lanepack.py [w=2] [taps=27|7]`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _ProbeOp:
    """Minimal const3d operator carrier, registered as a pytree so
    _chain_timer can pass it straight through jit (r3's bare class raised
    'Error interpreting argument ... as an abstract array' on-chip and the
    probe never produced its go/no-go numbers — VERDICT r3 weak #1)."""

    def __init__(self, const, faces, offsets, boxes):
        self.const, self.faces = const, faces
        self.offsets, self.boxes = offsets, boxes

    def tree_flatten(self):
        return ((self.const, self.faces),
                (tuple(map(tuple, self.offsets)),
                 tuple((tuple(o), tuple(s)) for o, s in self.boxes)))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], np.array(aux[0]), list(aux[1]))


def _register():
    import jax
    jax.tree_util.register_pytree_node(
        _ProbeOp, _ProbeOp.tree_flatten,
        lambda aux, ch: _ProbeOp.tree_unflatten(aux, ch))


def _mk(X, Y, Z, w, taps, seed=0):
    import jax.numpy as jnp
    from mgtpu.ops.pallas.const3d import build_faces
    rng = np.random.default_rng(seed)
    if taps == 7:
        offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1)]
    else:
        offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)]
    coeff = rng.standard_normal((len(offs), X, Y, Z)).astype(np.float32)
    coeff /= np.abs(coeff).sum(axis=0).max()       # chainable: row sums <= 1
    faces = build_faces(coeff, w)
    a = _ProbeOp(jnp.asarray(coeff[:, X // 2, Y // 2, Z // 2].copy()),
                 tuple(map(jnp.asarray, faces)),
                 np.array(offs), [((0, 0, 0), (w, 1, 1))])
    return a, rng


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    taps = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    import jax.numpy as jnp
    from bench import _chain_timer, _probe_ms
    from mgtpu.ops.pallas import fused3d as f3k
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    _register()
    print(f"probe: {_probe_ms():.3f} ms (healthy ~0.03); w={w} taps={taps}")

    shapes = [(129, 129, 129), (129, 129, 128), (129, 128, 128),
              (128, 128, 128)]
    base = None
    for X, Y, Z in shapes:
        a, rng = _mk(X, Y, Z, w, taps, seed=X + Y + Z)
        x = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
        d = jnp.asarray(0.01 * rng.standard_normal((X, Y, Z))
                        .astype(np.float32))
        t_mv = _chain_timer(
            lambda o, _b, xx: const3d_matvec_pallas(
                o.const, o.faces, o.offsets, xx, w), a, b, x, ks=(2, 22))
        t_jr = _chain_timer(
            lambda o, bb, xx: f3k.jacobi_residual3d(o, d, bb, xx)[0],
            a, b, x, ks=(2, 22))
        mn = X * Y * Z / 1e6
        rel = "" if base is None else (
            f"  vs129: mv {t_mv / base[0]:.2f}x jr {t_jr / base[1]:.2f}x")
        if base is None:
            base = (t_mv, t_jr)
        print(f"({X},{Y},{Z}): matvec {t_mv:.3f} ms  jacres {t_jr:.3f} ms"
              f"  ({t_mv / mn:.3f} / {t_jr / mn:.3f} ms/Mnode){rel}",
              flush=True)


if __name__ == "__main__":
    main()
