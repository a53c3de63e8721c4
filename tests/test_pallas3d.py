"""3D one-pass Pallas kernels (ops/pallas/const3d.py, fused3d.py), interpret
mode: exact matvec / residual / jacobi vs the assembled scipy operator."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from mgtpu import get_regular_mesh
from mgtpu.models.operators import nodal_laplacian_matrix
import mgtpu.ops.pallas.const3d as c3


@pytest.fixture()
def small_kernels(monkeypatch):
    """Lower the size floor so test-size grids build faces, and route the
    const matvec through the interpreter."""
    def sc(offsets, grid, dtype):
        return (len(grid) == 3
                and all(abs(d) <= 1 for off in offsets for d in off)
                and all(n >= 16 for n in grid)
                and np.dtype(dtype) == np.float32)
    monkeypatch.setattr(c3, "supports_const3d", sc)
    monkeypatch.setenv("MGTPU_PALLAS3D", "interpret")
    yield


def _op(n):
    dims = [n, n, n] if np.isscalar(n) else list(n)
    M = get_regular_mesh([0.0, 1.0] * 3, dims)
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(0).max() * sp.identity(L.shape[0])
         ).tocsr().astype(np.float32)
    from mgtpu.ops.grid_stencil import make_grid_stencil
    A = make_grid_stencil(L, [d + 1 for d in dims])
    assert A.faces is not None
    return L, A


def test_fused3d_noncubic_exact(small_kernels):
    """Distinct X/Y/Z extents (odd and even mixed): catches axis mix-ups
    in the grouped tap schedule (dz-group rolls, band slices) that every
    cubic-grid test is blind to."""
    from mgtpu.ops.pallas.fused3d import (residual3d, jacobi_corr3d,
                                          jacobi_residual3d)
    L, A = _op((18, 24, 30))        # grids (19, 25, 31)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    p = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    os.environ["MGTPU_PALLAS3D"] = "off"     # XLA reference matvec
    r_ref = b - A.matvec(x)
    s = x + p
    xc_ref = s + d * (b - A.matvec(s))
    x1_ref = x + d * (b - A.matvec(x))
    r1_ref = b - A.matvec(x1_ref)
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    r = residual3d(A, b, x, interpret=True)
    assert float(jnp.abs(r - r_ref).max() / jnp.abs(r_ref).max()) < 2e-5
    xc = jacobi_corr3d(A, d, b, x, p, interpret=True)
    assert float(jnp.abs(xc - xc_ref).max() / jnp.abs(xc_ref).max()) < 2e-5
    x1, r1 = jacobi_residual3d(A, d, b, x, interpret=True)
    assert float(jnp.abs(x1 - x1_ref).max() / jnp.abs(x1_ref).max()) < 2e-5
    assert float(jnp.abs(r1 - r1_ref).max() / jnp.abs(r1_ref).max()) < 1e-4


@pytest.mark.parametrize("n", [16, 24])
def test_const3d_matvec_exact(small_kernels, n):
    L, A = _op(n)
    x = np.random.RandomState(0).rand(L.shape[0], 2).astype(np.float32)
    y = np.asarray(A.matvec(jnp.asarray(x)), np.float64)
    yref = L.astype(np.float64) @ x.astype(np.float64)
    assert np.abs(y - yref).max() / np.abs(yref).max() < 2e-5


def test_fused3d_ops_exact(small_kernels):
    from mgtpu.ops.pallas.fused3d import residual3d, jacobi3d
    L, A = _op(24)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    os.environ["MGTPU_PALLAS3D"] = "off"     # XLA reference matvec
    r_ref = b - A.matvec(x)
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    r_f = residual3d(A, b, x, interpret=True)
    assert float(jnp.abs(r_f - r_ref).max() / jnp.abs(r_ref).max()) < 2e-5
    xj_f = jacobi3d(A, d, b, x, interpret=True)
    xj_ref = x + d * r_ref
    assert float(jnp.abs(xj_f - xj_ref).max()
                 / jnp.abs(xj_ref).max()) < 2e-5


def test_jacobi_corr3d_exact(small_kernels):
    """Correction-fold fusion x' = s + d(b - As), s = x + p vs composed."""
    from mgtpu.ops.pallas.fused3d import jacobi_corr3d
    L, A = _op(24)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    p = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    os.environ["MGTPU_PALLAS3D"] = "off"     # XLA reference matvec
    s = x + p
    ref = s + d * (b - A.matvec(s))
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    out = jacobi_corr3d(A, d, b, x, p, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 2e-5


@pytest.mark.parametrize("n", [16, 24])
@pytest.mark.parametrize("m", [1, 2])
def test_jacobi_residual3d_exact(small_kernels, n, m):
    """Double-apply fusion (x', r') vs the composed single-pass ops."""
    from mgtpu.ops.pallas.fused3d import jacobi_residual3d
    L, A = _op(n)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(m, *A.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(m, *A.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    os.environ["MGTPU_PALLAS3D"] = "off"     # XLA reference matvec
    x1_ref = x + d * (b - A.matvec(x))
    r1_ref = b - A.matvec(x1_ref)
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    x1, r1 = jacobi_residual3d(A, d, b, x, interpret=True)
    sc = float(jnp.abs(r1_ref).max())
    assert float(jnp.abs(x1 - x1_ref).max() / jnp.abs(x1_ref).max()) < 2e-5
    assert float(jnp.abs(r1 - r1_ref).max() / sc) < 1e-4


@pytest.mark.parametrize("cycle_type,nu_pre,nu_post,levels", [
    ("V", 2, 1, 2),      # corr-fold + plain post-smooth
    ("W", 1, 2, 3),      # recursive coarse visits re-enter the fold
    ("V", 1, 0, 2),      # nu_post=0: the plain x+p branch
])
def test_fused3d_cycle_matches_xla(small_kernels, cycle_type, nu_pre,
                                   nu_post, levels):
    from mgtpu import get_mg_param, mg_setup
    from mgtpu.cycle.grid_cycle import grid_cycle
    from mgtpu.ops.grid_stencil import flat_to_grid
    n = 24
    M = get_regular_mesh([0.0, 1.0] * 3, [n, n, n])
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(0).max() * sp.identity(L.shape[0])).tocsr()
    cfg, rp = get_mg_param(levels=levels, cycle_type=cycle_type,
                           relax_type="jacobi", relax_param=0.8,
                           nu_pre=nu_pre, nu_post=nu_post, dtype=np.float32)
    os.environ["MGTPU_PALLAS3D"] = "off"
    st_ref = mg_setup(L, M, cfg, rp)
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    st_fus = mg_setup(L, M, cfg, rp)
    assert st_fus.hier.levels[0].A.faces is not None
    b = flat_to_grid(jnp.asarray(
        np.random.RandomState(0).rand(L.shape[0], 2).astype(np.float32)),
        st_ref.hier.fine_grid)
    x0 = jnp.zeros_like(b)
    os.environ["MGTPU_PALLAS3D"] = "off"
    y_ref = np.asarray(grid_cycle(cfg, st_ref.hier, b, x0))
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    y_fus = np.asarray(grid_cycle(cfg, st_fus.hier, b, x0))
    d = np.abs(y_fus - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    assert d < 1e-5, d


@pytest.mark.slow
def test_pertap_schedule_fallback_subprocess():
    """MGTPU_PALLAS3D_GROUPED=0 (emergency per-tap roll schedule) stays
    exact.  The knob is read at trace time and is not a jit cache key, so
    it only takes effect in a fresh process — run the check there."""
    import subprocess
    import sys
    code = """
import os
os.environ["MGTPU_PALLAS3D_GROUPED"] = "0"
os.environ["MGTPU_PALLAS3D_MIN"] = "1"      # build faces at test sizes
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from mgtpu import get_regular_mesh
from mgtpu.models.operators import nodal_laplacian_matrix
from mgtpu.ops.grid_stencil import make_grid_stencil
from mgtpu.ops.pallas.fused3d import jacobi_residual3d
n = 24
M = get_regular_mesh([0.0, 1.0] * 3, [n, n, n])
L = nodal_laplacian_matrix(M)
L = (L + 1e-4 * abs(L).sum(0).max() * sp.identity(L.shape[0])
     ).tocsr().astype(np.float32)
A = make_grid_stencil(L, [n + 1] * 3)
assert A.faces is not None
rng = np.random.RandomState(5)
x = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
b = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
os.environ["MGTPU_PALLAS3D"] = "off"
x1_ref = x + d * (b - A.matvec(x))
r1_ref = b - A.matvec(x1_ref)
x1, r1 = jacobi_residual3d(A, d, b, x, interpret=True)
assert float(jnp.abs(x1 - x1_ref).max() / jnp.abs(x1_ref).max()) < 2e-5
assert float(jnp.abs(r1 - r1_ref).max() / jnp.abs(r1_ref).max()) < 1e-4
print("PERTAP-OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PERTAP-OK" in out.stdout


@pytest.mark.slow
def test_inkernel_xband_fold_subprocess():
    """MGTPU_PALLAS3D_XBAND=fold (x-band rows computed inside the main
    kernels — no separate aliased row kernel) stays exact for matvec,
    residual, jacobi and the correction fold.  Trace-time knob, so run in
    a fresh process; non-cubic odd/even grid to catch axis mix-ups."""
    import subprocess
    import sys
    code = """
import os
os.environ["MGTPU_PALLAS3D_XBAND"] = "fold"
os.environ["MGTPU_PALLAS3D_MIN"] = "1"      # build faces at test sizes
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from mgtpu import get_regular_mesh
from mgtpu.models.operators import nodal_laplacian_matrix
from mgtpu.ops.grid_stencil import make_grid_stencil
from mgtpu.ops.pallas.fused3d import residual3d, jacobi3d, jacobi_corr3d
# second dims tuple: grid X = 25 (== 1 mod 8) puts the two hi band rows in
# DIFFERENT blocks (23 -> block 2 row 7, 24 -> block 3 row 0) at w=2
for dims in ([18, 24, 30], [30, 18, 24]):
  M = get_regular_mesh([0.0, 1.0] * 3, dims)
  L = nodal_laplacian_matrix(M)
  L = (L + 1e-4 * abs(L).sum(0).max() * sp.identity(L.shape[0])
       ).tocsr().astype(np.float32)
  A = make_grid_stencil(L, [d + 1 for d in dims])
  assert A.faces is not None
  rng = np.random.RandomState(9)
  x = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
  p = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
  b = jnp.asarray(rng.rand(2, *A.grid).astype(np.float32))
  d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
  os.environ["MGTPU_PALLAS3D"] = "off"
  y_ref = A.matvec(x)
  r_ref = b - y_ref
  xj_ref = x + d * r_ref
  s = x + p
  xc_ref = s + d * (b - A.matvec(s))
  os.environ["MGTPU_PALLAS3D"] = "interpret"
  from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
  w = A.boxes[0][1][0]     # true band width (2 for the nodal Laplacian)
  y = const3d_matvec_pallas(A.const, A.faces, A.offsets, x, w, interpret=True)
  assert float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max()) < 2e-5
  r = residual3d(A, b, x, interpret=True)
  assert float(jnp.abs(r - r_ref).max() / jnp.abs(r_ref).max()) < 2e-5
  xj = jacobi3d(A, d, b, x, interpret=True)
  assert float(jnp.abs(xj - xj_ref).max() / jnp.abs(xj_ref).max()) < 2e-5
  xc = jacobi_corr3d(A, d, b, x, p, interpret=True)
  assert float(jnp.abs(xc - xc_ref).max() / jnp.abs(xc_ref).max()) < 2e-5
print("XBANDFOLD-OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "XBANDFOLD-OK" in out.stdout


def test_compact_faces_match_general(small_kernels, monkeypatch):
    """COMPACT face form (x-invariant band coefficients -> one broadcast
    row, const3d.build_faces) vs the general per-row form: identical
    kernel outputs for a real operator.  Real operators always trigger
    compact, so this also keeps the general 5-tuple path covered
    (MGTPU_PALLAS3D_COMPACT=0 is read per build_faces call)."""
    from mgtpu.ops.grid_stencil import make_grid_stencil
    from mgtpu.ops.pallas.const3d import const3d_matvec_pallas
    from mgtpu.ops.pallas.fused3d import (jacobi_corr3d, jacobi_residual3d,
                                          residual3d)
    dims = (18, 24, 30)
    M = get_regular_mesh([0.0, 1.0] * 3, list(dims))
    L = nodal_laplacian_matrix(M)
    L = (L + 1e-4 * abs(L).sum(0).max() * sp.identity(L.shape[0])
         ).tocsr().astype(np.float32)
    Ac = make_grid_stencil(L, [d + 1 for d in dims])
    assert len(Ac.faces) == 3, "compact form should trigger for a Laplacian"
    monkeypatch.setenv("MGTPU_PALLAS3D_COMPACT", "0")
    Ag = make_grid_stencil(L, [d + 1 for d in dims])
    assert len(Ag.faces) == 5
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, *Ac.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(2, *Ac.grid).astype(np.float32))
    p = jnp.asarray(rng.rand(2, *Ac.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*Ac.grid).astype(np.float32))
    w = Ac.boxes[0][1][0]
    yc = const3d_matvec_pallas(Ac.const, Ac.faces, Ac.offsets, x, w,
                               interpret=True)
    yg = const3d_matvec_pallas(Ag.const, Ag.faces, Ag.offsets, x, w,
                               interpret=True)
    assert float(jnp.abs(yc - yg).max()) == 0.0
    # the face-form comparison is bitwise only under the SAME tap schedule:
    # compact operators carry band_meta and take the v2 (tridiag-matmul)
    # schedule, which reassociates sums — pin v1 for the bitwise checks
    monkeypatch.setenv("MGTPU_PALLAS3D_BANDV2", "0")
    assert float(jnp.abs(residual3d(Ac, b, x, interpret=True)
                         - residual3d(Ag, b, x, interpret=True)).max()) == 0.0
    assert float(jnp.abs(jacobi_corr3d(Ac, d, b, x, p, interpret=True)
                         - jacobi_corr3d(Ag, d, b, x, p,
                                         interpret=True)).max()) == 0.0
    # jacres: the compact path merges main block + halo planes into ONE
    # (B+2)-row stage-A accumulation (r4) while the general path keeps
    # three accums — different (equally valid) f32 association, so the
    # cross-form check is tight-relative, and the compact form instead
    # pins the STRONGER property: its stage A is bitwise the single-apply
    # jacobi kernel
    from mgtpu.ops.pallas.fused3d import jacobi3d
    x1c, r1c = jacobi_residual3d(Ac, d, b, x, interpret=True)
    x1g, r1g = jacobi_residual3d(Ag, d, b, x, interpret=True)
    assert float(jnp.abs(x1c - jacobi3d(Ac, d, b, x, interpret=True))
                 .max()) == 0.0
    assert float(jnp.abs(x1c - x1g).max() / jnp.abs(x1g).max()) < 1e-6
    assert float(jnp.abs(r1c - r1g).max() / jnp.abs(r1g).max()) < 2e-5
    # v2 (additive z-bands + boundary-column tridiag matmuls) vs v1:
    # same values to f32 rounding of the operator scale
    monkeypatch.delenv("MGTPU_PALLAS3D_BANDV2")
    r_v2 = residual3d(Ac, b, x, interpret=True)
    r_v1 = residual3d(Ag, b, x, interpret=True)
    scale = float(jnp.abs(r_v1).max())
    assert float(jnp.abs(r_v2 - r_v1).max()) / scale < 1e-5
    x2c, r2c = jacobi_residual3d(Ac, d, b, x, interpret=True)
    assert float(jnp.abs(x2c - x1g).max() / jnp.abs(x1g).max()) < 1e-5
    assert float(jnp.abs(r2c - r1g).max() / jnp.abs(r1g).max()) < 2e-5


def test_bx_for_rule():
    """Pin the auto-BX policy (const3d.bx_for): whole-field single step
    when the tile-padded field fits ~3 MB of VMEM, else the largest
    divisor of X in 8..3, else padded 8.  A silent rule change would
    shift which schedule every other test exercises."""
    assert c3.bx_for(19, 25, 31) == 19          # 19*32*128*4 = 311 KB
    assert c3.bx_for(33, 33, 33) == 33          # 33*40*128*4 = 675 KB
    assert c3.bx_for(65, 65, 65) == 13          # 2.3 MB whole-field >
    #   compile bound; 13*72*128*4 = 479 KB mid-size divisor block fits
    assert c3.bx_for(80, 40, 129) == 16         # 16*40*256*4 = 655 KB
    assert c3.bx_for(129, 129, 129) == 3        # no 9..16 divisor
    assert c3.bx_for(131, 129, 129) == 8        # prime -> padded fallback
    assert c3.bx_for(129) == 3                  # X-only callers: divisor


def test_multistep_path_exact(small_kernels):
    """Exactness on a shape whose padded field EXCEEDS the single-step
    VMEM bound — with bx_for's whole-field upgrade, every small-test
    shape takes the one-step schedule, so this is the only interpret
    coverage of the streamed multi-block path (halo planes, band stores
    across block boundaries)."""
    from mgtpu.ops.pallas.fused3d import jacobi_residual3d
    L, A = _op(79)                  # grid (80, 80, 80): bx 16, 5 steps
    assert c3.bx_for(*A.grid) == 16
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    b = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    d = jnp.asarray(rng.rand(*A.grid).astype(np.float32))
    os.environ["MGTPU_PALLAS3D"] = "off"     # XLA reference matvec
    x1_ref = x + d * (b - A.matvec(x))
    r1_ref = b - A.matvec(x1_ref)
    os.environ["MGTPU_PALLAS3D"] = "interpret"
    xf = np.asarray(x).reshape(-1, 1)
    y = np.asarray(A.matvec(jnp.asarray(xf)), np.float64)
    yref = L.astype(np.float64) @ xf.astype(np.float64)
    assert np.abs(y - yref).max() / np.abs(yref).max() < 2e-5
    x1, r1 = jacobi_residual3d(A, d, b, x, interpret=True)
    assert float(jnp.abs(x1 - x1_ref).max() / jnp.abs(x1_ref).max()) < 2e-5
    assert float(jnp.abs(r1 - r1_ref).max() / jnp.abs(r1_ref).max()) < 1e-4
