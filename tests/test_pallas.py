"""Pallas stencil kernel conformance (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from mgtpu import get_regular_mesh
from mgtpu.models.operators import nodal_laplacian_matrix, nodal_div_sig_grad_matrix
from mgtpu.parallel.stencil import stencil_from_banded
from mgtpu.ops.pallas.stencil_kernel import stencil_matvec_pallas


def _check(A, n_nodes, NIp):
    st = stencil_from_banded(A, n_nodes, 0.8, dtype=np.float64)
    NJ, NI = st.shape
    coeff = jnp.pad(st.coeff, ((0, 0), (0, 0), (0, NIp - NI)))
    x = np.random.rand(NJ, NI)
    xg = jnp.pad(jnp.asarray(x), ((0, 0), (0, NIp - NI)))
    y = stencil_matvec_pallas(coeff, st.di, st.dj, xg, interpret=True)
    ref = (A @ x.reshape(-1)).reshape(NJ, NI)
    np.testing.assert_allclose(np.asarray(y)[:, :NI], ref, rtol=1e-12,
                               atol=1e-12)


def test_pallas_stencil_2d_5pt():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [32, 32])
    _check(nodal_laplacian_matrix(M), [33, 33], 128)


def test_pallas_stencil_2d_variable_coeff():
    M = get_regular_mesh([0.0, 1.0, 0.0, 1.0], [24, 40])
    sig = np.exp(np.random.randn(M.num_cells))
    _check(nodal_div_sig_grad_matrix(M, sig), [25, 41], 128)


def test_pallas_stencil_3d_27pt():
    M = get_regular_mesh([0.0, 1.0] * 3, [8, 8, 8])
    sig = np.exp(np.random.randn(M.num_cells))
    A = nodal_div_sig_grad_matrix(M, sig)
    # galerkin-coarsened 27-point, grid (9,9,9): NI = 81
    _check(A, [9, 9, 9], 128)
