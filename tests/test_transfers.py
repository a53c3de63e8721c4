"""Transfer operators: interpolation exactness and shapes."""
import numpy as np

from mgtpu.setup import transfers as tr


def test_fw_interp_1d_odd():
    P, nc = tr.fw_interp_1d(9)
    assert nc == 5
    # linear functions are reproduced in the interior
    xc = np.linspace(0, 1, 5)
    xf = P @ xc
    np.testing.assert_allclose(xf, np.linspace(0, 1, 9), atol=1e-14)


def test_fw_interp_1d_small_identity():
    P, nc = tr.fw_interp_1d(2)
    assert nc == 2 and np.abs(P.toarray() - np.eye(2)).max() == 0


def test_fw_interp_2d_shapes():
    P, nc = tr.fw_interp([129, 129])
    assert P.shape == (129 * 129, 65 * 65)
    np.testing.assert_array_equal(nc, [65, 65])
    # rows sum to 1 where coarse grid covers (partition of unity on nodes)
    rs = np.asarray(P.sum(axis=1)).ravel()
    np.testing.assert_allclose(rs, 1.0, atol=1e-14)


def test_systems_faces_shapes_2d():
    n = [16, 16]
    P, R, nc = tr.linear_operators_systems_faces(n, with_cells_block=False)
    nf = 17 * 16 + 16 * 17
    nfc = 9 * 8 + 8 * 9
    assert P.shape == (nf, nfc)
    assert R.shape == (nfc, nf)
    np.testing.assert_array_equal(nc, [8, 8])


def test_systems_faces_mixed_2d():
    n = [16, 16]
    P, R, nc = tr.linear_operators_systems_faces(n, with_cells_block=True)
    nf = 17 * 16 + 16 * 17 + 256
    nfc = 9 * 8 + 8 * 9 + 64
    assert P.shape == (nf, nfc)
    assert R.shape == (nfc, nf)


def test_systems_faces_3d():
    n = [8, 8, 8]
    P, R, nc = tr.linear_operators_systems_faces(n, with_cells_block=True)
    nf = 9 * 64 * 3 + 512
    nfc = 5 * 16 * 3 + 64
    assert P.shape == (nf, nfc)
    assert R.shape == (nfc, nf)


def test_injection_operators():
    n = [16, 16]
    Rinj = tr.injection_operators_systems_faces(n, with_cells_block=False)
    assert Rinj.shape == (9 * 8 + 8 * 9, 17 * 16 + 16 * 17)


def test_prolongation_cells_linear_exact():
    P, nc = tr.prolongation_cells_1d(16)
    assert nc == 8
    xc = (np.arange(8) + 0.5) / 8.0
    xf = (np.arange(16) + 0.5) / 16.0
    err = P @ xc - xf
    # exact in the interior, clamped at the two boundary cells
    assert np.abs(err[2:-2]).max() < 1e-14


def test_restrict_cell_centered_variables():
    rho = np.arange(16.0)
    rc = tr.restrict_cell_centered_variables(rho, [4, 4])
    # wait: n=[4,4] has cells < coarsening threshold -> identity
    assert rc.size in (4, 16)


def test_restrict_cell_centered_variables_large():
    n = [16, 16]
    rho = np.ones(256)
    rc = tr.restrict_cell_centered_variables(rho, n)
    assert rc.size == 64
    np.testing.assert_allclose(rc, 1.0, atol=1e-14)


def test_restrict_nodal_variables():
    """Nodal coefficient coarsening (reference restrictNodalVariables,
    GeometricTransferOperators.jl:61-66: 0.5^dim * P' rho).  Interior coarse
    nodes average to the exact constant/linear value; boundary rows carry the
    reference's truncated full-weighting sums (0.75 edge, 0.5625 corner)."""
    n_nodes = [9, 9]
    rho = np.ones(int(np.prod(n_nodes)))
    rc = np.asarray(tr.restrict_nodal_variables(rho, n_nodes)).reshape(5, 5,
                                                                       order="F")
    np.testing.assert_allclose(rc[1:-1, 1:-1], 1.0, rtol=1e-12)
    np.testing.assert_allclose(rc[0, 1:-1], 0.75, rtol=1e-12)   # edges
    np.testing.assert_allclose(rc[0, 0], 0.5625, rtol=1e-12)    # corner
    # linear fields restrict to the same linear field at interior nodes
    x = np.linspace(0.0, 1.0, 9)
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = (2 * X + 3 * Y).reshape(-1, order="F")
    fc = np.asarray(tr.restrict_nodal_variables(f, n_nodes)).reshape(
        5, 5, order="F")
    xc = np.linspace(0.0, 1.0, 5)
    Xc, Yc = np.meshgrid(xc, xc, indexing="ij")
    ref = 2 * Xc + 3 * Yc
    np.testing.assert_allclose(fc[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-10)
