"""Validate shell/annulus radial operators against the reference oracle."""

import sys
import numpy as np
import pytest

sys.path.insert(0, '/root/reference/dedalus/libraries')
try:
    from dedalus_sphere import shell as ref_shell
    HAVE_ORACLE = True
except ImportError:
    HAVE_ORACLE = False

from dedalus_tpu.spectral import shell

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")

RADII = (1.0, 2.0)
ALPHA = (-0.5, -0.5)


@pytest.mark.parametrize("name", ['Z', 'R', 'AB', 'E'])
@pytest.mark.parametrize("k", [0, 1])
def test_basic_ops(name, k, n=8):
    ref = ref_shell.operator(2, RADII, name, ALPHA)(n, k).square.toarray()
    mine = shell.operator(2, RADII, name, n, k, alpha=ALPHA).toarray()
    assert np.allclose(mine, ref, atol=1e-12), f"{name} k={k}"


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("dl,l", [(+1, 0), (+1, 2), (-1, 2), (-1, 3), (+1, 5)])
@pytest.mark.parametrize("k", [0, 1])
def test_derivative_ops(dim, dl, l, k, n=8):
    ref = ref_shell.operator(dim, RADII, 'D', ALPHA)(dl, l)(n, k).square.toarray()
    mine = shell.operator(dim, RADII, 'D', n, k, alpha=ALPHA, dl=dl, l=l).toarray()
    assert np.allclose(mine, ref, atol=1e-12), f"D({dl},{l}) dim={dim} k={k}"


def test_shell_gamma_tensor_ncc():
    """Vector NCC (er, rvec) multiplication matrices match pointwise grid
    products: the Gamma intertwiner coupling (ref arithmetic.py:560-583)."""
    import dedalus_tpu.public as d3
    from dedalus_tpu.core import subsystems
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    shell = d3.ShellBasis(coords, (8, 4, 8), radii=(1, 2), dtype=np.float64)
    b = dist.Field(name='b', bases=shell)
    phi, theta, r = dist.local_grids(shell, scales=1)
    shp = np.broadcast_shapes(phi.shape, theta.shape, r.shape)
    er = dist.VectorField(coords, name='er', bases=shell)
    er.change_scales(1)
    d = np.zeros((3,) + shp)
    d[2] = r**2  # radial profile times r_hat: spherically symmetric vector
    er['g'] = d
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    b.change_scales(1)
    b['g'] = x * z + 0.5 * z
    # Pointwise product
    prod = (er * b).evaluate()
    prod.require_coeff_space()
    prod.change_scales(1)
    ref = np.asarray(prod.data)
    # Matrix product per subproblem
    expr = er * b
    problem = d3.LBVP([b], namespace=locals())
    coupling = expr.matrix_coupling(b)
    domains = [expr.domain, b.domain]
    coupled, sps = subsystems.enumerate_subproblems(dist, domains,
                                                    [True] * 0 + list(coupling))
    b.require_coeff_space()
    b.change_scales(1)
    bdata = np.asarray(b.data).ravel()
    got = np.zeros_like(ref)
    L = shell.colatitude_basis.size
    n = shell.radial_basis.size
    for sp in sps:
        mats = expr.expression_matrices(sp, [b])
        M = mats[b].toarray()
        # operand pencil: scalar b at group m
        gslice_az = sp.group_slice(shell.azimuth_basis, 0)
        bp = np.asarray(b.data)[gslice_az].ravel()
        out = (M @ bp).reshape((3, -1) + (L, n))
        got[:, gslice_az, :, :] = out.reshape(3, -1, L, n)
    assert np.abs(got - ref).max() < 1e-12 * max(1, np.abs(ref).max())
