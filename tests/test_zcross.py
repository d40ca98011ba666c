"""
SphericalZCross (ez x u, the Coriolis operator): subproblem matrices vs grid
evaluation, and grid evaluation vs analytic components, in ball and shell.
Reference parity: the meridional-NCC Coriolis term of
examples/evp_shell_rotating_convection (here via banded SWSH Cos/Sin ladders).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu.core.operators_ball import SphericalZCross
from dedalus_tpu.core import subsystems


def _build(geom, dtype):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    if geom == 'shell':
        basis = d3.ShellBasis(coords, (8, 6, 6), radii=(1.0, 2.0),
                              dtype=dtype, dealias=3 / 2)
    else:
        basis = d3.BallBasis(coords, (8, 6, 6), radius=1.0, dtype=dtype,
                             dealias=2)
    return coords, dist, basis


@pytest.mark.parametrize('geom', ['shell', 'ball'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_zcross_grid_values(geom, dtype):
    coords, dist, basis = _build(geom, dtype)
    phi, theta, r = dist.local_grids(basis, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    f = dist.Field(name='f', bases=basis)
    fg = x * z + 0.5 * y - 0.3 * z * z + 0.1
    if dtype == np.complex128:
        fg = fg + 1j * (y * z - 0.2 * x)
    f['g'] = np.broadcast_to(fg, np.broadcast_shapes(phi.shape, theta.shape,
                                                     r.shape))
    u = d3.grad(f).evaluate()
    w = SphericalZCross(u).evaluate()
    w.require_coeff_space()
    w.change_scales(1)
    w.require_grid_space()
    u.require_coeff_space()
    u.change_scales(1)
    u.require_grid_space()
    ug = np.asarray(u.data)
    shp = ug[0].shape
    ct = np.broadcast_to(np.cos(theta), shp)
    st = np.broadcast_to(np.sin(theta), shp)
    ex = np.stack([ct * ug[1] + st * ug[2], -ct * ug[0], -st * ug[0]])
    assert np.abs(np.asarray(w.data) - ex).max() < 1e-11


@pytest.mark.parametrize('geom', ['shell'])
def test_zcross_matrix_matches_grid(geom):
    dtype = np.complex128
    coords, dist, basis = _build(geom, dtype)
    phi, theta, r = dist.local_grids(basis, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    f = dist.Field(name='f', bases=basis)
    f['g'] = (x * z + 0.5 * y - 0.3 * z * z + 0.1) + 1j * (y * z - 0.2 * x)
    u = d3.grad(f).evaluate()
    w = SphericalZCross(u).evaluate()
    w.require_coeff_space()
    w.change_scales(1)
    ref = np.asarray(w.data)
    expr = SphericalZCross(u)
    u.require_coeff_space()
    u.change_scales(1)
    coupling = expr.matrix_coupling(u)
    domains = [expr.domain, u.domain]
    coupled, sps = subsystems.enumerate_subproblems(dist, domains,
                                                    list(coupling))
    udata = np.asarray(u.data)
    L = basis.colatitude_basis.size
    n = basis.radial_basis.size
    got = np.zeros_like(ref)
    for sp in sps:
        mats = expr.expression_matrices(sp, [u])
        A = mats[u].toarray()
        g = sp.group[0] if sp.group[0] is not None else 0
        sl = slice(2 * g, 2 * g + 2)
        pencil = udata[:, sl].ravel()
        got[:, sl] = (A @ pencil).reshape(3, 2, L, n)
    # Compare on valid (truncation-resolved) entries: the grid path dealiases
    # the ell+1 couplings while the matrix path truncates identically
    assert np.abs(got - ref).max() < 1e-12
