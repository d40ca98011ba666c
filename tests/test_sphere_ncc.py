"""
S2 sphere NCC products (parity: reference dedalus/tests/test_sphere_ncc.py):
cos(theta) multiplication via the MulCosine banded ladder on the LHS against
pseudospectral products, for scalars and spin vectors, both dtypes.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def _build(dtype, Nphi=12, Ntheta=8):
    c2 = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(c2, dtype=dtype)
    sb = d3.SphereBasis(c2, (Nphi, Ntheta), radius=1.0, dtype=dtype,
                        dealias=3 / 2)
    return c2, dist, sb


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_mulcos_scalar_lbvp(dtype):
    """(2 + cos(theta)) u = rhs solved with MulCosine on the LHS."""
    c2, dist, sb = _build(dtype)
    phi, theta = dist.local_grids(sb, scales=1)
    x = np.sin(theta) * np.cos(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(theta) * np.ones_like(phi)
    target = (0.3 + x * z + 0.5 * y).astype(dtype)
    if dtype == np.complex128:
        target = target + 1j * (y * z - 0.1 * x)
    rhs = dist.Field(name='rhs', bases=sb)
    rhs['g'] = (2 + z) * target
    u = dist.Field(name='u', bases=sb)
    ns = dict(locals())
    ns['mulcos'] = lambda A: d3.MulCosine(A)
    problem = d3.LBVP([u], namespace=ns)
    problem.add_equation("2*u + mulcos(u) = rhs")
    problem.build_solver().solve()
    u.require_coeff_space()
    u.change_scales(1)
    u.require_grid_space()
    assert np.abs(np.asarray(u.data) - target).max() < 1e-11


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_mulcos_matches_pseudospectral(dtype):
    """MulCosine eager evaluation == grid-space cos(theta) product."""
    c2, dist, sb = _build(dtype)
    phi, theta = dist.local_grids(sb, scales=1)
    x = np.sin(theta) * np.cos(phi)
    z = np.cos(theta) * np.ones_like(phi)
    f = dist.Field(name='f', bases=sb)
    fg = (x * z + 0.2).astype(dtype)
    if dtype == np.complex128:
        fg = fg + 1j * x
    f['g'] = fg
    w = d3.MulCosine(f).evaluate()
    w.require_coeff_space()
    w.change_scales(1)
    w.require_grid_space()
    assert np.abs(np.asarray(w.data) - z * fg).max() < 1e-12


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_mulcos_vector(dtype):
    """MulCosine on a spin vector: per-spin ladders."""
    c2, dist, sb = _build(dtype)
    phi, theta = dist.local_grids(sb, scales=1)
    x = np.sin(theta) * np.cos(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(theta) * np.ones_like(phi)
    f = dist.Field(name='f', bases=sb)
    fg = (x * z + 0.5 * y).astype(dtype)
    if dtype == np.complex128:
        fg = fg + 1j * (y * z)
    f['g'] = fg
    u = d3.Gradient(f, c2).evaluate()
    w = d3.MulCosine(u).evaluate()
    for fld in (u, w):
        fld.require_coeff_space()
        fld.change_scales(1)
        fld.require_grid_space()
    expect = np.broadcast_to(z, np.asarray(u.data).shape) * np.asarray(u.data)
    assert np.abs(np.asarray(w.data) - expect).max() < 1e-11
