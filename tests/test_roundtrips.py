"""
Transform round-trips parametrized over basis x dtype x dealias x rank,
mirroring the density of the reference's dedalus/tests/test_transforms.py
(grid->coeff->grid identity for band-limited data on every basis).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def _roundtrip(field, data, tol=1e-12):
    field['g'] = data
    field.require_coeff_space()
    field.require_grid_space()
    assert np.abs(np.asarray(field.data) - data).max() < tol


@pytest.mark.parametrize('basis_name', ['ChebyshevT', 'ChebyshevU', 'Legendre'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
@pytest.mark.parametrize('dealias', [1, 3 / 2])
def test_jacobi_roundtrip(basis_name, dtype, dealias):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    xb = getattr(d3, basis_name)(c, size=16, bounds=(0, 2), dealias=dealias,
                                 dtype=dtype)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    _roundtrip(f, (0.3 + x - 0.5 * x**3 + 0.01 * x**7).astype(dtype))


@pytest.mark.parametrize('cls', ['RealFourier', 'ComplexFourier'])
@pytest.mark.parametrize('dealias', [1, 3 / 2])
def test_fourier_roundtrip(cls, dealias):
    dtype = np.float64 if cls == 'RealFourier' else np.complex128
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    xb = getattr(d3, cls)(c, size=16, bounds=(0, 2 * np.pi), dealias=dealias,
                          dtype=dtype)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    data = np.cos(3 * x) + 0.5 * np.sin(x)
    if dtype == np.complex128:
        data = data + 1j * np.sin(2 * x)
    _roundtrip(f, data.astype(dtype))


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
@pytest.mark.parametrize('dealias', [1, 3 / 2])
@pytest.mark.parametrize('rank', [0, 1])
def test_polar_roundtrip(geom, dtype, dealias, rank):
    cp = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(cp, dtype=dtype)
    if geom == 'disk':
        pb = d3.DiskBasis(cp, shape=(12, 8), radius=1.0, dealias=dealias,
                          dtype=dtype)
    else:
        pb = d3.AnnulusBasis(cp, shape=(12, 8), radii=(1, 2), dealias=dealias,
                             dtype=dtype)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    fg = (1 + x * y + 0.2 * x).astype(dtype)
    if dtype == np.complex128:
        fg = fg + 1j * (y - 0.5 * x * x)
    if rank == 0:
        f = dist.Field(name='f', bases=pb)
        _roundtrip(f, fg)
    else:
        fsc = dist.Field(name='fsc', bases=pb)
        fsc['g'] = fg
        v = d3.Gradient(fsc, cp).evaluate()
        v.require_grid_space()
        v.change_scales(1)
        d0 = np.array(v.data)
        v.require_coeff_space()
        v.require_grid_space()
        assert np.abs(np.asarray(v.data) - d0).max() < 1e-12


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
@pytest.mark.parametrize('dealias', [1, 3 / 2])
@pytest.mark.parametrize('rank', [0, 1])
def test_sphere_roundtrip(dtype, dealias, rank):
    c2 = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(c2, dtype=dtype)
    sb = d3.SphereBasis(c2, (12, 6), radius=1.0, dealias=dealias, dtype=dtype)
    phi, theta = dist.local_grids(sb, scales=1)
    x = np.sin(theta) * np.cos(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(theta) * np.ones_like(phi)
    fg = (0.5 + x * z + 0.3 * y).astype(dtype)
    if dtype == np.complex128:
        fg = fg + 1j * (y * z - 0.2 * x)
    if rank == 0:
        f = dist.Field(name='f', bases=sb)
        _roundtrip(f, fg)
    else:
        fsc = dist.Field(name='fsc', bases=sb)
        fsc['g'] = fg
        v = d3.Gradient(fsc, c2).evaluate()
        v.require_grid_space()
        v.change_scales(1)
        d0 = np.array(v.data)
        v.require_coeff_space()
        v.require_grid_space()
        assert np.abs(np.asarray(v.data) - d0).max() < 1e-11


@pytest.mark.parametrize('geom', ['ball', 'shell'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
@pytest.mark.parametrize('rank', [0, 1])
def test_spherical3d_roundtrip(geom, dtype, rank):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    if geom == 'ball':
        b3 = d3.BallBasis(coords, (8, 4, 8), radius=1.0, dtype=dtype, dealias=2)
    else:
        b3 = d3.ShellBasis(coords, (8, 4, 8), radii=(1, 2), dtype=dtype,
                           dealias=3 / 2)
    phi, theta, r = dist.local_grids(b3, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    fg = (0.1 + x * z + 0.5 * y - 0.3 * z * z).astype(dtype)
    if dtype == np.complex128:
        fg = fg + 1j * (y * z - 0.1 * x)
    fg = np.broadcast_to(fg, np.broadcast_shapes(phi.shape, theta.shape, r.shape))
    if rank == 0:
        f = dist.Field(name='f', bases=b3)
        _roundtrip(f, fg)
    else:
        fsc = dist.Field(name='fsc', bases=b3)
        fsc['g'] = fg
        v = d3.grad(fsc).evaluate()
        v.require_grid_space()
        v.change_scales(1)
        d0 = np.array(v.data)
        v.require_coeff_space()
        v.require_grid_space()
        assert np.abs(np.asarray(v.data) - d0).max() < 1e-11


@pytest.mark.parametrize('scale_pair', [(1, 3 / 2), (3 / 2, 1), (1, 2)])
def test_change_scales_pad_truncate(scale_pair):
    """Scale changes pad/truncate coefficients without altering resolved data."""
    s1, s2 = scale_pair
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=16, bounds=(-1, 1), dealias=2)
    f = dist.Field(name='f', bases=xb)
    f.change_scales(s1)
    x1 = dist.local_grid(xb, scale=s1).ravel()
    f['g'] = x1**3 - 0.5 * x1
    f.require_coeff_space()
    c0 = np.array(f.data)
    f.change_scales(s2)
    f.require_grid_space()
    x2 = dist.local_grid(xb, scale=s2).ravel()
    assert np.abs(np.asarray(f.data).ravel() - (x2**3 - 0.5 * x2)).max() < 1e-13
    f.require_coeff_space()
    assert np.abs(np.asarray(f.data) - c0).max() < 1e-13
