"""
Cylinder NCCs (parity: reference dedalus/tests/test_cylinder_ncc.py):
axisymmetric radial NCCs acting on cylinder fields — the disk/annulus radial
Clenshaw blocks kron'd across the leading Fourier axis.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu.core.coords import DirectProduct

LENGTH = 2.0


def _build(geom, dtype=np.float64, Nz=8, Nphi=8, Nr=12):
    cz = d3.Coordinate('z')
    cp = d3.PolarCoordinates('phi', 'r')
    c = DirectProduct(cz, cp)
    dist = d3.Distributor(c, dtype=dtype)
    Fourier = d3.RealFourier if dtype == np.float64 else d3.ComplexFourier
    zb = Fourier(cz, size=Nz, bounds=(0, LENGTH), dtype=dtype)
    if geom == 'disk':
        pb = d3.DiskBasis(cp, shape=(Nphi, Nr), radius=1.0, dtype=dtype)
    else:
        pb = d3.AnnulusBasis(cp, shape=(Nphi, Nr), radii=(0.5, 2.0),
                             dtype=dtype)
    return c, cz, cp, dist, zb, pb


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_cylinder_radial_ncc_scalar(geom, dtype):
    """Solve u + w0(r)*u = (1 + w0)*target on the cylinder."""
    c, cz, cp, dist, zb, pb = _build(geom, dtype)
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 2 * np.pi / LENGTH
    prof = (1 - r**2 + 0.3 * r**4) if geom == 'disk' else (0.5 * r + 0.1 * r**2)
    w0 = dist.Field(name='w0', bases=pb)
    w0['g'] = np.broadcast_to(prof, np.broadcast_shapes(phi.shape, r.shape))
    fz = np.sin(kz * z) if dtype == np.float64 else np.exp(1j * kz * z)
    target = fz * (x * y + 0.5 * x + 0.2)
    shape = np.broadcast_shapes(z.shape, phi.shape, r.shape)
    rhs = dist.Field(name='rhs', bases=(zb, pb))
    rhs['g'] = np.broadcast_to((2 + prof) * target, shape).astype(dtype)
    u = dist.Field(name='u', bases=(zb, pb))
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("2*u + w0*u = rhs")
    problem.build_solver().solve()
    u.require_coeff_space()
    u.change_scales(1)
    u.require_grid_space()
    assert np.abs(np.asarray(u.data) - np.broadcast_to(target, shape)).max() < 1e-9


@pytest.mark.parametrize('dtype', [np.float64])
def test_cylinder_ncc_poisson(dtype):
    """Variable-coefficient cylinder problem: lap(u) + w0*u = rhs."""
    c, cz, cp, dist, zb, pb = _build('disk', dtype, Nr=16)
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    kz = 2 * np.pi / LENGTH
    w0 = dist.Field(name='w0', bases=pb)
    w0['g'] = np.broadcast_to(2 + r**2, np.broadcast_shapes(phi.shape, r.shape))
    uex = np.sin(kz * z) * (1 - r**2) * np.ones_like(phi)
    shape = np.broadcast_shapes(z.shape, phi.shape, r.shape)
    rhs = dist.Field(name='rhs', bases=(zb, pb))
    rhs['g'] = np.broadcast_to(
        (-kz**2 * (1 - r**2) - 4.0 + (2 + r**2) * (1 - r**2)) * np.sin(kz * z)
        * np.ones_like(phi), shape)
    u = dist.Field(name='u', bases=(zb, pb))
    t1 = dist.Field(name='t1', bases=(zb, pb.edge))
    lift = lambda A: d3.Lift(A, pb, -1)
    problem = d3.LBVP([u, t1], namespace=locals())
    problem.add_equation("lap(u) + w0*u + lift(t1) = rhs")
    problem.add_equation("u(r=1) = 0")
    problem.build_solver().solve()
    u.require_coeff_space()
    u.change_scales(1)
    u.require_grid_space()
    assert np.abs(np.asarray(u.data) - np.broadcast_to(uex, shape)).max() < 1e-10
