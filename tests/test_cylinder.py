"""
Cylinder geometry: DirectProduct(Coordinate, PolarCoordinates) over
Fourier x (Disk | Annulus) bases.

Mirrors the reference's dedalus/tests/test_cylinder_calculus.py /
test_cylinder_operators.py coverage shape: gradient/divergence/laplacian
against analytic expressions, div(grad) == lap consistency, and an LBVP
solve coupling the Fourier axis with per-m disk pencils (reference
coords.py:99 DirectProduct, operators.py:2414,3497).

Complex dtype uses the signed (+m, -m) exponential-pair azimuth convention
(ExponentialAzimuthBasis) so spin-weighted radial families are correct for
both signed wavenumbers.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu.core.coords import DirectProduct

LENGTH = 1.88


def _build(geom, dtype, Nz=8, Nphi=16, Nr=8):
    cz = d3.Coordinate('z')
    cp = d3.PolarCoordinates('phi', 'r')
    c = DirectProduct(cz, cp)
    dist = d3.Distributor(c, dtype=dtype)
    Fourier = d3.RealFourier if dtype == np.float64 else d3.ComplexFourier
    zb = Fourier(cz, size=Nz, bounds=(0, LENGTH), dtype=dtype)
    if geom == 'disk':
        pb = d3.DiskBasis(cp, shape=(Nphi, Nr), radius=1.5, dtype=dtype)
    else:
        pb = d3.AnnulusBasis(cp, shape=(Nphi, Nr), radii=(0.5, 3.0), dtype=dtype)
    return c, cz, cp, dist, zb, pb


def _fz(z, kz, dtype):
    if dtype == np.complex128:
        return np.exp(1j * kz * z)
    return np.sin(kz * z)


def _dfz(z, kz, dtype):
    if dtype == np.complex128:
        return 1j * kz * np.exp(1j * kz * z)
    return kz * np.cos(kz * z)


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.float64])
def test_cylinder_gradient_scalar(geom, dtype):
    c, cz, cp, dist, zb, pb = _build(geom, dtype)
    f = dist.Field(name='f', bases=(zb, pb))
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 4 * np.pi / LENGTH
    fz = _fz(z, kz, dtype)
    f['g'] = fz * (x**2 - 2 * x * y + 0.5)
    u = d3.grad(f).evaluate()
    u.require_grid_space()
    u.change_scales(1)
    ug = np.asarray(u.data)
    dfdx = fz * (2 * x - 2 * y)
    dfdy = fz * (-2 * x)
    shape = ug[0].shape
    ex = np.stack([
        np.broadcast_to(_dfz(z, kz, dtype) * (x**2 - 2 * x * y + 0.5), shape),
        np.broadcast_to(-np.sin(phi) * dfdx + np.cos(phi) * dfdy, shape),
        np.broadcast_to(np.cos(phi) * dfdx + np.sin(phi) * dfdy, shape)])
    assert np.abs(ug - ex).max() < 1e-10


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_cylinder_laplacian_scalar(geom, dtype):
    c, cz, cp, dist, zb, pb = _build(geom, dtype)
    f = dist.Field(name='f', bases=(zb, pb))
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 4 * np.pi / LENGTH
    fz = _fz(z, kz, dtype)
    f['g'] = fz * (x**2 - 2 * x * y + 0.5)
    g = d3.lap(f).evaluate()
    g.require_grid_space()
    g.change_scales(1)
    kz2 = -(kz**2)
    ex = kz2 * fz * (x**2 - 2 * x * y + 0.5) + fz * 2.0
    assert np.abs(np.asarray(g.data) - ex).max() < 1e-9


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_cylinder_div_grad_consistency(geom, dtype):
    c, cz, cp, dist, zb, pb = _build(geom, dtype)
    f = dist.Field(name='f', bases=(zb, pb))
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 2 * np.pi / LENGTH
    f['g'] = _fz(z, kz, dtype) * (x * y + 0.3 * y + 1.0)
    dg = d3.div(d3.grad(f)).evaluate()
    lp = d3.lap(f).evaluate()
    dg.require_coeff_space()
    lp.require_coeff_space()
    assert np.abs(np.asarray(dg.data) - np.asarray(lp.data)).max() < 1e-11


@pytest.mark.parametrize('dtype', [np.float64])
def test_cylinder_divergence_vector(dtype):
    """Divergence of a directly-constructed DP vector field."""
    c, cz, cp, dist, zb, pb = _build('disk', dtype)
    v = dist.VectorField(c, name='v', bases=(zb, pb))
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 2 * np.pi / LENGTH
    shape = np.broadcast_shapes(z.shape, phi.shape, r.shape)
    # v = (sin(kz z) * x, 0, 0) in (z, phi, r) components is awkward; use
    # v_z = sin(kz z) x, polar part = grad2d(x y) (grid components)
    vz = np.sin(kz * z) * x
    gphi = -np.sin(phi) * y + np.cos(phi) * x     # d(xy)/dphi / r
    gr = np.cos(phi) * y + np.sin(phi) * x        # d(xy)/dr
    v['g'] = np.stack([np.broadcast_to(vz, shape),
                       np.broadcast_to(gphi, shape),
                       np.broadcast_to(gr, shape)])
    dv = d3.div(v).evaluate()
    dv.require_grid_space()
    dv.change_scales(1)
    # div = dz(vz) + lap2d(x y) = kz cos(kz z) x + 0
    ex = kz * np.cos(kz * z) * x * np.ones(shape[:1] + (1, 1))
    assert np.abs(np.asarray(dv.data) - np.broadcast_to(ex, shape)).max() < 1e-10


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
def test_cylinder_poisson_lbvp(geom):
    """3D cylinder Poisson solve: per-(kz, m) pencils with disk/annulus taus."""
    dtype = np.float64
    c, cz, cp, dist, zb, pb = _build(geom, dtype, Nr=16)
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    kz = 2 * np.pi / LENGTH
    u = dist.Field(name='u', bases=(zb, pb))
    rhs = dist.Field(name='rhs', bases=(zb, pb))
    ns = dict(locals())
    if geom == 'disk':
        R = 1.5
        uex = np.sin(kz * z) * (R**2 - r**2) * np.ones_like(phi)
        rhs['g'] = (-kz**2 * np.sin(kz * z) * (R**2 - r**2) - 4.0 * np.sin(kz * z)) \
            * np.ones_like(phi)
        taus = [dist.Field(name='t1', bases=(zb, pb.edge))]
        ns['lift'] = lambda A: d3.Lift(A, pb, -1)
        eq = "lap(u) + lift(t1) = rhs"
        bcs = [f"u(r={R}) = 0"]
    else:
        Ri, Ro = 0.5, 3.0
        uex = np.sin(kz * z) * (r - Ri) * (Ro - r) * np.ones_like(phi)
        # lap2d of radial-only g(r): g'' + g'/r
        g1 = (Ri + Ro) - 2 * r
        g2 = -2.0
        rhs['g'] = (-kz**2 * np.sin(kz * z) * (r - Ri) * (Ro - r)
                    + np.sin(kz * z) * (g2 + g1 / r)) * np.ones_like(phi)
        taus = [dist.Field(name='t1', bases=(zb, pb.S1_basis())),
                dist.Field(name='t2', bases=(zb, pb.S1_basis()))]
        ns['lift'] = lambda A, i: d3.Lift(A, pb, i)
        eq = "lap(u) + lift(t1, -1) + lift(t2, -2) = rhs"
        bcs = [f"u(r={Ri}) = 0", f"u(r={Ro}) = 0"]
    ns.update({t.name: t for t in taus})
    problem = d3.LBVP([u] + taus, namespace=ns)
    problem.add_equation(eq)
    for bc in bcs:
        problem.add_equation(bc)
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    # The annulus RHS carries a 1/r factor (finite Chebyshev convergence)
    tol = 1e-10 if geom == 'disk' else 1e-7
    assert np.abs(np.asarray(u.data) - uex).max() < tol


@pytest.mark.parametrize('geom', ['disk', 'annulus'])
@pytest.mark.parametrize('dtype', [np.complex128])
def test_cylinder_gradient_scalar_complex(geom, dtype):
    """Complex dtype uses signed (+m, -m) azimuth pairs so spin-weighted
    radial families are correct per signed wavenumber."""
    test_cylinder_gradient_scalar(geom, dtype)


def test_directproduct_metadata():
    cz = d3.Coordinate('z')
    cp = d3.PolarCoordinates('phi', 'r')
    c = DirectProduct(cz, cp)
    assert c.dim == 3
    assert c.names == ('z', 'phi', 'r')
    assert c.sub_slice(cp) == slice(1, 3)
    assert c.spintotal((c,), (0,)) == 0
    assert c.spintotal((c,), (1,)) == -1
    assert c.spintotal((c,), (2,)) == +1
    assert not c.right_handed


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_cylinder_curl(dtype):
    """DP curl: curl(grad f) == 0 and curl of an axial field vs analytic."""
    c, cz, cp, dist, zb, pb = _build('disk', dtype, Nz=12, Nphi=16, Nr=10)
    z = dist.local_grid(zb, scale=1)
    phi, r = dist.local_grids(pb, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    kz = 2 * np.pi / LENGTH
    fz = _fz(z, kz, dtype)
    f = dist.Field(name='f', bases=(zb, pb))
    f['g'] = fz * (x * x - y + 0.3 * x * y)
    w = d3.curl(d3.grad(f)).evaluate()
    w.require_coeff_space()
    assert np.abs(np.asarray(w.data)).max() < 1e-12
    # Axial field u = fz * x * ez: curl = ((1/r) dphi u_z, -dr u_z) in (phi,r)
    u2 = dist.VectorField(c, name='u2', bases=(zb, pb))
    shape = np.broadcast_shapes(z.shape, phi.shape, r.shape)
    u2['g'] = np.stack([np.broadcast_to(fz * x, shape),
                        np.zeros(shape), np.zeros(shape)]).astype(dtype)
    w2 = d3.curl(u2).evaluate()
    w2.require_coeff_space()
    w2.change_scales(1)
    w2.require_grid_space()
    ex = np.stack([np.zeros(shape),
                   np.broadcast_to(-fz * np.cos(phi), shape),
                   np.broadcast_to(-fz * np.sin(phi), shape)])
    assert np.abs(np.asarray(w2.data) - ex).max() < 1e-11
