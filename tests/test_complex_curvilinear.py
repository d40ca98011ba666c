"""
Complex-dtype curvilinear correctness: signed (+m, -m) azimuth pairs.

With real-pair storage, the -m part of a spin-weighted component lands in
the wrong radial/colatitude family; these tests pin the ExponentialAzimuth
convention's grid-value correctness for gradients (the quantity that broke)
across disk, annulus, S2 sphere, ball, and shell. Reference parity:
dedalus's complex transforms use a plain ComplexFourier azimuth
(transforms.py:161); the signed-pair layout here is its batching-friendly
equivalent.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def test_disk_complex_gradient():
    cp = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(cp, dtype=np.complex128)
    disk = d3.DiskBasis(cp, shape=(16, 8), radius=1.5, dtype=np.complex128)
    f = dist.Field(name='f', bases=disk)
    phi, r = dist.local_grids(disk, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    fg = (x**2 - 2 * x * y + 0.5) + 1j * (x * y - 0.3 * y)
    f['g'] = fg
    g = d3.Gradient(f, cp).evaluate()
    g.require_grid_space()
    g.change_scales(1)
    gg = np.asarray(g.data)
    dfdx = (2 * x - 2 * y) + 1j * y
    dfdy = (-2 * x) + 1j * (x - 0.3)
    dphi = -np.sin(phi) * dfdx + np.cos(phi) * dfdy
    dr = np.cos(phi) * dfdx + np.sin(phi) * dfdy
    assert np.abs(gg[0] - dphi).max() < 1e-11
    assert np.abs(gg[1] - dr).max() < 1e-11


def test_annulus_complex_gradient():
    cp = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(cp, dtype=np.complex128)
    ann = d3.AnnulusBasis(cp, shape=(16, 12), radii=(0.5, 3.0),
                          dtype=np.complex128)
    f = dist.Field(name='f', bases=ann)
    phi, r = dist.local_grids(ann, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    fg = (x**2 - 2 * x * y + 0.5) + 1j * (x * y - 0.3 * y)
    f['g'] = fg
    g = d3.Gradient(f, cp).evaluate()
    g.require_grid_space()
    g.change_scales(1)
    gg = np.asarray(g.data)
    dfdx = (2 * x - 2 * y) + 1j * y
    dfdy = (-2 * x) + 1j * (x - 0.3)
    dphi = -np.sin(phi) * dfdx + np.cos(phi) * dfdy
    dr = np.cos(phi) * dfdx + np.sin(phi) * dfdy
    assert np.abs(gg[0] - dphi).max() < 1e-11
    assert np.abs(gg[1] - dr).max() < 1e-11


def test_sphere_complex_gradient():
    c2 = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(c2, dtype=np.complex128)
    sph = d3.SphereBasis(c2, (16, 8), radius=1.0, dtype=np.complex128)
    f = dist.Field(name='f', bases=sph)
    phi, theta = dist.local_grids(sph, scales=1)
    ct, st = np.cos(theta), np.sin(theta)
    cp_, sp = np.cos(phi), np.sin(phi)
    f['g'] = (st * cp_ * ct + 0.5 * st * sp + 0.2) \
        + 1j * (st * sp * ct - 0.1 * st * cp_)
    g = d3.Gradient(f, c2).evaluate()
    g.require_grid_space()
    g.change_scales(1)
    gg = np.asarray(g.data)
    d_phi = (-st * sp * ct + 0.5 * st * cp_) + 1j * (st * cp_ * ct + 0.1 * st * sp)
    d_theta = (ct * cp_ * ct - st * cp_ * st + 0.5 * ct * sp) \
        + 1j * (ct * sp * ct - st * sp * st - 0.1 * ct * cp_)
    assert np.abs(gg[0] - d_phi / st).max() < 1e-12
    assert np.abs(gg[1] - d_theta).max() < 1e-12


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_spherical_complex_gradient(geom):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.complex128)
    if geom == 'ball':
        b3 = d3.BallBasis(coords, (8, 4, 8), radius=1.0, dtype=np.complex128,
                          dealias=2)
    else:
        b3 = d3.ShellBasis(coords, (8, 4, 8), radii=(1.0, 2.0),
                           dtype=np.complex128, dealias=1.5)
    f = dist.Field(name='f', bases=b3)
    phi, theta, r = dist.local_grids(b3, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    f['g'] = (x * z + 0.5 * y + 0.2) + 1j * (y * z - 0.1 * x)
    g = d3.grad(f).evaluate()
    g.require_grid_space()
    g.change_scales(1)
    gg = np.asarray(g.data)
    ct, st = np.cos(theta), np.sin(theta)
    cp_, sp = np.cos(phi), np.sin(phi)
    gx = z - 0.1j
    gy = 0.5 + 1j * z
    gz = x + 1j * y
    e_phi = -sp * gx + cp_ * gy
    e_theta = ct * cp_ * gx + ct * sp * gy - st * gz
    e_r = st * cp_ * gx + st * sp * gy + ct * gz
    shp = gg[0].shape
    assert np.abs(gg[0] - np.broadcast_to(e_phi, shp)).max() < 1e-11
    assert np.abs(gg[1] - np.broadcast_to(e_theta, shp)).max() < 1e-11
    assert np.abs(gg[2] - np.broadcast_to(e_r, shp)).max() < 1e-11


def test_disk_complex_vector_roundtrip():
    """Coefficient <-> grid roundtrip of a complex spin vector."""
    cp = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(cp, dtype=np.complex128)
    disk = d3.DiskBasis(cp, shape=(16, 8), radius=1.0, dtype=np.complex128)
    phi, r = dist.local_grids(disk, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    f = dist.Field(name='f', bases=disk)
    f['g'] = (x**2 * y + 0.5 * x - y**3) + 1j * (x * y + 0.2 * y)
    v = d3.Gradient(f, cp).evaluate()
    v.require_coeff_space()
    v.require_grid_space()
    v.change_scales(1)
    d0 = np.array(v.data)
    v.require_coeff_space()
    v.require_grid_space()
    assert np.abs(np.asarray(v.data) - d0).max() < 1e-13


def test_complex_skew_matches_eager():
    """SpinSkew matrix path (diag(-s i) on signed pairs) matches operate."""
    cp = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(cp, dtype=np.complex128)
    disk = d3.DiskBasis(cp, shape=(8, 8), radius=1.0, dtype=np.complex128)
    phi, r = dist.local_grids(disk, scales=1)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    f = dist.Field(name='f', bases=disk)
    f['g'] = (x * y + 0.3 * x) + 1j * (x - y**2)
    u = d3.Gradient(f, cp).evaluate()
    w_eager = d3.Skew(u).evaluate()
    w_eager.require_grid_space()
    w_eager.change_scales(1)
    # Grid-space check: skew rotates (u_phi, u_r) -> (-u_r, u_phi)
    u.require_grid_space()
    u.change_scales(1)
    ug = np.asarray(u.data)
    expect = np.stack([-ug[1], ug[0]])
    assert np.abs(np.asarray(w_eager.data) - expect).max() < 1e-12
