"""
Disk basis tests: per-m Zernike transforms, polar calculus with regularity at
the origin, and full solves (mirrors dedalus/tests disk suites).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


@pytest.fixture(scope='module')
def disk():
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.DiskBasis(coords, shape=(16, 16), radius=1, dealias=(1.5, 1.5))
    phi, r = basis.global_grids(scales=(1, 1))
    return coords, dist, basis, phi.reshape(-1, 1), r.reshape(1, -1)


def grid1(expr):
    f = expr.evaluate()
    f.change_scales(1)
    f.require_grid_space()
    return np.array(f.data)


def test_disk_scalar_roundtrip(disk):
    coords, dist, basis, phi, r = disk
    f = dist.Field(name='f', bases=basis)
    fg = r**3 * np.cos(3 * phi) + (1 - r**2)
    f['g'] = fg
    np.array(f['c'])
    assert np.abs(np.array(f['g']) - fg).max() < 1e-12


def test_disk_gradient(disk):
    coords, dist, basis, phi, r = disk
    f = dist.Field(name='f', bases=basis)
    f['g'] = r**3 * np.cos(3 * phi)
    gd = grid1(d3.grad(f))
    assert np.abs(gd[0] + 3 * r**2 * np.sin(3 * phi)).max() < 1e-11
    assert np.abs(gd[1] - 3 * r**2 * np.cos(3 * phi)).max() < 1e-11


def test_disk_laplacian(disk):
    coords, dist, basis, phi, r = disk
    f = dist.Field(name='f', bases=basis)
    f['g'] = r**3 * np.cos(3 * phi)      # harmonic
    assert np.abs(grid1(d3.lap(f))).max() < 1e-10
    f2 = dist.Field(name='f2', bases=basis)
    f2['g'] = r**5 * np.cos(3 * phi)
    assert np.abs(grid1(d3.lap(f2)) - 16 * r**3 * np.cos(3 * phi)).max() < 1e-9
    assert np.abs(grid1(d3.div(d3.grad(f2))) - grid1(d3.lap(f2))).max() < 1e-10


def test_disk_vector_roundtrip(disk):
    coords, dist, basis, phi, r = disk
    u = dist.VectorField(coords, name='u', bases=basis)
    ud = np.zeros((2, 16, 16))
    # Vector components of a smooth vector field: grad of r^3 cos(3 phi)
    ud[0] = -3 * r**2 * np.sin(3 * phi)
    ud[1] = 3 * r**2 * np.cos(3 * phi)
    u['g'] = ud
    np.array(u['c'])
    assert np.abs(np.array(u['g']) - ud).max() < 1e-11


def test_disk_poisson_lbvp(disk):
    coords, dist, basis, phi, r = disk
    u = dist.Field(name='u', bases=basis)
    tau = dist.Field(name='tau', bases=basis.edge)
    uex = dist.Field(name='uex', bases=basis)
    uex['g'] = (1 - r**2) * r**3 * np.cos(3 * phi)
    F_field = d3.lap(uex).evaluate()
    F_field.name = 'F_field'
    lift = lambda A: d3.Lift(A, basis, -1)
    problem = d3.LBVP([u, tau], namespace=locals())
    problem.add_equation("lap(u) + lift(tau) = F_field")
    problem.add_equation("u(r=1) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - np.array(uex['g', 1])).max() < 1e-10


def test_disk_vector_diffusion_smoke(disk):
    # Incompressible-style vector diffusion with no-slip edge (libration-like)
    coords, dist, basis, phi, r = disk
    u = dist.VectorField(coords, name='u', bases=basis)
    tau_u = dist.VectorField(coords, name='tau_u', bases=basis.edge)
    lift = lambda A: d3.Lift(A, basis, -1)
    problem = d3.IVP([u, tau_u], namespace=locals())
    problem.add_equation("dt(u) - lap(u) + lift(tau_u) = 0")
    problem.add_equation("u(r=1) = 0")
    solver = problem.build_solver(d3.SBDF2)
    ud = np.zeros((2, 16, 16))
    ud[0] = -3 * r**2 * (1 - r**2) * np.sin(3 * phi)
    ud[1] = 3 * r**2 * (1 - r**2) * np.cos(3 * phi)
    u['g'] = ud
    e0 = float(np.abs(np.array(u['g'])).max())
    for _ in range(20):
        solver.step(1e-3)
    u.change_scales(1)
    ug = np.array(u['g'])
    assert np.isfinite(ug).all()
    assert np.abs(ug).max() < e0
    bb = u(r=1).evaluate()
    bb.change_scales(1)
    assert np.abs(np.array(bb.data)).max() < 1e-8


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_disk_scalar_ncc_lhs(dtype):
    """Axisymmetric scalar NCC on the LHS: solve (1 + w0)*u = rhs
    (parity: reference basis.py:2554 disk NCC matrices)."""
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    disk = d3.DiskBasis(coords, shape=(12, 24), radius=1.3, dtype=dtype)
    phi, r = dist.local_grids(disk, scales=1)
    w0 = dist.Field(name='w0', bases=disk)
    w0['g'] = np.broadcast_to(1 - (r / 1.3)**2 + 0.3 * (r / 1.3)**4, w0['g'].shape)
    target = dist.Field(name='target', bases=disk)
    target['g'] = (np.cos(2 * phi) * r**2 + 0.5 * np.sin(phi) * r + 0.1).astype(dtype)
    rhs = dist.Field(name='rhs', bases=disk)
    rhs['g'] = (1 + np.asarray(w0['g'])) * np.asarray(target['g'])
    u = dist.Field(name='u', bases=disk)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("u + w0*u = rhs")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    u.require_grid_space()
    assert np.abs(np.asarray(u['g']) - np.asarray(target['g'])).max() < 1e-12


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_disk_vector_ncc_lhs(dtype):
    """Axisymmetric NCC times a vector operand: per-spin Zernike blocks."""
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    disk = d3.DiskBasis(coords, shape=(12, 24), radius=1.0, dtype=dtype)
    phi, r = dist.local_grids(disk, scales=1)
    w0 = dist.Field(name='w0', bases=disk)
    w0['g'] = np.broadcast_to(1 - r**2, w0['g'].shape)
    # Smooth (Cartesian-polynomial) vector data: spin components then decay
    # to roundoff well inside the truncation, so the truncated-Clenshaw NCC
    # matrices and the quadrature transform agree
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    f = dist.Field(name='f', bases=disk)
    f['g'] = (x**2 * y + 0.5 * x * y - y**3 + 0.2 * x).astype(dtype)
    vt = d3.grad(f).evaluate()
    vt.change_scales(1)
    vt.require_grid_space()
    rhsv = dist.VectorField(coords, name='rhsv', bases=disk)
    rhsv['g'] = (1 + np.asarray(w0['g'])) * np.asarray(vt['g'])
    w = dist.VectorField(coords, name='w', bases=disk)
    problem = d3.LBVP([w], namespace=locals())
    problem.add_equation("w + w0*w = rhsv")
    solver = problem.build_solver()
    solver.solve()
    w.change_scales(1)
    w.require_grid_space()
    assert np.abs(np.asarray(w['g']) - np.asarray(vt['g'])).max() < 1e-10


def test_disk_ncc_times_constant_operand():
    """Disk NCC multiplying a constant (basis-less) operand: the LHS matrix
    column is the NCC's own radial profile (ref arithmetic.py:360-459 handles
    general NCC/operand pairings)."""
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.DiskBasis(coords, shape=(16, 16), radius=1, dealias=(1.5, 1.5))
    phi, r = basis.global_grids(scales=(1, 1))
    phi, r = phi.reshape(-1, 1), r.reshape(1, -1)
    u = dist.Field(name='u', bases=basis)
    c = dist.Field(name='c')                      # constant field
    f = dist.Field(name='f', bases=basis)
    f['g'] = np.broadcast_to(1 + 2 * r**2, (16, 16))
    ustar = (1 - r**2) * np.cos(phi) + 0.5 * r**2
    g = dist.Field(name='g', bases=basis)
    g['g'] = ustar + (1 + 2 * r**2) * 3.0
    problem = d3.LBVP([u, c], namespace=locals())
    problem.add_equation("u + f*c = g")
    problem.add_equation("integ(u) = integ(g) - 3*integ(f)")
    problem.build_solver().solve()
    u.change_scales(1)
    u.require_grid_space()
    assert float(np.asarray(c['g']).ravel()[0]) == pytest.approx(3.0, abs=1e-10)
    assert np.abs(np.asarray(u.data) - ustar).max() < 1e-10


def test_disk_ncc_times_tensor_constant_rejected():
    """Disk NCC multiplying a constant operand WITH polar tensor components:
    rejected, matching the reference. A constant spin-s component has no
    regular m=0 disk representation (regularity |s| forces r^|s| behavior at
    the origin, which a radially-constant profile violates), and the
    reference rejects the pairing the same way — ConvertConstantDisk raises
    ValueError("Tensors not yet supported.") for any polar tensor component
    on a constant operand (ref basis.py:2619-2626), which is the conversion
    every disk NCC x constant product routes through there."""
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.DiskBasis(coords, shape=(8, 8), radius=1)
    f = dist.Field(name='f', bases=basis)
    f['g'] = 1.0
    u = dist.VectorField(coords, name='u', bases=basis)
    cvec = dist.VectorField(coords, name='cvec')   # constant polar vector
    rhs = dist.VectorField(coords, name='rhs', bases=basis)
    problem = d3.LBVP([u, cvec], namespace=locals())
    problem.add_equation("u + f*cvec = rhs")
    problem.add_equation("integ(u) = 0")
    with pytest.raises(NotImplementedError, match="polar tensor"):
        problem.build_solver()
