"""
LBVP tests: Poisson problems with tau boundary conditions
(mirrors dedalus/tests/test_lbvp.py).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def test_poisson_1d_chebyshev():
    # u'' = f, u(0)=a, u(1)=b with manufactured solution u = sin(pi x) + x
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=32, bounds=(0, 1))
    u = dist.Field(name='u', bases=xb)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    f['g'] = -np.pi**2 * np.sin(np.pi * x)
    lift = lambda A, n: d3.Lift(A, xb.derivative_basis(2), n)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.LBVP([u, t1, t2], namespace=locals())
    problem.add_equation("dx(dx(u)) + lift(t1,-1) + lift(t2,-2) = f")
    problem.add_equation("u(x=0) = 0")
    problem.add_equation("u(x=1) = 1")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - (np.sin(np.pi * x) + x)).max() < 1e-11


@pytest.mark.parametrize("Nx,Nz", [(32, 32), (16, 24)])
def test_poisson_2d_fourier_chebyshev(Nx, Nz):
    Lx, Lz = 2 * np.pi, 1
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=Nx, bounds=(0, Lx))
    zb = d3.ChebyshevT(coords['z'], size=Nz, bounds=(0, Lz))
    u = dist.Field(name='u', bases=(xb, zb))
    tau1 = dist.Field(name='tau1', bases=xb)
    tau2 = dist.Field(name='tau2', bases=xb)
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    x, z = dist.local_grids(xb, zb, scales=1)
    F = dist.Field(name='F', bases=(xb, zb))
    F['g'] = -4 * np.sin(2 * x) * z * (1 - z) - 2 * np.sin(2 * x)
    problem = d3.LBVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) = F")
    problem.add_equation("u(z=0) = 0")
    problem.add_equation("u(z=1) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - np.sin(2 * x) * z * (1 - z)).max() < 1e-12


def test_poisson_2d_neumann_gauge():
    # Pure Neumann problem with integral gauge: lap(u) = F, u'(0)=u'(1)=0, integ(u)=0
    Lx, Lz = 2 * np.pi, 1
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, Lx))
    zb = d3.ChebyshevT(coords['z'], size=32, bounds=(0, Lz))
    u = dist.Field(name='u', bases=(xb, zb))
    tau1 = dist.Field(name='tau1', bases=xb)
    tau2 = dist.Field(name='tau2', bases=xb)
    tau3 = dist.Field(name='tau3')
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    dz = lambda A: d3.Differentiate(A, coords['z'])
    x, z = dist.local_grids(xb, zb, scales=1)
    # Solution: u = cos(x) cos(pi z) (zero integral, zero z-derivative at ends)
    F = dist.Field(name='F', bases=(xb, zb))
    F['g'] = -(1 + np.pi**2) * np.cos(x) * np.cos(np.pi * z)
    problem = d3.LBVP([u, tau1, tau2, tau3], namespace=locals())
    problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) + tau3 = F")
    problem.add_equation("dz(u)(z=0) = 0")
    problem.add_equation("dz(u)(z=1) = 0")
    problem.add_equation("integ(u) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - np.cos(x) * np.cos(np.pi * z)).max() < 1e-11


def test_ncc_lbvp():
    # Variable-coefficient problem: (2+z) u'' + u = f, Dirichlet BCs
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=np.float64)
    zb = d3.ChebyshevT(c, size=48, bounds=(0, 1))
    u = dist.Field(name='u', bases=zb)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    ncc = dist.Field(name='ncc', bases=zb)
    z = dist.local_grid(zb, scale=1).ravel()
    ncc['g'] = 2 + z
    uex = np.sin(2 * z) * (1 - z) * z
    # f = (2+z) uex'' + uex
    import numpy.polynomial  # noqa
    h = 1e-5
    f = dist.Field(name='f', bases=zb)
    uex_f = lambda zz: np.sin(2 * zz) * (1 - zz) * zz
    upp = (uex_f(z + h) - 2 * uex_f(z) + uex_f(z - h)) / h**2
    f['g'] = (2 + z) * upp + uex
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    dz = lambda A: d3.Differentiate(A, c)
    problem = d3.LBVP([u, t1, t2], namespace=locals())
    problem.add_equation("ncc*dz(dz(u)) + u + lift(t1,-1) + lift(t2,-2) = f")
    problem.add_equation("u(z=0) = 0")
    problem.add_equation("u(z=1) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    # FD-built RHS limits accuracy to ~h^2 * scale
    assert np.abs(np.array(u['g']) - uex).max() < 1e-8


def test_poisson_fourier_conditions():
    """Equation conditions (reference problems.py:65, subsystems.py:494):
    the canonical fully-Fourier Poisson pattern, where the singular mean
    mode gets a complementary gauge equation via condition strings."""
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    f['g'] = -np.sin(x) - 4 * np.cos(2 * x)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("dx(dx(u)) = f", condition="nx != 0")
    problem.add_equation("u = 0", condition="nx == 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - (np.sin(x) + np.cos(2 * x))).max() < 1e-12


def test_poisson_2d_conditions_mean_bc():
    """Conditioned boundary rows on a coupled-axis problem: the x-mean group
    replaces a Dirichlet BC with an integral gauge through complementary
    conditions. Exercises merged row blocks alongside unconditioned
    equations and the dense fallback (banded refuses conditioned pencils)."""
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2 * np.pi))
    zb = d3.ChebyshevT(coords['z'], size=24, bounds=(0, 1))
    u = dist.Field(name='u', bases=(xb, zb))
    tau1 = dist.Field(name='tau1', bases=xb)
    tau2 = dist.Field(name='tau2', bases=xb)
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    integz = lambda A: d3.Integrate(A, coords['z'])
    x, z = dist.local_grids(xb, zb, scales=1)
    F = dist.Field(name='F', bases=(xb, zb))
    # u_true = sin(2x) z(1-z) + (z^2 - 4z/3 + 1/3): the mean part satisfies
    # m(1) = 0 and integ_z(m) = 0 (not m(0) = 0)
    F['g'] = -4 * np.sin(2 * x) * z * (1 - z) - 2 * np.sin(2 * x) + 2
    problem = d3.LBVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) = F")
    problem.add_equation("u(z=0) = 0", condition="nx != 0")
    problem.add_equation("integz(u) = 0", condition="nx == 0")
    problem.add_equation("u(z=1) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    u_true = np.sin(2 * x) * z * (1 - z) + z**2 - 4 * z / 3 + 1 / 3
    assert np.abs(np.array(u['g']) - u_true).max() < 1e-12


def test_conditions_complex_fourier_signed_wavenumbers():
    """Condition namespace values are NATIVE wavenumbers (reference
    basis.py:884-890): for ComplexFourier, nx is the SIGNED integer
    wavenumber, not the storage index. The gauge below zeroes nx <= 0;
    with index semantics the k=-1 mode of f would leak into u."""
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.complex128)
    xb = d3.ComplexFourier(c, size=16, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    f['g'] = 2 * np.cos(x)              # spectrum at k = +1 and k = -1
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("dx(dx(u)) = f", condition="nx > 0")
    problem.add_equation("u = 0", condition="nx <= 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    expect = -np.exp(1j * x)            # only k = +1 survives, u(+1) = -1
    assert np.abs(np.array(u['g']) - expect).max() < 1e-13
