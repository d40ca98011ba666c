"""
Cartesian NCC (non-constant-coefficient) suite.

Mirrors the reference's dedicated NCC tests (dedalus/tests/test_cartesian_ncc.py):
for every Jacobi family / conversion offset / dtype, an LHS NCC product must
match the pseudospectral (grid-space) product. House pattern: solve
    u + w0*u = (1 + w0) * target        (LBVP)
and check u == target to spectral precision; this exercises the Clenshaw NCC
matrix construction (reference basis.py:610-628, tools/clenshaw.py:24) against
the transform path end-to-end.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


@pytest.mark.parametrize('a0, b0', [(-1/2, -1/2), (0, 0), (-1/2, 1/2)])
@pytest.mark.parametrize('k_ncc', [0, 1])
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_jacobi_ncc_scalar(a0, b0, k_ncc, dtype):
    N = 32
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=dtype)
    zb = d3.Jacobi(c, size=N, bounds=(0, 1), a=a0, b=b0, dtype=dtype)
    zb_ncc = d3.Jacobi(c, size=N, bounds=(0, 1), a=a0 + k_ncc, b=b0 + k_ncc,
                       a0=a0, b0=b0, dtype=dtype)
    z = dist.local_grid(zb, scale=1).ravel()
    w0 = dist.Field(name='w0', bases=zb_ncc)
    w0['g'] = np.sin(2 * z) + 0.3 * z**2
    target = np.cos(3 * z) * (1 + 0.5 * z)
    rhs = dist.Field(name='rhs', bases=zb)
    rhs['g'] = ((2 + np.sin(2 * z) + 0.3 * z**2) * target).astype(dtype)
    u = dist.Field(name='u', bases=zb)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("2*u + w0*u = rhs")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']).ravel() - target).max() < 1e-9


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
@pytest.mark.parametrize('basis_name', ['ChebyshevT', 'Legendre', 'ChebyshevU'])
def test_jacobi_ncc_families(basis_name, dtype):
    """NCC solves work in every Jacobi family (T/U/Legendre)."""
    N = 32
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=dtype)
    zb = getattr(d3, basis_name)(c, size=N, bounds=(-1, 1), dtype=dtype)
    z = dist.local_grid(zb, scale=1).ravel()
    w0 = dist.Field(name='w0', bases=zb)
    w0['g'] = 0.5 * z**3 - z
    target = np.exp(-z**2) * np.sin(2 * z)
    rhs = dist.Field(name='rhs', bases=zb)
    rhs['g'] = ((3 + 0.5 * z**3 - z) * target).astype(dtype)
    u = dist.Field(name='u', bases=zb)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("3*u + w0*u = rhs")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']).ravel() - target).max() < 1e-10


@pytest.mark.parametrize('dtype', [np.float64])
def test_jacobi_ncc_on_derivative(dtype):
    """NCC multiplying a derivative operand: w0 * dz(u) on the LHS."""
    N = 48
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=dtype)
    zb = d3.ChebyshevT(c, size=N, bounds=(0, 1), dtype=dtype)
    z = dist.local_grid(zb, scale=1).ravel()
    w0 = dist.Field(name='w0', bases=zb)
    w0['g'] = 1 + z**2
    # target u = sin(pi z) z (1-z); dz(u) analytically
    u_ex = np.sin(np.pi * z) * z * (1 - z)
    du_ex = (np.pi * np.cos(np.pi * z) * z * (1 - z)
             + np.sin(np.pi * z) * (1 - 2 * z))
    rhs = dist.Field(name='rhs', bases=zb)
    rhs['g'] = u_ex + (1 + z**2) * du_ex
    t1 = dist.Field(name='t1')
    dz = lambda A: d3.Differentiate(A, c)
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(1), n)
    u = dist.Field(name='u', bases=zb)
    problem = d3.LBVP([u, t1], namespace=locals())
    problem.add_equation("u + w0*dz(u) + lift(t1,-1) = rhs")
    problem.add_equation("u(z=0) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']).ravel() - u_ex).max() < 1e-10


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_2d_separable_ncc_vector(dtype):
    """z-dependent NCC times a 2D vector operand (Fourier x Chebyshev)."""
    Nx, Nz = 16, 24
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=dtype)
    Fourier = d3.RealFourier if dtype == np.float64 else d3.ComplexFourier
    xb = Fourier(coords['x'], size=Nx, bounds=(0, 2 * np.pi), dtype=dtype)
    zb = d3.ChebyshevT(coords['z'], size=Nz, bounds=(0, 1), dtype=dtype)
    x, z = dist.local_grids(xb, zb, scales=1)
    w0 = dist.Field(name='w0', bases=zb)
    w0['g'] = 2 + np.sin(np.pi * z)
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    tg = np.stack([np.cos(x) * z**2 + 0 * z,
                   np.sin(2 * x) * (1 - z) + 0.1 * z])
    rhs = dist.VectorField(coords, name='rhs', bases=(xb, zb))
    rhs['g'] = ((3 + np.sin(np.pi * z)) * tg).astype(dtype)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("u + w0*u = rhs")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']) - tg).max() < 1e-11


@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_fourier_ncc_pseudospectral(dtype):
    """Fourier-dependent products evaluate correctly on the RHS (grid space)."""
    N = 32
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    Fourier = d3.RealFourier if dtype == np.float64 else d3.ComplexFourier
    xb = Fourier(c, size=N, bounds=(0, 2 * np.pi), dtype=dtype)
    x = dist.local_grid(xb, scale=1).ravel()
    f = dist.Field(name='f', bases=xb)
    g = dist.Field(name='g', bases=xb)
    f['g'] = np.sin(x) + 0.5 * np.cos(3 * x)
    g['g'] = np.cos(2 * x)
    w = (f * g).evaluate()
    w.change_scales(1)
    expect = (np.sin(x) + 0.5 * np.cos(3 * x)) * np.cos(2 * x)
    assert np.abs(np.asarray(w['g']).ravel() - expect).max() < 1e-12


@pytest.mark.parametrize('k_arg', [0, 1])
def test_jacobi_ncc_converted_operand(k_arg):
    """NCC times an operand that lives in a converted (a+k, b+k) basis."""
    N = 32
    dtype = np.float64
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=dtype)
    zb = d3.ChebyshevT(c, size=N, bounds=(0, 1), dtype=dtype)
    z = dist.local_grid(zb, scale=1).ravel()
    w0 = dist.Field(name='w0', bases=zb)
    w0['g'] = 1 + 0.5 * z
    target = np.sin(2 * np.pi * z)
    d2 = -(2 * np.pi)**2 * target
    rhs = dist.Field(name='rhs', bases=zb)
    # u + w0 * dz^k(u)-style mixed-k operand via Laplacian (k_arg=1 -> dz)
    dz = lambda A: d3.Differentiate(A, c)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    u = dist.Field(name='u', bases=zb)
    if k_arg == 0:
        rhs['g'] = (1 + 0.5 * z) * target + d2
        problem = d3.LBVP([u, t1, t2], namespace=locals())
        problem.add_equation("w0*u + dz(dz(u)) + lift(t1,-1) + lift(t2,-2) = rhs")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
    else:
        du = 2 * np.pi * np.cos(2 * np.pi * z)
        rhs['g'] = (1 + 0.5 * z) * du + d2 + target
        problem = d3.LBVP([u, t1, t2], namespace=locals())
        problem.add_equation("u + w0*dz(u) + dz(dz(u)) + lift(t1,-1) + lift(t2,-2) = rhs")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']).ravel() - target).max() < 1e-9


@pytest.mark.parametrize('dtype', [np.float64])
def test_ncc_product_of_nccs(dtype):
    """Products of two NCC fields against one variable: (w0*w1)*u."""
    N = 32
    c = d3.Coordinate('z')
    dist = d3.Distributor(c, dtype=dtype)
    zb = d3.ChebyshevT(c, size=N, bounds=(0, 1), dtype=dtype)
    z = dist.local_grid(zb, scale=1).ravel()
    w0 = dist.Field(name='w0', bases=zb)
    w1 = dist.Field(name='w1', bases=zb)
    w0['g'] = 1 + z
    w1['g'] = 2 - z
    target = np.cos(2 * z)
    rhs = dist.Field(name='rhs', bases=zb)
    rhs['g'] = (1 + (1 + z) * (2 - z)) * target
    u = dist.Field(name='u', bases=zb)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("u + w0*(w1*u) = rhs")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.asarray(u['g']).ravel() - target).max() < 1e-10
