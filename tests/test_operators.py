"""
Cartesian operator evaluation tests against analytic expressions.

Mirrors the strategy of dedalus/tests/test_cartesian_operators.py: build
fields with known closed forms, apply operators, compare on the grid.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


@pytest.fixture(scope='module')
def setup2d():
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=32, bounds=(0, 2*np.pi), dealias=1.5)
    zb = d3.ChebyshevT(coords['z'], size=24, bounds=(-1, 1), dealias=1.5)
    x = dist.local_grid(xb, scale=1)
    z = dist.local_grid(zb, scale=1)
    return coords, dist, xb, zb, x, z


def grid1(expr):
    """Evaluate expression and return grid data at scale 1."""
    f = expr.evaluate()
    f.change_scales(1)
    return np.array(f['g'])


def test_differentiate_fourier(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.Field(name='u', bases=(xb, zb))
    u['g'] = np.sin(3*x) * z**2
    dx = d3.Differentiate(u, coords['x'])
    assert np.allclose(grid1(dx), 3*np.cos(3*x)*z**2, atol=1e-12)


def test_differentiate_chebyshev(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.Field(name='u', bases=(xb, zb))
    u['g'] = np.cos(2*x) * np.exp(z)
    dz = d3.Differentiate(u, coords['z'])
    assert np.allclose(grid1(dz), np.cos(2*x)*np.exp(z), atol=1e-10)


def test_gradient_divergence_laplacian(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.Field(name='u', bases=(xb, zb))
    u['g'] = np.sin(x) * np.cos(np.pi * z / 2)
    g = d3.grad(u, coords)
    gd = grid1(g)
    assert np.allclose(gd[0], np.cos(x)*np.cos(np.pi*z/2), atol=1e-10)
    assert np.allclose(gd[1], -np.pi/2*np.sin(x)*np.sin(np.pi*z/2), atol=1e-10)
    l = d3.lap(u, coords)
    assert np.allclose(grid1(l), -(1 + np.pi**2/4)*np.sin(x)*np.cos(np.pi*z/2), atol=1e-9)
    dv = d3.div(g)
    assert np.allclose(grid1(dv), grid1(l), atol=1e-9)


def test_curl_skew_trace_transpose(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    data = np.zeros((2, 32, 24))
    data[0] = np.sin(x) * z
    data[1] = np.cos(x) * z**2
    u['g'] = data
    # curl (2D -> scalar): dx(u_z) - dz(u_x)
    c = d3.curl(u)
    assert np.allclose(grid1(c), -np.sin(x)*z**2 - np.sin(x), atol=1e-10)
    # skew
    s = d3.skew(u)
    sd = grid1(s)
    assert np.allclose(sd[0], -data[1], atol=1e-12)
    assert np.allclose(sd[1], data[0], atol=1e-12)
    # trace(grad(u)) == div(u)
    T = d3.grad(u, coords)
    tr = d3.trace(T)
    assert np.allclose(grid1(tr), np.cos(x)*z + 2*np.cos(x)*z, atol=1e-10)
    # transpose
    tt = d3.transpose(T)
    Td = grid1(T)
    ttd = grid1(tt)
    assert np.allclose(ttd, np.swapaxes(Td, 0, 1), atol=1e-12)


def test_multiply_dot(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    b = dist.Field(name='b', bases=(xb, zb))
    data = np.zeros((2, 32, 24))
    data[0] = np.cos(x)
    data[1] = z
    u['g'] = data
    b['g'] = np.sin(x) * z
    # u @ grad(b)
    adv = u @ d3.grad(b, coords)
    expect = np.cos(x)*np.cos(x)*z + z*np.sin(x)
    assert np.allclose(grid1(adv), expect, atol=1e-10)
    # u * b (outer: vector * scalar = vector)
    ub = u * b
    ubd = grid1(ub)
    assert np.allclose(ubd[0], data[0]*np.sin(x)*z, atol=1e-11)
    # scalar multiply and add
    e = 2*b - b
    assert np.allclose(grid1(e), np.sin(x)*z, atol=1e-12)
    # power and ufunc
    p = b**2
    assert np.allclose(grid1(p), (np.sin(x)*z)**2, atol=1e-11)
    # sqrt of a smooth positive quantity (bounded away from zero for spectral
    # convergence of the non-polynomial composition)
    sq = np.sqrt(2 + u@u)
    assert np.allclose(grid1(sq), np.sqrt(2 + np.cos(x)**2 + z**2), atol=1e-9)


def test_interpolate_integrate_average(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.Field(name='u', bases=(xb, zb))
    u['g'] = np.cos(x) * z**3
    # Interpolate in z
    uz = u(z=0.5)
    assert np.allclose(grid1(uz), np.cos(x) * 0.125, atol=1e-11)
    # Interpolate at left edge
    ul = u(z=-1)
    assert np.allclose(grid1(ul), -np.cos(x), atol=1e-11)
    # Integrate over z: int z^3 over [-1,1] = 0
    iz = d3.Integrate(u, coords['z'])
    assert np.allclose(grid1(iz), 0, atol=1e-12)
    # Integrate x then all
    v = dist.Field(name='v', bases=(xb, zb))
    v['g'] = (1 + np.sin(x)) * (1 + z**2)
    ixz = d3.Integrate(v, coords)
    assert np.allclose(float(grid1(ixz).ravel()[0]), 2*np.pi * (2 + 2/3), atol=1e-10)
    av = d3.Average(v, coords['x'])
    assert np.allclose(grid1(av), 1 + z**2, atol=1e-11)


def test_lift(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    tau = dist.Field(name='tau', bases=xb)
    tau['g'] = np.sin(x)
    lift_basis = zb.derivative_basis(1)
    lifted = d3.Lift(tau, lift_basis, -1)
    # Lifted field = sin(x) * P_{Nz-1}^{(a+1,b+1)}(z)
    from dedalus_tpu.spectral import jacobi
    zg = z.ravel()
    znat = 2*(zg - (-1))/2 - 1
    P = jacobi.polynomials(24, 0.5, 0.5, znat)
    expect = np.sin(x) * P[23][None, :]
    assert np.allclose(grid1(lifted), expect, atol=1e-10)


def test_frechet_differential(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    u = dist.Field(name='u', bases=(xb, zb))
    du = dist.Field(name='du', bases=(xb, zb))
    u['g'] = 1 + 0.5*np.sin(x)*z
    du['g'] = np.cos(2*x) * z**2
    # F = u**3: dF = 3 u^2 du
    F = u**3
    dF = F.frechet_differential([u], [du])
    expect = 3 * np.array(u['g'])**2 * np.array(du['g'])
    assert np.allclose(grid1(dF), expect, atol=1e-9)
    # F = u*dx(u): dF = du*dx(u) + u*dx(du)
    dxop = lambda a: d3.Differentiate(a, coords['x'])
    F2 = u * dxop(u)
    dF2 = F2.frechet_differential([u], [du])
    ug, dug = np.array(u['g', 1]), np.array(du['g', 1])
    dxu = grid1(dxop(u))
    dxdu = grid1(dxop(du))
    assert np.allclose(grid1(dF2), dug*dxu + ug*dxdu, atol=1e-9)


def test_split_time_derivative(setup2d):
    coords, dist, xb, zb, x, z = setup2d
    from dedalus_tpu.core import operators as ops
    u = dist.Field(name='u', bases=(xb, zb))
    kappa = 0.5
    expr = ops.dt(u) - kappa * d3.lap(u, coords) if False else \
        ops.Add(ops.dt(u), ops.Multiply(-kappa, d3.lap(u, coords)))
    M, L = expr.split(ops.TimeDerivative)
    assert M.has(ops.TimeDerivative)
    assert not (L.has(ops.TimeDerivative) if hasattr(L, 'has') else False)
    # Replace dt -> identity
    M2 = M.replace(ops.TimeDerivative, lambda a: a)
    assert not M2.has(ops.TimeDerivative)
