"""
Grid-space nonlinear operators: numpy-ufunc dispatch (UnaryGridFunction),
Power, GeneralFunction, and their symbolic derivatives in Newton iterations.

Mirrors the reference's dedalus/tests/test_grid_operators.py coverage shape
(ufuncs applied to fields and operators, evaluated against numpy on the grid;
reference operators.py:505 UnaryGridFunction, :306 Power, :430 GeneralFunction).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3

UFUNCS = [np.sin, np.cos, np.tan, np.exp, np.sinh, np.cosh, np.tanh,
          np.arctan, np.log1p, np.sqrt, np.abs]


def _build1d(dtype=np.float64, N=32):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    xb = d3.ChebyshevT(c, size=N, bounds=(0.5, 2.0), dtype=dtype)
    x = dist.local_grid(xb, scale=1).ravel()
    return c, dist, xb, x


@pytest.mark.parametrize('func', UFUNCS)
def test_ufunc_on_field(func):
    c, dist, xb, x = _build1d()
    f = dist.Field(name='f', bases=xb)
    f['g'] = 0.2 + 0.5 * x          # positive (for sqrt/log1p)
    w = func(f).evaluate()
    w.change_scales(1)
    assert np.allclose(np.asarray(w['g']).ravel(), func(0.2 + 0.5 * x))


@pytest.mark.parametrize('func', [np.sin, np.exp, np.tanh])
def test_ufunc_on_operator(func):
    """Ufuncs compose with operator-tree operands (func of dx(f))."""
    c, dist, xb, x = _build1d(N=48)
    f = dist.Field(name='f', bases=xb)
    f['g'] = np.sin(x)
    dx = lambda A: d3.Differentiate(A, c)
    w = func(dx(f)).evaluate()
    w.change_scales(1)
    assert np.abs(np.asarray(w['g']).ravel() - func(np.cos(x))).max() < 1e-10


@pytest.mark.parametrize('p', [2, 3, 0.5, -1.0])
def test_power(p):
    c, dist, xb, x = _build1d()
    f = dist.Field(name='f', bases=xb)
    f['g'] = 1.5 + np.sin(x)        # positive base
    w = (f**p).evaluate()
    w.change_scales(1)
    assert np.allclose(np.asarray(w['g']).ravel(), (1.5 + np.sin(x))**p)


def test_power_int_of_expression():
    c, dist, xb, x = _build1d(N=48)
    f = dist.Field(name='f', bases=xb)
    f['g'] = np.cos(x)
    dx = lambda A: d3.Differentiate(A, c)
    w = (dx(f)**2).evaluate()
    w.change_scales(1)
    assert np.abs(np.asarray(w['g']).ravel() - np.sin(x)**2).max() < 1e-10


def test_ufunc_chain():
    """Compositions: exp(sin(f)) * cos(f)."""
    c, dist, xb, x = _build1d()
    f = dist.Field(name='f', bases=xb)
    f['g'] = 0.3 * x
    w = (np.exp(np.sin(f)) * np.cos(f)).evaluate()
    w.change_scales(1)
    expect = np.exp(np.sin(0.3 * x)) * np.cos(0.3 * x)
    assert np.allclose(np.asarray(w['g']).ravel(), expect)


def test_ufunc_in_nlbvp_newton():
    """The symbolic derivative of a ufunc drives Newton: solve u'' = exp(u)
    (Bratu-type with lambda small enough for convergence)."""
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=32, bounds=(0, 1))
    x = dist.local_grid(xb, scale=1).ravel()
    u = dist.Field(name='u', bases=xb)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    lam = 1.0
    dx = lambda A: d3.Differentiate(A, c)
    lift = lambda A, n: d3.Lift(A, xb.derivative_basis(2), n)
    problem = d3.NLBVP([u, t1, t2], namespace=locals())
    problem.add_equation("dx(dx(u)) + lift(t1,-1) + lift(t2,-2) = -lam*np.exp(u)")
    problem.add_equation("u(x=0) = 0")
    problem.add_equation("u(x=1) = 0")
    solver = problem.build_solver()
    for _ in range(30):
        if solver.newton_iteration() < 1e-12:
            break
    u.change_scales(1)
    ug = np.asarray(u['g']).ravel()
    # Check residual on the grid: u'' + lam e^u = 0
    upp = np.asarray(dx(dx(u)).evaluate()['g']).ravel()
    assert np.abs(upp + lam * np.exp(ug)).max() < 1e-8
    assert ug.max() > 0.1   # nontrivial solution


def test_general_function():
    """GeneralFunction: arbitrary host callback producing grid data."""
    c, dist, xb, x = _build1d()
    f = dist.Field(name='f', bases=xb)
    f['g'] = np.sin(x)

    def custom(*args):
        return np.asarray(args[0]['g']) ** 2 + 1.0

    w = d3.GeneralFunction(dist, f.domain, layout='g', tensorsig=(),
                           dtype=np.float64, func=custom, args=[f])
    out = w.evaluate()
    out.change_scales(1)
    assert np.allclose(np.asarray(out['g']).ravel(), np.sin(x)**2 + 1.0)


def test_ufunc_2d_vector_component():
    """Ufunc of a dot product of vector fields (2D)."""
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2 * np.pi))
    zb = d3.ChebyshevT(coords['z'], size=16, bounds=(0, 1))
    x, z = dist.local_grids(xb, zb, scales=1)
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    ug = np.stack([np.cos(x) + 0 * z, np.sin(x) * z])
    u['g'] = ug
    w = np.tanh(u @ u).evaluate()
    w.change_scales(1)
    expect = np.tanh(ug[0]**2 + ug[1]**2)
    assert np.abs(np.asarray(w['g']) - expect).max() < 1e-12
