"""
Annulus (polar) tests: transforms, calculus vs analytic forms, and full
LBVP/IVP solves (mirrors dedalus/tests polar suites).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


@pytest.fixture(scope='module')
def ann():
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.AnnulusBasis(coords, shape=(16, 16), radii=(1, 2), dealias=(1.5, 1.5))
    phi, r = basis.global_grids(scales=(1, 1))
    return coords, dist, basis, phi.reshape(-1, 1), r.reshape(1, -1)


def grid1(expr):
    f = expr.evaluate()
    f.change_scales(1)
    f.require_grid_space()
    return np.array(f.data)


def test_annulus_scalar_roundtrip(ann):
    coords, dist, basis, phi, r = ann
    f = dist.Field(name='f', bases=basis)
    fg = np.cos(2 * phi) * r**3 + np.sin(phi) * r
    f['g'] = fg
    np.array(f['c'])
    assert np.abs(np.array(f['g']) - fg).max() < 1e-12


def test_annulus_gradient(ann):
    coords, dist, basis, phi, r = ann
    f = dist.Field(name='f', bases=basis)
    f['g'] = np.cos(2 * phi) * r**3
    gd = grid1(d3.grad(f))
    assert np.abs(gd[0] + 2 * r**2 * np.sin(2 * phi)).max() < 1e-11
    assert np.abs(gd[1] - 3 * r**2 * np.cos(2 * phi)).max() < 1e-11


def test_annulus_div_lap_trace(ann):
    coords, dist, basis, phi, r = ann
    f = dist.Field(name='f', bases=basis)
    f['g'] = np.cos(2 * phi) * r**3
    lap_d = grid1(d3.lap(f))
    assert np.abs(lap_d - 5 * r * np.cos(2 * phi)).max() < 1e-9
    dg = grid1(d3.div(d3.grad(f)))
    assert np.abs(dg - lap_d).max() < 1e-11
    u = dist.VectorField(coords, name='u', bases=basis)
    ud = np.zeros((2, 16, 16))
    ud[0] = np.sin(phi) * r * np.ones_like(r)
    ud[1] = np.cos(phi) * r**2
    u['g'] = ud
    div_d = grid1(d3.div(u))
    exact = (1 / r) * np.cos(phi) * r + (1 / r) * 3 * r**2 * np.cos(phi)
    assert np.abs(div_d - exact).max() < 1e-11
    tr_d = grid1(d3.trace(d3.grad(u)))
    assert np.abs(tr_d - div_d).max() < 1e-11


def test_annulus_poisson_lbvp(ann):
    coords, dist, basis, phi, r = ann
    u = dist.Field(name='u', bases=basis)
    tau1 = dist.Field(name='tau1', bases=basis.S1_basis())
    tau2 = dist.Field(name='tau2', bases=basis.S1_basis())
    uex = dist.Field(name='uex', bases=basis)
    uex['g'] = np.sin(2 * phi) * (r - 1) * (2 - r)
    # Manufacture F = lap(uex) through the (independently validated) operators
    F_field = d3.lap(uex).evaluate()
    F_field.name = 'F_field'
    lift_basis = basis.derivative_basis(2)
    lift = lambda A, n: d3.Lift(A, lift_basis, n)
    problem = d3.LBVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) = F_field")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("u(r=2) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    err = np.abs(np.array(u['g']) - np.array(uex['g', 1])).max()
    assert err < 1e-10


def test_annulus_diffusion_ivp(ann):
    coords, dist, basis, phi, r = ann
    u = dist.Field(name='u', bases=basis)
    tau1 = dist.Field(name='tau1', bases=basis.S1_basis())
    tau2 = dist.Field(name='tau2', bases=basis.S1_basis())
    S = dist.Field(name='S', bases=basis)
    S['g'] = np.cos(phi) * (2 - r) * (r - 1)
    lift_basis = basis.derivative_basis(2)
    lift = lambda A, n: d3.Lift(A, lift_basis, n)
    problem = d3.IVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("dt(u) - lap(u) + lift(tau1,-1) + lift(tau2,-2) = S")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("u(r=2) = 0")
    solver = problem.build_solver(d3.SBDF2)
    for _ in range(400):
        solver.step(0.05)
    # Steady state satisfies -lap(u) = S; compare against LBVP
    v = dist.Field(name='v', bases=basis)
    t1 = dist.Field(name='t1', bases=basis.S1_basis())
    t2 = dist.Field(name='t2', bases=basis.S1_basis())
    problem2 = d3.LBVP([v, t1, t2], namespace=locals())
    problem2.add_equation("-lap(v) + lift(t1,-1) + lift(t2,-2) = S")
    problem2.add_equation("v(r=1) = 0")
    problem2.add_equation("v(r=2) = 0")
    solver2 = problem2.build_solver()
    solver2.solve()
    u.change_scales(1)
    v.change_scales(1)
    assert np.abs(np.array(u['g']) - np.array(v['g'])).max() < 1e-8


def test_annulus_vector_ivp_smoke(ann):
    # Vector diffusion with no-slip walls: stability + BC enforcement
    coords, dist, basis, phi, r = ann
    u = dist.VectorField(coords, name='u', bases=basis)
    tau1 = dist.VectorField(coords, name='tau1', bases=basis.S1_basis())
    tau2 = dist.VectorField(coords, name='tau2', bases=basis.S1_basis())
    lift_basis = basis.derivative_basis(2)
    lift = lambda A, n: d3.Lift(A, lift_basis, n)
    problem = d3.IVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("dt(u) - lap(u) + lift(tau1,-1) + lift(tau2,-2) = 0")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("u(r=2) = 0")
    solver = problem.build_solver(d3.RK222)
    ud = np.zeros((2, 16, 16))
    ud[0] = np.sin(phi) * (r - 1) * (2 - r)
    ud[1] = np.cos(2 * phi) * (r - 1) * (2 - r)
    u['g'] = ud
    e0 = float(np.max(np.abs(np.array(u['g']))))
    for _ in range(20):
        solver.step(0.01)
    u.change_scales(1)
    ug = np.array(u['g'])
    assert np.isfinite(ug).all()
    assert np.max(np.abs(ug)) < e0  # diffusive decay
    bb = u(r=2).evaluate()
    bb.change_scales(1)
    assert np.abs(np.array(bb.data)).max() < 1e-9
