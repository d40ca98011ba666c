"""CFL and flow-tools tests (mirrors dedalus/tests/test_cfl.py strategy)."""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def build_solver():
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2), dealias=1.5)
    zb = d3.ChebyshevT(coords['z'], size=16, bounds=(0, 1), dealias=1.5)
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    tau1 = dist.VectorField(coords, name='tau1', bases=xb)
    tau2 = dist.VectorField(coords, name='tau2', bases=xb)
    lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
    problem = d3.IVP([u, tau1, tau2], namespace=locals())
    problem.add_equation("dt(u) - lap(u) + lift(tau1,-1) + lift(tau2,-2) = 0")
    problem.add_equation("u(z=0) = 0")
    problem.add_equation("u(z=1) = 0")
    solver = problem.build_solver(d3.RK222)
    return solver, u, dist, xb, zb


def test_cfl_frequencies():
    solver, u, dist, xb, zb = build_solver()
    # Uniform velocity: CFL frequency = |u| / dx
    x, z = dist.local_grids(xb, zb, scales=1)
    data = np.zeros((2, 16, 16))
    data[0] = 2.0   # x velocity
    u['g'] = data
    cfl = d3.CFL(solver, initial_dt=1.0, cadence=1, safety=1.0)
    cfl.add_velocity(u)
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    # dx on the dealiased x grid: (2 / 24); freq ~= 2 / dx = 24; dt ~= 1/24
    # (the single step slightly perturbs the velocity near the walls)
    assert abs(dt - (2 / 24) / 2.0) < 2e-3


def test_cfl_bounds():
    solver, u, dist, xb, zb = build_solver()
    cfl = d3.CFL(solver, initial_dt=0.5, cadence=1, safety=1.0,
                 max_dt=0.25, min_dt=1e-4, max_change=1.5)
    cfl.add_velocity(u)  # zero velocity -> dt_target = inf -> capped
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    assert dt == 0.25


def test_flow_property_reductions():
    solver, u, dist, xb, zb = build_solver()
    flow = d3.GlobalFlowProperty(solver, cadence=1)
    flow.add_property(u @ u, name='u2')
    x, z = dist.local_grids(xb, zb, scales=1)
    data = np.zeros((2, 16, 16))
    data[0] = 3.0
    u['g'] = data
    solver.step(1e-5)
    assert abs(flow.max('u2') - 9.0) < 1e-6
    assert abs(flow.volume_average('u2') - 9.0) < 1e-6
