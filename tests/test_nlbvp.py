"""NLBVP Newton-iteration tests (mirrors dedalus/tests/test_nlbvp.py)."""

import numpy as np

import dedalus_tpu.public as d3


def test_riccati():
    # u' = u^2, u(0) = 1  =>  u = 1/(1-x) on [0, 1/2]
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=32, bounds=(0, 0.5), dealias=2)
    u = dist.Field(name='u', bases=xb)
    tau = dist.Field(name='tau')
    lift = lambda A: d3.Lift(A, xb.derivative_basis(1), -1)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.NLBVP([u, tau], namespace=locals())
    problem.add_equation("dx(u) + lift(tau) - u**2 = 0")
    problem.add_equation("u(x=0) = 1")
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = 1 + x
    solver = problem.build_solver()
    for it in range(20):
        solver.newton_iteration()
        pert_norm = sum(p.allreduce_data_norm('c', 2) for p in solver.perturbations)
        if pert_norm < 1e-12:
            break
    assert it < 10
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - 1 / (1 - x)).max() < 1e-12


def test_nonlinear_diffusion():
    # (u u')' = f with manufactured u = 1 + exp(x); Newton converges quadratically
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=48, bounds=(0, 1), dealias=2)
    u = dist.Field(name='u', bases=xb)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    # u = 1 + e^x: (u u')' = (e^x + e^{2x}... ) = d/dx[(1+e^x)e^x] = e^x + 2 e^{2x}
    f['g'] = np.exp(x) + 2 * np.exp(2 * x)
    lift = lambda A, n: d3.Lift(A, xb.derivative_basis(2), n)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.NLBVP([u, t1, t2], namespace=locals())
    problem.add_equation("dx(u*dx(u)) + lift(t1,-1) + lift(t2,-2) - f = 0")
    problem.add_equation("u(x=0) = 2")
    problem.add_equation("u(x=1) = 1 + np.e")
    u['g'] = 2 + x
    solver = problem.build_solver()
    for it in range(30):
        solver.newton_iteration()
        pert_norm = sum(p.allreduce_data_norm('c', 2) for p in solver.perturbations)
        if pert_norm < 1e-12:
            break
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - (1 + np.exp(x))).max() < 1e-10
