"""Structured gather/scatter plans vs the generic index-map formulas.

The TPU lowering of flat (G, C) index gathers reads the whole operand per
group row (measured 30 ms / 36 GB at 2048x512); box problems decompose into
strided windows + a shared column take (measured 0.8 ms). These tests pin
exact equality between the two formulations on every geometry family, and
that the plan correctly declines non-affine (slot-split spherical) maps.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu.core import subsystems


def generic_gather(p, state):
    return state[p.var_index_map_dev] * p.col_valid_dev


def generic_scatter(p, X):
    out = jnp.zeros(p.state_total, dtype=X.dtype)
    return out.at[p.var_index_map_dev].add(X)


def check_pencil(p, expect_plan=None):
    plan = p._gs_plan()
    if expect_plan is True:
        assert plan is not None
    if expect_plan is False:
        assert plan is None
    rng = np.random.default_rng(7)
    state = jnp.asarray(rng.standard_normal(p.state_total))
    ref = p.dist.constrain_pencils(generic_gather(p, state))
    got = p.gather_state(state)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    # Scatter: scatter_ok requires the affine model at ALL entries, so the
    # structured path must match the generic map for ARBITRARY X — not just
    # the contract's valid-masked inputs (the distributed step feeds it the
    # raw solve output; see subsystems._plan_scatter).
    X = jnp.asarray(rng.standard_normal((p.var_index_map.shape[0], p.C)))
    sref = generic_scatter(p, X)
    sgot = p.scatter_state(X)
    assert np.allclose(np.asarray(sref), np.asarray(sgot), rtol=0, atol=1e-13)
    Xm = X * p.col_valid_dev
    sref = generic_scatter(p, Xm)
    sgot = p.scatter_state(Xm)
    assert np.array_equal(np.asarray(sref), np.asarray(sgot))
    return plan


def build_rbc(Nx=32, Nz=16):
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=Nx, bounds=(0, 4), dealias=3/2)
    zb = d3.ChebyshevT(coords['z'], size=Nz, bounds=(0, 1), dealias=3/2)
    p = dist.Field(name='p', bases=(xb, zb))
    b = dist.Field(name='b', bases=(xb, zb))
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    tau_p = dist.Field(name='tau_p')
    tau_b1 = dist.Field(name='tau_b1', bases=xb)
    tau_b2 = dist.Field(name='tau_b2', bases=xb)
    tau_u1 = dist.VectorField(coords, name='tau_u1', bases=xb)
    tau_u2 = dist.VectorField(coords, name='tau_u2', bases=xb)
    ex, ez = coords.unit_vector_fields(dist)
    lift_basis = zb.derivative_basis(1)
    lift = lambda A: d3.Lift(A, lift_basis, -1)
    grad_u = d3.grad(u) + ez*lift(tau_u1)
    grad_b = d3.grad(b) + ez*lift(tau_b1)
    kappa = nu = 1e-3
    problem = d3.IVP([p, b, u, tau_p, tau_b1, tau_b2, tau_u1, tau_u2],
                     namespace=locals())
    problem.add_equation("trace(grad_u) + tau_p = 0")
    problem.add_equation(
        "dt(b) - kappa*div(grad_b) + lift(tau_b2) = - u@grad(b)")
    problem.add_equation(
        "dt(u) - nu*div(grad_u) + grad(p) - b*ez + lift(tau_u2) "
        "= - u@grad(u)")
    problem.add_equation("b(z=0) = 1")
    problem.add_equation("u(z=0) = 0")
    problem.add_equation("b(z=1) = 0")
    problem.add_equation("u(z=1) = 0")
    problem.add_equation("integ(p) = 0")
    return problem


def test_box_plan_exact():
    solver = build_rbc().build_solver(d3.SBDF2)
    plan = check_pencil(solver.pencil, expect_plan=True)
    assert plan['scatter_ok']


def test_box_plan_banded_order():
    solver = build_rbc().build_solver(d3.SBDF2, matsolver='banded')
    check_pencil(solver.pencil, expect_plan=True)


def test_eq_gather_matches_generic():
    solver = build_rbc().build_solver(d3.SBDF2)
    p = solver.pencil
    rng = np.random.default_rng(3)
    state = jnp.asarray(rng.standard_normal(p.state_total))
    ref = np.asarray(solver.traced_F(state, 0.0))
    # Force generic path and re-evaluate
    p._eq_plans_src = p.eq_index_maps
    p._eq_plans_cache = [None] * len(p.eq_index_maps)
    got = np.asarray(solver.traced_F(state, 0.0))
    assert np.array_equal(ref, got)


def test_ball_plan_fallback_exact():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, shape=(8, 4, 6), radius=1, dealias=3/2)
    u = dist.VectorField(coords, name='u', bases=ball)
    pf = dist.Field(name='p', bases=ball)
    tau_u = dist.VectorField(coords, name='tau_u', bases=ball.surface)
    tau_p = dist.Field(name='tau_p')
    problem = d3.IVP([pf, u, tau_p, tau_u], namespace=locals())
    problem.add_equation("div(u) + tau_p = 0")
    problem.add_equation(
        "dt(u) - lap(u) + grad(p) + Lift(tau_u, ball, -1) = "
        "- u@grad(u)")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("integ(p) = 0")
    solver = problem.build_solver(d3.SBDF2, matsolver='banded')
    # Slot-split maps are not affine in g; fast paths must still be exact
    # (plan is either None or validated-equal).
    check_pencil(solver.pencil)
