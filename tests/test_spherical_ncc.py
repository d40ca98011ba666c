"""
Spherical (ball/shell) NCC suite with angular structure.

Mirrors the reference's dedalus/tests/test_spherical_ncc.py coverage shape:
radial NCCs multiplying scalar and vector operands at ell > 0, end-to-end
through LBVP solves. House pattern: solve  u + w0*u = (1 + w0)*target  and
check u == target (exercises the per-ell Clenshaw NCC blocks against the
transform path; reference basis.py radial NCC matrices + arithmetic.py:560
Gamma coupling).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def _smooth_scalar(phi, theta, r):
    """Cartesian-polynomial scalar (resolves exactly in the ball/shell)."""
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    return x * z + 0.5 * y - 0.3 * z**2 + 0.1


def _build(geom, Nang=(8, 4), Nr=12, dealias=2):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    if geom == 'ball':
        basis = d3.BallBasis(coords, Nang + (Nr,), radius=1.0,
                             dtype=np.float64, dealias=dealias)
    else:
        basis = d3.ShellBasis(coords, Nang + (Nr,), radii=(1.0, 2.0),
                              dtype=np.float64, dealias=dealias)
    return coords, dist, basis


def _fill(dist, f, data, scales=1):
    f.change_scales(scales)
    f.require_grid_space()
    f['g'] = np.broadcast_to(data, np.asarray(f['g']).shape)
    f.require_coeff_space()


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_radial_ncc_scalar_ell(geom):
    """Radial NCC times a scalar with ell > 0 content."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    _fill(dist, w0, 0.5 * r**2 + 0.1 * r**4 if geom == 'ball' else 0.5 * r + 1 / r)
    ncc_g = np.asarray((0.5 * r**2 + 0.1 * r**4) if geom == 'ball'
                       else (0.5 * r + 1 / r))
    target = _smooth_scalar(phi, theta, r)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, (2 + ncc_g) * target)
    u = dist.Field(name='u', bases=basis)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("2*u + w0*u = rhs")
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    assert np.abs(np.asarray(u.data) - target).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_radial_ncc_vector_ell(geom):
    """Radial NCC times a vector operand (per-regularity/per-spin blocks)."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    prof = (1 + 0.3 * r**2) if geom == 'ball' else (1 + 1 / r**2)
    _fill(dist, w0, prof)
    f = dist.Field(name='f', bases=basis)
    _fill(dist, f, _smooth_scalar(phi, theta, r))
    vt = d3.grad(f).evaluate()
    vt.require_grid_space()
    vt.change_scales(1)
    tg = np.array(vt.data)
    rhsv = dist.VectorField(coords, name='rhsv', bases=basis)
    rhsv.change_scales(1)
    rhsv.require_grid_space()
    rhsv['g'] = (2 + np.asarray(prof)) * tg
    rhsv.require_coeff_space()
    w = dist.VectorField(coords, name='w', bases=basis)
    problem = d3.LBVP([w], namespace=locals())
    problem.add_equation("2*w + w0*w = rhsv")
    problem.build_solver().solve()
    w.require_grid_space()
    w.change_scales(1)
    assert np.abs(np.asarray(w.data) - tg).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_full_ncc_scalar_axisymmetric(geom):
    """NCC with full (non-radial-basis) field storage but meridional
    symmetry: ncc lives on the 3D basis, constant in phi and theta."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    _fill(dist, w0, r**2)
    target = _smooth_scalar(phi, theta, r)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, (1 + np.asarray(r**2)) * target)
    u = dist.Field(name='u', bases=basis)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("u + w0*u = rhs")
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    assert np.abs(np.asarray(u.data) - target).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_ncc_on_gradient_operand(geom):
    """NCC multiplying a derivative operand: w0 * grad(u) inside div."""
    coords, dist, basis = _build(geom, Nr=16)
    phi, theta, r = dist.local_grids(basis, scales=1)
    # Variable diffusivity problem: div(w0 grad u) where w0 radial
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    prof = 2 + 0.5 * r**2
    _fill(dist, w0, prof)
    u = dist.Field(name='u', bases=basis)
    if geom == 'ball':
        taus = [dist.Field(name='t1', bases=basis.surface)]
        lifts = "lift(t1, -1)"
        bcs = ["u(r=1) = b_outer"]
    else:
        taus = [dist.Field(name='t1', bases=basis.outer_surface),
                dist.Field(name='t2', bases=basis.outer_surface)]
        lifts = "lift(t1, -1) + lift(t2, -2)"
        bcs = ["u(r=1) = b_inner", "u(r=2) = b_outer"]
    ns = dict(locals())
    ns.update({t.name: t for t in taus})
    ns['lift'] = lambda A, i: d3.Lift(A, basis, i)
    ns['div'] = d3.div
    ns['grad'] = d3.grad
    # Manufactured solution: u = z (Cartesian poly => exact in the basis);
    # grad u = ez; div(w0 ez) = dz(w0) = dw0/dr * cos(theta) = r cos(theta)
    z = r * np.cos(theta)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, np.broadcast_to(r * np.cos(theta),
                                     np.broadcast_shapes(phi.shape, theta.shape, r.shape)))
    ns['rhs'] = rhs
    ns['b_outer'] = dist.Field(name='b_outer', bases=basis.surface if geom == 'ball'
                               else basis.outer_surface)
    bo = ns['b_outer']
    bo.change_scales(1)
    bo.require_grid_space()
    R_out = 1.0 if geom == 'ball' else 2.0
    bo['g'] = np.broadcast_to(R_out * np.cos(theta), np.asarray(bo['g']).shape)
    bo.require_coeff_space()
    if geom == 'shell':
        ns['b_inner'] = dist.Field(name='b_inner', bases=basis.inner_surface)
        bi = ns['b_inner']
        bi.change_scales(1)
        bi.require_grid_space()
        bi['g'] = np.broadcast_to(1.0 * np.cos(theta), np.asarray(bi['g']).shape)
        bi.require_coeff_space()
    problem = d3.LBVP([u] + taus, namespace=ns)
    problem.add_equation(f"div(w0*grad(u)) + {lifts} = rhs")
    for bc in bcs:
        problem.add_equation(bc)
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    zg = np.broadcast_to(z, np.asarray(u.data).shape)
    assert np.abs(np.asarray(u.data) - zg).max() < 1e-9


def _set_grid(dist, f, data):
    f.require_grid_space()
    f.change_scales(1)
    f['g'] = np.broadcast_to(data, np.asarray(f['g']).shape)
    f.require_coeff_space()
    f.change_scales(1)


def _make_rvec(dist, coords, ball, r):
    rvec = dist.VectorField(coords, name='rvec', bases=ball.radial_basis)
    rvec.require_grid_space()
    rvec.change_scales(1)
    g = np.zeros(np.asarray(rvec['g']).shape)
    g[2] = r
    rvec['g'] = g
    rvec.require_coeff_space()
    rvec.change_scales(1)
    return rvec


@pytest.mark.parametrize('triangular', [True, False])
def test_ball_vector_ncc_times_scalar(triangular):
    """Ball tensor NCC (rvec * scalar): envelope-shifted Zernike products
    per (ell, regularity) against eager grid multiplication (reference
    basis.py:4088 _last_axis_component_ncc_matrix)."""
    from dedalus_tpu.core import subsystems
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5), triangular=triangular)
    phi, theta, r = dist.local_grids(ball, scales=1)
    rvec = _make_rvec(dist, coords, ball, r)
    s = dist.Field(name='s', bases=ball)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    _set_grid(dist, s, x * (1 - r**2) + 0.3 * z**2 + 0.1)
    E = rvec * s
    ev = E.evaluate()
    ev.require_coeff_space()
    ev.change_scales(1)
    eager = np.asarray(ev.data)
    coupling = np.array([False, True, True])
    coupled, sps = subsystems.enumerate_subproblems(
        dist, [E.domain, s.domain], coupling)
    for sp in sps:
        mats = E.expression_matrices(sp, [s])
        sl = sp.group_slice(ball.azimuth_basis, 0)
        xp = np.asarray(s.data)[sl, :, :].ravel()
        got = mats[s] @ xp
        want = eager[:, sl, :, :].ravel()
        assert np.abs(got - want).max() < 1e-12


def test_ball_vector_ncc_dot_vector():
    """dot(rvec, u) on the ball: rank-1 x rank-1 NCC contraction through the
    Gamma intertwiner with per-(ell, reg) radial products."""
    from dedalus_tpu.core import subsystems
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    phi, theta, r = dist.local_grids(ball, scales=1)
    rvec = _make_rvec(dist, coords, ball, r)
    u = dist.VectorField(coords, name='u', bases=ball)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    u.require_grid_space()
    u.change_scales(1)
    g = np.zeros(np.asarray(u['g']).shape)
    g[0] = x * (1 - r**2)
    g[1] = z * 0.5 * (1 - r**2)
    g[2] = 0.2 * x * z
    u['g'] = g
    u.require_coeff_space()
    u.change_scales(1)
    D = d3.dot(rvec, u)
    ev = D.evaluate()
    ev.require_coeff_space()
    ev.change_scales(1)
    eager = np.asarray(ev.data)
    coupling = np.array([False, True, True])
    coupled, sps = subsystems.enumerate_subproblems(
        dist, [D.domain, u.domain], coupling)
    for sp in sps:
        mats = D.expression_matrices(sp, [u])
        sl = sp.group_slice(ball.azimuth_basis, 0)
        xp = np.asarray(u.data)[:, sl, :, :].ravel()
        got = mats[u] @ xp
        want = eager[sl, :, :].ravel()
        assert np.abs(got - want).max() < 1e-12


def test_ball_first_order_formulation_steps():
    """First-order ball convection (tau in the divergence constraint via
    rvec*lift(tau_u1), the reference's recommended ball formulation:
    examples internally_heated_convection) builds and steps stably."""
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1, dealias=3 / 2,
                        dtype=np.float64)
    u = dist.VectorField(coords, name='u', bases=ball)
    p = dist.Field(name='p', bases=ball)
    T = dist.Field(name='T', bases=ball)
    tau_p = dist.Field(name='tau_p')
    tau_u1 = dist.VectorField(coords, name='tau_u1', bases=ball.surface)
    tau_T1 = dist.Field(name='tau_T1', bases=ball.surface)
    phi, theta, r = dist.local_grids(ball, scales=1)
    rvec = _make_rvec(dist, coords, ball, r)
    lift_basis = ball.derivative_basis(1)
    lift = lambda A: d3.Lift(A, lift_basis, -1)
    grad_u = d3.grad(u) + rvec * lift(tau_u1)
    grad_T = d3.grad(T) + rvec * lift(tau_T1)
    kappa, nu = 1e-2, 1e-2
    problem = d3.IVP([p, u, T, tau_p, tau_u1, tau_T1], namespace=locals())
    problem.add_equation("trace(grad_u) + tau_p = 0")
    problem.add_equation(
        "dt(u) - nu*div(grad_u) + grad(p) = - u@grad(u) + rvec*T")
    problem.add_equation("dt(T) - kappa*div(grad_T) = - u@grad(T)")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("T(r=1) = 0")
    problem.add_equation("integ(p) = 0")
    solver = problem.build_solver(d3.SBDF2)
    T.require_grid_space()
    T.change_scales(1)
    T['g'] = np.broadcast_to(1 - r**2, np.asarray(T['g']).shape)
    T.require_coeff_space()
    for _ in range(3):
        solver.step(1e-3)
    T.require_coeff_space()
    data = np.asarray(T.data)
    assert np.isfinite(data).all()
    assert np.abs(data).max() < 10.0


def test_ball_nontriangular_roundtrip_and_poisson():
    """triangular=False ball: full radial rectangle at every ell; transforms
    round-trip and a Poisson solve matches the analytic solution."""
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 12), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5), triangular=False)
    phi, theta, r = dist.local_grids(ball, scales=1)
    f = dist.Field(name='f', bases=ball)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    _set_grid(dist, f, x * z + 0.5 * (1 - r**2))
    f2 = np.asarray(f['g'])
    want = np.broadcast_to(x * z + 0.5 * (1 - r**2), f2.shape)
    assert np.abs(f2 - want).max() < 1e-12
    # Poisson: lap(u) = -6, u(r=1) = 0 -> u = 1 - r^2... lap(1-r^2) = -6
    u = dist.Field(name='u', bases=ball)
    tau = dist.Field(name='tau', bases=ball.surface)
    rhs = dist.Field(name='rhs', bases=ball)
    _set_grid(dist, rhs, np.broadcast_to(
        -6.0, np.broadcast_shapes(phi.shape, theta.shape, r.shape)))
    lift = lambda A: d3.Lift(A, ball, -1)
    problem = d3.LBVP([u, tau], namespace=locals())
    problem.add_equation("lap(u) + lift(tau) = rhs")
    problem.add_equation("u(r=1) = 0")
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    ug = np.asarray(u.data)
    assert np.abs(ug - np.broadcast_to(1 - r**2, ug.shape)).max() < 1e-10
