"""
Ball basis tests: transforms, scalar calculus, solves, and the Lane-Emden
gating configuration (reference examples/nlbvp_ball_lane_emden).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dedalus_tpu.public as d3


@pytest.fixture()
def ball_setup():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 4, 12), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    return coords, dist, ball


def _set_grid(dist, field, vals, shape):
    field.change_scales(1)
    field.preset_data(dist.grid_layout, jnp.asarray(np.broadcast_to(vals, shape).copy()))


def test_ball_transform_roundtrip(ball_setup):
    coords, dist, ball = ball_setup
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    zc = r * np.cos(theta)
    fg = 1.0 + x * (1 - r**2) + zc**2
    _set_grid(dist, f, fg, (8, 4, 12))
    f.require_coeff_space()
    c0 = np.asarray(f.data).copy()
    # Band-limited function: spectrally sharp representation
    assert (np.abs(c0) > 1e-12).sum() == 5
    f.require_grid_space()
    assert np.abs(np.asarray(f.data) - fg).max() < 1e-13
    f.require_coeff_space()
    assert np.abs(np.asarray(f.data) - c0).max() < 1e-14


def test_ball_scalar_laplacian(ball_setup):
    coords, dist, ball = ball_setup
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    zc = r * np.cos(theta)
    _set_grid(dist, f, 1.0 + x * (1 - r**2) + zc**2, (8, 4, 12))
    g = d3.lap(f).evaluate()
    g.change_scales(1)
    g.require_grid_space()
    # lap(x(1-r^2)) = -10x; lap(z^2) = 2
    assert np.abs(np.asarray(g.data) - (2.0 - 10.0 * x)).max() < 1e-8


def test_ball_interpolation(ball_setup):
    coords, dist, ball = ball_setup
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    zc = r * np.cos(theta)
    _set_grid(dist, f, 1.0 + zc**2, (8, 4, 12))
    h = f(r=1).evaluate()
    h.change_scales(1)
    h.require_grid_space()
    hv = np.asarray(h.data)
    assert hv.shape == (8, 4, 1)
    assert np.abs(hv[..., 0] - (1.0 + np.cos(theta[:, :, 0])**2)).max() < 1e-13


def test_ball_lbvp_manufactured():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    Nr = 16
    ball = d3.BallBasis(coords, (1, 1, Nr), radius=1, dtype=np.float64, dealias=2)
    f = dist.Field(name='f', bases=ball)
    tau = dist.Field(name='tau', bases=ball.surface)
    g = dist.Field(name='g', bases=ball)
    lift = lambda A: d3.Lift(A, ball, -1)
    phi, theta, r = dist.local_grids(ball, scales=1)
    fstar = 2 - r**2 - r**4
    _set_grid(dist, g, -6 - 20 * r**2, (1, 1, Nr))
    problem = d3.LBVP([f, tau], namespace=locals())
    problem.add_equation("lap(f) + lift(tau) = g")
    problem.add_equation("f(r=1) = 0")
    problem.build_solver().solve()
    f.require_grid_space(); f.change_scales(1)
    assert np.abs(np.asarray(f.data) - fstar).max() < 1e-13


def test_ball_ncc_lbvp():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    Nr = 16
    ball = d3.BallBasis(coords, (1, 1, Nr), radius=1, dtype=np.float64, dealias=2)
    f = dist.Field(name='f', bases=ball)
    tau = dist.Field(name='tau', bases=ball.surface)
    g = dist.Field(name='g', bases=ball)
    ncc = dist.Field(name='ncc', bases=ball)
    lift = lambda A: d3.Lift(A, ball, -1)
    phi, theta, r = dist.local_grids(ball, scales=1)
    _set_grid(dist, ncc, 2 + r**2, (1, 1, Nr))
    _set_grid(dist, g, -6 + 2 - r**2 - r**4, (1, 1, Nr))
    problem = d3.LBVP([f, tau], namespace=locals())
    problem.add_equation("lap(f) + ncc*f + lift(tau) = g")
    problem.add_equation("f(r=1) = 0")
    problem.build_solver().solve()
    f.require_grid_space(); f.change_scales(1)
    assert np.abs(np.asarray(f.data) - (1 - r**2)).max() < 1e-13


def test_lane_emden_gating():
    # GATING: reference examples/nlbvp_ball_lane_emden (n=3). The converged
    # radius must match Boyd's published value.
    Nr = 64
    n = 3.0
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (1, 1, Nr), radius=1, dtype=np.float64, dealias=2)
    f = dist.Field(name='f', bases=ball)
    tau = dist.Field(name='tau', bases=ball.surface)
    lift = lambda A: d3.Lift(A, ball, -1)
    problem = d3.NLBVP([f, tau], namespace=locals())
    problem.add_equation("lap(f) + lift(tau) = - f**n")
    problem.add_equation("f(r=1) = 0")
    phi, theta, r = dist.local_grids(ball)
    f.change_scales(ball.dealias)
    f['g'] = 5**(2 / (n - 1)) * (1 - r**2)**2
    solver = problem.build_solver()
    for i in range(20):
        pert_norm = solver.newton_iteration()
        if pert_norm < 1e-10:
            break
    f0 = f(r=0).evaluate()
    f0.change_scales(1); f0.require_grid_space()
    Ri = float(np.asarray(f0.data).ravel()[0])**((n - 1) / 2)
    assert abs(Ri - 6.896848619376960375454528) < 1e-10


# --- 3D spherical shell ---

def test_shell_roundtrip_and_lap():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    Nr = 16
    shell = d3.ShellBasis(coords, (8, 4, Nr), radii=(1, 2), dtype=np.float64,
                          dealias=(1.5, 1.5, 1.5))
    f = dist.Field(name='f', bases=shell)
    phi, theta, r = dist.local_grids(shell, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    zc = r * np.cos(theta)
    fg = 1.0 + x * (2 - r) + zc**2
    _set_grid(dist, f, fg, (8, 4, Nr))
    f.require_coeff_space()
    f.require_grid_space()
    assert np.abs(np.asarray(f.data) - fg).max() < 1e-13
    g = d3.lap(f).evaluate()
    g.change_scales(1); g.require_grid_space()
    # lap(x(2-r)) = -4x/r; lap(z^2) = 2
    assert np.abs(np.asarray(g.data) - (2.0 - 4 * x / r)).max() < 1e-8


def test_shell_ncc_lbvp_two_bcs():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    Nr = 24
    shell = d3.ShellBasis(coords, (1, 1, Nr), radii=(1, 2), dtype=np.float64, dealias=1.5)
    f = dist.Field(name='f', bases=shell)
    tau1 = dist.Field(name='tau1', bases=shell.outer_surface)
    tau2 = dist.Field(name='tau2', bases=shell.outer_surface)
    g = dist.Field(name='g', bases=shell)
    ncc = dist.Field(name='ncc', bases=shell)
    lift = lambda A, i: d3.Lift(A, shell, i)
    phi, theta, r = dist.local_grids(shell, scales=1)
    fstar = (r - 1) * (2 - r)
    _set_grid(dist, ncc, 1 + r, (1, 1, Nr))
    _set_grid(dist, g, (-6 + 6 / r) + (1 + r) * fstar, (1, 1, Nr))
    problem = d3.LBVP([f, tau1, tau2], namespace=locals())
    problem.add_equation("lap(f) + ncc*f + lift(tau1, -1) + lift(tau2, -2) = g")
    problem.add_equation("f(r=1) = 0")
    problem.add_equation("f(r=2) = 0")
    problem.build_solver().solve()
    f.require_grid_space(); f.change_scales(1)
    assert np.abs(np.asarray(f.data) - fstar).max() < 1e-13


def test_shell_nonlinear_ivp():
    from dedalus_tpu.core.timesteppers import SBDF2
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    shell = d3.ShellBasis(coords, (8, 4, 12), radii=(1, 2), dtype=np.float64, dealias=1.5)
    f = dist.Field(name='f', bases=shell)
    tau1 = dist.Field(name='tau1', bases=shell.outer_surface)
    tau2 = dist.Field(name='tau2', bases=shell.outer_surface)
    lift = lambda A, i: d3.Lift(A, shell, i)
    problem = d3.IVP([f, tau1, tau2], namespace=locals())
    problem.add_equation("dt(f) - lap(f) + lift(tau1, -1) + lift(tau2, -2) = - f*f")
    problem.add_equation("f(r=1) = 0")
    problem.add_equation("f(r=2) = 0")
    solver = problem.build_solver(SBDF2)
    phi, theta, r = dist.local_grids(shell, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    _set_grid(dist, f, 0.1 * x * (r - 1) * (2 - r), (8, 4, 12))
    solver.run_steps(1e-3, 20)
    f.require_coeff_space(); f.change_scales(1)
    assert np.isfinite(np.asarray(f.data)).all()
    b = f(r=1).evaluate(); b.change_scales(1); b.require_grid_space()
    assert np.abs(np.asarray(b.data)).max() < 1e-12


# --- tensor (regularity) machinery ---

def test_intertwiner_orthogonality():
    from dedalus_tpu.spectral import intertwiner as it
    for rank in (1, 2):
        for ell in (0, 1, 2, 5, 11):
            Q = it.Q_matrix(ell, rank)
            QQ = Q @ Q.T
            # Orthogonal on the allowed subspace: diagonal of 0s and 1s
            assert np.abs(QQ - np.diag(np.diag(QQ))).max() < 1e-12
            d = np.diag(QQ)
            assert np.all((np.abs(d) < 1e-12) | (np.abs(d - 1) < 1e-12))


def test_ball_vector_roundtrip_and_gradient():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    zc = r * np.cos(theta)
    _set_grid(dist, f, x * (1 - r**2) + zc**2, (8, 6, 10))
    # grad(f) via cartesian components F projected to spherical unit vectors
    Fx = (1 - r**2) - 2 * x**2
    Fy = -2 * x * y
    Fz = 2 * zc - 2 * x * zc
    g_phi = -np.sin(phi) * Fx + np.cos(phi) * Fy
    g_th = np.cos(theta) * np.cos(phi) * Fx + np.cos(theta) * np.sin(phi) * Fy \
        - np.sin(theta) * Fz
    g_r = np.sin(theta) * np.cos(phi) * Fx + np.sin(theta) * np.sin(phi) * Fy \
        + np.cos(theta) * Fz
    g = d3.grad(f).evaluate()
    g.change_scales(1); g.require_grid_space()
    gd = np.asarray(g.data)
    for i, exp in enumerate((g_phi, g_th, g_r)):
        assert np.abs(gd[i] - np.broadcast_to(exp, (8, 6, 10))).max() < 1e-10
    # Vector transform roundtrip through regularity components
    u = d3.grad(f).evaluate()
    u.require_coeff_space(); c0 = np.asarray(u.data).copy()
    u.require_grid_space(); u.require_coeff_space()
    assert np.abs(np.asarray(u.data) - c0).max() < 1e-13
    # div(grad) = lap, eagerly and through subproblem matrices
    dg = d3.div(d3.grad(f)).evaluate()
    dg.change_scales(1); dg.require_grid_space()
    assert np.abs(np.asarray(dg.data) - (2.0 - 10.0 * x)).max() < 1e-8
    lap_u = d3.lap(u).evaluate()
    exp2 = d3.grad(d3.lap(f)).evaluate()
    lap_u.require_coeff_space(); lap_u.change_scales(1)
    exp2.require_coeff_space(); exp2.change_scales(1)
    assert np.abs(np.asarray(lap_u.data) - np.asarray(exp2.data)).max() < 1e-12


def test_ball_vector_matrices_match_eager():
    from dedalus_tpu.core import subsystems
    import jax.numpy as jnp
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    s = dist.Field(name='s', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    _set_grid(dist, s, x * (1 - r**2), (8, 6, 10))
    s.require_coeff_space(); s.change_scales(1)
    E = d3.div(d3.grad(s))
    coupling = np.array([False, True, True])
    coupled, sps = subsystems.enumerate_subproblems(dist, [E.domain, s.domain], coupling)
    ev = E.evaluate(); ev.require_coeff_space(); ev.change_scales(1)
    eager = np.asarray(ev.data)
    for sp in sps:
        mats = E.expression_matrices(sp, [s])
        sl = sp.group_slice(ball.azimuth_basis, 0)
        xp = np.asarray(s.data)[sl, :, :].ravel()
        assert np.abs(mats[s] @ xp - eager[sl, :, :].ravel()).max() < 1e-12


def test_shell_vector_gradient():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    shell = d3.ShellBasis(coords, (8, 6, 12), radii=(1, 2), dtype=np.float64,
                          dealias=(1.5, 1.5, 1.5))
    f = dist.Field(name='f', bases=shell)
    phi, theta, r = dist.local_grids(shell, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    zc = r * np.cos(theta)
    _set_grid(dist, f, x * (2 - r) + zc**2, (8, 6, 12))
    Fx = (2 - r) - x**2 / r
    Fy = -x * y / r
    Fz = 2 * zc - x * zc / r
    g_phi = -np.sin(phi) * Fx + np.cos(phi) * Fy
    g_th = np.cos(theta) * np.cos(phi) * Fx + np.cos(theta) * np.sin(phi) * Fy \
        - np.sin(theta) * Fz
    g_r = np.sin(theta) * np.cos(phi) * Fx + np.sin(theta) * np.sin(phi) * Fy \
        + np.cos(theta) * Fz
    g = d3.grad(f).evaluate()
    g.change_scales(1); g.require_grid_space()
    gd = np.asarray(g.data)
    for i, exp in enumerate((g_phi, g_th, g_r)):
        assert np.abs(gd[i] - np.broadcast_to(exp, (8, 6, 12))).max() < 1e-10
    dg = d3.div(d3.grad(f)).evaluate()
    dg.change_scales(1); dg.require_grid_space()
    assert np.abs(np.asarray(dg.data) - (2.0 - 4 * x / r)).max() < 1e-8


def test_ball_vector_poisson_with_vector_bc():
    # Vector Poisson in the ball with a vector tau and full vector Dirichlet
    # BC: exercises tensor lifts, tensor interpolation (reg->spin at the
    # boundary), and the joint per-component regularity validity.
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 12), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    s = dist.Field(name='s', bases=ball)
    u = dist.VectorField(coords, name='u', bases=ball)
    tau_u = dist.VectorField(coords, name='tau_u', bases=ball.surface)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    zc = r * np.cos(theta)
    _set_grid(dist, s, x * (1 - r**2) + zc**2, (8, 6, 12))
    ustar = d3.grad(s).evaluate()
    F = d3.grad(d3.lap(s)).evaluate()
    lift = lambda A: d3.Lift(A, ball, -1)
    problem = d3.LBVP([u, tau_u], namespace=locals())
    problem.add_equation("lap(u) + lift(tau_u) = F")
    problem.add_equation("u(r=1) = ustar(r=1)")
    problem.build_solver().solve()
    u.change_scales(1); u.require_grid_space()
    ustar.change_scales(1); ustar.require_grid_space()
    assert np.abs(np.asarray(u.data) - np.asarray(ustar.data)).max() < 1e-12


def test_ball_vector_interpolation():
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 6, 10), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    s = dist.Field(name='s', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    zc = r * np.cos(theta)
    _set_grid(dist, s, x * (1 - r**2) + zc**2, (8, 6, 10))
    u = d3.grad(s).evaluate()
    h = u(r=1).evaluate()
    h.change_scales(1); h.require_grid_space()
    hd = np.asarray(h.data)
    th = theta[:, :, 0]; ph = phi[:, :, 0]
    x1 = np.sin(th + 0 * ph) * np.cos(ph)
    y1 = np.sin(th) * np.sin(ph + 0 * th)
    z1 = np.cos(th) + 0 * ph
    Fx1 = -2 * x1**2
    Fy1 = -2 * x1 * y1
    Fz1 = 2 * z1 - 2 * x1 * z1
    e_phi = -np.sin(ph) * Fx1 + np.cos(ph) * Fy1
    e_th = np.cos(th) * np.cos(ph) * Fx1 + np.cos(th) * np.sin(ph) * Fy1 \
        - np.sin(th) * Fz1
    e_r = np.sin(th) * np.cos(ph) * Fx1 + np.sin(th) * np.sin(ph) * Fy1 \
        + np.cos(th) * Fz1
    for i, exp in enumerate((e_phi, e_th, e_r)):
        assert np.abs(hd[i][:, :, 0] - exp).max() < 1e-11


def test_ball_convection_gating():
    # GATING: reference examples/ivp_ball_internally_heated_convection
    # (no-slip variant; the stress-free BC needs the angular/radial component
    # selectors, round 2). Exercises the full 3D spherical IVP stack: vector
    # unknowns, incompressibility with gauge, buoyancy, vector taus/BCs.
    from dedalus_tpu.core.timesteppers import SBDF2
    import jax.numpy as jnp
    Nphi, Ntheta, Nr = 8, 4, 10
    Rayleigh, Prandtl = 1e4, 1
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (Nphi, Ntheta, Nr), radius=1, dealias=1.5,
                        dtype=np.float64)
    u = dist.VectorField(coords, name='u', bases=ball)
    p = dist.Field(name='p', bases=ball)
    T = dist.Field(name='T', bases=ball)
    tau_p = dist.Field(name='tau_p')
    tau_u = dist.VectorField(coords, name='tau_u', bases=ball.surface)
    tau_T = dist.Field(name='tau_T', bases=ball.surface)
    phi, theta, r = dist.local_grids(ball, scales=1)
    r_vec = dist.VectorField(coords, name='r_vec', bases=ball)
    r_vec.change_scales(1)
    rv = np.zeros((3, Nphi, Ntheta, Nr)); rv[2] = r
    r_vec.preset_data(dist.grid_layout, jnp.asarray(rv))
    T_source = 6
    kappa = (Rayleigh * Prandtl)**(-1/2)
    nu = (Rayleigh / Prandtl)**(-1/2)
    lift = lambda A: d3.Lift(A, ball, -1)
    problem = d3.IVP([p, u, T, tau_p, tau_u, tau_T], namespace=locals())
    problem.add_equation("div(u) + tau_p = 0")
    problem.add_equation(
        "dt(u) - nu*lap(u) + grad(p) + lift(tau_u) = - u@grad(u) + r_vec*T")
    problem.add_equation(
        "dt(T) - kappa*lap(T) + lift(tau_T) = - u@grad(T) + kappa*T_source")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("T(r=1) = 0")
    problem.add_equation("integ(p) = 0")
    solver = problem.build_solver(SBDF2)
    T.fill_random('g', seed=42, distribution='normal', scale=0.01)
    T.change_scales(1); T.require_grid_space()
    T.preset_data(dist.grid_layout,
                  T.data + jnp.asarray(np.broadcast_to(1 - r**2, (Nphi, Ntheta, Nr)).copy()))
    solver.run_steps(2e-3, 20)
    for f in (u, T, p):
        f.require_coeff_space()
        assert np.isfinite(np.asarray(f.data)).all()
    bc = u(r=1).evaluate(); bc.require_coeff_space()
    assert np.abs(np.asarray(bc.data)).max() < 1e-14
    dv = d3.div(u).evaluate(); dv.require_coeff_space()
    assert np.abs(np.asarray(dv.data)).max() < 1e-14


def test_ball_volume_integral():
    import jax.numpy as jnp
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (8, 4, 12), radius=1.0, dtype=np.float64,
                        dealias=(1.5, 1.5, 1.5))
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    _set_grid(dist, f, 1 - r**2, (8, 4, 12))
    v = d3.integ(f).evaluate()
    v.require_grid_space()
    assert abs(float(np.asarray(v.data).ravel()[0]) - 4 * np.pi * (1/3 - 1/5)) < 1e-13


def test_ball_convection_stress_free():
    """Internally heated ball convection with STRESS-FREE boundary conditions
    (gating config 5b full parity; ref examples/ivp_ball_internally_heated_
    convection): no-penetration radial(u)=0 + vanishing shear stress via the
    angular/radial component selectors on the boundary strain rate."""
    from dedalus_tpu.core.timesteppers import SBDF2
    import jax.numpy as jnp
    Nphi, Ntheta, Nr = 8, 4, 10
    Rayleigh, Prandtl = 1e4, 1
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (Nphi, Ntheta, Nr), radius=1, dealias=1.5,
                        dtype=np.float64)
    u = dist.VectorField(coords, name='u', bases=ball)
    p = dist.Field(name='p', bases=ball)
    T = dist.Field(name='T', bases=ball)
    tau_p = dist.Field(name='tau_p')
    tau_u = dist.VectorField(coords, name='tau_u', bases=ball.surface)
    tau_T = dist.Field(name='tau_T', bases=ball.surface)
    phi, theta, r = dist.local_grids(ball, scales=1)
    r_vec = dist.VectorField(coords, name='r_vec', bases=ball)
    r_vec.change_scales(1)
    rv = np.zeros((3, Nphi, Ntheta, Nr)); rv[2] = r
    r_vec.preset_data(dist.grid_layout, jnp.asarray(rv))
    T_source = 6
    kappa = (Rayleigh * Prandtl)**(-1/2)
    nu = (Rayleigh / Prandtl)**(-1/2)
    lift = lambda A: d3.Lift(A, ball, -1)
    strain_rate = d3.grad(u) + d3.transpose(d3.grad(u))
    shear_stress = d3.angular(d3.radial(strain_rate(r=1), index=1))
    problem = d3.IVP([p, u, T, tau_p, tau_u, tau_T], namespace=locals())
    problem.add_equation("div(u) + tau_p = 0")
    problem.add_equation(
        "dt(u) - nu*lap(u) + grad(p) + lift(tau_u) = - u@grad(u) + r_vec*T")
    problem.add_equation(
        "dt(T) - kappa*lap(T) + lift(tau_T) = - u@grad(T) + kappa*T_source")
    problem.add_equation("shear_stress = 0")
    problem.add_equation("radial(u(r=1)) = 0")
    problem.add_equation("T(r=1) = 0")
    problem.add_equation("integ(p) = 0")
    solver = problem.build_solver(SBDF2)
    T.fill_random('g', seed=42, distribution='normal', scale=0.01)
    T.change_scales(1); T.require_grid_space()
    T.preset_data(dist.grid_layout,
                  T.data + jnp.asarray(np.broadcast_to(1 - r**2, (Nphi, Ntheta, Nr)).copy()))
    solver.run_steps(2e-3, 20)
    for f in (u, T, p):
        f.require_coeff_space()
        assert np.isfinite(np.asarray(f.data)).all()
    # No penetration
    bc = d3.radial(u(r=1)).evaluate(); bc.require_coeff_space()
    assert np.abs(np.asarray(bc.data)).max() < 1e-13
    # Stress-free
    ss = shear_stress.evaluate(); ss.require_coeff_space()
    assert np.abs(np.asarray(ss.data)).max() < 1e-12


def test_spherical_curl_identities():
    """curl(grad f) = 0, div(curl v) = 0 to roundoff, and
    curl(Omega z_hat x r) = 2 Omega z_hat (ref operators.py:3838)."""
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (16, 8, 8), radius=1.0, dtype=np.float64)
    f = dist.Field(name='f', bases=ball)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    f.change_scales(1)
    f['g'] = x * (x + z) + 0.3 * z**2
    cg = d3.curl(d3.grad(f)).evaluate()
    cg.require_coeff_space()
    assert np.abs(np.asarray(cg.data)).max() < 1e-14
    dc = d3.div(d3.curl(d3.grad(f) + 2 * d3.grad(f * f))).evaluate()
    dc.require_coeff_space()
    assert np.abs(np.asarray(dc.data)).max() < 1e-14
    # Rigid rotation: curl(Omega ez x r) = 2 Omega ez
    Omega = 1.3
    urot = dist.VectorField(coords, name='urot', bases=ball)
    urot.change_scales(1)
    shape = np.broadcast_shapes(phi.shape, theta.shape, r.shape)
    data = np.zeros((3,) + shape)
    data[0] = Omega * r * np.sin(theta)
    urot['g'] = data
    w = d3.curl(urot).evaluate()
    w.change_scales(1)
    w.require_grid_space()
    wg = np.asarray(w.data)
    exp = np.zeros_like(wg)
    exp[1] = np.broadcast_to(-2 * Omega * np.sin(theta), shape)
    exp[2] = np.broadcast_to(2 * Omega * np.cos(theta), shape)
    assert np.abs(wg - exp).max() < 1e-12


def test_spherical_component_selectors():
    """radial/angular selectors on surface fields match analytic components
    (ref operators.py:2231-2312)."""
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (16, 8, 8), radius=1.0, dtype=np.float64)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    f = dist.Field(bases=ball)
    f.change_scales(1)
    f['g'] = x * z
    u = d3.grad(f)  # cartesian (z, 0, x)
    ph = phi.ravel()[:, None]
    th = theta.ravel()[None, :]
    xs = np.sin(th) * np.cos(ph)
    zs = np.cos(th) * np.ones_like(ph)
    ur = d3.radial(u(r=1)).evaluate()
    ur.change_scales(1)
    ur.require_grid_space()
    assert np.abs(np.asarray(ur.data)[..., 0] - 2 * xs * zs).max() < 1e-12
    ua = d3.angular(u(r=1)).evaluate()
    assert ua.tensorsig[0].dim == 2
    ua.change_scales(1)
    ua.require_grid_space()
    ga = np.asarray(ua.data)[..., 0]
    assert np.abs(ga[0] - (-zs * np.sin(ph))).max() < 1e-12
    assert np.abs(ga[1] - (zs * np.cos(th) * np.cos(ph) - xs * np.sin(th))).max() < 1e-12


def test_spherical_trace_transpose():
    """Trace and transpose act through the per-ell Q-conjugation: for
    T = grad(u), trace(T) = div(u) and transpose is an involution matching
    the grid-space component swap."""
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    ball = d3.BallBasis(coords, (16, 8, 8), radius=1.0, dtype=np.float64)
    phi, theta, r = dist.local_grids(ball, scales=1)
    x = r * np.sin(theta) * np.cos(phi)
    z = r * np.cos(theta)
    f = dist.Field(bases=ball)
    f.change_scales(1)
    f['g'] = x * z + 0.2 * x * x
    u = d3.grad(f)
    T = d3.grad(u)
    tr = d3.trace(T).evaluate()
    dv = d3.div(u).evaluate()
    tr.require_coeff_space(); dv.require_coeff_space()
    assert np.abs(np.asarray(tr.data) - np.asarray(dv.data)).max() < 1e-13
    # transpose is an involution; grad(grad f) is symmetric
    TT = d3.transpose(T).evaluate()
    T0 = T.evaluate()
    T0.require_coeff_space(); TT.require_coeff_space()
    assert np.abs(np.asarray(TT.data) - np.asarray(T0.data)).max() < 1e-12


def test_ball_ivp_banded_matsolver_matches_lu():
    """Ball saddle pencils (incompressible u + p, tau method) factor through
    the banded matsolver via QR pivot pinning — zero dense overrides — and
    the trajectory matches dense LU (the reference solves these pencils at
    O(band) via sparse LU; matsolvers.py:70-183)."""
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.ball import build_ball_problem, set_conductive_ic

    def run(matsolver, n=3):
        problem, ctx = build_ball_problem(8, 4, 32, Rayleigh=1e4)
        solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
        set_conductive_ic(ctx)
        solver.run_steps(1e-4, n)
        return np.asarray(solver.state_flat()), solver

    ref, _ = run('lu')
    got, solver = run('banded')
    assert solver.matsolver == 'banded'
    banded = solver.timestepper._current_fact.banded
    assert len(banded.bad_idx) == 0, "expected zero dense overrides"
    err = np.abs(ref - got).max()
    # Threshold 3e-9, not 1e-9: pinned-saddle trajectories converge to a
    # conditioning-set refinement FLOOR that is sensitive to the f64
    # contraction ORDER of the exact apply (see ops/banded.py Woodbury
    # notes; floors measured between 2e-10 and 3.5e-9 across orderings).
    # Shipping the scheme weights as runtime arrays — required so compiled
    # run programs are value-free and shareable across (a0, b0)
    # factorizations — moved this measured floor from ~8e-10 to 1.31e-9
    # (stagnant: 1.51e-9 even at 8 refinement passes, so it is the floor,
    # not under-refinement).
    assert err < 3e-9, f"ball banded trajectory mismatch: {err}"


def test_ball_ivp_banded_two_tier_woodbury_matches_lu():
    """Accelerator-style two-tier Woodbury shipping (f32 factors + f64
    fix-up restricted to the pinned/ill groups; see banded._ship_woodbury)
    forced on CPU: the pinned ball-saddle trajectory must still track dense
    LU. Guards the 2048x512-scale memory path (all-f64 border factors cost
    ~1.8 GB there)."""
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.ball import build_ball_problem, set_conductive_ic
    from dedalus_tpu.utils.config import config

    def run(matsolver, n=3):
        problem, ctx = build_ball_problem(8, 4, 32, Rayleigh=1e4)
        solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
        set_conductive_ic(ctx)
        solver.run_steps(1e-4, n)
        return np.asarray(solver.state_flat()), solver

    ref, _ = run('lu')
    old = config.get('linear algebra', 'woodbury_two_tier', fallback='auto')
    config.set('linear algebra', 'woodbury_two_tier', 'force')
    try:
        got, solver = run('banded')
    finally:
        config.set('linear algebra', 'woodbury_two_tier', old)
    banded = solver.timestepper._current_fact.banded
    assert 'illg' in banded.fac, "expected an f64 fix-up group set"
    assert len(banded._illg) > 0
    err = np.abs(ref - got).max()
    assert err < 5e-9, f"two-tier ball banded trajectory mismatch: {err}"
