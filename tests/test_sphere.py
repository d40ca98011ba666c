"""
Sphere-surface (S2) tests: SWSH transforms, spin calculus vs analytic
spherical harmonic identities, and solves (mirrors dedalus/tests sphere
suites).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


@pytest.fixture(scope='module')
def sph():
    coords = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.SphereBasis(coords, (24, 12), radius=1, dealias=(1.5, 1.5))
    phi, theta = basis.global_grids(scales=(1, 1))
    return coords, dist, basis, phi.reshape(-1, 1), theta.reshape(1, -1)


def grid1(expr):
    f = expr.evaluate()
    f.change_scales(1)
    f.require_grid_space()
    return np.array(f.data)


def test_sphere_scalar_roundtrip(sph):
    coords, dist, basis, phi, theta = sph
    f = dist.Field(name='f', bases=basis)
    # Y_21-like smooth function
    fg = np.sin(theta) * np.cos(theta) * np.cos(phi) + np.cos(theta)**2
    f['g'] = fg
    np.array(f['c'])
    assert np.abs(np.array(f['g']) - fg).max() < 1e-12


def test_sphere_laplacian(sph):
    coords, dist, basis, phi, theta = sph
    f = dist.Field(name='f', bases=basis)
    # f = Y_2^1-like: sin(theta)cos(theta)cos(phi): lap = -l(l+1) f = -6 f
    fg = np.sin(theta) * np.cos(theta) * np.cos(phi)
    f['g'] = fg
    lap_d = grid1(d3.lap(f))
    assert np.abs(lap_d + 6 * fg).max() < 1e-10


def test_sphere_gradient(sph):
    coords, dist, basis, phi, theta = sph
    f = dist.Field(name='f', bases=basis)
    # f = cos(theta) (= Y_10): grad = (0, -sin(theta)) in (phi, theta) comps
    f['g'] = np.cos(theta) * np.ones_like(phi)
    gd = grid1(d3.grad(f))
    assert np.abs(gd[0]).max() < 1e-11
    assert np.abs(gd[1] + np.sin(theta)).max() < 1e-11
    # f2 = sin(theta)sin(phi): grad_phi = cos(phi), grad_theta = cos(theta)sin(phi)
    f2 = dist.Field(name='f2', bases=basis)
    f2['g'] = np.sin(theta) * np.sin(phi)
    gd2 = grid1(d3.grad(f2))
    assert np.abs(gd2[0] - np.cos(phi)).max() < 1e-11
    assert np.abs(gd2[1] - np.cos(theta) * np.sin(phi)).max() < 1e-11


def test_sphere_div_grad_is_lap(sph):
    coords, dist, basis, phi, theta = sph
    f = dist.Field(name='f', bases=basis)
    f['g'] = np.sin(theta)**2 * np.cos(2 * phi) + np.cos(theta)
    a = grid1(d3.div(d3.grad(f)))
    b = grid1(d3.lap(f))
    assert np.abs(a - b).max() < 1e-10


def test_sphere_skew_mulcos(sph):
    coords, dist, basis, phi, theta = sph
    u = dist.VectorField(coords, name='u', bases=basis)
    # u = grad(sin(theta)sin(phi)) (smooth vector field)
    f = dist.Field(name='f', bases=basis)
    f['g'] = np.sin(theta) * np.sin(phi)
    g = d3.grad(f).evaluate()
    g.change_scales(1)
    g.require_grid_space()
    gd = np.array(g.data)
    u['g'] = gd
    sk = grid1(d3.skew(u))
    # skew: (u_phi, u_theta) -> (-u_theta, u_phi)
    assert np.abs(sk[0] + gd[1]).max() < 1e-10
    assert np.abs(sk[1] - gd[0]).max() < 1e-10
    mc = grid1(d3.MulCosine(u))
    assert np.abs(mc - np.cos(theta) * gd).max() < 1e-10


def test_sphere_integ_ave(sph):
    coords, dist, basis, phi, theta = sph
    f = dist.Field(name='f', bases=basis)
    f['g'] = 3.0 + np.sin(theta) * np.cos(phi) + np.cos(theta)
    iv = d3.Integrate(f).evaluate()
    iv.change_scales(1)
    val = float(np.array(iv['g']).ravel()[0])
    assert abs(val - 3.0 * 4 * np.pi) < 1e-10
    av = d3.Average(f).evaluate()
    av.change_scales(1)
    assert abs(float(np.array(av['g']).ravel()[0]) - 3.0) < 1e-11


def test_sphere_poisson_lbvp(sph):
    coords, dist, basis, phi, theta = sph
    # lap(u) + c = F with ave(u) = 0 gauge; F = -6 Y21-like
    u = dist.Field(name='u', bases=basis)
    c = dist.Field(name='c')
    F_field = dist.Field(name='F_field', bases=basis)
    fg = np.sin(theta) * np.cos(theta) * np.cos(phi)
    F_field['g'] = -6 * fg
    problem = d3.LBVP([u, c], namespace=locals())
    problem.add_equation("lap(u) + c = F_field")
    problem.add_equation("ave(u) = 0")
    solver = problem.build_solver()
    solver.solve()
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - fg).max() < 1e-11


def test_sphere_diffusion_ivp(sph):
    coords, dist, basis, phi, theta = sph
    u = dist.Field(name='u', bases=basis)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - lap(u) = 0")
    solver = problem.build_solver(d3.SBDF2)
    fg = np.sin(theta) * np.cos(theta) * np.cos(phi)  # l=2 mode: decay rate 6
    u['g'] = fg
    n, timestep = 200, 1e-4
    for _ in range(n):
        solver.step(timestep)
    u.change_scales(1)
    exact = np.exp(-6 * n * timestep) * fg
    assert np.abs(np.array(u['g']) - exact).max() < 1e-6


def test_sphere_vector_ivp_smoke(sph):
    coords, dist, basis, phi, theta = sph
    u = dist.VectorField(coords, name='u', bases=basis)
    h = dist.Field(name='h', bases=basis)
    problem = d3.IVP([u, h], namespace=locals())
    problem.add_equation("dt(u) - lap(u) + grad(h) = - MulCosine(skew(u))")
    problem.add_equation("dt(h) - lap(h) + div(u) = 0")
    solver = problem.build_solver(d3.RK222)
    h['g'] = np.sin(theta) * np.cos(theta) * np.cos(phi)
    for _ in range(10):
        solver.step(1e-3)
    h.change_scales(1)
    assert np.isfinite(np.array(h['g'])).all()
    u.change_scales(1)
    assert np.isfinite(np.array(u['g'])).all()


def test_shallow_water_gating():
    # GATING: reference examples/ivp_sphere_shallow_water (Galewsky jet).
    # Balanced-height LBVP + viscous shallow-water IVP with Coriolis
    # (MulCosine/skew), hyperdiffusion, and vector advection. Checks
    # stability and mass conservation.
    import jax.numpy as jnp
    meter = 1 / 6.37122e6
    second = 1 / 3600
    Nphi, Ntheta = 32, 16
    R = 6.37122e6 * meter
    Omega = 7.292e-5 / second
    nu = 1e5 * meter**2 / second / 8**2
    g = 9.80616 * meter / second**2
    H = 1e4 * meter
    timestep = 600 * second
    coords = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(coords, dtype=np.float64)
    basis = d3.SphereBasis(coords, (Nphi, Ntheta), radius=R, dealias=1.5,
                           dtype=np.float64)
    u = dist.VectorField(coords, name='u', bases=basis)
    h = dist.Field(name='h', bases=basis)
    zcross = lambda A: d3.MulCosine(d3.skew(A))
    phi, theta = dist.local_grids(basis, scales=1)
    lat = np.pi / 2 - theta + 0 * phi
    umax = 80 * meter / second
    lat0, lat1 = np.pi / 7, np.pi / 2 - np.pi / 7
    en = np.exp(-4 / (lat1 - lat0)**2)
    jet = (lat0 <= lat) * (lat <= lat1)
    ug = np.zeros((2, Nphi, Ntheta))
    with np.errstate(divide='ignore', over='ignore', invalid='ignore'):
        prof = umax / en * np.exp(1 / (lat - lat0) / (lat - lat1))
    ug[0] = np.where(jet, prof, 0.0)
    u.change_scales(1)
    u.preset_data(dist.grid_layout, jnp.asarray(ug))
    # Balanced height via LBVP with a gauge constant
    c = dist.Field(name='c')
    problem = d3.LBVP([h, c], namespace=locals())
    problem.add_equation("g*lap(h) + c = - div(u@grad(u) + 2*Omega*zcross(u))")
    problem.add_equation("ave(h) = 0")
    problem.build_solver().solve()
    h.require_grid_space(); h.change_scales(1)
    assert np.isfinite(np.asarray(h.data)).all()
    assert 1e-6 < np.abs(np.asarray(h.data)).max() < 1e-2
    mass0 = float(np.asarray(d3.integ(h).evaluate()['g']).ravel()[0])
    # IVP
    problem = d3.IVP([u, h], namespace=locals())
    problem.add_equation(
        "dt(u) + nu*lap(lap(u)) + g*grad(h) + 2*Omega*zcross(u) = - u@grad(u)")
    problem.add_equation("dt(h) + nu*lap(lap(h)) + H*div(u) = - div(h*u)")
    solver = problem.build_solver(d3.RK222)
    for _ in range(10):
        solver.step(timestep)
    u.require_coeff_space(); h.require_coeff_space()
    assert np.isfinite(np.asarray(u.data)).all()
    assert np.isfinite(np.asarray(h.data)).all()
    mass1 = float(np.asarray(d3.integ(h).evaluate()['g']).ravel()[0])
    assert abs(mass1 - mass0) < 1e-12 + 1e-8 * abs(mass0)
