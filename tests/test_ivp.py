"""
IVP tests: 1D heat equation vs exact solution for every registered
timestepper (mirrors dedalus/tests/test_ivp.py:20-49), plus nonlinear
KdV-Burgers invariants and a Rayleigh-Benard build-and-run smoke test.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def heat_error(scheme, timestep, n_steps, Nx=16, nu=0.1, kmode=3):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=Nx, bounds=(0, 2 * np.pi), dealias=1.5)
    u = dist.Field(name='u', bases=xb)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
    solver = problem.build_solver(scheme)
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = np.sin(kmode * x)
    for _ in range(n_steps):
        solver.step(timestep)
    u.change_scales(1)
    exact = np.exp(-nu * kmode**2 * n_steps * timestep) * np.sin(kmode * x)
    return np.abs(np.array(u['g']) - exact).max()


@pytest.mark.parametrize("scheme_name", list(d3.timestepper_schemes))
def test_heat_all_timesteppers(scheme_name):
    scheme = d3.timestepper_schemes[scheme_name]
    err = heat_error(scheme, 1e-3, 50)
    assert err < 5e-5


def test_sbdf2_second_order_convergence():
    e1 = heat_error(d3.SBDF2, 2e-3, 50)
    e2 = heat_error(d3.SBDF2, 1e-3, 100)
    assert 3.5 < e1 / e2 < 4.5


def test_kdv_burgers_conservation():
    Lx, Nx = 10, 128
    a, b = 1e-4, 2e-4
    xcoord = d3.Coordinate('x')
    dist = d3.Distributor(xcoord, dtype=np.float64)
    xbasis = d3.RealFourier(xcoord, size=Nx, bounds=(0, Lx), dealias=1.5)
    u = dist.Field(name='u', bases=xbasis)
    dx = lambda A: d3.Differentiate(A, xcoord)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - a*dx(dx(u)) - b*dx(dx(dx(u))) = - u*dx(u)")
    x = dist.local_grid(xbasis, scale=1).ravel()
    n = 20
    u['g'] = np.log(1 + np.cosh(n)**2 / np.cosh(n * (x - 0.2 * Lx))**2) / (2 * n)
    mass0 = float(np.array(u['g']).mean())
    solver = problem.build_solver(d3.SBDF2)
    for _ in range(200):
        solver.step(2e-3)
    u.change_scales(1)
    ug = np.array(u['g'])
    assert np.isfinite(ug).all()
    assert abs(ug.mean() - mass0) < 1e-12


def test_rayleigh_benard_smoke():
    Lx, Lz = 4, 1
    Nx, Nz = 32, 12
    Rayleigh, Prandtl = 2e4, 1
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xbasis = d3.RealFourier(coords['x'], size=Nx, bounds=(0, Lx), dealias=1.5)
    zbasis = d3.ChebyshevT(coords['z'], size=Nz, bounds=(0, Lz), dealias=1.5)
    p = dist.Field(name='p', bases=(xbasis, zbasis))
    b = dist.Field(name='b', bases=(xbasis, zbasis))
    u = dist.VectorField(coords, name='u', bases=(xbasis, zbasis))
    tau_p = dist.Field(name='tau_p')
    tau_b1 = dist.Field(name='tau_b1', bases=xbasis)
    tau_b2 = dist.Field(name='tau_b2', bases=xbasis)
    tau_u1 = dist.VectorField(coords, name='tau_u1', bases=xbasis)
    tau_u2 = dist.VectorField(coords, name='tau_u2', bases=xbasis)
    kappa = (Rayleigh * Prandtl)**(-1/2)
    nu = (Rayleigh / Prandtl)**(-1/2)
    x, z = dist.local_grids(xbasis, zbasis, scales=1)
    ex, ez = coords.unit_vector_fields(dist)
    lift = lambda A: d3.Lift(A, zbasis.derivative_basis(1), -1)
    grad_u = d3.grad(u) + ez * lift(tau_u1)
    grad_b = d3.grad(b) + ez * lift(tau_b1)
    problem = d3.IVP([p, b, u, tau_p, tau_b1, tau_b2, tau_u1, tau_u2], namespace=locals())
    problem.add_equation("trace(grad_u) + tau_p = 0")
    problem.add_equation("dt(b) - kappa*div(grad_b) + lift(tau_b2) = - u@grad(b)")
    problem.add_equation("dt(u) - nu*div(grad_u) + grad(p) - b*ez + lift(tau_u2) = - u@grad(u)")
    problem.add_equation("b(z=0) = Lz")
    problem.add_equation("u(z=0) = 0")
    problem.add_equation("b(z=Lz) = 0")
    problem.add_equation("u(z=Lz) = 0")
    problem.add_equation("integ(p) = 0")
    solver = problem.build_solver(d3.RK222)
    b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z)
    b['g'] = np.array(b['g']) + Lz - z
    for _ in range(10):
        solver.step(0.05)
    b.change_scales(1)
    bg = np.array(b['g'])
    assert np.isfinite(bg).all()
    # Boundary conditions honored to near machine precision
    bb = b(z=0).evaluate()
    bb.change_scales(1)
    assert np.abs(np.array(bb['g']) - Lz).max() < 1e-10
    uu = u(z=Lz).evaluate()
    uu.change_scales(1)
    assert np.abs(np.array(uu['g'])).max() < 1e-10


@pytest.mark.parametrize('matsolver', ['inverse_refined', 'poly'])
def test_rbc_matsolvers_match_lu(matsolver):
    # All matsolvers must reproduce the LU reference trajectory. 'poly' is the
    # separable GEMM-form solve (polynomial stack fit + Chebyshev-interpolated
    # inverse preconditioner + f64 refinement).
    from dedalus_tpu.models.rbc import build_rbc_problem
    import jax.numpy as jnp

    def run(ms, steps=20):
        prob, kw = build_rbc_problem(Nx=16, Nz=12, Rayleigh=2e4)
        solver = prob.build_solver(d3.SBDF2, matsolver=ms)
        b = kw['b']; Lz = kw['Lz']
        b.change_scales(1)
        zg = kw['dist'].local_grid(kw['zbasis'], scale=1)
        noise = np.random.default_rng(42).standard_normal((16, 12))
        b.preset_data(kw['dist'].grid_layout,
                      jnp.asarray(Lz - zg + 1e-3 * noise * zg * (Lz - zg)))
        solver.run_steps(1e-3, steps)
        assert solver.matsolver == ms  # no silent fallback on this problem
        out = {}
        for f in solver.state:
            f.require_coeff_space(); f.change_scales(1)
            out[f.name] = np.asarray(f.data)
        return out

    ref = run('lu')
    got = run(matsolver)
    for k in ref:
        assert np.abs(got[k] - ref[k]).max() < 1e-11


def test_poly_factorized_stack_solve():
    # Direct separable-solve check on an assembled pencil stack
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.ops import solve as ops_solve
    import jax.numpy as jnp
    prob, kw = build_rbc_problem(Nx=32, Nz=12)
    solver = prob.build_solver(d3.SBDF2, matsolver='lu')
    ps = solver.pencil
    ps.build_matrices(['M', 'L'])
    A = np.asarray(ps.combined_with_pivots({'M': 1000.0, 'L': 0.5}))
    fact = ops_solve.FactorizedStack(A, 'poly')
    X = np.random.default_rng(0).standard_normal(A.shape[:2])
    R = np.einsum('gij,gj->gi', A, X)
    Xs = np.asarray(fact.poly_solve(jnp.asarray(R)))
    assert np.abs(Xs - X).max() / np.abs(X).max() < 1e-10


def test_poly_device_refit_from_base():
    """A sibling factorization at different (a0, b0) seeds a device-GEMM
    Chebyshev refit (the CFL dt-change path); the refit solve must still
    reach the solve target."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.core.subsystems import LazyCombined
    from dedalus_tpu.ops import solve as ops_solve
    import jax.numpy as jnp
    prob, kw = build_rbc_problem(Nx=64, Nz=12)   # G=32: separable assembly on
    solver = prob.build_solver(d3.SBDF2, matsolver='poly')
    ps = solver.pencil
    ps.build_matrices(['M', 'L'])
    lc1 = LazyCombined(ps, {'M': 1000.0, 'L': 1.0})
    base = ops_solve.FactorizedStack(lc1, 'poly')
    # 30% timestep change; refit from base instead of a fresh host fit
    lc2 = LazyCombined(ps, {'M': 1300.0, 'L': 1.0})
    # Drop any fit cache for this key so the refit path actually runs
    pf2 = lc2.poly_form()
    cpath = ops_solve.FactorizedStack._poly_cache_path(
        np.asarray(pf2['B']), np.asarray(pf2['weights']), 1e-15)
    if cpath is not None and cpath.exists():
        cpath.unlink()
    fact2 = ops_solve.FactorizedStack(lc2, 'poly', refit_base=base)
    assert fact2._refit_base is None        # no chain-retention of siblings
    A2 = np.asarray(ps.combined_with_pivots({'M': 1300.0, 'L': 1.0}))
    X = np.random.default_rng(1).standard_normal(A2.shape[:2])
    R = np.einsum('gij,gj->gi', A2, X)
    Xs = np.asarray(fact2.poly_solve(jnp.asarray(R)))
    assert np.abs(Xs - X).max() / np.abs(X).max() < 1e-10


def test_complex_fourier_ivp():
    # Advection with complex dtype: dt(u) + v*dx(u) = 0; exact phase rotation
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.complex128)
    xb = d3.ComplexFourier(c, size=16, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    v = 0.7
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) + v*dx(u) = 0")
    solver = problem.build_solver(d3.RK443)
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = np.exp(2j * x)
    n, timestep = 100, 1e-3
    for _ in range(n):
        solver.step(timestep)
    u.change_scales(1)
    exact = np.exp(2j * (x - v * n * timestep))
    assert np.abs(np.array(u['g']) - exact).max() < 1e-8


@pytest.mark.parametrize("scheme", ["SBDF2", "RK222"])
def test_run_steps_scan_matches_step_loop(scheme):
    # lax.scan multi-step path must match the per-step path exactly
    def solve(use_scan):
        c = d3.Coordinate('x')
        dist = d3.Distributor(c, dtype=np.float64)
        xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi), dealias=1.5)
        u = dist.Field(name='u', bases=xb)
        nu = 0.05
        dx = lambda A: d3.Differentiate(A, c)
        problem = d3.IVP([u], namespace=locals())
        problem.add_equation("dt(u) - nu*dx(dx(u)) = - u*dx(u)")
        solver = problem.build_solver(d3.timestepper_schemes[scheme])
        x = dist.local_grid(xb, scale=1).ravel()
        u['g'] = np.sin(x) + 0.3 * np.cos(2 * x)
        if use_scan:
            solver.run_steps(1e-3, 40)
        else:
            for _ in range(40):
                solver.step(1e-3)
        u.change_scales(1)
        return np.array(u['g']), solver.sim_time

    a, ta = solve(False)
    b, tb = solve(True)
    assert abs(ta - tb) < 1e-14
    assert np.abs(a - b).max() < 1e-13


def test_checkpoint_resume(tmp_path):
    # Save state via a file handler, restore with load_state, continue exactly
    import os
    def build():
        c = d3.Coordinate('x')
        dist = d3.Distributor(c, dtype=np.float64)
        xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi), dealias=1.5)
        u = dist.Field(name='u', bases=xb)
        nu = 0.05
        dx = lambda A: d3.Differentiate(A, c)
        problem = d3.IVP([u], namespace=locals())
        problem.add_equation("dt(u) - nu*dx(dx(u)) = - u*dx(u)")
        solver = problem.build_solver(d3.SBDF1)
        x = dist.local_grid(xb, scale=1).ravel()
        u['g'] = np.sin(x)
        return solver, u
    solver, u = build()
    chk = solver.evaluator.add_file_handler(str(tmp_path / 'chk'), iter=10)
    chk.add_task(u, name='u', layout='c')
    for _ in range(15):
        solver.step(1e-3)
    for _ in range(10):
        solver.step(1e-3)
    final_a = np.array(u['g', 1])
    # Restart from the write at iteration 20 and continue 5 steps
    solver2, u2 = build()
    from dedalus_tpu.post import list_sets
    path = list_sets(tmp_path / 'chk')[-1]
    solver2.load_state(path, index=-1)
    assert solver2.iteration == 20
    for _ in range(5):
        solver2.step(1e-3)
    final_b = np.array(u2['g', 1])
    assert np.abs(final_a - final_b).max() < 1e-10


def test_build_evp_from_ivp():
    # Linearize dt(u) = -nu*dxx(u) about zero: eigenvalues lam = -nu k^2
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.complex128)
    xb = d3.ComplexFourier(c, size=16, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    nu = 0.3
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
    evp = problem.build_EVP()
    solver = evp.build_solver()
    # Each Fourier mode is its own subproblem: collect one eigenvalue per k
    evals = []
    for g, sp in enumerate(solver.subproblems):
        solver.solve_dense(sp_index=g)
        vals = solver.eigenvalues[np.isfinite(solver.eigenvalues)]
        evals.extend(vals.real.tolist())
    # lam*M + L = 0 with M = identity, L = -nu dxx -> lam = -nu k^2
    expect = np.sort([-nu * k**2 for k in range(-7, 8)])
    got = np.sort(evals)[:len(expect)]
    assert np.abs(got - expect).max() < 1e-10


def test_run_steps_after_different_dt_step():
    """run_steps after step(dt1) with dt2 != dt1 must not silently apply
    uniform-dt coefficients to a mixed-dt history (regression)."""
    Nx, nu, kmode = 16, 0.1, 3
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=Nx, bounds=(0, 2 * np.pi), dealias=1.5)

    def run(mode):
        dx = lambda A: d3.Differentiate(A, c)
        u = dist.Field(name='u', bases=xb)
        problem = d3.IVP([u], namespace=locals())
        problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
        solver = problem.build_solver(d3.SBDF2)
        x = dist.local_grid(xb, scale=1).ravel()
        u['g'] = np.sin(kmode * x)
        dt1, dt2 = 2e-3, 1e-3
        if mode == 'mixed':
            # two steps at dt1, then run_steps at dt2
            solver.step(dt1)
            solver.step(dt1)
            solver.run_steps(dt2, 30)
            T = 2 * dt1 + 30 * dt2
        else:
            for _ in range(2):
                solver.step(dt1)
            for _ in range(30):
                solver.step(dt2)
            T = 2 * dt1 + 30 * dt2
        u.change_scales(1)
        exact = np.exp(-nu * kmode**2 * T) * np.sin(kmode * x)
        return np.abs(np.array(u['g']) - exact).max()

    err_mixed = run('mixed')
    err_loop = run('loop')
    # The scan path must match the per-step variable-dt path to roundoff-ish
    assert err_mixed < 2 * err_loop + 1e-12


def test_multistep_history_uniform_scan_guard():
    """run_steps at the same dt as prior steps should scan without extra
    individual steps and stay accurate."""
    err = None
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=16, bounds=(0, 2 * np.pi), dealias=1.5)
    u = dist.Field(name='u', bases=xb)
    nu, kmode = 0.1, 3
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
    solver = problem.build_solver(d3.SBDF2)
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = np.sin(kmode * x)
    solver.step(1e-3)
    solver.step(1e-3)
    solver.run_steps(1e-3, 48)
    u.change_scales(1)
    exact = np.exp(-nu * kmode**2 * 50e-3) * np.sin(kmode * x)
    err = np.abs(np.array(u['g']) - exact).max()
    assert err < 5e-5


def test_real_drift_free_and_hermitian_enforcement():
    """Long real-Fourier run: redundant mode slots (mean-mode sin parts)
    must stay at roundoff through the compiled scan, and
    enforce_hermitian_symmetry must scrub injected junk
    (parity: reference solvers.py:675-681,705-708)."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4)
    solver = problem.build_solver(d3.SBDF2)
    assert solver.enforce_real_cadence == 100
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=3, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    solver.run_steps(1e-3, 2000)
    X = np.asarray(solver.pencil.gather_state(solver.state_flat()))
    invalid = ~solver.pencil.col_valid
    scale = np.abs(X).max()
    assert np.isfinite(X).all()
    assert np.abs(X[invalid]).max() < 1e-13 * scale
    # Inject junk into a redundant slot and scrub it
    u = ctx['u']
    u.require_coeff_space()
    data = np.array(u.data)
    data[0, 1, :] += 1.0  # -sin part of the kx=0 mode (redundant)
    u['c'] = data
    solver.enforce_hermitian_symmetry(solver.state)
    u.require_coeff_space()
    u.change_scales(1)
    assert np.abs(np.array(u.data)[0, 1, :]).max() < 1e-14


def test_sampled_assembly_lazy_poly_matches_dense_lu():
    """Force the large-system path (sampled separable assembly, no dense
    (G,P,P) stacks, lazy combined poly solve with device-built
    preconditioner) on a small RBC problem and check the trajectory against
    the ordinary dense-LU path."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.utils.config import config

    def run(force_lazy):
        old_gb = config.get('memory', 'max_dense_stack_gb')
        old_min = config.get('matrix assembly', 'sampled_min_groups')
        try:
            if force_lazy:
                config.set('memory', 'max_dense_stack_gb', '0')
                config.set('matrix assembly', 'sampled_min_groups', '8')
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5)
            solver = problem.build_solver(
                d3.SBDF2, matsolver='poly' if force_lazy else 'lu')
            if force_lazy:
                assert solver.pencil.separable is not None
                assert solver.pencil.matrices['M'] is None
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, 20)
            assert solver.matsolver == ('poly' if force_lazy else 'lu')
            return np.asarray(solver.state_flat())
        finally:
            config.set('memory', 'max_dense_stack_gb', old_gb)
            config.set('matrix assembly', 'sampled_min_groups', old_min)

    ref = run(False)
    lazy = run(True)
    err = np.abs(ref - lazy).max()
    assert err < 1e-11 * max(1, np.abs(ref).max()), f"lazy path mismatch: {err}"


def test_banded_bordered_matsolver_matches_lu():
    """Bordered block-tridiagonal (Woodbury) solve: force the large-system
    path with matsolver='banded' and check the trajectory against dense LU
    (ref matsolvers.py:285-321)."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.utils.config import config

    def run(force_banded):
        old_gb = config.get('memory', 'max_dense_stack_gb')
        old_min = config.get('matrix assembly', 'sampled_min_groups')
        try:
            if force_banded:
                config.set('memory', 'max_dense_stack_gb', '0')
                config.set('matrix assembly', 'sampled_min_groups', '8')
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5)
            solver = problem.build_solver(
                d3.SBDF2, matsolver='banded' if force_banded else 'lu')
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, 20)
            assert solver.matsolver == ('banded' if force_banded else 'lu')
            return np.asarray(solver.state_flat())
        finally:
            config.set('memory', 'max_dense_stack_gb', old_gb)
            config.set('matrix assembly', 'sampled_min_groups', old_min)

    ref = run(False)
    got = run(True)
    err = np.abs(ref - got).max()
    assert err < 1e-11 * max(1, np.abs(ref).max()), f"banded mismatch: {err}"


def test_banded_outer_refinement_reuse():
    """Startup steps (and nearby CFL coefficients) are served from the MAIN
    factorization via outer iterative refinement instead of building a
    second factor stack: after a cold run_steps, exactly ONE factorization
    exists, the startup key is mapped to a positive outer pass count, and
    the trajectory matches the no-reuse baseline (which builds startup +
    main) to refinement-floor accuracy. Motivation: each factor stack at
    BASELINE scale is ~4 GB shipped through the serving tunnel (~5 min);
    reuse removes two of the three ships per cold start."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.utils.config import config

    def run(rho):
        old_gb = config.get('memory', 'max_dense_stack_gb')
        old_min = config.get('matrix assembly', 'sampled_min_groups')
        old_rho = config.get('linear algebra', 'outer_reuse_rho',
                             fallback='0.55')
        try:
            config.set('memory', 'max_dense_stack_gb', '0')
            config.set('matrix assembly', 'sampled_min_groups', '8')
            config.set('linear algebra', 'outer_reuse_rho', str(rho))
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5)
            solver = problem.build_solver(d3.SBDF2, matsolver='banded')
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, 8)
            assert solver.matsolver == 'banded'
            ts = solver.timestepper
            return (np.asarray(solver.state_flat()), len(ts._factorized),
                    dict(ts._outer_for_key))
        finally:
            config.set('memory', 'max_dense_stack_gb', old_gb)
            config.set('matrix assembly', 'sampled_min_groups', old_min)
            config.set('linear algebra', 'outer_reuse_rho', old_rho)

    X1, nfacts1, omap1 = run(0.55)
    X0, nfacts0, omap0 = run(0.0)
    # Reuse: one factorization total; startup key bridged with outer passes
    assert nfacts1 == 1, f"expected 1 factorization with reuse, got {nfacts1}"
    assert nfacts0 == 2, f"expected 2 factorizations without, got {nfacts0}"
    assert any(n > 0 for n in omap1.values()), omap1
    assert all(n == 0 for n in omap0.values()), omap0
    err = np.abs(X1 - X0).max() / max(1.0, np.abs(X0).max())
    assert err < 1e-11, f"outer-refined startup diverged: {err}"


def test_banded_pivot_pinning_repairs_border_anchored_kernel():
    """A band core whose kernel is anchored ONLY by far border content (the
    ball-saddle structure: left/right null supports band-disjoint) is
    repaired by QR pivot pinning + exact Woodbury compensation — the solve
    matches the dense solution to near machine precision."""
    import jax.numpy as jnp
    import dedalus_tpu.ops.banded as ops_banded
    from scipy import sparse as ss

    rng = np.random.default_rng(3)
    nb, Nb, nbord = 4, 6, 1
    P = nb * Nb
    A = np.zeros((P, P))
    # In-pattern block-tridiagonal content
    for i in range(Nb):
        r0 = i * nb
        A[r0:r0 + nb, r0:r0 + nb] = rng.normal(size=(nb, nb))
        if i > 0:
            A[r0:r0 + nb, r0 - nb:r0] = rng.normal(size=(nb, nb))
        if i < Nb - 1:
            A[r0:r0 + nb, r0 + nb:r0 + 2 * nb] = rng.normal(size=(nb, nb))
    # Border row 0 (dense) and border column P-1 (dense)
    A[0, :] = rng.normal(size=P)
    A[:, P - 1] = rng.normal(size=P)
    # Plant a kernel in the band: columns 12, 13 dependent over their
    # in-pattern rows; only the border row's far entry pins it in A_full
    A[1:, 13] = -2.0 * A[1:, 12]
    A[0, 13] = 1.7   # border-row anchoring (out-of-pattern for row 0)
    order = dict(col_perm=np.arange(P), row_perm=np.arange(P),
                 n_border=nbord, n_core=P - nbord, bcol_first=False)
    blocks = ops_banded.build_banded_blocks(
        None, None, None, order, nb, exact=[ss.csr_matrix(A)])
    # The band alone (in-pattern + identity-regularized border slots) is
    # singular; the full matrix is not
    sv_full = np.linalg.svd(A, compute_uv=False)
    assert sv_full[-1] > 1e-8 * sv_full[0]
    solver = ops_banded.BorderedBandedSolver(
        blocks, refinements=6,
        group_dense=lambda g: (_ for _ in ()).throw(AssertionError(
            "pinning should repair without dense overrides")))
    assert not solver.bad_idx
    R = rng.normal(size=(1, P))
    X = np.asarray(solver.solve(jnp.asarray(R)))
    Xd = np.linalg.solve(A, R[0])
    assert np.abs(X[0] - Xd).max() < 1e-9 * max(1, np.abs(Xd).max())


@pytest.mark.parametrize('Nb', [1, 2, 3, 5, 33])
def test_banded_prefix_solve_matches_scan(Nb):
    """The parallel-prefix (associative-scan) sweep kernel reproduces the
    sequential lax.scan sweeps on random well-conditioned block-tridiagonal
    systems at every block count, including the Nb<3 short-circuit."""
    import jax.numpy as jnp
    import dedalus_tpu.ops.banded as ops_banded

    rng = np.random.default_rng(7)
    G, nb = 6, 4
    diag = rng.standard_normal((G, Nb, nb, nb)) + 4 * np.eye(nb)
    sub = rng.standard_normal((G, Nb, nb, nb))
    sub[:, 0] = 0
    sup = rng.standard_normal((G, Nb, nb, nb))
    sup[:, -1] = 0
    qr = ops_banded._factor_device(
        jnp.asarray(diag), jnp.asarray(sub), jnp.asarray(sup))
    r = rng.standard_normal((G, Nb, nb))
    args = (qr['Qt'], qr['QtL'], qr['Rinv'], qr['R1'], qr['R2'],
            jnp.asarray(r))
    x_scan = np.asarray(ops_banded.block_tridiag_qr_solve(*args))
    x_pref = np.asarray(ops_banded.block_tridiag_qr_solve_prefix(*args))
    assert np.abs(x_scan - x_pref).max() < 1e-11 * max(1, np.abs(x_scan).max())
    # Blocked recurrence (factor-time-precomputed cumulative maps) agrees
    # too, including its Nb<8 short-circuit
    x_blk = np.asarray(ops_banded.block_tridiag_qr_solve_blocked(*args))
    assert np.abs(x_scan - x_blk).max() < 1e-11 * max(1, np.abs(x_scan).max())
    if Nb >= 5:
        # Two-level chunked prefix (the large-Nb memory-bounded form):
        # force a small chunk so every Nb here exercises chunk padding,
        # inter-chunk carries, and the reverse-direction chunk order.
        from dedalus_tpu.utils.config import config
        old = config.get('linear algebra', 'banded_prefix_chunk')
        try:
            config.set('linear algebra', 'banded_prefix_chunk', '2')
            x_chunk = np.asarray(ops_banded.block_tridiag_qr_solve_prefix(*args))
        finally:
            config.set('linear algebra', 'banded_prefix_chunk', old)
        assert np.abs(x_scan - x_chunk).max() < 1e-11 * max(1, np.abs(x_scan).max())


def test_banded_factor_device_matches_host():
    """factor_block_tridiag_qr's compiled path (pinned to the in-process
    XLA CPU backend via _f64_factor_device, usable even when the default
    backend is an accelerator) produces the same factors as the host numpy
    sweep."""
    import dedalus_tpu.ops.banded as ops_banded

    rng = np.random.default_rng(11)
    G, Nb, nb = 3, 7, 4
    diag = rng.standard_normal((G, Nb, nb, nb)) + 4 * np.eye(nb)
    sub = rng.standard_normal((G, Nb, nb, nb))
    sub[:, 0] = 0
    sup = rng.standard_normal((G, Nb, nb, nb))
    sup[:, -1] = 0
    blocks = type('B', (), dict(G=G, Nb=Nb, nb=nb, diag=diag, sub=sub,
                                sup=sup))()
    assert ops_banded._f64_factor_device() is not None
    qr_dev = ops_banded.factor_block_tridiag_qr(blocks, device=True)
    qr_host = ops_banded.factor_block_tridiag_qr(blocks, device=False)
    # QR sign conventions may differ between numpy and XLA; compare through
    # the solve, which is convention-invariant.
    import jax.numpy as jnp
    r = rng.standard_normal((G, Nb, nb))
    xs = [np.asarray(ops_banded.block_tridiag_qr_solve(
            jnp.asarray(qr['Qt']), jnp.asarray(qr['QtL']),
            jnp.asarray(qr['Rinv']), jnp.asarray(qr['R1']),
            jnp.asarray(qr['R2']), jnp.asarray(r)))
          for qr in (qr_dev, qr_host)]
    assert np.abs(xs[0] - xs[1]).max() < 1e-11 * max(1, np.abs(xs[1]).max())


@pytest.mark.parametrize('sweep_mode', ['prefix', 'blocked'])
def test_banded_accelerator_modes_end_to_end(sweep_mode):
    """Force each accelerator sweep mode through the full bordered solver and
    check the RBC trajectory still matches dense LU (the refinement passes
    absorb any f32 composition noise)."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.utils.config import config

    def run(matsolver, mode):
        old_gb = config.get('memory', 'max_dense_stack_gb')
        old_min = config.get('matrix assembly', 'sampled_min_groups')
        old_mode = config.get('linear algebra', 'banded_solve')
        try:
            config.set('linear algebra', 'banded_solve', mode)
            if matsolver == 'banded':
                config.set('memory', 'max_dense_stack_gb', '0')
                config.set('matrix assembly', 'sampled_min_groups', '8')
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5)
            solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, 20)
            return np.asarray(solver.state_flat())
        finally:
            config.set('memory', 'max_dense_stack_gb', old_gb)
            config.set('matrix assembly', 'sampled_min_groups', old_min)
            config.set('linear algebra', 'banded_solve', old_mode)

    ref = run('lu', 'scan')
    got = run('banded', sweep_mode)
    err = np.abs(ref - got).max()
    assert err < 1e-11 * max(1, np.abs(ref).max()), \
        f"{sweep_mode} mismatch: {err}"


def test_banded_block_multiple_rounding():
    """banded_block_multiple rounds the block size up (TPU tile alignment:
    (nb, nb) blocks pad to 128 lanes, so wider blocks are memory-free and
    shrink the sweep depth) without changing the solution."""
    from dedalus_tpu.models.rbc import build_rbc_problem
    from dedalus_tpu.utils.config import config

    def run(matsolver, mult):
        old = {('memory', 'max_dense_stack_gb'): None,
               ('matrix assembly', 'sampled_min_groups'): None,
               ('linear algebra', 'banded_block_multiple'): None}
        for k in old:
            old[k] = config.get(*k)
        try:
            config.set('linear algebra', 'banded_block_multiple', mult)
            if matsolver == 'banded':
                config.set('memory', 'max_dense_stack_gb', '0')
                config.set('matrix assembly', 'sampled_min_groups', '8')
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5)
            solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, 10)
            return np.asarray(solver.state_flat())
        finally:
            for (sec, key), val in old.items():
                config.set(sec, key, val)

    ref = run('lu', '1')
    got = run('banded', '16')
    err = np.abs(ref - got).max()
    assert err < 1e-11 * max(1, np.abs(ref).max()), f"rounding mismatch: {err}"


def test_banded_factor_disk_cache_roundtrip(tmp_path, monkeypatch):
    """A cached banded factorization reloads from disk and solves
    identically to the freshly-factored one (incl. Woodbury pieces, pivot
    pins, and dense-override bookkeeping)."""
    import jax.numpy as jnp
    import dedalus_tpu.ops.banded as ops_banded
    from scipy import sparse as ss

    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ops_banded, "_FACTOR_CACHE_MIN_WORK", 0)
    rng = np.random.default_rng(11)
    nb, Nb, nbord = 4, 8, 1
    P = nb * Nb
    A = np.zeros((P, P))
    for i in range(Nb):
        r0 = i * nb
        A[r0:r0 + nb, r0:r0 + nb] = rng.normal(size=(nb, nb)) + 3 * np.eye(nb)
        if i > 0:
            A[r0:r0 + nb, r0 - nb:r0] = rng.normal(size=(nb, nb))
        if i < Nb - 1:
            A[r0:r0 + nb, r0 + nb:r0 + 2 * nb] = rng.normal(size=(nb, nb))
    A[0, :] = rng.normal(size=P)
    A[:, P - 1] = rng.normal(size=P)
    order = dict(col_perm=np.arange(P), row_perm=np.arange(P),
                 n_border=nbord, n_core=P - nbord, bcol_first=False)
    blocks = ops_banded.build_banded_blocks(
        None, None, None, order, nb, exact=[ss.csr_matrix(A)])
    s1 = ops_banded.BorderedBandedSolver(blocks, refinements=4)
    files = list(tmp_path.glob("bandedfac_*.npz"))
    assert len(files) == 1, "factorization was not cached"
    R = rng.normal(size=(1, P))
    X1 = np.asarray(s1.solve(jnp.asarray(R)))
    s2 = ops_banded.BorderedBandedSolver(blocks, refinements=4)
    X2 = np.asarray(s2.solve(jnp.asarray(R)))
    assert np.array_equal(X1, X2), "cached factorization solves differently"
    Xd = np.linalg.solve(A, R[0])
    assert np.abs(X2[0] - Xd).max() < 1e-9 * max(1, np.abs(Xd).max())


def test_banded_adaptive_refinements(tmp_path, monkeypatch):
    """Adaptive mode probes the residual-contraction curve, picks the fewest
    passes reaching the solve target (with floor-stagnation detection), and
    the curve persists through the factor cache so reloads skip the probe."""
    import jax.numpy as jnp
    import dedalus_tpu.ops.banded as ops_banded
    from scipy import sparse as ss

    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ops_banded, "_FACTOR_CACHE_MIN_WORK", 0)
    rng = np.random.default_rng(5)
    nb, Nb, nbord = 4, 12, 2
    P = nb * Nb
    A = np.zeros((P, P))
    for i in range(Nb):
        r0 = i * nb
        A[r0:r0 + nb, r0:r0 + nb] = rng.normal(size=(nb, nb)) + 4 * np.eye(nb)
        if i > 0:
            A[r0:r0 + nb, r0 - nb:r0] = rng.normal(size=(nb, nb))
        if i < Nb - 1:
            A[r0:r0 + nb, r0 + nb:r0 + 2 * nb] = rng.normal(size=(nb, nb))
    A[0, :] = rng.normal(size=P)
    A[:, P - 1] = rng.normal(size=P)
    order = dict(col_perm=np.arange(P), row_perm=np.arange(P),
                 n_border=nbord, n_core=P - nbord, bcol_first=False)
    blocks = ops_banded.build_banded_blocks(
        None, None, None, order, nb, exact=[ss.csr_matrix(A)])
    s1 = ops_banded.BorderedBandedSolver(blocks)   # adaptive (refinements=None)
    assert s1.refine_curve is not None
    curve = np.asarray(s1.refine_curve)
    assert curve.shape[0] >= 2 and (np.diff(np.log10(curve[:2])) < -3).all(), \
        "first refinement should contract the residual by orders of magnitude"
    assert 1 <= s1.refinements < curve.shape[0] - 1, \
        "adaptive count should stop before the cap on a well-conditioned band"
    R = rng.normal(size=(1, P))
    X1 = np.asarray(s1.solve(jnp.asarray(R)))
    Xd = np.linalg.solve(A, R[0])
    assert np.abs(X1[0] - Xd).max() < 1e-11 * max(1, np.abs(Xd).max())
    # Cache reload: same curve, same chosen count, no fresh probe
    called = []
    monkeypatch.setattr(
        ops_banded.BorderedBandedSolver, "_probe_refinement_curve",
        lambda self, **kw: called.append(1) or curve)
    s2 = ops_banded.BorderedBandedSolver(blocks)
    assert not called, "cache reload should not re-probe"
    assert s2.refinements == s1.refinements
    assert np.array_equal(np.asarray(s2.refine_curve), curve)


def test_ivp_equation_conditions():
    """Conditioned equations in an IVP: the mean mode is pinned by an
    algebraic gauge equation (condition complementary to the dt equation),
    and the merged row block's RHS selection runs inside the compiled
    run_steps scan. Matches the analytic heat decay on nonzero modes."""
    import jax
    import dedalus_tpu.public as d3

    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    f['g'] = np.cos(3 * x)                     # forcing (and a mean the
    f['g'] = np.asarray(f['g']) + 0.7          # gauge must suppress)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - dx(dx(u)) = f", condition="nx != 0")
    problem.add_equation("u = 0", condition="nx == 0")
    solver = problem.build_solver(d3.SBDF2)
    u['g'] = np.sin(x) + 2.0                   # mean must be projected out
    dt, n = 1e-3, 100
    solver.run_steps(dt, n)
    t = n * dt
    # Exact: mean pinned to 0; k=1 decays from 1; k=3 relaxes to forcing
    expect = (np.exp(-t) * np.sin(x)
              + (1 - np.exp(-9 * t)) / 9 * np.cos(3 * x))
    u.change_scales(1)
    err = np.abs(np.array(u['g']) - expect).max()
    # SBDF2 startup + O(dt^2) time error dominate
    assert err < 5e-5, err
    mean = np.array(u['g']).mean()
    assert abs(mean) < 1e-13, f"gauge failed to pin the mean: {mean}"


def test_ivp_constant_forcing_field():
    """External (non-state) forcing fields in the RHS must survive repeated
    program builds: in-trace layout motion used to leak traced data onto
    them (UnexpectedTracerError on the second trace). Checks the linear
    forced heat solution."""
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    f = dist.Field(name='f', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    f['g'] = np.cos(3 * x)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - dx(dx(u)) = f")
    solver = problem.build_solver(d3.SBDF2)
    u['g'] = np.sin(x)
    solver.run_steps(1e-3, 50)
    solver.run_steps(1e-3, 50)     # second call re-enters the run program
    t = 0.1
    expect = (np.exp(-t) * np.sin(x)
              + (1 - np.exp(-9 * t)) / 9 * np.cos(3 * x))
    u.change_scales(1)
    assert np.abs(np.array(u['g']) - expect).max() < 1e-5
