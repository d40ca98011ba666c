"""
Distributed-execution tests on a virtual 8-device CPU mesh (mirrors the
reference's dedalus/tests_parallel strategy of real small meshes).

Any problem built through the PUBLIC API with `Distributor(..., mesh=...)`
must run distributed via solver.run_steps / solver.step and reproduce the
serial solver's state: pencil groups shard over the mesh (embarrassingly
parallel solves; ref subsystems.py:34-53), and layout moves inside the traced
step apply sharding constraints so XLA emits the all_to_all transposes that
replace the reference's MPI transposes (transposes.pyx:248).
"""

import numpy as np
import pytest
import jax

import dedalus_tpu.public as d3
from dedalus_tpu.models.rbc import build_rbc_problem


def test_all_to_all_transpose_roundtrip():
    """Semantics check of the collective the production transposes lower to:
    `distributor.constrain` sharding constraints make GSPMD insert exactly
    this all_to_all (HLO-verified in test_distributed_step_has_collectives);
    here the equivalent explicit collective round-trips data over the mesh
    (ref parity: transposes.pyx:22-445 FFTWTranspose/AlltoallvTranspose)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ('x',))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((16, 24))

    def body(a):
        # localize axis 0 by scattering axis 1, then invert
        b = jax.lax.all_to_all(a, 'x', split_axis=1, concat_axis=0, tiled=True)
        c = jax.lax.all_to_all(b, 'x', split_axis=0, concat_axis=1, tiled=True)
        return c

    f = shard_map(body, mesh=mesh, in_specs=P('x', None), out_specs=P('x', None))
    out = jax.jit(f)(A)
    assert np.allclose(np.array(out), A)


def _run_rbc(mesh, n_steps, use_run_steps):
    problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5, mesh=mesh)
    solver = problem.build_solver(d3.SBDF2)
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    dt = 1e-3
    if use_run_steps:
        solver.run_steps(dt, n_steps)
    else:
        for _ in range(n_steps):
            solver.step(dt)
    return np.asarray(solver.state_flat()), solver


@pytest.mark.parametrize("use_run_steps", [True, False])
def test_distributed_rbc_matches_serial(use_run_steps):
    """RBC via the public API on an 8-device mesh == serial to roundoff."""
    s, _ = _run_rbc(None, 5, use_run_steps)
    d, solver = _run_rbc((8,), 5, use_run_steps)
    err = np.abs(s - d).max()
    assert err < 1e-12 * max(1, np.abs(s).max()), f"mismatch: {err}"
    # The big per-group stacks must actually be distributed over the mesh
    ts = solver.timestepper
    assert ts.MX.sharding.spec[1] is not None or len(jax.devices()) == 1


def test_distributed_step_has_collectives():
    """The compiled distributed scan must contain real ICI collectives
    (all_to_all transposes from the layout constraints)."""
    import jax.numpy as jnp
    d, solver = _run_rbc((8,), 3, True)
    ts = solver.timestepper
    fact = ts._get_factorized(*list(ts._factorized)[0])
    mats = ts._step_mats(fact)
    fn, consts = next(iter(ts._scan_cache.values()))
    a = jnp.zeros(3)
    rhs0 = jnp.zeros_like(ts.MX[0])
    txt = fn.lower(solver.state_flat(), jnp.asarray(0.0), ts.MX, ts.LX, ts.F,
                   rhs0, a, a, a, jnp.asarray(1e-3),
                   jnp.asarray(3, jnp.int32), mats,
                   *consts).compile().as_text()
    assert txt.count("all-to-all") >= 2  # x-transposes each way


@pytest.mark.parametrize("shape", [(36, 16), (40, 18)])
def test_distributed_odd_sizes_match_serial(shape):
    """Sizes that do NOT divide the mesh still shard and match serial:
    pencil groups are padded to a mesh multiple inside the framework and
    GSPMD pads uneven grid shards (ref transposes.pyx:77-99 uneven blocks)."""
    Nx, Nz = shape

    def run(mesh, n_steps=4):
        problem, ctx = build_rbc_problem(Nx, Nz, Rayleigh=1e5, mesh=mesh)
        solver = problem.build_solver(d3.SBDF2)
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        solver.run_steps(1e-3, n_steps)
        return np.asarray(solver.state_flat()), solver

    s, _ = run(None)
    d, solver = run((8,))
    err = np.abs(s - d).max()
    assert err < 1e-12 * max(1, np.abs(s).max()), f"odd-size mismatch: {err}"
    # Groups really were padded to a mesh multiple and sharded
    pencil = solver.pencil
    assert pencil.G % 8 == 0 and pencil.G_real <= pencil.G
    assert solver.timestepper.MX.sharding.spec[1] is not None


def test_distributed_shell_ivp_matches_serial():
    """A curvilinear (shell) nonlinear IVP distributes through the same
    general facility: m-groups shard over the mesh."""
    from dedalus_tpu.core.timesteppers import SBDF2

    def run(mesh, n_steps=5):
        coords = d3.SphericalCoordinates('phi', 'theta', 'r')
        dist = d3.Distributor(coords, dtype=np.float64, mesh=mesh)
        shell = d3.ShellBasis(coords, (8, 4, 12), radii=(1, 2),
                              dtype=np.float64, dealias=1.5)
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
        f.change_scales(1)
        f['g'] = 0.1 * x * (r - 1) * (2 - r)
        solver.run_steps(1e-3, n_steps)
        return np.asarray(solver.state_flat())

    s = run(None)
    d = run((4,))
    err = np.abs(s - d).max()
    assert err < 1e-13, f"shell distributed mismatch: {err}"


def test_distributed_2d_mesh_3d_problem():
    """A 2D process mesh over a 3D Cartesian problem (ref tests_parallel
    2x2-mesh style)."""
    from dedalus_tpu.core.timesteppers import SBDF2

    def run(mesh, n_steps=4):
        coords = d3.CartesianCoordinates('x', 'y', 'z')
        dist = d3.Distributor(coords, dtype=np.float64, mesh=mesh)
        xb = d3.RealFourier(coords['x'], size=8, bounds=(0, 2 * np.pi), dealias=1.5)
        yb = d3.RealFourier(coords['y'], size=8, bounds=(0, 2 * np.pi), dealias=1.5)
        zb = d3.ChebyshevT(coords['z'], size=8, bounds=(0, 1), dealias=1.5)
        u = dist.Field(name='u', bases=(xb, yb, zb))
        tau1 = dist.Field(name='tau1', bases=(xb, yb))
        tau2 = dist.Field(name='tau2', bases=(xb, yb))
        lift = lambda A, i: d3.Lift(A, zb.derivative_basis(2), i)
        problem = d3.IVP([u, tau1, tau2], namespace=locals())
        problem.add_equation("dt(u) - lap(u) + lift(tau1, -1) + lift(tau2, -2) = - u*u")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
        solver = problem.build_solver(SBDF2)
        x, y, z = dist.local_grids(xb, yb, zb, scales=1)
        u.change_scales(1)
        u['g'] = 0.1 * np.sin(x) * np.cos(y) * z * (1 - z)
        solver.run_steps(1e-3, n_steps)
        return np.asarray(solver.state_flat())

    s = run(None)
    d = run((2, 2))
    err = np.abs(s - d).max()
    assert err < 1e-13, f"2D-mesh distributed mismatch: {err}"


@pytest.mark.parametrize("mode", ["scan", "prefix", "blocked"])
def test_distributed_banded_matches_serial(mode):
    """The banded matsolver's factor arrays (G leading) group-shard over the
    mesh like every other pencil stack, and both sweep kernels (sequential
    scan and parallel-prefix) reproduce the serial trajectory — the
    multi-chip memory-scalable path (factors O(G nb P), ref
    matsolvers.py:285-321)."""
    from dedalus_tpu.utils.config import config

    def run(mesh, n_steps=5):
        old = {('memory', 'max_dense_stack_gb'): None,
               ('matrix assembly', 'sampled_min_groups'): None,
               ('linear algebra', 'banded_solve'): None}
        for k in old:
            old[k] = config.get(*k)
        try:
            config.set('memory', 'max_dense_stack_gb', '0')
            config.set('matrix assembly', 'sampled_min_groups', '8')
            config.set('linear algebra', 'banded_solve', mode)
            problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5, mesh=mesh)
            solver = problem.build_solver(d3.SBDF2, matsolver='banded')
            b = ctx['b']
            z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
            Lz = ctx['Lz']
            b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
            b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
            solver.run_steps(1e-3, n_steps)
            assert solver.matsolver == 'banded'
            return np.asarray(solver.state_flat()), solver
        finally:
            for (sec, key), val in old.items():
                config.set(sec, key, val)

    s, _ = run(None)
    d, solver = run((8,))
    err = np.abs(s - d).max()
    assert err < 1e-12 * max(1, np.abs(s).max()), f"banded mismatch: {err}"
    # The banded QR factors really are group-sharded over the mesh
    ts = solver.timestepper
    fact = ts._get_factorized(*list(ts._factorized)[0])
    mats = ts._step_mats(fact)
    fac_arrs = mats['solve']['fac']
    if 'Mf_blk' in fac_arrs:      # blocked ships (K, C, G, flat) chunk panels
        arr = fac_arrs['Mf_blk']
        assert arr.sharding.spec[2] is not None
    else:
        arr = fac_arrs['Af' if 'Af' in fac_arrs else 'Qt']
        assert arr.sharding.spec[0] is not None


def test_distributed_lbvp_matches_serial():
    """LBVP factorization stacks shard over the mesh and the solution
    matches serial (ref solvers.py:324 runs LBVPs under MPI)."""
    def run(mesh):
        coords = d3.CartesianCoordinates('x', 'z')
        dist = d3.Distributor(coords, dtype=np.float64, mesh=mesh)
        xb = d3.RealFourier(coords['x'], size=32, bounds=(0, 2 * np.pi), dealias=1.5)
        zb = d3.ChebyshevT(coords['z'], size=16, bounds=(0, 1), dealias=1.5)
        u = dist.Field(name='u', bases=(xb, zb))
        tau1 = dist.Field(name='tau1', bases=xb)
        tau2 = dist.Field(name='tau2', bases=xb)
        lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
        f = dist.Field(name='f', bases=(xb, zb))
        x, z = dist.local_grids(xb, zb, scales=1)
        f.change_scales(1)
        f['g'] = np.sin(2 * x) * np.cos(np.pi * z)
        problem = d3.LBVP([u, tau1, tau2], namespace=locals())
        problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) = f")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
        solver = problem.build_solver()
        solver.solve()
        return np.asarray(solver.state_flat()), solver

    s, _ = run(None)
    d, solver = run((8,))
    err = np.abs(s - d).max()
    assert err < 1e-12, f"LBVP distributed mismatch: {err}"
    # The factorization really is group-sharded over the mesh
    fact = solver._factorized
    arr = getattr(fact, 'lu', None)
    if arr is None:
        arr = getattr(fact, 'Ainv', None)
    if arr is not None:
        assert arr.sharding.spec[0] is not None


def test_distributed_nlbvp_matches_serial():
    """Newton iterations with per-iteration factorization shard over the
    mesh (ref solvers.py:418)."""
    def run(mesh):
        c = d3.Coordinate('x')
        dist = d3.Distributor(c, dtype=np.float64, mesh=None)  # 1D: serial axis
        # 2D so a separable axis exists to shard
        coords = d3.CartesianCoordinates('x', 'z')
        dist = d3.Distributor(coords, dtype=np.float64, mesh=mesh)
        xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2 * np.pi), dealias=2)
        zb = d3.ChebyshevT(coords['z'], size=16, bounds=(0, 1), dealias=2)
        u = dist.Field(name='u', bases=(xb, zb))
        tau1 = dist.Field(name='tau1', bases=xb)
        tau2 = dist.Field(name='tau2', bases=xb)
        lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
        g = dist.Field(name='g', bases=(xb, zb))
        x, z = dist.local_grids(xb, zb, scales=1)
        g.change_scales(1)
        g['g'] = 1 + 0.1 * np.sin(x) * z
        problem = d3.NLBVP([u, tau1, tau2], namespace=locals())
        problem.add_equation("lap(u) + lift(tau1,-1) + lift(tau2,-2) = u*u - g")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
        solver = problem.build_solver()
        u['g'] = 0.1
        for _ in range(6):
            err = solver.newton_iteration()
        return np.asarray(solver.state_flat()), err

    s, es = run(None)
    d, ed = run((8,))
    err = np.abs(s - d).max()
    assert err < 1e-11, f"NLBVP distributed mismatch: {err}"


def test_distributed_evp_matches_serial():
    """EVP with a mesh-attached Distributor reproduces serial eigenvalues."""
    def run(mesh):
        coords = d3.CartesianCoordinates('x', 'z')
        dist = d3.Distributor(coords, dtype=np.complex128, mesh=mesh)
        xb = d3.ComplexFourier(coords['x'], size=8, bounds=(0, 2 * np.pi))
        zb = d3.ChebyshevT(coords['z'], size=16, bounds=(0, 1))
        u = dist.Field(name='u', bases=(xb, zb))
        tau1 = dist.Field(name='tau1', bases=xb)
        tau2 = dist.Field(name='tau2', bases=xb)
        s = dist.Field(name='s')
        lift = lambda A, n: d3.Lift(A, zb.derivative_basis(2), n)
        problem = d3.EVP([u, tau1, tau2], eigenvalue=s, namespace=locals())
        problem.add_equation("s*u + lap(u) + lift(tau1,-1) + lift(tau2,-2) = 0")
        problem.add_equation("u(z=0) = 0")
        problem.add_equation("u(z=1) = 0")
        solver = problem.build_solver()
        solver.solve_dense(sp_index=1)
        ev = solver.eigenvalues
        return np.sort_complex(ev[np.isfinite(ev)])

    es = run(None)
    ed = run((8,))
    n = min(es.size, ed.size, 10)
    np.testing.assert_allclose(es[:n], ed[:n], rtol=1e-9, atol=1e-9)
