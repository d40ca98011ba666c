"""
File handler and post-processing tests (mirrors dedalus/tests/test_output.py):
round-trips saved HDF5 data against re-evaluated tasks, set merging.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu import post


def test_file_handler_roundtrip(tmp_path):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi), dealias=1.5)
    u = dist.Field(name='u', bases=xb)
    nu = 0.1
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
    solver = problem.build_solver(d3.SBDF1)
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = np.sin(x)
    h = solver.evaluator.add_file_handler(str(tmp_path / 'out'), iter=5, max_writes=2)
    h.add_task(u, name='u')
    h.add_task(dx(u), name='ux')
    for _ in range(20):
        solver.step(1e-3)
    sets = post.list_sets(tmp_path / 'out')
    assert len(sets) >= 2  # max_writes=2 rolls sets
    times, data = post.load_task(tmp_path / 'out', 'u')
    assert data.shape[1] == 32  # saved on the scales=1 grid
    # Check last saved write matches the state at that iteration: re-derive
    scales = post.load_scales(tmp_path / 'out')
    assert len(scales['sim_time']) == len(times)
    # ux task: derivative consistency at the final write
    _, ux_data = post.load_task(tmp_path / 'out', 'ux')
    # spectral derivative of the saved u
    from dedalus_tpu.ops import transforms as T
    # check on the grid: du/dx of sin decays like u; compare numerically
    du_fd = np.gradient(data[-1], x, axis=0)
    assert np.abs(ux_data[-1] - du_fd).max() < 5e-2  # FD reference tolerance (one-sided endpoints)
    # Merge sets
    merged = post.merge_sets(tmp_path / 'out', tmp_path / 'merged.h5')
    import h5py
    with h5py.File(merged) as f:
        assert f['tasks/u'].shape[0] == len(times)


def test_quad_mesh():
    from dedalus_tpu.extras.plot_tools import quad_mesh, get_1d_vertices
    x = np.linspace(0, 1, 5)
    y = np.linspace(0, 2, 7)
    xe, ye = quad_mesh(x, y)
    # Reference convention: x along the LAST mesh axis (plot_tools.py:427)
    assert xe.shape == (8, 6) and ye.shape == (8, 6)
    v = get_1d_vertices(x)
    assert np.allclose(v[1:-1], (x[:-1] + x[1:]) / 2)
    v_cut = get_1d_vertices(x, cut_edges=True)
    assert v_cut[0] == x[0] and v_cut[-1] == x[-1]


def test_plot_bot_family(tmp_path):
    """plot_bot / plot_bot_2d / plot_bot_3d / MultiFigure produce figures
    from datasets and live Fields (parity: ref plot_tools.py:54-327)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from dedalus_tpu.extras.plot_tools import (
        plot_bot_2d, plot_bot_3d, MultiFigure, Box, Frame, pad_limits,
        quad_mesh)

    # Live 2D field
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2 * np.pi))
    zb = d3.ChebyshevT(coords['z'], size=8, bounds=(0, 1))
    u = dist.Field(name='u', bases=(xb, zb))
    x, z = dist.local_grids(xb, zb, scales=1)
    u.change_scales(1)
    u['g'] = np.sin(x) * z
    u.require_grid_space()
    paxes, caxes = plot_bot_2d(u, even_scale=True)
    assert paxes.figure is caxes.figure
    plt.close('all')

    # 3D slice via a fake h5py-like dataset
    class FakeDim:
        def __init__(self, g, label):
            self._g, self.label = g, label
        def __getitem__(self, item):
            return self._g

    class FakeDset:
        def __init__(self, data, grids, labels):
            self._d = data
            self.shape = data.shape
            self.attrs = {'name': 'fake'}
            self.dims = [FakeDim(g, l) for g, l in zip(grids, labels)]
        def __getitem__(self, item):
            return self._d[item]

    rng = np.random.default_rng(0)
    data = rng.standard_normal((4, 6, 5))
    grids = [np.linspace(0, 1, n) for n in data.shape]
    ds = FakeDset(data, grids, ['x', 'y', 'z'])
    paxes, _ = plot_bot_3d(ds, 'y', 2)
    # The slice normal to y shows the (x, z) plane
    assert paxes.get_xlabel() == 'x' and paxes.get_ylabel() == 'z'
    plt.close('all')

    # MultiFigure panel layout
    mf = MultiFigure(2, 3, Box(2, 2), Frame(0.2, 0.2, 0.2, 0.2),
                     Frame(0.1, 0.1, 0.1, 0.1))
    ax = mf.add_axes(1, 2, (0, 0, 1, 1))
    assert ax.figure is mf.figure
    w, h = mf.figure.get_size_inches()
    assert h == int(h)  # integer rectification
    plt.close('all')

    # pad_limits covers the meshes
    xm, ym = quad_mesh(grids[0], grids[1])
    x0, x1, y0, y1 = pad_limits(xm, ym, xpad=0.1)
    assert x0 < xm.min() and x1 > xm.max()


def test_overwrite_mode_removes_stale_sets(tmp_path):
    """Rerunning with mode='overwrite' must not append onto stale set files."""
    import h5py
    import dedalus_tpu.public as d3
    import numpy as np

    def run(n_writes):
        c = d3.Coordinate('x')
        dist = d3.Distributor(c, dtype=np.float64)
        xb = d3.RealFourier(c, size=8, bounds=(0, 1))
        u = dist.Field(name='u', bases=xb)
        problem = d3.IVP([u], namespace=locals())
        problem.add_equation("dt(u) = 0")
        solver = problem.build_solver(d3.SBDF1)
        h = solver.evaluator.add_file_handler(tmp_path / 'snap', iter=1,
                                              mode='overwrite')
        h.add_task(u, name='u')
        for _ in range(n_writes):
            solver.step(1e-3)

    run(5)
    run(2)
    files = list((tmp_path / 'snap').glob('snap_s*.h5'))
    assert len(files) == 1
    with h5py.File(files[0], 'r') as f:
        assert f['tasks/u'].shape[0] == 2


def test_append_mode_sorts_sets_numerically(tmp_path):
    """Append-mode set numbering must parse set indices, not sort strings."""
    import h5py
    base = tmp_path / 'snap'
    base.mkdir()
    # Simulate 11 pre-existing sets: lexicographic sort puts s10 before s2
    for i in range(1, 12):
        with h5py.File(base / f'snap_s{i}.h5', 'w') as f:
            f.attrs['final_write_num'] = i * 3
    from dedalus_tpu.core.evaluator import H5FileHandler
    h = H5FileHandler(None, base, mode='append')
    assert h.set_num == 11
    assert h.write_num == 33


def test_handlers_fire_during_run_steps(tmp_path):
    """run_steps must produce scheduled analysis output (chunked scans
    between handler cadences), matching the per-step loop's writes."""
    import h5py
    import numpy as np
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem

    def run(use_run_steps, sub):
        problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4)
        solver = problem.build_solver(d3.SBDF2)
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=3, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        h = solver.evaluator.add_file_handler(tmp_path / sub, iter=5,
                                              mode='overwrite')
        h.add_task(b, name='b')
        if use_run_steps:
            solver.run_steps(1e-3, 23)
        else:
            for _ in range(23):
                solver.step(1e-3)
        files = sorted((tmp_path / sub).glob('*.h5'))
        with h5py.File(files[0], 'r') as f:
            return np.asarray(f['tasks/b']), np.asarray(f['scales/iteration'])

    d_scan, it_scan = run(True, 'scan')
    d_loop, it_loop = run(False, 'loop')
    assert np.array_equal(it_scan, it_loop)
    assert d_scan.shape == d_loop.shape
    assert np.abs(d_scan - d_loop).max() < 1e-13


def test_sim_dt_cadence_exact_under_run_steps(tmp_path):
    """sim_dt cadences that are NOT multiples of dt must fire at exactly the
    same iterations under run_steps as under the per-step loop (next-fire
    scheduling; parity: reference evaluator.py:246)."""
    import h5py
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem

    dt = 1e-3
    sim_dt = 0.0037  # not a multiple of dt

    def run(use_run_steps, sub):
        problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4)
        solver = problem.build_solver(d3.SBDF2)
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=3, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        h = solver.evaluator.add_file_handler(tmp_path / sub, sim_dt=sim_dt,
                                              mode='overwrite')
        h.add_task(b, name='b')
        if use_run_steps:
            solver.run_steps(dt, 31)
        else:
            for _ in range(31):
                solver.step(dt)
        files = sorted((tmp_path / sub).glob('*.h5'))
        with h5py.File(files[0], 'r') as f:
            return (np.asarray(f['tasks/b']), np.asarray(f['scales/iteration']),
                    np.asarray(f['scales/sim_time']))

    d_scan, it_scan, t_scan = run(True, 'scan')
    d_loop, it_loop, t_loop = run(False, 'loop')
    assert np.array_equal(it_scan, it_loop)
    np.testing.assert_allclose(t_scan, t_loop, atol=1e-14)
    assert np.abs(d_scan - d_loop).max() < 1e-13


def test_wall_dt_handler_keeps_chunks(tmp_path):
    """A wall_dt handler must not collapse run_steps to per-step dispatch:
    the scan still runs multi-step chunks (bounded by the measured rate)."""
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem

    problem, ctx = build_rbc_problem(16, 8, Rayleigh=1e4)
    solver = problem.build_solver(d3.SBDF2)
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=3, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    h = solver.evaluator.add_file_handler(tmp_path / 'wall', wall_dt=3600,
                                          mode='overwrite')
    h.add_task(b, name='b')
    solver.run_steps(1e-3, 60)
    assert solver.iteration == 60
    # With an hour-long wall cadence the rate-bounded chunks must be large:
    # the compiled scan ran with multi-step lengths, not per-step dispatch.
    assert any(n > 1 for n in solver._chunk_history), solver._chunk_history


def _simple_solver(tmp_path, dtype=np.float64):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    xb = d3.RealFourier(c, size=32, bounds=(0, 2 * np.pi), dealias=1.5)
    u = dist.Field(name='u', bases=xb)
    nu = 0.1
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.IVP([u], namespace=locals())
    problem.add_equation("dt(u) - nu*dx(dx(u)) = 0")
    solver = problem.build_solver(d3.SBDF1)
    x = dist.local_grid(xb, scale=1).ravel()
    u['g'] = np.sin(x)
    return solver, u, dist, x


@pytest.mark.parametrize('n_shards', [1, 2, 4])
def test_virtual_file_handler(tmp_path, n_shards):
    """Virtual (sharded) output reads back identical to gather output
    (parity: reference H5VirtualFileHandler, evaluator.py:703-865)."""
    solver, u, dist, x = _simple_solver(tmp_path)
    hg = solver.evaluator.add_file_handler(str(tmp_path / 'gather'), iter=5,
                                           max_writes=4)
    hv = solver.evaluator.add_file_handler(str(tmp_path / 'virt'), iter=5,
                                           max_writes=4, parallel='virtual',
                                           n_shards=n_shards)
    for h in (hg, hv):
        h.add_task(u, name='u')
    for _ in range(20):
        solver.step(1e-3)
    tg, dg = post.load_task(tmp_path / 'gather', 'u')
    tv, dv = post.load_task(tmp_path / 'virt', 'u')
    np.testing.assert_array_equal(tg, tv)
    np.testing.assert_array_equal(dg, dv)
    # shard files exist for multi-shard runs
    if n_shards > 1:
        shards = list((tmp_path / 'virt').glob('virt_s*/*_p*.h5'))
        assert len(shards) >= n_shards
    # materializing merge produces a self-contained file
    merged = post.merge_virtual(tmp_path / 'virt', tmp_path / 'virt_merged.h5')
    import h5py
    with h5py.File(merged) as f:
        np.testing.assert_array_equal(np.asarray(f['tasks/u']), dg)


def test_parallel_mpio_handler_distributed(tmp_path):
    """Collective multi-controller output analog (parity: reference
    evaluator.py:653-725 H5ParallelFileHandler): on a distributed mesh run,
    each process writes its addressable sharding hyperslabs to a process
    file and the master virtual file reads back identical to the serial
    gather output."""
    from dedalus_tpu.models.rbc import build_rbc_problem

    def run(mesh, outdir, parallel):
        problem, ctx = build_rbc_problem(32, 16, Rayleigh=1e5, mesh=mesh)
        solver = problem.build_solver(d3.SBDF2)
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=11, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        h = solver.evaluator.add_file_handler(str(outdir), iter=3,
                                              max_writes=10, parallel=parallel)
        h.add_task(b, name='b')
        h.add_task(ctx['u'], name='u')
        for _ in range(9):
            solver.step(1e-3)
        return solver

    run(None, tmp_path / 'serial', 'gather')
    run((4,), tmp_path / 'dist', 'mpio')
    for name in ('b', 'u'):
        ts, ds = post.load_task(tmp_path / 'serial', name)
        tp, dp = post.load_task(tmp_path / 'dist', name)
        np.testing.assert_array_equal(ts, tp)
        np.testing.assert_allclose(dp, ds, rtol=0, atol=1e-13)
    # per-process shard files exist with hyperslab shard datasets
    procs = list((tmp_path / 'dist').glob('dist_s*/*_proc*.h5'))
    assert procs, "no process shard files written"
    import h5py
    with h5py.File(procs[0]) as f:
        names = list(f['tasks/b'])
        assert len(names) >= 4  # one dataset per distinct hyperslab


def test_load_tasks_coords(tmp_path):
    """load_tasks returns labeled dims and grid coordinates."""
    solver, u, dist, x = _simple_solver(tmp_path)
    h = solver.evaluator.add_file_handler(str(tmp_path / 'out'), iter=2)
    h.add_task(u, name='u')
    for _ in range(6):
        solver.step(1e-3)
    tasks = post.load_tasks(tmp_path / 'out')
    dims, coords, data = tasks['u']
    assert dims[0] == 't' and dims[1] == 'x'
    np.testing.assert_allclose(coords['x'], x)
    assert data.shape[1] == x.size
    # xarray backend is optional: gated with a clear error when absent
    try:
        import xarray  # noqa: F401
        ds = post.load_tasks_to_xarray(tmp_path / 'out')
        assert 'u' in ds
    except ImportError:
        with pytest.raises(ImportError, match='xarray'):
            post.load_tasks_to_xarray(tmp_path / 'out')
