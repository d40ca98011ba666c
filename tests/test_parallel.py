"""
Distributed-execution tests on a virtual 8-device CPU mesh (mirrors the
reference's dedalus/tests_parallel strategy of real small meshes).

The distributed RBC step (pencils sharded over kx, all_to_all transposes)
must reproduce the serial solver's state exactly.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import dedalus_tpu.public as d3
from dedalus_tpu.parallel.rbc import DistributedRBC
from dedalus_tpu.models.rbc import build_rbc_problem
from dedalus_tpu.parallel.transpose import localize_axis


def test_all_to_all_transpose_roundtrip():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ('x',))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((16, 24))

    def body(a):
        b = localize_axis(a, 'x', gather_axis=0, scatter_axis=1)  # (16, 24/8)
        c = localize_axis(b, 'x', gather_axis=1, scatter_axis=0)  # back
        return c

    f = shard_map(body, mesh=mesh, in_specs=P('x', None), out_specs=P('x', None))
    out = jax.jit(f)(A)
    assert np.allclose(np.array(out), A)


@pytest.mark.parametrize("n_steps", [3])
def test_distributed_rbc_matches_serial(n_steps):
    Nx, Nz = 32, 16
    dt = 1e-3
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ('x',))
    dist_rbc = DistributedRBC(Nx, Nz, mesh, Rayleigh=1e5, dt=dt)
    X0 = dist_rbc.initial_state(seed=42)
    #

    # Serial reference: same problem, same scheme, same ICs
    problem, ctx = build_rbc_problem(Nx, Nz, Rayleigh=1e5)
    solver = problem.build_solver(d3.SBDF2)
    b = ctx['b']
    z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
    Lz = ctx['Lz']
    b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
    b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
    for _ in range(n_steps):
        solver.step(dt)
    X_serial = np.asarray(solver.pencil.gather_state(solver.state_flat()))

    X_dist = np.asarray(dist_rbc.run(X0, n_steps))
    err = np.abs(X_dist - X_serial).max()
    scale = np.abs(X_serial).max()
    assert err < 1e-12 * max(1, scale), f"distributed/serial mismatch: {err}"
