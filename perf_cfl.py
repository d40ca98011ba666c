"""
Measure CFL-adaptive vs fixed-dt stepping throughput at the BASELINE scale.

The reference's main loop handles variable dt natively, refactoring only when
(a0, b0) change (reference dedalus/core/timesteppers.py:120-180). This
framework's equivalent is the chunked CFL loop (see
examples/ivp_2d_rayleigh_benard.py): between CFL updates dt is constant, so
each span runs as one compiled multi-step call; a dt change triggers a
device-GEMM Chebyshev refit of the poly preconditioner against the new
(a0, b0) instead of a host refactorization, and `quantize` snaps dt onto a
geometric grid so the LRU factorization cache stays bounded.

Prints one JSON line:
  {"fixed": {...}, "adaptive": {...}, "ratio": adaptive_ms / fixed_ms}
Target (VERDICT r2 item 3): ratio <= ~1.5.

Run AFTER bench.py so the 2048x512 compile + preconditioner caches are warm:
  python perf_cfl.py            # env: PERF_NX/PERF_NZ/PERF_STEPS/PERF_CADENCE
"""

import json
import os
import sys
import time

if (os.environ.get('PYTHONHASHSEED') != '0'
        and sys.argv and sys.argv[0].endswith('perf_cfl.py')):
    env = dict(os.environ, PYTHONHASHSEED='0')
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np


def _sync(solver):
    """Scalar fetch off the newest history entry: the only reliable
    execution barrier under the axon serving layer (block_until_ready on
    large arrays returns before execution; see bench.py timing notes)."""
    return float(solver.timestepper.F.ravel()[0])


def build(Nx, Nz):
    import jax
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem
    cpu = jax.devices('cpu')[0]
    device = jax.devices()[0]
    with jax.default_device(cpu):
        problem, ctx = build_rbc_problem(Nx, Nz, Rayleigh=2e6)
        b = ctx['b']
        z = ctx['dist'].local_grid(ctx['zbasis'], scale=1)
        Lz = ctx['Lz']
        b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
        b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
        b.require_coeff_space()
    solver = problem.build_solver(
        d3.SBDF2, matsolver=os.environ.get('PERF_SOLVER', 'banded'))
    for f in solver.state:
        f.data = jax.device_put(np.asarray(f.data), device)
    return solver, ctx


def run_fixed(Nx, Nz, n_steps, chunk=10, dt=1e-3):
    # Note: the adaptive run's initial dt is quantize-snapped (~9.77e-4 for
    # dt0=1e-3, quantize=2^0.25) so the two runs integrate slightly different
    # trajectories; immaterial for per-step cost, which is shape-determined.
    import jax
    solver, _ = build(Nx, Nz)
    solver.run_steps(dt, 5)                      # compile + warmup
    _sync(solver)
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        m = min(chunk, n_steps - done)
        solver.run_steps(dt, m)
        _sync(solver)
        done += m
    el = time.perf_counter() - t0
    return dict(ms_per_step=round(el / n_steps * 1e3, 2),
                throughput=round(Nx * Nz * 4 * n_steps / el, 1))


def run_adaptive(Nx, Nz, n_steps, cadence=10, dt0=1e-3):
    import jax
    import dedalus_tpu.public as d3
    solver, ctx = build(Nx, Nz)
    solver.stop_iteration = n_steps + cadence + 1
    CFL = d3.CFL(solver, initial_dt=dt0, cadence=cadence, safety=0.5,
                 threshold=0.05, max_change=1.5, min_change=0.5,
                 max_dt=0.125, quantize=2 ** 0.25)
    CFL.add_velocity(ctx['u'])
    # Warmup must compile EVERYTHING the timed loop touches: the step program
    # AND the CFL grid-reduction (max_frequency). compute_timestep() skips the
    # reduction off-cadence, so trigger the reduction's trace+JIT explicitly
    # (ADVICE r3: it otherwise first compiles ~iteration 11, inside the timer).
    dt = CFL.compute_timestep()
    CFL.max_frequency()                          # blocking host float
    solver.run_steps(dt, CFL.chunk_steps(max_n=cadence))
    _sync(solver)
    # Run past the first on-cadence update so its one-time poly refit for the
    # new (a0, b0) is also out of the timed region.
    dt = CFL.compute_timestep()
    solver.run_steps(dt, CFL.chunk_steps(max_n=cadence))
    _sync(solver)
    start_it = solver.iteration
    dts = []
    t0 = time.perf_counter()
    while solver.iteration - start_it < n_steps:
        dt = CFL.compute_timestep()
        dts.append(dt)
        solver.run_steps(dt, CFL.chunk_steps(max_n=cadence))
        _sync(solver)
    el = time.perf_counter() - t0
    n = solver.iteration - start_it
    return dict(ms_per_step=round(el / n * 1e3, 2),
                throughput=round(Nx * Nz * 4 * n / el, 1),
                steps=int(n), distinct_dts=len(sorted(set(dts))),
                dt_range=[min(dts), max(dts)])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dedalus_tpu  # noqa: F401 (x64 on)
    Nx = int(os.environ.get('PERF_NX', 2048))
    Nz = int(os.environ.get('PERF_NZ', 512))
    n = int(os.environ.get('PERF_STEPS', 200))
    cadence = int(os.environ.get('PERF_CADENCE', 10))
    fixed = run_fixed(Nx, Nz, n)
    adaptive = run_adaptive(Nx, Nz, n, cadence=cadence)
    out = dict(config=f"RBC {Nx}x{Nz} f64 "
                      f"({os.environ.get('PERF_SOLVER', 'banded')})",
               fixed=fixed,
               adaptive=adaptive,
               ratio=round(adaptive['ms_per_step'] / fixed['ms_per_step'], 3))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
