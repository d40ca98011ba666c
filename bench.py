"""
Benchmark: 2D Rayleigh-Benard IMEX stepping throughput (DOF*steps/sec/chip).

Default configuration is the BASELINE-scale 1024x256 run (the largest RBC
that fits this device's compile budget; 2048x512 via BENCH_NX/BENCH_NZ).
The compiled step fuses MMT transforms, the nonlinear RHS, and the
separable-GEMM (poly) pencil solve into one XLA program; run_steps scans
dependent steps inside a single device call, so timings are honest under
the axon server's memoization (identical-input calls return cached results).

Baseline: the reference publishes no absolute numbers (BASELINE.md); its only
anchor is "2-D RBC 256x64, Ra=2e6, t_stop=50: about 5 cpu-minutes"
(examples/ivp_2d_rayleigh_benard/rayleigh_benard.py:6). With CFL-limited
steps (~1200 steps at safety 0.5, max_dt 0.125) that is roughly
  256*64*4 fields * 1200 steps / 300 s ~= 2.6e5 DOF*steps/sec.
The reference itself cannot run here (no mpi4py/FFTW), so vs_baseline
reports our throughput against that estimate.

Current record (2026-08-17): 4.91M DOF*steps/sec at 1024x256 (213.6 ms/step).
Cumulative 1.7x over the round-1 path: split-bf16 preconditioner applies +
host-assembled Chebyshev coefficients (refinements 12 -> 2), grouped RHS
transforms, and the derived-LX scan step (L X reconstructed from the
previous solve identity, removing the L GEMM from every step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    # Persistent compilation cache: the axon remote compiler takes minutes per
    # program; cached executables make reruns (and the driver's bench) fast.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dedalus_tpu  # noqa: F401 (x64 on)
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem

    Nx = int(os.environ.get('BENCH_NX', 1024))
    Nz = int(os.environ.get('BENCH_NZ', 256))
    n_warm = int(os.environ.get('BENCH_WARMUP', 5))
    n_steps = int(os.environ.get('BENCH_STEPS', 50))
    matsolver = os.environ.get('BENCH_SOLVER', 'poly')
    dt = 1e-3

    t0 = time.perf_counter()
    # Eager IC work on the CPU backend (avoids per-op remote TPU compiles);
    # solver/device arrays are built on the default (TPU) device.
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
    solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
    # Commit all state data to the accelerator
    for f in solver.state:
        f.data = jax.device_put(np.asarray(f.data), device)
    t1 = time.perf_counter()

    # Warmup (compile): startup steps + one scan chunk
    solver.run_steps(dt, max(n_warm, 3))
    jax.block_until_ready(solver.timestepper.F)
    solver.run_steps(dt, n_steps)
    jax.block_until_ready(solver.timestepper.F)
    t2 = time.perf_counter()

    # Timed: one compiled scan over n_steps (a single device call on evolving
    # state — no identical-input memoization)
    solver.run_steps(dt, n_steps)
    jax.block_until_ready(solver.timestepper.F)
    t3 = time.perf_counter()

    run_time = t3 - t2
    dof = Nx * Nz * 4  # p, b, u(2)
    throughput = dof * n_steps / run_time
    baseline = 2.6e5  # estimated reference CPU anchor (see module docstring)
    result = {
        "metric": f"RBC {Nx}x{Nz} f64 DOF*steps/sec/chip ({solver.matsolver})",
        "value": round(throughput, 1),
        "unit": "DOF*steps/sec",
        "vs_baseline": round(throughput / baseline, 3),
    }
    print(json.dumps(result))
    print(f"# setup={t1-t0:.1f}s compile+warmup={t2-t1:.1f}s "
          f"run={run_time:.3f}s/{n_steps} steps "
          f"({run_time/n_steps*1e3:.2f} ms/step) device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == '__main__':
    main()
