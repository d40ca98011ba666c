"""
Benchmark: BASELINE-scale IMEX stepping throughput (DOF*steps/sec/chip).

Configs (env `BENCH_CONFIG`, default 'rbc'):
  rbc   2D Rayleigh-Benard at BENCH_NX x BENCH_NZ (default 2048x512 — the
        BASELINE target; compiled step fuses MMT transforms, nonlinear RHS,
        and the separable-GEMM poly solve; run_steps drives a single
        dynamic-trip-count program, so timings are honest under the axon
        server's memoization).
  ball  3D ball internally-heated convection at BENCH_BALL (default 64,32,32)
        through the framework's default solver chain (BENCH_BALL_SOLVER
        forces one, e.g. 'banded' — the QR-pivot-pinned memory-scalable
        spherical path, whose block arrays tile-pad ~3.2x on TPU).
  all   rbc + ball + the measured CPU self-anchor, with a roofline fraction
        against the measured device matmul ceiling. Writes BENCH_DETAILS.json.

Baselines: the reference publishes no absolute numbers (BASELINE.md). Two
anchors are reported:
  * anchor_cpu_measured — THIS framework on the CPU backend at the reference
    example's own 256x64 RBC config (measured in a subprocess).
  * anchor_ref_estimate — 2.6e5 DOF*steps/s, an ESTIMATE derived from the
    reference docstring "256x64, Ra=2e6, t_stop=50: about 5 cpu-minutes"
    (examples/ivp_2d_rayleigh_benard/rayleigh_benard.py:6) at CFL-limited
    step counts; the reference itself cannot run here (no mpi4py/FFTW).
`vs_baseline` is throughput / anchor_ref_estimate for continuity with
earlier rounds; the measured self-anchor is in the details.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
"""

import json
import os
import subprocess
import sys
import time

# Re-exec with a pinned interpreter hash seed BEFORE jax loads: set-iteration
# order during tracing depends on it, and an unpinned seed gives every run a
# byte-different (but equivalent) program — defeating the XLA persistent
# compilation cache that otherwise skips the ~10-minute remote compile.
if (os.environ.get('PYTHONHASHSEED') != '0'
        and sys.argv and sys.argv[0].endswith('bench.py')):
    env = dict(os.environ, PYTHONHASHSEED='0')
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


ANCHOR_REF_ESTIMATE = 2.6e5  # see module docstring: reference CPU estimate


def measure_ceiling(n=1024, batch=64):
    """Measured device matmul ceiling (TF/s): one compiled call of `batch`
    INDEPENDENT bf16 (n,n)@(n,n) matmuls. Independence matters — a chain of
    dependent matmuls measures latency, not throughput, and underestimates
    the MXU rate by orders of magnitude on high-dispatch-latency backends.
    Median of 3 calls on distinct inputs (the serving layer memoizes
    byte-identical executions)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, n, n)), dtype=jnp.bfloat16)

    @jax.jit
    def run(x, a):
        return jnp.matmul(x, a, preferred_element_type=jnp.bfloat16).sum()

    times = []
    for i in range(4):
        x = jnp.asarray(rng.standard_normal((batch, n, n)),
                        dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        run(x, a).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times[1:]))         # first call paid the compile
    return 2 * n**3 * batch / dt / 1e12


def _program_flops(solver):
    """XLA's own flop count for the compiled run program. The trip count is
    a dynamic while-loop bound, so XLA's model counts the loop body ONCE —
    i.e. this is (approximately) flops per STEP."""
    cost = solver.timestepper.run_program_cost()
    if not cost:
        return None
    return float(cost.get('flops', 0.0)) or None


def run_rbc(Nx, Nz, n_steps, matsolver, n_warm=5):
    import jax
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.rbc import build_rbc_problem

    dt = 1e-3
    t0 = time.perf_counter()
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
    for f in solver.state:
        f.data = jax.device_put(np.asarray(f.data), device)
    t1 = time.perf_counter()
    chunk = int(os.environ.get('BENCH_CHUNK', 10))
    # Warmup (compile): startup steps + the shared dynamic-length run program
    solver.run_steps(dt, max(n_warm, 3))
    jax.block_until_ready(solver.timestepper.F)
    solver.run_steps(dt, min(chunk, n_steps))
    jax.block_until_ready(solver.timestepper.F)
    t2 = time.perf_counter()
    # Timed: compiled scans over dependent, evolving state. Chunked so each
    # device execution stays under the serving layer's watchdog (~2 min);
    # every chunk reuses the SAME dynamic-trip-count program.
    done = 0
    while done < n_steps:
        m = min(chunk, n_steps - done)
        solver.run_steps(dt, m)
        jax.block_until_ready(solver.timestepper.F)
        done += m
    t3 = time.perf_counter()
    dof = Nx * Nz * 4  # p, b, u(2)
    return dict(config=f"RBC {Nx}x{Nz} f64 ({solver.matsolver})",
                dof=dof, steps=n_steps,
                setup_s=round(t1 - t0, 1),
                compile_warmup_s=round(t2 - t1, 1),
                run_s=round(t3 - t2, 3),
                ms_per_step=round((t3 - t2) / n_steps * 1e3, 2),
                throughput=round(dof * n_steps / (t3 - t2), 1),
                flops_per_step=_program_flops(solver))


def run_ball(Nphi, Ntheta, Nr, n_steps, matsolver=None, n_warm=3):
    import jax
    import dedalus_tpu.public as d3
    from dedalus_tpu.models.ball import build_ball_problem, set_conductive_ic

    dt = 1e-4
    t0 = time.perf_counter()
    cpu = jax.devices('cpu')[0]
    device = jax.devices()[0]
    with jax.default_device(cpu):
        problem, ctx = build_ball_problem(Nphi, Ntheta, Nr, Rayleigh=1e4)
        set_conductive_ic(ctx)
    solver = problem.build_solver(d3.SBDF2, matsolver=matsolver)
    for f in solver.state:
        f.data = jax.device_put(np.asarray(f.data), device)
    t1 = time.perf_counter()
    chunk = int(os.environ.get('BENCH_CHUNK', 10))
    solver.run_steps(dt, max(n_warm, 3))
    jax.block_until_ready(solver.timestepper.F)
    solver.run_steps(dt, min(chunk, n_steps))
    jax.block_until_ready(solver.timestepper.F)
    t2 = time.perf_counter()
    done = 0
    while done < n_steps:
        m = min(chunk, n_steps - done)
        solver.run_steps(dt, m)
        jax.block_until_ready(solver.timestepper.F)
        done += m
    t3 = time.perf_counter()
    dof = Nphi * Ntheta * Nr * 5  # p, T, u(3)
    return dict(config=f"ball {Nphi}x{Ntheta}x{Nr} f64 ({solver.matsolver})",
                dof=dof, steps=n_steps,
                setup_s=round(t1 - t0, 1),
                compile_warmup_s=round(t2 - t1, 1),
                run_s=round(t3 - t2, 3),
                ms_per_step=round((t3 - t2) / n_steps * 1e3, 2),
                throughput=round(dof * n_steps / (t3 - t2), 1))


def run_ball_bounded(shape, n_steps, matsolver, timeout_s):
    """run_ball in a subprocess with a hard timeout: the spherical step's
    remote compile has shown unbounded wall time on this backend, and one
    slow leg must not consume the whole bench budget."""
    payload = json.dumps(dict(shape=list(shape), n_steps=n_steps,
                              matsolver=matsolver))
    code = (
        "import json, sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "import bench\n"
        "bench._setup_jax()\n"
        "import dedalus_tpu\n"
        "cfg = json.loads(sys.argv[1])\n"
        "r = bench.run_ball(*cfg['shape'], n_steps=cfg['n_steps'],\n"
        "                   matsolver=cfg['matsolver'])\n"
        "print('BALL_RESULT ' + json.dumps(r))\n")
    out = subprocess.run([sys.executable, '-c', code, payload],
                         cwd='/root/repo', capture_output=True, text=True,
                         timeout=timeout_s)
    for line in out.stdout.splitlines():
        if line.startswith('BALL_RESULT '):
            return json.loads(line[len('BALL_RESULT '):])
    tail = (out.stderr or out.stdout or '').strip().splitlines()[-6:]
    raise RuntimeError("ball bench subprocess failed: " + " | ".join(tail))


def measure_cpu_anchor():
    """THIS framework on the CPU backend at the reference example's 256x64
    config (subprocess: the backend is fixed per process)."""
    code = r"""
import time, json
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import dedalus_tpu.public as d3
from dedalus_tpu.models.rbc import build_rbc_problem
problem, ctx = build_rbc_problem(256, 64, Rayleigh=2e6)
solver = problem.build_solver(d3.SBDF2)
b = ctx['b']; z = ctx['dist'].local_grid(ctx['zbasis'], scale=1); Lz = ctx['Lz']
b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
b['g'] = np.array(b['g']) * z * (Lz - z) + (Lz - z)
dt, n = 1e-3, 200
solver.run_steps(dt, 10)
jax.block_until_ready(solver.timestepper.F)
t0 = time.perf_counter()
solver.run_steps(dt, n)
jax.block_until_ready(solver.timestepper.F)
el = time.perf_counter() - t0
print(json.dumps({'throughput': 256 * 64 * 4 * n / el}))
"""
    try:
        out = subprocess.run([sys.executable, '-c', code], cwd='/root/repo',
                             capture_output=True, text=True, timeout=900)
        line = out.stdout.strip().splitlines()[-1]
        return round(json.loads(line)['throughput'], 1)
    except Exception:
        return None


def _probe_device(timeout_s=240):
    """Initialize the backend in a SUBPROCESS with a hard timeout: a wedged
    serving tunnel hangs client init forever (observed: multi-hour outages)
    inside native code where in-process signal handlers never fire, and the
    bench must fail fast into the CPU fallback instead."""
    code = ("import jax, jax.numpy as jnp\n"
            "jnp.ones((8, 8)).block_until_ready()\n"
            "print('DEVICE_OK', jax.devices()[0])\n")
    out = subprocess.run([sys.executable, '-c', code], cwd='/root/repo',
                         capture_output=True, text=True, timeout=timeout_s)
    if not any(line.startswith('DEVICE_OK')
               for line in out.stdout.splitlines()):
        tail = (out.stderr or out.stdout or '').strip().splitlines()[-3:]
        raise RuntimeError("device init failed: " + " | ".join(tail))


def main():
    jax = _setup_jax()
    import dedalus_tpu  # noqa: F401 (x64 on)

    # Default 'all': the driver invokes plain `python bench.py`, and the
    # round record should carry the full evidence set (RBC headline + ball
    # leg + measured ceiling + CPU self-anchor), not just one number.
    config = os.environ.get('BENCH_CONFIG', 'all')
    try:
        _probe_device()
    except Exception as exc:
        # Accelerator unavailable: report the measured CPU self-anchor so the
        # bench still emits its one JSON line. Carry forward the most recent
        # accelerator measurements (clearly labeled) so a tunnel outage at
        # bench time does not erase previously recorded device evidence.
        anchor = measure_cpu_anchor()
        details = {"device": "cpu-fallback",
                   "device_error": f"{type(exc).__name__}: {exc}"[:200],
                   "anchor_ref_estimate": ANCHOR_REF_ESTIMATE,
                   "anchor_cpu_measured": anchor}
        try:
            with open('/root/repo/BENCH_DETAILS.json') as f:
                prev = json.load(f)
            if prev.get("device") not in (None, "cpu-fallback"):
                details["previous_accelerator_details"] = prev
        except Exception:
            pass
        with open('/root/repo/BENCH_DETAILS.json', 'w') as f:
            json.dump(details, f, indent=1)
        print(json.dumps({
            "metric": "RBC 256x64 f64 CPU-FALLBACK (accelerator unreachable)"
                      " DOF*steps/sec",
            "value": anchor or 0.0,
            "unit": "DOF*steps/sec",
            "vs_baseline": round((anchor or 0.0) / ANCHOR_REF_ESTIMATE, 3),
            "details": details,
        }))
        return
    Nx = int(os.environ.get('BENCH_NX', 2048))
    Nz = int(os.environ.get('BENCH_NZ', 512))
    n_steps = int(os.environ.get('BENCH_STEPS', 50))
    matsolver = os.environ.get('BENCH_SOLVER', 'poly')
    details = {"device": str(jax.devices()[0]),
               "anchor_ref_estimate": ANCHOR_REF_ESTIMATE}

    if config in ('all',):
        try:
            details["ceiling_tfs_bf16"] = round(measure_ceiling(), 3)
        except Exception as exc:
            details["ceiling_tfs_bf16"] = f"{type(exc).__name__}: {exc}"[:200]
        details["anchor_cpu_measured"] = measure_cpu_anchor()
    head = None
    if config in ('rbc', 'all'):
        head = run_rbc(Nx, Nz, n_steps, matsolver)
        details["rbc"] = head
        if "ceiling_tfs_bf16" in details and head.get("flops_per_step"):
            eff = (head["flops_per_step"]
                   / (head["run_s"] / head["steps"])
                   / (details["ceiling_tfs_bf16"] * 1e12))
            details["rbc"]["roofline_frac"] = round(eff, 3)
    if config in ('ball', 'all'):
        shape = tuple(int(s) for s in
                      os.environ.get('BENCH_BALL', '64,32,32').split(','))
        try:
            # Default matsolver: the framework's device-appropriate chain
            # (dense inverse+refinement when stacks fit, else banded/poly).
            # BENCH_BALL_SOLVER forces one (e.g. 'banded' — the multi-chip
            # memory-scalable path; its (nb,nb)-block arrays pad ~3.2x on
            # TPU tiles, which can exceed single-chip HBM here).
            ball = run_ball_bounded(
                shape, n_steps=min(n_steps, 20),
                matsolver=os.environ.get('BENCH_BALL_SOLVER'),
                timeout_s=int(os.environ.get('BENCH_BALL_TIMEOUT', 2400)))
            details["ball"] = ball
            if head is None:
                head = ball
        except Exception as exc:        # one failed leg must not kill the bench
            details["ball"] = {"config": f"ball {shape}",
                               "error": f"{type(exc).__name__}: {exc}"[:300]}
    with open('/root/repo/BENCH_DETAILS.json', 'w') as f:
        json.dump(details, f, indent=1)
    result = {
        "metric": f"{head['config']} DOF*steps/sec/chip",
        "value": head["throughput"],
        "unit": "DOF*steps/sec",
        "vs_baseline": round(head["throughput"] / ANCHOR_REF_ESTIMATE, 3),
        "details": details,
    }
    print(json.dumps(result))
    print(f"# {head['config']}: setup={head['setup_s']}s "
          f"compile+warmup={head['compile_warmup_s']}s "
          f"run={head['run_s']}s/{head['steps']} steps "
          f"({head['ms_per_step']} ms/step)", file=sys.stderr)


if __name__ == '__main__':
    main()
