"""
2D periodic shear flow with a passive tracer (mirrors reference
examples/ivp_2d_shear_flow/shear_flow.py): doubly periodic incompressible
Navier-Stokes with two tanh shear layers and a tracer field marking one
stream. Demonstrates fully periodic IVPs (pressure gauge via tau_p),
vector calculus in Cartesian coordinates, and snapshot output.

Run: python examples/ivp_2d_shear_flow.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Lx, Lz = 1, 2
Nx, Nz = 128, 256
Reynolds = 5e4
Schmidt = 1
stop_sim_time = 2
timestep = 1e-3
dtype = np.float64

# Bases
coords = d3.CartesianCoordinates('x', 'z')
dist = d3.Distributor(coords, dtype=dtype)
xbasis = d3.RealFourier(coords['x'], size=Nx, bounds=(0, Lx), dealias=3/2)
zbasis = d3.RealFourier(coords['z'], size=Nz, bounds=(-Lz/2, Lz/2), dealias=3/2)

# Fields
p = dist.Field(name='p', bases=(xbasis, zbasis))
s = dist.Field(name='s', bases=(xbasis, zbasis))
u = dist.VectorField(coords, name='u', bases=(xbasis, zbasis))
tau_p = dist.Field(name='tau_p')

# Substitutions
nu = 1 / Reynolds
D = nu / Schmidt
x, z = dist.local_grids(xbasis, zbasis, scales=1)

# Problem
problem = d3.IVP([u, s, p, tau_p], namespace=locals())
problem.add_equation("dt(u) + grad(p) - nu*lap(u) = - u@grad(u)")
problem.add_equation("dt(s) - D*lap(s) = - u@grad(s)")
problem.add_equation("div(u) + tau_p = 0")
problem.add_equation("integ(p) = 0")

# Solver
solver = problem.build_solver(d3.RK443)
solver.stop_sim_time = stop_sim_time

# Initial conditions: two shear layers + sinusoidal perturbation; tracer
# marks the central stream
ug = np.zeros((2, Nx, Nz))
ug[0] = np.broadcast_to(
    0.5 + 0.5 * (np.tanh((z - 0.5) / 0.1) - np.tanh((z + 0.5) / 0.1)), (Nx, Nz))
ug[1] = 0.1 * np.sin(2 * np.pi * x / Lx) * np.exp(-(z**2) / 0.01)
u['g'] = ug
s['g'] = np.broadcast_to(
    0.5 * (np.tanh((z - 0.5) / 0.1) - np.tanh((z + 0.5) / 0.1)) + 1, (Nx, Nz)).copy()

# Output
snapshots = solver.evaluator.add_file_handler('shear_snapshots', sim_dt=0.25,
                                              max_writes=10)
snapshots.add_task(s, name='tracer')
snapshots.add_task(p, name='pressure')

# Flow tools: max |w| monitoring
flow = d3.GlobalFlowProperty(solver, cadence=100)
flow.add_property((u @ u) / nu, name='Re_pt')

# Main loop: compiled scan stepping between output cadences
logger.info('Starting main loop')
n_steps = int(stop_sim_time / timestep)
solver.run_steps(timestep, n_steps)
logger.info(f"Final iteration: {solver.iteration}, sim time: {solver.sim_time:.3f}")

# Diagnostics
s.require_coeff_space()
u.require_coeff_space()
assert np.isfinite(np.asarray(s.data)).all()
assert np.isfinite(np.asarray(u.data)).all()
from dedalus_tpu import post
times, tracer = post.load_task('shear_snapshots', 'tracer')
logger.info(f"Wrote {len(times)} tracer snapshots; final range "
            f"[{tracer[-1].min():.3f}, {tracer[-1].max():.3f}]")
