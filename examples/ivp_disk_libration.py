"""
Librational instability in a disk (gating config 4a).

Mirrors the reference example (examples/ivp_disk_libration/libration.py):
incompressible Navier-Stokes linearized around a librating background flow,
using the disk basis (Zernike) with one velocity tau on the edge.

Run: python examples/ivp_disk_libration.py [stop_time]
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
from scipy.special import jv
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nphi, Nr = 32, 64
Ekman = 1 / 2 / 20**2
Ro = 40
dealias = 3 / 2
stop_sim_time = float(sys.argv[1]) if len(sys.argv) > 1 else 2
timestepper = d3.SBDF2
timestep = 1e-3
dtype = np.float64

# Bases
coords = d3.PolarCoordinates('phi', 'r')
dist = d3.Distributor(coords, dtype=dtype)
disk = d3.DiskBasis(coords, shape=(Nphi, Nr), radius=1, dealias=dealias, dtype=dtype)
edge = disk.edge

# Fields
u = dist.VectorField(coords, name='u', bases=disk)
p = dist.Field(name='p', bases=disk)
tau_u = dist.VectorField(coords, name='tau_u', bases=edge)
tau_p = dist.Field(name='tau_p')

# Substitutions
phi, r = disk.global_grids(scales=(1, 1))
phi = phi.reshape(-1, 1)
r = r.reshape(1, -1)
nu = Ekman
lift = lambda A: d3.Lift(A, disk, -1)

# Background librating flow
u0_real = dist.VectorField(coords, name='u0r', bases=disk)
u0_imag = dist.VectorField(coords, name='u0i', bases=disk)
profile = jv(1, (1 - 1j) * r / np.sqrt(2 * Ekman)) / jv(1, (1 - 1j) / np.sqrt(2 * Ekman))
data_r = np.zeros((2,) + (np.broadcast_shapes(phi.shape, r.shape)))
data_i = np.zeros_like(data_r)
data_r[0] = Ro * np.real(profile) * np.ones_like(phi)
data_i[0] = Ro * np.imag(profile) * np.ones_like(phi)
u0_real['g'] = data_r
u0_imag['g'] = data_i
t = dist.Field(name='t')
u0 = np.cos(t) * u0_real - np.sin(t) * u0_imag

# Problem
problem = d3.IVP([p, u, tau_u, tau_p], time=t, namespace=locals())
problem.add_equation("div(u) + tau_p = 0")
problem.add_equation("dt(u) - nu*lap(u) + grad(p) + lift(tau_u) = - u@grad(u0) - u0@grad(u)")
problem.add_equation("u(r=1) = 0")
problem.add_equation("integ(p) = 0")

# Solver
solver = problem.build_solver(timestepper)
solver.stop_sim_time = stop_sim_time

# Initial conditions
u.fill_random('g', seed=42, distribution='standard_normal')
u.low_pass_filter(shape=(8, 16))

# Analysis
scalars = solver.evaluator.add_file_handler('scalars_libration', sim_dt=0.01)
scalars.add_task(d3.integ(0.5 * u @ u), name='KE')

# Flow properties
flow = d3.GlobalFlowProperty(solver, cadence=100)
flow.add_property(u @ u, name='u2')

# Main loop
try:
    logger.info('Starting main loop')
    while solver.proceed:
        solver.step(timestep)
        if (solver.iteration - 1) % 100 == 0:
            max_u = np.sqrt(flow.max('u2'))
            logger.info("Iteration=%i, Time=%e, dt=%e, max(u)=%e"
                        % (solver.iteration, solver.sim_time, timestep, max_u))
except Exception:
    logger.error('Exception raised, triggering end of main loop.')
    raise
finally:
    solver.log_stats()
