"""
Centrifugally-driven convection in an annulus (gating config 4b).

Mirrors the reference example (examples/ivp_annulus_centrifugal_convection):
Boussinesq convection between rotating cylinders with the centrifugal force
r * T er driving the flow; no-slip, fixed-temperature walls.

Run: python examples/ivp_annulus_convection.py [stop_time]
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nphi, Nr = 64, 32
Rayleigh = 1e5
Prandtl = 1
dealias = 3 / 2
stop_sim_time = float(sys.argv[1]) if len(sys.argv) > 1 else 1
timestepper = d3.RK222
timestep = 2e-3
dtype = np.float64
Ri, Ro = 1.0, 2.0

# Bases
coords = d3.PolarCoordinates('phi', 'r')
dist = d3.Distributor(coords, dtype=dtype)
annulus = d3.AnnulusBasis(coords, shape=(Nphi, Nr), radii=(Ri, Ro), dealias=dealias,
                          dtype=dtype)
edge = annulus.S1_basis()

# Fields
u = dist.VectorField(coords, name='u', bases=annulus)
p = dist.Field(name='p', bases=annulus)
T = dist.Field(name='T', bases=annulus)
tau_u1 = dist.VectorField(coords, name='tau_u1', bases=edge)
tau_u2 = dist.VectorField(coords, name='tau_u2', bases=edge)
tau_T1 = dist.Field(name='tau_T1', bases=edge)
tau_T2 = dist.Field(name='tau_T2', bases=edge)
tau_p = dist.Field(name='tau_p')

# Substitutions
phi, r = annulus.global_grids(scales=(1, 1))
phi = phi.reshape(-1, 1)
r = r.reshape(1, -1)
nu = (Rayleigh / Prandtl)**(-1/2)
kappa = (Rayleigh * Prandtl)**(-1/2)
lift_basis = annulus.derivative_basis(2)
lift = lambda A, n: d3.Lift(A, lift_basis, n)
# Radial buoyancy field r*er as an NCC-free RHS-side field
rvec = dist.VectorField(coords, name='rvec', bases=annulus)
rdata = np.zeros((2,) + np.broadcast_shapes(phi.shape, r.shape))
rdata[1] = r * np.ones_like(phi)
rvec['g'] = rdata

# Problem
problem = d3.IVP([p, T, u, tau_p, tau_T1, tau_T2, tau_u1, tau_u2], namespace=locals())
problem.add_equation("div(u) + tau_p = 0")
problem.add_equation("dt(T) - kappa*lap(T) + lift(tau_T1,-1) + lift(tau_T2,-2) = - u@grad(T)")
problem.add_equation("dt(u) - nu*lap(u) + grad(p) + lift(tau_u1,-1) + lift(tau_u2,-2) "
                     "= - u@grad(u) + rvec*T")
problem.add_equation("T(r=Ri) = 1")
problem.add_equation("u(r=Ri) = 0")
problem.add_equation("T(r=Ro) = 0")
problem.add_equation("u(r=Ro) = 0")
problem.add_equation("integ(p) = 0")

# Solver
solver = problem.build_solver(timestepper)
solver.stop_sim_time = stop_sim_time

# Initial conditions
T.fill_random('g', seed=42, distribution='normal', scale=1e-3)
T['g'] = np.array(T['g', 1]) * (r - Ri) * (Ro - r) + (Ro - r) / (Ro - Ri)

# Flow properties
flow = d3.GlobalFlowProperty(solver, cadence=10)
flow.add_property(u @ u, name='u2')

# Main loop
try:
    logger.info('Starting main loop')
    while solver.proceed:
        solver.step(timestep)
        if (solver.iteration - 1) % 50 == 0:
            logger.info("Iteration=%i, Time=%e, max(u)=%e"
                        % (solver.iteration, solver.sim_time, np.sqrt(flow.max('u2'))))
except Exception:
    logger.error('Exception raised, triggering end of main loop.')
    raise
finally:
    solver.log_stats()
