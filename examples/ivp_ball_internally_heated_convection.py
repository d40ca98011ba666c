"""
Internally heated convection in the ball (gating config 5b; mirrors reference
examples/ivp_ball_internally_heated_convection/internally_heated_convection.py):
Boussinesq convection in a full sphere with a homogeneous internal heat
source, stress-free no-penetration boundary, and fixed surface temperature
flux (reference BCs: shear_stress = 0, radial(u(r=1)) = 0,
radial(grad(T)(r=1)) = -2). Exercises the full 3D spherical stack: vector
unknowns, regularity recombination, vector taus, the LINEAR r_vec*T buoyancy
term (a ball tensor NCC on the LHS), angular/radial component selectors on
rank-2 boundary expressions, and the volume-integral pressure gauge.

Run: python examples/ivp_ball_internally_heated_convection.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nphi, Ntheta, Nr = 32, 16, 24
Rayleigh, Prandtl = 1e4, 1
dealias = 3/2
timestep = 2e-3
n_steps = 200
dtype = np.float64

# Bases
coords = d3.SphericalCoordinates('phi', 'theta', 'r')
dist = d3.Distributor(coords, dtype=dtype)
ball = d3.BallBasis(coords, shape=(Nphi, Ntheta, Nr), radius=1,
                    dealias=dealias, dtype=dtype)

# Fields
u = dist.VectorField(coords, name='u', bases=ball)
p = dist.Field(name='p', bases=ball)
T = dist.Field(name='T', bases=ball)
tau_p = dist.Field(name='tau_p')
tau_u = dist.VectorField(coords, name='tau_u', bases=ball.surface)
tau_T = dist.Field(name='tau_T', bases=ball.surface)

# Substitutions
phi, theta, r = dist.local_grids(ball, scales=1)
r_vec = dist.VectorField(coords, name='r_vec', bases=ball)
r_vec.change_scales(1)
rv = np.zeros((3, Nphi, Ntheta, Nr))
rv[2] = r
r_vec.preset_data(dist.grid_layout, jnp.asarray(rv))
T_source = 6
kappa = (Rayleigh * Prandtl)**(-1/2)
nu = (Rayleigh / Prandtl)**(-1/2)
lift = lambda A: d3.Lift(A, ball, -1)
strain_rate = d3.grad(u) + d3.TransposeComponents(d3.grad(u))
shear_stress = d3.AngularComponent(
    d3.RadialComponent(strain_rate(r=1), 0), 0)
radial = d3.RadialComponent

# Problem: stress-free, no penetration, fixed flux (reference BCs)
problem = d3.IVP([p, u, T, tau_p, tau_u, tau_T], namespace=locals())
problem.add_equation("div(u) + tau_p = 0")
problem.add_equation(
    "dt(u) - nu*lap(u) + grad(p) - r_vec*T + lift(tau_u) = - cross(curl(u),u)")
problem.add_equation(
    "dt(T) - kappa*lap(T) + lift(tau_T) = - u@grad(T) + kappa*T_source")
problem.add_equation("shear_stress = 0")
problem.add_equation("radial(u(r=1)) = 0")
problem.add_equation("radial(grad(T)(r=1)) = -2")
problem.add_equation("integ(p) = 0")

# Solver
solver = problem.build_solver(d3.SBDF2)

# Initial conditions: conductive profile + noise
T.fill_random('g', seed=42, distribution='normal', scale=0.01)
T.change_scales(1)
T.require_grid_space()
T.preset_data(dist.grid_layout,
              T.data + jnp.asarray(np.broadcast_to(1 - r**2, (Nphi, Ntheta, Nr)).copy()))

# Output: equatorial temperature and total KE
snapshots = solver.evaluator.add_file_handler('ball_snapshots', iter=50,
                                              max_writes=10)
snapshots.add_task(T, name='T')
flow = d3.GlobalFlowProperty(solver, cadence=50)
flow.add_property(u @ u, name='u2')

# Main loop
logger.info('Starting main loop')
solver.run_steps(timestep, n_steps)
logger.info(f"Final iteration: {solver.iteration}")

# Diagnostics: BCs and incompressibility hold to spectral precision
for f in (u, T, p):
    f.require_coeff_space()
    assert np.isfinite(np.asarray(f.data)).all()
bc = d3.RadialComponent(u(r=1)).evaluate()
bc.require_coeff_space()
logger.info(f"max|radial u(r=1)| = {np.abs(np.asarray(bc.data)).max():.3e}")
dv = d3.div(u).evaluate()
dv.require_coeff_space()
logger.info(f"max|div(u)| = {np.abs(np.asarray(dv.data)).max():.3e}")
assert np.abs(np.asarray(bc.data)).max() < 1e-12
assert np.abs(np.asarray(dv.data)).max() < 1e-12
