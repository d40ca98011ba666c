"""
Rotating Boussinesq convection in a spherical shell
(parity: reference examples/ivp_shell_convection/shell_convection.py +
rotation per examples/evp_shell_rotating_convection).

Solves in the rotating frame with Coriolis force 2 Omega ez x u (explicit),
no-slip inner and STRESS-FREE outer boundary (radial(u) = 0 and vanishing
angular shear stress via the component selectors).

Defaults are sized to finish in ~a minute on CPU; scale up with env vars:
    NPHI=192 NTHETA=96 NR=12 STEPS=2000 python examples/ivp_shell_convection.py
"""

import os
import time
import logging

import numpy as np
import dedalus_tpu.public as d3

logger = logging.getLogger(__name__)

# Parameters
Ri, Ro = 7, 10
Nphi = int(os.environ.get('NPHI', 16))
Ntheta = int(os.environ.get('NTHETA', 8))
Nr = int(os.environ.get('NR', 8))
n_steps = int(os.environ.get('STEPS', 100))
Rayleigh = 3500
Prandtl = 1
Ekman = 1e-1
dealias = 3 / 2
timestep = 2e-3
dtype = np.float64

# Bases
coords = d3.SphericalCoordinates('phi', 'theta', 'r')
dist = d3.Distributor(coords, dtype=dtype)
shell = d3.ShellBasis(coords, (Nphi, Ntheta, Nr), radii=(Ri, Ro),
                      dealias=dealias, dtype=dtype)
outer = shell.outer_surface
inner = shell.inner_surface

# Fields
p = dist.Field(name='p', bases=shell)
b = dist.Field(name='b', bases=shell)
u = dist.VectorField(coords, name='u', bases=shell)
tau_p = dist.Field(name='tau_p')
tau_b1 = dist.Field(name='tau_b1', bases=outer)
tau_b2 = dist.Field(name='tau_b2', bases=outer)
tau_u1 = dist.VectorField(coords, name='tau_u1', bases=outer)
tau_u2 = dist.VectorField(coords, name='tau_u2', bases=outer)

# Substitutions
kappa = (Rayleigh * Prandtl)**(-1 / 2)
nu = (Rayleigh / Prandtl)**(-1 / 2)
Omega = nu / Ekman / 2
phi, theta, r = dist.local_grids(shell, scales=1)
shp = np.broadcast_shapes(phi.shape, theta.shape, r.shape)
er = dist.VectorField(coords, name='er', bases=shell)
er.change_scales(1)
d = np.zeros((3,) + shp)
d[2] = 1.0
er['g'] = d
ez = dist.VectorField(coords, name='ez', bases=shell)
ez.change_scales(1)
d = np.zeros((3,) + shp)
d[1] = -np.sin(theta) * np.ones_like(phi) * np.ones_like(r)
d[2] = np.cos(theta) * np.ones_like(phi) * np.ones_like(r)
ez['g'] = d
rvec = dist.VectorField(coords, name='rvec', bases=shell)
rvec.change_scales(1)
d = np.zeros((3,) + shp)
d[2] = r * np.ones_like(phi) * np.ones_like(theta)
rvec['g'] = d
lift_basis = shell.derivative_basis(1)
lift = lambda A: d3.Lift(A, lift_basis, -1)
# First-order reduction: tau enters the divergence constraint through
# grad_u's trace, as required in the shell (ref shell_convection.py:70-79)
grad_u = d3.grad(u) + rvec * lift(tau_u1)
grad_b = d3.grad(b) + rvec * lift(tau_b1)
strain_rate = d3.grad(u) + d3.transpose(d3.grad(u))
shear_stress = d3.angular(d3.radial(strain_rate(r=Ro), index=1))

# Problem: no-slip inner, stress-free outer, rotating frame
problem = d3.IVP([p, b, u, tau_p, tau_b1, tau_b2, tau_u1, tau_u2],
                 namespace=locals())
problem.add_equation("trace(grad_u) + tau_p = 0")
problem.add_equation(
    "dt(b) - kappa*div(grad_b) + lift(tau_b2) = - u@grad(b)")
problem.add_equation(
    "dt(u) - nu*div(grad_u) + grad(p) - b*er + lift(tau_u2)"
    " = - u@grad(u) - 2*Omega*cross(ez, u)")
problem.add_equation("b(r=Ri) = 1")
problem.add_equation("u(r=Ri) = 0")
problem.add_equation("b(r=Ro) = 0")
problem.add_equation("radial(u(r=Ro)) = 0")
problem.add_equation("shear_stress = 0")
problem.add_equation("integ(p) = 0")

# Solver
solver = problem.build_solver(d3.SBDF2)

# Initial conditions: conductive profile + noise
b.fill_random('g', seed=42, distribution='normal', scale=1e-3)
b.change_scales(1)
b.require_grid_space()
import jax.numpy as jnp
background = (Ri - Ri * Ro / r) / (Ri - Ro)
b.preset_data(dist.grid_layout,
              np.asarray(b.data) * (r - Ri) * (Ro - r)
              + np.broadcast_to(background, shp))

# Analysis
snapshots = solver.evaluator.add_file_handler('snapshots_shell', iter=50,
                                              mode='overwrite')
snapshots.add_task(b(r=(Ri + Ro) / 2), name='b_mid')

flow = d3.GlobalFlowProperty(solver, cadence=10)
flow.add_property(u @ u, name='u2')

# Main loop (compiled scan chunks between handler cadences)
t0 = time.perf_counter()
solver.run_steps(timestep, n_steps)
t1 = time.perf_counter()
solver.log_stats()

for f in (u, b, p):
    f.require_coeff_space()
    assert np.isfinite(np.asarray(f.data)).all()
bc = d3.radial(u(r=Ro)).evaluate()
bc.require_coeff_space()
ss = shear_stress.evaluate()
ss.require_coeff_space()
print(f"steps={n_steps} wall={t1-t0:.2f}s "
      f"max|radial(u(Ro))|={np.abs(np.asarray(bc.data)).max():.2e} "
      f"max|shear_stress|={np.abs(np.asarray(ss.data)).max():.2e} "
      f"max u^2={flow.max('u2'):.3e}")
