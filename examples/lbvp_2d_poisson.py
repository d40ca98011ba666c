"""
2D Poisson equation with Dirichlet/Neumann boundary conditions (gating
config 2a; mirrors reference examples/lbvp_2d_poisson/poisson.py).

Run: python examples/lbvp_2d_poisson.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Lx, Ly = 2 * np.pi, np.pi
Nx, Ny = 256, 128
dtype = np.float64

# Bases
coords = d3.CartesianCoordinates('x', 'y')
dist = d3.Distributor(coords, dtype=dtype)
xbasis = d3.RealFourier(coords['x'], size=Nx, bounds=(0, Lx))
ybasis = d3.ChebyshevT(coords['y'], size=Ny, bounds=(0, Ly))

# Fields
u = dist.Field(name='u', bases=(xbasis, ybasis))
tau_1 = dist.Field(name='tau_1', bases=xbasis)
tau_2 = dist.Field(name='tau_2', bases=xbasis)

# Forcing
f = dist.Field(name='f', bases=(xbasis, ybasis))
g = dist.Field(name='g', bases=xbasis)
x, y = dist.local_grids(xbasis, ybasis, scales=1)
f['g'] = -10 * np.sin(x / 2)**2 * (y - y**2 / 4)
g['g'] = np.sin(8 * x)

# Problem
dy = lambda A: d3.Differentiate(A, coords['y'])
lift_basis = ybasis.derivative_basis(2)
lift = lambda A, n: d3.Lift(A, lift_basis, n)
problem = d3.LBVP([u, tau_1, tau_2], namespace=locals())
problem.add_equation("lap(u) + lift(tau_1,-1) + lift(tau_2,-2) = f")
problem.add_equation("u(y=0) = g")
problem.add_equation("dy(u)(y=Ly) = 0")

# Solver
solver = problem.build_solver()
solver.solve()

# Check the boundary conditions are satisfied
ub = u(y=0).evaluate()
ub.change_scales(1)
bc_err = float(np.abs(np.array(ub['g']) - np.array(g['g', 1])).max())
logger.info(f"Solved {Nx}x{Ny} Poisson problem; BC error = {bc_err:.3e}")
print(f"BC error: {bc_err:.3e}")
