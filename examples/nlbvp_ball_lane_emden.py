"""
Lane-Emden equation in the ball (gating config 3c; mirrors reference
examples/nlbvp_ball_lane_emden/lane_emden.py): a nonlinear boundary value
problem for the structure of a self-gravitating polytrope,

    lap(f) = -f**n,  f(r=1) = 0,

solved with Newton iterations on the spectral residual. The converged
central-value radius R = f(0)**((n-1)/2) matches Boyd (2011) to ~1e-12.

Run: python examples/nlbvp_ball_lane_emden.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nr = 64
n = 3.0
ncc_cutoff = 1e-10
tolerance = 1e-10
dtype = np.float64

# Bases
coords = d3.SphericalCoordinates('phi', 'theta', 'r')
dist = d3.Distributor(coords, dtype=dtype)
ball = d3.BallBasis(coords, shape=(1, 1, Nr), radius=1, dtype=dtype, dealias=2)

# Fields
f = dist.Field(name='f', bases=ball)
tau = dist.Field(name='tau', bases=ball.surface)

# Problem
lift = lambda A: d3.Lift(A, ball, -1)
problem = d3.NLBVP([f, tau], namespace=locals())
problem.add_equation("lap(f) + lift(tau) = - f**n")
problem.add_equation("f(r=1) = 0")

# Initial guess
phi, theta, r = dist.local_grids(ball)
f.change_scales(ball.dealias)
f['g'] = 5**(2 / (n - 1)) * (1 - r**2)**2

# Solver
solver = problem.build_solver(ncc_cutoff=ncc_cutoff)
pert_norm = np.inf
while pert_norm > tolerance:
    pert_norm = solver.newton_iteration()
    logger.info(f"Perturbation norm: {pert_norm:.3e}")

# Diagnostic: R = f(0)^((n-1)/2)
f0 = f(r=0).evaluate()
f0.change_scales(1)
f0.require_grid_space()
R = float(np.asarray(f0.data).ravel()[0])**((n - 1) / 2)
R_boyd = 6.896848619376960375454528  # Boyd (2011) Table 1, n=3
logger.info(f"R = {R!r}")
logger.info(f"|R - R_ref| = {abs(R - R_boyd):.3e}")
assert abs(R - R_boyd) < 1e-9
