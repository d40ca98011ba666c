"""
Waves on a clamped string (mirrors reference
examples/evp_1d_waves_on_a_string/waves_on_a_string.py): the eigenvalue
problem

    lam*u + u_xx = 0,  u(0) = u(1) = 0,

whose exact eigenvalues are lam_n = (n pi)^2. Demonstrates dense and sparse
(targeted shift-invert) eigensolves and left eigenvectors.

Run: python examples/evp_1d_waves_on_a_string.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nx = 128
dtype = np.float64

# Bases / fields
xcoord = d3.Coordinate('x')
dist = d3.Distributor(xcoord, dtype=dtype)
xbasis = d3.ChebyshevT(xcoord, size=Nx, bounds=(0, 1))
u = dist.Field(name='u', bases=xbasis)
tau_1 = dist.Field(name='tau_1')
tau_2 = dist.Field(name='tau_2')
lam = dist.Field(name='lam')

# Problem
dx = lambda A: d3.Differentiate(A, xcoord)
lift_basis = xbasis.derivative_basis(2)
lift = lambda A, n: d3.Lift(A, lift_basis, n)
problem = d3.EVP([u, tau_1, tau_2], eigenvalue=lam, namespace=locals())
problem.add_equation("lam*u + dx(dx(u)) + lift(tau_1,-1) + lift(tau_2,-2) = 0")
problem.add_equation("u(x=0) = 0")
problem.add_equation("u(x=1) = 0")

# Dense solve: all eigenvalues
solver = problem.build_solver()
solver.solve_dense()
evals = np.sort(solver.eigenvalues[np.isfinite(solver.eigenvalues)].real)
n = 1 + np.arange(8)
exact = (n * np.pi)**2
logger.info(f"First dense eigenvalues: {evals[:4]}")
logger.info(f"Max relative error (first 8): {np.abs(evals[:8]/exact - 1).max():.3e}")
assert np.abs(evals[:8] / exact - 1).max() < 1e-10

# Sparse solve: a few modes near a target, with left eigenvectors
solver.solve_sparse(N=4, target=50.0, left=True)
logger.info(f"Sparse eigenvalues near 50: {np.sort(solver.eigenvalues.real)}")
# Biorthogonality check of modified left eigenvectors
G = solver.modified_left_eigenvectors.conj().T @ solver.right_eigenvectors
off = G - np.diag(np.diag(G))
logger.info(f"Max biorthogonality off-diagonal: {np.abs(off).max():.3e}")
