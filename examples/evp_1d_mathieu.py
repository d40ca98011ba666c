"""
Mathieu equation eigenvalues (mirrors reference
examples/evp_1d_mathieu/mathieu_evp.py):

    u'' + (a - 2 q cos(2x)) u = 0,  periodic on [0, 2 pi],

solved as an EVP in `a` for a sweep of q values, validated against scipy's
characteristic values mathieu_a/mathieu_b.

Run: python examples/evp_1d_mathieu.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
jax.config.update('jax_platforms', 'cpu')  # complex128 EVPs solve on host (TPU has no c128)

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nx = 64
dtype = np.complex128

# Bases / fields
xcoord = d3.Coordinate('x')
dist = d3.Distributor(xcoord, dtype=dtype)
xbasis = d3.ComplexFourier(xcoord, size=Nx, bounds=(0, 2 * np.pi))
u = dist.Field(name='u', bases=xbasis)
a = dist.Field(name='a')
cos2x = dist.Field(name='cos2x', bases=xbasis)
x = dist.local_grid(xbasis, scale=1).ravel()
dx = lambda A: d3.Differentiate(A, xcoord)


def mathieu_spectrum(q):
    cos2x['g'] = np.cos(2 * x)
    problem = d3.EVP([u], eigenvalue=a, namespace=dict(
        u=u, a=a, q=q, cos2x=cos2x, dx=dx))
    problem.add_equation("dx(dx(u)) - 2*q*cos2x*u + a*u = 0")
    solver = problem.build_solver()
    solver.solve_dense()
    evals = solver.eigenvalues[np.isfinite(solver.eigenvalues)].real
    return np.sort(evals)


from scipy.special import mathieu_a, mathieu_b
for q in (1.0, 2.0, 5.0):
    evals = mathieu_spectrum(q)
    exact = np.sort(np.concatenate(
        [[mathieu_a(m, q) for m in range(4)],
         [mathieu_b(m, q) for m in range(1, 4)]]))
    err = np.abs(evals[:7] - exact).max()
    logger.info(f"q={q}: first eigenvalues {np.round(evals[:4], 6)}, "
                f"max error vs scipy {err:.3e}")
    assert err < 1e-7
