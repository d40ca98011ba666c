"""
Critical Rayleigh number of 2D Rayleigh-Benard convection (mirrors reference
examples/evp_1d_rayleigh_benard/rayleigh_benard_evp.py): the linearized
normal-mode problem at horizontal wavenumber k,

    omega*(D^2-k^2)W = (D^2-k^2)^2 W - Ra k^2 Theta
    omega*Theta      = (D^2-k^2)Theta + W

with stress-free boundaries (W = W'' = Theta = 0), whose critical point is
analytic: Ra_c = 27 pi^4 / 4 ~= 657.511, k_c = pi/sqrt(2).

Run: python examples/evp_1d_rayleigh_benard.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
jax.config.update('jax_platforms', 'cpu')  # complex128 EVPs solve on host (TPU has no c128)

import numpy as np
from scipy import optimize
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Nz = 48
kc = np.pi / np.sqrt(2)
dtype = np.complex128

# Bases / fields
zcoord = d3.Coordinate('z')
dist = d3.Distributor(zcoord, dtype=dtype)
zbasis = d3.ChebyshevT(zcoord, size=Nz, bounds=(0, 1))
W = dist.Field(name='W', bases=zbasis)
Theta = dist.Field(name='Theta', bases=zbasis)
omega = dist.Field(name='omega')
taus_W = [dist.Field(name=f'tw{i}') for i in range(4)]
taus_T = [dist.Field(name=f'tt{i}') for i in range(2)]
dz = lambda A: d3.Differentiate(A, zcoord)
lift4 = lambda A, n: d3.Lift(A, zbasis.derivative_basis(4), n)
lift2 = lambda A, n: d3.Lift(A, zbasis.derivative_basis(2), n)


def max_growth(Ra, k):
    k2 = float(k)**2
    ns = dict(W=W, Theta=Theta, omega=omega, dz=dz, lift4=lift4, lift2=lift2,
              Ra=float(Ra), k2=k2, tw0=taus_W[0], tw1=taus_W[1], tw2=taus_W[2],
              tw3=taus_W[3], tt0=taus_T[0], tt1=taus_T[1])
    problem = d3.EVP([W, Theta] + taus_W + taus_T, eigenvalue=omega, namespace=ns)
    problem.add_equation(
        "omega*(dz(dz(W)) - k2*W)"
        " - (dz(dz(dz(dz(W)))) - 2*k2*dz(dz(W)) + k2*k2*W) + Ra*k2*Theta"
        " + lift4(tw0,-1) + lift4(tw1,-2) + lift4(tw2,-3) + lift4(tw3,-4) = 0")
    problem.add_equation(
        "omega*Theta - (dz(dz(Theta)) - k2*Theta) - W"
        " + lift2(tt0,-1) + lift2(tt1,-2) = 0")
    problem.add_equation("W(z=0) = 0")
    problem.add_equation("W(z=1) = 0")
    problem.add_equation("dz(dz(W))(z=0) = 0")
    problem.add_equation("dz(dz(W))(z=1) = 0")
    problem.add_equation("Theta(z=0) = 0")
    problem.add_equation("Theta(z=1) = 0")
    solver = problem.build_solver()
    solver.solve_sparse(N=4, target=0.1)
    return np.max(solver.eigenvalues.real)


# Root-find the neutral Rayleigh number at k = k_c
Ra_crit = optimize.brentq(lambda Ra: max_growth(Ra, kc), 400, 900, xtol=1e-6)
Ra_exact = 27 * np.pi**4 / 4
logger.info(f"Critical Rayleigh number: {Ra_crit:.6f}")
logger.info(f"Analytic (27 pi^4 / 4):   {Ra_exact:.6f}")
logger.info(f"Relative error: {abs(Ra_crit/Ra_exact - 1):.3e}")
assert abs(Ra_crit / Ra_exact - 1) < 1e-6
