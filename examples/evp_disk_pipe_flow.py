"""
Linear stability of pipe flow in the periodic cylinder (mirrors reference
examples/evp_disk_pipe_flow/pipe_flow.py): disk-basis EVP with a
parametrized axial wavenumber, background flow w0 = 1 - r^2, and no-slip
edge conditions on the velocity perturbations.

Pipe flow is linearly stable: every mode decays (Re(s) < 0). The script
checks this and that the slowest-decaying eigenvalue is resolution-converged
(cf. Vasil et al. 2016, Table 3 methodology).

Run: python examples/evp_disk_pipe_flow.py
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
jax.config.update('jax_platforms', 'cpu')  # complex128 EVPs solve on host

import numpy as np
import dedalus_tpu.public as d3
import logging
logger = logging.getLogger(__name__)

# Parameters
Re = 1e4
kz = 1
m = 5
Nphi = 2 * m + 2
dtype = np.complex128


def slowest_mode(Nr):
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    disk = d3.DiskBasis(coords, shape=(Nphi, Nr), radius=1, dtype=dtype)
    phi, r = dist.local_grids(disk, scales=1)

    s = dist.Field(name='s')
    u = dist.VectorField(coords, name='u', bases=disk)
    w = dist.Field(name='w', bases=disk)
    p = dist.Field(name='p', bases=disk)
    tau_u = dist.VectorField(coords, name='tau_u', bases=disk.edge)
    tau_w = dist.Field(name='tau_w', bases=disk.edge)

    dt = lambda A: s * A
    dz = lambda A: 1j * kz * A
    lift = lambda A: d3.Lift(A, disk, -1)

    # Background: laminar Poiseuille profile (axisymmetric NCC)
    w0 = dist.Field(name='w0', bases=disk)
    w0['g'] = np.broadcast_to(1 - r**2, w0['g'].shape)

    problem = d3.EVP([u, w, p, tau_u, tau_w], eigenvalue=s,
                     namespace={**globals(), **locals()})
    problem.add_equation("div(u) + dz(w) = 0")
    problem.add_equation(
        "dt(u) + w0*dz(u) + grad(p) - (1/Re)*(lap(u) + dz(dz(u))) + lift(tau_u) = 0")
    problem.add_equation(
        "dt(w) + w0*dz(w) + u@grad(w0) + dz(p) - (1/Re)*(lap(w) + dz(dz(w))) + lift(tau_w) = 0")
    problem.add_equation("u(r=1) = 0")
    problem.add_equation("w(r=1) = 0")

    solver = problem.build_solver()
    # Solve the m-subproblem (azimuthal group m, radial axis coupled)
    sp_index = next(i for i, sp in enumerate(solver.subproblems)
                    if sp.group[0] == m)
    solver.solve_dense(sp_index=sp_index)
    evals = solver.eigenvalues[np.isfinite(solver.eigenvalues)]
    return evals[np.argsort(-evals.real)]


evals_48 = slowest_mode(48)
evals_64 = slowest_mode(64)
logger.info(f"Slowest decaying mode (Nr=64): s = {evals_64[0]}")
logger.info(f"Resolution drift |s48 - s64| = {abs(evals_48[0] - evals_64[0]):.3e}")
assert evals_64[0].real < 0, "pipe flow must be linearly stable"
assert abs(evals_48[0] - evals_64[0]) < 1e-8, "eigenvalue not converged"
