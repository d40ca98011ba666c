"""
Linear stability of rotating Boussinesq convection in a spherical shell
(parity: reference examples/evp_shell_rotating_convection/rotating_convection.py).

Non-constant coefficients depend on radius (rvec = r er, a spherically
symmetric vector NCC handled by the Gamma-intertwiner machinery) and on
colatitude (the Coriolis term ez x u, lowered to banded SWSH Cos/Sin angular
ladders by the SphericalZCross operator instead of a meridional NCC).

Default configuration runs in a couple of minutes on CPU at a moderate Ekman
number and checks resolution convergence of the leading eigenvalue near the
critical Rayleigh number. Set MARTI=1 to run the reference's published
configuration (Ekman 1e-5, m=13; eigenvalues match Table 1 of Marti, Calkins
& Julien, G3 2016) — much heavier.

Run: python examples/evp_shell_rotating_convection.py
"""

import os

import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')  # complex128 EVPs solve on host

import dedalus_tpu.public as d3
from dedalus_tpu.core.operators_ball import SphericalZCross

MARTI = bool(int(os.environ.get('MARTI', '0')))

Ri, Ro = 0.35, 1.0
Prandtl = 1.0
stress_free = True
dtype = np.complex128

if MARTI:
    Ekman = 1e-5
    Rayleigh = 2.1029e7
    m_crit = 13
    target = 963.765
    resolutions = [(28, 64, 64)]
else:
    Ekman = 1e-3
    Rayleigh = 6.0e4
    m_crit = 3
    target = 50.0
    resolutions = [(8, 16, 16), (8, 20, 20)]


def solve(Nphi, Ntheta, Nr):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    shell = d3.ShellBasis(coords, shape=(Nphi, Ntheta, Nr), radii=(Ri, Ro),
                          dtype=dtype)
    outer = shell.outer_surface
    phi, theta, r = dist.local_grids(shell, scales=1)

    om = dist.Field(name='om')
    u = dist.VectorField(coords, name='u', bases=shell)
    p = dist.Field(name='p', bases=shell)
    T = dist.Field(name='T', bases=shell)
    tau_u1 = dist.VectorField(coords, name='tau_u1', bases=outer)
    tau_u2 = dist.VectorField(coords, name='tau_u2', bases=outer)
    tau_T1 = dist.Field(name='tau_T1', bases=outer)
    tau_T2 = dist.Field(name='tau_T2', bases=outer)
    tau_p = dist.Field(name='tau_p')

    dt = lambda A: -1j * om * A
    rvec = dist.VectorField(coords, name='rvec', bases=shell.radial_basis)
    rvec.change_scales(1)
    rvec.require_grid_space()
    d = np.zeros(np.asarray(rvec['g']).shape)
    d[2] = np.broadcast_to(r, d[2].shape)
    rvec['g'] = d
    rvec.require_coeff_space()

    zcross = lambda A: SphericalZCross(A)
    lift_basis = shell.derivative_basis(1)
    lift = lambda A: d3.Lift(A, lift_basis, -1)
    # First-order reduction: tau terms on the gradients put a tau in the
    # divergence constraint, as this geometry requires (reference script)
    grad_u = d3.grad(u) + rvec * lift(tau_u1)
    grad_T = d3.grad(T) + rvec * lift(tau_T1)
    strain = d3.grad(u) + d3.TransposeComponents(d3.grad(u))

    ns = dict(locals())
    ns.update(grad=d3.grad, div=d3.div, trace=d3.Trace, dot=d3.dot,
              radial=d3.RadialComponent, angular=d3.AngularComponent,
              Ekman=Ekman, Rayleigh=Rayleigh, Prandtl=Prandtl, Ri=Ri, Ro=Ro)
    problem = d3.EVP([p, u, T, tau_u1, tau_u2, tau_T1, tau_T2, tau_p],
                     eigenvalue=om, namespace=ns)
    problem.add_equation("trace(grad_u) + tau_p = 0")
    problem.add_equation(
        "dt(u) + (1/Ekman)*zcross(u) + grad(p) - Rayleigh*T*rvec"
        " - div(grad_u) + lift(tau_u2) = 0")
    problem.add_equation(
        "Prandtl*dt(T) - dot(rvec, u) - div(grad_T) + lift(tau_T2) = 0")
    if stress_free:
        problem.add_equation("radial(u(r=Ri)) = 0")
        problem.add_equation("radial(u(r=Ro)) = 0")
        problem.add_equation("angular(radial(strain(r=Ri), 0), 0) = 0")
        problem.add_equation("angular(radial(strain(r=Ro), 0), 0) = 0")
    else:
        problem.add_equation("u(r=Ri) = 0")
        problem.add_equation("u(r=Ro) = 0")
    problem.add_equation("T(r=Ri) = 0")
    problem.add_equation("T(r=Ro) = 0")
    problem.add_equation("integ(p) = 0")

    solver = problem.build_solver()
    sp = solver.subproblems_by_group[(m_crit, None, None)]
    solver.solve_sparse(sp, 8, target)
    evals = solver.eigenvalues[np.isfinite(solver.eigenvalues)]
    order = np.argsort(np.abs(evals - target))
    return evals[order]


results = []
for res in resolutions:
    evals = solve(*res)
    print(f"shape={res}: eigenvalues near target {target}:")
    print(" ", np.array2string(evals[:4], precision=6))
    results.append(evals)

if MARTI:
    err = abs(results[0][0].real - target) / abs(target)
    print(f"leading eigenvalue {results[0][0]:.6f} vs Marti {target} "
          f"(rel err {err:.2e})")
    assert err < 5e-3
else:
    drift = abs(results[0][0] - results[1][0])
    print(f"leading eigenvalue: {results[1][0]:.6f} "
          f"(resolution drift {drift:.2e})")
    assert drift < 1e-2 * max(1.0, abs(results[1][0]))
print("OK")
