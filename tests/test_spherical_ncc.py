"""
Spherical (ball/shell) NCC suite with angular structure.

Mirrors the reference's dedalus/tests/test_spherical_ncc.py coverage shape:
radial NCCs multiplying scalar and vector operands at ell > 0, end-to-end
through LBVP solves. House pattern: solve  u + w0*u = (1 + w0)*target  and
check u == target (exercises the per-ell Clenshaw NCC blocks against the
transform path; reference basis.py radial NCC matrices + arithmetic.py:560
Gamma coupling).
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def _smooth_scalar(phi, theta, r):
    """Cartesian-polynomial scalar (resolves exactly in the ball/shell)."""
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    return x * z + 0.5 * y - 0.3 * z**2 + 0.1


def _build(geom, Nang=(8, 4), Nr=12, dealias=2):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=np.float64)
    if geom == 'ball':
        basis = d3.BallBasis(coords, Nang + (Nr,), radius=1.0,
                             dtype=np.float64, dealias=dealias)
    else:
        basis = d3.ShellBasis(coords, Nang + (Nr,), radii=(1.0, 2.0),
                              dtype=np.float64, dealias=dealias)
    return coords, dist, basis


def _fill(dist, f, data, scales=1):
    f.change_scales(scales)
    f.require_grid_space()
    f['g'] = np.broadcast_to(data, np.asarray(f['g']).shape)
    f.require_coeff_space()


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_radial_ncc_scalar_ell(geom):
    """Radial NCC times a scalar with ell > 0 content."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    _fill(dist, w0, 0.5 * r**2 + 0.1 * r**4 if geom == 'ball' else 0.5 * r + 1 / r)
    ncc_g = np.asarray((0.5 * r**2 + 0.1 * r**4) if geom == 'ball'
                       else (0.5 * r + 1 / r))
    target = _smooth_scalar(phi, theta, r)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, (2 + ncc_g) * target)
    u = dist.Field(name='u', bases=basis)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("2*u + w0*u = rhs")
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    assert np.abs(np.asarray(u.data) - target).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_radial_ncc_vector_ell(geom):
    """Radial NCC times a vector operand (per-regularity/per-spin blocks)."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    prof = (1 + 0.3 * r**2) if geom == 'ball' else (1 + 1 / r**2)
    _fill(dist, w0, prof)
    f = dist.Field(name='f', bases=basis)
    _fill(dist, f, _smooth_scalar(phi, theta, r))
    vt = d3.grad(f).evaluate()
    vt.require_grid_space()
    vt.change_scales(1)
    tg = np.array(vt.data)
    rhsv = dist.VectorField(coords, name='rhsv', bases=basis)
    rhsv.change_scales(1)
    rhsv.require_grid_space()
    rhsv['g'] = (2 + np.asarray(prof)) * tg
    rhsv.require_coeff_space()
    w = dist.VectorField(coords, name='w', bases=basis)
    problem = d3.LBVP([w], namespace=locals())
    problem.add_equation("2*w + w0*w = rhsv")
    problem.build_solver().solve()
    w.require_grid_space()
    w.change_scales(1)
    assert np.abs(np.asarray(w.data) - tg).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_full_ncc_scalar_axisymmetric(geom):
    """NCC with full (non-radial-basis) field storage but meridional
    symmetry: ncc lives on the 3D basis, constant in phi and theta."""
    coords, dist, basis = _build(geom)
    phi, theta, r = dist.local_grids(basis, scales=1)
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    _fill(dist, w0, r**2)
    target = _smooth_scalar(phi, theta, r)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, (1 + np.asarray(r**2)) * target)
    u = dist.Field(name='u', bases=basis)
    problem = d3.LBVP([u], namespace=locals())
    problem.add_equation("u + w0*u = rhs")
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    assert np.abs(np.asarray(u.data) - target).max() < 1e-9


@pytest.mark.parametrize('geom', ['ball', 'shell'])
def test_ncc_on_gradient_operand(geom):
    """NCC multiplying a derivative operand: w0 * grad(u) inside div."""
    coords, dist, basis = _build(geom, Nr=16)
    phi, theta, r = dist.local_grids(basis, scales=1)
    # Variable diffusivity problem: div(w0 grad u) where w0 radial
    w0 = dist.Field(name='w0', bases=basis.radial_basis)
    prof = 2 + 0.5 * r**2
    _fill(dist, w0, prof)
    u = dist.Field(name='u', bases=basis)
    if geom == 'ball':
        taus = [dist.Field(name='t1', bases=basis.surface)]
        lifts = "lift(t1, -1)"
        bcs = ["u(r=1) = b_outer"]
    else:
        taus = [dist.Field(name='t1', bases=basis.outer_surface),
                dist.Field(name='t2', bases=basis.outer_surface)]
        lifts = "lift(t1, -1) + lift(t2, -2)"
        bcs = ["u(r=1) = b_inner", "u(r=2) = b_outer"]
    ns = dict(locals())
    ns.update({t.name: t for t in taus})
    ns['lift'] = lambda A, i: d3.Lift(A, basis, i)
    ns['div'] = d3.div
    ns['grad'] = d3.grad
    # Manufactured solution: u = z (Cartesian poly => exact in the basis);
    # grad u = ez; div(w0 ez) = dz(w0) = dw0/dr * cos(theta) = r cos(theta)
    z = r * np.cos(theta)
    rhs = dist.Field(name='rhs', bases=basis)
    _fill(dist, rhs, np.broadcast_to(r * np.cos(theta),
                                     np.broadcast_shapes(phi.shape, theta.shape, r.shape)))
    ns['rhs'] = rhs
    ns['b_outer'] = dist.Field(name='b_outer', bases=basis.surface if geom == 'ball'
                               else basis.outer_surface)
    bo = ns['b_outer']
    bo.change_scales(1)
    bo.require_grid_space()
    R_out = 1.0 if geom == 'ball' else 2.0
    bo['g'] = np.broadcast_to(R_out * np.cos(theta), np.asarray(bo['g']).shape)
    bo.require_coeff_space()
    if geom == 'shell':
        ns['b_inner'] = dist.Field(name='b_inner', bases=basis.inner_surface)
        bi = ns['b_inner']
        bi.change_scales(1)
        bi.require_grid_space()
        bi['g'] = np.broadcast_to(1.0 * np.cos(theta), np.asarray(bi['g']).shape)
        bi.require_coeff_space()
    problem = d3.LBVP([u] + taus, namespace=ns)
    problem.add_equation(f"div(w0*grad(u)) + {lifts} = rhs")
    for bc in bcs:
        problem.add_equation(bc)
    problem.build_solver().solve()
    u.require_grid_space()
    u.change_scales(1)
    zg = np.broadcast_to(z, np.asarray(u.data).shape)
    assert np.abs(np.asarray(u.data) - zg).max() < 1e-9
