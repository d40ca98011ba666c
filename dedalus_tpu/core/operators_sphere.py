"""
Vector calculus on the sphere surface (S2): spin-weighted operators.

Parity target (behavior): dedalus/core/operators.py:2573 (SpectralOperatorS2),
:2908 (MulCosine) and the sphere operator family used by
examples/ivp_sphere_shallow_water. Built on the PolarMOperator machinery
(per-m colatitude matrices batched over azimuthal groups on the MXU).

Spin conventions: u_s = (u_theta + s*1j*u_phi)/sqrt(2); the spin
raising/lowering derivatives are the validated SWSH 'D' operators
(spectral/sphere.py), which include the -ds*sqrt(1/2)/R normalization.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Field
from .future import Future
from .domain import Domain
from .coords import S2Coordinates
from .operators import LinearOperator
from ..utils.general import prod
from .operators_polar import PolarMOperator


class SphereGradient(PolarMOperator):
    """grad on S2: (grad f)_s picks up the spin-(s) ladder of each component."""

    dk = 0

    def out_tensorsig(self, in_tensorsig):
        return (self.coordsys,) + in_tensorsig

    def spinindices_out(self, in_idx):
        return ((0,) + tuple(in_idx), (1,) + tuple(in_idx))

    def new_operands(self, operand):
        return SphereGradient(operand, self.coordsys)

    def radial_matrix(self, in_idx, out_idx, m):
        s_in = self._spintotal(self.operand.tensorsig, in_idx)
        op = 'D-' if out_idx[0] == 0 else 'D+'
        return self.radial_in.operator_matrix(op, m, s_in)


class SphereDivergence(PolarMOperator):
    """div on S2."""

    dk = 0

    def __init__(self, operand, index=0):
        coordsys = operand.tensorsig[index]
        super().__init__(operand, coordsys)

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig[1:]

    def spinindices_out(self, in_idx):
        return (tuple(in_idx[1:]),)

    def new_operands(self, operand):
        return SphereDivergence(operand)

    def radial_matrix(self, in_idx, out_idx, m):
        s_in = self._spintotal(self.operand.tensorsig, in_idx)
        op = 'D+' if in_idx[0] == 0 else 'D-'
        return self.radial_in.operator_matrix(op, m, s_in)


class SphereLaplacian(PolarMOperator):
    """lap on S2: diagonal -(l(l+1)-s^2)/R^2 per spin component."""

    dk = 0

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return SphereLaplacian(operand, self.coordsys)

    def radial_matrix(self, in_idx, out_idx, m):
        s = self._spintotal(self.operand.tensorsig, in_idx)
        return self.radial_in.operator_matrix('L2', m, s)


class MulCosine(PolarMOperator):
    """Multiplication by cos(theta) (parity: operators.py:2998 MulCosine)."""

    dk = 0

    def __init__(self, operand, coordsys=None):
        if coordsys is None:
            coordsys = _infer_s2(operand)
        super().__init__(operand, coordsys)

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return MulCosine(operand, self.coordsys)

    def radial_matrix(self, in_idx, out_idx, m):
        s = self._spintotal(self.operand.tensorsig, in_idx)
        return self.radial_in.operator_matrix('Cos', m, s)


class SpinSkew(LinearOperator):
    """
    90-degree tangent-plane rotation of a spin vector: skew(u)_s = -s*1j*u_s.
    For real dtype the imaginary factor acts as a rotation of the azimuthal
    (cos, -sin) parity pairs. Valid for polar and S2 systems alike.
    """

    def __init__(self, operand):
        self.coordsys = operand.tensorsig[0]
        self.azimuth_axis = self.coordsys.coords[0].axis
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return SpinSkew(operand)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        nt = len(field.tensorsig)
        M = data.shape[nt + self.azimuth_axis]
        out = jnp.zeros_like(data)
        for idx in np.ndindex(*[cs.dim for cs in field.tensorsig]):
            s = self.coordsys.spintotal(field.tensorsig, idx)
            comp = data[idx]
            if np.issubdtype(self.dtype, np.complexfloating):
                out = out.at[idx].set(-s * 1j * comp)
            else:
                # -s*i on (cos,-sin) pairs: (a, b) -> (s*b, -s*a). The
                # azimuth axis may sit behind leading batch axes (cylinder).
                az = self.azimuth_axis
                d = jnp.moveaxis(comp, az, 0)
                cm = d.reshape((M // 2, 2) + d.shape[1:])
                a = cm[:, 0]
                b = cm[:, 1]
                rot = jnp.stack([s * b, -s * a], axis=1).reshape(d.shape)
                out = out.at[idx].set(jnp.moveaxis(rot, 0, az))
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        m = subproblem.group[self.azimuth_axis]
        # Per-component blocks: kron(pair rotation, I_n)
        radial_axis = self.coordsys.coords[1].axis
        n = subproblem.axis_width(op.domain.bases[radial_axis], radial_axis)
        az_w = subproblem.axis_width(op.domain.bases[self.azimuth_axis], self.azimuth_axis)
        lead_w = prod(tuple(subproblem.axis_width(op.domain.bases[ax], ax)
                            for ax in range(self.azimuth_axis))) or 1
        blocks = []
        idxs = list(np.ndindex(*[cs.dim for cs in self.tensorsig]))
        for oi in idxs:
            row = []
            for ii in idxs:
                if oi == ii:
                    s = self.coordsys.spintotal(self.tensorsig, ii)
                    if np.issubdtype(self.dtype, np.complexfloating):
                        # Signed exponential pairs: -s*i acts componentwise
                        P = (-s * 1j) * np.eye(az_w)
                    elif az_w == 2:
                        P = np.array([[0., s], [-s, 0.]])
                    else:
                        P = np.array([[0.0]])
                    blk = sparse.kron(sparse.identity(lead_w),
                                      sparse.kron(sparse.csr_matrix(P),
                                                  sparse.identity(n)))
                else:
                    blk = sparse.csr_matrix((lead_w * az_w * n, lead_w * az_w * n))
                row.append(blk)
            blocks.append(row)
        mat = sparse.bmat(blocks, format='csr')
        return {v: mat @ mm for v, mm in op_mats.items()}

    def matrix_dependence(self, *vars):
        return self.operand.matrix_dependence(*vars)

    def matrix_coupling(self, *vars):
        return self.operand.matrix_coupling(*vars)


class SphereIntegrate(LinearOperator):
    """Full-sphere integral: 2*pi*sqrt(2)*R^2 times the (m=0, l=0) coefficient."""

    def __init__(self, operand):
        cs = _infer_s2(operand)
        self.coordsys = cs
        self.azimuth_axis = cs.coords[0].axis
        self.colat_axis = cs.coords[1].axis
        self.colat_basis = operand.domain.bases[self.colat_axis]
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.azimuth_axis] = None
        bases[self.colat_axis] = None
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return SphereIntegrate(operand)

    @property
    def _factor(self):
        return 2 * np.pi * np.sqrt(2) * self.colat_basis.radius**2

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        nt = len(field.tensorsig)
        val = data[..., 0, 0] * self._factor
        out = val.reshape(val.shape + (1, 1))
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        m = subproblem.group[self.azimuth_axis]
        n = subproblem.axis_width(op.domain.bases[self.colat_axis], self.colat_axis)
        az_w = subproblem.axis_width(op.domain.bases[self.azimuth_axis], self.azimuth_axis)
        row = np.zeros((1, az_w * n))
        if m == 0:
            row[0, 0] = self._factor  # cos part, l-slot 0
        mat = sparse.csr_matrix(row)
        ncomp = prod(tuple(cs.dim for cs in self.tensorsig)) or 1
        if ncomp > 1:
            mat = sparse.kron(sparse.identity(ncomp), mat)
        return {v: sparse.csr_matrix(mat) @ mm for v, mm in op_mats.items()}

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colat_axis] = True
        return out


def SphereAverage(operand):
    from .arithmetic import Multiply
    cs = _infer_s2(operand)
    colat = operand.domain.bases[cs.coords[1].axis]
    area = 4 * np.pi * colat.radius**2
    return Multiply(1 / area, SphereIntegrate(operand))


def _infer_s2(operand):
    for b in operand.domain.bases:
        if b is not None and isinstance(getattr(b, 'coord', None).cs
                                        if b.coord is not None else None, S2Coordinates):
            return b.coord.cs
    for cs in operand.tensorsig:
        if isinstance(cs, S2Coordinates):
            return cs
    raise ValueError("No S2 coordinate system found")
