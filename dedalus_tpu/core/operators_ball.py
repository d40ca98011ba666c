"""
Vector calculus and structural operators on the ball.

Parity target (behavior): dedalus/core/operators.py SphericalEllOperator
(:3183), Laplacian (:4302 spherical), Lift (:4560), interpolation/BCs on
Spherical3DBasis. TPU-first design mirroring operators_polar: per-m matrices
are block-diagonal over colatitude (ell) slots; eager/traced evaluation
applies the batched (M/2, L, n, n) stacks as one MXU einsum.

Round-1 scope: SCALAR operands (Laplacian, Lift, Convert, Interpolate,
radially-symmetric NCCs). Tensor calculus (Gradient/Divergence/Curl) requires
the regularity intertwiner and is wired in with ball tensor transforms.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Field
from .future import Future
from .domain import Domain
from .coords import SphericalCoordinates
from .operators import LinearOperator, device_matrix
from .basis_ball import BallBasis, BallRadialBasis, BallSurfaceBasis, SphericalRadialBasis


class BallScalarOperator(LinearOperator):
    """Base for scalar ball operators built from per-m block-diagonal radial
    matrices (block j acts at ell = |m| + j)."""

    def __init__(self, operand, coordsys):
        if operand.tensorsig:
            raise NotImplementedError(
                "Ball tensor operators require the regularity intertwiner (round 2)")
        self.coordsys = coordsys
        self.azimuth_axis = coordsys.coords[0].axis
        self.colatitude_axis = coordsys.coords[1].axis
        self.radius_axis = coordsys.coords[2].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        if not isinstance(self.radial_in, SphericalRadialBasis):
            raise ValueError("Spherical operator requires a ball/shell radial basis")
        self.radial_out = self.radial_in.derivative_basis(self.dk) if self.dk \
            else self.radial_in
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = self.radial_out
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def block_matrix_m(self, m):
        raise NotImplementedError

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        A = self.block_matrix_m(m if m is not None else 0)
        return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), A))

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def _matrix_stack(self):
        az_basis = self.operand.domain.bases[self.azimuth_axis]
        KM = (az_basis.size - 1) // 2
        key = (type(self).__name__, self.radial_in._key(), KM,
               self.radial_in.parent.colatitude_basis.size)

        def build():
            mats = [np.asarray(self.block_matrix_m(m).todense())
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))
        return device_matrix(key, build)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (..., M, L, n)
        M = data.shape[-3]
        L = data.shape[-2]
        n_in = data.shape[-1]
        n_out = self.radial_out.coeff_size if self.dk else n_in
        P = max(M // 2, 1)
        stack = self._matrix_stack()  # (KM+1, L*n_out, L*n_in)
        dm = data.reshape(data.shape[:-3] + (P, M // P, L * n_in))
        res = jnp.einsum('moi,...mpi->...mpo', stack, dm)
        out = res.reshape(data.shape[:-3] + (M, L, n_out))
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)


class BallLaplacian(BallScalarOperator):
    """Scalar Laplacian on the ball: per-ell D(-1) @ D(+1) (k -> k+2).
    Parity: operators.py:4302 (spherical Laplacian, scalar block)."""

    dk = 2
    name = 'Lap'

    def new_operands(self, operand):
        return BallLaplacian(operand, self.coordsys)

    def block_matrix_m(self, m):
        return self.radial_in.block_diag_m('L', m)


class BallConvert(BallScalarOperator):
    """Convert ball scalar between k levels (parity: ConvertRegularity)."""

    name = 'Convert'

    def __init__(self, operand, coordsys, target_radial):
        self.dk = target_radial.k - operand.domain.bases[coordsys.coords[2].axis].k
        if self.dk < 0:
            raise ValueError("Cannot convert to lower k")
        self._target_radial = target_radial
        super().__init__(operand, coordsys)
        self.radial_out = target_radial

    def _init_metadata(self):
        super()._init_metadata()
        bases = list(self.operand.domain.bases)
        bases[self.radius_axis] = self._target_radial
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallConvert(operand, self.coordsys, self._target_radial)

    def block_matrix_m(self, m):
        return self.radial_in.conversion_block_m(m, self.dk)


class BallLift(LinearOperator):
    """
    Lift a surface (S2) field into radial mode `index` of each ell of a ball
    basis (parity: operators.py:4560 Lift on spherical bases; used for tau
    terms).
    """

    name = 'Lift'

    def __init__(self, operand, ball, index):
        if operand.tensorsig:
            raise NotImplementedError("Ball tensor lifts come with tensor support")
        self.ball = ball
        self.index = int(index)
        self.coordsys = ball.coordsys
        self.azimuth_axis = self.coordsys.coords[0].axis
        self.colatitude_axis = self.coordsys.coords[1].axis
        self.radius_axis = self.coordsys.coords[2].axis
        self.radial_out = ball.radial_basis
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        while len(bases) <= self.radius_axis:
            bases.append(None)
        bases[self.radius_axis] = self.ball.radial_basis
        # Angular bases come from the ball (surface fields share them)
        bases[self.azimuth_axis] = self.ball.azimuth_basis
        bases[self.colatitude_axis] = self.ball.colatitude_basis
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallLift(operand, self.ball, self.index)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        az_w = subproblem.axis_width(self.ball.azimuth_basis, self.azimuth_axis)
        A = self.ball.radial_basis.lift_block_m(m if m is not None else 0, self.index)
        return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), A))

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        if field.domain.bases[self.radius_axis] is None:
            data = data[..., 0]  # drop the constant radial slot
        M = data.shape[-2]
        L = data.shape[-1]
        n = self.ball.radial_basis.size
        P = max(M // 2, 1)
        KM = (self.ball.azimuth_basis.size - 1) // 2
        key = ('BallLift', self.ball.radial_basis._key(), self.index, KM, L)

        def build():
            mats = [np.asarray(self.ball.radial_basis.lift_block_m(m, self.index).todense())
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))
        stack = device_matrix(key, build)  # (KM+1, L*n, L)
        dm = data.reshape(data.shape[:-2] + (P, M // P, L))
        res = jnp.einsum('moi,...mpi->...mpo', stack, dm)
        out = res.reshape(data.shape[:-2] + (M, L, n))
        return self._build_output(self.dist.coeff_layout, out, scales=None)


class BallInterpolate(LinearOperator):
    """Radial interpolation f(r=position): ball scalar -> surface field
    (parity: interpolation BC rows on Spherical3DBasis)."""

    name = 'interp'

    def __init__(self, operand, coordsys, position):
        if operand.tensorsig:
            raise NotImplementedError("Ball tensor interpolation comes with tensor support")
        self.coordsys = coordsys
        self.position = float(position)
        self.azimuth_axis = coordsys.coords[0].axis
        self.colatitude_axis = coordsys.coords[1].axis
        self.radius_axis = coordsys.coords[2].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = None
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallInterpolate(operand, self.coordsys, self.position)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def _interp_block_m(self, m):
        """(L x L*n) row block: per-ell radial interpolation vectors."""
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        n = rb.size
        mat = sparse.lil_matrix((L, L * n))
        for j in range(max(L - abs(m), 0)):
            ell = abs(m) + j
            row = rb.interpolation_ell(ell, 0, self.position)
            mat[j, j * n:(j + 1) * n] = row
        return sparse.csr_matrix(mat)

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        A = self._interp_block_m(m if m is not None else 0)
        return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), A))

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (..., M, L, n)
        M = data.shape[-3]
        L = data.shape[-2]
        P = max(M // 2, 1)
        KM = (self.radial_in.parent.azimuth_basis.size - 1) // 2
        key = ('BallInterp', self.radial_in._key(), self.position, KM, L)

        def build():
            mats = [np.asarray(self._interp_block_m(m).todense())
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))
        stack = device_matrix(key, build)  # (KM+1, L, L*n)
        dm = data.reshape(data.shape[:-3] + (P, M // P, L * data.shape[-1]))
        res = jnp.einsum('moi,...mpi->...mpo', stack, dm)
        # Surface fields keep a size-1 radial axis (constant along radius)
        out = res.reshape(data.shape[:-3] + (M, L, 1))
        return self._build_output(self.dist.coeff_layout, out, scales=None)
