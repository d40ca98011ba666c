"""
Vector calculus on polar coordinate systems (annulus; disk later).

Parity target (behavior): dedalus/core/operators.py:2908-3065 (PolarMOperator,
PolarGradient), :3606 (PolarDivergence), :4217 (PolarLaplacian), :1829
(PolarTrace). TPU-first design: per-m covariant radial matrices are stacked
over azimuthal mode groups and applied as ONE batched einsum on the MXU in
eager/traced evaluation; pencil matrices assemble the same blocks per group.

Spin conventions: component ordering (-, +); u_s = (u_r + s*1j*u_phi)/sqrt(2);
coefficient data holds spin components, grid data holds coordinate components
(the radial transform performs the recombination).
"""

import numbers
import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Field
from .future import Future
from .domain import Domain
from .coords import PolarCoordinates
from .operators import LinearOperator, device_matrix
from .arithmetic import Add, Multiply
from ..utils.general import prod


class PolarMOperator(LinearOperator):
    """
    Base for operators built from per-(m, spin) radial matrices.
    Subclasses define: out_tensorsig, spinindices_out(in_idx),
    radial_matrix_name(in_idx, out_idx), scale_factor, dk (k increment).
    """

    def __init__(self, operand, coordsys):
        self.coordsys = coordsys
        self.azimuth_axis = coordsys.coords[0].axis
        self.radius_axis = coordsys.coords[1].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        if self.radial_in is None:
            raise ValueError("Polar operator requires a radial basis")
        self.radial_out = self.radial_in.derivative_basis(self.dk)
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = self.out_tensorsig(op.tensorsig)
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
        out[self.radius_axis] = True
        return out

    # --- spin bookkeeping ---

    def _comp_indices(self, tensorsig):
        shape = tuple(cs.dim for cs in tensorsig)
        if not shape:
            return [()]
        return list(np.ndindex(*shape))

    def _spintotal(self, tensorsig, idx):
        return self.coordsys.spintotal(tensorsig, idx)

    # --- matrices ---

    def radial_matrix(self, in_idx, out_idx, m):
        raise NotImplementedError

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        op = self.operand
        in_idxs = self._comp_indices(op.tensorsig)
        out_idxs = self._comp_indices(self.tensorsig)
        nr_in = subproblem.axis_width(self.radial_in, self.radius_axis)
        nr_out = subproblem.axis_width(self.radial_out, self.radius_axis)
        az_w = subproblem.axis_width(op.domain.bases[self.azimuth_axis], self.azimuth_axis)
        # Leading axes before the polar pair (e.g. the Fourier axis of a
        # cylinder) pass through as identity factors
        lead_w = prod(tuple(subproblem.axis_width(op.domain.bases[ax], ax)
                            for ax in range(self.azimuth_axis))) or 1
        signed = getattr(self.radial_in, 'signed_pairs', False)
        blocks = []
        for oi in out_idxs:
            row = []
            for ii in in_idxs:
                if oi in self.spinindices_out(ii):
                    mm = m if m is not None else 0
                    if signed and az_w == 2:
                        # Signed (+m, -m) slots: per-slot radial matrices
                        A = sparse.block_diag(
                            [self.radial_matrix(ii, oi, mm),
                             self.radial_matrix(ii, oi, -mm)], format='csr')
                        blk = sparse.kron(sparse.identity(lead_w), A)
                    else:
                        A = self.radial_matrix(ii, oi, mm)
                        blk = sparse.kron(sparse.identity(lead_w * az_w), A)
                else:
                    blk = sparse.csr_matrix((lead_w * az_w * nr_out,
                                             lead_w * az_w * nr_in))
                row.append(blk)
            blocks.append(row)
        if len(blocks) == 1 and len(blocks[0]) == 1:
            return sparse.csr_matrix(blocks[0][0])
        return sparse.bmat(blocks, format='csr')

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    # --- eager/traced evaluation ---

    def _matrix_stack(self, in_idx, out_idx):
        """Device stack (KM+1, n_out, n_in) of per-m radial matrices, or
        (KM+1, 2, n_out, n_in) per signed (+m, -m) slot for complex dtype."""
        az_basis = self.operand.domain.bases[self.azimuth_axis]
        KM = (az_basis.size - 1) // 2
        signed = getattr(self.radial_in, 'signed_pairs', False)
        key = (type(self).__name__, self.radial_in._key(), in_idx, out_idx,
               KM, signed)

        def build():
            if signed:
                mats = [[self.radial_matrix(in_idx, out_idx, m).toarray(),
                         self.radial_matrix(in_idx, out_idx, -m).toarray()]
                        for m in range(KM + 1)]
                return np.ascontiguousarray(np.array(mats))
            mats = [self.radial_matrix(in_idx, out_idx, m).toarray()
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))

        return device_matrix(key, build)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        nt_in = len(field.tensorsig)
        out_shape = tuple(cs.dim for cs in self.tensorsig)
        M = data.shape[nt_in + self.azimuth_axis]
        n_out = self.radial_out.coeff_size
        spatial = list(data.shape[nt_in:])
        spatial[self.radius_axis] = n_out
        out = jnp.zeros(out_shape + tuple(spatial), dtype=self.dtype)
        # Polar systems occupy two adjacent axes (azimuth, radius) = last two
        for ii in self._comp_indices(field.tensorsig):
            comp = data[ii]
            lead = comp.shape[:self.azimuth_axis]
            cm = comp.reshape(lead + (M // 2, 2, comp.shape[-1]))
            for oi in self.spinindices_out(ii):
                stack = self._matrix_stack(ii, oi)
                if stack.ndim == 4:   # signed (+m, -m) slots
                    res = jnp.einsum('mpoi,...mpi->...mpo', stack, cm)
                else:
                    res = jnp.einsum('moi,...mpi->...mpo', stack, cm)
                res = res.reshape(lead + (M, n_out))
                out = out.at[oi].add(res)
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)


class PolarGradient(PolarMOperator):
    """grad on polar coords (parity: operators.py:3053)."""

    dk = 1

    def out_tensorsig(self, in_tensorsig):
        return (self.coordsys,) + in_tensorsig

    def spinindices_out(self, in_idx):
        return ((0,) + tuple(in_idx), (1,) + tuple(in_idx))

    def new_operands(self, operand):
        return PolarGradient(operand, self.coordsys)

    def radial_matrix(self, in_idx, out_idx, m):
        s_in = self._spintotal(self.operand.tensorsig, in_idx)
        op = 'D-' if out_idx[0] == 0 else 'D+'
        return sparse.csr_matrix(
            (1 / np.sqrt(2)) * self.radial_in.operator_matrix(op, m, s_in))


class PolarDivergence(PolarMOperator):
    """div on polar coords (parity: operators.py:3606)."""

    dk = 1

    def __init__(self, operand, index=0):
        if not operand.tensorsig:
            raise ValueError("Divergence requires a tensor operand")
        coordsys = operand.tensorsig[index]
        super().__init__(operand, coordsys)

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig[1:]

    def spinindices_out(self, in_idx):
        return (tuple(in_idx[1:]),)

    def new_operands(self, operand):
        return PolarDivergence(operand)

    def radial_matrix(self, in_idx, out_idx, m):
        s_in = self._spintotal(self.operand.tensorsig, in_idx)
        op = 'D+' if in_idx[0] == 0 else 'D-'
        return sparse.csr_matrix(
            (1 / np.sqrt(2)) * self.radial_in.operator_matrix(op, m, s_in))


class PolarLaplacian(PolarMOperator):
    """lap on polar coords (parity: operators.py:4217)."""

    dk = 2

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return PolarLaplacian(operand, self.coordsys)

    def radial_matrix(self, in_idx, out_idx, m):
        s_in = self._spintotal(self.operand.tensorsig, in_idx)
        return sparse.csr_matrix(self.radial_in.operator_matrix('L', m, s_in))


class PolarTrace(LinearOperator):
    """
    Trace of a rank-2 polar tensor. In spin components:
    tr(T_coord) = T_{-+} + T_{+-} (parity: operators.py:1829).
    """

    def __init__(self, operand):
        self.coordsys = operand.tensorsig[0]
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        if len(op.tensorsig) < 2 or op.tensorsig[0] is not op.tensorsig[1]:
            raise ValueError("PolarTrace requires leading rank-2 polar indices")
        self.tensorsig = op.tensorsig[2:]
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return PolarTrace(operand)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        out = data[0, 1] + data[1, 0]
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        space = subproblem.spatial_size(op.domain)
        rest = prod(tuple(cs.dim for cs in op.tensorsig[2:])) or 1
        dim = self.coordsys.dim
        sel = sparse.lil_matrix((rest * space, dim * dim * rest * space))
        for (i, j) in ((0, 1), (1, 0)):
            start = (i * dim + j) * rest * space
            sel[:, start:start + rest * space] += sparse.identity(rest * space)
        sel = sparse.csr_matrix(sel)
        return {v: sel @ m for v, m in op_mats.items()}

    def matrix_dependence(self, *vars):
        return self.operand.matrix_dependence(*vars)

    def matrix_coupling(self, *vars):
        return self.operand.matrix_coupling(*vars)


class PolarConvert(PolarMOperator):
    """Per-m k-conversion for m-dependent radial bases (disk); also embeds
    operands constant along the radius (the ConvertConstant analog)."""

    def __init__(self, operand, coordsys, out_basis):
        radial_in = operand.domain.bases[coordsys.coords[1].axis]
        self.dk = (out_basis.k - radial_in.k) if radial_in is not None else None
        self._out_basis = out_basis
        self.coordsys = coordsys
        self.azimuth_axis = coordsys.coords[0].axis
        self.radius_axis = coordsys.coords[1].axis
        self.radial_in = radial_in
        self.radial_out = out_basis
        LinearOperator.__init__(self, operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = self._out_basis
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return PolarConvert(operand, self.coordsys, self._out_basis)

    def radial_matrix(self, in_idx, out_idx, m):
        if self.radial_in is None:
            return self._out_basis.constant_column(m)
        s = self._spintotal(self.operand.tensorsig, in_idx)
        return self.radial_in.conversion_matrix_m(m, s, self.dk)

    def operate(self, arg_fields):
        if self.radial_in is not None:
            return super().operate(arg_fields)
        # Constant embedding: per-m columns (only m = 0 is nonzero)
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        out_shape = tuple(cs.dim for cs in self.tensorsig)
        M = data.shape[len(field.tensorsig) + self.azimuth_axis]
        n_out = self._out_basis.size
        spatial = list(data.shape[len(field.tensorsig):])
        spatial[self.radius_axis] = n_out
        out = jnp.zeros(out_shape + tuple(spatial), dtype=self.dtype)
        for ii in self._comp_indices(field.tensorsig):
            comp = data[ii]
            cm = comp.reshape((M // 2, 2, 1))
            stack = self._matrix_stack(ii, tuple(ii))
            res = jnp.einsum('moi,mpi->mpo', stack, cm).reshape((M, n_out))
            out = out.at[ii].add(res)
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)


class PolarInterpolate(PolarMOperator):
    """Per-m radial interpolation (disk boundary rows)."""

    dk = 0

    def __init__(self, operand, coordsys, position):
        self.position = position
        super().__init__(operand, coordsys)
        self.radial_out = None

    def _init_metadata(self):
        self.radial_out = None
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = None
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return PolarInterpolate(operand, self.coordsys, self.position)

    def radial_matrix(self, in_idx, out_idx, m):
        s = self._spintotal(self.operand.tensorsig, in_idx)
        return self.radial_in.interpolation_m(m, s, self.position)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        out_shape = tuple(cs.dim for cs in self.tensorsig)
        M = data.shape[len(field.tensorsig) + self.azimuth_axis]
        spatial = list(data.shape[len(field.tensorsig):])
        spatial[self.radius_axis] = 1
        out = jnp.zeros(out_shape + tuple(spatial), dtype=self.dtype)
        for ii in self._comp_indices(field.tensorsig):
            comp = data[ii]
            cm = comp.reshape((M // 2, 2, comp.shape[-1]))
            stack = self._matrix_stack(ii, tuple(ii))
            res = jnp.einsum('moi,mpi->mpo', stack, cm).reshape((M, 1))
            out = out.at[ii].add(res)
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)


class PolarLift(PolarMOperator):
    """Per-m tau lift onto the highest valid radial mode (disk)."""

    dk = 0

    def __init__(self, operand, coordsys, out_basis, index):
        self.index = index
        self._out_basis = out_basis
        self.coordsys = coordsys
        self.azimuth_axis = coordsys.coords[0].axis
        self.radius_axis = coordsys.coords[1].axis
        if operand.domain.bases[self.radius_axis] is not None:
            raise NotImplementedError("PolarLift requires an edge operand")
        self.radial_in = None
        self.radial_out = out_basis
        LinearOperator.__init__(self, operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = self.radial_out
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def out_tensorsig(self, in_tensorsig):
        return in_tensorsig

    def spinindices_out(self, in_idx):
        return (tuple(in_idx),)

    def new_operands(self, operand):
        return PolarLift(operand, self.coordsys, self._out_basis, self.index)

    def radial_matrix(self, in_idx, out_idx, m):
        s = self._spintotal(self.operand.tensorsig, in_idx)
        basis = self.radial_out
        col = np.zeros((basis.size, 1))
        if hasattr(basis, 'n_size'):
            ns = basis.n_size(m)
            pos = ns + self.index if self.index < 0 else self.index
        else:
            pos = basis.size + self.index if self.index < 0 else self.index
        if 0 <= pos < basis.size:
            col[pos, 0] = 1
        return sparse.csr_matrix(col)

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        out_shape = tuple(cs.dim for cs in self.tensorsig)
        M = data.shape[len(field.tensorsig) + self.azimuth_axis]
        spatial = list(data.shape[len(field.tensorsig):])
        spatial[self.radius_axis] = self.radial_out.size
        out = jnp.zeros(out_shape + tuple(spatial), dtype=self.dtype)
        for ii in self._comp_indices(field.tensorsig):
            comp = data[ii]
            cm = comp.reshape((M // 2, 2, 1))
            stack = self._matrix_stack(ii, tuple(ii))
            res = jnp.einsum('moi,mpi->mpo', stack, cm).reshape((M, self.radial_out.size))
            out = out.at[ii].add(res)
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.radius_axis] = True
        return out
