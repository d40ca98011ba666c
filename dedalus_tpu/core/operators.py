"""
Operator nodes and vector-calculus factories.

Parity target (behavior): dedalus/core/operators.py:616-4341 (LinearOperator/
SpectralOperator machinery, calculus operators, Lift, TimeDerivative, Power,
UnaryGridFunction) — rebuilt on a compact orthogonal primitive set:

  * SpectralOperator1D: one matrix along one axis (Differentiate, Convert,
    ConvertConstant, Interpolate, Integrate, Lift). Pencil matrices come from
    a single generic kron assembly with group slicing, so every operator works
    identically in eager evaluation (dense MMT matmul on the MXU) and in
    subproblem matrix construction (host scipy).
  * Component / TensorStack: tensor index extraction and stacking, from which
    Gradient, Divergence, Curl, Laplacian, Skew, Trace, Transpose are built
    as factories (curvilinear geometries later override these factories).
  * Power / UnaryGridFunction: nonlinear grid-space operations.
"""

import numbers
import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Operand, Field
from .future import Future, as_operand
from .domain import Domain
from .coords import Coordinate, CoordinateSystem, CartesianCoordinates
from . import arithmetic
from .arithmetic import Add, Multiply, DotProduct, merge_domains, _constant_embedding
from ..ops import transforms as ops_transforms
from ..utils.general import prod
from ..utils.caching import CachedFunction

# Device matrix cache: host scipy matrices -> jnp dense, keyed explicitly
_DEVICE_MATRIX_CACHE = {}


def device_matrix(key, host_matrix_builder):
    from .basis import _tracing, _maybe_device
    if key not in _DEVICE_MATRIX_CACHE:
        mat = host_matrix_builder()
        if sparse.issparse(mat):
            mat = mat.toarray()
        _DEVICE_MATRIX_CACHE[key] = np.ascontiguousarray(mat)
    host = _DEVICE_MATRIX_CACHE[key]
    return _maybe_device(host)


class LinearOperator(Future):
    """Base for operators linear in their single operand."""

    @property
    def operand(self):
        return self._operands[0]

    def is_linear_in(self, vars):
        return self.operand.is_linear_in(vars)

    def sym_diff(self, variables, perturbations):
        d = self.operand.sym_diff(variables, perturbations)
        if isinstance(d, numbers.Number) and d == 0:
            return 0
        return self.new_operands(d)

    def split(self, *targets):
        if any(isinstance(t, type) and isinstance(self, t) for t in targets):
            return (self, 0)
        w, wo = self.operand.split(*targets)
        zero = lambda x: isinstance(x, numbers.Number) and x == 0
        return (self.new_operands(w) if not zero(w) else 0,
                self.new_operands(wo) if not zero(wo) else 0)

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def subproblem_matrix(self, subproblem):
        raise NotImplementedError


class SpectralOperator1D(LinearOperator):
    """
    An operator acting along a single axis with a fixed matrix in coeff space.
    Subclasses define: self.axis, self.input_basis, self.output_basis, and
    full_matrix() (host scipy, full coefficient sizes).

    Parity: dedalus/core/operators.py:835-995 (SpectralOperator/1D machinery).
    """

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.axis] = self.output_basis
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def full_matrix(self):
        raise NotImplementedError

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars)
        out = out.copy()
        if self.separable_dependence:
            out[self.axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars)
        out = out.copy()
        if self.axis_coupling:
            out[self.axis] = True
        return out

    @property
    def separable_dependence(self):
        """Whether per-group blocks differ across groups along self.axis."""
        from .basis import FourierBase
        return isinstance(self.input_basis or self.output_basis, FourierBase)

    @property
    def axis_coupling(self):
        """Whether the matrix couples distinct groups along self.axis."""
        for basis in (self.input_basis, self.output_basis):
            if basis is not None and getattr(basis, 'ops_couple', False):
                return True
        return False

    # --- pencil matrices ---

    def axis_block(self, subproblem):
        """Slice the full matrix to this subproblem's group along self.axis."""
        full = sparse.csr_matrix(self.full_matrix())
        group = subproblem.group[self.axis]
        if group is None:
            return full  # coupled axis: full matrix
        row_sel = subproblem.group_slice(self.output_basis, self.axis)
        col_sel = subproblem.group_slice(self.input_basis, self.axis)
        return full[row_sel, col_sel]

    def subproblem_matrix(self, subproblem):
        dim = self.dist.dim
        op_domain = self.operand.domain
        mat = None
        for axis in range(dim):
            if axis == self.axis:
                blk = self.axis_block(subproblem)
            else:
                width = subproblem.axis_width(op_domain.bases[axis], axis)
                blk = sparse.identity(width)
            mat = blk if mat is None else sparse.kron(mat, blk)
        ncomp = prod(tuple(cs.dim for cs in self.tensorsig)) or 1
        if ncomp > 1:
            mat = sparse.kron(sparse.identity(ncomp), mat)
        return sparse.csr_matrix(mat)

    # --- eager/traced evaluation ---

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data_axis = len(self.tensorsig) + self.axis
        key = self._matrix_key()
        mat = device_matrix(key, self.full_matrix)
        if np.issubdtype(self.dtype, np.complexfloating) and not jnp.iscomplexobj(mat):
            pass  # real matrix applied to complex data promotes fine
        data = ops_transforms.apply_matrix(mat, field.data, data_axis)
        return self._build_output(self.dist.coeff_layout, data, scales=field.scales)

    def _matrix_key(self):
        in_key = self.input_basis._key() if self.input_basis is not None else None
        out_key = self.output_basis._key() if self.output_basis is not None else None
        return (type(self).__name__, in_key, out_key) + self._extra_key()

    def _extra_key(self):
        return ()


class Differentiate1D(SpectralOperator1D):
    """d/dx along one axis (parity: basis.py:701 DifferentiateJacobi, :999-1106 Fourier)."""

    def __new__(cls, operand, coord):
        basis = operand.domain.bases[coord.axis]
        if basis is None:
            return 0  # derivative of a constant
        return super().__new__(cls)

    def __init__(self, operand, coord):
        self.coord = coord
        self.axis = coord.axis
        self.input_basis = operand.domain.bases[self.axis]
        self.output_basis = self.input_basis.derivative_basis(1)
        super().__init__(operand)

    def new_operands(self, operand):
        return Differentiate1D(operand, self.coord)

    def full_matrix(self):
        return self.input_basis.differentiation_matrix()


class Convert1D(SpectralOperator1D):
    """Basis conversion along one axis (parity: basis.py:664 ConvertJacobi)."""

    def __new__(cls, operand, coord, out_basis):
        if operand.domain.bases[coord.axis] == out_basis:
            return operand
        return super().__new__(cls)

    def __init__(self, operand, coord, out_basis):
        if operand is self or getattr(self, '_initialized', False):
            return
        self._initialized = True
        self.coord = coord
        self.axis = coord.axis
        self.input_basis = operand.domain.bases[self.axis]
        self.output_basis = out_basis
        super().__init__(operand)

    def new_operands(self, operand):
        return Convert1D(operand, self.coord, self.output_basis)

    def full_matrix(self):
        if self.input_basis is None:
            return _constant_embedding(self.output_basis)
        return self.input_basis.conversion_matrix(self.output_basis)

    @property
    def separable_dependence(self):
        from .basis import FourierBase
        if self.input_basis is None and isinstance(self.output_basis, FourierBase):
            return True  # constant lives only in group 0
        return False

    @property
    def axis_coupling(self):
        return getattr(self.output_basis, 'ops_couple', False) and self.input_basis is not None


class Interpolate1D(SpectralOperator1D):
    """Pointwise evaluation along one axis (parity: basis.py:721,1204)."""

    def __new__(cls, operand, coord, position):
        if operand.domain.bases[coord.axis] is None:
            return operand  # constant along axis: interpolation is identity
        return super().__new__(cls)

    def __init__(self, operand, coord, position):
        if operand is self:
            return
        self.coord = coord
        self.position = position
        self.axis = coord.axis
        self.input_basis = operand.domain.bases[self.axis]
        self.output_basis = None
        super().__init__(operand)

    def new_operands(self, operand):
        return Interpolate1D(operand, self.coord, self.position)

    def full_matrix(self):
        return self.input_basis.interpolation_vector(self.position)

    @property
    def axis_coupling(self):
        return True  # dense row couples all modes/groups

    @property
    def separable_dependence(self):
        return False

    def _extra_key(self):
        return (float(self.position) if not isinstance(self.position, str) else self.position,)


class Integrate1D(SpectralOperator1D):
    """Definite integral along one axis (parity: basis.py:745,1246)."""

    def __new__(cls, operand, coord):
        if operand.domain.bases[coord.axis] is None:
            # Integral of constant: multiply by axis length — needs bounds; treat
            # as error (reference integrates only over its own bases).
            raise ValueError("Cannot integrate along an axis without a basis")
        return super().__new__(cls)

    def __init__(self, operand, coord):
        self.coord = coord
        self.axis = coord.axis
        self.input_basis = operand.domain.bases[self.axis]
        self.output_basis = None
        super().__init__(operand)

    def new_operands(self, operand):
        return Integrate1D(operand, self.coord)

    def full_matrix(self):
        return self.input_basis.integration_vector()

    @property
    def axis_coupling(self):
        return getattr(self.input_basis, 'ops_couple', False)

    @property
    def separable_dependence(self):
        from .basis import FourierBase
        return isinstance(self.input_basis, FourierBase)


class Lift(SpectralOperator1D):
    """
    Lift a tau field (constant along the axis) onto a polynomial of the output
    basis (parity: basis.py:790 LiftJacobi; operators.py:4264).
    """

    def __new__(cls, operand, out_basis, index):
        from .basis_ball import BallBasis, ShellBasis
        if isinstance(out_basis, (BallBasis, ShellBasis)):
            from .operators_ball import BallLift
            return BallLift(operand, out_basis, index)
        if hasattr(out_basis, 'sub_bases'):
            out_basis = out_basis.sub_bases[-1]
        if hasattr(out_basis, 'interpolation_m'):
            from .operators_polar import PolarLift
            return PolarLift(operand, out_basis.coord.cs, out_basis, index)
        return super().__new__(cls)

    def __init__(self, operand, out_basis, index):
        if hasattr(out_basis, 'sub_bases'):
            out_basis = out_basis.sub_bases[-1]  # multi-axis basis: lift radially
        self.out_basis_arg = out_basis
        self.index = index
        self.axis = out_basis.coord.axis
        if operand.domain.bases[self.axis] is not None:
            raise NotImplementedError("Lift requires operand constant along the lift axis")
        self.input_basis = None
        self.output_basis = out_basis
        super().__init__(operand)

    def new_operands(self, operand):
        return Lift(operand, self.out_basis_arg, self.index)

    def full_matrix(self):
        return self.output_basis.lift_matrix(self.index)

    @property
    def axis_coupling(self):
        return getattr(self.output_basis, 'ops_couple', False)

    @property
    def separable_dependence(self):
        from .basis import FourierBase
        return isinstance(self.output_basis, FourierBase)

    def _extra_key(self):
        return (self.index,)


class HilbertTransform1D(SpectralOperator1D):
    """Hilbert transform along a Fourier axis (parity: operators.py:1433)."""

    def __init__(self, operand, coord):
        self.coord = coord
        self.axis = coord.axis
        self.input_basis = operand.domain.bases[self.axis]
        self.output_basis = self.input_basis
        super().__init__(operand)

    def new_operands(self, operand):
        return HilbertTransform1D(operand, self.coord)

    def full_matrix(self):
        return self.input_basis.hilbert_matrix()


def HilbertTransform(operand, coord):
    return HilbertTransform1D(operand, coord)


class GridSpace(LinearOperator):
    """Force evaluation in grid space (parity: operators.py:787 Grid)."""

    def __init__(self, operand):
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return GridSpace(operand)

    def operate(self, arg_fields):
        field = arg_fields[0].copy()
        field.change_scales(field.domain.dealias)
        field.require_grid_space()
        return field


class CoeffSpace(LinearOperator):
    """Force evaluation in coefficient space (parity: operators.py:787 Coeff)."""

    def __init__(self, operand):
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return CoeffSpace(operand)

    def operate(self, arg_fields):
        field = arg_fields[0].copy()
        field.require_coeff_space()
        field.change_scales(1)
        return field


Grid = GridSpace
Coeff = CoeffSpace


class TimeDerivative(LinearOperator):
    """Marker for d/dt; matrices pass through (parity: operators.py:999)."""

    def __init__(self, operand):
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return TimeDerivative(operand)

    def expression_matrices(self, subproblem, vars, **kw):
        return self.operand.expression_matrices(subproblem, vars, **kw)

    def operate(self, arg_fields):
        raise RuntimeError("Cannot evaluate TimeDerivative explicitly")

    def matrix_dependence(self, *vars):
        return self.operand.matrix_dependence(*vars)

    def matrix_coupling(self, *vars):
        return self.operand.matrix_coupling(*vars)


class Component(LinearOperator):
    """Extract index i of the first tensor axis."""

    def __init__(self, operand, index):
        self.index = index
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        if not op.tensorsig:
            raise ValueError("Component requires a tensor operand")
        self.tensorsig = op.tensorsig[1:]
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return Component(operand, self.index)

    def operate(self, arg_fields):
        field = arg_fields[0]
        data = field.data[self.index]
        return self._build_output(field.layout, data, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        dim0 = op.tensorsig[0].dim
        rest = prod(tuple(cs.dim for cs in op.tensorsig[1:])) or 1
        space = subproblem.spatial_size(op.domain)
        sel = sparse.lil_matrix((rest * space, dim0 * rest * space))
        start = self.index * rest * space
        sel[:, start:start + rest * space] = sparse.identity(rest * space)
        sel = sparse.csr_matrix(sel)
        return {v: sel @ m for v, m in op_mats.items()}


class TensorStack(Future):
    """
    Stack operands along a new leading tensor axis of a coordinate system.
    Components are converted to the merged output bases at construction.
    """

    def __init__(self, components, coordsys):
        self.coordsys = coordsys
        dist = next(c.dist for c in components if isinstance(c, (Field, Future)))
        # Merge domains over non-zero components
        live = [c for c in components if isinstance(c, (Field, Future))]
        if not live:
            raise ValueError("TensorStack requires at least one non-zero component")
        merged = merge_domains(dist, *[c.domain for c in live])
        conv = []
        for c in components:
            if isinstance(c, (Field, Future)):
                conv.append(convert(c, merged.bases))
            else:
                conv.append(0)
        self.components = conv
        super().__init__(*[c for c in conv if isinstance(c, (Field, Future))])
        self._merged = merged

    def _init_metadata(self):
        live = [c for c in self.args if isinstance(c, (Field, Future))]
        tsigs = {c.tensorsig for c in live}
        if len(tsigs) > 1:
            raise ValueError("TensorStack components must share tensorsig")
        self.tensorsig = (self.coordsys,) + live[0].tensorsig
        self.dtype = np.result_type(*[c.dtype for c in live])
        self.domain = merge_domains(self.dist, *[c.domain for c in live])

    def new_operands(self, *operands):
        # Rebuild preserving zero slots
        ops = iter(operands)
        comps = [next(ops) if isinstance(c, (Field, Future)) else 0 for c in self.components]
        return TensorStack(comps, self.coordsys)

    def is_linear_in(self, vars):
        return all((not isinstance(c, (Field, Future))) or c.is_linear_in(vars)
                   for c in self.components)

    def sym_diff(self, variables, perturbations):
        comps = []
        for c in self.components:
            if isinstance(c, (Field, Future)):
                comps.append(c.sym_diff(variables, perturbations))
            else:
                comps.append(0)
        if all(isinstance(c, numbers.Number) and c == 0 for c in comps):
            return 0
        return TensorStack(comps, self.coordsys)

    def operate(self, arg_fields):
        fields = iter(arg_fields)
        datas = []
        shape = None
        for c in self.components:
            if isinstance(c, (Field, Future)):
                f = next(fields)
                d = arithmetic._to_dealias_grid(f)
                datas.append(d)
                shape = d.shape
            else:
                datas.append(None)
        sub_shape = tuple(cs.dim for cs in self.tensorsig[1:]) + self.domain.grid_shape(self.domain.dealias)
        datas = [jnp.broadcast_to(d, sub_shape) if d is not None else jnp.zeros(sub_shape, self.dtype)
                 for d in datas]
        out = jnp.stack(datas, axis=0)
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)

    def expression_matrices(self, subproblem, vars, **kw):
        space = subproblem.spatial_size(self.domain)
        rest = prod(tuple(cs.dim for cs in self.tensorsig[1:])) or 1
        block_rows = rest * space
        out = {}
        mats_per_comp = []
        for c in self.components:
            if isinstance(c, (Field, Future)) and c.has(*vars):
                mats_per_comp.append(c.expression_matrices(subproblem, vars, **kw))
            else:
                mats_per_comp.append(None)
        all_vars = set()
        for m in mats_per_comp:
            if m:
                all_vars |= set(m.keys())
        for var in all_vars:
            vcols = subproblem.field_size(var)
            blocks = []
            for m in mats_per_comp:
                if m and var in m:
                    blocks.append(m[var])
                else:
                    blocks.append(sparse.csr_matrix((block_rows, vcols)))
            out[var] = sparse.vstack(blocks, format='csr')
        return out

    def matrix_dependence(self, *vars):
        out = np.zeros(self.dist.dim, dtype=bool)
        for c in self.components:
            if isinstance(c, Future) and c.has(*vars):
                out |= c.matrix_dependence(*vars)
        return out

    def matrix_coupling(self, *vars):
        out = np.zeros(self.dist.dim, dtype=bool)
        for c in self.components:
            if isinstance(c, Future) and c.has(*vars):
                out |= c.matrix_coupling(*vars)
        return out


class DPSubComponent(LinearOperator):
    """
    Extract one subsystem's component block from a DirectProduct tensor rank
    (parity: reference operators.py:3361 DirectProductComponent). Valid in
    both grid and coefficient space: the product intertwiner is
    block-diagonal over subsystems, so row slicing commutes with the spin
    recombination of the curvilinear block.
    """

    def __init__(self, operand, sub_cs, index=0):
        self.sub_cs = sub_cs
        self.index = index
        dp = operand.tensorsig[index]
        self.dp = dp
        self.sl = dp.sub_slice(sub_cs)
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        sub = self.sub_cs
        from .coords import Coordinate
        entry = () if isinstance(sub, Coordinate) else (sub,)
        self.tensorsig = (op.tensorsig[:self.index] + entry
                          + op.tensorsig[self.index + 1:])
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return DPSubComponent(operand, self.sub_cs, self.index)

    def operate(self, arg_fields):
        field = arg_fields[0]
        from .coords import Coordinate
        if isinstance(self.sub_cs, Coordinate):
            data = field.data[self.sl.start]
        else:
            data = field.data[self.sl]
        return self._build_output(field.layout, data, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        dim0 = self.dp.dim
        rest = prod(tuple(cs.dim for cs in op.tensorsig[self.index + 1:])) or 1
        space = subproblem.spatial_size(op.domain)
        nsub = self.sl.stop - self.sl.start
        sel = sparse.lil_matrix((nsub * rest * space, dim0 * rest * space))
        for j in range(nsub):
            r0 = j * rest * space
            c0 = (self.sl.start + j) * rest * space
            sel[r0:r0 + rest * space, c0:c0 + rest * space] = \
                sparse.identity(rest * space)
        sel = sparse.csr_matrix(sel)
        return {v: sel @ m for v, m in op_mats.items()}


class DirectStack(Future):
    """
    Concatenate per-subsystem parts (scalars or sub-vectors) into a
    DirectProduct tensor rank (the assembly half of DPSubComponent; parity:
    reference DirectProductGradient, operators.py:2414). Parts are aligned
    with dp.coordsystems; scalar parts fill one component, sub-cs vector
    parts fill that subsystem's block. Stacking happens in grid space when
    evaluated and by row concatenation in coefficient space (valid because
    the product intertwiner is block-diagonal over subsystems).
    """

    def __init__(self, parts, dp):
        from .arithmetic import merge_domains
        self.dp = dp
        live = [p for p in parts if isinstance(p, (Field, Future))]
        if not live:
            raise ValueError("DirectStack requires at least one non-zero part")
        dist = live[0].dist
        merged = merge_domains(dist, *[p.domain for p in live])
        conv = []
        for p in parts:
            if isinstance(p, (Field, Future)):
                conv.append(convert(p, merged.bases))
            else:
                conv.append(0)
        self.parts = conv
        super().__init__(*[p for p in conv if isinstance(p, (Field, Future))])
        self._merged = merged

    def _init_metadata(self):
        live = [p for p in self.args if isinstance(p, (Field, Future))]
        rest = None
        for sub, p in zip(self.dp.coordsystems, self.parts):
            if not isinstance(p, (Field, Future)):
                continue
            r = (p.tensorsig[1:] if (p.tensorsig and p.tensorsig[0] is sub)
                 else p.tensorsig)
            if rest is None:
                rest = tuple(r)
            elif tuple(r) != rest:
                raise ValueError("DirectStack parts must share trailing tensorsig")
        self.tensorsig = (self.dp,) + rest
        self.dtype = np.result_type(*[p.dtype for p in live])
        from .arithmetic import merge_domains
        self.domain = merge_domains(self.dist, *[p.domain for p in live])

    def new_operands(self, *operands):
        ops = iter(operands)
        parts = [next(ops) if isinstance(p, (Field, Future)) else 0
                 for p in self.parts]
        return DirectStack(parts, self.dp)

    def is_linear_in(self, vars):
        return all((not isinstance(p, (Field, Future))) or p.is_linear_in(vars)
                   for p in self.parts)

    def sym_diff(self, variables, perturbations):
        parts = [p.sym_diff(variables, perturbations)
                 if isinstance(p, (Field, Future)) else 0 for p in self.parts]
        if all(isinstance(p, numbers.Number) and p == 0 for p in parts):
            return 0
        return DirectStack(parts, self.dp)

    def operate(self, arg_fields):
        from . import arithmetic
        fields = iter(arg_fields)
        rest_shape = tuple(cs.dim for cs in self.tensorsig[1:])
        spatial = self.domain.grid_shape(self.domain.dealias)
        datas = []
        for sub, p in zip(self.dp.coordsystems, self.parts):
            if isinstance(p, (Field, Future)):
                d = arithmetic._to_dealias_grid(next(fields))
                if p.tensorsig and p.tensorsig[0] is sub:
                    d = jnp.broadcast_to(d, (sub.dim,) + rest_shape + spatial)
                else:
                    d = jnp.broadcast_to(d, rest_shape + spatial)[None]
            else:
                d = jnp.zeros((sub.dim,) + rest_shape + spatial, self.dtype)
            datas.append(d)
        out = jnp.concatenate(datas, axis=0)
        return self._build_output(self.dist.grid_layout, out,
                                  scales=self.domain.dealias)

    def expression_matrices(self, subproblem, vars, **kw):
        space = subproblem.spatial_size(self.domain)
        rest = prod(tuple(cs.dim for cs in self.tensorsig[1:])) or 1
        mats_per_part = []
        for p in self.parts:
            if isinstance(p, (Field, Future)) and p.has(*vars):
                mats_per_part.append(p.expression_matrices(subproblem, vars, **kw))
            else:
                mats_per_part.append(None)
        all_vars = set()
        for mp in mats_per_part:
            if mp:
                all_vars |= set(mp.keys())
        out = {}
        for var in all_vars:
            vcols = subproblem.field_size(var)
            blocks = []
            for sub, mp in zip(self.dp.coordsystems, mats_per_part):
                rows = sub.dim * rest * space
                if mp and var in mp:
                    blocks.append(mp[var])
                else:
                    blocks.append(sparse.csr_matrix((rows, vcols)))
            out[var] = sparse.vstack(blocks, format='csr')
        return out

    def matrix_dependence(self, *vars):
        out = np.zeros(self.dist.dim, dtype=bool)
        for p in self.parts:
            if isinstance(p, Future) and p.has(*vars):
                out |= p.matrix_dependence(*vars)
        return out

    def matrix_coupling(self, *vars):
        out = np.zeros(self.dist.dim, dtype=bool)
        for p in self.parts:
            if isinstance(p, Future) and p.has(*vars):
                out |= p.matrix_coupling(*vars)
        return out


class Power(Future):
    """operand ** n, evaluated in grid space (parity: operators.py:306)."""

    def __new__(cls, operand, power):
        if isinstance(operand, numbers.Number):
            return operand ** power
        if isinstance(power, numbers.Number) and power == 1:
            return operand
        return super().__new__(cls)

    def __init__(self, operand, power):
        if operand is self:
            return
        if not isinstance(power, numbers.Number):
            raise ValueError("Power exponent must be a number")
        self.power = power
        super().__init__(operand)

    def _init_metadata(self):
        op = self._operands[0]
        if op.tensorsig:
            raise ValueError("Power requires scalar operand")
        self.tensorsig = ()
        self.dtype = op.dtype
        self.domain = op.domain

    @property
    def operand(self):
        return self._operands[0]

    def new_operands(self, operand):
        return Power(operand, self.power)

    def is_linear_in(self, vars):
        return False

    def sym_diff(self, variables, perturbations):
        d = self.operand.sym_diff(variables, perturbations)
        if isinstance(d, numbers.Number) and d == 0:
            return 0
        return Multiply(self.power, Multiply(Power(self.operand, self.power - 1), d))

    def operate(self, arg_fields):
        data = arithmetic._to_dealias_grid(arg_fields[0])
        out = data ** self.power
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)


# Derivatives of supported unary grid functions, for Frechet differentials
UNARY_DERIVATIVES = {
    np.sin: lambda a: UnaryGridFunction(np.cos, a),
    np.cos: lambda a: Multiply(-1, UnaryGridFunction(np.sin, a)),
    np.tan: lambda a: Power(UnaryGridFunction(np.cos, a), -2),
    np.exp: lambda a: UnaryGridFunction(np.exp, a),
    np.log: lambda a: Power(a, -1),
    np.sinh: lambda a: UnaryGridFunction(np.cosh, a),
    np.cosh: lambda a: UnaryGridFunction(np.sinh, a),
    np.tanh: lambda a: Power(UnaryGridFunction(np.cosh, a), -2),
    np.sqrt: lambda a: Multiply(0.5, Power(a, -0.5)),
    np.arctan: lambda a: Power(Add(1, Power(a, 2)), -1),
}


class UnaryGridFunction(Future):
    """Apply a numpy ufunc pointwise in grid space (parity: operators.py:505)."""

    def __init__(self, func, operand):
        self.func = func
        super().__init__(as_operand(operand))

    def _init_metadata(self):
        op = self._operands[0]
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    @property
    def operand(self):
        return self._operands[0]

    @property
    def name(self):
        return self.func.__name__

    def new_operands(self, operand):
        return UnaryGridFunction(self.func, operand)

    def is_linear_in(self, vars):
        return False

    def sym_diff(self, variables, perturbations):
        d = self.operand.sym_diff(variables, perturbations)
        if isinstance(d, numbers.Number) and d == 0:
            return 0
        if self.func not in UNARY_DERIVATIVES:
            raise NotImplementedError(f"No derivative rule for {self.func}")
        return Multiply(UNARY_DERIVATIVES[self.func](self.operand), d)

    def operate(self, arg_fields):
        data = arithmetic._to_dealias_grid(arg_fields[0])
        jfunc = getattr(jnp, self.func.__name__, None)
        if jfunc is None:
            jfunc = self.func  # numpy ufuncs work on jax arrays via __array_ufunc__
        out = jfunc(data)
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)


class GeneralFunction(Future):
    """
    Wrap an arbitrary host function producing grid data
    (parity: operators.py:430).
    """

    def __init__(self, dist, domain, tensorsig, dtype, layout, func, args=None):
        self.func = func
        self.dist = dist
        self._gf_domain = domain
        self._gf_tensorsig = tuple(tensorsig)
        self._gf_dtype = dtype
        self.layout = layout
        self.gf_args = args or []
        ops = [a for a in self.gf_args if isinstance(a, (Field, Future))]
        self.args = list(self.gf_args)
        self._operands = ops
        self._init_metadata()

    def _init_metadata(self):
        self.tensorsig = self._gf_tensorsig
        self.dtype = self._gf_dtype
        self.domain = self._gf_domain

    def new_operands(self, *operands):
        return self

    def is_linear_in(self, vars):
        return False

    def evaluate(self, memo=None):
        arg_vals = [a.evaluate(memo) if isinstance(a, Future) else a for a in self.gf_args]
        data = self.func(*arg_vals)
        out = Field(self.dist, bases=[b for b in self.domain.bases if b is not None],
                    dtype=self.dtype, tensorsig=self.tensorsig)
        layout = self.dist.grid_layout if self.layout in ('g', 'grid') else self.dist.coeff_layout
        out.preset_data(layout, data)
        return out


# ---------------------------------------------------------------------------
# Conversion helper (parity: operators.py:1474 convert)
# ---------------------------------------------------------------------------

def convert(expr, bases):
    """Wrap expr with Convert ops so its output bases match `bases` per axis."""
    if isinstance(expr, numbers.Number):
        return expr
    if isinstance(expr, Add):
        return Add(*[convert(a, bases) for a in expr._operands])
    if isinstance(bases, (tuple, list)):
        bases = [b for b in bases if b is not None]
    full = Domain._canonical_bases(expr.dist, bases)
    for axis, target in enumerate(full):
        current = expr.domain.bases[axis]
        if target is None or current == target:
            continue
        from .basis_ball import SphericalRadialBasis
        from .basis_sphere import ColatitudeBasis
        if isinstance(target, ColatitudeBasis) and current is None \
                and hasattr(target.parent, 'radial_basis'):
            continue  # embedded jointly by the radial-axis constant embed
        if isinstance(target, SphericalRadialBasis):
            if current is None:
                from .operators_ball import BallConstantEmbed
                expr = BallConstantEmbed(expr, target)
            else:
                from .operators_ball import BallConvert
                expr = BallConvert(expr, target.coord.cs, target)
        elif hasattr(target, 'conversion_matrix_m'):
            from .operators_polar import PolarConvert
            expr = PolarConvert(expr, target.coord.cs, target)
        else:
            expr = Convert1D(expr, target.coord, target)
    return expr


# ---------------------------------------------------------------------------
# Vector calculus factories (Cartesian; curvilinear overrides come with their
# coordinate systems). Parity: operators.py Gradient:2314, Divergence:3415,
# Curl:3667, Laplacian:3982, Trace:1720, TransposeComponents:1879, Skew:2049.
# ---------------------------------------------------------------------------

def Differentiate(operand, coord):
    if isinstance(coord, CoordinateSystem) and not isinstance(coord, Coordinate):
        raise ValueError("Differentiate requires a single coordinate")
    return Differentiate1D(operand, coord)


def Gradient(operand, coordsys=None):
    from .coords import (PolarCoordinates, S2Coordinates, SphericalCoordinates,
                         DirectProduct, Coordinate as _Coord)
    if coordsys is None:
        coordsys = _infer_coordsys(operand)
    if isinstance(coordsys, DirectProduct):
        # Product gradient: stack the per-subsystem gradients
        # (parity: reference operators.py:2414 DirectProductGradient)
        parts = []
        for sub in coordsys.coordsystems:
            if isinstance(sub, _Coord):
                parts.append(Differentiate1D(operand, sub))
            else:
                parts.append(Gradient(operand, sub))
        return DirectStack(parts, coordsys)
    if isinstance(coordsys, SphericalCoordinates):
        from .operators_ball import SphericalGradient
        return SphericalGradient(operand, coordsys)
    if isinstance(coordsys, S2Coordinates):
        from .operators_sphere import SphereGradient
        return SphereGradient(operand, coordsys)
    if isinstance(coordsys, PolarCoordinates):
        from .operators_polar import PolarGradient
        return PolarGradient(operand, coordsys)
    comps = [Differentiate1D(operand, c) for c in coordsys.coords]
    return TensorStack(comps, coordsys)


def Divergence(operand, index=0):
    from .coords import (PolarCoordinates, SphericalCoordinates, DirectProduct,
                         Coordinate as _Coord)
    if not operand.tensorsig:
        raise ValueError("Divergence requires a tensor operand")
    coordsys = operand.tensorsig[index]
    if isinstance(coordsys, DirectProduct):
        # Product divergence: sum of per-subsystem divergences of the
        # component blocks (parity: operators.py:3497 DirectProductDivergence)
        terms = []
        for sub in coordsys.coordsystems:
            block = DPSubComponent(operand, sub, index)
            if isinstance(sub, _Coord):
                terms.append(Differentiate1D(block, sub))
            else:
                terms.append(Divergence(block, index))
        terms = [t for t in terms
                 if not (isinstance(t, numbers.Number) and t == 0)]
        if not terms:
            return 0
        return Add(*terms) if len(terms) > 1 else terms[0]
    if isinstance(coordsys, SphericalCoordinates):
        from .operators_ball import SphericalDivergence
        return SphericalDivergence(operand, index)
    from .coords import S2Coordinates as _S2
    if isinstance(coordsys, _S2):
        from .operators_sphere import SphereDivergence
        return SphereDivergence(operand, index)
    if isinstance(coordsys, PolarCoordinates):
        from .operators_polar import PolarDivergence
        return PolarDivergence(operand, index)
    terms = []
    for i, c in enumerate(coordsys.coords):
        term = Differentiate1D(Component(operand, i), c)
        if not (isinstance(term, numbers.Number) and term == 0):
            terms.append(term)
    if not terms:
        return 0
    return Add(*terms) if len(terms) > 1 else terms[0]


def Laplacian(operand, coordsys=None):
    from .coords import (PolarCoordinates, S2Coordinates, SphericalCoordinates,
                         DirectProduct, Coordinate as _Coord)
    if coordsys is None:
        coordsys = _infer_coordsys(operand)
    if isinstance(coordsys, DirectProduct):
        # Product laplacian: sum of per-subsystem laplacians (valid for
        # scalars and for tensors, whose curvilinear components mix only
        # within each subsystem's operators)
        terms = []
        for sub in coordsys.coordsystems:
            if isinstance(sub, _Coord):
                terms.append(Differentiate1D(Differentiate1D(operand, sub), sub))
            else:
                terms.append(Laplacian(operand, sub))
        return Add(*terms) if len(terms) > 1 else terms[0]
    if isinstance(coordsys, SphericalCoordinates):
        from .operators_ball import BallLaplacian
        return BallLaplacian(operand, coordsys)
    if isinstance(coordsys, S2Coordinates):
        from .operators_sphere import SphereLaplacian
        return SphereLaplacian(operand, coordsys)
    if isinstance(coordsys, PolarCoordinates):
        from .operators_polar import PolarLaplacian
        return PolarLaplacian(operand, coordsys)
    return Divergence(Gradient(operand, coordsys))


def Curl(operand, index=0):
    from .coords import (SphericalCoordinates, DirectProduct, PolarCoordinates,
                         Coordinate as _Coord)
    coordsys = operand.tensorsig[index]
    if isinstance(coordsys, SphericalCoordinates):
        from .operators_ball import SphericalCurl
        return SphericalCurl(operand, index)
    if isinstance(coordsys, DirectProduct):
        # Cylinder curl (parity: operators.py:3751 DirectProductCurl), for
        # Coordinate x Polar products. With u = (u_z, u_polar) and the
        # physical right-handed (r, phi, z) orientation:
        #   curl_z = div(skew(u_polar))
        #   (curl_phi, curl_r) = -skew(dz(u_polar) - grad_polar(u_z))
        subs = coordsys.coordsystems
        straight = [s for s in subs if isinstance(s, _Coord)]
        polar = [s for s in subs if isinstance(s, PolarCoordinates)]
        if coordsys.dim != 3 or len(straight) != 1 or len(polar) != 1:
            raise NotImplementedError(
                "DirectProduct curl needs one Coordinate and one polar system")
        cz_, cp_ = straight[0], polar[0]
        uz = DPSubComponent(operand, cz_, index)
        up = DPSubComponent(operand, cp_, index)
        A = Add(Differentiate1D(up, cz_),
                Multiply(-1, Gradient(uz, cp_)))
        curl_z = Divergence(Skew(up))
        curl_polar = Multiply(-1, Skew(A))
        parts = [curl_z if sub is cz_ else curl_polar for sub in subs]
        return DirectStack(parts, coordsys)
    dim = coordsys.dim
    cs = coordsys.coords
    if dim == 2:
        # 2D curl -> scalar: dx(u_y) - dy(u_x)
        t1 = Differentiate1D(Component(operand, 1), cs[0])
        t2 = Differentiate1D(Component(operand, 0), cs[1])
        return Add(t1, Multiply(-1, t2))
    if dim == 3:
        def d(i, j):
            return Differentiate1D(Component(operand, j), cs[i])
        comps = [Add(d(1, 2), Multiply(-1, d(2, 1))),
                 Add(d(2, 0), Multiply(-1, d(0, 2))),
                 Add(d(0, 1), Multiply(-1, d(1, 0)))]
        return TensorStack(comps, coordsys)
    raise ValueError("Curl requires 2D or 3D vectors")


def Skew(operand):
    """90-degree rotation of a 2D vector: skew(u) = (-u[1], u[0])."""
    coordsys = operand.tensorsig[0]
    from .coords import CurvilinearCoordinateSystem
    if isinstance(coordsys, CurvilinearCoordinateSystem):
        from .operators_sphere import SpinSkew
        return SpinSkew(operand)
    if coordsys.dim != 2:
        raise ValueError("Skew requires 2D vectors")
    return TensorStack([Multiply(-1, Component(operand, 1)), Component(operand, 0)],
                       coordsys)


def Trace(operand):
    from .coords import PolarCoordinates, SphericalCoordinates
    if len(operand.tensorsig) < 2:
        raise ValueError("Trace requires a rank-2+ tensor")
    if isinstance(operand.tensorsig[0], SphericalCoordinates):
        from .operators_ball import SphericalTrace
        return SphericalTrace(operand)
    if isinstance(operand.tensorsig[0], PolarCoordinates):
        from .operators_polar import PolarTrace
        return PolarTrace(operand)
    dim = operand.tensorsig[0].dim
    terms = [Component(Component(operand, i), i) for i in range(dim)]
    return Add(*terms) if len(terms) > 1 else terms[0]


def RadialComponent(operand, index=0):
    """Radial component of a spin-component spherical operand
    (parity: operators.py:2231 RadialComponent)."""
    from .coords import SphericalCoordinates
    if isinstance(operand.tensorsig[index], SphericalCoordinates):
        from .operators_ball import SphericalComponent
        return SphericalComponent(operand, index, comps=(2,), s2_out=False)
    raise NotImplementedError("RadialComponent: unsupported coordinate system")


def AngularComponent(operand, index=0):
    """Angular (S2) components of a spin-component spherical operand
    (parity: operators.py:2255 AngularComponent)."""
    from .coords import SphericalCoordinates
    if isinstance(operand.tensorsig[index], SphericalCoordinates):
        from .operators_ball import SphericalComponent
        return SphericalComponent(operand, index, comps=(0, 1), s2_out=True)
    raise NotImplementedError("AngularComponent: unsupported coordinate system")


def AzimuthalComponent(operand, index=0):
    """Azimuthal component of a polar-coordinate tensor slot (parity:
    operators.py:2286 AzimuthalComponent): component 0 of tensorsig[index]
    in the coordsys's azimuth-first ordering — the same raw slice the
    reference's Component.operate takes."""
    from .coords import PolarCoordinates
    if index < 0:
        index += len(operand.tensorsig)
    if not isinstance(operand.tensorsig[index], PolarCoordinates):
        raise ValueError(
            "Can only take the AzimuthalComponent of a PolarCoordinate vector")
    if index != 0:
        raise NotImplementedError(
            "AzimuthalComponent: leading tensor slot only")
    return Component(operand, 0)


azimuthal = AzimuthalComponent


def TransposeComponents(operand, indices=(0, 1)):
    i0, i1 = indices
    if i0 != 0 or i1 != 1:
        raise NotImplementedError("Only leading-pair transposition supported")
    from .coords import SphericalCoordinates
    if isinstance(operand.tensorsig[0], SphericalCoordinates):
        from .operators_ball import SphericalTransposeComponents
        return SphericalTransposeComponents(operand, indices)
    cs0, cs1 = operand.tensorsig[0], operand.tensorsig[1]
    rows = []
    for j in range(cs1.dim):
        comps = [Component(Component(operand, i), j) for i in range(cs0.dim)]
        rows.append(TensorStack(comps, cs0))
    return TensorStack(rows, cs1)


def Interpolate(operand, coord, position):
    if isinstance(coord, str):
        raise ValueError("Interpolate requires a coordinate object")
    basis = operand.domain.bases[coord.axis]
    from .basis_ball import SphericalRadialBasis
    if isinstance(basis, SphericalRadialBasis):
        from .operators_ball import BallInterpolate
        return BallInterpolate(operand, coord.cs, position)
    if hasattr(basis, 'interpolation_m'):
        from .operators_polar import PolarInterpolate
        return PolarInterpolate(operand, coord.cs, position)
    return Interpolate1D(operand, coord, position)


def Integrate(operand, coord=None):
    from .coords import S2Coordinates
    from .basis_ball import SphericalRadialBasis
    for b in operand.domain.bases:
        if b is not None and isinstance(b, SphericalRadialBasis):
            from .operators_ball import SphericalIntegrate
            return SphericalIntegrate(operand)
    for b in operand.domain.bases:
        if b is not None and isinstance(getattr(b.coord, 'cs', None), S2Coordinates):
            from .operators_sphere import SphereIntegrate
            return SphereIntegrate(operand)
    if coord is None:
        coords = [b.coord for b in operand.domain.bases if b is not None]
    elif isinstance(coord, (CartesianCoordinates,)):
        coords = [c for c in coord.coords if operand.domain.bases[c.axis] is not None]
    elif isinstance(coord, (tuple, list)):
        coords = list(coord)
    else:
        coords = [coord]
    out = operand
    for c in coords:
        out = Integrate1D(out, c)
    return out


def Average(operand, coord=None):
    from .coords import S2Coordinates
    for b in operand.domain.bases:
        if b is not None and isinstance(getattr(b.coord, 'cs', None), S2Coordinates):
            from .operators_sphere import SphereAverage
            return SphereAverage(operand)
    if coord is None:
        coords = [b.coord for b in operand.domain.bases if b is not None]
    elif isinstance(coord, (tuple, list)):
        coords = list(coord)
    elif isinstance(coord, CartesianCoordinates):
        coords = [c for c in coord.coords if operand.domain.bases[c.axis] is not None]
    else:
        coords = [coord]
    out = operand
    for c in coords:
        basis = operand.domain.bases[c.axis]
        length = basis.bounds[1] - basis.bounds[0]
        out = Multiply(1 / length, Integrate1D(out, c))
    return out


def _infer_coordsys(operand):
    from .coords import DirectProduct
    systems = []
    for b in operand.domain.bases:
        if b is not None:
            cs = b.coord.cs or b.coord
            if cs not in systems:
                systems.append(cs)
    if len(systems) == 1:
        return systems[0]
    # Multiple subsystems: a DirectProduct registered with the distributor
    # covers them (cylinder-style geometries)
    dps = [cs for cs in operand.dist.coordsystems
           if isinstance(cs, DirectProduct)]
    if len(dps) == 1:
        return dps[0]
    raise ValueError("Cannot infer coordinate system; pass it explicitly")


# Interpolation call syntax: u(z=0)
def _operand_call(self, **kw):
    out = self
    # Resolve coordinates by name across the distributor
    for name, position in kw.items():
        coord = None
        for c in out.dist.coords:
            if c.name == name:
                coord = c
                break
        if coord is None:
            raise ValueError(f"Unknown coordinate: {name}")
        out = Interpolate(out, coord, position)
    return out



class AdvectiveCFL(Future):
    """
    Scalar advective grid-crossing frequency of a velocity vector, with the
    correct metric per geometry (parity: operators.py:4342 AdvectiveCFL +
    basis.py:6078-6207 per-geometry cfl_spacing):

      Cartesian: |u_i| / dx_i, Fourier spacing L/N, Chebyshev spacing
                 ~ sin(theta) pi L / (2 N) (fine near walls);
      Polar:     |u_phi| m_max / r  +  |u_r| / dr  (r -> radius on the disk);
      S2:        |u| sqrt(Lmax (Lmax+1)) / r;
      Ball/Shell: S2 angular frequency + |u_r| / dr.
    """

    name = 'cfl'

    def __init__(self, operand, coordsys=None):
        operand = as_operand(operand)
        if len(operand.tensorsig) != 1:
            raise ValueError("Velocity must be a vector")
        self.coordsys = coordsys if coordsys is not None else operand.tensorsig[0]
        super().__init__(operand)

    def _init_metadata(self):
        op = self._operands[0]
        self.tensorsig = ()
        self.dtype = op.dtype
        self.domain = op.domain

    @property
    def operand(self):
        return self._operands[0]

    def new_operands(self, operand):
        return AdvectiveCFL(operand, self.coordsys)

    def is_linear_in(self, vars):
        return False

    def _axis_shape(self, data_ndim, axis, n):
        shape = [1] * data_ndim
        shape[axis] = n
        return shape

    def _cartesian_freq(self, data):
        cs = self.coordsys
        coords_list = cs.coords if hasattr(cs, 'coords') else (cs,)
        dealias = self.domain.dealias
        freq = jnp.zeros(data.shape[1:], dtype=jnp.result_type(data.dtype))
        for i, coord in enumerate(coords_list):
            axis = coord.axis
            basis = self.domain.bases[axis]
            if basis is None:
                continue
            tname = type(basis).__name__
            if tname in ('RealFourier', 'ComplexFourier'):
                dx = np.asarray(basis.grid_spacing(1)).min()  # L / N
            elif hasattr(basis, 'a0') and basis.a0 == -0.5 and basis.b0 == -0.5:
                # Chebyshev: physically meaningful spacing ~ sin(theta) pi/N
                # at native resolution, shaped on the dealias grid
                N = basis.grid_size(dealias[axis])
                theta = np.pi * (np.arange(N) + 0.5) / N
                stretch = 1.0 / basis.COV.stretch  # problem length / native
                dx = dealias[axis] * stretch * np.sin(theta) * np.pi / N
                dx = dx.reshape(self._axis_shape(data.ndim - 1, axis, N))
            else:
                dx = np.asarray(basis.grid_spacing(dealias[axis])) * dealias[axis]
                dx = dx.reshape(self._axis_shape(data.ndim - 1, axis, dx.size))
            freq = freq + jnp.abs(data[i]) / dx
        return freq

    def _polar_freq(self, data):
        bases = [b for b in self.domain.bases if b is not None]
        azimuth, radial = self.domain.bases[bases[0].coord.axis], bases[-1]
        dealias = self.domain.dealias
        r_axis = radial.coord.axis
        mmax = int(np.max(np.abs(np.asarray(azimuth.wavenumbers)))) if azimuth is not None else 0
        if mmax == 0:
            az_freq = 0.0
        elif type(radial).__name__ == 'DiskRadialBasis':
            az_freq = jnp.abs(data[0]) * (mmax / radial.radius)
        else:
            r = np.asarray(radial.global_grid(dealias[r_axis]))
            r = r.reshape(self._axis_shape(data.ndim - 1, r_axis, r.size))
            az_freq = jnp.abs(data[0]) * (mmax / r)
        dr = np.asarray(radial.grid_spacing(dealias[r_axis])) * dealias[r_axis]
        dr = dr.reshape(self._axis_shape(data.ndim - 1, r_axis, dr.size))
        return az_freq + jnp.abs(data[1]) / dr

    def _s2_freq(self, data, r=None):
        colat = [b for b in self.domain.bases
                 if type(b).__name__ == 'ColatitudeBasis'][0]
        Lmax = colat.Lmax
        u_mag = jnp.sqrt(data[0]**2 + data[1]**2)
        if Lmax == 0:
            return jnp.zeros_like(u_mag)
        if r is None:
            r = colat.radius
        return u_mag * (np.sqrt(Lmax * (Lmax + 1)) / r)

    def _spherical_freq(self, data):
        bases = [b for b in self.domain.bases if b is not None]
        radial = bases[-1]
        r_axis = radial.coord.axis
        dealias = self.domain.dealias
        if type(radial).__name__ == 'BallRadialBasis':
            r_eff = radial.radius
        else:
            r = np.asarray(radial.global_grid(dealias[r_axis]))
            r_eff = jnp.asarray(
                r.reshape(self._axis_shape(data.ndim - 1, r_axis, r.size)))
        freq = self._s2_freq(data, r=r_eff)
        dr = np.asarray(radial.grid_spacing(dealias[r_axis])) * dealias[r_axis]
        dr = dr.reshape(self._axis_shape(data.ndim - 1, r_axis, dr.size))
        return freq + jnp.abs(data[2]) / dr

    def operate(self, arg_fields):
        data = arithmetic._to_dealias_grid(arg_fields[0])
        csname = type(self.coordsys).__name__
        if csname in ('CartesianCoordinates', 'Coordinate'):
            freq = self._cartesian_freq(data)
        elif csname == 'PolarCoordinates':
            freq = self._polar_freq(data)
        elif csname == 'S2Coordinates':
            freq = self._s2_freq(data)
        elif csname == 'SphericalCoordinates':
            freq = self._spherical_freq(data)
        else:
            raise NotImplementedError(f"AdvectiveCFL for {csname}")
        return self._build_output(self.dist.grid_layout, freq,
                                  scales=self.domain.dealias)


Operand.__call__ = _operand_call

# Lowercase aliases matching the reference's public names (public.py:1-17)
grad = Gradient
div = Divergence
radial = RadialComponent
angular = AngularComponent
curl = Curl
lap = Laplacian
skew = Skew
trace = Trace
transpose = TransposeComponents
integ = Integrate
ave = Average
interp = Interpolate
dt = TimeDerivative
lift = Lift
d = Differentiate

__all__ = ['Differentiate', 'Gradient', 'Divergence', 'Laplacian', 'Curl', 'Skew',
           'Trace', 'TransposeComponents', 'Interpolate', 'Integrate', 'Average',
           'Lift', 'TimeDerivative', 'Component', 'TensorStack', 'Power',
           'UnaryGridFunction', 'GeneralFunction', 'convert',
           'HilbertTransform', 'Grid', 'Coeff', 'AdvectiveCFL',
           'RadialComponent', 'AngularComponent', 'radial', 'angular',
           'grad', 'div', 'curl', 'lap', 'skew', 'trace', 'transpose',
           'integ', 'ave', 'interp', 'dt', 'lift']
