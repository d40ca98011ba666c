"""
Operands and Fields.

Parity target (behavior): dedalus/core/field.py:33-1043. TPU-first redesign:
field data are immutable JAX arrays; layout moves are pure jitted functions
(MMT matmuls), so the same eager API also traces cleanly inside a compiled
solver step.
"""

import numbers
import numpy as np
import jax.numpy as jnp

from .domain import Domain
from .distributor import Layout
from ..utils.general import prod


class Operand:
    """Mixin providing the user-facing algebra on fields and deferred operators."""

    __array_priority__ = 100.0

    # --- arithmetic dispatch (parity: field.py:40-145) ---

    def __add__(self, other):
        from . import arithmetic
        if isinstance(other, numbers.Number) and other == 0:
            return self
        return arithmetic.Add(self, other)

    def __radd__(self, other):
        from . import arithmetic
        if isinstance(other, numbers.Number) and other == 0:
            return self
        return arithmetic.Add(other, self)

    def __sub__(self, other):
        from . import arithmetic
        return arithmetic.Add(self, -other)

    def __rsub__(self, other):
        from . import arithmetic
        return arithmetic.Add(other, -self)

    def __neg__(self):
        from . import arithmetic
        return arithmetic.Multiply(-1, self)

    def __mul__(self, other):
        from . import arithmetic
        return arithmetic.Multiply(self, other)

    def __rmul__(self, other):
        from . import arithmetic
        return arithmetic.Multiply(other, self)

    def __truediv__(self, other):
        from . import arithmetic
        if isinstance(other, numbers.Number):
            return arithmetic.Multiply(1 / other, self)
        return arithmetic.Multiply(self, other**(-1))

    def __rtruediv__(self, other):
        return other * self**(-1)

    def __pow__(self, other):
        from . import operators
        return operators.Power(self, other)

    def __matmul__(self, other):
        from . import arithmetic
        return arithmetic.DotProduct(self, other)

    def __rmatmul__(self, other):
        from . import arithmetic
        return arithmetic.DotProduct(other, self)

    def __abs__(self):
        from . import operators
        return operators.UnaryGridFunction(np.absolute, self)

    # numpy ufunc interception: np.sqrt(u@u), np.sin(x*u), ...
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        from . import operators
        if method != '__call__' or kwargs:
            return NotImplemented
        if ufunc is np.power and len(inputs) == 2 and inputs[0] is self:
            return operators.Power(self, inputs[1])
        if len(inputs) == 1:
            return operators.UnaryGridFunction(ufunc, self)
        return NotImplemented


class Field(Operand):
    """
    A scalar/vector/tensor field over a domain, stored as a JAX array in a
    definite layout (grid/coeff per axis) at definite transform scales.
    """

    def __init__(self, dist, bases=None, name=None, dtype=None, tensorsig=None):
        self.dist = dist
        self.name = name
        self.tensorsig = tuple(tensorsig) if tensorsig else ()
        self.dtype = np.dtype(dtype) if dtype is not None else dist.dtype
        self.domain = Domain(dist, bases)
        # Complex bases require complex dtype
        for b in self.domain.bases:
            if b is not None and type(b).__name__ == 'ComplexFourier':
                if not np.issubdtype(self.dtype, np.complexfloating):
                    raise ValueError("ComplexFourier basis requires complex dtype")
        self.scales = tuple(1.0 for _ in range(dist.dim))
        self.layout = dist.coeff_layout
        self.data = jnp.zeros(self.required_shape(self.layout, self.scales), dtype=self.dtype)

    # --- shapes ---

    @property
    def tensor_shape(self):
        return tuple(cs.dim for cs in self.tensorsig)

    def required_shape(self, layout, scales):
        shape = []
        for i, b in enumerate(self.domain.bases):
            if b is None:
                shape.append(1)
            elif layout.grid_space[i]:
                shape.append(b.grid_size(scales[i]))
            else:
                shape.append(b.coeff_size)
        return self.tensor_shape + tuple(shape)

    @property
    def ncomp(self):
        return prod(self.tensor_shape)

    # --- layout motion (pure functions of self.data) ---

    def preset_data(self, layout, data, scales=None):
        if scales is not None:
            self.scales = self._canonical_scales(scales)
        self.layout = layout
        expected = self.required_shape(layout, self.scales)
        data = jnp.asarray(data)
        if data.shape != tuple(expected):
            data = jnp.broadcast_to(data, expected)
        self.data = data.astype(self.dtype)

    def _canonical_scales(self, scales):
        if scales is None:
            return self.scales
        if np.isscalar(scales):
            return tuple(float(scales) for _ in range(self.dist.dim))
        return tuple(float(s) for s in scales)

    def towards_coeff_space(self):
        """Transform the first grid-space axis to coeff space.

        Distributed: the transform axis is local in the current layout's
        shard map by construction; the post-transform constraint moves the
        next mesh dim down one axis (XLA emits the all_to_all transpose),
        mirroring the reference's transform/transpose path alternation
        (ref distributor.py:131-175)."""
        gs = list(self.layout.grid_space)
        axis = gs.index(True)
        basis = self.domain.bases[axis]
        data_axis = len(self.tensorsig) + axis
        if basis is not None:
            self.data = basis.forward_transform(self.data, data_axis, self.scales[axis],
                                                self.dtype, tensorsig=self.tensorsig)
        gs[axis] = False
        self.layout = Layout(gs)
        self.data = self.dist.constrain(self.data, self.layout, len(self.tensorsig))

    def towards_grid_space(self):
        """Transform the last coeff-space axis to grid space.

        Distributed: constrain to the TARGET layout's shard map first — this
        moves any mesh dim off the transform axis (XLA emits the all_to_all
        transpose over ICI), then the transform runs shard-local."""
        gs = list(self.layout.grid_space)
        axis = len(gs) - 1 - gs[::-1].index(False)
        basis = self.domain.bases[axis]
        data_axis = len(self.tensorsig) + axis
        target = Layout(gs[:axis] + [True] + gs[axis + 1:])
        if basis is not None:
            self.data = self.dist.constrain(self.data, target, len(self.tensorsig))
            self.data = basis.backward_transform(self.data, data_axis, self.scales[axis],
                                                 self.dtype, tensorsig=self.tensorsig)
        else:
            # Constant axis: size-1 in both spaces
            pass
        self.layout = target

    def require_coeff_space(self):
        while any(self.layout.grid_space):
            self.towards_coeff_space()

    def require_grid_space(self):
        while not all(self.layout.grid_space):
            self.towards_grid_space()

    def require_layout(self, layout):
        if isinstance(layout, str):
            layout = self.dist.grid_layout if layout == 'g' else self.dist.coeff_layout
        # Move to coeff as needed, then to grid as needed (monotone chain)
        gs_target = layout.grid_space
        # First, convert any axis that must become coeff
        while any(g and not t for g, t in zip(self.layout.grid_space, gs_target)):
            self.towards_coeff_space()
        while any((not g) and t for g, t in zip(self.layout.grid_space, gs_target)):
            self.towards_grid_space()

    def change_scales(self, scales):
        scales = self._canonical_scales(scales)
        if scales == self.scales:
            return
        self.require_coeff_space()
        self.scales = scales

    # --- user data access ---

    def __getitem__(self, key):
        if isinstance(key, tuple):
            space, scales = key
        else:
            space, scales = key, None
        if scales is not None:
            self.change_scales(scales)
        if space in ('g', 'grid'):
            self.require_grid_space()
        elif space in ('c', 'coeff'):
            self.require_coeff_space()
        else:
            raise KeyError(f"Unknown space: {space}")
        return self.data

    def __setitem__(self, key, value):
        if isinstance(key, tuple):
            space, scales = key
        else:
            space, scales = key, None
        if scales is not None:
            self.change_scales(scales)
        if space in ('g', 'grid'):
            layout = self.dist.grid_layout
        elif space in ('c', 'coeff'):
            layout = self.dist.coeff_layout
        else:
            raise KeyError(f"Unknown space: {space}")
        self.preset_data(layout, value)

    # --- randomized/filter utilities (parity: field.py:898-996) ---

    def fill_random(self, layout='g', seed=None, distribution='standard_normal', scale=None, **kw):
        """Fill with random data drawn from a chunked global stream: values are
        a deterministic function of (seed, global shape) alone — independent of
        the device mesh and producible shard-by-shard (parity: reference
        field.py:898-943 + tools/random_arrays.py ChunkedRandomArray)."""
        from ..utils.random_arrays import chunked_random_field
        if layout in ('g', 'grid'):
            target = self.dist.grid_layout
        else:
            target = self.dist.coeff_layout
        shape = self.required_shape(target, self.scales)
        if distribution == 'normal' and 'scale' not in kw and scale is not None:
            kw['scale'] = scale
            scale = None
        data = chunked_random_field(shape, seed, distribution, self.dtype, **kw)
        if scale is not None:
            data = data * scale
        self.preset_data(target, data)

    def low_pass_filter(self, shape=None, scales=None):
        """Zero coefficients above the given mode shape / scales."""
        self.require_coeff_space()
        if shape is None:
            shape = [int(s * b.coeff_size) if b is not None else 1
                     for s, b in zip(self._canonical_scales(scales), self.domain.bases)]
        data = np.array(self.data)
        for i, n in enumerate(shape):
            axis = len(self.tensorsig) + i
            sl = [slice(None)] * data.ndim
            sl[axis] = slice(n, None)
            data[tuple(sl)] = 0
        self.data = jnp.asarray(data)

    def high_pass_filter(self, shape=None, scales=None):
        self.require_coeff_space()
        if shape is None:
            shape = [int(s * b.coeff_size) if b is not None else 1
                     for s, b in zip(self._canonical_scales(scales), self.domain.bases)]
        data = np.array(self.data)
        for i, n in enumerate(shape):
            axis = len(self.tensorsig) + i
            sl = [slice(None)] * data.ndim
            sl[axis] = slice(0, n)
            data[tuple(sl)] = 0
        self.data = jnp.asarray(data)

    # --- reductions (serial; distributed versions ride psum in parallel module) ---

    def allreduce_data_norm(self, layout='c', order=2):
        data = self[layout]
        if order == np.inf:
            return float(jnp.max(jnp.abs(data)))
        return float(jnp.sum(jnp.abs(data) ** order) ** (1 / order))

    def allgather_data(self, layout=None):
        if layout is not None:
            self.require_layout(layout)
        return np.asarray(self.data)

    def broadcast_ghosts(self):
        """Replicate data along constant distributed dimensions (parity:
        field.py:876). Under GSPMD the compiler inserts the replication
        collectives when a constant-dimension field meets a distributed one,
        so this only needs to materialize the broadcast shape host-side."""
        return np.broadcast_to(np.asarray(self.data),
                               np.asarray(self.data).shape)

    # --- operand protocol ---

    @property
    def bases(self):
        return self.domain.bases

    def evaluate(self, memo=None):
        if memo is not None and id(self) in memo:
            return memo[id(self)]
        return self

    def reinitialize(self, **kw):
        return self

    @property
    def args(self):
        return []

    def has(self, *candidates):
        return any(self is c for c in candidates)

    def split_linear(self, vars):
        """Return (linear part terms dict, remainder) — a Field is linear in itself."""
        if self in vars:
            return {self: None}, None
        return {}, self

    def copy(self):
        out = Field(self.dist, bases=[b for b in self.domain.bases if b is not None],
                    name=self.name, dtype=self.dtype, tensorsig=self.tensorsig)
        out.scales = self.scales
        out.layout = self.layout
        out.data = self.data
        return out

    def __repr__(self):
        return f"Field(name={self.name!r}, bases={self.domain.bases})"

    def __str__(self):
        return self.name if self.name else repr(self)


ScalarField = Field


def VectorField(dist, coordsys, *args, **kw):
    """Module-level vector field factory (parity: field.py:990)."""
    return Field(dist, *args, tensorsig=(coordsys,), **kw)


def TensorField(dist, coordsys, *args, order=2, **kw):
    """Module-level tensor field factory (parity: field.py:995)."""
    if isinstance(coordsys, (tuple, list)):
        tensorsig = tuple(coordsys)
    else:
        tensorsig = (coordsys,) * order
    return Field(dist, *args, tensorsig=tensorsig, **kw)


class LockedField(Field):
    """Field locked to a particular layout (parity: field.py:1003)."""

    def lock_to_layouts(self, *layouts):
        self._locked_layouts = layouts

    def towards_coeff_space(self):
        raise RuntimeError("LockedField cannot change layout")

    def towards_grid_space(self):
        raise RuntimeError("LockedField cannot change layout")
