"""
Domain: the direct product of bases a field or operand lives on.

Parity target (behavior): dedalus/core/domain.py:17-227.
"""

import numpy as np

from ..utils.caching import CachedAttribute


class Domain:
    """Direct product of bases over the distributor's axes."""

    _cache = {}

    def __new__(cls, dist, bases):
        bases = cls._canonical_bases(dist, bases)
        key = (id(dist), bases)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        self.dist = dist
        self.bases = bases  # tuple of length dist.dim: basis or None per axis
        cls._cache[key] = self
        return self

    @staticmethod
    def _canonical_bases(dist, bases):
        if bases is None:
            bases = ()
        if not isinstance(bases, (tuple, list)):
            bases = (bases,)
        full = [None] * dist.dim
        expanded = []
        for basis in bases:
            if basis is None:
                continue
            if hasattr(basis, 'sub_bases'):
                expanded.extend(basis.sub_bases)  # multi-axis bases (annulus, ...)
            else:
                expanded.append(basis)
        for basis in expanded:
            axis = basis.coord.axis
            if full[axis] is not None and full[axis] != basis:
                raise ValueError(f"Multiple bases along axis {axis}")
            full[axis] = basis
        return tuple(full)

    @property
    def full_bases(self):
        return self.bases

    @CachedAttribute
    def nonconstant(self):
        return tuple(b is not None for b in self.bases)

    @CachedAttribute
    def constant(self):
        return tuple(b is None for b in self.bases)

    @CachedAttribute
    def dealias(self):
        return tuple(b.dealias[0] if b is not None else 1 for b in self.bases)

    @CachedAttribute
    def coeff_shape(self):
        return tuple(b.coeff_size if b is not None else 1 for b in self.bases)

    def grid_shape(self, scales):
        shape = []
        for i, b in enumerate(self.bases):
            if b is None:
                shape.append(1)
            else:
                s = scales if np.isscalar(scales) else scales[i]
                shape.append(b.grid_size(s))
        return tuple(shape)

    @CachedAttribute
    def group_shape(self):
        """Coefficient group sizes per axis (e.g. 2 for RealFourier pairs)."""
        return tuple(b.group_shape[0] if b is not None else 1 for b in self.bases)

    def get_basis(self, coord):
        from .coords import Coordinate
        if isinstance(coord, Coordinate):
            return self.bases[coord.axis]
        # CoordinateSystem: return basis of its first coordinate
        return self.bases[coord.coords[0].axis]

    def substitute_basis(self, old_basis, new_basis):
        bases = list(self.bases)
        for i, b in enumerate(bases):
            if b == old_basis:
                bases[i] = new_basis
        return Domain(self.dist, tuple(bases))

    @property
    def dim(self):
        return sum(1 for b in self.bases if b is not None)

    def __repr__(self):
        return f"Domain({self.bases})"
