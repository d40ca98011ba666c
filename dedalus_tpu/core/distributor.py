"""
Distributor: owns the coordinate->axis mapping, the layout descriptors, and
(optionally) a JAX device mesh for distributed execution.

Parity target (behavior): dedalus/core/distributor.py:36-517. TPU-first
redesign: layouts are immutable descriptors (grid/coeff per axis); in serial
execution data lives in single device arrays and transforms are jitted matmuls;
in distributed execution the parallel module lowers whole layout-move paths to
shard_map programs with `all_to_all` transposes over the mesh (ICI), replacing
the reference's MPI transposes (transposes.pyx).
"""

import numpy as np
import jax

from .coords import Coordinate, CoordinateSystem
from ..utils.caching import CachedMethod


class Layout:
    """Immutable data-distribution descriptor: which axes are in grid space."""

    __slots__ = ('grid_space',)

    def __init__(self, grid_space):
        self.grid_space = tuple(bool(g) for g in grid_space)

    def __eq__(self, other):
        return isinstance(other, Layout) and self.grid_space == other.grid_space

    def __hash__(self):
        return hash(self.grid_space)

    def __repr__(self):
        return f"Layout({''.join('g' if g else 'c' for g in self.grid_space)})"


class Distributor:
    """
    Assigns coordinates to axes, builds fields, and carries the (optional)
    device mesh used by the distributed execution path.
    """

    def __init__(self, coordsystems, dtype=np.float64, mesh=None, comm=None):
        if isinstance(coordsystems, (Coordinate, CoordinateSystem)):
            coordsystems = (coordsystems,)
        self.coordsystems = tuple(coordsystems)
        coords = []
        for cs in self.coordsystems:
            coords.extend(cs.coords)
        self.coords = tuple(coords)
        self.dim = len(self.coords)
        for axis, coord in enumerate(self.coords):
            coord.axis = axis
        self.dtype = np.dtype(dtype)
        self.mesh = mesh  # jax.sharding.Mesh or None (serial)
        self.coeff_layout = Layout((False,) * self.dim)
        self.grid_layout = Layout((True,) * self.dim)

    def get_axis(self, coord):
        return coord.axis

    def get_basis_axis(self, basis):
        return basis.coord.axis

    # --- field factories (parity: distributor.py:216-234) ---

    def Field(self, name=None, bases=None, dtype=None, **kw):
        from .field import Field
        return Field(self, bases=bases, name=name, dtype=dtype, **kw)

    def VectorField(self, coordsys, name=None, bases=None, dtype=None, **kw):
        from .field import Field
        return Field(self, bases=bases, name=name, dtype=dtype, tensorsig=(coordsys,), **kw)

    def TensorField(self, coordsys, name=None, bases=None, dtype=None, order=2, **kw):
        from .field import Field
        if isinstance(coordsys, tuple):
            tensorsig = coordsys
        else:
            tensorsig = (coordsys,) * order
        return Field(self, bases=bases, name=name, dtype=dtype, tensorsig=tensorsig, **kw)

    # --- grids ---

    def local_grid(self, basis, scale=None):
        """Global grid of a basis, reshaped for broadcasting over the full domain."""
        scale = scale if scale is not None else basis.dealias[0]
        axis = basis.coord.axis
        grid = np.asarray(basis.global_grid(scale))
        shape = [1] * self.dim
        shape[axis] = grid.size
        return grid.reshape(shape)

    def local_grids(self, *bases, scales=None):
        # Expand multi-axis facades (ball/annulus/sphere) into their sub-bases
        expanded = []
        for basis in bases:
            if hasattr(basis, 'sub_bases'):
                expanded.extend(basis.sub_bases)
            else:
                expanded.append(basis)
        out = []
        for basis in expanded:
            scale = None
            if scales is not None:
                scale = scales if np.isscalar(scales) else scales[basis.coord.axis]
            out.append(self.local_grid(basis, scale))
        return tuple(out)

    def local_modes(self, basis):
        """Wavenumbers/mode indices reshaped for broadcasting (coeff space)."""
        axis = basis.coord.axis
        k = np.asarray(basis.wavenumbers) if hasattr(basis, 'wavenumbers') else np.arange(basis.size)
        shape = [1] * self.dim
        shape[axis] = k.size
        return k.reshape(shape)

    @property
    def default_nonconst_groups(self):
        """Group index tuple selecting the first non-constant group per axis."""
        return (1,) * self.dim

    def __repr__(self):
        return f"Distributor(dim={self.dim}, dtype={self.dtype}, mesh={self.mesh})"
