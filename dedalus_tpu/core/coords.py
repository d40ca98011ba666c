"""
Coordinates and coordinate systems.

Parity target (behavior): dedalus/core/coords.py:11-413. Round 1 implements
Cartesian systems; curvilinear systems (S2/Polar/Spherical) follow the same
interface and are added with their bases.
"""

import numpy as np


class CoordinateSystem:
    """
    Base class for coordinate systems (an ordered set of coordinates).

    Identity is by OBJECT, not by name: two sessions' PolarCoordinates('phi','r')
    are distinct systems. (Name-based equality let cached bases alias across
    distributors, leaving stale coordinate references.)
    """

    @property
    def first_axis(self):
        return self.coords[0].axis

    def check_bounds(self, coord, bounds):
        pass


class Coordinate(CoordinateSystem):
    """A single scalar coordinate."""

    dim = 1

    def __init__(self, name, cs=None):
        self.name = name
        self.names = (name,)
        self.cs = cs if cs is not None else self
        self.axis = None  # assigned by Distributor

    @property
    def coords(self):
        return (self,)

    def __repr__(self):
        return f"Coordinate('{self.name}')"

    def __str__(self):
        return self.name


class AzimuthalCoordinate(Coordinate):
    """Periodic azimuthal coordinate of a curvilinear system."""
    pass


class CurvilinearCoordinateSystem(CoordinateSystem):
    """Base for curvilinear systems with spin-component machinery."""


class S2Coordinates(CurvilinearCoordinateSystem):
    """
    Sphere-surface coordinates (azimuth, colatitude); spin ordering (-, +).
    Parity: dedalus/core/coords.py:199-250.
    """

    spin_ordering = (-1, +1)
    dim = 2

    def __init__(self, azimuth, colatitude):
        self.names = (azimuth, colatitude)
        self.azimuth = AzimuthalCoordinate(azimuth, cs=self)
        self.colatitude = Coordinate(colatitude, cs=self)
        self.coords = (self.azimuth, self.colatitude)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[self.names.index(key)]
        return self.coords[key]

    @classmethod
    def U_forward(cls, order=1):
        """Unitary coord->spin map: u_s = (u_theta + s*1j*u_phi)/sqrt(2)."""
        rows = [np.array([spin * 1j, 1]) / np.sqrt(2) for spin in cls.spin_ordering]
        U = np.array(rows)
        out = U
        for _ in range(order - 1):
            out = np.kron(out, U)
        return out

    @classmethod
    def U_backward(cls, order=1):
        return cls.U_forward(order).T.conj()

    def spintotal(self, tensorsig, comp_index):
        total = 0
        for cs, idx in zip(tensorsig, comp_index):
            if cs is self:
                total += self.spin_ordering[idx]
        return total

    def __repr__(self):
        return f"S2Coordinates{self.names}"


class PolarCoordinates(CurvilinearCoordinateSystem):
    """
    Polar coordinates (azimuth, radius); spin component ordering (-, +).
    Parity: dedalus/core/coords.py:255-310.
    """

    spin_ordering = (-1, +1)
    dim = 2

    def __init__(self, azimuth, radius):
        self.names = (azimuth, radius)
        self.azimuth = AzimuthalCoordinate(azimuth, cs=self)
        self.radius = Coordinate(radius, cs=self)
        self.coords = (self.azimuth, self.radius)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[self.names.index(key)]
        return self.coords[key]

    @classmethod
    def U_forward(cls, order=1):
        """Unitary coord->spin map: u_s = (u_r + s*1j*u_phi)/sqrt(2)."""
        rows = [np.array([spin * 1j, 1]) / np.sqrt(2) for spin in cls.spin_ordering]
        U = np.array(rows)
        out = U
        for _ in range(order - 1):
            out = np.kron(out, U)
        return out

    @classmethod
    def U_backward(cls, order=1):
        return cls.U_forward(order).T.conj()

    def spintotal(self, tensorsig, comp_index):
        """Total spin weight of a tensor component (sum over ranks in this
        cs, including ranks of DirectProducts embedding this cs)."""
        total = 0
        for cs, idx in zip(tensorsig, comp_index):
            if cs is self:
                total += self.spin_ordering[idx]
            elif isinstance(cs, DirectProduct) and self in cs.coordsystems:
                start = cs.subaxis_by_cs[self]
                if start <= idx < start + self.dim:
                    total += self.spin_ordering[idx - start]
        return total

    @staticmethod
    def cartesian(phi, r):
        return r * np.cos(phi), r * np.sin(phi)

    def __repr__(self):
        return f"PolarCoordinates{self.names}"


class SphericalCoordinates(CurvilinearCoordinateSystem):
    """
    Spherical coordinates (azimuth, colatitude, radius); component order
    (phi, theta, r) with spin ordering (-, +, 0).
    Parity: dedalus/core/coords.py:313-413 (SphericalCoordinates).
    """

    spin_ordering = (-1, +1, 0)
    # Regularity component ordering matches spin ordering (reference
    # spin_operators indexing=(-1,+1,0), regorder=[-1,1,0])
    reg_ordering = (-1, +1, 0)
    dim = 3
    # (phi, theta, r) is a LEFT-handed frame (ref coords.py:326)
    right_handed = False

    def __init__(self, azimuth, colatitude, radius):
        self.names = (azimuth, colatitude, radius)
        self.azimuth = AzimuthalCoordinate(azimuth, cs=self)
        self.colatitude = Coordinate(colatitude, cs=self)
        self.radius = Coordinate(radius, cs=self)
        self.coords = (self.azimuth, self.colatitude, self.radius)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[self.names.index(key)]
        return self.coords[key]

    @property
    def S2coordsys(self):
        """S2 view sharing this system's azimuth/colatitude coordinates
        (the tensorsig of AngularComponent outputs; ref coords.py:330)."""
        if not hasattr(self, '_S2coordsys'):
            s2 = S2Coordinates.__new__(S2Coordinates)
            s2.names = self.names[:2]
            s2.azimuth = self.azimuth
            s2.colatitude = self.colatitude
            s2.coords = (self.azimuth, self.colatitude)
            self._S2coordsys = s2
        return self._S2coordsys

    @classmethod
    def U_forward(cls, order=1):
        """Unitary coord->spin map: u_s = (u_theta + s*1j*u_phi)/sqrt(2) for
        s = +-1; u_0 = u_r."""
        U = np.zeros((3, 3), dtype=complex)
        for row, spin in enumerate(cls.spin_ordering):
            if spin == 0:
                U[row, 2] = 1
            else:
                U[row, 0] = spin * 1j / np.sqrt(2)
                U[row, 1] = 1 / np.sqrt(2)
        out = U
        for _ in range(order - 1):
            out = np.kron(out, U)
        return out

    @classmethod
    def U_backward(cls, order=1):
        return cls.U_forward(order).T.conj()

    def spintotal(self, tensorsig, comp_index):
        total = 0
        s2 = getattr(self, '_S2coordsys', None)
        for cs, idx in zip(tensorsig, comp_index):
            if cs is self:
                total += self.spin_ordering[idx]
            elif s2 is not None and cs is s2:
                # Angular (S2) tensor ranks over this spherical system
                total += cs.spin_ordering[idx]
        return total

    def regtotal(self, tensorsig, comp_index):
        total = 0
        for cs, idx in zip(tensorsig, comp_index):
            if cs is self:
                total += self.reg_ordering[idx]
        return total

    @staticmethod
    def cartesian(phi, theta, r):
        x = r * np.sin(theta) * np.cos(phi)
        y = r * np.sin(theta) * np.sin(phi)
        z = r * np.cos(theta)
        return x, y, z

    def __repr__(self):
        return f"SphericalCoordinates{self.names}"


class DirectProduct(CoordinateSystem):
    """
    Direct product of coordinate systems (e.g. Coordinate('z') x
    PolarCoordinates -> periodic cylinder). Parity: reference
    dedalus/core/coords.py:99 DirectProduct (separable intertwiners only:
    Coordinate / Cartesian / Polar subsystems).

    Tensor components over the product are ordered by subsystem: for
    DirectProduct(z, polar) a vector has components (z, phi, r), and the
    spin structure of the polar block passes through unchanged (the
    intertwiner is block-diagonal over subsystems).
    """

    def __init__(self, *coordsystems, right_handed=None):
        for cs in coordsystems:
            if isinstance(cs, (S2Coordinates, SphericalCoordinates)):
                raise NotImplementedError(
                    "DirectProduct only supports separable intertwiners "
                    "(Coordinate / Cartesian / Polar subsystems)")
        self.coordsystems = tuple(coordsystems)
        self.coords = sum((tuple(cs.coords) for cs in coordsystems), ())
        self.names = tuple(c.name for c in self.coords)
        if len(set(self.names)) < len(self.names):
            raise ValueError("Cannot repeat coordinates in DirectProduct")
        self.dim = sum(cs.dim for cs in coordsystems)
        if right_handed is None:
            # Reference convention: curvilinear products (e.g. z x polar with
            # component order (z, phi, r)) are left-handed
            right_handed = not any(isinstance(cs, PolarCoordinates)
                                   for cs in coordsystems)
        self.right_handed = right_handed

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[self.names.index(key)]
        return self.coords[key]

    @property
    def subaxis_by_cs(self):
        out = {}
        subaxis = 0
        for cs in self.coordsystems:
            out[cs] = subaxis
            subaxis += cs.dim
        return out

    def sub_slice(self, cs):
        """Component index range of a subsystem within this product."""
        start = self.subaxis_by_cs[cs]
        return slice(start, start + cs.dim)

    def spintotal(self, tensorsig, comp_index):
        """Total spin over ranks in this product: each curvilinear subsystem
        contributes the spin of its local component."""
        total = 0
        for cs, idx in zip(tensorsig, comp_index):
            if cs is self:
                for sub, start in self.subaxis_by_cs.items():
                    if start <= idx < start + sub.dim and hasattr(sub, 'spin_ordering'):
                        total += sub.spin_ordering[idx - start]
        return total

    def unit_vector_fields(self, dist):
        """Constant unit vectors for the straight (non-curvilinear) axes;
        curvilinear axes have position-dependent unit vectors and are skipped
        (build them as fields on the curvilinear basis instead)."""
        fields = []
        for i, coord in enumerate(self.coords):
            if isinstance(coord.cs, (PolarCoordinates,)):
                fields.append(None)
                continue
            ei = dist.VectorField(self, name=f"e{coord.name}")
            data = np.zeros(ei.data.shape)
            data[i] = 1
            ei.preset_data(ei.layout, data)
            fields.append(ei)
        return tuple(fields)

    def __repr__(self):
        return f"DirectProduct{tuple(map(repr, self.coordsystems))}"


class CartesianCoordinates(CoordinateSystem):
    """An ordered set of independent Cartesian coordinates."""

    def __init__(self, *names):
        self.names = tuple(names)
        self.dim = len(names)
        self.coords = tuple(Coordinate(name, cs=self) for name in names)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[self.names.index(key)]
        return self.coords[key]

    def __iter__(self):
        return iter(self.coords)

    def __repr__(self):
        return f"CartesianCoordinates{self.names}"

    def unit_vector_fields(self, dist):
        """Constant unit vector fields along each coordinate."""
        fields = []
        for i, name in enumerate(self.names):
            ei = dist.VectorField(self, name=f"e{name}")
            data = np.zeros(ei.data.shape)
            data[i] = 1
            ei.preset_data(ei.layout, data)
            fields.append(ei)
        return tuple(fields)
