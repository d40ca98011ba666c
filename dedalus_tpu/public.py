"""
Public API, star-importable as `import dedalus_tpu.public as d3`.

Parity target: dedalus/public.py:1-17.
"""

from .core.coords import Coordinate, CartesianCoordinates
from .core.distributor import Distributor
from .core.domain import Domain
from .core.basis import (
    Jacobi, ChebyshevT, ChebyshevU, ChebyshevV, Legendre, Ultraspherical,
    RealFourier, ComplexFourier,
)
from .core.field import Field, LockedField

# Chebyshev alias (dedalus exposes Chebyshev == ChebyshevT)
Chebyshev = ChebyshevT
