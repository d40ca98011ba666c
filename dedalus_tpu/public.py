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
from .core import future  # installs the Field expression protocol
from .core.operators import (
    Differentiate, Gradient, Divergence, Laplacian, Curl, Skew, Trace,
    TransposeComponents, Interpolate, Integrate, Average, Lift, TimeDerivative,
    Component, Power, UnaryGridFunction, GeneralFunction,
    grad, div, curl, lap, skew, trace, transpose, integ, ave, interp, dt, lift,
)
from .core.arithmetic import Add, Multiply, DotProduct, CrossProduct
from .core.arithmetic import DotProduct as dot
from .core.arithmetic import CrossProduct as cross

# Chebyshev alias (dedalus exposes Chebyshev == ChebyshevT)
Chebyshev = ChebyshevT
