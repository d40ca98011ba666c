"""
Public API, star-importable as `import dedalus_tpu.public as d3`.

Parity target: dedalus/public.py:1-17.
"""

from .core.coords import Coordinate, CartesianCoordinates, PolarCoordinates, S2Coordinates, SphericalCoordinates, DirectProduct
from .core.distributor import Distributor
from .core.domain import Domain
from .core.basis import (
    Jacobi, ChebyshevT, ChebyshevU, ChebyshevV, Legendre, Ultraspherical,
    RealFourier, ComplexFourier, Fourier,
)
from .core.field import (
    Field, LockedField, ScalarField, VectorField, TensorField,
)
from .core.basis_polar import AnnulusBasis, DiskBasis
from .core.basis_sphere import SphereBasis
from .core.basis_ball import BallBasis, ShellBasis
from .core.operators_sphere import MulCosine
from .core import future  # installs the Field expression protocol
from .core.operators import (
    Differentiate, Gradient, Divergence, Laplacian, Curl, Skew, Trace,
    TransposeComponents, Interpolate, Integrate, Average, Lift, TimeDerivative,
    Component, Power, UnaryGridFunction, GeneralFunction,
    RadialComponent, AngularComponent, AzimuthalComponent, AdvectiveCFL,
    Grid, Coeff, HilbertTransform,
    grad, div, curl, lap, skew, trace, transpose, integ, ave, interp, dt, lift,
    radial, angular, azimuthal,
    convert as Convert,
)
from .core.operators_ball import SphericalEllProduct
from .extras import quick_domains
trans = TransposeComponents
LiftTau = Lift    # deprecated reference alias (ref operators.py Lift)
from .core.arithmetic import Add, Multiply, DotProduct, CrossProduct
from .core.arithmetic import DotProduct as dot
from .core.arithmetic import CrossProduct as cross

from .core.problems import IVP, LBVP, NLBVP, EVP, InitialValueProblem, \
    LinearBoundaryValueProblem, NonlinearBoundaryValueProblem, EigenvalueProblem
from .core.timesteppers import (
    schemes as timestepper_schemes,
    CNAB1, SBDF1, CNAB2, MCNAB2, SBDF2, CNLF2, SBDF3, SBDF4,
    RK111, RK222, RK443, RKSMR, RKGFY,
)
from .core.solvers import (
    InitialValueSolver, LinearBoundaryValueSolver,
    NonlinearBoundaryValueSolver, EigenvalueSolver,
)
from .core.evaluator import Evaluator
from .extras.flow_tools import CFL, GlobalFlowProperty, GlobalArrayReducer

# Chebyshev alias (dedalus exposes Chebyshev == ChebyshevT)
Chebyshev = ChebyshevT
