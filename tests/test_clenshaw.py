"""
Clenshaw evaluation kernels (parity: reference dedalus/tests/test_clenshaw.py,
tools/clenshaw.py:24 matrix_clenshaw / :67 jacobi_recursion).

Checks scalar Clenshaw sums against direct polynomial synthesis, and matrix
Clenshaw (NCC multiplication matrices) against pointwise products projected
back to coefficient space.
"""

import numpy as np
import pytest

from dedalus_tpu.spectral import jacobi as jacobi_lib
from dedalus_tpu.spectral import clenshaw as clenshaw_lib


@pytest.mark.parametrize('a, b', [(-0.5, -0.5), (0, 0), (0.5, 0.5), (-0.5, 1.5)])
@pytest.mark.parametrize('N', [8, 17])
def test_scalar_clenshaw(a, b, N):
    rng = np.random.default_rng(7)
    coeffs = rng.normal(size=N)
    z = np.linspace(-1, 1, 31)
    direct = (jacobi_lib.polynomials(N, a, b, z) .T @ coeffs)
    via = clenshaw_lib.scalar_clenshaw(coeffs, a, b, z)
    assert np.allclose(via, direct, atol=1e-12)


@pytest.mark.parametrize('a, b', [(-0.5, -0.5), (0, 0)])
@pytest.mark.parametrize('Nf', [6, 12])
def test_matrix_clenshaw_multiplication(a, b, Nf):
    """matrix_clenshaw(coeffs, J) must reproduce multiplication: for
    f = sum f_p P_p, the matrix M satisfies (f*g)_coeffs = M @ g_coeffs
    up to truncation."""
    N = 48
    rng = np.random.default_rng(3)
    fc = np.zeros(N)
    fc[:Nf] = rng.normal(size=Nf)
    # Jacobi operator matrix (multiplication by z in the (a,b) family)
    J = jacobi_lib.jacobi_matrix(N, a, b)
    M = clenshaw_lib.matrix_clenshaw(fc, a, b, J, cutoff=0)
    M = np.asarray(M.todense())[:N, :N]
    # Pointwise check on quadrature grid
    z, w = jacobi_lib.quadrature(N, a, b)
    P = jacobi_lib.polynomials(N, a, b, z)     # (N, Ngrid)
    gvals = np.cos(2 * z) * (1 + z)
    gc = P @ (w * gvals)                       # forward projection
    f_of_z = P.T @ fc
    prod_exact = f_of_z * (P.T @ gc)
    prod_via_M = P.T @ (M @ gc)
    # Interior rows are exact; the last ~Nf rows have truncation error
    keep = N - Nf - 1
    resid = np.abs(P[:keep] @ (w * (prod_via_M - prod_exact))).max()
    assert resid < 1e-10


def test_matrix_clenshaw_identity():
    """Multiplication by the constant 1 is the identity."""
    N = 16
    a = b = -0.5
    fc = np.zeros(N)
    # First polynomial is constant: set coefficient so that f(z) = 1
    z0 = np.array([0.3])
    p0 = jacobi_lib.polynomials(1, a, b, z0)[0, 0]
    fc[0] = 1.0 / p0
    J = jacobi_lib.jacobi_matrix(N, a, b)
    M = np.asarray(clenshaw_lib.matrix_clenshaw(fc, a, b, J, cutoff=0).todense())
    assert np.allclose(M[:N, :N], np.eye(N), atol=1e-12)


def test_clenshaw_cutoff_sparsifies():
    """The cutoff drops negligible coefficients (keeps bandedness)."""
    N = 32
    a = b = -0.5
    fc = np.zeros(N)
    fc[0] = 1.0
    fc[1] = 1e-3
    fc[20] = 1e-15    # below cutoff: must not widen the band
    J = jacobi_lib.jacobi_matrix(N, a, b)
    M = clenshaw_lib.matrix_clenshaw(fc, a, b, J, cutoff=1e-10)
    M = np.asarray(M.todense())[:N, :N]
    # Bandwidth must be ~1 (from the linear term), not 20
    nz = np.nonzero(M)
    assert np.abs(nz[0] - nz[1]).max() <= 2
