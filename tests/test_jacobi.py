"""Jacobi polynomial / quadrature / operator-matrix unit tests.

Mirrors the verification style of the reference's dedalus_sphere tests:
orthonormality, quadrature exactness, and operator matrices checked against
pointwise evaluations.
"""

import numpy as np
import pytest
from scipy import special as ssp

from dedalus_tpu.spectral import jacobi, clenshaw

AB_CASES = [(-0.5, -0.5), (0, 0), (0.5, 0.5), (-0.5, 0.5), (0, 1), (2, 1), (1.5, 2.5)]


@pytest.mark.parametrize("a,b", AB_CASES)
@pytest.mark.parametrize("n", [4, 16, 64])
def test_quadrature_vs_scipy(n, a, b):
    z, w = jacobi.quadrature(n, a, b)
    zs, ws = ssp.roots_jacobi(n, a, b)
    assert np.allclose(z, zs, atol=1e-13)
    assert np.allclose(w, ws, atol=1e-13)


@pytest.mark.parametrize("a,b", AB_CASES)
def test_orthonormality(a, b, n=32):
    z, w = jacobi.quadrature(n, a, b)
    P = jacobi.polynomials(n, a, b, z)
    G = (P * w) @ P.T
    assert np.allclose(G, np.eye(n), atol=1e-12)


@pytest.mark.parametrize("a,b", [(-0.5, -0.5), (0, 0), (1, 1)])
def test_quadrature_exactness(a, b, n=12):
    # Integrate monomials exactly up to degree 2n-1
    z, w = jacobi.quadrature(n, a, b)
    for k in range(2 * n - 1):
        approx = np.sum(w * z**k)
        exact, _ = _weighted_monomial_integral(k, a, b)
        assert abs(approx - exact) < 1e-12 * max(1, abs(exact))


def _weighted_monomial_integral(k, a, b):
    from scipy.integrate import quad
    # weight='alg' integrates f(x) * (x-lo)^wvar[0] * (hi-x)^wvar[1] exactly at endpoints
    val, err = quad(lambda x: x**k, -1, 1, weight='alg', wvar=(b, a))
    return val, err


@pytest.mark.parametrize("a,b", [(-0.5, -0.5), (0, 0), (1.5, 0.5)])
def test_conversion(a, b, N=24):
    # Convert coefficients (a,b) -> (a+1,b+2) and compare pointwise values
    rng = np.random.default_rng(0)
    c0 = rng.standard_normal(N)
    C = jacobi.conversion_matrix(N, a, b, a+1, b+2).toarray()
    c1 = C @ c0
    z = np.linspace(-0.9, 0.9, 17)
    f0 = jacobi.polynomials(N, a, b, z).T @ c0
    f1 = jacobi.polynomials(N, a+1, b+2, z).T @ c1
    assert np.allclose(f0, f1, atol=1e-12)


@pytest.mark.parametrize("a,b", [(-0.5, -0.5), (0, 0), (1, 2)])
def test_differentiation(a, b, N=24):
    rng = np.random.default_rng(1)
    c0 = rng.standard_normal(N)
    D = jacobi.differentiation_matrix(N, a, b).toarray()
    c1 = D @ c0
    z = np.linspace(-0.9, 0.9, 11)
    h = 1e-6
    f_plus = jacobi.polynomials(N, a, b, z + h).T @ c0
    f_minus = jacobi.polynomials(N, a, b, z - h).T @ c0
    df_fd = (f_plus - f_minus) / (2 * h)
    df = jacobi.polynomials(N, a+1, b+1, z).T @ c1
    assert np.allclose(df, df_fd, atol=1e-4 * np.abs(c0).sum())


@pytest.mark.parametrize("a,b", [(-0.5, -0.5), (0, 0)])
def test_jacobi_matrix(a, b, N=20):
    rng = np.random.default_rng(2)
    c0 = rng.standard_normal(N)
    c0[-2:] = 0  # Avoid truncation of top mode under multiplication by z
    J = jacobi.jacobi_matrix(N, a, b).toarray()
    c1 = J @ c0
    z, _ = jacobi.quadrature(N, a, b)
    f0 = jacobi.polynomials(N, a, b, z).T @ c0
    f1 = jacobi.polynomials(N, a, b, z).T @ c1
    assert np.allclose(f1, z * f0, atol=1e-12)


def test_integration_vector(N=16):
    # integral of T_0 = 2; integral over [-1,1] of a poly
    a = b = -0.5
    rng = np.random.default_rng(3)
    c0 = rng.standard_normal(N)
    I = jacobi.integration_vector(N, a, b)
    approx = I @ c0
    from scipy.integrate import quad
    f = lambda x: jacobi.polynomials(N, a, b, np.array([x])).T[0] @ c0
    exact, _ = quad(f, -1, 1, limit=200)
    assert abs(approx - exact) < 1e-10


def test_interpolation_vector(N=16):
    a, b = 0, 0
    rng = np.random.default_rng(4)
    c0 = rng.standard_normal(N)
    E = jacobi.interpolation_vector(N, a, b, 0.37)
    f = jacobi.polynomials(N, a, b, np.array([0.37])).T[0] @ c0
    assert abs(E @ c0 - f) < 1e-13


@pytest.mark.parametrize("a,b", [(-0.5, -0.5), (0, 0)])
def test_matrix_clenshaw_multiplication(a, b, N=32):
    # Multiplication by f(z) via Clenshaw vs pointwise product
    rng = np.random.default_rng(5)
    fc = np.zeros(N)
    fc[:6] = rng.standard_normal(6)      # low-degree NCC
    uc = np.zeros(N)
    uc[:N//2] = rng.standard_normal(N//2)  # operand with headroom (no truncation)
    J = jacobi.jacobi_matrix(N, a, b)
    S = clenshaw.matrix_clenshaw(fc, a, b, J, cutoff=0).toarray()
    prod_c = S @ uc
    z, _ = jacobi.quadrature(N, a, b)
    P = jacobi.polynomials(N, a, b, z)
    f = P.T @ fc
    u = P.T @ uc
    prod_g = P.T @ prod_c
    assert np.allclose(prod_g, f * u, atol=1e-11)


def test_scalar_clenshaw(N=20):
    a, b = 0.5, -0.5
    rng = np.random.default_rng(6)
    c = rng.standard_normal(N)
    z = 0.3
    direct = jacobi.polynomials(N, a, b, np.array([z])).T[0] @ c
    cl = clenshaw.scalar_clenshaw(c, a, b, z)
    assert abs(direct - cl) < 1e-12
