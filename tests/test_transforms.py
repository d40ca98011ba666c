"""
Transform round-trip and accuracy tests.

Mirrors the strategy of dedalus/tests/test_transforms.py: grid<->coeff
round-trips for every basis/dtype/scale, plus accuracy against closed-form
expansions and MMT-vs-FFT cross-validation.
"""

import numpy as np
import pytest

import dedalus_tpu.public as d3
from dedalus_tpu.ops import transforms as ops_transforms

N_RANGE = [16, 17, 32]
SCALE_RANGE = [1, 1.5]


def build_1d(basis_cls, N, dtype, dealias=1.5, bounds=(0, 2*np.pi)):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=dtype)
    if basis_cls in (d3.RealFourier, d3.ComplexFourier):
        b = basis_cls(c, size=N, bounds=bounds, dealias=dealias)
    else:
        b = basis_cls(c, size=N, bounds=(0, 1), dealias=dealias)
    return c, dist, b


@pytest.mark.parametrize("N", [16, 32])
@pytest.mark.parametrize("scale", SCALE_RANGE)
def test_real_fourier_roundtrip(N, scale):
    c, dist, b = build_1d(d3.RealFourier, N, np.float64)
    u = dist.Field(name='u', bases=b)
    u.change_scales(scale)
    rng = np.random.default_rng(0)
    ug = rng.standard_normal(u.required_shape(dist.grid_layout, u.scales))
    u['g'] = ug
    uc = np.array(u['c'])
    # k <= Kmax only: roundtrip from coefficients is exact
    u['c'] = uc
    assert np.allclose(np.array(u['g']), np.array(u['g']))
    u2c = np.array(u['c'])
    assert np.allclose(uc, u2c, atol=1e-13)


@pytest.mark.parametrize("N", [16, 32])
def test_real_fourier_accuracy(N):
    c, dist, b = build_1d(d3.RealFourier, N, np.float64, bounds=(0, 2*np.pi))
    u = dist.Field(name='u', bases=b)
    x = dist.local_grid(b, scale=1).ravel()
    u['g'] = 2 + 3*np.cos(2*x) + 5*np.sin(4*x)
    uc = np.array(u['c'])
    expect = np.zeros(N)
    expect[0] = 2        # a_0
    expect[2*2] = 3      # a_2 cos
    expect[2*4 + 1] = -5  # b_4 with f = -b sin -> b = -5
    assert np.allclose(uc, expect, atol=1e-12)
    # Back to grid
    assert np.allclose(np.array(u['g']), 2 + 3*np.cos(2*x) + 5*np.sin(4*x), atol=1e-12)


@pytest.mark.parametrize("N", [16, 32])
def test_complex_fourier_accuracy(N):
    c, dist, b = build_1d(d3.ComplexFourier, N, np.complex128)
    u = dist.Field(name='u', bases=b)
    x = dist.local_grid(b, scale=1).ravel()
    u['g'] = np.exp(3j*x) + 2*np.exp(-2j*x)
    uc = np.array(u['c'])
    expect = np.zeros(N, dtype=complex)
    expect[3] = 1
    expect[N-2] = 2
    assert np.allclose(uc, expect, atol=1e-12)
    assert np.allclose(np.array(u['g']), np.exp(3j*x) + 2*np.exp(-2j*x), atol=1e-12)


@pytest.mark.parametrize("basis_cls", [d3.ChebyshevT, d3.ChebyshevU, d3.Legendre])
@pytest.mark.parametrize("N", [16, 17])
@pytest.mark.parametrize("scale", SCALE_RANGE)
def test_jacobi_roundtrip(basis_cls, N, scale):
    c, dist, b = build_1d(basis_cls, N, np.float64)
    u = dist.Field(name='u', bases=b)
    u.change_scales(scale)
    x = dist.local_grid(b, scale=scale).ravel()
    u['g'] = np.exp(x) * np.sin(2*x)
    uc = np.array(u['c'])
    ug = np.array(u['g'])
    assert np.allclose(ug, np.exp(x) * np.sin(2*x), atol=1e-10)
    u['c'] = uc
    assert np.allclose(np.array(u['c']), uc, atol=1e-13)


def test_chebyshev_coefficients():
    # f = T_3(2x-1) on [0,1]: check single orthonormal coefficient
    c, dist, b = build_1d(d3.ChebyshevT, 16, np.float64)
    u = dist.Field(name='u', bases=b)
    x = dist.local_grid(b, scale=1).ravel()
    z = 2*x - 1
    u['g'] = 4*z**3 - 3*z
    uc = np.array(u['c'])
    assert abs(uc[3]) > 0.1
    assert np.allclose(np.delete(uc, 3), 0, atol=1e-12)


@pytest.mark.parametrize("scale", [1, 1.5])
def test_2d_roundtrip(scale):
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2*np.pi), dealias=1.5)
    zb = d3.ChebyshevT(coords['z'], size=12, bounds=(0, 1), dealias=1.5)
    u = dist.Field(name='u', bases=(xb, zb))
    u.change_scales(scale)
    x = dist.local_grid(xb, scale=scale)
    z = dist.local_grid(zb, scale=scale)
    f = np.cos(3*x) * z**2 + np.sin(x) * z
    u['g'] = f
    uc = np.array(u['c'])
    assert np.allclose(np.array(u['g']), f, atol=1e-12)
    u['c'] = uc
    assert np.allclose(np.array(u['c']), uc, atol=1e-13)


def test_vector_field_roundtrip():
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    xb = d3.RealFourier(coords['x'], size=16, bounds=(0, 2*np.pi))
    zb = d3.ChebyshevT(coords['z'], size=12, bounds=(0, 1))
    u = dist.VectorField(coords, name='u', bases=(xb, zb))
    x = dist.local_grid(xb, scale=1)
    z = dist.local_grid(zb, scale=1)
    data = np.zeros((2, 16, 12))
    data[0] = np.cos(x) * z
    data[1] = np.sin(2*x) * (1 - z**2)
    u['g'] = data
    uc = np.array(u['c'])
    assert np.allclose(np.array(u['g']), data, atol=1e-12)


def test_constant_field():
    coords = d3.CartesianCoordinates('x', 'z')
    dist = d3.Distributor(coords, dtype=np.float64)
    tau = dist.Field(name='tau')
    assert tau.data.shape == (1, 1)
    tau['g'] = 3.5
    assert np.allclose(np.array(tau['c'])[0, 0], 3.5)


def test_fft_matches_mmt_real():
    # FFT fast path must match the MMT ground truth (reference test_transforms.py:22-57)
    N, M = 24, 16
    rng = np.random.default_rng(1)
    g = rng.standard_normal((N,))
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    b = d3.RealFourier(c, size=M, bounds=(0, 2*np.pi))
    mmt_f = b.forward_matrix(N / M, np.float64) @ g
    fft_f = np.array(ops_transforms.real_fft_forward(g, 0, M, b.Kmax_for(N)))
    assert np.allclose(mmt_f, fft_f, atol=1e-12)
    cdata = rng.standard_normal((M,))
    mmt_b = b.backward_matrix(N / M, np.float64) @ cdata
    fft_b = np.array(ops_transforms.real_fft_backward(cdata, 0, N, b.Kmax_for(N)))
    assert np.allclose(mmt_b, fft_b, atol=1e-12)


def test_fft_matches_mmt_complex():
    N, M = 24, 16
    rng = np.random.default_rng(2)
    g = rng.standard_normal((N,)) + 1j * rng.standard_normal((N,))
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.complex128)
    b = d3.ComplexFourier(c, size=M, bounds=(0, 2*np.pi))
    mmt_f = b.forward_matrix(N / M, np.complex128) @ g
    fft_f = np.array(ops_transforms.complex_fft_forward(g, 0, M, b.Kmax_for(N)))
    assert np.allclose(mmt_f, fft_f, atol=1e-12)
    cdata = rng.standard_normal((M,)) + 1j * rng.standard_normal((M,))
    mmt_b = b.backward_matrix(N / M, np.complex128) @ cdata
    fft_b = np.array(ops_transforms.complex_fft_backward(cdata, 0, N, b.Kmax_for(N)))
    assert np.allclose(mmt_b, fft_b, atol=1e-12)
