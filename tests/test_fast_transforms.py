"""
Fast (mixed-radix matmul FFT/DCT) transform plans cross-validated against the
MMT ground-truth plans, mirroring the reference's fast-vs-matrix library
cross-checks (dedalus/tests/test_transforms.py:22-57) across bases, dtypes,
sizes, and dealiasing scales.

Tolerances: forward plans agree with MMT at ~1e-13. Backward Chebyshev plans
use exact angles theta_j while MMT evaluates polynomials at f64-rounded grid
points; the two legitimately differ by O(M^2 eps) near endpoints (scipy's DCT
shows the identical deviation from the MMT matrix), so backward comparisons
scale the tolerance with M^2 and roundtrips are checked tightly instead.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dedalus_tpu.core import basis as B
from dedalus_tpu.core.coords import Coordinate
from dedalus_tpu.ops import transforms as T
from dedalus_tpu.ops import fft64


def relerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-300)


def coord():
    c = Coordinate('x')
    c.axis = 0
    return c


SIZES = [32, 64, 100, 128, 256]
SCALES = [1, 1.5, 0.75, 2 / 3]


# ---------------------------------------------------------------------------
# fft64 primitives vs numpy/scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('N', [16, 33, 97, 100, 512, 2048])
def test_fft64_complex(N):
    rng = np.random.default_rng(N)
    x = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    assert relerr(fft64.fft64(x), np.fft.fft(x)) < 1e-13
    assert relerr(fft64.ifft64(x), np.fft.ifft(x)) < 1e-13


@pytest.mark.parametrize('N', [16, 33, 97, 100, 512, 2048])
def test_fft64_real(N):
    rng = np.random.default_rng(N)
    x = rng.standard_normal(N)
    assert relerr(fft64.rfft64(x), np.fft.rfft(x)) < 1e-13
    assert relerr(fft64.irfft64(np.fft.rfft(x), N), x) < 1e-13


@pytest.mark.parametrize('N', [16, 33, 100, 512, 2048])
def test_fft64_dct(N):
    scipy_fft = pytest.importorskip('scipy.fft')
    rng = np.random.default_rng(N)
    x = rng.standard_normal(N)
    assert relerr(fft64.dct2_64(x), scipy_fft.dct(x, type=2)) < 1e-13
    assert relerr(fft64.dct3_64(x), scipy_fft.dct(x, type=3)) < 2e-13


def test_fft64_axis_batched():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64, 3))
    assert relerr(fft64.fft64(x + 0j, axis=1), np.fft.fft(x, axis=1)) < 1e-13
    assert relerr(fft64.rfft64(x, axis=0), np.fft.rfft(x, axis=0)) < 1e-13
    assert relerr(fft64.dct2_64(x, axis=2),
                  __import__('scipy.fft', fromlist=['dct']).dct(x, type=2, axis=2)) < 1e-13


def test_blocked_upper_solve():
    import scipy.sparse as sp
    rng = np.random.default_rng(1)
    M = 200
    U = sp.diags([np.full(M, 2.0), 0.3 * rng.standard_normal(M - 2),
                  0.1 * rng.standard_normal(M - 4)], [0, 2, 4], format='csr')
    data = fft64.build_blocked_upper_solve(U, nb=32)
    b = rng.standard_normal((4, M))
    x = fft64.blocked_upper_solve(data, b, axis=-1)
    assert relerr(x, sp.linalg.spsolve(sp.csc_matrix(U), b.T).T) < 1e-12


# ---------------------------------------------------------------------------
# Jacobi (Chebyshev-grid) fast plans vs MMT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('maker', [B.ChebyshevT, B.ChebyshevU, B.ChebyshevV])
@pytest.mark.parametrize('M', SIZES)
@pytest.mark.parametrize('scale', SCALES)
@pytest.mark.parametrize('dtype', [np.float64, np.complex128])
def test_fast_chebyshev_vs_mmt(maker, M, scale, dtype):
    rng = np.random.default_rng(M)
    basis = maker(coord(), M, (-1, 3))
    assert basis._fast_da is not None
    N = basis.grid_size(scale)
    g = rng.standard_normal(N).astype(np.float64)
    if np.dtype(dtype).kind == 'c':
        g = g + 1j * rng.standard_normal(N)
    mmt_f = np.asarray(basis.forward_matrix(scale, dtype)) @ g
    fast_f = basis._fast_forward(jnp.asarray(g), 0, N, dtype)
    assert relerr(fast_f, mmt_f) < 1e-13
    c = rng.standard_normal(M) + (1j * rng.standard_normal(M)
                                  if np.dtype(dtype).kind == 'c' else 0)
    mmt_b = np.asarray(basis.backward_matrix(scale, dtype)) @ c
    fast_b = basis._fast_backward(jnp.asarray(c), 0, N, dtype)
    # Endpoint sensitivity of high modes to grid rounding: O(M^2 eps)
    assert relerr(fast_b, mmt_b) < max(1e-13, 100 * M**2 * 1e-16)


@pytest.mark.parametrize('maker', [B.ChebyshevT, B.ChebyshevU])
@pytest.mark.parametrize('M', [64, 256])
def test_fast_chebyshev_roundtrip(maker, M):
    """backward then forward at matched sizes recovers coefficients tightly."""
    rng = np.random.default_rng(M)
    basis = maker(coord(), M, (-1, 1))
    c = rng.standard_normal(M)
    g = basis._fast_backward(jnp.asarray(c), 0, M, np.float64)
    c2 = basis._fast_forward(g, 0, M, np.float64)
    assert relerr(c2, c) < 1e-13


def test_fast_path_dispatches():
    """forward_transform takes the fast plan above the threshold and MMT below.
    (Default threshold is 8192: measured on TPU, the dense MMT rides the MXU
    and beats the four-step matmul FFT below that; the relative dispatch
    behavior around the configured threshold is what's pinned here.)"""
    from dedalus_tpu.core.basis import FAST_THRESHOLD
    big = B.ChebyshevT(coord(), 2 * FAST_THRESHOLD, (-1, 1))
    small = B.ChebyshevT(coord(), 16, (-1, 1))
    assert big._use_fast(2 * FAST_THRESHOLD)
    assert not small._use_fast(16)
    legendre = B.Legendre(coord(), 128, (-1, 1))
    assert legendre._fast_da is None  # non-Chebyshev grid: MMT only


def test_fast_legendre_falls_back():
    rng = np.random.default_rng(5)
    basis = B.Legendre(coord(), 128, (-1, 1))
    g = rng.standard_normal(128)
    out = basis.forward_transform(jnp.asarray(g), 0, 1, np.float64)
    mmt = np.asarray(basis.forward_matrix(1, np.float64)) @ g
    assert relerr(out, mmt) < 1e-14


# ---------------------------------------------------------------------------
# Fourier fast plans vs MMT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('M', SIZES)
@pytest.mark.parametrize('scale', SCALES)
def test_fast_complex_fourier_vs_mmt(M, scale):
    rng = np.random.default_rng(M)
    basis = B.ComplexFourier(coord(), M, (0, 2.7))
    N = basis.grid_size(scale)
    g = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    mmt_f = np.asarray(basis.forward_matrix(scale, np.complex128)) @ g
    fast_f = T.complex_fft_forward(jnp.asarray(g), 0, M, basis.Kmax_for(N))
    assert relerr(fast_f, mmt_f) < 1e-13
    c = rng.standard_normal(M) + 1j * rng.standard_normal(M)
    mmt_b = np.asarray(basis.backward_matrix(scale, np.complex128)) @ c
    fast_b = T.complex_fft_backward(jnp.asarray(c), 0, N, basis.Kmax_for(N))
    assert relerr(fast_b, mmt_b) < 1e-13


@pytest.mark.parametrize('M', SIZES)
@pytest.mark.parametrize('scale', SCALES)
def test_fast_real_fourier_vs_mmt(M, scale):
    rng = np.random.default_rng(M)
    basis = B.RealFourier(coord(), M, (0, 2.7))
    N = basis.grid_size(scale)
    g = rng.standard_normal(N)
    mmt_f = np.asarray(basis.forward_matrix(scale, np.float64)) @ g
    fast_f = T.real_fft_forward(jnp.asarray(g), 0, M, basis.Kmax_for(N))
    assert relerr(fast_f, mmt_f) < 1e-13
    c = rng.standard_normal(M)
    mmt_b = np.asarray(basis.backward_matrix(scale, np.float64)) @ c
    fast_b = T.real_fft_backward(jnp.asarray(c), 0, N, basis.Kmax_for(N))
    assert relerr(fast_b, mmt_b) < 1e-13


@pytest.mark.parametrize('maker', [B.RealFourier, B.ComplexFourier])
def test_fast_fourier_field_roundtrip(maker):
    """Field-level transforms at fast-path sizes: grid -> coeff -> grid."""
    import dedalus_tpu.public as d3
    dtype = np.float64 if maker is B.RealFourier else np.complex128
    xcoord = d3.Coordinate('x')
    dist = d3.Distributor(xcoord, dtype=dtype)
    xbasis = maker(xcoord, 128, (0, 2 * np.pi), dealias=3 / 2)
    f = dist.Field(bases=xbasis)
    x = dist.local_grid(xbasis, scale=1)
    data = np.cos(3 * x) + 0.5 * np.sin(7 * x)
    f['g'] = data.astype(dtype)
    f.require_coeff_space()
    f.require_grid_space()
    assert relerr(f['g'], data) < 1e-13
