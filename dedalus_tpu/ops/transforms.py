"""
Device transform kernels.

The primary TPU path for every spectral transform is the matrix-multiply
transform (MMT): a single dense matmul along the transform axis, which maps
directly onto the MXU, supports float64 (via XLA emulation), and is the
reference's own ground-truth plan (dedalus/core/transforms.py:115 JacobiMMT,
:212 ComplexFourierMMT, :388 RealFourierMMT). FFT fast paths are used when the
dtype allows (f32/c64 on TPU; any dtype on CPU).

All functions are pure and jit-safe with static axis arguments.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fft64


def apply_matrix(matrix, data, axis):
    """Contract `matrix` (M, N) against `data` along `axis` (size N) -> size M."""
    # tensordot puts the output (matrix row) dimension first; move it back.
    out = jnp.tensordot(matrix, data, axes=[[1], [axis]])
    return jnp.moveaxis(out, 0, axis)


def apply_matrix_batched(matrices, data, axis, batch_axis):
    """
    Apply a stack of matrices (B, M, N) along `axis`, batched over `batch_axis`.
    Used for per-m / per-ell curvilinear transforms (batched on the MXU).
    """
    data_moved = jnp.moveaxis(data, (batch_axis, axis), (0, 1))
    out = jnp.einsum('bmn,bn...->bm...', matrices, data_moved)
    return jnp.moveaxis(out, (0, 1), (batch_axis, axis))


# ---------------------------------------------------------------------------
# FFT fast paths (complex/real Fourier), matching the reference's
# unit-amplitude normalization and coefficient orderings.
# ---------------------------------------------------------------------------

def complex_fft_forward(gdata, axis, M, Kmax):
    """Forward complex Fourier transform: grid -> ordered coeffs (k = 0..KM, -KM..-1)."""
    N = gdata.shape[axis]
    cdata = fft64.fft64(gdata, axis=axis) / N
    # Select retained modes: positive 0..Kmax, negative -Kmax..-1, zero-fill middle
    KM = (M - 1) // 2
    k_out = (jnp.arange(M) + KM) % M - KM  # ordered wavenumbers
    valid = jnp.abs(k_out) <= Kmax
    idx = jnp.where(k_out >= 0, k_out, N + k_out)
    out = jnp.take(cdata, jnp.clip(idx, 0, N - 1), axis=axis)
    shape = [1] * out.ndim
    shape[axis] = M
    return out * valid.reshape(shape)


def complex_fft_backward(cdata, axis, N, Kmax):
    """Backward complex Fourier transform: ordered coeffs -> grid."""
    M = cdata.shape[axis]
    KM = (M - 1) // 2
    k_out = (np.arange(M) + KM) % M - KM
    valid = np.abs(k_out) <= Kmax
    # Scatter coefficients into length-N standard FFT layout
    idx = np.where(k_out >= 0, k_out, N + k_out)
    full = jnp.zeros(cdata.shape[:axis] + (N,) + cdata.shape[axis+1:], dtype=cdata.dtype)
    shape = [1] * cdata.ndim
    shape[axis] = M
    src = cdata * jnp.asarray(valid).reshape(shape)
    full = full.at[tuple(slice(None) if d != (axis % cdata.ndim) else idx
                         for d in range(cdata.ndim))].add(src)
    return fft64.ifft64(full, axis=axis) * N


def real_fft_forward(gdata, axis, M, Kmax):
    """Forward real Fourier transform -> interleaved (cos, -sin) coefficients.

    Split-complex throughout (fft64.rfft64_split): no complex dtype is ever
    formed, so the path runs in f64 on TPU (which has no complex128).
    """
    N = gdata.shape[axis]
    cr, ci = fft64.rfft64_split(gdata, axis=axis)  # split, length N//2+1
    KM = (M - 1) // 2
    nk = KM + 1
    if cr.shape[axis] < nk:  # coarse grid (scale < 1): pad; Kmax masks them anyway
        cr = _resize_axis(cr, nk, axis)
        ci = _resize_axis(ci, nk, axis)
    sel = tuple(slice(None) if d != (axis % gdata.ndim) else slice(0, nk)
                for d in range(gdata.ndim))
    cr, ci = cr[sel], ci[sel]
    a = 2 * cr / N   # cos coefficients
    b = 2 * ci / N   # -sin coefficients: Re*cos + i*Im; f = sum c_k e^{ikx} + c.c.
    k = jnp.arange(nk)
    valid = (k <= Kmax)
    shape = [1] * gdata.ndim
    shape[axis] = nk
    validb = valid & (k > 0)
    a = a * valid.reshape(shape)
    a = jnp.where(jnp.reshape(k == 0, shape), cr / N, a)
    b = b * validb.reshape(shape)
    out = jnp.stack([a, b], axis=axis + 1)
    new_shape = list(gdata.shape)
    new_shape[axis] = 2 * nk
    out = out.reshape(tuple(gdata.shape[:axis]) + (2 * nk,) + tuple(gdata.shape[axis+1:]))
    # Truncate/pad to M (M = 2*(KM+1) normally)
    if 2 * nk != M:
        out = _resize_axis(out, M, axis)
    return out


def real_fft_backward(cdata, axis, N, Kmax):
    """Backward real Fourier transform from interleaved (cos, -sin) coefficients."""
    M = cdata.shape[axis]
    nk = M // 2
    shaped = cdata.reshape(tuple(cdata.shape[:axis]) + (nk, 2) + tuple(cdata.shape[axis+1:]))
    a = jnp.take(shaped, 0, axis=axis + 1)
    b = jnp.take(shaped, 1, axis=axis + 1)
    k = jnp.arange(nk)
    valid = (k <= Kmax)
    shape = [1] * a.ndim
    shape[axis] = nk
    a = a * valid.reshape(shape)
    b = b * (valid & (k > 0)).reshape(shape)
    # f = sum_k a_k cos - b_k sin = Re sum_k (a_k + i b_k) e^{ikx}; rfft
    # convention, kept split-complex (TPU has no complex128)
    k0 = jnp.reshape(k == 0, shape)
    scale = jnp.where(k0, float(N), N / 2)
    hr, hi = a * scale, b * scale
    nfreq = N // 2 + 1
    if nk < nfreq:
        pad = [(0, 0)] * hr.ndim
        pad[axis] = (0, nfreq - nk)
        hr, hi = jnp.pad(hr, pad), jnp.pad(hi, pad)
    elif nk > nfreq:
        sel = tuple(slice(None) if d != (axis % hr.ndim) else slice(0, nfreq)
                    for d in range(hr.ndim))
        hr, hi = hr[sel], hi[sel]
    return fft64.irfft64_split(hr, hi, N, axis=axis)


def _resize_axis(data, new_size, axis):
    """Zero-pad or truncate `data` to `new_size` along `axis`."""
    old = data.shape[axis]
    if new_size == old:
        return data
    if new_size < old:
        sel = tuple(slice(None) if d != (axis % data.ndim) else slice(0, new_size)
                    for d in range(data.ndim))
        return data[sel]
    pad = [(0, 0)] * data.ndim
    pad[axis] = (0, new_size - old)
    return jnp.pad(data, pad)


resize_axis = _resize_axis
