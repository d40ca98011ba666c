"""
Spectral bases: interval (Jacobi family) and periodic (Fourier) bases, each
bundling grids, transform plans, and sparse operator matrix builders.

Parity targets (behavior): dedalus/core/basis.py:46 (AffineCOV), :435 (Jacobi),
:636-661 (Legendre/Ultraspherical/Chebyshev), :951 (RealFourier), :1108
(ComplexFourier), with per-basis operators at :664-816,:999-1306. Fresh
TPU-first implementation: all transforms are MMT matmuls on device (with FFT
fast paths), all matrices assembled on host with scipy.sparse.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from ..utils.caching import CachedClass, CachedMethod, CachedAttribute
from ..utils.config import config
from ..utils.general import is_real_dtype
from ..spectral import jacobi as jacobi_lib
from ..spectral import clenshaw
from ..ops import transforms as ops_transforms
from ..ops import fft64

FAST_THRESHOLD = int(config.get('transforms', 'fast_threshold', fallback='8192'))


def _fast_enabled(library_key, size):
    """Transform plan selection: 'matrix' = always MMT, 'fast' = always the
    mixed-radix matmul path, 'auto' = fast above the size threshold (the
    reference's @register_transform library dispatch, transforms.py:52-64).

    The 'auto' threshold default (8192) is a TPU measurement, not an
    asymptotic argument: at N=2048/3072 the four-step's (32, 48)-factor
    f64 einsums run at 0.07 TF/s effective (the 128-lane MXU is 97% padding
    at 32-wide contractions) while the dense MMT GEMM runs at >1.1 TF/s —
    the full 2048x512 RBC RHS measured 1243 ms four-step vs 191 ms MMT.
    The four-step's ~N/(2 sqrt(N)) flop advantage only overcomes the ~16x
    rate disadvantage for N in the several-thousands, where its factors are
    also wide enough (>=64) to use the MXU properly."""
    lib = config.get('transforms', library_key, fallback='auto')
    if lib == 'matrix':
        return False
    if lib in ('fast', 'fft'):
        return True
    return size >= FAST_THRESHOLD

# Device cache for transform matrices. Arrays created inside a jit trace are
# tracers and must NOT be cached; under trace the host numpy matrix is passed
# straight through (it becomes a baked-in constant of the compiled program).
_DEVICE_CACHE = {}


def _tracing():
    import jax
    return isinstance(jnp.zeros(()), jax.core.Tracer)


def _maybe_device(np_matrix):
    from ..ops import hoist
    sub = hoist.lookup(np_matrix)
    if sub is not None:
        return sub
    if _tracing():
        return np_matrix
    key = id(np_matrix)
    if key not in _DEVICE_CACHE:
        _DEVICE_CACHE[key] = (np_matrix, jnp.asarray(np_matrix))
    return _DEVICE_CACHE[key][1]


class AffineCOV:
    """
    Affine change of variables between native coordinates (e.g. z in [-1,1])
    and problem coordinates (x in [x0, x1]).
    """

    def __init__(self, native_bounds, problem_bounds):
        self.native_bounds = tuple(map(float, native_bounds))
        self.problem_bounds = tuple(map(float, problem_bounds))
        n0, n1 = self.native_bounds
        p0, p1 = self.problem_bounds
        self.native_length = n1 - n0
        self.problem_length = p1 - p0
        # df/dx = stretch * df/dz
        self.stretch = self.native_length / self.problem_length

    def native_coord(self, problem_coord):
        p0, _ = self.problem_bounds
        n0, _ = self.native_bounds
        return n0 + (np.asarray(problem_coord) - p0) * self.stretch

    def problem_coord(self, native_coord):
        if isinstance(native_coord, str):
            if native_coord in ('left', 'lower'):
                return self.problem_bounds[0]
            if native_coord in ('right', 'upper'):
                return self.problem_bounds[1]
            if native_coord in ('center', 'middle'):
                return (self.problem_bounds[0] + self.problem_bounds[1]) / 2
            raise ValueError(f"Unknown position: {native_coord}")
        p0, _ = self.problem_bounds
        n0, _ = self.native_bounds
        return p0 + (np.asarray(native_coord) - n0) / self.stretch


class Basis(metaclass=CachedClass):
    """Base class for 1D spectral bases."""

    dim = 1
    constant = False

    def __init__(self, coord, size, bounds, dealias=1, dtype=None):
        self.coord = coord
        self.size = int(size)
        self.bounds = tuple(map(float, bounds))
        self.dealias = (float(dealias),)
        self.dtype = dtype

    @property
    def coeff_size(self):
        return self.size

    def grid_size(self, scale=1):
        return int(np.ceil(self.size * scale))

    def grid_shape(self, scales):
        scale = scales if np.isscalar(scales) else scales[0]
        return (self.grid_size(scale),)

    @property
    def group_shape(self):
        return (1,)

    def global_grid(self, scale=1):
        raise NotImplementedError

    # --- device transforms ---

    ops_couple = False  # whether operator matrices couple modes along this axis

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        """grid -> coeff along axis (data at grid size for `scale`)."""
        matrix = self._forward_matrix_device(scale, dtype)
        return ops_transforms.apply_matrix(matrix, data, axis)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        """coeff -> grid along axis."""
        matrix = self._backward_matrix_device(scale, dtype)
        return ops_transforms.apply_matrix(matrix, data, axis)

    def _forward_matrix_device(self, scale, dtype):
        return _maybe_device(self._forward_matrix_host(scale, dtype))

    def _backward_matrix_device(self, scale, dtype):
        return _maybe_device(self._backward_matrix_host(scale, dtype))

    @CachedMethod
    def _forward_matrix_host(self, scale, dtype):
        return self.forward_matrix(scale, dtype)

    @CachedMethod
    def _backward_matrix_host(self, scale, dtype):
        return self.backward_matrix(scale, dtype)

    # --- validity (parity: reference valid_elements machinery) ---

    def valid_coeff_mask(self, tensorsig=()):
        """Validity of each coefficient (full axis)."""
        return np.ones(self.coeff_size, dtype=bool)

    def group_valid_mask(self, group, tensorsig=()):
        """Validity of each element within one mode group."""
        return np.ones(self.group_shape[0], dtype=bool)

    # --- operator matrices (host, scipy.sparse) ---

    def conversion_matrix(self, out_basis):
        raise NotImplementedError

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)


class Jacobi(Basis):
    ops_couple = True
    """
    Jacobi polynomial basis on an interval: coefficients of orthonormal
    P_n^{(a,b)} on native z in [-1,1], with an affine map to problem bounds.
    Grid is the Gauss quadrature grid of the (a0, b0) "grid parameters".

    Parity: dedalus/core/basis.py:435 and operator subclasses :664-816.
    """

    def __init__(self, coord, size, bounds, a, b, a0=None, b0=None, dealias=1, dtype=np.float64):
        super().__init__(coord, size, bounds, dealias=dealias, dtype=dtype)
        self.a = float(a)
        self.b = float(b)
        self.a0 = float(a if a0 is None else a0)
        self.b0 = float(b if b0 is None else b0)
        self.COV = AffineCOV((-1, 1), bounds)

    def clone_with(self, **kw):
        args = dict(coord=self.coord, size=self.size, bounds=self.bounds, a=self.a,
                    b=self.b, a0=self.a0, b0=self.b0, dealias=self.dealias[0], dtype=self.dtype)
        args.update(kw)
        return Jacobi(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(a=self.a + order, b=self.b + order)

    def global_grid(self, scale=1):
        N = self.grid_size(scale)
        z = jacobi_lib.build_grid(N, self.a0, self.b0)
        return self.COV.problem_coord(z)

    @CachedMethod
    def global_weights(self, scale=1):
        """Plain-measure integration weights: sum w_i f(x_i) ~ integral f dx
        (exact for polynomials up to the grid degree), built by projecting the
        quadrature rule through the integration vector."""
        N = self.grid_size(scale)
        z, w_ab = jacobi_lib.quadrature(N, self.a0, self.b0, dtype=np.longdouble)
        I = jacobi_lib.integration_vector(N, self.a0, self.b0).astype(np.longdouble)
        P = jacobi_lib.polynomials(N, self.a0, self.b0, z, dtype=np.longdouble)
        w_plain = w_ab * (I @ P)
        return np.asarray(w_plain, dtype=np.float64) / self.COV.stretch

    @CachedMethod
    def forward_matrix(self, scale, dtype):
        """Forward MMT: weighted projection onto (a,b) polynomials via (a0,b0) grid."""
        N = self.grid_size(scale)
        M = self.size
        z, w = jacobi_lib.quadrature(N, self.a0, self.b0, dtype=np.longdouble)
        # Conversion from grid params to coeff params happens through projection:
        # the exact projection requires the (a,b) weight; following the reference
        # (transforms.py:35-160), synthesize on the (a0,b0) grid and invert:
        # forward = pinv-free: P_ab-projection with (a0,b0) quadrature is exact
        # when (a,b)=(a0,b0); otherwise compose grid-param projection + conversion.
        if (self.a, self.b) == (self.a0, self.b0):
            P = jacobi_lib.polynomials(M, self.a, self.b, z, dtype=np.longdouble)
            mat = (P * w)
            mat[N:, :] = 0
        else:
            P = jacobi_lib.polynomials(M, self.a0, self.b0, z, dtype=np.longdouble)
            proj = (P * w)
            proj[N:, :] = 0
            conv = jacobi_lib.conversion_matrix(M, self.a0, self.b0, self.a, self.b)
            mat = conv.toarray().astype(np.longdouble) @ proj
        return np.ascontiguousarray(mat.astype(dtype))

    @CachedMethod
    def backward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        M = self.size
        z = jacobi_lib.build_grid(N, self.a0, self.b0)
        P = jacobi_lib.polynomials(M, self.a, self.b, z)  # (M, N)
        P[N:, :] = 0
        return np.ascontiguousarray(P.T.astype(dtype))

    # --- fast (DCT) transform path ---
    # Valid when the grid is Gauss-Chebyshev (a0 = b0 = -1/2) and the coeff
    # params sit an integer number of ultraspherical conversions above it
    # (the reference's FastChebyshevTransform, transforms.py:801-900). The
    # grid here is z-ascending (theta-descending), so grid data is reversed
    # around the DCT instead of sign-flipping odd modes.

    @CachedAttribute
    def _fast_da(self):
        """Integer ultraspherical offset, or None if the fast path is invalid."""
        if (self.a0, self.b0) != (-0.5, -0.5):
            return None
        da, db = self.a - self.a0, self.b - self.b0
        if da != db or da < 0 or da != round(da):
            return None
        return int(round(da))

    def _use_fast(self, N):
        return self._fast_da is not None and _fast_enabled('jacobi_library', max(N, self.size))

    @CachedMethod
    def _conversion_diags(self, M):
        """Banded diagonals of the T -> (a,b) conversion (M x M), as dense
        offset vectors for fft64.banded_shift_matmul."""
        K = jacobi_lib.conversion_matrix(M, self.a0, self.b0, self.a, self.b).tocsr()
        coo = K.tocoo()
        offsets = sorted(set((coo.col - coo.row).tolist()))
        diags = []
        for off in offsets:
            d = np.zeros(M)
            vals = K.diagonal(off)
            d[:len(vals)] = vals
            diags.append(d)
        return diags, offsets, K

    @CachedMethod
    def _conversion_solve_data(self, P):
        _, _, K = self._conversion_diags(P)
        return fft64.build_blocked_upper_solve(K)

    def _fast_forward(self, data, axis, N, dtype):
        """Grid -> coeff: reverse, DCT-II, orthonormal-T scaling, conversion."""
        M = self.size
        x = jnp.flip(data, axis=axis)
        if jnp.iscomplexobj(x):
            t = fft64.dct2_64(jnp.real(x), axis) + 1j * fft64.dct2_64(jnp.imag(x), axis)
        else:
            t = fft64.dct2_64(x, axis)
        # Orthonormal-T projection from unnormalized DCT-II (validated vs MMT)
        scale = np.full(N, np.sqrt(np.pi / 2) / N)
        scale[0] = np.sqrt(np.pi) / (2 * N)
        shape = [1] * data.ndim
        shape[axis] = N
        t = t * jnp.asarray(scale.reshape(shape))
        t = ops_transforms.resize_axis(t, M, axis)
        if self._fast_da:
            diags, offsets, _ = self._conversion_diags(M)
            t = fft64.banded_shift_matmul(diags, offsets, t, axis)
        return t

    def _fast_backward(self, data, axis, N, dtype):
        """Coeff -> grid: inverse conversion, scaling, DCT-III, reverse."""
        M = self.size
        P = min(M, N)
        c = ops_transforms.resize_axis(data, P, axis)
        if self._fast_da:
            solve_data = self._conversion_solve_data(P)
            c = fft64.blocked_upper_solve(solve_data, c, axis)
        c = ops_transforms.resize_axis(c, N, axis)
        scale = np.full(N, 1 / np.sqrt(2 * np.pi))
        scale[0] = 1 / np.sqrt(np.pi)
        shape = [1] * data.ndim
        shape[axis] = N
        c = c * jnp.asarray(scale.reshape(shape))
        if jnp.iscomplexobj(c):
            g = fft64.dct3_64(jnp.real(c), axis) + 1j * fft64.dct3_64(jnp.imag(c), axis)
        else:
            g = fft64.dct3_64(c, axis)
        return jnp.flip(g, axis=axis)

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if self._use_fast(N):
            return self._fast_forward(data, axis, N, dtype)
        return super().forward_transform(data, axis, scale, dtype, tensorsig)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if self._use_fast(N):
            return self._fast_backward(data, axis, N, dtype)
        return super().backward_transform(data, axis, scale, dtype, tensorsig)

    # --- operator matrices ---

    @CachedMethod
    def conversion_matrix(self, out_basis):
        return jacobi_lib.conversion_matrix(self.size, self.a, self.b, out_basis.a, out_basis.b)

    @CachedMethod
    def differentiation_matrix(self):
        """d/dx: (a,b) coeffs -> (a+1,b+1) coeffs, including the COV stretch."""
        D = jacobi_lib.differentiation_matrix(self.size, self.a, self.b)
        return self.COV.stretch * D

    @CachedMethod
    def interpolation_vector(self, position):
        zpos = self.COV.native_coord(self.COV.problem_coord(position) if isinstance(position, str) else position)
        E = jacobi_lib.interpolation_vector(self.size, self.a, self.b, zpos)
        return sparse.csr_matrix(E[None, :])

    @CachedMethod
    def integration_vector(self):
        I = jacobi_lib.integration_vector(self.size, self.a, self.b)
        return sparse.csr_matrix(I[None, :] / self.COV.stretch)

    @CachedMethod
    def lift_matrix(self, index):
        """Column mapping a size-1 tau coefficient onto polynomial `index` (e.g. -1)."""
        col = np.zeros((self.size, 1))
        col[index, 0] = 1
        return sparse.csr_matrix(col)

    def ncc_matrix(self, ncc_basis, out_basis, coeffs, cutoff=1e-6):
        """
        Multiplication matrix for an NCC with coefficients `coeffs` in
        `ncc_basis` acting on this (operand) basis, output in `out_basis`.
        Parity: dedalus/core/basis.py:612-628 (_last_axis_component_ncc_matrix).
        """
        N = self.size
        da = int(round(out_basis.a - self.a))
        db = int(round(out_basis.b - self.b))
        # Pad to avoid truncation aliasing during Clenshaw, then truncate.
        Nmat = 3 * ((N + 1) // 2) + min((N + 1) // 2, (da + db + 1) // 2)
        Nmat = max(Nmat, N)
        J = jacobi_lib.jacobi_matrix(Nmat, self.a, self.b)
        S = clenshaw.matrix_clenshaw(np.ravel(coeffs), ncc_basis.a, ncc_basis.b, J, cutoff=cutoff)
        convert = jacobi_lib.conversion_matrix(Nmat, self.a, self.b, out_basis.a, out_basis.b)
        return sparse.csr_matrix((convert @ S)[:N, :N])

    def grid_spacing(self, scale=1):
        x = np.asarray(self.global_grid(scale))
        dx = np.zeros_like(x)
        dx[1:-1] = (x[2:] - x[:-2]) / 2
        dx[0] = x[1] - x[0]
        dx[-1] = x[-1] - x[-2]
        return np.abs(dx)

    def __repr__(self):
        return (f"Jacobi({self.coord.name}, size={self.size}, a={self.a}, b={self.b}, "
                f"a0={self.a0}, b0={self.b0})")

    def _key(self):
        return ('Jacobi', self.coord.name, self.size, self.bounds, self.a, self.b,
                self.a0, self.b0, self.dealias)

    def __eq__(self, other):
        if isinstance(other, Jacobi):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())


def ChebyshevT(coord, size, bounds, dealias=1, dtype=np.float64):
    """Chebyshev-T basis: Jacobi(-1/2, -1/2)."""
    return Jacobi(coord, size, bounds, a=-0.5, b=-0.5, dealias=dealias, dtype=dtype)


def ChebyshevU(coord, size, bounds, dealias=1, dtype=np.float64):
    return Jacobi(coord, size, bounds, a=0.5, b=0.5, a0=-0.5, b0=-0.5, dealias=dealias, dtype=dtype)


def ChebyshevV(coord, size, bounds, dealias=1, dtype=np.float64):
    return Jacobi(coord, size, bounds, a=1.5, b=1.5, a0=-0.5, b0=-0.5, dealias=dealias, dtype=dtype)


def Legendre(coord, size, bounds, dealias=1, dtype=np.float64):
    return Jacobi(coord, size, bounds, a=0, b=0, dealias=dealias, dtype=dtype)


def Ultraspherical(coord, size, bounds, alpha, alpha0=None, dealias=1, dtype=np.float64):
    a = b = alpha - 0.5
    a0 = b0 = (alpha0 - 0.5) if alpha0 is not None else a
    return Jacobi(coord, size, bounds, a=a, b=b, a0=a0, b0=b0, dealias=dealias, dtype=dtype)


class FourierBase(Basis):
    """Common machinery for periodic Fourier bases."""

    def __init__(self, coord, size, bounds=(0, 2*np.pi), dealias=1, dtype=np.float64):
        super().__init__(coord, size, bounds, dealias=dealias, dtype=dtype)
        self.COV = AffineCOV((0, 2*np.pi), bounds)
        self.length = self.bounds[1] - self.bounds[0]

    def global_grid(self, scale=1):
        N = self.grid_size(scale)
        native = 2 * np.pi * np.arange(N) / N
        return self.COV.problem_coord(native)

    def global_weights(self, scale=1):
        N = self.grid_size(scale)
        return np.full(N, self.length / N)

    def grid_spacing(self, scale=1):
        N = self.grid_size(scale)
        return np.full(N, self.length / N)

    def derivative_basis(self, order=1):
        return self

    def Kmax_for(self, grid_size):
        KN = (grid_size - 1) // 2
        KM = (self.size - 1) // 2
        return min(KN, KM)


class ComplexFourier(FourierBase):
    """
    Complex exponential basis: unit-amplitude modes exp(i k theta), coefficient
    ordering [0, 1, ..., KM, (-KM-1?), -KM, ..., -1] per the reference
    (transforms.py:161-209). Requires complex dtype.
    """

    @CachedAttribute
    def wavenumbers_native(self):
        M = self.size
        KM = (M - 1) // 2
        k = np.arange(M)
        return (k + KM) % M - KM

    @CachedAttribute
    def wavenumbers(self):
        return self.wavenumbers_native * self.COV.stretch

    @property
    def group_shape(self):
        return (1,)

    @CachedMethod
    def forward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        M = self.size
        Kmax = self.Kmax_for(N)
        K = self.wavenumbers_native[:, None]
        X = 2 * np.pi * np.arange(N)[None, :] / N
        mat = np.exp(-1j * K * X) / N
        mat *= (np.abs(K) <= Kmax)
        return np.ascontiguousarray(mat.astype(dtype))

    @CachedMethod
    def backward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        M = self.size
        Kmax = self.Kmax_for(N)
        K = self.wavenumbers_native[None, :]
        X = 2 * np.pi * np.arange(N)[:, None] / N
        mat = np.exp(1j * K * X)
        mat *= (np.abs(K) <= Kmax)
        return np.ascontiguousarray(mat.astype(dtype))

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if _fast_enabled('fourier_library', max(N, self.size)):
            return ops_transforms.complex_fft_forward(data, axis, self.size, self.Kmax_for(N))
        return super().forward_transform(data, axis, scale, dtype, tensorsig)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if _fast_enabled('fourier_library', max(N, self.size)):
            return ops_transforms.complex_fft_backward(data, axis, N, self.Kmax_for(N))
        return super().backward_transform(data, axis, scale, dtype, tensorsig)

    def valid_coeff_mask(self, tensorsig=()):
        # For even sizes the wrap-around slot k = KM+1 is the zeroed Nyquist mode
        mask = np.ones(self.size, dtype=bool)
        KM = (self.size - 1) // 2
        if self.size % 2 == 0:
            mask[KM + 1] = False
        return mask

    def group_valid_mask(self, group, tensorsig=()):
        KM = (self.size - 1) // 2
        if self.size % 2 == 0 and group == KM + 1:
            return np.array([False])
        return np.array([True])

    # --- operator matrices ---

    def differentiation_matrix(self):
        return sparse.diags(1j * self.wavenumbers, format='csr')

    @CachedMethod
    def interpolation_vector(self, position):
        theta = self.COV.native_coord(position)
        E = np.exp(1j * self.wavenumbers_native * theta)
        return sparse.csr_matrix(E[None, :])

    @CachedMethod
    def integration_vector(self):
        I = np.zeros(self.size, dtype=complex)
        I[0] = self.length
        return sparse.csr_matrix(I[None, :])

    @CachedMethod
    def hilbert_matrix(self):
        """Hilbert transform: multiply coefficients by -1j sign(k)."""
        return sparse.diags(-1j * np.sign(self.wavenumbers_native), format='csr')

    def ncc_matrix(self, ncc_basis, out_basis, coeffs, cutoff=1e-6):
        """Multiplication by NCC = convolution over wavenumbers."""
        M = self.size
        k = self.wavenumbers_native
        rows, cols, vals = [], [], []
        coeffs = np.ravel(coeffs)
        for j, kj in enumerate(k):       # NCC mode
            if abs(coeffs[j]) <= cutoff:
                continue
            for n, kn in enumerate(k):   # operand mode
                kout = kj + kn
                hits = np.where(k == kout)[0]
                if len(hits):
                    rows.append(hits[0]); cols.append(n); vals.append(coeffs[j])
        return sparse.csr_matrix((vals, (rows, cols)), shape=(M, M))

    def __repr__(self):
        return f"ComplexFourier({self.coord.name}, size={self.size})"

    def _key(self):
        return ('ComplexFourier', self.coord.name, self.size, self.bounds, self.dealias)

    def __eq__(self, other):
        if isinstance(other, ComplexFourier):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())


def Fourier(*args, dtype=None, **kw):
    """Factory dispatching to RealFourier / ComplexFourier by dtype
    (parity: basis.py:939)."""
    if dtype is None:
        raise ValueError("dtype must be specified")
    dtype = np.dtype(dtype)
    if dtype == np.float64:
        return RealFourier(*args, **kw)
    if dtype == np.complex128:
        return ComplexFourier(*args, **kw)
    raise ValueError(f"Unrecognized dtype: {dtype}")


class RealFourier(FourierBase):
    """
    Real trigonometric basis with interleaved (cos, -sin) coefficient pairs:
        f(x) = sum_k a_k cos(k theta) - b_k sin(k theta),
    coefficients ordered [a0, b0, a1, b1, ...] (b0 identically zero), matching
    the reference (transforms.py:333-387). Group shape (2,) per wavenumber.
    """

    @CachedAttribute
    def wavenumbers_native(self):
        KM = (self.size - 1) // 2
        return np.repeat(np.arange(KM + 1), 2)[:max(self.size, 2)]

    @CachedAttribute
    def wavenumbers(self):
        return self.wavenumbers_native * self.COV.stretch

    @property
    def group_shape(self):
        # (cos, -sin) pairs; a size-1 basis holds only the constant mode
        return (min(self.size, 2),)

    @CachedMethod
    def forward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        M = max(2, self.size)
        Kmax = self.Kmax_for(N)
        K = self.wavenumbers_native[0::2][:, None]
        X = 2 * np.pi * np.arange(N)[None, :] / N
        mat = np.zeros((M, N))
        mat[0::2] = (2 / N) * np.cos(K * X)
        mat[1::2] = -(2 / N) * np.sin(K * X)
        mat[0] = 1 / N
        mat[1] = 0
        mat *= (self.wavenumbers_native[:, None] <= Kmax)
        mat = mat[:self.size]  # size-1 basis keeps only the mean row
        return np.ascontiguousarray(mat.astype(dtype))

    @CachedMethod
    def backward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        M = max(2, self.size)
        Kmax = self.Kmax_for(N)
        K = self.wavenumbers_native[None, 0::2]
        X = 2 * np.pi * np.arange(N)[:, None] / N
        mat = np.zeros((N, M))
        mat[:, 0::2] = np.cos(K * X)
        mat[:, 1::2] = -np.sin(K * X)
        mat *= (self.wavenumbers_native[None, :] <= Kmax)
        mat = mat[:, :self.size]
        return np.ascontiguousarray(mat.astype(dtype))

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if self.size > 1 and _fast_enabled('fourier_library', max(N, self.size)):
            return ops_transforms.real_fft_forward(data, axis, self.size, self.Kmax_for(N))
        return super().forward_transform(data, axis, scale, dtype, tensorsig)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        N = self.grid_size(scale)
        if self.size > 1 and _fast_enabled('fourier_library', max(N, self.size)):
            return ops_transforms.real_fft_backward(data, axis, N, self.Kmax_for(N))
        return super().backward_transform(data, axis, scale, dtype, tensorsig)

    def valid_coeff_mask(self, tensorsig=()):
        mask = np.ones(self.size, dtype=bool)
        if self.size > 1:
            mask[1] = False  # b_0 (the k=0 minus-sine coeff) is identically zero
        return mask

    def group_valid_mask(self, group, tensorsig=()):
        width = min(self.size, 2)
        if group == 0:
            return np.array([True, False])[:width]
        return np.ones(width, dtype=bool)

    # --- operator matrices (acting on interleaved (cos, -sin) pairs) ---

    @CachedMethod
    def differentiation_matrix(self):
        # d/dx [a cos(k th) - b sin(k th)] = -a k' sin - b k' cos with k' = k*stretch
        # (a, b) -> (-k' b, k' a): per-pair block [[0, -k'], [k', 0]]
        M = self.size
        k = self.wavenumbers[0::2]
        upper = np.zeros(M - 1)
        lower = np.zeros(M - 1)
        upper[0::2] = -k
        lower[0::2] = k
        return sparse.diags([lower, upper], [-1, 1], shape=(M, M), format='csr')

    @CachedMethod
    def interpolation_vector(self, position):
        theta = self.COV.native_coord(position)
        E = np.zeros((1, self.size))
        k = self.wavenumbers_native
        E[0, 0::2] = np.cos(k[0::2] * theta)
        E[0, 1::2] = -np.sin(k[1::2] * theta)
        return sparse.csr_matrix(E)

    @CachedMethod
    def integration_vector(self):
        I = np.zeros(self.size)
        I[0] = self.length
        return sparse.csr_matrix(I[None, :])

    @CachedMethod
    def hilbert_matrix(self):
        """Hilbert transform H(exp(ikx)) = -1j sign(k) exp(ikx): pair blocks
        [[0, 1], [-1, 0]] for k > 0 (parity: operators.py:1433)."""
        M = self.size
        upper = np.zeros(M - 1)
        lower = np.zeros(M - 1)
        k = self.wavenumbers_native[0::2]
        upper[0::2] = (k > 0).astype(float)
        lower[0::2] = -(k > 0).astype(float)
        return sparse.diags([lower, upper], [-1, 1], shape=(M, M), format='csr')

    def ncc_matrix(self, ncc_basis, out_basis, coeffs, cutoff=1e-6):
        """
        Multiplication by a real-Fourier NCC via product-to-sum identities:
          cos j * cos n = (cos(j+n) + cos(j-n))/2, etc.
        """
        M = self.size
        KM = (M - 1) // 2
        coeffs = np.ravel(coeffs)
        mat = np.zeros((M, M))

        def add(kout, which_out, val):
            # which_out: 0 -> cos coefficient a, 1 -> (-sin) coefficient b
            k = abs(kout)
            if k > KM:
                return
            sign = 1.0
            if kout < 0 and which_out == 1:
                sign = -1.0  # -sin(-k) = +sin(k): b_{-k} pairs to -b_k
            row = 2 * k + which_out
            if row < M:
                mat[row] += sign * val

        for j in range(KM + 1):
            aj = coeffs[2*j]
            bj = coeffs[2*j + 1]
            for n in range(KM + 1):
                # operand basis functions: cos(n th) [col 2n], -sin(n th) [col 2n+1]
                # cos j cos n = 1/2 cos(j+n) + 1/2 cos(j-n)
                if abs(aj) > cutoff:
                    _accum_pair(mat, M, KM, j, n, aj, 'cc')
                    _accum_pair(mat, M, KM, j, n, aj, 'cs')
                if abs(bj) > cutoff:
                    _accum_pair(mat, M, KM, j, n, bj, 'sc')
                    _accum_pair(mat, M, KM, j, n, bj, 'ss')
        return sparse.csr_matrix(mat)

    def __repr__(self):
        return f"RealFourier({self.coord.name}, size={self.size})"

    def _key(self):
        return ('RealFourier', self.coord.name, self.size, self.bounds, self.dealias)

    def __eq__(self, other):
        if isinstance(other, RealFourier):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())


class ExponentialFourier(FourierBase):
    """
    Complex exponential basis with PAIRED (+k, -k) coefficient ordering:
        slots [e^0, (dead), e^{+i th}, e^{-i th}, e^{+2i th}, e^{-2i th}, ...]
    Group shape (2,) per |k|, matching RealFourier's pair batching so that
    curvilinear per-m machinery can batch signed wavenumbers (slot 0 = +m,
    slot 1 = -m). The k = 0 pair's second slot is a dead pad. Used as the
    azimuth basis for complex-dtype curvilinear fields (the reference uses a
    plain ComplexFourier azimuth, transforms.py:161; the pairing here is the
    batching-friendly equivalent).
    """

    @CachedAttribute
    def wavenumbers_native(self):
        M = self.size
        k = np.zeros(M, dtype=int)
        for slot in range(M):
            p = slot // 2
            k[slot] = p if slot % 2 == 0 else -p
        return k

    @CachedAttribute
    def wavenumbers(self):
        return self.wavenumbers_native * self.COV.stretch

    @property
    def group_shape(self):
        return (min(self.size, 2),)

    def _dead_mask(self):
        """True on live slots; slot 1 (the -0 pad) is dead."""
        mask = np.ones(self.size, dtype=bool)
        if self.size > 1:
            mask[1] = False
        return mask

    @CachedMethod
    def forward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        Kmax = min(self.Kmax_for(N), (self.size - 1) // 2)
        K = self.wavenumbers_native[:, None]
        X = 2 * np.pi * np.arange(N)[None, :] / N
        mat = np.exp(-1j * K * X) / N
        mat *= (np.abs(K) <= Kmax)
        mat *= self._dead_mask()[:, None]
        return np.ascontiguousarray(mat.astype(np.complex128))

    @CachedMethod
    def backward_matrix(self, scale, dtype):
        N = self.grid_size(scale)
        Kmax = min(self.Kmax_for(N), (self.size - 1) // 2)
        K = self.wavenumbers_native[None, :]
        X = 2 * np.pi * np.arange(N)[:, None] / N
        mat = np.exp(1j * K * X)
        mat *= (np.abs(K) <= Kmax)
        mat *= self._dead_mask()[None, :]
        return np.ascontiguousarray(mat.astype(np.complex128))

    def valid_coeff_mask(self, tensorsig=()):
        return self._dead_mask()

    def group_valid_mask(self, group, tensorsig=()):
        width = min(self.size, 2)
        if group == 0:
            return np.array([True, False])[:width]
        return np.ones(width, dtype=bool)

    # --- operator matrices ---

    @CachedMethod
    def differentiation_matrix(self):
        return sparse.diags(1j * self.wavenumbers, format='csr')

    @CachedMethod
    def interpolation_vector(self, position):
        theta = self.COV.native_coord(position)
        E = np.exp(1j * self.wavenumbers_native * theta) * self._dead_mask()
        return sparse.csr_matrix(E[None, :].astype(complex))

    @CachedMethod
    def integration_vector(self):
        I = np.zeros(self.size, dtype=complex)
        I[0] = self.length
        return sparse.csr_matrix(I[None, :])

    @CachedMethod
    def hilbert_matrix(self):
        return sparse.diags(-1j * np.sign(self.wavenumbers_native).astype(complex),
                            format='csr')

    def ncc_matrix(self, ncc_basis, out_basis, coeffs, cutoff=1e-6):
        """Multiplication = convolution over signed wavenumbers."""
        M = self.size
        k = self.wavenumbers_native
        live = self._dead_mask()
        slot_of = {}
        for slot in range(M):
            if live[slot] and k[slot] not in slot_of:
                slot_of[k[slot]] = slot
        coeffs = np.ravel(coeffs)
        rows, cols, vals = [], [], []
        for j in range(M):
            if not live[j] or abs(coeffs[j]) <= cutoff:
                continue
            for n in range(M):
                if not live[n]:
                    continue
                kout = k[j] + k[n]
                if kout in slot_of:
                    rows.append(slot_of[kout])
                    cols.append(n)
                    vals.append(coeffs[j])
        return sparse.csr_matrix((vals, (rows, cols)), shape=(M, M))

    def __repr__(self):
        return f"ExponentialFourier({self.coord.name}, size={self.size})"

    def _key(self):
        return ('ExponentialFourier', self.coord.name, self.size, self.bounds,
                self.dealias)

    def __eq__(self, other):
        if isinstance(other, ExponentialFourier):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())


def _accum_pair(mat, M, KM, j, n, val, kind):
    """
    Accumulate product-to-sum contributions into the RealFourier NCC matrix.
    NCC mode j (coefficient `val`), operand mode n, for products of
    c=cos, s=(-sin): kind in {'cc','cs','sc','ss'} = (ncc part, operand part).

    Identities (with S := -sin):
      cos j cos n   = 1/2 cos(j+n) + 1/2 cos(j-n)
      cos j Sin n   = 1/2 S(j+n) - 1/2 S(j-n)            [S(k)=-sin(k th)]
      S j   cos n   = 1/2 S(j+n) + 1/2 S(j-n)
      S j   S n     = -1/2 cos(j+n) + 1/2 cos(j-n)
    with S(-k) = -S(k), cos(-k) = cos(k).
    """
    def put(kout, part, amp):
        k = abs(kout)
        if k > KM:
            return
        if part == 's' and kout < 0:
            amp = -amp
        if part == 's' and k == 0:
            return
        row = 2 * k + (1 if part == 's' else 0)
        if row < M:
            mat[row, col] += amp

    if kind == 'cc':
        col = 2 * n
        put(j + n, 'c', val / 2)
        put(j - n, 'c', val / 2)
    elif kind == 'cs':
        col = 2 * n + 1
        put(j + n, 's', val / 2)
        put(j - n, 's', -val / 2)
    elif kind == 'sc':
        col = 2 * n
        put(j + n, 's', val / 2)
        put(j - n, 's', val / 2)
    elif kind == 'ss':
        col = 2 * n + 1
        put(j + n, 'c', -val / 2)
        put(j - n, 'c', val / 2)
