"""
Sphere-surface (S2) basis: spin-weighted spherical harmonics.

Parity target (behavior): dedalus/core/basis.py:2672 (SphereBasis) with the
SWSH colatitude transform (transforms.py:1252). TPU-first design, mirroring
the disk: RECTANGULAR (m, ell-slot) coefficient storage with component-
dependent validity (slot j holds ell = max(|m|,|s|) + j), per-(m, s) SWSH
transform matrices batched as one (M/2, n, Ntheta) MXU einsum, and spin
recombination as a dense (component, parity-pair) einsum.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .basis import Basis
from .basis_polar import AzimuthBasis, make_azimuth_basis, spin_recombine, _spins_present, \
    _comp_spin_map, _stack_device
from .coords import S2Coordinates
from ..utils.caching import CachedMethod
from ..spectral import sphere as sphere_lib


class ColatitudeBasis(Basis):
    """
    Per-m SWSH colatitude basis: coefficient slot j of azimuthal mode m and
    spin s holds the ell = max(|m|,|s|) + j harmonic amplitude.
    """

    ops_couple = True

    def __init__(self, coord, size, radius=1.0, dealias=1, dtype=np.float64,
                 parent=None):
        super().__init__(coord, size, (0, np.pi), dealias=dealias, dtype=dtype)
        self.radius = float(radius)
        self.parent = parent
        self.Lmax = self.size - 1

    def _key(self):
        return ('Colatitude', self.coord.name, self.size, self.radius, self.dealias)

    def __eq__(self, other):
        if isinstance(other, ColatitudeBasis):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def derivative_basis(self, order=1):
        return self  # SWSH operators stay in the same basis

    @property
    def _ell_aligned(self):
        """3D spherical parents (ball/shell) store ALL spin components with
        slot j <-> ell = |m| + j so the per-ell regularity recombination can
        mix components; slots with ell < |s| are invalid. S2-only parents pack
        each spin from its own ell_min = max(|m|, |s|)."""
        return hasattr(self.parent, 'radial_basis')

    def n_size(self, m, s=0):
        if self._ell_aligned:
            return max(self.Lmax + 1 - abs(m), 0)
        return max(self.Lmax + 1 - max(abs(m), abs(s)), 0)

    def slot_offset(self, m, s):
        """First valid slot of spin s within the (ell-aligned) slot axis."""
        if self._ell_aligned:
            return max(abs(m), abs(s)) - abs(m)
        return 0

    # --- grids ---

    def global_grid(self, scale=1):
        """Colatitude grid theta (decreasing z = cos theta ordering)."""
        N = self.grid_size(scale)
        z, w = sphere_lib.quadrature(N - 1)
        return np.arccos(np.asarray(z, dtype=np.float64))[::-1]

    def _zw(self, scale):
        N = self.grid_size(scale)
        z, w = sphere_lib.quadrature(N - 1)
        return np.asarray(z, dtype=np.float64), np.asarray(w, dtype=np.float64)

    def global_weights(self, scale=1):
        """Weights for integral f(theta) sin(theta) dtheta (times radius^2)."""
        _, w = self._zw(scale)
        return w[::-1] * self.radius**2

    def grid_spacing(self, scale=1):
        th = np.asarray(self.global_grid(scale))
        return np.abs(np.gradient(th)) * self.radius

    # --- transforms ---

    @property
    def signed_pairs(self):
        """True when the parent azimuth stores signed (+m, -m) pairs
        (complex dtype, ExponentialAzimuthBasis)."""
        from .basis_polar import ExponentialAzimuthBasis
        return isinstance(self.parent.azimuth_basis, ExponentialAzimuthBasis)

    def _one_m_swsh(self, m_signed, s, z, w, Lmax_g):
        """(fwd, bwd) SWSH matrices for one signed azimuthal wavenumber."""
        n = self.size
        fwd = np.zeros((n, z.size))
        bwd = np.zeros((z.size, n))
        off = self.slot_offset(m_signed, s)
        count = max(self.Lmax + 1 - max(abs(m_signed), abs(s)), 0)
        count = min(count, n - off)
        if count <= 0:
            return fwd, bwd
        Y = sphere_lib.harmonics(max(Lmax_g, self.Lmax), m_signed, s, z)
        Y = Y[:count, :]
        # theta ordering: grid stored with increasing theta = decreasing z
        fwd[off:off + count, :] = (Y * w)[:, ::-1]
        bwd[:, off:off + count] = Y[:, ::-1].T
        return fwd, bwd

    @CachedMethod
    def _transform_stacks(self, scale, s, direction):
        Ng = self.grid_size(scale)
        M = self.parent.azimuth_basis.size
        KM = (M - 1) // 2
        z, w = self._zw(scale)
        n = self.size
        Lmax_g = Ng - 1
        if self.signed_pairs:
            fwd = np.zeros((KM + 1, 2, n, Ng))
            bwd = np.zeros((KM + 1, 2, Ng, n))
            for m in range(KM + 1):
                for slot, ms in enumerate((m, -m)):
                    f, b = self._one_m_swsh(ms, s, z, w, Lmax_g)
                    fwd[m, slot] = f
                    bwd[m, slot] = b
            return np.ascontiguousarray(fwd if direction == 'f' else bwd)
        fwd = np.zeros((KM + 1, n, Ng))
        bwd = np.zeros((KM + 1, Ng, n))
        for m in range(KM + 1):
            f, b = self._one_m_swsh(m, s, z, w, Lmax_g)
            fwd[m] = f
            bwd[m] = b
        return np.ascontiguousarray(fwd if direction == 'f' else bwd)

    @staticmethod
    def _apply_one(comp, stack, ax, out_size):
        """Apply a (KM+1, out, n) — or signed (KM+1, 2, out, n) — per-m stack
        along axis `ax` of `comp` (azimuth pairs at axis ax-1); trailing axes
        (e.g. a ball's radius) batch through the einsum ellipsis."""
        d = jnp.moveaxis(comp, ax, -1)            # colatitude to last
        d = jnp.moveaxis(d, ax - 1, 0)            # azimuth to front
        M = d.shape[0]
        P = max(M // 2, 1)
        d = d.reshape((P, M // P) + d.shape[1:])
        if stack.ndim == 4:   # signed (+m, -m) slots
            res = jnp.einsum('mpon,mp...n->mp...o', stack, d)
        else:
            res = jnp.einsum('mon,mp...n->mp...o', stack, d)
        res = res.reshape((M,) + res.shape[2:])
        res = jnp.moveaxis(res, 0, ax - 1)
        return jnp.moveaxis(res, -1, ax)

    def _apply_stack(self, data, stack_np, out_size, tensorsig, comp_spins, axis):
        nt = len(tensorsig)
        ax = axis - nt  # axis within the spatial dims of one component
        if not tensorsig:
            return self._apply_one(data, _stack_device(stack_np[0]), ax, out_size)
        outs = None
        for idx in np.ndindex(*[cs.dim for cs in tensorsig]):
            s = comp_spins[idx]
            res = self._apply_one(data[idx], _stack_device(stack_np[s]), ax, out_size)
            if outs is None:
                outs = jnp.zeros(tuple(cs.dim for cs in tensorsig) + res.shape,
                                 dtype=data.dtype)
            outs = outs.at[idx].set(res)
        return outs

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=True, real=(np.dtype(dtype).kind == 'f'))
        stacks = {s: self._transform_stacks(scale, s, 'f')
                  for s in _spins_present(self.parent.coordsys, tensorsig)}
        spins = _comp_spin_map(self.parent.coordsys, tensorsig)
        return self._apply_stack(data, stacks, self.size, tensorsig, spins, axis)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        stacks = {s: self._transform_stacks(scale, s, 'b')
                  for s in _spins_present(self.parent.coordsys, tensorsig)}
        spins = _comp_spin_map(self.parent.coordsys, tensorsig)
        data = self._apply_stack(data, stacks, self.grid_size(scale), tensorsig,
                                 spins, axis)
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=False, real=(np.dtype(dtype).kind == 'f'))
        return data

    # --- validity (component-dependent) ---

    def component_valid_for_m(self, m, tensorsig, comp_idx):
        s = self.parent.coordsys.spintotal(tensorsig, comp_idx) if tensorsig else 0
        mask = np.zeros(self.size, dtype=bool)
        off = self.slot_offset(m, s)
        count = max(self.Lmax + 1 - max(abs(m), abs(s)), 0)
        mask[off:off + min(count, self.size - off)] = True
        return mask

    def group_valid_for_m(self, m, tensorsig=()):
        # Scalar fallback (per-component masks are used when tensorsig present)
        return self.component_valid_for_m(m, (), ())

    def surface_pair_valid_for_m(self, m, tensorsig, cidx, az_w):
        """Joint (azimuth pair, ell-slot) validity: the sin parts follow the
        cos parts except that (ell == 0, sin) drops for rank <= 1 (real
        scalars/vectors; ref basis.py:3204-3210 — m = 0 symmetry is NOT
        imposed for ell > 0). Signed (+m, -m) pairs instead kill the whole
        dead slot of the m = 0 pair."""
        cosmask = self.component_valid_for_m(m, tensorsig, cidx)
        out = np.zeros((az_w, self.size), dtype=bool)
        out[0] = cosmask
        if az_w > 1:
            if self.signed_pairs:
                out[1] = np.zeros_like(cosmask) if m == 0 else cosmask
                return out.ravel()
            sinmask = cosmask.copy()
            if len(tensorsig) <= 1 and m == 0:
                off = self.slot_offset(0, 0)
                # slot holding ell = 0 (scalars/spin-0 only; higher |s|
                # components exclude ell = 0 already)
                s = (self.parent.coordsys.spintotal(tensorsig, cidx)
                     if tensorsig else 0)
                if s == 0 and off < self.size:
                    sinmask[off] = False
            out[1] = sinmask
        return out.ravel()

    # --- operator matrices (per m, s) ---

    @CachedMethod
    def operator_matrix(self, op, m, s, size=None):
        n = size if size is not None else self.size
        Lmax = self.Lmax
        if op == 'Cos':
            mat = sphere_lib.operator('Cos', 0, Lmax, m, s, radius=self.radius)
        elif op in ('Sin+', 'Sin-'):
            # Multiplication by sin(theta) with spin shift ds (banded in ell)
            ds = 1 if op == 'Sin+' else -1
            mat = sphere_lib.operator('Sin', ds, Lmax, m, s, radius=self.radius)
        elif op in ('D+', 'D-'):
            ds = 1 if op == 'D+' else -1
            mat = sphere_lib.operator('D', ds, Lmax, m, s, radius=self.radius)
        elif op == 'L2':
            # Spin-weighted Laplacian eigenvalues: -(l(l+1) - s^2)/R^2
            Lmin = max(abs(m), abs(s))
            ells = np.arange(Lmin, Lmax + 1, dtype=np.float64)
            vals = -(ells * (ells + 1) - s**2) / self.radius**2
            mat = sparse.diags(vals, format='csr')
        elif op == 'Id':
            mat = sparse.identity(self.n_size(m, s), format='csr')
        else:
            raise ValueError(f"Unknown sphere operator: {op}")
        mat = sparse.csr_matrix(mat)
        # Pad to rectangular (n x n) slot storage
        r, c = mat.shape
        out = sparse.lil_matrix((n, n))
        out[:min(r, n), :min(c, n)] = mat[:min(r, n), :min(c, n)]
        return sparse.csr_matrix(out)

    def lift_matrix(self, index):
        col = np.zeros((self.size, 1))
        col[index, 0] = 1
        return sparse.csr_matrix(col)

    @CachedMethod
    def constant_mode_value(self):
        """Grid value of the ell=0 harmonic (normalization of the constant
        mode; a constant function f has coeff_00 = f / this value)."""
        z, _ = self._zw(1)
        Y = sphere_lib.harmonics(0, 0, 0, z)
        return float(np.asarray(Y)[0, 0])


class SphereBasis:
    """Sphere-surface basis facade (parity: basis.py:2672 SphereBasis)."""

    dim = 2

    def __init__(self, coordsys, shape, radius=1.0, dealias=(1, 1), dtype=np.float64):
        if not isinstance(coordsys, S2Coordinates):
            raise ValueError("SphereBasis requires S2Coordinates")
        self.coordsys = coordsys
        self.shape = tuple(shape)
        self.radius = float(radius)
        if np.isscalar(dealias):
            dealias = (dealias, dealias)
        self.dealias = tuple(dealias)
        self.dtype = dtype
        self.volume = 4 * np.pi * radius**2
        self.azimuth_basis = make_azimuth_basis(
            coordsys.azimuth, self.shape[0], self.dealias[0], dtype)
        self.colatitude_basis = ColatitudeBasis(
            coordsys.colatitude, self.shape[1], radius=self.radius,
            dealias=self.dealias[1], dtype=dtype, parent=self)

    @property
    def sub_bases(self):
        return (self.azimuth_basis, self.colatitude_basis)

    def clone_with(self, **kw):
        args = dict(coordsys=self.coordsys, shape=self.shape, radius=self.radius,
                    dealias=self.dealias, dtype=self.dtype)
        args.update(kw)
        return SphereBasis(**args)

    def derivative_basis(self, order=1):
        return self

    def global_grids(self, scales=None):
        scales = scales or self.dealias
        return (self.azimuth_basis.global_grid(scales[0]),
                self.colatitude_basis.global_grid(scales[1]))

    def __repr__(self):
        return f"SphereBasis(shape={self.shape}, radius={self.radius})"
