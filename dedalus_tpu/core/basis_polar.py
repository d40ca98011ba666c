"""
Polar bases: annulus (and, later, disk).

Parity target (behavior): dedalus/core/basis.py:2011-2305 (AnnulusBasis),
:1561-1745 (spin recombination). TPU-first design: the radial transform is a
single MMT matmul (weighted Jacobi in z = 2r/dR - rho with a (dR/r)^k radial
factor), spin recombination is a small dense matrix over (component, parity
pair) indices applied as one einsum, and the per-m covariant-derivative
matrices batch over azimuthal groups on the MXU.

An annulus field's coefficient layout is identical to RealFourier x Jacobi:
(components..., m-pairs interleaved, n), so the whole Cartesian pencil/solver
machinery applies with m-groups along the azimuth axis.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .basis import Basis, RealFourier, ExponentialFourier, Jacobi, _maybe_device
from .coords import PolarCoordinates
from ..utils.caching import CachedMethod, CachedAttribute
from ..spectral import jacobi as jacobi_lib
from ..spectral import shell as shell_lib
from ..spectral import zernike as zernike_lib
from ..spectral import clenshaw
from ..ops import transforms as ops_transforms


class AzimuthMixin:
    """Marker for azimuth bases of curvilinear coordinate systems."""
    pass


class AzimuthBasis(AzimuthMixin, RealFourier):
    """Periodic azimuth basis on [0, 2 pi) for real dtype: interleaved
    (cos, -sin) pairs (RealFourier specialization)."""
    pass


class ExponentialAzimuthBasis(AzimuthMixin, ExponentialFourier):
    """Periodic azimuth basis for complex dtype: signed (+m, -m) pairs, so
    spin-weighted radial transforms can use the correct Zernike/Jacobi family
    for each signed azimuthal wavenumber (l = |m + s| vs |-m + s|)."""
    pass


def make_azimuth_basis(coord, size, dealias, dtype):
    """Azimuth basis matching the field dtype's pair convention."""
    cls = AzimuthBasis if np.dtype(dtype).kind == 'f' else ExponentialAzimuthBasis
    return cls(coord, size, bounds=(0, 2 * np.pi), dealias=dealias, dtype=dtype)


class AnnulusRadialBasis(Basis):
    """
    Radial basis for the annulus: f(r) = (dR/r)^k sum_n c_n P_n^{(a,b)}(z),
    z = 2r/dR - rho, a = alpha[0]+k, b = alpha[1]+k.
    """

    def __init__(self, coord, size, radii, k=0, alpha=(-0.5, -0.5), dealias=1,
                 dtype=np.float64, parent=None):
        super().__init__(coord, size, radii, dealias=dealias, dtype=dtype)
        self.radii = tuple(map(float, radii))
        self.k = int(k)
        self.alpha = tuple(map(float, alpha))
        self.parent = parent
        self.dR = self.radii[1] - self.radii[0]
        self.rho = (self.radii[1] + self.radii[0]) / self.dR
        # Underlying Jacobi basis for the pure polynomial transform
        self._jacobi = Jacobi(coord, size, radii,
                              a=self.alpha[0] + self.k, b=self.alpha[1] + self.k,
                              a0=self.alpha[0], b0=self.alpha[1],
                              dealias=dealias, dtype=dtype)

    # --- identity ---

    def _key(self):
        return ('AnnulusRadial', self.coord.name, self.size, self.radii, self.k,
                self.alpha, self.dealias)

    def __eq__(self, other):
        if isinstance(other, AnnulusRadialBasis):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def clone_with(self, **kw):
        args = dict(coord=self.coord, size=self.size, radii=self.radii, k=self.k,
                    alpha=self.alpha, dealias=self.dealias[0], dtype=self.dtype,
                    parent=self.parent)
        args.update(kw)
        return AnnulusRadialBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    # --- grids ---

    def global_grid(self, scale=1):
        z = jacobi_lib.build_grid(self.grid_size(scale), self.alpha[0], self.alpha[1])
        return (self.dR / 2) * (z + self.rho)

    def global_weights(self, scale=1):
        """Weights for integral f r dr (the 2D polar measure's radial part)."""
        N = self.grid_size(scale)
        z, w_ab = jacobi_lib.quadrature(N, self.alpha[0], self.alpha[1], dtype=np.longdouble)
        # Integral weights against plain dr: project onto Legendre-exact rule
        z0, w0 = jacobi_lib.quadrature(N, 0, 0, dtype=np.longdouble)
        Q0 = jacobi_lib.polynomials(N, self.alpha[0], self.alpha[1], z0, dtype=np.longdouble)
        Qp = jacobi_lib.polynomials(N, self.alpha[0], self.alpha[1], z, dtype=np.longdouble)
        w_dr = (self.dR / 2) * ((Q0 @ w0).T @ (w_ab * Qp))
        r = np.asarray(self.global_grid(scale))
        return np.asarray(w_dr, dtype=np.float64) * r

    def grid_spacing(self, scale=1):
        r = np.asarray(self.global_grid(scale))
        dr = np.gradient(r)
        return np.abs(dr)

    @property
    def signed_pairs(self):
        """True when the parent azimuth stores signed (+m, -m) pairs."""
        return isinstance(self.parent.azimuth_basis, ExponentialAzimuthBasis)

    # --- transforms (tensorsig-aware: spin recombination + radial factor) ---

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        # data: (comps..., M_pairs, r_grid); azimuth already in coeff space
        r = np.asarray(self.global_grid(scale))
        if self.k:
            shape = [1] * data.ndim
            shape[axis] = r.size
            data = data * jnp.asarray((r / self.dR)**self.k).reshape(shape)
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=True, real=(np.dtype(dtype).kind == 'f'))
        return self._jacobi.forward_transform(data, axis, scale, dtype)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        data = self._jacobi.backward_transform(data, axis, scale, dtype)
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=False, real=(np.dtype(dtype).kind == 'f'))
        if self.k:
            r = np.asarray(self.global_grid(scale))
            shape = [1] * data.ndim
            shape[axis] = r.size
            data = data * jnp.asarray((self.dR / r)**self.k).reshape(shape)
        return data

    # --- operator matrices ---

    @CachedMethod
    def operator_matrix(self, op, m, spintotal, size=None):
        """Per-(m, spin) radial operators: 'D+', 'D-', 'L', 'E', 'Z', 'R'
        (parity: basis.py:2237 AnnulusBasis.operator_matrix)."""
        n = size if size is not None else self.size
        ms = m + spintotal
        if op[-1] in '+-':
            p = 1 if op[-1] == '+' else -1
            if ms == 0:
                p_eff, ms_eff = +1, 0
            elif ms < 0:
                p_eff, ms_eff = -p, -ms
            else:
                p_eff, ms_eff = p, ms
            return shell_lib.operator(2, self.radii, 'D', n, self.k,
                                      alpha=self.alpha, dl=p_eff, l=ms_eff)
        if op == 'L':
            # Laplacian: D(-/+) compositions at k+1 (pad to avoid truncation)
            if ms < 0:
                D1 = shell_lib.operator(2, self.radii, 'D', n + 2, self.k,
                                        alpha=self.alpha, dl=-1, l=-ms)
                D2 = shell_lib.operator(2, self.radii, 'D', n + 2, self.k + 1,
                                        alpha=self.alpha, dl=+1, l=-ms - 1)
            else:
                D1 = shell_lib.operator(2, self.radii, 'D', n + 2, self.k,
                                        alpha=self.alpha, dl=+1, l=ms)
                D2 = shell_lib.operator(2, self.radii, 'D', n + 2, self.k + 1,
                                        alpha=self.alpha, dl=-1, l=ms + 1)
            return sparse.csr_matrix(D2 @ D1)[:n, :n]
        if op in ('E', 'Z', 'R', 'AB', 'Id'):
            return shell_lib.operator(2, self.radii, op, n, self.k, alpha=self.alpha)
        raise ValueError(f"Unknown annulus operator: {op}")

    def conversion_matrix(self, out_basis):
        """k-raising conversion (m-independent)."""
        dk = out_basis.k - self.k
        if dk < 0:
            raise ValueError("Annulus conversion must raise k")
        mat = sparse.identity(self.size, format='csr')
        for i in range(int(dk)):
            E = shell_lib.operator(2, self.radii, 'E', self.size, self.k + i,
                                   alpha=self.alpha)
            mat = E @ mat
        return sparse.csr_matrix(mat)

    def interpolation_vector(self, position):
        return shell_lib.interpolation(self.radii, self.size, self.k,
                                       float(position), alpha=self.alpha)

    def integration_vector(self):
        """integral f(r) r dr over [r0, r1] as a row vector on k-coefficients."""
        N = self.size + self.k + 2
        z, w = jacobi_lib.quadrature(N, 0, 0, dtype=np.longdouble)  # Legendre in z
        r = (self.dR / 2) * (z + self.rho)
        a, b = self.alpha[0] + self.k, self.alpha[1] + self.k
        P = jacobi_lib.polynomials(self.size, a, b, z, dtype=np.longdouble)
        factor = (self.dR / r)**self.k * r * (self.dR / 2)
        vec = (P * (w * factor)).sum(axis=1)
        return sparse.csr_matrix(np.asarray(vec, dtype=np.float64)[None, :])

    def lift_matrix(self, index):
        col = np.zeros((self.size, 1))
        col[index, 0] = 1
        return sparse.csr_matrix(col)

    @CachedMethod
    def constant_column(self, m=0):
        """Expansion of the constant function 1 in this k-weighted basis."""
        if m != 0:
            return sparse.csr_matrix((self.size, 1))
        r = np.asarray(self.global_grid(1))
        fwd = self._jacobi.forward_matrix(1, np.float64)
        col = fwd @ (r / self.dR)**self.k
        return sparse.csr_matrix(col[:, None])

    def ncc_matrix(self, ncc_basis, out_basis, coeffs, m=0, spintotal=0, cutoff=1e-10):
        """
        Radial NCC multiplication (parity: basis.py:2272
        AnnulusBasis._last_axis_component_ncc_matrix): Clenshaw in the ncc's
        (a,b) family evaluated on the operand's Z matrix, with an AB^k_ncc
        prefactor accounting for the ncc's radial weight.
        """
        N = self.size
        a_ncc = ncc_basis.k + ncc_basis.alpha[0]
        b_ncc = ncc_basis.k + ncc_basis.alpha[1]
        Nmat = 3 * ((N + 1) // 2) + ncc_basis.k + 2
        J = self.operator_matrix('Z', m, spintotal, size=Nmat)
        S = clenshaw.matrix_clenshaw(np.ravel(coeffs)[:N], a_ncc, b_ncc, J, cutoff=cutoff)
        prefactor = sparse.identity(Nmat, format='csr')
        for i in range(ncc_basis.k):
            AB = shell_lib.operator(2, self.radii, 'AB', Nmat, self.k + i, alpha=self.alpha)
            prefactor = AB @ prefactor
        return sparse.csr_matrix(prefactor @ S)[:N, :N]


def spin_recombine(coordsys, tensorsig, data, azimuth_axis, forward, real):
    """
    Apply the coord<->spin unitary over each tensor rank belonging to
    `coordsys` (parity: basis.py:1595-1663). For real dtype the complex
    unitary acts on interleaved (cos, -sin) pairs via the standard
    [[Re, -Im], [Im, Re]] expansion. `azimuth_axis` indexes the FULL data
    array (tensor components included).
    """
    if not tensorsig:
        return data
    from .coords import DirectProduct
    s2 = getattr(coordsys, '_S2coordsys', None)
    for i, cs in enumerate(tensorsig):
        if cs is coordsys:
            U = coordsys.U_forward(1)
        elif s2 is not None and cs is s2:
            # Angular (S2) tensor ranks over a spherical parent
            U = cs.U_forward(1)
        elif isinstance(cs, DirectProduct) and coordsys in cs.coordsystems:
            # Product ranks: block-diagonal unitary (identity on the
            # straight subsystems, the spin unitary on this one)
            U = np.eye(cs.dim, dtype=complex)
            sl = cs.sub_slice(coordsys)
            U[sl, sl] = coordsys.U_forward(1)
        else:
            continue
        if not forward:
            U = U.T.conj()
        if real:
            M = data.shape[azimuth_axis]
            # Reshape azimuth axis into (M/2 pairs, 2)
            shape = data.shape
            new_shape = (shape[:azimuth_axis] + (M // 2, 2)
                         + shape[azimuth_axis + 1:])
            d = data.reshape(new_shape)
            pair_axis = azimuth_axis + 1
            # Build real 4x4 on (comp, pairelem): kron(URe, I2) + kron(UIm, R90)
            R90 = np.array([[0., -1.], [1., 0.]])
            W = np.kron(U.real, np.eye(2)) + np.kron(U.imag, R90)
            # Merge (comp i, pair) axes, apply W, split back
            d = jnp.moveaxis(d, (i, pair_axis), (0, 1))
            lead2 = d.shape[2:]
            dim = U.shape[0]
            d = d.reshape((dim * 2,) + lead2)
            d = jnp.tensordot(jnp.asarray(W), d, axes=[[1], [0]])
            d = d.reshape((dim, 2) + lead2)
            d = jnp.moveaxis(d, (0, 1), (i, pair_axis))
            data = d.reshape(shape)
        else:
            data = jnp.moveaxis(
                jnp.tensordot(jnp.asarray(U), data, axes=[[1], [i]]), 0, i)
    return data


class AnnulusBasis:
    """
    Annulus basis facade spanning (azimuth, radius) axes
    (parity: dedalus/core/basis.py:2011 AnnulusBasis).
    """

    dim = 2

    def __init__(self, coordsys, shape, radii=(1, 2), k=0, alpha=(-0.5, -0.5),
                 dealias=(1, 1), dtype=np.float64):
        if not isinstance(coordsys, PolarCoordinates):
            raise ValueError("Annulus requires PolarCoordinates")
        self.coordsys = coordsys
        self.shape = tuple(shape)
        self.radii = tuple(map(float, radii))
        self.k = int(k)
        self.alpha = tuple(map(float, alpha))
        if np.isscalar(dealias):
            dealias = (dealias, dealias)
        self.dealias = tuple(dealias)
        self.dtype = dtype
        self.volume = np.pi * (self.radii[1]**2 - self.radii[0]**2)
        self.azimuth_basis = make_azimuth_basis(
            coordsys.azimuth, self.shape[0], self.dealias[0], dtype)
        self.radial_basis = AnnulusRadialBasis(
            coordsys.radius, self.shape[1], self.radii, k=self.k,
            alpha=self.alpha, dealias=self.dealias[1], dtype=dtype, parent=self)

    @property
    def sub_bases(self):
        return (self.azimuth_basis, self.radial_basis)

    def clone_with(self, **kw):
        args = dict(coordsys=self.coordsys, shape=self.shape, radii=self.radii,
                    k=self.k, alpha=self.alpha, dealias=self.dealias, dtype=self.dtype)
        args.update(kw)
        return AnnulusBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    def S1_basis(self, radius=None):
        """Edge basis (azimuth circle) for boundary conditions."""
        return self.azimuth_basis

    def global_grids(self, scales=None):
        scales = scales or self.dealias
        return (self.azimuth_basis.global_grid(scales[0]),
                self.radial_basis.global_grid(scales[1]))

    def __repr__(self):
        return f"AnnulusBasis(shape={self.shape}, radii={self.radii}, k={self.k})"


def _azimuth_tensor_all_valid(tensorsig, cs):
    """Spin recombination binds components to parity pairs: tensors over the
    polar system keep all m=0 slots (parity: basis.py:1780 valid_elements)."""
    s2 = getattr(cs, '_S2coordsys', None)
    return any(t is cs or (s2 is not None and t is s2) for t in tensorsig)


def _azimuth_group_valid_mask(self, group, tensorsig=()):
    width = min(self.size, 2)
    if _azimuth_tensor_all_valid(tensorsig, self.coord.cs):
        return np.ones(width, dtype=bool)
    if group == 0:
        return np.array([True, False])[:width]
    return np.ones(width, dtype=bool)


def _azimuth_valid_coeff_mask(self, tensorsig=()):
    mask = np.ones(self.size, dtype=bool)
    if self.size > 1 and not _azimuth_tensor_all_valid(tensorsig, self.coord.cs):
        mask[1] = False
    return mask


AzimuthBasis.group_valid_mask = _azimuth_group_valid_mask
AzimuthBasis.valid_coeff_mask = _azimuth_valid_coeff_mask


class DiskRadialBasis(Basis):
    """
    Radial basis for the disk: per-m generalized Zernike polynomials
    Q_n^{(alpha+k, |m+s|)}(z), z = 2(r/R)^2 - 1 (parity: basis.py:2305
    DiskBasis). TPU-first design: RECTANGULAR coefficient storage (n = 0..Nmax
    for every m) with the reference's triangular truncation expressed through
    validity masks, so the per-(m, s) transforms batch as one (M/2, n, Nr)
    einsum on the MXU instead of ragged per-m loops.
    """

    ops_couple = True

    def __init__(self, coord, size, radius=1.0, k=0, alpha=0.0, dealias=1,
                 dtype=np.float64, parent=None):
        super().__init__(coord, size, (0, float(radius)), dealias=dealias, dtype=dtype)
        self.radius = float(radius)
        self.k = int(k)
        self.alpha = float(alpha)
        self.parent = parent

    # --- identity ---

    def _key(self):
        return ('DiskRadial', self.coord.name, self.size, self.radius, self.k,
                self.alpha, self.dealias)

    def __eq__(self, other):
        if isinstance(other, DiskRadialBasis):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def clone_with(self, **kw):
        args = dict(coord=self.coord, size=self.size, radius=self.radius, k=self.k,
                    alpha=self.alpha, dealias=self.dealias[0], dtype=self.dtype,
                    parent=self.parent)
        args.update(kw)
        return DiskRadialBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    # --- truncation ---

    @staticmethod
    def nmin(m):
        return abs(m) // 2

    def n_size(self, m):
        return self.size - self.nmin(m)

    # --- grids ---

    def _native_z(self, scale=1):
        z, w = zernike_lib.quadrature(2, self.grid_size(scale), k=self.alpha)
        return z, w

    def global_grid(self, scale=1):
        z, _ = self._native_z(scale)
        return self.radius * np.sqrt((1 + np.asarray(z, dtype=np.float64)) / 2)

    def global_weights(self, scale=1):
        """Weights for integral f(r) r dr on [0, R] (for alpha=0 these are the
        Zernike dV weights scaled by R^2)."""
        z, w = self._native_z(scale)
        return np.asarray(w, dtype=np.float64) * self.radius**2 * 2

    def grid_spacing(self, scale=1):
        r = np.asarray(self.global_grid(scale))
        return np.abs(np.gradient(r))

    # --- transforms: batched per-(m, s) Zernike MMT ---

    @property
    def signed_pairs(self):
        """True when the parent azimuth stores signed (+m, -m) pairs
        (complex dtype, ExponentialAzimuthBasis)."""
        return isinstance(self.parent.azimuth_basis, ExponentialAzimuthBasis)

    def _one_m_matrices(self, m_signed, s, z, w):
        """(proj, QkT) radial matrices for one signed azimuthal wavenumber."""
        n = self.size
        l = abs(m_signed + s)
        ns = self.n_size(m_signed)
        if ns <= 0:
            return np.zeros((n, z.size)), np.zeros((z.size, n))
        Q0 = zernike_lib.polynomials(2, ns, self.alpha, l, z)      # grid params
        proj = Q0 * np.asarray(w)
        if self.k:
            conv = sparse.identity(ns, format='csr')
            for i in range(self.k):
                E = zernike_lib.operator(2, 'E', +1, ns, self.alpha + i, l)
                conv = E @ conv
            proj = conv @ proj
        fwd = np.zeros((n, z.size))
        fwd[:ns, :] = proj
        Qk = zernike_lib.polynomials(2, ns, self.alpha + self.k, l, z)
        bwd = np.zeros((z.size, n))
        bwd[:, :ns] = Qk.T
        return fwd, bwd

    @CachedMethod
    def _transform_stacks(self, scale, s, direction):
        """Host stacks of per-m matrices: (KM+1, n, Nrg) / (KM+1, Nrg, n) for
        real (cos, -sin) pairs, or (KM+1, 2, n, Nrg) / (KM+1, 2, Nrg, n) for
        signed (+m, -m) pairs, whose slots use l = |m+s| and l = |-m+s|."""
        Nrg = self.grid_size(scale)
        M = self.parent.azimuth_basis.size
        KM = (M - 1) // 2
        z, w = zernike_lib.quadrature(2, Nrg, k=self.alpha)
        n = self.size
        if self.signed_pairs:
            fwd = np.zeros((KM + 1, 2, n, Nrg))
            bwd = np.zeros((KM + 1, 2, Nrg, n))
            for m in range(KM + 1):
                for slot, ms in enumerate((m, -m)):
                    f, b = self._one_m_matrices(ms, s, z, w)
                    fwd[m, slot] = f
                    bwd[m, slot] = b
            return np.ascontiguousarray(fwd if direction == 'f' else bwd)
        fwd = np.zeros((KM + 1, n, Nrg))
        bwd = np.zeros((KM + 1, Nrg, n))
        for m in range(KM + 1):
            f, b = self._one_m_matrices(m, s, z, w)
            fwd[m] = f
            bwd[m] = b
        return np.ascontiguousarray(fwd if direction == 'f' else bwd)

    def _apply_stack(self, data, axis, stack_np, out_size, tensorsig, comp_spins):
        """Apply per-m matrices batched over azimuthal pairs, per spin comp.
        Supports leading batch axes before the azimuth axis (e.g. cylinder
        geometry: Fourier x Disk, reference test_cylinder_* suites)."""
        n_tens = len(tensorsig)
        M = data.shape[-2]

        def apply(stack, comp):
            lead = comp.shape[:-2]
            cm = comp.reshape(lead + (M // 2, 2, comp.shape[-1]))
            if stack.ndim == 4:
                # Signed pairs: per-slot matrices
                res = jnp.einsum('mpon,...mpn->...mpo', stack, cm)
            else:
                res = jnp.einsum('mon,...mpn->...mpo', stack, cm)
            return res.reshape(lead + (M, out_size))

        # data: (comps..., lead..., M, nr_in); iterate components with spins
        if n_tens == 0:
            return apply(_stack_device(stack_np[0]), data)
        flat_comps = list(np.ndindex(*[cs.dim for cs in tensorsig]))
        out = jnp.zeros(tuple(cs.dim for cs in tensorsig)
                        + data.shape[n_tens:-1] + (out_size,), dtype=data.dtype)
        for idx in flat_comps:
            s = comp_spins[idx]
            out = out.at[idx].set(apply(_stack_device(stack_np[s]), data[idx]))
        return out

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=True, real=(np.dtype(dtype).kind == 'f'))
        stacks = {s: self._transform_stacks(scale, s, 'f')
                  for s in _spins_present(self.parent.coordsys, tensorsig)}
        spins = _comp_spin_map(self.parent.coordsys, tensorsig)
        return self._apply_stack(data, axis, stacks, self.size, tensorsig, spins)

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        stacks = {s: self._transform_stacks(scale, s, 'b')
                  for s in _spins_present(self.parent.coordsys, tensorsig)}
        spins = _comp_spin_map(self.parent.coordsys, tensorsig)
        data = self._apply_stack(data, axis, stacks, self.grid_size(scale), tensorsig, spins)
        data = spin_recombine(self.parent.coordsys, tensorsig, data, axis - 1,
                              forward=False, real=(np.dtype(dtype).kind == 'f'))
        return data

    # --- validity ---

    def group_valid_for_m(self, m, tensorsig=()):
        """Radial validity for azimuthal group m (rectangular storage)."""
        mask = np.zeros(self.size, dtype=bool)
        mask[:self.n_size(m)] = True
        return mask

    # --- operator matrices ---

    @CachedMethod
    def operator_matrix(self, op, m, spintotal, size=None):
        """Per-(m, spin) radial operators (parity: DiskBasis.operator_matrix),
        padded to rectangular size with zero rows/cols outside n_size(m)."""
        n = size if size is not None else self.size
        ms = m + spintotal
        l = abs(ms)
        kk = self.alpha + self.k
        if op[-1] in '+-':
            p = 1 if op[-1] == '+' else -1
            if ms == 0:
                p = +1
            elif ms < 0:
                p = -p
            base = op[:-1]
            mat = zernike_lib.operator(2, base, p, n, kk, l, radius=self.radius)
        elif op == 'L':
            if ms < 0:
                D1 = zernike_lib.operator(2, 'D', -1, n + 2, kk, l, radius=self.radius)
                D2 = zernike_lib.operator(2, 'D', +1, n + 2, kk + 1, l - 1, radius=self.radius)
            else:
                D1 = zernike_lib.operator(2, 'D', +1, n + 2, kk, l, radius=self.radius)
                D2 = zernike_lib.operator(2, 'D', -1, n + 2, kk + 1, l + 1, radius=self.radius)
            mat = sparse.csr_matrix(D2 @ D1)[:n, :n]
        elif op == 'E':
            mat = zernike_lib.operator(2, 'E', +1, n, kk, l)
        elif op in ('Z', 'Id'):
            mat = zernike_lib.operator(2, op, 0, n, kk, l)
        else:
            raise ValueError(f"Unknown disk operator: {op}")
        return sparse.csr_matrix(mat)

    @CachedMethod
    def conversion_matrix_m(self, m, spintotal, dk):
        l = abs(m + spintotal)
        mat = sparse.identity(self.size, format='csr')
        for i in range(dk):
            E = zernike_lib.operator(2, 'E', +1, self.size, self.alpha + self.k + i, l)
            mat = E @ mat
        return sparse.csr_matrix(mat)

    @CachedMethod
    def interpolation_m(self, m, spintotal, position):
        znat = 2 * (float(position) / self.radius)**2 - 1
        Q = zernike_lib.polynomials(2, self.size, self.alpha + self.k,
                                    abs(m + spintotal), np.array([znat]))
        return sparse.csr_matrix(Q[:, 0][None, :])

    def ncc_matrix_m(self, ncc_basis, out_basis, coeffs, m, spintotal, cutoff=1e-10):
        """Scalar axisymmetric NCC (spin 0) special case of ncc_comp_matrix."""
        return self.ncc_comp_matrix(ncc_basis, out_basis, coeffs, m,
                                    0, spintotal, cutoff=cutoff)

    def ncc_comp_matrix(self, ncc_basis, out_basis, coeffs, m, s_ncc, s_arg,
                        cutoff=1e-10):
        """
        Radial multiplication matrix of one (m=0) NCC spin component s_ncc
        acting on the (m, s_arg) operand component, producing the
        (m, s_ncc + s_arg) output component (parity: reference basis.py:2554
        DiskBasis._last_axis_component_ncc_matrix). The NCC's Zernike
        functions Q_n^{(a, l_ncc)} = kappa * (r/R)^{l_ncc} * P_n^{(a, l_ncc)}(z)
        with kappa = 2 * 2^{(a + l_ncc)/2}: the polynomial part is Clenshaw on
        the operand's Z operator (unpadded: truncated mode algebra, matching
        the dealiased pipeline), and the (r/R)^{l_ncc} envelope is applied by
        Zernike R+- ladder operators carrying l_arg -> l_out. Returns None if
        the spin selection rule (d = l_ncc - |l_out - l_arg| even >= 0) fails.
        """
        N = self.size
        a_ncc = ncc_basis.alpha + ncc_basis.k
        l_ncc = abs(s_ncc)
        s_out = s_ncc + s_arg
        l_arg = abs(m + s_arg)
        l_out = abs(m + s_out)
        dreg = l_out - l_arg
        d = l_ncc - abs(dreg)
        if d < 0 or d % 2:
            return None
        kk = self.alpha + self.k
        J = self.operator_matrix('Z', m, s_arg, size=N)
        kappa = 2 * 2**((a_ncc + l_ncc) / 2)
        S = clenshaw.matrix_clenshaw(kappa * np.ravel(coeffs)[:N], a_ncc,
                                     float(l_ncc), J, cutoff=cutoff)
        # (r/R)^{l_ncc} envelope: |dreg| ladder steps l_arg -> l_out, then
        # (d/2) neutral r^2 factors
        if l_ncc:
            pre = sparse.identity(N, format='csr')
            l_cur = l_arg
            sgn = 1 if dreg >= 0 else -1
            for _ in range(abs(dreg)):
                Rop = sparse.csr_matrix(
                    zernike_lib.operator(2, 'R', sgn, N, kk, l_cur, radius=1))
                pre = Rop @ pre
                l_cur += sgn
            for _ in range(d // 2):
                Rp = sparse.csr_matrix(
                    zernike_lib.operator(2, 'R', +1, N, kk, l_cur, radius=1))
                Rm = sparse.csr_matrix(
                    zernike_lib.operator(2, 'R', -1, N, kk, l_cur + 1, radius=1))
                pre = (Rm @ Rp) @ pre
            S = pre @ S
        S = sparse.csr_matrix(S)[:N, :N]
        dk_out = int(round(out_basis.k - self.k))
        if dk_out:
            S = self.conversion_matrix_m(m, s_out, dk_out) @ S
        return sparse.csr_matrix(S)

    def integration_vector(self):
        """m=0 radial integral: integral f r dr on [0, R]."""
        Nq = self.size + self.k + 2
        z, w = zernike_lib.quadrature(2, Nq, k=0)
        Q = zernike_lib.polynomials(2, self.size, self.alpha + self.k, 0, z)
        vec = (Q * np.asarray(w)).sum(axis=1) * self.radius**2 * 2
        return sparse.csr_matrix(np.asarray(vec, dtype=np.float64)[None, :])

    def lift_matrix(self, index):
        col = np.zeros((self.size, 1))
        col[index, 0] = 1
        return sparse.csr_matrix(col)

    @CachedMethod
    def constant_column(self, m=0):
        """Expansion of the constant function 1 (m = 0 only)."""
        if m != 0:
            return sparse.csr_matrix((self.size, 1))
        fwd = self._transform_stacks(1, 0, 'f')[0]
        if fwd.ndim == 3:   # signed pairs: the +0 slot
            fwd = fwd[0]
        col = fwd @ np.ones(fwd.shape[1])
        return sparse.csr_matrix(col[:, None])


def _spins_present(cs, tensorsig):
    if not tensorsig:
        return (0,)
    spins = set()
    for idx in np.ndindex(*[t.dim for t in tensorsig]):
        spins.add(cs.spintotal(tensorsig, idx))
    return tuple(sorted(spins))


def _comp_spin_map(cs, tensorsig):
    out = {}
    for idx in np.ndindex(*[t.dim for t in tensorsig]):
        out[idx] = cs.spintotal(tensorsig, idx)
    return out


_STACK_DEVICE_CACHE = {}


def _stack_device(np_stack):
    from .basis import _tracing
    from ..ops import hoist
    sub = hoist.lookup(np_stack)
    if sub is not None:
        return sub
    if _tracing():
        return np_stack
    key = id(np_stack)
    if key not in _STACK_DEVICE_CACHE:
        _STACK_DEVICE_CACHE[key] = (np_stack, jnp.asarray(np_stack))
    return _STACK_DEVICE_CACHE[key][1]


class DiskBasis:
    """Disk basis facade spanning (azimuth, radius) (parity: basis.py:2305)."""

    dim = 2

    def __init__(self, coordsys, shape, radius=1.0, k=0, alpha=0.0,
                 dealias=(1, 1), dtype=np.float64):
        if not isinstance(coordsys, PolarCoordinates):
            raise ValueError("Disk requires PolarCoordinates")
        self.coordsys = coordsys
        self.shape = tuple(shape)
        self.radius = float(radius)
        self.k = int(k)
        self.alpha = float(alpha)
        if np.isscalar(dealias):
            dealias = (dealias, dealias)
        self.dealias = tuple(dealias)
        self.dtype = dtype
        self.volume = np.pi * radius**2
        self.azimuth_basis = make_azimuth_basis(
            coordsys.azimuth, self.shape[0], self.dealias[0], dtype)
        self.radial_basis = DiskRadialBasis(
            coordsys.radius, self.shape[1], radius=self.radius, k=self.k,
            alpha=self.alpha, dealias=self.dealias[1], dtype=dtype, parent=self)

    @property
    def sub_bases(self):
        return (self.azimuth_basis, self.radial_basis)

    @property
    def edge(self):
        return self.azimuth_basis

    def S1_basis(self, radius=None):
        return self.azimuth_basis

    def clone_with(self, **kw):
        args = dict(coordsys=self.coordsys, shape=self.shape, radius=self.radius,
                    k=self.k, alpha=self.alpha, dealias=self.dealias, dtype=self.dtype)
        args.update(kw)
        return DiskBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    def global_grids(self, scales=None):
        scales = scales or self.dealias
        return (self.azimuth_basis.global_grid(scales[0]),
                self.radial_basis.global_grid(scales[1]))

    def __repr__(self):
        return f"DiskBasis(shape={self.shape}, radius={self.radius}, k={self.k})"
