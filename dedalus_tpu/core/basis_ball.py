"""
Ball basis: 3D spherical domain (azimuth x colatitude x radius) built from
spin-weighted spherical harmonics and generalized 3D Zernike radial functions.

Parity target (behavior): dedalus/core/basis.py:3422 (RegularityBasis),
:3917 (BallRadialBasis), :4597 (BallBasis), with the radial transforms of
dedalus_sphere/zernike.py. TPU-first design, mirroring the disk/sphere bases:
RECTANGULAR (m, ell-slot, n) coefficient storage (colatitude slot j of
azimuthal mode m holds ell = |m| + j; radial slot n valid while
n < Nmax+1 - ell//2), so the per-(m, ell) radial transforms batch as ONE
(M/2, L, n, Nr) MXU einsum instead of ragged per-ell loops, and the
triangular truncation lives in validity masks + identity pivots.

Scope: scalars end-to-end (transforms, Laplacian, lift, interpolation,
radial NCCs -- the Lane-Emden class) plus TENSOR transforms and calculus via
the per-ell regularity recombination (spectral/intertwiner.py Q matrices,
oracle-validated): grad/div/lap on ball and shell agree with analytic fields
and their subproblem matrices match eager evaluation to machine precision.
Tensor NCCs (rvec * scalar, dot(rvec, u), first-order tau formulations) run
through envelope-shifted Zernike products (ncc_comp_matrix_ell) with the
Gamma intertwiner coupling in arithmetic._spherical_ncc_matrix.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .basis import Basis
from .basis_polar import AzimuthBasis, make_azimuth_basis, _stack_device
from .basis_sphere import ColatitudeBasis
from .coords import SphericalCoordinates
from ..utils.caching import CachedMethod
from ..spectral import zernike as zernike_lib
from ..spectral import shell as shell_lib
from ..spectral import intertwiner as intertwiner_lib
from ..spectral import clenshaw as clenshaw_lib


class SphericalRadialBasis:
    """Mixin for 3D spherical radial bases (ball and shell): the per-m block
    interface (block_diag_m, conversion_block_m, interpolation_ell,
    lift_block_m, ncc_block_m, joint_valid_for_m) plus the per-ell
    regularity<->spin recombination shared by tensor transforms."""

    def _check_tensorsig(self, tensorsig):
        for cs in tensorsig:
            if cs is not self.parent.coordsys:
                raise NotImplementedError(
                    "Spherical tensors must be over the spherical coordinate system")

    @property
    def signed_pairs(self):
        """True when the parent azimuth stores signed (+m, -m) pairs
        (complex dtype, ExponentialAzimuthBasis). The per-(m, ell) radial
        stacks are sign-symmetric (ell = |m| + slot), so only the validity
        of the m = 0 dead slot differs."""
        from .basis_polar import ExponentialAzimuthBasis
        return isinstance(self.parent.azimuth_basis, ExponentialAzimuthBasis)

    def _Q_stack_host(self, rank):
        """Host stack (KM+1, L, 3^r, 3^r) of regularity-to-spin intertwiners
        at ell = |m| + slot."""
        key = ('Qstack', rank)
        cache = self.__dict__.setdefault('_q_cache', {})
        if key not in cache:
            M = self.parent.azimuth_basis.size
            KM = (M - 1) // 2
            L = self.parent.colatitude_basis.size
            C = 3**rank
            Q = np.zeros((KM + 1, L, C, C))
            for m in range(KM + 1):
                for j in range(L - abs(m)):
                    Q[m, j] = intertwiner_lib.Q_matrix(abs(m) + j, rank)
            cache[key] = np.ascontiguousarray(Q)
        return cache[key]

    def _regularity_recombine(self, data, tensorsig, forward):
        """Mix tensor components per (m, ell): spin <-> regularity."""
        rank = len(tensorsig)
        if rank == 0:
            return data
        C = 3**rank
        M = data.shape[-3]
        L = data.shape[-2]
        P = max(M // 2, 1)
        Qs = _stack_device(self._Q_stack_host(rank))
        if (M, L) == (1, 1) and Qs.shape[:2] != (1, 1):
            # Standalone radial field: constant angular axes -> ell = 0 slot
            Qs = Qs[:1, :1]
        d = data.reshape((C, P, M // P) + data.shape[-2:])
        if forward:
            res = jnp.einsum('mlba,bmpln->ampln', Qs, d)  # reg = Q^T spin
        else:
            res = jnp.einsum('mlab,bmpln->ampln', Qs, d)
        return res.reshape(data.shape)


class BallRadialBasis(SphericalRadialBasis, Basis):
    """
    Radial basis for the ball: per-ell generalized 3D Zernike polynomials
    Q_n^{(alpha+k, ell + 1/2)}(z), z = 2(r/R)^2 - 1, with the r^ell envelope
    built into the basis functions (parity: basis.py:3917).
    """

    ops_couple = True

    def __init__(self, coord, size, radius=1.0, k=0, alpha=0.0, dealias=1,
                 dtype=np.float64, parent=None, triangular=True):
        super().__init__(coord, size, (0, float(radius)), dealias=dealias, dtype=dtype)
        self.radius = float(radius)
        self.k = int(k)
        self.alpha = float(alpha)
        self.parent = parent
        self.triangular = bool(triangular)

    # --- identity ---

    def _key(self):
        return ('BallRadial', self.coord.name, self.size, self.radius, self.k,
                self.alpha, self.dealias, self.triangular)

    def __eq__(self, other):
        if isinstance(other, BallRadialBasis):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def clone_with(self, **kw):
        args = dict(coord=self.coord, size=self.size, radius=self.radius, k=self.k,
                    alpha=self.alpha, dealias=self.dealias[0], dtype=self.dtype,
                    parent=self.parent, triangular=self.triangular)
        args.update(kw)
        return BallRadialBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    # --- truncation (parity: BallRadialBasis._nmin = ell//2; triangular=False
    # keeps the full radial rectangle at every ell, which makes the per-group
    # matrix structure uniform so bordered-banded solves stay nonsingular) ---

    def n_size(self, ell):
        if not self.triangular:
            return self.size
        return max(self.size - ell // 2, 0)

    def _lmax(self):
        return self.parent.colatitude_basis.Lmax

    # --- grids ---

    def _native_z(self, scale=1):
        z, w = zernike_lib.quadrature(3, self.grid_size(scale), k=self.alpha)
        return np.asarray(z, dtype=np.float64), np.asarray(w, dtype=np.float64)

    def global_grid(self, scale=1):
        z, _ = self._native_z(scale)
        return self.radius * np.sqrt((1 + z) / 2)

    def global_weights(self, scale=1):
        """Weights for integral f(r) r^2 dr on [0, R] (alpha=0)."""
        _, w = self._native_z(scale)
        return w * self.radius**3

    def grid_spacing(self, scale=1):
        r = np.asarray(self.global_grid(scale))
        return np.abs(np.gradient(r))

    # --- transforms: batched per-(m, ell) Zernike MMT (scalars) ---

    @CachedMethod
    def _transform_stacks(self, scale, reg, direction):
        """Host stacks (KM+1, L, n, Nrg) / (KM+1, L, Nrg, n): the radial
        matrix for azimuthal mode m, colatitude slot j is the Zernike MMT at
        ell = |m| + j (+ regularity total for tensors)."""
        Nrg = self.grid_size(scale)
        M = self.parent.azimuth_basis.size
        KM = (M - 1) // 2
        L = self.parent.colatitude_basis.size
        z, w = self._native_z(scale)
        n = self.size
        fwd = np.zeros((KM + 1, L, n, Nrg))
        bwd = np.zeros((KM + 1, L, Nrg, n))
        for m in range(KM + 1):
            for j in range(L - abs(m)):
                ell = abs(m) + j
                l_eff = ell + reg
                ns = self.n_size(ell)
                if ns <= 0 or l_eff < 0:
                    continue
                Q0 = zernike_lib.polynomials(3, ns, self.alpha, l_eff, z)
                proj = Q0 * w
                if self.k:
                    conv = sparse.identity(ns, format='csr')
                    for i in range(self.k):
                        E = zernike_lib.operator(3, 'E', +1, ns, self.alpha + i, l_eff)
                        conv = E @ conv
                    proj = conv @ proj
                fwd[m, j, :ns, :] = proj
                Qk = zernike_lib.polynomials(3, ns, self.alpha + self.k, l_eff, z)
                bwd[m, j, :, :ns] = Qk.T
        return np.ascontiguousarray(fwd if direction == 'f' else bwd)

    def _apply_stack(self, data, stack_np, out_size):
        """data (..., M, L, N_in) -> (..., M, L, out_size), batched einsum.

        Standalone radial-basis fields carry constant angular axes (M = L = 1);
        their content lives in the m = 0, ell = 0 slot of the per-(m, slot)
        stacks (parity: reference radial bases transform at ell = 0,
        basis.py:3917)."""
        M = data.shape[-3]
        L = data.shape[-2]
        P = max(M // 2, 1)
        stack = _stack_device(stack_np)
        if (M, L) == (1, 1) and stack_np.shape[:2] != (1, 1):
            stack = stack[:1, :1]
        lead = data.shape[:-3]
        dm = data.reshape(lead + (P, M // P if P else M, L, data.shape[-1]))
        res = jnp.einsum('mlon,...mpln->...mplo', stack, dm)
        return res.reshape(lead + (M, L, out_size))

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        self._check_tensorsig(tensorsig)
        if not tensorsig:
            return self._apply_stack(data, self._transform_stacks(scale, 0, 'f'),
                                     self.size)
        # Spin -> regularity components per (m, ell), then per-regtotal radial
        rank = len(tensorsig)
        shape0 = data.shape
        data = data.reshape((3**rank,) + shape0[rank:])
        data = self._regularity_recombine(data, tensorsig, forward=True)
        out = jnp.zeros((3**rank,) + shape0[rank:-1] + (self.size,), dtype=data.dtype)
        for flat, idx in enumerate(np.ndindex(*(3,) * rank)):
            reg = intertwiner_lib.regtotal(idx)
            stack = self._transform_stacks(scale, reg, 'f')
            out = out.at[flat].set(self._apply_stack(data[flat], stack, self.size))
        return out.reshape(shape0[:rank] + out.shape[1:])

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        self._check_tensorsig(tensorsig)
        if not tensorsig:
            return self._apply_stack(data, self._transform_stacks(scale, 0, 'b'),
                                     self.grid_size(scale))
        rank = len(tensorsig)
        shape0 = data.shape
        Ng = self.grid_size(scale)
        data = data.reshape((3**rank,) + shape0[rank:])
        out = jnp.zeros((3**rank,) + shape0[rank:-1] + (Ng,), dtype=data.dtype)
        for flat, idx in enumerate(np.ndindex(*(3,) * rank)):
            reg = intertwiner_lib.regtotal(idx)
            stack = self._transform_stacks(scale, reg, 'b')
            out = out.at[flat].set(self._apply_stack(data[flat], stack, Ng))
        out = self._regularity_recombine(out, tensorsig, forward=False)
        return out.reshape(shape0[:rank] + out.shape[1:])

    # --- validity: JOINT over (ell-slot, n) for azimuthal group m ---

    def joint_valid_for_m(self, m, tensorsig=(), comp_idx=(), az_w=1):
        """Flattened (az pair, L, n) mask: slot j holds ell = |m|+j; radial
        slot n valid while n < n_size(ell); tensor components additionally
        require their regularity class to exist at ell. The m=0 sin parts
        follow the cos parts except (ell == 0, sin) drops for rank <= 1
        (ref basis.py:3204-3210)."""
        L = self.parent.colatitude_basis.size
        mask = np.zeros((L, self.size), dtype=bool)
        for j in range(max(L - abs(m), 0)):
            ell = abs(m) + j
            if comp_idx and not intertwiner_lib.regularity_allowed(ell, comp_idx):
                continue
            mask[j, :self.n_size(ell)] = True
        out = np.zeros((az_w,) + mask.shape, dtype=bool)
        out[0] = mask
        if az_w > 1:
            if self.signed_pairs:
                out[1] = np.zeros_like(mask) if m == 0 else mask
                return out.ravel()
            sinmask = mask.copy()
            if len(tensorsig) <= 1 and m == 0:
                sinmask[0] = False  # slot j = 0 holds ell = 0 at m = 0
            out[1] = sinmask
        return out.ravel()

    # --- operator matrices: block-diagonal over ell slots for a given m ---

    @CachedMethod
    def operator_matrix_ell(self, op, ell, reg, size=None, truncate=True):
        """Radial operator at a single (ell, regtotal), padded rectangular.
        truncate=False keeps the full matrix (e.g. the Clenshaw Jacobi
        operand, where the recursion needs untruncated entries)."""
        n = size if size is not None else self.size
        l_eff = ell + reg
        kk = self.alpha + self.k
        if op == 'L':
            # Scalar/fixed-ell Laplacian: D(-1) @ D(+1) (k -> k+2)
            D1 = zernike_lib.operator(3, 'D', +1, n + 2, kk, l_eff, radius=self.radius)
            D2 = zernike_lib.operator(3, 'D', -1, n + 2, kk + 1, l_eff + 1, radius=self.radius)
            mat = sparse.csr_matrix(D2 @ D1)[:n, :n]
        elif op[-1] in '+-':
            p = 1 if op[-1] == '+' else -1
            mat = zernike_lib.operator(3, op[:-1], p, n, kk, l_eff, radius=self.radius)
        elif op == 'E':
            mat = zernike_lib.operator(3, 'E', +1, n, kk, l_eff)
        elif op in ('Z', 'Id'):
            mat = zernike_lib.operator(3, op, 0, n, kk, l_eff)
        else:
            raise ValueError(f"Unknown ball radial operator: {op}")
        mat = sparse.csr_matrix(mat)
        out = sparse.lil_matrix((n, n))
        r, c = mat.shape
        out[:min(r, n), :min(c, n)] = mat[:min(r, n), :min(c, n)]
        if truncate:
            # Zero out invalid rows/cols (outside triangular truncation)
            ns = self.n_size(ell)
            out[ns:, :] = 0
            out[:, ns:] = 0
        return sparse.csr_matrix(out)

    def block_diag_m(self, op, m, reg=0, size=None):
        """(L*n x L*n) block-diagonal operator over colatitude slots."""
        L = self.parent.colatitude_basis.size
        n = size if size is not None else self.size
        blocks = []
        for j in range(L):
            ell = abs(m) + j
            if j < L - abs(m) and self.n_size(ell) > 0:
                blocks.append(self.operator_matrix_ell(op, ell, reg, size=n))
            else:
                blocks.append(sparse.csr_matrix((n, n)))
        return sparse.block_diag(blocks, format='csr')

    @CachedMethod
    def conversion_matrix_ell(self, ell, reg, dk, size=None):
        n = size if size is not None else self.size
        l_eff = ell + reg
        mat = sparse.identity(n, format='csr')
        for i in range(dk):
            E = zernike_lib.operator(3, 'E', +1, n, self.alpha + self.k + i, l_eff)
            r, c = E.shape
            Ep = sparse.lil_matrix((n, n))
            Ep[:min(r, n), :min(c, n)] = E[:min(r, n), :min(c, n)]
            mat = sparse.csr_matrix(Ep) @ mat
        return sparse.csr_matrix(mat)

    def conversion_block_m(self, m, dk, reg=0):
        L = self.parent.colatitude_basis.size
        n = self.size
        blocks = []
        for j in range(L):
            ell = abs(m) + j
            if j < L - abs(m) and self.n_size(ell) > 0:
                blocks.append(self.conversion_matrix_ell(ell, reg, dk))
            else:
                blocks.append(sparse.csr_matrix((n, n)))
        return sparse.block_diag(blocks, format='csr')

    @CachedMethod
    def interpolation_ell(self, ell, reg, position):
        """Row vector of radial basis values at r=position for one ell."""
        native_z = 2 * (position / self.radius)**2 - 1
        ns = self.n_size(ell)
        row = np.zeros(self.size)
        if ns > 0:
            Q = zernike_lib.polynomials(3, ns, self.alpha + self.k, ell + reg,
                                        np.array([native_z]))
            row[:ns] = Q[:, 0]
        return row

    def lift_block_m(self, m, index, reg=0):
        """(L*n x L) lift: surface (per-ell) values into radial mode `index`
        of each ell (parity: Lift into the ball basis, basis.py Lift)."""
        L = self.parent.colatitude_basis.size
        n = self.size
        mat = sparse.lil_matrix((L * n, L))
        for j in range(L):
            ell = abs(m) + j
            ns = self.n_size(ell)
            if j < L - abs(m) and ns > 0:
                mat[j * n + (ns + index if index < 0 else index), j] = 1
        return sparse.csr_matrix(mat)

    # --- NCC: radial Clenshaw per ell (spherically-symmetric NCCs) ---


    def constant_spatial_column(self):
        """Column embedding the constant function 1 into the (colat slot,
        radial) coefficient block: ell=0 slot gets the radial expansion of 1
        times the colatitude constant-mode normalization."""
        L = self.parent.colatitude_basis.size
        n = self.size
        fwd = self._transform_stacks(1, 0, 'f')  # (KM+1, L, n, Nrg)
        col = np.zeros((L * n, 1))
        col[:n, 0] = fwd[0, 0] @ np.ones(fwd.shape[-1])
        col /= self.parent.colatitude_basis.constant_mode_value()
        return sparse.csr_matrix(col)

    def ncc_block_m(self, m, ncc_radial_coeffs, ncc_k, ncc_alpha, dk_out,
                    cutoff=1e-10, reg=0):
        """
        (L*n x L*n) multiplication matrix by a spherically symmetric (ell=0)
        NCC, block-diagonal over ell (multiplication by an ell=0 function maps
        each ell to itself). For tensor operands, the target component's
        regularity total shifts the Zernike family: the component at ell is
        expanded at l_eff = ell + reg, so the Clenshaw recursion and the
        conversion run in that family. Parity: basis.py:4088
        _last_axis_component_ncc_matrix.
        """
        L = self.parent.colatitude_basis.size
        n = self.size
        from ..spectral import jacobi as jacobi_lib
        a_ncc = ncc_alpha + ncc_k
        b_ncc = 0.5
        N0 = len(ncc_radial_coeffs)
        Nmat = 3 * ((N0 + 1) // 2) + n
        # Zernike phi_0 (constant first radial polynomial) replaces the Jacobi
        # normalization baked into matrix_clenshaw; the recurrence ratios are
        # identical, so the correction is the pure rescale Q_0(z)/phat_0(z)
        # (computed numerically to stay convention-proof)
        zprobe = np.array([0.5])
        f0 = float(zernike_lib.polynomials(3, 1, a_ncc, 0, zprobe)[0, 0])
        p0_jac = float(jacobi_lib.polynomials(1, a_ncc, b_ncc, zprobe)[0, 0])
        rescale = f0 / p0_jac
        blocks = []
        for j in range(L):
            ell = abs(m) + j
            ns = self.n_size(ell)
            if j >= L - abs(m) or ns <= 0 or ell + reg < 0:
                blocks.append(sparse.csr_matrix((n, n)))
                continue
            J = self.operator_matrix_ell('Z', ell, reg, size=Nmat, truncate=False)
            mat = rescale * clenshaw_lib.matrix_clenshaw(
                np.asarray(ncc_radial_coeffs), a_ncc, b_ncc, J, cutoff=cutoff)
            if dk_out:
                conv = self.conversion_matrix_ell(ell, reg, dk_out, size=Nmat)
                mat = conv @ mat
            mat = sparse.csr_matrix(mat)[:n, :n].tolil()
            mat[ns:, :] = 0
            mat[:, ns:] = 0
            blocks.append(sparse.csr_matrix(mat))
        return sparse.block_diag(blocks, format='csr')

    def ncc_comp_matrix_ell(self, ncc_radial_coeffs, ncc_k, ncc_alpha, ell,
                            reg_ncc, reg_arg, reg_out, dk_out, cutoff=1e-10):
        """
        (n x n) radial multiplication matrix of one ell=0 NCC regularity
        component (regtotal reg_ncc) acting on the operand component at
        (ell, reg_arg), producing the (ell, reg_out) output component
        (parity: reference basis.py:4088 BallRadialBasis
        _last_axis_component_ncc_matrix). The NCC component's Zernike
        functions carry an r^{reg_ncc} envelope: the polynomial-in-z part is
        Clenshaw on the operand family's Z operator, and the envelope is
        applied by |reg_out - reg_arg| Zernike R+- ladder steps carrying
        l = ell + reg_arg -> ell + reg_out plus d/2 neutral r^2 pairs, with
        d = reg_ncc - |reg_out - reg_arg|. Returns None if the regularity
        selection rule (d even >= 0) fails or a family is forbidden.
        """
        from ..spectral import jacobi as jacobi_lib
        n = self.size
        l_ncc = int(reg_ncc)
        l_arg = ell + reg_arg
        l_out = ell + reg_out
        dreg = reg_out - reg_arg
        d = l_ncc - abs(dreg)
        if l_ncc < 0 or l_arg < 0 or l_out < 0 or d < 0 or d % 2:
            return None
        kk = self.alpha + self.k
        a_ncc = ncc_alpha + ncc_k
        b_ncc = l_ncc + 0.5
        N0 = len(ncc_radial_coeffs)
        Nmat = 3 * ((N0 + 1) // 2) + n + abs(dk_out)
        # Rescale between the Zernike z-polynomial normalization and the
        # Jacobi convention inside matrix_clenshaw: probe the n=0 ratio
        # (recurrence ratios match, so one probe fixes every degree), with
        # the (1+z)^{l/2} envelope divided out of the Zernike value and the
        # sqrt(1/2)-per-ladder-step normalization folded back in.
        zprobe = np.array([0.5])
        f0 = float(zernike_lib.polynomials(3, 1, a_ncc, l_ncc, zprobe)[0, 0])
        f0_poly = f0 / (1 + zprobe[0]) ** (l_ncc / 2)
        p0_jac = float(jacobi_lib.polynomials(1, a_ncc, b_ncc, zprobe)[0, 0])
        rescale = 2 ** (l_ncc / 2) * f0_poly / p0_jac
        J = self.operator_matrix_ell('Z', ell, reg_arg, size=Nmat, truncate=False)
        mat = rescale * clenshaw_lib.matrix_clenshaw(
            np.asarray(ncc_radial_coeffs), a_ncc, b_ncc, J, cutoff=cutoff)
        if l_ncc:
            pre = sparse.identity(Nmat, format='csr')
            l_cur = l_arg
            sgn = 1 if dreg >= 0 else -1
            for _ in range(abs(dreg)):
                Rop = sparse.csr_matrix(zernike_lib.operator(
                    3, 'R', sgn, Nmat, kk, l_cur, radius=self.radius))
                pre = _pad_square(Rop, Nmat) @ pre
                l_cur += sgn
            for _ in range(d // 2):
                Rp = sparse.csr_matrix(zernike_lib.operator(
                    3, 'R', +1, Nmat, kk, l_cur, radius=self.radius))
                Rm = sparse.csr_matrix(zernike_lib.operator(
                    3, 'R', -1, Nmat, kk, l_cur + 1, radius=self.radius))
                pre = _pad_square(Rm, Nmat) @ _pad_square(Rp, Nmat) @ pre
            mat = pre @ mat
        if dk_out:
            conv = self.conversion_matrix_ell(ell, reg_out, dk_out, size=Nmat)
            mat = conv @ mat
        mat = sparse.csr_matrix(mat)[:n, :n].tolil()
        ns = self.n_size(ell)
        mat[ns:, :] = 0
        mat[:, ns:] = 0
        return sparse.csr_matrix(mat)


def _pad_square(mat, n):
    """Embed a (possibly rectangular) sparse operator in an (n x n) square."""
    mat = sparse.csr_matrix(mat)
    if mat.shape == (n, n):
        return mat
    out = sparse.lil_matrix((n, n))
    r, c = min(mat.shape[0], n), min(mat.shape[1], n)
    out[:r, :c] = mat[:r, :c]
    return sparse.csr_matrix(out)


class SphericalShellRadialBasis(SphericalRadialBasis, Basis):
    """
    Radial basis for the 3D spherical shell: the annulus's weighted Jacobi
    family f(r) = (dR/r)^k sum_n c_n P_n^{(a,b)}(z) with dim=3 covariant
    derivative shifts (parity: basis.py:3682 ShellRadialBasis). No triangular
    truncation (n_size is ell-independent); only the D/Laplacian blocks depend
    on ell, so conversions/NCCs stay single-kron.
    """

    ops_couple = True

    def __init__(self, coord, size, radii, k=0, alpha=(-0.5, -0.5), dealias=1,
                 dtype=np.float64, parent=None):
        super().__init__(coord, size, radii, dealias=dealias, dtype=dtype)
        from .basis import Jacobi
        self.radii = tuple(map(float, radii))
        self.k = int(k)
        self.alpha = tuple(map(float, alpha))
        self.parent = parent
        self.dR = self.radii[1] - self.radii[0]
        self.rho = (self.radii[1] + self.radii[0]) / self.dR
        self._jacobi = Jacobi(coord, size, radii,
                              a=self.alpha[0] + self.k, b=self.alpha[1] + self.k,
                              a0=self.alpha[0], b0=self.alpha[1],
                              dealias=dealias, dtype=dtype)

    def _key(self):
        return ('SphShellRadial', self.coord.name, self.size, self.radii, self.k,
                self.alpha, self.dealias)

    def __eq__(self, other):
        if isinstance(other, SphericalShellRadialBasis):
            return self._key() == other._key()
        return NotImplemented

    def __hash__(self):
        return hash(self._key())

    def clone_with(self, **kw):
        args = dict(coord=self.coord, size=self.size, radii=self.radii, k=self.k,
                    alpha=self.alpha, dealias=self.dealias[0], dtype=self.dtype,
                    parent=self.parent)
        args.update(kw)
        return SphericalShellRadialBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    def n_size(self, ell):
        return self.size

    # --- grids ---

    def global_grid(self, scale=1):
        from ..spectral import jacobi as jacobi_lib
        z = jacobi_lib.build_grid(self.grid_size(scale), self.alpha[0], self.alpha[1])
        return (self.dR / 2) * (z + self.rho)

    def global_weights(self, scale=1):
        from ..spectral import jacobi as jacobi_lib
        N = self.grid_size(scale)
        z, w_ab = jacobi_lib.quadrature(N, self.alpha[0], self.alpha[1], dtype=np.longdouble)
        z0, w0 = jacobi_lib.quadrature(N, 0, 0, dtype=np.longdouble)
        Q0 = jacobi_lib.polynomials(N, self.alpha[0], self.alpha[1], z0, dtype=np.longdouble)
        Qp = jacobi_lib.polynomials(N, self.alpha[0], self.alpha[1], z, dtype=np.longdouble)
        w_dr = (self.dR / 2) * ((Q0 @ w0).T @ (w_ab * Qp))
        r = np.asarray(self.global_grid(scale))
        return np.asarray(w_dr, dtype=np.float64) * r**2

    def grid_spacing(self, scale=1):
        r = np.asarray(self.global_grid(scale))
        return np.abs(np.gradient(r))

    # --- transforms (ell-independent; scalars round-1) ---

    def _radial_weight(self, data, axis, scale, forward):
        if not self.k:
            return data
        r = np.asarray(self.global_grid(scale))
        shape = [1] * data.ndim
        shape[axis] = r.size
        w = (r / self.dR)**self.k if forward else (self.dR / r)**self.k
        return data * jnp.asarray(w).reshape(shape)

    def forward_transform(self, data, axis, scale, dtype, tensorsig=()):
        self._check_tensorsig(tensorsig)
        data = self._radial_weight(data, axis, scale, forward=True)
        data = self._jacobi.forward_transform(data, axis, scale, dtype)
        # Shell radial MMT is ell/reg-independent; only the component mixing
        # (spin -> regularity per ell) distinguishes tensors
        if tensorsig:
            rank = len(tensorsig)
            shape0 = data.shape
            data = data.reshape((3**rank,) + shape0[rank:])
            data = self._regularity_recombine(data, tensorsig, forward=True)
            data = data.reshape(shape0)
        return data

    def backward_transform(self, data, axis, scale, dtype, tensorsig=()):
        self._check_tensorsig(tensorsig)
        if tensorsig:
            rank = len(tensorsig)
            shape0 = data.shape
            data = data.reshape((3**rank,) + shape0[rank:])
            data = self._regularity_recombine(data, tensorsig, forward=False)
            data = data.reshape(shape0)
        data = self._jacobi.backward_transform(data, axis, scale, dtype)
        return self._radial_weight(data, axis, scale, forward=False)

    # --- validity ---

    def joint_valid_for_m(self, m, tensorsig=(), comp_idx=(), az_w=1):
        L = self.parent.colatitude_basis.size
        mask = np.zeros((L, self.size), dtype=bool)
        for j in range(max(L - abs(m), 0)):
            ell = abs(m) + j
            if comp_idx and not intertwiner_lib.regularity_allowed(ell, comp_idx):
                continue
            mask[j, :] = True
        out = np.zeros((az_w,) + mask.shape, dtype=bool)
        out[0] = mask
        if az_w > 1:
            if self.signed_pairs:
                out[1] = np.zeros_like(mask) if m == 0 else mask
                return out.ravel()
            sinmask = mask.copy()
            if len(tensorsig) <= 1 and m == 0:
                sinmask[0] = False  # slot j = 0 holds ell = 0 at m = 0
            out[1] = sinmask
        return out.ravel()

    # --- per-m block interface ---

    @CachedMethod
    def operator_matrix_ell(self, op, ell, reg, size=None):
        n = size if size is not None else self.size
        l_eff = ell + reg
        if op == 'L':
            D1 = shell_lib.operator(3, self.radii, 'D', n + 2, self.k,
                                    alpha=self.alpha, dl=+1, l=l_eff)
            D2 = shell_lib.operator(3, self.radii, 'D', n + 2, self.k + 1,
                                    alpha=self.alpha, dl=-1, l=l_eff + 1)
            return sparse.csr_matrix(D2 @ D1)[:n, :n]
        if op[-1] in '+-':
            dl = 1 if op[-1] == '+' else -1
            return sparse.csr_matrix(shell_lib.operator(
                3, self.radii, op[:-1], n, self.k, alpha=self.alpha, dl=dl, l=l_eff))
        return sparse.csr_matrix(shell_lib.operator(
            3, self.radii, op, n, self.k, alpha=self.alpha))

    def block_diag_m(self, op, m, reg=0, size=None):
        L = self.parent.colatitude_basis.size
        n = size if size is not None else self.size
        blocks = []
        for j in range(L):
            ell = abs(m) + j
            if j < L - abs(m):
                blocks.append(self.operator_matrix_ell(op, ell, reg, size=n))
            else:
                blocks.append(sparse.csr_matrix((n, n)))
        return sparse.block_diag(blocks, format='csr')

    @CachedMethod
    def _conversion_matrix(self, dk):
        mat = sparse.identity(self.size, format='csr')
        for i in range(dk):
            E = shell_lib.operator(3, self.radii, 'E', self.size, self.k + i,
                                   alpha=self.alpha)
            mat = sparse.csr_matrix(E) @ mat
        return sparse.csr_matrix(mat)

    def conversion_block_m(self, m, dk, reg=0):
        L = self.parent.colatitude_basis.size
        return sparse.kron(sparse.identity(L), self._conversion_matrix(dk),
                           format='csr')

    @CachedMethod
    def interpolation_ell(self, ell, reg, position):
        row = shell_lib.interpolation(self.radii, self.size, self.k, position,
                                      alpha=self.alpha)
        return np.asarray(row.todense()).ravel()

    def lift_block_m(self, m, index, reg=0):
        L = self.parent.colatitude_basis.size
        n = self.size
        mat = sparse.lil_matrix((L * n, L))
        for j in range(max(L - abs(m), 0)):
            mat[j * n + (n + index if index < 0 else index), j] = 1
        return sparse.csr_matrix(mat)


    def constant_spatial_column(self):
        L = self.parent.colatitude_basis.size
        n = self.size
        fwd_mat = self._jacobi.forward_matrix(1, np.float64)
        r = np.asarray(self.global_grid(1))
        vals = (r / self.dR)**self.k if self.k else np.ones_like(r)
        col = np.zeros((L * n, 1))
        col[:n, 0] = fwd_mat @ vals
        col /= self.parent.colatitude_basis.constant_mode_value()
        return sparse.csr_matrix(col)

    def ncc_block_m(self, m, ncc_radial_coeffs, ncc_k, ncc_alpha, dk_out,
                    cutoff=1e-10):
        """Radial Clenshaw NCC (ell-independent for spherically symmetric
        NCCs), kron'd over colatitude slots."""
        N = self.size
        if np.isscalar(ncc_alpha):
            ncc_alpha = self.alpha
        a_ncc = ncc_k + ncc_alpha[0]
        b_ncc = ncc_k + ncc_alpha[1]
        Nmat = 3 * ((N + 1) // 2) + ncc_k + abs(dk_out) + 2
        J = self.operator_matrix_ell('Z', 0, 0, size=Nmat)
        S = clenshaw_lib.matrix_clenshaw(np.ravel(ncc_radial_coeffs)[:N],
                                         a_ncc, b_ncc, J, cutoff=cutoff)
        prefactor = sparse.identity(Nmat, format='csr')
        for i in range(ncc_k):
            AB = shell_lib.operator(3, self.radii, 'AB', Nmat, self.k + i,
                                    alpha=self.alpha)
            prefactor = AB @ prefactor
        mat = sparse.csr_matrix(prefactor @ S)
        if dk_out:
            conv = sparse.identity(Nmat, format='csr')
            for i in range(dk_out):
                E = shell_lib.operator(3, self.radii, 'E', Nmat, self.k + i,
                                       alpha=self.alpha)
                conv = sparse.csr_matrix(E) @ conv
            mat = conv @ mat
        mat = sparse.csr_matrix(mat)[:N, :N]
        L = self.parent.colatitude_basis.size
        return sparse.kron(sparse.identity(L), mat, format='csr')


class BallSurfaceBasis:
    """
    Sphere-surface facade over a ball's angular sub-bases (fields with bases=
    ball.surface span the azimuth+colatitude axes only). Parity: the
    SphereBasis returned by BallBasis.S2_basis (basis.py:4630).
    """

    dim = 2

    def __init__(self, ball, radius):
        self.ball = ball
        self.coordsys = ball.coordsys
        self.radius = float(radius)
        self.shape = ball.shape[:2]
        self.dealias = ball.dealias[:2]
        self.dtype = ball.dtype

    @property
    def sub_bases(self):
        return (self.ball.azimuth_basis, self.ball.colatitude_basis)

    def derivative_basis(self, order=1):
        return self

    def __repr__(self):
        return f"BallSurfaceBasis(radius={self.radius})"


class BallBasis:
    """Ball basis facade (parity: basis.py:4597 BallBasis)."""

    dim = 3

    def __init__(self, coordsys, shape, radius=1.0, k=0, alpha=0.0,
                 dealias=(1, 1, 1), dtype=np.float64, triangular=True):
        if not isinstance(coordsys, SphericalCoordinates):
            raise ValueError("BallBasis requires SphericalCoordinates")
        self.coordsys = coordsys
        self.shape = tuple(shape)
        self.radius = float(radius)
        self.k = int(k)
        self.alpha = float(alpha)
        self.triangular = bool(triangular)
        if np.isscalar(dealias):
            dealias = (dealias,) * 3
        self.dealias = tuple(dealias)
        self.dtype = dtype
        self.volume = 4 / 3 * np.pi * radius**3
        self.azimuth_basis = make_azimuth_basis(
            coordsys.azimuth, self.shape[0], self.dealias[0], dtype)
        self.colatitude_basis = ColatitudeBasis(
            coordsys.colatitude, self.shape[1], radius=self.radius,
            dealias=self.dealias[1], dtype=dtype, parent=self)
        self.radial_basis = BallRadialBasis(
            coordsys.radius, self.shape[2], radius=self.radius, k=self.k,
            alpha=self.alpha, dealias=self.dealias[2], dtype=dtype, parent=self,
            triangular=self.triangular)
        self.surface = BallSurfaceBasis(self, self.radius)

    @property
    def sub_bases(self):
        return (self.azimuth_basis, self.colatitude_basis, self.radial_basis)

    def S2_basis(self, radius=None):
        return BallSurfaceBasis(self, self.radius if radius is None else radius)

    def clone_with(self, **kw):
        args = dict(coordsys=self.coordsys, shape=self.shape, radius=self.radius,
                    k=self.k, alpha=self.alpha, dealias=self.dealias, dtype=self.dtype,
                    triangular=self.triangular)
        args.update(kw)
        return BallBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    def global_grids(self, scales=None):
        scales = scales or self.dealias
        return (self.azimuth_basis.global_grid(scales[0]),
                self.colatitude_basis.global_grid(scales[1]),
                self.radial_basis.global_grid(scales[2]))

    def __repr__(self):
        return f"BallBasis(shape={self.shape}, radius={self.radius}, k={self.k})"


class ShellBasis:
    """3D spherical-shell basis facade (parity: basis.py:4262 ShellBasis)."""

    dim = 3

    def __init__(self, coordsys, shape, radii=(1.0, 2.0), k=0,
                 alpha=(-0.5, -0.5), dealias=(1, 1, 1), dtype=np.float64):
        if not isinstance(coordsys, SphericalCoordinates):
            raise ValueError("ShellBasis requires SphericalCoordinates")
        self.coordsys = coordsys
        self.shape = tuple(shape)
        self.radii = tuple(map(float, radii))
        self.k = int(k)
        self.alpha = tuple(map(float, alpha))
        if np.isscalar(dealias):
            dealias = (dealias,) * 3
        self.dealias = tuple(dealias)
        self.dtype = dtype
        self.volume = 4 / 3 * np.pi * (radii[1]**3 - radii[0]**3)
        # Mean radius sets the colatitude metric factor (parity: ShellBasis)
        self.radius = (self.radii[0] + self.radii[1]) / 2
        self.azimuth_basis = make_azimuth_basis(
            coordsys.azimuth, self.shape[0], self.dealias[0], dtype)
        self.colatitude_basis = ColatitudeBasis(
            coordsys.colatitude, self.shape[1], radius=self.radius,
            dealias=self.dealias[1], dtype=dtype, parent=self)
        self.radial_basis = SphericalShellRadialBasis(
            coordsys.radius, self.shape[2], radii=self.radii, k=self.k,
            alpha=self.alpha, dealias=self.dealias[2], dtype=dtype, parent=self)
        self.inner_surface = BallSurfaceBasis(self, self.radii[0])
        self.outer_surface = BallSurfaceBasis(self, self.radii[1])

    @property
    def sub_bases(self):
        return (self.azimuth_basis, self.colatitude_basis, self.radial_basis)

    def S2_basis(self, radius=None):
        return BallSurfaceBasis(self, self.radii[1] if radius is None else radius)

    def clone_with(self, **kw):
        args = dict(coordsys=self.coordsys, shape=self.shape, radii=self.radii,
                    k=self.k, alpha=self.alpha, dealias=self.dealias, dtype=self.dtype)
        args.update(kw)
        return ShellBasis(**args)

    def derivative_basis(self, order=1):
        return self.clone_with(k=self.k + order)

    def global_grids(self, scales=None):
        scales = scales or self.dealias
        return (self.azimuth_basis.global_grid(scales[0]),
                self.colatitude_basis.global_grid(scales[1]),
                self.radial_basis.global_grid(scales[2]))

    def __repr__(self):
        return f"ShellBasis(shape={self.shape}, radii={self.radii}, k={self.k})"
