"""
Vector calculus and structural operators on the ball.

Parity target (behavior): dedalus/core/operators.py SphericalEllOperator
(:3183), Laplacian (:4302 spherical), Lift (:4560), interpolation/BCs on
Spherical3DBasis. TPU-first design mirroring operators_polar: per-m matrices
are block-diagonal over colatitude (ell) slots; eager/traced evaluation
applies the batched (M/2, L, n, n) stacks as one MXU einsum.

Round-1 scope: SCALAR operands (Laplacian, Lift, Convert, Interpolate,
radially-symmetric NCCs). Tensor calculus (Gradient/Divergence/Curl) requires
the regularity intertwiner and is wired in with ball tensor transforms.
"""

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Field
from .future import Future
from .domain import Domain
from .coords import SphericalCoordinates
from .operators import LinearOperator, device_matrix
from .basis_ball import BallBasis, BallRadialBasis, BallSurfaceBasis, SphericalRadialBasis


def _xi(mu, l):
    """Angular factor xi(mu, l) = sqrt((l + (mu+1)//2)/(2l+1))
    (parity: basis.py:3545)."""
    if l < 0 or 2 * l + 1 <= 0:
        return 0.0
    return np.sqrt((l + (mu + 1) // 2) / (2 * l + 1))


class BallRegOperator(LinearOperator):
    """
    Base for spherical 3D operators built from per-(ell, regularity) radial
    matrices (parity: operators.py:3108 SphericalEllOperator). Tensor
    components are REGULARITY components; each (in, out) component pair gets a
    block-diagonal matrix over colatitude slots (slot j acts at ell = |m|+j),
    assembled per m and applied eagerly as batched (M/2, L, n, n) einsums.
    """

    def __init__(self, operand, coordsys):
        for cs in operand.tensorsig:
            if cs is not coordsys:
                raise NotImplementedError(
                    "Spherical operators support tensors over the spherical system only")
        self.coordsys = coordsys
        self.azimuth_axis = coordsys.coords[0].axis
        self.colatitude_axis = coordsys.coords[1].axis
        self.radius_axis = coordsys.coords[2].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        if not isinstance(self.radial_in, SphericalRadialBasis):
            raise ValueError("Spherical operator requires a ball/shell radial basis")
        self.radial_out = self.radial_in.derivative_basis(self.dk) if self.dk \
            else self.radial_in
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = self.out_tensorsig(op.tensorsig)
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = self.radial_out
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    # Subclass API ---------------------------------------------------------
    def out_tensorsig(self, in_sig):
        return in_sig

    def regindices_out(self, in_idx):
        return (in_idx,)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        raise NotImplementedError
    # ----------------------------------------------------------------------

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def _comp_indices(self, tensorsig):
        shape = tuple(cs.dim for cs in tensorsig)
        return [()] if not shape else list(np.ndindex(*shape))

    def _pair_block_m(self, in_idx, out_idx, m, part=None):
        """(L*n_out, L*n_in) block-diagonal pair matrix at azimuthal mode m,
        zeroed where either regularity class is forbidden. `part` selects
        np.real/np.imag for complex radial matrices (real dtype pairs)."""
        from ..spectral import intertwiner as it
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        n_in = rb.size
        n_out = self.radial_out.size
        blocks = []
        for j in range(L):
            ell = abs(m) + j
            ok = (j < L - abs(m)
                  and it.regularity_allowed(ell, in_idx)
                  and it.regularity_allowed(ell, out_idx))
            if ok:
                A = self.radial_matrix_ell(in_idx, out_idx, ell)
                if A is None:
                    A = sparse.csr_matrix((n_out, n_in))
                A = sparse.csr_matrix(A)[:n_out, :n_in]
                if part is not None:
                    A = sparse.csr_matrix(part(A.toarray()))
                blocks.append(A)
            else:
                blocks.append(sparse.csr_matrix((n_out, n_in)))
        return sparse.block_diag(blocks, format='csr')

    complex_matrices = False  # subclasses with imaginary radial parts set True

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        m = m if m is not None else 0
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        in_idxs = self._comp_indices(self.operand.tensorsig)
        out_idxs = self._comp_indices(self.tensorsig)
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        complex_dtype = np.issubdtype(self.dtype, np.complexfloating)
        # i * (a + i b) = -b + i a: pair rotation for real-dtype (cos, -sin)
        J = sparse.csr_matrix(np.array([[0.0, -1.0], [1.0, 0.0]])[:az_w, :az_w])
        rows = []
        for oi in out_idxs:
            row = []
            for ii in in_idxs:
                if oi in self.regindices_out(ii):
                    if not self.complex_matrices:
                        blk = sparse.kron(sparse.identity(az_w),
                                          self._pair_block_m(ii, oi, m))
                    elif complex_dtype:
                        blk = sparse.kron(sparse.identity(az_w),
                                          self._pair_block_m(ii, oi, m))
                    else:
                        blk = (sparse.kron(sparse.identity(az_w),
                                           self._pair_block_m(ii, oi, m, np.real))
                               + sparse.kron(J,
                                             self._pair_block_m(ii, oi, m, np.imag)))
                else:
                    blk = sparse.csr_matrix(
                        (az_w * L * self.radial_out.size, az_w * L * rb.size))
                row.append(blk)
            rows.append(row)
        if len(rows) == 1 and len(rows[0]) == 1:
            return sparse.csr_matrix(rows[0][0])
        return sparse.bmat(rows, format='csr')

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def _pair_stack(self, in_idx, out_idx, part=None, pname=''):
        """(KM+1, L, n_out, n_in) device stack for one component pair."""
        from ..spectral import intertwiner as it
        rb = self.radial_in
        az = rb.parent.azimuth_basis
        KM = (az.size - 1) // 2
        L = rb.parent.colatitude_basis.size
        n_in, n_out = rb.size, self.radial_out.size
        key = (type(self).__name__, rb._key(), self.radial_out._key(),
               in_idx, out_idx, KM, L, pname, self._extra_key())

        def build():
            cplx = self.complex_matrices and part is None
            S = np.zeros((KM + 1, L, n_out, n_in),
                         dtype=complex if cplx else float)
            for m in range(KM + 1):
                for j in range(L - abs(m)):
                    ell = abs(m) + j
                    if not (it.regularity_allowed(ell, in_idx)
                            and it.regularity_allowed(ell, out_idx)):
                        continue
                    A = self.radial_matrix_ell(in_idx, out_idx, ell)
                    if A is None:
                        continue
                    A = sparse.csr_matrix(A)[:n_out, :n_in].toarray()
                    if part is not None:
                        A = part(A)
                    S[m, j, :A.shape[0], :A.shape[1]] = A
            return np.ascontiguousarray(S)
        return device_matrix(key, build)

    def _extra_key(self):
        return ()

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (comps..., M, L, n)
        M = data.shape[-3]
        L = data.shape[-2]
        n_out = self.radial_out.size
        P = max(M // 2, 1)
        out_shape = tuple(cs.dim for cs in self.tensorsig)
        out = jnp.zeros(out_shape + (M, L, n_out), dtype=self.dtype)
        complex_dtype = np.issubdtype(self.dtype, np.complexfloating)
        for ii in self._comp_indices(self.operand.tensorsig):
            comp = data[ii]
            dm = comp.reshape((P, M // P) + comp.shape[-2:])
            for oi in self.regindices_out(ii):
                if not self.complex_matrices or complex_dtype:
                    stack = self._pair_stack(ii, oi)
                    res = jnp.einsum('mlon,mpln->mplo', stack, dm)
                else:
                    sr = self._pair_stack(ii, oi, np.real, 're')
                    si = self._pair_stack(ii, oi, np.imag, 'im')
                    res = jnp.einsum('mlon,mpln->mplo', sr, dm)
                    if M // P == 2:
                        # i * (a + i b) = (-b, a): rotate the (cos, -sin) pair
                        rot = jnp.stack([-dm[:, 1], dm[:, 0]], axis=1)
                        res = res + jnp.einsum('mlon,mpln->mplo', si, rot)
                out = out.at[oi].add(res.reshape((M, L, n_out)))
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)


# Backwards-compatible alias used by scalar-only call sites
BallScalarOperator = BallRegOperator


class BallLaplacian(BallRegOperator):
    """Laplacian on the ball/shell: per-(ell, regtotal) D(-1) @ D(+1)
    (k -> k+2), diagonal in regularity components.
    Parity: operators.py:4302 (spherical Laplacian)."""

    dk = 2
    name = 'Lap'

    def new_operands(self, operand):
        return BallLaplacian(operand, self.coordsys)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        return self.radial_in.operator_matrix_ell('L', ell, reg)


class SphericalGradient(BallRegOperator):
    """grad on the ball/shell (parity: operators.py:3233 spherical Gradient):
    out regularity component (-,)+idx gets xi(-1, l)*D-, (+,)+idx gets
    xi(+1, l)*D+ with l = ell + regtotal(in)."""

    dk = 1
    name = 'Grad'

    def out_tensorsig(self, in_sig):
        return (self.coordsys,) + in_sig

    def regindices_out(self, in_idx):
        return ((0,) + tuple(in_idx), (1,) + tuple(in_idx))

    def new_operands(self, operand):
        return SphericalGradient(operand, self.coordsys)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        if out_idx[0] == 0:
            return _xi(-1, ell + reg) * self.radial_in.operator_matrix_ell(
                'D-', ell, reg)
        return _xi(+1, ell + reg) * self.radial_in.operator_matrix_ell(
            'D+', ell, reg)


class SphericalDivergence(BallRegOperator):
    """div on the ball/shell (parity: operators.py:3578 spherical Divergence):
    in component (-,)+idx contributes xi(-1, l+1)*D+, (+,)+idx contributes
    xi(+1, l-1)*D- with l = ell + regtotal(in)."""

    dk = 1
    name = 'Div'

    def __init__(self, operand, index=0):
        if not operand.tensorsig:
            raise ValueError("Divergence requires a tensor operand")
        super().__init__(operand, operand.tensorsig[index])

    def out_tensorsig(self, in_sig):
        return in_sig[1:]

    def regindices_out(self, in_idx):
        if in_idx[0] in (0, 1):
            return (tuple(in_idx[1:]),)
        return ()

    def new_operands(self, operand):
        return SphericalDivergence(operand)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        if in_idx[0] == 0:
            return _xi(-1, ell + reg + 1) * self.radial_in.operator_matrix_ell(
                'D+', ell, reg)
        return _xi(+1, ell + reg - 1) * self.radial_in.operator_matrix_ell(
            'D-', ell, reg)


class SphericalCurl(BallRegOperator):
    """curl on the ball/shell (parity: operators.py:3838 SphericalCurl):
    regularity mapping (-,+) -> 0 and 0 -> (-,+) with pure-imaginary radial
    factors (pair rotations in real dtype):
      (-) -> (0): -i xi(+1, l+1) D+      (+) -> (0): +i xi(-1, l-1) D-
      (0) -> (-): -i xi(+1, l)   D-      (0) -> (+): +i xi(-1, l)   D+
    with l = ell + regtotal(in)."""

    dk = 1
    name = 'Curl'
    complex_matrices = True

    def __init__(self, operand, index=0):
        if index != 0:
            raise ValueError("Curl only implemented along index 0")
        if not operand.tensorsig:
            raise ValueError("Curl requires a vector operand")
        super().__init__(operand, operand.tensorsig[0])

    def out_tensorsig(self, in_sig):
        return in_sig

    def regindices_out(self, in_idx):
        if in_idx[0] in (0, 1):
            return ((2,) + tuple(in_idx[1:]),)
        return ((0,) + tuple(in_idx[1:]), (1,) + tuple(in_idx[1:]))

    def new_operands(self, operand):
        return SphericalCurl(operand)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        rb = self.radial_in
        if in_idx[0] == 0 and out_idx[0] == 2:
            return -1j * _xi(+1, ell + reg + 1) * rb.operator_matrix_ell(
                'D+', ell, reg)
        if in_idx[0] == 1 and out_idx[0] == 2:
            return 1j * _xi(-1, ell + reg - 1) * rb.operator_matrix_ell(
                'D-', ell, reg)
        if in_idx[0] == 2 and out_idx[0] == 0:
            return -1j * _xi(+1, ell + reg) * rb.operator_matrix_ell(
                'D-', ell, reg)
        if in_idx[0] == 2 and out_idx[0] == 1:
            return 1j * _xi(-1, ell + reg) * rb.operator_matrix_ell(
                'D+', ell, reg)
        return None


class SphericalEllProduct(BallRegOperator):
    """Multiplication by ell_func(ell + regtotal) per (ell, regularity)
    component (parity: operators.py:4155 SphericalEllProduct /
    :4199 _radial_matrix = ell_func(ell + regtotal) * Id)."""

    dk = 0
    name = 'SphericalEllProduct'

    def __init__(self, operand, coordsys, ell_func):
        self.ell_func = ell_func
        super().__init__(operand, coordsys)

    def new_operands(self, operand):
        return SphericalEllProduct(operand, self.coordsys, self.ell_func)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        return float(self.ell_func(ell + reg)) * \
            self.radial_in.operator_matrix_ell('Id', ell, reg)


class SphericalTransposeComponents(BallRegOperator):
    """Transpose of a rank-2 spherical tensor. In SPIN space the transpose is
    a plain index swap; in the REGULARITY coefficient space it is the
    Q-conjugated swap per ell: reg_out = Q(ell)^T P_swap Q(ell) reg_in
    (parity: operators.py:1879 TransposeComponents + spin_operators.Transpose)."""

    dk = 0
    name = 'TransposeComponents'

    def __init__(self, operand, indices=(0, 1)):
        if tuple(indices) != (0, 1):
            raise NotImplementedError("Only leading-pair transposition supported")
        if len(operand.tensorsig) < 2:
            raise ValueError("Transpose requires rank >= 2")
        super().__init__(operand, operand.tensorsig[0])

    def out_tensorsig(self, in_sig):
        return in_sig

    def regindices_out(self, in_idx):
        return tuple(np.ndindex(*(3,) * len(in_idx)))

    def new_operands(self, operand):
        return SphericalTransposeComponents(operand)

    @staticmethod
    def _mix_matrix(ell, rank):
        """Q(ell)^T P_swap Q(ell) over the full 3^rank component space."""
        from ..spectral import intertwiner as it
        C = 3**rank
        P = np.zeros((C, C))
        idxs = list(np.ndindex(*(3,) * rank))
        for i, idx in enumerate(idxs):
            sw = (idx[1], idx[0]) + idx[2:]
            P[i, idxs.index(sw)] = 1.0
        Q = it.Q_matrix(ell, rank)   # spin = Q reg
        return Q.T @ P @ Q

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        rank = len(self.operand.tensorsig)
        M = self._mix_matrix(ell, rank)
        idxs = list(np.ndindex(*(3,) * rank))
        c = M[idxs.index(tuple(out_idx)), idxs.index(tuple(in_idx))]
        if abs(c) < 1e-15:
            return None
        return c * sparse.identity(self.radial_in.size, format='csr')


class SphericalTrace(BallRegOperator):
    """Trace of a rank-2 spherical tensor: in spin space
    tr = T_{-+} + T_{+-} + T_{00}; in regularity space the Q-conjugated row
    per ell (parity: operators.py:1720 Trace)."""

    dk = 0
    name = 'Trace'

    def __init__(self, operand):
        if len(operand.tensorsig) < 2:
            raise ValueError("Trace requires a rank-2+ tensor")
        super().__init__(operand, operand.tensorsig[0])

    def out_tensorsig(self, in_sig):
        return in_sig[2:]

    def regindices_out(self, in_idx):
        return (tuple(in_idx[2:]),)

    def new_operands(self, operand):
        return SphericalTrace(operand)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        rank = len(self.operand.tensorsig)
        # Spin-space trace row over the first two ranks: (-,+), (+,-), (0,0)
        t = np.zeros(9)
        idx2 = list(np.ndindex(3, 3))
        for pair in ((0, 1), (1, 0), (2, 2)):
            t[idx2.index(pair)] = 1.0
        Q2 = it.Q_matrix(ell, 2)
        row = t @ Q2                    # acts on the first two reg ranks
        c = row[idx2.index(tuple(in_idx[:2]))]
        if abs(c) < 1e-15 or tuple(in_idx[2:]) != tuple(out_idx):
            return None
        return c * sparse.identity(self.radial_in.size, format='csr')


class BallConvert(BallRegOperator):
    """Convert ball/shell fields between k levels, per (ell, regtotal)
    (parity: ConvertRegularity)."""

    name = 'Convert'

    def __init__(self, operand, coordsys, target_radial):
        self.dk = target_radial.k - operand.domain.bases[coordsys.coords[2].axis].k
        if self.dk < 0:
            raise ValueError("Cannot convert to lower k")
        self._target_radial = target_radial
        super().__init__(operand, coordsys)
        self.radial_out = target_radial

    def _init_metadata(self):
        super()._init_metadata()
        bases = list(self.operand.domain.bases)
        bases[self.radius_axis] = self._target_radial
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallConvert(operand, self.coordsys, self._target_radial)

    def _extra_key(self):
        return (self.dk,)

    def radial_matrix_ell(self, in_idx, out_idx, ell):
        from ..spectral import intertwiner as it
        reg = it.regtotal(in_idx)
        if hasattr(self.radial_in, 'conversion_matrix_ell'):
            return self.radial_in.conversion_matrix_ell(ell, reg, self.dk)
        return self.radial_in._conversion_matrix(self.dk)


class BallLift(LinearOperator):
    """
    Lift a surface (S2) field into radial mode `index` of each ell of a
    ball/shell basis (parity: operators.py:4560 Lift on spherical bases; used
    for tau terms). Surface TENSOR fields hold spin components; the lift
    converts them to regularity components per ell with the intertwiner
    (reg_a = sum_sigma Q(ell)[sigma, a] spin_sigma) before placing the radial
    column.
    """

    name = 'Lift'

    def __init__(self, operand, ball, index):
        for cs in operand.tensorsig:
            if cs is not ball.coordsys:
                raise NotImplementedError(
                    "Spherical lifts support tensors over the spherical system only")
        self.ball = ball
        self.index = int(index)
        self.coordsys = ball.coordsys
        self.azimuth_axis = self.coordsys.coords[0].axis
        self.colatitude_axis = self.coordsys.coords[1].axis
        self.radius_axis = self.coordsys.coords[2].axis
        self.radial_out = ball.radial_basis
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        while len(bases) <= self.radius_axis:
            bases.append(None)
        bases[self.radius_axis] = self.ball.radial_basis
        # Angular bases come from the ball (surface fields share them)
        bases[self.azimuth_axis] = self.ball.azimuth_basis
        bases[self.colatitude_axis] = self.ball.colatitude_basis
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallLift(operand, self.ball, self.index)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def _tensor_block_m(self, m):
        """Comp-major lift block: rows (reg comp a, L, n), cols (spin comp
        sigma, L); scalar rank gives the plain per-ell column."""
        from ..spectral import intertwiner as it
        rb = self.ball.radial_basis
        L = self.ball.colatitude_basis.size
        n = rb.size
        rank = len(self.tensorsig)
        C = 3**rank
        if rank == 0:
            return rb.lift_block_m(m, self.index)
        rows = []
        for a_flat, a_idx in enumerate(np.ndindex(*(3,) * rank)):
            row = []
            for s_flat in range(C):
                blk = sparse.lil_matrix((L * n, L))
                for j in range(max(L - abs(m), 0)):
                    ell = abs(m) + j
                    if not it.regularity_allowed(ell, a_idx):
                        continue
                    q = it.Q_matrix(ell, rank)[s_flat, a_flat]
                    if abs(q) < 1e-14:
                        continue
                    ns = rb.n_size(ell)
                    if ns <= 0:
                        continue
                    idx = ns + self.index if self.index < 0 else self.index
                    blk[j * n + idx, j] = q
                row.append(sparse.csr_matrix(blk))
            rows.append(row)
        return sparse.bmat(rows, format='csr')

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        az_w = subproblem.axis_width(self.ball.azimuth_basis, self.azimuth_axis)
        rank = len(self.tensorsig)
        A = self._tensor_block_m(m if m is not None else 0)
        if rank == 0:
            return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), A))
        # Comp-major ordering with az inside: kron each (comp, comp) block
        C = 3**rank
        L = self.ball.colatitude_basis.size
        n = self.ball.radial_basis.size
        rows = []
        for a in range(C):
            row = []
            for s in range(C):
                sub = A[a * L * n:(a + 1) * L * n, s * L:(s + 1) * L]
                row.append(sparse.kron(sparse.identity(az_w), sub))
            rows.append(row)
        return sparse.bmat(rows, format='csr')

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data
        if field.domain.bases[self.radius_axis] is None:
            data = data[..., 0]  # drop the constant radial slot
        rank = len(self.tensorsig)
        C = 3**rank
        M = data.shape[-2]
        L = data.shape[-1]
        n = self.ball.radial_basis.size
        P = max(M // 2, 1)
        KM = (self.ball.azimuth_basis.size - 1) // 2
        key = ('BallLift', self.ball.radial_basis._key(), self.index, KM, L, rank)

        def build():
            mats = [np.asarray(self._tensor_block_m(m).todense())
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))
        stack = device_matrix(key, build)  # (KM+1, C*L*n, C*L)
        dm = data.reshape((C,) if rank else ()) if False else None
        d = data.reshape((C, P, M // P, L)) if rank else data.reshape((1, P, M // P, L))
        d = jnp.moveaxis(d, 0, 2).reshape((P, M // P, C * L))
        res = jnp.einsum('moi,mpi->mpo', stack, d)  # (P, M//P, C*L*n)
        res = res.reshape((P, M // P, C, L, n))
        res = jnp.moveaxis(res, 2, 0).reshape((C, M, L, n))
        out = res if rank else res[0]
        if rank:
            out = out.reshape(tuple(cs.dim for cs in self.tensorsig) + (M, L, n))
        return self._build_output(self.dist.coeff_layout, out, scales=None)


class SphericalComponent(LinearOperator):
    """
    Radial/angular component selection on spin-component spherical operands
    (surface fields and grid data; parity: operators.py:2231-2312 +
    basis.py:5892-5970 S2Radial/AngularComponent). Spin ordering (-, +, 0):
    radial = component 2, angular = components (0, 1) re-signed as an S2
    tensorsig.
    """

    name = 'Comp'

    def __init__(self, operand, index=0, comps=(2,), s2_out=False):
        if index < 0:
            index += len(operand.tensorsig)
        cs = operand.tensorsig[index]
        from .coords import SphericalCoordinates
        if not isinstance(cs, SphericalCoordinates):
            raise NotImplementedError("SphericalComponent needs spherical tensorsig")
        self.index = index
        self.comps = tuple(comps)
        self.s2_out = s2_out
        self.coordsys = cs
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        ts = list(op.tensorsig)
        if self.s2_out:
            ts[self.index] = self.coordsys.S2coordsys
        else:
            ts.pop(self.index)
        self.tensorsig = tuple(ts)
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return SphericalComponent(operand, self.index, self.comps, self.s2_out)

    def matrix_dependence(self, *vars):
        return self.operand.matrix_dependence(*vars)

    def matrix_coupling(self, *vars):
        return self.operand.matrix_coupling(*vars)

    def subproblem_matrix(self, subproblem):
        in_dims = [cs.dim for cs in self.operand.tensorsig]
        in_idxs = list(np.ndindex(*in_dims)) if in_dims else [()]
        out_rows = [i for i, idx in enumerate(in_idxs)
                    if idx[self.index] in self.comps]
        # Order rows by the OUTPUT component enumeration
        def out_key(i):
            idx = list(in_idxs[i])
            if self.s2_out:
                idx[self.index] = self.comps.index(idx[self.index])
            else:
                idx.pop(self.index)
            return tuple(idx)
        out_rows.sort(key=out_key)
        S = sparse.lil_matrix((len(out_rows), len(in_idxs)))
        for r, i in enumerate(out_rows):
            S[r, i] = 1.0
        spatial = subproblem.spatial_size(self.operand.domain)
        return sparse.kron(sparse.csr_matrix(S),
                           sparse.identity(spatial), format='csr')

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        data = field.data
        sel = jnp.asarray(self.comps)
        out = jnp.take(data, sel, axis=self.index)
        if not self.s2_out:
            out = jnp.squeeze(out, axis=self.index)
        return self._build_output(field.layout, out, scales=field.scales)


class BallInterpolate(LinearOperator):
    """Radial interpolation f(r=position): ball/shell field -> surface field
    (parity: interpolation BC rows on Spherical3DBasis). Tensor operands hold
    regularity components; the surface output holds SPIN components
    (spin_sigma = sum_a Q(ell)[sigma, a] reg_a at the boundary)."""

    name = 'interp'

    def __init__(self, operand, coordsys, position):
        for cs in operand.tensorsig:
            if cs is not coordsys:
                raise NotImplementedError(
                    "Spherical interpolation supports tensors over the spherical system only")
        self.coordsys = coordsys
        self.position = float(position)
        self.azimuth_axis = coordsys.coords[0].axis
        self.colatitude_axis = coordsys.coords[1].axis
        self.radius_axis = coordsys.coords[2].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.radius_axis] = None
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallInterpolate(operand, self.coordsys, self.position)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def _interp_block_m(self, m):
        """Comp-major interpolation block: rows (spin comp sigma, L), cols
        (reg comp a, L, n)."""
        from ..spectral import intertwiner as it
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        n = rb.size
        rank = len(self.tensorsig)
        if rank == 0:
            mat = sparse.lil_matrix((L, L * n))
            for j in range(max(L - abs(m), 0)):
                ell = abs(m) + j
                mat[j, j * n:(j + 1) * n] = rb.interpolation_ell(ell, 0, self.position)
            return sparse.csr_matrix(mat)
        C = 3**rank
        regidx = list(np.ndindex(*(3,) * rank))
        rows = []
        for s_flat in range(C):
            row = []
            for a_flat, a_idx in enumerate(regidx):
                blk = sparse.lil_matrix((L, L * n))
                reg = it.regtotal(a_idx)
                for j in range(max(L - abs(m), 0)):
                    ell = abs(m) + j
                    if not it.regularity_allowed(ell, a_idx):
                        continue
                    q = it.Q_matrix(ell, rank)[s_flat, a_flat]
                    if abs(q) < 1e-14:
                        continue
                    blk[j, j * n:(j + 1) * n] = q * rb.interpolation_ell(
                        ell, reg, self.position)
                row.append(sparse.csr_matrix(blk))
            rows.append(row)
        return sparse.bmat(rows, format='csr')

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        m = m if m is not None else 0
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        rank = len(self.tensorsig)
        A = self._interp_block_m(m)
        if rank == 0:
            return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), A))
        C = 3**rank
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        n = rb.size
        rows = []
        for s in range(C):
            row = []
            for a in range(C):
                sub = A[s * L:(s + 1) * L, a * L * n:(a + 1) * L * n]
                row.append(sparse.kron(sparse.identity(az_w), sub))
            rows.append(row)
        return sparse.bmat(rows, format='csr')

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (comps..., M, L, n)
        rank = len(self.tensorsig)
        C = 3**rank
        M = data.shape[-3]
        L = data.shape[-2]
        n = data.shape[-1]
        P = max(M // 2, 1)
        KM = (self.radial_in.parent.azimuth_basis.size - 1) // 2
        key = ('BallInterp', self.radial_in._key(), self.position, KM, L, rank)

        def build():
            mats = [np.asarray(self._interp_block_m(m).todense())
                    for m in range(KM + 1)]
            return np.ascontiguousarray(np.stack(mats))
        stack = device_matrix(key, build)  # (KM+1, C*L, C*L*n)
        d = data.reshape((C, P, M // P, L * n))
        d = jnp.moveaxis(d, 0, 2).reshape((P, M // P, C * L * n))
        res = jnp.einsum('moi,mpi->mpo', stack, d)  # (P, M//P, C*L)
        res = res.reshape((P, M // P, C, L))
        res = jnp.moveaxis(res, 2, 0).reshape((C, M, L, 1))
        out = res[0] if rank == 0 else res.reshape(
            tuple(cs.dim for cs in self.tensorsig) + (M, L, 1))
        return self._build_output(self.dist.coeff_layout, out, scales=None)


class SphericalIntegrate(LinearOperator):
    """Volume integral over the ball/shell: the spherically symmetric
    (m=0, ell=0) radial coefficients integrated against r^2 dr times the
    angular factor 2*pi*sqrt(2) (the Y_00 normalization of this basis).
    Parity: integ on Spherical3DBasis."""

    name = 'integ'

    def __init__(self, operand):
        if operand.tensorsig:
            raise NotImplementedError("Spherical integ of tensors comes with components")
        cs = None
        for b in operand.domain.bases:
            if b is not None and isinstance(b, SphericalRadialBasis):
                cs = b.parent.coordsys
                self.radial_basis = b
        if cs is None:
            raise ValueError("SphericalIntegrate requires a ball/shell radial basis")
        self.coordsys = cs
        self.azimuth_axis = cs.coords[0].axis
        self.colat_axis = cs.coords[1].axis
        self.radius_axis = cs.coords[2].axis
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = Domain(self.dist, ())

    def new_operands(self, operand):
        return SphericalIntegrate(operand)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colat_axis] = True
        out[self.radius_axis] = True
        return out

    def _radial_integral_vector(self):
        """I_n = integral q_n(r) r^2 dr over the radial domain (quadrature)."""
        rb = self.radial_basis
        w = np.asarray(rb.global_weights(1))
        Ng = rb.grid_size(1)
        if hasattr(rb, '_transform_stacks'):  # ball: per-(m, ell) stacks
            bwd = rb._transform_stacks(1, 0, 'b')  # (KM+1, L, Ng, n)
            Q = bwd[0, 0]                          # m=0, ell=0 radial functions
        else:
            # Shell: radial functions via the (ell-independent) backward
            # transform of unit coefficient vectors
            Q = np.asarray(rb.backward_transform(
                np.eye(rb.size), axis=1, scale=1, dtype=np.float64)).T
        return w @ Q

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (M, L, n)
        Iv = jnp.asarray(self._radial_integral_vector())
        val = jnp.tensordot(data[0, 0, :], Iv, axes=1) * (2 * np.pi * np.sqrt(2))
        out = val.reshape((1, 1, 1))
        return self._build_output(self.dist.coeff_layout, out, scales=field.scales)

    def expression_matrices(self, subproblem, vars, **kw):
        op = self.operand
        op_mats = op.expression_matrices(subproblem, vars, **kw)
        m = subproblem.group[self.azimuth_axis]
        L = self.radial_basis.parent.colatitude_basis.size
        n = self.radial_basis.size
        az_w = subproblem.axis_width(op.domain.bases[self.azimuth_axis], self.azimuth_axis)
        row = np.zeros((1, az_w * L * n))
        if m == 0:
            Iv = self._radial_integral_vector()
            row[0, :n] = Iv * (2 * np.pi * np.sqrt(2))  # cos, ell-slot 0
        mat = sparse.csr_matrix(row)
        return {var: mat @ mm for var, mm in op_mats.items()}


class BallConstantEmbed(LinearOperator):
    """Embed a field constant along (colatitude, radius) into a ball/shell
    basis (the tau_p / gauge-constant pattern): the ell=0 colatitude slot gets
    the radial expansion of the constant function."""

    name = 'ConvertConst'

    def __init__(self, operand, target_radial):
        self.target_radial = target_radial
        cs = target_radial.parent.coordsys
        self.coordsys = cs
        self.azimuth_axis = cs.coords[0].axis
        self.colatitude_axis = cs.coords[1].axis
        self.radius_axis = cs.coords[2].axis
        if operand.tensorsig:
            raise NotImplementedError("Constant embedding of tensors pending")
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        bases = list(op.domain.bases)
        bases[self.colatitude_axis] = self.target_radial.parent.colatitude_basis
        bases[self.radius_axis] = self.target_radial
        self.domain = Domain(self.dist, tuple(b for b in bases if b is not None))

    def new_operands(self, operand):
        return BallConstantEmbed(operand, self.target_radial)

    def matrix_dependence(self, *vars):
        return self.operand.matrix_dependence(*vars).copy()

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        out[self.radius_axis] = True
        return out

    def subproblem_matrix(self, subproblem):
        m = subproblem.group[self.azimuth_axis]
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        col = self.target_radial.constant_spatial_column()
        if m not in (None, 0):
            col = sparse.csr_matrix(col.shape)
        return sparse.csr_matrix(sparse.kron(sparse.identity(az_w), col))

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {var: mat @ m for var, m in op_mats.items()}

    def operate(self, arg_fields):
        field = arg_fields[0]
        field.require_coeff_space()
        data = field.data  # (..., M, 1, 1)
        # Cache key must include the parent colatitude size: the same radial
        # basis parameters can appear under different angular resolutions,
        # and the embed column spans the joint (colat slot, radial) block.
        L = self.target_radial.parent.colatitude_basis.size
        col = device_matrix(('BallConstEmbed', self.target_radial._key(), L),
                            lambda: np.asarray(
                                self.target_radial.constant_spatial_column().todense()))
        n = self.target_radial.size
        out = (data[..., 0] * col[:, 0]).reshape(data.shape[:-2] + (L, n))
        return self._build_output(self.dist.coeff_layout, out, scales=None)


class SphericalZCross(LinearOperator):
    """
    ez x u for ball/shell vector fields, with ez = cos(theta) er -
    sin(theta) e_theta the axial unit vector: the Coriolis operator.

    The reference expresses this as a meridional NCC (cross(ez, u) with ez a
    meridional-basis field; examples/evp_shell_rotating_convection); here it
    lowers to banded SWSH angular ladders instead: in spin components
        (ez x u)_s = s*i*Cos u_s + (s*i/sqrt(2)) Sin_{ds=s} u_r   (s = +-1)
        (ez x u)_r = sum_s (s*i/sqrt(2)) Sin_{ds=-s} u_s
    (Cos couples ell +- 1 at fixed spin; Sin shifts spin with an ell-banded
    matrix), conjugated to regularity components by the per-ell Q
    intertwiners. Subproblem matrices require complex dtype (the +-i factors);
    grid evaluation (explicit/RHS use) works for both dtypes.
    """

    def __init__(self, operand):
        if len(operand.tensorsig) != 1 or not isinstance(
                operand.tensorsig[0], SphericalCoordinates):
            raise ValueError("ZCross requires a spherical vector field")
        self.coordsys = operand.tensorsig[0]
        self.azimuth_axis = self.coordsys.coords[0].axis
        self.colatitude_axis = self.coordsys.coords[1].axis
        self.radius_axis = self.coordsys.coords[2].axis
        self.radial_in = operand.domain.bases[self.radius_axis]
        if not isinstance(self.radial_in, SphericalRadialBasis):
            raise ValueError("ZCross requires a ball/shell radial basis")
        super().__init__(operand)

    def _init_metadata(self):
        op = self.operand
        self.tensorsig = op.tensorsig
        self.dtype = op.dtype
        self.domain = op.domain

    def new_operands(self, operand):
        return SphericalZCross(operand)

    def matrix_dependence(self, *vars):
        out = self.operand.matrix_dependence(*vars).copy()
        out[self.azimuth_axis] = True
        return out

    def matrix_coupling(self, *vars):
        out = self.operand.matrix_coupling(*vars).copy()
        out[self.colatitude_axis] = True
        # The joint (ell, n) pencil layout requires the radial axis in the
        # pencil whenever colatitude couples
        out[self.radius_axis] = True
        return out

    def _spin_slot_matrix(self, m):
        """(3, L, 3, L) spin-component slot-coupling matrix at signed m."""
        from ..spectral import sphere as sphere_lib
        colat = self.radial_in.parent.colatitude_basis
        L = colat.size
        Lmax = colat.Lmax
        spin_of = {0: -1, 1: +1, 2: 0}

        def off(s):
            return max(abs(m), abs(s)) - abs(m)

        def place(M, si, sj, packed, scale):
            r0, c0 = off(spin_of[si]), off(spin_of[sj])
            A = np.asarray(sparse.csr_matrix(packed).todense())
            r1 = min(r0 + A.shape[0], L)
            c1 = min(c0 + A.shape[1], L)
            M[si, r0:r1, sj, c0:c1] += scale * A[:r1 - r0, :c1 - c0]

        M = np.zeros((3, L, 3, L), dtype=complex)
        for si, s in ((0, -1), (1, +1)):
            cos = sphere_lib.operator('Cos', 0, Lmax, m, s)
            place(M, si, si, cos, s * 1j)
            sin_up = sphere_lib.operator('Sin', s, Lmax, m, 0)
            place(M, si, 2, sin_up, s * 1j / np.sqrt(2))
            sin_dn = sphere_lib.operator('Sin', -s, Lmax, m, s)
            place(M, 2, si, sin_dn, s * 1j / np.sqrt(2))
        return M

    def _reg_slot_matrix(self, m):
        """Regularity-space (3L, 3L) matrix at signed m (Q-conjugated)."""
        from ..spectral import intertwiner as it
        colat = self.radial_in.parent.colatitude_basis
        L = colat.size
        Mspin = self._spin_slot_matrix(m)
        Qs = np.zeros((L, 3, 3))
        for j in range(L - abs(m)):
            Qs[j] = it.Q_matrix(abs(m) + j, 1)
        # reg = Q^T spin (Q real orthogonal): M_reg = Q^T M_spin Q per slot
        Mreg = np.einsum('jsa,sjtk,ktb->ajbk', Qs, Mspin, Qs)
        return Mreg.reshape(3 * L, 3 * L)

    def subproblem_matrix(self, subproblem):
        if not np.issubdtype(self.dtype, np.complexfloating):
            raise NotImplementedError(
                "ZCross subproblem matrices require complex dtype; use the "
                "explicit (RHS) form for real-dtype IVPs")
        m = subproblem.group[self.azimuth_axis]
        m = m if m is not None else 0
        az_w = subproblem.axis_width(
            self.operand.domain.bases[self.azimuth_axis], self.azimuth_axis)
        rb = self.radial_in
        L = rb.parent.colatitude_basis.size
        n = rb.size
        signed = getattr(rb, 'signed_pairs', False)
        mats = []
        for q in range(az_w):
            ms = m if q == 0 else (-m if signed else m)
            Mreg = sparse.csr_matrix(self._reg_slot_matrix(ms))
            mats.append(sparse.kron(Mreg, sparse.identity(n), format='csr'))
        # Layout: components outermost, then (az, L, n): permute the
        # (comp, L) kron blocks into comp-major with az between
        C = 3
        rowsz = az_w * L * n
        out = sparse.lil_matrix((C * rowsz, C * rowsz), dtype=complex)
        for q in range(az_w):
            Mq = mats[q].tocsr()
            for a in range(C):
                for b in range(C):
                    blk = Mq[a * L * n:(a + 1) * L * n, b * L * n:(b + 1) * L * n]
                    r0 = a * rowsz + q * L * n
                    c0 = b * rowsz + q * L * n
                    out[r0:r0 + L * n, c0:c0 + L * n] = blk
        return sparse.csr_matrix(out)

    def expression_matrices(self, subproblem, vars, **kw):
        op_mats = self.operand.expression_matrices(subproblem, vars, **kw)
        mat = self.subproblem_matrix(subproblem)
        return {v: mat @ mm for v, mm in op_mats.items()}

    def operate(self, arg_fields):
        from . import arithmetic
        field = arg_fields[0]
        data = arithmetic._to_dealias_grid(field)
        dist = self.dist
        scales = self.domain.dealias
        colat = self.radial_in.parent.colatitude_basis
        theta = np.asarray(colat.global_grid(
            scales[self.colatitude_axis] if np.ndim(scales) else scales))
        shape = [1] * (data.ndim - 1)
        shape[self.colatitude_axis] = theta.size
        ct = jnp.asarray(np.cos(theta)).reshape(shape)
        st = jnp.asarray(np.sin(theta)).reshape(shape)
        u_phi, u_theta, u_r = data[0], data[1], data[2]
        v_phi = ct * u_theta + st * u_r
        v_theta = -ct * u_phi
        v_r = -st * u_phi
        out = jnp.stack([v_phi, v_theta, v_r])
        return self._build_output(self.dist.grid_layout, out, scales=scales)
