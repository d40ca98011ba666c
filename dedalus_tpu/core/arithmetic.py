"""
Arithmetic operator nodes: Add, Multiply (outer product), DotProduct,
CrossProduct.

Parity target (behavior): dedalus/core/arithmetic.py:51-989. Nonlinear
products evaluate in grid space at dealias scales; NCC (linear-side) products
lower to Clenshaw multiplication matrices per pencil.
"""

import numbers
import numpy as np
import jax.numpy as jnp
from scipy import sparse

from .field import Operand, Field
from .future import Future, as_operand
from .domain import Domain
from ..utils.general import prod


def merge_bases(b1, b2):
    """Output basis for combining terms along one axis (None = constant)."""
    from .basis import Jacobi
    if b1 is None:
        return b2
    if b2 is None:
        return b1
    if b1 == b2:
        return b1
    if isinstance(b1, Jacobi) and isinstance(b2, Jacobi):
        if (b1.coord, b1.size, b1.bounds, b1.a0, b1.b0) != (b2.coord, b2.size, b2.bounds, b2.a0, b2.b0):
            raise ValueError(f"Incompatible Jacobi bases: {b1} {b2}")
        a, b = max(b1.a, b2.a), max(b1.b, b2.b)
        if (a, b) == (b1.a, b1.b):
            return b1
        if (a, b) == (b2.a, b2.b):
            return b2
        return b1.clone_with(a=a, b=b)
    from .basis_polar import AnnulusRadialBasis, DiskRadialBasis
    if isinstance(b1, AnnulusRadialBasis) and isinstance(b2, AnnulusRadialBasis):
        if (b1.coord, b1.size, b1.radii, b1.alpha) != (b2.coord, b2.size, b2.radii, b2.alpha):
            raise ValueError(f"Incompatible annulus radial bases: {b1} {b2}")
        return b1 if b1.k >= b2.k else b2
    if isinstance(b1, DiskRadialBasis) and isinstance(b2, DiskRadialBasis):
        if (b1.coord, b1.size, b1.radius, b1.alpha) != (b2.coord, b2.size, b2.radius, b2.alpha):
            raise ValueError(f"Incompatible disk radial bases: {b1} {b2}")
        return b1 if b1.k >= b2.k else b2
    from .basis_ball import BallRadialBasis, SphericalShellRadialBasis
    if isinstance(b1, BallRadialBasis) and isinstance(b2, BallRadialBasis):
        if (b1.coord, b1.size, b1.radius, b1.alpha) != (b2.coord, b2.size, b2.radius, b2.alpha):
            raise ValueError(f"Incompatible ball radial bases: {b1} {b2}")
        return b1 if b1.k >= b2.k else b2
    if isinstance(b1, SphericalShellRadialBasis) and isinstance(b2, SphericalShellRadialBasis):
        if (b1.coord, b1.size, b1.radii, b1.alpha) != (b2.coord, b2.size, b2.radii, b2.alpha):
            raise ValueError(f"Incompatible shell radial bases: {b1} {b2}")
        return b1 if b1.k >= b2.k else b2
    raise ValueError(f"Cannot merge bases: {b1} {b2}")


def merge_domains(dist, *domains):
    bases = [None] * dist.dim
    for d in domains:
        for i, b in enumerate(d.bases):
            bases[i] = merge_bases(bases[i], b)
    return Domain(dist, tuple(b for b in bases if b is not None))


def _to_dealias_grid(field):
    """Return grid data of a field at its domain's dealias scales."""
    field.change_scales(field.domain.dealias)
    field.require_grid_space()
    return field.data


class Add(Future):
    """Addition of operands (parity: arithmetic.py:51,214)."""

    def __new__(cls, *args):
        args = [a for a in args if not (isinstance(a, numbers.Number) and a == 0)]
        if len(args) == 0:
            return 0
        if len(args) == 1 and isinstance(args[0], (Field, Future)):
            return args[0]
        return super().__new__(cls)

    def __init__(self, *args):
        if any(a is self for a in args):
            return  # __new__ passed an existing node through; do not re-init
        args = [a for a in args if not (isinstance(a, numbers.Number) and a == 0)]
        dist = next(a.dist for a in args if isinstance(a, (Field, Future)))
        args = [as_operand(a, dist=dist) for a in args]
        super().__init__(*args)

    def _init_metadata(self):
        ops = self._operands
        tsigs = {op.tensorsig for op in ops}
        if len(tsigs) > 1:
            raise ValueError(f"Cannot add operands with tensorsigs {tsigs}")
        self.tensorsig = ops[0].tensorsig
        self.dtype = np.result_type(*[op.dtype for op in ops])
        self.domain = merge_domains(self.dist, *[op.domain for op in ops])

    def new_operands(self, *operands):
        return Add(*operands)

    def split(self, *targets):
        withs, withouts = [], []
        for op in self._operands:
            w, wo = op.split(*targets)
            if not (isinstance(w, numbers.Number) and w == 0):
                withs.append(w)
            if not (isinstance(wo, numbers.Number) and wo == 0):
                withouts.append(wo)
        part_with = Add(*withs) if withs else 0
        part_without = Add(*withouts) if withouts else 0
        return part_with, part_without

    def is_linear_in(self, vars):
        return all(op.is_linear_in(vars) for op in self._operands)

    def sym_diff(self, variables, perturbations):
        terms = [op.sym_diff(variables, perturbations) for op in self._operands]
        terms = [t for t in terms if not (isinstance(t, numbers.Number) and t == 0)]
        return Add(*terms) if terms else 0

    def operate(self, arg_fields):
        datas = [_to_dealias_grid(f) for f in arg_fields]
        out = datas[0]
        for d in datas[1:]:
            out = out + d
        out = jnp.broadcast_to(out, self.tensor_shape_of(out))
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)

    def tensor_shape_of(self, data):
        shape = tuple(cs.dim for cs in self.tensorsig)
        grid = self.domain.grid_shape(self.domain.dealias)
        return shape + grid

    def expression_matrices(self, subproblem, vars, **kw):
        # Operands may output in different bases (e.g. dx(ux) in T(a,b) vs
        # dz(uz) in T(a+1,b+1)); their matrices only agree row-for-row after
        # conversion to this Add's merged output bases. Wrapping here keeps
        # the invariant "matrices output in self.domain.bases" regardless of
        # whether problem parsing reached this node with convert() (it does
        # not reach Adds nested under Multiply, e.g. -nu*lap(u)).
        # Parity: reference requires pre-expanded operands (arithmetic.py:214).
        from .operators import convert as _convert
        out = {}
        for op in self._operands:
            wrapped = _convert(op, self.domain.bases)
            mats = wrapped.expression_matrices(subproblem, vars, **kw)
            for var, mat in mats.items():
                out[var] = out[var] + mat if var in out else mat
        return out


class Multiply(Future):
    """
    Multiplication: scalar scaling, pointwise products, and tensor outer
    products (out tensorsig = a.tensorsig + b.tensorsig).
    Parity: arithmetic.py:258,745,823,909 (Product/Multiply variants).
    """

    def __new__(cls, *args):
        # Collapse numeric literals
        numerics = [a for a in args if isinstance(a, numbers.Number)]
        if numerics and all(isinstance(a, numbers.Number) for a in args):
            return prod(args)
        if any(isinstance(a, numbers.Number) and a == 0 for a in args):
            return 0
        # Strip unit scalars
        if len(args) == 2:
            a, b = args
            if isinstance(a, numbers.Number) and a == 1:
                return b
            if isinstance(b, numbers.Number) and b == 1:
                return a
        return super().__new__(cls)

    def __init__(self, *args):
        if any(a is self for a in args):
            return  # __new__ passed an existing node through; do not re-init
        self.scalar = 1
        operands = []
        for a in args:
            if isinstance(a, numbers.Number):
                self.scalar = self.scalar * a
            elif isinstance(a, Multiply) and len(a._operands) == 1:
                # Flatten nested scalar multiplies
                self.scalar = self.scalar * a.scalar
                operands.append(a._operands[0])
            else:
                operands.append(a)
        if not 1 <= len(operands) <= 2:
            raise ValueError("Multiply takes one or two non-numeric operands")
        super().__init__(*operands)

    def _init_metadata(self):
        ops = self._operands
        self.tensorsig = sum((op.tensorsig for op in ops), ())
        if isinstance(self.scalar, complex):
            self.dtype = np.result_type(np.complex128, *[op.dtype for op in ops])
        else:
            self.dtype = np.result_type(*[op.dtype for op in ops])
        self.domain = merge_domains(self.dist, *[op.domain for op in ops])

    def new_operands(self, *operands):
        return Multiply(self.scalar, *operands)

    def is_linear_in(self, vars):
        dep = [op.has(*vars) for op in self._operands]
        if sum(dep) == 0:
            return False
        if sum(dep) > 1:
            return False
        i = dep.index(True)
        return self._operands[i].is_linear_in(vars)

    def split(self, *targets):
        if len(self._operands) == 1:
            w, wo = self._operands[0].split(*targets)
            return (Multiply(self.scalar, w) if not _is_zero(w) else 0,
                    Multiply(self.scalar, wo) if not _is_zero(wo) else 0)
        a, b = self._operands
        # Split distributes through products linear in the target (dt terms)
        if a.has(*targets) and not b.has(*targets):
            aw, awo = a.split(*targets)
            return (Multiply(self.scalar, Multiply(aw, b)) if not _is_zero(aw) else 0,
                    Multiply(self.scalar, Multiply(awo, b)) if not _is_zero(awo) else 0)
        if b.has(*targets) and not a.has(*targets):
            bw, bwo = b.split(*targets)
            return (Multiply(self.scalar, Multiply(a, bw)) if not _is_zero(bw) else 0,
                    Multiply(self.scalar, Multiply(a, bwo)) if not _is_zero(bwo) else 0)
        if self.has(*targets):
            return (self, 0)
        return (0, self)

    def sym_diff(self, variables, perturbations):
        if len(self._operands) == 1:
            d = self._operands[0].sym_diff(variables, perturbations)
            return Multiply(self.scalar, d) if not _is_zero(d) else 0
        a, b = self._operands
        da = a.sym_diff(variables, perturbations)
        db = b.sym_diff(variables, perturbations)
        terms = []
        if not _is_zero(da):
            terms.append(Multiply(self.scalar, Multiply(da, b)))
        if not _is_zero(db):
            terms.append(Multiply(self.scalar, Multiply(a, db)))
        return Add(*terms) if terms else 0

    def operate(self, arg_fields):
        datas = [_to_dealias_grid(f) for f in arg_fields]
        if len(datas) == 1:
            out = self.scalar * datas[0]
        else:
            a, b = datas
            na = len(arg_fields[0].tensorsig)
            nb = len(arg_fields[1].tensorsig)
            # Outer product over tensor components, pointwise over space
            a_exp = a.reshape(a.shape[:na] + (1,) * nb + a.shape[na:])
            out = self.scalar * (a_exp * b)
        shape = tuple(cs.dim for cs in self.tensorsig) + self.domain.grid_shape(self.domain.dealias)
        out = jnp.broadcast_to(out, shape)
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)

    def matrix_coupling(self, *vars):
        out = super().matrix_coupling(*vars)
        # An NCC factor varying along an axis couples mode groups along it.
        # Curvilinear azimuth axes stay separable: supported NCCs are
        # axisymmetric there (enforced when the blocks are built), matching
        # the reference's m-independent NCC treatment.
        from .basis_polar import AzimuthMixin as AzimuthBasis
        for op in self._operands:
            if not op.has(*vars):
                ncc_vary = np.array(op.domain.nonconstant)
                for ax in range(len(ncc_vary)):
                    if isinstance(op.domain.bases[ax], AzimuthBasis):
                        ncc_vary[ax] = False
                out |= ncc_vary
        return out

    # --- NCC matrices ---

    def expression_matrices(self, subproblem, vars, **kw):
        if len(self._operands) == 1:
            mats = self._operands[0].expression_matrices(subproblem, vars, **kw)
            return {v: self.scalar * m for v, m in mats.items()}
        a, b = self._operands
        a_dep, b_dep = a.has(*vars), b.has(*vars)
        if a_dep and b_dep:
            raise ValueError(f"Non-linear product in matrix expression: {self}")
        if not a_dep and not b_dep:
            raise ValueError(f"Product independent of variables: {self}")
        ncc, operand = (a, b) if b_dep else (b, a)
        ncc_first = (operand is b)
        op_mats = operand.expression_matrices(subproblem, vars, **kw)
        # Curvilinear tensor NCCs couple components through Gamma intertwiners;
        # ball tensor OPERANDS additionally need per-regularity radial blocks
        # (the Zernike family shifts with the component's regularity total),
        # so any spherical product with tensor structure takes this path.
        if ncc.tensorsig or operand.tensorsig:
            from .basis_ball import SphericalRadialBasis, BallRadialBasis
            spherical = any(isinstance(bb, SphericalRadialBasis)
                            for bb in operand.domain.bases if bb is not None)
            ball = any(isinstance(bb, BallRadialBasis)
                       for bb in operand.domain.bases if bb is not None)
            if spherical and (ncc.tensorsig or ball):
                M = _spherical_ncc_matrix(ncc, operand, self.domain,
                                          subproblem, ncc_first)
                return {v: self.scalar * (M @ mm) for v, mm in op_mats.items()}
        # Disk (Zernike) radial NCCs: multiplication depends on the operand
        # component's (m, spin), so build per-component radial blocks
        from .basis_polar import DiskRadialBasis
        ncc_field_probe = ncc.evaluate() if isinstance(ncc, Future) else ncc
        if any(isinstance(bb, DiskRadialBasis)
               for bb in ncc_field_probe.domain.bases if bb is not None):
            M = _disk_ncc_matrix(ncc_field_probe, operand, self.domain,
                                 subproblem, ncc_first=ncc_first)
            return {v: self.scalar * (M @ mm) for v, mm in op_mats.items()}
        ncc_blocks = build_ncc_blocks(ncc, operand, self.domain, subproblem)
        # Assemble tensor structure: out comps = ncc comps (x) operand comps,
        # ordered (ncc, operand) if ncc first else (operand, ncc).
        n_op_comp = prod(tuple(cs.dim for cs in operand.tensorsig)) or 1
        rows = []
        for blk in ncc_blocks:  # one spatial matrix per ncc component
            rows.append(sparse.kron(sparse.identity(n_op_comp), blk))
        if ncc_first:
            M = sparse.vstack(rows) if len(rows) > 1 else rows[0]
        else:
            # operand comps vary slower: for each operand comp, all ncc comps
            M = sparse.kron(sparse.identity(n_op_comp),
                            sparse.vstack([b_ for b_ in _strip_kron(ncc_blocks)])) \
                if False else _operand_first_stack(ncc_blocks, n_op_comp)
        return {v: self.scalar * (M @ m) for v, m in op_mats.items()}


def _disk_ncc_pair_blocks(ncc_field, operand, out_domain, subproblem):
    """
    Per-(ncc comp, operand comp) multiplication blocks for disk geometry:
    an axisymmetric (m=0) NCC acting through per-(m, spin) Zernike Clenshaw
    radial matrices with the azimuthal (cos, -sin) pair structure
    (parity: reference basis.py:2554). Returns (blocks, meta) where
    blocks[(a_idx, b_idx)] maps the operand component's pair-pencil to the
    output component's, and None marks spin-forbidden couplings.
    """
    from .basis_polar import DiskRadialBasis
    from .coords import PolarCoordinates
    ncc_field.require_coeff_space()
    coeffs = np.asarray(ncc_field.data)
    r_axis = next(ax for ax, bb in enumerate(ncc_field.domain.bases)
                  if isinstance(bb, DiskRadialBasis))
    az_axis = r_axis - 1
    ncc_rbasis = ncc_field.domain.bases[r_axis]
    op_rbasis = operand.domain.bases[r_axis]
    out_rbasis = out_domain.bases[r_axis]
    n_tens = len(ncc_field.tensorsig)
    az_basis = ncc_field.domain.bases[az_axis]
    gs = az_basis.group_shape[0] if az_basis is not None else 1
    # Axisymmetry check: only the m=0 azimuth group may carry content
    c_all = coeffs.reshape((-1,) + coeffs.shape[n_tens:])
    if az_basis is not None:
        moved = np.moveaxis(c_all, 1 + az_axis, 1)
        tail = np.abs(moved[:, gs:]).max() if moved.shape[1] > gs else 0.0
        if tail > 1e-10 * max(np.abs(moved).max(), 1e-300):
            raise NotImplementedError(
                "Disk NCCs must be axisymmetric (m=0 content only)")

    def comp_rows(a_flat):
        """(cos, sin) m=0 radial coefficient rows of ncc component a."""
        comp = c_all[a_flat]
        if az_basis is None:
            return np.ravel(comp), None
        comp = np.moveaxis(comp, az_axis, 0)
        c0 = np.ravel(comp[0])
        c1 = np.ravel(comp[1]) if comp.shape[0] > 1 else None
        if c1 is not None and np.abs(c1).max() <= 1e-14 * max(np.abs(c0).max(), 1e-300):
            c1 = None
        return c0, c1

    m = subproblem.group[az_axis]
    m = 0 if m is None else m
    polar_cs = next((cs for cs in (list(ncc_field.tensorsig) + list(operand.tensorsig))
                     if isinstance(cs, PolarCoordinates)), None)
    ncc_shape = tuple(cs.dim for cs in ncc_field.tensorsig)
    op_shape = tuple(cs.dim for cs in operand.tensorsig)
    ncc_idxs = list(np.ndindex(*ncc_shape)) if ncc_shape else [()]
    op_idxs = list(np.ndindex(*op_shape)) if op_shape else [()]
    az_w = subproblem.axis_width(operand.domain.bases[az_axis], az_axis)
    # Leading axes before the polar pair (cylinder: the Fourier axis) pass
    # through as identity factors
    lead_w = prod(tuple(subproblem.axis_width(operand.domain.bases[ax], ax)
                        for ax in range(az_axis))) or 1
    if op_rbasis is None:
        # Operand constant along the disk (a gauge constant, or a field with
        # bases only on leading axes): out = ncc * const is a column per unit
        # constant DOF — the NCC's own (m=0, s_ncc) radial profile expressed
        # in the out basis. Content exists only in the m = 0 subproblem
        # (constant_column(m != 0) is the zero column), matching the
        # reference's general NCC/operand pairing (ref arithmetic.py:360-459).
        if polar_cs is not None and any(
                polar_cs.spintotal(operand.tensorsig, b_idx)
                for b_idx in op_idxs if b_idx):
            raise NotImplementedError(
                "Disk NCC times a constant operand with polar tensor "
                "components is not supported (a basis-less spin-s component "
                "has no regular m=0 disk representation: regularity |s| "
                "forces r^|s| behavior at the origin). Reference parity: "
                "the reference rejects this pairing too — every disk "
                "NCC x constant product routes the constant through "
                "ConvertConstantDisk, whose constructor raises for polar "
                "tensor components (ref basis.py:2619-2626, 'Tensors not "
                "yet supported').")
        synth = out_rbasis.clone_with(k=0)        # hosts the constant operand
        out_az = out_domain.bases[az_axis]
        az_w_out = subproblem.axis_width(out_az, az_axis)
        const_col = synth.constant_column(m)      # zero column when m != 0
        Nout = out_rbasis.size
        blocks = {}
        for a_flat, a_idx in enumerate(ncc_idxs):
            s_ncc = (polar_cs.spintotal(ncc_field.tensorsig, a_idx)
                     if (a_idx and polar_cs) else 0)
            c0, c1 = comp_rows(a_flat)
            zero_col = sparse.csr_matrix((Nout, 1))

            def col_for(row_c):
                if row_c is None:
                    return zero_col
                S = synth.ncc_comp_matrix(ncc_rbasis, out_rbasis, row_c,
                                          m, s_ncc, 0)
                if S is None:
                    return zero_col
                return sparse.csr_matrix(S @ const_col)

            for b_idx in op_idxs:
                if az_w_out == 1:
                    blk = col_for(c0)
                else:
                    # az-major pencil ordering (matches the kron(identity(az),
                    # radial) layout below): [cos slot; sin slot]. Signed
                    # pairs store the m=0 constant in the + slot only.
                    sin_c = None if getattr(out_rbasis, 'signed_pairs',
                                            False) else c1
                    blk = sparse.vstack(
                        [col_for(c0)]
                        + [col_for(sin_c)] * (az_w_out - 1), format='csr')
                if lead_w > 1:
                    blk = sparse.kron(sparse.identity(lead_w), blk)
                blocks[(a_idx, b_idx)] = sparse.csr_matrix(blk)
        meta = dict(ncc_idxs=ncc_idxs, op_idxs=op_idxs, az_w=az_w, N=1)
        return blocks, meta
    N = op_rbasis.size
    blocks = {}
    for a_flat, a_idx in enumerate(ncc_idxs):
        s_ncc = polar_cs.spintotal(ncc_field.tensorsig, a_idx) if (a_idx and polar_cs) else 0
        c0, c1 = comp_rows(a_flat)
        signed = getattr(op_rbasis, 'signed_pairs', False)
        for b_idx in op_idxs:
            s_arg = polar_cs.spintotal(operand.tensorsig, b_idx) if (b_idx and polar_cs) else 0
            S0 = op_rbasis.ncc_comp_matrix(ncc_rbasis, out_rbasis, c0, m, s_ncc, s_arg)
            S1 = (op_rbasis.ncc_comp_matrix(ncc_rbasis, out_rbasis, c1, m, s_ncc, s_arg)
                  if c1 is not None else None)
            Sm = (op_rbasis.ncc_comp_matrix(ncc_rbasis, out_rbasis, c0, -m, s_ncc, s_arg)
                  if (signed and az_w == 2) else None)
            if S0 is None and S1 is None and Sm is None:
                blocks[(a_idx, b_idx)] = None
                continue
            Z = sparse.csr_matrix(next(s for s in (S0, S1, Sm) if s is not None).shape)
            S0 = S0 if S0 is not None else Z
            if az_w == 1:
                blk = sparse.csr_matrix(S0)
            elif signed:
                # Signed (+m, -m) slots: per-slot radial blocks (the m=0
                # NCC's dead slot carries no 'sin' content by construction)
                blk = sparse.block_diag(
                    [S0, Sm if Sm is not None else Z], format='csr')
            elif S1 is None:
                blk = sparse.kron(sparse.identity(az_w), S0)
            else:
                # (cos, -sin) pair coupling of the m=0 NCC's sin content
                blk = sparse.bmat([[S0, -S1], [S1, S0]], format='csr')
            if lead_w > 1:
                blk = sparse.kron(sparse.identity(lead_w), blk)
            blocks[(a_idx, b_idx)] = blk
    meta = dict(ncc_idxs=ncc_idxs, op_idxs=op_idxs, az_w=az_w, N=N)
    return blocks, meta


def _disk_ncc_matrix(ncc_field, operand, out_domain, subproblem, ncc_first=True):
    """Full Multiply matrix on disk geometry: out comps = (ncc x operand)
    (or (operand x ncc)) with per-pair spin-resolved radial blocks."""
    blocks, meta = _disk_ncc_pair_blocks(ncc_field, operand, out_domain, subproblem)
    ncc_idxs, op_idxs = meta['ncc_idxs'], meta['op_idxs']
    zshape = next(b for b in blocks.values() if b is not None).shape
    Z = sparse.csr_matrix(zshape)
    get = lambda a, b: blocks[(a, b)] if blocks[(a, b)] is not None else Z

    def rows_for(a_idx):
        return sparse.block_diag([get(a_idx, b) for b in op_idxs], format='csr') \
            if len(op_idxs) > 1 else get(a_idx, op_idxs[0])
    if ncc_first:
        M = sparse.vstack([rows_for(a) for a in ncc_idxs]) \
            if len(ncc_idxs) > 1 else rows_for(ncc_idxs[0])
    else:
        # operand-major ordering: rows (b, a)
        cols = []
        for b in op_idxs:
            col = sparse.vstack([get(a, b) for a in ncc_idxs]) \
                if len(ncc_idxs) > 1 else get(ncc_idxs[0], b)
            cols.append(col)
        M = sparse.block_diag(cols, format='csr') if len(cols) > 1 else cols[0]
    return sparse.csr_matrix(M)


def _disk_ncc_dot_matrix(ncc_field, operand, out_domain, subproblem, ncc_first):
    """DotProduct matrix on disk geometry for vector ncc (.) vector operand
    -> scalar: coordinate contraction sum_c ncc_c op_c. In the spin basis the
    metric is antidiagonal (e+ . e- = 1), so out = sum_s B[(-s), (s)]."""
    if len(ncc_field.tensorsig) != 1 or len(operand.tensorsig) != 1:
        raise NotImplementedError(
            "Disk NCC dot products support vector@vector only")
    blocks, meta = _disk_ncc_pair_blocks(ncc_field, operand, out_domain, subproblem)
    zshape = next(b for b in blocks.values() if b is not None).shape
    Z = sparse.csr_matrix(zshape)
    get = lambda a, b: blocks[(a, b)] if blocks[(a, b)] is not None else Z
    # spin_ordering components: index 0 <-> index 1 are opposite spins
    cols = [get((1,), (0,)), get((0,), (1,))]
    return sparse.csr_matrix(sparse.hstack(cols))


def _operand_first_stack(ncc_blocks, n_op_comp):
    """Rows ordered (operand comp, ncc comp): block-diagonal over operand comps
    of the vstack of ncc component matrices."""
    stacked = sparse.vstack(ncc_blocks) if len(ncc_blocks) > 1 else ncc_blocks[0]
    return sparse.kron(sparse.identity(n_op_comp), stacked)


def _strip_kron(x):
    return x


def _spherical_ncc_matrix(ncc, operand, out_domain, subproblem, ncc_first):
    """
    Tensor NCC coupling on ball/shell geometries via Gamma intertwiner
    tensors (parity: arithmetic.py:560-583 Gamma). The NCC must be
    spherically symmetric (m=0, ell=0 content only: e.g. er, r_vec, radial
    profiles); the coefficient coupling per ell is then

        Gamma(ell) = Q_C(ell)^T (Q_A(0) (x) Q_B(ell))

    (spin-level products are plain outer products since the coordinate delta
    conjugates through the kron of unitaries), and each (out comp a, operand
    comp b) block is sum_c Gamma[a,(c,b)](ell) * R_c with R_c the radial
    Clenshaw product matrix of NCC component c.

    Shell radial bases have regularity-independent radial matrices; the ball
    needs envelope-shifted Zernike products per (ell, reg) and currently
    supports scalar NCCs only.
    """
    from ..spectral import intertwiner as it
    from .basis_ball import SphericalRadialBasis, BallRadialBasis
    dist = ncc.dist
    ncc_field = ncc.evaluate() if isinstance(ncc, Future) else ncc
    ncc_field.require_coeff_space()
    ncc_field.change_scales(1)
    coeffs = np.asarray(ncc_field.data)
    rank_A = len(ncc_field.tensorsig)
    rank_B = len(operand.tensorsig)
    C_A, C_B = 3**rank_A, 3**rank_B
    # Locate the spherical axes
    ball_axis = None
    for ax in range(dist.dim):
        if isinstance(operand.domain.bases[ax], SphericalRadialBasis):
            ball_axis = ax
    rb_op = operand.domain.bases[ball_axis]
    rb_out = out_domain.bases[ball_axis]
    rb_ncc = ncc_field.domain.bases[ball_axis]
    L = rb_op.parent.colatitude_basis.size
    n = rb_op.size
    m = subproblem.group[ball_axis - 2] or 0
    az_basis = operand.domain.bases[ball_axis - 2]
    az_w = subproblem.axis_width(az_basis, ball_axis - 2)
    dk_out = rb_out.k - rb_op.k
    # Spherical symmetry check + radial coefficient extraction per component
    spatial = coeffs.reshape((C_A,) + coeffs.shape[rank_A:])
    ncc_colat = ncc_field.domain.bases[ball_axis - 1]
    y00 = ncc_colat.constant_mode_value() if ncc_colat is not None else 1.0
    if isinstance(rb_op, BallRadialBasis) and not rank_A:
        # Scalar NCC times a ball tensor operand: multiplication by an ell=0
        # scalar commutes with the spin->regularity unitaries, so it stays
        # diagonal over components — but each component's radial expansion
        # lives in the regularity-shifted Zernike family l_eff = ell + reg,
        # so the Clenshaw blocks are built per (ell, regtotal).
        comp = spatial[0]
        tail = 0.0
        if comp.shape[0] > 1:
            tail = max(tail, np.abs(comp[1:]).max())
        if comp.shape[1] > 1:
            tail = max(tail, np.abs(comp[0, 1:]).max())
        if tail > 1e-12 * max(np.abs(comp).max(), 1e-300):
            raise NotImplementedError(
                "Ball NCCs must be spherically symmetric (ell=0 content only)")
        comp_indices = list(np.ndindex(*(3,) * rank_B)) if rank_B else [()]
        cache = {}
        diag = []
        for idx in comp_indices:
            reg = it.regtotal(idx)
            if reg not in cache:
                if rb_ncc is None:
                    val = float(np.ravel(comp)[0])
                    blocks = []
                    for j in range(L):
                        ell = abs(m) + j
                        if j >= L - abs(m) or ell + reg < 0:
                            blocks.append(sparse.csr_matrix((n, n)))
                            continue
                        conv = (rb_op.conversion_matrix_ell(ell, reg, dk_out,
                                                            size=n + 2 * dk_out)[:n, :n]
                                if dk_out else sparse.identity(n))
                        blocks.append(sparse.csr_matrix(val * conv))
                    cache[reg] = sparse.block_diag(blocks, format='csr')
                else:
                    cache[reg] = sparse.csr_matrix(rb_op.ncc_block_m(
                        m, comp[0, 0, :] * y00, rb_ncc.k, rb_ncc.alpha,
                        dk_out, reg=reg))
            diag.append(sparse.kron(sparse.identity(az_w), cache[reg],
                                    format='csr'))
        return sparse.block_diag(diag, format='csr')
    if isinstance(rb_op, BallRadialBasis):
        # Tensor NCC on the ball: the radial product matrix depends on the
        # regularity triple (reg_ncc, reg_arg, reg_out) and on ell through
        # the envelope-shifted Zernike families, so the Gamma assembly runs
        # with per-(ell, triple) radial blocks from ncc_comp_matrix_ell
        # (parity: basis.py:4088 _last_axis_component_ncc_matrix).
        if rb_ncc is None:
            raise NotImplementedError(
                "Constant-domain ball tensor NCCs are not supported; give the "
                "NCC a ball radial basis")
        ncc_indices = list(np.ndindex(*(3,) * rank_A))
        comp_data = []
        for c in range(C_A):
            comp = spatial[c]
            tail = 0.0
            if comp.shape[0] > 1:
                tail = max(tail, np.abs(comp[1:]).max())
            if comp.shape[1] > 1:
                tail = max(tail, np.abs(comp[0, 1:]).max())
            if tail > 1e-12 * max(np.abs(spatial).max(), 1e-300):
                raise NotImplementedError(
                    "Ball tensor NCCs must be spherically symmetric "
                    "(m=0, ell=0 content only)")
            if np.abs(comp).max() == 0.0:
                comp_data.append(None)
            else:
                comp_data.append((it.regtotal(ncc_indices[c]),
                                  comp[0, 0, :] * y00))
        rank_C = rank_A + rank_B
        out_indices = list(np.ndindex(*(3,) * rank_C))
        b_indices = list(np.ndindex(*(3,) * rank_B)) if rank_B else [()]
        rcache = {}

        def radial(ell, c, reg_c, reg_b, reg_a, coeffs):
            key = (ell, c, reg_b, reg_a)
            if key not in rcache:
                rcache[key] = rb_op.ncc_comp_matrix_ell(
                    coeffs, rb_ncc.k, rb_ncc.alpha, ell, reg_c, reg_b,
                    reg_a, dk_out)
            return rcache[key]

        zero_n = sparse.csr_matrix((n, n))
        rows = []
        for a in range(C_A * C_B):
            reg_a = it.regtotal(out_indices[a])
            row = []
            for b in range(C_B):
                reg_b = it.regtotal(b_indices[b])
                blocks = []
                for j in range(L):
                    ell = abs(m) + j
                    if j >= L - abs(m) or rb_op.n_size(ell) <= 0:
                        blocks.append(zero_n)
                        continue
                    Q_B = it.Q_matrix(ell, rank_B) if rank_B else np.eye(1)
                    Q_C = it.Q_matrix(ell, rank_C)
                    Q_A0 = it.Q_matrix(0, rank_A)
                    if ncc_first:
                        G = Q_C.T @ np.kron(Q_A0, Q_B)   # (a, (c, b))
                        col = lambda c: c * C_B + b
                    else:
                        G = Q_C.T @ np.kron(Q_B, Q_A0)   # (a, (b, c))
                        col = lambda c: b * C_A + c
                    blk = None
                    for c in range(C_A):
                        if comp_data[c] is None:
                            continue
                        g = G[a, col(c)]
                        if abs(g) < 1e-14:
                            continue
                        reg_c, coeffs = comp_data[c]
                        Rm = radial(ell, c, reg_c, reg_b, reg_a, coeffs)
                        if Rm is None:
                            continue
                        term = g * Rm
                        blk = term if blk is None else blk + term
                    blocks.append(zero_n if blk is None
                                  else sparse.csr_matrix(blk))
                row.append(sparse.kron(sparse.identity(az_w),
                                       sparse.block_diag(blocks),
                                       format='csr'))
            rows.append(row)
        return sparse.bmat(rows, format='csr')
    R_c = []
    for c in range(C_A):
        comp = spatial[c]
        tail = 0.0
        if comp.shape[0] > 1:
            tail = max(tail, np.abs(comp[1:]).max())
        if comp.shape[1] > 1:
            tail = max(tail, np.abs(comp[0, 1:]).max())
        if tail > 1e-12 * max(np.abs(spatial).max(), 1e-300):
            raise NotImplementedError(
                "Spherical tensor NCCs must be spherically symmetric")
        if np.abs(comp).max() == 0.0:
            R_c.append(None)
            continue
        if rb_ncc is None:
            # Constant component: value times conversion
            val = float(comp.ravel()[0])
            conv = (rb_op.conversion_matrix_ell(0, 0, dk_out, size=n)[:n, :n]
                    if dk_out and hasattr(rb_op, 'conversion_matrix_ell')
                    else sparse.identity(n))
            R_c.append(sparse.csr_matrix(val * conv))
        else:
            block = rb_op.ncc_block_m(m, comp[0, 0, :] * y00, rb_ncc.k,
                                      rb_ncc.alpha, dk_out)
            # ncc_block_m returns the (L*n, L*n) kron; extract one radial block
            R_c.append(sparse.csr_matrix(block[:n, :n]))
    # Assemble (a, b) blocks: block-diagonal over ell with Gamma(ell) weights
    Q_A0 = it.Q_matrix(0, rank_A) if rank_A else np.eye(1)
    rank_C = rank_A + rank_B
    rows = []
    for a in range(C_A * C_B):
        row = []
        for b in range(C_B):
            blocks = []
            for j in range(L):
                ell = abs(m) + j
                if j >= L - abs(m):
                    blocks.append(sparse.csr_matrix((n, n)))
                    continue
                Q_B = it.Q_matrix(ell, rank_B) if rank_B else np.eye(1)
                Q_C = it.Q_matrix(ell, rank_C)
                if ncc_first:
                    G = Q_C.T @ np.kron(Q_A0, Q_B)   # (a, (c, b))
                    col = lambda c: c * C_B + b
                else:
                    G = Q_C.T @ np.kron(Q_B, Q_A0)   # (a, (b, c))
                    col = lambda c: b * C_A + c
                blk = None
                for c in range(C_A):
                    if R_c[c] is None:
                        continue
                    g = G[a, col(c)]
                    if abs(g) < 1e-14:
                        continue
                    term = g * R_c[c]
                    blk = term if blk is None else blk + term
                blocks.append(sparse.csr_matrix((n, n)) if blk is None
                              else sparse.csr_matrix(blk))
            row.append(sparse.kron(sparse.identity(az_w),
                                   sparse.block_diag(blocks), format='csr'))
        rows.append(row)
    return sparse.bmat(rows, format='csr')


def build_ncc_blocks(ncc, operand, out_domain, subproblem):
    """
    Per-ncc-component spatial multiplication matrices for this subproblem,
    mapping operand pencil (spatial part) -> output pencil (spatial part).

    Requirements (round 1, Cartesian): the NCC must be constant along all
    separable (non-coupled) axes; it may vary along coupled axes, where
    multiplication lowers to a Clenshaw matrix (Jacobi) or convolution
    matrix (Fourier).
    """
    dist = ncc.dist
    ncc_field = ncc.evaluate() if isinstance(ncc, Future) else ncc
    ncc_field.require_coeff_space()
    coeffs = np.asarray(ncc_field.data)
    ncomp_ncc = prod(tuple(cs.dim for cs in ncc_field.tensorsig)) or 1
    spatial_shape = coeffs.shape[len(ncc_field.tensorsig):]
    coeffs = coeffs.reshape((ncomp_ncc,) + spatial_shape)
    from .basis_ball import SphericalRadialBasis
    ball_axis = None
    for ax in range(dist.dim):
        if isinstance(operand.domain.bases[ax], SphericalRadialBasis):
            ball_axis = ax
    blocks = []
    for i in range(ncomp_ncc):
        axis_mats = []
        # Track whether any axis consumed the coefficient magnitudes; if the
        # NCC is constant along every axis, its component VALUE must scale the
        # block explicitly.
        coeffs_consumed = False
        scalar = 1.0
        for axis in range(dist.dim):
            ncc_basis = ncc_field.domain.bases[axis]
            op_basis = operand.domain.bases[axis]
            out_basis = out_domain.bases[axis]
            coupled = subproblem.coupled[axis]
            op_width = subproblem.axis_width(op_basis, axis)
            if ball_axis is not None and axis == ball_axis - 1:
                # Colatitude of a ball operand: absorbed into the joint
                # (ell, n) radial block below
                axis_mats.append(sparse.identity(1))
                continue
            if ball_axis is not None and axis == ball_axis:
                # Joint (colatitude x radius) multiplication block. Round-1:
                # spherically symmetric NCCs (ell=0 content only), for which
                # multiplication is block-diagonal over ell (parity:
                # basis.py:4088 ball NCC matrices).
                m = subproblem.group[ball_axis - 2] or 0
                dk_out = out_basis.k - op_basis.k
                if ncc_basis is None:
                    axis_mats.append(op_basis.conversion_block_m(m, dk_out)
                                     if dk_out else
                                     sparse.identity(op_width * subproblem.axis_width(
                                         operand.domain.bases[axis - 1], axis - 1)))
                    continue
                c = coeffs[i]  # (M, L, n)
                tail = np.abs(c[1:]).max() if c.shape[0] > 1 else 0.0
                tail = max(tail, np.abs(c[0, 1:]).max() if c.shape[1] > 1 else 0.0)
                if tail > 1e-12 * max(np.abs(c).max(), 1e-300):
                    raise NotImplementedError(
                        "Ball NCCs must be spherically symmetric (round 1)")
                coeffs_consumed = True
                # Undo the angular (Y_00) normalization carried by the
                # spectral coefficients: coeff_00(r) = ncc(r) / Y00_value.
                # Standalone radial-basis NCCs carry no angular transform
                # (constant angular axes), so no normalization to undo.
                ncc_colat = ncc_field.domain.bases[axis - 1]
                y00 = ncc_colat.constant_mode_value() if ncc_colat is not None else 1.0
                axis_mats.append(op_basis.ncc_block_m(
                    m, c[0, 0, :] * y00, ncc_basis.k, ncc_basis.alpha, dk_out))
                continue
            if not coupled:
                if ncc_basis is not None:
                    from .basis_polar import AzimuthMixin as AzimuthBasis
                    if not isinstance(ncc_basis, AzimuthBasis):
                        raise NotImplementedError(
                            "NCCs varying along separable axes are not supported yet")
                    # Axisymmetric NCC: the azimuth factor is the m=0 value
                    # (constancy enforced by the curvilinear block builders)
                axis_mats.append(sparse.identity(op_width))
            else:
                if ncc_basis is None:
                    # Constant along this coupled axis; possible conversion op->out
                    if op_basis is None:
                        axis_mats.append(sparse.identity(1))
                    elif op_basis == out_basis:
                        axis_mats.append(sparse.identity(op_width))
                    else:
                        axis_mats.append(op_basis.conversion_matrix(out_basis))
                else:
                    c_i = _axis_coeffs(coeffs[i], axis, spatial_shape)
                    coeffs_consumed = True
                    if op_basis is None:
                        # NCC varying, operand constant: column of ncc coeffs
                        # times conversion of the constant into the out basis
                        mat = _ncc_times_constant(ncc_basis, out_basis, c_i)
                        axis_mats.append(mat)
                    else:
                        axis_mats.append(op_basis.ncc_matrix(ncc_basis, out_basis, c_i,
                                                             cutoff=1e-10))
        if not coeffs_consumed:
            # Fully constant NCC: the component value scales the block
            scalar = complex(coeffs[i].ravel()[0]) if np.iscomplexobj(coeffs) \
                else float(coeffs[i].ravel()[0])
        mat = axis_mats[0]
        for m in axis_mats[1:]:
            mat = sparse.kron(mat, m)
        blocks.append(sparse.csr_matrix(scalar * mat))
    return blocks


def _axis_coeffs(comp_coeffs, axis, spatial_shape):
    """Extract the 1D coefficient vector along `axis` (other axes must be size 1)."""
    sel = [0] * len(spatial_shape)
    sel[axis] = slice(None)
    return np.asarray(comp_coeffs[tuple(sel)])


def _constant_embedding(basis):
    """Column embedding a constant value into basis coefficients."""
    from .basis import Jacobi, RealFourier, ComplexFourier
    from ..spectral import jacobi as jacobi_lib
    if hasattr(basis, 'constant_column'):
        return basis.constant_column(0)
    col = np.zeros((basis.size, 1), dtype=complex if type(basis).__name__ == 'ComplexFourier' else float)
    if isinstance(basis, Jacobi):
        col[0, 0] = float(np.sqrt(jacobi_lib.mass(basis.a, basis.b)))
    else:
        col[0, 0] = 1.0
    return sparse.csr_matrix(col)


def _ncc_times_constant(ncc_basis, out_basis, ncc_coeffs):
    """Column: (ncc(z) * const) coefficients in out_basis, per unit constant."""
    from .basis import Jacobi
    from ..spectral import jacobi as jacobi_lib
    if isinstance(ncc_basis, Jacobi):
        conv = jacobi_lib.conversion_matrix(ncc_basis.size, ncc_basis.a, ncc_basis.b,
                                            out_basis.a, out_basis.b)
        col = conv @ ncc_coeffs
        return sparse.csr_matrix(col[:, None])
    if ncc_basis == out_basis:
        return sparse.csr_matrix(np.asarray(ncc_coeffs)[:, None])
    raise NotImplementedError(f"NCC-times-constant for {ncc_basis} -> {out_basis}")


def _is_zero(x):
    return isinstance(x, numbers.Number) and x == 0


class DotProduct(Future):
    """
    Tensor contraction of the last index of a with the first index of b.
    Parity: arithmetic.py:587.
    """

    def __init__(self, a, b):
        if not isinstance(a, (Field, Future)) or not isinstance(b, (Field, Future)):
            raise ValueError("DotProduct requires two operands")
        if not a.tensorsig or not b.tensorsig:
            raise ValueError("DotProduct requires tensor operands")
        if a.tensorsig[-1].dim != b.tensorsig[0].dim:
            raise ValueError("Contraction dimension mismatch")
        super().__init__(a, b)

    def _init_metadata(self):
        a, b = self._operands
        self.tensorsig = a.tensorsig[:-1] + b.tensorsig[1:]
        self.dtype = np.result_type(a.dtype, b.dtype)
        self.domain = merge_domains(self.dist, a.domain, b.domain)

    def new_operands(self, *operands):
        return DotProduct(*operands)

    def is_linear_in(self, vars):
        a, b = self._operands
        dep = [a.has(*vars), b.has(*vars)]
        if sum(dep) != 1:
            return False
        i = dep.index(True)
        return self._operands[i].is_linear_in(vars)

    def sym_diff(self, variables, perturbations):
        a, b = self._operands
        da = a.sym_diff(variables, perturbations)
        db = b.sym_diff(variables, perturbations)
        terms = []
        if not _is_zero(da):
            terms.append(DotProduct(da, b))
        if not _is_zero(db):
            terms.append(DotProduct(a, db))
        return Add(*terms) if terms else 0

    def operate(self, arg_fields):
        a_field, b_field = arg_fields
        a = _to_dealias_grid(a_field)
        b = _to_dealias_grid(b_field)
        na = len(a_field.tensorsig)
        nb = len(b_field.tensorsig)
        # Contract a's last tensor axis with b's first via broadcast-multiply + sum
        # a: (A..., c, space), b: (c, B..., space)
        a_exp = jnp.expand_dims(a, axis=tuple(range(na, na + nb - 1)))  # (A..., c, 1xB-1, space)
        b_exp = jnp.expand_dims(b, axis=tuple(range(0, na - 1)))        # (1xA-1, c, B..., space)
        out = jnp.sum(a_exp * b_exp, axis=na - 1)
        shape = tuple(cs.dim for cs in self.tensorsig) + self.domain.grid_shape(self.domain.dealias)
        out = jnp.broadcast_to(out, shape)
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)

    def matrix_coupling(self, *vars):
        out = super().matrix_coupling(*vars)
        # As in Multiply: curvilinear azimuth axes stay separable for NCC
        # factors (axisymmetry enforced at block build)
        from .basis_polar import AzimuthMixin as AzimuthBasis
        for op in self._operands:
            if not op.has(*vars):
                ncc_vary = np.array(op.domain.nonconstant)
                for ax in range(len(ncc_vary)):
                    if isinstance(op.domain.bases[ax], AzimuthBasis):
                        ncc_vary[ax] = False
                out |= ncc_vary
        return out

    def expression_matrices(self, subproblem, vars, **kw):
        a, b = self._operands
        a_dep, b_dep = a.has(*vars), b.has(*vars)
        if a_dep and b_dep:
            raise ValueError(f"Nonlinear dot product in matrix expression: {self}")
        ncc, operand = (a, b) if b_dep else (b, a)
        ncc_first = (operand is b)
        op_mats = operand.expression_matrices(subproblem, vars, **kw)
        # Disk (Zernike) NCC dot products: spin-resolved radial blocks with
        # the antidiagonal spin metric
        from .basis_polar import DiskRadialBasis, AnnulusRadialBasis
        ncc_field_probe = ncc.evaluate() if isinstance(ncc, Future) else ncc
        if any(isinstance(bb, DiskRadialBasis)
               for bb in ncc_field_probe.domain.bases if bb is not None):
            M = _disk_ncc_dot_matrix(ncc_field_probe, operand, self.domain,
                                     subproblem, ncc_first)
            return {v: (M @ m) for v, m in op_mats.items()}
        # Curvilinear (shell/ball/annulus) NCC dot products: coefficient
        # components are spin/regularity components whose contraction metric
        # is NOT the identity. Lower rank-1 . rank-1 to Trace(outer product):
        # Multiply's Gamma-intertwiner NCC machinery and the geometry's Trace
        # contraction both carry the correct metric (ref arithmetic.py:587
        # DotProduct builds from the same component machinery).
        from .basis_ball import SphericalRadialBasis
        spherical = any(isinstance(bb, SphericalRadialBasis)
                        for bb in operand.domain.bases if bb is not None)
        annular = any(isinstance(bb, AnnulusRadialBasis)
                      for bb in ncc_field_probe.domain.bases if bb is not None)
        if (spherical or annular) and len(a.tensorsig) == 1 \
                and len(b.tensorsig) == 1:
            from .operators import Trace
            outer = Multiply(a, b)
            traced = Trace(outer)
            return traced.expression_matrices(subproblem, vars, **kw)
        ncc_blocks = build_ncc_blocks(ncc, operand, self.domain, subproblem)
        dim_c = (a.tensorsig[-1] if ncc_first else b.tensorsig[0]).dim
        n_ncc_comp = prod(tuple(cs.dim for cs in ncc.tensorsig))
        n_op_comp = prod(tuple(cs.dim for cs in operand.tensorsig))
        if ncc_first:
            # out_{A..., B...} = sum_c ncc_{A...,c} op_{c,B...}
            n_A = n_ncc_comp // dim_c
            n_B = n_op_comp // dim_c
            rows = []
            for Ai in range(n_A):
                # sum over c of blocks: hstack over operand's leading c index
                row = sparse.hstack([sparse.kron(sparse.identity(n_B),
                                                 ncc_blocks[Ai * dim_c + c])
                                     for c in range(dim_c)])
                rows.append(row)
            M = sparse.vstack(rows) if len(rows) > 1 else rows[0]
        else:
            # out_{A..., B...} = sum_c op_{A...,c} ncc_{c,B...}
            n_A = n_op_comp // dim_c
            n_B = n_ncc_comp // dim_c
            rows = []
            for Ai in range(n_A):
                for Bi in range(n_B):
                    row_blocks = []
                    for Ai2 in range(n_A):
                        for c in range(dim_c):
                            if Ai2 == Ai:
                                row_blocks.append(ncc_blocks[c * n_B + Bi])
                            else:
                                row_blocks.append(None)
                    row = sparse.hstack([blk if blk is not None else
                                         sparse.csr_matrix(ncc_blocks[0].shape)
                                         for blk in row_blocks])
                    rows.append(row)
            M = sparse.vstack(rows) if len(rows) > 1 else rows[0]
        return {v: (M @ m) for v, m in op_mats.items()}


class CrossProduct(Future):
    """3D cross product of vectors (parity: arithmetic.py:678)."""

    def __init__(self, a, b):
        if a.tensorsig[-1].dim != 3 or b.tensorsig[0].dim != 3:
            raise ValueError("CrossProduct requires 3D vectors")
        super().__init__(a, b)

    def _init_metadata(self):
        a, b = self._operands
        self.tensorsig = a.tensorsig
        self.dtype = np.result_type(a.dtype, b.dtype)
        self.domain = merge_domains(self.dist, a.domain, b.domain)

    def new_operands(self, *operands):
        return CrossProduct(*operands)

    def is_linear_in(self, vars):
        a, b = self._operands
        dep = [a.has(*vars), b.has(*vars)]
        if sum(dep) != 1:
            return False
        return self._operands[dep.index(True)].is_linear_in(vars)

    def sym_diff(self, variables, perturbations):
        a, b = self._operands
        da = a.sym_diff(variables, perturbations)
        db = b.sym_diff(variables, perturbations)
        terms = []
        if not _is_zero(da):
            terms.append(CrossProduct(da, b))
        if not _is_zero(db):
            terms.append(CrossProduct(a, db))
        return Add(*terms) if terms else 0

    def operate(self, arg_fields):
        a = _to_dealias_grid(arg_fields[0])
        b = _to_dealias_grid(arg_fields[1])
        out = jnp.cross(a, b, axis=0)
        # Left-handed component orderings (spherical (phi, theta, r)) flip
        # the sign of the standard component formula (ref operators.py:3708)
        if not getattr(self.tensorsig[0], 'right_handed', True):
            out = -out
        return self._build_output(self.dist.grid_layout, out, scales=self.domain.dealias)


__all__ = ['Add', 'Multiply', 'DotProduct', 'CrossProduct']
