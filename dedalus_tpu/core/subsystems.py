"""
Subproblems: per-mode-group pencil systems.

Parity target (behavior): dedalus/core/subsystems.py:34-739 (Subsystem/
Subproblem, valid-mode filtering, squareness). TPU-first redesign:

  * Every group gets an IDENTICAL pencil layout (constant-axis fields occupy
    width-1 slots in all groups; invalid modes get identity pivots), so the
    per-step solve is ONE batched dense solve over a (G, P, P) stack on the
    MXU instead of per-pencil scattered sparse solves.
  * Gather/scatter between field coefficient data and pencil vectors are
    static int32 index maps (XLA gathers), built once at solver setup.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp
from scipy import sparse

from ..utils.general import prod
from ..utils.config import config

logger = logging.getLogger(__name__)


class SeparableMatrixStack:
    """
    Exact polynomial-in-group-wavenumber representation of a (G, P, P) pencil
    stack: A[g] = sum_p ghat[g]^p B_p for generic groups, with exceptional
    groups (special validity patterns: mean mode, Nyquist) stored exactly.

    This is the memory- and time-scalable form of the reference's per-pencil
    sparse matrices (ref subsystems.py:497-552): at 2048^2 RBC only ~10 groups
    are ever assembled and storage is O((d+1) nnz), not O(G P^2).
    """

    def __init__(self, G, shape, B_sparse, ghat, bad):
        self.G = G
        self.shape = shape              # (R, C)
        self.B = B_sparse               # list of scipy CSR, length d+1
        self.ghat = np.asarray(ghat)    # (G,)
        self.bad = dict(bad)            # {g: exact scipy CSR}
        self.degree = len(B_sparse) - 1

    def weights(self):
        """(G, d+1) Vandermonde evaluation weights (zeroed on bad groups)."""
        W = np.vander(self.ghat, self.degree + 1, increasing=True)
        for g in self.bad:
            W[g] = 0.0
        return W

    def dense_B(self, dtype=np.float64):
        return np.stack([np.asarray(Bp.todense(), dtype=dtype) for Bp in self.B])

    def group(self, g):
        """Exact scipy CSR for one group."""
        if g in self.bad:
            return self.bad[g]
        x = self.ghat[g]
        A = self.B[0].copy()
        for p in range(1, len(self.B)):
            A = A + (x ** p) * self.B[p]
        return A.tocsr()

    def __len__(self):
        return self.G

    def __getitem__(self, g):
        return self.group(g)

    def __iter__(self):
        return (self.group(g) for g in range(self.G))


class LazyCombined:
    """
    Lazy linear combination sum_i c_i * stack_i of separable pencil stacks
    with identity pivots installed, exposed to the matsolvers without ever
    materializing a dense (G, P, P) array. The TPU-scalable replacement for
    the reference's per-group `a*M + b*L` expanded-matrix path
    (ref subsystems.py:568-600, timesteppers.py:174-180).
    """

    def __init__(self, pencil, coeffs):
        self.pencil = pencil
        self.coeffs = {k: float(v) for k, v in coeffs.items()}
        self.G = pencil.G
        self.P = pencil.R
        self.shape = (self.G, self.P, self.P)
        self.dtype = pencil.dtype

    def group(self, g):
        """Dense (P, P) combined matrix for one group, pivots installed."""
        pencil = self.pencil
        A = None
        for name, c in self.coeffs.items():
            term = c * pencil.matrices_scipy[name][g]
            A = term if A is None else A + term
        A = np.asarray(A.todense())
        inv_rows, inv_cols = pencil.pivot_pairs[g]
        A[inv_rows, inv_cols] = 1.0
        return A

    def group_sparse(self, g, pivot_pairs=None):
        """Sparse combined matrix for one group, pivots installed.
        pivot_pairs overrides the pencil's default invalid row/col pairing
        (any bijection is valid; the banded path re-pairs by permuted
        position so the identity pivots land near the band diagonal)."""
        pencil = self.pencil
        A = None
        for name, c in self.coeffs.items():
            term = c * pencil.matrices_scipy[name][g]
            A = term if A is None else A + term
        inv_rows, inv_cols = (pencil.pivot_pairs[g] if pivot_pairs is None
                              else pivot_pairs[g])
        if inv_rows.size:
            piv = sparse.csr_matrix(
                (np.ones(inv_rows.size), (inv_rows, inv_cols)), shape=A.shape)
            A = A + piv
        return A.tocsr()

    def sparse_form(self):
        """Combined separable SPARSE form with pivots:
        (B_sparse list, weights (G,d+1), bad {g: exact CSR}, ghat)."""
        pencil = self.pencil
        seps = pencil.separable
        if seps is None:
            raise ValueError("pencil has no separable representation")
        degree = max(seps[name].degree for name in self.coeffs)
        Bps = []
        for p in range(degree + 1):
            Bp = None
            for name, c in self.coeffs.items():
                sN = seps[name]
                if p <= sN.degree:
                    term = c * sN.B[p]
                    Bp = term if Bp is None else Bp + term
            Bps.append(Bp.tocsr() if Bp is not None
                       else sparse.csr_matrix((self.P, self.P)))
        # Bad groups: per-stack exceptions + pivot-pattern deviants
        bad = set()
        for name in self.coeffs:
            bad |= set(seps[name].bad)
        generic = [g for g in range(self.G) if g not in bad]
        pat0 = _pivot_key(pencil.pivot_pairs[generic[0]])
        for g in generic:
            if _pivot_key(pencil.pivot_pairs[g]) != pat0:
                bad.add(g)
        generic = [g for g in range(self.G) if g not in bad]
        inv_rows, inv_cols = pencil.pivot_pairs[generic[0]]
        if inv_rows.size:
            piv = sparse.csr_matrix(
                (np.ones(inv_rows.size), (inv_rows, inv_cols)),
                shape=(self.P, self.P))
            Bps[0] = (Bps[0] + piv).tocsr()
        ghat = seps[next(iter(self.coeffs))].ghat
        W = np.vander(ghat, degree + 1, increasing=True)
        bad_idx = tuple(sorted(bad))
        for g in bad_idx:
            W[g] = 0.0
        bad_mats = {g: self.group_sparse(g) for g in bad_idx}
        return Bps, W, bad_mats, ghat

    def banded_form(self):
        """Inputs for the bordered block-tridiagonal solver: the pencil's
        banded plan plus the combined sparse form (separable when available,
        else exact per-group)."""
        plan = self.pencil.banded_plan()
        if plan is None:
            raise ValueError("pencil has no bordered-banded structure")
        if self.pencil.separable is not None:
            Bps, W, bad_mats, _ = self.sparse_form()
            return dict(B_sparse=Bps, weights=W, bad=bad_mats, **plan)
        # Slot-split spherical pencils: install identity pivots with the
        # banded-friendly pairing (sorted by permuted position), so the
        # triangular-truncation zero rows/cols get in-band pivots instead of
        # far-corner entries that would leave the band rank-deficient.
        # NOTE: ball saddle systems (incompressible u + p) still carry ONE
        # band kernel per group that no in-band unit placement can pin (the
        # homogeneous tau/pressure ladder is anchored only by content at
        # |row-col| ~ P: the gauge pivot and the BC rows' far coefficients);
        # the factorization detects this per group and the solver escalates
        # to dense overrides or falls back to the poly matsolver. Shell,
        # annulus, disk and Cartesian pencils factor banded.
        bpairs = self.pencil.banded_pivot_pairs(plan['order'])
        exact = [self.group_sparse(g, pivot_pairs=bpairs)
                 for g in range(self.G)]
        return dict(B_sparse=None, weights=None, bad={}, exact=exact, **plan)

    def __getitem__(self, g):
        return self.group(g)

    def poly_form(self):
        """
        Combined separable form with pivots: dict(weights (G, d+1),
        B (d+1, P, P) dense f64, bad_idx, Abad (nbad, P, P)).
        Generic groups share one pivot pattern (installed into B_0, whose
        weight is 1 for every group); groups whose pivot pattern differs are
        exceptional and stored exactly.
        """
        pencil = self.pencil
        seps = pencil.separable
        if seps is None:
            raise ValueError("pencil has no separable representation")
        degree = max(seps[name].degree for name in self.coeffs)
        P = self.P
        # Combined polynomial coefficient matrices
        B = np.zeros((degree + 1, P, P))
        for name, c in self.coeffs.items():
            s = seps[name]
            for p, Bp in enumerate(s.B):
                B[p] += c * np.asarray(Bp.todense())
        # Bad groups: union of per-stack exceptional groups + pivot deviants
        bad = set()
        for name in self.coeffs:
            bad |= set(seps[name].bad)
        generic = [g for g in range(self.G) if g not in bad]
        pat0 = _pivot_key(pencil.pivot_pairs[generic[0]])
        for g in generic:
            if _pivot_key(pencil.pivot_pairs[g]) != pat0:
                bad.add(g)
        generic = [g for g in range(self.G) if g not in bad]
        inv_rows, inv_cols = pencil.pivot_pairs[generic[0]]
        B[0][inv_rows, inv_cols] += 1.0
        ghat = seps[next(iter(self.coeffs))].ghat
        W = np.vander(ghat, degree + 1, increasing=True)
        bad_idx = tuple(sorted(bad))
        for g in bad_idx:
            W[g] = 0.0
        Abad = np.stack([self.group(g) for g in bad_idx]) if bad_idx \
            else np.zeros((0, P, P))
        # Sparse coefficient matrices (same content as B): node matrices of
        # the Chebyshev inverse fit factor ~1000x faster through sparse LU
        # than dense LAPACK on a single-core host at large P
        B_sparse = []
        for p in range(degree + 1):
            Sp = None
            for name, c in self.coeffs.items():
                s = seps[name]
                if p < len(s.B):
                    term = c * s.B[p]
                    Sp = term if Sp is None else Sp + term
            Sp = Sp.tocsr() if Sp is not None else sparse.csr_matrix((P, P))
            if p == 0:
                piv = sparse.csr_matrix(
                    (np.ones(inv_rows.size), (inv_rows, inv_cols)),
                    shape=(P, P))
                Sp = (Sp + piv).tocsr()
            B_sparse.append(Sp)
        return dict(weights=W, B=B, bad_idx=bad_idx, Abad=Abad, ghat=ghat,
                    B_sparse=B_sparse)


def _pivot_key(pair):
    inv_rows, inv_cols = pair
    return (tuple(inv_rows.tolist()), tuple(inv_cols.tolist()))


class Subproblem:
    """One mode group: geometry queries used by expression_matrices."""

    def __init__(self, dist, coupled, group, group_wavenumbers,
                 group_native=None):
        self.dist = dist
        self.coupled = tuple(coupled)             # per axis
        self.group = tuple(group)                 # int for separable axes, None for coupled
        self.group_wavenumbers = group_wavenumbers  # dict axis -> wavenumber (fit coordinate)
        # dict axis -> native integer group value (signed wavenumber for
        # ComplexFourier); falls back to the enumeration index
        self.group_native = group_native or {}

    @property
    def group_dict(self):
        """Equation-condition namespace (reference subsystems.py:257-261,
        basis.py:884-890): 'n' + coordinate name -> this group's NATIVE
        value along that axis — the signed integer wavenumber for Fourier
        axes, the group index otherwise (coupled axes carry no group)."""
        out = {}
        for axis, g in enumerate(self.group):
            if g is not None:
                out['n' + self.dist.coords[axis].name] = \
                    self.group_native.get(axis, g)
        return out

    def axis_width(self, basis, axis):
        if basis is None:
            return 1
        if self.coupled[axis]:
            return basis.coeff_size
        return basis.group_shape[0]

    def group_slice(self, basis, axis):
        """Slice of the full coefficient axis corresponding to this group."""
        if self.coupled[axis] or self.group[axis] is None:
            return slice(None) if basis is not None else slice(0, 1)
        if basis is None:
            return slice(0, 1)
        gs = basis.group_shape[0]
        g = self.group[axis]
        return slice(g * gs, (g + 1) * gs)

    def spatial_size(self, domain):
        return prod(tuple(self.axis_width(domain.bases[i], i)
                          for i in range(self.dist.dim)))

    def field_size(self, operand):
        ncomp = prod(tuple(cs.dim for cs in operand.tensorsig)) or 1
        return ncomp * self.spatial_size(operand.domain)

    # --- validity ---

    def valid_mask(self, domain, tensorsig):
        """Boolean mask over the pencil entries of a field/equation
        (component-major, matching the pencil layout)."""
        comp_indices = [()]
        if tensorsig:
            comp_indices = list(np.ndindex(*[cs.dim for cs in tensorsig]))
        comp_masks = []
        for cidx in comp_indices:
            axis_masks = []
            for axis in range(self.dist.dim):
                basis = domain.bases[axis]
                if basis is None:
                    if self.coupled[axis] or self.group[axis] is None:
                        axis_masks.append(np.ones(1, dtype=bool))
                    else:
                        # Constant along a separable axis: valid only in group 0
                        axis_masks.append(np.array([self.group[axis] == 0]))
                elif self.coupled[axis]:
                    if hasattr(basis, 'joint_valid_for_m'):
                        # Validity joint over (azimuth pair, colatitude,
                        # radius): radial truncation depends on ell = |m| +
                        # colatitude slot, and the m=0 sin slots drop only at
                        # ell == 0 for rank <= 1 (ref basis.py:3204-3210).
                        # The hook returns the flattened joint mask; the
                        # azimuth and colatitude masks are absorbed into it.
                        m = self.group[axis - 2] or 0
                        az_basis = domain.bases[axis - 2]
                        az_w = az_basis.group_shape[0] if az_basis is not None else 1
                        axis_masks[axis - 2] = np.ones(1, dtype=bool)
                        axis_masks[-1] = np.ones(1, dtype=bool)
                        axis_masks.append(
                            basis.joint_valid_for_m(m, tensorsig, cidx, az_w))
                    elif hasattr(basis, 'surface_pair_valid_for_m'):
                        # Sphere surface: joint over (azimuth pair, ell)
                        m = self.group[axis - 1] or 0
                        az_basis = domain.bases[axis - 1]
                        az_w = az_basis.group_shape[0] if az_basis is not None else 1
                        axis_masks[axis - 1] = np.ones(1, dtype=bool)
                        axis_masks.append(basis.surface_pair_valid_for_m(
                            m, tensorsig, cidx, az_w))
                    elif hasattr(basis, 'group_valid_for_m'):
                        # m-dependent radial truncation (disk/ball)
                        m = self.group[axis - 1] or 0
                        axis_masks.append(basis.group_valid_for_m(m, tensorsig))
                    else:
                        axis_masks.append(basis.valid_coeff_mask(tensorsig))
                else:
                    axis_masks.append(basis.group_valid_mask(self.group[axis], tensorsig))
            mask = axis_masks[0]
            for m in axis_masks[1:]:
                mask = np.outer(mask, m).ravel()
            comp_masks.append(mask)
        return np.concatenate(comp_masks)


def enumerate_subproblems(dist, domains, coupling):
    """
    Enumerate mode groups over the separable axes present in the given domains.

    Returns (coupled flags, list of Subproblem). Coupled axes must form a
    suffix of the axis order (matrices never span separable groups).
    """
    dim = dist.dim
    coupled = [bool(coupling[i]) for i in range(dim)]
    # Determine the basis on each axis across all domains
    axis_bases = [None] * dim
    for domain in domains:
        for i, b in enumerate(domain.bases):
            if b is not None:
                if axis_bases[i] is not None and axis_bases[i].coeff_size != b.coeff_size:
                    raise ValueError("Mismatched basis sizes along axis")
                # Keep the basis with primitive (lowest) parameters for grouping
                if axis_bases[i] is None:
                    axis_bases[i] = b
    # Ball/shell radial bases use the joint (colatitude-slot, n) pencil
    # layout (joint_valid_for_m): whenever such a radial axis is coupled,
    # the colatitude axis joins the pencil even if no operator couples it
    # (e.g. problems whose only coupling is a radial NCC).
    for i in range(dim):
        if coupled[i] and axis_bases[i] is not None \
                and hasattr(axis_bases[i], 'joint_valid_for_m') and i >= 1:
            coupled[i - 1] = True
    # Group counts per separable axis
    group_counts = []
    for i in range(dim):
        if coupled[i] or axis_bases[i] is None:
            group_counts.append(1)
        else:
            gs = axis_bases[i].group_shape[0]
            group_counts.append(axis_bases[i].coeff_size // gs)
    subproblems = []
    for flat in range(prod(group_counts)):
        idx = []
        rem = flat
        for count in reversed(group_counts):
            idx.append(rem % count)
            rem //= count
        idx = idx[::-1]
        group = []
        wavenumbers = {}
        native = {}
        for i in range(dim):
            if coupled[i]:
                group.append(None)
            elif axis_bases[i] is None:
                group.append(0)
            else:
                group.append(idx[i])
                basis = axis_bases[i]
                if hasattr(basis, 'wavenumbers'):
                    gs = basis.group_shape[0]
                    wavenumbers[i] = float(np.asarray(basis.wavenumbers)[idx[i] * gs])
                if hasattr(basis, 'wavenumbers_native'):
                    gs = basis.group_shape[0]
                    native[i] = int(
                        np.asarray(basis.wavenumbers_native)[idx[i] * gs])
        subproblems.append(Subproblem(dist, coupled, group, wavenumbers,
                                      native))
    return coupled, subproblems


class PencilSystem:
    """
    The assembled batched pencil system for a solver:
      - index maps between concatenated field coefficients and (G, P) pencils
      - batched dense matrix stacks (G, R, C) for each named matrix (M, L, dF)
      - validity masks and identity-pivot bookkeeping
    """

    def __init__(self, dist, subproblems, variables, equations, matrix_names,
                 dtype=None, allow_slot_split=False):
        self.dist = dist
        self.subproblems = subproblems
        self.variables = variables
        self.equations = equations
        self.matrix_names = matrix_names
        if dtype is None:
            dtype = np.result_type(*[eq['dtype'] for eq in equations])
        self.dtype = np.dtype(dtype)
        self._build_layout()
        self.build_matrices(matrix_names)
        if allow_slot_split and self.eq_active is None and config.get(
                'matrix assembly', 'slot_split', fallback='True') == 'True':
            # Slot splitting assumes disjoint per-equation row blocks;
            # conditioned (merged) blocks keep the joint pencil layout.
            self._try_slot_split()
        self.G_real = self.G
        self._pad_groups()

    # --- layout ---

    def _build_layout(self):
        sp0 = self.subproblems[0]
        # Variable (column) layout
        self.var_sizes = [sp0.field_size(v) for v in self.variables]
        self.var_offsets = np.concatenate([[0], np.cumsum(self.var_sizes)]).astype(int)
        self.C = int(self.var_offsets[-1])
        # Equation (row) layout
        self.eq_sizes = [self._eq_size(sp0, eq) for eq in self.equations]
        # Per-(equation, group) activity from the equations' condition
        # strings (reference subsystems.py:494-503: rows of equations whose
        # condition fails a group are invalidated). A fixed square pencil
        # layout instead MERGES conditioned equations with equal size and
        # disjoint activity into one shared row block, whose rows carry the
        # active member's matrix and RHS in each group.
        G = len(self.subproblems)
        conds = [eq.get('condition') or 'True' for eq in self.equations]
        if all(c == 'True' for c in conds):
            self.eq_active = None
            block_sizes = list(self.eq_sizes)
            eq_row_offsets = np.concatenate(
                [[0], np.cumsum(block_sizes)]).astype(int)[:-1]
        else:
            active = np.zeros((len(self.equations), G), dtype=bool)
            for e_i, c in enumerate(conds):
                code = compile(c, '<equation condition>', 'eval')
                for g, sp in enumerate(self.subproblems):
                    active[e_i, g] = bool(eval(code, {}, sp.group_dict))
            self.eq_active = active
            block_sizes = []
            eq_row_offsets = np.zeros(len(self.equations), dtype=int)
            open_sets = []      # partial blocks awaiting complements
            offset = 0
            for e_i, eq in enumerate(self.equations):
                size = self.eq_sizes[e_i]
                if active[e_i].all():
                    eq_row_offsets[e_i] = offset
                    block_sizes.append(size)
                    offset += size
                    continue
                placed = False
                for s in open_sets:
                    if (s['size'] == size
                            and not (s['covered'] & active[e_i]).any()):
                        s['covered'] |= active[e_i]
                        eq_row_offsets[e_i] = s['offset']
                        placed = True
                        break
                if not placed:
                    eq_row_offsets[e_i] = offset
                    open_sets.append(dict(size=size, offset=offset,
                                          covered=active[e_i].copy()))
                    block_sizes.append(size)
                    offset += size
        R = int(sum(block_sizes))
        # eq_offsets[e_i] = equation e_i's row offset; [-1] = total rows
        self.eq_offsets = np.concatenate([eq_row_offsets, [R]]).astype(int)
        self.R = R
        if self.R != self.C:
            raise ValueError(
                f"Pencil system is not square: {self.R} equation rows vs {self.C} "
                f"variable columns. Check boundary conditions, gauge conditions, "
                f"and that conditioned equations come in complementary sets.")
        # Field coefficient flat offsets (for the concatenated state vector)
        self.state_sizes = [int(np.prod(self._coeff_shape(v))) for v in self.variables]
        self.state_offsets = np.concatenate([[0], np.cumsum(self.state_sizes)]).astype(int)
        self.state_total = int(self.state_offsets[-1])
        # Index maps
        G = len(self.subproblems)
        self.G = G
        self.var_index_map = np.zeros((G, self.C), dtype=np.int32)
        for g, sp in enumerate(self.subproblems):
            col = 0
            for v_i, var in enumerate(self.variables):
                idxs = self._field_pencil_indices(sp, var)
                n = idxs.size
                self.var_index_map[g, col:col + n] = idxs + self.state_offsets[v_i]
                col += n
        # Equation (row) index maps into per-equation F coefficient data
        self.eq_index_maps = []
        for eq in self.equations:
            maps = np.zeros((G, self._eq_size(self.subproblems[0], eq)), dtype=np.int32)
            for g, sp in enumerate(self.subproblems):
                maps[g, :] = self._domain_pencil_indices(sp, eq['domain'], eq['tensorsig'])
            self.eq_index_maps.append(maps)
        # Validity masks
        self.col_valid = np.zeros((G, self.C), dtype=bool)
        self.row_valid = np.zeros((G, self.R), dtype=bool)
        for g, sp in enumerate(self.subproblems):
            col = 0
            for var in self.variables:
                m = sp.valid_mask(var.domain, var.tensorsig)
                self.col_valid[g, col:col + m.size] = m
                col += m.size
            for e_i, eq in enumerate(self.equations):
                if self.eq_active is not None and not self.eq_active[e_i, g]:
                    continue
                m = sp.valid_mask(eq['domain'], eq['tensorsig'])
                r0 = self.eq_offsets[e_i]
                self.row_valid[g, r0:r0 + m.size] = m
        # Squareness of the valid sub-system per group
        nrow = self.row_valid.sum(axis=1)
        ncol = self.col_valid.sum(axis=1)
        if not np.array_equal(nrow, ncol):
            bad = np.nonzero(nrow != ncol)[0][:5]
            raise ValueError(
                f"Valid modes not square in groups {bad}: rows {nrow[bad]} vs cols {ncol[bad]}")
        # Device copies
        self.var_index_map_dev = jnp.asarray(self.var_index_map)
        self.row_valid_dev = jnp.asarray(self.row_valid)
        self.col_valid_dev = jnp.asarray(self.col_valid)
        if self.eq_active is not None:
            self.eq_active_dev = jnp.asarray(
                self.eq_active.astype(np.float64))

    def _coeff_shape(self, field):
        shape = tuple(cs.dim for cs in field.tensorsig)
        shape += tuple(b.coeff_size if b is not None else 1 for b in field.domain.bases)
        return shape

    def _eq_size(self, sp, eq):
        ncomp = prod(tuple(cs.dim for cs in eq['tensorsig'])) or 1
        return ncomp * sp.spatial_size(eq['domain'])

    def _field_pencil_indices(self, sp, field):
        return self._domain_pencil_indices(sp, field.domain, field.tensorsig)

    def _domain_pencil_indices(self, sp, domain, tensorsig):
        """Flat indices (into the field's flattened coeff data) of this group's pencil."""
        dim = self.dist.dim
        axis_indices = []
        for axis in range(dim):
            basis = domain.bases[axis]
            sl = sp.group_slice(basis, axis)
            size = basis.coeff_size if basis is not None else 1
            axis_indices.append(np.arange(size)[sl])
        # Row-major flatten over axes
        flat = np.zeros(1, dtype=np.int64)
        stride = 1
        # Build by iterating axes from last to first
        idx = axis_indices[-1].astype(np.int64)
        for axis in range(dim - 2, -1, -1):
            size_inner = 1
            for a2 in range(axis + 1, dim):
                b2 = domain.bases[a2]
                size_inner *= b2.coeff_size if b2 is not None else 1
            idx = (axis_indices[axis][:, None] * size_inner + idx[None, :]).ravel()
        spatial_total = 1
        for b in domain.bases:
            spatial_total *= b.coeff_size if b is not None else 1
        ncomp = prod(tuple(cs.dim for cs in tensorsig)) or 1
        if ncomp > 1:
            idx = (np.arange(ncomp)[:, None] * spatial_total + idx[None, :]).ravel()
        return idx.astype(np.int32)

    # --- matrices ---

    def assemble_group(self, g, names):
        """Assemble the named matrices for ONE group as masked scipy CSR
        (the reference's per-subproblem sparse build, subsystems.py:497-552)."""
        sp = self.subproblems[g]
        R, C = self.R, self.C
        Dr = sparse.diags(self.row_valid[g].astype(self.dtype))
        Dc = sparse.diags(self.col_valid[g].astype(self.dtype))
        out = {}
        for name in names:
            rows, cols, vals = [], [], []
            for e_i, eq in enumerate(self.equations):
                if self.eq_active is not None and not self.eq_active[e_i, g]:
                    continue
                expr = eq.get(name)
                if expr is None or (isinstance(expr, (int, float)) and expr == 0):
                    continue
                mats = expr.expression_matrices(sp, self.variables)
                r0 = self.eq_offsets[e_i]
                for v_i, var in enumerate(self.variables):
                    if var in mats:
                        m = sparse.coo_matrix(mats[var])
                        rows.append(m.row + r0)
                        cols.append(m.col + self.var_offsets[v_i])
                        vals.append(m.data)
            if rows:
                A = sparse.csr_matrix(
                    (np.concatenate(vals),
                     (np.concatenate(rows), np.concatenate(cols))),
                    shape=(R, C), dtype=self.dtype)
            else:
                A = sparse.csr_matrix((R, C), dtype=self.dtype)
            A = (Dr @ A @ Dc).tocsr()
            A.eliminate_zeros()
            out[name] = A
        return out

    def build_matrices(self, names):
        """
        Build the per-group matrices. Small systems get batched dense (G,R,C)
        device stacks; large systems stay in sparse/separable form. When the
        stacks are polynomial in the group wavenumber (Fourier-separable
        problems), only ~10 sampled groups are assembled and the rest are
        synthesized from an exact, validated polynomial fit.
        """
        G, R, C = self.G, self.R, self.C
        # Identity pivots pairing invalid rows with invalid columns (all stacks)
        self.pivot_pairs = []
        for g in range(G):
            inv_rows = np.nonzero(~self.row_valid[g])[0]
            inv_cols = np.nonzero(~self.col_valid[g])[0]
            self.pivot_pairs.append((inv_rows, inv_cols))
        # Sampled separable assembly for large group counts
        self.separable = None
        min_groups = config.getint('matrix assembly', 'sampled_min_groups')
        if G >= min_groups:
            self.separable = self._try_sampled_assembly(names)
        if self.separable is not None:
            self.matrices_scipy = {name: self.separable[name] for name in names}
        else:
            groups = [self.assemble_group(g, names) for g in range(G)]
            self.matrices_scipy = {name: [grp[name] for grp in groups]
                                   for name in names}
        # Dense stacks only when affordable (device batched applies / LU)
        self.matrices = {}
        self._stacks_np = None
        max_bytes = config.getfloat('memory', 'max_dense_stack_gb') * 2**30
        if G * R * C * self.dtype.itemsize <= max_bytes:
            stacks = {}
            for name in names:
                stack = np.zeros((G, R, C), dtype=self.dtype)
                for g in range(G):
                    stack[g] = self.matrices_scipy[name][g].toarray()
                stacks[name] = stack
                self.matrices[name] = jnp.asarray(stack)
            self._stacks_np = stacks
        else:
            for name in names:
                self.matrices[name] = None
            logger.info(
                f"Pencil stacks (G={G}, P={R}) exceed max_dense_stack_gb; "
                f"keeping sparse/separable form only")

    # --- slot splitting (per-(m, ell) spherical pencils) ---

    def _slot_positions(self, sp0, domain, tensorsig, colat_axis, L):
        """Positions of each colatitude slot within a field's pencil segment:
        (slotless, pos) where pos is (L, w) for slotted fields or (w,) for
        slotless ones (no colatitude basis: constants, duplicated into every
        slot group with validity only in slot 0)."""
        dim = self.dist.dim
        ncomp = prod(tuple(cs.dim for cs in tensorsig)) or 1
        widths = [sp0.axis_width(domain.bases[ax], ax) for ax in range(dim)]
        total = ncomp * prod(tuple(widths))
        if domain.bases[colat_axis] is None:
            return True, np.arange(total, dtype=np.int64)
        if widths[colat_axis] != L:
            raise ValueError("unexpected colatitude width")
        grid = np.arange(total, dtype=np.int64).reshape((ncomp,) + tuple(widths))
        pos = np.stack([np.take(grid, j, axis=1 + colat_axis).ravel()
                        for j in range(L)])
        return False, pos

    def _try_slot_split(self):
        """
        Re-batch spherical joint (ell, n) pencils into per-(m, ell-slot)
        pencils when every matrix is slot-block-diagonal (no Cos/Sin angular
        couplings on the LHS) — the reference's own (m, ell) subproblem
        decomposition (subsystems.py:34-53). Shrinks the pencil size from
        ncomp*az*L*n to ncomp*az*n, which is what makes large ball/shell
        problems solvable with dense batched kernels.
        """
        from .basis_ball import SphericalRadialBasis
        if self.separable is not None:
            return
        sp0 = self.subproblems[0]
        dim = self.dist.dim
        radial_axis = None
        colat_basis = None
        for v in self.variables:
            for ax, b in enumerate(v.domain.bases):
                if isinstance(b, SphericalRadialBasis):
                    radial_axis = ax
                    colat_basis = v.domain.bases[ax - 1]
        if radial_axis is None or colat_basis is None or radial_axis < 2:
            return
        colat_axis = radial_axis - 1
        az_axis = colat_axis - 1
        if not (sp0.coupled[colat_axis] and sp0.coupled[radial_axis]):
            return
        L = colat_basis.coeff_size
        # Per-variable / per-equation slot positions within the pencil
        try:
            col_info = [self._slot_positions(sp0, v.domain, v.tensorsig,
                                             colat_axis, L)
                        for v in self.variables]
            row_info = [self._slot_positions(sp0, eq['domain'], eq['tensorsig'],
                                             colat_axis, L)
                        for eq in self.equations]
        except ValueError:
            return
        def build_slot_indices(infos, offsets):
            slot_idx = []          # (L, P_small) pencil positions per slot
            dup_mask = []          # True where the entry is a duplicated
            for j in range(L):
                parts = []
                dups = []
                for (slotless, pos), off in zip(infos, offsets):
                    p = pos if slotless else pos[j]
                    parts.append(off + p)
                    dups.append(np.full(p.size, slotless and j > 0))
                slot_idx.append(np.concatenate(parts))
                dup_mask.append(np.concatenate(dups))
            return np.stack(slot_idx), np.stack(dup_mask)

        col_idx, col_dup = build_slot_indices(col_info, self.var_offsets[:-1])
        row_idx, row_dup = build_slot_indices(row_info, self.eq_offsets[:-1])
        # Slot label per pencil position (slotless -> 0) for the
        # block-diagonality check
        slot_of_col = np.zeros(self.C, dtype=np.int64)
        slot_of_row = np.zeros(self.R, dtype=np.int64)
        for j in range(L):
            slot_of_col[col_idx[j][~col_dup[j]]] = j
            slot_of_row[row_idx[j][~row_dup[j]]] = j
        for name in self.matrix_names:
            for A in self.matrices_scipy[name]:
                coo = sparse.coo_matrix(A)
                if np.any(slot_of_row[coo.row] != slot_of_col[coo.col]):
                    logger.info("slot split: matrices couple ell slots; "
                                "keeping joint pencils")
                    return
        # --- execute the split ---
        Gs = self.G
        Cs = col_idx.shape[1]
        Rs = row_idx.shape[1]
        names = self.matrix_names
        new_scipy = {name: [] for name in names}
        for g in range(Gs):
            for j in range(L):
                rj, cj = row_idx[j], col_idx[j]
                for name in names:
                    new_scipy[name].append(
                        self.matrices_scipy[name][g][rj][:, cj].tocsr())
        new_var_index = np.stack([self.var_index_map[g][col_idx[j]]
                                  for g in range(Gs) for j in range(L)])
        new_col_valid = np.stack([self.col_valid[g][col_idx[j]] & ~col_dup[j]
                                  for g in range(Gs) for j in range(L)])
        new_row_valid = np.stack([self.row_valid[g][row_idx[j]] & ~row_dup[j]
                                  for g in range(Gs) for j in range(L)])
        nrow = new_row_valid.sum(axis=1)
        ncol = new_col_valid.sum(axis=1)
        if not np.array_equal(nrow, ncol):
            logger.info("slot split: valid modes not square per slot; "
                        "keeping joint pencils")
            return
        # Per-equation F index maps sliced to each equation's own slots
        new_eq_maps = []
        for e_i, eq in enumerate(self.equations):
            slotless, pos = row_info[e_i]
            maps_old = self.eq_index_maps[e_i]
            rows = []
            for g in range(Gs):
                for j in range(L):
                    p = pos if slotless else pos[j]
                    rows.append(maps_old[g][p])
            new_eq_maps.append(np.stack(rows))
        # Commit
        logger.info("slot split: %d joint pencils (P=%d) -> %d per-(m, ell) "
                    "pencils (P=%d)", Gs, self.C, Gs * L, Cs)
        self.G = Gs * L
        self.C, self.R = Cs, Rs
        self.var_sizes = [(pos.size if slotless else pos.shape[1])
                          for slotless, pos in col_info]
        self.var_offsets = np.concatenate([[0], np.cumsum(self.var_sizes)]).astype(int)
        self.eq_sizes = [(pos.size if slotless else pos.shape[1])
                         for slotless, pos in row_info]
        self.eq_offsets = np.concatenate([[0], np.cumsum(self.eq_sizes)]).astype(int)
        self.var_index_map = new_var_index.astype(np.int32)
        self.col_valid = new_col_valid
        self.row_valid = new_row_valid
        self.eq_index_maps = new_eq_maps
        self.var_index_map_dev = jnp.asarray(self.var_index_map)
        self.row_valid_dev = jnp.asarray(self.row_valid)
        self.col_valid_dev = jnp.asarray(self.col_valid)
        self.matrices_scipy = new_scipy
        coupled_new = list(sp0.coupled)
        coupled_new[colat_axis] = False
        new_sps = []
        for g in range(Gs):
            base = self.subproblems[g]
            for j in range(L):
                group = list(base.group)
                group[colat_axis] = j
                new_sps.append(Subproblem(self.dist, coupled_new, group,
                                          dict(base.group_wavenumbers)))
        self.subproblems = new_sps
        self.pivot_pairs = []
        for g in range(self.G):
            self.pivot_pairs.append((np.nonzero(~self.row_valid[g])[0],
                                     np.nonzero(~self.col_valid[g])[0]))
        for attr in ('_banded_plan', '_banded_ops'):
            if hasattr(self, attr):
                delattr(self, attr)
        # Dense stacks at the new (much smaller) pencil size
        self.matrices = {}
        self._stacks_np = None
        max_bytes = config.getfloat('memory', 'max_dense_stack_gb') * 2**30
        if self.G * Rs * Cs * self.dtype.itemsize <= max_bytes:
            stacks = {}
            for name in names:
                stack = np.zeros((self.G, Rs, Cs), dtype=self.dtype)
                for g in range(self.G):
                    stack[g] = self.matrices_scipy[name][g].toarray()
                stacks[name] = stack
                self.matrices[name] = jnp.asarray(stack)
            self._stacks_np = stacks
        else:
            for name in names:
                self.matrices[name] = None
            logger.info(
                "Slot-split stacks (G=%d, P=%d) still exceed "
                "max_dense_stack_gb; keeping sparse form", self.G, Rs)
        self.slot_split = (Gs, L)

    def _pad_groups(self):
        """
        Pad the group axis to a multiple of the device-mesh size with fully
        invalid groups (all rows/cols invalid -> identity pivots, zero
        matrices, zero RHS), so pencil stacks, factorizations, and histories
        shard evenly over the mesh at ANY problem size — the framework-level
        equivalent of the reference's uneven block distribution
        (ref transposes.pyx:77-99, distributor.py:357-401). Pad groups are
        exact no-ops: their RHS is masked to zero by row_valid, the pivoted
        identity solve returns zero, and their scatter indices all point at
        state position 0 with zero values.
        """
        mesh = self.dist.mesh
        if mesh is None:
            return
        n_mesh = int(prod(tuple(mesh.shape[n] for n in mesh.axis_names)))
        G = self.G
        Gp = -(-G // n_mesh) * n_mesh
        if Gp == G:
            return
        pad = Gp - G
        R, C = self.R, self.C
        self.var_index_map = np.concatenate(
            [self.var_index_map, np.zeros((pad, C), dtype=np.int32)])
        self.col_valid = np.concatenate(
            [self.col_valid, np.zeros((pad, C), dtype=bool)])
        self.row_valid = np.concatenate(
            [self.row_valid, np.zeros((pad, R), dtype=bool)])
        self.eq_index_maps = [
            np.concatenate([m, np.zeros((pad, m.shape[1]), dtype=np.int32)])
            for m in self.eq_index_maps]
        if self.eq_active is not None:
            self.eq_active = np.concatenate(
                [self.eq_active,
                 np.zeros((self.eq_active.shape[0], pad), dtype=bool)],
                axis=1)
            self.eq_active_dev = jnp.asarray(
                self.eq_active.astype(np.float64))
        self.var_index_map_dev = jnp.asarray(self.var_index_map)
        self.row_valid_dev = jnp.asarray(self.row_valid)
        self.col_valid_dev = jnp.asarray(self.col_valid)
        for g in range(pad):
            self.pivot_pairs.append((np.arange(R), np.arange(C)))
        # Matrices: zero content (identity pivots are installed downstream)
        zero = sparse.csr_matrix((R, C), dtype=self.dtype)
        for name in list(self.matrices_scipy):
            mats = self.matrices_scipy[name]
            if isinstance(mats, SeparableMatrixStack):
                mats.G = Gp
                mats.ghat = np.concatenate(
                    [mats.ghat, np.full(pad, mats.ghat[0])])
                for g in range(G, Gp):
                    mats.bad[g] = zero
            else:
                mats.extend([zero] * pad)
        if self._stacks_np is not None:
            for name in list(self.matrices):
                stack = np.concatenate(
                    [self._stacks_np[name],
                     np.zeros((pad, R, C), dtype=self.dtype)])
                self._stacks_np[name] = stack
                self.matrices[name] = jnp.asarray(stack)
        # Dummy subproblems so per-group consumers stay index-aligned
        last = self.subproblems[-1]
        self.subproblems = list(self.subproblems) + [
            Subproblem(self.dist, last.coupled, last.group,
                       dict(last.group_wavenumbers))
            for _ in range(pad)]
        self.G = Gp
        logger.info("Padded pencil groups %d -> %d for even sharding over "
                    "%d mesh devices", G, Gp, n_mesh)

    def _try_sampled_assembly(self, names):
        """
        Assemble only sampled groups and fit A[g] = sum_p ghat^p B_p exactly
        (entries of Fourier-separable stacks are polynomials in the group
        wavenumber). Validated against held-out groups; returns None (full
        assembly) on any mismatch. Exceptional groups (deviant validity
        patterns: mean mode, Nyquist) are assembled exactly.
        """
        G = self.G
        tol = config.getfloat('matrix assembly', 'sampled_fit_tol')
        # Groups whose validity pattern deviates from the majority are special
        pat_keys = {}
        for g in range(G):
            key = (self.row_valid[g].tobytes(), self.col_valid[g].tobytes())
            if self.eq_active is not None:
                # Condition flips change matrix CONTENT discontinuously even
                # when validity patterns agree — such groups must be
                # assembled exactly, not synthesized from the fit
                key += (self.eq_active[:, g].tobytes(),)
            pat_keys.setdefault(key, []).append(g)
        majority = max(pat_keys.values(), key=len)
        special = sorted(set(range(G)) - set(majority))
        generic = majority
        max_degree = 6
        if len(generic) < max_degree + 4 or len(special) > min(G // 4, 32):
            # Per-group validity (curvilinear triangular truncation) or too
            # few generic groups: sampled fitting cannot help
            return None
        # Fit coordinate: the group wavenumber when exactly one separable
        # axis carries wavenumbers (entries are polynomials in k; handles
        # non-monotone ComplexFourier k-ordering), else the group index.
        wns = [list(sp.group_wavenumbers.values()) for sp in self.subproblems]
        if all(len(w) == 1 for w in wns):
            k = np.asarray([w[0] for w in wns], dtype=float)
            span = max(k.max() - k.min(), 1e-300)
            ghat = -1 + 2 * (k - k.min()) / span
        else:
            ghat = np.linspace(-1, 1, G)
        # Fit samples spread over the generic groups + 2 held-out validators
        order = sorted(range(len(generic)), key=lambda i: ghat[generic[i]])
        generic_sorted = [generic[i] for i in order]
        idx = np.linspace(0, len(generic_sorted) - 1, max_degree + 1).round().astype(int)
        fit_groups = [generic_sorted[i] for i in sorted(set(idx))]
        val_pool = [g for g in generic_sorted if g not in fit_groups]
        val_groups = [val_pool[len(val_pool) // 3], val_pool[2 * len(val_pool) // 3]]
        assembled = {g: self.assemble_group(g, names)
                     for g in set(fit_groups) | set(val_groups) | set(special)}
        out = {}
        for name in names:
            # Union sparsity pattern over the fit samples
            U = sum(abs(assembled[g][name]) for g in fit_groups).tocsr()
            U.sum_duplicates()
            U.sort_indices()
            Ucoo = U.tocoo()
            nnz = Ucoo.nnz

            def aligned_vals(A):
                return np.asarray(A[Ucoo.row, Ucoo.col]).ravel()

            fit_vals = np.stack([aligned_vals(assembled[g][name])
                                 for g in fit_groups])  # (nfit, nnz)
            scale = max(np.abs(fit_vals).max(), 1e-300)
            sep = None
            for d in range(1, max_degree + 1):
                sub = np.linspace(0, len(fit_groups) - 1, d + 1).round().astype(int)
                sub = sorted(set(sub))
                if len(sub) < d + 1:
                    continue
                gs = [fit_groups[i] for i in sub]
                V = np.vander(ghat[gs], d + 1, increasing=True)
                try:
                    Vi = np.linalg.inv(V)
                except np.linalg.LinAlgError:
                    continue
                Bvals = Vi @ fit_vals[sub]  # (d+1, nnz)
                # Validate on fit samples not used + held-out groups
                ok = True
                for g in fit_groups + val_groups:
                    w = np.vander(ghat[[g]], d + 1, increasing=True)[0]
                    recon = w @ Bvals
                    if np.abs(recon - aligned_vals(assembled[g][name])).max() > tol * scale:
                        ok = False
                        break
                if ok:
                    B_sparse = [sparse.csr_matrix(
                        (Bvals[p], (Ucoo.row, Ucoo.col)), shape=U.shape)
                        for p in range(d + 1)]
                    bad = {g: assembled[g][name] for g in special}
                    sep = SeparableMatrixStack(G, U.shape, B_sparse, ghat, bad)
                    break
            if sep is None:
                logger.info(f"Sampled assembly: stack '{name}' is not "
                            f"polynomial in the group index; full assembly")
                return None
            out[name] = sep
        logger.info(
            f"Sampled separable assembly: {len(assembled)} of {G} groups "
            f"assembled (degrees {[out[n].degree for n in names]}, "
            f"{len(special)} exceptional)")
        return out

    def banded_pivot_pairs(self, order):
        """Invalid row/col pivot pairing sorted by permuted position. Any
        bijection between the (zero) invalid rows and columns is a valid
        pivot pattern; the default index-ordered pairing can land a pivot in
        the far off-band corner of a slot-split spherical pencil (leaving a
        zero band row that makes the band rank-deficient), so the banded
        path pairs the k-th invalid row with the k-th invalid column in
        permuted order — with matching row/column layouts this sits on the
        band diagonal (cached per ordering identity)."""
        key = id(order)
        cache = getattr(self, '_banded_pivot_cache', None)
        if cache is not None and cache[0] == key:
            return cache[1]
        rp, cp = order['row_perm'], order['col_perm']
        nbord = order['n_border']
        P = cp.size
        rinv = np.empty(rp.size, dtype=np.int64)
        rinv[rp] = np.arange(rp.size)
        cinv = np.empty(cp.size, dtype=np.int64)
        cinv[cp] = np.arange(cp.size)
        pairs = []
        for ir, ic in self.pivot_pairs:
            rpos, cpos = rinv[ir], cinv[ic]
            # Border rows pair with border columns: an invalid BC row's
            # partner must be an invalid tau column, or the pivot falls into
            # the low-rank border content and leaves a zero interior band
            # row/column.
            rb = rpos < nbord
            cb = (cpos < nbord) if order.get('bcol_first') \
                else (cpos >= P - nbord)
            ir_b = ir[rb][np.argsort(rpos[rb], kind='stable')]
            ic_b = ic[cb][np.argsort(cpos[cb], kind='stable')]
            ir_i = ir[~rb][np.argsort(rpos[~rb], kind='stable')]
            ic_i = ic[~cb][np.argsort(cpos[~cb], kind='stable')]
            nB = min(ir_b.size, ic_b.size)
            out_r = np.concatenate([ir_b[:nB], ir_i, ir_b[nB:]])
            out_c = np.concatenate([ic_b[:nB], ic_i, ic_b[nB:]])
            pairs.append((out_r, out_c))
        self._banded_pivot_cache = (key, pairs)
        return pairs

    def banded_plan(self):
        """Mode-major ordering + block size for bordered-banded solves, or
        None when the structure does not apply (cached)."""
        if hasattr(self, '_banded_plan'):
            return self._banded_plan
        from ..ops import banded as ops_banded
        plan = None
        order = banded_order(self)
        pat = None
        if order is not None and self.separable is not None:
            # Union pattern over all stacks + generic pivots + bad groups
            for name, sep in self.separable.items():
                for Bp in sep.B:
                    pat = abs(Bp) if pat is None else pat + abs(Bp)
                for g, Ag in sep.bad.items():
                    pat = pat + abs(Ag)
        elif order is not None and self.matrices_scipy and isinstance(
                next(iter(self.matrices_scipy.values())), list):
            # Exact per-group matrices (e.g. slot-split spherical pencils):
            # union pattern over sampled groups. An unseen pattern in other
            # groups raises at block extraction, which falls back safely.
            samples = sorted(set(np.linspace(0, self.G - 1,
                                             min(self.G, 32)).astype(int)))
            for name, mats in self.matrices_scipy.items():
                for g in samples:
                    term = abs(mats[g])
                    pat = term if pat is None else pat + term
        if order is not None and pat is not None:
            # Pivot entries for EVERY group, with the banded-friendly pairing
            # (the same pairing banded_form installs), so the measured
            # bandwidth covers them and the block split never strays.
            # (both pairings: separable stacks carry the default pairing in
            # B_0; the exact per-group path installs the banded pairing)
            bpairs = list(self.banded_pivot_pairs(order)) + list(self.pivot_pairs)
            prows = np.concatenate([ir for ir, _ in bpairs] or [np.zeros(0, int)])
            pcols = np.concatenate([ic for _, ic in bpairs] or [np.zeros(0, int)])
            if prows.size:
                pat = pat + sparse.csr_matrix(
                    (np.ones(prows.size), (prows, pcols)), shape=pat.shape)
            bw = ops_banded.measure_bandwidth(pat.tocsr(), order)
            nb = max(bw, 4)
            # TPU tile alignment: (8, 128) tiling pads every (nb, nb) factor
            # block to 128 lanes, so memory per row is FLAT in nb up to 64 —
            # rounding nb up is free and shrinks the sweep/prefix depth.
            mult = int(config.get('linear algebra', 'banded_block_multiple',
                                  fallback='1'))
            if mult > 1:
                nb = int(np.ceil(nb / mult) * mult)
            # Banded pays off once the core spans at least a few blocks
            if 0 < 3 * nb <= order['n_core']:
                plan = dict(order=order, nb=nb)
        self._banded_plan = plan
        return plan

    def banded_stack(self, name):
        """BandedBlocks form of a raw (unpivoted) named stack (M or L),
        for exact banded operator applies in the compiled step."""
        from ..ops import banded as ops_banded
        plan = self.banded_plan()
        if self.separable is not None:
            sep = self.separable[name]
            W = sep.weights()
            return ops_banded.build_banded_blocks(
                list(sep.B), W, dict(sep.bad), plan['order'], plan['nb'])
        # Exact per-group matrices (slot-split spherical pencils)
        return ops_banded.build_banded_blocks(
            None, None, None, plan['order'], plan['nb'],
            exact=list(self.matrices_scipy[name]))

    def banded_operator(self, name):
        """Cached device operator for a named stack (shared between the
        compiled step's M/L applies and the banded solver's exact refinement
        applies — one f64 copy on the device). Separable pencils get the
        SeparableBandedOperator: d+1 G-independent split parts + per-group
        weights instead of weight-expanded (G, ...) stacks (the 2048^2-scale
        memory/bandwidth path); slot-split spherical pencils keep the exact
        per-group form."""
        from ..ops import banded as ops_banded
        if not hasattr(self, '_banded_ops'):
            self._banded_ops = {}
        if name not in self._banded_ops:
            plan = self.banded_plan()
            sep = self.separable[name] if self.separable is not None else None
            if sep is not None:
                parts = [ops_banded.build_banded_blocks(
                             None, None, None, plan['order'], plan['nb'],
                             exact=[Bp])
                         for Bp in sep.B]
                bad = None
                if sep.bad:
                    bad_idx = tuple(sorted(sep.bad))
                    bad_blocks = ops_banded.build_banded_blocks(
                        None, None, None, plan['order'], plan['nb'],
                        exact=[sep.bad[g] for g in bad_idx])
                    bad = (bad_idx, bad_blocks)
                self._banded_ops[name] = ops_banded.SeparableBandedOperator(
                    parts, sep.weights(), plan['order'], plan['nb'], bad=bad)
            else:
                self._banded_ops[name] = ops_banded.BandedOperator(
                    self.banded_stack(name))
        return self._banded_ops[name]

    def generic_pivots(self):
        """(rows, cols) of the identity pivots shared by generic groups
        (deviant groups are handled by dense overrides)."""
        from collections import Counter
        keys = Counter(_pivot_key(pp) for pp in self.pivot_pairs)
        rows, cols = max(keys, key=keys.get)
        return np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)

    def combined_with_pivots(self, coeffs):
        """sum_i coeffs[i] * matrix_i with identity pivots installed: a dense
        (G,P,P) stack when small, else a LazyCombined provider."""
        if self._stacks_np is not None:
            A = None
            for name, c in coeffs.items():
                term = c * self._stacks_np[name]
                A = term if A is None else A + term
            A = A.copy()
            for g, (inv_rows, inv_cols) in enumerate(self.pivot_pairs):
                A[g, inv_rows, inv_cols] = 1.0
            return A
        return LazyCombined(self, coeffs)

    # --- gather / scatter (device, jit-safe) ---

    def gather_state(self, state_flat):
        """(state_total,) -> (G, C) pencil matrix (group-sharded when a mesh
        is active: groups are embarrassingly parallel across devices). Invalid
        entries are masked: their matrix columns are structurally zero
        (assemble_group masks Dr A Dc), and mesh-padding groups gather from
        state position 0, which carries live data.

        Fast path: when the index map decomposes into strided windows +
        one shared column permutation (all box problems), the gather is
        contiguous reshapes + a shared-index take along the column axis —
        on TPU ~36x faster than the flat (G, C) index gather, whose XLA
        lowering reads the whole operand per group row."""
        plan = self._gs_plan()
        if plan is not None:
            X = _plan_gather(plan, state_flat) * self.col_valid_dev
        else:
            X = state_flat[self.var_index_map_dev] * self.col_valid_dev
        return self.dist.constrain_pencils(X)

    def scatter_state(self, X):
        """(G, C) -> (state_total,) (invalid entries are zero so adds are safe)."""
        plan = self._gs_plan()
        if plan is not None and plan['scatter_ok']:
            return _plan_scatter(plan, X, self.state_total)
        out = jnp.zeros(self.state_total, dtype=X.dtype)
        return out.at[self.var_index_map_dev].add(X)

    def _gs_plan(self):
        """Structured gather/scatter plan for the current var_index_map
        (lazy; recomputed if the map was rebuilt by reordering/splitting)."""
        src = getattr(self, '_gs_plan_src', None)
        if src is not self.var_index_map:
            self._gs_plan_src = self.var_index_map
            self._gs_plan_cache = _build_gs_plan(
                self.var_index_map, self.col_valid, self.state_total,
                self.G_real)
        return self._gs_plan_cache

    def _eq_plans(self):
        """Per-equation structured plans for eq_index_maps (same idea)."""
        src = getattr(self, '_eq_plans_src', None)
        if src is not self.eq_index_maps:
            self._eq_plans_src = self.eq_index_maps
            plans = []
            for e_i, m in enumerate(self.eq_index_maps):
                total = int(m.max()) + 1 if m.size else 0
                valid = np.ones(m.shape, dtype=bool)
                valid[self.G_real:] = False
                plans.append(_build_gs_plan(m, valid, total, self.G_real))
            self._eq_plans_cache = plans
        return self._eq_plans_cache

    def flatten_fields(self, fields):
        return jnp.concatenate([f.data.ravel() for f in fields])

    def unflatten_fields(self, state_flat, fields):
        """Bind pieces of the flat state back onto the Field objects (coeff layout)."""
        for f, off, size in zip(fields, self.state_offsets, self.state_sizes):
            data = state_flat[off:off + size].reshape(self._coeff_shape(f))
            f.scales = tuple(1.0 for _ in range(self.dist.dim))
            f.preset_data(self.dist.coeff_layout, data)

    def gather_eq_data(self, eq_datas):
        """Per-equation coeff data arrays -> (G, R) RHS pencils. Conditioned
        equations sharing a row block contribute only in groups where their
        condition holds (activity masks are static, so XLA folds the select
        into the gather)."""
        plans = self._eq_plans()
        if self.eq_active is None:
            cols = []
            for data, idx_map, plan in zip(eq_datas, self.eq_index_maps,
                                           plans):
                flat = data.ravel()
                if plan is not None:
                    cols.append(_plan_gather(plan, flat))
                else:
                    cols.append(flat[jnp.asarray(idx_map)])
            out = jnp.concatenate(cols, axis=1) * self.row_valid_dev
            return self.dist.constrain_pencils(out)
        dtype = jnp.result_type(*[d.dtype for d in eq_datas])
        out = jnp.zeros((self.G, self.R), dtype=dtype)
        for e_i, (data, idx_map) in enumerate(
                zip(eq_datas, self.eq_index_maps)):
            flat = data.ravel()
            col = (_plan_gather(plans[e_i], flat) if plans[e_i] is not None
                   else flat[jnp.asarray(idx_map)])
            col = col * self.eq_active_dev[e_i, :, None]
            r0 = int(self.eq_offsets[e_i])
            out = out.at[:, r0:r0 + idx_map.shape[1]].add(col.astype(dtype))
        out = out * self.row_valid_dev
        return self.dist.constrain_pencils(out)


def _build_gs_plan(idx, valid, total, G_real):
    """Decompose a (G, C) flat index map as strided windows + one shared
    column permutation (+ broadcast columns).

    The generic pencil gather `flat[idx]` lowers on TPU to a gather whose
    cost scales as G x operand size (measured: 30 ms / 36 GB of XLA traffic
    at 2048x512 for a 34 MB state). Box problems always have the affine
    structure idx[g, c] = i0[c] + g*s[c]: the gather is then contiguous
    reshapes of state windows plus a take along the column axis with a
    SHARED index vector, which the TPU lowers efficiently (measured 0.8 ms).

    Returns a plan dict or None (slot-split spherical maps are not affine in
    the group index; they keep the generic path).

    Host-side, runs once per index-map build; validated exactly against the
    affine reconstruction at every valid entry.
    """
    G, C = idx.shape
    if G_real < 2 or C == 0 or total <= 0:
        return None
    idxr = idx[:G_real].astype(np.int64)
    vr = valid[:G_real]
    i0 = idxr[0].copy()
    s = (idxr[1] - idxr[0]).astype(np.int64)
    any_valid = vr.any(axis=0)
    i0[~any_valid] = 0
    s[~any_valid] = 0
    if (s < 0).any() or (i0 < 0).any():
        return None
    g_ar = np.arange(G_real, dtype=np.int64)[:, None]
    recon = i0[None, :] + g_ar * s[None, :]
    if not np.array_equal(np.where(vr, recon, 0), np.where(vr, idxr, 0)):
        return None
    if (recon.max(initial=0) >= total):
        return None
    # Windows: per stride value, cluster the base indices into [w, w+s) bins
    windows = []                      # (w, s)
    colmap = np.empty(C, dtype=np.int64)
    y_off = 0
    win_cols = np.nonzero(s > 0)[0]
    for sv in sorted(set(s[win_cols].tolist())):
        cols = win_cols[s[win_cols] == sv]
        order = cols[np.argsort(i0[cols], kind='stable')]
        w = None
        for c in order:
            b = int(i0[c])
            if w is None or b >= w + sv:
                if w is not None:
                    y_off += sv
                w = b
                if w + G_real * sv > total:
                    return None
                windows.append((w, int(sv)))
            colmap[c] = y_off + (b - w)
        if w is not None:
            y_off += sv
    C0 = y_off
    bcast_cols = np.nonzero(s == 0)[0]
    bidx = i0[bcast_cols]
    colmap[bcast_cols] = C0 + np.arange(bcast_cols.size)
    nb = bcast_cols.size
    # Scatter feasibility. The gather only needs the affine model at VALID
    # entries (invalid reads are masked by callers); the scatter must land
    # every entry where the generic map would, so require exact equality of
    # the stored map with the affine reconstruction at ALL entries.
    scatter_ok = np.array_equal(recon, idxr)
    wsorted = sorted(windows)
    for (w1, s1), (w2, _) in zip(wsorted, wsorted[1:]):
        if w2 < w1 + G_real * s1:
            scatter_ok = False
    for b in bidx:
        for w, sv in wsorted:
            if w <= b < w + G_real * sv:
                scatter_ok = False
    counts = np.bincount(colmap[win_cols], minlength=C0)
    if counts.max(initial=0) > 1:
        scatter_ok = False
    # Inverse map: y window col j -> pencil col (or masked)
    invmap = np.zeros(C0, dtype=np.int64)
    invmask = np.zeros(C0, dtype=bool)
    invmap[colmap[win_cols]] = win_cols
    invmask[colmap[win_cols]] = True
    identity = (nb == 0 and C0 == C
                and np.array_equal(colmap, np.arange(C)))
    # NOTE: host numpy arrays only — plans are built lazily, possibly under
    # an active jit trace, and are reused across traces; jnp constants
    # created under one trace must never be cached into another.
    return dict(windows=windows, C0=C0, C=C, G_real=G_real, pad=G - G_real,
                colmap=colmap.astype(np.int32),
                identity=identity, scatter_ok=scatter_ok,
                bidx=bidx.astype(np.int32) if nb else None,
                bcast_cols=bcast_cols.astype(np.int32) if nb else None,
                invmap=invmap.astype(np.int32),
                invmask=invmask)


def _plan_gather(plan, flat):
    """Apply a structured plan: flat (total,) -> (G, C) pencil matrix.
    Rows past G_real (mesh padding) are zero (callers mask them anyway)."""
    Gr = plan['G_real']
    parts = [jax.lax.dynamic_slice(flat, (w,), (Gr * s,)).reshape(Gr, s)
             for (w, s) in plan['windows']]
    if plan['bidx'] is not None:
        parts.append(jnp.broadcast_to(flat[jnp.asarray(plan['bidx'])],
                                      (Gr, plan['bidx'].shape[0])))
    Y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    X = (Y if plan['identity']
         else jnp.take(Y, jnp.asarray(plan['colmap']), axis=1))
    if plan['pad']:
        X = jnp.concatenate(
            [X, jnp.zeros((plan['pad'], plan['C']), X.dtype)], axis=0)
    return X


def _plan_scatter(plan, X, total):
    """Inverse of _plan_gather: (G, C) -> (total,). Requires
    plan['scatter_ok'] (disjoint windows, injective column map). Matches
    the generic `zeros.at[idx].add(X)` BIT-EXACTLY for any X: scatter_ok
    requires the affine model to hold at every entry (valid or not), so
    window writes land where the generic map scatters, and broadcast
    columns use the same per-entry scatter-add primitive as the generic
    path — a pre-reduced jnp.sum over the (mesh-sharded) group axis was
    measured to change the result vs the serial run (distributed !=
    serial at 6.8e-4 in the 8-device dryrun), while .at[].add lowers
    identically in both."""
    Gr = plan['G_real']
    Xr = X[:Gr]
    Yt = jnp.take(Xr, jnp.asarray(plan['invmap']), axis=1) * jnp.asarray(
        plan['invmask'], X.dtype)
    out = jnp.zeros(total, dtype=X.dtype)
    off = 0
    for (w, s) in plan['windows']:
        out = jax.lax.dynamic_update_slice(
            out, Yt[:, off:off + s].reshape(-1), (w,))
        off += s
    if plan['bcast_cols'] is not None:
        nb = plan['bidx'].shape[0]
        idx = jnp.broadcast_to(jnp.asarray(plan['bidx'])[None, :], (Gr, nb))
        out = out.at[idx.ravel()].add(
            Xr[:, jnp.asarray(plan['bcast_cols'])].ravel())
    return out


def banded_order(pencil):
    """
    Mode-major reordering with tau/BC bordering for banded solves.

    Returns None when the problem does not have the bordered-banded shape
    (more than one coupled axis, or curvilinear joint validity), else a dict:
      col_perm / row_perm : pencil index arrays, interior first, border last
      n_border            : border width (tau columns / BC rows / constants)
      n_core              : interior size (= P - n_border)

    The interior is ordered (mode n, slot): with Chebyshev-banded operators
    this gives a scalar bandwidth of a few slot-counts, and the tau columns /
    boundary rows form a dense border — the reference's bordered-banded form
    (ref matsolvers.py:285-321, BC_TOP/TAU_LEFT orderings dedalus.cfg:66-90).
    """
    dist = pencil.dist
    if getattr(pencil, 'eq_active', None) is not None:
        # Conditioned equations share row blocks; the block ordering below
        # assumes one equation per block. Dense/poly solvers handle these.
        return None
    coupled = pencil.subproblems[0].coupled
    coupled_axes = [i for i in range(dist.dim) if coupled[i]]
    if len(coupled_axes) != 1:
        return None
    ax = coupled_axes[0]

    def block_layout(objs, sizes, offsets, domains, tensorsigs):
        """Split blocks into interior (full coupled width) and border."""
        Ncoup = None
        for domain in domains:
            b = domain.bases[ax]
            if b is not None:
                Ncoup = b.coeff_size
        if Ncoup is None:
            return None
        interior = []   # (offset, nslots) per interior block
        border = []     # flat pencil indices
        for size, off, domain, ts in zip(sizes, offsets, domains, tensorsigs):
            b = domain.bases[ax]
            if b is not None and b.coeff_size == Ncoup:
                # Entries ordered (slot, n) row-major: n fastest
                interior.append((off, size // Ncoup))
            else:
                border.extend(range(off, off + size))
        return Ncoup, interior, border

    col = block_layout(pencil.variables, pencil.var_sizes, pencil.var_offsets,
                       [v.domain for v in pencil.variables],
                       [v.tensorsig for v in pencil.variables])
    row = block_layout(pencil.equations, pencil.eq_sizes, pencil.eq_offsets,
                       [eq['domain'] for eq in pencil.equations],
                       [eq['tensorsig'] for eq in pencil.equations])
    if col is None or row is None:
        return None

    def build_perm(Ncoup, interior, border, border_first=False):
        S = sum(ns for _, ns in interior)
        perm = np.empty(Ncoup * S + len(border), dtype=np.int64)
        pos = len(border) if border_first else 0
        for n in range(Ncoup):
            for off, ns in interior:
                for s in range(ns):
                    perm[pos] = off + s * Ncoup + n
                    pos += 1
        if border_first:
            perm[:len(border)] = border
        else:
            perm[pos:] = border
        return perm, len(border)

    # Border ROWS (boundary conditions, gauge constraints) go FIRST so their
    # dense coupling to the low coefficient modes falls inside the banded
    # pattern: the interior PDE operator alone is singular (its kernel is
    # the homogeneous ODE solutions — that is the point of the tau method),
    # and only the BC-rows x low-modes block pins that kernel. Border
    # COLUMNS (taus, constants) go LAST, next to the lift rows they act on,
    # so the tau columns' anchoring of the top PDE rows (e.g. the divergence
    # rows of an incompressible saddle system) also stays in-band —
    # demonstrably essential: with tau content stripped to the low-rank
    # border, the band core is rank-deficient by the spurious pressure modes
    # (this is why slot-split BALL pencils need triangular=False: uniform
    # n_size keeps the lift rows at group-independent positions where this
    # layout can reach them). This is the banded analogue of the reference's
    # bc_top Woodbury split (matsolvers.py:288-301, dedalus.cfg:66-90).
    bcol_first = False
    col_perm, bc = build_perm(*col, border_first=bcol_first)
    row_perm, br = build_perm(*row, border_first=True)
    if bc != br or col[0] != row[0]:
        return None
    return dict(col_perm=col_perm, row_perm=row_perm, n_border=bc,
                n_core=col_perm.size - bc, bcol_first=bcol_first)
