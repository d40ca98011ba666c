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

import numpy as np
import jax.numpy as jnp
from scipy import sparse

from ..utils.general import prod


class Subproblem:
    """One mode group: geometry queries used by expression_matrices."""

    def __init__(self, dist, coupled, group, group_wavenumbers):
        self.dist = dist
        self.coupled = tuple(coupled)             # per axis
        self.group = tuple(group)                 # int for separable axes, None for coupled
        self.group_wavenumbers = group_wavenumbers  # dict axis -> wavenumber (for conditions)

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
                        # Validity joint over (colatitude, radius): the radial
                        # truncation depends on ell = |m| + colatitude slot
                        # (ball). The hook returns the flattened joint mask;
                        # the preceding colatitude mask is absorbed into it.
                        m = self.group[axis - 2] or 0
                        axis_masks[-1] = np.ones(1, dtype=bool)
                        axis_masks.append(basis.joint_valid_for_m(m, tensorsig, cidx))
                    elif hasattr(basis, 'component_valid_for_m') and tensorsig:
                        # Spin-dependent truncation (sphere): per-component
                        m = self.group[axis - 1] or 0
                        axis_masks.append(basis.component_valid_for_m(m, tensorsig, cidx))
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
        subproblems.append(Subproblem(dist, coupled, group, wavenumbers))
    return coupled, subproblems


class PencilSystem:
    """
    The assembled batched pencil system for a solver:
      - index maps between concatenated field coefficients and (G, P) pencils
      - batched dense matrix stacks (G, R, C) for each named matrix (M, L, dF)
      - validity masks and identity-pivot bookkeeping
    """

    def __init__(self, dist, subproblems, variables, equations, matrix_names, dtype=None):
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

    # --- layout ---

    def _build_layout(self):
        sp0 = self.subproblems[0]
        # Variable (column) layout
        self.var_sizes = [sp0.field_size(v) for v in self.variables]
        self.var_offsets = np.concatenate([[0], np.cumsum(self.var_sizes)]).astype(int)
        self.C = int(self.var_offsets[-1])
        # Equation (row) layout
        self.eq_sizes = [self._eq_size(sp0, eq) for eq in self.equations]
        self.eq_offsets = np.concatenate([[0], np.cumsum(self.eq_sizes)]).astype(int)
        self.R = int(self.eq_offsets[-1])
        if self.R != self.C:
            raise ValueError(
                f"Pencil system is not square: {self.R} equation rows vs {self.C} "
                f"variable columns. Check boundary conditions and gauge conditions.")
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
            row = 0
            for eq in self.equations:
                m = sp.valid_mask(eq['domain'], eq['tensorsig'])
                self.row_valid[g, row:row + m.size] = m
                row += m.size
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

    def build_matrices(self, names):
        """Assemble batched dense stacks (G, R, C) for each named matrix."""
        G, R, C = self.G, self.R, self.C
        self.matrices = {}
        self.matrices_scipy = {name: [] for name in names}
        stacks = {name: np.zeros((G, R, C), dtype=self.dtype) for name in names}
        for g, sp in enumerate(self.subproblems):
            for name in names:
                A = stacks[name][g]
                for e_i, eq in enumerate(self.equations):
                    expr = eq.get(name)
                    if expr is None or (isinstance(expr, (int, float)) and expr == 0):
                        continue
                    mats = expr.expression_matrices(sp, self.variables)
                    r0 = self.eq_offsets[e_i]
                    for v_i, var in enumerate(self.variables):
                        if var in mats:
                            c0 = self.var_offsets[v_i]
                            m = mats[var]
                            A[r0:r0 + m.shape[0], c0:c0 + m.shape[1]] += m.toarray()
                # Zero invalid rows and columns
                A *= self.row_valid[g][:, None]
                A *= self.col_valid[g][None, :]
                self.matrices_scipy[name].append(sparse.csr_matrix(A))
        # Identity pivots pairing invalid rows with invalid columns (all stacks)
        self.pivot_pairs = []
        for g in range(G):
            inv_rows = np.nonzero(~self.row_valid[g])[0]
            inv_cols = np.nonzero(~self.col_valid[g])[0]
            self.pivot_pairs.append((inv_rows, inv_cols))
        for name in names:
            self.matrices[name] = jnp.asarray(stacks[name])
        self._stacks_np = stacks

    def combined_with_pivots(self, coeffs):
        """Dense stack sum_i coeffs[i] * matrix_i with identity pivots installed."""
        A = None
        for name, c in coeffs.items():
            term = c * self._stacks_np[name]
            A = term if A is None else A + term
        A = A.copy()
        for g, (inv_rows, inv_cols) in enumerate(self.pivot_pairs):
            A[g, inv_rows, inv_cols] = 1.0
        return A

    # --- gather / scatter (device, jit-safe) ---

    def gather_state(self, state_flat):
        """(state_total,) -> (G, C) pencil matrix (group-sharded when a mesh
        is active: groups are embarrassingly parallel across devices)."""
        return self.dist.constrain_pencils(state_flat[self.var_index_map_dev])

    def scatter_state(self, X):
        """(G, C) -> (state_total,) (invalid entries are zero so adds are safe)."""
        out = jnp.zeros(self.state_total, dtype=X.dtype)
        return out.at[self.var_index_map_dev].add(X)

    def flatten_fields(self, fields):
        return jnp.concatenate([f.data.ravel() for f in fields])

    def unflatten_fields(self, state_flat, fields):
        """Bind pieces of the flat state back onto the Field objects (coeff layout)."""
        for f, off, size in zip(fields, self.state_offsets, self.state_sizes):
            data = state_flat[off:off + size].reshape(self._coeff_shape(f))
            f.scales = tuple(1.0 for _ in range(self.dist.dim))
            f.preset_data(self.dist.coeff_layout, data)

    def gather_eq_data(self, eq_datas):
        """Per-equation coeff data arrays -> (G, R) RHS pencils."""
        cols = []
        for data, idx_map in zip(eq_datas, self.eq_index_maps):
            flat = data.ravel()
            cols.append(flat[jnp.asarray(idx_map)])
        out = jnp.concatenate(cols, axis=1) * self.row_valid_dev
        return self.dist.constrain_pencils(out)
