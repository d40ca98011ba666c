"""
Solvers: IVP (IMEX-stepped), LBVP, NLBVP (Newton), EVP (dense/sparse).

Parity target (behavior): dedalus/core/solvers.py:31-806. TPU-first redesign:
per-pencil sparse solves become one batched dense solve over a (G, P, P)
stack; state gather/scatter are static index-map gathers; RHS evaluation is a
pure function over JAX arrays (jit-fusable).
"""

import time
import logging
import numpy as np
import jax.numpy as jnp
from scipy import linalg as sla

from . import subsystems
from . import timesteppers as timesteppers_module
from ..ops import solve as ops_solve
from ..utils.config import config

logger = logging.getLogger(__name__)


class SolverBase:
    """
    Common solver setup: subproblem enumeration and batched pencil system
    (parity: solvers.py:31-133).
    """

    matrix_names = ()

    def __init__(self, problem, matsolver=None, bc_top=None, tau_left=None, **kw):
        self.problem = problem
        self.dist = problem.dist
        self.dtype = problem.dtype
        if matsolver is None:
            matsolver = config.get('linear algebra', 'matrix_factorizer')
        self.matsolver = matsolver
        coupling = problem.matrix_coupling
        domains = [eq['domain'] for eq in problem.equations]
        domains += [v.domain for v in problem.LHS_variables]
        self.coupled, self.subproblems = subsystems.enumerate_subproblems(
            self.dist, domains, coupling)
        self.pencil = subsystems.PencilSystem(
            self.dist, self.subproblems, problem.LHS_variables, problem.equations,
            list(self.matrix_names),
            allow_slot_split=getattr(self, 'allow_slot_split', False))

    @property
    def subproblems_by_group(self):
        """Map group tuple -> Subproblem (None entries for coupled axes),
        parity: reference solvers.py subproblems_by_group."""
        return {sp.group: sp for sp in self.subproblems}

    # --- state plumbing ---

    @property
    def state(self):
        return self.problem.LHS_variables

    def state_flat(self):
        for f in self.state:
            f.require_coeff_space()
            f.change_scales(1)
        return self.pencil.flatten_fields(self.state)

    def set_state_pencils(self, X):
        flat = self.pencil.scatter_state(X)
        self.pencil.unflatten_fields(flat, self.state)

    def traced_F(self, state_flat, t):
        """
        Pure function: flat coeff state (+ sim time) -> (G, R) RHS pencils.
        Binds traced arrays onto the Field objects and evaluates the operator
        trees, so the whole RHS (backward transforms, nonlinearities, forward
        transforms, conversions) traces into one fused XLA program. On
        Cartesian domains, all grid-space operand prefetches are BATCHED
        into one backward-transform chain and the RHS roots into one forward
        chain (the reference evaluator's grouped transforms, evaluator.py:95;
        on this hardware a 9-field batched transform costs ~1.2x one field,
        so grouping removes most of the per-transform overhead).
        """
        self.pencil.unflatten_fields(state_flat, self.state)
        time_field = getattr(self.problem, 'time', None)
        if time_field is not None:
            time_field.preset_data(
                self.dist.grid_layout,
                jnp.reshape(t, (1,) * self.dist.dim))
        # External (non-state) fields in the RHS trees: in-trace layout
        # motion would store traced data on them, leaking tracers into the
        # NEXT program build (forced IVPs). Restore their concrete
        # (layout, scales, data) after every traced evaluation.
        ext = self._rhs_external_fields()
        saved = [(f, f.layout, f.scales, f.data) for f in ext]
        try:
            memo = (self._grouped_grid_memo()
                    if self._rhs_grouping_ok() else None)
            roots = [eq['F'].evaluate(memo) for eq in self.problem.equations]
            if memo is not None:
                self._grouped_forward(roots)
            datas = []
            for F in roots:
                F.require_coeff_space()
                F.change_scales(1)
                datas.append(F.data)
            return self.pencil.gather_eq_data(datas)
        finally:
            for f, lay, sc, data in saved:
                f.layout, f.scales, f.data = lay, sc, data

    def _rhs_external_fields(self):
        """Field leaves of the RHS trees that are not state variables or the
        time field (e.g. constant forcing fields)."""
        cached = getattr(self, '_rhs_external', None)
        if cached is not None:
            return cached
        from .field import Field
        from .future import Future
        skip = {id(v) for v in self.state}
        tf = getattr(self.problem, 'time', None)
        if tf is not None:
            skip.add(id(tf))
        ext, seen = [], set(skip)
        for eq in self.problem.equations:
            F = eq['F']
            if isinstance(F, Future):
                leaves = F.atoms(Field)
            elif isinstance(F, Field):
                leaves = [F]
            else:
                leaves = []
            for fld in leaves:
                if id(fld) not in seen:
                    seen.add(id(fld))
                    ext.append(fld)
        self._rhs_external = ext
        return ext

    # --- grouped RHS transforms (Cartesian separable bases) ---

    def _rhs_grouping_ok(self):
        cached = getattr(self, '_rhs_grouping_flag', None)
        if cached is not None:
            return cached
        from .basis import Jacobi, FourierBase
        ok = True
        for eq in self.problem.equations:
            for b in eq['F'].domain.bases:
                if b is not None and not isinstance(b, (Jacobi, FourierBase)):
                    ok = False
        for v in self.state:
            for b in v.domain.bases:
                if b is not None and not isinstance(b, (Jacobi, FourierBase)):
                    ok = False
        self._rhs_grouping_flag = ok
        return ok

    @staticmethod
    def _grid_arg_node_types():
        from .arithmetic import Add, Multiply, DotProduct, CrossProduct
        from .operators import Power, UnaryGridFunction
        return (Add, Multiply, DotProduct, CrossProduct, Power,
                UnaryGridFunction)

    def _grouped_grid_memo(self):
        """Prefetch every grid-space operand of the RHS trees through ONE
        batched backward-transform chain per (bases, dealias) group.
        Returns {id(node): grid Field} for Future.evaluate's memo."""
        from .field import Field as _Field
        from .future import Future as _Future
        GRID_NODES = self._grid_arg_node_types()
        collect = {}

        def walk(node):
            if not isinstance(node, _Future):
                return
            grid_parent = isinstance(node, GRID_NODES)
            for a in node.args:
                if isinstance(a, (_Field, _Future)):
                    if grid_parent and not isinstance(a, GRID_NODES):
                        collect.setdefault(id(a), a)
                    if isinstance(a, _Future):
                        walk(a)

        for eq in self.problem.equations:
            walk(eq['F'])
        if not collect:
            return None
        groups = {}
        for nid, node in collect.items():
            dom = node.domain
            if not any(b is not None for b in dom.bases):
                continue                      # constant-domain: normal path
            key = (tuple(id(b) for b in dom.bases), tuple(dom.dealias))
            groups.setdefault(key, []).append(node)
        memo = {}
        for (bids, scales), nodes in groups.items():
            slabs, metas = [], []
            for n in nodes:
                # memo=None: collected nodes may nest (u inside grad(u));
                # coeff evaluation must not see each other's grid values
                f = n.evaluate(None) if isinstance(n, _Future) else n
                if f is n:
                    f = f.copy()
                f.require_coeff_space()
                nc = f.ncomp
                slabs.append(jnp.reshape(
                    f.data, (nc,) + f.data.shape[len(f.tensorsig):]))
                metas.append((n, f.tensorsig, nc))
            batch = jnp.concatenate(slabs, axis=0)
            gdata = self._batched_backward(nodes[0].domain, batch, scales)
            off = 0
            for n, ts, nc in metas:
                part = gdata[off:off + nc]
                off += nc
                out = _Field(self.dist,
                             bases=[b for b in n.domain.bases if b is not None],
                             dtype=self.dtype, tensorsig=ts)
                out.preset_data(
                    self.dist.grid_layout,
                    jnp.reshape(part, tuple(cs.dim for cs in ts)
                                + part.shape[1:]),
                    scales=scales)
                memo[id(n)] = out
        return memo or None

    def _batched_backward(self, domain, data, scales):
        """coeff (B, *cshape) -> grid (B, *gshape at scales), mirroring
        Field.towards_grid_space (constrain-then-transform per axis) with
        one leading batch axis."""
        from .distributor import Layout
        dist = self.dist
        layout = dist.coeff_layout
        while not all(layout.grid_space):
            gs = list(layout.grid_space)
            axis = len(gs) - 1 - gs[::-1].index(False)
            basis = domain.bases[axis]
            target = Layout(gs[:axis] + [True] + gs[axis + 1:])
            if basis is not None:
                data = dist.constrain(data, target, 1)
                data = basis.backward_transform(
                    data, 1 + axis, scales[axis], self.dtype)
            layout = target
        return data

    def _grouped_forward(self, roots):
        """Batch the RHS roots' forward transforms: grid-layout roots with
        matching (bases, scales) go through one forward chain; the coeff
        results are preset back onto the same Field objects."""
        from .distributor import Layout
        dist = self.dist
        groups = {}
        for F in roots:
            if not all(F.layout.grid_space):
                continue
            if not any(b is not None for b in F.domain.bases):
                continue
            key = (tuple(id(b) for b in F.domain.bases), tuple(F.scales))
            groups.setdefault(key, []).append(F)
        for (bids, scales), fields in groups.items():
            if len(fields) == 1 and fields[0].ncomp == 1:
                continue                      # nothing to amortize
            slabs = [jnp.reshape(F.data,
                                 (F.ncomp,) + F.data.shape[len(F.tensorsig):])
                     for F in fields]
            data = jnp.concatenate(slabs, axis=0)
            domain = fields[0].domain
            layout = dist.grid_layout
            while any(layout.grid_space):
                gs = list(layout.grid_space)
                axis = gs.index(True)
                basis = domain.bases[axis]
                if basis is not None:
                    data = basis.forward_transform(
                        data, 1 + axis, scales[axis], self.dtype)
                gs[axis] = False
                layout = Layout(gs)
                data = dist.constrain(data, layout, 1)
            off = 0
            for F in fields:
                nc = F.ncomp
                part = data[off:off + nc]
                off += nc
                F.preset_data(
                    dist.coeff_layout,
                    jnp.reshape(part, F.tensor_shape + part.shape[1:]),
                    scales=1)

    def traced_matrix_apply(self, name, state_flat):
        """
        Matrix-free application of the named LHS operator (M/L/dF): bind the
        state and evaluate the structured expression trees — many small
        per-axis matmuls instead of one huge dense (G,P,P) batched apply
        (XLA's batched f64 matmuls run far off roofline on TPU).
        Returns (G, R) pencils, identical to batched_matvec(matrices[name], X)
        up to roundoff.
        """
        self.pencil.unflatten_fields(state_flat, self.state)
        datas = []
        for eq in self.problem.equations:
            expr = eq.get(name)
            if expr is None:
                datas.append(jnp.zeros(
                    tuple(cs.dim for cs in eq['tensorsig'])
                    + tuple(b.coeff_size if b is not None else 1
                            for b in eq['domain'].bases), dtype=self.dtype))
                continue
            out = expr.evaluate()
            out.require_coeff_space()
            out.change_scales(1)
            datas.append(out.data)
        return self.pencil.gather_eq_data(datas)

    def _shard_factorization(self, fact):
        """Group-shard a FactorizedStack's per-group device arrays over the
        mesh (the BVP/EVP analogue of the IVP path's device_put_pencils;
        the reference runs all solver types under MPI, solvers.py:324,418).
        No-op in serial runs or for host-resident factorizations."""
        dist = self.dist
        if dist.mesh is None:
            return fact
        G = self.pencil.G
        for attr in ('lu', 'perm', 'Ainv', 'A'):
            arr = getattr(fact, attr, None)
            if arr is not None and arr.ndim >= 1 and arr.shape[0] == G:
                setattr(fact, attr, dist.device_put_pencils(arr, G))
        for attr in ('polyA', 'pre'):
            d = getattr(fact, attr, None)
            if isinstance(d, dict) and 'weights' in d:
                d['weights'] = dist.device_put_pencils(d['weights'], G)
        return fact

    def evaluate_F(self, wall_time=0.0, timestep=0.0, schedule=True):
        """Evaluate all equation RHS expressions and gather (G, R) pencils."""
        if schedule and getattr(self, 'evaluator', None) is not None:
            self.evaluator.evaluate_scheduled(
                iteration=getattr(self, 'iteration', 0),
                wall_time=wall_time,
                sim_time=getattr(self, 'sim_time', 0.0),
                timestep=timestep)
        datas = []
        for eq in self.problem.equations:
            F = eq['F'].evaluate()
            F.require_coeff_space()
            F.change_scales(1)
            datas.append(F.data)
        return self.pencil.gather_eq_data(datas)


class LinearBoundaryValueSolver(SolverBase):
    """L.X = F (parity: solvers.py:324). On a device mesh the factorization
    stacks are group-sharded (each device factors/solves only its pencils)."""

    matrix_names = ('L',)

    def __init__(self, problem, **kw):
        super().__init__(problem, **kw)
        self.evaluator = None
        self._factorized = None

    def solve(self, rebuild_matrices=False):
        if rebuild_matrices or self._factorized is None:
            if rebuild_matrices:
                self.pencil.build_matrices(['L'])
            A = self.pencil.combined_with_pivots({'L': 1.0})
            self._factorized = self._shard_factorization(
                ops_solve.FactorizedStack(A, method=self.matsolver))
        F = self.evaluate_F(schedule=False)
        F = self.dist.device_put_pencils(F, self.pencil.G)
        X = self._factorized.solve(F)
        self.set_state_pencils(X)


class NonlinearBoundaryValueSolver(SolverBase):
    """Newton-Kantorovich iteration: dF.dX = -F (parity: solvers.py:418)."""

    matrix_names = ('dF',)

    def __init__(self, problem, **kw):
        super().__init__(problem, **kw)
        self.evaluator = None
        self.iteration = 0
        self.perturbations = problem.perturbations

    def newton_iteration(self, damping=1.0):
        # Rebuild dF matrices about the current state (NCC backgrounds changed)
        self.pencil.build_matrices(['dF'])
        A = self.pencil.combined_with_pivots({'dF': 1.0})
        fact = self._shard_factorization(
            ops_solve.FactorizedStack(A, method=self.matsolver))
        F = self.evaluate_F(schedule=False)
        F = self.dist.device_put_pencils(F, self.pencil.G)
        dX = fact.solve(-F)
        # Scatter perturbations and update variables
        flat = self.pencil.scatter_state(dX)
        self.pencil.unflatten_fields(flat, self.perturbations)
        for var, pert in zip(self.problem.variables, self.perturbations):
            var.require_coeff_space()
            var.change_scales(1)
            var.preset_data(var.layout, var.data + damping * pert.data)
        self.iteration += 1
        return float(jnp.sqrt(jnp.sum(dX * dX)))


class EigenvalueSolver(SolverBase):
    """
    lam*M.X + L.X = 0 (parity: solvers.py:134-321): dense eigensolve per
    subproblem (invalid modes dropped), or sparse shift-invert via host ARPACK.
    """

    matrix_names = ('M', 'L')

    def __init__(self, problem, **kw):
        super().__init__(problem, **kw)
        self.evaluator = None
        self.eigenvalues = None
        self.eigenvectors = None
        self.eigenvalue_subproblem = None

    def _sparse_pair(self, sp_index):
        """Sparse reduced (L, M) for one subproblem: invalid rows/cols dropped
        without densifying (the valid masks play the role of the reference's
        pre_left/pre_right preconditioners, solvers.py:207-294)."""
        from scipy import sparse as ss
        pencil = self.pencil
        rv = pencil.row_valid[sp_index]
        cv = pencil.col_valid[sp_index]
        L = ss.csr_matrix(pencil.matrices_scipy['L'][sp_index])[rv][:, cv].tocsc()
        M = ss.csr_matrix(pencil.matrices_scipy['M'][sp_index])[rv][:, cv].tocsc()
        return L, M, rv, cv

    def _embed(self, pre_evecs, valid):
        """Embed reduced eigenvectors into full pencil coordinates."""
        full = np.zeros((valid.size, pre_evecs.shape[1]), dtype=pre_evecs.dtype)
        full[valid, :] = pre_evecs
        return full

    def _store_left(self, pre_left, pre_right, M_red, rv, cv, normalize_left):
        """Left eigenvectors (row space) and modified left eigenvectors
        (column space, w -> M^H w) with biorthonormal normalization
        (parity: solvers.py:216-222, 280-294)."""
        self.left_eigenvectors = self._embed(pre_left, rv)
        self.modified_left_eigenvectors = self._embed(
            np.asarray(M_red.conj().T @ pre_left), cv)
        if normalize_left:
            # Guard degenerate (zero) biorthogonal norms: leave those modes
            # unnormalized and warn, instead of dividing by zero (parity:
            # reference solvers.py:216-222 tolerates defective pairings).
            norms = np.diag(pre_left.conj().T @ (M_red @ pre_right))
            finite = np.abs(norms) > 1e3 * np.finfo(norms.dtype).tiny
            if not np.all(finite):
                logger.warning(
                    "Skipping left-eigenvector normalization for %d mode(s) "
                    "with zero biorthogonal norm", int(np.sum(~finite)))
            safe = np.where(finite, np.conj(norms), 1.0)
            self.left_eigenvectors = self.left_eigenvectors / safe
            self.modified_left_eigenvectors = self.modified_left_eigenvectors / safe

    def solve_dense(self, subproblem=None, sp_index=0, left=False,
                    normalize_left=True, **kw):
        """Full dense eigensolve of one subproblem. With left=True also
        computes left and modified-left eigenvectors (scipy.linalg.eig
        definitions, matching reference solvers.py:180-228)."""
        if subproblem is not None:
            sp_index = self.subproblems.index(subproblem)
        self.eigenvalue_subproblem = sp_index
        Ls, Ms, rv, cv = self._sparse_pair(sp_index)
        L, M = Ls.toarray(), Ms.toarray()
        # lam M x + L x = 0  ->  L x = lam (-M) x
        out = sla.eig(L, b=-M, left=left, **kw)
        if left:
            self.eigenvalues, pre_left, pre_evecs = out
            self._store_left(pre_left, pre_evecs, -Ms, rv, cv, normalize_left)
        else:
            self.eigenvalues, pre_evecs = out
        self.right_eigenvectors = self.eigenvectors = self._embed(pre_evecs, cv)

    def solve_sparse(self, subproblem=None, N=10, target=0.0, sp_index=0,
                     left=False, normalize_left=True, raise_on_mismatch=True,
                     v0=None, **kw):
        """Sparse shift-invert eigensolve around `target` via host ARPACK
        (matrices stay sparse end-to-end; parity: solvers.py:229-294 +
        libraries/matsolvers shift-invert)."""
        from scipy.sparse import linalg as spla
        if subproblem is not None:
            sp_index = self.subproblems.index(subproblem)
        self.eigenvalue_subproblem = sp_index
        A, Ms, rv, cv = self._sparse_pair(sp_index)
        B = (-Ms).tocsc()

        def shift_invert_eigs(A, B, target, v0=None):
            # A x = lam B x around target: C = A - target B, op = C^{-1} B
            dtype = np.promote_types(np.promote_types(A.dtype, B.dtype),
                                     np.asarray(target).dtype)
            C = (A.astype(dtype) - target * B.astype(dtype)).tocsc()
            solve = spla.factorized(C)
            Bd = B.astype(dtype)
            n = A.shape[0]
            op = spla.LinearOperator((n, n), matvec=lambda x: solve(Bd @ x),
                                     dtype=dtype)
            evals, evecs = spla.eigs(op, k=N, which='LM', v0=v0, **kw)
            return 1 / evals + target, evecs

        self.eigenvalues, pre_evecs = shift_invert_eigs(A, B, target, v0=v0)
        self.right_eigenvectors = self.eigenvectors = self._embed(pre_evecs, cv)
        if left:
            # Left eigenvectors of (A, B) = right eigenvectors of the adjoint
            # problem at the conjugate target
            self.left_eigenvalues, pre_left = shift_invert_eigs(
                A.conj().T.tocsc(), B.conj().T.tocsc(), np.conj(target))
            if not np.allclose(np.sort_complex(self.eigenvalues),
                               np.sort_complex(np.conj(self.left_eigenvalues))):
                if raise_on_mismatch:
                    raise RuntimeError(
                        "Conjugate of left eigenvalues does not match right "
                        "eigenvalues; left/right vectors won't form a "
                        "biorthogonal set. Pass raise_on_mismatch=False to "
                        "proceed anyway.")
                logger.warning("Left/right eigenvalue mismatch; skipping "
                               "left-eigenvector normalization.")
                normalize_left = False
            else:
                # Reorder left pairs to match the right eigenvalues
                order = []
                used = set()
                for lam in self.eigenvalues:
                    diffs = np.abs(np.conj(self.left_eigenvalues) - lam)
                    for j in np.argsort(diffs):
                        if j not in used:
                            order.append(j)
                            used.add(j)
                            break
                pre_left = pre_left[:, order]
                self.left_eigenvalues = self.left_eigenvalues[order]
            self._store_left(pre_left, pre_evecs, -Ms, rv, cv, normalize_left)

    def set_state(self, index, subsystem=None):
        """Load eigenvector `index` into the problem variables and the
        eigenvalue into the problem's eigenvalue field (parity:
        solvers.py:296-321)."""
        sp_index = self.eigenvalue_subproblem or 0
        vec = self.eigenvectors[:, index]
        G = self.pencil.G
        X = np.zeros((G, self.pencil.C), dtype=complex if np.iscomplexobj(vec) else float)
        X[sp_index] = vec
        if np.iscomplexobj(vec) and not np.issubdtype(self.dtype, np.complexfloating):
            scale = np.max(np.abs(vec)) or 1.0
            if np.max(np.abs(X.imag)) > 1e-10 * scale:
                raise ValueError(
                    "Eigenvector has significant imaginary part but the "
                    "problem dtype is real; rescale the phase first (e.g. "
                    "solver.eigenvectors[:, i] /= phase) or use a complex dtype.")
            X = X.real
        self.set_state_pencils(jnp.asarray(X))
        eig_field = getattr(self.problem, 'eigenvalue', None)
        if eig_field is not None and self.eigenvalues is not None:
            lam = self.eigenvalues[index]
            if not np.issubdtype(eig_field.dtype, np.complexfloating):
                lam = lam.real
            eig_field['g'] = lam


class InitialValueSolver(SolverBase):
    """
    M.dt(X) + L.X = F (parity: solvers.py:503-806): IMEX stepping with batched
    device solves; run-control properties (proceed, stop criteria); stats.
    """

    matrix_names = ('M', 'L')
    # Spherical joint pencils re-batch per (m, ell) when slot-diagonal — the
    # large-N ball/shell path (reference's own (m, ell) decomposition)
    allow_slot_split = True

    def __init__(self, problem, timestepper, enforce_real_cadence=100, warmup_iterations=10,
                 profile=False, profile_dir='profiles', **kw):
        super().__init__(problem, **kw)
        # Profiling hooks (parity: reference cProfile integration,
        # solvers.py:546-561 + dedalus.cfg [profiling]): `profile=True`
        # wraps `evolve` in a jax profiler trace (device timeline viewable
        # in TensorBoard/Perfetto) plus a host cProfile dump.
        self.profile = bool(profile)
        self.profile_dir = profile_dir
        if isinstance(timestepper, str):
            timestepper = timesteppers_module.schemes[timestepper]
        self.timestepper = timestepper(self)
        # Hermitian/redundancy enforcement for real dtypes (parity:
        # solvers.py:583-586,705-708). The masked pencil solves keep invalid
        # (redundant) mode slots at zero by construction, so this guards
        # against user-injected junk and roundoff asymmetries in long runs.
        if np.isrealobj(self.dtype.type()):
            self.enforce_real_cadence = enforce_real_cadence
        else:
            self.enforce_real_cadence = None
        self._sim_time = 0.0
        self.iteration = self.initial_iteration = 0
        self.stop_sim_time = np.inf
        self.stop_wall_time = np.inf
        self.stop_iteration = np.inf
        self.start_time = self.wall_time
        self.warmup_iterations = warmup_iterations
        self.warmup_time = None
        from .evaluator import Evaluator
        self.evaluator = Evaluator(self.dist, dict(self.problem.namespace))
        self.F_handler = None
        self._chunk_history = []  # compiled-chunk lengths (diagnostics)

    # --- time bookkeeping ---

    @property
    def sim_time(self):
        return self._sim_time

    @sim_time.setter
    def sim_time(self, t):
        # Host-side clock; the time *field* is rebound inside traced steps and
        # re-synced with a concrete value here.
        self._sim_time = float(t)
        self.problem.time['g'] = self._sim_time

    @property
    def wall_time(self):
        return time.perf_counter()

    @property
    def proceed(self):
        if self.sim_time >= self.stop_sim_time:
            logger.info("Simulation stop time reached.")
            return False
        if (self.wall_time - self.start_time) >= self.stop_wall_time:
            logger.info("Wall stop time reached.")
            return False
        if self.iteration >= self.stop_iteration:
            logger.info("Stop iteration reached.")
            return False
        return True

    def enforce_hermitian_symmetry(self, fields):
        """Project out redundant real-dtype mode content by a grid round-trip
        at dealias scales (parity: solvers.py:675-681): backward columns /
        forward rows for redundant slots (mean-mode sin parts, Nyquist) are
        zero, so the round-trip zeroes anything deposited there."""
        for f in fields:
            f.change_scales(f.domain.dealias)
            f.require_grid_space()
            f.require_coeff_space()
            f.change_scales(1)

    def _maybe_enforce_real(self):
        cadence = self.enforce_real_cadence
        if cadence:
            # Enforce for as many iterations as the timestepper holds history
            # (parity: solvers.py:705-708)
            if self.iteration % cadence < getattr(self.timestepper, 'steps', 1):
                self.enforce_hermitian_symmetry(self.state)

    def step(self, dt):
        """Advance the system by one timestep."""
        if dt <= 0 or not np.isfinite(dt):
            raise ValueError(f"Invalid timestep: {dt}")
        if self.iteration == self.warmup_iterations:
            self.warmup_time = self.wall_time
        self.timestepper.step(float(dt), wall_time=self.wall_time - self.start_time)
        self._maybe_enforce_real()
        self.iteration += 1

    def _steps_to_next_fire(self, dt, max_n):
        """Steps until the next handler firing (exact for iter and sim_dt
        cadences, matching Handler.check_schedule's crossing semantics;
        wall_dt cadences are bounded by the measured step rate so a wall-dt
        handler coexists with long compiled chunks). Returns None when no
        handler is scheduled at all. Parity: ref evaluator.py:246."""
        have_schedule = False
        n_next = max_n
        for h in self.evaluator.handlers:
            if not h.tasks:
                continue
            if h.iter is not None:
                have_schedule = True
                it = max(1, int(h.iter))
                n_next = min(n_next, it - (self.iteration % it))
            if h.sim_dt is not None:
                have_schedule = True
                sd = float(h.sim_dt)
                # Next crossing of a sim_dt multiple (same epsilon as
                # Handler.check_schedule)
                k = int((self.sim_time + 1e-12) // sd)
                n = int(np.ceil(((k + 1) * sd - self.sim_time - 1e-12) / dt))
                n_next = min(n_next, max(1, n))
            if h.wall_dt is not None:
                have_schedule = True
                est = getattr(self, '_est_step_wall', None)
                if est:
                    elapsed = self.wall_time - self.start_time
                    rem = h.wall_dt - (elapsed % h.wall_dt)
                    n_next = min(n_next, max(1, int(rem / est) + 1))
                else:
                    # No rate estimate yet: short first chunk to calibrate
                    n_next = min(n_next, 10)
            if h.custom_schedule is not None:
                have_schedule = True
                n_next = 1
        if not have_schedule:
            return None
        return max(1, n_next)

    def run_steps(self, dt, n_steps, evaluate_handlers=True):
        """
        Advance n_steps at fixed dt through compiled lax.scan chunks (no host
        round-trips between steps). When analysis handlers are scheduled, each
        chunk runs exactly to the next handler firing (next-fire computation,
        exact for sim_dt cadences that are not multiples of dt) and handlers
        fire between chunks — the compiled main loop and file output coexist
        (parity with the reference's every-step handler evaluation,
        evaluator.py:90,246, at scan speed for coarse cadences).
        """
        dt, n_steps = float(dt), int(n_steps)
        if self.iteration == self.warmup_iterations:
            self.warmup_time = self.wall_time
        chunk = (self._steps_to_next_fire(dt, n_steps)
                 if evaluate_handlers else None)
        if chunk is None:
            self.timestepper.run_steps(dt, n_steps)
        else:
            done = 0
            while done < n_steps:
                # Fire handlers scheduled at the current iteration
                self.evaluator.evaluate_scheduled(
                    iteration=self.iteration,
                    wall_time=self.wall_time - self.start_time,
                    sim_time=self.sim_time, timestep=dt)
                # Advance to the next firing (bounded by remaining steps)
                n = self._steps_to_next_fire(dt, n_steps - done)
                t_chunk = self.wall_time
                self.timestepper.run_steps(dt, n)
                self._est_step_wall = (self.wall_time - t_chunk) / n
                self._chunk_history.append(n)
                done += n
            self.evaluator.evaluate_scheduled(
                iteration=self.iteration,
                wall_time=self.wall_time - self.start_time,
                sim_time=self.sim_time, timestep=dt)
        if self.enforce_real_cadence and n_steps >= self.enforce_real_cadence:
            self.enforce_hermitian_symmetry(self.state)

    def _evolve_cfl(self, cfl, log_cadence=100):
        """CFL-adaptive main loop at compiled-chunk speed: between CFL
        updates dt is constant, so each inter-update span runs as ONE
        compiled multi-step call (handler cadences still fire exactly via
        run_steps' next-fire chunking). Refactorization happens only when
        the thresholded dt actually changes — the reference's
        refactor-on-(a0,b0)-change semantics (ref timesteppers.py:135)
        without its per-step host dispatch."""
        while self.proceed:
            dt = cfl.compute_timestep()
            n = cfl.chunk_steps()
            self.run_steps(dt, n)
            if self.iteration % log_cadence < n:
                logger.info(f"Iteration={self.iteration}, "
                            f"Time={self.sim_time:.6e}, dt={dt:.3e}")
        self.log_stats()

    def evolve(self, timestep_function, log_cadence=100):
        """Advance until a stop criterion triggers. Passing a CFL controller
        instance selects the chunked compiled main loop."""
        from ..extras.flow_tools import CFL as _CFL
        if isinstance(timestep_function, _CFL):
            return self._evolve_cfl(timestep_function, log_cadence)
        profiling = False
        if self.profile:
            import os
            import cProfile
            import jax.profiler
            os.makedirs(self.profile_dir, exist_ok=True)
            try:
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            except Exception as exc:   # backend without profiler support
                logger.warning("jax profiler unavailable: %s", exc)
            self._host_profiler = cProfile.Profile()
            self._host_profiler.enable()
        try:
            while self.proceed:
                dt = timestep_function() if callable(timestep_function) else timestep_function
                self.step(dt)
                if self.iteration % log_cadence == 0:
                    logger.info(f"Iteration={self.iteration}, Time={self.sim_time:.6e}, dt={dt:.3e}")
        except Exception:
            logger.error("Exception raised, triggering end of main loop.")
            raise
        finally:
            if self.profile:
                import os
                import jax.profiler
                if profiling:
                    try:
                        jax.profiler.stop_trace()
                    except Exception:
                        pass
                self._host_profiler.disable()
                self._host_profiler.dump_stats(
                    os.path.join(self.profile_dir, 'runtime.prof'))
            self.log_stats()

    def print_subproblem_ranks(self, *args, **kw):
        for g, sp in enumerate(self.subproblems):
            A = self.pencil.combined_with_pivots({'M': 1.0, 'L': 1.0})[g]
            print(f"Subproblem {g}: shape={A.shape}, rank={np.linalg.matrix_rank(A)}")

    def load_state(self, path, index=-1):
        """Restore state fields, sim time and iteration from a checkpoint."""
        from .evaluator import load_state_from_file
        return load_state_from_file(self, path, index)

    def log_stats(self, format='.4g'):
        """Log run statistics: wall times and mode-stages/cpu-sec throughput
        (parity: solvers.py:755-778)."""
        log_time = self.wall_time
        total = log_time - self.start_time
        logger.info(f"Final iteration: {self.iteration}")
        logger.info(f"Final sim time: {self.sim_time}")
        logger.info(f"Setup + run time (s): {total:{format}}")
        if self.warmup_time is not None and self.iteration > self.warmup_iterations:
            run_time = log_time - self.warmup_time
            iters = self.iteration - self.warmup_iterations
            modes = sum(int(np.prod(self.pencil._coeff_shape(v))) for v in self.state)
            stages = getattr(self.timestepper, 'stages', 1)
            logger.info(f"Timings after warmup iteration {self.warmup_iterations}:")
            logger.info(f"  Run time (s): {run_time:{format}}")
            if run_time > 0:
                logger.info(f"  Speed: {modes * iters * stages / run_time:{format}} mode-stages/sec")
                self.speed = modes * iters * stages / run_time


# Aliases matching the reference naming
IVPSolver = InitialValueSolver
LBVPSolver = LinearBoundaryValueSolver
