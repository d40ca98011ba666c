"""
IMEX timesteppers: multistep (CNAB/SBDF/MCNAB/CNLF families) and Runge-Kutta
(DIRK+ERK tableaus).

Parity target (behavior): dedalus/core/timesteppers.py:12-740 — the same 13
schemes with the same variable-timestep coefficient formulas, from the
published references (Wang & Ruuth, JCM 2008; Ascher, Ruuth & Spiteri, ANM
1997; Spalart, Moser & Rogers, JCP 1991; Marti et al. 2016 "GFY").

TPU-first redesign: histories are (G, R) device arrays; M.X / L.X are batched
MXU matmuls over all pencils at once; LHS factorization happens on host once
per (a0, b0) and the per-step solve is one batched device triangular solve.

System form (multistep):   sum_j a_j M X(n-j) + sum_j b_j L X(n-j) = sum_j c_j F(n-j)
System form (Runge-Kutta): M X(n,i) - M X(n,0) + k H_ij L X(n,j) = k A_ij F(n,j)
"""

from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import solve as ops_solve

schemes = {}


def add_scheme(cls):
    schemes[cls.__name__] = cls
    return cls


def _hoist_closure_constants(fn, example_args):
    """Trace `fn` and hoist its closure constants (transform stacks, operator
    matrices served by the basis-layer device caches) into runtime arguments.
    Keeps the serialized program small — the axon remote compiler rejects
    oversized request bodies (HTTP 413) when large arrays are baked into the
    HLO as constants — and lets XLA share one device copy across
    recompilations. Returns (converted_fn, device_consts); call as
    converted_fn(*args, *device_consts)."""
    from ..ops.hoist import hoist_constants
    return hoist_constants(fn, example_args)


def _poly_bad_key(fact):
    """Hashable signature of a poly factorization's bad-group indices."""
    return (tuple(np.asarray(fact.polyA['bad_idx']).ravel().tolist()),
            tuple(np.asarray(fact.pre['bad_idx']).ravel().tolist()))


class TimestepperBase:

    def __init__(self, solver):
        self.solver = solver
        self.pencil = solver.pencil
        self._LHS_params = None
        self._factorized = {}
        # Outer-refinement reuse bookkeeping (banded): step-coefficient key
        # -> number of outer refinement passes against the anchor
        # factorization (0 = the key has its own factorization), measured
        # outer residual curves per (anchor, rho-bucket), and per-key use
        # counts driving the persistence upgrade.
        self._outer_for_key = {}
        self._outer_curves = {}
        self._outer_uses = {}

    def _get_factorized(self, a0, b0):
        from ..utils.config import config
        # Floor 1 (not 2): fixed-dt runs never revisit the startup scheme's
        # (a0, b0), and its factor stack pins GBs of HBM at BASELINE scale.
        limit = max(1, int(config.get('linear algebra',
                                      'max_cached_factorizations',
                                      fallback='3')))
        key = (float(a0), float(b0))
        fact = self._factorized.pop(key, None)
        if fact is None:
            # Evict down to limit-1 BEFORE building: a new factorization's
            # device arrays (and its factor-time refinement probe) must not
            # coexist with a stack that is about to be evicted anyway —
            # that transient doubles HBM residency at 2048x512+. Poly keeps
            # its newest sibling: it seeds the device-GEMM refit below.
            keep_floor = 1 if self.solver.matsolver == 'poly' else 0
            while len(self._factorized) >= max(limit, keep_floor + 1):
                oldest = next(iter(self._factorized))
                evicted = self._factorized.pop(oldest)
                # Drop the lingering reference too, or the evicted stack's
                # device arrays stay pinned through the whole rebuild
                # (transiently doubling HBM residency at 2048x512+);
                # _prepare reassigns _current_fact right after this returns.
                if getattr(self, '_current_fact', None) is evicted:
                    self._current_fact = None
            if self.solver.matsolver == 'banded':
                # The banded path always works from the sparse per-group
                # representation (never materializes dense stacks)
                from .subsystems import LazyCombined
                A = LazyCombined(self.pencil, {'M': a0, 'L': b0})
            else:
                A = self.pencil.combined_with_pivots({'M': a0, 'L': b0})
            # Most recent sibling poly factorization: its preconditioner
            # drives the device-GEMM refit for the new (a0, b0) — the CFL
            # dt-change path — instead of a fresh host node-inverse fit
            refit_base = None
            if self.solver.matsolver == 'poly':
                for prev in reversed(list(self._factorized.values())):
                    if getattr(prev, 'pre', None) is not None:
                        refit_base = prev
                        break
            fact = ops_solve.FactorizedStack(
                A, method=self.solver.matsolver,
                plan_hint=getattr(self, '_poly_plan_hint', None),
                refit_base=refit_base)
            if getattr(fact, 'apply_plan', None) is not None:
                # Later factorizations adopt this apply structure: all facts
                # of one timestepper share the compiled run program
                self._poly_plan_hint = fact.apply_plan
            fact.lhs_coeffs = key
        # LRU-bounded cache: variable-dt (CFL-adaptive) runs visit many
        # (a0, b0) keys, and each factorization pins GBs of device arrays at
        # production sizes — unbounded growth OOMs the chip (ref parity:
        # dedalus/core/timesteppers.py:135 stores only the CURRENT LHS).
        self._factorized[key] = fact
        while len(self._factorized) > limit:
            oldest = next(k for k in self._factorized if k != key)
            del self._factorized[oldest]
        return fact

    def run_program_cost(self):
        """XLA cost analysis of the compiled run program (flops/bytes).
        Uses jit's lowering with the last call's arguments; the persistent
        compilation cache makes this a disk hit, not a recompile. The trip
        count is a dynamic while-loop bound, so XLA counts the loop body
        once — i.e. flops are (approximately) per STEP."""
        cached = [v for k, v in getattr(self, '_scan_cache', {}).items()]
        args = getattr(self, '_last_run_args', None)
        if not cached or args is None:
            return None
        fn, consts = cached[-1]
        try:
            return fn.lower(*args, *consts).compile().cost_analysis()
        except Exception:
            return None

    def _solve_fn_and_args(self):
        """Jit-safe solve function + per-factorization array extractor."""
        method = self.solver.matsolver
        if method == 'lu':
            return (lambda s1, s2, R: ops_solve.batched_lu_solve(s1, s2, R),
                    lambda f: (f.lu, f.perm))
        if method == 'inverse':
            return (lambda s1, s2, R: ops_solve.batched_matvec(s1, R),
                    lambda f: (f.Ainv, f.Ainv))
        if method == 'inverse_refined':
            return (lambda s1, s2, R: ops_solve.batched_refined_solve(s1, s2, R),
                    lambda f: (f.Ainv, f.A))
        if method == 'mixed':
            return (lambda s1, s2, R: ops_solve.batched_mixed_solve(s1, s2, R),
                    lambda f: (f.Ainv, f.A))
        if method == 'matrix_free':
            # Placeholder solve (f32 inverse apply); refinement happens in the
            # matrix-free step via structured operator applications.
            return (lambda s1, s2, R: ops_solve.batched_matvec(
                        s1, R.astype(jnp.float32)).astype(R.dtype),
                    lambda f: (f.Ainv, f.Ainv))
        raise ValueError(f"Unknown matsolver: {method}")


class MultistepIMEX(TimestepperBase):
    """
    General variable-step IMEX multistep scheme
    (parity: timesteppers.py:34-188).
    """

    def __init__(self, solver):
        super().__init__(solver)
        steps = self.steps
        shape = (steps, self.pencil.G, self.pencil.R)
        # Histories as stacked device arrays: index 0 = most recent;
        # group-sharded over the device mesh when one is active
        hist_sharding = solver.dist.pencil_sharding(self.pencil.G, 1, g_dim=1)
        kw = {'device': hist_sharding} if hist_sharding is not None else {}
        self.MX = jnp.zeros(shape, dtype=solver.dtype, **kw)
        self.LX = jnp.zeros(shape, dtype=solver.dtype, **kw)
        self.F = jnp.zeros(shape, dtype=solver.dtype, **kw)
        self.dt_hist = deque([0.0] * steps, maxlen=steps)
        self._iteration = 0
        self._compiled = None

    def _poly_ml(self):
        """Separable (GEMM) forms of the M and L stacks (cached): exact from
        the sampled assembly when present, else host-fit from the dense
        stacks."""
        if not hasattr(self, '_poly_ml_cache'):
            pencil = self.pencil
            if getattr(pencil, 'separable', None) is not None:
                out = []
                for name in ('M', 'L'):
                    s = pencil.separable[name]
                    B = s.dense_B()
                    Bcat = np.concatenate([B[p].T for p in range(B.shape[0])], axis=1)
                    bad_idx = tuple(sorted(s.bad))
                    Abad = (np.stack([np.asarray(s.bad[g].todense()) for g in bad_idx])
                            if bad_idx else np.zeros((0,) + s.shape))
                    out.append(dict(weights=jnp.asarray(s.weights()),
                                    Bcat=jnp.asarray(Bcat),
                                    bad_idx=bad_idx,
                                    Abad=jnp.asarray(Abad)))
                self._poly_ml_cache = tuple(out)
            else:
                if self.pencil.matrices['M'] is None:
                    raise ValueError(
                        "pencil stacks are too large for dense storage and "
                        "have no separable structure")
                pm = ops_solve.fit_separable_stack(np.asarray(self.pencil.matrices['M']))
                pl = ops_solve.fit_separable_stack(np.asarray(self.pencil.matrices['L']))
                if pm is None or pl is None:
                    raise ValueError("M/L stacks are not separable in the group index")
                self._poly_ml_cache = (pm, pl)
        return self._poly_ml_cache

    def _banded_ml(self):
        """Banded block-form M and L operators (cached): exact f64 applies
        at O(G nb P) HBM traffic inside the compiled step."""
        if not hasattr(self, '_banded_ml_cache'):
            self._banded_ml_cache = (self.pencil.banded_operator('M'),
                                     self.pencil.banded_operator('L'))
        return self._banded_ml_cache

    def _outer_reuse(self, a0, b0):
        """Serve the LHS a0 M + b0 L from an EXISTING banded factorization
        via outer iterative refinement instead of building a new factor
        stack. For a factorization of af M + bf L, each outer pass
        x <- x + solve(rhs - (a0 M + b0 L) x) contracts the error by
        roughly rho = max(|a0-af|/|af|, |b0-bf|/|bf|) (exactly
        sup |(da + db l)/(af + bf l)| over the (L, M) pencil spectrum with
        Re l >= 0), so nearby coefficients — a scheme's reduced-order
        startup steps, CFL dt changes — converge in a handful of passes.
        This removes the second full factor build + device ship from every
        cold start (the dominant warmup cost at BASELINE sizes) and makes
        dt transitions O(passes x solve) instead of O(refactorize).
        The pass count comes from a MEASURED residual curve (probed once
        per rho bucket, device-cheap), with fallback to a dedicated
        factorization when the curve misses the acceptance floor.
        Returns (base_key, fact, n_outer) or None."""
        from ..utils.config import config
        rho_max = float(config.get('linear algebra', 'outer_reuse_rho',
                                   fallback='0.55'))
        if rho_max <= 0:
            return None
        # Persistence upgrade: a key requested many times deserves its own
        # factorization — paying n_outer extra solves on EVERY step of a
        # long fixed-coefficient run would dwarf one factor build. Startup
        # keys run at most (steps-1) times and never trigger this.
        key = (float(a0), float(b0))
        uses = self._outer_uses.get(key, 0) + 1
        self._outer_uses[key] = uses
        if uses > max(4, 2 * self.steps):
            return None
        best = None
        for bkey, prev in self._factorized.items():
            bb = getattr(prev, 'banded', None)
            if bb is None or bb.refinements is None:
                continue
            ka, kb = bkey
            ra = abs(a0 - ka) / abs(ka) if ka else (0.0 if a0 == ka else np.inf)
            rb = abs(b0 - kb) / abs(kb) if kb else (0.0 if b0 == kb else np.inf)
            rho = max(ra, rb)
            if rho <= rho_max and (best is None or rho < best[0]):
                best = (rho, bkey, prev)
        if best is None:
            return None
        rho, base_key, fact = best
        n_outer = self._outer_passes(fact, base_key, float(a0), float(b0),
                                     rho)
        if n_outer is None:
            return None
        # Startup keys run once, so ANY pass count beats a factor build;
        # run-path keys (CFL dt changes) pay n_outer extra solves on every
        # step of their span — bridge only cheap transitions, refactorize
        # for the rest (the LRU factor cache then amortizes recurring
        # quantized dt levels). NOTE: step() increments _iteration BEFORE
        # resolving, so "in startup" here is _iteration < steps (the last
        # startup step resolves at _iteration == steps - 1).
        in_startup = self._iteration < self.steps
        if not in_startup and n_outer > int(config.get(
                'linear algebra', 'outer_max_run', fallback='6')):
            return None
        return base_key, fact, n_outer

    # Outer curves are probed at the bucket ceiling of the measured rho and
    # shared by any pair at-or-below it (a smaller rho contracts faster, so
    # the bucket's pass count is conservative).
    _OUTER_BUCKETS = (0.05, 0.1, 0.2, 0.35, 0.55, 0.7)

    def _outer_passes(self, fact, base_key, a0, b0, rho):
        """Measured outer-refinement pass count for solving a0 M + b0 L
        with `fact` (built for base_key): fewest passes reaching the solve
        target, with the same plateau/knee logic as the inner refinement
        probe. None when the measured floor misses the acceptance level
        (spectra where the contraction bound fails), which falls back to a
        dedicated factorization."""
        from ..utils.config import config
        target = float(config.get('linear algebra', 'solve_target',
                                  fallback='1e-15'))
        bucket = next((bk for bk in self._OUTER_BUCKETS if bk >= rho), None)
        if bucket is None:
            return None
        ckey = (base_key, bucket)
        curve = self._outer_curves.get(ckey)
        if curve is None:
            try:
                curve = self._probe_outer_curve(fact, a0, b0)
            except Exception:
                import logging
                logging.getLogger(__name__).info(
                    "banded: outer-refinement probe failed", exc_info=True)
                return None
            self._outer_curves[ckey] = curve
        curve = np.asarray(curve)
        floor = float(curve.min())
        inner = getattr(fact.banded, 'refine_curve', None)
        inner_floor = float(np.min(inner)) if inner is not None else 1e-10
        if floor > max(target, 20.0 * inner_floor, 1e-11):
            return None
        thresh = max(target, 2.0 * floor)
        hit = np.nonzero(curve <= thresh)[0]
        if hit.size == 0:
            return None
        refs = int(hit[0])
        while (refs + 1 < curve.shape[0] and curve[refs] > target
               and curve[refs + 1] < curve[refs] / 1.3):
            refs += 1
        # curve[k] is the residual after k total solves; the compiled step
        # already performs the initial solve, so k solves = k-1 OUTER passes.
        return max(0, refs - 1)

    def _probe_outer_curve(self, fact, a0, b0, cap=48):
        """Relative residual after k outer passes on a seeded random RHS
        (curve[k] = |R - A x_k| / |R|, x_0 = 0, A = a0 M + b0 L applied in
        exact banded f64 form). One small jitted pass function (the large
        operator stacks enter as runtime arguments, not baked constants);
        the host loop fetches one scalar per pass and stops early on
        stagnation."""
        bb = fact.banded
        bM, bL = self._banded_ml()
        applyM, applyL = bM.apply_fn(), bL.apply_fn()
        solve = bb.solve_fn()
        rv = self.pencil.row_valid_dev
        sarrs = bb.solve_arrays()

        @jax.jit
        def _pass(a0v, b0v, R, X, rvv, Ma, La, Sa):
            AX = (a0v * applyM(Ma, X) + b0v * applyL(La, X)) * rvv
            res = R - AX
            return X + solve(Sa, res), jnp.linalg.norm(res)

        G, P = bM.G, bM.P
        rng = np.random.default_rng(11)
        R = jnp.asarray(rng.standard_normal((G, P))) * rv
        X = jnp.zeros_like(R)
        a0v = jnp.asarray(a0)
        b0v = jnp.asarray(b0)
        norms = []
        for _ in range(cap + 1):
            X, rn = _pass(a0v, b0v, R, X, rv, bM.arrs, bL.arrs, sarrs)
            rn = float(rn)
            norms.append(rn)
            if len(norms) >= 4 and norms[-1] > 0.8 * norms[-3]:
                break  # stagnated: two passes bought < 1.25x total
            if rn <= 1e-17 * norms[0]:
                break
        curve = np.asarray(norms) / max(norms[0], 1e-300)
        import logging
        logging.getLogger(__name__).info(
            "banded: outer-refinement curve (a0=%g b0=%g vs %s): %s",
            a0, b0, getattr(fact, 'lhs_coeffs', None),
            np.array2string(curve, precision=1, separator=','))
        return curve

    def _prepare(self, a0, b0):
        """Resolve the factorization BEFORE compiling, falling back from the
        poly matsolver to inverse_refined when the problem has no separable
        structure (curvilinear m-dependent stacks, tiny group counts)."""
        solver = self.solver
        if self.pencil.matrices.get('M') is None and solver.matsolver not in ('banded', 'poly'):
            import logging
            new = 'banded' if self.pencil.banded_plan() is not None else 'poly'
            logging.getLogger(__name__).info(
                "pencil stacks too large for dense matsolver '%s'; using %s",
                solver.matsolver, new)
            solver.matsolver = new
        while True:
            try:
                fact = None
                key = (float(a0), float(b0))
                if (solver.matsolver == 'banded'
                        and key not in self._factorized):
                    self._banded_ml()
                    reuse = self._outer_reuse(float(a0), float(b0))
                    if reuse is not None:
                        base_key, fact, n_outer = reuse
                        self._outer_for_key[key] = int(n_outer)
                        # Touch the anchor's LRU position so it survives
                        self._factorized[base_key] = \
                            self._factorized.pop(base_key)
                        import logging
                        logging.getLogger(__name__).info(
                            "banded: serving LHS (a0=%g, b0=%g) from the "
                            "(a0=%g, b0=%g) factorization with %d outer "
                            "refinement passes", a0, b0, *base_key, n_outer)
                if fact is None:
                    fact = self._get_factorized(a0, b0)
                    if solver.matsolver == 'banded':
                        # The key now owns a factorization: no outer passes
                        self._outer_for_key[key] = 0
                if solver.matsolver == 'banded':
                    self._banded_ml()
                    # Align refinement counts upward to the pre-resolved
                    # main factorization's count (see run_steps): program
                    # sharing requires equal baked counts, and extra passes
                    # past the floor are idle-but-correct.
                    floor = getattr(self, '_banded_refs_floor', None)
                    bb = getattr(fact, 'banded', None)
                    if (floor and bb is not None and bb.refinements
                            and bb.refinements < floor):
                        bb.refinements = floor
                    self._current_fact = fact
                if solver.matsolver == 'poly':
                    self._poly_ml()
                    refs = fact.refinements
                    if refs > getattr(self, '_poly_refinements', 0):
                        self._poly_refinements = refs
                        self._compiled = None
                        self._scan_cache = {}
                    # The compiled step bakes this factorization's bad-group
                    # indices as static constants; a new (a0,b0) key with a
                    # different bad pattern must trigger recompilation.
                    cur_bad = _poly_bad_key(fact)
                    if getattr(self, '_poly_baked_bad', cur_bad) != cur_bad:
                        self._compiled = None
                        self._scan_cache = {}
                    self._current_fact = fact
                return fact
            except ValueError as exc:
                if solver.matsolver == 'banded':
                    import logging
                    logging.getLogger(__name__).warning(
                        "banded matsolver unavailable (%s); using poly", exc)
                    solver.matsolver = 'poly'
                    self._factorized.clear()
                    self._compiled = None
                    self._scan_cache = {}
                    continue
                if solver.matsolver == 'poly':
                    import logging
                    logging.getLogger(__name__).warning(
                        "poly matsolver unavailable (%s); using inverse_refined", exc)
                    solver.matsolver = 'inverse_refined'
                    self._factorized.clear()
                    self._compiled = None
                    self._scan_cache = {}
                    continue
                raise

    def _step_mats(self, fact):
        """Arrays handed to the compiled step as ARGUMENTS (pytree), so the
        large stacks are not serialized into the program (the axon remote
        compiler rejects oversized request bodies)."""
        if self.solver.matsolver == 'banded':
            bM, bL = self._banded_ml()
            mats = {'solve': fact.banded.solve_arrays(),
                    'M': bM.arrs, 'L': bL.arrs}
        elif self.solver.matsolver == 'poly':
            pm, pl = self._poly_ml()
            pa, pr = fact.polyA, fact.pre
            if not hasattr(self, '_poly_BML'):
                # M and L share the state GEMM: one fused (P, (qM+qL)P) matrix
                self._poly_BML = jnp.concatenate([pm['Bcat'], pl['Bcat']],
                                                 axis=1)
            mats = {'wM': pm['weights'], 'BML': self._poly_BML, 'CM': pm['Abad'],
                    'BM': pm['Bcat'],
                    'wL': pl['weights'], 'CL': pl['Abad'],
                    'wA': pa['weights'], 'BA': pa['Bcat'], 'CA': pa['Abad'],
                    'wP': pr['weights'], 'BP': pr['Bcat'], 'CP': pr['Abad']}
        else:
            if not hasattr(self, '_fact_args') or self._fact_args is None:
                _, self._fact_args = self._solve_fn_and_args()
            s1, s2 = self._fact_args(fact)
            mats = {'s1': s1, 's2': s2,
                    'M': self.pencil.matrices['M'], 'L': self.pencil.matrices['L']}
        # Group-shard the per-group stacks over the mesh (each device then
        # holds only its groups' factors — the multi-chip memory win)
        return self.solver.dist.device_put_pencils(mats, self.pencil.G)

    def _build_compiled(self, derive_lx=False):
        """derive_lx (poly scans only): instead of applying L explicitly,
        reconstruct L X from the PREVIOUS solve's identity
        a0 M X + b0 L X = RHS (exact to the solve residual), carrying the
        RHS through the scan — this removes the dominant f64 L GEMM from
        every step, leaving only the small mass-matrix apply."""
        solver = self.solver
        pencil = self.pencil
        rv = pencil.row_valid_dev
        matrix_free = (solver.matsolver == 'matrix_free')
        poly = (solver.matsolver == 'poly')
        banded = (solver.matsolver == 'banded')
        derive_lx = bool(derive_lx) and poly
        if banded:
            bM, bL = self._banded_ml()
            applyM, applyL = bM.apply_fn(), bL.apply_fn()
            solve_banded = self._current_fact.banded.solve_fn()
            self._fact_args = None
        elif poly:
            pm, pl = self._poly_ml()
            badM, badL = pm['bad_idx'], pl['bad_idx']
            fact0 = getattr(self, '_current_fact', None) or next(iter(self._factorized.values()))
            badA, badP = fact0.polyA['bad_idx'], fact0.pre['bad_idx']
            self._poly_baked_bad = _poly_bad_key(fact0)
            refinements = self._poly_refinements
            self._fact_args = None
        else:
            solve_fn, self._fact_args = self._solve_fn_and_args()
            refinements = getattr(solver, 'refinements', 1)
        sep = ops_solve.separable_apply

        def step_impl(state_flat, t, MXh, LXh, Fh, rhs_prev, a, b, c, n_out,
                      mats):
            if matrix_free:
                # Structured operator applications: many small per-axis
                # matmuls, avoiding XLA's slow dense batched f64 applies
                MX0 = solver.traced_matrix_apply('M', state_flat)
                LX0 = solver.traced_matrix_apply('L', state_flat)
            elif banded:
                X = pencil.gather_state(state_flat)
                MX0 = applyM(mats['M'], X)
                LX0 = applyL(mats['L'], X)
            elif derive_lx:
                X = pencil.gather_state(state_flat)
                MX0 = ops_solve.separable_apply(
                    X, mats['wM'], mats['BM'], badM, mats['CM'])
                LX0 = (rhs_prev - a[0] * MX0) / b[0]
            elif poly:
                X = pencil.gather_state(state_flat)
                MX0, LX0 = ops_solve.separable_apply_pair(
                    X, mats['BML'], mats['wM'], badM, mats['CM'],
                    mats['wL'], badL, mats['CL'])
            else:
                X = pencil.gather_state(state_flat)
                MX0 = ops_solve.batched_matvec(mats['M'], X)
                LX0 = ops_solve.batched_matvec(mats['L'], X)
            F0 = solver.traced_F(state_flat, t)
            # Push new entries (index 0 most recent); keep histories
            # group-sharded so the scan carry sharding is stable
            cp = solver.dist.constrain_pencils
            MXh = cp(jnp.concatenate([MX0[None], MXh[:-1]]), g_dim=1)
            LXh = cp(jnp.concatenate([LX0[None], LXh[:-1]]), g_dim=1)
            Fh = cp(jnp.concatenate([F0[None], Fh[:-1]]), g_dim=1)
            # RHS = sum_j c[j+1] F(n-j) - a[j+1] M X(n-j) - b[j+1] L X(n-j)
            RHS = (jnp.einsum('j,jgr->gr', c[1:], Fh)
                   - jnp.einsum('j,jgr->gr', a[1:], MXh)
                   - jnp.einsum('j,jgr->gr', b[1:], LXh))
            RHS = RHS * rv
            if banded:
                Xnew = solve_banded(mats['solve'], RHS)

                # Outer refinement against the TRUE step matrix
                # a[0] M + b[0] L when the factorization was built for
                # nearby coefficients (startup steps, CFL dt changes —
                # see _outer_reuse). n_out is a runtime scalar: exact-key
                # steps run trip count 0 and the loop body is skipped, so
                # the hot path is unchanged while ONE compiled program
                # serves both cases.
                def _outer_body(_, Xc):
                    AX = (a[0] * applyM(mats['M'], Xc)
                          + b[0] * applyL(mats['L'], Xc)) * rv
                    return Xc + solve_banded(mats['solve'], RHS - AX)

                Xnew = jax.lax.fori_loop(0, n_out, _outer_body, Xnew)
            elif poly:
                # Chebyshev-interpolated inverse preconditioner + f64
                # refinement with the exact separable A: all GEMMs, no
                # batched GEMV anywhere in the solve.
                def pre(V):
                    return sep(V, mats['wP'], mats['BP'], badP, mats['CP'])
                Xnew = pre(RHS)
                for _ in range(refinements):
                    AX = sep(Xnew, mats['wA'], mats['BA'], badA, mats['CA'])
                    Xnew = Xnew + pre(RHS - AX)
            elif matrix_free:
                # f32 inverse apply + f64 matrix-free iterative refinement
                def inv32(V):
                    return ops_solve.batched_matvec(
                        mats['s1'], V.astype(jnp.float32)).astype(V.dtype)
                Xnew = inv32(RHS)
                for _ in range(refinements):
                    sX = pencil.scatter_state(Xnew).astype(state_flat.dtype)
                    AX = (a[0] * solver.traced_matrix_apply('M', sX)
                          + b[0] * solver.traced_matrix_apply('L', sX)) * rv
                    # Identity pivots: invalid entries of Xnew must pass through
                    AX = AX + Xnew * (1.0 - rv)
                    Xnew = Xnew + inv32(RHS - AX)
            else:
                Xnew = solve_fn(mats['s1'], mats['s2'], RHS)
            # Structured scatter when the index map is affine in the group
            # (box problems): the generic .at[].add lowers to a ~314 ms
            # full-operand scatter at 2048x512 vs ~0.2 ms for the windowed
            # form (measured; see subsystems._build_gs_plan).
            out = pencil.scatter_state(Xnew).astype(state_flat.dtype)
            return out, MXh, LXh, Fh, RHS

        return step_impl

    def step(self, dt, wall_time=0.0):
        """One step at dt (any dt history): routes through the SAME compiled
        dynamic-length run program as run_steps with a trip count of 1, so a
        whole simulation — startup steps, CFL-adaptive chunks, fixed-dt scans
        — costs exactly ONE large (remote) compilation."""
        solver = self.solver
        # Cycle timestep history and compute scheme coefficients (host)
        self.dt_hist.appendleft(dt)
        a, b, c = self.compute_coefficients(list(self.dt_hist), self._iteration)
        self._iteration += 1
        n = self.steps + 1
        a, b, c = _pad(a, n), _pad(b, n), _pad(c, n)
        fact = self._prepare(a[0], b[0])
        # Run scheduled analysis handlers (host-side, eager) before stepping
        if getattr(solver, 'evaluator', None) is not None and solver.evaluator.handlers:
            solver.evaluator.evaluate_scheduled(
                iteration=solver.iteration, wall_time=wall_time,
                sim_time=solver.sim_time, timestep=dt)
        self._run_compiled(a, b, c, dt, 1, fact)

    @property
    def needs_startup(self):
        """Whether the next step still uses reduced-order startup coefficients."""
        return self._iteration < self.steps - 1

    def run_steps(self, dt, n_steps, wall_time=0.0):
        """
        Advance n_steps at fixed dt as ONE compiled lax.scan — no host
        round-trips between steps (the TPU-native main loop; parity with the
        reference's solver.step loop at far lower dispatch cost).
        """
        solver = self.solver
        pencil = self.pencil

        # The scan applies uniform-dt coefficients to the stored MX/LX/F
        # history, so it is only valid once that history was itself built at
        # this dt. Take individual steps through startup AND through any
        # residual history built at a different dt (e.g. step(dt1) then
        # run_steps(dt2)).
        def _hist_uniform():
            live = min(self._iteration, self.steps)
            return all(abs(h - dt) <= 1e-14 * abs(dt)
                       for h in list(self.dt_hist)[:live])

        if (solver.matsolver == 'banded' and self.needs_startup
                and n_steps > self.steps):
            # Pre-resolve the MAIN scheme's factorization before any startup
            # step: its adaptive refinement count becomes the FLOOR for the
            # startup factorization (set in _prepare), so both bake the same
            # count and — when the rest of their structural program_key
            # matches — share ONE compiled run program instead of paying a
            # second large remote compile for one startup step. Extra passes
            # past a better-conditioned startup matrix's floor are
            # idle-but-correct, and startup runs once.
            am, bm, _ = self.compute_coefficients([dt] * self.steps,
                                                  self.steps)
            mf = self._prepare(float(am[0]), float(bm[0]))
            mb = getattr(mf, 'banded', None)
            if mb is not None and mb.refinements:
                self._banded_refs_floor = mb.refinements
        while n_steps > 0 and (self.needs_startup or not _hist_uniform()):
            self.step(dt, wall_time)
            solver.iteration += 1
            n_steps -= 1
        if n_steps <= 0:
            return
        self.dt_hist = deque([dt] * self.steps, maxlen=self.steps)
        a, b, c = self.compute_coefficients([dt] * self.steps, self._iteration)
        self._iteration += n_steps
        n = self.steps + 1
        a, b, c = _pad(a, n), _pad(b, n), _pad(c, n)
        fact = self._prepare(float(a[0]), float(b[0]))
        self._run_compiled(a, b, c, dt, n_steps, fact)
        solver.iteration += n_steps

    def _run_compiled(self, a, b, c, dt, n_steps, fact):
        """Advance n_steps applying the SAME (a, b, c) each step, through ONE
        compiled dynamic-trip-count program: the trip count is a lax.fori_loop
        argument, so startup steps, handler-chunked runs, and bench scans of
        any length all share a single (expensive, remote) compilation."""
        solver = self.solver
        pencil = self.pencil
        if not hasattr(self, '_scan_cache'):
            self._scan_cache = {}
        state_flat = solver.state_flat()
        t0 = jnp.asarray(solver.sim_time)
        derive = (solver.matsolver == 'poly')
        mats = self._step_mats(fact)
        n_outer = int(self._outer_for_key.get(
            (float(a[0]), float(b[0])), 0)) \
            if solver.matsolver == 'banded' else 0
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        c = jnp.asarray(c)
        if derive:
            # Seed the carried RHS with a0 M x + b0 L x of the incoming
            # state (one eager pair apply), so the first iteration's
            # derived L X is exact
            pm, pl = self._poly_ml()
            X0 = pencil.gather_state(state_flat)
            MX0i, LX0i = ops_solve.separable_apply_pair(
                X0, mats['BML'], mats['wM'], pm['bad_idx'], mats['CM'],
                mats['wL'], pl['bad_idx'], mats['CL'])
            rhs0 = float(a[0]) * MX0i + float(b[0]) * LX0i
        else:
            rhs0 = jnp.zeros_like(self.MX[0])
        args = (state_flat, t0, self.MX, self.LX, self.F, rhs0, a, b, c,
                jnp.asarray(dt), jnp.asarray(n_steps, dtype=jnp.int32),
                jnp.asarray(n_outer, dtype=jnp.int32), mats)
        # The banded solve function carries per-factorization structure
        # (refinement count, bad groups, sweep mode) in its closure; programs
        # are keyed by that STRUCTURE (program_key), so factorizations that
        # lower to identical HLO — e.g. the startup and main (a0, b0) keys of
        # a fixed-dt run — share one compiled program instead of paying a
        # large remote compile each. All other matsolvers share ONE program.
        if solver.matsolver == 'banded':
            key = ('run', fact.banded.program_key())
        else:
            key = 'run'
        if key not in self._scan_cache:
            step_impl = self._build_compiled(derive_lx=derive)

            def run(state, t0, MXh, LXh, Fh, rhs0, av, bv, cv, dtv, nv,
                    nouter, mats):
                def body(_, carry):
                    st, t, MXc, LXc, Fc, rhs = carry
                    st, MXc, LXc, Fc, rhs = step_impl(st, t, MXc, LXc, Fc,
                                                      rhs, av, bv, cv,
                                                      nouter, mats)
                    return (st, t + dtv, MXc, LXc, Fc, rhs)
                return jax.lax.fori_loop(
                    0, nv, body, (state, t0, MXh, LXh, Fh, rhs0))

            conv, consts = _hoist_closure_constants(run, args)
            self._scan_cache[key] = (jax.jit(conv), consts)
        fn, consts = self._scan_cache[key]
        self._last_run_args = args
        state, t, self.MX, self.LX, self.F, _rhs = fn(*args, *consts)
        pencil.unflatten_fields(state, solver.state)
        solver.sim_time = solver.sim_time + dt * n_steps


@add_scheme
class CNAB1(MultistepIMEX):
    """1st-order Crank-Nicolson / Adams-Bashforth [Wang & Ruuth 2008 eq 2.5.3]."""

    steps = 1

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        k0 = timesteps[0]
        a = np.array([1 / k0, -1 / k0])
        b = np.array([1 / 2, 1 / 2])
        c = np.array([0.0, 1.0])
        return a, b, c


@add_scheme
class SBDF1(MultistepIMEX):
    """1st-order semi-implicit BDF (backward Euler / forward Euler)
    [Wang & Ruuth 2008 eq 2.6]."""

    steps = 1

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        k0 = timesteps[0]
        a = np.array([1 / k0, -1 / k0])
        b = np.array([1.0, 0.0])
        c = np.array([0.0, 1.0])
        return a, b, c


@add_scheme
class CNAB2(MultistepIMEX):
    """2nd-order Crank-Nicolson / Adams-Bashforth [Wang & Ruuth 2008 eq 2.9]."""

    steps = 2

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 1:
            a, b, c = CNAB1.compute_coefficients(timesteps, iteration)
            return _pad(a, 3), _pad(b, 3), _pad(c, 3)
        k1, k0 = timesteps[0], timesteps[1]
        w1 = k1 / k0
        a = np.array([1 / k1, -1 / k1, 0.0])
        b = np.array([1 / 2, 1 / 2, 0.0])
        c = np.array([0.0, 1 + w1 / 2, -w1 / 2])
        return a, b, c


@add_scheme
class MCNAB2(MultistepIMEX):
    """2nd-order modified CNAB [Wang & Ruuth 2008 eq 2.10]."""

    steps = 2

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 1:
            a, b, c = CNAB1.compute_coefficients(timesteps, iteration)
            return _pad(a, 3), _pad(b, 3), _pad(c, 3)
        k1, k0 = timesteps[0], timesteps[1]
        w1 = k1 / k0
        a = np.array([1 / k1, -1 / k1, 0.0])
        b = np.array([(8 + 1 / w1) / 16, (7 - 1 / w1) / 16, 1 / 16])
        c = np.array([0.0, 1 + w1 / 2, -w1 / 2])
        return a, b, c


@add_scheme
class SBDF2(MultistepIMEX):
    """2nd-order semi-implicit BDF [Wang & Ruuth 2008 eq 2.8]."""

    steps = 2

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 1:
            a, b, c = SBDF1.compute_coefficients(timesteps, iteration)
            return _pad(a, 3), _pad(b, 3), _pad(c, 3)
        k1, k0 = timesteps[0], timesteps[1]
        w1 = k1 / k0
        a = np.array([(1 + 2 * w1) / (1 + w1) / k1,
                      -(1 + w1) / k1,
                      w1**2 / (1 + w1) / k1])
        b = np.array([1.0, 0.0, 0.0])
        c = np.array([0.0, 1 + w1, -w1])
        return a, b, c


@add_scheme
class CNLF2(MultistepIMEX):
    """2nd-order Crank-Nicolson leap-frog [Wang & Ruuth 2008 eq 2.11]."""

    steps = 2

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 1:
            a, b, c = CNAB1.compute_coefficients(timesteps, iteration)
            return _pad(a, 3), _pad(b, 3), _pad(c, 3)
        k1, k0 = timesteps[0], timesteps[1]
        w1 = k1 / k0
        a = np.array([1 / (1 + w1) / k1, (w1 - 1) / k1, -w1**2 / (1 + w1) / k1])
        b = np.array([1 / (2 * w1), (1 - 1 / w1) / 2, 1 / 2])
        c = np.array([0.0, 1.0, 0.0])
        return a, b, c


@add_scheme
class SBDF3(MultistepIMEX):
    """3rd-order semi-implicit BDF [Wang & Ruuth 2008 eq 2.14]."""

    steps = 3

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 2:
            a, b, c = SBDF2.compute_coefficients(timesteps, iteration)
            return _pad(a, 4), _pad(b, 4), _pad(c, 4)
        k2, k1, k0 = timesteps[0], timesteps[1], timesteps[2]
        w2 = k2 / k1
        w1 = k1 / k0
        a = np.array([
            (1 + w2 / (1 + w2) + w1 * w2 / (1 + w1 * (1 + w2))) / k2,
            (-1 - w2 - w1 * w2 * (1 + w2) / (1 + w1)) / k2,
            w2**2 * (w1 + 1 / (1 + w2)) / k2,
            -w1**3 * w2**2 * (1 + w2) / (1 + w1) / (1 + w1 + w1 * w2) / k2])
        b = np.array([1.0, 0.0, 0.0, 0.0])
        c = np.array([
            0.0,
            (1 + w2) * (1 + w1 * (1 + w2)) / (1 + w1),
            -w2 * (1 + w1 * (1 + w2)),
            w1 * w1 * w2 * (1 + w2) / (1 + w1)])
        return a, b, c


@add_scheme
class SBDF4(MultistepIMEX):
    """4th-order semi-implicit BDF [Wang & Ruuth 2008 eq 2.15]."""

    steps = 4

    @classmethod
    def compute_coefficients(cls, timesteps, iteration):
        if iteration < 3:
            a, b, c = SBDF3.compute_coefficients(timesteps, iteration)
            return _pad(a, 5), _pad(b, 5), _pad(c, 5)
        k3, k2, k1, k0 = timesteps[0], timesteps[1], timesteps[2], timesteps[3]
        w3 = k3 / k2
        w2 = k2 / k1
        w1 = k1 / k0
        A1 = 1 + w1 * (1 + w2)
        A2 = 1 + w2 * (1 + w3)
        A3 = 1 + w1 * A2
        a = np.array([
            (1 + w3 / (1 + w3) + w2 * w3 / A2 + w1 * w2 * w3 / A3) / k3,
            (-1 - w3 * (1 + w2 * (1 + w3) / (1 + w2) * (1 + w1 * A2 / A1))) / k3,
            w3 * (w3 / (1 + w3) + w2 * w3 * (A3 + w1) / (1 + w1)) / k3,
            -w2**3 * w3**2 * (1 + w3) / (1 + w2) * A3 / A2 / k3,
            (1 + w3) / (1 + w1) * A2 / A1 * w1**4 * w2**3 * w3**2 / A3 / k3])
        b = np.array([1.0, 0.0, 0.0, 0.0, 0.0])
        c = np.array([
            0.0,
            w2 * (1 + w3) / (1 + w2) * ((1 + w3) * (A3 + w1) + (1 + w1) / w2) / A1,
            -A2 * A3 * w3 / (1 + w1),
            w2**2 * w3 * (1 + w3) / (1 + w2) * A3,
            -w1**3 * w2**2 * w3 * (1 + w3) / (1 + w1) * A2 / A1])
        return a, b, c


def _pad(x, n):
    out = np.zeros(n)
    out[:len(x)] = x
    return out


class RungeKuttaIMEX(TimestepperBase):
    """
    DIRK + ERK IMEX Runge-Kutta schemes (parity: timesteppers.py:498-644).
    Stages: (M + k H_ii L) X(n,i) = M X(n,0) + k sum_j (A_ij F(n,j) - H_ij L X(n,j)).
    """

    steps = 1

    def __init__(self, solver):
        super().__init__(solver)
        self._stage_factors = {}
        self._compiled = None

    def _get_stage_factor(self, kHii):
        key = float(kHii)
        if key not in self._stage_factors:
            A = self.pencil.combined_with_pivots({'M': 1.0, 'L': kHii})
            self._stage_factors[key] = ops_solve.FactorizedStack(A, method=self.solver.matsolver)
        return self._stage_factors[key]

    def _build_compiled(self):
        solver = self.solver
        pencil = self.pencil
        rv = pencil.row_valid_dev
        A, H, c = self.A, self.H, self.c
        stages = self.stages
        solve_fn, self._fact_args = self._solve_fn_and_args()

        def step_impl(state_flat, t0, k, stage_s1, stage_s2, Mmat, Lmat):
            X = pencil.gather_state(state_flat)
            MX0 = ops_solve.batched_matvec(Mmat, X)
            LX = [ops_solve.batched_matvec(Lmat, X)]
            F = []
            state = state_flat
            for i in range(1, stages + 1):
                if i > 1:
                    Xi = pencil.gather_state(state)
                    LX.append(ops_solve.batched_matvec(Lmat, Xi))
                F.append(solver.traced_F(state, t0 + k * c[i - 1]))
                RHS = MX0
                for j in range(i):
                    RHS = RHS + (k * A[i, j]) * F[j] - (k * H[i, j]) * LX[j]
                RHS = RHS * rv
                Xnew = solve_fn(stage_s1[i - 1], stage_s2[i - 1], RHS)
                state = pencil.scatter_state(Xnew).astype(state_flat.dtype)
            return state

        return step_impl

    @property
    def needs_startup(self):
        return False

    def _stage_stacks(self, k):
        if not hasattr(self, '_stage_stack_cache'):
            self._stage_stack_cache = {}
        if k not in self._stage_stack_cache:
            facts = [self._get_stage_factor(k * self.H[i, i])
                     for i in range(1, self.stages + 1)]
            if not hasattr(self, '_fact_args'):
                _, self._fact_args = self._solve_fn_and_args()
            s1 = jnp.stack([self._fact_args(f)[0] for f in facts])
            s2 = jnp.stack([self._fact_args(f)[1] for f in facts])
            self._stage_stack_cache[k] = self.solver.dist.device_put_pencils(
                (s1, s2), self.pencil.G, g_dim=1)
        return self._stage_stack_cache[k]

    def _run_compiled(self, k, n_steps):
        """Advance n_steps at fixed dt through ONE compiled dynamic-trip-count
        program (shared by step() and run_steps of any length)."""
        solver = self.solver
        pencil = self.pencil
        s1, s2 = self._stage_stacks(k)
        if not hasattr(self, '_scan_cache'):
            self._scan_cache = {}
        state_flat = solver.state_flat()
        t0 = jnp.asarray(solver.sim_time)
        ML = solver.dist.device_put_pencils(
            (pencil.matrices['M'], pencil.matrices['L']), pencil.G)
        args = (state_flat, t0, s1, s2, jnp.asarray(k),
                jnp.asarray(n_steps, dtype=jnp.int32), *ML)
        if 'run' not in self._scan_cache:
            step_impl = self._build_compiled()

            def run(state, t0, sa, sb, dtv, nv, Mm, Lm):
                def body(_, carry):
                    st, t = carry
                    st = step_impl(st, t, dtv, sa, sb, Mm, Lm)
                    return (st, t + dtv)
                return jax.lax.fori_loop(0, nv, body, (state, t0))

            conv, consts = _hoist_closure_constants(run, args)
            self._scan_cache['run'] = (jax.jit(conv), consts)
        fn, consts = self._scan_cache['run']
        self._last_run_args = args
        state, t = fn(*args, *consts)
        pencil.unflatten_fields(state, solver.state)
        solver.sim_time = solver.sim_time + k * n_steps

    def run_steps(self, dt, n_steps, wall_time=0.0):
        """Advance n_steps at fixed dt as one compiled loop."""
        self._run_compiled(float(dt), int(n_steps))
        self.solver.iteration += n_steps

    def step(self, dt, wall_time=0.0):
        solver = self.solver
        if getattr(solver, 'evaluator', None) is not None and solver.evaluator.handlers:
            solver.evaluator.evaluate_scheduled(
                iteration=solver.iteration, wall_time=wall_time,
                sim_time=solver.sim_time, timestep=dt)
        self._run_compiled(float(dt), 1)


@add_scheme
class RK111(RungeKuttaIMEX):
    """1st-order 1-stage DIRK+ERK [Ascher, Ruuth & Spiteri 1997 sec 2.1]."""

    stages = 1
    c = np.array([0, 1])
    A = np.array([[0, 0], [1, 0]], dtype=float)
    H = np.array([[0, 0], [0, 1]], dtype=float)


@add_scheme
class RK222(RungeKuttaIMEX):
    """2nd-order 2-stage DIRK+ERK [Ascher, Ruuth & Spiteri 1997 sec 2.6]."""

    stages = 2
    _g = (2 - np.sqrt(2)) / 2
    _d = 1 - 1 / _g / 2
    c = np.array([0, _g, 1])
    A = np.array([[0, 0, 0],
                  [_g, 0, 0],
                  [_d, 1 - _d, 0]])
    H = np.array([[0, 0, 0],
                  [0, _g, 0],
                  [0, 1 - _g, _g]])


@add_scheme
class RK443(RungeKuttaIMEX):
    """3rd-order 4-stage DIRK+ERK [Ascher, Ruuth & Spiteri 1997 sec 2.8]."""

    stages = 4
    c = np.array([0, 1/2, 2/3, 1/2, 1])
    A = np.array([[0, 0, 0, 0, 0],
                  [1/2, 0, 0, 0, 0],
                  [11/18, 1/18, 0, 0, 0],
                  [5/6, -5/6, 1/2, 0, 0],
                  [1/4, 7/4, 3/4, -7/4, 0]])
    H = np.array([[0, 0, 0, 0, 0],
                  [0, 1/2, 0, 0, 0],
                  [0, 1/6, 1/2, 0, 0],
                  [0, -1/2, 1/2, 1/2, 0],
                  [0, 3/2, -3/2, 1/2, 1/2]])


@add_scheme
class RKSMR(RungeKuttaIMEX):
    """(3-eps)-order 3-stage scheme [Spalart, Moser & Rogers 1991 appendix]."""

    stages = 3
    _a1, _a2, _a3 = 29/96, -3/40, 1/6
    _b1, _b2, _b3 = 37/160, 5/24, 1/6
    _g1, _g2, _g3 = 8/15, 5/12, 3/4
    _z2, _z3 = -17/60, -5/12
    c = np.array([0, 8/15, 2/3, 1])
    A = np.array([[0, 0, 0, 0],
                  [_g1, 0, 0, 0],
                  [_g1 + _z2, _g2, 0, 0],
                  [_g1 + _z2, _g2 + _z3, _g3, 0]])
    H = np.array([[0, 0, 0, 0],
                  [_a1, _b1, 0, 0],
                  [_a1, _b1 + _a2, _b2, 0],
                  [_a1, _b1 + _a2, _b2 + _a3, _b3]])


@add_scheme
class RKGFY(RungeKuttaIMEX):
    """2nd-order 2-stage scheme (Hollerbach & Marti 'GFY')."""

    stages = 2
    c = np.array([0, 1, 1])
    A = np.array([[0, 0, 0],
                  [1, 0, 0],
                  [0.5, 0.5, 0]])
    H = np.array([[0, 0, 0],
                  [0.5, 0.5, 0],
                  [0.5, 0, 0.5]])
