"""
Flow analysis tools: global reductions, flow properties, and CFL timestep
control.

Parity target (behavior): dedalus/extras/flow_tools.py:15-234
(GlobalArrayReducer, GlobalFlowProperty, CFL with AdvectiveCFL frequencies).
TPU-first: reductions stay on device (jnp reductions over the handler's
device arrays; only scalars cross to host), and the CFL maximum-frequency
evaluation is a COMPILED function of the flat state — no full-grid
device->host transfer anywhere in the CFL path, and on a mesh the max rides
an XLA collective.
"""

import numpy as np
import jax.numpy as jnp

from ..core.field import Field
from ..core.future import Future


class GlobalArrayReducer:
    """
    Global reductions over distributed data (parity: flow_tools.py:15).
    Device arrays reduce on device (only the scalar is transferred); in
    distributed runs data is replicated per shard and reductions ride XLA
    collectives inside compiled steps.
    """

    def __init__(self, comm=None, dtype=np.float64):
        self.dtype = dtype

    def reduce_scalar(self, value, op=None):
        return float(value)

    def global_min(self, data, empty=np.inf):
        return float(jnp.min(data)) if data.size else empty

    def global_max(self, data, empty=-np.inf):
        return float(jnp.max(data)) if data.size else empty

    def global_mean(self, data):
        return float(jnp.mean(data))


class GlobalFlowProperty:
    """
    Scheduled evaluation of scalar diagnostics over the flow
    (parity: flow_tools.py:64). Usage:
        flow = GlobalFlowProperty(solver, cadence=10)
        flow.add_property(np.sqrt(u@u)/nu, name='Re')
        ... flow.max('Re')
    Reductions run on device over the handler's stored device arrays.
    """

    def __init__(self, solver, cadence=1):
        self.solver = solver
        self.cadence = cadence
        self.reducer = GlobalArrayReducer()
        self.properties = {}
        self.handler = solver.evaluator.add_dictionary_handler(iter=cadence)

    def add_property(self, property, name):
        self.handler.add_task(property, name=name, layout='g')

    def _grid_data(self, name):
        """Device array of the property's grid data (no host transfer)."""
        return self.handler[name].data

    def max(self, name):
        return self.reducer.global_max(self._grid_data(name))

    def min(self, name):
        return self.reducer.global_min(self._grid_data(name))

    def grid_average(self, name):
        return self.reducer.global_mean(self._grid_data(name))

    def volume_integral(self, name):
        field = self.handler[name]
        data = field.data
        weights = 1.0
        for i, basis in enumerate(field.domain.bases):
            if basis is None:
                continue
            scale = field.scales[i]
            w = np.asarray(basis.global_weights(scale))
            shape = [1] * data.ndim
            shape[len(field.tensorsig) + i] = w.size
            weights = weights * w.reshape(shape)
        return float(jnp.sum(data * weights))

    def volume_average(self, name):
        field = self.handler[name]
        vol = 1.0
        for basis in field.domain.bases:
            if basis is not None:
                vol *= basis.bounds[1] - basis.bounds[0]
        return self.volume_integral(name) / vol


class CFL:
    """
    Advective CFL timestep controller (parity: flow_tools.py:139-233).

    Frequencies are evaluated on the solver's dictionary-handler schedule,
    SUMMED per grid point across all registered velocities/frequencies, and
    the timestep is the reciprocal of the maximum total frequency, scaled by
    `safety` and clamped by max/min dt and fractional change. `add_velocity`
    lowers to the per-geometry AdvectiveCFL operator (correct metric on
    disk/annulus/sphere/ball/shell; ref basis.py:6078-6207).
    """

    def __init__(self, solver, initial_dt, cadence=1, safety=1.0, max_dt=np.inf,
                 min_dt=0.0, max_change=np.inf, min_change=0.0, threshold=0.0,
                 quantize=0.0):
        self.solver = solver
        self.initial_dt = initial_dt
        self.cadence = cadence
        self.safety = safety
        self.max_dt = max_dt
        self.min_dt = min_dt
        self.max_change = max_change
        self.min_change = min_change
        self.threshold = threshold
        # quantize (TPU extension, opt-in): ratio r > 1 snaps each timestep
        # DOWN (CFL-safe) onto the geometric grid {r^k}. An adaptive run then
        # visits a BOUNDED set of (a0, b0) keys, so LHS factorizations (and
        # their preconditioner fits — minutes of setup each at production
        # sizes) are reused from the timestepper's LRU cache instead of being
        # rebuilt for every drifting dt value. r = 2**(1/4) costs at most
        # ~16% of the optimal step size.
        if quantize and not quantize > 1.0:
            raise ValueError("quantize must be a ratio > 1 (e.g. 2**0.25)")
        self.quantize = float(quantize) if quantize else 0.0
        if self.quantize and initial_dt > 0 and np.isfinite(initial_dt):
            initial_dt = self._snap(initial_dt)
            self.initial_dt = initial_dt
        self.stored_dt = initial_dt
        self._freq_ops = []
        self._fmax_compiled = None

    def add_velocity(self, velocity):
        """Grid-crossing frequencies of a velocity vector
        (parity: flow_tools.py:220 -> AdvectiveCFL operator)."""
        from ..core.operators import AdvectiveCFL
        if len(velocity.tensorsig) != 1:
            raise ValueError("Velocity must be a vector")
        self.add_frequency(AdvectiveCFL(velocity, velocity.tensorsig[0]))

    def add_frequency(self, freq):
        """Register an additional on-grid frequency expression."""
        self._freq_ops.append(freq)
        self._fmax_compiled = None

    def _get_fmax_fn(self):
        """Compiled (state_flat, t) -> scalar max total frequency: the
        frequency expressions trace into ONE device program ending in a grid
        max (a psum-style collective on a mesh); only the scalar crosses to
        host. Replaces the reference's handler-evaluate + host-side reduce
        (ref flow_tools.py:191-215) without the full-grid transfer."""
        if self._fmax_compiled is None:
            import jax
            from ..core.timesteppers import _hoist_closure_constants
            solver = self.solver
            ops = list(self._freq_ops)

            def fmax(state_flat, t):
                solver.pencil.unflatten_fields(state_flat, solver.state)
                tf = getattr(solver.problem, 'time', None)
                if tf is not None:
                    tf.preset_data(solver.dist.grid_layout,
                                   jnp.reshape(t, (1,) * solver.dist.dim))
                total = None
                for op in ops:
                    f = op.evaluate() if isinstance(op, Future) else op
                    f.change_scales(f.domain.dealias)
                    f.require_grid_space()
                    d = jnp.abs(f.data)
                    total = d if total is None else total + d
                return jnp.max(total)

            args = (solver.state_flat(), jnp.asarray(solver.sim_time))
            conv, consts = _hoist_closure_constants(fmax, args)
            # Tracing binds tracers onto the state Fields; rebind concrete data
            solver.pencil.unflatten_fields(args[0], solver.state)
            self._fmax_compiled = (jax.jit(conv), consts)
        return self._fmax_compiled

    def max_frequency(self):
        """Current global max of the summed frequencies (device scalar)."""
        solver = self.solver
        fn, consts = self._get_fmax_fn()
        state = solver.state_flat()
        out = float(fn(state, jnp.asarray(solver.sim_time), *consts))
        # jit retracing binds tracers onto the state Fields; rebind concrete
        solver.pencil.unflatten_fields(state, solver.state)
        return out

    def compute_timestep(self):
        """New timestep (parity: flow_tools.py:191-215): frequencies are
        summed per grid point BEFORE reciprocating (a multi-term flow crosses
        cells at the sum of its component rates). Evaluated on the CURRENT
        state through the compiled reduction (the reference reads handler
        values one iteration stale; fresh values are strictly safer)."""
        iteration = self.solver.iteration
        if (iteration - 1) % self.cadence == 0:
            if (iteration - 1) <= self.solver.initial_iteration:
                return self.stored_dt
            fmax = self.max_frequency()
            dt = np.inf if fmax == 0.0 else 1.0 / fmax
            dt *= self.safety
            dt = min(dt, self.max_dt, self.max_change * self.stored_dt)
            dt = max(dt, self.min_dt, self.min_change * self.stored_dt)
            if self.quantize and dt > 0 and np.isfinite(dt):
                dt = self._snap(dt)
            if abs(dt - self.stored_dt) > self.threshold * self.stored_dt:
                self.stored_dt = dt
        return self.stored_dt

    def _snap(self, dt):
        """Snap dt DOWN onto the geometric grid {quantize^k} (unit-anchored;
        rounding down keeps the step CFL-safe)."""
        lr = np.log(self.quantize)
        return float(np.exp(lr * np.floor(np.log(dt) / lr + 1e-12)))

    def chunk_steps(self, max_n=None):
        """Number of steps to advance before the next scheduled CFL update
        (bounded by the solver's stop criteria), enabling the chunked main
        loop:  dt = cfl.compute_timestep(); solver.run_steps(dt, cfl.chunk_steps())
        which runs compiled multi-step chunks between dt updates instead of
        one host dispatch per step."""
        solver = self.solver
        it = solver.iteration
        n = (-(it - 1)) % self.cadence or self.cadence
        if np.isfinite(solver.stop_iteration):
            n = min(n, max(1, int(solver.stop_iteration - it)))
        if np.isfinite(solver.stop_sim_time) and self.stored_dt > 0:
            remaining = solver.stop_sim_time - solver.sim_time
            n = min(n, max(1, int(np.ceil(remaining / self.stored_dt - 1e-9))))
        if max_n is not None:
            n = min(n, max_n)
        return max(1, n)
