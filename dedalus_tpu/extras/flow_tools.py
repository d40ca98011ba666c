"""
Flow analysis tools: global reductions, flow properties, and CFL timestep
control.

Parity target (behavior): dedalus/extras/flow_tools.py:15-234
(GlobalArrayReducer, GlobalFlowProperty, CFL with AdvectiveCFL frequencies).
"""

import numpy as np

from ..core.field import Field
from ..core.future import Future


class GlobalArrayReducer:
    """
    Global reductions over distributed data (parity: flow_tools.py:15).
    Serial/JAX arrays reduce directly; in distributed runs data is replicated
    per shard and reductions ride XLA collectives inside compiled steps.
    """

    def __init__(self, comm=None, dtype=np.float64):
        self.dtype = dtype

    def reduce_scalar(self, value, op=None):
        return float(value)

    def global_min(self, data, empty=np.inf):
        data = np.asarray(data)
        return float(data.min()) if data.size else empty

    def global_max(self, data, empty=-np.inf):
        data = np.asarray(data)
        return float(data.max()) if data.size else empty

    def global_mean(self, data):
        return float(np.asarray(data).mean())


class GlobalFlowProperty:
    """
    Scheduled evaluation of scalar diagnostics over the flow
    (parity: flow_tools.py:64). Usage:
        flow = GlobalFlowProperty(solver, cadence=10)
        flow.add_property(np.sqrt(u@u)/nu, name='Re')
        ... flow.max('Re')
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
        field = self.handler[name]
        return np.asarray(field.data)

    def max(self, name):
        return self.reducer.global_max(self._grid_data(name))

    def min(self, name):
        return self.reducer.global_min(self._grid_data(name))

    def grid_average(self, name):
        return self.reducer.global_mean(self._grid_data(name))

    def volume_integral(self, name):
        field = self.handler[name]
        data = np.asarray(field.data)
        weights = 1.0
        for i, basis in enumerate(field.domain.bases):
            if basis is None:
                continue
            scale = field.scales[i]
            w = np.asarray(basis.global_weights(scale))
            shape = [1] * data.ndim
            shape[len(field.tensorsig) + i] = w.size
            weights = weights * w.reshape(shape)
        return float((data * weights).sum())

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
                 min_dt=0.0, max_change=np.inf, min_change=0.0, threshold=0.0):
        self.solver = solver
        self.initial_dt = initial_dt
        self.cadence = cadence
        self.safety = safety
        self.max_dt = max_dt
        self.min_dt = min_dt
        self.max_change = max_change
        self.min_change = min_change
        self.threshold = threshold
        self.stored_dt = initial_dt
        self.reducer = GlobalArrayReducer()
        self.frequencies = solver.evaluator.add_dictionary_handler(iter=cadence)

    def add_velocity(self, velocity):
        """Grid-crossing frequencies of a velocity vector
        (parity: flow_tools.py:220 -> AdvectiveCFL operator)."""
        from ..core.operators import AdvectiveCFL
        if len(velocity.tensorsig) != 1:
            raise ValueError("Velocity must be a vector")
        self.add_frequency(AdvectiveCFL(velocity, velocity.tensorsig[0]))

    def add_frequency(self, freq):
        """Register an additional on-grid frequency expression."""
        self.frequencies.add_task(
            freq, name=f"f{len(self.frequencies.tasks)}", layout='g',
            scales=freq.domain.dealias)

    def compute_timestep(self):
        """New timestep (parity: flow_tools.py:191-215): frequencies are
        summed per grid point BEFORE reciprocating (a multi-term flow crosses
        cells at the sum of its component rates)."""
        iteration = self.solver.iteration
        if (iteration - 1) % self.cadence == 0:
            if (iteration - 1) <= self.solver.initial_iteration:
                return self.stored_dt
            local = 0.0
            for field in self.frequencies.fields.values():
                local = local + np.abs(np.asarray(field.data))
            fmax = self.reducer.global_max(local)
            dt = np.inf if fmax == 0.0 else 1.0 / fmax
            dt *= self.safety
            dt = min(dt, self.max_dt, self.max_change * self.stored_dt)
            dt = max(dt, self.min_dt, self.min_change * self.stored_dt)
            if abs(dt - self.stored_dt) > self.threshold * self.stored_dt:
                self.stored_dt = dt
        return self.stored_dt
