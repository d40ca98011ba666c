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
    Advective CFL timestep controller (parity: flow_tools.py:139).

    Computes per-point crossing frequencies |u_i| / dx_i on the grid, reduces
    to a max frequency, and adjusts dt within safety/threshold/change bounds.
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
        self.velocities = []
        self.frequency_tasks = []
        self.stored_dt = initial_dt
        self.reducer = GlobalArrayReducer()

    def add_velocity(self, velocity):
        """Register a velocity vector field for advective frequencies
        (parity: flow_tools.py:220 -> AdvectiveCFL operator)."""
        self.velocities.append(velocity)

    def add_frequency(self, freq):
        """Register an additional frequency expression (grid field)."""
        self.frequency_tasks.append(freq)

    def _max_frequency(self):
        fmax = 0.0
        for vel in self.velocities:
            vfield = vel.evaluate() if isinstance(vel, Future) else vel
            vfield.change_scales(vfield.domain.dealias)
            vfield.require_grid_space()
            data = np.asarray(vfield.data)
            cs = vfield.tensorsig[0]
            for i, coord in enumerate(cs.coords):
                axis = coord.axis
                basis = vfield.domain.bases[axis]
                if basis is None:
                    continue
                dx = np.asarray(basis.grid_spacing(vfield.scales[axis]))
                shape = [1] * (data.ndim - 1)
                shape[axis] = dx.size
                freq = np.abs(data[i]) / dx.reshape(shape)
                fmax = max(fmax, freq.max())
        for task in self.frequency_tasks:
            f = task.evaluate() if isinstance(task, Future) else task
            f.change_scales(f.domain.dealias)
            f.require_grid_space()
            fmax = max(fmax, float(np.abs(np.asarray(f.data)).max()))
        return fmax

    def compute_timestep(self):
        """New timestep (parity: flow_tools.py:191 compute_timestep)."""
        iteration = self.solver.iteration
        if iteration % self.cadence == 0 and iteration >= self.solver.initial_iteration + 1:
            fmax = self._max_frequency()
            if fmax > 0:
                dt_target = self.safety / fmax
            else:
                dt_target = np.inf
            dt = self.stored_dt
            # Threshold: only change when fractional difference is significant
            if self.threshold:
                if abs(dt_target - dt) / dt > self.threshold:
                    new_dt = dt_target
                else:
                    new_dt = dt
            else:
                new_dt = dt_target
            # Bound the change and the absolute step
            new_dt = min(new_dt, self.max_change * dt)
            new_dt = max(new_dt, self.min_change * dt)
            new_dt = min(new_dt, self.max_dt)
            new_dt = max(new_dt, self.min_dt)
            self.stored_dt = new_dt
        return self.stored_dt
