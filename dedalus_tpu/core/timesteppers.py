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
import jax.numpy as jnp

from ..ops import solve as ops_solve

schemes = {}


def add_scheme(cls):
    schemes[cls.__name__] = cls
    return cls


class TimestepperBase:

    def __init__(self, solver):
        self.solver = solver
        self.pencil = solver.pencil
        self._LHS_params = None
        self._factorized = {}

    def _get_factorized(self, a0, b0):
        key = (float(a0), float(b0))
        if key not in self._factorized:
            A = self.pencil.combined_with_pivots({'M': a0, 'L': b0})
            self._factorized[key] = ops_solve.FactorizedStack(A, method=self.solver.matsolver)
        return self._factorized[key]


class MultistepIMEX(TimestepperBase):
    """
    General variable-step IMEX multistep scheme
    (parity: timesteppers.py:34-188).
    """

    def __init__(self, solver):
        super().__init__(solver)
        shape = (self.pencil.G, self.pencil.R)
        steps = self.steps
        zeros = lambda: jnp.zeros(shape, dtype=solver.dtype)
        self.MX = deque([zeros() for _ in range(steps)], maxlen=steps)
        self.LX = deque([zeros() for _ in range(steps)], maxlen=steps)
        self.F = deque([zeros() for _ in range(steps)], maxlen=steps)
        self.dt_hist = deque([0.0] * steps, maxlen=steps)
        self._iteration = 0

    def step(self, dt, wall_time=0.0):
        solver = self.solver
        pencil = self.pencil
        # Cycle timestep history
        self.dt_hist.appendleft(dt)
        a, b, c = self.compute_coefficients(list(self.dt_hist), self._iteration)
        self._iteration += 1
        # Gather state pencils and apply M, L (batched MXU matmuls)
        X = pencil.gather_state(solver.state_flat())
        MX0 = ops_solve.batched_matvec(pencil.matrices['M'], X)
        LX0 = ops_solve.batched_matvec(pencil.matrices['L'], X)
        self.MX.appendleft(MX0)
        self.LX.appendleft(LX0)
        # Evaluate F(X0) (+ scheduled analysis outputs)
        F0 = solver.evaluate_F(wall_time=wall_time, timestep=dt)
        self.F.appendleft(F0)
        # Build RHS = sum c_j F(n-j) - sum_{j>=1} a_j M X(n-j) - b_j L X(n-j)
        RHS = c[1] * self.F[0]
        for j in range(2, len(c)):
            RHS = RHS + c[j] * self.F[j - 1]
        for j in range(1, len(a)):
            RHS = RHS - a[j] * self.MX[j - 1]
        for j in range(1, len(b)):
            RHS = RHS - b[j] * self.LX[j - 1]
        RHS = RHS * pencil.row_valid_dev
        # Solve (a0 M + b0 L) X = RHS
        fact = self._get_factorized(a[0], b[0])
        Xnew = fact.solve(RHS)
        solver.set_state_pencils(Xnew)
        solver.sim_time = solver.sim_time + dt


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

    def _get_stage_factor(self, kHii):
        key = float(kHii)
        if key not in self._stage_factors:
            A = self.pencil.combined_with_pivots({'M': 1.0, 'L': kHii})
            self._stage_factors[key] = ops_solve.FactorizedStack(A, method=self.solver.matsolver)
        return self._stage_factors[key]

    def step(self, dt, wall_time=0.0):
        solver = self.solver
        pencil = self.pencil
        A, H, c = self.A, self.H, self.c
        k = dt
        sim_time_0 = solver.sim_time
        stages = self.stages
        X = pencil.gather_state(solver.state_flat())
        MX0 = ops_solve.batched_matvec(pencil.matrices['M'], X)
        LX = [ops_solve.batched_matvec(pencil.matrices['L'], X)]
        F = []
        for i in range(1, stages + 1):
            if i > 1:
                Xi = pencil.gather_state(solver.state_flat())
                LX.append(ops_solve.batched_matvec(pencil.matrices['L'], Xi))
            F.append(solver.evaluate_F(wall_time=wall_time, timestep=dt,
                                       schedule=(i == 1)))
            RHS = MX0
            for j in range(i):
                RHS = RHS + (k * A[i, j]) * F[j] - (k * H[i, j]) * LX[j]
            RHS = RHS * pencil.row_valid_dev
            fact = self._get_stage_factor(k * H[i, i])
            Xnew = fact.solve(RHS)
            solver.set_state_pencils(Xnew)
            solver.sim_time = sim_time_0 + k * c[i]


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
