"""Cross-cutting tools: progress logging, operator-tree rendering,
quick domains (parity: reference tools/progress.py, tools/plot_op.py,
extras/quick_domains.py)."""

import logging

import numpy as np

import dedalus_tpu.public as d3
from dedalus_tpu.utils.progress import log_progress
from dedalus_tpu.utils.plot_op import tree_text, plot_operator
from dedalus_tpu.extras import quick_domains as qd


def test_log_progress(caplog):
    with caplog.at_level(logging.INFO):
        out = list(log_progress(range(50), desc="work", interval=0.0))
    assert out == list(range(50))
    assert any("work" in rec.message for rec in caplog.records)


def test_tree_text_and_plot(tmp_path):
    c, dist, xb = qd.chebyshev(16)
    u = dist.Field(name='u', bases=xb)
    expr = d3.Differentiate(u, c) + 3 * u
    txt = tree_text(expr)
    assert 'u' in txt and 'Add' in txt
    path = plot_operator(expr, str(tmp_path / "tree"))
    assert path.endswith(('.png', '.txt'))


def test_quick_domains_build():
    for builder in (qd.fourier, qd.chebyshev, qd.fourier_2d, qd.channel_2d,
                    qd.disk, qd.sphere):
        coords, dist, bases = builder(8)
        b0 = bases[0] if isinstance(bases, tuple) else bases
        f = dist.Field(name='f', bases=bases)
        f['g'] = np.ones(np.asarray(f['g']).shape)
        f.require_coeff_space()


def test_quick_channel_solve():
    coords, dist, (xb, yb) = qd.channel_2d(16)
    x, y = dist.local_grids(xb, yb, scales=1)
    u = dist.Field(name='u', bases=(xb, yb))
    t1 = dist.Field(name='t1', bases=xb)
    t2 = dist.Field(name='t2', bases=xb)
    rhs = dist.Field(name='rhs', bases=(xb, yb))
    uex = np.sin(x) * (1 - y**2)
    rhs['g'] = -np.sin(x) * (1 - y**2) + np.sin(x) * (-2.0)
    lift = lambda A, n: d3.Lift(A, yb.derivative_basis(2), n)
    problem = d3.LBVP([u, t1, t2], namespace=locals())
    problem.add_equation("lap(u) + lift(t1,-1) + lift(t2,-2) = rhs")
    problem.add_equation("u(y=-1) = 0")
    problem.add_equation("u(y=1) = 0")
    problem.build_solver().solve()
    u.change_scales(1)
    u.require_grid_space()
    assert np.abs(np.asarray(u.data) - uex).max() < 1e-12


def test_deferred_tuple():
    from dedalus_tpu.utils.general import DeferredTuple
    calls = []

    def entry(i):
        calls.append(i)
        return i * i

    t = DeferredTuple(entry, 5)
    assert len(t) == 5
    assert t[2] == 4
    assert t[2] == 4
    assert calls == [2]
    assert t[-1] == 16
    assert list(t) == [0, 1, 4, 9, 16]


def test_multiclass_dispatch():
    from dedalus_tpu.utils.dispatch import MultiClass, SkipDispatchException

    class Op(metaclass=MultiClass):
        pass

    class OpInt(Op):
        @staticmethod
        def _check_args(x):
            return isinstance(x, int)

        def __init__(self, x):
            if x == 0:
                raise SkipDispatchException(output="zero")
            self.x = x

    class OpStr(Op):
        @staticmethod
        def _check_args(x):
            return isinstance(x, str)

        def __init__(self, x):
            self.x = x.upper()

    assert isinstance(Op(3), OpInt)
    assert Op("ab").x == "AB"
    assert Op(0) == "zero"
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        Op(1.5)


def test_array_helpers():
    import numpy as np
    from scipy import sparse
    from dedalus_tpu.utils import array as arr

    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 4))
    X = rng.normal(size=(3, 4, 5))
    got = np.asarray(arr.apply_matrix(A, X, axis=1))
    want = np.einsum('ij,kjl->kil', A, X)
    assert np.abs(got - want).max() < 1e-12
    gs = arr.apply_sparse(sparse.csr_matrix(A), X, axis=1)
    assert np.abs(gs - want).max() < 1e-12

    P = arr.perm_matrix([2, 0, 1])
    v = np.array([10.0, 20.0, 30.0])
    assert np.allclose(P @ v, [20.0, 30.0, 10.0])

    M1 = sparse.csr_matrix(np.array([[1.0, 2.0], [3.0, 4.0]]))
    M2 = sparse.csr_matrix(np.array([[5.0, 6.0], [7.0, 8.0]]))
    I2 = arr.interleave_matrices([M1, M2])
    x = np.array([1.0, 10.0, 2.0, 20.0])  # interleaved (a0, b0, a1, b1)
    y = I2 @ x
    assert np.allclose(y[0::2], M1 @ x[0::2])
    assert np.allclose(y[1::2], M2 @ x[1::2])

    Z = sparse.csr_matrix(np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 2.0]]))
    D, kept = arr.drop_empty_rows(Z)
    assert list(kept) == [0, 2]
    assert D.shape == (2, 2)


def test_scipy_sparse_eigs_shift_invert():
    import numpy as np
    from scipy import sparse
    from dedalus_tpu.utils.array import scipy_sparse_eigs

    n = 40
    main = 2.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    A = sparse.diags([off, main, off], [-1, 0, 1]).tocsc()
    B = sparse.identity(n, format='csc')
    target = 0.05
    evals, evecs = scipy_sparse_eigs(A, B, N=3, target=target)
    exact = 2 - 2 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    got = np.sort(evals.real)
    # shift-invert returns the N eigenvalues CLOSEST to the target
    want = np.sort(exact[np.argsort(np.abs(exact - target))[:3]])
    assert np.abs(got - want).max() < 1e-10


def test_lambdify_functions():
    from dedalus_tpu.utils.parsing import lambdify_functions
    name, fn = lambdify_functions("f(x, y)", "x + 2*y")
    assert name == "f"
    assert fn(1, 2) == 5


def test_parallel_helpers_single_process(tmp_path):
    from dedalus_tpu.utils.parallel import (Sync, RotateProcesses,
                                            parallel_mkdir, ProfileWrapper)
    with Sync():
        pass
    with RotateProcesses():
        pass
    p = parallel_mkdir(tmp_path / "sub" / "dir")
    assert p.is_dir()
    with ProfileWrapper(tmp_path / "prof") as prof:
        sum(range(100))
    assert (tmp_path / "prof.0.prof").exists()
