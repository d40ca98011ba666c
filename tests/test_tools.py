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
