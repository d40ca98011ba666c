"""
Validate the Zernike / SWSH / ladder-operator layer against the reference's
pure-numpy dedalus_sphere modules (used strictly as a numerical ORACLE in
tests; the implementations are independent).
"""

import sys
import numpy as np
import pytest

sys.path.insert(0, '/root/reference/dedalus/libraries')
try:
    from dedalus_sphere import jacobi as ref_jacobi
    from dedalus_sphere import zernike as ref_zernike
    from dedalus_sphere import sphere as ref_sphere
    HAVE_ORACLE = True
except ImportError:
    HAVE_ORACLE = False

from dedalus_tpu.spectral import jacobi, zernike, sphere

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")

LADDERS = [('A', 1), ('A', -1), ('B', 1), ('B', -1),
           ('C', 1), ('C', -1), ('D', 1), ('D', -1)]


@pytest.mark.parametrize("name,sign", LADDERS)
@pytest.mark.parametrize("a,b", [(1.0, 0.5), (2.0, 1.5), (1.5, 2.5)])
def test_ladder_operators_vs_oracle(name, sign, a, b, N=8):
    ref = ref_jacobi.operator(name)(sign)(N, a, b).square.toarray()
    mine = jacobi.operator_matrix(name, sign, N, a, b).toarray()
    assert np.allclose(mine, ref, atol=1e-12), f"{name}({sign}) mismatch"


@pytest.mark.parametrize("dim,k,l", [(2, 0, 0), (2, 0, 3), (3, 0, 2), (3, 1, 1), (3, 0, 5)])
def test_zernike_polynomials_vs_oracle(dim, k, l, n=6):
    z, w = zernike.quadrature(dim, n + 2, k=k)
    zr, wr = ref_zernike.quadrature(dim, n + 2, k=k)
    assert np.allclose(z, zr) and np.allclose(w, wr)
    Q = zernike.polynomials(dim, n, k, l, z)
    Qr = ref_zernike.polynomials(dim, n, k, l, np.asarray(z, dtype=np.longdouble))
    assert np.allclose(Q, Qr.astype(float), atol=1e-12)
    # Orthonormality
    G = (Q * w) @ Q.T
    assert np.allclose(G, np.eye(n), atol=1e-12)


@pytest.mark.parametrize("dim,name,sign,k,l", [
    (3, 'E', +1, 0, 2), (3, 'E', -1, 1, 2),
    (3, 'R', +1, 0, 2), (3, 'R', -1, 0, 2),
    (3, 'D', +1, 0, 2), (3, 'D', -1, 0, 2),
    (2, 'D', +1, 0, 3), (2, 'R', +1, 0, 3),
])
def test_zernike_operators_vs_oracle(dim, name, sign, k, l, n=7):
    ref_op = ref_zernike.operator(dim, name)(sign)(n, k, l).square.toarray()
    mine = zernike.operator(dim, name, sign, n, k, l)
    mine = mine.toarray() if hasattr(mine, 'toarray') else np.asarray(mine)
    assert np.allclose(mine, ref_op, atol=1e-12), f"zernike {name}({sign})"


@pytest.mark.parametrize("m,s", [(0, 0), (2, 0), (1, 1), (3, -1), (-2, 1), (0, 2)])
def test_swsh_vs_oracle(m, s, Lmax=8):
    z, w = sphere.quadrature(Lmax)
    Y = sphere.harmonics(Lmax, m, s, z)
    Yr = ref_sphere.harmonics(Lmax, m, s, np.asarray(z, dtype=np.longdouble))
    assert np.allclose(Y, Yr.astype(float), atol=1e-12)
    # Orthonormality under Legendre quadrature
    G = (Y * w) @ Y.T
    assert np.allclose(G, np.eye(Y.shape[0]), atol=1e-12)


@pytest.mark.parametrize("m,s,ds", [(2, 0, 1), (2, 0, -1), (1, 1, 1), (3, -1, 1), (0, 1, -1)])
def test_sphere_D_vs_oracle(m, s, ds, Lmax=8):
    ref_op = ref_sphere.operator('D')(ds)(Lmax, m, s).square.toarray()
    mine = sphere.operator('D', ds, Lmax, m, s).toarray()
    # Match shapes (oracle returns square at target size)
    rmin = min(ref_op.shape[0], mine.shape[0])
    assert np.allclose(mine[:rmin, :], ref_op[:rmin, :mine.shape[1]], atol=1e-12)


@pytest.mark.parametrize("m,s,ds", [(2, 0, 1), (1, 1, -1), (2, 1, 1)])
def test_sphere_Sin_vs_oracle(m, s, ds, Lmax=8):
    ref_op = ref_sphere.operator('Sin')(ds)(Lmax, m, s).square.toarray()
    mine = sphere.operator('Sin', ds, Lmax, m, s).toarray()
    rmin = min(ref_op.shape[0], mine.shape[0])
    assert np.allclose(mine[:rmin, :], ref_op[:rmin, :mine.shape[1]], atol=1e-12)


def test_sphere_cos_L():
    Lmax, m, s = 8, 2, 1
    refC = ref_sphere.operator('Cos')(Lmax, m, s).square.toarray()
    mine = sphere.operator('Cos', 0, Lmax, m, s).toarray()
    assert np.allclose(mine, refC, atol=1e-12)
    refL = ref_sphere.operator('L')(Lmax, m, s).square.toarray()
    mineL = sphere.operator('L', 0, Lmax, m, s).toarray()
    assert np.allclose(mineL, refL, atol=1e-12)
