"""Validate shell/annulus radial operators against the reference oracle."""

import sys
import numpy as np
import pytest

sys.path.insert(0, '/root/reference/dedalus/libraries')
try:
    from dedalus_sphere import shell as ref_shell
    HAVE_ORACLE = True
except ImportError:
    HAVE_ORACLE = False

from dedalus_tpu.spectral import shell

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="reference oracle unavailable")

RADII = (1.0, 2.0)
ALPHA = (-0.5, -0.5)


@pytest.mark.parametrize("name", ['Z', 'R', 'AB', 'E'])
@pytest.mark.parametrize("k", [0, 1])
def test_basic_ops(name, k, n=8):
    ref = ref_shell.operator(2, RADII, name, ALPHA)(n, k).square.toarray()
    mine = shell.operator(2, RADII, name, n, k, alpha=ALPHA).toarray()
    assert np.allclose(mine, ref, atol=1e-12), f"{name} k={k}"


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("dl,l", [(+1, 0), (+1, 2), (-1, 2), (-1, 3), (+1, 5)])
@pytest.mark.parametrize("k", [0, 1])
def test_derivative_ops(dim, dl, l, k, n=8):
    ref = ref_shell.operator(dim, RADII, 'D', ALPHA)(dl, l)(n, k).square.toarray()
    mine = shell.operator(dim, RADII, 'D', n, k, alpha=ALPHA, dl=dl, l=l).toarray()
    assert np.allclose(mine, ref, atol=1e-12), f"D({dl},{l}) dim={dim} k={k}"
