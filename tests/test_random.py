"""
Chunked layout-independent RNG (parity: dedalus/tools/random_arrays.py and
the reference's mesh-independence of fill_random, field.py:898-943).
"""

import numpy as np
import pytest

from dedalus_tpu.utils.random_arrays import (
    ChunkedRandomArray, chunked_random_field)
import dedalus_tpu.public as d3


@pytest.mark.parametrize('chunk_size', [7, 64, 2**20])
def test_slice_matches_whole(chunk_size):
    """Any slice reproduces the corresponding region of the full array."""
    arr = ChunkedRandomArray((12, 9, 5), seed=11, chunk_size=chunk_size,
                             distribution='standard_normal')
    whole = arr.materialize()
    assert whole.shape == (12, 9, 5)
    np.testing.assert_array_equal(arr[3:7, 2:9, 1:4], whole[3:7, 2:9, 1:4])
    np.testing.assert_array_equal(arr[:, 4:5], whole[:, 4:5])


def test_chunk_size_independence():
    """The stream is chunk-size independent in shape coverage (values depend
    on chunking, but each chunking is internally consistent shard-to-whole)."""
    for cs in (5, 17, 1000):
        arr = ChunkedRandomArray((30,), seed=0, chunk_size=cs)
        whole = arr.materialize()
        parts = np.concatenate([arr[0:13], arr[13:30]])
        np.testing.assert_array_equal(parts, whole)


def test_seed_determinism():
    a = ChunkedRandomArray((8, 8), seed=5).materialize()
    b = ChunkedRandomArray((8, 8), seed=5).materialize()
    c = ChunkedRandomArray((8, 8), seed=6).materialize()
    np.testing.assert_array_equal(a, b)
    assert np.any(a != c)


def test_distribution_kwargs():
    vals = chunked_random_field((4000,), seed=1, distribution='normal',
                                scale=0.5)
    assert abs(np.std(vals) - 0.5) < 0.05
    u = chunked_random_field((4000,), seed=1, distribution='uniform')
    assert 0 <= u.min() and u.max() <= 1


def test_complex_field_determinism():
    z1 = chunked_random_field((6, 6), seed=9, dtype=np.complex128)
    z2 = chunked_random_field((6, 6), seed=9, dtype=np.complex128)
    np.testing.assert_array_equal(z1, z2)
    assert np.any(z1.imag != 0)


def test_field_fill_random_mesh_independent():
    """fill_random gives identical global data with and without a mesh."""
    import jax
    from jax.sharding import Mesh

    def build(mesh):
        xc = d3.Coordinate('x')
        yc = d3.Coordinate('y')
        dist = d3.Distributor((xc, yc), dtype=np.float64, mesh=mesh)
        xb = d3.RealFourier(xc, 16, (0, 1))
        yb = d3.RealFourier(yc, 16, (0, 1))
        f = dist.Field(bases=(xb, yb))
        f.fill_random('g', seed=42, distribution='normal', scale=1e-3)
        return np.asarray(f['g'])

    serial = build(None)
    mesh = Mesh(np.array(jax.devices('cpu')[:4]), ('p0',))
    sharded = build(mesh)
    np.testing.assert_array_equal(serial, sharded)
