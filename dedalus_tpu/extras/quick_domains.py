"""Quick setup of common domains (parity: dedalus/extras/quick_domains.py)."""

import numpy as np

import dedalus_tpu.public as d3


def _fourier(coord, N, dealias, dtype):
    cls = d3.RealFourier if np.dtype(dtype).kind == 'f' else d3.ComplexFourier
    return cls(coord, size=N, bounds=(0, 2 * np.pi), dealias=dealias,
               dtype=dtype)


def fourier(N, dealias=3 / 2, dtype=np.float64):
    coord = d3.Coordinate('x')
    dist = d3.Distributor(coord, dtype=dtype)
    return coord, dist, _fourier(coord, N, dealias, dtype)


def chebyshev(N, dealias=3 / 2, dtype=np.float64):
    coord = d3.Coordinate('x')
    dist = d3.Distributor(coord, dtype=dtype)
    xbasis = d3.Chebyshev(coord, size=N, bounds=(-1, 1), dealias=dealias,
                          dtype=dtype)
    return coord, dist, xbasis


def fourier_2d(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.CartesianCoordinates('x', 'y')
    dist = d3.Distributor(coords, dtype=dtype)
    return coords, dist, (_fourier(coords[0], N, dealias, dtype),
                          _fourier(coords[1], N, dealias, dtype))


def fourier_3d(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.CartesianCoordinates('x', 'y', 'z')
    dist = d3.Distributor(coords, dtype=dtype)
    return coords, dist, tuple(_fourier(coords[i], N, dealias, dtype)
                               for i in range(3))


def channel_2d(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.CartesianCoordinates('x', 'y')
    dist = d3.Distributor(coords, dtype=dtype)
    xbasis = _fourier(coords[0], N, dealias, dtype)
    ybasis = d3.Chebyshev(coords[1], size=N, bounds=(-1, 1), dealias=dealias,
                          dtype=dtype)
    return coords, dist, (xbasis, ybasis)


def channel_3d(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.CartesianCoordinates('x', 'y', 'z')
    dist = d3.Distributor(coords, dtype=dtype)
    xbasis = _fourier(coords[0], N, dealias, dtype)
    ybasis = _fourier(coords[1], N, dealias, dtype)
    zbasis = d3.Chebyshev(coords[2], size=N, bounds=(-1, 1), dealias=dealias,
                          dtype=dtype)
    return coords, dist, (xbasis, ybasis, zbasis)


def disk(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    basis = d3.DiskBasis(coords, shape=(2 * N, N), radius=1, dealias=dealias,
                         dtype=dtype)
    return coords, dist, basis


def annulus(N, radii=(1, 2), dealias=3 / 2, dtype=np.float64):
    coords = d3.PolarCoordinates('phi', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    basis = d3.AnnulusBasis(coords, shape=(2 * N, N), radii=radii,
                            dealias=dealias, dtype=dtype)
    return coords, dist, basis


def sphere(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.S2Coordinates('phi', 'theta')
    dist = d3.Distributor(coords, dtype=dtype)
    basis = d3.SphereBasis(coords, (2 * N, N), radius=1, dealias=dealias,
                           dtype=dtype)
    return coords, dist, basis


def ball(N, dealias=3 / 2, dtype=np.float64):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    basis = d3.BallBasis(coords, (2 * N, N, N), radius=1, dealias=dealias,
                         dtype=dtype)
    return coords, dist, basis


def shell(N, radii=(1, 2), dealias=3 / 2, dtype=np.float64):
    coords = d3.SphericalCoordinates('phi', 'theta', 'r')
    dist = d3.Distributor(coords, dtype=dtype)
    basis = d3.ShellBasis(coords, (2 * N, N, N), radii=radii, dealias=dealias,
                          dtype=dtype)
    return coords, dist, basis
