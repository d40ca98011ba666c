"""
Distributed layout transposes over a JAX device mesh.

Parity target (behavior): dedalus/core/transposes.pyx:22-445 (FFTWTranspose /
AlltoallvTranspose: redistribute which axis is local so global spectral
transforms can be applied along it). TPU-native design: the MPI_Alltoallv +
pack/unpack loops become a single `jax.lax.all_to_all` over the ICI inside
shard_map — XLA handles the packing, and the collective rides the torus.

Conventions: functions here run INSIDE shard_map; `data` is the local block.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def localize_axis(data, mesh_axis, gather_axis, scatter_axis):
    """
    Make `gather_axis` fully local by scattering `scatter_axis` over the mesh:
      local (..., Ng/P, ..., Ns, ...) -> (..., Ng, ..., Ns/P, ...).
    The all_to_all splits the local block along scatter_axis and concatenates
    received blocks along gather_axis.
    """
    return jax.lax.all_to_all(data, mesh_axis, split_axis=scatter_axis,
                              concat_axis=gather_axis, tiled=True)


def make_transpose_pair(mesh_axis, axis0, axis1):
    """Forward/backward transpose closures between 'axis0-sharded' and
    'axis1-sharded' layouts (axis indices refer to the local array)."""
    def fwd(data):  # axis0 sharded -> axis1 sharded (axis0 becomes local)
        return localize_axis(data, mesh_axis, gather_axis=axis0, scatter_axis=axis1)

    def bwd(data):  # axis1 sharded -> axis0 sharded
        return localize_axis(data, mesh_axis, gather_axis=axis1, scatter_axis=axis0)

    return fwd, bwd
