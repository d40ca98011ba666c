"""
dedalus_tpu: a TPU-native spectral PDE framework.

A ground-up rebuild of the capabilities of Dedalus v3 (symbolic PDE entry,
spectral bases, IMEX/BVP/EVP solvers, distributed pencil decomposition) designed
for TPU execution with JAX/XLA:

  * transforms are matmuls on the MXU (with FFT fast paths where precision allows),
  * per-pencil sparse solves become batched dense/banded solves under vmap,
  * MPI mesh transposes become `jax.lax.all_to_all` over ICI inside shard_map,
  * the IVP main loop is a single jit-compiled step function.

Reference for feature parity (not for code): DedalusProject/dedalus @ /root/reference.
"""

import jax

# Spectral accuracy requires float64 state; TPUs execute f64 matmul/elementwise
# via emulation, and the fast paths downcast explicitly where safe.
jax.config.update("jax_enable_x64", True)

from .utils import logging as _logging_setup  # configure process logging

__version__ = "0.1.0"
