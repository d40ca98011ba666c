"""
Cascading configuration: package defaults -> ~/.dedalus_tpu/config.cfg -> ./dedalus_tpu.cfg.

Parity target: dedalus/tools/config.py + dedalus/dedalus.cfg (fresh implementation).
"""

import os
import pathlib
from configparser import ConfigParser

DEFAULTS = {
    'logging': {
        'nonroot_level': 'warning',
        'stdout_level': 'info',
        'filename': 'none',
    },
    'transforms': {
        # Transform plan per basis family: 'matrix' (dense MMT on the MXU,
        # any dtype), 'fast' (mixed-radix matmul FFT/DCT, f64-capable,
        # O(N^1.5) — ops/fft64.py), or 'auto' (fast above fast_threshold).
        'fourier_library': 'auto',
        'jacobi_library': 'auto',
        # TPU measurement (see core/basis.py:_fast_enabled): below several
        # thousand modes the dense MMT GEMM beats the four-step matmul FFT
        # ~6.5x because the four-step's narrow (32,48) factors waste the
        # 128-lane MXU; the asymptotic flop win only pays above ~8k.
        'fast_threshold': '8192',
        'dealias_before_converting': 'True',
    },
    'parallelism': {
        'sync_transposes': 'False',
        'group_transforms': 'True',
    },
    'matrix construction': {
        'bc_top': 'True',
        'tau_left': 'True',
        'interleave_components': 'False',
        'store_expanded_matrices': 'True',
    },
    'linear algebra': {
        # Device solve strategy for factorized pencil systems:
        # 'lu' (host LU factors, device triangular solves)
        # 'inverse' (host inverse, device batched matmul — fastest on MXU)
        # 'inverse_refined' (inverse matmul + one iterative-refinement pass)
        'matrix_factorizer': 'inverse_refined',
        'matrix_solver': 'lu',
        'evp_solver': 'scipy_dense',
        # Residual target for iteratively-refined device solves (poly/banded):
        # sets the refinement count from the measured contraction rate
        'solve_target': '1e-15',
        # Banded refinement passes per solve: 'auto' (measure the residual
        # contraction at factor time and take the fewest passes reaching
        # solve_target) or an integer to pin the count
        'banded_refinements': 'auto',
        # Banded sweep kernel: 'scan' (sequential lax.scan, minimal flops),
        # 'prefix' (associative-scan affine composition, O(log Nb) depth for
        # dispatch-latency-bound accelerators), or 'auto' (prefix off-CPU)
        'banded_solve': 'auto',
        # Round the banded block size up to a multiple of this: TPU (8, 128)
        # tiling pads (nb, nb) factor blocks to 128 lanes, so memory per row
        # is flat in nb up to 64 — larger blocks cost nothing and shrink the
        # sweep/prefix depth. 1 = exact bandwidth (CPU default).
        'banded_block_multiple': '1',
        # Two-level prefix chunk size: 'auto' (chunk once the prefix's live
        # buffers would exceed [memory] banded_prefix_temp_gb), an integer
        # chunk length, or 0 to force the single-level log-depth prefix.
        'banded_prefix_chunk': 'auto',
        # f64-Woodbury shipping when pins / ill capacitance demand f64:
        # 'auto' (CPU ships all-f64; accelerators ship f32 + an f64 fix-up
        # for just the ill groups), 'force' (two-tier everywhere),
        # 'off' (all-f64 everywhere).
        'woodbury_two_tier': 'auto',
    },
    'memory': {
        'cache_transform_matrices': 'True',
        # Temp-memory budget (GB) for the single-level banded prefix solve;
        # larger problems switch to the two-level chunked prefix. Sized so
        # solve temps coexist with the resident factor profile + f64 M/L
        # operators + transforms at BASELINE scale on a 16 GB chip.
        'banded_prefix_temp_gb': '4',
        # Disk-cache finished banded factorizations (keyed by matrix
        # content) — the host QR sweeps dominate repeat-run setup at scale
        'cache_banded_factors': 'True',
        # Dense (G,P,P) pencil stacks are only materialized below this size;
        # larger systems stay in sparse/separable form (sampled assembly +
        # lazy combination), which is required at e.g. 2048^2 RBC scale.
        'max_dense_stack_gb': '2.0',
    },
    'matrix assembly': {
        # Assemble only ~10 sampled groups and synthesize the rest from an
        # exact polynomial fit in the group wavenumber when G is at least
        # this large (validated against held-out groups; falls back to full
        # per-group assembly on any mismatch).
        'sampled_min_groups': '24',
        'sampled_fit_tol': '1e-10',
    },
    'profiling': {
        'default_profile': 'False',
        'profile_dir': 'profiles',
    },
}


def _build_config():
    cfg = ConfigParser()
    cfg.read_dict(DEFAULTS)
    paths = [
        pathlib.Path.home() / '.dedalus_tpu' / 'config.cfg',
        pathlib.Path.cwd() / 'dedalus_tpu.cfg',
    ]
    cfg.read([str(p) for p in paths if p.exists()])
    # Environment overrides: DEDALUS_TPU_<SECTION>__<KEY>=value
    for key, value in os.environ.items():
        if key.startswith('DEDALUS_TPU_') and '__' in key:
            section, option = key[len('DEDALUS_TPU_'):].split('__', 1)
            section = section.lower().replace('_', ' ')
            if cfg.has_section(section):
                cfg.set(section, option.lower(), value)
    return cfg


config = _build_config()
