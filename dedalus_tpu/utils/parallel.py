"""
Multi-process coordination helpers (parity: dedalus/tools/parallel.py).

The reference synchronizes MPI ranks; here the unit of coordination is the
JAX process (jax.process_index / jax.process_count). Single-process runs
(the common single-chip or single-host case) degrade to no-ops.
"""

import cProfile
import pathlib
import time


def _process_info():
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class Sync:
    """Context manager executing the block on all processes, with a barrier
    on exit (parity: parallel.py:10 Sync). With enter=True the barrier also
    runs on entry."""

    def __init__(self, enter=False, exit=True):
        self.enter = enter
        self.exit = exit

    @staticmethod
    def _barrier():
        _, n = _process_info()
        if n > 1:
            import jax
            # Tiny collective as a barrier: all processes must participate
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("dedalus_tpu_sync")

    def __enter__(self):
        if self.enter:
            self._barrier()
        return self

    def __exit__(self, exc_type, exc, tb):
        if self.exit and exc_type is None:
            self._barrier()
        return False


class RotateProcesses:
    """Context manager running the block on one process at a time, in
    process-index order (parity: parallel.py:38 RotateProcesses). Useful for
    serializing log output or file creation."""

    def __enter__(self):
        rank, n = _process_info()
        for _ in range(rank):
            Sync._barrier()
        return self

    def __exit__(self, exc_type, exc, tb):
        rank, n = _process_info()
        for _ in range(n - rank):
            Sync._barrier()
        return False


def parallel_mkdir(path, max_age=10):
    """Create a directory from process 0 only, then synchronize
    (parity: parallel.py:72 parallel_mkdir)."""
    path = pathlib.Path(path)
    rank, n = _process_info()
    if rank == 0:
        path.mkdir(parents=True, exist_ok=True)
    if n > 1:
        Sync._barrier()
        # Wait for the directory to become visible on shared filesystems
        t0 = time.time()
        while not path.is_dir():
            if time.time() - t0 > max_age:
                raise RuntimeError(f"parallel_mkdir: {path} not visible")
            time.sleep(0.05)
    return path


class ProfileWrapper:
    """Per-process cProfile wrapper writing one stats file per process
    (parity: parallel.py:62 ProfileWrapper)."""

    def __init__(self, basename):
        self.basename = str(basename)
        self.profiler = cProfile.Profile()

    def __enter__(self):
        self.profiler.enable()
        return self.profiler

    def __exit__(self, exc_type, exc, tb):
        self.profiler.disable()
        rank, _ = _process_info()
        self.profiler.dump_stats(f"{self.basename}.{rank}.prof")
        return False
