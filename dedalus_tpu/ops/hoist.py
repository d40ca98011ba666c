"""
Trace-time constant hoisting for compiled steps.

Transform stacks and operator matrices are host numpy arrays cached by the
basis layer; used directly inside a jit trace they become inline HLO
constants, and big programs (3D spherical steps) then exceed the remote
compiler's request limit (HTTP 413) while also bloating every recompile.

This registry runs the step function twice: a `collecting` pass
(jax.eval_shape) records every host matrix the trace touches, then the real
jit trace runs under `supplying`, where the device caches return the
corresponding runtime ARGUMENTS instead. Identity-keyed dedup is stable
because the basis caches pin their host arrays.
"""

from contextlib import contextmanager

import numpy as np

_MODE = None   # None | ('collect', store) | ('supply', store, values)


class Store:
    def __init__(self):
        self.index = {}     # id(np array) -> position
        self.arrays = []    # host arrays in first-touch order


@contextmanager
def collecting(store):
    global _MODE
    old = _MODE
    _MODE = ('collect', store)
    try:
        yield
    finally:
        _MODE = old


@contextmanager
def supplying(store, values):
    global _MODE
    old = _MODE
    _MODE = ('supply', store, values)
    try:
        yield
    finally:
        _MODE = old


def lookup(np_matrix):
    """Hook for the basis-layer device caches: returns the replacement array
    under an active hoisting mode, or None (caller proceeds normally)."""
    if _MODE is None:
        return None
    mode, store = _MODE[0], _MODE[1]
    key = id(np_matrix)
    if mode == 'collect':
        if key not in store.index:
            store.index[key] = len(store.arrays)
            store.arrays.append(np_matrix)
        return np_matrix
    idx = store.index.get(key)
    if idx is None:
        # Constant not seen in the collecting pass (divergent path):
        # fall back to an inline literal
        return np_matrix
    return _MODE[2][idx]


def hoist_constants(fn, example_args):
    """Return (converted_fn, device_consts) with
    converted_fn(*example_args, *device_consts) == fn(*example_args), where
    every basis-cache matrix touched by the trace is passed as an argument."""
    import jax
    store = Store()
    with collecting(store):
        jax.eval_shape(lambda *a: fn(*a), *example_args)
    consts = [jax.device_put(np.ascontiguousarray(a)) for a in store.arrays]
    n_args = len(example_args)

    def converted(*all_args):
        args = all_args[:n_args]
        values = list(all_args[n_args:])
        with supplying(store, values):
            return fn(*args)

    return converted, consts
