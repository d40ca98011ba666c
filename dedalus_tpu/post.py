"""
Post-processing tools for analysis output.

Parity target (behavior): dedalus/tools/post.py (visit_writes, write
assignment, merging) — adapted to the serial-host HDF5 files written by
core.evaluator.H5FileHandler.
"""

import pathlib
import numpy as np


def list_sets(base_path):
    """Sorted set files of a handler directory."""
    base_path = pathlib.Path(base_path)
    return sorted(base_path.glob(f"{base_path.stem}_s*.h5"))


def visit_writes(set_paths, function, **kw):
    """
    Apply `function(filename, start, count, **kw)` over all writes in the
    given set files (parity: post.py:20).
    """
    out = []
    for path in set_paths:
        import h5py
        with h5py.File(path, 'r') as f:
            n_writes = f['scales/sim_time'].shape[0]
        out.append(function(path, 0, n_writes, **kw))
    return out


def load_task(base_path, task, sets=None):
    """
    Load a task across all (or selected) sets: returns (times, data) with the
    write axis concatenated.
    """
    import h5py
    paths = list_sets(base_path)
    if sets is not None:
        paths = [paths[i] for i in sets]
    times = []
    datas = []
    for path in paths:
        with h5py.File(path, 'r') as f:
            times.append(np.asarray(f['scales/sim_time']))
            datas.append(np.asarray(f['tasks'][task]))
    return np.concatenate(times), np.concatenate(datas)


def load_scales(base_path, names=('sim_time', 'iteration', 'timestep')):
    import h5py
    paths = list_sets(base_path)
    out = {n: [] for n in names}
    for path in paths:
        with h5py.File(path, 'r') as f:
            for n in names:
                if f'scales/{n}' in f:
                    out[n].append(np.asarray(f[f'scales/{n}']))
    return {n: np.concatenate(v) for n, v in out.items() if v}


def merge_sets(base_path, output_path):
    """Merge all set files of a handler into one file (parity: merge tools)."""
    import h5py
    paths = list_sets(base_path)
    if not paths:
        raise FileNotFoundError(f"No set files under {base_path}")
    with h5py.File(output_path, 'w') as out:
        tasks_group = out.create_group('tasks')
        scales_group = out.create_group('scales')
        first = True
        for path in paths:
            with h5py.File(path, 'r') as f:
                for name, dset in f['tasks'].items():
                    data = np.asarray(dset)
                    if first:
                        tasks_group.create_dataset(
                            name, data=data, maxshape=(None,) + data.shape[1:])
                    else:
                        d = tasks_group[name]
                        d.resize(d.shape[0] + data.shape[0], axis=0)
                        d[-data.shape[0]:] = data
                for name, dset in f['scales'].items():
                    data = np.asarray(dset)
                    if data.ndim != 1:
                        continue
                    if first:
                        scales_group.create_dataset(name, data=data, maxshape=(None,))
                    elif name in scales_group:
                        d = scales_group[name]
                        d.resize(d.shape[0] + data.shape[0], axis=0)
                        d[-data.shape[0]:] = data
            first = False
    return output_path
