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
                    time_like = name in ('sim_time', 'wall_time', 'iteration',
                                         'timestep', 'write_number')
                    if first:
                        scales_group.create_dataset(
                            name, data=data, maxshape=(None,) if time_like else data.shape)
                    elif time_like and name in scales_group:
                        d = scales_group[name]
                        d.resize(d.shape[0] + data.shape[0], axis=0)
                        d[-data.shape[0]:] = data
            first = False
    return output_path


def merge_virtual(base_path, output_path):
    """
    Materialize a virtual handler's output into one monolithic file
    (parity: reference merge tools for per-process files). Virtual datasets
    read transparently through h5py, so this is a merge of the master files;
    the result is self-contained (shard files no longer needed).
    """
    return merge_sets(base_path, output_path)


def load_tasks(base_path, tasks=None, sets=None):
    """
    Load handler output into plain arrays: returns a dict
    {task: (dim_names, coords, data)} with the write axis concatenated and
    grid coordinates read from the attached HDF5 dimension scales.
    """
    import h5py
    paths = list_sets(base_path)
    if sets is not None:
        paths = [paths[i] for i in sets]
    if not paths:
        raise FileNotFoundError(f"No set files under {base_path}")
    out = {}
    times = load_scales(base_path, names=('sim_time',))['sim_time']
    with h5py.File(paths[0], 'r') as f:
        names = list(f['tasks']) if tasks is None else list(tasks)
        meta = {}
        for name in names:
            dset = f['tasks'][name]
            dims, coords = ['t'], {'t': times}
            for i in range(1, len(dset.shape)):
                dim = dset.dims[i]
                label = dim.label or f"dim_{i}"
                dims.append(label)
                if len(dim) and dim[0].shape == (dset.shape[i],):
                    coords[label] = np.asarray(dim[0])
            meta[name] = (dims, coords)
    for name in names:
        _, data = load_task(base_path, name, sets=sets)
        dims, coords = meta[name]
        out[name] = (dims, coords, data)
    return out


def load_tasks_to_xarray(base_path, tasks=None, sets=None):
    """
    Load handler output as an xarray.Dataset (parity: the reference's xarray
    loading backend, tools/post.py). Requires the optional xarray package.
    """
    try:
        import xarray as xr
    except ImportError as exc:
        raise ImportError(
            "load_tasks_to_xarray requires the optional 'xarray' package; "
            "use load_tasks() for a plain dict of (dims, coords, data).") from exc
    raw = load_tasks(base_path, tasks=tasks, sets=sets)
    arrays = {}
    for name, (dims, coords, data) in raw.items():
        dims = [d if d in coords else f"{name}_{i}" for i, d in enumerate(dims)]
        arrays[name] = xr.DataArray(data, dims=dims,
                                    coords={d: c for d, c in coords.items() if d in dims},
                                    name=name)
    return xr.Dataset(arrays)


def get_assigned_writes(set_paths, wanted_writes=None):
    """Round-robin assignment of write indices across processes for
    parallelized post-processing (parity: tools/post.py:47). Returns the
    subset of (set_path, write_index) pairs owned by this process."""
    import h5py
    from .utils.parallel import _process_info
    rank, nproc = _process_info()
    if isinstance(set_paths, (str, pathlib.Path)):
        set_paths = [set_paths]
    pairs = []
    for sp in set_paths:
        with h5py.File(str(sp), 'r') as f:
            nw = len(f['scales/sim_time'])
        for w in range(nw):
            if wanted_writes is None or w in wanted_writes:
                pairs.append((sp, w))
    return pairs[rank::nproc]
