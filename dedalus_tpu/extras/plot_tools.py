"""
Plotting helpers for analysis output.

Parity target (behavior): dedalus/extras/plot_tools.py (plot_bot family,
quad_mesh) — compact matplotlib utilities for plotting 2D slices of task data.
"""

import numpy as np


def quad_mesh(x, y, cut_edges=False):
    """Cell-edge arrays for pcolormesh from cell-center coordinates
    (parity: plot_tools.py:427)."""
    x = np.asarray(x).ravel()
    y = np.asarray(y).ravel()

    def edges(c):
        e = np.zeros(c.size + 1)
        e[1:-1] = (c[:-1] + c[1:]) / 2
        e[0] = c[0] - (c[1] - c[0]) / 2
        e[-1] = c[-1] + (c[-1] - c[-2]) / 2
        return e

    xe, ye = edges(x), edges(y)
    return np.meshgrid(xe, ye, indexing='ij')


def plot_bot_2d(dset, image_axes=(1, 2), data_slices=(0,), title=None,
                even_scale=True, clim=None, cmap='RdBu_r', axes=None):
    """
    Plot a 2D slice of an HDF5 task dataset (parity: plot_tools.py:54
    plot_bot_2d). `dset` may be an h5py dataset or ndarray with dims
    (write, x, y).
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    data = np.asarray(dset)[data_slices]
    while data.ndim > 2:
        data = data[0]
    if axes is None:
        fig, axes = plt.subplots(figsize=(6, 4))
    if clim is None and even_scale:
        m = np.abs(data).max() or 1
        clim = (-m, m)
    im = axes.pcolormesh(data.T, cmap=cmap, shading='auto',
                         vmin=None if clim is None else clim[0],
                         vmax=None if clim is None else clim[1])
    axes.figure.colorbar(im, ax=axes)
    if title:
        axes.set_title(title)
    return axes


def polar_mesh(phi, r):
    """x, y meshes for polar pcolormesh plots."""
    phi = np.asarray(phi).ravel()
    r = np.asarray(r).ravel()
    pe, re_ = quad_mesh(phi, r)
    return re_ * np.cos(pe), re_ * np.sin(pe)
