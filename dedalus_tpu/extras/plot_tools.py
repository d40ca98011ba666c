"""
Plotting helpers for analysis output.

Parity target (behavior): dedalus/extras/plot_tools.py:54-601 — the plot_bot
family (general / 2d / 3d slice plotting of task datasets or live Fields),
MultiFigure paneling (Box/Frame layout algebra), and the quad_mesh /
get_1d_vertices / pad_limits / get_plane mesh utilities. Implementations are
written against this framework's Field/basis API; matplotlib is imported
lazily with the Agg backend so headless analysis scripts work everywhere.
"""

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    return plt


# --- Field wrappers: expose live Fields through the h5py-dataset interface ---

class DimWrapper:
    """Dimension-scale facade for one axis of a live Field (parity:
    plot_tools.py:28-49)."""

    def __init__(self, field, axis):
        self.field = field
        self.axis = axis
        self.basis = field.domain.bases[axis]

    @property
    def label(self):
        name = self.basis.coord.name if self.basis is not None else f"ax{self.axis}"
        in_grid = self.field.layout.grid_space[self.axis]
        return name if in_grid else name + ' mode'

    def __getitem__(self, item):
        if self.basis is None:
            return np.zeros(1)
        if self.field.layout.grid_space[self.axis]:
            scale = self.field.scales[self.axis]
            return np.asarray(self.basis.global_grid(scale)).ravel()
        return np.asarray(self.field.dist.local_modes(self.basis)).ravel()


class FieldWrapper:
    """h5py-dataset facade over a live Field (parity: plot_tools.py:12-25)."""

    def __init__(self, field):
        self.field = field
        self.attrs = {'name': field.name}
        nt = len(field.tensorsig)
        self.dims = [DimWrapper(field, axis) for axis in range(field.dist.dim)]
        self._nt = nt

    def __getitem__(self, item):
        return np.asarray(self.field.data)[item]

    @property
    def shape(self):
        return np.asarray(self.field.data).shape


def _wrap(dset):
    from ..core.field import Field
    return FieldWrapper(dset) if isinstance(dset, Field) else dset


# --- mesh utilities ---

def get_1d_vertices(grid, cut_edges=False):
    """Vertices dividing a 1d grid: interior vertices at midpoints; edge
    vertices either at the grid edges (cut_edges) or reflected so the edge
    cells are centered on the edge points (parity: plot_tools.py:458)."""
    grid = np.asarray(grid).ravel()
    if grid.size == 1:
        half = 0.5 if cut_edges else 0.5
        return np.array([grid[0] - half, grid[0] + half])
    d = np.diff(grid)
    vert = np.empty(grid.size + 1)
    vert[1:-1] = grid[:-1] + d / 2
    vert[0] = grid[0] if cut_edges else grid[0] - d[0] / 2
    vert[-1] = grid[-1] if cut_edges else grid[-1] + d[-1] / 2
    return vert


def quad_mesh(x, y, cut_x_edges=False, cut_y_edges=False):
    """Quadrilateral vertex meshes for pcolor-style plotting: x runs along
    the LAST mesh axis, y along the first (reference convention,
    plot_tools.py:427). Returns (xmesh, ymesh), each (len(y)+1, len(x)+1)."""
    xv = get_1d_vertices(np.asarray(x).ravel(), cut_edges=cut_x_edges)
    yv = get_1d_vertices(np.asarray(y).ravel(), cut_edges=cut_y_edges)
    return np.broadcast_to(xv[None, :], (yv.size, xv.size)).copy(), \
        np.broadcast_to(yv[:, None], (yv.size, xv.size)).copy()


def polar_mesh(phi, r):
    """Cartesian x, y vertex meshes for polar pcolormesh plots."""
    pm, rm = quad_mesh(phi, r)
    return rm * np.cos(pm), rm * np.sin(pm)


def pad_limits(xgrid, ygrid, xpad=0., ypad=0., square=None):
    """Padded [x0, x1, y0, y1] axis limits for the given vertex meshes,
    optionally extended to a square aspect within `square` axes (parity:
    plot_tools.py:488)."""
    x0, x1 = float(np.min(xgrid)), float(np.max(xgrid))
    y0, y1 = float(np.min(ygrid)), float(np.max(ygrid))
    dx, dy = x1 - x0, y1 - y0
    x0, x1 = x0 - xpad * dx, x1 + xpad * dx
    y0, y1 = y0 - ypad * dy, y1 + ypad * dy
    if square:
        pos = square.get_position()
        ax_aspect = (pos.height * square.figure.get_figheight()
                     / (pos.width * square.figure.get_figwidth()))
        w, h = x1 - x0, y1 - y0
        if h / w > ax_aspect:
            extra = h / ax_aspect - w
            x0, x1 = x0 - extra / 2, x1 + extra / 2
        else:
            extra = w * ax_aspect - h
            y0, y1 = y0 - extra / 2, y1 + extra / 2
    return [x0, x1, y0, y1]


def get_plane(dset, xaxis, yaxis, slices, xscale=0, yscale=0, **kw):
    """Select a 2d plane from a dataset: vertex meshes from the (sorted) axis
    grids plus the matching data slab, transposed so y is the first data axis
    (parity: plot_tools.py:543)."""
    slices = tuple(slices)
    xgrid = np.asarray(dset.dims[xaxis][xscale])[slices[xaxis]]
    ygrid = np.asarray(dset.dims[yaxis][yscale])[slices[yaxis]]
    xo, yo = np.argsort(xgrid), np.argsort(ygrid)
    xmesh, ymesh = quad_mesh(xgrid[xo], ygrid[yo], **kw)
    data = np.asarray(dset[slices])
    if xaxis < yaxis:
        data = data.T
    return xmesh, ymesh, data[np.ix_(yo, xo)]


# --- plot_bot family ---

def plot_bot(dset, image_axes, data_slices, image_scales=(0, 0), clim=None,
             even_scale=False, cmap='RdBu_r', axes=None, figkw={}, title=None,
             func=None, visible_axes=True):
    """
    Plot a 2d slice of a dataset or live Field with a top colorbar
    (parity: plot_tools.py:54-162).

    image_axes : (xaxis, yaxis) data axes used for the image
    data_slices : per-axis selection (ints / slices) into the global data
    image_scales : per-axis scale selectors (ints or dimension-scale names)
    func : optional (xmesh, ymesh, data) -> (xmesh, ymesh, data) transform
    """
    plt = _plt()
    from matplotlib import ticker, transforms
    dset = _wrap(dset)
    xaxis, yaxis = image_axes
    xscale, yscale = image_scales
    xmesh, ymesh, data = get_plane(dset, xaxis, yaxis, data_slices,
                                   xscale, yscale)
    if func is not None:
        xmesh, ymesh, data = func(xmesh, ymesh, data)

    if axes is None:
        fig = plt.figure(**figkw)
        axes = fig.add_subplot(1, 1, 1)
    if isinstance(axes, (list, tuple)):
        paxes, caxes = axes
    else:
        # Carve plot + colorbar axes out of the host axes' bounding box
        to_fig = transforms.BboxTransformTo(axes.get_position())
        pbox = transforms.Bbox.from_bounds(0.03, 0, 0.94, 0.94).transformed(to_fig)
        cbox = transforms.Bbox.from_bounds(0.03, 0.95, 0.94, 0.05).transformed(to_fig)
        paxes = axes.figure.add_axes(pbox)
        caxes = axes.figure.add_axes(cbox)
        axes.axis('off')

    cmap = plt.get_cmap(cmap).copy()
    cmap.set_bad('0.7')
    im = paxes.pcolormesh(xmesh, ymesh, data, cmap=cmap, zorder=1)
    paxes.axis(pad_limits(xmesh, ymesh))
    paxes.tick_params(length=0, width=0)
    if clim is None:
        if even_scale:
            m = max(abs(float(data.min())), abs(float(data.max())))
            clim = (-m, m)
        else:
            clim = (float(data.min()), float(data.max()))
    im.set_clim(*clim)

    cbar = plt.colorbar(im, cax=caxes, orientation='horizontal',
                        ticks=ticker.MaxNLocator(nbins=5))
    cbar.outline.set_visible(False)
    caxes.xaxis.set_ticks_position('top')

    if title is None:
        title = dset.attrs.get('name', getattr(dset, 'name', None)) \
            if hasattr(dset, 'attrs') else None
    if title is not None:
        caxes.set_xlabel(title)
        caxes.xaxis.set_label_position('top')
    paxes.set_xlabel(xscale if isinstance(xscale, str)
                     else dset.dims[xaxis].label)
    paxes.set_ylabel(yscale if isinstance(yscale, str)
                     else dset.dims[yaxis].label)
    if not visible_axes:
        paxes.xaxis.set_visible(False)
        paxes.yaxis.set_visible(False)
    return paxes, caxes


def plot_bot_2d(dset, transpose=False, **kw):
    """Plot a full 2d dataset/Field (parity: plot_tools.py:165)."""
    dset = _wrap(dset)
    if len(dset.shape) != 2:
        raise ValueError("plot_bot_2d requires 2d data")
    image_axes = (1, 0) if transpose else (0, 1)
    return plot_bot(dset, image_axes, (slice(None), slice(None)), **kw)


def plot_bot_3d(dset, normal_axis, normal_index, transpose=False, **kw):
    """Plot a 2d slice of a 3d dataset/Field normal to `normal_axis` (index
    or dimension name) at `normal_index` (parity: plot_tools.py:197)."""
    dset = _wrap(dset)
    if len(dset.shape) != 3:
        raise ValueError("plot_bot_3d requires 3d data")
    if isinstance(normal_axis, str):
        labels = [dim.label for dim in dset.dims]
        if normal_axis not in labels:
            raise ValueError(f"Axis name {normal_axis!r} not found in {labels}")
        normal_axis = labels.index(normal_axis)
    image_axes = tuple(ax for ax in (0, 1, 2) if ax != normal_axis)
    if transpose:
        image_axes = image_axes[::-1]
    slices = [slice(None)] * 3
    slices[normal_axis] = normal_index
    return plot_bot(dset, image_axes, tuple(slices), **kw)


# --- MultiFigure paneling ---

class Box:
    """2d size/offset vector with elementwise algebra (parity:
    plot_tools.py:330)."""

    def __init__(self, x, y):
        self.x, self.y = x, y

    @property
    def xbox(self):
        return Box(self.x, 0)

    @property
    def ybox(self):
        return Box(0, self.y)

    def __add__(self, other):
        if isinstance(other, Box):
            return Box(self.x + other.x, self.y + other.y)
        return NotImplemented

    __radd__ = __add__

    def __mul__(self, other):
        if np.isscalar(other):
            return Box(self.x * other, self.y * other)
        if isinstance(other, Box):
            return Box(self.x * other.x, self.y * other.y)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, other):
        if np.isscalar(other):
            return Box(self.x / other, self.y / other)
        if isinstance(other, Box):
            return Box(self.x / other.x, self.y / other.y)
        return NotImplemented


class Frame:
    """Non-uniform padding frame; Frame + Box = padded Box (parity:
    plot_tools.py:379)."""

    def __init__(self, top, bottom, left, right):
        self.top, self.bottom = top, bottom
        self.left, self.right = left, right

    @property
    def bottom_left(self):
        return Box(self.left, self.bottom)

    @property
    def top_right(self):
        return Box(self.right, self.top)

    def __add__(self, other):
        if isinstance(other, Box):
            return Box(self.left + other.x + self.right,
                       self.bottom + other.y + self.top)
        return NotImplemented

    __radd__ = __add__

    def __mul__(self, other):
        if np.isscalar(other):
            return Frame(self.top * other, self.bottom * other,
                         self.left * other, self.right * other)
        return NotImplemented

    __rmul__ = __mul__


class MultiFigure:
    """
    Grid of equally-sized image panels in one matplotlib figure, with the
    reference's integer-figsize rectification (parity: plot_tools.py:245-327).

    nrows, ncols : panel grid shape
    image : Box — panel size
    pad : Frame — padding around each panel
    margin : Frame — margin around the whole grid
    scale : overall scaling applied before rounding the figure height up to
            an integer (the residual width is absorbed into the margins)
    """

    def __init__(self, nrows, ncols, image, pad, margin, scale=1., **kw):
        plt = _plt()
        subfig = pad + image
        fig = margin + nrows * subfig.ybox + ncols * subfig.xbox
        # Integer rectification: bump the scale so the height is integral,
        # then absorb the fractional width into left/right margins
        intscale = np.ceil(scale * fig.y) / fig.y
        extra_w = np.ceil(intscale * fig.x) - intscale * fig.x
        image = image * intscale
        pad = pad * intscale
        margin = margin * intscale
        margin.left += extra_w / 2
        margin.right += extra_w / 2
        subfig = pad + image
        fig = margin + nrows * subfig.ybox + ncols * subfig.xbox
        self.figure = plt.figure(
            figsize=(int(np.rint(fig.x)), int(np.rint(fig.y))), **kw)
        self.nrows, self.ncols = nrows, ncols
        self.image, self.pad, self.margin, self.fig = image, pad, margin, fig

    def add_axes(self, i, j, rect, **kw):
        """Add axes inside panel (i, j); `rect` = (left, bottom, width,
        height) as fractions of the panel image."""
        subfig = self.pad + self.image
        offset = (self.margin.bottom_left
                  + (self.nrows - 1 - i) * subfig.ybox
                  + j * subfig.xbox
                  + self.pad.bottom_left)
        start = (offset + Box(rect[0], rect[1]) * self.image) / self.fig
        shape = Box(rect[2], rect[3]) * self.image / self.fig
        return self.figure.add_axes([start.x, start.y, shape.x, shape.y], **kw)
