"""Visualization: isosurface extraction + matplotlib plotting helpers.

Replaces the reference's ``Visualization/`` tower (``mesh_implicit.py``,
``show_2d.py``, ``show_3d.py``, ``value_viz.py``, ``visualizer.py``).  The
surface extractor is a from-scratch vectorized marching-tetrahedra
implementation (scikit-image is not available in this image); plotting
helpers are thin matplotlib wrappers operating on host numpy copies — keep
them out of hot loops (the reference redrew matplotlib every solver step,
``hji_solver.py:731-836``; here visualization is explicit post-processing).
"""
from .frames import animate, export_frames
from .marching import contour_segments, implicit_mesh, marching_tetrahedra

__all__ = [
    "contour_segments",
    "animate",
    "export_frames",
    "implicit_mesh",
    "isosurface",
    "marching_tetrahedra",
    "plot_zero_contour",
    "plot_isosurface",
    "plot_value_dashboard",
    "plot_grid",
    "plot_function_image",
]


def isosurface(phi, level, zs, axis=-1, interp_order=6,
               power_parameter=0.5):
    """Height-field extraction of the ``phi == level`` surface: for each
    pencil along ``axis``, an inverse-distance weighted average of the
    ``interp_order`` closest-to-level sample coordinates (ref
    ``Visualization/iso_surface.py:10-28``, vectorized — no per-order
    Python loop).  ``zs`` are the coordinates along ``axis``.  Returns an
    array of ``phi``'s shape with ``axis`` removed."""
    import numpy as np

    phi = np.asarray(phi)
    zs = np.asarray(zs)
    dist = np.moveaxis((phi - level) ** 2, axis, -1)
    k = max(1, int(interp_order))
    arg = np.argsort(dist, axis=-1)[..., :k]
    d = np.take_along_axis(dist, arg, axis=-1)
    with np.errstate(divide="ignore"):
        w = np.clip(np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), np.inf),
                    0.0, 1.0e6) ** power_parameter
    return (zs[arg] * w).sum(axis=-1) / w.sum(axis=-1)


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_zero_contour(grid, phi, level=0.0, ax=None, **kw):
    """2D zero-level-set plot (ref ``show_2d.py:13``)."""
    import numpy as np

    plt = _mpl()
    if ax is None:
        _, ax = plt.subplots()
    segs = contour_segments(np.asarray(phi), level=level,
                            spacing=np.asarray(grid.dx),
                            origin=np.asarray(grid.lo))
    from matplotlib.collections import LineCollection

    ax.add_collection(LineCollection(segs, **kw))
    ax.set_xlim(grid.lo[0], grid.hi[0])
    ax.set_ylim(grid.lo[1], grid.hi[1])
    ax.set_aspect("equal")
    return ax


def plot_isosurface(grid, phi, level=0.0, ax=None, **kw):
    """3D implicit-surface plot via marching tetrahedra + Poly3DCollection
    (ref ``mesh_implicit.py:12,46``, ``show_3d.py:18``)."""
    import numpy as np

    plt = _mpl()
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    verts, faces = implicit_mesh(grid, np.asarray(phi), level=level)
    if len(faces):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        kw.setdefault("alpha", 0.7)
        ax.add_collection3d(Poly3DCollection(verts[faces], **kw))
    ax.set_xlim(grid.lo[0], grid.hi[0])
    ax.set_ylim(grid.lo[1], grid.hi[1])
    ax.set_zlim(grid.lo[2], grid.hi[2])
    return ax


def plot_grid(grids, ax=None, colors=None, annotate=False):
    """Grid-inspection plot (ref ``visualizer.py:71`` ``visGrid``): node
    layout + bounding box for one :class:`Grid` or a sequence (e.g. the
    cells from :func:`decompose.split_grid`).

    1-D grids plot their nodes on a line, 2-D grids scatter the node
    lattice inside the bounding rectangle, 3-D grids draw a wireframe of
    the node lattice, and >3-D grids project onto the first two axes
    (matching the reference's ``dim>3`` branch).  Returns the axis.
    """
    import numpy as np

    plt = _mpl()
    if not isinstance(grids, (list, tuple)):
        grids = [grids]
    ndim = grids[0].ndim
    if colors is None:
        colors = ["tab:blue", "tab:red", "tab:olive", "tab:orange",
                  "tab:green", "black"]
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d" if ndim == 3 else None)

    def _box2d(g, c):
        lo = np.asarray(g.lo)[:2]
        hi = np.asarray(g.hi)[:2]
        xs = [lo[0], hi[0], hi[0], lo[0], lo[0]]
        ys = [lo[1], lo[1], hi[1], hi[1], lo[1]]
        ax.plot(xs, ys, "-", color=c, linewidth=1.0)

    for i, g in enumerate(grids):
        c = colors[i % len(colors)]
        axes = [np.linspace(g.lo[d], g.hi[d], g.shape[d])
                for d in range(ndim)]
        if ndim == 1:
            ax.plot(axes[0], np.zeros_like(axes[0]), ".", color=c)
            ax.plot([g.lo[0], g.hi[0]], [0.0, 0.0], "-", color=c)
        elif ndim == 3:
            # subsampled node lattice + the bounding-box edges (a full
            # nx*ny*nz wireframe would be unreadable and slow)
            stride = [max(1, g.shape[d] // 8) for d in range(3)]
            xx, yy, zz = np.meshgrid(axes[0][::stride[0]],
                                     axes[1][::stride[1]],
                                     axes[2][::stride[2]], indexing="ij")
            ax.scatter(xx.ravel(), yy.ravel(), zz.ravel(), s=2, color=c,
                       depthshade=False)
            lo = np.asarray(g.lo)
            hi = np.asarray(g.hi)
            for d in range(3):  # 4 box edges parallel to each axis
                o = [a for a in range(3) if a != d]
                for c0 in (lo[o[0]], hi[o[0]]):
                    for c1 in (lo[o[1]], hi[o[1]]):
                        pts = np.zeros((2, 3))
                        pts[:, d] = [lo[d], hi[d]]
                        pts[:, o[0]] = c0
                        pts[:, o[1]] = c1
                        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-",
                                color=c, linewidth=0.8)
            ax.set_zlabel("z")
        else:  # 2-D, or >3-D projected onto the first two axes
            xx, yy = np.meshgrid(axes[0], axes[1], indexing="ij")
            ax.plot(xx.ravel(), yy.ravel(), ".", color=c, markersize=2)
            _box2d(g, c)
        if annotate and ndim >= 2:
            ax.annotate(f"cell {i}", xy=(float(g.lo[0]), float(g.lo[1])),
                        size=10, color=c)
    ax.set_xlabel("x")
    if ndim >= 2:
        ax.set_ylabel("y")
    ax.set_title(f"{len(grids)}-cell / {ndim}-D grid")
    return ax


def plot_function_image(grid, values, ax=None, **kw):
    """Function-image plot (ref ``visualizer.py:177`` ``visFuncIm``): a
    line plot of ``values`` over a 1-D grid or a surface plot over a 2-D
    grid.  Returns the axis."""
    import numpy as np

    plt = _mpl()
    values = np.asarray(values)
    if grid.ndim == 1:
        if ax is None:
            _, ax = plt.subplots()
        x = np.linspace(grid.lo[0], grid.hi[0], grid.shape[0])
        ax.plot(x, values.ravel(), linewidth=2, **kw)
    elif grid.ndim == 2:
        if ax is None:
            fig = plt.figure()
            ax = fig.add_subplot(projection="3d")
        x = np.linspace(grid.lo[0], grid.hi[0], grid.shape[0])
        y = np.linspace(grid.lo[1], grid.hi[1], grid.shape[1])
        xx, yy = np.meshgrid(x, y, indexing="ij")
        kw.setdefault("cmap", "coolwarm")
        ax.plot_surface(xx, yy, values, linewidth=0, antialiased=False,
                        **kw)
    else:
        raise ValueError(
            "plot_function_image handles 1-D and 2-D grids; project "
            "higher-dimensional values first (values.proj)")
    return ax


def plot_value_dashboard(grid, phi, level=0.0, fig=None):
    """1x3 dashboard — surface, filled contour, zero set — for 2D value
    functions (ref ``value_viz.py:22,209`` ``levelset_viz``)."""
    import numpy as np

    plt = _mpl()
    if fig is None:
        fig = plt.figure(figsize=(12, 4))
    phi = np.asarray(phi)
    x = np.linspace(grid.lo[0], grid.hi[0], grid.shape[0])
    y = np.linspace(grid.lo[1], grid.hi[1], grid.shape[1])
    xx, yy = np.meshgrid(x, y, indexing="ij")

    ax0 = fig.add_subplot(1, 3, 1, projection="3d")
    ax0.plot_surface(xx, yy, phi, cmap="viridis", linewidth=0)
    ax0.set_title("value surface")

    ax1 = fig.add_subplot(1, 3, 2)
    m = ax1.contourf(xx, yy, phi, levels=21)
    fig.colorbar(m, ax=ax1)
    ax1.set_title("value contours")

    ax2 = fig.add_subplot(1, 3, 3)
    plot_zero_contour(grid, phi, level=level, ax=ax2, colors="crimson")
    ax2.set_title(f"level set {level:g}")
    return fig
