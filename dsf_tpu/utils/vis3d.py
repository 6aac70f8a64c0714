"""3D matplotlib visualization helpers (ref: util/vis_3d.py:6-141):
mesh / keypoint / sphere / point-cloud displays for offline debugging."""

from __future__ import annotations

import numpy as np


def _axes3d(lim=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    if lim is not None:
        ax.set_xlim(*lim); ax.set_ylim(*lim); ax.set_zlim(*lim)
    return fig, ax


def display_mesh(verts, faces, path, joints=None):
    """Render a mesh (optionally with joints) to an image file
    (ref: display_mesh, vis_3d.py:6)."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection
    verts = np.asarray(verts)
    fig, ax = _axes3d()
    tris = verts[np.asarray(faces, int)]
    coll = Poly3DCollection(tris, alpha=0.15, edgecolor="gray", linewidth=0.1)
    ax.add_collection3d(coll)
    if joints is not None:
        j = np.asarray(joints)
        ax.scatter(j[:, 0], j[:, 1], j[:, 2], c="r", s=12)
    lo, hi = verts.min(0), verts.max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    fig.savefig(path, dpi=120)
    import matplotlib.pyplot as plt
    plt.close(fig)


def display_sphere(centers, radii, path, pcl=None):
    """Render the 66-sphere hand model (ref: display_sphere,
    vis_3d.py:91)."""
    fig, ax = _axes3d()
    centers = np.asarray(centers)
    radii = np.asarray(radii)
    u = np.linspace(0, 2 * np.pi, 8)
    v = np.linspace(0, np.pi, 6)
    for c, r in zip(centers, radii):
        x = c[0] + r * np.outer(np.cos(u), np.sin(v))
        y = c[1] + r * np.outer(np.sin(u), np.sin(v))
        z = c[2] + r * np.outer(np.ones_like(u), np.cos(v))
        ax.plot_surface(x, y, z, alpha=0.2)
    if pcl is not None:
        p = np.asarray(pcl)
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=1, c="k")
    fig.savefig(path, dpi=120)
    import matplotlib.pyplot as plt
    plt.close(fig)


def display_pcl(pcl, path, seg=None):
    """Point cloud, optionally colored by part segment."""
    fig, ax = _axes3d()
    p = np.asarray(pcl)
    if seg is not None:
        from dsf_tpu.utils.vis import get_segment_joint_color
        colors = get_segment_joint_color()[
            np.clip(np.asarray(seg), 0, 15)] / 255.0
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2, c=colors)
    else:
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2)
    fig.savefig(path, dpi=120)
    import matplotlib.pyplot as plt
    plt.close(fig)
