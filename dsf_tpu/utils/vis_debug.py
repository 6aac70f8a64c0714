"""Training-diagnostics visual toolkit: the remainder of the reference's
debug zoo that diagnostics actually use (ref: util/vis_tool.py:157-337,
405-468, 755-790; data/render_loader.py:3454-3472, 3701-4109).

Constant topology tables (adjacency matrices, bone/pill hand-model
lists) must match the reference bit-for-bit — they define the hand
graph; the rendering code around them is rewritten.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# graph adjacency (ref: get_adj_mat, vis_tool.py:157-237)
# ---------------------------------------------------------------------------

HANDS_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
               (1, 6), (6, 7), (7, 8),
               (2, 9), (9, 10), (10, 11),
               (3, 12), (12, 13), (13, 14),
               (4, 15), (15, 16), (16, 17),
               (5, 18), (18, 19), (19, 20)]

NYU_ADJ = np.array([
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1],
    [0, 1, 0, 1, 0, 1, 0, 1, 0, 0, 1, 1, 1, 1],
], dtype=np.float32)


def get_adj_mat(dataset):
    """Hand-graph adjacency for graph models (ref vis_tool.py:157)."""
    if dataset in ("FHAD",) or "hands" in dataset:
        J = 21
        adj = np.eye(J, dtype=np.float32)
        for a, b in HANDS_EDGES:
            adj[a, b] = adj[b, a] = 1.0
        return adj
    if dataset == "nyu":
        return NYU_ADJ.copy()
    raise KeyError(dataset)


# ---------------------------------------------------------------------------
# hand-model tables (ref vis_tool.py:405-468)
# ---------------------------------------------------------------------------

def get_hand_model_bone(dataset="hands"):
    return list(HANDS_EDGES)


def get_bone_len(dataset="hands"):
    """Normalized mean bone lengths + stds for the 20 'hands' bones."""
    mean = [0.1401, 0.7422, 0.6914, 0.6461, 0.6439, 0.5530, 0.3132, 0.2846,
            0.4553, 0.2343, 0.1887, 0.4910, 0.2821, 0.2172, 0.4489, 0.2558,
            0.2135, 0.3522, 0.1936, 0.1799]
    std = [0.0022, 0.0238, 0.0150, 0.0161, 0.0170, 0.0491, 0.0343, 0.0183,
           0.0476, 0.0180, 0.0191, 0.0446, 0.0238, 0.0168, 0.0405, 0.0346,
           0.0115, 0.0427, 0.0295, 0.0215]
    return mean, std


def get_finger_group(dataset="hands"):
    return [(2, 9, 10, 11), (3, 12, 13, 14), (4, 15, 16, 17),
            (5, 18, 19, 20)]


def get_palm_group(dataset="hands"):
    return [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]


def get_palm_angle_con(dataset="hands"):
    return np.array([[0.1, 0.5], [0.1, 0.25], [0.1, 0.25],
                     [0.1, 0.25]]) * np.pi


# ---------------------------------------------------------------------------
# heatmap / offset-field debug renders (ref vis_tool.py:755-812)
# ---------------------------------------------------------------------------

def debug_2d_heatmap(heatmap, size=128, out_dir=None, batch_index=0,
                     img_type="heatmap"):
    """(B, J, H, W) score maps -> (B*J, size, size, 3) uint8 jet renders
    (each map min-max normalized, x1.5 gain as the reference uses);
    optionally writes `{i}_{j}_{img_type}.png` files."""
    import cv2
    from matplotlib import cm

    hm = np.asarray(heatmap, np.float32)
    B, J, H, W = hm.shape
    flat = hm.reshape(B, J, -1)
    flat = flat - flat.min(-1, keepdims=True)
    flat = flat / (flat.max(-1, keepdims=True) + 1e-8)
    hm = np.clip(flat.reshape(B, J, H, W) * 1.5, 0, 1)
    jet = cm.get_cmap("jet") if hasattr(cm, "get_cmap") else cm.jet
    out = []
    for b in range(B):
        for j in range(J):
            m = cv2.resize(hm[b, j], (size, size))
            rgba = jet(1.0 - m)
            img = (rgba[..., :3] * 255).astype(np.uint8)
            if out_dir is not None:
                import os
                os.makedirs(out_dir, exist_ok=True)
                cv2.imwrite(os.path.join(
                    out_dir, f"{B * batch_index + b}_{j}_{img_type}.png"),
                    img[..., ::-1])
            out.append(img)
    return np.stack(out)


def debug_offset_field(offset, joint_index=0, stride=4):
    """(B, 4J, H, W) codec feature -> per-joint quiver arrays
    (positions, directions) for the unit-offset field of one joint."""
    off = np.asarray(offset)
    B, C, H, W = off.shape
    J = C // 4
    ox = off[:, joint_index]
    oy = off[:, J + joint_index]
    ys, xs = np.mgrid[0:H:stride, 0:W:stride]
    return (np.stack([xs, ys], -1),
            np.stack([ox[:, ::stride, ::stride],
                      oy[:, ::stride, ::stride]], -1))


# ---------------------------------------------------------------------------
# sphere hand-model + SDF visualizers (ref render_loader.py:3701-4109)
# ---------------------------------------------------------------------------

def vis_sphere(model, joints, mesh, path=None):
    """66-sphere hand model as a matplotlib 3D scatter (radius-scaled)
    over the mesh points; returns the figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from dsf_tpu.mano import spheres as sph

    c = np.asarray(sph.sphere_centers(joints[None] if joints.ndim == 2
                                      else joints))[0]
    r = np.asarray(sph.sphere_radii(model,
                                    joints[None] if joints.ndim == 2
                                    else joints,
                                    mesh[None] if mesh.ndim == 2
                                    else mesh))[0]
    m = np.asarray(mesh if mesh.ndim == 2 else mesh[0])
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(m[:, 0], m[:, 1], m[:, 2], s=1, c="gray", alpha=0.3)
    ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=(r * 50) ** 2, c=r,
               cmap="viridis", alpha=0.6)
    if path:
        fig.savefig(path, dpi=100)
        plt.close(fig)
    return fig


def sphere_sdf_slice(model, joints, mesh, z, extent, res=128):
    """2D slice of the sphere-model SDF at depth ``z``: per grid point
    min(dist to sphere surface) — negative inside (the reference's SDF
    debug images, render_loader.py:3950-4109 family)."""
    from dsf_tpu.mano import spheres as sph

    j = joints[None] if joints.ndim == 2 else joints
    m = mesh[None] if mesh.ndim == 2 else mesh
    c = np.asarray(sph.sphere_centers(j))[0]
    r = np.asarray(sph.sphere_radii(model, j, m))[0]
    (x0, x1), (y0, y1) = extent
    xs = np.linspace(x0, x1, res)
    ys = np.linspace(y0, y1, res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx, gy, np.full_like(gx, z)], -1).reshape(-1, 3)
    d = np.linalg.norm(pts[:, None] - c[None], axis=-1) - r[None]
    return d.min(-1).reshape(res, res)


# ---------------------------------------------------------------------------
# GT-label export (ref: save_label, render_loader.py:3454-3472)
# ---------------------------------------------------------------------------

def save_label(renderer, param_iter, paras, out_path, joint_slice=None,
               flip=1.0):
    """Render MANO params -> world joints -> uvd rows in a txt (the
    reference's label (re)generation tool)."""
    import jax.numpy as jnp
    from dsf_tpu import geometry as geo
    from dsf_tpu.render import renderer as rnd

    with open(out_path, "w") as f:
        for model_para, center, cube in param_iter:
            jx, _ = rnd.get_mesh_xyz(renderer, jnp.asarray(model_para))
            world = (np.asarray(jx) * np.asarray(cube)[:, None] / 2.0
                     + np.asarray(center)[:, None])
            uvd = np.asarray(geo.xyz_to_uvd(jnp.asarray(world), paras, flip))
            if joint_slice is not None:
                uvd = uvd[:, joint_slice]
            np.savetxt(f, uvd.reshape(uvd.shape[0], -1), fmt="%.3f")
    return out_path
