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


# ---------------------------------------------------------------------------
# hierarchy / grouping tables for graph models (ref vis_tool.py:89-403).
# Semantic constants: asserted equal to the live reference module in
# tests/test_vis_tables.py.
# ---------------------------------------------------------------------------

def get_hierarchical_setting(dataset):
    """(containment edges, adjacency edges) of the joint hierarchy used
    by the HGCN experiments (ref vis_tool.py:89)."""
    if dataset == "FHAD" or "hands" in dataset:
        contain = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6),
                   (1, 7), (1, 12), (1, 13), (1, 14),
                   (2, 8), (2, 15), (2, 16), (2, 17),
                   (3, 9), (3, 18), (3, 19), (3, 20),
                   (4, 10), (4, 21), (4, 22), (4, 23),
                   (5, 11), (5, 24), (5, 25), (5, 26)]
        adj = [(6, 7), (6, 8), (6, 9), (6, 10), (6, 11),
               (7, 12), (12, 13), (13, 14),
               (8, 15), (15, 16), (16, 17),
               (9, 18), (18, 19), (19, 20),
               (10, 21), (21, 22), (22, 23),
               (11, 24), (24, 25), (25, 26)]
        return contain, adj
    if dataset == "nyu":
        contain = [(0, 2), (0, 3), (0, 4), (0, 5), (0, 6),
                   (1, 7), (1, 8), (2, 9), (2, 10), (3, 11), (3, 12),
                   (4, 13), (4, 14), (5, 15), (5, 16), (5, 17),
                   (6, 18), (6, 18), (6, 20)]
        adj = [(7, 8), (8, 20), (9, 10), (10, 20), (11, 12), (12, 20),
               (13, 14), (14, 20), (15, 16), (16, 17), (17, 20),
               (18, 20), (19, 20)]
        return contain, adj
    raise KeyError(dataset)


def get_bone_hierarchical_setting(dataset):
    """(containment, adjacency, node count) over BONE nodes
    (ref vis_tool.py:117)."""
    if dataset == "FHAD" or "hands" in dataset:
        contain = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6),
                   (1, 7), (1, 8), (1, 9), (1, 10), (1, 11),
                   (2, 12), (2, 13), (2, 14), (3, 15), (3, 16), (3, 17),
                   (4, 18), (4, 19), (4, 20), (5, 21), (5, 22), (5, 23),
                   (6, 24), (5, 25), (5, 26)]
        adj = [(7, 12), (12, 13), (13, 14), (8, 15), (15, 16), (16, 17),
               (9, 18), (18, 19), (19, 20), (10, 21), (21, 22), (22, 23),
               (11, 24), (24, 25), (25, 26)]
        return contain, adj, 27
    raise KeyError(dataset)


def get_sketch_group(dataset):
    """Bone indices grouped palm-first then per finger (ref :133)."""
    if dataset == "FHAD" or "hands" in dataset:
        return [[0, 1, 2, 3, 4], [5, 6, 7], [8, 9, 10], [11, 12, 13],
                [14, 15, 16], [17, 18, 19]]
    raise KeyError(dataset)


def get_joint_group(dataset):
    """Joint indices grouped by finger (ref vis_tool.py:138)."""
    if dataset == "FHAD" or "hands" in dataset:
        return [[0], [1, 6, 7, 8], [2, 9, 10, 11], [3, 12, 13, 14],
                [4, 15, 16, 17], [5, 18, 19, 20]]
    if dataset == "nyu":
        return [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9, 10], [11, 12, 13]]
    raise KeyError(dataset)


def get_adj_setting(dataset):
    """Sparse adjacency edge list (ref vis_tool.py:145)."""
    if dataset == "FHAD" or "hands" in dataset:
        return list(HANDS_EDGES)
    if dataset == "nyu":
        return [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (9, 10),
                (11, 13), (12, 13)]
    raise KeyError(dataset)


def get_joint_size(dataset):
    """Relative per-joint display/model radii (ref vis_tool.py:184)."""
    if dataset == "FHAD" or "hands" in dataset:
        return np.array([0.15, 0.15, 0.11, 0.11, 0.11, 0.11,
                         0.1, 0.1, 0.08, 0.08, 0.08, 0.06,
                         0.08, 0.08, 0.06, 0.08, 0.08, 0.06,
                         0.06, 0.06, 0.05])
    if dataset == "nyu":
        return np.array([0.06, 0.08, 0.06, 0.08, 0.06, 0.08, 0.06, 0.08,
                         0.1, 0.1, 0.12, 0.1, 0.1, 0.15])
    raise KeyError(dataset)


def get_dense_sketch_setting(dataset):
    """Skeleton edges + cross-finger struts (ref vis_tool.py:196)."""
    if dataset == "FHAD" or "hands" in dataset:
        return list(HANDS_EDGES) + [
            (20, 17), (17, 14), (14, 11), (11, 8),
            (19, 16), (16, 13), (13, 10), (10, 7),
            (18, 15), (15, 12), (12, 9), (9, 6),
            (5, 4), (4, 3), (3, 2), (2, 1)]
    from dsf_tpu.utils.vis import get_sketch_setting
    if dataset in ("nyu", "icvl", "msra"):
        return get_sketch_setting(dataset)
    raise KeyError(dataset)


def get_multi_view_sketch_setting(dataset):
    """Identical to the dense setting for hands/nyu (ref :220)."""
    return get_dense_sketch_setting(dataset)


def get_hierarchy_mat(dataset):
    """Level-1 pooling matrix: rows = super-nodes, cols = joints
    (ref vis_tool.py:281)."""
    if dataset == "mano":
        m = np.zeros((6, 21), np.float32)
        m[0, 0] = 1
        for f, (chain, tip) in enumerate([((1, 2, 3), 16), ((4, 5, 6), 17),
                                          ((7, 8, 9), 18), ((10, 11, 12), 19),
                                          ((13, 14, 15), 20)]):
            m[f + 1, list(chain) + [tip]] = 1
        return m
    if dataset == "nyu":
        m = np.zeros((6, 14), np.float32)
        for g, ids in enumerate([(0, 1), (2, 3), (4, 5), (6, 7),
                                 (8, 9, 10), (11, 12, 13)]):
            m[g, list(ids)] = 1
        return m
    raise KeyError(dataset)


def get_hierarchy_mapping(dataset):
    """Per-level joint->super-node index groups (ref vis_tool.py:299)."""
    if "mano" in dataset:
        return [[[0], [1, 2], [3, 16], [4, 5], [6, 17], [10, 11], [12, 19],
                 [7, 8], [9, 18], [13, 14], [15, 20]],
                [[0], [1, 2], [3, 4], [7, 8], [5, 6], [9, 10]],
                [[0, 1, 2, 3, 4, 5]]]
    if dataset == "nyu":
        return [[[0, 1], [2, 3], [4, 5], [6, 7], [8, 9, 10], [11, 12, 13]]]
    raise KeyError(dataset)


def get_hierarchy_sketch(dataset):
    """Edge lists per hierarchy level (ref vis_tool.py:310)."""
    if dataset == "nyu":
        return ([[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [9, 10], [1, 13],
                 [3, 13], [5, 13], [7, 13], [10, 13], [11, 13], [12, 13]],
                [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [1, 5], [2, 5],
                 [3, 5], [4, 5]])
    if dataset == "mano":
        return ([[0, 13], [13, 14], [14, 15], [15, 20],
                 [0, 1], [1, 2], [2, 3], [3, 16],
                 [0, 4], [4, 5], [5, 6], [6, 17],
                 [0, 10], [10, 11], [11, 12], [12, 19],
                 [0, 7], [7, 8], [8, 9], [9, 18]],
                [[0, 1], [0, 3], [0, 5], [0, 7], [0, 9], [1, 2], [3, 4],
                 [5, 6], [7, 8], [9, 10]],
                [[0, 1], [0, 2], [0, 3], [0, 4], [0, 5]],
                [[0, 0]])
    raise KeyError(dataset)


def get_bone_num(dataset, dense=True):
    """(ref vis_tool.py:338)"""
    if dataset == "nyu":
        return 6
    if dataset in ("FHAD", "msra", "icvl") or "hands" in dataset:
        return 15 if dense else 6
    raise KeyError(dataset)


def get_bone_edge(dataset, dense=True):
    """Edges over bone nodes (ref vis_tool.py:358)."""
    chain = [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
             (9, 10), (10, 11), (12, 13), (13, 14)]
    if dataset == "FHAD" or "hands" in dataset:
        return chain if dense else [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
                                    (1, 2), (2, 3), (3, 4), (4, 5)]
    if dataset == "nyu":
        return [(0, 5), (1, 5), (2, 5), (3, 5), (4, 5)]
    if dataset == "msra":
        return chain if dense else [(0, 5), (1, 5), (2, 5), (3, 5), (4, 5)]
    if dataset == "icvl":
        return [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
                (9, 10), (10, 11), (12, 13), (13, 11)]
    raise KeyError(dataset)


def get_bone_id_setting(dataset, dense=True):
    """(joint a, joint b) pairs defining each bone node (ref :380)."""
    if dataset == "FHAD" or "hands" in dataset:
        return [(0, 1), (1, 6), (7, 8), (0, 2), (2, 9), (10, 11),
                (0, 3), (3, 12), (13, 14), (0, 4), (4, 15), (16, 17),
                (0, 5), (5, 18), (19, 20)]
    if dataset == "nyu":
        return [(0, 1), (2, 3), (4, 5), (6, 7), (8, 10), (12, 13)]
    if dataset == "msra":
        return [(0, 1), (1, 2), (3, 4), (0, 5), (5, 6), (7, 8),
                (0, 9), (9, 10), (11, 12), (0, 13), (13, 14), (15, 16),
                (0, 17), (17, 18), (19, 20)]
    if dataset == "icvl":
        return [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
                (0, 7), (7, 8), (8, 9), (0, 10), (10, 11), (11, 12),
                (0, 13), (13, 14), (14, 15)]
    raise KeyError(dataset)


def get_hand_model_pill(dataset="hands"):
    """Capsule (pill) segments of the geometric hand model, indexing the
    27-node skeleton (21 joints + 6 virtual palm nodes) (ref :441)."""
    return [(1, 6), (6, 7), (7, 8),
            (23, 9), (9, 10), (10, 11),
            (24, 12), (12, 13), (13, 14),
            (25, 15), (15, 16), (16, 17),
            (26, 18), (18, 19), (19, 20)]


def get_hand_model_wedge(dataset="hands"):
    """Palm wedge triangles of the geometric hand model (ref :450)."""
    return [(26, 25, 5), (25, 5, 4), (25, 24, 4), (24, 3, 4), (24, 2, 3),
            (24, 23, 2), (5, 4, 21), (4, 0, 21), (4, 3, 0), (3, 1, 0),
            (3, 2, 1), (2, 22, 1)]


def get_hand_model_size(dataset="hands"):
    """Per-node radii of the 27-node geometric hand model (ref :456)."""
    return np.array([0.20, 0.20,
                     0.15, 0.15, 0.15, 0.15,
                     0.13, 0.10, 0.08,
                     0.08, 0.08, 0.06,
                     0.08, 0.08, 0.06,
                     0.08, 0.08, 0.06,
                     0.08, 0.06, 0.05,
                     0.20, 0.08,
                     0.08, 0.08, 0.08, 0.08])


# ---------------------------------------------------------------------------
# batch debug writers (ref vis_tool.py:846-1089).  All accept numpy or
# jax arrays, (B, 1, H, W) / (B, H, W) layouts, values in [-1, 1].
# ---------------------------------------------------------------------------

def _gray_batch(img):
    """-> (B, H, W) float images in [0, 255]."""
    arr = np.asarray(img, np.float32)
    if arr.ndim == 4:
        arr = arr[:, 0] if arr.shape[1] in (1,) else arr.squeeze(-1)
    return (arr + 1.0) / 2.0 * 255.0


def debug_2d_img(img, index, data_dir, name, batch_size=None, save=True):
    """Write every (sample, channel) plane of a batch as grayscale pngs;
    returns the stacked BGR renders (ref: debug_2d_img, vis_tool:858)."""
    import cv2
    arr = np.asarray(img, np.float32)
    if arr.ndim == 3:
        arr = arr[:, None]
    bs = batch_size or arr.shape[0]
    out = []
    for b in range(arr.shape[0]):
        for c in range(arr.shape[1]):
            draw = cv2.cvtColor((arr[b, c] + 1) / 2 * 255,
                                cv2.COLOR_GRAY2RGB)
            if save and data_dir is not None:
                cv2.imwrite(f"{data_dir}/{bs * index + b}_{c}_{name}.png",
                            draw)
            out.append(draw)
    return np.stack(out, 0)


def debug_2d_pose(img, joint_img, index, dataset, data_dir, name,
                  batch_size=None, save=False):
    """Batch pose overlays; returns (B, H, W, 3) and optionally writes
    per-sample pngs (ref: debug_2d_pose, vis_tool.py:870)."""
    import cv2
    from dsf_tpu.utils.vis import draw_pose

    gray = _gray_batch(img)
    size = gray.shape[-1]
    juv = (np.asarray(joint_img) + 1) / 2 * size
    bs = batch_size or gray.shape[0]
    out = []
    for b in range(min(gray.shape[0], juv.shape[0])):
        show = draw_pose(dataset, cv2.cvtColor(gray[b], cv2.COLOR_GRAY2RGB),
                         juv[b], max(size // 128, 1))
        if save and data_dir is not None:
            cv2.imwrite(f"{data_dir}/{bs * index + b}_{name}.png", show)
        out.append(show)
    return np.stack(out, 0)


def debug_2d_pose_index(img, joint_img, index, dataset, data_dir, name):
    """Single-sample variant keyed by a global index (ref :906)."""
    import cv2
    from dsf_tpu.utils.vis import draw_pose

    gray = _gray_batch(np.asarray(img)[None] if np.asarray(img).ndim == 3
                       else img)
    size = gray.shape[-1]
    juv = (np.asarray(joint_img) + 1) / 2 * size
    show = draw_pose(dataset, cv2.cvtColor(gray[0], cv2.COLOR_GRAY2RGB), juv)
    if data_dir is not None:
        cv2.imwrite(f"{data_dir}/{index}_{name}.png", show)
    return show


def debug_confidence_joint(img, joint_img, conf, index, dataset, data_dir,
                           name, batch_size=None, save=False):
    """Confidence-sized joint overlays (ref :892)."""
    import cv2
    from dsf_tpu.utils.vis import draw_conf

    gray = _gray_batch(img)
    size = gray.shape[-1]
    juv = (np.asarray(joint_img) + 1) / 2 * size
    conf = np.asarray(conf)
    bs = batch_size or gray.shape[0]
    out = []
    for b in range(gray.shape[0]):
        show = draw_conf(dataset, cv2.cvtColor(gray[b], cv2.COLOR_GRAY2RGB),
                         juv[b], conf[b])
        if save and data_dir is not None:
            cv2.imwrite(f"{data_dir}/{bs * index + b}_{name}.png", show)
        out.append(show)
    return np.stack(out, 0)


def debug_visible_joint(img, joint_img, visible, index, dataset, data_dir,
                        name):
    """Visibility-colored joint overlays, written per sample (ref :1043)."""
    import cv2
    from dsf_tpu.utils.vis import draw_visible

    gray = _gray_batch(img)
    size = gray.shape[-1]
    juv = (np.asarray(joint_img) + 1) / 2 * size
    vis_mask = np.asarray(visible).astype(np.int64)
    out = []
    for b in range(gray.shape[0]):
        show = draw_visible(dataset,
                            cv2.cvtColor(gray[b], cv2.COLOR_GRAY2RGB),
                            juv[b], vis_mask[b])
        if data_dir is not None:
            cv2.imwrite(f"{data_dir}/{gray.shape[0] * index + b}_{name}.png",
                        show)
        out.append(show)
    return np.stack(out, 0)


def debug_point(img, so_node, index, dataset, data_dir, name):
    """Node-dot overlays (ref: debug_point, vis_tool.py:1054)."""
    import cv2
    from dsf_tpu.utils.vis import draw_point

    gray = _gray_batch(img)
    size = gray.shape[-1]
    uv = (np.asarray(so_node) + 1) / 2 * size
    out = []
    for b in range(gray.shape[0]):
        show = draw_point(dataset, cv2.cvtColor(gray[b], cv2.COLOR_GRAY2RGB),
                          uv[b])
        if data_dir is not None:
            cv2.imwrite(f"{data_dir}/{gray.shape[0] * index + b}_{name}.png",
                        show)
        out.append(show)
    return np.stack(out, 0)


def debug_cluster(img, cluster_index, index, data_dir, name):
    """Write each (sample, channel) plane into per-cluster directories
    (ref: debug_cluster, vis_tool.py:846)."""
    import os
    import cv2
    arr = np.asarray(img, np.float32)
    if arr.ndim == 3:
        arr = arr[:, None]
    cid = np.asarray(cluster_index).astype(np.int64)
    B = arr.shape[0]
    for b in range(B):
        d = os.path.join(data_dir, str(cid[b]))
        os.makedirs(d, exist_ok=True)
        for c in range(arr.shape[1]):
            draw = cv2.cvtColor((arr[b, c] + 1) / 2 * 255,
                                cv2.COLOR_GRAY2RGB)
            cv2.imwrite(f"{d}/{B * index + b}_{c}_{name}.png", draw)


def debug_canny(img, index, data_dir):
    """Canny edges of normalized depth crops (ref :1063)."""
    import cv2
    gray = _gray_batch(img)
    out = []
    for b in range(gray.shape[0]):
        edges = cv2.Canny(gray[b].astype(np.uint8), 50, 150)
        if data_dir is not None:
            cv2.imwrite(f"{data_dir}/{gray.shape[0] * index + b}_canny.png",
                        edges)
        out.append(edges)
    return np.stack(out, 0)


def debug_three_view_pose(pcl, joint_xyz, index, dataset, data_dir, name):
    """Front/top/side silhouette projections with pose overlays: rotate
    the normalized cloud +90deg about x and y for views 0/1, identity for
    view 2 (ref: debug_ThreeView_pose, vis_tool.py:1010)."""
    import cv2
    from dsf_tpu.utils.vis import draw_pcl, draw_pose, rotate_pcl

    pcl = np.asarray(pcl)
    if pcl.shape[0] == 0:
        return 0
    for view in range(3):
        rot = np.zeros(3)
        if view != 2:
            rot[view] = np.pi / 2.0
        pr = rotate_pcl(pcl, rot)[..., :3]
        jr = rotate_pcl(np.asarray(joint_xyz), rot)[..., :3]
        imgs = draw_pcl(pr, 128)
        for b in range(imgs.shape[0]):
            juv = (jr[b] + 1) / 2 * 128
            gray = (imgs[b, 0] + 1) / 2 * 255
            show = draw_pose(dataset,
                             cv2.cvtColor(gray.astype(np.float32),
                                          cv2.COLOR_GRAY2RGB), juv)
            if data_dir is not None:
                cv2.imwrite(
                    f"{data_dir}/{imgs.shape[0] * index + b}-view{view}"
                    f"-{name}.png", show)
    return 3


def debug_pcl_heatmap(pcl_heatmap, batch_index, data_dir=None,
                      img_type="pcl"):
    """(B, C, P, 3) per-channel clouds -> jet-colored projection pngs
    (ref: debug_pcl_heatmap, vis_tool.py:1071)."""
    import cv2
    from matplotlib import cm
    from dsf_tpu.utils.vis import draw_pcl

    arr = np.asarray(pcl_heatmap)
    B, C, P, _ = arr.shape
    if B == 0:
        return 0
    img = draw_pcl(arr.reshape(B * C, P, 3), 128).reshape(B, C, 128, 128)
    jet = cm.get_cmap("jet") if hasattr(cm, "get_cmap") else cm.jet
    out = []
    for b in range(B):
        for c in range(C):
            hm = cv2.resize(img[b, c], (128, 128))
            color = (255 * jet(1 - hm)[..., :3]).astype(np.uint8)
            if data_dir is not None:
                cv2.imwrite(f"{data_dir}/{img_type}_{B * batch_index + b}"
                            f"_{c}.png", color)
            out.append(color)
    return np.stack(out, 0)


def draw_depth_heatmap(dataset, pcl, heatmap, joint_id):
    """Scatter a per-point heatmap for one joint, colored by that
    joint's finger color scaled by activation (ref: draw_depth_heatmap,
    vis_tool.py:686)."""
    import cv2
    from dsf_tpu.utils.vis import get_joint_color

    pts = (np.asarray(pcl).T + 1) * 64
    hm = np.asarray(heatmap)
    img = cv2.cvtColor(np.full((128, 128), 255, np.uint8),
                       cv2.COLOR_GRAY2BGR)
    base = get_joint_color(dataset)[joint_id]
    for i in range(pts.shape[0]):
        w = float(hm[joint_id, i])
        c = (int(base[0] * w), int(base[2] * w), int(base[1] * w))
        cv2.circle(img, (int(pts[i, 0]), int(pts[i, 1])), 1, c, -1)
    return img


def debug_mesh(verts, faces, batch_index, data_dir, img_type):
    """Batch .obj dump named {global_index}_{type}.obj (ref :721)."""
    from dsf_tpu.utils.vis import save_obj

    verts = np.asarray(verts)
    B = verts.shape[0]
    for b in range(B):
        save_obj(f"{data_dir}/{batch_index * B + b}_{img_type}.obj",
                 verts[b], np.asarray(faces))


class LossDistribution:
    """Accumulate per-sample / per-joint squared-error histograms and
    plot them (ref: data_distribute, vis_tool.py:1090).  The reference's
    bin scale (loss * 50 over bin_num bins) is kept."""

    def __init__(self, bin_num=100):
        self.bin_num = bin_num
        self.batch_count = np.zeros(bin_num, np.int64)
        self.joint_count = np.zeros(bin_num, np.int64)

    def update(self, joint_pd, label):
        err = np.sum((np.asarray(joint_pd) - np.asarray(label)) ** 2, -1)
        for target, val in ((self.batch_count, err.mean(-1)),
                            (self.joint_count, err.reshape(-1))):
            bins = np.clip(np.floor(val * 50 * (self.bin_num - 1e-4)), 0,
                           self.bin_num - 1).astype(np.int64)
            np.add.at(target, bins, 1)

    def vis(self, out_dir="."):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for counts, fname in ((self.batch_count, "loss_distribute.png"),
                              (self.joint_count,
                               "loss_joint_distribute.png")):
            fig, ax = plt.subplots()
            ax.bar(np.arange(self.bin_num), counts)
            ax.set_xlabel("loss value")
            ax.set_ylabel("number")
            ax.set_title("loss distribute")
            fig.savefig(f"{out_dir}/{fname}")
            plt.close(fig)
