"""Visualization utilities: 2D pose overlays, segmentation colormaps,
mesh obj export (subset of util/vis_tool.py the training loop uses:
draw_2d_pose, get_segmentJointColor, debug_mesh)."""

from __future__ import annotations

import numpy as np

# skeleton edges per dataset ordering (ref: get_sketch_setting,
# vis_tool.py:238+; MANO = 21-joint bighand-style chains)
SKETCH = {
    "MANO": [(0, 1), (1, 2), (2, 3), (3, 16),
             (0, 4), (4, 5), (5, 6), (6, 17),
             (0, 7), (7, 8), (8, 9), (9, 18),
             (0, 10), (10, 11), (11, 12), (12, 19),
             (0, 13), (13, 14), (14, 15), (15, 20)],
    "nyu": [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (9, 10),
            (1, 13), (3, 13), (5, 13), (7, 13), (10, 13), (11, 13), (12, 13)],
}

_FINGER_COLORS = np.array([
    [255, 255, 255],   # palm / wrist
    [255, 0, 0], [200, 0, 0], [150, 0, 0],       # index chain
    [0, 255, 0], [0, 200, 0], [0, 150, 0],
    [0, 0, 255], [0, 0, 200], [0, 0, 150],
    [255, 255, 0], [200, 200, 0], [150, 150, 0],
    [255, 0, 255], [200, 0, 200], [150, 0, 150],
], dtype=np.uint8)


def get_segment_joint_color():
    """16-entry part colormap (0 = palm) for segmentation overlays
    (ref: get_segmentJointColor, vis_tool.py:1247)."""
    return _FINGER_COLORS


def depth_to_u8(img):
    """Normalized depth [-1, 1] -> grayscale uint8 (background white)."""
    img = np.asarray(img).squeeze()
    return ((img + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)


def draw_2d_pose(img, joint_uvd, dataset="MANO"):
    """Overlay a normalized-uvd skeleton on a depth crop; returns an RGB
    uint8 image (ref: draw_2d_pose, vis_tool.py:914)."""
    try:
        import cv2
    except Exception:                                # pragma: no cover
        return np.stack([depth_to_u8(img)] * 3, -1)
    canvas = np.stack([depth_to_u8(img)] * 3, -1).copy()
    h, w = canvas.shape[:2]
    uv = ((np.asarray(joint_uvd)[:, :2] + 1) / 2 * np.array([w, h])).astype(int)
    edges = SKETCH.get(dataset, SKETCH["MANO"])
    for a, b in edges:
        if a < len(uv) and b < len(uv):
            cv2.line(canvas, tuple(uv[a]), tuple(uv[b]), (0, 160, 255), 1)
    for j, (x, y) in enumerate(uv):
        cv2.circle(canvas, (x, y), 2, (0, 0, 255), -1)
    return canvas


def save_obj(path, verts, faces):
    """Dump a mesh as .obj (ref: debug_mesh, vis_tool.py:721)."""
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for tri in np.asarray(faces).astype(int) + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def segmentation_overlay(seg_img):
    """(H, W) part ids -> RGB uint8."""
    return _FINGER_COLORS[np.clip(np.asarray(seg_img), 0,
                                  len(_FINGER_COLORS) - 1)]
