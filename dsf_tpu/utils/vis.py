"""Visualization utilities: 2D pose overlays, segmentation colormaps,
mesh obj export (the training-loop subset of util/vis_tool.py:
draw_2d_pose/draw_pose, get_sketch_setting, get_joint_color,
get_segmentJointColor, debug_mesh)."""

from __future__ import annotations

import numpy as np

# skeleton edges per dataset joint ordering (ref: get_sketch_setting,
# vis_tool.py:238-278; MANO = 21-joint bighand-style chains)
SKETCH = {
    "MANO": [(0, 1), (1, 2), (2, 3), (3, 16),
             (0, 4), (4, 5), (5, 6), (6, 17),
             (0, 7), (7, 8), (8, 9), (9, 18),
             (0, 10), (10, 11), (11, 12), (12, 19),
             (0, 13), (13, 14), (14, 15), (15, 20)],
    "hands": [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
              (1, 6), (6, 7), (7, 8),
              (2, 9), (9, 10), (10, 11),
              (3, 12), (12, 13), (13, 14),
              (4, 15), (15, 16), (16, 17),
              (5, 18), (18, 19), (19, 20)],
    "nyu": [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (9, 10),
            (1, 13), (3, 13), (5, 13), (7, 13), (10, 13), (11, 13), (12, 13)],
    "icvl": [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
             (0, 7), (7, 8), (8, 9), (0, 10), (10, 11), (11, 12),
             (0, 13), (13, 14), (14, 15)],
    "msra": [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
             (0, 9), (9, 10), (10, 11), (11, 12),
             (0, 13), (13, 14), (14, 15), (15, 16),
             (0, 17), (17, 18), (18, 19), (19, 20)],
    "shrec": [(0, 1),
              (0, 2), (2, 3), (3, 4), (4, 5),
              (0, 6), (6, 7), (7, 8), (8, 9),
              (0, 10), (10, 11), (11, 12), (12, 13),
              (0, 14), (14, 15), (15, 16), (16, 17),
              (0, 18), (18, 19), (19, 20), (20, 21)],
}
SKETCH["dhg"] = SKETCH["shrec"]


def get_sketch_setting(dataset):
    """Edge list for a dataset's joint order (ref: vis_tool.py:238)."""
    return SKETCH.get(dataset, SKETCH["MANO"])


# per-finger BGR colors matching the reference's Finger_color enum
# (vis_tool.py:~80): WRIST/ROOT, THUMB, INDEX, MIDDLE, RING, LITTLE
_F = {
    "ROOT": (220, 220, 220), "WRIST": (220, 220, 220),
    "THUMB": (0, 0, 255), "INDEX": (0, 255, 0), "MIDDLE": (255, 0, 0),
    "RING": (0, 255, 255), "LITTLE": (255, 0, 255),
}

# per-joint finger assignment per dataset (ref: get_joint_color,
# vis_tool.py:535-583)
_JOINT_FINGER = {
    "MANO": ["ROOT",
             "INDEX", "INDEX", "INDEX", "MIDDLE", "MIDDLE", "MIDDLE",
             "LITTLE", "LITTLE", "LITTLE", "RING", "RING", "RING",
             "THUMB", "THUMB", "THUMB",
             "INDEX", "MIDDLE", "LITTLE", "RING", "THUMB"],
    "hands": ["ROOT", "THUMB", "INDEX", "MIDDLE", "RING", "LITTLE",
              "THUMB", "THUMB", "THUMB", "INDEX", "INDEX", "INDEX",
              "MIDDLE", "MIDDLE", "MIDDLE", "RING", "RING", "RING",
              "LITTLE", "LITTLE", "LITTLE"],
    "nyu": ["LITTLE", "LITTLE", "RING", "RING", "MIDDLE", "MIDDLE",
            "INDEX", "INDEX", "THUMB", "THUMB", "THUMB",
            "WRIST", "WRIST", "WRIST"],
    "icvl": ["ROOT", "THUMB", "THUMB", "THUMB", "INDEX", "INDEX", "INDEX",
             "MIDDLE", "MIDDLE", "MIDDLE", "RING", "RING", "RING",
             "LITTLE", "LITTLE", "LITTLE"],
    "msra": ["WRIST", "INDEX", "INDEX", "INDEX", "INDEX",
             "MIDDLE", "MIDDLE", "MIDDLE", "MIDDLE",
             "RING", "RING", "RING", "RING",
             "LITTLE", "LITTLE", "LITTLE", "LITTLE",
             "THUMB", "THUMB", "THUMB", "THUMB"],
    "shrec": ["ROOT", "ROOT",
              "THUMB", "THUMB", "THUMB", "THUMB",
              "INDEX", "INDEX", "INDEX", "INDEX",
              "MIDDLE", "MIDDLE", "MIDDLE", "MIDDLE",
              "RING", "RING", "RING", "RING",
              "LITTLE", "LITTLE", "LITTLE", "LITTLE"],
}
_JOINT_FINGER["dhg"] = _JOINT_FINGER["shrec"]


def get_joint_color(dataset):
    """Per-joint BGR colors (ref: get_joint_color, vis_tool.py:535)."""
    names = _JOINT_FINGER.get(dataset, _JOINT_FINGER["MANO"])
    return [_F[n] for n in names]


def get_sketch_color(dataset):
    """Per-edge BGR colors: each bone takes its child joint's finger
    color (ref: get_sketch_color, vis_tool.py:~480)."""
    jc = get_joint_color(dataset)
    return [jc[b] if b < len(jc) else jc[-1]
            for _, b in get_sketch_setting(dataset)]


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
    uint8 image (ref: draw_2d_pose, vis_tool.py:914), colored per finger
    like the reference's draw_pose."""
    try:
        import cv2
    except Exception:                                # pragma: no cover
        return np.stack([depth_to_u8(img)] * 3, -1)
    canvas = np.stack([depth_to_u8(img)] * 3, -1).copy()
    h, w = canvas.shape[:2]
    uv = ((np.asarray(joint_uvd)[:, :2] + 1) / 2 * np.array([w, h])).astype(int)
    return draw_pose(dataset, canvas, uv)


def draw_pose(dataset, img, pose, scale=1):
    """Pixel-coordinate pose overlay with per-finger joint/bone colors
    (ref: draw_pose, vis_tool.py:601-620).  Mutates and returns img."""
    import cv2
    pose = np.asarray(pose)
    colors_joint = get_joint_color(dataset)
    for idx, pt in enumerate(pose[:len(colors_joint)]):
        cv2.circle(img, (int(pt[0]), int(pt[1])), 2 * scale,
                   colors_joint[idx], -1)
    colors = get_sketch_color(dataset)
    for idx, (a, b) in enumerate(get_sketch_setting(dataset)):
        if a >= pose.shape[0] or b >= pose.shape[0]:
            break
        cv2.line(img, (int(pose[a, 0]), int(pose[a, 1])),
                 (int(pose[b, 0]), int(pose[b, 1])), colors[idx], scale)
    return img


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
