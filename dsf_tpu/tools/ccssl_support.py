"""CCSSL baseline support utilities (ref: CCSSL/imutils.py,
CCSSL/transforms.py, CCSSL/misc.py): hourglass-style Gaussian label
maps, affine crop transforms, and checkpoint/LR helpers used when
training the CCSSL pseudo-label baseline."""

from __future__ import annotations

import numpy as np


def gaussian_label_map(joints_uv, size, sigma=1.0):
    """(J, 2) pixel coords -> (J, size, size) Gaussian heatmaps
    (ref: imutils draw_labelmap)."""
    J = joints_uv.shape[0]
    ys, xs = np.mgrid[0:size, 0:size]
    maps = np.zeros((J, size, size), np.float32)
    for j, (u, v) in enumerate(np.asarray(joints_uv)):
        maps[j] = np.exp(-((xs - u) ** 2 + (ys - v) ** 2) / (2 * sigma ** 2))
    return maps


def get_affine_transform(center, scale, rot_deg, out_size):
    """Hourglass-style crop transform (ref: transforms.py:32-115):
    2x3 matrix mapping source pixels -> (out_size, out_size) crop."""
    rot = np.deg2rad(rot_deg)
    s = out_size / (scale * 200.0)
    cos, sin = np.cos(rot) * s, np.sin(rot) * s
    M = np.array([[cos, -sin, 0.0], [sin, cos, 0.0]], np.float64)
    cxy = np.asarray(center, np.float64)
    M[:, 2] = out_size / 2.0 - M[:, :2] @ cxy
    return M


def transform_point(pt, M):
    return M[:, :2] @ np.asarray(pt, np.float64) + M[:, 2]


def adjust_learning_rate(lr, epoch, schedule, gamma=0.1):
    """StepLR helper (ref: misc.py:29-55)."""
    for milestone in schedule:
        if epoch >= milestone:
            lr *= gamma
    return lr
