"""Raw depth-file readers (ref: render_loader.py:201-273)."""

from __future__ import annotations

import numpy as np


def nyu_reader(img_path):
    """NYU packed PNG: depth = G*256 + B (ref: nyu_reader,
    render_loader.py:208-211)."""
    import cv2
    img = cv2.imread(img_path).astype(np.int32)
    return np.asarray(img[:, :, 0] + img[:, :, 1] * 256, dtype=np.float32)


def icvl_reader(img_path):
    from PIL import Image
    img = Image.open(img_path)
    assert len(img.getbands()) == 1
    return np.asarray(img, np.float32)


def shrec_reader(img_path):
    from PIL import Image
    img = Image.open(img_path)
    assert len(img.getbands()) == 1
    return np.asarray(img, np.float32)


def msra_reader(image_name, paras):
    """MSRA binary: uint32 header (w, h, bbox) + float32 depth patch
    (ref: msra_reader, render_loader.py:221-241).  Returns (depth image,
    world-space hand points)."""
    with open(image_name, "rb") as f:
        data = np.fromfile(f, dtype=np.uint32, count=6)
        width, height, left, top, right, bottom = data
        f.seek(4 * 6)
        patch = np.fromfile(f, dtype=np.float32)
    depth = np.zeros((height, width), dtype=np.float32)
    patch = patch.reshape(bottom - top, right - left)
    depth[top:bottom, left:right] = patch

    fx, fy, fu, fv = paras
    h, w = patch.shape
    us = (np.tile(np.arange(w), (h, 1)).astype(np.float64) + left).ravel()
    vs = (np.repeat(np.arange(h), w).astype(np.float64) + top).ravel()
    z = patch.ravel()
    # pixel2world with the module-level y-flip (ref render_loader.py:70-74)
    x = (us - fu) * z / fx
    y = (fv - vs) * z / fy
    pts = np.stack([x, y, z], axis=0)
    valid = (pts != 0).any(axis=0)
    return depth, pts[:, valid].T
