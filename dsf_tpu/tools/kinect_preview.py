"""Normalize raw Kinect-v2 depth PNGs for display (ref: vis_kinect.py).

Usage: python -m dsf_tpu.tools.kinect_preview in.png out.png
"""

from __future__ import annotations

import sys

import numpy as np


def normalize_kinect_png(in_path, out_path, lo=500, hi=1500):
    from PIL import Image
    depth = np.asarray(Image.open(in_path), np.float32)
    vis = np.clip((depth - lo) / (hi - lo), 0, 1)
    Image.fromarray((vis * 255).astype(np.uint8)).save(out_path)
    return out_path


if __name__ == "__main__":
    normalize_kinect_png(sys.argv[1], sys.argv[2])
