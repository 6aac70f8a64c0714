"""Smoke + geometry checks of the offline pre-rendering tool
(reference render_msra/render_nyu, render_loader.py:3205-3255)."""

import os

import numpy as np

from dsf_tpu.mano import synthetic
from dsf_tpu.tools.prerender import prerender_dataset


def test_prerender_writes_depth_pngs(tmp_path):
    npz = str(tmp_path / "m.npz")
    synthetic.save_synthetic_mano(npz)
    rng = np.random.RandomState(0)
    N = 3
    params = np.zeros((N, 62), np.float32)
    params[:, :3] = rng.randn(N, 3) * 0.2
    params[:, 58] = 1.0                              # scale
    params[:, 59:62] = [0.0, 0.0, 600.0]             # in front of the cam
    out = tmp_path / "render"
    n = prerender_dataset(npz, params, str(out), dataset="nyu",
                          batch_size=2)
    assert n == N
    files = sorted(os.listdir(out))
    assert files == [f"render_{i:07d}.png" for i in range(1, N + 1)]
    import cv2
    img = cv2.imread(str(out / files[0]), cv2.IMREAD_ANYDEPTH)
    assert img.dtype == np.uint16 and img.shape == (480, 640)
    fg = img[img > 0]
    # the hand renders at ~600mm in front of the NYU camera
    assert len(fg) > 50 and 400 < np.median(fg) < 800
