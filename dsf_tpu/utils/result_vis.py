"""Result visualization: render exported predictions over depth frames
as images or a video (ref: result2video / result2Img,
render_loader.py:5339-5486), and transfer-net A/B comparisons
(ref: compare_transferNet_*, :5225-5328)."""

from __future__ import annotations

import os

import numpy as np

from dsf_tpu.utils.vis import draw_2d_pose, depth_to_u8


def results_to_images(result_txt, dataset, out_dir, limit=None,
                      draw_dataset="MANO"):
    """result_*.txt rows (world uvd, J*3) + a dataset -> overlay PNGs."""
    import cv2
    from dsf_tpu.data import crop as C
    preds = np.loadtxt(result_txt)
    preds = preds.reshape(len(preds), -1, 3)
    os.makedirs(out_dir, exist_ok=True)
    n = len(preds) if limit is None else min(limit, len(preds))
    for i in range(n):
        item = dataset[i]
        uvd_world = preds[i]
        # world uvd -> normalized crop uvd through the sample's M
        uvd_crop = C.transform_points_2d(uvd_world.copy(), item["M"])
        uvd_crop[:, :2] = uvd_crop[:, :2] / (item["img"].shape[-1] / 2) - 1
        img = draw_2d_pose(item["img"][0], uvd_crop, draw_dataset)
        cv2.imwrite(os.path.join(out_dir, f"{i:06d}.png"), img[:, :, ::-1])
    return n


def results_to_video(result_txt, dataset, out_path, fps=25, limit=None):
    """Same overlays muxed into an mp4 (ref: result2video)."""
    import cv2
    tmp_dir = out_path + "_frames"
    n = results_to_images(result_txt, dataset, tmp_dir, limit)
    first = cv2.imread(os.path.join(tmp_dir, "000000.png"))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    for i in range(n):
        vw.write(cv2.imread(os.path.join(tmp_dir, f"{i:06d}.png")))
    vw.release()
    return out_path


def compare_transfer_net(imgs, transfer_apply, out_path):
    """Side-by-side synth | transferred grid image."""
    import cv2
    out = np.asarray(transfer_apply(imgs))
    rows = []
    for a, b in zip(np.asarray(imgs), out):
        rows.append(np.concatenate([depth_to_u8(a), depth_to_u8(b)], axis=1))
    grid = np.concatenate(rows, axis=0)
    cv2.imwrite(out_path, grid)
    return out_path
