"""Synthetic on-disk NYU-format dataset for end-to-end integration runs.

Renders random MANO hands with the device rasterizer and writes them in
the exact layout NYUDataset reads: packed-BGR depth PNGs,
joint_data.mat (3 views x N x 36 x 3), refined center files.  Lets the
full training/eval loop run on machines without the licensed datasets.
"""

from __future__ import annotations

import os

import numpy as np

from dsf_tpu.mano.constants import NYU_JOINT_SELECT, NYU_CALCULATE


def make_fake_nyu(root, mano_npz, n_train=64, n_test=32, seed=0):
    import cv2
    import scipy.io as sio
    import jax
    import jax.numpy as jnp
    from dsf_tpu.mano import model as mano_model
    from dsf_tpu.ops import rasterize as R

    paras = (588.03, 587.07, 320.0, 240.0)
    W, H = 640, 480
    m = mano_model.load_model(mano_npz)
    rays = R.full_frame_pixel_rays((W, H))
    rng = np.random.RandomState(seed)

    @jax.jit
    def render(params, center3d):
        rot, pose, shape, cam = mano_model.split_params(params)
        verts, joints = mano_model.get_mano_vertices(m, rot, pose, shape, cam)
        c = joints.mean(1, keepdims=True)
        verts = verts - c + center3d[:, None]
        joints = joints - c + center3d[:, None]
        z = R.rasterize_depth(verts, m.faces, rays, paras)
        return z.reshape(-1, H, W), joints

    for phase, n in (("train", n_train), ("test", n_test)):
        pdir = os.path.join(root, "nyu", phase)
        os.makedirs(pdir, exist_ok=True)
        B = 8
        all_joints = []
        centers = []
        idx = 0
        for s in range(0, n, B):
            k = min(B, n - s)
            para = np.concatenate([
                rng.uniform(-np.pi, np.pi, (B, 3)),
                rng.randn(B, 45) * 0.3, rng.randn(B, 10) * 0.5,
                np.ones((B, 1)), np.zeros((B, 3))], axis=1).astype(np.float32)
            center3d = np.concatenate(
                [rng.uniform(-60, 60, (B, 2)),
                 rng.uniform(600, 900, (B, 1))], axis=1).astype(np.float32)
            depth, joints = render(jnp.asarray(para), jnp.asarray(center3d))
            depth = np.asarray(depth)
            joints = np.asarray(joints)
            # the test loop evaluates all 3 NYU camera views
            # (train_render.py:878-888); reuse the same frame per view so
            # the fixture supports the full protocol
            n_views = 3 if phase == "test" else 1
            for b in range(k):
                d16 = depth[b].astype(np.uint16)
                bgr = np.zeros((H, W, 3), np.uint8)
                bgr[:, :, 0] = d16 & 0xFF            # B = low byte
                bgr[:, :, 1] = d16 >> 8              # G = high byte
                for v in range(n_views):
                    cv2.imwrite(os.path.join(
                        pdir, f"depth_{v + 1}_{idx + 1:07d}.png"), bgr)
                all_joints.append(joints[b])
                centers.append(center3d[b])
                idx += 1

        all_joints = np.stack(all_joints)            # (N, 21, 3)
        centers = np.stack(centers)

        # joint_data.mat: 36-joint raw layout; place our 21 MANO-ordered
        # joints so the select/calculate index maps recover 14 eval joints
        N = len(all_joints)
        raw_uvd = np.zeros((3, N, 36, 3), np.float32)
        raw_xyz = np.zeros((3, N, 36, 3), np.float32)
        # invert the NYU select/calculate chain approximately: write the
        # same 14-joint set into the slots the maps read
        sel = NYU_JOINT_SELECT[NYU_CALCULATE]        # 14 raw indices
        # use the first 14 of our 21 joints as the "eval" set
        fx, fy, fu, fv = (588.03, 587.07, 320.0, 240.0)
        for v in range(3):
            xyz14 = all_joints[:, :14]
            # the loader applies jointImgTo3D(joint3DToImg(xyz, flip=-1)):
            # y -> -y; pre-negate so it recovers our y
            xyz_neg = xyz14.copy()
            xyz_neg[:, :, 1] = -xyz_neg[:, :, 1]
            raw_xyz[v][:, sel] = xyz_neg
            uvd = xyz14.copy()
            uvd[:, :, 0] = xyz14[:, :, 0] * fx / xyz14[:, :, 2] + fu
            uvd[:, :, 1] = xyz14[:, :, 1] * fy / xyz14[:, :, 2] + fv
            raw_uvd[v][:, sel] = uvd
        sio.savemat(os.path.join(pdir, "joint_data.mat"),
                    {"joint_uvd": raw_uvd, "joint_xyz": raw_xyz})
        for v in range(3 if phase == "test" else 1):
            np.savetxt(os.path.join(pdir, f"center_{phase}_{v}_refined.txt"),
                       centers, fmt="%.4f")

        # per-frame MANO params (ref layout read_modelPara,
        # render_loader.py:1324-1332) for the self-training loader
        ppdir = os.path.join(root, "nyu", "posePara_lm_collosion")
        os.makedirs(ppdir, exist_ok=True)
        para_bank = np.concatenate([
            rng.uniform(-np.pi, np.pi, (n, 3)), rng.randn(n, 45) * 0.3,
            rng.randn(n, 10) * 0.5, np.ones((n, 1)), np.zeros((n, 3))],
            axis=1).astype(np.float32)
        for sfx, sl in (("glb", slice(0, 3)), ("pose", slice(3, 48)),
                        ("shape", slice(48, 58)), ("scale", slice(58, 59)),
                        ("trans", slice(59, 62))):
            np.savetxt(os.path.join(ppdir, f"nyu-{phase}-0-{sfx}.txt"),
                       para_bank[:, sl], fmt="%.6f")
    return root
