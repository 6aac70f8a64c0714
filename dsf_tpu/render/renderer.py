"""Differentiable synth-sample factory and crop-frame renderer.

Functional rewrite of the reference `Render` module
(render_model/mano_layer.py:925-1356).  Key TPU-first change: depth is
rasterized DIRECTLY at crop pixels through M^-1 rays (see
ops/rasterize.py) instead of full-frame raster -> resize -> warp; labels
(JointTrans) use the same projection and matrix, so image/label
alignment is exact by construction.

All stochastic pieces (random depth placement, sphere occlusion
masking, synth noise) take explicit jax.random keys — replacing the
reference's global numpy/python RNG — so samples are reproducible and
shardable under pjit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from dsf_tpu import geometry as geo
from dsf_tpu.mano import model as mano
from dsf_tpu.ops import rasterize as ras

DEPTH_RANGE = {  # ref: mano_layer.py:978-981
    "nyu": (500.0, 1200.0),
    "msra": (150.0, 600.0),
    "icvl": (150.0, 600.0),
    "shrec": (500.0, 1200.0),
    "hands": (500.0, 1200.0),
}


@partial(jax.tree_util.register_dataclass,
         data_fields=["mano"],
         meta_fields=["paras", "img_size", "crop_size", "depth_range", "flip"])
@dataclasses.dataclass(frozen=True)
class Renderer:
    mano: mano.ManoModel
    paras: tuple              # (fx, fy, cx, cy)
    img_size: tuple           # (W, H) full frame
    crop_size: tuple = (128, 128)
    depth_range: tuple = (500.0, 1200.0)
    flip: float = 1.0

    @staticmethod
    def create(mano_model, dataset, paras, img_size, crop_size=(128, 128)):
        return Renderer(
            mano=mano_model, paras=tuple(paras), img_size=tuple(img_size),
            crop_size=tuple(crop_size),
            depth_range=DEPTH_RANGE.get(dataset, (500.0, 1200.0)))


def _raster_crop(r: Renderer, verts, M, stride=1):
    """Rasterize world-mm verts into the (crop/stride)^2 frame through M.

    Passing the pixel layout (tile_hw) lets the TPU backend use the
    bbox-predicated Pallas skip-raster (1.8x the dense scan at MANO
    scale, zbuf bitwise-equal — ops/rasterize.py skip notes); on CPU
    and for huge face counts rasterize_depth falls back to the dense
    scan / exact binned path.  stride > 1 rasters the
    nearest-downsample pixel subset directly (bitwise-equal to
    raster-then-resize_nearest, see crop_pixel_rays)."""
    rays = ras.crop_pixel_rays(M, r.crop_size, stride)
    z = ras.rasterize_depth(verts, r.mano.faces, rays, r.paras, r.flip,
                            tile_hw=(r.crop_size[1] // stride,
                                     r.crop_size[0] // stride))
    return z.reshape(verts.shape[0], 1, r.crop_size[1] // stride,
                     r.crop_size[0] // stride)


def _normalize(r: Renderer, depth_img, com_uvd, cube):
    return geo.normalize_depth(depth_img[:, 0], com_uvd[:, 2],
                               cube[:, 2])[:, None]


def synth_sample(r: Renderer, key, model_para, cube,
                 center3d=None, augment_view=None, augment_shape=None,
                 augment_center=None, augment_size=None, mask=True):
    """Synthetic training-sample factory (ref: Render.forward,
    mano_layer.py:983-1039).

    model_para: (B, 62) [rot3 | pose45 | shape10 | cam4].  Returns
    (img, joint_uvd, verts_uvd, joint_xyz, verts_xyz, center3d, cube, M).
    """
    B = model_para.shape[0]
    rot, theta, beta, cam = mano.split_params(model_para)
    if augment_shape is not None:
        beta = beta + augment_shape

    verts, joints = mano.get_mano_vertices(r.mano, rot, theta, beta, cam)
    synth_center = joints.mean(axis=1, keepdims=True)
    verts = verts - synth_center
    joints = joints - synth_center

    if center3d is None:
        key, sub = jax.random.split(key)
        z = jax.random.uniform(sub, (B, 1),
                               minval=r.depth_range[0], maxval=r.depth_range[1])
        center3d = jnp.concatenate([jnp.zeros((B, 2)), z], axis=-1)

    verts = verts + center3d[:, None]
    joints = joints + center3d[:, None]

    if augment_view is not None:
        verts = geo.rotate_points_about(verts, center3d, augment_view)
        joints = geo.rotate_points_about(joints, center3d, augment_view)
    if augment_center is not None:
        center3d = center3d + augment_center
    if augment_size is not None:
        cube = cube * augment_size

    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    M = geo.crop_matrix(com_uvd, cube, r.paras, r.crop_size)

    depth = _raster_crop(r, verts, M)
    img = _normalize(r, depth, com_uvd, cube)

    joint_uvd = geo.joint_trans(joints, M, com_uvd, cube, r.paras,
                                r.crop_size[0], r.flip)
    verts_uvd = geo.joint_trans(verts, M, com_uvd, cube, r.paras,
                                r.crop_size[0], r.flip)
    joint_xyz = (joints - center3d[:, None]) / cube[:, None] * 2.0
    verts_xyz = (verts - center3d[:, None]) / cube[:, None] * 2.0

    if mask:
        key, sub = jax.random.split(key)
        img = mask_img(sub, img, joint_uvd, 0.15, 0.3)
    return img, joint_uvd, verts_uvd, joint_xyz, verts_xyz, center3d, cube, M


def render_params(r: Renderer, model_para, center3d, cube, img_stride=1):
    """Crop-frame re-render of predicted MANO params (ref: Render.render,
    mano_layer.py:1071-1097; cam lives in normalized units via the 1/125
    global pre-scale).

    Returns (img, joint_uvd, joint_xyz, mesh_xyz) — xyz in normalized
    cube units, img normalized depth.  ``img_stride`` > 1 renders the
    image at crop/stride resolution (the nearest-downsample pixel
    subset, bitwise-equal to full render + resize_nearest) — used by the
    net's internal stage-2 input render whose consumer (the 64x64 remap
    codec) nearest-downsamples anyway.
    """
    rot, theta, beta, cam = mano.split_params(model_para)
    verts, joints = mano.get_mano_vertices(r.mano, rot, theta, beta, cam,
                                           global_scale=1.0 / 125.0)
    verts = verts * cube[:, None] / 2.0 + center3d[:, None]
    joints = joints * cube[:, None] / 2.0 + center3d[:, None]

    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    M = geo.crop_matrix(com_uvd, cube, r.paras, r.crop_size)
    depth = _raster_crop(r, verts, M, img_stride)
    img = _normalize(r, depth, com_uvd, cube)

    joint_uvd = geo.joint_trans(joints, M, com_uvd, cube, r.paras,
                                r.crop_size[0], r.flip)
    joint_xyz = (joints - center3d[:, None]) / cube[:, None] * 2.0
    mesh_xyz = (verts - center3d[:, None]) / cube[:, None] * 2.0
    return img, joint_uvd, joint_xyz, mesh_xyz


def normal_render(r: Renderer, model_para, center3d, cube):
    """Variant placing the normalized mesh with (v+1)/2*cube + center
    (ref: Render.normal_render, mano_layer.py:1042-1068)."""
    rot, theta, beta, cam = mano.split_params(model_para)
    verts, joints = mano.get_mano_vertices(r.mano, rot, theta, beta, cam,
                                           global_scale=1.0 / 125.0)
    verts = (verts + 1.0) / 2.0 * cube[:, None] + center3d[:, None]
    joints = (joints + 1.0) / 2.0 * cube[:, None] + center3d[:, None]
    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    M = geo.crop_matrix(com_uvd, cube, r.paras, r.crop_size)
    depth = _raster_crop(r, verts, M)
    img = _normalize(r, depth, com_uvd, cube)
    joint_uvd = geo.joint_trans(joints, M, com_uvd, cube, r.paras,
                                r.crop_size[0], r.flip)
    joint_xyz = (joints - center3d[:, None]) / cube[:, None] * 2.0
    verts_xyz = (verts - center3d[:, None]) / cube[:, None] * 2.0
    return img, joint_uvd, joint_xyz, verts_xyz


def m_render(r: Renderer, key, model_para, center3d, cube, M, mask=True):
    """Render raw-unit params through a GIVEN crop matrix (ref:
    Render.M_render, mano_layer.py:1100-1131).  Returns the image only."""
    rot, theta, beta, cam = mano.split_params(model_para)
    verts, joints = mano.get_mano_vertices(r.mano, rot, theta, beta, cam)
    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    depth = _raster_crop(r, verts, M)
    img = _normalize(r, depth, com_uvd, cube)
    if mask:
        joint_uvd = geo.joint_trans(joints, M, com_uvd, cube, r.paras,
                                    r.crop_size[0], r.flip)
        img = mask_img(key, img, joint_uvd, 0.15, 0.3)
    return img


def mesh_to_img(r: Renderer, hand_mesh, center3d, cube):
    """World-mm mesh -> normalized crop depth (ref: Render.mesh2img,
    mano_layer.py:1190-1202)."""
    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    M = geo.crop_matrix(com_uvd, cube, r.paras, r.crop_size)
    depth = _raster_crop(r, hand_mesh, M)
    return _normalize(r, depth, com_uvd, cube)


def get_depth(r: Renderer, verts, joints, center3d, cube, M, rot=None):
    """Render given world verts through a given M, with optional extra
    view rotation (ref: Render.getDepth, mano_layer.py:1204-1218)."""
    com_uvd = geo.xyz_to_uvd(center3d[:, None], r.paras, r.flip)[:, 0]
    if rot is not None:
        verts = geo.rotate_points_about(verts, center3d, rot)
        joints = geo.rotate_points_about(joints, center3d, rot)
    depth = _raster_crop(r, verts, M)
    img = _normalize(r, depth, com_uvd, cube)
    joint_uvd = geo.joint_trans(joints, M, com_uvd, cube, r.paras,
                                r.crop_size[0], r.flip)
    return img, joint_uvd


def get_mesh_xyz(r: Renderer, model_para):
    """Params -> (joints, mesh) in normalized units (ref: get_mesh_xyz,
    mano_layer.py:1171-1177)."""
    rot, theta, beta, cam = mano.split_params(model_para)
    verts, joints = mano.get_mano_vertices(r.mano, rot, theta, beta, cam,
                                           global_scale=1.0 / 125.0)
    return joints, verts


# ---------------------------------------------------------------------------
# image-space augmentations
# ---------------------------------------------------------------------------

def mask_img(key, img, img_joint, mask_offset=0.15, mask_para=0.3,
             min_mask_num=3, max_mask_num=10):
    """Random sphere occlusion around joints (ref: Render.mask_img,
    mano_layer.py:1326-1340): pick 3..9 joints (shared across the batch,
    as the reference's numpy choice is), jitter them, and white out
    pixels within a random radius in normalized (u, v, d) space.

    Fixed-shape version: always evaluates max_mask_num spheres, the ones
    beyond the drawn count are disabled via an infinite radius offset.
    """
    B, _, H, W = img.shape
    J = img_joint.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)

    n_active = jax.random.randint(k1, (), min_mask_num, max_mask_num)
    joint_ids = jax.random.permutation(k2, J)[:max_mask_num]
    active = (jnp.arange(max_mask_num) < n_active)

    mask_uvd = img_joint[:, joint_ids, :]                    # (B, K, 3)
    offs = (jax.random.uniform(k3, mask_uvd.shape) - 0.5) * mask_offset * 2
    mask_uvd = mask_uvd + offs
    radius = jax.random.uniform(k4, (B, max_mask_num)) * mask_para
    radius = jnp.where(active[None], radius, -1.0)           # disabled: r<0

    r = (jnp.arange(W, dtype=img.dtype) + 0.5) / W * 2.0 - 1.0
    vv, uu = jnp.meshgrid(r, r, indexing="ij")
    pix = jnp.stack([uu, vv], -1).reshape(1, 1, H * W, 2)
    pix_d = img.reshape(B, 1, H * W, 1)
    pix_uvd = jnp.concatenate([jnp.broadcast_to(pix, (B, 1, H * W, 2)), pix_d],
                              axis=-1)
    dist = jnp.sqrt(jnp.sum(
        (pix_uvd - mask_uvd[:, :, None, :]) ** 2, axis=-1))   # (B, K, HW)
    hit = (dist < radius[:, :, None]).any(axis=1)
    return jnp.where(hit.reshape(B, 1, H, W), 1.0, img)


def _gaussian_kernel(size=5, sigma=1.7, dtype=jnp.float32):
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(x / sigma) ** 2 / 2.0)
    k = g[:, None] * g[None, :]
    return k / k.sum()


def synth2real(key, img, noise=0.1, noise_patch=2, sigma=1.7, bk_value=0.95):
    """Synth depth -> pseudo-real: patchy white noise on foreground +
    gaussian blur (ref: Render.synth2real, mano_layer.py:1222-1231)."""
    B, C, H, W = img.shape
    n = jax.random.normal(key, (B, C, H // noise_patch, W // noise_patch)) * noise
    n = jnp.repeat(jnp.repeat(n, noise_patch, -1), noise_patch, -2)
    img = img + n * (img < bk_value).astype(img.dtype)
    if sigma != 0:
        pad = 2
        x = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
        k = _gaussian_kernel(5, sigma, img.dtype)[None, None]
        img = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return img


def patch_gaussian(key, img, patch_scale=0.125):
    """Patchy uniform noise on foreground (ref: PatchGaussian,
    mano_layer.py:1349-1355)."""
    B, C, H, W = img.shape
    ps = int(H * patch_scale)
    n = (jax.random.uniform(key, (B, C, ps, ps)) - 0.5) * 0.1
    up = int(1 / patch_scale)
    n = jnp.repeat(jnp.repeat(n, up, -1), up, -2)
    return img + (img < 0.99).astype(img.dtype) * n


def mass_center(img):
    """Center of mass (u, v, d) of foreground (>0) pixels (ref:
    Render.massCenter, mano_layer.py:1275-1286)."""
    B, C, H, W = img.shape
    x = jnp.arange(H, dtype=img.dtype)
    y = jnp.arange(W, dtype=img.dtype)
    xv, yv = jnp.meshgrid(x, y, indexing="ij")
    stacked = jnp.concatenate(
        [jnp.broadcast_to(yv, (B, 1, H, W)),
         jnp.broadcast_to(xv, (B, 1, H, W)), img], axis=1)
    fg = (img > 0).astype(img.dtype)
    return (stacked * fg).mean((-1, -2)) / fg.mean((-1, -2))
