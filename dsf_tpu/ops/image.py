"""Image resampling ops: nearest/bilinear resize and grid_sample.

Gather-based XLA implementations matching torch semantics used by the
reference (F.interpolate default nearest, F.grid_sample
align_corners=False), so weight-converted checkpoints see identical
inputs.  Images are NCHW throughout (matching the reference's layout).
"""

from __future__ import annotations

import jax.numpy as jnp


def resize_nearest(img, out_hw):
    """torch F.interpolate(img, size=out_hw) default (nearest) semantics:
    src index = floor(dst * in/out).  img: (..., H, W)."""
    H, W = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    ih = jnp.floor(jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    return img[..., ih[:, None], iw[None, :]]


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(img, grid, mode="nearest", align_corners=False):
    """torch F.grid_sample with zeros padding.

    img: (B, C, H, W); grid: (B, Ho, Wo, 2) with x (width) first, in
    [-1, 1].  mode: 'nearest' (round-half-even like torch) or 'bilinear'.
    """
    B, C, H, W = img.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    def gather(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ix_c = jnp.clip(ix, 0, W - 1)
        iy_c = jnp.clip(iy, 0, H - 1)
        # (B, Ho, Wo) indices into (B, C, H, W)
        out = img[jnp.arange(B)[:, None, None], :, iy_c, ix_c]  # (B,Ho,Wo,C)
        out = jnp.where(valid[..., None], out, 0.0)
        return jnp.moveaxis(out, -1, 1)  # (B, C, Ho, Wo)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        return gather(ix, iy)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def warp_perspective(img, M, crop_size, mode="nearest"):
    """Crop-warp an NCHW image by 3x3 matrix M (full-frame px -> crop px).

    Equivalent to the reference's warpPerspective
    (mano_layer.py:1244-1260): builds the grid from INTEGER crop coords
    mapped through M^-1 and samples with zeros padding.
    """
    from dsf_tpu import geometry as geo

    B, C, H, W = img.shape
    cw, ch = crop_size
    u, v = jnp.meshgrid(jnp.arange(cw, dtype=img.dtype),
                        jnp.arange(ch, dtype=img.dtype), indexing="xy")
    pix = jnp.stack([u, v, jnp.ones_like(u)], axis=-1).reshape(1, -1, 3)
    Minv = geo.inv_3x3(M)
    uv = geo.transform_points_2d(jnp.broadcast_to(pix, (B, ch * cw, 3)), Minv)
    gx = uv[..., 0] / W * 2.0 - 1.0
    gy = uv[..., 1] / H * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(B, ch, cw, 2)
    return grid_sample(img, grid, mode=mode, align_corners=False)


def affine_warp(img, theta, mode="bilinear"):
    """torch affine_grid(theta) + grid_sample composition (used by the
    cycle-consistency augmentation, render_loader.py:1238-1241 and CCSSL
    TTA, CCSSL/consistency.py:97-107).  theta: (B, 2, 3) output->input map
    in normalized coords, align_corners=False."""
    B, C, H, W = img.shape
    ys = (jnp.arange(H) + 0.5) / H * 2.0 - 1.0
    xs = (jnp.arange(W) + 0.5) / W * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(1, H * W, 3)
    grid = jnp.einsum("bij,bnj->bni", theta, jnp.broadcast_to(base, (B, H * W, 3)))
    grid = grid.reshape(B, H, W, 2)
    return grid_sample(img, grid, mode=mode, align_corners=False)
