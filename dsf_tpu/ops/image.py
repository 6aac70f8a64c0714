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


def roi_align(img, rois, out_hw, spatial_scale=1.0, sampling_ratio=1):
    """torchvision RoIAlign (aligned=False) parity op.

    The reference constructs RoIAlign for its resize/crop variants
    (render_model/mano_layer.py:963-964, used by ResizeRenderImg
    :1262-1273).  img: (B, C, H, W); rois: (N, 5) rows
    [batch_index, x1, y1, x2, y2] in input coordinates.  Each output
    pixel averages sampling_ratio^2 bilinear samples of its bin, exactly
    torchvision's (continuous-coordinate, half-pixel-center) sampling.
    Returns (N, C, out_h, out_w).
    """
    B, C, H, W = img.shape
    oh, ow = out_hw
    bidx = rois[:, 0].astype(jnp.int32)                       # (N,)
    x1, y1, x2, y2 = (rois[:, i] * spatial_scale for i in range(1, 5))
    bin_w = (x2 - x1) / ow                                    # (N,)
    bin_h = (y2 - y1) / oh
    s = max(int(sampling_ratio), 1)

    # sample positions: bin grid x sub-sample grid (torchvision places
    # sub-samples at (i + 0.5)/s within each bin)
    gx = jnp.arange(ow)[None, :, None]                        # (1, ow, 1)
    sx = (jnp.arange(s)[None, None, :] + 0.5) / s             # (1, 1, s)
    px = x1[:, None, None] + (gx + sx) * bin_w[:, None, None]  # (N, ow, s)
    gy = jnp.arange(oh)[None, :, None]
    sy = (jnp.arange(s)[None, None, :] + 0.5) / s
    py = y1[:, None, None] + (gy + sy) * bin_h[:, None, None]  # (N, oh, s)

    px = px.reshape(-1, ow * s)                               # (N, ow*s)
    py = py.reshape(-1, oh * s)
    # bilinear gather at continuous positions - 0.5 (half-pixel centers)
    fx = px - 0.5
    fy = py - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(ix, iy):
        # ix (N, ow*s), iy (N, oh*s) -> (N, C, oh*s, ow*s)
        valid = ((ix[:, None, :] >= 0) & (ix[:, None, :] < W)
                 & (iy[:, :, None] >= 0) & (iy[:, :, None] < H))
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        out = img[bidx[:, None, None], :, iyc[:, :, None], ixc[:, None, :]]
        out = jnp.moveaxis(out, -1, 1)                        # (N,C,oh*s,ow*s)
        return out * valid[:, None, :, :]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wxr = wx[:, None, None, :]
    wyr = wy[:, None, :, None]
    out = (v00 * (1 - wxr) * (1 - wyr) + v01 * wxr * (1 - wyr)
           + v10 * (1 - wxr) * wyr + v11 * wxr * wyr)
    # average the s x s sub-samples per bin
    N = rois.shape[0]
    out = out.reshape(N, C, oh, s, ow, s).mean(axis=(3, 5))
    return out
