"""Camera / crop / normalized-coordinate geometry core (pure jnp).

This is the shared substrate of the data pipeline, the differentiable
renderer and the losses.  Semantics follow the reference implementation
(see /root/reference/data/render_loader.py:70-353, 1044-1118 and
render_model/mano_layer.py:1133-1324) with one deliberate unification:
there is exactly ONE implementation of each transform here, used on both
the host path and inside jit.

Conventions
-----------
* ``paras = (fx, fy, fu, fv)`` pinhole intrinsics, pixels.
* ``uvd``: image coords (u: column, v: row, d: depth mm).
* ``xyz``: camera-space mm.  ``flip`` multiplies the y-axis when moving
  between image and camera space (NYU uses flip=+1, ICVL flip=-1;
  ref: render_loader.py:290-334).
* Normalized crop coords: uv in [-1, 1] over the crop, d in [-1, 1] over
  the cube depth range.
* Crop matrices ``M`` are 3x3 projective maps full-frame-pixels -> crop
  pixels (ref: Offset2Trans, mano_layer.py:1143-1169).

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# camera projection
# ---------------------------------------------------------------------------

def uvd_to_xyz(uvd, paras, flip=1.0):
    """Image coords -> camera-space mm (ref: jointImgTo3D, render_loader.py:290)."""
    fx, fy, fu, fv = paras
    x = (uvd[..., 0] - fu) * uvd[..., 2] / fx
    y = flip * (uvd[..., 1] - fv) * uvd[..., 2] / fy
    return jnp.stack([x, y, uvd[..., 2]], axis=-1)


def xyz_to_uvd(xyz, paras, flip=1.0):
    """Camera-space mm -> image coords (ref: joint3DToImg, render_loader.py:313).

    Adds 1e-8 to z as the tensor variant does (render_loader.py:350) so
    gradients through points at z==0 stay finite.
    """
    fx, fy, fu, fv = paras
    z = xyz[..., 2]
    u = xyz[..., 0] * fx / (z + 1e-8) + fu
    v = flip * xyz[..., 1] * fy / (z + 1e-8) + fv
    return jnp.stack([u, v, z], axis=-1)


# ---------------------------------------------------------------------------
# crop bounds and matrices
# ---------------------------------------------------------------------------

def com_to_bounds(com, size, paras):
    """Center-of-mass + cube -> pixel/depth bounds of the crop volume.

    Returns float arrays; x/y bounds carry the reference's
    ``floor(. + 0.5)`` integer snapping (ref: comToBounds,
    render_loader.py:356-364 / mano_layer.py:1133-1141).
    """
    fx, fy, _, _ = paras
    cx, cy, cz = com[..., 0], com[..., 1], com[..., 2]
    sx, sy, sz = size[..., 0], size[..., 1], size[..., 2]
    zstart = cz - sz / 2.0
    zend = cz + sz / 2.0
    xstart = jnp.floor((cx * cz / fx - sx / 2.0) / cz * fx + 0.5)
    xend = jnp.floor((cx * cz / fx + sx / 2.0) / cz * fx + 0.5)
    ystart = jnp.floor((cy * cz / fy - sy / 2.0) / cz * fy + 0.5)
    yend = jnp.floor((cy * cz / fy + sy / 2.0) / cz * fy + 0.5)
    return xstart, xend, ystart, yend, zstart, zend


def bounds_to_trans(xstart, xend, ystart, yend, crop_size):
    """Bounds -> 3x3 crop matrix M (full-frame px -> crop px).

    Aspect-preserving scale + centering, with the reference's
    RENDER-side integer truncations kept bit-for-bit (ref: Offset2Trans,
    mano_layer.py:1143-1169, which truncates sz to int BEFORE the
    centering floor).  NOTE: the reference's loader-side comToTransform
    (render_loader.py:366-401) keeps sz as float there, so the two
    sides of the reference can differ by 1px of centering offset for
    some samples; this function is the render-side flavor (all in-graph
    renders), while data/crop.py reproduces the loader flavor for the
    host crop path.  Both are A/B-tested against their respective
    reference copies.
    """
    cw, ch = float(crop_size[0]), float(crop_size[1])
    wb = xend - xstart
    hb = yend - ystart
    w_gt_h = wb > hb

    s = jnp.where(w_gt_h, cw / wb, ch / hb)
    sz0 = jnp.where(w_gt_h, cw, jnp.trunc(wb * cw / hb))
    sz1 = jnp.where(w_gt_h, jnp.trunc(hb * cw / wb), ch)

    offx = jnp.floor(cw / 2.0 - sz0 / 2.0)
    offy = jnp.floor(ch / 2.0 - sz1 / 2.0)

    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    # off @ scale @ trans, composed in closed form.
    m00 = s
    m02 = s * (-xstart) + offx
    m11 = s
    m12 = s * (-ystart) + offy
    row0 = jnp.stack([m00, zeros, m02], axis=-1)
    row1 = jnp.stack([zeros, m11, m12], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def crop_matrix(com_uvd, cube, paras, crop_size):
    """com (uvd) + cube -> 3x3 crop matrix (comToBounds ∘ Offset2Trans)."""
    xs, xe, ys, ye, _, _ = com_to_bounds(com_uvd, cube, paras)
    return bounds_to_trans(xs, xe, ys, ye, crop_size)


def inv_3x3(M):
    """Closed-form (adjugate) inverse of (..., 3, 3) matrices.

    Avoids LU decomposition (unsupported for some dtypes on TPU) and is
    exact for the affine similarity crop matrices used here.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            A, -(b * i - c * h), b * f - c * e,
            B, a * i - c * g, -(a * f - c * d),
            C, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(M.shape)
    return adj / det[..., None, None]


def transform_points_2d(pts, M):
    """Apply a 3x3 matrix to the uv part of (..., N, 3) points, keep d.

    (ref: get_trans_points, render_loader.py:1113-1118 — affine use, no
    perspective divide.)

    Written elementwise rather than as a matmul: full f32 precision
    regardless of the backend's default (TPU matmuls default to bf16
    inputs) and no tiny-matmul overhead.
    """
    Mb = M[..., None, :, :]  # broadcast over the points axis
    u, v = pts[..., 0], pts[..., 1]
    un = Mb[..., 0, 0] * u + Mb[..., 0, 1] * v + Mb[..., 0, 2]
    vn = Mb[..., 1, 0] * u + Mb[..., 1, 1] * v + Mb[..., 1, 2]
    return jnp.stack([un, vn, pts[..., 2]], axis=-1)


# ---------------------------------------------------------------------------
# depth normalization
# ---------------------------------------------------------------------------

def normalize_depth(img, com_z, cube_z):
    """Depth (mm, 0/-1 = background) -> [-1, 1], background at +1.

    (ref: Render.normalize_img, mano_layer.py:1289-1299.)
    ``img``: (..., H, W); ``com_z``/``cube_z``: broadcastable scalars.
    """
    com_z = jnp.asarray(com_z)[..., None, None]
    cube_z = jnp.asarray(cube_z)[..., None, None]
    z_min = com_z - cube_z / 2.0
    z_max = com_z + cube_z / 2.0
    img = jnp.where((img == -1) | (img == 0), z_max, img)
    img = jnp.clip(img, z_min, z_max)
    return (img - com_z) / (cube_z / 2.0)


# ---------------------------------------------------------------------------
# normalized crop coords <-> normalized camera coords
# ---------------------------------------------------------------------------

def uvd_nl_to_xyz(uvd_nl, center, M, cube, paras, img_size, flip=1.0):
    """Normalized crop uvd -> camera xyz in mm (ref: uvd_nl2xyz_tensor,
    render_loader.py:1044-1057)."""
    Minv = inv_3x3(M)
    uv = (uvd_nl[..., 0:2] + 1.0) * (img_size / 2.0)
    d = uvd_nl[..., 2:3] * (cube[..., None, 2:3] / 2.0) + center[..., None, 2:3]
    uvd = jnp.concatenate([uv, d], axis=-1)
    uvd_ff = transform_points_2d(uvd, Minv)
    return uvd_to_xyz(uvd_ff, paras, flip)


def uvd_nl_to_xyz_nl(uvd_nl, center, M, cube, paras, img_size, flip=1.0):
    """Normalized crop uvd -> normalized camera xyz (ref:
    uvd_nl2xyznl_tensor, render_loader.py:1059-1073)."""
    xyz = uvd_nl_to_xyz(uvd_nl, center, M, cube, paras, img_size, flip)
    return (xyz - center[..., None, :]) / (cube[..., None, :] / 2.0)


def xyz_nl_to_uvd_nl(xyz_nl, center, M, cube, paras, img_size, flip=1.0):
    """Normalized camera xyz -> normalized crop uvd (ref:
    xyz_nl2uvdnl_tensor, render_loader.py:1075-1088)."""
    xyz = xyz_nl * (cube[..., None, :] / 2.0) + center[..., None, :]
    uvd = xyz_to_uvd(xyz, paras, flip)
    uvd_c = transform_points_2d(uvd, M)
    uv_nl = uvd_c[..., 0:2] / img_size * 2.0 - 1.0
    d_nl = (uvd_c[..., 2:3] - center[..., None, 2:3]) / (cube[..., None, 2:3] / 2.0)
    return jnp.concatenate([uv_nl, d_nl], axis=-1)


def joint_trans(joint_xyz, M, com_uvd, cube, paras, crop_size, flip=1.0):
    """World xyz (mm) -> normalized crop uvd (ref: Render.JointTrans,
    mano_layer.py:1301-1309)."""
    uvd = xyz_to_uvd(joint_xyz, paras, flip)
    uvd_c = transform_points_2d(uvd, M)
    uv_nl = uvd_c[..., 0:2] / crop_size * 2.0 - 1.0
    d_nl = (uvd[..., 2:3] - com_uvd[..., None, 2:3]) / (cube[..., None, 2:3] / 2.0)
    return jnp.concatenate([uv_nl, d_nl], axis=-1)


# ---------------------------------------------------------------------------
# pixel grids
# ---------------------------------------------------------------------------

def norm_grid_center(n, dtype=jnp.float32):
    """Pixel-center normalized grid: (i + 0.5)/n * 2 - 1.

    Used by the offset codec (ref: generateFeature.py:22-23).
    Returns (xx, yy) each (n, n) where xx varies along axis 1 (u).
    """
    r = (jnp.arange(n, dtype=dtype) + 0.5) / n * 2.0 - 1.0
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    return xx, yy


def norm_grid_corner(n, dtype=jnp.float32):
    """Corner-anchored normalized grid: i/(n-1) * 2 - 1.

    Used by Img2pcl / uvdImg2xyzImg (ref: render_loader.py:1126-1127).
    Returns (xx, yy) each (n, n) where xx varies along axis 1 (u).
    """
    r = jnp.arange(n, dtype=dtype) / (n - 1.0) * 2.0 - 1.0
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    return xx, yy


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def quat_to_mat(quat):
    """Quaternion (w, x, y, z) -> rotation matrix, normalizing first.

    (ref: quat2mat, mano_layer.py:773-794; batched over leading dims.)
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rodrigues(theta):
    """Axis-angle (..., 3) -> rotation matrix via the half-angle quaternion.

    Matches the reference's epsilon treatment (norm of theta+1e-8;
    ref: batch_rodrigues, mano_layer.py:797-805).
    """
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_mat(quat)


def rotate_points_about(points, center, rot_vec):
    """Rotate (..., N, 3) points about ``center`` by axis-angle ``rot_vec``.

    (ref: RotationPoints, mano_layer.py:874-884.)
    """
    R = rodrigues(rot_vec)
    p = points - center[..., None, :]
    p = jnp.einsum("...ij,...nj->...ni", R, p)
    return p + center[..., None, :]
