"""Tests: grid_sample parity vs torch, fixed-N cloud ops, crop_hand."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsf_tpu import geometry as geo
from dsf_tpu.ops import image as I
from dsf_tpu.ops import cloud

NYU = (588.03, 587.07, 320.0, 240.0)


def test_grid_sample_matches_torch_nearest_and_bilinear():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 24, 32).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (2, 10, 12, 2)).astype(np.float32)
    for mode in ("nearest", "bilinear"):
        expected = torch.nn.functional.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid), mode=mode,
            padding_mode="zeros", align_corners=False).numpy()
        got = np.asarray(I.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                       mode=mode, align_corners=False))
        # nearest: allow rare half-pixel rounding ties at exact .5 coords
        if mode == "nearest":
            assert (np.isclose(got, expected, atol=1e-5).mean()) > 0.99
        else:
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    img = rng.randn(1, 1, 128, 128).astype(np.float32)
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(img), size=(64, 64)).numpy()
    got = np.asarray(I.resize_nearest(jnp.asarray(img), (64, 64)))
    np.testing.assert_allclose(got, expected)


def test_img_to_pcl_fixed_shape_and_valid():
    """All sampled points must come from foreground pixels, mapped
    through the correct geometry."""
    rng = np.random.RandomState(2)
    B, S, N = 2, 128, 256
    center = jnp.asarray([[0.0, 0.0, 750.0]] * B)
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, NYU)
    M = geo.crop_matrix(com, cube, NYU, (S, S))
    img = jnp.ones((B, 1, S, S))
    # a foreground square at depth 0.2 (normalized)
    img = img.at[:, :, 40:80, 50:90].set(0.2)
    pcl = cloud.img_to_pcl(jax.random.PRNGKey(0), img, center, M, cube,
                           NYU, S, N, S)
    assert pcl.shape == (B, N, 3)
    p = np.asarray(pcl)
    # z of all sampled points equals the normalized 0.2 plane
    np.testing.assert_allclose(p[..., 2], 0.2, atol=1e-3)


def test_img_to_pcl_empty_image_zeros():
    B, S, N = 1, 64, 128
    center = jnp.asarray([[0.0, 0.0, 750.0]])
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, NYU)
    M = geo.crop_matrix(com, cube, NYU, (S, S))
    img = jnp.ones((B, 1, S, S))          # all background
    pcl = cloud.img_to_pcl(jax.random.PRNGKey(0), img, center, M, cube,
                           NYU, S, N, S)
    np.testing.assert_allclose(np.asarray(pcl), 0.0)


def test_img_to_pcl_cosort_matches_topk_reference():
    """The co-sorted sampling path (r5) must reproduce the original
    top_k + double-gather formulation EXACTLY, including the wrap
    regime (n_valid << sample_num -> modular repetition of the valid
    prefix).  Both paths share the score construction; this pins the
    stable co-sort + one-hot wrap-fill to the reference semantics."""
    import jax.numpy as jnp
    from dsf_tpu import geometry as geo2

    B, S, N = 2, 64, 512
    center = jnp.asarray([[0.0, 0.0, 750.0]] * B)
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, NYU)
    M = geo.crop_matrix(com, cube, NYU, (S, S))
    img = jnp.ones((B, 1, S, S))
    # sample 0: 37 foreground pixels (wrap regime, 37 << 512);
    # sample 1: a large square (> 512 valid, truncation regime)
    img = img.at[0, :, 10:11, 5:42].set(0.3)
    img = img.at[1, :, 8:56, 8:56].set(0.5)

    for key in (None, jax.random.PRNGKey(3)):
        got = cloud.img_to_pcl(key, img, center, M, cube, NYU, S, N, S)

        # reference formulation (pre-r5 code path, verbatim semantics)
        img_rs = cloud.resize_nearest(img, (S, S))
        uvd = cloud.uvd_image_grid(img_rs, S).reshape(B, 3, -1)
        uvd = uvd.transpose(0, 2, 1)
        valid = (img_rs <= 0.99).reshape(B, -1)
        xyz = geo2.uvd_nl_to_xyz_nl(uvd, center, M, cube, NYU, S, 1.0)
        if key is None:
            p = valid.shape[-1]
            score = jnp.broadcast_to(
                ((jnp.arange(p, dtype=jnp.uint32) * jnp.uint32(2654435761))
                 >> 8).astype(jnp.float32) / jnp.float32(1 << 24),
                valid.shape)
        else:
            score = jax.random.uniform(key, valid.shape)
        score = jnp.where(valid, score, -1.0)
        _, order = jax.lax.top_k(score, N)
        n_valid = valid.sum(-1)
        take = jnp.arange(N)[None, :] % jnp.maximum(
            jnp.minimum(n_valid, N), 1)[:, None]
        idx = jnp.take_along_axis(order, take, axis=-1)
        ref = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        ref = jnp.where((n_valid > 0)[:, None, None], ref, 0.0)

        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_crop_hand_removes_outside():
    B, S = 1, 64
    center = jnp.asarray([[0.0, 0.0, 750.0]])
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, NYU)
    M = geo.crop_matrix(com, cube, NYU, (S, S))
    img = jnp.full((B, 1, S, S), 0.0)     # everything at center depth
    # joints clustered at the center -> only a small box kept
    joints = jnp.zeros((B, 21, 3))
    out = cloud.crop_hand(img, joints, center, M, cube, NYU, S,
                          offsetxy=20.0, offsetz=20.0)
    arr = np.asarray(out[0, 0])
    assert arr[S // 2, S // 2] == 0.0     # center kept
    assert arr[2, 2] == 1.0               # far corner removed -> background
    assert (arr == 1.0).sum() > (arr == 0.0).sum() * 0  # some removed


def test_pcl_roundtrip_through_image():
    """xyz -> image (pcl_to_img) -> cloud (img_to_pcl) keeps depth."""
    B, S, N = 1, 128, 64
    center = jnp.asarray([[0.0, 0.0, 750.0]])
    cube = jnp.full((B, 3), 250.0)
    com = geo.xyz_to_uvd(center, NYU)
    M = geo.crop_matrix(com, cube, NYU, (S, S))
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 3)).astype(np.float32))
    img = cloud.pcl_to_img(pts, S, center, M, cube, NYU, S)
    assert img.shape == (B, 1, S, S)
    fg = np.asarray(img[0, 0])
    assert (fg < 0.99).sum() >= N * 0.5   # most points landed


def test_roi_align_identity_and_pool():
    """RoIAlign parity op (ref mano_layer.py:963-964): a full-image ROI
    at the output resolution is an identity; at half resolution with
    sampling_ratio=2 it is exact 2x2 average pooling."""
    from dsf_tpu.ops.image import roi_align
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 3, 8, 8).astype(np.float32))
    rois = jnp.asarray([[0, 0, 0, 8, 8], [1, 0, 0, 8, 8]], jnp.float32)

    out = roi_align(img, rois, (8, 8), spatial_scale=1.0, sampling_ratio=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    pooled = roi_align(img, rois, (4, 4), spatial_scale=1.0,
                       sampling_ratio=2)
    ref = np.asarray(img).reshape(2, 3, 4, 2, 4, 2).mean((3, 5))
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=1e-6)


def test_roi_align_batch_index_and_subwindow():
    from dsf_tpu.ops.image import roi_align
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(2, 1, 16, 16).astype(np.float32))
    # 4x4 sub-window of image 1 at integer offsets, output 4x4 = identity
    rois = jnp.asarray([[1, 4, 8, 8, 12]], jnp.float32)
    out = roi_align(img, rois, (4, 4), sampling_ratio=1)
    np.testing.assert_allclose(np.asarray(out)[0, 0],
                               np.asarray(img)[1, 0, 8:12, 4:8], atol=1e-6)
