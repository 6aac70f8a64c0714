"""Logic parity of the Pallas kernels vs the XLA reference paths.

Runs the kernels in interpreter mode (tests force the CPU backend);
real-TPU parity/perf is exercised by bench.py and the verify recipe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


def _distinct_faces(rng, V, F):
    """Non-degenerate random faces (the kernels' documented
    precondition; real MANO meshes satisfy it)."""
    return np.stack([rng.choice(V, 3, replace=False)
                     for _ in range(F)]).astype(np.int32)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    import dsf_tpu.ops.pallas_raster as PR
    import dsf_tpu.ops.pallas_point_mesh as PPM
    monkeypatch.setattr(PR.pl, "pallas_call", patched)
    monkeypatch.setattr(PPM.pl, "pallas_call", patched)
    yield


def test_raster_kernel_matches_scan(interpret_pallas):
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.ops.pallas_raster import raster_pallas
    rng = np.random.RandomState(0)
    B, V, F = 2, 60, 130
    PARAS = (100.0, 100.0, 32.0, 32.0)
    verts = jnp.asarray((rng.randn(B, V, 3) * 10 + [0, 0, 100]).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((64, 64)), (B, 4096, 2))
    proj = R.project_verts(verts, PARAS)
    z1, i1 = R._raster_scan(proj, pix, faces)
    z2, i2 = raster_pallas(proj, pix, faces)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)
    assert float((i1 == i2).mean()) > 0.999


def test_skip_raster_matches_scan(interpret_pallas):
    """Bbox-predicated skip kernel == dense scan, bitwise (zbuf AND idx):
    the skip flags are conservative, loop order is chunk-major with the
    same `<` update, so results are identical by construction."""
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.ops.pallas_raster import raster_pallas_skip
    rng = np.random.RandomState(1)
    B, V, F = 2, 80, 300
    PARAS = (100.0, 100.0, 32.0, 32.0)
    verts = jnp.asarray(
        (rng.randn(B, V, 3) * 10 + [0, 0, 100]).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((64, 64)), (B, 4096, 2))
    proj = R.project_verts(verts, PARAS)
    z1, i1 = R._raster_scan(proj, pix, faces)
    z2, i2 = raster_pallas_skip(proj, pix, faces, tile=512, fc=128)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_skip_raster_2d_tiles_matches_scan(interpret_pallas):
    """tile_hw path: 2-D tile-major pixel blocks, untiled back to
    row-major — zbuf must stay bitwise-equal to the dense scan."""
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.ops.pallas_raster import raster_pallas_skip
    rng = np.random.RandomState(7)
    B, V, F = 2, 80, 300
    PARAS = (100.0, 100.0, 32.0, 32.0)
    verts = jnp.asarray(
        (rng.randn(B, V, 3) * 10 + [0, 0, 100]).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((64, 64)), (B, 4096, 2))
    proj = R.project_verts(verts, PARAS)
    z1, i1 = R._raster_scan(proj, pix, faces)
    z2, i2 = raster_pallas_skip(proj, pix, faces, fc=64,
                                tile_hw=(64, 64), block=(16, 16))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_skip_raster_mxu_matches_scan(interpret_pallas):
    """use_mxu path (edge/depth fields via one in-VMEM matmul): the dot
    reassociates the u*a + v*b + c reduction, so edge-pixel coverage and
    depths may differ by ulps from the scan — compare at that floor."""
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.ops.pallas_raster import raster_pallas_skip
    rng = np.random.RandomState(8)
    B, V, F = 2, 80, 300
    PARAS = (100.0, 100.0, 32.0, 32.0)
    verts = jnp.asarray(
        (rng.randn(B, V, 3) * 10 + [0, 0, 100]).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((64, 64)), (B, 4096, 2))
    proj = R.project_verts(verts, PARAS)
    z1, i1 = R._raster_scan(proj, pix, faces)
    z2, i2 = raster_pallas_skip(proj, pix, faces, fc=64,
                                tile_hw=(64, 64), block=(16, 16),
                                use_mxu=True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                               rtol=1e-5, atol=1e-3)
    assert float((np.asarray(i1) == np.asarray(i2)).mean()) > 0.99


def test_skip_raster_unaligned_pixels(interpret_pallas):
    """P not a multiple of the tile: padded pixels must come back as
    background and not disturb real ones."""
    from dsf_tpu.ops import rasterize as R
    from dsf_tpu.ops.pallas_raster import raster_pallas_skip
    rng = np.random.RandomState(4)
    B, V, F = 2, 40, 64
    PARAS = (100.0, 100.0, 16.0, 16.0)
    verts = jnp.asarray(
        (rng.randn(B, V, 3) * 6 + [0, 0, 80]).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((30, 30)), (B, 900, 2))
    proj = R.project_verts(verts, PARAS)
    z1, i1 = R._raster_scan(proj, pix, faces)
    z2, i2 = raster_pallas_skip(proj, pix, faces, tile=256, fc=64)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_face_moments_kernel_matches_einsum(interpret_pallas):
    """The Pallas moment kernel == the XLA chunked one-hot einsum that
    rasterize._attach_bwd uses on CPU (same contraction, same values)."""
    from dsf_tpu.ops.pallas_raster import face_moments_pallas
    rng = np.random.RandomState(2)
    B, P, T = 3, 1000, 333                  # deliberately unaligned
    idx = rng.randint(-1, T, (B, P)).astype(np.int32)
    upd = rng.randn(B, P, 3).astype(np.float32)
    upd[idx < 0] = 0.0
    mom = face_moments_pallas(jnp.asarray(idx), jnp.asarray(upd), T)
    onehot = (idx[:, :, None] == np.arange(T)[None, None]).astype(np.float64)
    ref = np.einsum("bpc,bpm->bcm", onehot, upd.astype(np.float64))
    np.testing.assert_allclose(np.asarray(mom), ref,
                               rtol=1e-6, atol=1e-5)


def test_face_moments_grad_path(interpret_pallas, monkeypatch):
    """rasterize's full backward with the Pallas moments == the XLA
    einsum path (grad wrt verts through rasterize_depth)."""
    from dsf_tpu.ops import rasterize as R
    rng = np.random.RandomState(3)
    B, V, F = 2, 60, 130
    PARAS = (100.0, 100.0, 32.0, 32.0)
    verts = jnp.asarray((rng.randn(B, V, 3) * 10 + [0, 0, 100])
                        .astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pix = jnp.broadcast_to(R.full_frame_pixel_rays((32, 32)), (B, 1024, 2))
    w = jnp.asarray(rng.randn(B, 1024).astype(np.float32))

    def loss(v):
        return jnp.sum(R.rasterize_depth(v, faces, pix, PARAS) * w)

    monkeypatch.setattr(R, "USE_PALLAS_MOMENTS", False)
    g_ref = jax.grad(loss)(verts)
    monkeypatch.setattr(R, "USE_PALLAS_MOMENTS", True)
    monkeypatch.setattr(R.jax, "default_backend", lambda: "tpu")
    g_pl = jax.grad(loss)(verts)
    # both paths carry ~1e-6-rel f32 reduction noise in the moments
    # (the kernel matches a float64 reference to 1e-6, see the test
    # above); the vertex grads amplify it by the pixel-coordinate
    # scale, so compare at that noise floor, not exact equality
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-4, atol=5e-5)


def test_point_mesh_kernel_matches_scan(interpret_pallas):
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas
    rng = np.random.RandomState(1)
    B, V, F, P = 2, 60, 130, 512
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3) * 1.2).astype(np.float32))
    tris = verts[:, faces]
    d1, i1 = pm._argmin_faces(pts, tris)
    d2, i2 = argmin_faces_pallas(pts, tris)
    # distances must agree; argmin may differ on exact ties of the
    # degenerate random mesh (equal-distance faces sharing vertices)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)
    # winning faces must achieve the winning distance
    win = jnp.take_along_axis(tris, i2[..., None, None].astype(jnp.int32), 1)
    d_win = pm.point_tri_sqdist(pts, win)
    np.testing.assert_allclose(np.asarray(d_win), np.asarray(d1),
                               rtol=1e-3, atol=1e-4)


def test_point_mesh_kernel_masked(interpret_pallas):
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas
    rng = np.random.RandomState(2)
    B, V, F, P = 1, 40, 128, 512
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3)).astype(np.float32))
    tris = verts[:, faces]
    mask = jnp.asarray(rng.rand(F, 15) > 0.6)
    ppart = jnp.asarray(rng.randint(-1, 15, (B, P)).astype(np.int32))
    d1, _ = pm._argmin_faces(pts, tris, mask, ppart)
    d2, _ = argmin_faces_pallas(pts, tris, mask, ppart)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)


def test_point_mesh_culled_matches_scan(interpret_pallas):
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas_culled
    rng = np.random.RandomState(3)
    B, V, F, P = 2, 60, 200, 1024
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3) * 1.5).astype(np.float32))
    tris = verts[:, faces]
    d1, _ = pm._argmin_faces(pts, tris)
    d2, i2 = argmin_faces_pallas_culled(pts, tris)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)
    win = jnp.take_along_axis(tris, i2[..., None, None].astype(jnp.int32), 1)
    d_win = pm.point_tri_sqdist(pts, win)
    np.testing.assert_allclose(np.asarray(d_win), np.asarray(d1),
                               rtol=1e-3, atol=1e-4)


def test_point_mesh_culled_masked_matches_scan(interpret_pallas):
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas_culled
    rng = np.random.RandomState(4)
    B, V, F, P = 2, 40, 160, 1024
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3)).astype(np.float32))
    tris = verts[:, faces]
    # 16-col table like the fused ICP (col 15 admits everything)
    mask = np.asarray(rng.rand(F, 15) > 0.6)
    mask = np.concatenate([mask, np.ones((F, 1), bool)], axis=1)
    ppart = jnp.asarray(rng.randint(-1, 16, (B, P)).astype(np.int32))
    d1, _ = pm._argmin_faces(pts, tris, jnp.asarray(mask), ppart)
    d2, _ = argmin_faces_pallas_culled(pts, tris, jnp.asarray(mask), ppart)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("use_mxu", [True, False])
def test_point_mesh_v2_matches_scan(interpret_pallas, use_mxu):
    """v2 (MXU dots + admissibility chunk-skip bitmask) == XLA scan,
    masked and unmasked, including non-multiple-of-chunk face counts."""
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas_v2
    rng = np.random.RandomState(5)
    B, V, F, P = 2, 60, 200, 1024
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3) * 1.5).astype(np.float32))
    tris = verts[:, faces]
    d1, _ = pm._argmin_faces(pts, tris)
    d2, i2 = argmin_faces_pallas_v2(pts, tris, use_mxu=use_mxu)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)
    win = jnp.take_along_axis(tris, i2[..., None, None].astype(jnp.int32), 1)
    d_win = pm.point_tri_sqdist(pts, win)
    np.testing.assert_allclose(np.asarray(d_win), np.asarray(d1),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("use_mxu", [True, False])
def test_point_mesh_v2_masked_matches_scan(interpret_pallas, use_mxu):
    from dsf_tpu.ops import point_mesh as pm
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas_v2
    rng = np.random.RandomState(6)
    B, V, F, P = 2, 40, 160, 1024
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(_distinct_faces(rng, V, F))
    pts = jnp.asarray((rng.randn(B, P, 3)).astype(np.float32))
    tris = verts[:, faces]
    # 16-col table like the fused ICP (col 15 admits everything)
    mask = np.asarray(rng.rand(F, 15) > 0.6)
    mask = np.concatenate([mask, np.ones((F, 1), bool)], axis=1)
    ppart = jnp.asarray(rng.randint(-1, 16, (B, P)).astype(np.int32))
    d1, _ = pm._argmin_faces(pts, tris, jnp.asarray(mask), ppart)
    d2, _ = argmin_faces_pallas_v2(pts, tris, jnp.asarray(mask), ppart,
                                   use_mxu=use_mxu)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-3, atol=1e-4)


def test_point_mesh_v2_part_sorted_faces(interpret_pallas):
    """The production path: point_face_distance's static part
    permutation + v2 kernel must equal the unpermuted XLA scan."""
    from dsf_tpu.ops import point_mesh as pm
    rng = np.random.RandomState(7)
    B, V, F, P = 2, 40, 160, 1024
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = _distinct_faces(rng, V, F)
    pts = jnp.asarray((rng.randn(B, P, 3)).astype(np.float32))
    mask = rng.rand(F, 15) > 0.6
    ppart = jnp.asarray(rng.randint(-1, 15, (B, P)).astype(np.int32))
    f2, m2 = pm._static_part_perm(faces, mask)
    assert f2.shape == faces.shape and m2.shape == mask.shape
    d_ref = pm.point_face_distance(pts, verts, jnp.asarray(faces),
                                   jnp.asarray(mask), ppart,
                                   use_pallas=False)
    from dsf_tpu.ops.pallas_point_mesh import argmin_faces_pallas_v2
    tris2 = verts[:, jnp.asarray(f2)]
    _, imin = argmin_faces_pallas_v2(pts, tris2, jnp.asarray(m2), ppart)
    win = jnp.take_along_axis(tris2,
                              imin[..., None, None].astype(jnp.int32), 1)
    d_v2 = pm.point_tri_sqdist(pts, win)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_v2),
                               rtol=1e-3, atol=1e-4)


@pytest.fixture()
def interpret_codec(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    import dsf_tpu.ops.pallas_codec as PC
    monkeypatch.setattr(PC.pl, "pallas_call", patched)
    yield


def _codec_inputs(seed=0, B=3, J=21, S=32):
    rng = np.random.RandomState(seed)
    offset = rng.randn(B, 4 * J, S, S).astype(np.float32) * 0.3
    # heatmap channels in a realistic range (cone values in [-x, 1])
    offset[:, 3 * J:] = rng.uniform(-0.5, 1.0, (B, J, S, S))
    depth = rng.uniform(-1, 1.05, (B, 1, S, S)).astype(np.float32)
    return jnp.asarray(offset), jnp.asarray(depth)


def test_codec_decode_kernel_matches_jnp(interpret_codec):
    from dsf_tpu.ops.offset_codec import offset2joint_softmax
    from dsf_tpu.ops.pallas_codec import decode_pallas
    offset, depth = _codec_inputs()
    ref = offset2joint_softmax(offset, depth, 0.8)    # CPU -> jnp path
    out = decode_pallas(offset, depth, 0.8, 30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_codec_decode_kernel_grads_match_jnp(interpret_codec):
    from dsf_tpu.ops.offset_codec import offset2joint_softmax
    from dsf_tpu.ops.pallas_codec import decode_pallas
    offset, depth = _codec_inputs(seed=1, B=2, S=16)
    cot = jnp.asarray(np.random.RandomState(2).randn(2, 21, 3)
                      .astype(np.float32))

    def loss_ref(o, d):
        return jnp.sum(offset2joint_softmax(o, d, 0.8) * cot)

    def loss_ker(o, d):
        return jnp.sum(decode_pallas(o, d, 0.8, 30.0) * cot)

    go_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(offset, depth)
    go_k, gd_k = jax.grad(loss_ker, argnums=(0, 1))(offset, depth)
    np.testing.assert_allclose(np.asarray(go_k), np.asarray(go_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gd_k), np.asarray(gd_r),
                               rtol=1e-4, atol=1e-6)


def test_codec_encode_kernel_matches_jnp(interpret_codec):
    from dsf_tpu.ops.offset_codec import joint2offset
    from dsf_tpu.ops.pallas_codec import encode_pallas
    rng = np.random.RandomState(3)
    B, J, S = 3, 21, 32
    joint = jnp.asarray(rng.uniform(-0.9, 0.9, (B, J, 3)).astype(np.float32))
    img = jnp.asarray(rng.uniform(-1, 1.05, (B, 1, S, S)).astype(np.float32))
    ref = joint2offset(joint, img, 0.8, S)            # CPU -> jnp path
    out = encode_pallas(joint, img, 0.8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_codec_encode_kernel_grads_match_jnp(interpret_codec):
    from dsf_tpu.ops.offset_codec import joint2offset
    from dsf_tpu.ops.pallas_codec import encode_pallas
    rng = np.random.RandomState(4)
    B, J, S = 2, 21, 16
    joint = jnp.asarray(rng.uniform(-0.9, 0.9, (B, J, 3)).astype(np.float32))
    img = jnp.asarray(rng.uniform(-1, 1.05, (B, 1, S, S)).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, 4 * J, S, S).astype(np.float32))

    def loss_ref(j, d):
        return jnp.sum(joint2offset(j, d, 0.8, S) * cot)

    def loss_ker(j, d):
        return jnp.sum(encode_pallas(j, d, 0.8) * cot)

    gj_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(joint, img)
    gj_k, gd_k = jax.grad(loss_ker, argnums=(0, 1))(joint, img)
    np.testing.assert_allclose(np.asarray(gj_k), np.asarray(gj_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd_k), np.asarray(gd_r),
                               rtol=1e-4, atol=1e-5)
