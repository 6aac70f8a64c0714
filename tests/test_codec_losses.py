"""Tests for the offset codec, SmoothL1, ICP distances, sphere collision."""

import numpy as np
import jax
import jax.numpy as jnp

from dsf_tpu.ops import offset_codec as oc
from dsf_tpu.ops import point_mesh as pm
from dsf_tpu.losses import basic as lb
from dsf_tpu.losses import icp as licp
from dsf_tpu.mano import spheres as sph


# ---------------------------------------------------------------- codec

def test_offset_codec_roundtrip():
    """encode(joints) -> decode ~= joints when joints lie on the depth
    surface (foreground everywhere)."""
    rng = np.random.RandomState(0)
    B, J, S = 2, 21, 64
    img = jnp.full((B, 1, 128, 128), 0.1)       # flat foreground surface
    joints = jnp.asarray(
        np.stack([rng.uniform(-0.6, 0.6, (B, J)),
                  rng.uniform(-0.6, 0.6, (B, J)),
                  np.full((B, J), 0.1)], axis=-1).astype(np.float32))
    feat = oc.joint2offset(joints, img, 0.8, S)
    assert feat.shape == (B, 4 * J, S, S)
    dec = oc.offset2joint_softmax(feat, img, 0.8)
    err = np.abs(np.asarray(dec - joints))
    assert err.max() < 0.05, err.max()


def test_offset_codec_background_masked():
    B, J, S = 1, 3, 32
    img = jnp.ones((B, 1, 64, 64))              # all background (>=0.99)
    joints = jnp.zeros((B, J, 3))
    feat = oc.joint2offset(joints, img, 0.8, S)
    np.testing.assert_allclose(np.asarray(feat), 0.0, atol=1e-7)


def test_heatmap_cone_shape():
    B, J, S = 1, 1, 64
    img = jnp.full((B, 1, 64, 64), -0.5)
    joints = jnp.asarray([[[0.0, 0.0, -0.5]]])
    feat = np.asarray(oc.joint2offset(joints, img, 0.8, S))
    heat = feat[0, 3]
    # peak at center, decaying outward
    assert heat[S // 2, S // 2] > 0.95
    assert heat[S // 2, S // 2] > heat[S // 2, S // 4] > heat[S // 2, 2]


# ---------------------------------------------------------------- smooth l1

def test_smooth_l1_values():
    x = jnp.asarray([[0.0, 0.005, 0.02]])
    y = jnp.zeros((1, 3))
    # elementwise: [0, 0.5*.005^2, 0.01*(0.02-0.005)]
    expected = (0.5 * 0.005 ** 2 + 0.01 * 0.015) / 3
    got = float(lb.smooth_l1(x, y))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


# ---------------------------------------------------------------- point-mesh

def np_point_tri_dist(p, tri):
    """Independent formulation: plane projection if inside, else min
    point-segment distance over the 3 edges."""
    a, b, c = tri
    n = np.cross(b - a, c - a)
    nn = np.linalg.norm(n)
    best = np.inf
    if nn > 1e-12:
        n = n / nn
        q = p - np.dot(p - a, n) * n
        # inside test via barycentric
        v0, v1, v2 = b - a, c - a, q - a
        d00, d01, d11 = v0 @ v0, v0 @ v1, v1 @ v1
        d20, d21 = v2 @ v0, v2 @ v1
        den = d00 * d11 - d01 * d01
        if abs(den) > 1e-12:
            v = (d11 * d20 - d01 * d21) / den
            w = (d00 * d21 - d01 * d20) / den
            if v >= 0 and w >= 0 and v + w <= 1:
                best = np.sum((p - q) ** 2)

    def seg(p, s, e):
        t = np.clip(np.dot(p - s, e - s) / max(np.dot(e - s, e - s), 1e-12), 0, 1)
        return np.sum((p - (s + t * (e - s))) ** 2)

    return min(best, seg(p, a, b), seg(p, b, c), seg(p, a, c))


def test_point_tri_sqdist_matches_independent():
    rng = np.random.RandomState(1)
    tris = rng.randn(200, 3, 3)
    pts = rng.randn(200, 3) * 2
    got = np.asarray(pm.point_tri_sqdist(jnp.asarray(pts), jnp.asarray(tris)))
    expected = np.array([np_point_tri_dist(p, t) for p, t in zip(pts, tris)])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_point_face_distance_nearest():
    rng = np.random.RandomState(2)
    B, V, T, P = 2, 60, 40, 50
    verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    faces = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))
    pts = jnp.asarray(rng.randn(B, P, 3).astype(np.float32) * 1.5)
    d = np.asarray(pm.point_face_distance(pts, verts, faces))
    # brute force over all faces
    for b in range(B):
        tris = np.asarray(verts[b])[np.asarray(faces)]
        for p_i in range(P):
            exp = min(np_point_tri_dist(np.asarray(pts[b, p_i]), t) for t in tris)
            assert abs(d[b, p_i] - exp) < 1e-4 + 1e-3 * exp


def test_point_face_distance_gradient():
    rng = np.random.RandomState(3)
    verts = jnp.asarray(rng.randn(1, 30, 3).astype(np.float32))
    faces = jnp.asarray(rng.randint(0, 30, (20, 3)).astype(np.int32))
    pts = jnp.asarray(rng.randn(1, 10, 3).astype(np.float32))

    def loss(v):
        return pm.point_face_distance(pts, v, faces).sum()

    g = jax.grad(loss)(verts)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on a few coordinates
    ok = 0
    for _ in range(10):
        i, k = rng.randint(30), rng.randint(3)
        eps = 1e-3
        fd = (loss(verts.at[0, i, k].add(eps)) -
              loss(verts.at[0, i, k].add(-eps))) / (2 * eps)
        if np.isclose(float(fd), float(g[0, i, k]), rtol=0.05, atol=1e-3):
            ok += 1
    assert ok >= 7


def test_masked_part_loss_selects_parts():
    """Points of part 1 only see part-1 faces."""
    # two separated triangles: part 1 near origin, part 2 far away
    verts = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0],
                          [10, 10, 10], [11, 10, 10], [10, 11, 10]]],
                        dtype=jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
    part_mask = jnp.zeros((2, 15), dtype=bool).at[0, 0].set(True).at[1, 1].set(True)
    pcl = jnp.asarray([[[0.2, 0.2, 1.0], [10.2, 10.2, 11.0]]], jnp.float32)
    seg = jnp.asarray([[1, 2]], jnp.int32)
    out = licp.joint_icp_loss(verts, pcl, faces, part_mask, seg)
    assert out.shape == (1, 15)
    np.testing.assert_allclose(float(out[0, 0]), 1.0, rtol=1e-4)   # z=1 above part1
    np.testing.assert_allclose(float(out[0, 1]), 1.0, rtol=1e-4)   # z=1 above part2
    assert float(out[0, 2]) == 0.0                                  # empty part


# ---------------------------------------------------------------- spheres

def _fake_model():
    """Minimal model-like object for sphere radii."""
    class M:
        n_verts = 778
        vertex_joint_mask = jnp.ones((778, 21), dtype=bool)
    return M()


def test_collision_mask_properties():
    m = sph.COLLISION_MASK
    assert m.shape == (66, 66)
    # palm-palm pairs never penalized
    assert m[:21, :21].sum() == 0
    # same-bone finger spheres never penalized (diagonal blocks)
    for bone in range(15):
        s = 21 + 3 * bone
        assert m[s:s + 3, s:s + 3].sum() == 0
    # distant finger pairs (index bone 0 vs pinky bone 6) are penalized
    assert m[21 + 0, 21 + 3 * 6] == 1


def test_sphere_centers_on_bones():
    joints = jnp.asarray(np.random.RandomState(0).randn(2, 21, 3).astype(np.float32))
    c = sph.sphere_centers(joints)
    assert c.shape == (2, 66, 3)
    np.testing.assert_allclose(np.asarray(c[:, 0]), np.asarray(joints[:, 0]), atol=1e-6)
    # first sphere of each finger bone sits at the parent joint (t=0)
    np.testing.assert_allclose(np.asarray(c[:, 21]), np.asarray(joints[:, 1]), atol=1e-6)


def test_collision_loss_zero_for_spread_hand():
    model = _fake_model()
    rng = np.random.RandomState(0)
    # joints spread far apart -> radii small relative to distances
    joints = jnp.asarray((rng.randn(1, 21, 3) * 10).astype(np.float32))
    mesh = jnp.asarray(
        (np.repeat(np.asarray(joints)[:, :1], 779, axis=1)
         + rng.randn(1, 779, 3) * 0.01).astype(np.float32))
    # mesh near wrist only -> radii tiny for all joints
    loss = float(sph.collision_loss(model, joints, mesh))
    assert loss >= 0.0


def test_seg_pcl_assigns_nearest_bone():
    model = _fake_model()
    rng = np.random.RandomState(1)
    # spread joints: wrist at origin, index chain along +x
    J = np.zeros((21, 3), np.float32)
    J[1] = [1, 0, 0]; J[2] = [2, 0, 0]; J[3] = [3, 0, 0]   # index chain
    J[16] = [4, 0, 0]
    joints = jnp.asarray(J[None])
    mesh = jnp.asarray(rng.randn(1, 779, 3).astype(np.float32) * 0.1)
    pcl = jnp.asarray([[[2.5, 0, 0], [0.1, 0, 0]]], jnp.float32)
    seg = np.asarray(sph.seg_pcl(model, joints, joints, mesh, pcl))
    # point near bone joint2->3 should land in bone 2 (id 2); near-wrist -> 0
    assert seg[0, 0] in (1, 2, 3)
    assert seg[0, 1] == 0


def test_icp_and_joint_icp_matches_separate_calls():
    """The fused single-pass ICP must equal icp_loss + joint_icp_loss."""
    import jax.numpy as jnp
    from dsf_tpu.losses.icp import (icp_and_joint_icp, icp_loss,
                                    joint_icp_loss)
    rng = np.random.RandomState(17)
    B, P, V, T = 3, 256, 64, 48
    mesh = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    pcl = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))
    joint_pcl = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))
    faces = jnp.asarray(
        np.stack([rng.choice(V, 3, replace=False) for _ in range(T)])
        .astype(np.int32))
    mask = jnp.asarray(rng.rand(T, 15) > 0.5)
    # ensure every part admits at least one face
    mask = mask.at[0].set(True)
    seg = jnp.asarray(rng.randint(0, 17, (B, P)).astype(np.int32))

    d2m_ref = icp_loss(mesh, pcl, faces)
    pd2m_ref = joint_icp_loss(mesh, joint_pcl, faces, mask, seg)
    d2m, pd2m = icp_and_joint_icp(mesh, pcl, joint_pcl, faces, mask, seg)
    np.testing.assert_allclose(np.asarray(d2m), np.asarray(d2m_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pd2m), np.asarray(pd2m_ref),
                               rtol=1e-5, atol=1e-6)
