"""Golden tests for MANO LBS against an independent NumPy implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsf_tpu.mano import model as mano_model
from dsf_tpu.mano import synthetic
from dsf_tpu.mano import constants as C


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("mano") / "synthetic_mano.npz"
    synthetic.save_synthetic_mano(str(path), seed=0)
    return mano_model.load_model(str(path))


def np_rodrigues(t):
    a = np.linalg.norm(t + 1e-8)
    k = t / a
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def np_lbs(raw, beta, theta, rot):
    """Independent NumPy MANO forward (world-transform recursion style)."""
    v_template = raw["v_template"]
    n = v_template.shape[0]
    v_shaped = v_template + np.einsum("k,vck->vc", beta, raw["shapedirs"])
    Jreg = raw["J_regressor"]  # (16, 778)
    J = Jreg @ v_shaped  # (16, 3)

    full_pose = theta @ raw["hands_components"][: theta.shape[0]] + raw["hands_mean"]
    Rs = np.stack([np_rodrigues(full_pose[3 * i:3 * i + 3]) for i in range(15)])
    pose_feature = (Rs - np.eye(3)).reshape(135)
    v_posed = v_shaped + np.einsum("k,vck->vc", pose_feature, raw["posedirs"])

    R_all = np.concatenate([np_rodrigues(rot)[None], Rs], axis=0)  # (16,3,3)
    parents = synthetic.PARENTS
    G = np.zeros((16, 4, 4))
    for j in range(16):
        local = np.eye(4)
        local[:3, :3] = R_all[j]
        local[:3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
        G[j] = local if parents[j] < 0 else G[parents[j]] @ local
    # remove rest-pose offset
    A = G.copy()
    for j in range(16):
        A[j, :3, 3] -= G[j, :3, :3] @ J[j]
    W = raw["weights"]  # (778,16)
    T = np.einsum("vj,jmn->vmn", W, A)
    vh = np.concatenate([v_posed, np.ones((n, 1))], axis=1)
    verts = np.einsum("vmn,vn->vm", T, vh)[:, :3]

    # extended 21-joint regressor on posed verts
    Jreg21 = np.concatenate([Jreg.T, np.zeros((n, 5))], axis=1)
    for col, vid in enumerate(C.FINGERTIP_VERTS):
        Jreg21[vid, 16 + col] = 1.0
    joints = verts.T @ Jreg21  # (3, 21)
    wrist = verts[C.WRIST_RING].mean(axis=0, keepdims=True)
    return np.concatenate([verts, wrist], axis=0), joints.T


def test_lbs_matches_numpy(model):
    raw = synthetic.build_synthetic_mano(seed=0)
    rng = np.random.RandomState(42)
    B = 3
    beta = rng.randn(B, 10).astype(np.float32) * 2
    theta = rng.randn(B, 45).astype(np.float32)
    rot = rng.uniform(-np.pi, np.pi, (B, 3)).astype(np.float32)

    verts, joints, Rs = mano_model.lbs(
        model, jnp.asarray(beta), jnp.asarray(theta), jnp.asarray(rot))
    assert verts.shape == (B, 779, 3)
    assert joints.shape == (B, 21, 3)

    for b in range(B):
        ev, ej = np_lbs(raw, beta[b].astype(np.float64),
                        theta[b].astype(np.float64), rot[b].astype(np.float64))
        np.testing.assert_allclose(np.asarray(verts[b]), ev, rtol=1e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints[b]), ej, rtol=1e-3, atol=2e-5)


def test_rest_pose_joints_near_skeleton(model):
    """Zero pose with hands_mean removed should keep joints near the rest
    skeleton (sanity that the chain doesn't scramble topology)."""
    B = 1
    beta = jnp.zeros((B, 10))
    # cancel the mean: theta such that theta @ comp + mean = 0 is hard for a
    # random comp; instead pass pose_is_pca=False with zero axis-angles.
    theta = jnp.zeros((B, 45))
    rot = jnp.zeros((B, 3))
    verts, joints, _ = mano_model.lbs(model, beta, theta, rot, pose_is_pca=False)
    raw = synthetic.build_synthetic_mano(seed=0)
    J_rest = raw["J_regressor"] @ raw["v_template"]
    np.testing.assert_allclose(np.asarray(joints[0, :16]), J_rest, atol=1e-5)


def test_get_mano_vertices_cam(model):
    rng = np.random.RandomState(0)
    B = 2
    para = np.zeros((B, 62), np.float32)
    para[:, :3] = rng.uniform(-1, 1, (B, 3))
    para[:, 3:48] = rng.randn(B, 45) * 0.5
    para[:, 48:58] = rng.randn(B, 10)
    para[:, 58] = 1.2      # scale
    para[:, 59:62] = [10.0, -5.0, 700.0]
    rot, pose, shape, cam = mano_model.split_params(jnp.asarray(para))
    assert rot.shape == (B, 3) and pose.shape == (B, 45)
    assert shape.shape == (B, 10) and cam.shape == (B, 4)
    v1, j1 = mano_model.get_mano_vertices(model, rot, pose, shape, cam)
    v0, j0, _ = mano_model.lbs(model, shape, pose, rot)
    expected = np.asarray(v0) * 1000.0 * 1.2 + np.array([10.0, -5.0, 700.0])
    np.testing.assert_allclose(np.asarray(v1), expected, rtol=1e-4, atol=1e-3)
    # global_scale path (ref render(): 1/125 pre-scaling)
    v2, j2 = mano_model.get_mano_vertices(model, rot, pose, shape, cam,
                                          global_scale=1 / 125)
    expected2 = np.asarray(v0) * 1000.0 / 125 * 1.2 + np.array([10.0, -5.0, 700.0])
    np.testing.assert_allclose(np.asarray(v2), expected2, rtol=1e-4, atol=1e-3)


def test_model_is_pytree(model):
    import jax
    leaves = jax.tree_util.tree_leaves(model)
    assert len(leaves) > 5
    # jit with the model as a static-free argument
    f = jax.jit(lambda m, b: mano_model.lbs(m, b, jnp.zeros((1, 45)),
                                            jnp.zeros((1, 3)))[1])
    out = f(model, jnp.zeros((1, 10)))
    assert out.shape == (1, 21, 3)
