"""MANO hand model: linear blend skinning as pure JAX functions.

Functional rewrite of the reference MANO layer
(ref: render_model/mano_layer.py:82-770).  Model constants live in a
frozen pytree dataclass so everything composes with jit/vmap/pjit; the
16-step kinematic chain is unrolled at trace time (static topology).

All matmuls run at Precision.HIGHEST — LBS feeds mm-level losses and
bf16 MXU passes would cost ~0.1 mm of noise.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dsf_tpu import geometry as geo
from dsf_tpu.mano import constants as C

HI = jax.lax.Precision.HIGHEST


@partial(jax.tree_util.register_dataclass,
         data_fields=["v_template", "shapedirs", "J_regressor", "hands_comp",
                      "hands_mean", "posedirs", "weights", "faces",
                      "vertex_seg", "finger_seg", "joint_face_mask",
                      "finger_face_mask", "vertex_joint_mask"],
         meta_fields=["parents", "n_verts"])
@dataclasses.dataclass(frozen=True)
class ManoModel:
    """MANO constants (pytree). Shapes for the real model:

    v_template (778,3), shapedirs (10, 2334), J_regressor (778, 21)
    [16 kinematic + 5 fingertip rows], hands_comp (45,45), hands_mean (45,),
    posedirs (135, 2334), weights (778,16), faces (1554,3) [wrist-capped],
    vertex_seg (778,), finger_seg (778,), joint_face_mask (1554,15),
    finger_face_mask (1554,5), vertex_joint_mask (778,21).
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    J_regressor: jnp.ndarray
    hands_comp: jnp.ndarray
    hands_mean: jnp.ndarray
    posedirs: jnp.ndarray
    weights: jnp.ndarray
    faces: jnp.ndarray
    vertex_seg: jnp.ndarray
    finger_seg: jnp.ndarray
    joint_face_mask: jnp.ndarray
    finger_face_mask: jnp.ndarray
    vertex_joint_mask: jnp.ndarray
    parents: tuple
    n_verts: int


def _face_membership(faces: np.ndarray, vert_sets) -> np.ndarray:
    """(T, K) bool: face t touches any vertex in vert_sets[k].

    (ref builds per-joint/per-finger face lists, mano_layer.py:165-185;
    we keep fixed-shape membership masks instead of ragged lists.)
    """
    T = faces.shape[0]
    K = len(vert_sets)
    out = np.zeros((T, K), dtype=bool)
    for k, vs in enumerate(vert_sets):
        isin = np.isin(faces, np.asarray(list(vs)))
        out[:, k] = isin.any(axis=1)
    return out


def load_model(npz_path: str) -> ManoModel:
    """Build a ManoModel from a converted npz (see mano/convert.py).

    Mirrors the reference's constructor transforms
    (ref: mano_layer.py:97-185): reshape blend-shape bases, extend the
    joint regressor with 5 fingertip vertices, append 16 wrist-capping
    faces, and derive vertex/face part-segmentation tables.
    """
    raw = np.load(npz_path)
    v_template = raw["v_template"].astype(np.float32)          # (778,3)
    n_verts = v_template.shape[0]

    # reshape(-1, num_betas).T over (778,3,10) -> (10, 2334)
    sd = raw["shapedirs"].astype(np.float32)
    shapedirs = sd.reshape(-1, sd.shape[-1]).T                  # (10, 2334)

    pd = raw["posedirs"].astype(np.float32)
    posedirs = pd.reshape(-1, pd.shape[-1]).T                   # (135, 2334)

    Jreg = raw["J_regressor"].astype(np.float32)                # (16, 778)
    Jreg = Jreg.T                                               # (778, 16)
    addition = np.zeros((n_verts, 5), np.float32)
    for col, vid in enumerate(C.FINGERTIP_VERTS):
        addition[vid, col] = 1.0
    J_regressor = np.concatenate([Jreg, addition], axis=1)      # (778, 21)

    hands_comp = raw["hands_components"].astype(np.float32)     # (45, 45)
    hands_mean = raw["hands_mean"].astype(np.float32)           # (45,)

    parents = tuple(int(p) for p in raw["kintree_table"][0])
    parents = ((-1,) + parents[1:]) if parents[0] != -1 else parents

    weights = raw["weights"].astype(np.float32)                 # (778, 16)
    faces = np.concatenate([raw["f"].astype(np.int32), C.WRIST_FACES], axis=0)

    # part segmentation tables (ref: mano_layer.py:149-185)
    vertex_seg = np.argmax(weights, axis=1).astype(np.int32)    # (778,)
    finger_seg = C.JOINT2FINGER[vertex_seg].astype(np.int32)
    vertex_joint = [np.nonzero(weights[:, j] > 0.1)[0] for j in range(16)]
    joint_face_mask = _face_membership(faces, vertex_joint[1:])  # joints 1..15
    finger_sets = [
        np.concatenate([vertex_joint[3 * i + 1], vertex_joint[3 * i + 2],
                        vertex_joint[3 * i + 3]]) for i in range(5)
    ]
    finger_face_mask = _face_membership(faces, finger_sets)
    vertex_joint_mask = (J_regressor > 0)                        # (778, 21)

    return ManoModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        J_regressor=jnp.asarray(J_regressor),
        hands_comp=jnp.asarray(hands_comp),
        hands_mean=jnp.asarray(hands_mean),
        posedirs=jnp.asarray(posedirs),
        weights=jnp.asarray(weights),
        faces=jnp.asarray(faces),
        vertex_seg=jnp.asarray(vertex_seg),
        finger_seg=jnp.asarray(finger_seg),
        joint_face_mask=jnp.asarray(joint_face_mask),
        finger_face_mask=jnp.asarray(finger_face_mask),
        vertex_joint_mask=jnp.asarray(vertex_joint_mask),
        parents=parents,
        n_verts=n_verts,
    )


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------

def _global_rigid_transform(Rs, Js, parents):
    """Kinematic chain: per-joint rotations + rest joints -> posed joints
    and skinning transforms (ref: batch_global_rigid_transformation,
    mano_layer.py:730-770).

    Rs: (B, 16, 3, 3), Js: (B, 16, 3). Returns (new_J (B,16,3), A (B,16,4,4)).
    The 16-step loop is unrolled (topology is static metadata).
    """
    B = Rs.shape[0]

    def make_A(R, t):
        # (B,3,3), (B,3) -> (B,4,4)
        Rh = jnp.concatenate([R, jnp.zeros((B, 1, 3), R.dtype)], axis=1)
        th = jnp.concatenate([t, jnp.ones((B, 1), R.dtype)], axis=1)[..., None]
        return jnp.concatenate([Rh, th], axis=2)

    results = [make_A(Rs[:, 0], Js[:, 0])]
    for i in range(1, len(parents)):
        p = parents[i]
        j_here = Js[:, i] - Js[:, p]
        A_here = make_A(Rs[:, i], j_here)
        results.append(jnp.matmul(results[p], A_here, precision=HI))
    G = jnp.stack(results, axis=1)                      # (B,16,4,4)

    new_J = G[:, :, :3, 3]
    # A = G - G @ [J;0]  (remove the rest-pose joint offset)
    Jw0 = jnp.concatenate([Js, jnp.zeros((B, Js.shape[1], 1), Js.dtype)], axis=-1)
    init_bone = jnp.einsum("bjmn,bjn->bjm", G, Jw0, precision=HI)
    A = G.at[:, :, :, 3].add(-init_bone)
    return new_J, A


def lbs(model: ManoModel, beta, theta, rot, pose_is_pca: bool = True):
    """MANO forward: shape + pose -> (verts (B,779,3), joints (B,21,3), Rs).

    (ref: MANO_SMPL.forward, mano_layer.py:573-641.)
    beta (B,10); theta (B,<=45) PCA coefficients (or (B,45) axis-angles if
    pose_is_pca=False); rot (B,3) axis-angle or (B,4) quaternion global.
    """
    B = beta.shape[0]
    n = model.n_verts

    v_shaped = jnp.matmul(beta, model.shapedirs, precision=HI).reshape(B, n, 3)
    v_shaped = v_shaped + model.v_template

    # rest joints from the 16 kinematic rows
    J = jnp.einsum("bvk,vj->bjk", v_shaped, model.J_regressor[:, :16], precision=HI)

    if rot.shape[-1] == 3:
        global_rot = geo.rodrigues(rot).reshape(B, 1, 3, 3)
    else:
        global_rot = geo.quat_to_mat(rot).reshape(B, 1, 3, 3)

    if pose_is_pca:
        full_pose = jnp.matmul(theta, model.hands_comp[: theta.shape[-1]],
                               precision=HI) + model.hands_mean
    else:
        full_pose = theta
    Rs = geo.rodrigues(full_pose.reshape(-1, 3)).reshape(B, 15, 3, 3)

    pose_feature = (Rs - jnp.eye(3, dtype=Rs.dtype)).reshape(B, 135)
    v_posed = v_shaped + jnp.matmul(pose_feature, model.posedirs,
                                    precision=HI).reshape(B, n, 3)

    _, A = _global_rigid_transform(
        jnp.concatenate([global_rot, Rs], axis=1), J, model.parents)

    # skinning: T = W @ A
    T = jnp.einsum("vj,bjmn->bvmn", model.weights, A, precision=HI)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, n, 1), v_posed.dtype)], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h, precision=HI)[..., :3]

    joints = jnp.einsum("bvk,vj->bjk", verts, model.J_regressor, precision=HI)

    # close the wrist: centroid of the wrist ring as vertex 778
    wrist_vert = jnp.mean(verts[:, C.WRIST_RING, :], axis=1, keepdims=True)
    verts = jnp.concatenate([verts, wrist_vert], axis=1)
    return verts, joints, Rs


def get_mano_vertices(model: ManoModel, rot, pose, shape, cam, global_scale=None):
    """Apply camera params: mm conversion + scale + translation.

    (ref: get_mano_vertices, mano_layer.py:643-693.  The ICVL
    joint-averaging block there computes `select_joint` but returns the
    plain `verts, joints` — dead code — so behavior is dataset-independent.)

    cam: (B, 4) = [scale, tx, ty, tz].
    """
    verts, joints, _ = lbs(model, shape, pose, rot)
    scale = cam[:, 0].reshape(-1, 1, 1)
    trans = cam[:, 1:].reshape(cam.shape[0], 1, -1)
    joints = joints * 1000.0
    verts = verts * 1000.0
    if global_scale is not None:
        joints = joints * global_scale
        verts = verts * global_scale
    verts = verts * scale + trans
    joints = joints * scale + trans
    return verts, joints


def split_params(model_para):
    """62-D (or 63-D quat) MANO param vector -> (rot, pose45, shape10, cam4).

    (ref: Render.forward, mano_layer.py:988-999; layout glb|pose|shape|cam
    per read_modelPara, render_loader.py:1324-1332.)
    """
    quat_dim = 4 if model_para.shape[-1] == 63 else 3
    rot = model_para[:, :quat_dim]
    pose = model_para[:, quat_dim:quat_dim + 45]
    shape = model_para[:, quat_dim + 45:quat_dim + 55]
    cam = model_para[:, quat_dim + 55:]
    return rot, pose, shape, cam
