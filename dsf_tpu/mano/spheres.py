"""66-sphere hand approximation: collision loss and point-cloud part
segmentation (ref: render_model/mano_layer.py:229-567).

Sphere layout: 21 palm spheres (wrist + 5 palm bones x 4 interpolants)
followed by 45 finger spheres (15 bones x 3 interpolants, bone-major).
The pairwise collision mask (which sphere pairs may penalize) is static
config, built once in NumPy with the reference's exact exclusions
(same-bone, adjacent-bone, finger-root-to-palm, thumb-root-to-palm).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from dsf_tpu.mano.constants import BONE_CHILD

PALM_N = 21          # 1 + 5 * 4
FINGER_N = 45        # 15 * 3
INTERVAL = 3         # finger spheres per bone (per_adj_sphere=2 -> 3)
PALM_PER_BONE = 4

# ref interval_value: linspace(0, 1, per_adj_shpere + 2)[:-1] with
# per_adj_shpere=2 -> [0, 1/3, 2/3] (mano_layer.py:231)
_FINGER_T = np.linspace(0, 1, INTERVAL + 1)[:-1]                   # [0, 1/3, 2/3]
_PALM_T = np.linspace(0, 1, PALM_PER_BONE + 2)[1:-1]               # [.2 .4 .6 .8]
_PALM_CHILD = [1, 4, 7, 10, 13]


def build_collision_mask() -> np.ndarray:
    """(66, 66) float mask of sphere pairs that contribute to the
    collision penalty (ref: mano_layer.py:239-269, including its
    asymmetries)."""
    plam_mask = np.concatenate(
        [np.zeros((PALM_N, PALM_N)), np.ones((PALM_N, FINGER_N))], axis=1)
    finger_mask = np.ones((FINGER_N, PALM_N + FINGER_N))
    for fi in range(15):
        root = fi // 3 + 1
        if fi in (0, 3, 6, 9, 12):         # proximal bone of each finger
            for fb in range(INTERVAL):
                finger_mask[INTERVAL * fi + fb, root * PALM_PER_BONE] = 0
                plam_mask[root * PALM_PER_BONE, PALM_N + INTERVAL * fi + fb] = 0
                s = PALM_N + INTERVAL * fi
                finger_mask[INTERVAL * fi + fb, s:s + INTERVAL + 3] = 0
        else:
            s = PALM_N + INTERVAL * fi
            mx = PALM_N + 3 * INTERVAL * root
            for fb in range(INTERVAL):
                finger_mask[INTERVAL * fi + fb,
                            s - INTERVAL:min(s + INTERVAL * 2 + 1, mx)] = 0
    thumb_root = 12 * INTERVAL
    finger_mask[thumb_root:thumb_root + INTERVAL + 1, :PALM_N] = 0
    mask = np.concatenate([plam_mask, finger_mask], axis=0)
    mask[:PALM_N, PALM_N + thumb_root:PALM_N + thumb_root + INTERVAL + 1] = 0
    return mask.astype(np.float32)


COLLISION_MASK = build_collision_mask()


def sphere_centers(joints):
    """(B, 21, 3) joints -> (B, 66, 3) sphere centers
    (ref: get_sphere / the center half of get_sphere_radius)."""
    ft = jnp.asarray(_FINGER_T, joints.dtype).reshape(1, 1, -1, 1)
    pt = jnp.asarray(_PALM_T, joints.dtype).reshape(1, 1, -1, 1)

    palm_child = joints[:, _PALM_CHILD]                 # (B, 5, 3)
    palm_parent = joints[:, 0:1]                        # (B, 1, 3)
    palm_bone = palm_child - palm_parent
    palm_c = palm_bone[:, :, None, :] * pt + palm_parent[:, :, None, :]
    palm_c = jnp.concatenate(
        [palm_parent, palm_c.reshape(joints.shape[0], -1, 3)], axis=1)

    f_child = joints[:, BONE_CHILD]                     # (B, 15, 3)
    f_parent = joints[:, 1:16]
    f_c = (f_child - f_parent)[:, :, None, :] * ft + f_parent[:, :, None, :]
    return jnp.concatenate(
        [palm_c, f_c.reshape(joints.shape[0], -1, 3)], axis=1)


def sphere_radii(model, joints, mesh):
    """(B, 66) sphere radii from per-joint distances to the 10 nearest
    assigned mesh verts (ref: the radius half of get_sphere_radius,
    mano_layer.py:271-317)."""
    diff = joints[:, :, None, :] - mesh[:, None, : model.n_verts, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-8)
    assigned = model.vertex_joint_mask.T[None]          # (1, 21, 778)
    d = jnp.where(assigned, d, 100.0)
    nearest = _mean_smallest_k(d, 10)
    joint_r = jnp.concatenate(
        [nearest[:, :16], nearest[:, [3, 6, 9, 12, 15]] / 1.5], axis=-1)

    palm_child = joint_r[:, _PALM_CHILD]
    palm_parent = jnp.clip(joint_r[:, 0:1] - 0.05, 0.01, 0.4)
    pt = jnp.asarray(_PALM_T, joints.dtype).reshape(1, 1, -1)
    palm_r = (palm_child - palm_parent)[:, :, None] * pt + palm_parent[:, :, None]
    palm_r = jnp.concatenate(
        [palm_parent, palm_r.reshape(joints.shape[0], -1)], axis=1)

    ft = jnp.asarray(_FINGER_T, joints.dtype).reshape(1, 1, -1)
    f_child = joint_r[:, BONE_CHILD]
    f_parent = joint_r[:, 1:16]
    f_r = (f_child - f_parent)[:, :, None] * ft + f_parent[:, :, None]
    return jnp.concatenate(
        [palm_r, f_r.reshape(joints.shape[0], -1)], axis=1)


def _mean_smallest_k(d, k):
    """Mean of the k smallest values along the last axis.

    k passes of extract-min (min + first-occurrence argmin + mask)
    instead of jax.lax.top_k: TPU lowers top_k to a full stable sort
    of the 778-vert axis — three [B,21,778] sorts, ~1.1 ms of the
    round-5 step trace — while the extraction is k fused VPU sweeps.
    The selected multiset is identical (top_k and argmin both break
    value ties toward the lower index); only the final mean's
    summation order differs (sequential vs sort-order tree, ~1 ulp).
    """
    if k >= d.shape[-1]:
        return jnp.mean(d, axis=-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    acc = jnp.zeros(d.shape[:-1], d.dtype)
    for _ in range(k):
        acc = acc + jnp.min(d, axis=-1)
        am = jnp.argmin(d, axis=-1)
        d = jnp.where(idx == am[..., None], jnp.inf, d)
    return acc / k


def collision_loss(model, joints, mesh, keep_batch=False):
    """Mean sphere-pair penetration, gated PER SPHERE ROW
    (ref: calculate_coll, mano_layer.py:373-386).  The reference's
    ``error.sum(-1, keepdim=True).sum(-1, keepdim=True)`` sums the last
    axis twice (the second sum is a no-op over the kept size-1 dim), so
    its "batch mask" is really (B, 66, 1): each SPHERE whose summed
    penetration is already >= 0.1 is zeroed, not each sample — preserved
    exactly (A/B-tested vs the live reference).
    keep_batch: return the per-sample mean (B,) instead of the scalar
    (mean of the per-sample means equals the scalar for fixed B)."""
    c = sphere_centers(joints)
    r = sphere_radii(model, joints, mesh)
    diff = c[:, :, None, :] - c[:, None, :, :]
    dis = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-8)
    pair_r = r[:, :, None] + r[:, None, :]
    err = jnp.maximum(pair_r - dis, 0.0) * jnp.asarray(COLLISION_MASK)
    gate = (err.sum(-1, keepdims=True) < 0.1).astype(err.dtype)
    err = err * gate
    if keep_batch:
        return err.sum(-1).mean(-1)
    return jnp.mean(err.sum(-1))


def seg_pcl(model, joints, joints_mano, mesh, pcl):
    """Assign each point to a bone part 0..15 (0 = palm).

    Centers come from ``joints`` (pixel-branch prediction), radii from
    ``joints_mano`` (MANO branch) — ref: seg_pcl, mano_layer.py:404-426.
    pcl: (B, P, 3) -> (B, P) int32.
    """
    c = sphere_centers(joints)
    r = sphere_radii(model, joints_mano, mesh)
    fc, fr = c[:, PALM_N:], r[:, PALM_N:]
    pc, pr = c[:, :PALM_N], r[:, :PALM_N]

    fd = jnp.sqrt(jnp.sum((pcl[:, :, None] - fc[:, None]) ** 2, -1) + 1e-8)
    fd = jnp.abs(fd - fr[:, None])
    f_min = jnp.min(fd, -1)
    f_id = (jnp.argmin(fd, -1) // INTERVAL).astype(jnp.int32) + 1

    pd = jnp.sqrt(jnp.sum((pcl[:, :, None] - pc[:, None]) ** 2, -1) + 1e-8)
    pd = jnp.abs(pd - pr[:, None])
    p_min = jnp.min(pd, -1)

    return jnp.where(p_min < f_min, 0, f_id)


_SEG21_MAP = np.array(
    [1, 1, 2, 2, 2, 3, 3, 3, 16, 4, 4, 5, 5, 5, 6, 6, 6, 17, 7, 7, 8, 8, 8,
     9, 9, 9, 18, 10, 10, 11, 11, 11, 12, 12, 12, 19, 13, 13, 14, 14, 14, 15,
     15, 15, 20], dtype=np.int32)

_SEGFINGER_MAP = np.repeat(np.arange(1, 6, dtype=np.int32), 9)


def seg_pcl_21(model, joints, joints_mano, mesh, pcl):
    """21-part variant (ref: seg_pcl_21, mano_layer.py:468-491)."""
    return _seg_with_map(model, joints, joints_mano, mesh, pcl,
                         jnp.asarray(_SEG21_MAP))


def seg_pcl_finger(model, joints, joints_mano, mesh, pcl):
    """5-finger variant (ref: seg_pcl_finger, mano_layer.py:523-546)."""
    return _seg_with_map(model, joints, joints_mano, mesh, pcl,
                         jnp.asarray(_SEGFINGER_MAP))


def _seg_with_map(model, joints, joints_mano, mesh, pcl, id_map):
    c = sphere_centers(joints)
    r = sphere_radii(model, joints_mano, mesh)
    fc, fr = c[:, PALM_N:], r[:, PALM_N:]
    pc, pr = c[:, :PALM_N], r[:, :PALM_N]
    fd = jnp.sqrt(jnp.sum((pcl[:, :, None] - fc[:, None]) ** 2, -1) + 1e-8)
    fd = jnp.abs(fd - fr[:, None])
    f_min = jnp.min(fd, -1)
    f_id = id_map[jnp.argmin(fd, -1)]
    pd = jnp.sqrt(jnp.sum((pcl[:, :, None] - pc[:, None]) ** 2, -1) + 1e-8)
    pd = jnp.abs(pd - pr[:, None])
    p_min = jnp.min(pd, -1)
    return jnp.where(p_min < f_min, 0, f_id)


# ---------------------------------------------------------------------------
# point -> sphere / per-part mesh distance variants
# (ref: mano_layer.py:429-567 — alternatives to the face-based ICP losses)
# ---------------------------------------------------------------------------

def point2mesh_part_distance(model, mesh, pcl, pcl_seg):
    """(B, 15) mean min squared VERTEX distance of part ``index`` points
    to the verts argmax-skinned to joint ``index`` (ref:
    calculate_point2mesh_distance, mano_layer.py:429-441).

    Index semantics preserved from the reference (A/B-tested): the loop
    is 0-BASED — part 0 pairs palm points (seg 0) with wrist-argmax
    verts, parts 1..14 pair bone seg k with joint-k verts, and bone 15
    (fingertip bones' last segment) is never evaluated.  (Note this
    differs from calculate_point2shpere_distance, which is 1-based —
    an inconsistency inside the reference itself.)

    Reduction quirk kept: the reference takes mean-over-ALL-points of
    min distances where non-part points contribute 1e5 each."""
    mesh778 = mesh[:, : model.n_verts]
    d = jnp.sum((pcl[:, :, None] - mesh778[:, None]) ** 2, -1)   # (B,P,V)
    losses = []
    for part in range(15):
        vert_ok = model.vertex_seg == part                       # (V,)
        dm = jnp.where(vert_ok[None, None], d, 1e5)
        dmin = dm.min(-1)                                        # (B,P)
        sel = pcl_seg == part
        dmin = jnp.where(sel, dmin, 1e5)                         # ref line 437
        losses.append(dmin.mean(-1))
    return jnp.stack(losses, -1)


def _point2sphere_part(model, joint, mesh, pcl, pcl_seg, groups, n_parts):
    """Shared reduction: per part, mean |dist(point, sphere surface)|
    over that part's points and sphere subset (ref:
    calculate_point2shpere_distance*, mano_layer.py:444-567)."""
    c = sphere_centers(joint)
    r = sphere_radii(model, joint, mesh)
    fc, fr = c[:, PALM_N:], r[:, PALM_N:]
    d = jnp.sqrt(jnp.sum((pcl[:, :, None] - fc[:, None]) ** 2, -1) + 1e-8)
    d = jnp.abs(d - fr[:, None])                                 # (B,P,45)
    losses = []
    for part in range(n_parts):
        sphere_ok = jnp.asarray(groups[part])                    # (45,) bool
        dm = jnp.where(sphere_ok[None, None], d, jnp.inf)
        dmin = dm.min(-1)
        sel = pcl_seg == part + 1
        dsel = jnp.where(sel, dmin, 0.0)
        valid = (dsel > 0).sum(-1)
        loss = dsel.sum(-1) / (valid + 1e-8)
        losses.append(jnp.where(valid == 0, 0.0, loss))
    return jnp.stack(losses, -1)


def _bone_groups():
    g = np.zeros((15, FINGER_N), bool)
    for i in range(15):
        g[i, i * INTERVAL:(i + 1) * INTERVAL] = True
    return g


def _joint21_groups():
    id_list = [[0, 1], [2, 3, 4], [5, 6, 7], [9, 10], [11, 12, 13],
               [14, 15, 16], [18, 19], [20, 21, 22], [23, 24, 25],
               [27, 28], [29, 30, 31], [32, 33, 34], [36, 37],
               [38, 39, 40], [41, 42, 43], [8], [17], [26], [35], [44]]
    g = np.zeros((20, FINGER_N), bool)
    for i, ids in enumerate(id_list):
        g[i, ids] = True
    return g


def _finger_groups():
    g = np.zeros((5, FINGER_N), bool)
    for i in range(5):
        g[i, i * 3 * INTERVAL:(i + 1) * 3 * INTERVAL] = True
    return g


def point2sphere_distance(model, joint, mesh, pcl, pcl_seg):
    """(B, 15) per-bone variant (ref: calculate_point2shpere_distance)."""
    return _point2sphere_part(model, joint, mesh, pcl, pcl_seg,
                              _bone_groups(), 15)


def point2sphere_distance_21(model, joint, mesh, pcl, pcl_seg):
    """(B, 20) per-joint variant (ref:
    calculate_point2shpere_distance_21, id groups mano_layer.py:501-506)."""
    return _point2sphere_part(model, joint, mesh, pcl, pcl_seg,
                              _joint21_groups(), 20)


def point2sphere_distance_finger(model, joint, mesh, pcl, pcl_seg):
    """(B, 5) per-finger variant (ref:
    calculate_point2shpere_distance_finger)."""
    return _point2sphere_part(model, joint, mesh, pcl, pcl_seg,
                              _finger_groups(), 5)
