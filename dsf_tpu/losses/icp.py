"""ICP-family losses: data->model distances on the MANO mesh.

Rebuilds metric/meshLoss.py:347-395 on top of the fixed-shape
point->face distance op.  Where the reference replicates the cloud x15
and builds 15 ragged part meshes (JointICPLoss, meshLoss.py:377-395), we
run ONE distance pass with a per-point admissible-face mask derived from
the point's segment — same result, 15x less distance work.
"""

from __future__ import annotations

import jax.numpy as jnp

from dsf_tpu.ops.point_mesh import point_face_distance


def icp_loss(mesh, pcl, faces):
    """(B,) mean per-point SQUARED distance from cloud to full mesh.

    (ref: ICPLoss, meshLoss.py:347-353 — note squared distances, the
    reference's point_mesh_face_distance early-returns them.)
    """
    per_point = point_face_distance(pcl, mesh, faces)
    return per_point.mean(-1)


def _part_reduce(d, pcl_seg, n_parts):
    """Per part, mean distance of that part's points; empty parts give 0
    (ref empty-part guard, meshLoss.py:370-373)."""
    losses = []
    for part in range(1, n_parts + 1):
        sel = (pcl_seg == part)
        dis = jnp.where(sel, d, 0.0)
        valid = (dis > 0).sum(-1)
        loss = dis.sum(-1) / (valid + 1e-8)
        losses.append(jnp.where(valid == 0, 0.0, loss))
    return jnp.stack(losses, axis=-1)                  # (B, n_parts)


def _masked_part_loss(mesh, pcl, faces, part_face_mask, pcl_seg, n_parts):
    """Shared part-aware reduction: per part, mean distance of that
    part's points to that part's faces; empty parts give 0.  The mask is
    passed factorized ((T, K) table + per-point part id) — never a
    (P x T) tensor."""
    point_part = jnp.where(
        (pcl_seg >= 1) & (pcl_seg <= n_parts), pcl_seg - 1, -1)
    d = point_face_distance(pcl, mesh, faces, part_mask=part_face_mask,
                            point_part=point_part)      # (B, P)
    return _part_reduce(d, pcl_seg, n_parts)


def icp_and_joint_icp(mesh, pcl, joint_pcl, faces, joint_face_mask, pcl_seg):
    """Fused ICPLoss + JointICPLoss: ONE nearest-face pass over the
    stacked [full cloud | joint cloud] instead of two kernel launches.

    The part table gains a 16th column that admits EVERY face — the
    full-mesh ICP points use it, the joint-cloud points keep their bone
    part (0..14).  Numerically identical to icp_loss + joint_icp_loss
    (the same argmin over the same admissible sets).

    mesh (B, V, 3); pcl / joint_pcl (B, P, 3); pcl_seg (B, P).
    Returns (d2m (B,), pd2m (B, 15)).
    """
    B, P = pcl.shape[0], pcl.shape[1]
    T = joint_face_mask.shape[0]
    try:
        # concrete mask (the usual case: a model constant closed over by
        # jit) -> build the table in numpy so the culled kernel can
        # derive its static face-part permutation from it
        import numpy as np
        table = jnp.asarray(np.concatenate(
            [np.asarray(joint_face_mask), np.ones((T, 1), bool)], axis=1))
    except Exception:
        table = jnp.concatenate(
            [joint_face_mask, jnp.ones((T, 1), bool)], axis=1)   # (T, 16)
    pp_joint = jnp.where((pcl_seg >= 1) & (pcl_seg <= 15), pcl_seg - 1, -1)
    pp_full = jnp.full((B, P), 15, jnp.int32)
    points = jnp.concatenate([pcl, joint_pcl], axis=0)       # (2B, P, 3)
    ppart = jnp.concatenate([pp_full, pp_joint], axis=0)
    mesh2 = jnp.concatenate([mesh, mesh], axis=0)
    d = point_face_distance(points, mesh2, faces, part_mask=table,
                            point_part=ppart)                # (2B, P)
    d2m = d[:B].mean(-1)
    pd2m = _part_reduce(d[B:], pcl_seg, 15)
    return d2m, pd2m


def joint_icp_loss(mesh, pcl, faces, joint_face_mask, pcl_seg):
    """(B, 15) per-bone-part masked mean squared distance.

    (ref: JointICPLoss, meshLoss.py:377-395; part p uses the faces
    touching verts skinned >0.1 to joint p.)
    """
    return _masked_part_loss(mesh, pcl, faces, joint_face_mask, pcl_seg, 15)


def finger_icp_loss(mesh, pcl, faces, finger_face_mask, pcl_seg):
    """(B, 5) per-finger variant (ref: FingerICPLoss, meshLoss.py:356-374)."""
    return _masked_part_loss(mesh, pcl, faces, finger_face_mask, pcl_seg, 5)


def chamfer_distance(x, y):
    """Symmetric mean squared chamfer distance between (B, N, 3) and
    (B, M, 3) clouds (parity for render_loss.py:4,50's surface_loss)."""
    d = jnp.sum((x[:, :, None] - y[:, None]) ** 2, -1)     # (B, N, M)
    return jnp.mean(d.min(-1), -1) + jnp.mean(d.min(-2), -1)
